"""Blocked (cache-line-partitioned) Bloom filter — the reference's core op.

Semantics mirror the reference filter family (``src/bloom_filter.hpp``,
``src/standard_bloom_filter.cpp``, ``src/dpu/bloom_filters_dpu.cpp``) without
porting its execution machinery:

- geometry ``(m = 2**size2 bits, k = nb_hash)`` with the reference's validation
  (``size2 >= 3``, ``1 <= nb_hash < 10`` — ``src/bloom_filter.hpp:31-36,272-274``);
- *blocked* bit placement: all k bits of an item land inside one fixed-size
  block, mirroring the DPU variant's 4096-bit / 512-byte blocks
  (``BLOCK_MODULO 4095`` at ``src/dpu/bloom_filters_dpu.cpp:27``,
  ``CACHE8_BLOOM_SIZE 512`` at ``src/pim_bloom_filter_common.h:11``) — one
  memory fetch per probe instead of k;
- zero false negatives; FPR follows the *blocked*-Bloom bound
  (Poisson-weighted per-block standard bound), not the ideal-Bloom formula —
  see ``theoretical_fpr``;
- merge = bitwise OR, replacing the reference's physical sharding of one
  logical filter across ranks/DPUs/tasklets (``src/pim_bloom_filter.cpp:77``).

Index derivation is xxhash-family double hashing (north rule): the block comes
from h1's high bits, the k in-block offsets from ``(h1 + i*h2) mod block_bits``
— replacing the reference's 10-seed hash table (``src/bloom_filter.hpp:271-299``).

All bulk paths are numpy-vectorized: positions are deduped+sorted once per
batch and OR-folded per 64-bit word with ``np.bitwise_or.reduceat`` (no Python
loop over items).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from ..hashing import DEFAULT_SEED, double_hashes
from .base import Sketch, register

BLOCK_BITS = 4096  # = 512 bytes, the DPU variant's block size


def bloom_positions(values: np.ndarray, size2: int, nb_hash: int, seed: int,
                    block_bits: int) -> np.ndarray:
    """(n*k,) uint64 global bit positions; k per item, all inside one block.

    Block index = top bits of h1 (so a power-of-two shard count owns a
    contiguous, block-aligned bit range — the basis of the sharded build);
    in-block offsets = (h1 + i*h2) mod block_bits (double hashing).
    Module-level so executors can compute positions for a *shard* of the
    filter without allocating the full bit array.
    """
    m_bits = 1 << size2
    block_bits = min(block_bits, m_bits)
    n_blocks = m_bits // block_bits
    h1, h2 = double_hashes(values, seed)
    n = h1.shape[0]
    i = np.arange(nb_hash, dtype=np.uint64)
    with np.errstate(over="ignore"):
        if n_blocks > 1:
            block = h1 >> np.uint64(64 - int(math.log2(n_blocks)))
            base = block * np.uint64(block_bits)
        else:
            base = np.zeros(n, dtype=np.uint64)
        off = (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(block_bits - 1)
        pos = base[:, None] + off
    return pos.reshape(n * nb_hash)


def scatter_or_bits(words: np.ndarray, pos: np.ndarray, pos_offset: int = 0) -> None:
    """OR the given bit positions into a uint64 word array. ``bitwise_or.at``
    handles duplicate indexes correctly and measured ~1.7x faster than a
    sort/unique + reduceat scheme (the sort of n*k positions was the single
    hottest step of the build at 10M-key scale)."""
    if pos_offset:
        pos = pos - np.uint64(pos_offset)
    w = (pos >> np.uint64(6)).astype(np.int64)
    bits = np.uint64(1) << (pos & np.uint64(63))
    np.bitwise_or.at(words, w, bits)


@register(1)
class BlockedBloomFilter(Sketch):
    kind = "bloom"

    def __init__(self, size2: int, nb_hash: int, seed: int = DEFAULT_SEED,
                 block_bits: int = BLOCK_BITS, blocked: bool = True):
        # reference validation: src/bloom_filter.hpp:31-36 and :272-274
        if size2 < 3:
            raise ValueError("size2 must be >= 3")
        if not (1 <= nb_hash < 10):
            raise ValueError("nb_hash must be in [1, 10)")
        if block_bits & (block_bits - 1):
            raise ValueError("block_bits must be a power of two")
        self.size2 = int(size2)
        self.nb_hash = int(nb_hash)
        self.seed = int(seed)
        self.m_bits = 1 << size2
        # blocked=False: the reference's BASIC/BASIC2 variants
        # (src/bloom_filter_factory.cpp:19-47, standard_bloom_filter.cpp:14-29)
        # place the k bits independently across the WHOLE filter — one block
        # spanning m. Minimum FPR at fixed m (the ideal-Bloom bound, no
        # blocked penalty and a vanishing double-hash floor), at the price of
        # k memory fetches per probe instead of 1.
        self.blocked = bool(blocked)
        self.block_bits = min(int(block_bits), self.m_bits) if blocked \
            else self.m_bits
        self.n_blocks = self.m_bits // self.block_bits
        n_words = max(1, self.m_bits // 64)
        self._words = np.zeros(n_words, dtype=np.uint64)

    # -- position derivation ---------------------------------------------------
    def _positions(self, values: np.ndarray) -> np.ndarray:
        """(n*k,) uint64 global bit positions, k per item, all in one block."""
        return bloom_positions(values, self.size2, self.nb_hash, self.seed,
                               self.block_bits)

    # chunk bulk ops so the k-wide position matrix stays cache-sized no
    # matter how many values one Arrow batch flattens to (a 65k-row batch of
    # 54-token arrays is 3.5M values -> 28M positions -> ~0.7 GB transients
    # without chunking; measured ~2x slower)
    _CHUNK = 1 << 19

    # -- build -------------------------------------------------------------------
    def insert_bulk(self, values: np.ndarray) -> None:
        values = np.asarray(values)
        for lo in range(0, values.size, self._CHUNK):
            chunk = values[lo:lo + self._CHUNK]
            scatter_or_bits(self._words, self._positions(chunk))

    # -- probe --------------------------------------------------------------------
    def contains_bulk(self, values: np.ndarray) -> np.ndarray:
        """Order-preserving bulk probe (reference contract:
        ``src/bloom_filter.hpp:55-58``): result[i] corresponds to values[i]."""
        values = np.asarray(values)
        if values.size == 0:
            return np.zeros(0, dtype=bool)
        out = np.empty(values.size, dtype=bool)
        for lo in range(0, values.size, self._CHUNK):
            chunk = values[lo:lo + self._CHUNK]
            pos = self._positions(chunk)
            words = (pos >> np.uint64(6)).astype(np.int64)
            bits = np.uint64(1) << (pos & np.uint64(63))
            hit = (self._words[words] & bits) != 0
            out[lo:lo + chunk.size] = hit.reshape(-1, self.nb_hash).all(axis=1)
        return out

    def contains(self, value) -> bool:
        return bool(self.contains_bulk(np.asarray([value]))[0])

    # -- aggregate ------------------------------------------------------------------
    _POPCNT16 = None  # lazy 64KB LUT shared across instances

    def get_weight(self) -> int:
        """Popcount of set bits (reference ``get_weight``,
        ``src/bloom_filter.hpp:62``; partial+final sum on DPU,
        ``src/dpu/bloom_filters_dpu.cpp:146-166``). 16-bit-LUT popcount: no
        8x temporary blowup like unpackbits on multi-GB filters."""
        if hasattr(np, "bitwise_count"):
            return int(np.bitwise_count(self._words).sum())
        if BlockedBloomFilter._POPCNT16 is None:
            BlockedBloomFilter._POPCNT16 = np.array(
                [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
            )
        lut = BlockedBloomFilter._POPCNT16
        return int(lut[self._words.view(np.uint16)].sum(dtype=np.int64))

    # -- merge / set algebra ------------------------------------------------------------
    def merge(self, other: "BlockedBloomFilter") -> "BlockedBloomFilter":
        self._check_mergeable(other)
        np.bitwise_or(self._words, other._words, out=self._words)
        return self

    def union(self, other: "BlockedBloomFilter") -> "BlockedBloomFilter":
        """Out-of-place union: exactly the filter of the concatenated inputs."""
        out = BlockedBloomFilter(**self.config())
        np.bitwise_or(self._words, other._words, out=out._words)
        return out

    def intersect(self, other: "BlockedBloomFilter") -> "BlockedBloomFilter":
        """Approximate intersection via bitwise AND. Unlike union this is NOT
        exactly the filter of the intersected sets: AND keeps bits that both
        sides set for different items, so it still has no false negatives for
        the true intersection but a higher FPR than a filter built from it
        directly (standard Bloom set-algebra caveat)."""
        out = BlockedBloomFilter(**self.config())
        np.bitwise_and(self._words, other._words, out=out._words)
        return out

    def estimate_cardinality(self) -> float:
        """Swamidass–Baldi estimate from the fill ratio:
        n ~ -(m/k) * ln(1 - X/m), X = popcount. Valid while the filter is not
        saturated; for serious cardinality work use the HLL sketch."""
        x = self.get_weight()
        if x >= self.m_bits:
            return float("inf")
        return -(self.m_bits / self.nb_hash) * math.log(1.0 - x / self.m_bits)

    # -- serialization -------------------------------------------------------------------
    def config(self) -> dict[str, Any]:
        return {
            "size2": self.size2,
            "nb_hash": self.nb_hash,
            "seed": self.seed,
            "block_bits": self.block_bits,
            "blocked": self.blocked,
        }

    # Payload wire form, self-describing by LENGTH (dense is exactly m/8
    # bytes; sparse is 1 + 4n or 1 + 8n, never equal to a power of two >= 2):
    #   raw m/8 word bytes                      dense (legacy form)
    #   b'S' + uint32[n] set-bit positions      sparse, size2 <= 32
    #   b'T' + uint64[n] set-bit positions      sparse, size2 > 32
    # Sparse is chosen automatically when smaller (fill < ~1/128). The win
    # is the partial-merge traffic: a build task that saw few keys ships KBs
    # instead of the full m/8 bytes — at the gated 2^24-bit geometry a
    # 32-partition build over small inputs moved 64 MB of mostly-zero
    # bitmaps to the driver before this (same motivation as the HLL sparse
    # form above; guide §2.3, shuffle/collect fewer bytes).
    def payload(self) -> bytes:
        wi = np.flatnonzero(self._words)
        if hasattr(np, "bitwise_count"):
            nbits = int(np.bitwise_count(self._words[wi]).sum())
        else:  # pragma: no cover — numpy < 2
            nbits = int(np.unpackbits(
                self._words[wi].view(np.uint8)).sum(dtype=np.int64))
        width = 4 if self.size2 <= 32 else 8
        if 1 + width * nbits < self.m_bits // 8:
            bits = np.unpackbits(
                self._words[wi].view(np.uint8),
                bitorder="little").reshape(-1, 64)
            rows, cols = np.nonzero(bits)
            pos = wi[rows] * 64 + cols
            if width == 4:
                return b"S" + pos.astype(np.uint32).tobytes()
            return b"T" + pos.astype(np.uint64).tobytes()
        return self._words.tobytes()

    def _load_payload(self, raw: bytes) -> None:
        n_bytes = self._words.size * 8
        if len(raw) == n_bytes:
            arr = np.frombuffer(raw, dtype=np.uint64)
            self._words = arr.copy()
            return
        tag = raw[:1]
        if tag not in (b"S", b"T"):
            raise ValueError("payload size mismatch for bloom geometry")
        dt = np.uint32 if tag == b"S" else np.uint64
        pos = np.frombuffer(raw, dtype=dt, offset=1).astype(np.uint64)
        if pos.size and int(pos.max()) >= self.m_bits:
            raise ValueError("sparse bloom payload position out of range")
        words = np.zeros(self._words.size, dtype=np.uint64)
        scatter_or_bits(words, pos)
        self._words = words

    @classmethod
    def _from_config(cls, cfg: dict[str, Any]) -> "BlockedBloomFilter":
        return cls(**cfg)

    # -- analysis ---------------------------------------------------------------------------
    def theoretical_fpr_bound(self, n_items: int) -> float:
        """Expected FPR of THIS construction (blocked + double-hashed), the sum
        of two effects:

        1. *Blocked* Bloom: E over Poisson block load b~Poi(n/B) of the
           standard per-block bound (1 - exp(-k*b/bb))**k — the reference pays
           the same penalty vs ideal Bloom (BASELINE.md: PIM 4096-bit blocks).
        2. *Double-hashing structural floor*: inside a bb-bit block the k
           offsets have only ~2*log2(bb) bits of freedom (a = h1 mod bb,
           d = h2 mod bb), so a probe collides with an inserted key that
           landed on the same (a, d) — or on (a+(k-1)d, -d), the reversed
           sequence — giving ~4*lam/bb^2 per probe, plus partially-overlapping
           shifts completed by random bits (factor ~(1+2q)). Measured
           empirically: ~85% of observed FPs at low load are exactly these
           (a, +/-d) matches. The reference's own measured FPR sits orders of
           magnitude above the ideal formula for the same structural reason
           (its in-block offsets come from a 16-bit hash family,
           ``src/bloom_filter.hpp:301-307``).
        """
        if n_items <= 0:
            return 0.0
        lam = n_items / self.n_blocks
        bb = self.block_bits
        if self.n_blocks == 1:
            # unblocked (BASIC) variant: the one "block" holds exactly n items
            # (no Poisson load variance), so the bound is the classic ideal
            # formula; the double-hash (a, +/-d) floor scales 1/m^2 and is
            # negligible at any practical m but kept for honesty.
            ideal = (1.0 - math.exp(-self.nb_hash * lam / bb)) ** self.nb_hash
            q = 1.0 - math.exp(-self.nb_hash * lam / bb)
            floor = 6.0 * lam / (bb * bb) * (1.0 + 2.0 * q) \
                if self.nb_hash > 1 else 0.0
            return ideal + floor
        sd = math.sqrt(max(lam, 1.0))
        lo = max(0, int(lam - 12 * sd))
        hi = int(lam + 12 * sd) + 8
        b = np.arange(lo, hi + 1, dtype=np.float64)
        logpmf = b * math.log(lam) - lam - np.array([math.lgamma(x + 1) for x in b])
        pmf = np.exp(logpmf)
        fpr_b = (1.0 - np.exp(-self.nb_hash * b / bb)) ** self.nb_hash
        blocked = float((pmf * fpr_b).sum() / max(pmf.sum(), 1e-300))
        q = 1.0 - math.exp(-self.nb_hash * lam / bb)  # fraction of bits set/block
        floor = 6.0 * lam / (bb * bb) * (1.0 + 2.0 * q) if self.nb_hash > 1 else 0.0
        return blocked + floor
