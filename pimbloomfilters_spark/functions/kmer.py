"""DNA k-mer operators — the reference's own application domain.

BioPIM/PimBloomFilters exists to answer k-mer membership queries over
genomic sequence sets (insert a reference genome's k-mers into a Bloom
filter, probe the k-mers of sequencing reads; see the reference benchmarks'
key streams). This module provides that workflow natively:

- ``dna_kmers``: every (or every distinct) k-mer of a DNA string column as
  a 2-bit-packed int64 code — an exact BIJECTION for k <= 31 (A=0, C=1,
  G=2, T=3, base-4 big-endian), so set operations over codes equal set
  operations over k-mer strings. Windows containing any non-ACGT byte
  (N, etc.) are dropped, the standard convention. One flat vectorized pass
  per Arrow batch (lookup-table byte map + sliding window + boundary/N
  masking + per-doc lexsort distinct — the ``_batch_distinct_grams``
  shape from dedup.py).
- ``synth_dna``: deterministic synthetic genomes whose base at position j
  of sequence i is ``ACGT[((x*x) div 1000) % 4]``, x = i*211 + j*stride +
  shift — an arithmetic closed form BOTH engines can compute, so the
  driver's DuckDB oracle reproduces every k-mer code exactly without
  sharing any code with the operator.

The membership gate composes these with the ordinary Bloom build/probe:
reference k-mers -> filter -> probe read k-mers, per-read match counts
exact at the gated zero-FP geometry (the reference's read-screening loop,
re-expressed as two scans and a shipped filter — no join of the reads
against the reference set ever happens).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

# byte value -> 2-bit base code; 255 marks non-ACGT (invalidates a window)
_BASE_MAP = np.full(256, 255, dtype=np.uint8)
for _b, _c in zip(b"ACGT", range(4)):
    _BASE_MAP[_b] = _c


def _batch_distinct_kmers(seqs: list, k: int, canonical: bool = False):
    """Distinct packed k-mer codes for every sequence of a batch in one
    vectorized pass. Returns (packed, starts, doc_idx) with the
    ``_batch_distinct_grams`` contract. ``canonical=True`` replaces each
    code with min(code, reverse-complement code) — the strand-insensitive
    convention real genomics pipelines count (complement = 3 - base in the
    2-bit coding, order reversed), computed in the SAME loop."""
    enc = [(s or "").encode("ascii", "replace") for s in seqs]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    total = int(lens.sum())
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64),
             np.empty(0, np.int64))
    if total < k:
        return empty
    flat = _BASE_MAP[np.frombuffer(b"".join(enc), dtype=np.uint8)]
    w = np.lib.stride_tricks.sliding_window_view(flat, k)
    packed = np.zeros(w.shape[0], dtype=np.uint64)
    rc = np.zeros(w.shape[0], dtype=np.uint64)
    bad = np.zeros(w.shape[0], dtype=bool)
    for i in range(k):
        col = w[:, i]
        bad |= col == 255
        packed = (packed << np.uint64(2)) | col.astype(np.uint64)
        if canonical:
            # base i of the forward strand contributes (3 - base) at
            # mirrored position k-1-i of the RC, i.e. bit-shift 2*i
            rc |= ((np.uint64(3) - (w[:, i] & np.uint64(3)).astype(np.uint64))
                   << np.uint64(2 * i))
    if canonical:
        packed = np.minimum(packed, rc)
    ends = np.cumsum(lens)
    pos = np.arange(w.shape[0], dtype=np.int64)
    doc = np.repeat(np.arange(len(enc), dtype=np.int64), lens)[:w.shape[0]]
    valid = (pos + k <= ends[doc]) & ~bad
    packed, doc = packed[valid], doc[valid]
    if packed.size == 0:
        return empty
    order = np.lexsort((packed, doc))
    doc, packed = doc[order], packed[order]
    keep = np.r_[True, (doc[1:] != doc[:-1]) | (packed[1:] != packed[:-1])]
    doc, packed = doc[keep], packed[keep]
    starts = np.r_[0, np.flatnonzero(doc[1:] != doc[:-1]) + 1]
    return packed, starts, doc[starts]


def dna_kmers(df: DataFrame, seq_col: str = "seq", k: int = 21,
              id_col: str = "seq_id", canonical: bool = False) -> DataFrame:
    """(seq_id, kmer long): DISTINCT 2-bit-packed k-mers per sequence.
    k <= 31 so the packing is a bijection into int64; windows containing a
    non-ACGT byte are dropped; ``canonical=True`` counts strand-insensitive
    min(kmer, revcomp) codes. Linear mapInArrow scan — the 100 TB shape is
    a single pass over the sequence set, exactly like the text-gram
    extractors."""
    if not (1 <= k <= 31):
        raise ValueError(f"k must be 1..31 (2-bit packing), got {k}")

    def _km(batches):
        for b in batches:
            ids = b.column(0)
            seqs = b.column(1).to_pylist()
            packed, starts, doc_idx = _batch_distinct_kmers(seqs, k, canonical)
            cnt = np.zeros(len(seqs), dtype=np.int64)
            if packed.size:
                cnt[doc_idx] = np.diff(np.r_[starts, packed.size])
            out_ids = np.repeat(
                np.asarray(ids.to_numpy(zero_copy_only=False),
                           dtype=np.int64), cnt)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids), pa.array(packed.view(np.int64))],
                names=["seq_id", "kmer"])

    return df.select(id_col, seq_col).mapInArrow(
        _km, "seq_id long, kmer long")


def synth_dna(spark: SparkSession, n_seqs: int = 500, seq_len: int = 200,
              shift: int = 0, id_offset: int = 0,
              stride: int = 37) -> DataFrame:
    """(seq_id, seq): deterministic genomes — base j of sequence i is
    ``ACGT[((x*x) div 1000) % 4]`` with ``x = i*211 + j*stride + shift``, a
    closed form the SQL oracle recomputes exactly (the square's carry
    propagation de-periodizes the mod-4 residues; a linear form would
    collapse every sequence to an ACGT rotation). The residues are periodic
    in x mod 2000, so a constant ``shift`` stays INSIDE the population — a
    different ``stride`` (the per-position step) is what yields a DISJOINT
    k-mer population (contaminant reads; measured: stride 41 shares zero
    21-mers with the stride-37 set). ``id_offset`` relabels AND re-seeds
    (content is a pure function of the final seq_id). Built as ONE array
    expression per row (transform + array_join), so base order is
    positional by construction — no Python, no aggregation."""
    bases = F.array(*[F.lit(c) for c in "ACGT"])
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(seq_len - 1)),
        lambda j: F.element_at(
            bases,
            (((F.col("id") * 211 + j * stride + F.lit(shift))
              * (F.col("id") * 211 + j * stride + F.lit(shift)))
             .cast("long") % 4000 / 1000).cast("int") + 1),
    )
    # range over the FINAL ids so content is a pure function of seq_id
    return spark.range(id_offset, id_offset + n_seqs).select(
        F.col("id").alias("seq_id"), F.array_join(arr, "").alias("seq"))


def kmer_minhash_signatures(df: DataFrame, k: int = 21,
                            seq_col: str = "seq", id_col: str = "seq_id",
                            num_hashes: int = 256, seed: int = 7,
                            canonical: bool = True) -> DataFrame:
    """(seq_id, sig array<long>): MinHash signature over each sequence's
    distinct (canonical) k-mer set — the Mash sketch (Ondov et al. 2016,
    "Mash: fast genome and metagenome distance estimation using MinHash"):
    signature agreement estimates k-mer Jaccard, from which the Mash
    distance d = -ln(2j/(1+j))/k follows. Reuses the dedup module's
    splitmix-stream signature machinery over the packed k-mer codes — one
    linear scan per sequence set, signatures are ``num_hashes`` longs
    however large the genome."""
    from .dedup import _minhash_record_batch

    def _sig(batches):
        for b in batches:
            seqs = b.column(1).to_pylist()
            packed, starts, doc_idx = _batch_distinct_kmers(seqs, k, canonical)
            yield _minhash_record_batch(b.column(0), len(seqs), packed,
                                        starts, doc_idx, num_hashes, seed,
                                        False)

    return df.select(id_col, seq_col).mapInArrow(
        _sig, "doc_id long, sig array<long>").withColumnRenamed(
        "doc_id", "seq_id")


def mash_distance(jaccard, k: int = 21):
    """Column: Mash distance d = -ln(2j/(1+j))/k (Ondov et al. 2016, eq. 4)
    from a k-mer Jaccard (estimate or exact) — the mutation-rate scale
    biologists actually compare genomes on (j=1 -> d=0; j->0 -> d->inf,
    capped by callers if needed). A single fixed-shape float expression
    tree, so identical inputs produce bit-identical distances on any
    engine (the oracle-gate property)."""
    j = jaccard if not isinstance(jaccard, str) else F.col(jaccard)
    return -F.log(F.lit(2) * j / (F.lit(1) + j)) / F.lit(k)
