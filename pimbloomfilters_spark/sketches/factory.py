"""Sketch factory — the Spark analogue of the reference's filter factory
(``src/bloom_filter_factory.cpp:19-47``, enum at ``:7-13``): a single entry
point mapping a kind name + geometry kwargs to a concrete sketch."""

from __future__ import annotations

from .base import Sketch
from .bloom import BlockedBloomFilter
from .cms import CountMinSketch
from .countsketch import CountSketch
from .countingbloom import CountingBloomFilter
from .hll import HyperLogLog
from .kll import KLLSketch
from .mg import MisraGries
from .tdigest import TDigest
from .theta import ThetaSketch

SKETCH_KINDS = {
    "bloom": BlockedBloomFilter,
    "hll": HyperLogLog,
    "cms": CountMinSketch,
    "countsketch": CountSketch,
    "countingbloom": CountingBloomFilter,
    "kll": KLLSketch,
    "tdigest": TDigest,
    "mg": MisraGries,
    "theta": ThetaSketch,
}

# Geometry presets matching the reference factory's enum semantically
# (``src/bloom_filter_factory.cpp:7-13``; the SYNC_* variants differ only in
# thread synchronization, which Spark's single-writer partials make moot):
#   BASIC / SYNC_BASIC -> k independent bits across the whole filter
#                         (src/standard_bloom_filter.cpp:14-29)
#   CACHE / SYNC_CACHE -> 2^6-bit blocks (block_size2=6 default,
#                         src/standard_bloom_filter.cpp:94)
#   PIM                -> 4096-bit DPU blocks
#                         (BLOCK_MODULO 4095, src/dpu/bloom_filters_dpu.cpp:27)
BLOOM_VARIANTS = {
    "basic": dict(blocked=False),
    "cache": dict(block_bits=64),
    "pim": dict(block_bits=4096),
}


def make_sketch(kind: str, variant: str | None = None, **cfg) -> Sketch:
    if variant is not None:
        if kind != "bloom":
            raise ValueError("variant presets exist only for kind='bloom'")
        try:
            preset = BLOOM_VARIANTS[variant]
        except KeyError:
            raise ValueError(
                f"unknown bloom variant {variant!r}; one of {sorted(BLOOM_VARIANTS)}")
        cfg = {**preset, **cfg}
    try:
        cls = SKETCH_KINDS[kind]
    except KeyError:
        raise ValueError(f"unknown sketch kind {kind!r}; one of {sorted(SKETCH_KINDS)}")
    return cls(**cfg)
