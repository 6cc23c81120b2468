"""Sketch factory — the Spark analogue of the reference's filter factory
(``src/bloom_filter_factory.cpp:19-47``, enum at ``:7-13``): a single entry
point mapping a kind name + geometry kwargs to a concrete sketch."""

from __future__ import annotations

from .base import Sketch
from .bloom import BlockedBloomFilter
from .cms import CountMinSketch
from .hll import HyperLogLog
from .kll import KLLSketch
from .mg import MisraGries
from .tdigest import TDigest
from .theta import ThetaSketch

SKETCH_KINDS = {
    "bloom": BlockedBloomFilter,
    "hll": HyperLogLog,
    "cms": CountMinSketch,
    "kll": KLLSketch,
    "tdigest": TDigest,
    "mg": MisraGries,
    "theta": ThetaSketch,
}


def make_sketch(kind: str, **cfg) -> Sketch:
    try:
        cls = SKETCH_KINDS[kind]
    except KeyError:
        raise ValueError(f"unknown sketch kind {kind!r}; one of {sorted(SKETCH_KINDS)}")
    return cls(**cfg)
