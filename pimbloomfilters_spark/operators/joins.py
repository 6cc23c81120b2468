"""Bloom runtime-filter join: semi-join reduction with OUR sketch.

The classic production use of a Bloom filter in a query engine: build a
filter over the small (dim) side's join keys, probe the big (fact) side
BEFORE its shuffle, and only join the survivors. No false negatives means the
final join result is EXACTLY the plain join's (false positives are removed by
the real join), while the prefilter cuts the fact side's shuffle volume by
its selectivity — at 100 TB that is the difference between shuffling the
whole fact table and shuffling the matching fraction.

Spark's optimizer has its own JVM-side variant (InjectRuntimeFilter with
BloomFilterAggregate) that fires only under specific plan shapes; this
operator is explicit, works with any of our sketch geometries (including
multi-GB sharded filters via ``operators/sharded.py``), and composes with the
rest of the sketch algebra (reuse a checkpointed filter across many queries).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, functions as F

from ..sketches import make_sketch
from .build import build_sketch
from .probe import probe_key_column


def bloom_prefilter(fact: DataFrame, sketch, key_col: str) -> DataFrame:
    """Rows of ``fact`` whose key MIGHT be in the sketch (no-FN guarantee:
    every true match survives; FP rows ride along at the sketch's FPR)."""
    return (
        probe_key_column(fact, sketch, key_col, out_col="_member")
        .filter(F.col("_member")).drop("_member")
    )


def bloom_runtime_filter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    size2: int = 24,
    nb_hash: int = 8,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """``fact JOIN dim ON fact_key = dim_key`` with a Bloom prefilter on the
    fact side. Result is exactly the plain join for inner/semi joins at ANY
    filter geometry (false positives die in the join; tested down to
    absurdly undersized filters). ``size2`` trades filter size against
    prefilter selectivity — FPR only costs extra shuffled rows, never
    correctness."""
    sk, _ = build_sketch(
        dim.select(dim_key), dim_key,
        functools.partial(make_sketch, "bloom", size2=size2, nb_hash=nb_hash),
    )
    pre = bloom_prefilter(fact, sk, fact_key)
    right = F.broadcast(dim) if broadcast_dim else dim
    return pre.join(right, pre[fact_key] == right[dim_key], how)
