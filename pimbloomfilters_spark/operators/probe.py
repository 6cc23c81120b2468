"""Bulk membership probe: broadcast sketch + vectorized pandas UDF.

Re-expresses ``PimBloomFilter::contains_bulk`` (``src/pim_bloom_filter.cpp:
214-349``). The reference ships original indexes with every bucket and
scatters results back to input order (``:296-306,448-473``); in Spark, a
projection preserves row identity, so order-alignment is free — the returned
boolean (or array<boolean>) column is row-aligned with the probed column by
construction (tested per the reference's order tests,
``tests/unit_test1.cpp:98-106``).

The merged sketch rides to executors as a SparkContext broadcast (one copy per
executor, not per task — the analogue of ``broadcast_to_rank``,
``src/pim_rankset.cpp:160-178``) and is deserialized once per executor via an
LRU keyed on the broadcast payload.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from ..sketches import Sketch, sketch_from_bytes


@lru_cache(maxsize=8)
def _cached_sketch(raw: bytes) -> Sketch:
    # bytes hash is computed once per object; broadcast.value is stable per
    # executor so this is effectively deserialize-once.
    return sketch_from_bytes(raw)


def _broadcast(df: DataFrame, sketch: Sketch):
    return df.sparkSession.sparkContext.broadcast(sketch.to_bytes())


def probe_key_column(df: DataFrame, sketch: Sketch, key_col: str,
                     out_col: str = "member") -> DataFrame:
    """Boolean membership per row for a scalar int64 key column."""
    bc = _broadcast(df, sketch)

    @pandas_udf("boolean")
    def _probe(keys: pd.Series) -> pd.Series:
        sk = _cached_sketch(bc.value)
        vals = keys.to_numpy(dtype=np.int64)
        return pd.Series(sk.contains_bulk(vals))

    return df.withColumn(out_col, _probe(F.col(key_col)))


def probe_array_column(df: DataFrame, sketch: Sketch, tokens_col: str,
                       out_col: str = "member") -> DataFrame:
    """array<boolean> membership, element-aligned with the token array —
    the row-aligned bulk-probe contract of ``src/bloom_filter.hpp:55-58``."""
    bc = _broadcast(df, sketch)

    @pandas_udf("array<boolean>")
    def _probe(arrs: pd.Series) -> pd.Series:
        sk = _cached_sketch(bc.value)
        lengths = np.fromiter(
            (0 if a is None else len(a) for a in arrs), dtype=np.int64, count=len(arrs)
        )
        if lengths.sum() == 0:
            return pd.Series([[] for _ in range(len(arrs))])
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in arrs if a is not None and len(a) > 0]
        )
        hits = sk.contains_bulk(flat)
        out = np.split(hits, np.cumsum(lengths)[:-1])
        return pd.Series([h.tolist() for h in out])

    return df.withColumn(out_col, _probe(F.col(tokens_col)))


def cms_count_column(df: DataFrame, sketch: Sketch, key_col: str,
                     out_col: str = "est_count") -> DataFrame:
    """Count-min point estimates per row (long)."""
    bc = _broadcast(df, sketch)

    @pandas_udf("long")
    def _query(keys: pd.Series) -> pd.Series:
        sk = _cached_sketch(bc.value)
        return pd.Series(sk.query_bulk(keys.to_numpy(dtype=np.int64)))

    return df.withColumn(out_col, _query(F.col(key_col)))
