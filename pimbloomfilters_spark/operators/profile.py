"""Table profiling with mergeable sketches — the library's data-engineering
face: per-column row/null counts and HLL distinct-value estimates for a
whole table in ONE scan, the statistics `ANALYZE TABLE` computes but as
mergeable per-partition partials (so profiles of two table increments merge
by sketch algebra, and a profile build is resumable/checkpointable exactly
like any other sketch build).

100-TB shape: every column is xxhash64-coded JVM-side (one codegen
projection, nulls preserved), then a single ``mapInArrow`` pass folds ALL
columns' partials simultaneously — per (partition, column): row count, null
count off the Arrow validity mask (no value materialization), and an HLL
over the non-null hashes. The shuffle-free partials (KB each, #partitions x
#columns rows) fold on the driver like every other sketch build. One scan,
zero exchanges, any column count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..sketches import make_sketch, sketch_from_bytes


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  hll_p: int = 14, with_sketch: bool = False) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls, ndv_est
    double[, sketch binary]). ``columns`` defaults to every column. The
    result is a tiny driver-assembled DataFrame (#columns rows); the scan
    underneath is the one-pass partial fold described in the module
    docstring.

    ndv_est is the HLL estimate over xxhash64 of the column's non-null
    values — standard error ~1.04/sqrt(2^hll_p) (~0.8% at the default
    p=14), the same bound the HLL gates verify.

    ``with_sketch=True`` additionally carries each column's merged HLL
    payload, making profiles of table INCREMENTS first-class mergeable
    state: profile each new partition/day with the same (hll_p, columns),
    store the rows, and ``merge_profiles`` folds any subset into the exact
    profile a single scan of the union would produce (counts add, HLLs
    merge — deterministic, order-free)."""
    cols = columns or df.columns
    hashed = df.select(*[
        F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c))).alias(c)
        for c in cols
    ])

    def _partials(batches):
        sks = {c: make_sketch("hll", p=hll_p) for c in cols}
        n_rows = 0
        n_nulls = {c: 0 for c in cols}
        for b in batches:
            n_rows += b.num_rows
            for i, c in enumerate(cols):
                arr = b.column(i)
                n_nulls[c] += arr.null_count
                vals = arr.drop_null().to_numpy(zero_copy_only=False)
                if len(vals):
                    sks[c].insert_bulk(np.asarray(vals, dtype=np.int64))
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols),
             pa.array([n_rows] * len(cols), type=pa.int64()),
             pa.array([n_nulls[c] for c in cols], type=pa.int64()),
             pa.array([sks[c].to_bytes() for c in cols], type=pa.binary())],
            names=["column", "n_rows", "n_nulls", "sketch"])

    rows = hashed.mapInArrow(
        _partials, "column string, n_rows long, n_nulls long, sketch binary"
    ).collect()
    agg: dict[str, list] = {c: [0, 0, None] for c in cols}
    for r in rows:
        slot = agg[r["column"]]
        slot[0] += r["n_rows"]
        slot[1] += r["n_nulls"]
        sk = sketch_from_bytes(bytes(r["sketch"]))
        slot[2] = sk if slot[2] is None else slot[2].merge(sk)
    if with_sketch:
        out = [(c, agg[c][0], agg[c][1],
                float(agg[c][2].estimate()) if agg[c][2] is not None else 0.0,
                bytearray(agg[c][2].to_bytes()) if agg[c][2] is not None
                else bytearray())
               for c in cols]
        return df.sparkSession.createDataFrame(
            out, "column string, n_rows long, n_nulls long, ndv_est double, "
                 "sketch binary")
    out = [(c, agg[c][0], agg[c][1],
            float(agg[c][2].estimate()) if agg[c][2] is not None else 0.0)
           for c in cols]
    return df.sparkSession.createDataFrame(
        out, "column string, n_rows long, n_nulls long, ndv_est double")


def merge_profiles(*profiles: DataFrame) -> DataFrame:
    """Fold profiles built with ``with_sketch=True`` (same columns, same
    hll_p) into the profile of the UNION of their inputs: counts add,
    per-column HLLs merge — associative/commutative/deterministic, so
    incremental per-day/per-partition profiles compose exactly like every
    other sketch build. Returns the same (column, n_rows, n_nulls,
    ndv_est, sketch) shape, so merged profiles merge again."""
    if not profiles:
        raise ValueError("merge_profiles needs at least one profile")
    spark = profiles[0].sparkSession
    agg: dict[str, list] = {}
    order: list[str] = []
    for p in profiles:
        for r in p.collect():
            c = r["column"]
            if c not in agg:
                agg[c] = [0, 0, None]
                order.append(c)
            slot = agg[c]
            slot[0] += r["n_rows"]
            slot[1] += r["n_nulls"]
            raw = bytes(r["sketch"]) if r["sketch"] is not None else b""
            if raw:
                sk = sketch_from_bytes(raw)
                slot[2] = sk if slot[2] is None else slot[2].merge(sk)
    out = [(c, agg[c][0], agg[c][1],
            float(agg[c][2].estimate()) if agg[c][2] is not None else 0.0,
            bytearray(agg[c][2].to_bytes()) if agg[c][2] is not None
            else bytearray())
           for c in order]
    return spark.createDataFrame(
        out, "column string, n_rows long, n_nulls long, ndv_est double, "
             "sketch binary")
