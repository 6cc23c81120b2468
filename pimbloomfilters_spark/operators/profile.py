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
from pyspark.sql.types import ArrayType, MapType, StructType

from ..sketches import make_sketch, sketch_from_bytes


def _hashable(dt) -> bool:
    """Spark's hash/xxhash64 rejects MapType anywhere in a type tree (maps
    have no canonical element order); such columns get a counts-only
    profile instead of failing the whole scan."""
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True

# The driver-side accumulator shared by every profile path (single-scan
# build, profile merge, streaming fold): {column: [n_rows, n_nulls,
# Sketch|None]}. One fold and one output-shaping helper keep the
# "merge == full scan, bit-equal" invariant in exactly one place.


def fold_profile_row(agg: dict, column: str, n_rows: int, n_nulls: int,
                     raw_sketch: bytes) -> None:
    """Fold one (column, counts, serialized-HLL) record into ``agg``."""
    slot = agg.setdefault(column, [0, 0, None])
    slot[0] += int(n_rows)
    slot[1] += int(n_nulls)
    if raw_sketch:
        sk = sketch_from_bytes(raw_sketch)
        slot[2] = sk if slot[2] is None else slot[2].merge(sk)


def profile_agg(df: DataFrame, columns: list[str] | None = None,
                hll_p: int = 14) -> dict:
    """The one-scan partial build, returned as the driver accumulator dict
    (the streaming fold consumes this directly — no DataFrame round
    trip)."""
    cols = columns or df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    unhashable = frozenset(c for c in cols if not _hashable(dtypes[c]))
    hashed = df.select(*[
        (F.when(F.col(c).isNotNull(), F.lit(0).cast("long"))
         if c in unhashable
         else F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c)))).alias(c)
        for c in cols
    ])

    def _partials(batches):
        sks = {c: make_sketch("hll", p=hll_p)
               for c in cols if c not in unhashable}
        n_rows = 0
        n_nulls = {c: 0 for c in cols}
        for b in batches:
            n_rows += b.num_rows
            for i, c in enumerate(cols):
                arr = b.column(i)
                n_nulls[c] += arr.null_count
                if c in unhashable:
                    continue
                vals = arr.drop_null().to_numpy(zero_copy_only=False)
                if len(vals):
                    sks[c].insert_bulk(np.asarray(vals, dtype=np.int64))
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols),
             pa.array([n_rows] * len(cols), type=pa.int64()),
             pa.array([n_nulls[c] for c in cols], type=pa.int64()),
             pa.array([sks[c].to_bytes() if c in sks else b""
                       for c in cols], type=pa.binary())],
            names=["column", "n_rows", "n_nulls", "sketch"])

    rows = hashed.mapInArrow(
        _partials, "column string, n_rows long, n_nulls long, sketch binary"
    ).collect()
    agg: dict = {c: [0, 0, None] for c in cols}
    for r in rows:
        fold_profile_row(agg, r["column"], r["n_rows"], r["n_nulls"],
                         bytes(r["sketch"]))
    return agg


def _agg_to_rows(agg: dict, with_sketch: bool) -> list[tuple]:
    out = []
    for c, (n, nn, sk) in agg.items():
        # sk is None only for columns that could not be hashed (map-bearing
        # types): counts are real, the NDV estimate is surfaced as NaN
        est = float(sk.estimate()) if sk is not None else float("nan")
        if with_sketch:
            out.append((c, n, nn, est,
                        bytearray(sk.to_bytes()) if sk is not None
                        else bytearray()))
        else:
            out.append((c, n, nn, est))
    return out


_PROFILE_SCHEMA = "column string, n_rows long, n_nulls long, ndv_est double"
_PROFILE_SCHEMA_SK = _PROFILE_SCHEMA + ", sketch binary"


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  hll_p: int = 14, with_sketch: bool = False) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls, ndv_est
    double[, sketch binary]). ``columns`` defaults to every column. The
    result is a tiny driver-assembled DataFrame (#columns rows); the scan
    underneath is the one-pass partial fold described in the module
    docstring.

    ndv_est is the HLL estimate over xxhash64 of the column's non-null
    values — standard error ~1.04/sqrt(2^hll_p) (~0.8% at the default
    p=14), the same bound the HLL gates verify. Columns whose type
    contains a map (which Spark's xxhash64 rejects) still get exact
    row/null counts but surface ndv_est = NaN and an empty sketch instead
    of failing the whole scan.

    ``with_sketch=True`` additionally carries each column's merged HLL
    payload, making profiles of table INCREMENTS first-class mergeable
    state: profile each new partition/day with the same (hll_p, columns),
    store the rows, and ``merge_profiles`` folds any subset into the exact
    profile a single scan of the union would produce (counts add, HLLs
    merge — deterministic, order-free)."""
    agg = profile_agg(df, columns, hll_p)
    return df.sparkSession.createDataFrame(
        _agg_to_rows(agg, with_sketch),
        _PROFILE_SCHEMA_SK if with_sketch else _PROFILE_SCHEMA)


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
    agg: dict = {}
    for p in profiles:
        for r in p.collect():
            fold_profile_row(
                agg, r["column"], r["n_rows"], r["n_nulls"],
                bytes(r["sketch"]) if r["sketch"] is not None else b"")
    return spark.createDataFrame(_agg_to_rows(agg, True), _PROFILE_SCHEMA_SK)
