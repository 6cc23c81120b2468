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

import json

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


# numeric-column stats travel as a 5-list ["i"|"f", min, max, sum, sumsq]
# (sum/sumsq are arbitrary-precision Python ints for integral columns, None
# for floating ones — float sums are summation-order-dependent, so emitting
# them would break the bit-exact merge contract; min/max comparisons are
# exact for BOTH classes, so merge == full scan stays bit-equal throughout)


def merge_stats(a: list | None, b: list | None) -> list | None:
    """min/max/sum/sumsq merge — associative, commutative, exact."""
    if a is None:
        return b
    if b is None:
        return a
    return [a[0], min(a[1], b[1]), max(a[2], b[2]),
            None if a[3] is None else a[3] + b[3],
            None if a[4] is None else a[4] + b[4]]


def _wrap_float_sum(u: np.ndarray, f: float) -> int:
    """Exact arbitrary-precision sum from a uint64 wraparound sum (exact
    mod 2^64) plus a float64 estimate that pins which multiple of 2^64
    the true value is. Exact while |float error| < 2^63 — guaranteed for
    Arrow-batch-sized arrays of per-term magnitude <= 2^64 (error is
    ~n^2 * ulp(max term) ~ n^2 * 2^11)."""
    w = int(u.sum(dtype=np.uint64))
    s = w - (1 << 64) if w >= (1 << 63) else w
    return s + (int(round((f - s) / 2.0 ** 64)) << 64)


def _exact_int_sum(v: np.ndarray, squares: bool = False) -> int:
    """Arbitrary-precision sum (or sum of squares) of an int64 array with
    no per-row Python. Plain sums use one wraparound+float-hint
    reconstruction. Sums of SQUARES cannot: a full-range int64 square is
    ~2^126 with float64 representation error up to 2^73, far past the
    2^63 recovery bound — so v splits into 32-bit halves (v = h*2^32 + l,
    exact) and v^2 = 2^64*h^2 + 2^33*h*l + l^2 sums as THREE per-term-
    bounded (< 2^64) exact reconstructions. Exact for ANY int64 input."""
    v = np.asarray(v, dtype=np.int64)
    if not squares:
        return _wrap_float_sum(v.view(np.uint64),
                               float(v.astype(np.float64).sum()))
    h = v >> 32                                  # signed floor high half
    l = (v & np.int64(0xFFFFFFFF)).view(np.uint64)   # unsigned low half
    hf = h.astype(np.float64)
    lf = l.astype(np.float64)
    s_h2 = _wrap_float_sum((h * h).view(np.uint64), float(np.dot(hf, hf)))
    s_hl = _wrap_float_sum((h * l.view(np.int64)).view(np.uint64),
                           float(np.dot(hf, lf)))
    s_l2 = _wrap_float_sum(l * l, float(np.dot(lf, lf)))
    return (s_h2 << 64) + (s_hl << 33) + s_l2


def fold_profile_row(agg: dict, column: str, n_rows: int, n_nulls: int,
                     raw_sketch: bytes, stats: list | None = None) -> None:
    """Fold one (column, counts, serialized-HLL, numeric stats) record
    into ``agg``."""
    slot = agg.setdefault(column, [0, 0, None, None])
    slot[0] += int(n_rows)
    slot[1] += int(n_nulls)
    if raw_sketch:
        sk = sketch_from_bytes(raw_sketch)
        slot[2] = sk if slot[2] is None else slot[2].merge(sk)
    slot[3] = merge_stats(slot[3], stats)


def profile_agg(df: DataFrame, columns: list[str] | None = None,
                hll_p: int = 14) -> dict:
    """The one-scan partial build, returned as the driver accumulator dict
    (the streaming fold consumes this directly — no DataFrame round
    trip)."""
    cols = columns or df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    sql_types = dict(df.dtypes)
    unhashable = frozenset(c for c in cols if not _hashable(dtypes[c]))
    int_cols = [c for c in cols
                if sql_types[c] in ("tinyint", "smallint", "int", "bigint")]
    flt_cols = [c for c in cols if sql_types[c] in ("float", "double")]
    # one projection: the hash stream for counts/NDV plus the raw values of
    # numeric columns (cast to a uniform width) for min/max/moments — still
    # ONE scan, zero exchanges
    sel = [
        (F.when(F.col(c).isNotNull(), F.lit(0).cast("long"))
         if c in unhashable
         else F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c)))).alias(c)
        for c in cols
    ]
    sel += [F.col(c).cast("long").alias(f"__vi{i}")
            for i, c in enumerate(int_cols)]
    sel += [F.col(c).cast("double").alias(f"__vf{i}")
            for i, c in enumerate(flt_cols)]
    hashed = df.select(*sel)

    def _partials(batches):
        sks = {c: make_sketch("hll", p=hll_p)
               for c in cols if c not in unhashable}
        n_rows = 0
        n_nulls = {c: 0 for c in cols}
        stats: dict = {c: None for c in cols}
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
            for j, c in enumerate(int_cols):
                arr = b.column(len(cols) + j)
                v = np.asarray(arr.drop_null().to_numpy(
                    zero_copy_only=False), dtype=np.int64)
                if v.size:
                    stats[c] = merge_stats(stats[c], [
                        "i", int(v.min()), int(v.max()),
                        _exact_int_sum(v), _exact_int_sum(v, squares=True)])
            for j, c in enumerate(flt_cols):
                arr = b.column(len(cols) + len(int_cols) + j)
                v = np.asarray(arr.drop_null().to_numpy(
                    zero_copy_only=False), dtype=np.float64)
                v = v[~np.isnan(v)]
                if v.size:
                    stats[c] = merge_stats(stats[c], [
                        "f", float(v.min()), float(v.max()), None, None])
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols),
             pa.array([n_rows] * len(cols), type=pa.int64()),
             pa.array([n_nulls[c] for c in cols], type=pa.int64()),
             pa.array([sks[c].to_bytes() if c in sks else b""
                       for c in cols], type=pa.binary()),
             pa.array([json.dumps(stats[c]) if stats[c] is not None else None
                       for c in cols], type=pa.string())],
            names=["column", "n_rows", "n_nulls", "sketch", "stats"])

    rows = hashed.mapInArrow(
        _partials, "column string, n_rows long, n_nulls long, "
                   "sketch binary, stats string"
    ).collect()
    agg: dict = {c: [0, 0, None, None] for c in cols}
    for r in rows:
        fold_profile_row(agg, r["column"], r["n_rows"], r["n_nulls"],
                         bytes(r["sketch"]),
                         json.loads(r["stats"]) if r["stats"] else None)
    return agg


def _stats_fields(st: list | None) -> tuple:
    """(min_long, max_long, min_double, max_double, sum_str, sumsq_str) —
    the typed projection of a stats 5-list: integral min/max as exact
    longs, floating min/max as doubles, exact integral sums as decimal
    strings (arbitrary precision; 10^12 rows of int64^2 overflows every
    fixed-width SQL type)."""
    if st is None:
        return (None, None, None, None, None, None)
    kind, mn, mx, s, s2 = st
    if kind == "i":
        return (int(mn), int(mx), None, None, str(s), str(s2))
    return (None, None, float(mn), float(mx), None, None)


def _agg_to_rows(agg: dict, with_sketch: bool) -> list[tuple]:
    out = []
    for c, (n, nn, sk, st) in agg.items():
        # sk is None only for columns that could not be hashed (map-bearing
        # types): counts are real, the NDV estimate is surfaced as NaN
        est = float(sk.estimate()) if sk is not None else float("nan")
        row = (c, n, nn, est) + _stats_fields(st)
        if with_sketch:
            row = row + (bytearray(sk.to_bytes()) if sk is not None
                         else bytearray(),)
        out.append(row)
    return out


_PROFILE_SCHEMA = ("column string, n_rows long, n_nulls long, "
                   "ndv_est double, min_long long, max_long long, "
                   "min_double double, max_double double, "
                   "sum_str string, sumsq_str string")
_PROFILE_SCHEMA_SK = _PROFILE_SCHEMA + ", sketch binary"


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  hll_p: int = 14, with_sketch: bool = False) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls, ndv_est,
    min_long, max_long, min_double, max_double, sum_str, sumsq_str
    [, sketch binary]). ``columns`` defaults to every column. The result
    is a tiny driver-assembled DataFrame (#columns rows); the scan
    underneath is the one-pass partial fold described in the module
    docstring.

    Numeric columns get ANALYZE-style stats, all merge-exact: integral
    columns carry exact min/max (min_long/max_long) and exact
    arbitrary-precision sum / sum-of-squares as decimal strings
    (sum_str/sumsq_str — mean and variance derive from them; 10^12 rows
    of squared int64 overflows every fixed-width SQL type, hence
    strings; exact for the FULL int64 range via the 32-bit hi/lo split,
    so xxhash64-valued key columns profile correctly); floating columns
    carry exact min/max over the NON-NaN values (NaN is treated as a
    missing measurement, like NULL — note engines' own max() instead
    sorts NaN greatest) but no float sums, which are summation-order-
    dependent and would break the bit-exact merge contract. Non-numeric
    columns leave all six NULL.

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
            if r["min_long"] is not None:
                st = ["i", r["min_long"], r["max_long"],
                      int(r["sum_str"]), int(r["sumsq_str"])]
            elif r["min_double"] is not None:
                st = ["f", r["min_double"], r["max_double"], None, None]
            else:
                st = None
            fold_profile_row(
                agg, r["column"], r["n_rows"], r["n_nulls"],
                bytes(r["sketch"]) if r["sketch"] is not None else b"", st)
    return spark.createDataFrame(_agg_to_rows(agg, True), _PROFILE_SCHEMA_SK)
