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


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              out_col: str = "asof",
              salt_bucket_seconds: int | None = None,
              tolerance_seconds: int | float | None = None) -> DataFrame:
    """As-of (most-recent-prior) join: every left row gains ``out_col``, a
    struct of the right row with the LARGEST right_ts <= left_ts for the
    same ``on`` key (null when no prior right row exists) — the time-series
    primitive Spark SQL lacks natively (pricing a trade at the latest
    quote, attributing a purchase to the latest view, joining sensor
    readings to the latest calibration).

    Expressed as the classic union-marker plan rather than a join at all:
    tag both sides, union, and take per key the running ``last`` non-null
    right struct over event-time order (right rows sort BEFORE left rows at
    equal timestamps, giving <= semantics). ONE shuffle on the key, a
    per-key sort Spark spills as needed, zero Python — at any scale this is
    strictly cheaper than the naive range-join (which explodes to
    left x right per key). A pathologically hot key serializes into one
    task in the default plan; pass ``salt_bucket_seconds`` to salt it.

    ``salt_bucket_seconds``: hot-key salting by coarse time bucket. Every
    per-EVENT window then partitions by (key, bucket) instead of key alone
    — the one-in-a-billion power user splits across their time range — and
    cross-bucket carry-in resolves on a per-(key, bucket) DIGEST (one row
    per occupied bucket), so the only per-key-alone window runs over
    #buckets rows, not #events. Result is identical to the unsalted plan
    (right-ts ties per key resolve arbitrarily in BOTH plans). Set it near
    the hot key's event span / desired parallelism.

    ``tolerance_seconds``: pandas ``merge_asof(tolerance=)`` semantics —
    a match older than ``left_ts - tolerance`` is nulled out (a quote from
    last week should not price today's trade). Applied as a post-filter on
    the matched struct's own timestamp, so it composes with both plans at
    zero extra cost."""
    lcols, rcols = left.columns, right.columns
    rtype = right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
    ltype = left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
    l2 = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ats"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast(rtype).alias("_rrow"),
        F.lit(1).alias("_is_left"),
    )
    r2 = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ats"),
        F.lit(None).cast(ltype).alias("_lrow"),
        F.struct(*rcols).alias("_rrow"),
        F.lit(0).alias("_is_left"),
    )
    from pyspark.sql import Window

    lkind = dict(left.dtypes)[left_ts]
    rkind = dict(right.dtypes)[right_ts]

    def _secs(col, kind):
        # numeric event-time columns pass through; timestamp/date types
        # (incl. TIMESTAMP_NTZ, which cannot cast to double directly) go
        # via epoch micros
        if kind.startswith("timestamp") or kind == "date":
            return F.unix_micros(col.cast("timestamp")).cast("double") / 1e6
        return col.cast("double")

    def _tolerance(res: DataFrame) -> DataFrame:
        if tolerance_seconds is None:
            return res
        ok = (_secs(F.col(f"{out_col}.{right_ts}"), rkind)
              >= _secs(F.col(left_ts), lkind) - float(tolerance_seconds))
        return res.withColumn(out_col, F.when(ok, F.col(out_col)))

    if salt_bucket_seconds is None:
        w = (Window.partitionBy("_k").orderBy("_ats", "_is_left")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return _tolerance(
            l2.unionAll(r2)
            .withColumn(out_col, F.last("_rrow", ignorenulls=True).over(w))
            .filter(F.col("_is_left") == 1)
            .select("_lrow.*", out_col)
        )

    B = int(salt_bucket_seconds)

    def _bucket(c, kind):
        return F.floor(_secs(F.col(c), kind) / B).cast("long")

    l2 = l2.withColumn("_b", _bucket("_ats", lkind))
    r2 = r2.withColumn("_b", _bucket("_ats", rkind))
    # per-(key, bucket) digest of the right side: the bucket's LATEST right
    # struct — the hot key shrinks to its bucket count before any
    # per-key-alone window sees it
    rb = (r2.groupBy("_k", "_b")
          .agg(F.max_by("_rrow", "_ats").alias("_blast")))
    # carry-in for each left-occupied bucket b = latest right struct from
    # buckets STRICTLY before b (same-bucket right rows are ordered exactly
    # by the within-bucket window below). Union-marker again, over digests:
    # a left marker (_m=0) sorts before its own bucket's right digest
    # (_m=1), so `last` sees earlier buckets only.
    lmark = (l2.select("_k", "_b").distinct()
             .withColumn("_m", F.lit(0))
             .withColumn("_blast", F.lit(None).cast(rtype)))
    wb = (Window.partitionBy("_k").orderBy("_b", "_m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carry = (
        lmark.select("_k", "_b", "_m", "_blast")
        .unionByName(rb.withColumn("_m", F.lit(1))
                     .select("_k", "_b", "_m", "_blast"))
        .withColumn("_carry", F.last("_blast", ignorenulls=True).over(wb))
        .filter(F.col("_m") == 0)
        .select("_k", "_b", "_carry")
    )
    # within-bucket union-marker window — partitioned by (key, bucket),
    # the salted shape that bounds any single task by bucket occupancy
    wl = (Window.partitionBy("_k", "_b").orderBy("_ats", "_is_left")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = (
        l2.unionByName(r2)
        .withColumn("_win", F.last("_rrow", ignorenulls=True).over(wl))
        .filter(F.col("_is_left") == 1)
    )
    res = (
        within.join(carry, ["_k", "_b"], "left")
        .withColumn(out_col, F.coalesce("_win", "_carry"))
        .select("_lrow.*", out_col)
    )
    return _tolerance(res)


def range_join(left: DataFrame, right: DataFrame, left_ts: str,
               start_col: str, end_col: str, on: str | None = None,
               bucket_seconds: int = 3600,
               out_col: str = "range") -> DataFrame:
    """Interval-containment join: one output row per (left row, right
    interval) with ``start_col <= left_ts <= end_col`` (and equal ``on``
    key if given), the right row carried as the ``out_col`` struct — the
    second time-series primitive Spark SQL lacks a fast plan for (its
    BETWEEN join degenerates to a per-key cross product).

    Bucketed equi-join scheme: each interval replicates to every coarse
    time bucket it overlaps, each left row maps to its single bucket, and
    a plain hash equi-join on (key, bucket) + an exact containment filter
    finishes. A (left, interval) pair meets in exactly ONE bucket (the left
    row's), so no dedup is needed. Shuffle = left + intervals x avg bucket
    span; ``bucket_seconds`` trades replication against bucket selectivity
    (set it near the typical interval length)."""
    B = int(bucket_seconds)
    key = [on] if on else []
    lb = left.withColumn(
        "_b", F.floor(F.col(left_ts).cast("double") / B).cast("long"))
    rb = right.withColumn(
        "_b", F.explode(F.sequence(
            F.floor(F.col(start_col).cast("double") / B).cast("long"),
            F.floor(F.col(end_col).cast("double") / B).cast("long"))))
    rstruct = rb.select(
        *key, "_b", F.struct(*right.columns).alias(out_col),
        F.col(start_col).alias("_rs"), F.col(end_col).alias("_re"))
    return (
        lb.join(rstruct, key + ["_b"])
        .filter((F.col(left_ts) >= F.col("_rs"))
                & (F.col(left_ts) <= F.col("_re")))
        .drop("_b", "_rs", "_re")
    )
