"""Checkpointed, resumable sketch builds with per-partition lineage+metrics.

North-rule requirement (SURVEY.md §2.3): at 10^12 rows a build is hours long;
losing the driver must not lose the work. The reference has no such facility
(its state is device-resident and rebuilt from scratch); this is new
engineering on top of the same build->merge algebra, enabled precisely
*because* partials are mergeable.

Design:
- the input is bucketed deterministically: ``bucket = pmod(xxhash64(key_col),
  n_buckets)`` — a pure function of the data, so a resumed run sees the exact
  same bucket contents regardless of cluster size or input partitioning;
- each bucket's partial sketch is appended to a Parquet checkpoint table
  ``(build_id, bucket, sketch_kind, sketch, n_rows, n_values, build_ms)`` —
  the lineage/metrics table (FIXTURES.md §5);
- resume = read the checkpoint, skip completed buckets (anti-join), build the
  missing ones, merge everything. Merge associativity guarantees the resumed
  result equals the uninterrupted one (tested byte-identically for
  bloom/hll/cms).
"""

from __future__ import annotations

import time
from typing import Callable, Iterable

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sketches import Sketch, sketch_from_bytes
from .build import flatten_arrow

CHECKPOINT_SCHEMA = (
    "build_id string, bucket int, sketch_kind string, sketch binary, "
    "n_rows long, n_values long, build_ms double"
)


def _bucketed(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


def _build_bucket_partials(df: DataFrame, col: str, key_col: str,
                           make: Callable[[], Sketch], build_id: str,
                           n_buckets: int) -> DataFrame:
    """One partial row per bucket. Buckets are data-determined (hash of
    key_col), so partials are reproducible across runs and cluster sizes."""

    kind = make().kind

    def _build(batches: Iterable[pa.RecordBatch]) -> Iterable[pa.RecordBatch]:
        sketches: dict[int, Sketch] = {}
        rows: dict[int, int] = {}
        vals: dict[int, int] = {}
        ms: dict[int, float] = {}  # per-bucket insert time: build_ms_sum must
        # total actual work, not partition wall time x buckets-per-partition
        for b in batches:
            buckets = b.column(1).to_numpy(zero_copy_only=False)
            data = b.column(0)
            # group rows of this Arrow batch by bucket (few per partition)
            import numpy as np

            order = np.argsort(buckets, kind="stable")
            sb = buckets[order]
            bounds = np.r_[0, np.flatnonzero(np.diff(sb)) + 1, len(sb)]
            arr = data.take(pa.array(order))
            for i in range(len(bounds) - 1):
                bk = int(sb[bounds[i]])
                chunk = arr.slice(bounds[i], bounds[i + 1] - bounds[i])
                v = flatten_arrow(chunk)
                sk = sketches.get(bk)
                if sk is None:
                    sk = sketches[bk] = make()
                    rows[bk] = vals[bk] = 0
                    ms[bk] = 0.0
                t0 = time.perf_counter()
                sk.insert_bulk(v)
                ms[bk] += (time.perf_counter() - t0) * 1000.0
                rows[bk] += bounds[i + 1] - bounds[i]
                vals[bk] += int(v.size)
        if sketches:
            ks = sorted(sketches)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([build_id] * len(ks), type=pa.string()),
                    pa.array(ks, type=pa.int32()),
                    pa.array([kind] * len(ks), type=pa.string()),
                    pa.array([sketches[k].to_bytes() for k in ks], type=pa.binary()),
                    pa.array([rows[k] for k in ks], type=pa.int64()),
                    pa.array([vals[k] for k in ks], type=pa.int64()),
                    pa.array([ms[k] for k in ks], type=pa.float64()),
                ],
                names=["build_id", "bucket", "sketch_kind", "sketch",
                       "n_rows", "n_values", "build_ms"],
            )

    bucketed = _bucketed(df, key_col, n_buckets).repartition(n_buckets, "_bucket")
    return bucketed.select(col, "_bucket").mapInArrow(_build, CHECKPOINT_SCHEMA)


def completed_buckets(spark: SparkSession, checkpoint_dir: str,
                      build_id: str) -> set[int]:
    try:
        cp = spark.read.parquet(checkpoint_dir)
    except Exception:
        return set()
    return {
        r["bucket"]
        for r in cp.filter(F.col("build_id") == build_id).select("bucket").distinct().collect()
    }


def build_with_checkpoint(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    key_col: str,
    make: Callable[[], Sketch],
    build_id: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
    fail_after_bucket: int | None = None,
) -> tuple[Sketch, dict]:
    """Build (or resume) a sketch with bucket-level checkpointing.

    ``fail_after_bucket`` is a test hook: persist only buckets < that id,
    then raise — simulating a mid-build crash.
    """
    done = completed_buckets(spark, checkpoint_dir, build_id)
    todo_df = _bucketed(df, key_col, n_buckets)
    if done:
        todo_df = todo_df.filter(~F.col("_bucket").isin(sorted(done)))
    partials = _build_bucket_partials(
        todo_df.drop("_bucket"), col, key_col, make, build_id, n_buckets
    )
    if fail_after_bucket is not None:
        partials = partials.filter(F.col("bucket") < fail_after_bucket)
    if done:
        # only write buckets we actually built this run
        partials = partials.filter(~F.col("bucket").isin(sorted(done)))
    partials.write.mode("append").parquet(checkpoint_dir)
    if fail_after_bucket is not None:
        raise RuntimeError(f"injected failure after bucket {fail_after_bucket}")

    from .build import collect_rows

    cp = spark.read.parquet(checkpoint_dir).filter(F.col("build_id") == build_id)
    rows = collect_rows(cp)
    rows.sort(key=lambda r: r["bucket"])
    seen: set[int] = set()
    sk = None
    metrics = {"n_rows": 0, "n_values": 0, "n_buckets": 0, "build_ms_sum": 0.0}
    for r in rows:
        if r["bucket"] in seen:  # idempotent re-append safety
            continue
        seen.add(r["bucket"])
        part = sketch_from_bytes(r["sketch"])
        sk = part if sk is None else sk.merge(part)
        metrics["n_rows"] += r["n_rows"]
        metrics["n_values"] += r["n_values"]
        metrics["n_buckets"] += 1
        metrics["build_ms_sum"] += r["build_ms"]
    if sk is None:
        raise ValueError(f"no checkpointed partials for build {build_id!r}")
    return sk, metrics
