"""Bucketed-table persistence — the shuffle-amortization lever for 100 TB.

A big equi-join or groupBy shuffles its inputs on the key EVERY run; for a
table that is joined/aggregated on the same key repeatedly (the fact table
of an events store, the token table a dedup pipeline rescans per stage),
Spark's bucketed tables pay that shuffle ONCE at write time: data is
hash-partitioned into a fixed number of buckets on disk (optionally sorted
within buckets), and any later equi-join or aggregation on the bucket key
reads buckets co-located — the physical plan has NO Exchange (and with
sortBy, no Sort either on the sorted column). Plan-asserted in tests.

This is the write-side twin of the explicit ``repartition``/salting
operators in ``operators/partitioning.py``: use those for one-shot jobs,
use bucketing when the same key recurs across many jobs. Choose
``n_buckets`` so a bucket (table_size / n_buckets) fits an executor task
comfortably (the same sizing rule as shuffle partitions); both join sides
must share the bucket count (or be integer multiples) for the exchange to
be elided."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort_col: str | None = None,
                   path: str | None = None) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table registered in the session catalog. Overwrites ``table``."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet`` of the same files would lose it and reintroduce
    the shuffle)."""
    return spark.table(table)
