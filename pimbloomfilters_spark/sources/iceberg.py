"""Iceberg table access, gated on catalog availability.

The north rule targets "Iceberg tables of pre-tokenized training sequences at
10^12-sequence scale". This sandbox has no Iceberg runtime jars, so:

- ``iceberg_available(spark)`` feature-detects the catalog;
- ``read_input_table`` reads Iceberg when available, else falls back to
  Parquet (the driver testdata / local fixtures);
- ``write_iceberg_shaped`` writes the token table the way the Iceberg layout
  would shard it — partitioned by ``source`` with salted sub-splits for the
  skewed source — so partition pruning on ``source`` works the same way.

At 10^12 rows the things Iceberg buys (hidden partitioning, metadata-level
pruning, snapshot isolation for the checkpoint table) slot in here without
touching any operator code: everything downstream consumes a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_input_table(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Iceberg table name (catalog.db.table) when the runtime is present,
    else a Parquet path."""
    if "/" not in path_or_table and iceberg_available(spark):
        return spark.read.format("iceberg").load(path_or_table)
    return spark.read.parquet(path_or_table)


def write_iceberg_shaped(df: DataFrame, path: str, salt_buckets: int = 8) -> None:
    """Parquet stand-in for the Iceberg layout: partitioned by source with a
    salt sub-key so the dominant source doesn't produce elephant files."""
    (
        df.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)))
        .repartition("source", "_salt")
        .write.partitionBy("source").mode("overwrite").parquet(path)
    )
