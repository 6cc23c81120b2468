"""Skew handling: salted-key repartitioning (north-rule requirement).

The reference load-balances by hashing every item to a (rank, DPU) with
fastrange (``src/pim_bloom_filter.cpp:29-43``) — uniform because the hash is.
A DataFrame partitioned by a *skewed* column (e.g. one ``source`` holding 60%
of rows) has no such luck, so we salt: repartition on (keys..., salt) where
salt = xxhash64(salt_on) % buckets. Sketch merges are assoc/comm, so salting
never changes results — it only flattens task sizes. AQE skew-join handling is
additionally enabled in session.py for the join paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(df: DataFrame, keys: list[str], buckets: int = 16,
                       salt_on: str | None = None, num_partitions: int | None = None,
                       salt_col: str = "_salt") -> DataFrame:
    """Repartition by (keys..., salt) to split skewed key groups across
    ``buckets`` partitions each. ``salt_on`` defaults to the first key —
    prefer a high-cardinality column (e.g. doc_id) so the salt is uniform."""
    src = salt_on or keys[0]
    salted = df.withColumn(salt_col, F.pmod(F.xxhash64(F.col(src)), F.lit(buckets)))
    cols = [F.col(k) for k in keys] + [F.col(salt_col)]
    out = salted.repartition(num_partitions, *cols) if num_partitions else salted.repartition(*cols)
    return out.drop(salt_col)
