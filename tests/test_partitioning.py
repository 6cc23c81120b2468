"""Salted repartitioning must actually flatten skew: the synthetic source
distribution gives one source ~60% of rows; plain repartition by source puts
them in one partition, the salted version spreads them ~evenly."""

import numpy as np
from pyspark.sql import functions as F

from pimbloomfilters_spark.operators import salted_repartition
from pimbloomfilters_spark.sources import generate_token_sequences


def _partition_sizes(df):
    return [
        r["c"] for r in df.withColumn("p", F.spark_partition_id())
        .groupBy("p").agg(F.count("*").alias("c")).collect()
    ]


def test_salting_flattens_skew(spark):
    df = generate_token_sequences(spark, 4_000, num_partitions=8).cache()
    df.count()
    # confirm the fixture is skewed as designed (~60% on one source)
    top = (df.groupBy("source").count().orderBy(F.desc("count")).first())
    assert top["count"] > 0.5 * 4_000

    plain = df.repartition(16, "source")
    salted = salted_repartition(df, ["source"], buckets=16, salt_on="doc_id",
                                num_partitions=16)
    p_sizes = np.array(_partition_sizes(plain))
    s_sizes = np.array(_partition_sizes(salted))
    assert p_sizes.max() >= top["count"]  # skewed source = one elephant task
    assert s_sizes.max() < 0.6 * p_sizes.max(), (p_sizes.max(), s_sizes.max())
    df.unpersist()
