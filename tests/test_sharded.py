"""Sharded (disjoint-bit-range) build/probe must agree exactly with the
broadcast path — same filter bytes, same probe answers."""

import functools

import numpy as np
import pytest
from pyspark.sql import functions as F

from pimbloomfilters_spark.operators import build_sketch, probe_key_column
from pimbloomfilters_spark.operators.sharded import (
    assemble_bloom,
    build_bloom_shards,
    build_bloom_sharded,
    probe_bloom_distributed,
)
from pimbloomfilters_spark.sketches import make_sketch

CFG = dict(size2=20, nb_hash=8)


@pytest.fixture(scope="module")
def keys_df(spark):
    df = spark.range(0, 50_000, numPartitions=8).cache()
    df.count()
    return df


def test_sharded_equals_plain_build(spark, keys_df):
    plain, _ = build_sketch(
        keys_df, "id", functools.partial(make_sketch, "bloom", **CFG)
    )
    sharded = build_bloom_sharded(keys_df, "id", n_shards=16, **CFG)
    assert sharded.payload() == plain.payload()


def test_sharded_array_column(spark):
    from pimbloomfilters_spark.sources import generate_token_sequences

    toks = generate_token_sequences(spark, 500, num_partitions=4).cache()
    plain, _ = build_sketch(
        toks, "tokens", functools.partial(make_sketch, "bloom", **CFG)
    )
    sharded = build_bloom_sharded(toks, "tokens", n_shards=16, **CFG)
    assert sharded.payload() == plain.payload()


def test_distributed_probe_matches_broadcast(spark, keys_df):
    shards = build_bloom_shards(keys_df, "id", n_shards=16, **CFG).cache()
    bf = assemble_bloom(shards.collect(), n_shards=16, **CFG)
    probes = spark.range(0, 60_000, numPartitions=4)  # 50k positives + 10k unknown
    dist = probe_bloom_distributed(probes, shards, "id", n_shards=16, **CFG)
    bcast = probe_key_column(probes, bf, "id")
    d = {r["id"]: r["member"] for r in dist.collect()}
    b = {r["id"]: r["member"] for r in bcast.collect()}
    assert d == b
    assert all(d[i] for i in range(0, 50_000, 997))  # no FN spot-check


def test_shard_validation():
    import pyspark.sql  # noqa: F401

    from pimbloomfilters_spark.operators.sharded import build_bloom_shards

    class FakeDF:  # only validation runs before df is touched
        pass

    with pytest.raises(ValueError):
        build_bloom_shards(FakeDF(), "x", size2=20, nb_hash=4, n_shards=48)
    with pytest.raises(ValueError):
        # 2^14 bits / 4096 block = 4 blocks < 16 shards
        build_bloom_shards(FakeDF(), "x", size2=14, nb_hash=4, n_shards=16)
