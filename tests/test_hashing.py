"""Hash oracle: numpy xxh64 must be bit-identical to Spark's F.xxhash64 on
longs — that's what lets SQL-side routing and UDF-side sketch hashing agree."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pimbloomfilters_spark.hashing import double_hashes, splitmix64, xxh64_u64


def test_xxh64_matches_spark(spark):
    vals = [0, 1, -1, 42, 2**31, -(2**31), 2**62, -(2**62), 123456789012345]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    expected = [r[0] for r in df.select(F.xxhash64("x")).collect()]
    ours = xxh64_u64(np.array(vals, dtype=np.int64).astype(np.uint64), seed=42)
    assert ours.astype(np.int64).tolist() == expected


def test_xxh64_seed_sensitivity(spark):
    vals = np.arange(1000, dtype=np.uint64)
    a = xxh64_u64(vals, seed=42)
    b = xxh64_u64(vals, seed=43)
    assert (a != b).mean() > 0.99


def test_double_hashes_h2_odd():
    _, h2 = double_hashes(np.arange(10_000, dtype=np.uint64))
    assert (h2 & np.uint64(1)).all()


def test_hash_uniformity():
    h = xxh64_u64(np.arange(100_000, dtype=np.uint64))
    # bucket into 64 bins; chi-square-ish sanity
    counts = np.bincount((h >> np.uint64(58)).astype(np.int64), minlength=64)
    assert counts.min() > 100_000 / 64 * 0.8
    assert counts.max() < 100_000 / 64 * 1.2


def test_splitmix64_deterministic():
    a = splitmix64(np.arange(100, dtype=np.uint64))
    b = splitmix64(np.arange(100, dtype=np.uint64))
    assert (a == b).all()
    assert len(np.unique(a)) == 100


def test_xxh64_sql_matches_numpy_at_arbitrary_seeds(spark):
    """The SQL-expression XXH64 must equal the numpy path bit-for-bit at
    seeds the builtin xxhash64 cannot express — the property that makes
    the full double-hashing family JVM-expressible."""
    import numpy as np

    from pimbloomfilters_spark.hashing import xxh64_sql, xxh64_u64

    keys = np.array([0, 1, -1, 2**63 - 1, -2**63, 123456789, -987654321,
                     0x9E3779B97F4A7C15 - 2**64], dtype=np.int64)
    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", False)
    try:
        for seed in (42, 0, 1, 42 + 0x9E37, 2**31, 7777777):
            got = np.array(
                [r["h"] for r in
                 df.selectExpr("k", f"{xxh64_sql('k', seed)} AS h")
                 .orderBy("k").collect()], dtype=np.int64)
            ks = np.array(sorted(keys.tolist()), dtype=np.int64)
            expect = xxh64_u64(ks.view(np.uint64), seed).view(np.int64)
            assert (got == expect).all(), seed
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_xxh64_sql_refuses_ansi_session(spark):
    """Constructing the wraparound-arithmetic expression in an ANSI
    session must fail fast at build time with the fix in the message —
    not as a runtime overflow mid-job. check_ansi=False opts out."""
    from pimbloomfilters_spark.hashing import xxh64_sql

    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", True)
    try:
        with pytest.raises(RuntimeError, match="ansi"):
            xxh64_sql("k", 7)
        assert isinstance(xxh64_sql("k", 7, check_ansi=False), str)
        spark.conf.set("spark.sql.ansi.enabled", False)
        assert isinstance(xxh64_sql("k", 7), str)  # non-ANSI: fine
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
