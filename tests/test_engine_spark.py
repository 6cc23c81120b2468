"""End-to-end Spark build/probe: the flagship slice (SURVEY.md §7 Phase 1)."""

import functools

import numpy as np
import pytest
from pyspark.sql import functions as F

from pimbloomfilters_spark.operators import (
    build_sketch,
    probe_array_column,
    probe_key_column,
    salted_repartition,
)
from pimbloomfilters_spark.operators.probe import cms_count_column
from pimbloomfilters_spark.sketches import BlockedBloomFilter, make_sketch
from pimbloomfilters_spark.sources import generate_token_sequences, token_table

bloom24 = functools.partial(make_sketch, "bloom", size2=24, nb_hash=8)


@pytest.fixture(scope="module")
def tokens_df(spark):
    df = generate_token_sequences(spark, 2_000, num_partitions=8).cache()
    df.count()
    return df


def test_build_probe_no_false_negatives(spark, tokens_df):
    sk, metrics = build_sketch(tokens_df, "tokens", bloom24)
    assert metrics["n_rows"] == 2_000
    probed = probe_array_column(tokens_df, sk, "tokens")
    # zero false negatives: every element of every row's tokens is a member
    bad = probed.filter(F.exists("member", lambda m: ~m)).count()
    assert bad == 0
    # per-row invariant: tokens array passes through unchanged & aligned
    row = probed.select("tokens", "member").first()
    assert len(row["tokens"]) == len(row["member"])


def test_build_matches_single_node(spark, tokens_df):
    """Distributed build == one-shot local build, byte-identical (the merge
    replaces the reference's rank/DPU sharding without changing the filter)."""
    sk, _ = build_sketch(tokens_df, "tokens", bloom24)
    local = bloom24()
    all_tokens = np.concatenate(
        [np.asarray(r["tokens"], dtype=np.int64) for r in tokens_df.collect()]
    )
    local.insert_bulk(all_tokens)
    assert sk.payload() == local.payload()


def test_partitioning_invariance(spark, tokens_df):
    """Permuted/re-partitioned input -> identical sketch bytes (SURVEY §5c)."""
    a, _ = build_sketch(tokens_df.repartition(3), "tokens", bloom24)
    b, _ = build_sketch(tokens_df.repartition(13, "source"), "tokens", bloom24)
    c, _ = build_sketch(salted_repartition(tokens_df, ["source"], buckets=4,
                                           salt_on="doc_id"), "tokens", bloom24)
    assert a.payload() == b.payload() == c.payload()


def test_distributed_merge_path(spark, tokens_df):
    a, _ = build_sketch(tokens_df, "tokens", bloom24)
    b, _ = build_sketch(tokens_df, "tokens", bloom24, distributed_merge=True)
    assert a.payload() == b.payload()


def test_probe_key_column_semijoin(spark, sf_dir):
    """Bloom as a runtime semi-join filter: build over orders.o_custkey, probe
    customer.c_custkey; no false negatives vs the exact semi-join."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sk, _ = build_sketch(orders, "o_custkey", bloom24)
    probed = probe_key_column(customer, sk, "c_custkey")
    truth = customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey", "left_semi",
    ).select("c_custkey")
    # every true member must be flagged (no FN)
    missed = truth.join(
        probed.filter(~F.col("member")).select("c_custkey"), "c_custkey", "inner"
    ).count()
    assert missed == 0


def test_hll_over_doc_ids(spark, tokens_df):
    hashed = tokens_df.select(F.xxhash64("doc_id").alias("h"))
    sk, _ = build_sketch(hashed, "h", functools.partial(make_sketch, "hll", p=14))
    est = sk.estimate()
    assert abs(est - 2000) <= 4 * sk.relative_error() * 2000


def test_cms_heavy_hitters(spark, tokens_df):
    sk, _ = build_sketch(
        tokens_df, "tokens",
        functools.partial(make_sketch, "cms", eps=1e-4, delta=1e-3),
    )
    exact = (
        tokens_df.select(F.explode("tokens").alias("t"))
        .groupBy("t").count().orderBy(F.desc("count")).limit(10).collect()
    )
    tops = np.array([r["t"] for r in exact], dtype=np.int64)
    true_counts = np.array([r["count"] for r in exact])
    est = sk.query_bulk(tops)
    assert (est >= true_counts).all()
    assert (est <= true_counts + sk.eps * sk.total).all()
    # column-wise point estimates
    df = spark.createDataFrame([(int(t),) for t in tops], "t long")
    rows = cms_count_column(df, sk, "t").collect()
    assert all(r["est_count"] >= tc for r, tc in zip(rows, true_counts.tolist()))


def test_kll_ntok_quantiles(spark, tokens_df):
    sk, _ = build_sketch(
        tokens_df, "n_tok", functools.partial(make_sketch, "kll", k=200)
    )
    exact = sorted(r["n_tok"] for r in tokens_df.select("n_tok").collect())
    n = len(exact)
    for q in (0.25, 0.5, 0.75):
        est = sk.quantile(q)
        lo = np.searchsorted(exact, est, side="left")
        hi = np.searchsorted(exact, est, side="right")
        band = sk.rank_error() * n + 1
        assert lo - band <= q * n <= hi + band


def test_token_table_derivation(spark, sf_dir):
    tt = token_table(spark, sf_dir)
    row = tt.first()
    assert row["n_tok"] == len(row["tokens"])
    assert all(t >= 1 for t in row["tokens"])
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert tt.count() == docs.count()


def test_generator_partitioning_independent(spark):
    a = generate_token_sequences(spark, 500, num_partitions=2)
    b = generate_token_sequences(spark, 500, num_partitions=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_nulls_in_keys_and_arrays(spark):
    """Null rows, null arrays, and null elements must not corrupt builds."""
    df = spark.createDataFrame(
        [(1, [1, 2, None]), (2, None), (3, []), (4, [7])],
        "doc_id long, tokens array<int>",
    )
    sk, metrics = build_sketch(df, "tokens", bloom24)
    assert metrics["n_values"] == 3  # 1,2,7 — the null element is dropped
    local = bloom24()
    local.insert_bulk(np.array([1, 2, 7], dtype=np.int64))
    # null element dropped => only 1,2,7 inserted
    sk2, m2 = build_sketch(
        spark.createDataFrame([(1, [1, 2]), (4, [7])], "doc_id long, tokens array<int>"),
        "tokens", bloom24)
    assert sk.payload() == sk2.payload() == local.payload()

    keys = spark.createDataFrame([(1,), (None,), (3,)], "k long")
    skk, mk = build_sketch(keys, "k", bloom24)
    lk = bloom24(); lk.insert_bulk(np.array([1, 3], dtype=np.int64))
    assert skk.payload() == lk.payload()


def test_register_sql_functions(spark):
    """Sketches usable from plain spark.sql: pbf_member filters exactly
    like probe_key_column (no false negatives, same rows at zero-FP
    geometry); pbf_count matches CMS point estimates; unsupported kinds
    raise."""
    import functools

    import numpy as np
    import pytest as _pt

    from pimbloomfilters_spark.operators import (
        build_sketch, probe_key_column, register_sql_functions)
    from pimbloomfilters_spark.sketches import make_sketch

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    bf, _ = build_sketch(df, "k", functools.partial(
        make_sketch, "bloom", size2=22, nb_hash=8))
    names = register_sql_functions(spark, bf, prefix="t1")
    assert names == ["t1_member"]
    df.createOrReplaceTempView("probe_t")
    sql_rows = {r["k"] for r in spark.sql(
        "SELECT k FROM probe_t WHERE t1_member(k)").collect()}
    api_rows = {r["k"] for r in probe_key_column(df, bf, "k")
                .filter("member").collect()}
    assert sql_rows == api_rows == set(range(5000))
    neg = spark.sql("""SELECT count(*) AS c FROM (
        SELECT explode(sequence(1000000, 1001000)) AS k) WHERE t1_member(k)
    """).collect()[0]["c"]
    assert neg == 0  # zero FP at this geometry/scale

    cms, _ = build_sketch(df.selectExpr("k % 10 AS k"), "k",
                          functools.partial(make_sketch, "cms",
                                            eps=1e-4, delta=1e-3))
    assert register_sql_functions(spark, cms, prefix="t2") == ["t2_count"]
    est = {r["k"]: r["c"] for r in spark.sql(
        "SELECT k, t2_count(k) AS c FROM (SELECT explode(sequence(0, 9)) AS k)"
    ).collect()}
    assert all(est[k] >= 500 for k in range(10))  # CMS never undercounts
    assert abs(np.mean(list(est.values())) - 500) < 5

    kll, _ = build_sketch(df, "k", functools.partial(make_sketch, "kll", k=200))
    with _pt.raises(ValueError):
        register_sql_functions(spark, kll)


def test_profile_table_nulls_and_ndv(spark):
    """One-scan profiler: exact null counts off the Arrow validity mask,
    HLL ndv within its published bound per column, across partitions."""
    from pyspark.sql import functions as F

    from pimbloomfilters_spark.operators.profile import profile_table

    n = 20_000
    df = (spark.range(n).repartition(8)
          .select(
              F.col("id"),
              F.when(F.col("id") % 7 != 0, F.col("id") % 100)
               .alias("mod_sparse"),
              F.when(F.col("id") % 2 == 0, F.concat(F.lit("s"),
                     (F.col("id") % 5000).cast("string"))).alias("s_half")))
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["id"]["n_rows"] == n and prof["id"]["n_nulls"] == 0
    assert prof["mod_sparse"]["n_nulls"] == len([i for i in range(n) if i % 7 == 0])
    assert prof["s_half"]["n_nulls"] == n // 2
    rse = 1.04 / (1 << 14) ** 0.5
    # even ids mod 5000 (even) hit only the 2500 even residues
    for col, exact in (("id", n), ("mod_sparse", 100), ("s_half", 2500)):
        est = prof[col]["ndv_est"]
        assert abs(est - exact) <= 4 * rse * exact + 3, (col, est, exact)


def test_merge_profiles_equals_full_scan(spark):
    """Incremental profiling: merge(profile(half1), profile(half2)) ==
    profile(full) EXACTLY (counts add; HLL merge is deterministic, so even
    the estimates are bit-equal), and merged profiles merge again."""
    from pyspark.sql import functions as F

    from pimbloomfilters_spark.operators.profile import (
        merge_profiles, profile_table)

    df = spark.range(30_000).select(
        F.col("id"),
        F.when(F.col("id") % 5 != 0, F.col("id") % 777).alias("v"))
    full = {r["column"]: r for r in
            profile_table(df, with_sketch=True).collect()}
    h1 = profile_table(df.filter(F.col("id") < 11_000), with_sketch=True)
    h2 = profile_table(df.filter(F.col("id") >= 11_000), with_sketch=True)
    merged = {r["column"]: r for r in merge_profiles(h1, h2).collect()}
    for c in ("id", "v"):
        assert merged[c]["n_rows"] == full[c]["n_rows"] == 30_000
        assert merged[c]["n_nulls"] == full[c]["n_nulls"]
        assert merged[c]["ndv_est"] == full[c]["ndv_est"]  # bit-equal
        assert bytes(merged[c]["sketch"]) == bytes(full[c]["sketch"])
    again = {r["column"]: r for r in
             merge_profiles(merge_profiles(h1), merge_profiles(h2)).collect()}
    assert bytes(again["v"]["sketch"]) == bytes(full["v"]["sketch"])


def test_sql_functions_null_keys_return_null(spark):
    """SQL scalar-function NULL semantics: pbf_member(NULL)/pbf_count(NULL)
    are NULL, not a task error, and keys beyond 2^53 stay EXACT even when
    the batch contains NULLs (the arrow_udf path; a pandas UDF would see
    float64+NaN and silently round large keys)."""
    import functools

    from pimbloomfilters_spark.operators import build_sketch, register_sql_functions
    from pimbloomfilters_spark.sketches import make_sketch

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    bf, _ = build_sketch(df, "k", functools.partial(
        make_sketch, "bloom", size2=22, nb_hash=8))
    register_sql_functions(spark, bf, prefix="tn")
    cms, _ = build_sketch(df, "k", functools.partial(
        make_sketch, "cms", eps=1e-4, delta=1e-3))
    register_sql_functions(spark, cms, prefix="tc")
    spark.createDataFrame(
        [(0,), (None,), (999,), (None,), (1_000_000,)], "k long"
    ).createOrReplaceTempView("null_probe_t")
    rows = spark.sql(
        "SELECT k, tn_member(k) AS m, tc_count(k) AS c FROM null_probe_t"
    ).collect()
    by_k = {r["k"]: (r["m"], r["c"]) for r in rows}
    assert by_k[0] == (True, 1) and by_k[999] == (True, 1)
    assert by_k[1_000_000][0] is False
    nulls = [r for r in rows if r["k"] is None]
    assert len(nulls) == 2
    assert all(r["m"] is None and r["c"] is None for r in nulls)
    # WHERE clause: NULL is not TRUE -> null-key rows filtered out, no error
    n = spark.sql(
        "SELECT count(*) AS n FROM null_probe_t WHERE tn_member(k)"
    ).collect()[0]["n"]
    assert n == 2
    # exactness beyond 2^53 with NULLs in the same batch: insert one huge
    # odd key; no-false-negatives requires member(exact key) = True, and a
    # float64 round-trip would probe the rounded (different) key instead
    big = 8888888888888888887
    bfd = spark.createDataFrame([(big,)], "k long")
    bf2, _ = build_sketch(bfd, "k", functools.partial(
        make_sketch, "bloom", size2=22, nb_hash=8))
    register_sql_functions(spark, bf2, prefix="tb")
    spark.createDataFrame([(big,), (None,), (-(2**63) + 1,)], "k long") \
        .coalesce(1).createOrReplaceTempView("big_probe_t")
    rows = {r["k"]: r["m"] for r in spark.sql(
        "SELECT k, tb_member(k) AS m FROM big_probe_t").collect()}
    assert rows[big] is True            # exact key found (no FN)
    assert rows[None] is None


def test_profile_table_skips_map_columns(spark):
    """A map column (xxhash64-rejecting type) must not fail the whole
    profile: counts stay exact, ndv_est surfaces as NaN."""
    import math

    from pyspark.sql import functions as F

    from pimbloomfilters_spark.operators.profile import profile_table

    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 4 != 0,
               F.create_map(F.lit("k"), F.col("id") % 10)).alias("m"))
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["id"]["n_rows"] == 1000 and prof["id"]["n_nulls"] == 0
    assert prof["id"]["ndv_est"] > 900
    assert prof["m"]["n_rows"] == 1000
    assert prof["m"]["n_nulls"] == 250
    assert math.isnan(prof["m"]["ndv_est"])


def test_profile_numeric_stats_exact(spark):
    """min/max/moments: exact integral min/max + arbitrary-precision
    sum/sumsq (closed-form check), exact float min/max, NULLs elsewhere;
    merge of split profiles reproduces the full scan EXACTLY."""
    from pyspark.sql import functions as F

    from pimbloomfilters_spark.operators.profile import (
        merge_profiles, profile_table)

    n = 10_000
    big = 3_000_000_000  # force sums past int64 sumsq comfort: big^2 = 9e18
    df = spark.range(n).select(
        (F.col("id") + big).alias("v"),
        (F.col("id").cast("double") / 8).alias("d"),
        F.concat(F.lit("s"), F.col("id")).alias("s"))
    prof = {r["column"]: r for r in profile_table(df).collect()}
    vs = [i + big for i in range(n)]
    assert prof["v"]["min_long"] == big
    assert prof["v"]["max_long"] == big + n - 1
    assert int(prof["v"]["sum_str"]) == sum(vs)
    assert int(prof["v"]["sumsq_str"]) == sum(x * x for x in vs)  # ~9e22
    assert prof["d"]["min_double"] == 0.0
    assert prof["d"]["max_double"] == (n - 1) / 8
    assert prof["d"]["sum_str"] is None and prof["d"]["min_long"] is None
    assert prof["s"]["min_long"] is None and prof["s"]["min_double"] is None
    h1 = profile_table(df.filter(F.col("v") % 3 == 0), with_sketch=True)
    h2 = profile_table(df.filter(F.col("v") % 3 != 0), with_sketch=True)
    merged = {r["column"]: r for r in merge_profiles(h1, h2).collect()}
    full = {r["column"]: r for r in
            profile_table(df, with_sketch=True).collect()}
    for c in ("v", "d", "s"):
        for f in ("n_rows", "n_nulls", "ndv_est", "min_long", "max_long",
                  "min_double", "max_double", "sum_str", "sumsq_str"):
            assert merged[c][f] == full[c][f], (c, f)


def test_probe_paths_null_and_large_key_safety(spark):
    """probe_keys / probe_count drop NULL keys instead of float64-
    corrupting the batch; probe_array_column masks NULL elements to NULL
    output slots; all paths stay exact for |key| > 2^53."""
    import functools

    from pimbloomfilters_spark.operators import build_sketch
    from pimbloomfilters_spark.operators.probe import (
        probe_array_column, probe_count, probe_keys)
    from pimbloomfilters_spark.sketches import make_sketch

    big = 8888888888888888887  # odd, rounds to a DIFFERENT key in float64
    bf, _ = build_sketch(spark.createDataFrame([(big,), (5,)], "k long"),
                         "k", functools.partial(make_sketch, "bloom",
                                                size2=22, nb_hash=8))
    probe = spark.createDataFrame(
        [(big,), (None,), (5,), (big - 64,)], "k long").coalesce(1)
    rows = {r["k"]: r["member"] for r in probe_keys(probe, bf, "k").collect()}
    assert rows[big] is True and rows[5] is True     # exact keys found
    assert None not in rows and len(rows) == 3       # null key dropped
    n, hits = probe_count(probe, bf, "k")
    assert n == 3 and hits >= 2
    arr_df = spark.createDataFrame(
        [(1, [big, None, 5]), (2, None)], "id long, toks array<long>"
    ).coalesce(1)
    got = {r["id"]: r["member"]
           for r in probe_array_column(arr_df, bf, "toks").collect()}
    assert got[1][0] is True and got[1][1] is None and got[1][2] is True
    assert got[2] == []
