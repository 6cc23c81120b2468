"""Warehouse-analytics demo: the library's data-engineering surfaces on the
TPC-H-ish testdata, end-to-end from the public API.

  1. profile every column of `customer` in one scan (row/null counts + HLL
     ndv) — the ANALYZE-style health check
  2. build a Bloom filter over `orders.o_custkey` and register it as a SQL
     function, then answer "customers with orders" in PLAIN SQL with a
     zero-shuffle probe scan
  3. persist `orders` and `customer` as bucketed tables and run the same
     join with ZERO exchanges — the write-once-shuffle-never path
  4. cross-check: SQL-probe survivors == bucketed-join keys == exact

Usage: python examples/warehouse_analytics.py [sf_dir]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pimbloomfilters_spark.operators import build_sketch, register_sql_functions  # noqa: E402
from pimbloomfilters_spark.operators.profile import profile_table  # noqa: E402
from pimbloomfilters_spark.session import get_spark  # noqa: E402
from pimbloomfilters_spark.sketches import make_sketch  # noqa: E402
from pimbloomfilters_spark.sources import read_bucketed, write_bucketed  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("warehouse-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"sf_dir": sf_dir}

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    report["profile"] = [r.asDict() for r in profile_table(customer).collect()]

    bf, _ = build_sketch(orders, "o_custkey",
                         functools.partial(make_sketch, "bloom",
                                           size2=22, nb_hash=8))
    register_sql_functions(spark, bf, prefix="orders")
    customer.createOrReplaceTempView("customer_v")
    sql_members = spark.sql(
        "SELECT c_custkey FROM customer_v WHERE orders_member(c_custkey)")
    report["sql_probe_members"] = sql_members.count()

    # at demo scale Spark would BROADCAST the small side (also exchange-
    # free in the shuffle sense, but it hides the bucketed plan this demo
    # exhibits); disable it so the co-located SortMergeJoin shows
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    with tempfile.TemporaryDirectory() as d:
        write_bucketed(orders.select("o_custkey", "o_totalprice"),
                       "wh_orders", "o_custkey", 8, sort_col="o_custkey",
                       path=f"{d}/orders")
        write_bucketed(customer.select("c_custkey", "c_mktsegment"),
                       "wh_customer", "c_custkey", 8, sort_col="c_custkey",
                       path=f"{d}/cust")
        j = read_bucketed(spark, "wh_customer").join(
            read_bucketed(spark, "wh_orders"),
            F.col("c_custkey") == F.col("o_custkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        report["bucketed_join_exchange_free"] = "Exchange" not in plan
        bucketed_keys = j.select("c_custkey").distinct().count()
        exact = customer.join(
            orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
            "c_custkey", "left_semi").count()
        report["bucketed_join_customers"] = bucketed_keys
        report["exact_customers_with_orders"] = exact
        report["sql_probe_no_false_negatives"] = \
            report["sql_probe_members"] >= exact
        report["consistent"] = bucketed_keys == exact
        spark.sql("DROP TABLE IF EXISTS wh_orders")
        spark.sql("DROP TABLE IF EXISTS wh_customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    print(json.dumps(report, default=str))
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
