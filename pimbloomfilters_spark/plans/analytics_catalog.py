"""Classic relational analytics over the TPC-H-ish testdata — not present in
the reference (SURVEY.md §2.4: it has no relational algebra at all), included
to demonstrate the engine rides on the full DataFrame/Catalyst surface.

FP discipline: monetary aggregates are summed as INTEGER CENTS
(round(x*100) -> bigint) in BOTH engines — double sums depend on
partition/summation order, and decimal results convert to pandas
differently per engine (Decimal objects vs floats); integer sums are exact,
order-free, and type-stable through any comparator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table
from .catalog import QuerySpec


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (decimal-exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(F.col(c) * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            F.sum(cents("l_extendedprice")).alias("sum_base_price_cents"),
            F.count("*").alias("count_order"),
        )
    )


_ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            AS sum_base_price_cents,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by decimal-exact total order value (window rank,
    deterministic tie-break on custkey)."""
    orders = load_table(spark, sf_dir, "orders")
    totals = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .alias("total_cents"))
    )
    # fixed k: orderBy().limit(k) compiles to TakeOrderedAndProject (per-
    # partition top-k + tiny merge), never a single-task global sort; the
    # rank window then runs over exactly k rows.
    top = totals.orderBy(F.desc("total_cents"), F.asc("o_custkey")).limit(10)
    w = Window.orderBy(F.desc("total_cents"), F.asc("o_custkey"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("o_custkey", "total_cents", "rank")
    )


_ORACLE_TOP_CUST = """
WITH totals AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, total_cents,
       CAST(row_number() OVER (ORDER BY total_cents DESC, o_custkey ASC) AS INT) AS rank
FROM totals QUALIFY rank <= 10
"""


ANALYTICS_CATALOG: dict[str, QuerySpec] = {
    "pricing_summary": QuerySpec(q_pricing_summary, _ORACLE_PRICING,
                                 "TPC-H Q1-shaped decimal-exact aggregation"),
    "top_customers": QuerySpec(q_top_customers, _ORACLE_TOP_CUST,
                               "window top-10 customers by order value"),
}
