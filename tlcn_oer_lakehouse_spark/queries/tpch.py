"""Headline analytical queries (TPC-H-shaped) over the synthetic tables.

These are the bench workload and the widest-coverage correctness probes:
multi-agg grouped aggregation (SURVEY §2.4 A1-A3), star joins (§2.3 J6/J7),
selective filters with parquet pushdown (§2.2 P5), top-k ordering (§2.6
O1/O2).  Adapted to the columns present in TESTDATA.md's tables.

Plans are fully declarative — Catalyst chooses broadcast vs sort-merge
joins (nation/region/supplier/customer are broadcast-size at every SF; the
lineitem fact never moves except for its group-by shuffle, which AQE
coalesces).  At 100 TB the same plans hold: the only large shuffles are
keyed aggregations over the fact table, all joins against dims broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.queries.base import QuerySpec, load


def _dec2(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1: pricing summary report. Ref analog: grouped multi-agg
    gold_analytics.py:455-487 / 670-694 (A1) + ratio columns (A3)."""
    li = load(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(28,6)")).cast("string").cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(28,6)")).cast("string").cast("double").alias("sum_charge"),
            (F.sum(_dec2("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(_dec2("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("string").cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue for one market segment.
    Star join fact→orders→customer (J6); revenue agg (A1)."""
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "revenue",
        )
    )


Q3_SQL = """
SELECT
  l_orderkey,
  CAST(o_orderdate AS DATE) AS o_orderdate,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
"""


def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where supplier and customer share a nation,
    grouped by nation. Snowflake join chain (J7) with broadcast dims (J5)."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: selective-filter revenue delta. Pure pushdown probe (P5):
    the parquet scan must show PushedFilters on shipdate/discount/quantity."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer.

    ``c_acctbal`` is grouped raw but OUTPUT as ``c_acctbal + 0.0``: the
    sf10 probe caught a single NEGATIVE-ZERO balance (one customer in
    15M; no smaller scale has one) — Spark normalizes −0.0 → +0.0 in
    grouping keys (SPARK-26021) while DuckDB emits the stored −0.0, so
    the two canonical frames sorted differently and hash-diverged.
    IEEE (−0.0)+(+0.0) = +0.0 normalizes both engines identically; the
    general rule joins the decade-kill list: a FLOAT grouping key that
    is also an output column must be sign-normalized on both sides."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf, "nation")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "n_name",
            (F.col("c_acctbal") + F.lit(0.0)).alias("c_acctbal"),
            "revenue",
        )
    )


Q10_SQL = """
SELECT
  c_custkey, c_name, n_name, c_acctbal + 0.0 AS c_acctbal,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
"""


SPECS = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL,
              ref="gold_analytics.py:455-487 (A1/A3 grouped multi-agg + ratios)",
              doc="TPC-H Q1 pricing summary", tags=("bench", "agg")),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL,
              ref="gold_analytics.py:631-696 (J6 fact-dim joins)",
              doc="TPC-H Q3 segment revenue", tags=("bench", "join")),
    QuerySpec("q5_local_supplier_volume", q5_local_supplier_volume, Q5_SQL,
              ref="gold_analytics.py:542-554 (J7 snowflake joins)",
              doc="TPC-H Q5 local supplier volume", tags=("bench", "join")),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL,
              ref="transformer.py:1538-1557 (P3/P5 predicate stack)",
              doc="TPC-H Q6 selective filter agg", tags=("bench", "filter")),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL,
              ref="gold_analytics.py:609-723 (fact build joins+agg)",
              doc="TPC-H Q10 returned items", tags=("bench", "join")),
]
