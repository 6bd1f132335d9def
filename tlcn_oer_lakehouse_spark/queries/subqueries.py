"""Correlated-subquery and grouping-set coverage, plus the pure-SQL API
surface (spark.sql over registered views) — exercising Catalyst's
decorrelation and multi-grouping rewrites, which the reference never
touches (its SQL usage is limited to MERGE statements).

Scale notes: Catalyst decorrelates the scalar subqueries below into
aggregate+join plans (no per-row re-execution); grouping sets expand to
a single pass with a grouping-id column, not one scan per set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.queries.base import QuerySpec, load


def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 shape: revenue from lineitems whose quantity is below 50% of
    their part's average quantity — correlated scalar subquery,
    decorrelated here as aggregate + join (what Catalyst produces for
    the subquery form)."""
    li = load(spark, sf, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("string").cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    j = li.join(part_avg, li.l_partkey == part_avg.pk)
    # no round() on avg_yearly: the VARCHAR-hopped decimal sum is
    # bit-identical across engines and /7.0 is IEEE-deterministic, but
    # round(y, 9) at ~1e10 magnitude asks for ~20 significant digits —
    # beyond double — and the engines' nearest-double answers differ in
    # the last ulp (caught by the r8 sf1.0 sweep on regenerated data).
    # The un-rounded quotient is already engine-identical.
    return j.filter(F.col("l_quantity") < 0.5 * F.col("avg_qty")).agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("string").cast("double") / 7.0
        ).alias("avg_yearly")
    )


Q17_SQL = """
WITH part_avg AS (
  SELECT l_partkey AS pk,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part_avg ON l_partkey = pk
WHERE l_quantity < 0.5 * avg_qty
"""


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 shape: per part, the supplier(s) with the minimum account
    balance among its suppliers — correlated min subquery as a window."""
    from pyspark.sql import Window

    li = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = load(spark, sf, "supplier")
    j = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    w = Window.partitionBy("l_partkey")
    out = (
        j.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("l_partkey", "l_suppkey", "s_name", "s_acctbal")
    )
    return out.filter(F.col("l_partkey") <= 500)


Q2_SQL = """
SELECT l_partkey, l_suppkey, s_name, s_acctbal
FROM (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
) li JOIN supplier ON l_suppkey = s_suppkey
WHERE l_partkey <= 500
  AND s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem) li2
    JOIN supplier s2 ON li2.sk = s2.s_suppkey
    WHERE li2.pk = li.l_partkey
  )
"""


def a_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS: (status, priority), (status), () in one pass —
    expressed through the SQL API over a temp view (the spark.sql
    surface; every other query uses the DataFrame API)."""
    load(spark, sf, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS STRING) AS DOUBLE) AS total_price,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS VARCHAR) AS DOUBLE) AS total_price,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY gid, o_orderstatus, o_orderpriority
"""


def q19_disjunctive_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs selective predicate across a join — tests
    disjunctive pushdown + broadcast."""
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30))
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    return j.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 5)
   OR (p_brand = 'Brand#3' AND p_size <= 30)
"""


SPECS = [
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_SQL,
              ref="TPC-H Q17 shape; correlated scalar subquery decorrelated",
              doc="revenue below half-average part quantity", tags=("tpch",)),
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL,
              ref="TPC-H Q2 shape; correlated MIN as window",
              doc="min-acctbal supplier per part", tags=("tpch",)),
    QuerySpec("a_grouping_sets", a_grouping_sets, GROUPING_SETS_SQL,
              ref="new capability (SURVEY §2.4: grouping sets absent); SQL API surface",
              doc="3-level grouping sets with grouping_id", tags=("agg",)),
    QuerySpec("q19_disjunctive_filter", q19_disjunctive_filter, Q19_SQL,
              ref="TPC-H Q19 shape; OR-of-ANDs pushdown",
              doc="disjunctive predicate revenue", tags=("tpch",)),
]
