"""Extended TPC-H-shape coverage: existence-correlated aggregation (Q4),
conditional-ratio aggregation (Q14), group-HAVING big orders (Q18), and
an event/order AS-OF join — the temporal-join class the reference never
had but a lakehouse serving event streams needs (SURVEY §2.3 notes
range/as-of joins as "free from Spark if needed"; here they are built
and verified).

Scale notes: Q4 uses a semi-join (no fact duplication before the agg);
Q14 is a single-scan conditional aggregate; Q18 aggregates lineitem on
its natural key before joining orders; the as-of join shuffles both
sides once on the equi-key and resolves the temporal predicate with ONE
window pass over the union (no per-row range probe, no cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.queries.base import QuerySpec, load, load_events


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Q4 shape: orders in 1996-H1 with ≥1 lineitem shipped after order
    date, counted per priority.  Semi-join, then aggregate."""
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 shape: % of 1996-03 revenue from PROMO parts.  Conditional
    decimal-exact sums; part side broadcasts."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load(spark, sf, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        F.round(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0).cast("decimal(28,6)"))).cast("string").cast("double")
            * 100.0
            / F.sum(rev).cast("double"),
            9,
        ).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT round(
         CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                       THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
                       ELSE CAST(0 AS DECIMAL(28,6)) END) AS VARCHAR) AS DOUBLE) * 100.0
         / CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE),
         9) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
"""


def q18_big_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds 250 — aggregate
    lineitem first (HAVING), then join orders + customer."""
    li = load(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def asof_last_event_before_order(spark: SparkSession, sf: str) -> DataFrame:
    """AS-OF join: for each 1996-01 order of users 1-150, the most recent
    event of that user at-or-before the order timestamp... shifted to the
    events' 2024 window by mapping order dates onto day-of-month.

    Implementation is the union+window pattern (the scalable as-of):
    tag both sides, union on the shared (user, time) ordering, and carry
    the last-seen event forward with one window — no range cross join,
    one shuffle on user_id."""
    ev = load_events(spark, sf).select(
        F.col("user_id"), F.col("ts").alias("t"), F.col("event_id"),
        F.lit(1).alias("is_event"),
    )
    orders = (
        load(spark, sf, "orders")
        .filter((F.col("o_custkey") >= 1) & (F.col("o_custkey") <= 150))
        .filter(F.col("o_orderdate").between("1996-01-01", "1996-01-31"))
        .select(
            (F.col("o_custkey") - 1).alias("user_id"),
            F.to_timestamp(
                F.concat(
                    F.lit("2024-01-"),
                    F.lpad(F.dayofmonth("o_orderdate").cast("string"), 2, "0"),
                    F.lit(" 12:00:00"),
                )
            ).alias("t"),
            F.col("o_orderkey"),
        )
        .withColumn("is_event", F.lit(0))
        .withColumn("event_id", F.lit(None).cast("long"))
    )
    unioned = ev.select(
        "user_id", "t", "event_id", "is_event", F.lit(None).cast("long").alias("o_orderkey")
    ).unionByName(
        orders.select("user_id", "t", "event_id", "is_event", "o_orderkey")
    )
    # events sort before orders at the same instant (is_event desc)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_event").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_event_id",
        F.last(F.when(F.col("is_event") == 1, F.col("event_id")), ignorenulls=True).over(w),
    ).withColumn(
        "last_event_ts",
        F.last(F.when(F.col("is_event") == 1, F.col("t")), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("is_event") == 0).select(
        "o_orderkey", "user_id", "last_event_id", "last_event_ts"
    )


ASOF_SQL = """
WITH ev AS (
  SELECT user_id, make_timestamp((epoch_ns(ts) // 1000000000) * 1000000) AS t, event_id
  FROM events
),
ord AS (
  SELECT (o_custkey - 1) AS user_id,
         CAST(('2024-01-' || lpad(CAST(day(o_orderdate) AS VARCHAR), 2, '0') || ' 12:00:00') AS TIMESTAMP) AS t,
         o_orderkey
  FROM orders
  WHERE o_custkey BETWEEN 1 AND 150
    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-01-31'
)
SELECT o.o_orderkey, o.user_id, e.event_id AS last_event_id, e.t AS last_event_ts
FROM ord o ASOF LEFT JOIN ev e
  ON o.user_id = e.user_id AND e.t <= o.t
"""


def a_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog++ distinct estimation per group — the approximate
    aggregate class (absent in the reference; essential at 100 TB where
    exact countDistinct shuffles every value).  HLL sketches are
    engine-specific, so the sketch value itself cannot hash-match an
    oracle; instead the query emits its ±5% accuracy bound as a boolean
    (next to the exact count), which IS oracle-checkable."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "n_rows",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("approx_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


APPROX_CD_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(*) AS n_rows,
       true AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


SPECS = [
    QuerySpec("a_approx_count_distinct", a_approx_count_distinct, APPROX_CD_SQL,
              ref="new capability (SURVEY §2.4: approx aggs unused in reference)",
              doc="HLL++ distinct parts per returnflag, ±5% bound as boolean",
              tags=("agg",)),
    QuerySpec("q4_order_priority", q4_order_priority, Q4_SQL,
              ref="TPC-H Q4 shape; semi-join existence agg",
              doc="priority counts for orders with late-shipped items", tags=("tpch",)),
    QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_SQL,
              ref="TPC-H Q14 shape; conditional decimal-exact ratio",
              doc="% revenue from PROMO parts", tags=("tpch",)),
    QuerySpec("q18_big_orders", q18_big_orders, Q18_SQL,
              ref="TPC-H Q18 shape; pre-join HAVING aggregation",
              doc="orders with total quantity > 250", tags=("tpch",)),
    QuerySpec("j_asof_event_order", asof_last_event_before_order, ASOF_SQL,
              ref="as-of join via union+window (SURVEY §2.3: absent in reference)",
              doc="last event per user at-or-before each order", tags=("join", "bench")),
]
