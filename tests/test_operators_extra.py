"""Salted-join equivalence and approximate-aggregate sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    ).withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_nationkey")
    salted = salted_join(orders, cust, "o_custkey", salt=4).select(
        "o_orderkey", "c_nationkey"
    )
    assert plain.count() == salted.count()
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0


def test_salted_join_deterministic(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    a = salted_join(orders, cust, "o_custkey", salt=4)
    b = salted_join(orders, cust, "o_custkey", salt=4)
    assert a.subtract(b).count() == 0


def test_approx_count_distinct_close(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", 0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.1
