"""Bucketed co-located join: same-bucketed fact tables join without any
shuffle Exchange, and results equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4,
                   sort_by="o_orderkey", path=str(wh / "b_orders"))
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=4,
                   sort_by="l_orderkey", path=str(wh / "b_lineitem"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join must use the bucket layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, ("o_orderkey", "l_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, ("o_orderkey", "l_orderkey"))
    got = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
    ).first()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        )
        .first()
    )
    assert (got.n, got.q) == (want.n, want.q)
