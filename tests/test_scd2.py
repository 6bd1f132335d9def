"""SCD2 dimension merge: version chains, current-row uniqueness,
interval continuity, idempotence, and point-in-time reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.scd2 import (
    scd2_as_of,
    scd2_init,
    scd2_merge,
)

T1, T2, T3 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "cust_id bigint, segment string, country string"
    )


def test_scd2_full_lifecycle(spark):
    dim = scd2_init(_batch(spark, [(1, "basic", "DE"), (2, "pro", "FR")]), T1)

    # t2: customer 1 upgrades, customer 3 appears, customer 2 unchanged
    dim = scd2_merge(
        dim,
        _batch(spark, [(1, "pro", "DE"), (2, "pro", "FR"), (3, "basic", "ES")]),
        "cust_id", ["segment", "country"], T2,
    )
    rows = {(r.cust_id, r.segment, r.is_current): r for r in dim.collect()}
    assert len(rows) == 4
    old1 = rows[(1, "basic", False)]
    assert str(old1.valid_to) == T2 and str(old1.valid_from) == T1
    new1 = rows[(1, "pro", True)]
    assert str(new1.valid_from) == T2 and new1.valid_to is None
    assert (2, "pro", True) in rows and (3, "basic", True) in rows

    # exactly one current row per key
    cur_counts = (
        dim.filter("is_current").groupBy("cust_id").count().collect()
    )
    assert all(r["count"] == 1 for r in cur_counts)

    # t3: customer 1 changes again -> 3-version chain with contiguous intervals
    dim = scd2_merge(
        dim, _batch(spark, [(1, "enterprise", "DE")]),
        "cust_id", ["segment", "country"], T3,
    )
    chain = sorted(
        dim.filter("cust_id = 1").collect(), key=lambda r: str(r.valid_from)
    )
    assert [r.segment for r in chain] == ["basic", "pro", "enterprise"]
    for prev, nxt in zip(chain, chain[1:]):
        assert str(prev.valid_to) == str(nxt.valid_from)
    assert [r.is_current for r in chain] == [False, False, True]


def test_scd2_idempotent_remerge(spark):
    dim = scd2_init(_batch(spark, [(1, "basic", "DE")]), T1)
    merged = scd2_merge(
        dim, _batch(spark, [(1, "basic", "DE")]),
        "cust_id", ["segment", "country"], T2,
    )
    assert merged.count() == 1
    assert merged.first().is_current


def test_scd2_null_attr_change_detected(spark):
    dim = scd2_init(_batch(spark, [(1, "basic", None)]), T1)
    merged = scd2_merge(
        dim, _batch(spark, [(1, "basic", "")]),
        "cust_id", ["segment", "country"], T2,
    )
    # NULL -> '' is a real change (null-safe fingerprint)
    assert merged.count() == 2


def test_scd2_as_of(spark):
    dim = scd2_init(_batch(spark, [(1, "basic", "DE")]), T1)
    dim = scd2_merge(
        dim, _batch(spark, [(1, "pro", "DE")]),
        "cust_id", ["segment", "country"], T2,
    )
    assert scd2_as_of(dim, "2024-01-15 00:00:00").first().segment == "basic"
    assert scd2_as_of(dim, T3).first().segment == "pro"
    # as-of exactly the transition instant sees the NEW version
    assert scd2_as_of(dim, T2).first().segment == "pro"


def test_scd2_plan_is_keyed_joins_only(spark):
    from tlcn_oer_lakehouse_spark.plans import audit

    dim = scd2_init(_batch(spark, [(1, "basic", "DE"), (2, "pro", "FR")]), T1)
    merged = scd2_merge(
        dim, _batch(spark, [(1, "pro", "DE")]),
        "cust_id", ["segment", "country"], T2,
    )
    plan = audit.simple_plan(merged)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
