"""Unit tests for the declarative expectations operator (DLT analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.expectations import (
    ExpectationResult,
    Rule,
    expect,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "ok"),      # price violation (quarantine)
            (3, 20.0, None),      # status violation (drop) — null predicate
            (4, -1.0, "bad"),     # both → excluded once, routed to quarantine
            (5, 30.0, "ok"),
            (6, None, "ok"),      # null price → null predicate = violation
        ],
        "id LONG, price DOUBLE, status STRING",
    )


def _rules():
    return [
        Rule("price_positive", F.col("price") > 0, "quarantine"),
        Rule("status_known", F.col("status").isin("ok"), "drop"),
        Rule("id_small", F.col("id") < 100, "warn"),
    ]


def test_split_and_metrics(spark, frame):
    res = expect(frame, _rules())
    assert isinstance(res, ExpectationResult)
    clean_ids = {r.id for r in res.clean.collect()}
    assert clean_ids == {1, 5}
    q = {r.id: r for r in res.quarantined.collect()}
    assert set(q) == {2, 4, 6}
    assert q[2]["_violated_rules"] == ["price_positive"]
    m = {(r.rule): r.n for r in res.metrics.collect()}
    assert m["price_positive"] == 3      # ids 2, 4, 6
    assert m["status_known"] == 2        # ids 3, 4
    assert m["id_small"] == 0
    assert m["_rows_in"] == 6
    assert m["_rows_clean"] == 2         # id 4 excluded ONCE despite 2 rules
    assert m["_rows_quarantined"] == 3


def test_warn_keeps_rows(spark, frame):
    res = expect(frame, [Rule("always_fails", F.lit(False), "warn")])
    assert res.clean.count() == 6
    assert res.quarantined.count() == 0
    m = {r.rule: r.n for r in res.metrics.collect()}
    assert m["always_fails"] == 6 and m["_rows_clean"] == 6


def test_null_predicate_is_violation(spark, frame):
    res = expect(frame, [Rule("price_positive", F.col("price") > 0, "drop")])
    assert {r.id for r in res.clean.collect()} == {1, 3, 5}


def test_helper_columns_do_not_leak(spark, frame):
    res = expect(frame, _rules())
    assert res.clean.columns == frame.columns
    assert res.quarantined.columns == frame.columns + ["_violated_rules"]


def test_rule_validation(spark, frame):
    with pytest.raises(ValueError, match="unknown policy"):
        Rule("x", F.lit(True), "explode")
    with pytest.raises(ValueError, match="at least one"):
        expect(frame, [])
    with pytest.raises(ValueError, match="duplicate"):
        expect(frame, [Rule("a", F.lit(True)), Rule("a", F.lit(False))])


def test_single_pass_no_extra_scans(spark, frame):
    """All rule evaluation is map-only on one scan; the metrics agg is the
    only exchange-producing step."""
    from tlcn_oer_lakehouse_spark.plans import audit

    res = expect(frame, _rules())
    assert audit.exchange_count(res.clean) == 0  # pure filter, no shuffle


def test_partition_property_random_rules(spark):
    """Property: for ANY rule set, clean ∪ quarantined ∪ silently-dropped
    partitions the input; metrics totals agree with the frames."""
    import itertools

    rows = [(i, float(i % 7) - 3.0, ["ok", "bad", None][i % 3]) for i in range(60)]
    frame = spark.createDataFrame(rows, "id LONG, price DOUBLE, status STRING")
    preds = {
        "p_pos": F.col("price") > 0,
        "p_small": F.col("price") < 2,
        "s_ok": F.col("status").isin("ok"),
        "id_even": F.col("id") % 2 == 0,
    }
    policies = ["warn", "drop", "quarantine"]
    for combo in itertools.islice(
        itertools.product(policies, repeat=len(preds)), 0, None, 7
    ):
        rules = [Rule(n, p, pol) for (n, p), pol in zip(preds.items(), combo)]
        res = expect(frame, rules)
        clean_ids = {r.id for r in res.clean.collect()}
        quar_ids = {r.id for r in res.quarantined.collect()}
        m = {r.rule: r.n for r in res.metrics.collect()}
        assert clean_ids.isdisjoint(quar_ids)
        assert m["_rows_in"] == 60
        assert m["_rows_clean"] == len(clean_ids)
        assert m["_rows_quarantined"] == len(quar_ids)
        # every non-clean row violates at least one drop/quarantine rule
        assert len(clean_ids) + m["_rows_in"] - m["_rows_clean"] == 60
