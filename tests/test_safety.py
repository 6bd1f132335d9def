"""U11 status wrapper: per-row failures become typed side-output rows,
metrics are a distributed aggregation."""

from __future__ import annotations

from tlcn_oer_lakehouse_spark.operators.safety import (
    error_rows,
    ok_rows,
    status_metrics,
    with_row_status,
)


def test_status_split_and_metrics(spark):
    # defined inside the test: cloudpickle then serializes it by value,
    # so executors don't need the test module importable
    def _risky(rec: dict) -> dict:
        if rec["val"] == 0:
            raise ZeroDivisionError("division by zero")
        if rec["val"] < 0:
            raise ValueError(f"negative: {rec['val']}")
        return {"inv": 1.0 / rec["val"], "doubled": rec["val"] * 2}

    df = spark.createDataFrame(
        [(1, 4), (2, 0), (3, -5), (4, 2), (5, 0)], ["id", "val"]
    )
    wrapped = with_row_status(
        df, _risky, out_fields="inv double, doubled bigint", id_col="id"
    ).persist()

    ok = {r.id: (r.inv, r.doubled) for r in ok_rows(wrapped).collect()}
    assert ok == {1: (0.25, 8), 4: (0.5, 4)}

    errs = {r.id: r._status for r in error_rows(wrapped).collect()}
    assert errs == {2: "ZeroDivisionError", 3: "ValueError", 5: "ZeroDivisionError"}

    metrics = {r._status: r.n for r in status_metrics(wrapped).collect()}
    assert metrics == {"ok": 2, "ZeroDivisionError": 2, "ValueError": 1}

    # error payload retained for debugging
    e3 = error_rows(wrapped).filter("id = 3").first()
    assert "negative: -5" in e3._error


def test_observed_metrics_ride_the_action(spark):
    from pyspark.sql import functions as F

    from tlcn_oer_lakehouse_spark.operators.safety import with_observed_metrics

    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, 250.0), (4, None)], ["id", "value"]
    )
    observed, obs = with_observed_metrics(
        df,
        "ingest_gate",
        {
            "n_negative": F.col("value") < 0,
            "n_outlier": F.col("value") > 100,
            "n_null_value": F.col("value").isNull(),
        },
    )
    # one action drives BOTH the data and the metrics — no second job
    assert observed.count() == 4
    got = obs.get
    assert got == {"n_rows": 4, "n_negative": 1, "n_outlier": 1, "n_null_value": 1}
