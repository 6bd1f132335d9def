"""Fault-tolerant row processing with a status side-channel — U11
(transformer.py:1948-2012): the reference wrapped every RDD partition in
try/except with a 14-class failure taxonomy and capped error logging,
reduced on the driver.

Engine-native redesign: a ``mapInPandas`` wrapper that catches per-row
failures and emits them as a struct-typed status COLUMN instead of a
driver-side dict — the tagged-union side-output becomes two filters on
one DataFrame (same move as the U7 chunker redesign, SURVEY §2.8).
``ok_rows`` / ``error_rows`` split the stream; error rows carry the
failure class and message, so the metric aggregation is an ordinary
groupBy — distributed, not driver-bound.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_row_status(
    df: DataFrame,
    fn: Callable[[dict], dict],
    out_fields: str,
    id_col: str,
) -> DataFrame:
    """Apply ``fn`` (row-dict → out-dict) to every row; failures become
    rows with null outputs and a populated error struct.

    Output schema: ``{id_col} <input type>, <out_fields>, _status string,
    _error string`` where ``_status`` is 'ok' or the exception class
    name (the failure-taxonomy key)."""
    from pyspark.sql.types import StructType

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, {out_fields}, _status string, _error string"
    # parse out_fields with the real DDL parser: naive comma-splitting
    # breaks on types that contain commas (decimal(10,2), map<string,int>)
    out_names = StructType.fromDDL(out_fields).fieldNames()

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                base = {id_col: rec[id_col]}
                try:
                    out = fn(rec)
                    rows.append(
                        {**base, **{k: out.get(k) for k in out_names},
                         "_status": "ok", "_error": None}
                    )
                except Exception as e:  # noqa: BLE001 — taxonomy wrapper
                    rows.append(
                        {**base, **{k: None for k in out_names},
                         "_status": type(e).__name__, "_error": str(e)[:200]}
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(_apply, schema=schema)


def ok_rows(df: DataFrame) -> DataFrame:
    return df.filter(F.col("_status") == "ok").drop("_status", "_error")


def error_rows(df: DataFrame) -> DataFrame:
    return df.filter(F.col("_status") != "ok")


def status_metrics(df: DataFrame) -> DataFrame:
    """The distributed replacement for the reference's driver-side metric
    dicts: failure-class counts as an ordinary aggregation."""
    return df.groupBy("_status").agg(F.count(F.lit(1)).alias("n")).orderBy("_status")


def with_observed_metrics(df: DataFrame, name: str, conditions: dict[str, F.Column]):
    """Zero-cost pipeline metrics via ``DataFrame.observe``: each named
    condition becomes a count that rides the NEXT action on ``df`` —
    no extra pass, no second job (``status_metrics`` by contrast costs
    its own aggregation job).  This is how the reference's per-task
    metric dicts (transformer.py:1977-2012) should surface in Spark:
    accumulator-style, collected by the action that runs anyway.

    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action has consumed ``df``.  Works identically under batch and
    (with named observations) Structured Streaming."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(metric_name)
        for metric_name, cond in conditions.items()
    ]
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows"), *metrics), obs
