"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the arbitrary-state API (SURVEY §2.9: the reference has no stateful
streaming at all; this is the north-star capability for late-data and
cross-batch semantics Spark's built-in windows can't express).

``running_user_totals`` keeps one (count, total) pair per user across
micro-batches: state lives in the state store (RocksDB-backed on a real
cluster), survives restarts via the checkpoint, and is updated with
Arrow-batched pandas — no driver involvement, partitioned by the
grouping key."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("value_total", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_total", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "value_total": [total]}
    )


def running_user_totals(stream_df: DataFrame) -> DataFrame:
    """Per-user running (count, sum) across micro-batches.  Input needs
    ``user_id`` and ``value`` columns."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 successor API
# ---------------------------------------------------------------------------


def running_user_totals_tws(stream_df: DataFrame) -> DataFrame:
    """Same per-user running (count, sum) semantics as
    :func:`running_user_totals`, on ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API this engine targets going forward:
    typed state variables (ValueState/ListState/MapState) with optional
    TTL, timers, and an evolution path the legacy flatMapGroupsWithState
    shim lacks.  Kept alongside the ``applyInPandasWithState`` form so
    both API generations are covered and cross-checked by the same
    checkpoint-recovery test."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n_events long, value_total double"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = (
                tuple(self._totals.get()) if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_total": [total]}
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
