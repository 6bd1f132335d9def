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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


TRENDING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("rank", LongType()),
        StructField("event_type", StringType()),
        StructField("cnt", LongType()),
    ]
)

# map-as-parallel-arrays state for the applyInPandasWithState form
# (that API's state is one fixed struct; TWS gets a real MapState below)
_TRENDING_STATE = StructType(
    [
        StructField("types", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _top_rows(user_id, counts: dict, k: int) -> pd.DataFrame:
    top = sorted(counts.items(), key=lambda tc: (-tc[1], tc[0]))[:k]
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(top),
            "rank": list(range(1, len(top) + 1)),
            "event_type": [t for t, _ in top],
            "cnt": [c for _, c in top],
        }
    )


def user_trending_types(stream_df: DataFrame, k: int = 3) -> DataFrame:
    """Per-user trending event types on ``applyInPandasWithState``:
    per-type running counters (a map encoded as parallel arrays — this
    API's state is one fixed struct) accumulated across micro-batches,
    emitting the user's current top-``k`` (count desc, type asc) on
    every update — the "what is this user doing lately" serving view.
    State size is bounded by the per-user type vocabulary; the top-k
    sort runs over that bounded map, never over the stream."""

    def _update(key, pdfs, state):
        (user_id,) = key
        counts: dict = {}
        if state.exists:
            types, cnts = state.get
            counts = dict(zip(types, cnts))
        for pdf in pdfs:
            for t, c in pdf.groupby("event_type").size().items():
                counts[t] = counts.get(t, 0) + int(c)
        state.update((list(counts.keys()), list(counts.values())))
        yield _top_rows(user_id, counts, k)

    return stream_df.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=TRENDING_SCHEMA,
        stateStructType=_TRENDING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_trending_types_tws(stream_df: DataFrame, k: int = 3) -> DataFrame:
    """Per-user trending event types: a MapState (event_type → running
    count) accumulated across micro-batches, emitting each user's
    current top-``k`` types (count desc, type asc tie-break) on every
    update — the "what is this user doing lately" serving view.

    Exercises the MapState primitive (ValueState is covered by
    running_user_totals_tws): per-type counters update in place, state
    size is bounded by the type vocabulary per user, and the top-k sort
    happens over that bounded map — never over the stream."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TrendingTypes(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "cnt long"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            for pdf in rows:
                for t, c in pdf.groupby("event_type").size().items():
                    prev = (
                        self._counts.getValue((t,))[0]
                        if self._counts.containsKey((t,))
                        else 0
                    )
                    self._counts.updateValue((t,), (prev + int(c),))
            counts = {
                tk[0]: tv[0] for tk, tv in self._counts.iterator()
            }
            yield _top_rows(key[0], counts, k)

        def close(self) -> None:
            pass

    return stream_df.groupBy("user_id").transformWithStateInPandas(
        TrendingTypes(),
        outputStructType=TRENDING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
