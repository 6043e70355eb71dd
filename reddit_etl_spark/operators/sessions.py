"""Sessionization — gap-based event sessions, batch and streaming.

A session groups consecutive events of one key with no gap exceeding
``gap``; the classic operator relational engines lack natively.

- Batch: pure window functions — lag -> new-session flag -> running
  sum = session id. Two narrow window passes over ONE shuffle on the
  key (both windows share the partitioning). Exact, SQL-expressible,
  DuckDB-oracle-checked.
- Streaming: ``applyInPandasWithState`` keeps an open-session record
  per key (GroupState with event-time timeout), emitting sessions as
  the watermark closes them — the custom-stateful-operator pattern
  for operators Structured Streaming's built-in session window
  (``F.session_window``) can't express (e.g. per-session custom
  payloads); both forms are provided.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign a ``session_id`` (0-based per key) to every event.

    One shuffle: both windows partition on ``key_cols`` and order by
    ``ts_col``, so Catalyst plans a single exchange + sort reused by
    the lag and the running sum.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap_expr), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        (F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("long"),
    )


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Collapse events into one row per session: bounds, event count,
    optional value sum. groupBy reuses the sessionize partitioning."""
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("event_count"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        sessionize(df, key_cols, ts_col, gap)
        .groupBy(*key_cols, "session_id")
        .agg(*aggs)
    )


_STREAM_SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("event_count", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STREAM_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def streaming_session_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming sessionization via applyInPandasWithState.

    State per key = the open session (start, end, count, sum). Each
    micro-batch folds its (sorted) events into the open session,
    EMITS every session closed by a gap, and keeps the last session
    open with an event-time timeout of ``gap_ms`` — when the
    watermark passes end+gap with no new events, the timeout fires
    and the final session flushes. State is O(keys), independent of
    event volume.
    """

    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [k],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "event_count": [n],
                    "total_value": [total],
                }
            )
            return

        chunks = list(pdfs)
        rows = (
            pd.concat(chunks).sort_values(ts_col)
            if chunks
            else pd.DataFrame(columns=[ts_col, value_col])
        )
        ts_ms = (rows[ts_col].astype("int64") // 1_000_000).to_numpy()
        vals = rows[value_col].to_numpy()
        if len(ts_ms) == 0:
            # empty non-timeout delivery: keep state + timeout as-is
            if state.exists:
                start_ms, end_ms, n, total = state.get
                state.update((start_ms, end_ms, n, total))
                state.setTimeoutTimestamp(end_ms + gap_ms)
            return

        if state.exists:
            start_ms, end_ms, n, total = state.get
        else:
            start_ms = end_ms = int(ts_ms[0])
            n, total = 0, 0.0

        closed = []
        for t, v in zip(ts_ms, vals):
            t = int(t)
            if n > 0 and t - end_ms > gap_ms:
                closed.append((start_ms, end_ms, n, total))
                start_ms, n, total = t, 0, 0.0
            elif n == 0:
                start_ms = t
            end_ms = max(end_ms, t) if n > 0 else t
            n += 1
            total += float(v)

        state.update((start_ms, end_ms, n, total))
        state.setTimeoutTimestamp(end_ms + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "key": [k] * len(closed),
                    "session_start": [
                        pd.Timestamp(c[0], unit="ms") for c in closed
                    ],
                    "session_end": [pd.Timestamp(c[1], unit="ms") for c in closed],
                    "event_count": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fold,
            outputStructType=_STREAM_SESSION_SCHEMA,
            stateStructType=_STREAM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
