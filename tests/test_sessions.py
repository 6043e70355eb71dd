"""Sessionization tests: batch semantics, plan shape, and the
streaming applyInPandasWithState twin's parity with batch."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.sessions import (
    session_stats,
    sessionize,
    streaming_session_stats,
)
from reddit_etl_spark.plans.inspect import count_exchanges


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2025, 9, 1, 10, 0)
    rows = [
        # user a: two sessions (gap 45 min > 30)
        ("a", base, 1.0),
        ("a", base + dt.timedelta(minutes=10), 2.0),
        ("a", base + dt.timedelta(minutes=55), 4.0),
        ("a", base + dt.timedelta(minutes=60), 8.0),
        # user b: one session, single event
        ("b", base + dt.timedelta(minutes=5), 16.0),
    ]
    return spark.createDataFrame(rows, "user string, ts timestamp, value double")


def test_sessionize_assigns_gap_sessions(events):
    base = dt.datetime(2025, 9, 1, 10, 0)
    got = {
        (r.user, r.ts): r.session_id
        for r in sessionize(events, ["user"], "ts").collect()
    }
    assert got[("a", base)] == 0
    assert got[("a", base + dt.timedelta(minutes=10))] == 0
    assert got[("a", base + dt.timedelta(minutes=55))] == 1
    assert got[("a", base + dt.timedelta(minutes=60))] == 1
    assert got[("b", base + dt.timedelta(minutes=5))] == 0


def test_session_stats_rollup(events):
    rows = {
        (r.user, r.session_id): (r.event_count, r.total_value)
        for r in session_stats(
            events, ["user"], "ts", value_col="value"
        ).collect()
    }
    assert rows[("a", 0)] == (2, 3.0)
    assert rows[("a", 1)] == (2, 12.0)
    assert rows[("b", 0)] == (1, 16.0)


def test_sessionize_single_shuffle(events):
    # lag + running sum + rollup must share ONE exchange on the key
    df = session_stats(events, ["user"], "ts", value_col="value")
    assert count_exchanges(df) == 1


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Replay a fixed event log through the stateful streaming
    sessionizer; closed sessions must equal the batch rollup."""
    base = dt.datetime(2025, 9, 1, 10, 0)
    rows = []
    for u in ("u1", "u2", "u3"):
        t = base
        for s in range(3):  # 3 sessions per user
            for i in range(4):
                rows.append((u, t, float(s * 10 + i)))
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=90)  # close the session
    # a final far-future event per user pushes the watermark past every
    # real session's timeout so all of them flush
    flush_at = base + dt.timedelta(days=30)
    for u in ("u1", "u2", "u3"):
        rows.append((u, flush_at, 0.0))

    events = spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )
    src = str(tmp_path / "events_in")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_session_stats(
        stream, "key", "ts", "value", gap_ms=30 * 60 * 1000, watermark="0 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # second pass with no new data lets event-time timeouts fire is not
    # needed: availableNow drains and finalizes via the flush events
    got = {
        (r.key, r.session_start): (r.event_count, r.total_value)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }

    batch = session_stats(
        events, ["key"], "ts", gap="30 minutes", value_col="value"
    ).collect()
    want = {
        (r.key, r.session_start): (r.event_count, r.total_value)
        for r in batch
        if r.session_start != flush_at  # the flush sentinel stays open
    }
    assert want  # 9 real sessions
    for k, v in want.items():
        assert got.get(k) == v, f"session {k}: {got.get(k)} != {v}"
