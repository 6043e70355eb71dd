"""As-of join semantics: <= tie matching, no-match NULLs, tolerance,
column collision suffixing, plan shape (single shuffle)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.asof import asof_join
from reddit_etl_spark.plans.inspect import count_exchanges

T0 = dt.datetime(2025, 9, 1, 12, 0, 0)


def _t(seconds: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _t(0), 100.0),
            ("A", _t(10), 101.0),
            ("A", _t(20), 102.0),
            ("B", _t(5), 50.0),
        ],
        "sym string, qts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _t(10), 7),   # tie: matches the t=10 quote (<=)
            ("A", _t(15), 8),   # between quotes: matches t=10
            ("A", _t(25), 9),   # after last: matches t=20
            ("B", _t(2), 10),   # before any B quote: NULL
            ("C", _t(30), 11),  # key with no quotes at all: NULL
        ],
        "sym string, tts timestamp, qty long",
    )


def test_asof_basic_semantics(quotes, trades):
    out = {
        (r.sym, r.tts): (r.px, r.qts)
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
            value_cols=["px", "qts"],
        ).collect()
    }
    assert out[("A", _t(10))] == (101.0, _t(10))  # <= tie
    assert out[("A", _t(15))] == (101.0, _t(10))
    assert out[("A", _t(25))] == (102.0, _t(20))
    assert out[("B", _t(2))] == (None, None)
    assert out[("C", _t(30))] == (None, None)
    # every left row survives (LEFT OUTER as-of)
    assert len(out) == 5


def test_asof_tolerance(quotes, trades):
    out = {
        (r.sym, r.tts): r.px
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
            tolerance="6 seconds",
        ).collect()
    }
    assert out[("A", _t(10))] == 101.0   # age 0 <= 6s
    assert out[("A", _t(15))] == 101.0   # age 5s
    assert out[("A", _t(25))] == 102.0   # age 5s
    # no stale matches get invented
    assert out[("B", _t(2))] is None


def test_asof_tolerance_rejects_stale(spark, quotes):
    late = spark.createDataFrame(
        [("A", _t(120), 1)], "sym string, tts timestamp, qty long"
    )
    r = asof_join(
        late, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        tolerance="10 seconds",
    ).first()
    assert r.px is None  # last quote is 100s old > tolerance


def test_asof_name_collision_suffix(spark):
    left = spark.createDataFrame(
        [("k", _t(10), 1.0)], "k string, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [("k", _t(5), 2.0)], "k string, rts timestamp, value double"
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")
    assert "value_right" in out.columns
    r = out.first()
    assert (r.value, r.value_right) == (1.0, 2.0)


def test_asof_single_shuffle(quotes, trades):
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts")
    # union + one window partition = exactly one exchange
    assert count_exchanges(out) == 1


def test_asof_forward_with_tolerance(spark):
    import datetime as dt

    from reddit_etl_spark.operators.asof import asof_join

    t0 = dt.datetime(2025, 9, 1, 12, 0)
    left = spark.createDataFrame(
        [
            (1, "u", t0),
            (2, "u", t0 + dt.timedelta(minutes=45)),
            (3, "v", t0),
        ],
        "id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", t0 + dt.timedelta(minutes=10), 1.0),   # next after left#1
            ("u", t0 + dt.timedelta(minutes=50), 2.0),   # next after left#2
        ],
        "user string, ts timestamp, value double",
    )
    rows = {
        r.id: r
        for r in asof_join(
            left, right, on=["user"], left_ts="ts", right_ts="ts",
            value_cols=["value"], direction="forward",
        ).collect()
    }
    assert rows[1].value == 1.0   # earliest right >= left ts
    assert rows[2].value == 2.0
    assert rows[3].value is None  # no right rows for v

    # tolerance: left#1's next event is 10 min away -> NULLed at 5 min
    rows = {
        r.id: r
        for r in asof_join(
            left, right, on=["user"], left_ts="ts", right_ts="ts",
            value_cols=["value"], direction="forward", tolerance="5 minutes",
        ).collect()
    }
    assert rows[1].value is None
    # equal-ts inclusive: a right row AT left ts matches forward
    right2 = spark.createDataFrame(
        [("u", t0, 9.0)], "user string, ts timestamp, value double"
    )
    rows = {
        r.id: r
        for r in asof_join(
            left, right2, on=["user"], left_ts="ts", right_ts="ts",
            value_cols=["value"], direction="forward",
        ).collect()
    }
    assert rows[1].value == 9.0
