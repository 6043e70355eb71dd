"""multitouch_attribution: credit models vs hand-computed values,
per-conversion credit conservation, window boundaries, ties."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.attribution import multitouch_attribution

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    # user 1: three touches inside the 60-min lookback (ages 30/20/10
    # min), one outside; user 2: single touch; user 3: touch exactly
    # at the conversion instant and one exactly at the window edge
    touches = spark.createDataFrame(
        [
            (1, _ts(-90), 101, "click"),
            (1, _ts(-30), 102, "view"),
            (1, _ts(-20), 103, "click"),
            (1, _ts(-10), 104, "view"),
            (2, _ts(-5), 201, "click"),
            (3, _ts(0), 301, "click"),
            (3, _ts(-60), 302, "view"),
        ],
        ["user_id", "touch_ts", "touch_id", "channel"],
    )
    conversions = spark.createDataFrame(
        [(1, _ts(0), 9001, 50.0), (2, _ts(0), 9002, 10.0),
         (3, _ts(0), 9003, 20.0)],
        ["user_id", "conv_ts", "conv_id", "value"],
    )
    return touches, conversions


def _credits(touches, conversions, model, **kw):
    out = multitouch_attribution(
        touches, conversions, ["user_id"], "touch_ts", "conv_ts",
        "conv_id", "touch_id", lookback="60 minutes", model=model, **kw
    )
    return {
        (r["conv_id"], r["touch_id"]): r["credit"] for r in out.collect()
    }


def test_linear_credits(frames):
    c = _credits(*frames, "linear")
    assert c[(9001, 102)] == c[(9001, 103)] == c[(9001, 104)]
    assert c[(9001, 102)] == pytest.approx(1 / 3, abs=1e-6)
    assert (9001, 101) not in c  # outside lookback
    assert c[(9002, 201)] == 1.0
    # window is CLOSED on both ends: age 0 and age == lookback both in
    assert c[(9003, 301)] == 0.5 and c[(9003, 302)] == 0.5


def test_time_decay_credits(frames):
    c = _credits(*frames, "time_decay", half_life="20 minutes")
    w = {102: 0.5 ** (30 / 20), 103: 0.5 ** (20 / 20), 104: 0.5 ** (10 / 20)}
    tot = sum(w.values())
    for tid, wt in w.items():
        assert c[(9001, tid)] == pytest.approx(wt / tot, abs=2e-6)
    # recency monotone
    assert c[(9001, 104)] > c[(9001, 103)] > c[(9001, 102)]


def test_position_credits(frames):
    c = _credits(*frames, "position")
    assert c[(9001, 102)] == pytest.approx(0.4, abs=1e-6)  # first
    assert c[(9001, 104)] == pytest.approx(0.4, abs=1e-6)  # last
    assert c[(9001, 103)] == pytest.approx(0.2, abs=1e-6)  # middle
    assert c[(9002, 201)] == 1.0  # n=1
    assert c[(9003, 301)] == 0.5 and c[(9003, 302)] == 0.5  # n=2


def test_first_last_credits(frames):
    first = _credits(*frames, "first")
    last = _credits(*frames, "last")
    assert first[(9001, 102)] == 1.0 and last[(9001, 104)] == 1.0
    assert first[(9001, 103)] == first[(9001, 104)] == 0.0
    assert last[(9001, 102)] == last[(9001, 103)] == 0.0


@pytest.mark.parametrize("model", ["linear", "time_decay", "position"])
def test_credit_conservation(frames, model):
    touches, conversions = frames
    out = multitouch_attribution(
        touches, conversions, ["user_id"], "touch_ts", "conv_ts",
        "conv_id", "touch_id", lookback="60 minutes", model=model,
    )
    sums = (
        out.groupBy("conv_id").agg(F.sum("credit").alias("s")).collect()
    )
    assert len(sums) == 3
    for r in sums:
        assert r["s"] == pytest.approx(1.0, abs=5e-6)


def test_touch_credits_every_covering_conversion(spark):
    # one touch inside TWO conversions' windows earns credit in both
    touches = spark.createDataFrame(
        [(1, _ts(-10), 1, "click")],
        ["user_id", "touch_ts", "touch_id", "channel"],
    )
    convs = spark.createDataFrame(
        [(1, _ts(0), 91, 1.0), (1, _ts(5), 92, 2.0)],
        ["user_id", "conv_ts", "conv_id", "value"],
    )
    c = _credits(touches, convs, "linear")
    assert c == {(91, 1): 1.0, (92, 1): 1.0}


def test_bad_args(frames):
    touches, conversions = frames
    with pytest.raises(ValueError, match="model"):
        multitouch_attribution(
            touches, conversions, ["user_id"], "touch_ts", "conv_ts",
            "conv_id", "touch_id", model="shapley",
        )
    with pytest.raises(ValueError, match="half_life"):
        multitouch_attribution(
            touches, conversions, ["user_id"], "touch_ts", "conv_ts",
            "conv_id", "touch_id", model="time_decay", half_life="0 sec",
        )
