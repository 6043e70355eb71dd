"""Distributed prefix-sum and concurrency-sweep tests (operators/series.py).

Oracle strategy: pandas/pure-Python reimplementations on small frames
(cumsum over the sorted deltas is trivially correct single-threaded),
plus structural edge cases the harness's DuckDB oracle can't isolate:
tie groups sharing one running value (RANGE-frame peers), bucket-count
independence (the distributed result must not depend on B), carry-in
buckets whose peak is the entry level, and zero-length intervals.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reddit_etl_spark.operators.series import (
    concurrency_peaks,
    interval_deltas,
    running_total,
)


def _running_df(spark, rows):
    return spark.createDataFrame(rows, "ord long, v long")


def _expected_running(rows):
    """Single-threaded truth: cumulative sum ordered by ord, peers
    (equal ord) all carrying the post-group total (RANGE semantics)."""
    total = 0.0
    out = {}
    for ord_, group in __import__("itertools").groupby(
        sorted(rows), key=lambda r: r[0]
    ):
        total += sum(v for _, v in group)
        out[ord_] = total
    return out


def test_running_total_matches_serial_cumsum(spark):
    rows = [(i * 7 % 101, (i % 13) - 6) for i in range(500)]
    got = running_total(
        _running_df(spark, rows), "ord", "v", buckets=8
    ).collect()
    want = _expected_running(rows)
    assert len(got) == len(rows)
    for r in got:
        assert r["running_total"] == want[r["ord"]], r


@pytest.mark.parametrize("buckets", [1, 3, 1024])
def test_running_total_bucket_count_invariant(spark, buckets):
    rows = [(i % 10, 1) for i in range(100)]  # heavy ties
    got = running_total(
        _running_df(spark, rows), "ord", "v", buckets=buckets
    ).collect()
    want = _expected_running(rows)
    assert all(r["running_total"] == want[r["ord"]] for r in got)


def test_running_total_peers_share_value(spark):
    # all rows at one instant: every peer sees the full-group total
    rows = [(5, 1)] * 20
    got = running_total(_running_df(spark, rows), "ord", "v").collect()
    assert [r["running_total"] for r in got] == [20] * 20


def test_interval_deltas_orders_ends_before_starts(spark):
    df = spark.createDataFrame([(10, 20), (20, 30)], "s long, e long")
    rows = sorted(
        interval_deltas(df, "s", "e").collect(), key=lambda r: r["__ord"]
    )
    # end of [10,20) sorts before start of [20,30): half-open, never 2
    assert [(r["__ord"], r["__delta"]) for r in rows] == [
        (21, 1),
        (40, -1),
        (41, 1),
        (60, -1),
    ]


def _peaks(spark, intervals, bucket_seconds=10):
    df = spark.createDataFrame(intervals, "s long, e long")
    return {
        r["bucket_start"].timestamp(): r["peak_concurrency"]
        for r in concurrency_peaks(
            df, "s", "e", bucket_seconds=bucket_seconds
        ).collect()
    }


def test_concurrency_basic_overlap(spark):
    # [0,5) [3,8): overlap 2 during [3,5)
    assert _peaks(spark, [(0, 5), (3, 8)]) == {0.0: 2}


def test_concurrency_carry_in_bucket(spark):
    # 3 intervals open from bucket 0, only CLOSING events in bucket 1:
    # bucket 1's peak is the carry-in level 3, which no inner boundary
    # reaches (values at its -1 boundaries are 2,1,0)
    got = _peaks(spark, [(1, 12), (2, 13), (3, 14)])
    assert got == {0.0: 3, 10.0: 3}


def test_concurrency_adjacent_intervals_never_double_count(spark):
    # [0,10) then [10,20): half-open — never concurrent. Bucket 20
    # holds only the final close at its exact edge: peak 0, and the
    # carry-in from bucket 10 must NOT apply (level 1 dropped exactly
    # at t=20, holding at no instant inside bucket 20)
    got = _peaks(spark, [(0, 10), (10, 20)])
    assert got == {0.0: 1, 10.0: 1, 20.0: 0}


def test_concurrency_zero_length_interval_cancels(spark):
    # [5,5) contributes +1/-1 at the same instant with the -1 first:
    # never raises the sweep above the other interval's level. Bucket
    # 10 sees [0,10)'s close exactly at its edge -> peak 0, no carry.
    got = _peaks(spark, [(0, 10), (5, 5)])
    assert got == {0.0: 1, 10.0: 0}


def test_concurrency_brute_force_parity(spark):
    import random

    rng = random.Random(7)
    iv = [(s := rng.randrange(0, 200), s + rng.randrange(1, 40)) for _ in range(60)]
    got = _peaks(spark, iv, bucket_seconds=10)

    def level(t):
        return sum(1 for s, e in iv if s <= t < e)

    # brute force: an emitted bucket's peak is the max level over the
    # instants inside it — its boundary times plus the bucket start
    # (the level is piecewise-constant between boundaries, so these
    # sample points cover every attained value)
    for b, p in got.items():
        instants = {int(b)} | {
            t for s, e in iv for t in (s, e) if b <= t < b + 10
        }
        assert max(level(t) for t in instants) == p, (b, p)


def test_concurrency_no_single_partition_window_on_data(spark):
    """The data-sized running sum must be partitioned by bucket; the
    only unpartitioned windows may be the bounded bucket/offset frames.
    Asserted structurally: with buckets=4, the per-row window spec in
    the optimized plan partitions on __bucket."""
    import re

    df = spark.createDataFrame([(i, i + 5) for i in range(100)], "s long, e long")
    deltas = interval_deltas(df, "s", "e")
    out = running_total(deltas, "__ord", "__delta", buckets=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert len(specs) == 2, specs
    # the RANGE-frame window (per-row running sum over the data) must
    # be PARTITIONED by __bucket: partition spec "__bucket#N," comes
    # before the ASC ordering clause
    range_specs = [s for s in specs if "RangeFrame" in s]
    assert range_specs and all(
        re.match(r"__bucket#\d+, ", s) for s in range_specs
    ), specs
    # the only unpartitioned window is the bounded bucket-offset
    # prefix (RowFrame over <= `buckets` rows)
    row_specs = [s for s in specs if "RowFrame" in s]
    assert all(re.match(r"__bucket#\d+ ASC", s) for s in row_specs), specs


# ---------------------------------------------------------------------------
# time_weighted_avg / gap_fill — temporal aggregates
# ---------------------------------------------------------------------------


def test_twa_step_interpolation(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    rows = [
        # value 10 holds 30s, value 20 holds 10s -> (300+200)/40 = 12.5
        ("a", base, 10.0),
        ("a", base + dt.timedelta(seconds=30), 20.0),
        ("a", base + dt.timedelta(seconds=40), 99.0),  # last: zero weight
        ("b", base, 7.0),  # single reading: undefined integral
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r["k"]: (r["span_seconds"], r["twa"])
        for r in time_weighted_avg(df, ["k"], "ts", "v").collect()
    }
    assert got["a"] == (40, 12.5)
    assert got["b"] == (0, None)


def test_twa_burst_does_not_dominate(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    # value 1 for 100s, then a 10-reading burst of value 100 within 1s
    rows = [("a", base, 1.0)] + [
        ("a", base + dt.timedelta(seconds=100, milliseconds=100 * i), 100.0)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    twa = time_weighted_avg(df, ["k"], "ts", "v").collect()[0]["twa"]
    naive = (1.0 + 100.0 * 10) / 11
    assert twa < 5 < naive  # burst dominated the naive mean, not the TWA


def test_gap_fill_locf_fills_missing_buckets(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import gap_fill

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base, 1.0),
        ("a", base + dt.timedelta(hours=3), 4.0),  # hours 1,2 missing
        ("b", base + dt.timedelta(hours=1), 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = sorted(
        (r["k"], r["bucket_start"].hour, r["value_filled"])
        for r in gap_fill(df, ["k"], "ts", "v", step_seconds=3600).collect()
    )
    assert got == [
        ("a", 0, 1.0),
        ("a", 1, 1.0),
        ("a", 2, 1.0),
        ("a", 3, 4.0),
        ("b", 1, 9.0),
    ]


def test_gap_fill_tie_resolution_is_lexicographic_max(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import gap_fill

    base = dt.datetime(2024, 1, 1)
    rows = [("a", base, 3.0), ("a", base, 8.0)]  # same instant
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = gap_fill(df, ["k"], "ts", "v").collect()
    assert [r["value_filled"] for r in got] == [8.0]


def test_running_total_excludes_null_order_rows(spark):
    rows = [(1, 10), (None, 100), (2, 20)]
    got = {
        r["ord"]: r["running_total"]
        for r in running_total(
            spark.createDataFrame(rows, "ord long, v long"), "ord", "v"
        ).collect()
    }
    # the NULL-position row neither appears nor inflates anyone
    assert got == {1: 10, 2: 30}


def test_twa_null_readings_are_locf_skipped(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base, 10.0),
        ("a", base + dt.timedelta(seconds=50), None),  # no reading
        ("a", base + dt.timedelta(seconds=100), 10.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = time_weighted_avg(df, ["k"], "ts", "v").collect()[0]
    # the prior value spans the gap: twa stays 10, span stays 100
    assert (got["span_seconds"], got["twa"]) == (100, 10.0)


def test_decayed_sum_halves_per_half_life(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import decayed_sum

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("u", base, 10.0),
            ("u", base + dt.timedelta(days=1), 20.0),
            ("u", base + dt.timedelta(days=2), 30.0),
            ("w", base, 4.0),
        ],
        "k string, ts timestamp, v double",
    )
    got = {
        r["k"]: (r["decayed_value"], r["n_events"])
        for r in decayed_sum(df, "k", "ts", "v", half_life_s=86400).collect()
    }
    # as_of = global max ts: 30 + 20*0.5 + 10*0.25 ; w's loner aged 2d
    assert got["u"] == (42.5, 3)
    assert got["w"] == (1.0, 1)
    # injected as_of one day later halves everything
    inj = {
        r["k"]: r["decayed_value"]
        for r in decayed_sum(
            df, "k", "ts", "v", half_life_s=86400, as_of="2024-01-04 00:00:00"
        ).collect()
    }
    assert inj["u"] == 21.25


def test_ewma_last_matches_serial_recursion(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import ewma_last

    base = dt.datetime(2024, 1, 1)
    rows, want = [], {}
    for key, vals, alpha in [("a", [10.0, 20.0, 30.0], 0.5), ("b", [7.0], 0.5)]:
        s = vals[0]
        for v in vals[1:]:
            s = alpha * v + (1 - alpha) * s
        want[key] = round(s, 6)
        rows += [
            (key, base + dt.timedelta(minutes=i), v, i)
            for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, i long")
    got = {
        r["k"]: r["ewma"]
        for r in ewma_last(df, "k", ["ts", "i"], "v", alpha=0.5).collect()
    }
    assert got == want
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        ewma_last(df, "k", ["ts"], "v", alpha=1.5)


def test_sliding_window_rollup_replicates_into_covering_windows(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.series import sliding_window_rollup

    # one event at 01:15 with 1h windows hopping 30m lands in the
    # 00:30 and 01:00 windows
    df = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1, 1, 15), 1.0)],
        "user string, ts timestamp, v double",
    )
    got = {
        (r["window_start"], r["window_end"]): r["n"]
        for r in sliding_window_rollup(
            df, "ts", "1 hour", "30 minutes", [F.count("*").alias("n")]
        ).collect()
    }
    d = dt.datetime
    assert got == {
        (d(2024, 1, 1, 0, 30), d(2024, 1, 1, 1, 30)): 1,
        (d(2024, 1, 1, 1, 0), d(2024, 1, 1, 2, 0)): 1,
    }


def test_resample_bars_ohlc_semantics(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import resample_bars

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        ("a", base + dt.timedelta(seconds=s), float(v), i)
        for i, (s, v) in enumerate([(0, 5), (10, 9), (250, 2), (301, 7), (500, 1)])
    ]
    # same-second tie: eid decides open/close deterministically
    rows += [("b", base, 3.0, 100), ("b", base, 8.0, 99)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, eid long")
    got = {
        (r["k"], r["bar_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["volume"], r["total"]
        )
        for r in resample_bars(df, "k", "ts", "v", 300, tie_col="eid").collect()
    }
    assert got[("a", base)] == (5.0, 9.0, 2.0, 2.0, 3, 16.0)
    assert got[("a", base + dt.timedelta(seconds=300))] == (7.0, 7.0, 1.0, 1.0, 2, 8.0)
    # tie at the same second: min eid (99 -> 8.0) opens, max eid closes
    assert got[("b", base)] == (8.0, 8.0, 3.0, 3.0, 2, 11.0)


class TestSeasonalNaiveBacktest:
    def _rollup(self, spark, rows):
        import datetime as dt

        d0 = dt.date(2024, 6, 1)
        return spark.createDataFrame(
            [(k, d0 + dt.timedelta(days=d), float(v)) for k, d, v in rows],
            ["key", "day", "v"],
        )

    def test_perfectly_seasonal_series_scores_zero(self, spark):
        from reddit_etl_spark.operators.series import seasonal_naive_backtest

        rows = [("a", d, 10 + (d % 7)) for d in range(21)]
        out = seasonal_naive_backtest(
            self._rollup(spark, rows), ["key"], "day", "v", period_days=7
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_scored"] == 14  # days 7..20
        assert r["mae"] == 0.0 and r["rmse"] == 0.0 and r["mape"] == 0.0

    def test_hand_computed_errors(self, spark):
        from reddit_etl_spark.operators.series import seasonal_naive_backtest

        # period 1: forecasts = previous day
        rows = [("a", 0, 10), ("a", 1, 12), ("a", 2, 9)]
        r = seasonal_naive_backtest(
            self._rollup(spark, rows), ["key"], "day", "v", period_days=1
        ).collect()[0]
        # errors: |12-10|=2, |9-12|=3
        assert r["n_scored"] == 2
        assert r["mae"] == 2.5
        assert r["rmse"] == round((13 / 2) ** 0.5, 6)  # 2^2 + 3^2 = 13
        assert r["mape"] == round((2 / 12 + 3 / 9) / 2, 6)

    def test_gap_days_not_scored_and_zero_actual_excluded_from_mape(
        self, spark
    ):
        from reddit_etl_spark.operators.series import seasonal_naive_backtest

        # day 1 missing: day 2 has no lag-1 forecast; day 4 actual 0
        # excluded from MAPE but still in MAE
        rows = [("a", 0, 10), ("a", 2, 8), ("a", 3, 4), ("a", 4, 0)]
        r = seasonal_naive_backtest(
            self._rollup(spark, rows), ["key"], "day", "v", period_days=1
        ).collect()[0]
        assert r["n_scored"] == 2  # days 3 and 4
        assert r["mae"] == 4.0  # (|4-8| + |0-4|) / 2
        assert r["mape"] == 1.0  # only day 3: 4/4


class TestAcfByKey:
    def test_weekly_signal_spikes_at_lag_seven(self, spark):
        import datetime as dt

        from reddit_etl_spark.operators.series import acf_by_key

        d0 = dt.date(2024, 6, 1)
        rows = [
            ("a", d0 + dt.timedelta(days=d),
             float(100 if d % 7 == 0 else 10 + (d % 3)))
            for d in range(56)
        ]
        df = spark.createDataFrame(rows, ["key", "day", "v"])
        out = {r["lag"]: r["acf"] for r in
               acf_by_key(df, ["key"], "day", "v", max_lag=7).collect()}
        assert set(out) == set(range(1, 8))
        assert out[7] > 0.99
        assert out[1] < 0.5

    def test_matches_numpy_pearson(self, spark):
        import datetime as dt
        import random

        import numpy as np

        from reddit_etl_spark.operators.series import acf_by_key

        rng = random.Random(11)
        d0 = dt.date(2024, 6, 1)
        vals = [round(rng.uniform(0, 100), 2) for _ in range(40)]
        rows = [
            ("a", d0 + dt.timedelta(days=d), vals[d]) for d in range(40)
        ]
        df = spark.createDataFrame(rows, ["key", "day", "v"])
        out = {r["lag"]: (r["n_pairs"], r["acf"]) for r in
               acf_by_key(df, ["key"], "day", "v", max_lag=3).collect()}
        for lag in (1, 2, 3):
            a = np.array(vals[lag:])
            b = np.array(vals[:-lag])
            want = float(np.corrcoef(a, b)[0, 1])
            n, acf = out[lag]
            assert n == 40 - lag
            assert acf == pytest.approx(want, abs=2e-6)

    def test_constant_series_yields_null(self, spark):
        import datetime as dt

        from reddit_etl_spark.operators.series import acf_by_key

        d0 = dt.date(2024, 6, 1)
        rows = [("a", d0 + dt.timedelta(days=d), 5.0) for d in range(10)]
        df = spark.createDataFrame(rows, ["key", "day", "v"])
        out = acf_by_key(df, ["key"], "day", "v", max_lag=2).collect()
        assert all(r["acf"] is None for r in out)


def _cusum_serial(vals, mu, k):
    """Textbook Page recursion: S+_t = max(0, S+_{t-1} + (x - mu - k)),
    S-_t = max(0, S-_{t-1} + (mu - x - k)), on micros-quantized deltas
    (the operator's exact-integer discipline)."""
    import math

    shi = slo = 0
    out = []
    for v in vals:
        d = math.floor((v - mu) * 1_000_000)
        ki = int(k * 1_000_000)
        shi = max(0, shi + d - ki)
        slo = max(0, slo - d - ki)
        out.append((round(shi / 1e6, 6), round(slo / 1e6, 6)))
    return out


def test_cusum_matches_textbook_recursion(spark):
    from reddit_etl_spark.operators.series import cusum_changepoints

    vals = [5.0, 5.2, 4.9, 5.1, 7.0, 7.2, 6.9, 7.1, 5.0, 4.8]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = (
        cusum_changepoints(df, ["k"], "t", "v", h=1.0, k=0.1,
                           target_col=None)
        .orderBy("t")
        .collect()
    )
    mu = round(sum(vals), 6) / len(vals)
    want = _cusum_serial(vals, mu, 0.1)
    assert [(r["s_hi"], r["s_lo"]) for r in got] == want
    assert [r["alarm_hi"] for r in got] == [w[0] > 1.0 for w in want]
    assert [r["alarm_lo"] for r in got] == [w[1] > 1.0 for w in want]


def test_cusum_flags_sustained_shift_not_noise(spark):
    from reddit_etl_spark.operators.series import cusum_changepoints

    # Steady around 10 with a +1 shift from t=20 on: each point is
    # within the z-score comfort zone, but the CUSUM accumulates.
    steady = [10.0 + (0.2 if i % 2 else -0.2) for i in range(20)]
    shifted = [11.0 + (0.2 if i % 2 else -0.2) for i in range(20)]
    vals = steady + shifted
    df = spark.createDataFrame(
        [("a", i, v, 10.0) for i, v in enumerate(vals)],
        "k string, t long, v double, mu double",
    )
    out = (
        cusum_changepoints(df, ["k"], "t", "v", h=3.0, k=0.25,
                           target_col="mu")
        .orderBy("t")
        .collect()
    )
    alarms = [r["t"] for r in out if r["alarm_hi"]]
    assert alarms, "sustained shift must eventually alarm"
    assert min(alarms) >= 20, "no alarm during the steady prefix"
    assert not any(r["alarm_lo"] for r in out[:20])


def test_cusum_explicit_target_and_relative_sigma(spark):
    from reddit_etl_spark.operators.series import cusum_changepoints

    rows = [("a", i, 10.0 + i % 2, 10.0) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t long, v double, mu double")
    out = (
        cusum_changepoints(df, ["k"], "t", "v", h=0.9, k=0.0,
                           target_col="mu")
        .orderBy("t")
        .collect()
    )
    # v - mu alternates 0, +1 -> S+ ratchets by 1 every other step.
    assert [r["s_hi"] for r in out] == [0.0, 1.0, 1.0, 2.0, 2.0, 3.0]
    assert [r["alarm_hi"] for r in out] == [False, True, True, True, True, True]

    # relative=True: same data, thresholds in sigma units run green.
    rel = cusum_changepoints(
        df, ["k"], "t", "v", h=2.0, k=0.25, relative=True
    ).collect()
    assert len(rel) == 6 and all(r["s_hi"] is not None for r in rel)


def test_classical_decompose_identity_and_seasonal_recovery(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import classical_decompose

    # Pure weekly signal on a flat level: level 100, phase bumps
    # [0,7,0,0,-7,0,0] -> trend ~= 100, seasonal ~= the bumps
    # (re-centered; they already sum to 0), remainder ~= 0.
    base = dt.date(2024, 1, 1)
    bumps = [0.0, 7.0, 0.0, 0.0, -7.0, 0.0, 0.0]
    rows = [
        ("k", base + dt.timedelta(days=i), 100.0 + bumps[i % 7])
        for i in range(28)
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {r["day"]: r for r in
           classical_decompose(df, ["k"], "day", "v").collect()}
    assert len(out) == 28
    # value = trend + seasonal + remainder wherever trend exists
    for r in out.values():
        if r["trend"] is not None and r["seasonal"] is not None:
            assert abs(r["v"] - (r["trend"] + r["seasonal"]
                                 + r["remainder"])) < 1e-6
    mid = out[base + dt.timedelta(days=10)]
    assert abs(mid["trend"] - 100.0) < 1e-6
    assert abs(mid["remainder"]) < 1e-6
    # edges are honestly NULL (centered window short)
    for i in (0, 1, 2, 25, 26, 27):
        assert out[base + dt.timedelta(days=i)]["trend"] is None
        assert out[base + dt.timedelta(days=i)]["remainder"] is None
    # the recovered seasonal index matches the planted bump
    phase_of = lambda d: (d - dt.date(1970, 1, 1)).days % 7  # noqa: E731
    day10 = base + dt.timedelta(days=10)
    assert abs(out[day10]["seasonal"] - bumps[phase_of(day10)
                                             - phase_of(base)]) < 1e-6


def test_classical_decompose_rejects_even_period(spark):
    import pytest as _p

    from reddit_etl_spark.operators.series import classical_decompose

    df = spark.createDataFrame([("k", 1, 1.0)], "k string, day int, v double")
    for bad in (2, 4, 1):
        with _p.raises(ValueError, match="odd period"):
            classical_decompose(df, ["k"], "day", "v", period=bad)


def test_classical_decompose_gap_yields_null_trend_not_wrong_ma(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import classical_decompose

    base = dt.date(2024, 1, 1)
    # 15 consecutive days with day 7 MISSING: every row whose centered
    # 7-day span covers the gap must report NULL trend — a ROWS frame
    # would have silently averaged non-consecutive days instead
    days = [i for i in range(15) if i != 7]
    rows = [("k", base + dt.timedelta(days=i), 10.0 + i) for i in days]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {(r["day"] - base).days: r["trend"]
           for r in classical_decompose(df, ["k"], "day", "v").collect()}
    for i in (4, 5, 6, 8, 9, 10):          # windows spanning the gap
        assert out[i] is None, i
    assert out[11] is not None             # full window past the gap


class TestConformalBacktestIntervals:
    def test_hand_computed_qhat_and_coverage(self, spark):
        from reddit_etl_spark.operators.series import (
            conformal_backtest_intervals,
        )

        # plain-naive residuals by construction: 1,2,3,4,5 | 6,7,2,1
        vals = [0, 1, 3, 6, 10, 15, 21, 28, 26, 25]
        rows = [("k", f"2024-01-{d+1:02d}", float(v)) for d, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, day string, v double").selectExpr(
            "g", "CAST(day AS DATE) AS day", "v"
        )
        r = conformal_backtest_intervals(
            df, ["g"], "day", "v", period_days=1, cal_frac=0.6, alpha=0.2
        ).collect()[0]
        # 9 scored days -> n_cal = floor(9*0.6) = 5, conformal rank =
        # ceil(0.8*6) = 5 -> qhat = 5; eval residuals 6,7,2,1 -> 2 in
        assert (r["n_cal"], r["n_eval"]) == (5, 4)
        assert r["qhat"] == 5.0
        assert r["coverage"] == 0.5
        assert r["target"] == 0.8

    def test_insufficient_calibration_yields_null(self, spark):
        from reddit_etl_spark.operators.series import (
            conformal_backtest_intervals,
        )

        # 4 scored days -> n_cal = 2, rank = ceil(0.8*3) = 3 > 2
        vals = [0.0, 1.0, 2.0, 3.0, 4.0]
        rows = [("k", f"2024-02-{d+1:02d}", v) for d, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, day string, v double").selectExpr(
            "g", "CAST(day AS DATE) AS day", "v"
        )
        r = conformal_backtest_intervals(
            df, ["g"], "day", "v", period_days=1, cal_frac=0.6, alpha=0.2
        ).collect()[0]
        assert r["qhat"] is None and r["coverage"] is None

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from reddit_etl_spark.operators.series import (
            conformal_backtest_intervals,
        )

        df = spark.createDataFrame([("k", "2024-01-01", 1.0)], "g string, day string, v double")
        for kw in ({"cal_frac": 0.0}, {"cal_frac": 1.0}, {"alpha": 0.0},
                   {"alpha": 1.0}, {"period_days": 0}):
            with _pytest.raises(ValueError):
                conformal_backtest_intervals(df, ["g"], "day", "v", **kw)

    def test_cal_frac_floor_never_reaches_n(self):
        # the operator's key-completeness rests on floor(n*cal_frac)
        # < n for every IEEE754 cal_frac < 1 (series.py comment): the
        # product either rounds down or, at powers of two with the
        # largest sub-1 cal_frac, lands exactly on the largest double
        # BELOW n — never on n. Pin it at the adversarial corner
        # (cal_frac = nextafter(1, 0)) across sizes incl. powers of 2.
        import math

        cf = math.nextafter(1.0, 0.0)
        for n in [1, 2, 3, 7, 8, 9, 63, 64, 65, 1023, 1024,
                  2**20, 2**20 + 1, 10**6, 2**52, 2**53]:
            assert math.floor(n * cf) < n, n

    def test_one_scored_day_key_stays_in_output(self, spark):
        # a key whose calibration split is EMPTY (1 scored day ->
        # n_cal=0) must still surface, with NULL qhat/coverage —
        # alongside a healthy key
        from reddit_etl_spark.operators.series import (
            conformal_backtest_intervals,
        )

        rows = [("tiny", "2024-03-01", 1.0), ("tiny", "2024-03-02", 3.0)]
        rows += [
            ("big", f"2024-03-{d+1:02d}", float(d * d)) for d in range(10)
        ]
        df = spark.createDataFrame(rows, "g string, day string, v double").selectExpr(
            "g", "CAST(day AS DATE) AS day", "v"
        )
        out = {
            r["g"]: r
            for r in conformal_backtest_intervals(
                df, ["g"], "day", "v", period_days=1, cal_frac=0.6, alpha=0.2
            ).collect()
        }
        assert set(out) == {"tiny", "big"}
        t = out["tiny"]
        assert (t["n_cal"], t["n_eval"]) == (0, 1)
        assert t["qhat"] is None and t["coverage"] is None


def test_sse_changepoint_huge_magnitudes(spark):
    # Advisor r8 (medium): the earlier single-division score typed
    # DECIMAL(38,6) — exact only below a ~1e32 quotient, silently NULL
    # above, which desc-sorts the TRUE best split last and
    # mislocalizes. This key's both candidate scores are ~2.5e33 and
    # ~4.9e33 (quotient class measured in the advisory): under the
    # old form both went NULL and the earliest split won by tiebreak
    # (WRONG answer = split_at 1). The hi/lo-split quotient must pick
    # the true SSE-optimal split and report the exact integer score.
    from reddit_etl_spark.operators.series import sse_changepoint

    vals = [10.0, 10.0, 7e7]
    df = spark.createDataFrame(
        [("k", i + 1, v) for i, v in enumerate(vals)],
        "key string, t int, v double",
    )
    r = sse_changepoint(df, ["key"], "t", "v").collect()
    assert len(r) == 1
    got = r[0]
    assert got["split_at"] == 2 and got["n_before"] == 2
    # exact integer oracle, computed in unbounded Python ints
    scale = 1_000_000
    xs = [round(v * scale) for v in vals]
    sl, nl = sum(xs[:2]), 2
    sr, nr = xs[2], 1
    expect = (sl * sl * nr + sr * sr * nl) * scale // (nl * nr)
    assert expect > 10**32  # the magnitude class the fix targets
    assert got["score"] == str(expect)
    assert got["mean_after"] == 7e7
