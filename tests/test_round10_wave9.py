"""Round-10 wave 9: delta-method ratio CI, Yuen's trimmed test, KM
median/RMST summaries, Fellegi-Sunter linkage weights."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- delta ratio


def test_delta_ratio_bruteforce_parity(spark):
    from reddit_etl_spark.operators.relational import delta_method_ratio

    rng = random.Random(61)
    pairs = [
        (round(rng.uniform(0, 10), 2), round(rng.uniform(1, 5), 2))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pairs], "g string, x double, y double"
    )
    r = delta_method_ratio(df, ["g"], "x", "y").collect()[0]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    mx, my = sx / n, sy / n
    vx = sum((x - mx) ** 2 for x, _ in pairs) / (n - 1)
    vy = sum((y - my) ** 2 for _, y in pairs) / (n - 1)
    cxy = sum((x - mx) * (y - my) for x, y in pairs) / (n - 1)
    ratio = sx / sy
    se = math.sqrt(
        (vx + ratio**2 * vy - 2 * ratio * cxy) / (n * my**2)
    )
    assert abs(r["ratio"] - ratio) < 1e-6
    assert abs(r["se"] - se) < 1e-5
    assert abs(r["ci_hi"] - (ratio + 1.959963984540054 * se)) < 1e-4


def test_delta_ratio_constant_ratio_zero_se(spark):
    from reddit_etl_spark.operators.relational import delta_method_ratio

    # y = 2x exactly -> r = 0.5, all variance cancels -> se = 0
    rows = [("g", float(i), float(2 * i)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = delta_method_ratio(df, ["g"], "x", "y").collect()[0]
    assert r["ratio"] == 0.5 and r["se"] == 0.0
    assert r["ci_lo"] == 0.5 == r["ci_hi"]


# -------------------------------------------------------------------- yuen


def _py_yuen(xs, ys, trim=0.2, scale=100):
    def side(vs):
        q = sorted(round(v * scale) for v in vs)
        n = len(q)
        g = int(math.floor(n * trim))
        h = n - 2 * g
        tm = sum(q[g: n - g]) / h
        w = [min(max(v, q[g]), q[n - g - 1]) for v in q]
        mw = sum(w) / n
        sw2 = sum((v - mw) ** 2 for v in w) / (n - 1)
        d = (n - 1) * sw2 / (h * (h - 1))
        return n, g, tm, d, h

    na, ga, tma, da, ha = side(xs)
    nb, gb, tmb, db, hb = side(ys)
    t = (tma - tmb) / math.sqrt(da + db)
    df = (da + db) ** 2 / (da**2 / (ha - 1) + db**2 / (hb - 1))
    return (tma - tmb) / scale, t, df


def test_yuen_bruteforce_parity(spark):
    from reddit_etl_spark.operators.relational import yuen_trimmed_test

    rng = random.Random(67)
    xs = [round(rng.gauss(50, 10), 2) for _ in range(150)]
    ys = [round(rng.gauss(45, 25), 2) for _ in range(120)]
    rows = [(x, "a") for x in xs] + [(y, "b") for y in ys]
    df = spark.createDataFrame(rows, "v double, c string")
    r = yuen_trimmed_test(df, "v", "c", "a", "b").collect()[0]
    diff, t, dfree = _py_yuen(xs, ys)
    assert abs(r["diff"] - diff) < 1e-6
    assert abs(r["t_stat"] - t) < 1e-4
    assert abs(r["df"] - dfree) < 1e-2
    assert r["g_a"] == 30 and r["g_b"] == 24


def test_yuen_outlier_robustness(spark):
    from reddit_etl_spark.operators.relational import yuen_trimmed_test

    # identical cores; side b gets massive outliers that 20% trim
    # must neutralize -> trimmed means equal, t ~ 0
    core = [float(v) for v in range(10, 50)]
    xs = core
    ys = core[:] + [100000.0] * 4 + [-100000.0] * 4
    rows = [(x, "a") for x in xs] + [(y, "b") for y in ys]
    df = spark.createDataFrame(rows, "v double, c string")
    r = yuen_trimmed_test(df, "v", "c", "a", "b", trim=0.25).collect()[0]
    assert abs(r["diff"]) < 2.0
    assert abs(r["t_stat"]) < 1.5


# -------------------------------------------------------------- km summary


def test_km_summary_no_censoring_hand_case(spark):
    from reddit_etl_spark.operators.relational import km_summary

    # all observed at t = 1..4 (one each): S = .75,.5,.25,0
    rows = [("g", t, True) for t in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, t long, obs boolean")
    r = km_summary(df, ["g"], "t", "obs").collect()[0]
    assert r["median_t"] == 2  # S(2) = 0.5 <= 0.5
    # RMST = 1*1 (to t=1) + .75*1 + .5*1 + .25*1 = 2.5
    assert r["rmst"] == 2.5
    assert r["horizon_t"] == 4 and r["n_events"] == 4


def test_km_summary_censored_median_null(spark):
    from reddit_etl_spark.operators.relational import km_summary

    # one early event among many censored: S stays near 1
    rows = [("g", 1, True)] + [("g", 10, False)] * 9
    df = spark.createDataFrame(rows, "g string, t long, obs boolean")
    r = km_summary(df, ["g"], "t", "obs").collect()[0]
    assert r["median_t"] is None
    assert r["n_subjects"] == 10 and r["n_events"] == 1
    # RMST = 1*1 + 0.9*(10-1) = 9.1
    assert r["rmst"] == 9.1


# ---------------------------------------------------------- fellegi-sunter


def test_fs_weights_hand_case(spark):
    from reddit_etl_spark.operators.dedup import fellegi_sunter_weights

    # match pairs: 8 agree of 10; unmatch: 2 agree of 20
    rows = (
        [(True, True)] * 8
        + [(True, False)] * 2
        + [(False, True)] * 2
        + [(False, False)] * 18
    )
    df = spark.createDataFrame(rows, "is_match boolean, f boolean")
    r = fellegi_sunter_weights(df, "is_match", ["f"]).collect()[0]
    m, u = 0.8, 0.1
    assert r["m"] == 0.8 and r["u"] == 0.1
    assert abs(r["w_agree"] - math.log2(m / u)) < 1e-6
    assert abs(r["w_disagree"] - math.log2((1 - m) / (1 - u))) < 1e-6


def test_fs_zero_cells_null_not_inf(spark):
    from reddit_etl_spark.operators.dedup import fellegi_sunter_weights

    # field never agrees on unmatched pairs -> u = 0 -> w_agree NULL
    rows = [(True, True)] * 5 + [(False, False)] * 5
    df = spark.createDataFrame(rows, "is_match boolean, f boolean")
    r = fellegi_sunter_weights(df, "is_match", ["f"]).collect()[0]
    assert r["w_agree"] is None
    assert r["w_disagree"] is None  # m = 1 -> 1-m = 0


def test_fs_uninformative_field_near_zero_weight(spark):
    from reddit_etl_spark.operators.dedup import fellegi_sunter_weights

    rng = random.Random(71)
    rows = [
        (rng.random() < 0.5, rng.random() < 0.3) for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "is_match boolean, f boolean")
    r = fellegi_sunter_weights(df, "is_match", ["f"]).collect()[0]
    assert abs(r["w_agree"]) < 0.3
    assert abs(r["w_disagree"]) < 0.3
