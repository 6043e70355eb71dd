"""Round-10 wave 6: Anderson-Darling 2-sample, Dunn post-hoc, SRM,
Poisson two-rate, CEM matching, Pettitt change-point, OLS influence,
decomposition strength. Hand cases + brute-force parity."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ AD 2s


def _py_ad2(xs, ys, scale=100):
    """Tie-adjusted two-sample A2_akN (Scholz-Stephens), plain
    Python over distinct pooled values."""
    a = Counter(round(x * scale) for x in xs)
    b = Counter(round(y * scale) for y in ys)
    na, nb = sum(a.values()), sum(b.values())
    n = na + nb
    vals = sorted(set(a) | set(b))
    cfa = cl = 0
    s = 0.0
    for v in vals:
        fa, l = a.get(v, 0), a.get(v, 0) + b.get(v, 0)
        fb = b.get(v, 0)
        m2a = 2 * cfa + fa
        b2 = 2 * cl + l
        m2b = b2 - m2a
        den = b2 * (2 * n - b2) - n * l
        if den > 0:
            num_a = n * m2a - na * b2
            num_b = n * m2b - nb * b2
            s += l * (num_a**2 / na + num_b**2 / nb) / (n * den)
        cfa += fa
        cl += l
    return (n - 1) / n * s


def test_ad2_bruteforce_parity(spark):
    from reddit_etl_spark.operators.relational import (
        anderson_darling_two_sample,
    )

    rng = random.Random(23)
    xs = [round(rng.gauss(50, 10), 2) for _ in range(200)]
    ys = [round(rng.gauss(52, 18), 2) for _ in range(150)]
    rows = [(x, "a") for x in xs] + [(y, "b") for y in ys]
    df = spark.createDataFrame(rows, "v double, c string")
    r = anderson_darling_two_sample(df, "v", "c", "a").collect()[0]
    assert abs(r["a2"] - _py_ad2(xs, ys)) < 1e-5
    assert (r["n_a"], r["n_b"]) == (200, 150)


def test_ad2_identical_samples_near_zero(spark):
    from reddit_etl_spark.operators.relational import (
        anderson_darling_two_sample,
    )

    xs = [float(i % 20) for i in range(200)]
    rows = [(x, "a") for x in xs] + [(x, "b") for x in xs]
    df = spark.createDataFrame(rows, "v double, c string")
    r = anderson_darling_two_sample(df, "v", "c", "a").collect()[0]
    # identical distributions: A2 should sit near its null mean, far
    # below the ~2+ rejection region
    assert r["a2"] < 1.0


def test_ad2_degenerate_null(spark):
    from reddit_etl_spark.operators.relational import (
        anderson_darling_two_sample,
    )

    rows = [(5.0, "a"), (5.0, "b")]
    df = spark.createDataFrame(rows, "v double, c string")
    assert (
        anderson_darling_two_sample(df, "v", "c", "a").collect()[0]["a2"]
        is None
    )


# -------------------------------------------------------------------- dunn


def test_dunn_matches_manual_ranks(spark):
    from reddit_etl_spark.operators.relational import dunn_test

    # a={1,2}, b={3,4}, c={5,6}: ranks 1..6, R̄=1.5, 3.5, 5.5, no ties
    rows = [
        ("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
        ("c", 5.0), ("c", 6.0),
    ]
    df = spark.createDataFrame(rows, "c string, v double")
    out = {(r["class_a"], r["class_b"]): r for r in dunn_test(
        df, "v", "c").collect()}
    ab = out[("a", "b")]
    sigma2 = 6 * 7 / 12.0
    want = (1.5 - 3.5) / math.sqrt(sigma2 * (1 / 2 + 1 / 2))
    assert abs(ab["z"] - want) < 1e-6
    assert ab["mean_rank_a"] == 1.5 and ab["mean_rank_b"] == 3.5
    assert len(out) == 3


def test_dunn_symmetric_shift_signs(spark):
    from reddit_etl_spark.operators.relational import dunn_test

    rng = random.Random(31)
    rows = [("lo", round(rng.uniform(0, 10), 2)) for _ in range(100)]
    rows += [("hi", round(rng.uniform(5, 15), 2)) for _ in range(100)]
    df = spark.createDataFrame(rows, "c string, v double")
    r = dunn_test(df, "v", "c").collect()[0]
    # class_a = 'hi' sorts first; its mean rank should exceed 'lo''s
    assert r["class_a"] == "hi" and r["z"] > 0


# --------------------------------------------------------------------- srm


def test_srm_balanced_and_skewed(spark):
    from reddit_etl_spark.operators.relational import srm_check

    rows = [(str(i % 2),) for i in range(1000)]
    df = spark.createDataFrame(rows, "arm string")
    out = srm_check(df, "arm", {"0": 0.5, "1": 0.5}).collect()
    assert all(r["chi2_term"] == 0.0 for r in out)
    rows = [("0",)] * 900 + [("1",)] * 100
    df = spark.createDataFrame(rows, "arm string")
    out = srm_check(df, "arm", {"0": 0.5, "1": 0.5}).collect()
    # chi2 = (900-500)^2/500 * 2 = 640
    assert sum(r["chi2_term"] for r in out) == 640.0


def test_srm_arm_mismatch_raises(spark):
    from reddit_etl_spark.operators.relational import srm_check

    df = spark.createDataFrame([("0",), ("2",)], "arm string")
    with pytest.raises(Exception, match="arm mismatch"):
        srm_check(df, "arm", {"0": 0.5, "1": 0.5}).collect()


# ----------------------------------------------------------------- poisson


def test_poisson_two_rate_hand_case(spark):
    from reddit_etl_spark.operators.relational import poisson_two_rate

    # w1: 20 events over 2 days (rate 10); w2: 5 events over 5 days
    # (rate 1) -> RR 10
    rows = [("g", True, d % 2) for d in range(20)] + [
        ("g", False, 10 + d) for d in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, w boolean, d long")
    r = poisson_two_rate(df, ["g"], "w", "d").collect()[0]
    assert (r["c1"], r["c2"], r["t1"], r["t2"]) == (20, 5, 2, 5)
    assert r["rate_ratio"] == 10.0
    want_z = math.log(10.0) / math.sqrt(1 / 20 + 1 / 5)
    assert abs(r["z"] - want_z) < 1e-6


def test_poisson_zero_count_null_z(spark):
    from reddit_etl_spark.operators.relational import poisson_two_rate

    rows = [("g", True, 1)] * 3
    df = spark.createDataFrame(rows, "g string, w boolean, d long")
    r = poisson_two_rate(df, ["g"], "w", "d").collect()[0]
    assert r["z"] is None and r["c2"] == 0


# --------------------------------------------------------------------- cem


def test_cem_weights_balance_strata(spark):
    from reddit_etl_spark.operators.relational import cem_match

    # stratum A: 2t/4c; stratum B: 3t/1c; stratum C: 1t/0c (pruned)
    rows = (
        [(True, "A")] * 2 + [(False, "A")] * 4
        + [(True, "B")] * 3 + [(False, "B")] * 1
        + [(True, "C")] * 1
    )
    df = spark.createDataFrame(rows, "t boolean, s string")
    out = {r["s"]: r for r in cem_match(df, "t", ["s"]).collect()}
    assert set(out) == {"A", "B"}
    # kept: T=5, C=5 -> C/T = 1
    assert out["A"]["control_weight"] == 0.5  # (2/4)*1
    assert out["B"]["control_weight"] == 3.0  # (3/1)*1
    assert out["A"]["pruned_treated"] == 1
    # weighted control total == treated total within each stratum
    assert out["A"]["n_control"] * out["A"]["control_weight"] == 2.0
    assert out["B"]["n_control"] * out["B"]["control_weight"] == 3.0


# ----------------------------------------------------------------- pettitt


def _py_pettitt(xs):
    n = len(xs)
    best = (0.0, None, 0.0)
    for t in range(1, n + 1):
        u = sum(
            (xs[i] > xs[j]) - (xs[i] < xs[j])
            for i in range(t)
            for j in range(t, n)
        )
        if abs(u) > best[0]:
            best = (abs(u), t, u)
    return best


def test_pettitt_bruteforce_parity(spark):
    from reddit_etl_spark.operators.series import pettitt_test

    rng = random.Random(41)
    xs = [round(rng.uniform(0, 10), 1) for _ in range(20)] + [
        round(rng.uniform(5, 15), 1) for _ in range(20)
    ]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)],
        "g string, o long, v double",
    )
    r = pettitt_test(df, ["g"], "o", "v").collect()[0]
    k, t, u = _py_pettitt(xs)
    assert r["k_stat"] == k
    assert r["change_at"] == t - 1  # order value of the t-th point
    assert r["u_at_change"] == u


def test_pettitt_clean_shift_locates_boundary(spark):
    from reddit_etl_spark.operators.series import pettitt_test

    xs = [1.0] * 15 + [9.0] * 15
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)],
        "g string, o long, v double",
    )
    r = pettitt_test(df, ["g"], "o", "v").collect()[0]
    assert r["change_at"] == 14  # last point of the first regime
    assert r["k_stat"] == 15.0 * 15.0  # all 225 cross pairs disagree


# --------------------------------------------------------------- influence


def test_ols_influence_outlier_day_dominates(spark):
    from reddit_etl_spark.operators.series import ols_influence

    rows = [("g", x, 2.0 * x + 1.0) for x in range(1, 21)]
    rows[9] = ("g", 10, 2.0 * 10 + 1.0 + 40.0)  # planted outlier
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = ols_influence(df, ["g"], "x", "y", top_k=1).collect()
    assert out[0]["x"] == 10
    assert out[0]["cooks_d"] > 0.4


def test_ols_influence_leverage_ends_higher(spark):
    from reddit_etl_spark.operators.series import ols_influence

    rows = [("g", x, float(x)) for x in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = ols_influence(df, ["g"], "x", "y", top_k=10).collect()
    lev = {r["x"]: r["leverage"] for r in out}
    assert lev[1] > lev[5] and lev[10] > lev[6]
    # perfect fit: residuals all 0
    assert all(abs(r["residual"]) < 1e-9 for r in out)


# ---------------------------------------------------------------- strength


def test_strength_pure_seasonal_near_one(spark):
    from reddit_etl_spark.operators.series import decomposition_strength

    import datetime

    base = datetime.date(2024, 1, 1)
    # pure weekly pattern, no noise, no trend
    rows = [
        ("g", base + datetime.timedelta(days=i), float((i % 7) * 10))
        for i in range(35)
    ]
    df = spark.createDataFrame(rows, "g string, day date, v double")
    r = decomposition_strength(df, ["g"], "day", "v", period=7).collect()[0]
    assert r["seasonal_strength"] is not None
    assert r["seasonal_strength"] > 0.99
    # constant trend + zero remainder -> Var(T+R) = 0 -> NULL by
    # the zero-component-variance contract
    assert r["trend_strength"] is None or r["trend_strength"] < 0.2


def test_strength_pure_trend_near_one(spark):
    from reddit_etl_spark.operators.series import decomposition_strength

    import datetime

    base = datetime.date(2024, 1, 1)
    rows = [
        ("g", base + datetime.timedelta(days=i), float(i) * 5.0)
        for i in range(35)
    ]
    df = spark.createDataFrame(rows, "g string, day date, v double")
    r = decomposition_strength(df, ["g"], "day", "v", period=7).collect()[0]
    assert r["trend_strength"] is not None and r["trend_strength"] > 0.99
