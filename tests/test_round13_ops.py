"""Round-13 operator tests: Lilliefors, Kuiper, Hoeffding's D,
Blomqvist's beta, the paired sign test, Breslow-Day, TVD and
categorical feature screening — brute-force references computed
independently in-test on small frames, plus the invariants each
statistic is defined by."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from reddit_etl_spark.operators.classify import feature_screening
from reddit_etl_spark.operators.relational import (
    blomqvist_beta,
    breslow_day,
    hoeffding_d,
    kuiper_two_sample,
    lilliefors_normal,
    sign_test_paired,
    tvd_two_sample,
)


def test_sign_test_hand_computed(spark):
    # 7 positive, 2 negative, 3 zero differences
    rows = (
        [(0.0, 1.0)] * 7 + [(1.0, 0.0)] * 2 + [(2.0, 2.0)] * 3
    )
    df = spark.createDataFrame(rows, "x double, y double")
    r = sign_test_paired(df, "x", "y").collect()[0]
    assert r["n"] == 9 and r["n_zero"] == 3 and r["s_plus"] == 7
    z = (abs(7 - 4.5) - 0.5) / (0.5 * math.sqrt(9))
    assert r["z"] == pytest.approx(z, abs=1e-6)
    assert 0 < r["p_value"] < 1


def test_sign_test_balanced_is_insignificant(spark):
    rows = [(0.0, 1.0)] * 5 + [(1.0, 0.0)] * 5
    df = spark.createDataFrame(rows, "x double, y double")
    r = sign_test_paired(df, "x", "y").collect()[0]
    assert r["s_plus"] == 5 and r["p_value"] == pytest.approx(1.0)


def test_blomqvist_perfect_and_inverse(spark):
    pts = [(float(i), float(i)) for i in range(11)]
    df = spark.createDataFrame(pts, "x double, y double")
    r = blomqvist_beta(df, "x", "y").collect()[0]
    # the (median, median) point sits on both medians -> excluded
    assert r["n"] == 11 and r["n_used"] == 10
    assert r["beta"] == pytest.approx(1.0)
    inv = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(11)], "x double, y double"
    )
    assert blomqvist_beta(inv, "x", "y").collect()[0]["beta"] == pytest.approx(
        -1.0
    )


def test_kuiper_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [
        (rng.randrange(24), "a" if rng.random() < 0.5 else "b")
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "v long, cls string")
    r = kuiper_two_sample(df, "v", "cls", "a", "b").collect()[0]
    xs = sorted({v for v, _ in rows})
    na = sum(1 for _, c in rows if c == "a")
    nb = len(rows) - na
    dp = dm = 0.0
    for x in xs:
        fa = sum(1 for v, c in rows if c == "a" and v <= x) / na
        fb = sum(1 for v, c in rows if c == "b" and v <= x) / nb
        dp = max(dp, fa - fb)
        dm = max(dm, fb - fa)
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["d_plus"] == pytest.approx(dp, abs=1e-6)
    assert r["d_minus"] == pytest.approx(dm, abs=1e-6)
    assert r["kuiper_v"] == pytest.approx(dp + dm, abs=1e-6)


def _hoeffding_brute(pairs):
    """Hmisc-convention Hoeffding D on raw pairs (O(n²) reference)."""
    n = len(pairs)

    def mid_rank(vals, v):
        less = sum(1 for u in vals if u < v)
        eq = sum(1 for u in vals if u == v)
        return less + (eq + 1) / 2.0

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    d1 = d2 = d3 = 0.0
    for i, (xi, yi) in enumerate(pairs):
        q = 1.0
        for j, (xj, yj) in enumerate(pairs):
            if i == j:
                continue
            if xj < xi and yj < yi:
                q += 1.0
            elif (xj == xi and yj < yi) or (xj < xi and yj == yi):
                q += 0.5
            elif xj == xi and yj == yi:
                q += 0.25
        r = mid_rank(xs, xi)
        s = mid_rank(ys, yi)
        d1 += (q - 1) * (q - 2)
        d2 += (r - 1) * (r - 2) * (s - 1) * (s - 2)
        d3 += (r - 2) * (s - 2) * (q - 1)
    num = (n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3
    den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    return 30.0 * num / den


def test_hoeffding_matches_brute_force_with_ties(spark):
    import random

    rng = random.Random(3)
    pairs = [(rng.randrange(6), rng.randrange(5)) for _ in range(60)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = hoeffding_d(df, "x", "y").collect()[0]
    assert got["n"] == 60
    assert got["hoeffding_d"] == pytest.approx(
        _hoeffding_brute(pairs), abs=1e-6
    )


def test_hoeffding_detects_nonmonotone_dependence(spark):
    # y = (x - 5)^2: Kendall-ish stats score ~0, Hoeffding must not
    pairs = [(x, (x - 5) ** 2) for x in range(11) for _ in range(5)]
    df = spark.createDataFrame(pairs, "x long, y long")
    d = hoeffding_d(df, "x", "y").collect()[0]["hoeffding_d"]
    assert d > 0.05


def test_hoeffding_cell_guard(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 301).alias("y")
    )
    with pytest.raises(Exception, match="max_cells"):
        hoeffding_d(df, "x", "y", max_cells=100).collect()


def test_lilliefors_brute_force(spark):
    import random

    rng = random.Random(11)
    vals = [round(rng.gauss(10, 2), 2) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = lilliefors_normal(df, "v", scale=100).collect()[0]
    q = [round(v * 100) for v in vals]
    n = len(q)
    mu = sum(q) / n
    sd = math.sqrt(sum((x - mu) ** 2 for x in q) / (n - 1))

    def phi(z):
        az = abs(z)
        t = 1.0 / (1.0 + 0.2316419 * az)
        poly = t * (
            0.319381530
            + t
            * (
                -0.356563782
                + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))
            )
        )
        upper = math.exp(-az * az / 2.0) / 2.5066282746310002 * poly
        return 1.0 - upper if z >= 0 else upper

    d = 0.0
    qs = sorted(set(q))
    for v in qs:
        c = sum(1 for x in q if x < v)
        t = sum(1 for x in q if x == v)
        p = phi((v - mu) / sd)
        d = max(d, (c + t) / n - p, p - c / n)
    assert r["n"] == n
    assert r["d_stat"] == pytest.approx(d, abs=1e-6)
    assert r["mean"] == pytest.approx(mu / 100, abs=1e-6)


def test_breslow_day_homogeneous_vs_modified(spark):
    # identical 2x2 in every stratum -> OR homogeneous, BD ~ 0
    rows = []
    for s in range(4):
        rows += (
            [(s, True, True)] * 30
            + [(s, True, False)] * 70
            + [(s, False, True)] * 10
            + [(s, False, False)] * 90
        )
    df = spark.createDataFrame(rows, "s long, e boolean, o boolean")
    r = breslow_day(df, ["s"], "e", "o").collect()[0]
    assert r["n_strata"] == 4 and r["n_used"] == 4 and r["dof"] == 3
    or_expected = (30 * 90) / (70 * 10)
    assert r["or_mh"] == pytest.approx(or_expected, abs=1e-6)
    assert r["bd_stat"] == pytest.approx(0.0, abs=1e-6)
    # flip one stratum's association -> heterogeneity, BD large
    rows2 = [r_ for r_ in rows if r_[0] != 3] + (
        [(3, True, True)] * 10
        + [(3, True, False)] * 90
        + [(3, False, True)] * 30
        + [(3, False, False)] * 70
    )
    df2 = spark.createDataFrame(rows2, "s long, e boolean, o boolean")
    r2 = breslow_day(df2, ["s"], "e", "o").collect()[0]
    assert r2["bd_stat"] > 7.81  # chi2(3) at 5%


def test_tvd_identical_and_disjoint(spark):
    same = spark.createDataFrame(
        [(0, float(v % 5), c) for v in range(50) for c in ("a", "b")],
        "g long, v double, cls string",
    )
    r = tvd_two_sample(same, ["g"], "v", "cls", "a", "b").collect()[0]
    assert r["tvd"] == pytest.approx(0.0)
    disjoint = spark.createDataFrame(
        [(0, 1.0, "a")] * 10 + [(0, 2.0, "b")] * 10,
        "g long, v double, cls string",
    )
    r2 = tvd_two_sample(disjoint, ["g"], "v", "cls", "a", "b").collect()[0]
    assert r2["tvd"] == pytest.approx(1.0)


def test_feature_screening_perfect_vs_useless(spark):
    rows = [("hi" if y else "lo", "const", bool(y)) for y in (0, 1) * 50]
    df = spark.createDataFrame(rows, "f1 string, f2 string, y boolean")
    out = {
        r["feature"]: r
        for r in feature_screening(df, ["f1", "f2"], "y").collect()
    }
    assert out["f1"]["info_gain"] == pytest.approx(1.0)  # fully informative
    assert out["f1"]["gini_drop"] == pytest.approx(0.5)
    assert out["f2"]["info_gain"] == pytest.approx(0.0)  # constant feature
    assert out["f2"]["gini_drop"] == pytest.approx(0.0)
    assert out["f1"]["h_label"] == pytest.approx(1.0)
