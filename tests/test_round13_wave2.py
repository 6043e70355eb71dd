"""Round-13 wave-2 operator tests: BWS, Wald-Wolfowitz two-sample
runs, Granger lag-1, Chow break, D'Agostino K², Wilson CI and the
per-label embedding centroid profile — brute-force references
computed independently in-test (numpy least-squares for the
regression family, definition-level Python for the rank family),
plus the invariants each statistic is defined by."""

from __future__ import annotations

import math

import numpy as np
import pytest

from reddit_etl_spark.operators.relational import (
    bws_two_sample,
    dagostino_k2,
    runs_two_sample,
    wilson_ci,
)
from reddit_etl_spark.operators.series import chow_test, granger_lag1
from reddit_etl_spark.operators.similarity import label_centroids


# ---------------------------------------------------------------- BWS


def _bws_reference(xs, ys):
    """Definition-level BWS with midranks, pure Python."""
    pooled = sorted([(v, 0) for v in xs] + [(v, 1) for v in ys])
    n, m = len(xs), len(ys)
    nn = n + m
    # midrank per distinct value
    ranks = {}
    i = 0
    vals = [v for v, _ in pooled]
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        ranks[vals[i]] = (i + 1 + j) / 2.0  # mean of positions i+1..j
        i = j

    def b_side(sample, n_own, n_other):
        s = 0.0
        for k, v in enumerate(sorted(sample), start=1):
            r = ranks[v]
            num = (r - (nn / n_own) * k) ** 2
            den = (
                (k / (n_own + 1))
                * (1 - k / (n_own + 1))
                * (n_other * nn / n_own)
            )
            s += num / den
        return s / n_own

    bx = b_side(xs, n, m)
    by = b_side(ys, m, n)
    return bx, by, (bx + by) / 2.0


def _run_bws(spark, xs, ys, lane="single"):
    rows = [(float(v), "a") for v in xs] + [(float(v), "b") for v in ys]
    df = spark.createDataFrame(rows, "v double, c string")
    return bws_two_sample(df, "v", "c", "a", scale=100, lane=lane).collect()[
        0
    ]


def test_bws_matches_brute_force_no_ties(spark):
    xs = [1.0, 2.5, 4.0, 7.25, 9.5, 12.0]
    ys = [0.5, 3.0, 5.5, 6.0, 8.0, 10.0, 11.0]
    r = _run_bws(spark, xs, ys)
    bx, by, b = _bws_reference(xs, ys)
    assert r["n_a"] == 6 and r["n_b"] == 7
    assert r["b_x"] == pytest.approx(bx, abs=2e-6)
    assert r["b_y"] == pytest.approx(by, abs=2e-6)
    assert r["b"] == pytest.approx(b, abs=2e-6)


def test_bws_matches_brute_force_with_ties(spark):
    xs = [1.0, 1.0, 2.0, 2.0, 3.0, 5.0, 5.0]
    ys = [1.0, 2.0, 2.0, 4.0, 5.0, 5.0, 5.0, 6.0]
    r = _run_bws(spark, xs, ys)
    bx, by, b = _bws_reference(xs, ys)
    assert r["b_x"] == pytest.approx(bx, abs=2e-6)
    assert r["b_y"] == pytest.approx(by, abs=2e-6)
    assert r["b"] == pytest.approx(b, abs=2e-6)


def test_bws_lane_parity(spark):
    rng = np.random.default_rng(7)
    xs = [round(float(v), 2) for v in rng.normal(10, 3, 80)]
    ys = [round(float(v), 2) for v in rng.normal(11, 4, 70)]
    single = _run_bws(spark, xs, ys, lane="single")
    two_pass = _run_bws(spark, xs, ys, lane="two_pass")
    auto = _run_bws(spark, xs, ys, lane="auto")
    assert single == two_pass == auto


def test_bws_separated_larger_than_identical(spark):
    near = _run_bws(spark, [1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0])
    far = _run_bws(spark, [1.0, 2.0, 3.0, 4.0], [11.0, 12.0, 13.0, 14.0])
    assert far["b"] > near["b"]


def test_bws_empty_side_is_null(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a")], "v double, c string"
    )
    r = bws_two_sample(df, "v", "c", "a").collect()[0]
    assert r["n_b"] == 0 and r["b"] is None


# ------------------------------------------------- Wald-Wolfowitz runs


def _runs_reference(xs, ys):
    """Count runs under the (value, a-first) tie convention."""
    pooled = sorted([(v, 0) for v in xs] + [(v, 1) for v in ys])
    labels = [lab for _, lab in pooled]
    return 1 + sum(
        1 for i in range(1, len(labels)) if labels[i] != labels[i - 1]
    )


def test_runs_matches_brute_force(spark):
    rng = np.random.default_rng(3)
    xs = [round(float(v), 2) for v in rng.normal(5, 2, 40)]
    ys = [round(float(v), 2) for v in rng.normal(6, 2, 35)]
    rows = [(v, "a") for v in xs] + [(v, "b") for v in ys]
    df = spark.createDataFrame(rows, "v double, c string")
    r = runs_two_sample(df, "v", "c", "a").collect()[0]
    expect = _runs_reference(xs, ys)
    assert r["runs"] == expect
    na, nb = 40, 35
    nn = na + nb
    mu = 1 + 2 * na * nb / nn
    var = 2 * na * nb * (2 * na * nb - nn) / (nn**2 * (nn - 1))
    z = (expect - mu) / math.sqrt(var)
    assert r["mu"] == pytest.approx(mu, abs=1e-6)
    assert r["z"] == pytest.approx(z, abs=1e-6)
    assert 0.0 <= r["p"] <= 1.0


def test_runs_fully_separated_is_two(spark):
    rows = [(float(i), "a") for i in range(10)] + [
        (float(100 + i), "b") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "v double, c string")
    r = runs_two_sample(df, "v", "c", "a").collect()[0]
    assert r["runs"] == 2
    assert r["z"] < -3  # far too few runs
    assert r["p"] < 0.01


def test_runs_tie_convention_within_block(spark):
    # one tied value holding both classes: sequence a,a,b -> 2 runs
    rows = [(1.0, "a"), (1.0, "a"), (1.0, "b")]
    df = spark.createDataFrame(rows, "v double, c string")
    assert runs_two_sample(df, "v", "c", "a").collect()[0]["runs"] == 2


def test_runs_empty_side_null(spark):
    df = spark.createDataFrame([(1.0, "a")], "v double, c string")
    r = runs_two_sample(df, "v", "c", "a").collect()[0]
    assert r["runs"] is None and r["z"] is None


# ------------------------------------------------------- Granger lag-1


def _granger_reference(y, x):
    """numpy least-squares Granger F (restricted vs full, lag 1)."""
    yt = np.array(y[1:], dtype=float)
    u = np.array(y[:-1], dtype=float)
    w = np.array(x[:-1], dtype=float)
    n = len(yt)
    xr = np.column_stack([np.ones(n), u])
    xf = np.column_stack([np.ones(n), u, w])
    br, res_r, *_ = np.linalg.lstsq(xr, yt, rcond=None)
    bf, res_f, *_ = np.linalg.lstsq(xf, yt, rcond=None)
    ssr_r = float(np.sum((yt - xr @ br) ** 2))
    ssr_f = float(np.sum((yt - xf @ bf) ** 2))
    f = (ssr_r - ssr_f) * (n - 3) / ssr_f
    return bf[1], bf[2], ssr_r, ssr_f, f


def test_granger_matches_numpy(spark):
    rng = np.random.default_rng(11)
    x = list(rng.integers(5, 50, 25))
    # y depends on lagged x -> strong Granger signal
    y = [10]
    for t in range(1, 25):
        y.append(int(2 * x[t - 1] + rng.integers(0, 5)))
    daily = spark.createDataFrame(
        [(t, int(y[t]), int(x[t])) for t in range(25)],
        "t long, y long, x long",
    )
    r = granger_lag1(daily, "t", "y", "x").collect()[0]
    b, c, ssr_r, ssr_f, f = _granger_reference(y, x)
    assert r["n_pairs"] == 24
    assert r["beta_lag_y"] == pytest.approx(b, abs=1e-4)
    assert r["beta_lag_x"] == pytest.approx(c, abs=1e-4)
    assert r["ssr_r"] == pytest.approx(ssr_r, rel=1e-6, abs=1e-4)
    assert r["ssr_f"] == pytest.approx(ssr_f, rel=1e-6, abs=1e-4)
    assert r["f_stat"] == pytest.approx(f, rel=1e-5, abs=1e-4)
    assert r["f_stat"] > 10  # x really does Granger-cause y


def test_granger_gap_drops_pair(spark):
    daily = spark.createDataFrame(
        [(1, 5, 3), (2, 6, 4), (4, 7, 5), (5, 8, 6)],
        "t long, y long, x long",
    )
    r = granger_lag1(daily, "t", "y", "x").collect()[0]
    assert r["n_pairs"] == 2  # (1,2) and (4,5) only


def test_granger_degenerate_null(spark):
    daily = spark.createDataFrame(
        [(1, 5, 3), (2, 6, 4)], "t long, y long, x long"
    )
    r = granger_lag1(daily, "t", "y", "x").collect()[0]
    assert r["f_stat"] is None


# ------------------------------------------------------------- Chow


def _chow_reference(t, y, split):
    t = np.array(t, float)
    y = np.array(y, float)
    m1, m2 = t <= split, t > split

    def ssr(tt, yy):
        x = np.column_stack([np.ones(len(tt)), tt])
        b, *_ = np.linalg.lstsq(x, yy, rcond=None)
        return float(np.sum((yy - x @ b) ** 2)), b[1]

    s1, sl1 = ssr(t[m1], y[m1])
    s2, sl2 = ssr(t[m2], y[m2])
    sp, slp = ssr(t, y)
    n = len(t)
    f = ((sp - s1 - s2) / 2) / ((s1 + s2) / (n - 4))
    return sl1, sl2, slp, f


def test_chow_matches_numpy(spark):
    rng = np.random.default_rng(5)
    t = list(range(1, 31))
    # slope change at t=15
    y = [
        int(10 * tt + rng.integers(0, 8))
        if tt <= 15
        else int(40 * tt - 450 + rng.integers(0, 8))
        for tt in t
    ]
    daily = spark.createDataFrame(
        list(zip(t, y)), "t long, y long"
    )
    r = chow_test(daily, "t", "y", 15).collect()[0]
    sl1, sl2, slp, f = _chow_reference(t, y, 15)
    assert r["n_1"] == 15 and r["n_2"] == 15
    assert r["slope_1"] == pytest.approx(sl1, abs=1e-4)
    assert r["slope_2"] == pytest.approx(sl2, abs=1e-4)
    assert r["slope_pooled"] == pytest.approx(slp, abs=1e-4)
    assert r["f_stat"] == pytest.approx(f, rel=1e-5, abs=1e-4)
    assert r["f_stat"] > 50  # a real break


def test_chow_no_break_small_f(spark):
    t = list(range(1, 31))
    y = [7 * tt + (3 if tt % 2 else -3) for tt in t]
    daily = spark.createDataFrame(list(zip(t, y)), "t long, y long")
    r = chow_test(daily, "t", "y", 15).collect()[0]
    assert r["f_stat"] is not None and r["f_stat"] < 3


def test_chow_short_segment_null(spark):
    daily = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 11), (4, 16)], "t long, y long"
    )
    assert chow_test(daily, "t", "y", 2).collect()[0]["f_stat"] is None


# ------------------------------------------------------ D'Agostino K²


def _dagostino_reference(vals):
    """Independent numpy coding of D'Agostino (1970) + Anscombe-
    Glynn (1983), population moments."""
    a = np.asarray(vals, float)
    n = len(a)
    mu = a.mean()
    m2 = ((a - mu) ** 2).mean()
    m3 = ((a - mu) ** 3).mean()
    m4 = ((a - mu) ** 4).mean()
    g1 = m3 / m2**1.5
    b2 = m4 / m2**2
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = (
        3.0
        * (n * n + 27 * n - 70)
        * (n + 1)
        * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = math.sqrt(2 * (beta2 - 1)) - 1
    delta = 1 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2 / (w2 - 1))
    z1 = delta * math.asinh(y / alpha)
    eb2 = 3 * (n - 1) / (n + 1)
    vb2 = 24 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    x = (b2 - eb2) / math.sqrt(vb2)
    sb1 = (
        6
        * (n * n - 5 * n + 2)
        / ((n + 7) * (n + 9))
        * math.sqrt(6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    )
    aa = 6 + 8 / sb1 * (2 / sb1 + math.sqrt(1 + 4 / sb1**2))
    z2 = (
        (1 - 2 / (9 * aa))
        - np.cbrt((1 - 2 / aa) / (1 + x * math.sqrt(2 / (aa - 4))))
    ) / math.sqrt(2 / (9 * aa))
    k2 = z1 * z1 + z2 * z2
    return g1, b2 - 3, z1, float(z2), k2, math.exp(-k2 / 2)


def test_dagostino_matches_numpy(spark):
    rng = np.random.default_rng(9)
    vals = [round(float(v), 2) for v in rng.lognormal(2, 0.6, 400)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = dagostino_k2(df, "v", scale=100).collect()[0]
    g1, ke, z1, z2, k2, p = _dagostino_reference(vals)
    assert r["n"] == 400
    assert r["skew"] == pytest.approx(g1, abs=1e-5)
    assert r["kurt_excess"] == pytest.approx(ke, abs=1e-5)
    assert r["z_skew"] == pytest.approx(z1, abs=1e-5)
    assert r["z_kurt"] == pytest.approx(z2, abs=1e-5)
    assert r["k2"] == pytest.approx(k2, abs=1e-4)
    assert r["p_k2"] == pytest.approx(p, abs=1e-5)
    assert r["z_skew"] > 2  # lognormal is right-skewed


def test_dagostino_symmetric_zero_skew_z(spark):
    vals = [float(v) for v in range(-50, 51)]  # exactly symmetric
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = dagostino_k2(df, "v", scale=100).collect()[0]
    assert r["skew"] == 0.0 and r["z_skew"] == 0.0


def test_dagostino_small_n_null(spark):
    df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    r = dagostino_k2(df, "v").collect()[0]
    assert r["z_skew"] is None and r["k2"] is None


# ---------------------------------------------------------- Wilson CI


def test_wilson_hand_computed(spark):
    rows = [("g", True)] * 8 + [("g", False)] * 12
    df = spark.createDataFrame(rows, "g string, hit boolean")
    r = wilson_ci(df, ["g"], "hit").collect()[0]
    z = 1.959963984540054
    n, k = 20, 8
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z / denom * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert r["n"] == n and r["k"] == k
    assert r["p_hat"] == pytest.approx(p, abs=1e-6)
    assert r["lo"] == pytest.approx(center - half, abs=1e-6)
    assert r["hi"] == pytest.approx(center + half, abs=1e-6)


def test_wilson_bounds_stay_in_unit_interval(spark):
    rows = [("all", True)] * 5 + [("none", False)] * 5
    df = spark.createDataFrame(rows, "g string, hit boolean")
    out = {r["g"]: r for r in wilson_ci(df, ["g"], "hit").collect()}
    assert out["all"]["hi"] <= 1.0 and out["all"]["lo"] > 0.0
    assert out["none"]["lo"] >= 0.0 and out["none"]["hi"] < 1.0


def test_wilson_interval_contains_p_hat(spark):
    rows = [("g", i % 3 == 0) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, hit boolean")
    r = wilson_ci(df, ["g"], "hit").collect()[0]
    assert r["lo"] < r["p_hat"] < r["hi"]


# ------------------------------------------------- label centroids


def test_label_centroids_matches_numpy(spark):
    rng = np.random.default_rng(13)
    rows = []
    vecs = {0: [], 1: []}
    for i in range(40):
        lab = i % 2
        v = [round(float(x), 4) for x in rng.normal(lab, 1, 8)]
        vecs[lab].append(v)
        rows.append((i, v, lab))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in label_centroids(df, "embedding", "label").collect()}
    allv = np.array(
        [np.asarray(v, np.float32) for v in vecs[0] + vecs[1]], float
    )
    gc = allv.mean(axis=0)
    for lab in (0, 1):
        arr = np.array([np.asarray(v, np.float32) for v in vecs[lab]], float)
        cent = arr.mean(axis=0)
        cos = float(
            cent @ gc / (np.linalg.norm(cent) * np.linalg.norm(gc))
        )
        assert out[lab]["n"] == len(vecs[lab])
        assert out[lab]["centroid_norm"] == pytest.approx(
            float(np.linalg.norm(cent)), abs=1e-5
        )
        assert out[lab]["cos_global"] == pytest.approx(cos, abs=1e-5)


def test_label_centroids_identical_vectors_cos_one(spark):
    v = [1.0, 2.0, 3.0]
    rows = [(i, v, i % 2) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    for r in label_centroids(df, "embedding", "label").collect():
        assert r["cos_global"] == pytest.approx(1.0, abs=1e-6)


def test_label_centroids_null_rows_dropped(spark):
    rows = [(0, [1.0, 0.0], 0), (1, None, 0), (2, [0.0, 1.0], None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = label_centroids(df, "embedding", "label").collect()
    assert len(out) == 1 and out[0]["n"] == 1
