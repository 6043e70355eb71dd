"""Round-13 wave-4 operator tests: the Acklam Φ⁻¹ primitive and its
normal-scores consumers (van der Waerden, Fligner-Killeen,
Shapiro-Francia) plus Bartels' rank von Neumann and Newey-West HAC
mean inference — references computed independently in-test via an
erf-bisection probit (math.erf, not the operator's formula), numpy
moments, and definition-level Python."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.relational import (
    fligner_killeen,
    shapiro_francia,
    van_der_waerden,
)
from reddit_etl_spark.operators.series import bartels_rank, newey_west_mean
from reddit_etl_spark.operators.util import norm_ppf, norm_ppf_sql


def _true_ppf(p: float) -> float:
    """Independent probit: bisection against math.erf's Φ."""
    lo, hi = -9.0, 9.0
    for _ in range(80):
        mid = (lo + hi) / 2
        if 0.5 * (1 + math.erf(mid / math.sqrt(2))) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


# ------------------------------------------------------------ norm_ppf


def test_norm_ppf_spot_quantiles(spark):
    ps = [0.001, 0.01, 0.02425, 0.025, 0.1586553, 0.5, 0.8413447,
          0.975, 0.97575, 0.99, 0.999]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    out = df.select("p", norm_ppf(F.col("p")).alias("z")).collect()
    for r in out:
        assert r["z"] == pytest.approx(
            _true_ppf(r["p"]), abs=5e-8
        ), r["p"]


def test_norm_ppf_sql_twin_matches_spark(spark):
    import duckdb

    ps = [0.0007, 0.013, 0.02425, 0.31, 0.5, 0.77, 0.97575, 0.9991]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    got = {
        r["p"]: r["z"]
        for r in df.select("p", norm_ppf(F.col("p")).alias("z")).collect()
    }
    con = duckdb.connect()
    sql = norm_ppf_sql("p")
    for p in ps:
        (z,) = con.execute(
            f"SELECT {sql} FROM (SELECT CAST({p!r} AS DOUBLE) AS p)"
        ).fetchone()
        # same closed formula -> bit-near-identical (ln/sqrt ulps only)
        assert z == pytest.approx(got[p], abs=1e-12)


# ----------------------------------------------------- van der Waerden


def _vdw_reference(groups):
    pooled = sorted(v for g in groups for v in g)
    n = len(pooled)
    # midrank per distinct value
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    scores = {v: _true_ppf(r / (n + 1)) for v, r in ranks.items()}
    s2 = sum(scores[v] ** 2 for v in pooled) / (n - 1)
    t = sum(
        (sum(scores[v] for v in g)) ** 2 / len(g) for g in groups
    ) / s2
    return t


def test_vdw_matches_brute_force(spark):
    rng = np.random.default_rng(61)
    ga = [round(float(v), 2) for v in rng.normal(10, 2, 40)]
    gb = [round(float(v), 2) for v in rng.normal(11.5, 2, 35)]
    gc = [round(float(v), 2) for v in rng.normal(10.5, 2, 30)]
    rows = (
        [(v, "a") for v in ga] + [(v, "b") for v in gb] + [(v, "c") for v in gc]
    )
    df = spark.createDataFrame(rows, "v double, c string")
    r = van_der_waerden(df, "v", "c").collect()[0]
    t = _vdw_reference([ga, gb, gc])
    assert r["n"] == 105 and r["k"] == 3 and r["dof"] == 2
    assert r["t_stat"] == pytest.approx(t, rel=1e-5, abs=1e-4)


def test_vdw_identical_groups_small(spark):
    rows = [(float(i % 20), c) for c in "ab" for i in range(60)]
    df = spark.createDataFrame(rows, "v double, c string")
    r = van_der_waerden(df, "v", "c").collect()[0]
    assert r["t_stat"] == pytest.approx(0.0, abs=1e-9)


# ----------------------------------------------------- Fligner-Killeen


def _fk_reference(groups):
    # lower-median convention, midranks, a = ppf(.5 + r/(2(N+1)))
    devs = []
    for g in groups:
        sg = sorted(g)
        nj = len(sg)
        # lower median: smallest v with 2*cum >= nj
        cum = 0
        med = sg[-1]
        seen = set()
        for v in sg:
            cum += 1
            if 2 * cum >= nj:
                med = v
                break
        devs.append([abs(v - med) for v in g])
    pooled = sorted(d for g in devs for d in g)
    n = len(pooled)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    score = {d: _true_ppf(0.5 + r / (2 * (n + 1))) for d, r in ranks.items()}
    allsc = [score[d] for g in devs for d in g]
    abar = sum(allsc) / n
    v = sum((s - abar) ** 2 for s in allsc) / (n - 1)
    x2 = sum(
        len(g) * ((sum(score[d] for d in g) / len(g)) - abar) ** 2
        for g in devs
    ) / v
    return x2


def test_fligner_matches_brute_force(spark):
    rng = np.random.default_rng(67)
    ga = [round(float(v), 2) for v in rng.normal(10, 1, 40)]
    gb = [round(float(v), 2) for v in rng.normal(10, 4, 35)]
    rows = [(v, "a") for v in ga] + [(v, "b") for v in gb]
    df = spark.createDataFrame(rows, "v double, c string")
    r = fligner_killeen(df, "v", "c").collect()[0]
    x2 = _fk_reference([ga, gb])
    assert r["n"] == 75 and r["k"] == 2 and r["dof"] == 1
    assert r["x2"] == pytest.approx(x2, rel=1e-5, abs=1e-4)
    assert r["x2"] > 6  # 4x the spread is detectable


def test_fligner_equal_scales_small(spark):
    rng = np.random.default_rng(71)
    ga = [round(float(v), 2) for v in rng.normal(0, 2, 50)]
    gb = [round(float(v), 2) for v in rng.normal(5, 2, 50)]  # mean shift only
    rows = [(v, "a") for v in ga] + [(v, "b") for v in gb]
    df = spark.createDataFrame(rows, "v double, c string")
    r = fligner_killeen(df, "v", "c").collect()[0]
    assert r["x2"] < 4  # location shift is centered away


# ---------------------------------------------------- Shapiro-Francia


def _sf_reference(vals):
    xs = sorted(vals)
    n = len(xs)
    m = [_true_ppf((k - 0.375) / (n + 0.25)) for k in range(1, n + 1)]
    xm = np.array(xs)
    mm = np.array(m)
    return float(
        np.corrcoef(xm, mm)[0, 1] ** 2
    )


def test_shapiro_francia_matches_brute_force(spark):
    rng = np.random.default_rng(73)
    vals = [round(float(v), 2) for v in rng.normal(50, 5, 200)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = shapiro_francia(df, "v").collect()[0]
    w = _sf_reference(vals)
    assert r["n"] == 200
    assert r["w_stat"] == pytest.approx(w, abs=1e-5)
    assert r["w_stat"] > 0.98  # normal data -> straight QQ


def test_shapiro_francia_skewed_lower(spark):
    rng = np.random.default_rng(79)
    vals = [round(float(v), 2) for v in rng.lognormal(1, 1, 200)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = shapiro_francia(df, "v").collect()[0]
    assert r["w_stat"] < 0.9


# -------------------------------------------------------- Bartels RVN


def _bartels_reference(y):
    n = len(y)
    order = sorted(range(n), key=lambda i: y[i])
    r = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and y[order[j]] == y[order[i]]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for t in range(i, j):
            r[order[t]] = mid
        i = j
    rbar = sum(r) / n
    num = sum((r[t] - r[t + 1]) ** 2 for t in range(n - 1))
    den = sum((x - rbar) ** 2 for x in r)
    rvn = num / den
    var = 4 * (n - 2) * (5 * n * n - 2 * n - 9) / (
        5 * n * (n + 1) * (n - 1) ** 2
    )
    return rvn, (rvn - 2) / math.sqrt(var)


def test_bartels_matches_brute_force(spark):
    rng = np.random.default_rng(83)
    y = [int(v) for v in rng.integers(0, 1000, 40)]
    df = spark.createDataFrame(
        [(t + 1, y[t]) for t in range(40)], "t long, y long"
    )
    r = bartels_rank(df, "t", "y").collect()[0]
    rvn, z = _bartels_reference(y)
    assert r["n"] == 40
    assert r["rvn"] == pytest.approx(rvn, abs=1e-6)
    assert r["z"] == pytest.approx(z, abs=1e-5)
    assert 0.0 <= r["p"] <= 1.0


def test_bartels_trend_small_rvn(spark):
    y = [10 * t + (1 if t % 2 else -1) for t in range(1, 41)]
    df = spark.createDataFrame(
        [(t, y[t - 1]) for t in range(1, 41)], "t long, y long"
    )
    r = bartels_rank(df, "t", "y").collect()[0]
    assert r["rvn"] < 1 and r["z"] < -3  # strong trend


# --------------------------------------------------------- Newey-West


def _nw_reference(y, L=3):
    y = np.asarray(y, float)
    n = len(y)
    mu = y.mean()
    d = y - mu
    g0 = float(d @ d) / n
    lrv = g0
    for lag in range(1, L + 1):
        gl = float(d[:-lag] @ d[lag:]) / n
        lrv += 2 * (1 - lag / (L + 1)) * gl
    se_iid = math.sqrt(g0 * n / (n - 1) / n)
    se_nw = math.sqrt(lrv / n)
    return mu, se_iid, se_nw


def test_newey_west_matches_numpy(spark):
    rng = np.random.default_rng(89)
    # AR(1)-ish positive autocorrelation
    y = [500]
    for _ in range(59):
        y.append(int(0.7 * y[-1] + 0.3 * 500 + rng.integers(-40, 40)))
    df = spark.createDataFrame(
        [(t + 1, y[t]) for t in range(60)], "t long, y long"
    )
    r = newey_west_mean(df, "t", "y", max_lag=3, scale=1).collect()[0]
    mu, se_iid, se_nw = _nw_reference(y)
    assert r["n"] == 60
    assert r["mean"] == pytest.approx(mu, abs=1e-4)
    assert r["se_iid"] == pytest.approx(se_iid, abs=1e-4)
    assert r["se_nw"] == pytest.approx(se_nw, abs=1e-4)
    assert r["inflation"] > 1.2  # positive autocorrelation inflates


def test_newey_west_iid_inflation_near_one(spark):
    rng = np.random.default_rng(97)
    y = [int(v) for v in rng.integers(100, 200, 80)]
    df = spark.createDataFrame(
        [(t + 1, y[t]) for t in range(80)], "t long, y long"
    )
    r = newey_west_mean(df, "t", "y", max_lag=3, scale=1).collect()[0]
    assert 0.6 < r["inflation"] < 1.4
