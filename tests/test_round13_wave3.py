"""Round-13 wave-3 operator tests: G-test, ICC(1,1),
CUSUM-of-squares, Spiegelhalter z, Cronbach's alpha and group-aware
k-fold assignment — brute-force references computed independently
in-test plus each statistic's defining invariants."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.classify import (
    cronbach_alpha,
    spiegelhalter_z,
)
from reddit_etl_spark.operators.curation import (
    group_kfold_assign,
    kfold_col,
)
from reddit_etl_spark.operators.relational import (
    g_test_independence,
    icc_oneway_paired,
)
from reddit_etl_spark.operators.series import cusum_squares


# -------------------------------------------------------------- G-test


def test_g_test_matches_brute_force(spark):
    rows = (
        [("x", "p")] * 20
        + [("x", "q")] * 10
        + [("y", "p")] * 5
        + [("y", "q")] * 25
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = g_test_independence(df, "a", "b").collect()[0]
    n = 60
    obs = {("x", "p"): 20, ("x", "q"): 10, ("y", "p"): 5, ("y", "q"): 25}
    ra = {"x": 30, "y": 30}
    rb = {"p": 25, "q": 35}
    g = 2 * sum(
        o * math.log(o * n / (ra[a] * rb[b]))
        for (a, b), o in obs.items()
    )
    assert r["n"] == n and r["dof"] == 1
    assert r["g_stat"] == pytest.approx(g, abs=1e-5)
    assert r["g_stat"] > 10  # strongly dependent


def test_g_test_independent_near_zero(spark):
    # perfectly balanced table -> G exactly 0
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    assert g_test_independence(df, "a", "b").collect()[0][
        "g_stat"
    ] == pytest.approx(0.0, abs=1e-9)


def test_g_test_single_level_null(spark):
    df = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    r = g_test_independence(df, "a", "b").collect()[0]
    assert r["dof"] == 0 and r["g_stat"] is None


# ----------------------------------------------------------- ICC(1,1)


def test_icc_matches_brute_force(spark):
    rng = np.random.default_rng(17)
    subj = rng.normal(50, 10, 30)
    x = np.round(subj + rng.normal(0, 2, 30), 6)
    y = np.round(subj + rng.normal(0, 2, 30), 6)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    r = icc_oneway_paired(df, "x", "y").collect()[0]
    n = 30
    m = (x + y) / 2
    msb = 2 * np.sum((m - m.mean()) ** 2) / (n - 1)
    msw = float(np.sum((x - y) ** 2)) / (2 * n)
    icc = (msb - msw) / (msb + msw)
    assert r["msb"] == pytest.approx(msb, rel=1e-6, abs=1e-5)
    assert r["msw"] == pytest.approx(msw, rel=1e-6, abs=1e-5)
    assert r["icc"] == pytest.approx(icc, abs=1e-5)
    assert r["icc"] > 0.8  # strong subject effect


def test_icc_no_subject_effect_near_zero(spark):
    rng = np.random.default_rng(23)
    x = np.round(rng.normal(0, 1, 200), 6)
    y = np.round(rng.normal(0, 1, 200), 6)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    r = icc_oneway_paired(df, "x", "y").collect()[0]
    assert abs(r["icc"]) < 0.2


def test_icc_degenerate_null(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    assert icc_oneway_paired(df, "x", "y").collect()[0]["icc"] is None


# ---------------------------------------------------- CUSUM-of-squares


def test_cusum_squares_matches_brute_force(spark):
    rng = np.random.default_rng(31)
    quiet = rng.integers(95, 105, 20)
    loud = rng.integers(40, 160, 20)
    y = np.concatenate([quiet, loud]).astype(int)
    t = np.arange(1, 41)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(t, y)], "t long, y long"
    )
    r = cusum_squares(df, "t", "y").collect()[0]
    mu = y.mean()
    c = np.cumsum((y - mu) ** 2)
    s = c / c[-1]
    dev = np.abs(s - t / 40)
    assert r["n"] == 40
    assert r["d_stat"] == pytest.approx(float(dev.max()), abs=1e-5)
    assert r["at_t"] == int(t[int(np.argmax(dev))])
    # the variance break at t=20 should put the argmax near it
    assert 12 <= r["at_t"] <= 28


def test_cusum_squares_constant_series_null(spark):
    df = spark.createDataFrame([(i, 7) for i in range(1, 11)], "t long, y long")
    r = cusum_squares(df, "t", "y").collect()[0]
    assert r["d_stat"] is None and r["at_t"] is None


# ------------------------------------------------------- Spiegelhalter


def test_spiegelhalter_matches_brute_force(spark):
    rng = np.random.default_rng(41)
    p = np.round(rng.uniform(0.05, 0.95, 300), 6)
    o = (rng.uniform(size=300) < p).astype(int)
    df = spark.createDataFrame(
        [(float(a), bool(b)) for a, b in zip(p, o)], "p double, y boolean"
    )
    r = spiegelhalter_z(df, "p", "y").collect()[0]
    pm = np.round(p * 1e6).astype(np.int64)
    om = o.astype(np.int64) * 1_000_000
    num = float(np.sum((om - pm) * (1_000_000 - 2 * pm)))
    den = float(
        np.sum(
            (1_000_000 - 2 * pm).astype(object) ** 2
            * pm.astype(object)
            * (1_000_000 - pm).astype(object)
        )
    )
    z = num / math.sqrt(den)
    brier = float(np.sum(((om - pm) ** 2).astype(float))) / (300 * 1e12)
    assert r["n"] == 300
    assert r["brier"] == pytest.approx(brier, abs=1e-6)
    assert r["z"] == pytest.approx(z, abs=1e-5)
    # labels were drawn FROM p -> calibrated -> modest z
    assert abs(r["z"]) < 3.5
    assert 0.0 <= r["p"] <= 1.0


def test_spiegelhalter_miscalibrated_large_z(spark):
    # scores say 90% but outcomes are 10%
    rows = [(0.9, i < 30) for i in range(300)]
    df = spark.createDataFrame(rows, "p double, y boolean")
    r = spiegelhalter_z(df, "p", "y").collect()[0]
    assert abs(r["z"]) > 10 and r["p"] == pytest.approx(0.0, abs=1e-6)


def test_spiegelhalter_degenerate_scores_null_z(spark):
    rows = [(1.0, True), (0.0, False)]
    df = spark.createDataFrame(rows, "p double, y boolean")
    r = spiegelhalter_z(df, "p", "y").collect()[0]
    assert r["z"] is None  # every (1-2p)^2 p(1-p) term is 0


# ----------------------------------------------------- Cronbach alpha


def test_cronbach_matches_brute_force(spark):
    rng = np.random.default_rng(53)
    latent = rng.uniform(size=200)
    items = [
        (latent + rng.normal(0, 0.3, 200)) > 0.5 for _ in range(3)
    ]
    rows = [
        (bool(items[0][i]), bool(items[1][i]), bool(items[2][i]))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    mat = np.column_stack([x.astype(float) for x in items])
    iv = float(np.sum(np.var(mat, axis=0, ddof=1)))
    vt = float(np.var(mat.sum(axis=1), ddof=1))
    alpha = 1.5 * (1 - iv / vt)
    assert r["n"] == 200 and r["k"] == 3
    assert r["sum_item_vars"] == pytest.approx(iv, abs=1e-5)
    assert r["var_total"] == pytest.approx(vt, abs=1e-5)
    assert r["alpha"] == pytest.approx(alpha, abs=1e-5)
    assert r["alpha"] > 0.4  # shared latent -> internally consistent


def test_cronbach_identical_items_alpha_one(spark):
    rows = [(i % 2 == 0,) * 3 for i in range(20)]
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    assert r["alpha"] == pytest.approx(1.0, abs=1e-6)


def test_cronbach_needs_two_items(spark):
    df = spark.createDataFrame([(True,)], "a boolean")
    with pytest.raises(ValueError):
        cronbach_alpha(df, ["a"])


# ------------------------------------------------------- group k-fold


def test_group_kfold_groups_never_straddle(spark):
    rows = [(i % 17, i) for i in range(300)]
    df = spark.createDataFrame(rows, "g long, v long")
    assigned = df.select("g", kfold_col("g", 5, 42).alias("fold"))
    per_group = (
        assigned.groupBy("g")
        .agg(F.count_distinct("fold").alias("nf"))
        .collect()
    )
    assert all(r["nf"] == 1 for r in per_group)


def test_group_kfold_audit_shares_sum_to_one(spark):
    rows = [(i % 50, i) for i in range(500)]
    df = spark.createDataFrame(rows, "g long, v long")
    out = group_kfold_assign(df, "g", k=5, seed=42).collect()
    assert sum(r["n_rows"] for r in out) == 500
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-4)
    assert all(0 <= r["fold"] < 5 for r in out)


def test_group_kfold_deterministic_and_seed_sensitive(spark):
    rows = [(i, i) for i in range(100)]
    df = spark.createDataFrame(rows, "g long, v long")
    a = {
        (r["g"], r["fold"])
        for r in df.select("g", kfold_col("g", 5, 42).alias("fold")).collect()
    }
    b = {
        (r["g"], r["fold"])
        for r in df.select("g", kfold_col("g", 5, 42).alias("fold")).collect()
    }
    c = {
        (r["g"], r["fold"])
        for r in df.select("g", kfold_col("g", 5, 99).alias("fold")).collect()
    }
    assert a == b
    assert a != c  # a different seed reshuffles
