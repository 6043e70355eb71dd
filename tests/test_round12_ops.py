"""Round-12 wave-1 operator tests: association/effect/agreement.

Each statistic is checked against an independent pure-Python
computation on a small fixture (not against the operator's own
algebra), plus contract edges (degenerate tables, perfect agreement).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from reddit_etl_spark.operators.classify import (
    gwets_ac1,
    krippendorff_alpha,
    stuart_maxwell_test,
)
from reddit_etl_spark.operators.relational import (
    chi2_residuals,
    cramers_v,
    rank_biserial,
    standardized_effects,
    variance_explained,
)


def test_cramers_v_known_table(spark):
    # 2x2 table [[10, 20], [30, 5]] — chi2 and V by hand
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 30 + [("b", "y")] * 5
    )
    df = spark.createDataFrame(rows, "g string, h string")
    got = cramers_v(df, "g", "h").collect()[0]
    n = 65.0
    exp = [[30 * 40 / n, 30 * 25 / n], [35 * 40 / n, 35 * 25 / n]]
    obs = [[10, 20], [30, 5]]
    chi2 = sum(
        (obs[i][j] - exp[i][j]) ** 2 / exp[i][j]
        for i in range(2)
        for j in range(2)
    )
    assert got["n"] == 65 and got["r"] == 2 and got["c"] == 2
    assert got["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert got["cramers_v"] == pytest.approx(math.sqrt(chi2 / n), abs=1e-6)
    phi2p = max(0.0, chi2 / n - 1.0 / (n - 1))
    kp = 2 - 1.0 / (n - 1)
    assert got["cramers_v_corrected"] == pytest.approx(
        math.sqrt(phi2p / (kp - 1.0)), abs=1e-6
    )


def test_cramers_v_degenerate_single_column(spark):
    df = spark.createDataFrame([("a", "x"), ("a", "y")], "g string, h string")
    row = cramers_v(df, "g", "h").collect()[0]
    assert row["r"] == 1 and row["cramers_v"] is None


def test_chi2_residuals_sum_structure(spark):
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 30 + [("b", "y")] * 5
    )
    df = spark.createDataFrame(rows, "g string, h string")
    out = {(r["x"], r["y"]): r for r in chi2_residuals(df, "g", "h").collect()}
    assert len(out) == 4
    # adjusted residuals of a 2x2 table are +/- the same magnitude
    mags = {abs(round(r["adj_residual"], 4)) for r in out.values()}
    assert len(mags) == 1
    assert out[("a", "x")]["adj_residual"] < 0  # fewer than expected
    assert out[("a", "y")]["adj_residual"] > 0
    # expected counts reproduce margins
    assert out[("a", "x")]["expected"] == pytest.approx(30 * 40 / 65, abs=1e-6)


def test_rank_biserial_matches_python(spark):
    a = [1.0, 2.0, 3.0, 5.0, 5.0]
    b = [2.0, 4.0, 4.0, 6.0]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "value double, g string")
    got = rank_biserial(df, "value", "g", "a", "b").collect()[0]
    # U_a by direct pair count (ties 0.5)
    u = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    assert got["u_a"] == pytest.approx(u)
    assert got["cles"] == pytest.approx(u / (len(a) * len(b)), abs=1e-6)
    assert got["rank_biserial"] == pytest.approx(
        2 * u / (len(a) * len(b)) - 1, abs=1e-6
    )


def test_standardized_effects_matches_python(spark):
    a = [10.0, 12.0, 14.0, 16.0]
    b = [9.0, 11.0, 13.0]
    rows = [(v, "t") for v in a] + [(v, "c") for v in b]
    df = spark.createDataFrame(rows, "value double, g string")
    got = standardized_effects(df, "value", "g", "t", "c").collect()[0]
    ma = sum(a) / len(a)
    mb = sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    sp = math.sqrt(((len(a) - 1) * va + (len(b) - 1) * vb) / (len(a) + len(b) - 2))
    d = (ma - mb) / sp
    j = 1 - 3 / (4 * (len(a) + len(b)) - 9)
    assert got["cohens_d"] == pytest.approx(d, abs=1e-6)
    assert got["hedges_g"] == pytest.approx(j * d, abs=1e-6)
    assert got["glass_delta"] == pytest.approx((ma - mb) / math.sqrt(vb), abs=1e-6)


def test_variance_explained_matches_python(spark):
    groups = {"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0], "c": [2.0, 3.0]}
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "value double, g string")
    got = variance_explained(df, "value", "g").collect()[0]
    allv = [v for vs in groups.values() for v in vs]
    n, k = len(allv), len(groups)
    m = sum(allv) / n
    sst = sum((v - m) ** 2 for v in allv)
    ssb = sum(
        len(vs) * (sum(vs) / len(vs) - m) ** 2 for vs in groups.values()
    )
    msw = (sst - ssb) / (n - k)
    eta2 = ssb / sst
    omega2 = (ssb - (k - 1) * msw) / (sst + msw)
    assert got["n"] == n and got["k"] == k
    assert got["eta_squared"] == pytest.approx(eta2, abs=1e-6)
    assert got["omega_squared"] == pytest.approx(omega2, abs=1e-6)
    assert got["cohens_f"] == pytest.approx(
        math.sqrt(eta2 / (1 - eta2)), abs=1e-6
    )


def _kripp_python(ratings):
    """Independent nominal-alpha computation from (unit, value) rows."""
    from collections import Counter, defaultdict

    by_unit = defaultdict(Counter)
    for u, c in ratings:
        by_unit[u][c] += 1
    by_unit = {u: cs for u, cs in by_unit.items() if sum(cs.values()) >= 2}
    nn = sum(sum(cs.values()) for cs in by_unit.values())
    do = sum(
        (sum(cs.values()) ** 2 - sum(v * v for v in cs.values()))
        / (sum(cs.values()) - 1)
        for cs in by_unit.values()
    ) / nn
    marg = Counter()
    for cs in by_unit.values():
        marg.update(cs)
    de = (nn * nn - sum(v * v for v in marg.values())) / (nn * (nn - 1))
    return 1 - do / de


def test_krippendorff_alpha_matches_python(spark):
    # 5 units, variable rater counts (one unpairable unit dropped)
    ratings = [
        (1, "a"), (1, "a"), (1, "b"),
        (2, "b"), (2, "b"),
        (3, "a"), (3, "a"), (3, "a"),
        (4, "b"), (4, "a"),
        (5, "a"),  # single rating -> not pairable
    ]
    df = spark.createDataFrame(ratings, "u long, c string")
    got = krippendorff_alpha(df, "u", "c").collect()[0]
    want = _kripp_python(ratings)
    assert got["n_units"] == 4 and got["n_ratings"] == 10
    assert got["alpha"] == pytest.approx(want, abs=1e-6)


def test_krippendorff_perfect_agreement(spark):
    ratings = [(u, "x") for u in range(10) for _ in range(3)]
    df = spark.createDataFrame(ratings, "u long, c string")
    row = krippendorff_alpha(df, "u", "c").collect()[0]
    # single category -> D_e = 0 -> alpha undefined (NULL), d_o = 0
    assert row["d_o"] == 0.0 and row["alpha"] is None
    ratings2 = [(u, "x" if u % 2 else "y") for u in range(10) for _ in range(3)]
    row2 = krippendorff_alpha(
        spark.createDataFrame(ratings2, "u long, c string"), "u", "c"
    ).collect()[0]
    assert row2["alpha"] == 1.0


def test_gwets_ac1_matches_python(spark):
    # skewed binary raters: 90 pass/pass, 5 pass/fail, 3 fail/pass, 2 both fail
    rows = (
        [("p", "p")] * 90 + [("p", "f")] * 5
        + [("f", "p")] * 3 + [("f", "f")] * 2
    )
    df = spark.createDataFrame(rows, "ra string, rb string")
    got = gwets_ac1(df, "ra", "rb").collect()[0]
    n = 100.0
    po = 92 / n
    pi_p = ((95 / n) + (93 / n)) / 2
    pi_f = ((5 / n) + (7 / n)) / 2
    pe = (pi_p * (1 - pi_p) + pi_f * (1 - pi_f)) / (2 - 1)
    assert got["po"] == pytest.approx(po, abs=1e-6)
    assert got["pe"] == pytest.approx(pe, abs=1e-6)
    assert got["ac1"] == pytest.approx((po - pe) / (1 - pe), abs=1e-6)


def test_stuart_maxwell_matches_python(spark):
    # classic 3x3 paired table
    table = {
        ("a", "a"): 20, ("a", "b"): 10, ("a", "c"): 5,
        ("b", "a"): 3, ("b", "b"): 30, ("b", "c"): 6,
        ("c", "a"): 2, ("c", "b"): 4, ("c", "c"): 25,
    }
    rows = [(x, y) for (x, y), c in table.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "x string, y string")
    got = stuart_maxwell_test(df, "x", "y", ("a", "b", "c")).collect()[0]
    rm = {k: sum(v for (x, _), v in table.items() if x == k) for k in "abc"}
    cm = {k: sum(v for (_, y), v in table.items() if y == k) for k in "abc"}
    d1, d2, d3 = (rm[k] - cm[k] for k in "abc")
    nb12 = (table[("a", "b")] + table[("b", "a")]) / 2
    nb13 = (table[("a", "c")] + table[("c", "a")]) / 2
    nb23 = (table[("b", "c")] + table[("c", "b")]) / 2
    chi2 = (nb23 * d1**2 + nb13 * d2**2 + nb12 * d3**2) / (
        2 * (nb12 * nb23 + nb12 * nb13 + nb13 * nb23)
    )
    assert (got["d1"], got["d2"], got["d3"]) == (d1, d2, d3)
    assert got["chi2_sm"] == pytest.approx(chi2, abs=1e-6)
    assert got["n"] == sum(table.values())


def test_stuart_maxwell_wrong_k_raises(spark):
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    with pytest.raises(ValueError, match="exactly 3"):
        stuart_maxwell_test(df, "x", "y", ("a", "b"))


# ---- wave 2 ----


def _midranks(pooled):
    """value -> midrank over the pooled list."""
    s = sorted(pooled)
    out = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        out[s[i]] = (i + 1 + j) / 2.0
        i = j
    return out


def test_brunner_munzel_matches_python(spark):
    from reddit_etl_spark.operators.relational import brunner_munzel

    a = [1.0, 2.0, 2.0, 4.0, 7.0, 9.0]
    b = [3.0, 4.0, 5.0, 6.0, 6.0, 8.0, 10.0]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "value double, g string")
    got = brunner_munzel(df, "value", "g", "a", "b").collect()[0]
    mr = _midranks(a + b)
    ra = [mr[v] for v in a]
    rb = [mr[v] for v in b]
    mra = {}
    mrb = {}
    for d, src in ((mra, a), (mrb, b)):
        d.update(_midranks(src))
    na, nb = len(a), len(b)
    rbar_a = sum(ra) / na
    rbar_b = sum(rb) / nb
    s2a = sum(
        (mr[v] - mra[v] - rbar_a + (na + 1) / 2.0) ** 2 for v in a
    ) / (na - 1)
    s2b = sum(
        (mr[v] - mrb[v] - rbar_b + (nb + 1) / 2.0) ** 2 for v in b
    ) / (nb - 1)
    p_hat = (rbar_b - (nb + 1) / 2.0) / na
    pooled = na * s2a + nb * s2b
    w = na * nb * (rbar_b - rbar_a) / ((na + nb) * math.sqrt(pooled))
    dfree = pooled**2 / (
        (na * s2a) ** 2 / (na - 1) + (nb * s2b) ** 2 / (nb - 1)
    )
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["p_hat"] == pytest.approx(p_hat, abs=1e-6)
    assert got["w_bm"] == pytest.approx(w, abs=1e-6)
    assert got["df_bm"] == pytest.approx(dfree, abs=1e-5)


def test_cucconi_matches_python(spark):
    from reddit_etl_spark.operators.relational import cucconi_test

    a = [1.0, 3.0, 5.0, 7.0, 9.0, 11.0]
    b = [4.0, 5.0, 6.0, 6.5, 7.0]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "value double, g string")
    got = cucconi_test(df, "value", "g", "a", "b").collect()[0]
    mr = _midranks(a + b)
    rb = [mr[v] for v in b]
    na, nb = len(a), len(b)
    nn = na + nb
    sr2 = sum(r * r for r in rb)
    ss2 = sum((nn + 1 - r) ** 2 for r in rb)
    den = math.sqrt(na * nb * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0)
    u = (6 * sr2 - nb * (nn + 1) * (2 * nn + 1)) / den
    v = (6 * ss2 - nb * (nn + 1) * (2 * nn + 1)) / den
    rho = 2.0 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1.0
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert got["u_stat"] == pytest.approx(u, abs=1e-6)
    assert got["v_stat"] == pytest.approx(v, abs=1e-6)
    assert got["rho"] == pytest.approx(rho, abs=1e-6)
    assert got["c_stat"] == pytest.approx(c, abs=1e-6)


def test_quade_matches_python(spark):
    from reddit_etl_spark.operators.relational import quade_test

    # Conover's classic layout shape: 5 blocks x 3 treatments
    data = {
        ("b1", "t1"): 2.0, ("b1", "t2"): 5.0, ("b1", "t3"): 7.0,
        ("b2", "t1"): 1.0, ("b2", "t2"): 1.5, ("b2", "t3"): 2.0,
        ("b3", "t1"): 3.0, ("b3", "t2"): 3.0, ("b3", "t3"): 9.0,
        ("b4", "t1"): 4.0, ("b4", "t2"): 6.0, ("b4", "t3"): 5.0,
        ("b5", "t1"): 1.0, ("b5", "t2"): 8.0, ("b5", "t3"): 8.5,
    }
    rows = [(b, t, v) for (b, t), v in data.items()]
    df = spark.createDataFrame(rows, "b string, t string, v double")
    got = quade_test(df, "b", "t", "v").collect()[0]
    blocks = sorted({b for b, _ in data})
    treats = sorted({t for _, t in data})
    k, n = len(treats), len(blocks)
    # within-block midranks
    r = {}
    for b in blocks:
        vals = [data[(b, t)] for t in treats]
        mr = _midranks(vals)
        for t in treats:
            r[(b, t)] = mr[data[(b, t)]]
    rng = {b: max(data[(b, t)] for t in treats) - min(data[(b, t)] for t in treats) for b in blocks}
    qmr = _midranks(list(rng.values()))
    q = {b: qmr[rng[b]] for b in blocks}
    s = {(b, t): q[b] * (r[(b, t)] - (k + 1) / 2.0) for b in blocks for t in treats}
    a_stat = sum(v * v for v in s.values())
    sj = {t: sum(s[(b, t)] for b in blocks) for t in treats}
    b_stat = sum(v * v for v in sj.values()) / n
    f = (n - 1) * b_stat / (a_stat - b_stat)
    assert got["n_blocks"] == n and got["k"] == k
    assert got["f_quade"] == pytest.approx(f, abs=1e-6)
    assert got["dof1"] == k - 1 and got["dof2"] == (n - 1) * (k - 1)


def test_quade_drops_incomplete_blocks(spark):
    from reddit_etl_spark.operators.relational import quade_test

    rows = [
        ("b1", "t1", 1.0), ("b1", "t2", 2.0),
        ("b2", "t1", 3.0), ("b2", "t2", 1.0),
        ("b3", "t1", 5.0),  # incomplete -> dropped
    ]
    df = spark.createDataFrame(rows, "b string, t string, v double")
    got = quade_test(df, "b", "t", "v").collect()[0]
    assert got["n_blocks"] == 2 and got["k"] == 2


def test_hosmer_lemeshow_matches_python(spark):
    from reddit_etl_spark.operators.classify import hosmer_lemeshow

    import random

    rnd = random.Random(7)
    rows = []
    for _ in range(500):
        p = round(rnd.random(), 3)
        y = 1 if rnd.random() < p else 0
        rows.append((p, y))
    df = spark.createDataFrame(rows, "p double, y int")
    got = hosmer_lemeshow(df, "p", "y", bins=10).collect()[0]
    # python mirror with the same clamped-micros binning
    binned = {}
    for p, y in rows:
        pm = math.floor(min(p, 1.0) * 1000000 + 0.5)
        b = min((pm * 10) // 1000000, 9)
        n, sy, sp = binned.get(b, (0, 0, 0))
        binned[b] = (n + 1, sy + y, sp + pm)
    chi2, ub = 0.0, 0
    for n, sy, sp in binned.values():
        e = sp / 1000000.0
        if 0 < e < n:
            chi2 += (sy - e) ** 2 / (e * (1 - e / n))
            ub += 1
    assert got["n"] == 500
    assert got["chi2_hl"] == pytest.approx(chi2, abs=1e-6)
    assert got["dof"] == ub - 2


# ---- wave 3 ----


def test_ols2_matches_numpy(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import ols2

    rng = np.random.RandomState(3)
    x1 = np.round(rng.uniform(0, 10, 200), 3)
    x2 = np.round(rng.uniform(-5, 5, 200), 3)
    y = np.round(2.5 + 1.2 * x1 - 0.7 * x2 + rng.normal(0, 1, 200), 3)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    got = ols2(df, "y", "x1", "x2").collect()[0]
    a = np.column_stack([np.ones(200), x1, x2])
    beta, *_ = np.linalg.lstsq(a, y, rcond=None)
    resid = y - a @ beta
    r2 = 1 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()
    assert got["b0"] == pytest.approx(beta[0], abs=1e-4)
    assert got["b1"] == pytest.approx(beta[1], abs=1e-4)
    assert got["b2"] == pytest.approx(beta[2], abs=1e-4)
    assert got["r2"] == pytest.approx(r2, abs=1e-5)


def test_ols2_collinear_null(spark):
    from reddit_etl_spark.operators.relational import ols2

    rows = [(float(i), float(i), float(2 * i)) for i in range(10)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    row = ols2(df, "y", "x1", "x2").collect()[0]
    assert row["b1"] is None and row["r2"] is None


def test_deming_recovers_line_and_symmetry(spark):
    from reddit_etl_spark.operators.relational import deming_regression

    # exact line -> slope/intercept recovered exactly
    rows = [(float(i), float(3 + 2 * i)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = deming_regression(df, "x", "y").collect()[0]
    assert got["slope"] == pytest.approx(2.0, abs=1e-6)
    assert got["intercept"] == pytest.approx(3.0, abs=1e-6)
    assert got["pearson_r"] == pytest.approx(1.0, abs=1e-6)
    # deming with lambda=1 is symmetric: slope(y~x) = 1/slope(x~y)
    noisy = [
        (float(i) + (0.3 if i % 2 else -0.3), float(2 * i) + (0.4 if i % 3 else -0.2))
        for i in range(1, 40)
    ]
    nf = spark.createDataFrame(noisy, "x double, y double")
    s_xy = deming_regression(nf, "x", "y").collect()[0]["slope"]
    s_yx = deming_regression(nf, "y", "x").collect()[0]["slope"]
    assert s_xy == pytest.approx(1.0 / s_yx, rel=1e-4)


def test_ipw_ate_recovers_stratified_effect(spark):
    from reddit_etl_spark.operators.relational import ipw_ate

    # stratum s1: treated mean 10 vs control 8 (effect 2)
    # stratum s2: treated mean 20 vs control 17 (effect 3)
    rows = (
        [("s1", True, 10.0)] * 8 + [("s1", False, 8.0)] * 2
        + [("s2", True, 20.0)] * 3 + [("s2", False, 17.0)] * 7
        + [("s3", True, 99.0)] * 4  # no overlap -> dropped
    )
    df = spark.createDataFrame(rows, "s string, t boolean, y double")
    got = ipw_ate(df, "t", "y", ["s"]).collect()[0]
    # both estimators = (10*2 + 10*3)/20 = 2.5 on the overlapping mass
    assert got["n_used"] == 20 and got["n_strata"] == 3
    assert got["ate_ipw"] == pytest.approx(2.5, abs=1e-6)
    assert got["ate_strat"] == pytest.approx(2.5, abs=1e-6)
    # naive difference is confounded away from 2.5
    assert abs(got["naive_diff"] - 2.5) > 0.5


def test_rdd_sharp_detects_jump(spark):
    from reddit_etl_spark.operators.relational import rdd_sharp

    # y = 1 + 0.01x below 50; y = 4 + 0.01x at/above 50
    rows = []
    for i in range(200):
        x = i / 2.0
        y = (1.0 if x < 50 else 4.0) + 0.01 * x
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y double")
    got = rdd_sharp(df, "x", "y", 50.0, 30.0).collect()[0]
    assert got["jump"] == pytest.approx(3.0, abs=1e-6)
    assert got["slope_left"] == pytest.approx(0.01, abs=1e-6)
    assert got["slope_right"] == pytest.approx(0.01, abs=1e-6)


def test_weighted_corr_equals_replication(spark):
    from reddit_etl_spark.operators.relational import weighted_corr

    # integer weights: weighted corr == unweighted corr on replicated rows
    base = [(1.0, 2.0, 3), (2.0, 3.5, 1), (3.0, 3.0, 2), (4.0, 6.0, 4)]
    df = spark.createDataFrame(base, "x double, y double, w int")
    got = weighted_corr(df, "x", "y", "w").collect()[0]
    rep = [(x, y) for x, y, w in base for _ in range(w)]
    rf = spark.createDataFrame(rep, "x double, y double")
    want = rf.select(F.corr("x", "y")).collect()[0][0]
    assert got["r_weighted"] == pytest.approx(want, abs=1e-6)
    assert got["sum_w"] == pytest.approx(10.0)


# ---- wave 4 ----


def _series_df(spark, vals, start=0):
    rows = [(i + start, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "ord long, v double")


def test_ewma_chart_matches_recursion(spark):
    from reddit_etl_spark.operators.series import ewma_chart

    vals = [10.0, 12.0, 9.0, 15.0, 11.0, 14.0, 8.0, 13.0]
    df = _series_df(spark, vals)
    out = {r["ord"]: r for r in ewma_chart(df, "ord", "v").collect()}
    lam, big_l = 0.5, 3.0
    mu = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (len(vals) - 1))
    z = mu
    for t, v in enumerate(vals, start=1):
        z = lam * v + (1 - lam) * z
        half = big_l * sd * math.sqrt(lam / (2 - lam) * (1 - (1 - lam) ** (2 * t)))
        r = out[t - 1]
        assert r["ewma"] == pytest.approx(z, abs=1e-6), t
        assert r["ucl"] == pytest.approx(mu + half, abs=1e-6)
        assert r["lcl"] == pytest.approx(mu - half, abs=1e-6)
        assert r["signal"] == (z > mu + half or z < mu - half)


def test_ewma_chart_bounded_contract_raises(spark):
    from reddit_etl_spark.operators.series import ewma_chart

    df = spark.range(0, 50).select(
        F.col("id").alias("ord"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(Exception, match="max_points"):
        ewma_chart(df, "ord", "v", max_points=10).collect()


def _kpss_python(vals, lags=5):
    n = len(vals)
    mu = sum(vals) / n
    e = [v - mu for v in vals]
    s = 0.0
    ss = 0.0
    for x in e:
        s += x
        ss += s * s
    g0 = sum(x * x for x in e)
    bart = 0.0
    for j in range(1, lags + 1):
        gj = sum(e[t] * e[t - j] for t in range(j, n))
        bart += 2.0 * (1.0 - j / (lags + 1.0)) * gj
    s2lr = (g0 + bart) / n
    return ss / (n * n) / s2lr, s2lr


def test_kpss_level_matches_python(spark):
    from reddit_etl_spark.operators.series import kpss_level

    vals = [10.0, 12.0, 9.5, 15.0, 11.0, 14.0, 8.0, 13.0, 12.5, 9.0,
            11.5, 10.5, 13.5, 12.0, 10.0]
    df = _series_df(spark, vals)
    got = kpss_level(df, "ord", "v", lags=5).collect()[0]
    eta, s2lr = _kpss_python(vals)
    assert got["n"] == len(vals)
    assert got["eta_kpss"] == pytest.approx(eta, abs=1e-6)
    assert got["sigma2_lr"] == pytest.approx(s2lr, abs=1e-6)


def test_pacf_ar1_decays(spark):
    from reddit_etl_spark.operators.series import pacf_lags

    import datetime

    # AR(1)-ish deterministic series: x_t = 0.8 x_{t-1} + bounded drive
    vals = [1.0]
    for t in range(1, 60):
        vals.append(0.8 * vals[-1] + ((t * 37) % 11 - 5) / 10.0)
    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "day date, v double")
    out = {r["lag"]: r for r in pacf_lags(df, "day", "v").collect()}
    # pacf(1) == acf(1); higher-order pacf collapse vs acf for AR(1)
    assert out[1]["pacf"] == out[1]["acf"]
    assert abs(out[2]["pacf"]) < abs(out[2]["acf"])
    r1, r2 = out[1]["acf"], out[2]["acf"]
    assert out[2]["pacf"] == pytest.approx(
        (r2 - r1 * r1) / (1 - r1 * r1), abs=1e-5
    )


def test_ccf_detects_known_lead(spark):
    from reddit_etl_spark.operators.series import ccf_lagged

    import datetime

    base = [((t * 13) % 17 - 8) / 4.0 for t in range(40)]
    d0 = datetime.date(2024, 1, 1)
    a_rows = [(d0 + datetime.timedelta(days=i), float(v)) for i, v in enumerate(base)]
    # b is a shifted copy of a: b_t = a_{t-2}  -> a leads b by 2
    b_rows = [
        (d0 + datetime.timedelta(days=i + 2), float(v))
        for i, v in enumerate(base)
    ]
    a = spark.createDataFrame(a_rows, "day date, v double")
    b = spark.createDataFrame(b_rows, "day date, v double")
    out = {r["lag"]: r["ccf"] for r in ccf_lagged(a, b, "day", "v").collect()}
    assert out[2] == pytest.approx(1.0, abs=1e-6)
    assert all(abs(out[k]) < 0.9 for k in out if k != 2)


def test_diebold_mariano_prefers_better_model(spark):
    from reddit_etl_spark.operators.series import diebold_mariano

    import datetime

    # period-7 series: the lag-7 forecast is perfect, lag-1 is bad
    d0 = datetime.date(2024, 1, 1)
    rows = [
        (d0 + datetime.timedelta(days=t), float([5, 9, 2, 7, 1, 8, 4][t % 7]))
        for t in range(49)
    ]
    df = spark.createDataFrame(rows, "day date, v double")
    got = diebold_mariano(df, "day", "v").collect()[0]
    # d_t = e1^2 - e2^2 > 0 everywhere -> mean_d > 0, DM positive
    assert got["mean_d"] > 0
    assert got["dm_stat"] is not None and got["dm_stat"] > 0


def test_turning_points_counts(spark):
    from reddit_etl_spark.operators.series import turning_points

    # 1 3 2 5 4 4 6 : turns at 3 (max), 2 (min), 5 (max); the 4,4 tie
    # breaks strictness, 4->6 tail has no interior extremum
    vals = [1.0, 3.0, 2.0, 5.0, 4.0, 4.0, 6.0]
    df = _series_df(spark, vals)
    got = turning_points(df, "ord", "v").collect()[0]
    assert got["n"] == 7 and got["turning_pts"] == 3
    assert got["expected"] == pytest.approx(2 * 5 / 3, abs=1e-6)


def test_hurst_rs_separates_persistence(spark):
    from reddit_etl_spark.operators.series import hurst_rs

    import random

    rnd = random.Random(11)
    # persistent: cumulative sum of positively-autocorrelated steps
    steps = []
    s = 0.0
    for _ in range(256):
        s = 0.8 * s + rnd.gauss(0, 1)
        steps.append(s)
    walk = []
    acc = 0.0
    for st in steps:
        acc += st
        walk.append(acc)
    persistent = hurst_rs(
        _series_df(spark, walk), "ord", "v", window_sizes=(8, 16, 32)
    ).collect()[0]
    # alternating mean-reverting series
    anti = [(1.0 if i % 2 else -1.0) + rnd.gauss(0, 0.1) for i in range(256)]
    revert = hurst_rs(
        _series_df(spark, anti), "ord", "v", window_sizes=(8, 16, 32)
    ).collect()[0]
    assert persistent["hurst"] > 0.7
    assert revert["hurst"] < 0.4
    assert persistent["n_sizes"] == 3


# ---- wave 5 ----


def test_palma_and_hoover_known_values(spark):
    from reddit_etl_spark.operators.relational import hoover_index, palma_ratio

    # 10 units: values 1..10 -> k40=4 (sum 1+2+3+4=10), k10=1 (10)
    vals = [float(i) for i in range(1, 11)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    p = palma_ratio(df, "v", scale=100).collect()[0]
    total = sum(vals)
    assert p["bottom40_share"] == pytest.approx(10 / total, abs=1e-6)
    assert p["top10_share"] == pytest.approx(10 / total, abs=1e-6)
    assert p["palma"] == pytest.approx(1.0, abs=1e-6)
    h = hoover_index(df, "v", scale=100).collect()[0]
    mean = total / 10
    want = sum(abs(v - mean) for v in vals) / (2 * total)
    assert h["hoover"] == pytest.approx(want, abs=1e-6)
    # equal distribution -> hoover 0
    eq = spark.createDataFrame([(5.0,)] * 8, "v double")
    assert hoover_index(eq, "v").collect()[0]["hoover"] == 0.0


def test_palma_tied_boundary_cells(spark):
    from reddit_etl_spark.operators.relational import palma_ratio

    # 10 equal units: every share is exactly proportional
    df = spark.createDataFrame([(7.0,)] * 10, "v double")
    p = palma_ratio(df, "v").collect()[0]
    assert p["bottom40_share"] == pytest.approx(0.4, abs=1e-6)
    assert p["top10_share"] == pytest.approx(0.1, abs=1e-6)
    assert p["palma"] == pytest.approx(0.25, abs=1e-6)


def test_simpson_diversity_matches_python(spark):
    from reddit_etl_spark.operators.text import simpson_diversity

    rows = [("a", "x x x y y z"), ("b", "p q r s")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in simpson_diversity(df, "source", "text").collect()}
    # source a: counts 3,2,1 over N=6
    n = 6.0
    d = (3 * 2 + 2 * 1 + 0) / (n * (n - 1))
    assert out["a"]["simpson_d"] == pytest.approx(d, abs=1e-6)
    assert out["a"]["inv_simpson"] == pytest.approx(1 / d, abs=1e-6)
    assert out["a"]["yules_k"] == pytest.approx(
        1e4 * ((9 + 4 + 1) - n) / (n * n), abs=1e-4
    )
    # all-distinct source: D = 0, yules_k = 0
    assert out["b"]["simpson_d"] == 0.0 and out["b"]["inv_simpson"] is None


def test_padding_waste_buckets(spark):
    from reddit_etl_spark.operators.curation import padding_waste

    rows = [
        ("w " * 10,),   # 10 tokens -> bucket 16, waste 6
        ("w " * 16,),   # 16 -> bucket 16, waste 0
        ("w " * 17,),   # 17 -> bucket 32, waste 15
        ("w " * 3000,),  # clips to 2048, waste 0
    ]
    df = spark.createDataFrame(rows, "text string")
    out = {r["bucket_len"]: r for r in padding_waste(df, "text").collect()}
    assert out[16]["docs"] == 2 and out[16]["padded_slots"] == 6
    assert out[16]["waste_frac"] == pytest.approx(6 / 32, abs=1e-6)
    assert out[32]["padded_slots"] == 15
    assert out[2048]["padded_slots"] == 0


def test_burrows_delta_template_similarity(spark):
    from reddit_etl_spark.operators.text import burrows_delta

    # a and b share a function-word template; c is different
    rows = (
        [("a", "the cat of the house and the dog")] * 5
        + [("b", "the boat of the sea and the wind")] * 5
        + [("c", "zebra quokka wombat numbat bilby")] * 5
    )
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["source_a"], r["source_b"]): r["delta"]
        for r in burrows_delta(df, "source", "text", top_k=10).collect()
    }
    assert out[("a", "b")] < out[("a", "c")]
    assert out[("a", "b")] < out[("b", "c")]


def test_taylors_law_poisson_vs_deterministic(spark):
    from reddit_etl_spark.operators.relational import taylors_law

    import random

    rnd = random.Random(5)
    rows = []
    # 12 groups with poisson-ish counts over 40 units: slope near 1
    for g in range(12):
        lam = 2 + g
        for u in range(40):
            for _ in range(max(0, int(rnd.gauss(lam, math.sqrt(lam))))):
                rows.append((g, u))
    df = spark.createDataFrame(rows, "g int, u int")
    got = taylors_law(df, ["g"], ["u"]).collect()[0]
    assert got["n_groups"] == 12
    assert 0.4 < got["slope_b"] < 1.6
    assert got["r2"] > 0.3


def test_footrule_known_rankings(spark):
    from reddit_etl_spark.operators.relational import footrule_day_rankings

    import datetime

    d0 = datetime.date(2024, 1, 1)
    d1 = datetime.date(2024, 1, 2)
    rows = []
    # day0 ranks: a(3), b(2), c(1) ; day1 full reversal: c(3), b(2), a(1)
    rows += [(d0, "a")] * 3 + [(d0, "b")] * 2 + [(d0, "c")] * 1
    rows += [(d1, "c")] * 3 + [(d1, "b")] * 2 + [(d1, "a")] * 1
    df = spark.createDataFrame(rows, "day date, i string")
    got = footrule_day_rankings(df, "day", "i").collect()
    assert len(got) == 1
    r = got[0]
    assert r["k"] == 3 and r["footrule"] == 4  # |1-3| + 0 + |3-1|
    assert r["normalized"] == pytest.approx(1.0, abs=1e-6)  # max = floor(9/2)=4


# ---- wave 6 ----


def test_lepage_combines_components(spark):
    from reddit_etl_spark.operators.relational import (
        ansari_bradley,
        lepage_test,
        mann_whitney_u,
    )

    rows = [(float(v), "a") for v in [1, 2, 3, 4, 5, 8, 9]] + [
        (float(v), "b") for v in [3, 4, 5, 6, 7, 7]
    ]
    df = spark.createDataFrame(rows, "value double, g string")
    got = lepage_test(df, "value", "g", "a", "b").collect()[0]
    zw = mann_whitney_u(df, "value", "g", "a", "b").collect()[0]["z"]
    zab = ansari_bradley(df, "value", "g", "a").collect()[0]["z"]
    assert got["z_location"] == zw and got["z_scale"] == zab
    assert got["lepage_l"] == pytest.approx(zw * zw + zab * zab, abs=1e-6)


def test_van_elteren_matches_python(spark):
    from reddit_etl_spark.operators.relational import van_elteren

    strata = {
        "s1": ([1.0, 3.0, 5.0], [2.0, 4.0, 6.0, 8.0]),
        "s2": ([10.0, 12.0], [11.0, 13.0, 15.0]),
    }
    rows = []
    for s, (a, b) in strata.items():
        rows += [(s, v, "a") for v in a] + [(s, v, "b") for v in b]
    df = spark.createDataFrame(rows, "s string, value double, g string")
    got = van_elteren(df, "value", "g", "a", "b", ["s"]).collect()[0]
    w = e = var = 0.0
    for a, b in strata.values():
        pooled = a + b
        mr = _midranks(pooled)
        ns = len(pooled)
        m, nb = len(a), len(b)
        ra = sum(mr[v] for v in a)
        wgt = 1.0 / (ns + 1.0)
        rbar = (ns + 1) / 2.0
        rvar = sum((mr[v] - rbar) ** 2 for v in pooled) / (ns - 1)
        w += wgt * ra
        e += wgt * m * (ns + 1) / 2.0
        var += wgt * wgt * m * nb * rvar / ns
    assert got["n"] == 12 and got["n_strata"] == 2
    assert got["w_stat"] == pytest.approx(w, abs=1e-6)
    assert got["z"] == pytest.approx((w - e) / math.sqrt(var), abs=1e-6)


def test_cv_qcd_known_values(spark):
    from reddit_etl_spark.operators.relational import cv_qcd_by_group

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    got = cv_qcd_by_group(df, "g", "v").collect()[0]
    mean = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (len(vals) - 1))
    # type-7 quartiles of 1..8: q1 = 2.75, q3 = 6.25
    assert got["mean"] == pytest.approx(mean, abs=1e-6)
    assert got["cv"] == pytest.approx(sd / mean, abs=1e-6)
    assert got["qcd"] == pytest.approx((6.25 - 2.75) / (6.25 + 2.75), abs=1e-6)


def test_robust_shape_symmetric_and_skewed(spark):
    from reddit_etl_spark.operators.relational import robust_shape

    sym = [float(v) for v in range(1, 101)]
    got = robust_shape(
        spark.createDataFrame([(v,) for v in sym], "v double"), "v"
    ).collect()[0]
    assert got["bowley_skew"] == pytest.approx(0.0, abs=1e-9)
    # uniform Moors kurtosis = ((7/8-5/8)+(3/8-1/8))/(6/8-2/8) = 1.0
    assert got["moors_kurtosis"] == pytest.approx(1.0, abs=1e-6)
    skew = [float(v**2) for v in range(1, 101)]
    got2 = robust_shape(
        spark.createDataFrame([(v,) for v in skew], "v double"), "v"
    ).collect()[0]
    assert got2["bowley_skew"] > 0.1


def test_longest_run_islands(spark):
    from reddit_etl_spark.operators.series import longest_run

    # median of 1..10 = 5.5; above: 6..10 (run of 5 at the end)
    vals = [6.0, 1.0, 7.0, 8.0, 2.0, 3.0, 9.0, 10.0, 4.0, 5.0]
    df = _series_df(spark, vals)
    got = longest_run(df, "ord", "v").collect()[0]
    # signs: + - + + - - + + - -
    assert got["n"] == 10
    assert got["longest_above"] == 2 and got["longest_below"] == 2
    assert got["n_runs"] == 6


def test_record_highs_monotone_and_expected(spark):
    from reddit_etl_spark.operators.series import record_highs

    inc = [float(v) for v in range(1, 21)]
    got = record_highs(_series_df(spark, inc), "ord", "v").collect()[0]
    assert got["records"] == 20  # every point is a record
    hn = sum(1.0 / t for t in range(1, 21))
    assert got["expected"] == pytest.approx(hn, abs=1e-6)
    assert got["z"] > 5
    dec = list(reversed(inc))
    got2 = record_highs(_series_df(spark, dec), "ord", "v").collect()[0]
    assert got2["records"] == 1


# ---- wave 7: p-value infrastructure ----


def test_norm_cdf_accuracy(spark):
    from reddit_etl_spark.operators.util import norm_cdf

    zs = [z / 4.0 for z in range(-20, 21)]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    rows = df.select("z", norm_cdf(F.col("z")).alias("p")).collect()
    for r in rows:
        want = 0.5 * (1 + math.erf(r["z"] / math.sqrt(2)))
        assert r["p"] == pytest.approx(want, abs=1e-7), r["z"]


def test_bh_fdr_known_panel(spark):
    from reddit_etl_spark.operators.series import bh_fdr

    # one wild outlier among flat values -> exactly one rejection
    vals = [10.0, 10.1, 9.9, 10.05, 9.95, 10.0, 10.1, 9.9, 10.0, 50.0]
    df = _series_df(spark, vals)
    got = bh_fdr(df, "ord", "v", q=0.05).collect()[0]
    assert got["m"] == 10
    assert got["n_rejected"] >= 1
    assert got["min_p"] < 0.01
    # flat panel -> nothing rejects, pi0 caps at 1
    flat = _series_df(spark, [10.0 + (i % 3) * 0.01 for i in range(12)])
    got2 = bh_fdr(flat, "ord", "v", q=0.05).collect()[0]
    assert got2["n_rejected"] == 0 and got2["bh_threshold"] is None
    assert got2["pi0_storey"] <= 1.0


def test_bh_fdr_matches_python(spark):
    from reddit_etl_spark.operators.series import bh_fdr

    import random

    rnd = random.Random(3)
    vals = [rnd.gauss(0, 1) for _ in range(40)] + [8.0, 9.0, -7.5]
    df = _series_df(spark, vals)
    got = bh_fdr(df, "ord", "v", q=0.1).collect()[0]
    m = len(vals)
    mean = sum(vals) / m
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (m - 1))
    ps = sorted(
        2 * (1 - 0.5 * (1 + math.erf(abs((v - mean) / sd) / math.sqrt(2))))
        for v in vals
    )
    k = max((i for i in range(1, m + 1) if ps[i - 1] <= i * 0.1 / m), default=0)
    assert got["n_rejected"] == k
    over = sum(1 for p in ps if p > 0.5)
    assert got["pi0_storey"] == pytest.approx(
        min(over / (0.5 * m), 1.0), abs=1e-4
    )


def test_ad_normal_separates_shapes(spark):
    from reddit_etl_spark.operators.relational import ad_normal

    import random

    rnd = random.Random(9)
    normal = [rnd.gauss(100, 10) for _ in range(800)]
    dfn = spark.createDataFrame([(v,) for v in normal], "v double")
    gn = ad_normal(dfn, "v", scale=100).collect()[0]
    # heavy-tailed: exponential
    expo = [rnd.expovariate(0.05) for _ in range(800)]
    dfe = spark.createDataFrame([(v,) for v in expo], "v double")
    ge = ad_normal(dfe, "v", scale=100).collect()[0]
    # normal sample should sit well under the 1.0 line, exponential far above
    assert gn["ad_star"] < 1.5
    assert ge["ad_star"] > 5.0
    assert gn["n"] == 800 and ge["n"] == 800


def test_ad_normal_matches_python(spark):
    from reddit_etl_spark.operators.relational import ad_normal

    vals = [12.31, 10.02, 9.57, 11.48, 10.99, 8.73, 10.11, 11.02,
            9.44, 10.67, 10.05, 9.88]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = ad_normal(df, "v", scale=100).collect()[0]
    # direct python AD on the cent-quantized values with A-S Phi
    q = sorted(round(v * 100) for v in vals)
    n = len(q)
    mean = sum(q) / n
    sd = math.sqrt(sum((v - mean) ** 2 for v in q) / (n - 1))

    def phi(z):
        t = 1.0 / (1.0 + 0.2316419 * abs(z))
        poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937
               + t * (-1.821255978 + t * 1.330274429))))
        up = math.exp(-z * z / 2) / 2.5066282746310002 * poly
        return 1 - up if z >= 0 else up

    s = 0.0
    for i in range(1, n + 1):
        zi = (q[i - 1] - mean) / sd
        zrev = (q[n - i] - mean) / sd
        s += (2 * i - 1) * (
            math.log(max(phi(zi), 1e-300))
            + math.log(max(1 - phi(zrev), 1e-300))
        )
    ad2 = -n - s / n
    assert got["ad_stat"] == pytest.approx(ad2, abs=1e-5)
    assert got["ad_star"] == pytest.approx(
        ad2 * (1 + 0.75 / n + 2.25 / n**2), abs=1e-5
    )
