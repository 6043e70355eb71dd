"""Round-11 wave 3: hand cases + brute-force parity (Brier
decomposition, Youden threshold, weighted kappa, Cohen's h, biweight
location, vocabulary richness, source cross-entropy)."""

from __future__ import annotations

import math

import pytest


# ------------------------------------------------- brier_decomposition


def test_brier_decomposition_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.classify import brier_decomposition

    rng = np.random.default_rng(47)
    p = np.round(rng.random(400), 6)
    y = (rng.random(400) < p * 0.8 + 0.1).astype(int)
    df = spark.createDataFrame(
        [(float(a), bool(b)) for a, b in zip(p, y)], "p double, y boolean"
    )
    r = brier_decomposition(df, "p", "y", n_bins=10).collect()[0]
    mic = np.clip(np.floor(p * 1e6 + 0.5), 0, 1e6)
    bins = np.minimum(9, np.floor(mic * 10 / 1e6)).astype(int)
    n = len(p)
    obar = y.mean()
    rel = res = 0.0
    for b in range(10):
        m = bins == b
        if not m.any():
            continue
        nk = m.sum()
        pb = (mic[m] / 1e6).mean()
        ob = y[m].mean()
        rel += nk * (pb - ob) ** 2
        res += nk * (ob - obar) ** 2
    rel /= n
    res /= n
    unc = obar * (1 - obar)
    brier = np.mean((mic / 1e6 - y) ** 2)
    assert r["n"] == n
    assert abs(r["base_rate"] - obar) < 1e-6
    assert abs(r["brier"] - brier) < 1e-6
    assert abs(r["reliability"] - rel) < 1e-6
    assert abs(r["resolution"] - res) < 1e-6
    assert abs(r["uncertainty"] - unc) < 1e-6
    assert abs(r["brier_binned"] - (rel - res + unc)) < 1e-5
    # decomposition identity: brier >= brier_binned (within-bin
    # forecast variance is non-negative)
    assert r["brier"] >= r["brier_binned"] - 1e-6


# ---------------------------------------------------- youden_threshold


def test_youden_threshold_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.classify import youden_threshold

    rng = np.random.default_rng(53)
    pos = np.round(rng.normal(0.7, 0.15, 60), 3)
    neg = np.round(rng.normal(0.4, 0.15, 90), 3)
    rows = [(float(s), True) for s in pos] + [
        (float(s), False) for s in neg
    ]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = youden_threshold(df, "s", "y").collect()[0]
    best_j, best_t = -2.0, None
    for t in sorted(set(list(pos) + list(neg))):
        tpr = (pos >= t).mean()
        fpr = (neg >= t).mean()
        j = tpr - fpr
        if j > best_j + 1e-12:
            best_j, best_t = j, t
        elif abs(j - best_j) < 1e-12 and t < best_t:
            best_t = t
    assert (r["n_pos"], r["n_neg"]) == (60, 90)
    assert abs(r["threshold"] - best_t) < 1e-9
    assert abs(r["youden_j"] - best_j) < 1e-6


def test_youden_perfect_separation(spark):
    from reddit_etl_spark.operators.classify import youden_threshold

    rows = [(0.9, True)] * 5 + [(0.1, False)] * 5
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = youden_threshold(df, "s", "y").collect()[0]
    assert r["youden_j"] == 1.0 and r["threshold"] == 0.9


# ------------------------------------------------------ weighted_kappa


def _py_wkappa(pairs, cats, quadratic=False):
    k = len(cats)
    idx = {c: i for i, c in enumerate(cats)}
    n = len(pairs)

    def w(i, j):
        d = abs(i - j) / (k - 1)
        return d * d if quadratic else d

    po = sum(w(idx[a], idx[b]) for a, b in pairs) / n
    ra = [0] * k
    rb = [0] * k
    for a, b in pairs:
        ra[idx[a]] += 1
        rb[idx[b]] += 1
    pe = sum(
        w(i, j) * ra[i] * rb[j] / (n * n)
        for i in range(k)
        for j in range(k)
    )
    return po, pe, 1 - po / pe


def test_weighted_kappa_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.classify import weighted_kappa

    rng = np.random.default_rng(59)
    cats = ["lo", "mid", "hi"]
    pairs = []
    for _ in range(150):
        i = rng.integers(0, 3)
        j = min(2, max(0, i + rng.integers(-1, 2)))
        pairs.append((cats[i], cats[j]))
    df = spark.createDataFrame(pairs, "a string, b string")
    for wts, quad in (("linear", False), ("quadratic", True)):
        r = weighted_kappa(df, "a", "b", cats, weights=wts).collect()[0]
        po, pe, kw = _py_wkappa(pairs, cats, quadratic=quad)
        assert abs(r["po_w"] - po) < 1e-6
        assert abs(r["pe_w"] - pe) < 1e-6
        assert abs(r["kappa_w"] - kw) < 1e-5


def test_weighted_kappa_unknown_category_raises(spark):
    from reddit_etl_spark.operators.classify import weighted_kappa

    df = spark.createDataFrame([("lo", "??")], "a string, b string")
    with pytest.raises(Exception, match="outside categories"):
        weighted_kappa(df, "a", "b", ["lo", "hi"]).collect()


# ------------------------------------------------------------ cohens_h


def test_cohens_h_hand_case(spark):
    from reddit_etl_spark.operators.classify import cohens_h

    rows = (
        [("a", True)] * 30 + [("a", False)] * 70
        + [("b", True)] * 10 + [("b", False)] * 90
    )
    df = spark.createDataFrame(rows, "c string, y boolean")
    r = cohens_h(df, "c", "a", "y").collect()[0]
    pa, pb = 0.3, 0.1
    want = 2 * math.asin(math.sqrt(pa)) - 2 * math.asin(math.sqrt(pb))
    assert (r["n_a"], r["n_b"]) == (100, 100)
    assert r["p_a"] == pa and r["p_b"] == pb
    assert abs(r["cohens_h"] - want) < 1e-6
    assert abs(r["risk_diff"] - 0.2) < 1e-9


# ---------------------------------------------------- biweight_location


def test_biweight_location_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import biweight_location

    rng = np.random.default_rng(61)
    vals = np.round(rng.normal(50, 5, 200), 2)
    vals[:5] = 500.0  # gross outliers the biweight must ignore
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "g string, v double"
    )
    r = biweight_location(df, ["g"], "v").collect()[0]
    cents = np.round(vals * 100).astype(int)
    s = np.sort(cents)
    med = s[(len(s) + 1) // 2 - 1]
    dev = np.sort(np.abs(cents - med))
    mad = dev[(len(dev) + 1) // 2 - 1]
    u = (cents - med) / (6.0 * mad)
    m = np.abs(u) < 1
    t = med + np.sum((cents[m] - med) * (1 - u[m] ** 2) ** 2) / np.sum(
        (1 - u[m] ** 2) ** 2
    )
    assert r["median"] == med / 100
    assert r["mad"] == mad / 100
    assert abs(r["biweight_loc"] - t / 100) < 1e-6
    # robust: outliers pull the mean but not the biweight
    assert abs(r["biweight_loc"] - 50) < 1.0


def test_biweight_constant_group(spark):
    from reddit_etl_spark.operators.relational import biweight_location

    df = spark.createDataFrame(
        [("g", 7.0)] * 6, "g string, v double"
    )
    r = biweight_location(df, ["g"], "v").collect()[0]
    assert r["mad"] == 0.0 and r["biweight_loc"] == 7.0


# ------------------------------------------------------- vocab_richness


def test_vocab_richness_hand_case(spark):
    from reddit_etl_spark.operators.text import vocab_richness

    # tokens: a a a b b c d  -> V=4, n1=2 (c,d), n2=1 (b), N=7
    df = spark.createDataFrame(
        [("s", "a a a b b c d")], "source string, text string"
    )
    r = vocab_richness(df, "source", "text").collect()[0]
    assert (r["n_tokens"], r["vocab"], r["hapax"], r["dis"]) == (7, 4, 2, 1)
    assert r["gt_unseen_mass"] == round(2 / 7, 6)
    assert r["chao1"] == round(4 + 2 * 1 / (2 * 2), 6)


# -------------------------------------------------- source_cross_entropy


def test_source_cross_entropy_bruteforce(spark):
    from collections import Counter

    from reddit_etl_spark.operators.text import source_cross_entropy

    docs = [("s1", "a a b c"), ("s2", "a b b d d")]
    df = spark.createDataFrame(docs, "source string, text string")
    out = {
        r["source"]: r
        for r in source_cross_entropy(df, "source", "text").collect()
    }
    pool = Counter("a a b c a b b d d".split())
    np_, vp = sum(pool.values()), len(pool)
    for src, text in docs:
        c = Counter(text.split())
        n = sum(c.values())
        hx = -sum(
            f / n * math.log2((pool[w] + 0.5) / (np_ + 0.5 * vp))
            for w, f in c.items()
        )
        hs = -sum(f / n * math.log2(f / n) for f in c.values())
        r = out[src]
        assert abs(r["h_cross"] - hx) < 1e-5
        assert abs(r["h_source"] - hs) < 1e-5
        assert abs(r["kl_vs_pool"] - (hx - hs)) < 1e-5
        assert abs(r["ppl_vs_pool"] - 2**hx) < 1e-4


# ------------------------------------------------------- partial_corr


def test_partial_corr_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import partial_corr

    rng = np.random.default_rng(67)
    z = np.round(rng.normal(0, 1, 120), 4)
    x = np.round(z * 2 + rng.normal(0, 1, 120), 4)
    y = np.round(z * 3 + rng.normal(0, 1, 120), 4)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    r = partial_corr(df, "x", "y", "z").collect()[0]
    rxy = round(float(np.corrcoef(x, y)[0, 1]), 6)
    rxz = round(float(np.corrcoef(x, z)[0, 1]), 6)
    ryz = round(float(np.corrcoef(y, z)[0, 1]), 6)
    want = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert r["r_xy"] == rxy and r["r_xz"] == rxz and r["r_yz"] == ryz
    assert abs(r["partial_r"] - want) < 1e-6
    # x and y only correlate through z: partialled r collapses
    assert abs(r["partial_r"]) < abs(r["r_xy"]) / 2


# -------------------------------------------------- covariate_balance


def test_covariate_balance_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import covariate_balance

    rng = np.random.default_rng(71)
    rows = []
    for i in range(200):
        arm = "t" if i % 2 == 0 else "c"
        shift = 0.8 if arm == "t" else 0.0  # v1 imbalanced
        rows.append(
            (arm, round(float(rng.normal(shift, 1)), 4),
             round(float(rng.normal(5, 2)), 4))
        )
    df = spark.createDataFrame(rows, "arm string, v1 double, v2 double")
    out = {
        r["covariate"]: r
        for r in covariate_balance(
            df, "arm", "t", "c", ["v1", "v2"]
        ).collect()
    }
    for idx, cov in ((1, "v1"), (2, "v2")):
        av = np.array([r[idx] for r in rows if r[0] == "t"])
        bv = np.array([r[idx] for r in rows if r[0] == "c"])
        smd = (av.mean() - bv.mean()) / math.sqrt(
            (av.var(ddof=1) + bv.var(ddof=1)) / 2
        )
        assert abs(out[cov]["smd"] - smd) < 1e-6
        assert out[cov]["balanced"] == (abs(round(smd, 6)) < 0.1)
    assert out["v1"]["balanced"] is False  # planted 0.8-sigma shift
    assert out["v1"]["n_a"] == 100 and out["v1"]["n_b"] == 100
