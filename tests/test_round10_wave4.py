"""Round-10 wave 4: classifier eval (roc_auc, mcnemar, decision
stump), robust/moment stats (jarque_bera, brown_forsythe,
durbin_watson, page_hinkley, theil), design-based estimation
(jackknife, Chapman capture-recapture). Hand cases + brute-force
parity per operator."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- roc_auc


def _py_auc(scores, labels):
    """Tie-aware AUC via average ranks, plain Python."""
    pairs = sorted(zip(scores, labels))
    n = len(pairs)
    ranks = {}
    i = 0
    rank_sum_pos = 0.0
    while i < n:
        j = i
        while j < n and pairs[j][0] == pairs[i][0]:
            j += 1
        avg_rank = (i + 1 + j) / 2.0
        for k in range(i, j):
            if pairs[k][1]:
                rank_sum_pos += avg_rank
        i = j
    npos = sum(1 for _, y in pairs if y)
    nneg = n - npos
    if npos == 0 or nneg == 0:
        return None
    return (rank_sum_pos - npos * (npos + 1) / 2.0) / (npos * nneg)


def test_roc_auc_perfect_and_reversed(spark):
    from reddit_etl_spark.operators.classify import roc_auc

    rows = [("g", float(s), s >= 5) for s in range(10)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = roc_auc(df, ["g"], "s", "y").collect()[0]
    assert out["auc"] == 1.0 and out["gini"] == 1.0
    rows = [("g", float(s), s < 5) for s in range(10)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    assert roc_auc(df, ["g"], "s", "y").collect()[0]["auc"] == 0.0


def test_roc_auc_all_tied_is_half(spark):
    from reddit_etl_spark.operators.classify import roc_auc

    rows = [("g", 1.0, i % 2 == 0) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    assert roc_auc(df, ["g"], "s", "y").collect()[0]["auc"] == 0.5


def test_roc_auc_one_class_null(spark):
    from reddit_etl_spark.operators.classify import roc_auc

    rows = [("g", float(i), True) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    r = roc_auc(df, ["g"], "s", "y").collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0


def test_roc_auc_bruteforce_parity(spark):
    from reddit_etl_spark.operators.classify import roc_auc

    rng = random.Random(42)
    rows = [
        ("g", round(rng.uniform(0, 10), 2), rng.random() < 0.4)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    got = roc_auc(df, ["g"], "s", "y").collect()[0]["auc"]
    want = _py_auc([r[1] for r in rows], [r[2] for r in rows])
    assert abs(got - want) < 1e-6


# ------------------------------------------------------------ jarque_bera


def _py_jb(xs):
    n = len(xs)
    m = sum(xs) / n
    m2 = sum((x - m) ** 2 for x in xs) / n
    m3 = sum((x - m) ** 3 for x in xs) / n
    m4 = sum((x - m) ** 4 for x in xs) / n
    s = m3 / m2**1.5
    k = m4 / m2**2
    return s, k, n / 6.0 * (s * s + (k - 3) ** 2 / 4.0)


def test_jarque_bera_bruteforce_parity(spark):
    from reddit_etl_spark.operators.series import jarque_bera

    rng = random.Random(7)
    xs = [round(rng.gauss(50, 10), 2) for _ in range(500)]
    df = spark.createDataFrame([("g", x) for x in xs], "g string, v double")
    r = jarque_bera(df, ["g"], "v").collect()[0]
    s, k, jb = _py_jb(xs)
    assert abs(r["skewness"] - s) < 1e-5
    assert abs(r["kurtosis"] - k) < 1e-5
    assert abs(r["jb_stat"] - jb) < 1e-3
    assert r["n"] == 500


def test_jarque_bera_constant_nulls(spark):
    from reddit_etl_spark.operators.series import jarque_bera

    df = spark.createDataFrame(
        [("g", 5.0)] * 10, "g string, v double"
    )
    r = jarque_bera(df, ["g"], "v").collect()[0]
    assert r["skewness"] is None and r["jb_stat"] is None
    assert r["mean"] == 5.0


# ---------------------------------------------------------- durbin_watson


def _py_dw(xs):
    m = sum(xs) / len(xs)
    e = [x - m for x in xs]
    return sum(
        (e[t] - e[t - 1]) ** 2 for t in range(1, len(e))
    ) / sum(v * v for v in e)


def test_durbin_watson_alternating_near_four(spark):
    from reddit_etl_spark.operators.series import durbin_watson

    xs = [10.0 if i % 2 == 0 else -10.0 for i in range(20)]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)],
        "g string, t long, v double",
    )
    r = durbin_watson(df, ["g"], "t", "v").collect()[0]
    assert abs(r["dw"] - _py_dw(xs)) < 1e-6
    assert r["dw"] > 3.5 and r["rho1"] < -0.75


def test_durbin_watson_trending_near_zero(spark):
    from reddit_etl_spark.operators.series import durbin_watson

    xs = [float(i) for i in range(30)]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)],
        "g string, t long, v double",
    )
    r = durbin_watson(df, ["g"], "t", "v").collect()[0]
    assert abs(r["dw"] - _py_dw(xs)) < 1e-6
    assert r["dw"] < 0.2


def test_durbin_watson_single_point_null(spark):
    from reddit_etl_spark.operators.series import durbin_watson

    df = spark.createDataFrame([("g", 1, 5.0)], "g string, t long, v double")
    assert durbin_watson(df, ["g"], "t", "v").collect()[0]["dw"] is None


# ----------------------------------------------------------- page_hinkley


def test_page_hinkley_detects_level_shift(spark):
    from reddit_etl_spark.operators.series import page_hinkley

    xs = [10.0] * 20 + [30.0] * 10
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)],
        "g string, t long, v double",
    )
    r = page_hinkley(df, ["g"], "t", "v", delta=0.0, lam=20.0).collect()[0]
    assert r["alarm_at"] is not None and r["alarm_at"] >= 20
    assert r["n_alarms"] >= 1 and r["ph_max"] > 20.0


def test_page_hinkley_flat_no_alarm(spark):
    from reddit_etl_spark.operators.series import page_hinkley

    df = spark.createDataFrame(
        [("g", i, 10.0) for i in range(30)],
        "g string, t long, v double",
    )
    r = page_hinkley(df, ["g"], "t", "v", delta=0.0, lam=5.0).collect()[0]
    assert r["alarm_at"] is None and r["n_alarms"] == 0
    assert r["ph_max"] == 0.0


# ------------------------------------------------------------ theil_index


def _py_theil(xs):
    n = len(xs)
    mu = sum(xs) / n
    t = sum(x / mu * math.log(x / mu) for x in xs) / n
    l_ = sum(math.log(mu / x) for x in xs) / n
    return t, l_


def test_theil_equal_values_zero(spark):
    from reddit_etl_spark.operators.relational import theil_index

    df = spark.createDataFrame(
        [("g", 100.0)] * 8, "g string, v double"
    )
    r = theil_index(df, ["g"], "v").collect()[0]
    assert r["theil_t"] == 0.0 and r["theil_l"] == 0.0


def test_theil_bruteforce_parity(spark):
    from reddit_etl_spark.operators.relational import theil_index

    rng = random.Random(3)
    xs = [round(rng.uniform(1, 1000), 2) for _ in range(200)]
    df = spark.createDataFrame([("g", x) for x in xs], "g string, v double")
    r = theil_index(df, ["g"], "v").collect()[0]
    # operator computes in cent units; T/L are scale-invariant
    t, l_ = _py_theil([round(x * 100) for x in xs])
    assert abs(r["theil_t"] - t) < 1e-5
    assert abs(r["theil_l"] - l_) < 1e-5


def test_theil_drops_nonpositive(spark):
    from reddit_etl_spark.operators.relational import theil_index

    df = spark.createDataFrame(
        [("g", 10.0), ("g", 0.0), ("g", -5.0), ("g", None), ("g", 20.0)],
        "g string, v double",
    )
    r = theil_index(df, ["g"], "v").collect()[0]
    # r11 (advisor r10): NULLs are filtered BEFORE counting — only
    # the two excluded non-positive values land in n_dropped
    assert r["n"] == 2 and r["n_dropped"] == 2


# --------------------------------------------------------- brown_forsythe


def _py_bf(values, classes, scale=100):
    q = [(c, round(v * scale)) for v, c in zip(values, classes)]
    by_c: dict = {}
    for c, v in q:
        by_c.setdefault(c, []).append(v)
    zs = []
    zbar_i = {}
    for c, vs in by_c.items():
        vs_sorted = sorted(vs)
        med = vs_sorted[(len(vs) + 1) // 2 - 1]  # lower median
        z = [abs(v - med) for v in vs]
        zbar_i[c] = sum(z) / len(z)
        zs.extend((c, zi) for zi in z)
    n = len(zs)
    k = len(by_c)
    zbar = sum(z for _, z in zs) / n
    ssb = sum(len(by_c[c]) * (zbar_i[c] - zbar) ** 2 for c in by_c)
    ssw = sum((z - zbar_i[c]) ** 2 for c, z in zs)
    return (n - k) / (k - 1) * ssb / ssw


def test_brown_forsythe_bruteforce_parity(spark):
    from reddit_etl_spark.operators.relational import brown_forsythe

    rng = random.Random(11)
    rows = []
    for c, sd in (("a", 5), ("b", 15), ("c", 10)):
        rows += [(c, round(rng.gauss(50, sd), 2)) for _ in range(120)]
    df = spark.createDataFrame(rows, "c string, v double")
    r = brown_forsythe(df, "v", "c").collect()[0]
    want = _py_bf([v for _, v in rows], [c for c, _ in rows])
    assert abs(r["w_stat"] - want) < 1e-4
    assert r["k_classes"] == 3 and r["dof1"] == 2


def test_brown_forsythe_equal_spread_small(spark):
    from reddit_etl_spark.operators.relational import brown_forsythe

    # identical distributions shifted in mean -> identical |x-med|
    # profiles -> W = 0
    rows = [("a", v) for v in (1.0, 2.0, 3.0)] + [
        ("b", v) for v in (11.0, 12.0, 13.0)
    ]
    df = spark.createDataFrame(rows, "c string, v double")
    assert brown_forsythe(df, "v", "c").collect()[0]["w_stat"] == 0.0


def test_brown_forsythe_one_class_null(spark):
    from reddit_etl_spark.operators.relational import brown_forsythe

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "c string, v double"
    )
    assert brown_forsythe(df, "v", "c").collect()[0]["w_stat"] is None


# -------------------------------------------------------------- jackknife


def _py_jackknife(groups, values, scale=100):
    q = [round(v * scale) for v in values]
    by_g: dict = {}
    for g, v in zip(groups, q):
        by_g.setdefault(g, []).append(v)
    s = sum(q)
    n = len(q)
    gk = len(by_g)
    mu = s / n
    ths = [
        (s - sum(vs)) / (n - len(vs)) for vs in by_g.values()
    ]
    d = [t - mu for t in ths]
    var_j = (gk - 1) / gk * (
        sum(x * x for x in d) - sum(d) ** 2 / gk
    )
    return mu / scale, math.sqrt(max(var_j, 0.0)) / scale


def test_jackknife_bruteforce_parity(spark):
    from reddit_etl_spark.operators.relational import jackknife_groups

    rng = random.Random(5)
    rows = [
        (f"g{i % 6}", round(rng.uniform(10, 500), 2)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = jackknife_groups(df, "g", "v").collect()[0]
    mu, se = _py_jackknife([g for g, _ in rows], [v for _, v in rows])
    assert abs(r["mean"] - mu) < 1e-6
    assert abs(r["se_jack"] - se) < 1e-6
    assert r["g"] == 6 and r["n"] == 400


def test_jackknife_single_group_null_se(spark):
    from reddit_etl_spark.operators.relational import jackknife_groups

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(10)], "g string, v double"
    )
    r = jackknife_groups(df, "g", "v").collect()[0]
    assert r["se_jack"] is None and r["se_naive"] is not None


# ---------------------------------------------------------------- mcnemar


def test_mcnemar_hand_case(spark):
    from reddit_etl_spark.operators.classify import mcnemar_test

    # both=4, only_a=3, only_b=1, neither=2
    rows = (
        [("g", True, True)] * 4
        + [("g", True, False)] * 3
        + [("g", False, True)] * 1
        + [("g", False, False)] * 2
    )
    df = spark.createDataFrame(rows, "g string, a boolean, b boolean")
    r = mcnemar_test(df, ["g"], "a", "b").collect()[0]
    assert (r["only_a"], r["only_b"]) == (3, 1)
    # (|3-1|-1)^2 / 4 = 0.25
    assert r["mcnemar_chi2"] == 0.25
    assert r["disagree_rate"] == 0.4


def test_mcnemar_no_disagreement_null(spark):
    from reddit_etl_spark.operators.classify import mcnemar_test

    rows = [("g", True, True)] * 3 + [("g", False, False)] * 3
    df = spark.createDataFrame(rows, "g string, a boolean, b boolean")
    r = mcnemar_test(df, ["g"], "a", "b").collect()[0]
    assert r["mcnemar_chi2"] is None and r["disagree_rate"] == 0.0


# ---------------------------------------------------------- decision_stump


def test_decision_stump_perfect_split(spark):
    from reddit_etl_spark.operators.classify import decision_stump

    rows = [(float(i), i < 5) for i in range(10)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    r = decision_stump(df, "x", "y").collect()[0]
    assert r["threshold"] == 4.0
    assert r["pos_left"] == 5 and r["pos_right"] == 0
    # perfect split recovers the full parent entropy (ln 2)
    assert abs(r["gain_nats"] - r["entropy_parent"]) < 1e-9
    assert abs(r["entropy_parent"] - math.log(2)) < 1e-6


def test_decision_stump_tiebreak_smallest_threshold(spark):
    from reddit_etl_spark.operators.classify import decision_stump

    # y constant -> every split has gain 0 -> smallest threshold wins
    rows = [(float(i), True) for i in range(5)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    r = decision_stump(df, "x", "y").collect()[0]
    assert r["threshold"] == 0.0 and r["gain_nats"] == 0.0


def test_decision_stump_guard_raises(spark):
    from reddit_etl_spark.operators.classify import decision_stump

    rows = [(float(i), i % 2 == 0) for i in range(500)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    with pytest.raises(ValueError, match="max_distinct"):
        decision_stump(df, "x", "y", max_distinct=100)


def _py_stump(xs, ys):
    per_v = sorted(Counter(zip(xs, ys)).items())
    vals = sorted({x for x in xs})

    def ent(p, q):
        n = p + q
        h = 0.0
        for k in (p, q):
            if k > 0:
                h -= k / n * math.log(k / n)
        return h

    tp = sum(1 for y in ys if y)
    tq = len(ys) - tp
    best = None
    for t in vals:
        lp = sum(1 for x, y in zip(xs, ys) if x <= t and y)
        lq = sum(1 for x, y in zip(xs, ys) if x <= t and not y)
        rp, rq = tp - lp, tq - lq
        if rp + rq == 0:
            continue
        n = tp + tq
        gain = ent(tp, tq) - (
            (lp + lq) / n * ent(lp, lq) + (rp + rq) / n * ent(rp, rq)
        )
        key = (-round(gain, 6), t)
        if best is None or key < best[0]:
            best = (key, t, gain)
    return best[1], best[2]


def test_decision_stump_bruteforce_parity(spark):
    from reddit_etl_spark.operators.classify import decision_stump

    rng = random.Random(9)
    xs = [float(rng.randint(0, 40)) for _ in range(300)]
    ys = [x > 22 if rng.random() < 0.8 else rng.random() < 0.5 for x in xs]
    df = spark.createDataFrame(
        list(zip(xs, ys)), "x double, y boolean"
    )
    r = decision_stump(df, "x", "y").collect()[0]
    t, gain = _py_stump(xs, ys)
    assert r["threshold"] == t
    assert abs(r["gain_nats"] - gain) < 1e-5


# ------------------------------------------------------- capture-recapture


def test_chapman_hand_case(spark):
    from reddit_etl_spark.operators.text import vocab_capture_recapture

    # srcA bigrams: {a b, b c} ; srcB bigrams: {b c, c d}
    df = spark.createDataFrame(
        [("A", "a b c"), ("B", "b c d")], "source string, text string"
    )
    r = vocab_capture_recapture(df, "source", "text", ngram=2).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["vocab_a"], row["vocab_b"], row["shared"]) == (2, 2, 1)
    # Chapman: (3*3)/2 - 1 = 3.5
    assert row["chapman_total"] == 3.5
    assert row["union_observed"] == 3
    assert row["unseen"] == 0.5
    # Seber: sqrt(9*1*1/(4*3)) = sqrt(0.75)
    assert abs(row["se_chapman"] - math.sqrt(0.75)) < 1e-6


def test_chapman_zero_overlap(spark):
    from reddit_etl_spark.operators.text import vocab_capture_recapture

    df = spark.createDataFrame(
        [("A", "a b"), ("B", "x y")], "source string, text string"
    )
    row = vocab_capture_recapture(df, "source", "text", ngram=2).collect()[0]
    assert row["shared"] == 0
    # (1+1)(1+1)/(0+1) - 1 = 3
    assert row["chapman_total"] == 3.0


def test_chapman_guard_raises(spark):
    """r11: the guard is PLAN-EMBEDDED (construction stays job-free,
    the lazy-build rule) — it raises at EXECUTION, map-side, before
    the C(m,2) pair join can emit rows."""
    from reddit_etl_spark.operators.text import vocab_capture_recapture

    df = spark.createDataFrame(
        [(f"s{i}", "a b c") for i in range(5)], "source string, text string"
    )
    out = vocab_capture_recapture(df, "source", "text", max_sources=3)
    with pytest.raises(Exception, match="max_sources"):
        out.collect()
