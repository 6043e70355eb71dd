"""Round-10 wave 8: the parametric k-sample family — Tukey HSD,
Games-Howell, Welch ANOVA, Bartlett. Brute-force parity + contract
cases."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _moments(xs):
    n = len(xs)
    m = sum(xs) / n
    var = sum((x - m) ** 2 for x in xs) / (n - 1)
    return n, m, var


def _mk(spark, groups):
    rows = [(c, v) for c, vs in groups.items() for v in vs]
    return spark.createDataFrame(rows, "c string, v double")


@pytest.fixture(scope="module")
def kgroups():
    rng = random.Random(47)
    return {
        "a": [round(rng.gauss(50, 5), 2) for _ in range(80)],
        "b": [round(rng.gauss(53, 12), 2) for _ in range(120)],
        "c": [round(rng.gauss(48, 8), 2) for _ in range(100)],
    }


def test_tukey_bruteforce_parity(spark, kgroups):
    from reddit_etl_spark.operators.relational import pairwise_mean_tests

    df = _mk(spark, kgroups)
    out = {
        (r["class_a"], r["class_b"]): r
        for r in pairwise_mean_tests(df, "v", "c", "tukey").collect()
    }
    moms = {c: _moments(v) for c, v in kgroups.items()}
    nn = sum(m[0] for m in moms.values())
    k = len(moms)
    ssw = sum((m[0] - 1) * m[2] for m in moms.values())
    mse = ssw / (nn - k)
    for (ca, cb), r in out.items():
        na, ma, _ = moms[ca]
        nb, mb, _ = moms[cb]
        se = math.sqrt(mse / 2 * (1 / na + 1 / nb))
        assert abs(r["q_stat"] - abs(ma - mb) / se) < 1e-4
        assert r["df"] == nn - k
    assert len(out) == 3


def test_games_howell_bruteforce_parity(spark, kgroups):
    from reddit_etl_spark.operators.relational import pairwise_mean_tests

    df = _mk(spark, kgroups)
    out = {
        (r["class_a"], r["class_b"]): r
        for r in pairwise_mean_tests(
            df, "v", "c", "games_howell"
        ).collect()
    }
    moms = {c: _moments(v) for c, v in kgroups.items()}
    for (ca, cb), r in out.items():
        na, ma, va = moms[ca]
        nb, mb, vb = moms[cb]
        se = math.sqrt((va / na + vb / nb) / 2)
        dfw = (va / na + vb / nb) ** 2 / (
            va**2 / (na**2 * (na - 1)) + vb**2 / (nb**2 * (nb - 1))
        )
        assert abs(r["q_stat"] - abs(ma - mb) / se) < 1e-4
        assert abs(r["df"] - dfw) < 1e-2


def test_welch_anova_bruteforce_parity(spark, kgroups):
    from reddit_etl_spark.operators.relational import welch_anova

    df = _mk(spark, kgroups)
    r = welch_anova(df, "v", "c").collect()[0]
    moms = {c: _moments(v) for c, v in kgroups.items()}
    k = len(moms)
    w = {c: m[0] / m[2] for c, m in moms.items()}
    sw = sum(w.values())
    mw = sum(w[c] * moms[c][1] for c in moms) / sw
    num = sum(w[c] * (moms[c][1] - mw) ** 2 for c in moms) / (k - 1)
    lam = sum(
        (1 - w[c] / sw) ** 2 / (moms[c][0] - 1) for c in moms
    )
    want = num / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    df2 = (k * k - 1) / (3 * lam)
    assert abs(r["w_stat"] - want) < 1e-4
    assert abs(r["df2"] - df2) < 1e-2
    assert r["k_dropped"] == 0


def test_bartlett_bruteforce_parity(spark, kgroups):
    from reddit_etl_spark.operators.relational import bartlett_test

    df = _mk(spark, kgroups)
    r = bartlett_test(df, "v", "c").collect()[0]
    moms = {c: _moments(v) for c, v in kgroups.items()}
    nn = sum(m[0] for m in moms.values())
    k = len(moms)
    sp2 = sum((m[0] - 1) * m[2] for m in moms.values()) / (nn - k)
    num = (nn - k) * math.log(sp2) - sum(
        (m[0] - 1) * math.log(m[2]) for m in moms.values()
    )
    cc = 1 + (
        sum(1 / (m[0] - 1) for m in moms.values()) - 1 / (nn - k)
    ) / (3 * (k - 1))
    assert abs(r["chi2_stat"] - num / cc) < 1e-4
    assert r["dof"] == 2


def test_bartlett_heteroscedastic_exceeds_homoscedastic(spark):
    from reddit_etl_spark.operators.relational import bartlett_test

    rng = random.Random(53)
    same = {
        "a": [round(rng.gauss(0, 10), 2) for _ in range(100)],
        "b": [round(rng.gauss(0, 10), 2) for _ in range(100)],
    }
    diff = {
        "a": [round(rng.gauss(0, 2), 2) for _ in range(100)],
        "b": [round(rng.gauss(0, 40), 2) for _ in range(100)],
    }
    r_same = bartlett_test(_mk(spark, same), "v", "c").collect()[0]
    r_diff = bartlett_test(_mk(spark, diff), "v", "c").collect()[0]
    assert r_diff["chi2_stat"] > 50 > r_same["chi2_stat"]


def test_bartlett_zero_variance_raises(spark):
    from reddit_etl_spark.operators.relational import bartlett_test

    rows = [("a", 5.0)] * 10 + [("b", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "c string, v double")
    with pytest.raises(Exception, match="zero\\s*variance|n < 2"):
        bartlett_test(df, "v", "c").collect()


def test_welch_drops_degenerate_visibly(spark):
    from reddit_etl_spark.operators.relational import welch_anova

    rows = (
        [("a", float(i)) for i in range(20)]
        + [("b", float(i * 2)) for i in range(20)]
        + [("z", 7.0)] * 15  # zero variance -> dropped, counted
    )
    df = spark.createDataFrame(rows, "c string, v double")
    r = welch_anova(df, "v", "c").collect()[0]
    assert r["k_classes"] == 2 and r["k_dropped"] == 1
    assert r["n"] == 40


def test_pairwise_unknown_method_raises(spark):
    from reddit_etl_spark.operators.relational import pairwise_mean_tests

    df = spark.createDataFrame([("a", 1.0)], "c string, v double")
    with pytest.raises(ValueError, match="unknown method"):
        pairwise_mean_tests(df, "v", "c", "bonferroni")
