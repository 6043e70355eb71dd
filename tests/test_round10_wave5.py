"""Round-10 wave 5: effect sizes (cohens_d), paired k-sample
(friedman, cochran_q), randomness/outliers (runs_test, grubbs),
extremes (hill, gumbel), SPC (imr), inequality curve (lorenz),
token enrichment (fightin_words). Hand cases + brute-force parity."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- cohens_d


def test_cohens_d_hand_case(spark):
    from reddit_etl_spark.operators.relational import cohens_d

    # a: {1,2,3} mean 2 ss 2 ; b: {4,5,6,7} mean 5.5 ss 5
    rows = [("g", float(v), "a") for v in (1, 2, 3)] + [
        ("g", float(v), "b") for v in (4, 5, 6, 7)
    ]
    df = spark.createDataFrame(rows, "g string, v double, c string")
    r = cohens_d(df, ["g"], "v", "c", "a", "b").collect()[0]
    sp = math.sqrt((2 + 5) / 5.0)
    d = (2 - 5.5) / sp
    assert abs(r["cohens_d"] - round(d, 6)) < 1e-9
    assert abs(r["hedges_g"] - round(d * (1 - 3 / (4 * 7 - 9)), 6)) < 1e-9
    assert (r["n_a"], r["n_b"]) == (3, 4)


def test_cohens_d_degenerate_null(spark):
    from reddit_etl_spark.operators.relational import cohens_d

    rows = [("g", 1.0, "a"), ("g", 2.0, "b"), ("g", 3.0, "b")]
    df = spark.createDataFrame(rows, "g string, v double, c string")
    assert cohens_d(df, ["g"], "v", "c", "a", "b").collect()[0][
        "cohens_d"
    ] is None


# ---------------------------------------------------------------- friedman


def _py_friedman(blocks):
    """blocks: list of dict treatment->value. Returns (chi2, corrected)."""
    k = len(blocks[0])
    n = len(blocks)
    rsum = dict.fromkeys(blocks[0], 0.0)
    t3t = 0
    for b in blocks:
        vals = sorted(b.values())
        for t, v in b.items():
            smaller = sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            rsum[t] += smaller + (ties + 1) / 2.0
        for tv in Counter(b.values()).values():
            t3t += tv**3 - tv
    chi2 = 12.0 / (n * k * (k + 1)) * sum(r * r for r in rsum.values()) - (
        3.0 * n * (k + 1)
    )
    corr = 1.0 - t3t / (n * k * (k * k - 1))
    return chi2, (chi2 / corr if corr > 0 else None)


def test_friedman_bruteforce_parity(spark):
    from reddit_etl_spark.operators.relational import friedman_test

    rng = random.Random(17)
    rows, blocks = [], []
    for b in range(25):
        cell = {}
        for t in ("x", "y", "z"):
            v = round(rng.uniform(0, 5), 1)
            cell[t] = round(v * 1_000_000)
            rows.append((b, t, v))
        blocks.append(cell)
    df = spark.createDataFrame(rows, "b long, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    chi2, corrected = _py_friedman(blocks)
    assert r["n_blocks"] == 25 and r["k_treatments"] == 3
    assert abs(r["chi2_f"] - chi2) < 1e-6
    assert abs(r["chi2_f_corrected"] - corrected) < 1e-6


def test_friedman_drops_incomplete_blocks(spark):
    from reddit_etl_spark.operators.relational import friedman_test

    rows = [
        (1, "x", 1.0), (1, "y", 2.0),
        (2, "x", 3.0), (2, "y", 1.0),
        (3, "x", 5.0),  # incomplete
    ]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    assert r["n_blocks"] == 2


def test_friedman_consistent_ordering_max_chi2(spark):
    from reddit_etl_spark.operators.relational import friedman_test

    # treatment z always ranks above y above x -> chi2 = n*(k-1)... the
    # maximum 12n(k-1)/... for k=3: chi2 = 2n
    rows = []
    for b in range(10):
        rows += [(b, "x", 1.0 + b), (b, "y", 2.0 + b), (b, "z", 3.0 + b)]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    assert abs(r["chi2_f"] - 20.0) < 1e-9


# -------------------------------------------------------------------- hill


def test_hill_pareto_recovers_alpha(spark):
    from reddit_etl_spark.operators.relational import hill_tail_index

    # exact Pareto(alpha=2) quantiles: x_i = (i/n)^(-1/2), i=1..n
    n = 2000
    xs = [round((i / n) ** -0.5, 2) for i in range(1, n + 1)]
    df = spark.createDataFrame(
        [("g", x) for x in xs], "g string, v double"
    )
    r = hill_tail_index(df, ["g"], "v", k=200).collect()[0]
    assert r["n_taken"] == 200
    assert 1.6 < r["hill_alpha"] < 2.4  # estimator noise band


def test_hill_tie_split_at_k(spark):
    from reddit_etl_spark.operators.relational import hill_tail_index

    # 5 distinct values, big tie group straddles k=4
    rows = [("g", 100.0)] * 2 + [("g", 50.0)] * 10 + [("g", 1.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    r = hill_tail_index(df, ["g"], "v", k=4).collect()[0]
    assert r["n_taken"] == 4 and r["x_k"] == 50.0
    # mean ln over {100,100,50,50} minus ln 50
    want = (2 * math.log(10000) + 2 * math.log(5000)) / 4 - math.log(5000)
    assert abs(r["log_mean_excess"] - want) < 1e-6


# ------------------------------------------------------------------ lorenz


def test_lorenz_uniform_shares(spark):
    from reddit_etl_spark.operators.relational import lorenz_deciles

    df = spark.createDataFrame(
        [(float(1),)] * 100, "v double"
    )
    rows = lorenz_deciles(df, "v").collect()
    assert len(rows) == 10
    assert all(r["n_units"] == 10 for r in rows)
    assert all(abs(r["share"] - 0.1) < 1e-9 for r in rows)
    assert rows[-1]["cum_share"] == 1.0


def test_lorenz_extreme_concentration(spark):
    from reddit_etl_spark.operators.relational import lorenz_deciles

    # 9 units of 0.01, one unit of 999.99 -> top decile ~ everything
    rows = [(0.01,)] * 9 + [(999.99,)]
    df = spark.createDataFrame(rows, "v double")
    out = lorenz_deciles(df, "v").collect()
    assert out[-1]["decile"] == 10 and out[-1]["n_units"] == 1
    assert out[-1]["share"] > 0.999


def test_lorenz_tie_straddles_boundary(spark):
    from reddit_etl_spark.operators.relational import lorenz_deciles

    # 15 equal values: deciles get 1.5 on average -> boundaries
    # floor(d*15/10) = 1,3,4,6,7,9,10,12,13,15 -> sizes 1,2,1,2,1,2,1,2,1,2
    df = spark.createDataFrame([(2.0,)] * 15, "v double")
    out = lorenz_deciles(df, "v").collect()
    sizes = [r["n_units"] for r in out]
    assert sizes == [1, 2, 1, 2, 1, 2, 1, 2, 1, 2]
    assert sum(sizes) == 15


# --------------------------------------------------------------- runs test


def test_runs_test_alternating_and_blocked(spark):
    from reddit_etl_spark.operators.series import runs_test

    # a median-valued sentinel (5.0) makes the lower median 5.0, so
    # the 10/1 alternation splits cleanly above/below and only the
    # sentinel itself drops as a median tie
    alt = [("a", 0, 5.0)] + [
        ("a", i, 10.0 if i % 2 == 0 else 1.0) for i in range(1, 21)
    ]
    blk = [("b", 0, 5.0)] + [
        ("b", i, 10.0 if i <= 10 else 1.0) for i in range(1, 21)
    ]
    df = spark.createDataFrame(alt + blk, "g string, o long, v double")
    out = {r["g"]: r for r in runs_test(df, ["g"], "o", "v").collect()}
    # perfectly alternating above/below -> runs = n, z strongly positive
    assert out["a"]["runs"] == 20 and out["a"]["z"] > 3
    # two blocks -> runs = 2, z strongly negative
    assert out["b"]["runs"] == 2 and out["b"]["z"] < -3
    assert out["a"]["n"] == 20 and out["a"]["n_below"] == 10


def test_runs_test_constant_null(spark):
    from reddit_etl_spark.operators.series import runs_test

    df = spark.createDataFrame(
        [("g", i, 5.0) for i in range(10)], "g string, o long, v double"
    )
    assert runs_test(df, ["g"], "o", "v").count() == 0  # all == median


# ------------------------------------------------------------------ grubbs


def test_grubbs_hand_case(spark):
    from reddit_etl_spark.operators.series import grubbs_statistic

    xs = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame([("g", x) for x in xs], "g string, v double")
    r = grubbs_statistic(df, ["g"], "v").collect()[0]
    m = sum(xs) / 5
    sd = math.sqrt(sum((x - m) ** 2 for x in xs) / 4)
    assert r["outlier_value"] == 100.0
    assert abs(r["g_stat"] - (100.0 - m) / sd) < 1e-6


def test_grubbs_tie_prefers_smaller_value(spark):
    from reddit_etl_spark.operators.series import grubbs_statistic

    # symmetric: -10 and +10 equidistant from mean 0 -> pick -10
    xs = [-10.0, 0.0, 10.0]
    df = spark.createDataFrame([("g", x) for x in xs], "g string, v double")
    assert grubbs_statistic(df, ["g"], "v").collect()[0][
        "outlier_value"
    ] == -10.0


# ------------------------------------------------------------------ gumbel


def test_gumbel_moments_hand_case(spark):
    from reddit_etl_spark.operators.series import (
        EULER_GAMMA,
        gumbel_block_maxima,
    )

    # blocks with maxima 10, 20, 30
    rows = [
        ("g", 1, 10.0), ("g", 1, 3.0),
        ("g", 2, 20.0), ("g", 2, 5.0),
        ("g", 3, 30.0),
    ]
    df = spark.createDataFrame(rows, "g string, b long, v double")
    r = gumbel_block_maxima(
        df, ["g"], "b", "v", return_period=52, scale=1_000_000
    ).collect()[0]
    assert r["n_blocks"] == 3 and r["block_max_mean"] == 20.0
    beta = 10.0 * math.sqrt(6) / math.pi
    loc = 20.0 - EULER_GAMMA * beta
    assert abs(r["gumbel_scale"] - beta) < 1e-4
    assert abs(r["gumbel_loc"] - loc) < 1e-4
    rl = loc - beta * math.log(-math.log(1 - 1 / 52))
    assert abs(r["return_level"] - rl) < 1e-3


# --------------------------------------------------------------------- imr


def test_imr_detects_breach(spark):
    from reddit_etl_spark.operators.series import imr_control_chart

    xs = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.2, 9.9, 10.1, 50.0]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)],
        "g string, o long, v double",
    )
    r = imr_control_chart(df, ["g"], "o", "v").collect()[0]
    assert r["n_breaches"] >= 1 and r["first_breach_at"] == 9
    assert r["n"] == 10


def test_imr_stable_no_breach(spark):
    from reddit_etl_spark.operators.series import imr_control_chart

    xs = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0]
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)],
        "g string, o long, v double",
    )
    r = imr_control_chart(df, ["g"], "o", "v").collect()[0]
    assert r["n_breaches"] == 0 and r["first_breach_at"] is None


# --------------------------------------------------------------- cochran q


def test_cochran_q_hand_case(spark):
    from reddit_etl_spark.operators.classify import cochran_q

    # classic: rule columns over 4 rows
    rows = [
        ("g", True, True, False),
        ("g", True, False, False),
        ("g", True, True, True),
        ("g", False, False, False),
    ]
    df = spark.createDataFrame(rows, "g string, a boolean, b boolean, c boolean")
    r = cochran_q(df, ["g"], ["a", "b", "c"]).collect()[0]
    c = [3, 2, 1]
    t = 6
    r2 = 4 + 1 + 9 + 0
    num = sum((cj - t / 3) ** 2 for cj in c)
    want = 3 * 2 * num / (3 * t - r2)
    assert abs(r["cochran_q"] - want) < 1e-9
    assert (r["fires_a"], r["fires_b"], r["fires_c"]) == (3, 2, 1)


def test_cochran_q_reduces_to_mcnemar_uncorrected(spark):
    from reddit_etl_spark.operators.classify import cochran_q

    # k=2: Q = (b-c)^2/(b+c) (uncorrected McNemar)
    rows = (
        [("g", True, False)] * 5
        + [("g", False, True)] * 2
        + [("g", True, True)] * 3
    )
    df = spark.createDataFrame(rows, "g string, a boolean, b boolean")
    r = cochran_q(df, ["g"], ["a", "b"]).collect()[0]
    assert abs(r["cochran_q"] - (5 - 2) ** 2 / 7.0) < 1e-6


def test_cochran_q_needs_two_rules(spark):
    from reddit_etl_spark.operators.classify import cochran_q

    df = spark.createDataFrame([("g", True)], "g string, a boolean")
    with pytest.raises(ValueError, match="at least 2"):
        cochran_q(df, ["g"], ["a"])


# ----------------------------------------------------------- fightin words


def test_fightin_words_enriched_token_wins(spark):
    from reddit_etl_spark.operators.text import fightin_words

    # source A heavy on 'zebra', B heavy on 'yak'; shared filler
    rows = [("A", "zebra zebra zebra common common")] * 20 + [
        ("B", "yak yak yak common common")
    ] * 20
    df = spark.createDataFrame(rows, "source string, text string")
    out = fightin_words(df, "source", "text", top_k=1).collect()
    top = {r["source"]: r["token"] for r in out}
    assert top == {"A": "zebra", "B": "yak"}
    za = [r["zscore"] for r in out if r["source"] == "A"][0]
    assert za > 2


def test_fightin_words_counts_exact(spark):
    from reddit_etl_spark.operators.text import fightin_words

    rows = [("A", "x x y"), ("B", "x y y")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["source"], r["token"]): r
        for r in fightin_words(df, "source", "text", top_k=5).collect()
    }
    assert out[("A", "x")]["count_in"] == 2
    assert out[("A", "x")]["count_rest"] == 1
    assert out[("B", "y")]["count_in"] == 2


def test_lorenz_negative_raises(spark):
    from reddit_etl_spark.operators.relational import lorenz_deciles

    df = spark.createDataFrame([(1.0,), (-2.0,), (3.0,)], "v double")
    with pytest.raises(Exception, match="negative value"):
        lorenz_deciles(df, "v").collect()
