"""Round-10 fixes: the kendall_tau Knight lane (judge r9 #2), the five
advisor-r9 guards (mmr short-pool, calibration clamp, HT raw-rate
guard, kendall quantization bound, jsd absence contract), and the
shared scale_lanes constants (judge r9 #6)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- kendall


def _py_kendall(xs, ys):
    """Reference O(n^2) tau-b on plain Python ints."""
    n = len(xs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            p = (xs[i] - xs[j]) * (ys[i] - ys[j])
            c += p > 0
            d += p < 0
    n0 = n * (n - 1) // 2

    def ties(v):
        from collections import Counter

        return sum(t * (t - 1) // 2 for t in Counter(v).values())

    n1, n2 = ties(xs), ties(ys)
    tau = None
    if n0 > n1 and n0 > n2:
        tau = (c - d) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))
    return n, c, d, tau


def test_knight_inversions_matches_bruteforce():
    import numpy as np

    from reddit_etl_spark.operators.series import _knight_inversions

    rng = random.Random(7)
    for n in (0, 1, 2, 63, 64, 65, 200, 999):
        a = np.array([rng.randint(0, 20) for _ in range(n)], dtype="int64")
        brute = sum(
            1 for i in range(n) for j in range(i + 1, n) if a[i] > a[j]
        )
        inv, merged = _knight_inversions(a)
        assert inv == brute
        assert list(merged) == sorted(a.tolist())


def test_kendall_knight_lane_parity_with_join_lane(spark):
    from reddit_etl_spark.operators.series import kendall_tau

    rng = random.Random(13)
    rows = [
        (g, float(rng.randint(0, 8)), float(rng.randint(0, 8)))
        for g in ("a", "b", "c")
        for _ in range(rng.randint(2, 40))
    ] + [("d", 1.0, 1.0)]  # n=1 group: dropped by both lanes
    df = spark.createDataFrame(rows, "g string, x double, y double")
    join_rows = {
        r["g"]: r
        for r in kendall_tau(df, ["g"], "x", "y", pairs="join").collect()
    }
    knight_rows = {
        r["g"]: r
        for r in kendall_tau(df, ["g"], "x", "y", pairs="knight").collect()
    }
    assert set(join_rows) == set(knight_rows) == {"a", "b", "c"}
    for g, jr in join_rows.items():
        kr = knight_rows[g]
        assert (jr["n"], jr["concordant"], jr["discordant"], jr["tau_b"]) == (
            kr["n"],
            kr["concordant"],
            kr["discordant"],
            kr["tau_b"],
        )
        # and both match the O(n^2) python reference
        pts = [(r[1], r[2]) for r in rows if r[0] == g]
        n, c, d, tau = _py_kendall(
            [int(p[0] * 1e6 + 0.5) for p in pts],
            [int(p[1] * 1e6 + 0.5) for p in pts],
        )
        assert (jr["n"], jr["concordant"], jr["discordant"]) == (n, c, d)
        assert jr["tau_b"] == (None if tau is None else round(tau, 6))


def test_kendall_auto_picks_join_under_threshold(spark):
    # auto on a tiny frame must behave exactly like the join lane
    # (same integers, same tau) — the cut-over is output-invisible
    from reddit_etl_spark.operators.series import kendall_tau

    rows = [("g", float(i % 5), float((i * 3) % 7)) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    auto = kendall_tau(df, ["g"], "x", "y").collect()
    join = kendall_tau(df, ["g"], "x", "y", pairs="join").collect()
    assert [tuple(r) for r in auto] == [tuple(r) for r in join]


def test_kendall_integral_inputs_skip_quantization(spark):
    # BIGINTs big enough that *1e6 would wrap int64 — the integral
    # lane must use them as-is and still get the ordering right
    from reddit_etl_spark.operators.series import kendall_tau

    big = 4_000_000_000_000  # 4e12: *1e6 wraps 2^63
    rows = [("g", big + i, big + i * 2) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = kendall_tau(df, ["g"], "x", "y", pairs="join").collect()[0]
    assert r["tau_b"] == 1.0 and r["discordant"] == 0


def test_kendall_fractional_out_of_bound_raises(spark):
    from reddit_etl_spark.operators.series import kendall_tau

    rows = [("g", 1.0e10, 1.0), ("g", 2.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    with pytest.raises(Exception, match="quantization bound"):
        kendall_tau(df, ["g"], "x", "y", pairs="join").collect()


def test_kendall_invalid_lane_raises(spark):
    from reddit_etl_spark.operators.series import kendall_tau

    df = spark.createDataFrame([("g", 1.0, 1.0)], "g string, x double, y double")
    with pytest.raises(ValueError, match="auto|join|knight"):
        kendall_tau(df, ["g"], "x", "y", pairs="exact")


# ---------------------------------------------------------------- advisor


def test_mmr_short_pool_emits_fewer_rows(spark):
    from reddit_etl_spark.operators.retrieval import mmr_rerank

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = mmr_rerank(df, "vec_id", "embedding", [1.0, 0.0], k=5, pool=10)
    out = got.collect()
    assert [r["rank"] for r in out] == [1, 2]  # 2 candidates, not 5

    empty = df.filter(F.lit(False))
    assert (
        mmr_rerank(empty, "vec_id", "embedding", [1.0, 0.0], k=3, pool=5)
        .count()
        == 0
    )


def test_calibration_clamps_out_of_range_scores(spark):
    from reddit_etl_spark.operators.classify import calibration_report

    rows = [(-0.3, False), (1.7, True), (0.5, True), (0.5, False)]
    df = spark.createDataFrame(rows, "p double, y boolean")
    out = {r["bin"]: r for r in calibration_report(df, "p", "y", 10).collect()}
    # -0.3 saturates to 0 (bin 0), 1.7 to 1.0 (top bin) — never bin -1
    assert set(out) == {0, 5, 9}
    assert out[0]["mean_predicted"] == 0.0
    assert out[9]["mean_predicted"] == 1.0


def test_ht_fractional_rate_raises(spark):
    from reddit_etl_spark.operators.relational import horvitz_thompson_total

    df = spark.createDataFrame(
        [("s", float(i), str(i)) for i in range(50)],
        "st string, v double, k string",
    )
    with pytest.raises(Exception, match="constant non-NULL integer"):
        horvitz_thompson_total(
            df, "st", "v", "k", F.lit(200.5)
        ).collect()


def test_ht_null_rate_raises(spark):
    from reddit_etl_spark.operators.relational import horvitz_thompson_total

    df = spark.createDataFrame(
        [("s", float(i), str(i)) for i in range(50)],
        "st string, v double, k string",
    )
    rate = F.when(F.col("k") == "0", F.lit(None)).otherwise(F.lit(200))
    with pytest.raises(Exception, match="constant non-NULL integer"):
        horvitz_thompson_total(df, "st", "v", "k", rate).collect()


def test_ht_integral_rate_still_works(spark):
    from reddit_etl_spark.operators.relational import horvitz_thompson_total

    df = spark.createDataFrame(
        [("s", 1.0, str(i)) for i in range(200)],
        "st string, v double, k string",
    )
    r = horvitz_thompson_total(df, "st", "v", "k", F.lit(500)).collect()[0]
    assert r["rate_permille"] == 500 and r["n_pop"] == 200
    assert r["true_total"] == 200.0


# ------------------------------------------------------------ scale lanes


def test_scale_lane_constants_are_shared():
    from reddit_etl_spark.operators import scale_lanes
    from reddit_etl_spark.operators.relational import _QNORM_AUTO_ROWS

    assert _QNORM_AUTO_ROWS is scale_lanes.EXACT_RANK_MAX_ROWS
    assert scale_lanes.PAIR_LANE_MAX_GROUP_ROWS == 10_000
    import inspect

    from reddit_etl_spark.operators.dq import profile_drift

    sig = inspect.signature(profile_drift)
    assert sig.parameters["ndv_rsd"].default == scale_lanes.NDV_SKETCH_RSD


# --------------------------------------------------- pair-stage max_df


def test_partial_copy_max_df_masks_boilerplate(spark):
    from reddit_etl_spark.operators.text import partial_copy_pairs

    excerpt = "the quick brown fox jumps over the lazy dog repeatedly"
    boiler = "all rights reserved subscribe to our newsletter today ok"
    rows = [
        (1, "unique alpha text one two three four five " + excerpt + boiler),
        (2, "different beta prose six seven eight nine " + excerpt + boiler),
        (3, "gamma words ten eleven twelve thirteen fourteen " + boiler),
        (4, "delta prose fifteen sixteen seventeen eighteen " + boiler),
        (5, "epsilon chatter nineteen twenty twentyone twentytwo " + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(k=10, window=4, min_shared=2)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in partial_copy_pairs(df, "doc_id", "text", **kw).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in partial_copy_pairs(
            df, "doc_id", "text", **kw, max_df=2
        ).collect()
    }
    # boilerplate fingerprints (df=5 > 2) drop: boilerplate-only pairs
    # vanish, the true excerpt pair (1,2) survives
    assert (1, 2) in uncapped and len(uncapped) == 10  # C(5,2): all pairs
    assert capped == {(1, 2)}


def test_edit_distance_max_df_drops_mass_duplicates(spark):
    from reddit_etl_spark.operators.dedup import edit_distance_pairs

    rows = [(i, "aaaa") for i in range(5)] + [(9, "aaab")]
    df = spark.createDataFrame(rows, "id long, s string")
    uncapped = edit_distance_pairs(df, "id", "s").count()
    assert uncapped == 10 + 5  # C(5,2) ed=0 copies + 5 ed=1 pairs
    # the mass-duplicated buckets (df > 3) drop out of candidate
    # generation entirely — run dedup_exact first for those
    assert edit_distance_pairs(df, "id", "s", max_df=3).count() == 0


# ------------------------------------------------------- round-10 wave


def test_mann_kendall_increasing_and_guards(spark):
    from reddit_etl_spark.operators.series import mann_kendall_trend

    rows = [("g", t, t * 2) for t in range(1, 13)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    r = mann_kendall_trend(df, ["g"], "t", "v").collect()[0]
    n = 12
    s = n * (n - 1) // 2  # strictly increasing: every pair concordant
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert r["s_stat"] == s and r["var_s"] == round(var, 6)
    assert r["z"] == round((s - 1) / math.sqrt(round(var, 6)), 6)
    assert r["trend"] == "increasing"

    # duplicate timestamps raise
    dup = spark.createDataFrame(
        [("g", 1, 1), ("g", 1, 2), ("g", 2, 3)], "g string, t long, v long"
    )
    with pytest.raises(Exception, match="duplicate timestamps"):
        mann_kendall_trend(dup, ["g"], "t", "v").collect()
    # non-integral input raises
    fr = spark.createDataFrame([("g", 1.0, 1)], "g string, t double, v long")
    with pytest.raises(ValueError, match="integral"):
        mann_kendall_trend(fr, ["g"], "t", "v")


def test_logrank_hand_case(spark):
    from reddit_etl_spark.operators.relational import logrank_test

    # A: 2 subjects event at t=1; B: 2 subjects event at t=2
    rows = [("A", 1, True), ("A", 1, True), ("B", 2, True), ("B", 2, True)]
    df = spark.createDataFrame(rows, "side string, t long, obs boolean")
    r = logrank_test(df, [], "t", "obs", "side", "A", "B").collect()[0]
    # t=1: n=4, d=2, E1 = 2*2/4 = 1, V = 2*.5*.5*2/3 = 1/3
    # t=2: n1=0 -> E1 = 0, V = 0 (n-d = 0); chi2 = 1^2/(1/3) = 3
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert (r["events_a"], r["events_b"]) == (2, 2)
    assert r["expected_a"] == 1.0
    assert r["chi2"] == 3.0


def test_cohens_kappa_hand_case(spark):
    from reddit_etl_spark.operators.classify import cohens_kappa

    rows = (
        [("g", "y", "y")] * 20
        + [("g", "y", "n")] * 5
        + [("g", "n", "y")] * 10
        + [("g", "n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "g string, a string, b string")
    r = cohens_kappa(df, ["g"], "a", "b").collect()[0]
    # po = 35/50 = .7; pe = (25*30 + 25*20)/2500 = .5; kappa = .4
    assert r["n"] == 50
    assert r["observed_agreement"] == 0.7
    assert r["expected_agreement"] == 0.5
    assert r["kappa"] == 0.4


def test_rbo_identical_and_disjoint(spark):
    from reddit_etl_spark.operators.retrieval import rbo_overlap

    a = spark.createDataFrame(
        [("q", i, i) for i in range(1, 6)], "g string, id long, rank long"
    )
    got = rbo_overlap(a, a, ["g"], "id", "rank", p=0.9, k=5).collect()[0]
    # identical top-k: rbo = (1-p) sum p^(d-1) * d/d = 1 - p^k
    assert got["rbo"] == round(1 - 0.9**5, 6)
    assert got["overlap_k"] == 5
    b = spark.createDataFrame(
        [("q", i + 100, i) for i in range(1, 6)],
        "g string, id long, rank long",
    )
    dis = rbo_overlap(a, b, ["g"], "id", "rank", p=0.9, k=5).collect()[0]
    assert dis["rbo"] == 0.0 and dis["overlap_k"] == 0  # seated, not absent


def test_hellinger_identical_and_disjoint(spark):
    from reddit_etl_spark.operators.curation import hellinger_drift

    ref = spark.createDataFrame(
        [("g", float(v)) for v in (1, 1, 2, 3)], "g string, v double"
    )
    same = hellinger_drift(ref, ref, "v", ["g"], bin_width=1.0).collect()[0]
    assert same["bc"] == 1.0 and same["hellinger"] == 0.0
    assert same["bhattacharyya"] == 0.0
    far = spark.createDataFrame(
        [("g", float(v)) for v in (100, 101)], "g string, v double"
    )
    d = hellinger_drift(ref, far, "v", ["g"], bin_width=1.0).collect()[0]
    assert d["bc"] == 0.0 and d["hellinger"] == 1.0
    assert d["bhattacharyya"] is None


def test_cvm_matches_bruteforce(spark):
    from reddit_etl_spark.operators.relational import cvm_two_sample

    va = [1.0, 2.0, 2.0, 4.0]
    vb = [2.0, 3.0, 5.0]
    rows = [("g", v, "a") for v in va] + [("g", v, "b") for v in vb]
    df = spark.createDataFrame(rows, "g string, v double, s string")
    r = cvm_two_sample(df, ["g"], "v", "s", "a", "b").collect()[0]
    n, m = len(va), len(vb)
    pooled = sorted(set(va + vb))
    t = 0.0
    for x in pooled:
        fa = sum(1 for v in va if v <= x) / n
        fb = sum(1 for v in vb if v <= x) / m
        cnt = sum(1 for v in va + vb if v == x)
        t += cnt * (fa - fb) ** 2
    t *= n * m / (n + m) ** 2
    assert (r["n_a"], r["n_b"]) == (n, m)
    assert r["cvm"] == round(t, 6)


def test_heaps_law_curve_shape(spark):
    from reddit_etl_spark.operators.text import heaps_law

    rows = [(i, " ".join(f"w{j}" for j in range(i))) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = heaps_law(df, "doc_id", "text", checkpoints=5).collect()
    assert [r["checkpoint"] for r in out] == [1, 2, 3, 4, 5]
    toks = [r["n_tokens_cum"] for r in out]
    voc = [r["vocab_cum"] for r in out]
    assert toks == sorted(toks) and voc == sorted(voc)
    assert toks[-1] == sum(range(1, 41))  # every token instance counted
    assert voc[-1] == 40  # w0..w39 (doc 40 holds all of them)
    assert 0 < out[0]["heaps_beta"] <= 1.001


def test_mask_profile_hand_case(spark):
    from reddit_etl_spark.operators.dq import mask_profile

    rows = [
        ("s", "AB-12"), ("s", "CD-34"), ("s", "xy99"), ("s", None),
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r["mask"]: r for r in mask_profile(df, ["g"], "v", 5).collect()}
    assert out["AA-99"]["n"] == 2 and out["AA-99"]["rank"] == 1
    assert out["AA-99"]["share"] == 0.5
    assert out["aa99"]["n"] == 1
    assert out["∅"]["n"] == 1  # NULL sentinel


def test_digit_uniformity_all_round(spark):
    from reddit_etl_spark.operators.dq import digit_uniformity

    df = spark.createDataFrame(
        [("g", float(d)) for d in (1, 2, 3, 4)], "g string, v double"
    )
    r = digit_uniformity(df, ["g"], "v").collect()[0]
    # all .00 cents: one cell holds n=4 -> chi2 = 16*100/4 - 4 = 396
    assert r["n"] == 4 and r["chi2"] == 396.0
    assert r["share_00"] == 1.0 and r["top_cell"] == 0
    assert r["top_cell_lift"] == 100.0


def test_did_hand_case(spark):
    from reddit_etl_spark.operators.relational import diff_in_diff

    rows = (
        [("g", True, False, 1.0)] * 3
        + [("g", True, True, 3.0)] * 3
        + [("g", False, False, 2.0)] * 3
        + [("g", False, True, 2.5)] * 3
    )
    df = spark.createDataFrame(rows, "g string, t boolean, p boolean, v double")
    r = diff_in_diff(df, ["g"], "t", "p", "v").collect()[0]
    assert r["did"] == 1.5  # (3-1) - (2.5-2)
    assert r["se"] == 0.0  # zero within-cell variance
    assert r["t_stat"] is None  # se == 0 -> undefined


def test_pinball_hand_case(spark):
    from reddit_etl_spark.operators.series import pinball_loss

    df = spark.createDataFrame(
        [("g", 10.0, 8.0)], "g string, a double, f double"
    )
    out = {
        r["tau"]: r["pinball"]
        for r in pinball_loss(df, ["g"], "a", "f", (0.5, 0.9)).collect()
    }
    assert out[0.5] == 1.0  # .5 * (10-8)
    assert out[0.9] == 1.8
    with pytest.raises(ValueError, match="2-decimal"):
        pinball_loss(df, ["g"], "a", "f", (0.333,))
    # representation error on a GENUINE 2-decimal tau must not raise:
    # 0.07 * 100 == 7.000000000000001 under IEEE, and the old exact-
    # equality check rejected it
    out7 = {
        r["tau"]: r["pinball"]
        for r in pinball_loss(df, ["g"], "a", "f", (0.07, 0.14, 0.29, 0.58)).collect()
    }
    assert out7[0.07] == round(0.07 * 2, 6)
    assert out7[0.58] == round(0.58 * 2, 6)


def test_mattr_hand_cases(spark):
    from reddit_etl_spark.operators.text import mattr

    rows = [(1, " ".join(["a"] * 30)), (2, "x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in mattr(df, "doc_id", "text", 25).collect()}
    # doc 1: 30 tokens, every 25-window has 1 distinct -> mattr = 1/25
    assert out[1]["n_tokens"] == 30
    assert out[1]["mattr"] == 0.04
    assert out[1]["ttr"] == round(1 / 30, 6)
    # doc 2 shorter than the window: mattr falls back to ttr = 1.0
    assert out[2]["mattr"] == 1.0 and out[2]["ttr"] == 1.0


def test_theil_sen_max_group_rows_guard(spark):
    from reddit_etl_spark.operators.relational import theil_sen

    rows = [("g", float(i), float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    ok = theil_sen(df, ["g"], "x", "y", max_group_rows=100).collect()
    assert ok[0]["slope"] == 1.0
    with pytest.raises(Exception, match="max_group_rows"):
        theil_sen(df, ["g"], "x", "y", max_group_rows=10).collect()
    # r11 (judge r10 #2): the guard defaults ON at
    # scale_lanes.PAIR_LANE_MAX_GROUP_ROWS — a silent quadratic pair
    # frame now requires an explicit max_group_rows=None opt-out
    import inspect

    from reddit_etl_spark.operators import scale_lanes

    sig = inspect.signature(theil_sen)
    assert (
        sig.parameters["max_group_rows"].default
        == scale_lanes.PAIR_LANE_MAX_GROUP_ROWS
    )
    default_ok = theil_sen(df, ["g"], "x", "y").collect()
    assert default_ok[0]["slope"] == 1.0
    none_ok = theil_sen(df, ["g"], "x", "y", max_group_rows=None).collect()
    assert none_ok[0]["slope"] == 1.0


# ------------------------------------------------------------- wave 2


def test_gains_table_hand_case(spark):
    from reddit_etl_spark.operators.classify import gains_table

    # 10 entities, scores 10..1, positives exactly the top 3 scorers
    rows = [("g", i, float(11 - i), i <= 3) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, id long, s double, y boolean")
    out = {r["bucket"]: r for r in
           gains_table(df, ["g"], "id", "s", "y", 5).collect()}
    assert out[1]["positives"] == 2 and out[1]["response_rate"] == 1.0
    assert out[1]["cum_capture"] == round(2 / 3, 6)
    # bucket 1 rate 1.0 vs base rate .3 -> lift 10/3
    assert out[1]["cum_lift"] == round(1.0 / 0.3, 6)
    assert out[5]["cum_capture"] == 1.0 and out[5]["cum_lift"] == 1.0


def test_pr_curve_hand_case(spark):
    from reddit_etl_spark.operators.classify import pr_curve

    rows = [(0.9, True), (0.8, False), (0.4, True), (0.1, False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    out = {r["threshold"]: r for r in
           pr_curve(df, [], "s", "y", (0.5,)).collect()}
    r = out[0.5]
    assert (r["predicted_pos"], r["tp"], r["fn"]) == (2, 1, 1)
    assert r["precision"] == 0.5 and r["recall"] == 0.5
    assert r["f1"] == 0.5


def test_ece_perfect_and_miscalibrated(spark):
    from reddit_etl_spark.operators.classify import (
        expected_calibration_error,
    )

    # p=0.5 with a 50% positive rate in one bin: gap 0 -> ece 0
    rows = [(0.5, True), (0.5, False)] * 5
    df = spark.createDataFrame(rows, "p double, y boolean")
    r = expected_calibration_error(df, "p", "y", 10).collect()[0]
    assert r["ece"] == 0.0 and r["mce"] == 0.0
    # constant p=0.9 but nothing positive: gap 0.9 everywhere
    bad = spark.createDataFrame([(0.9, False)] * 4, "p double, y boolean")
    rb = expected_calibration_error(bad, "p", "y", 10).collect()[0]
    assert rb["ece"] == 0.9 and rb["mce"] == 0.9


def test_char_entropy_closed_forms(spark):
    from reddit_etl_spark.operators.text import char_entropy

    rows = [(1, "aaaa"), (2, "abab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           char_entropy(df, "doc_id", "text").collect()}
    assert out[1]["entropy_nats"] == 0.0
    assert out[2]["entropy_nats"] == round(math.log(2.0), 6)
    assert out[2]["distinct_chars"] == 2 and out[2]["n_chars"] == 4


def test_vocab_coverage_hand_case(spark):
    from reddit_etl_spark.operators.text import vocab_coverage

    # tokens: a x3, b x2, c x1, d x1 -> V=4 N=7 n1=2 n2=1
    df = spark.createDataFrame(
        [("s", "a a a b b c d")], "src string, text string"
    )
    r = vocab_coverage(df, ["src"], "text").collect()[0]
    assert (r["vocab"], r["n_tokens"]) == (4, 7)
    assert (r["singletons"], r["doubletons"]) == (2, 1)
    assert r["gt_unseen_mass"] == round(2 / 7, 6)
    assert r["chao1_vocab"] == round(4 + 2 * 1 / (2 * 2), 6)


def test_shrunk_rates_pulls_toward_pool(spark):
    from reddit_etl_spark.operators.relational import shrunk_rates

    rows = [("g", "lowvol", 1, 1), ("g", "highvol", 50, 100)]
    df = spark.createDataFrame(rows, "g string, e string, k long, n long")
    out = {r["e"]: r for r in
           shrunk_rates(df, ["g"], ["e"], "k", "n", 20).collect()}
    pool = 51 / 101
    assert out["lowvol"]["raw_rate"] == 1.0
    assert out["lowvol"]["shrunk_rate"] == round((1 + 20 * pool) / 21, 6)
    # high-evidence entity barely moves
    assert abs(out["highvol"]["shrunk_rate"] - 0.5) < 0.02
    with pytest.raises(ValueError, match="nonnegative integer"):
        shrunk_rates(df, ["g"], ["e"], "k", "n", 2.5)


def test_mase_hand_case(spark):
    from reddit_etl_spark.operators.series import mase

    # actual 1..10; forecast = actual - 1 (|diff| = 1 everywhere);
    # season 2 naive: |a(t) - a(t-2)| = 2 -> mase = 0.5
    rows = [("g", t, float(t), float(t - 1)) for t in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, o long, a double, f double")
    r = mase(df, ["g"], "o", "a", "f", season=2).collect()[0]
    assert r["mae"] == 1.0 and r["mae_naive"] == 2.0
    assert r["mase"] == 0.5
    assert (r["n_scored"], r["n_naive"]) == (10, 8)


def test_mase_null_actual_not_counted(spark):
    """A NULL actual must drop out of BOTH denominators (its |diff|
    term is NULL either way) — it used to inflate n_scored and
    silently deflate the MAE — while keeping its ROW position for
    the by-row seasonal lag."""
    from reddit_etl_spark.operators.series import mase

    rows = [
        ("g", 1, 10.0, 8.0),
        ("g", 2, None, 9.0),  # NULL actual, forecast present
        ("g", 3, 20.0, 16.0),
    ]
    df = spark.createDataFrame(rows, "g string, o long, a double, f double")
    r = mase(df, ["g"], "o", "a", "f", season=2).collect()[0]
    # scored rows: t=1 (|2|), t=3 (|4|) -> mae = 3, n_scored = 2
    assert (r["n_scored"], r["mae"]) == (2, 3.0)
    # naive pairs by ROW: t=3 vs t=1 -> |20-10| = 10; t=2's NULL kept
    # its slot so t=3 lags to t=1, not to a shifted neighbor
    assert (r["n_naive"], r["mae_naive"]) == (1, 10.0)


def test_transition_entropy_deterministic_chain(spark):
    from reddit_etl_spark.operators.series import transition_entropy

    # user 1: a->b->a->b...  (a always goes to b, b always to a)
    rows = [(1, t, 0, "a" if t % 2 else "b") for t in range(10)]
    # user 2: c goes to a and b equally
    rows += [(2, t, 0, s) for t, s in enumerate(["c", "a", "c", "b"])]
    df = spark.createDataFrame(rows, "u long, ts long, eid long, s string")
    out = {r["state"]: r for r in
           transition_entropy(df, "u", ["ts", "eid"], "s").collect()}
    assert out["c"]["entropy_nats"] == round(math.log(2.0), 6)
    assert out["c"]["entropy_norm"] == 1.0
    # 'b' transitions: 5x b->a in user1, 1x b->c? no: user2 has a->c, b absent tail
    assert out["b"]["top_next"] == "a"


# ------------------------------------------------------------- wave 3


def test_vocab_overlap_hand_case(spark):
    from reddit_etl_spark.operators.text import vocab_overlap

    rows = [("a", "x y z"), ("b", "x y"), ("c", "p q")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in vocab_overlap(df, "source", "text").collect()
    }
    ab = out[("a", "b")]
    assert ab["shared"] == 2 and ab["jaccard"] == round(2 / 3, 6)
    assert ab["containment_a"] == round(2 / 3, 6)
    assert ab["containment_b"] == 1.0  # b fully contained in a
    assert out[("a", "c")]["shared"] == 0  # seated, zero overlap
    assert len(out) == 3


def test_vocab_overlap_max_sources(spark):
    """The fail-fast guard (r11: PLAN-EMBEDDED, default ON at 100 —
    advisor r10): m above the cap raises at execution, map-side on
    every pair-join input, before the C(m,2) join can emit rows;
    at/below the cap the output is identical to the unguarded
    contract. Construction stays job-free (the lazy-build rule)."""
    import pytest

    from reddit_etl_spark.operators.text import vocab_overlap

    rows = [("a", "x y z"), ("b", "x y"), ("c", "p q")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = vocab_overlap(df, "source", "text", max_sources=2)
    with pytest.raises(Exception, match="3 distinct sources"):
        out.collect()
    guarded = sorted(
        map(tuple, vocab_overlap(df, "source", "text", max_sources=3).collect())
    )
    bare = sorted(
        map(
            tuple,
            vocab_overlap(df, "source", "text", max_sources=None).collect(),
        )
    )
    assert guarded == bare


def test_tokenizer_fertility_hand_case(spark):
    from reddit_etl_spark.operators.text import tokenizer_fertility

    # "don't stop" -> words 2; subwords: don,',t,stop = 4; chars 9
    df = spark.createDataFrame(
        [("s", "don't stop")], "src string, text string"
    )
    r = tokenizer_fertility(df, ["src"], "text").collect()[0]
    assert (r["words"], r["subword_tokens"]) == (2, 4)
    assert r["fertility"] == 2.0
    assert r["chars_per_subword"] == 2.25


def test_odds_ratio_hand_case(spark):
    from reddit_etl_spark.operators.relational import odds_ratio

    # a=20 b=10 c=10 d=20 -> OR = 400/100 = 4; RR = (2/3)/(1/3) = 2
    rows = (
        [("g", True, True)] * 20
        + [("g", True, False)] * 10
        + [("g", False, True)] * 10
        + [("g", False, False)] * 20
    )
    df = spark.createDataFrame(rows, "g string, e boolean, y boolean")
    r = odds_ratio(df, ["g"], "e", "y").collect()[0]
    assert r["odds_ratio"] == 4.0 and r["relative_risk"] == 2.0
    se = math.sqrt(1 / 20 + 1 / 10 + 1 / 10 + 1 / 20)
    z = 1.959963984540054
    assert r["ci_lo"] == round(math.exp(math.log(4.0) - z * se), 6)
    assert r["ci_hi"] == round(math.exp(math.log(4.0) + z * se), 6)
    # zero cell -> NULL CI
    zero = spark.createDataFrame(
        [("g", True, True), ("g", False, False)],
        "g string, e boolean, y boolean",
    )
    rz = odds_ratio(zero, ["g"], "e", "y").collect()[0]
    assert rz["ci_lo"] is None and rz["odds_ratio"] is None


def _py_kruskal(values_by_class):
    pooled = sorted(v for vs in values_by_class.values() for v in vs)
    n = len(pooled)
    # average ranks with ties
    from collections import Counter

    cnt = Counter(pooled)
    rank = {}
    cum = 0
    for v in sorted(cnt):
        rank[v] = cum + (cnt[v] + 1) / 2
        cum += cnt[v]
    rr = sum(
        (sum(rank[v] for v in vs)) ** 2 / len(vs)
        for vs in values_by_class.values()
    )
    h = 12.0 / (n * (n + 1)) * rr - 3.0 * (n + 1)
    t3t = sum(t**3 - t for t in cnt.values())
    corr = 1.0 - t3t / (n**3 - n)
    return h, (h / corr if corr > 0 else None)


def test_kruskal_matches_bruteforce(spark):
    from reddit_etl_spark.operators.relational import kruskal_wallis

    data = {
        "a": [1.0, 2.0, 2.0, 5.0],
        "b": [2.0, 3.0, 6.0],
        "c": [4.0, 4.0, 7.0, 8.0, 1.0],
    }
    rows = [("g", v, c) for c, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double, cls string")
    r = kruskal_wallis(df, ["g"], "v", "cls").collect()[0]
    h, hc = _py_kruskal(data)
    assert r["n"] == 12 and r["k_classes"] == 3
    assert r["h_stat"] == round(h, 6)
    assert r["h_corrected"] == round(hc, 6)
