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
