"""Round-11 wave 2: hand cases + brute-force parity (KS-exponential
fit, Atkinson, Cliff's delta, Hodges-Lehmann, uncertainty
coefficient, ordinal association, agreement summary, seasonal
Mann-Kendall, Cox-Stuart, dispersion index)."""

from __future__ import annotations

import math

import pytest


# ----------------------------------------------------- ks_exponential


def test_ks_exponential_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import ks_exponential_fit

    rng = np.random.default_rng(17)
    vals = np.round(rng.exponential(4.0, 300), 3)
    vals[0] = 0.0  # dropped (non-positive support)
    rows = [("g", float(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_exponential_fit(df, ["g"], "v", scale=1000).collect()[0]
    pos = np.round(np.round(vals[vals > 0] * 1000) / 1000, 6)
    n = len(pos)
    lam = n / pos.sum()
    xs = np.sort(np.unique(pos))
    cum = np.searchsorted(np.sort(pos), xs, side="right")
    t = cum - np.searchsorted(np.sort(pos), xs, side="left")
    f_fit = 1 - np.exp(-lam * xs)
    d = max(
        np.max(np.abs(cum / n - f_fit)),
        np.max(np.abs((cum - t) / n - f_fit)),
    )
    assert r["n"] == n and r["n_dropped"] == 1
    assert abs(r["lambda_hat"] - lam) < 1e-5
    assert abs(r["d_stat"] - d) < 1e-5


def test_ks_exponential_all_dropped(spark):
    from reddit_etl_spark.operators.relational import ks_exponential_fit

    df = spark.createDataFrame(
        [("g", 0.0), ("g", -1.0)], "g string, v double"
    )
    r = ks_exponential_fit(df, ["g"], "v").collect()[0]
    assert r["n"] == 0 and r["n_dropped"] == 2 and r["d_stat"] is None


# ---------------------------------------------------------- atkinson


def test_atkinson_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import atkinson_index

    rng = np.random.default_rng(19)
    vals = np.round(rng.lognormal(3, 1, 200), 2)
    rows = [("g", float(v)) for v in vals] + [("g", -1.0), ("g", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = atkinson_index(df, ["g"], "v").collect()[0]
    cents = np.round(vals * 100)
    mean = cents.mean()
    ede = (np.mean(cents**0.5)) ** 2
    assert r["n"] == 200 and r["n_dropped"] == 1
    assert abs(r["atkinson"] - (1 - ede / mean)) < 1e-6
    # equality -> A = 0
    eq = spark.createDataFrame([("g", 5.0)] * 10, "g string, v double")
    assert atkinson_index(eq, ["g"], "v").collect()[0]["atkinson"] == 0.0
    with pytest.raises(ValueError, match="epsilon"):
        atkinson_index(df, ["g"], "v", epsilon=1.0)


# ------------------------------------------------------- cliffs_delta


def test_cliffs_delta_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import cliffs_delta

    rng = np.random.default_rng(23)
    va = np.round(rng.normal(10, 2, 35), 1)
    vb = np.round(rng.normal(9, 2, 50), 1)
    rows = [("a", float(v)) for v in va] + [("b", float(v)) for v in vb]
    df = spark.createDataFrame(rows, "c string, v double")
    r = cliffs_delta(df, "v", "c", "a").collect()[0]
    gt = sum(1 for x in va for y in vb if x > y)
    lt = sum(1 for x in va for y in vb if x < y)
    want = (gt - lt) / (len(va) * len(vb))
    assert (r["n_a"], r["n_b"]) == (35, 50)
    assert abs(r["delta"] - want) < 1e-6
    assert r["magnitude"] in ("negligible", "small", "medium", "large")


def test_cliffs_delta_extremes(spark):
    from reddit_etl_spark.operators.relational import cliffs_delta

    rows = [("a", 10.0)] * 3 + [("b", 1.0)] * 4
    df = spark.createDataFrame(rows, "c string, v double")
    r = cliffs_delta(df, "v", "c", "a").collect()[0]
    assert r["delta"] == 1.0 and r["magnitude"] == "large"


# ----------------------------------------------------- hodges_lehmann


def test_hodges_lehmann_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import hodges_lehmann_shift

    rng = np.random.default_rng(29)
    va = np.round(rng.normal(12, 2, 30), 1)
    vb = np.round(rng.normal(10, 2, 40), 1)
    rows = [("a", float(v)) for v in va] + [("b", float(v)) for v in vb]
    df = spark.createDataFrame(rows, "c string, v double")
    r = hodges_lehmann_shift(df, "v", "c", "a").collect()[0]
    diffs = sorted(
        round(round(x * 100) - round(y * 100)) for x in va for y in vb
    )
    lower_med = diffs[(len(diffs) + 1) // 2 - 1] / 100
    assert (r["n_a"], r["n_b"]) == (30, 40)
    assert r["hl_shift"] == round(lower_med, 6)


def test_hodges_lehmann_grid_guard(spark, monkeypatch):
    from reddit_etl_spark.operators import scale_lanes
    from reddit_etl_spark.operators.relational import hodges_lehmann_shift

    rows = [("a", float(i)) for i in range(20)] + [
        ("b", float(i) + 0.5) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "c string, v double")
    monkeypatch.setattr(scale_lanes, "EXACT_RANK_MAX_ROWS", 10)
    with pytest.raises(Exception, match="EXACT_RANK_MAX_ROWS"):
        hodges_lehmann_shift(df, "v", "c", "a").collect()


# ---------------------------------------------- uncertainty_coefficient


def test_uncertainty_coefficient_bruteforce(spark):
    from collections import Counter

    from reddit_etl_spark.operators.relational import uncertainty_coefficient

    rows = [
        ("r1", "x"), ("r1", "x"), ("r1", "y"),
        ("r2", "y"), ("r2", "y"), ("r2", "z"), ("r3", "z"),
    ]
    df = spark.createDataFrame(rows, "r string, c string")
    out = uncertainty_coefficient(df, "r", "c").collect()[0]

    def ent(counts, n):
        return -sum(f / n * math.log(f / n) for f in counts)

    n = len(rows)
    hr = ent(Counter(r for r, _ in rows).values(), n)
    hc = ent(Counter(c for _, c in rows).values(), n)
    hrc = ent(Counter(rows).values(), n)
    mi = hr + hc - hrc
    assert abs(out["h_row"] - hr) < 1e-6
    assert abs(out["mutual_info"] - mi) < 1e-6
    assert abs(out["u_col_given_row"] - mi / hc) < 1e-6
    assert abs(out["u_symmetric"] - 2 * mi / (hr + hc)) < 1e-6


def test_uncertainty_perfect_mapping(spark):
    from reddit_etl_spark.operators.relational import uncertainty_coefficient

    # many-to-one: r determines c perfectly, c does not determine r
    rows = [("r1", "x")] * 3 + [("r2", "x")] * 3 + [("r3", "y")] * 3
    df = spark.createDataFrame(rows, "r string, c string")
    out = uncertainty_coefficient(df, "r", "c").collect()[0]
    assert out["u_col_given_row"] == 1.0
    assert out["u_row_given_col"] < 1.0


# ---------------------------------------------------- ordinal_association


def test_ordinal_association_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import ordinal_association

    rng = np.random.default_rng(31)
    xs = rng.integers(1, 5, 120)
    ys = np.clip(xs + rng.integers(-1, 2, 120), 1, 6)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long"
    )
    r = ordinal_association(df, "x", "y").collect()[0]
    c = d = tx = ty = 0
    n = len(xs)
    for i in range(n):
        for j in range(n):
            if xs[i] < xs[j] and ys[i] < ys[j]:
                c += 1
            elif xs[i] < xs[j] and ys[i] > ys[j]:
                d += 1
            elif xs[i] == xs[j] and ys[i] < ys[j]:
                tx += 1
            elif ys[i] == ys[j] and xs[i] < xs[j]:
                ty += 1
    assert r["c_pairs"] == c and r["d_pairs"] == d
    assert abs(r["gamma"] - (c - d) / (c + d)) < 1e-6
    assert abs(r["somers_d_yx"] - (c - d) / (c + d + ty)) < 1e-6
    want_taub = (c - d) / math.sqrt((c + d + tx) * (c + d + ty))
    assert abs(r["tau_b"] - want_taub) < 1e-6


def test_ordinal_association_cell_guard(spark):
    from reddit_etl_spark.operators.relational import ordinal_association

    df = spark.createDataFrame(
        [(i, i) for i in range(50)], "x long, y long"
    )
    with pytest.raises(Exception, match="max_cells"):
        ordinal_association(df, "x", "y", max_cells=10).collect()


# ------------------------------------------------------ agreement_summary


def test_agreement_summary_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import agreement_summary

    rng = np.random.default_rng(37)
    x = np.round(rng.normal(50, 10, 80), 3)
    y = np.round(x + rng.normal(1, 2, 80), 3)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    r = agreement_summary(df, "x", "y").collect()[0]
    d = y - x
    bias = d.mean()
    sd = d.std(ddof=1)
    vx, vy = x.var(), y.var()
    cxy = np.mean(x * y) - x.mean() * y.mean()
    ccc = 2 * cxy / (vx + vy + (x.mean() - y.mean()) ** 2)
    z = 1.959963984540054
    assert abs(r["bias"] - bias) < 1e-6
    assert abs(r["sd_diff"] - sd) < 1e-6
    assert abs(r["loa_lo"] - (bias - z * sd)) < 1e-5
    assert abs(r["loa_hi"] - (bias + z * sd)) < 1e-5
    assert abs(r["ccc"] - ccc) < 1e-5
    assert r["ccc"] <= abs(r["pearson_r"]) + 1e-9


# --------------------------------------------------- seasonal Mann-Kendall


def test_seasonal_mk_matches_per_season_sum(spark):
    import numpy as np

    from reddit_etl_spark.operators.series import (
        mann_kendall_trend,
        seasonal_mann_kendall,
    )

    rng = np.random.default_rng(41)
    rows = []
    for t in range(60):
        rows.append(
            ("g", t, int(t // 7 * 3 + (t % 7) * 10 + rng.integers(0, 5)),
             t % 7)
        )
    df = spark.createDataFrame(rows, "g string, t long, v long, season long")
    r = seasonal_mann_kendall(df, ["g"], "t", "v", "season").collect()[0]
    inner = mann_kendall_trend(
        df, ["g", "season"], "t", "v"
    ).collect()
    s_want = sum(x["s_stat"] for x in inner)
    v_want = round(sum(x["var_s"] for x in inner), 6)
    assert r["s_stat"] == s_want and r["n_seasons"] == 7
    assert r["var_s"] == v_want
    zw = (s_want - 1) / math.sqrt(v_want) if s_want > 0 else 0
    assert abs(r["z"] - zw) < 1e-6
    assert r["trend"] == "increasing"


# ----------------------------------------------------------- cox_stuart


def test_cox_stuart_hand_cases(spark):
    from reddit_etl_spark.operators.series import cox_stuart_trend

    # strictly increasing, odd n: middle dropped, all pairs positive
    rows = [("g", i, float(i)) for i in range(9)]
    df = spark.createDataFrame(rows, "g string, o long, v double")
    r = cox_stuart_trend(df, ["g"], "o", "v").collect()[0]
    assert (r["n"], r["m_pairs"], r["n_pos"], r["n_neg"]) == (9, 4, 4, 0)
    assert r["z"] == round(4 / math.sqrt(4), 6)
    # constant series: all ties -> NULL z
    rows = [("g", i, 1.0) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, o long, v double")
    r = cox_stuart_trend(df, ["g"], "o", "v").collect()[0]
    assert r["n_pos"] == 0 and r["n_neg"] == 0 and r["z"] is None


# ------------------------------------------------------ dispersion_index


def test_dispersion_index_bruteforce(spark):
    import numpy as np

    from reddit_etl_spark.operators.series import dispersion_index

    rng = np.random.default_rng(43)
    counts = rng.poisson(20, 50)
    df = spark.createDataFrame(
        [("g", int(c)) for c in counts], "g string, x long"
    )
    r = dispersion_index(df, ["g"], "x").collect()[0]
    mean = counts.mean()
    var = counts.var(ddof=1)
    assert abs(r["mean"] - mean) < 1e-6
    assert abs(r["variance"] - var) < 1e-6
    assert abs(r["dispersion"] - var / mean) < 1e-6
    assert abs(r["chi2"] - 49 * var / mean) < 1e-4
