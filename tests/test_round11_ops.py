"""Round-11 operator wave: hand cases + pure-Python brute-force
parity for the new inference/drift family (wilcoxon signed-rank,
Mood's median, 1-Wasserstein, Ansari-Bradley, Mantel-Haenszel,
Cochran-Armitage, Jonckheere-Terpstra, Page's L, Kendall's W,
Ljung-Box, Breusch-Pagan, GPD tail fit, Bowker)."""

from __future__ import annotations

import math

import pytest


# ------------------------------------------------------------ wilcoxon


def _py_wilcoxon(diffs):
    nz = [d for d in diffs if d != 0]
    n = len(nz)
    absd = sorted(abs(d) for d in nz)
    # midranks
    ranks = {}
    i = 0
    while i < len(absd):
        j = i
        while j < len(absd) and absd[j] == absd[i]:
            j += 1
        for _ in range(i, j):
            ranks.setdefault(absd[i], (i + j + 1) / 2)
        i = j
    w_plus = sum(ranks[abs(d)] for d in nz if d > 0)
    ties: dict = {}
    for d in nz:
        ties[abs(d)] = ties.get(abs(d), 0) + 1
    tie_term = sum(t**3 - t for t in ties.values())
    var = n * (n + 1) * (2 * n + 1) / 24 - tie_term / 48
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
    return n, w_plus, z


def test_wilcoxon_bruteforce_parity(spark):
    from reddit_etl_spark.operators.relational import wilcoxon_signed_rank

    pre = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 3.0, 2.0]
    post = [2.5, 2.0, 5.0, 3.5, 9.0, 7.5, 4.5, 4.0]
    df = spark.createDataFrame(
        list(zip(pre, post)), "x double, y double"
    )
    r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    diffs = [round((b - a) * 100) for a, b in zip(pre, post)]
    n, w_plus, z = _py_wilcoxon(diffs)
    assert r["n"] == n and r["n_zero"] == 1
    assert r["w_plus"] == w_plus
    assert abs(r["z"] - z) < 1e-6
    assert abs(r["r_effect"] - z / math.sqrt(n)) < 1e-6


def test_wilcoxon_empty_and_all_zero(spark):
    from reddit_etl_spark.operators.relational import wilcoxon_signed_rank

    empty = spark.createDataFrame([], "x double, y double")
    r = wilcoxon_signed_rank(empty, "x", "y").collect()[0]
    assert r["n"] == 0 and r["n_zero"] == 0 and r["z"] is None
    same = spark.createDataFrame([(1.0, 1.0)] * 4, "x double, y double")
    r = wilcoxon_signed_rank(same, "x", "y").collect()[0]
    assert r["n"] == 0 and r["n_zero"] == 4 and r["z"] is None


# -------------------------------------------------------- moods_median


def test_moods_median_hand_case(spark):
    from reddit_etl_spark.operators.relational import moods_median

    # pooled: a = 1..6, b = 7..12 -> N=12, lower median = value at
    # pos 6 = 6.0; above: a has 0, b has 6
    rows = [("a", float(i)) for i in range(1, 7)] + [
        ("b", float(i)) for i in range(7, 13)
    ]
    df = spark.createDataFrame(rows, "c string, v double")
    out = {r["c"]: r for r in moods_median(df, "v", "c").collect()}
    assert out["a"]["n_above"] == 0 and out["b"]["n_above"] == 6
    # A=6, N=12 -> e_above = 3 per class; term = (0-3)^2/3+(6-3)^2/3=6
    assert out["a"]["expected_above"] == 3.0
    assert out["a"]["chi2_term"] == 6.0 and out["b"]["chi2_term"] == 6.0


def test_moods_median_degenerate_all_tied(spark):
    from reddit_etl_spark.operators.relational import moods_median

    df = spark.createDataFrame(
        [("a", 5.0)] * 3 + [("b", 5.0)] * 3, "c string, v double"
    )
    out = moods_median(df, "v", "c").collect()
    # A = 0 -> expected_above = 0 -> NULL terms
    assert all(r["chi2_term"] is None for r in out)


# -------------------------------------------------------- wasserstein


def test_wasserstein_hand_case(spark):
    from reddit_etl_spark.operators.relational import wasserstein_distance

    # a: point mass at 1.0; b: point mass at 3.5 -> W1 = 2.5
    rows = [("a", 1.0)] * 5 + [("b", 3.5)] * 7
    df = spark.createDataFrame(rows, "c string, v double")
    r = wasserstein_distance(df, "v", "c", "a").collect()[0]
    assert (r["n_a"], r["n_b"]) == (5, 7)
    assert r["wasserstein"] == 2.5


def test_wasserstein_bruteforce_parity(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import wasserstein_distance

    rng = np.random.default_rng(7)
    va = np.round(rng.normal(10, 2, 40), 2)
    vb = np.round(rng.normal(11, 3, 60), 2)
    rows = [("a", float(v)) for v in va] + [("b", float(v)) for v in vb]
    df = spark.createDataFrame(rows, "c string, v double")
    r = wasserstein_distance(df, "v", "c", "a").collect()[0]
    # brute force: integrate |F_a - F_b| over the pooled grid
    grid = np.unique(np.concatenate([va, vb]))
    fa = np.searchsorted(np.sort(va), grid, side="right") / len(va)
    fb = np.searchsorted(np.sort(vb), grid, side="right") / len(vb)
    w1 = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(grid)))
    assert abs(r["wasserstein"] - w1) < 1e-6


# ----------------------------------------------------- ansari_bradley


def _py_ansari(values, classes, a_label):
    n = len(values)
    order = sorted(range(n), key=lambda i: values[i])
    # scores with ties averaged
    scores = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and values[order[j]] == values[order[i]]:
            j += 1
        cell = [min(p + 1, n - p) for p in range(i, j)]
        avg = sum(cell) / len(cell)
        for p in range(i, j):
            scores[order[p]] = avg
        i = j
    ab = sum(s for s, c in zip(scores, classes) if c == a_label)
    na = sum(1 for c in classes if c == a_label)
    nb = n - na
    suma = sum(scores)
    sumaa = sum(s * s for s in scores)
    e = na * suma / n
    var = na * nb * (n * sumaa - suma * suma) / (n * n * (n - 1))
    z = (ab - e) / math.sqrt(var)
    return na, nb, ab, z


def test_ansari_bradley_bruteforce_parity(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import ansari_bradley

    rng = np.random.default_rng(11)
    va = np.round(rng.normal(10, 1, 30), 2)
    vb = np.round(rng.normal(10, 3, 45), 2)
    values = [float(v) for v in va] + [float(v) for v in vb]
    classes = ["a"] * 30 + ["b"] * 45
    df = spark.createDataFrame(
        list(zip(classes, values)), "c string, v double"
    )
    r = ansari_bradley(df, "v", "c", "a").collect()[0]
    na, nb, ab, z = _py_ansari(values, classes, "a")
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert abs(r["ab_stat"] - ab) < 1e-6
    assert abs(r["z"] - z) < 1e-6


# ---------------------------------------------------- mantel_haenszel


def test_mantel_haenszel_hand_case(spark):
    from reddit_etl_spark.operators.relational import mantel_haenszel

    # two strata with known tables
    tables = {"s1": (10, 5, 4, 8), "s2": (6, 2, 3, 9)}
    rows = []
    for s, (a, b, c, d) in tables.items():
        rows += [(s, True, True)] * a + [(s, True, False)] * b
        rows += [(s, False, True)] * c + [(s, False, False)] * d
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    r = mantel_haenszel(df, ["s"], "e", "o").collect()[0]
    sr = sum(a * d / (a + b + c + d) for a, b, c, d in tables.values())
    ss = sum(b * c / (a + b + c + d) for a, b, c, d in tables.values())
    suma = sum(a for a, *_ in tables.values())
    se_ = sum(
        (a + b) * (a + c) / (a + b + c + d)
        for a, b, c, d in tables.values()
    )
    sv = sum(
        (a + b) * (c + d) * (a + c) * (b + d) / ((a + b + c + d) ** 2 * (a + b + c + d - 1))
        for a, b, c, d in tables.values()
    )
    assert r["n_strata"] == 2 and r["n"] == 47
    assert abs(r["or_mh"] - sr / ss) < 1e-6
    assert abs(r["chi2_cmh"] - (suma - se_) ** 2 / sv) < 1e-6
    # RBG se
    pr = psqr = qs = 0.0
    for a, b, c, d in tables.values():
        n = a + b + c + d
        rr, s_ = a * d / n, b * c / n
        p_, q_ = (a + d) / n, (b + c) / n
        pr += p_ * rr
        psqr += p_ * s_ + q_ * rr
        qs += q_ * s_
    se_log = math.sqrt(
        pr / (2 * sr**2) + psqr / (2 * sr * ss) + qs / (2 * ss**2)
    )
    assert abs(r["se_log_or"] - se_log) < 1e-6


# --------------------------------------------------- cochran_armitage


def test_cochran_armitage_hand_case(spark):
    from reddit_etl_spark.operators.series import breusch_pagan  # noqa: F401
    from reddit_etl_spark.operators.relational import cochran_armitage

    # doses 1,2,3 with rising success rates
    cells = {1.0: (10, 2), 2.0: (10, 5), 3.0: (10, 8)}  # (n_i, r_i)
    rows = []
    for d, (ni, ri) in cells.items():
        rows += [(d, True)] * ri + [(d, False)] * (ni - ri)
    df = spark.createDataFrame(rows, "d double, y boolean")
    r = cochran_armitage(df, "d", "y").collect()[0]
    n = sum(ni for ni, _ in cells.values())
    rr = sum(ri for _, ri in cells.values())
    sd = sum(d * ni for d, (ni, _) in cells.items())
    sdr = sum(d * ri for d, (_, ri) in cells.items())
    sdd = sum(d * d * ni for d, (ni, _) in cells.items())
    t = sdr - rr * sd / n
    p = rr / n
    z = t / math.sqrt(p * (1 - p) * (sdd - sd * sd / n))
    assert (r["k"], r["n"], r["n_pos"]) == (3, 30, 15)
    assert abs(r["z_trend"] - z) < 1e-6
    assert abs(r["chi2_trend"] - z * z) < 1e-6


def test_cochran_armitage_degenerate(spark):
    from reddit_etl_spark.operators.relational import cochran_armitage

    # single dose level -> zero dose variance -> NULL z
    df = spark.createDataFrame(
        [(1.0, True), (1.0, False)], "d double, y boolean"
    )
    r = cochran_armitage(df, "d", "y").collect()[0]
    assert r["z_trend"] is None and r["k"] == 1


# ------------------------------------------------ jonckheere_terpstra


def _py_jt(values, classes, order):
    idx = {c: i for i, c in enumerate(order)}
    u = 0.0
    n = len(values)
    for x in range(n):
        for y in range(n):
            if idx[classes[x]] < idx[classes[y]]:
                if values[x] < values[y]:
                    u += 1
                elif values[x] == values[y]:
                    u += 0.5
    ni = [sum(1 for c in classes if c == g) for g in order]
    nn = n
    from collections import Counter

    tie = Counter(values)
    mean = (nn * nn - sum(v * v for v in ni)) / 4
    e1 = sum(v * (v - 1) for v in ni)
    e2 = sum(v * (v - 1) * (v - 2) for v in ni)
    e3 = sum(v * (v - 1) * (2 * v + 5) for v in ni)
    u1 = sum(t * (t - 1) for t in tie.values())
    u2 = sum(t * (t - 1) * (t - 2) for t in tie.values())
    u3 = sum(t * (t - 1) * (2 * t + 5) for t in tie.values())
    var = (
        (nn * (nn - 1) * (2 * nn + 5) - e3 - u3) / 72
        + e2 * u2 / (36 * nn * (nn - 1) * (nn - 2))
        + e1 * u1 / (8 * nn * (nn - 1))
    )
    z = (u - mean) / math.sqrt(var)
    return u, z


def test_jonckheere_bruteforce_parity(spark):
    import numpy as np

    from reddit_etl_spark.operators.relational import jonckheere_terpstra

    rng = np.random.default_rng(3)
    order = ["lo", "mid", "hi"]
    values, classes = [], []
    for i, g in enumerate(order):
        vs = np.round(rng.normal(10 + i, 2, 25), 1)
        values += [float(v) for v in vs]
        classes += [g] * 25
    df = spark.createDataFrame(
        list(zip(classes, values)), "c string, v double"
    )
    r = jonckheere_terpstra(df, "v", "c", order).collect()[0]
    u, z = _py_jt(
        [round(v * 100) for v in values], classes, order
    )
    assert r["n"] == 75 and r["k"] == 3
    assert r["u_stat"] == u
    assert abs(r["z"] - z) < 1e-6


def test_jonckheere_unknown_class_raises(spark):
    from reddit_etl_spark.operators.relational import jonckheere_terpstra

    df = spark.createDataFrame(
        [("lo", 1.0), ("??", 2.0)], "c string, v double"
    )
    with pytest.raises(Exception, match="outside class_order"):
        jonckheere_terpstra(df, "v", "c", ["lo", "hi"]).collect()


# ---------------------------------------------------------- pages / W


def test_pages_trend_perfect_order(spark):
    from reddit_etl_spark.operators.relational import pages_trend

    # 4 blocks, 3 treatments, values rise with the hypothesized
    # order in every block -> R_j = n*j, L = n * sum(j*j) = 4*14
    order = ["t1", "t2", "t3"]
    rows = [
        (b, t, float(10 * b + i))
        for b in range(1, 5)
        for i, t in enumerate(order)
    ]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    r = pages_trend(df, "b", "t", "v", order).collect()[0]
    n, k = 4, 3
    l_want = n * sum((i + 1) * (i + 1) for i in range(k))
    assert r["n_blocks"] == n and r["k"] == 3
    assert r["l_stat"] == l_want
    mean = n * k * (k + 1) ** 2 / 4
    var = n * k * k * (k + 1) * (k * k - 1) / 144
    assert abs(r["z"] - (l_want - mean) / math.sqrt(var)) < 1e-6


def test_kendalls_w_perfect_and_friedman_link(spark):
    from reddit_etl_spark.operators.relational import (
        friedman_test,
        kendalls_w,
    )

    # perfect concordance -> W = 1
    rows = [
        (b, t, float(i)) for b in range(6) for i, t in enumerate("xyz")
    ]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    r = kendalls_w(df, "b", "t", "v").collect()[0]
    assert r["w"] == 1.0
    assert r["chi2_f"] == round(6 * (3 - 1) * 1.0, 6)
    # with ties: chi2_f must equal friedman's tie-corrected chi2
    rows = [
        (b, t, float((b * 7 + i * 3) % 5)) for b in range(8)
        for i, t in enumerate("xyz")
    ]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    rw = kendalls_w(df, "b", "t", "v").collect()[0]
    rf = friedman_test(df, "b", "t", "v").collect()[0]
    assert rw["chi2_f"] == rf["chi2_f_corrected"]


# ----------------------------------------------------------- ljung_box


def test_ljung_box_bruteforce_parity(spark):
    import datetime as dt

    import numpy as np

    from reddit_etl_spark.operators.series import ljung_box

    rng = np.random.default_rng(5)
    xs = np.round(np.cumsum(rng.normal(0, 1, 40)), 3)  # autocorrelated
    d0 = dt.date(2024, 1, 1)
    rows = [
        ("g", d0 + dt.timedelta(days=i), float(x)) for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "g string, d date, v double")
    r = ljung_box(df, ["g"], "d", "v", max_lag=5).collect()[0]
    n = len(xs)
    q = 0.0
    for h in range(1, 6):
        a, b = xs[h:], xs[:-h]
        rh = round(float(np.corrcoef(a, b)[0, 1]), 6)
        q += rh * rh / (n - h)
    q *= n * (n + 2)
    assert r["n"] == n and r["lags"] == 5
    assert abs(r["q_stat"] - q) < 1e-5


def test_ljung_box_short_series_null(spark):
    import datetime as dt

    from reddit_etl_spark.operators.series import ljung_box

    d0 = dt.date(2024, 1, 1)
    rows = [("g", d0 + dt.timedelta(days=i), float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, d date, v double")
    r = ljung_box(df, ["g"], "d", "v", max_lag=5).collect()[0]
    assert r["q_stat"] is None  # n <= max_lag


# ------------------------------------------------------- breusch_pagan


def test_breusch_pagan_bruteforce_parity(spark):
    import numpy as np

    from reddit_etl_spark.operators.series import breusch_pagan

    rng = np.random.default_rng(9)
    x = np.arange(1, 41)
    y = np.round(2.0 + 0.5 * x + rng.normal(0, 1, 40) * (x / 10), 4)
    rows = [("g", int(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    r = breusch_pagan(df, ["g"], "x", "y").collect()[0]
    n = len(x)
    beta = np.sum((x - x.mean()) * (y - y.mean())) / np.sum(
        (x - x.mean()) ** 2
    )
    a = y.mean() - beta * x.mean()
    e2 = (y - a - beta * x) ** 2
    sse = float(np.sum(e2))
    sigma2 = sse / n
    sxg = float(np.sum((x - x.mean()) * (e2 - e2.mean())))
    ssx = float(np.sum((x - x.mean()) ** 2))
    lm = sxg**2 / (2 * sigma2**2 * ssx)
    assert r["n"] == n
    assert abs(r["slope"] - beta) < 1e-5
    assert abs(r["sse"] - sse) < 1e-4
    assert abs(r["bp_lm"] - lm) < 1e-4


# -------------------------------------------------------- gpd_tail_fit


def test_gpd_tail_fit_hand_case(spark):
    import numpy as np

    from reddit_etl_spark.operators.series import gpd_tail_fit

    rng = np.random.default_rng(13)
    vals = np.round(rng.exponential(5.0, 500), 3)
    rows = [("g", float(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    u = 8.0
    r = gpd_tail_fit(df, ["g"], "v", u).collect()[0]
    exc = vals[vals > u] - u
    ebar = float(np.mean(exc))
    s2 = float(np.var(exc, ddof=1))
    ratio = ebar * ebar / s2
    assert r["n_exceed"] == len(exc)
    assert abs(r["mean_excess"] - ebar) < 1e-6
    assert abs(r["xi_mom"] - 0.5 * (1 - ratio)) < 1e-6
    assert abs(r["sigma_mom"] - 0.5 * ebar * (ratio + 1)) < 1e-6


def test_gpd_no_exceedances(spark):
    from reddit_etl_spark.operators.series import gpd_tail_fit

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    assert gpd_tail_fit(df, ["g"], "v", 10.0).count() == 0


# ------------------------------------------------------------- bowker


def test_bowker_reduces_to_mcnemar_at_k2(spark):
    from reddit_etl_spark.operators.classify import bowker_test

    # b=12 (T->F), c=5 (F->T) -> B = (12-5)^2/17
    rows = (
        [("T", "T")] * 20
        + [("T", "F")] * 12
        + [("F", "T")] * 5
        + [("F", "F")] * 30
    )
    df = spark.createDataFrame(rows, "ra string, rb string")
    r = bowker_test(df, "ra", "rb").collect()[0]
    assert (r["k"], r["n"], r["n_disagree"], r["dof"]) == (2, 67, 17, 1)
    assert r["chi2_bowker"] == round((12 - 5) ** 2 / 17, 6)


def test_bowker_k3_hand_case(spark):
    from reddit_etl_spark.operators.classify import bowker_test

    cells = {
        ("a", "b"): 4,
        ("b", "a"): 1,
        ("a", "c"): 3,
        ("c", "b"): 2,
        ("a", "a"): 5,
    }
    rows = []
    for (i, j), n in cells.items():
        rows += [(i, j)] * n
    df = spark.createDataFrame(rows, "ra string, rb string")
    r = bowker_test(df, "ra", "rb").collect()[0]
    want = (4 - 1) ** 2 / 5 + (3 - 0) ** 2 / 3 + (0 - 2) ** 2 / 2
    assert r["k"] == 3 and r["dof"] == 3 and r["n_disagree"] == 10
    assert r["chi2_bowker"] == round(want, 6)


def test_bowker_no_disagreements(spark):
    from reddit_etl_spark.operators.classify import bowker_test

    df = spark.createDataFrame(
        [("a", "a"), ("b", "b")], "ra string, rb string"
    )
    r = bowker_test(df, "ra", "rb").collect()[0]
    assert r["dof"] == 0 and r["chi2_bowker"] is None


# ------------------------------------------------ shapley sampled lane


def test_shapley_sampled_converges_to_exact(spark):
    """Judge r10 stretch #7: the seeded permutation-sampling lane must
    converge to the exact 2^k sweep at small k (unbiased estimator,
    MC error O(1/sqrt(M)))."""
    import numpy as np

    from reddit_etl_spark.operators.attribution import shapley_attribution

    rng = np.random.default_rng(21)
    chans = ["email", "search", "social", "video"]
    rows = []
    for j in range(300):
        touched = [c for c in chans if rng.random() < 0.5] or ["email"]
        conv = rng.random() < 0.1 + 0.15 * len(touched)
        rows += [(j, c, bool(conv)) for c in touched]
    df = spark.createDataFrame(rows, "j long, ch string, cv boolean")
    exact = {
        r["channel"]: r["shapley_value"]
        for r in shapley_attribution(df, "j", "ch", "cv").collect()
    }
    sampled = {
        r["channel"]: r["shapley_value"]
        for r in shapley_attribution(
            df, "j", "ch", "cv", lane="sample", coalition_samples=3000
        ).collect()
    }
    assert set(sampled) == set(exact)
    for c in exact:
        assert abs(sampled[c] - exact[c]) < 0.03, (c, exact[c], sampled[c])
    # seeded determinism: same seed -> identical output
    again = {
        r["channel"]: r["shapley_value"]
        for r in shapley_attribution(
            df, "j", "ch", "cv", lane="sample", coalition_samples=3000
        ).collect()
    }
    assert again == sampled


def test_shapley_auto_lane_selection(spark):
    """auto = exact at k <= max_channels, sampled above, raise past
    max_channels_sampled — the r10 fail-fast keeps its teeth."""
    import pytest as _pytest

    from reddit_etl_spark.operators.attribution import shapley_attribution

    rows = [(j, f"c{j % 10}", j % 3 == 0) for j in range(60)]
    df = spark.createDataFrame(rows, "j long, ch string, cv boolean")
    # k = 10 > max_channels=8 -> auto takes the sampled lane
    out = shapley_attribution(
        df, "j", "ch", "cv", coalition_samples=200
    ).collect()
    assert len(out) == 10
    # exact lane still raises at k > max_channels
    with _pytest.raises(ValueError, match="max_channels"):
        shapley_attribution(df, "j", "ch", "cv", lane="exact")
    # the sampled ceiling raises too
    with _pytest.raises(ValueError, match="max_channels_sampled"):
        shapley_attribution(
            df, "j", "ch", "cv", lane="sample", max_channels_sampled=5
        )
