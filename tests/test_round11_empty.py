"""Empty-input contracts for every round-11 operator (the
test_empty_inputs discipline): no crashes, degenerate outputs are
explicit (0 counts / NULL stats / zero rows), never garbage."""

from __future__ import annotations


def test_wave1_relational_empty(spark):
    from reddit_etl_spark.operators.relational import (
        ansari_bradley,
        cochran_armitage,
        jonckheere_terpstra,
        kendalls_w,
        mantel_haenszel,
        moods_median,
        pages_trend,
        wasserstein_distance,
        wilcoxon_signed_rank,
    )

    vc = spark.createDataFrame([], "v double, c string")
    xy = spark.createDataFrame([], "x double, y double")
    r = wilcoxon_signed_rank(xy, "x", "y").collect()[0]
    assert r["n"] == 0 and r["z"] is None
    assert moods_median(vc, "v", "c").count() == 0
    r = wasserstein_distance(vc, "v", "c", "a").collect()[0]
    assert r["wasserstein"] is None
    r = ansari_bradley(vc, "v", "c", "a").collect()[0]
    assert r["z"] is None
    eo = spark.createDataFrame([], "s string, e boolean, o boolean")
    r = mantel_haenszel(eo, ["s"], "e", "o").collect()[0]
    assert r["n_strata"] == 0 and r["or_mh"] is None
    dy = spark.createDataFrame([], "d double, y boolean")
    r = cochran_armitage(dy, "d", "y").collect()[0]
    assert r["n"] == 0 and r["z_trend"] is None
    r = jonckheere_terpstra(vc, "v", "c", ["a", "b"]).collect()[0]
    assert r["n"] == 0 and r["z"] is None
    btv = spark.createDataFrame([], "b long, t string, v double")
    r = pages_trend(btv, "b", "t", "v", ["x", "y"]).collect()[0]
    assert r["n_blocks"] == 0 and r["z"] is None
    rows = kendalls_w(btv, "b", "t", "v").collect()
    assert len(rows) == 1 and rows[0]["w"] is None


def test_wave1_series_classify_empty(spark):
    import datetime as dt  # noqa: F401

    from reddit_etl_spark.operators.classify import bowker_test
    from reddit_etl_spark.operators.series import (
        breusch_pagan,
        gpd_tail_fit,
        ljung_box,
    )

    gdv = spark.createDataFrame([], "g string, d date, v double")
    assert ljung_box(gdv, ["g"], "d", "v").count() == 0
    gxy = spark.createDataFrame([], "g string, x long, y double")
    assert breusch_pagan(gxy, ["g"], "x", "y").count() == 0
    gv = spark.createDataFrame([], "g string, v double")
    assert gpd_tail_fit(gv, ["g"], "v", 10.0).count() == 0
    ab = spark.createDataFrame([], "ra string, rb string")
    r = bowker_test(ab, "ra", "rb").collect()[0]
    assert r["n"] == 0 and r["dof"] == 0 and r["chi2_bowker"] is None


def test_wave2_empty(spark):
    from reddit_etl_spark.operators.relational import (
        agreement_summary,
        atkinson_index,
        cliffs_delta,
        hodges_lehmann_shift,
        ks_exponential_fit,
        ordinal_association,
        uncertainty_coefficient,
    )
    from reddit_etl_spark.operators.series import (
        cox_stuart_trend,
        dispersion_index,
        seasonal_mann_kendall,
    )

    vc = spark.createDataFrame([], "v double, c string")
    gv = spark.createDataFrame([], "g string, v double")
    assert ks_exponential_fit(gv, ["g"], "v").count() == 0
    assert atkinson_index(gv, ["g"], "v").count() == 0
    r = cliffs_delta(vc, "v", "c", "a").collect()[0]
    assert r["delta"] is None
    r = hodges_lehmann_shift(vc, "v", "c", "a").collect()[0]
    assert r["n_a"] == 0 and r["hl_shift"] is None
    rc = spark.createDataFrame([], "r string, c string")
    r = uncertainty_coefficient(rc, "r", "c").collect()[0]
    assert r["n"] == 0
    xy = spark.createDataFrame([], "x long, y long")
    r = ordinal_association(xy, "x", "y").collect()[0]
    assert r["n"] == 0 and r["gamma"] is None
    pxy = spark.createDataFrame([], "x double, y double")
    r = agreement_summary(pxy, "x", "y").collect()[0]
    assert r["n"] == 0 and r["ccc"] is None
    gtvs = spark.createDataFrame([], "g string, t long, v long, s long")
    assert seasonal_mann_kendall(gtvs, ["g"], "t", "v", "s").count() == 0
    gov = spark.createDataFrame([], "g string, o long, v double")
    assert cox_stuart_trend(gov, ["g"], "o", "v").count() == 0
    gx = spark.createDataFrame([], "g string, x long")
    assert dispersion_index(gx, ["g"], "x").count() == 0


def test_wave3_empty(spark):
    from reddit_etl_spark.operators.classify import (
        brier_decomposition,
        cohens_h,
        weighted_kappa,
        youden_threshold,
    )
    from reddit_etl_spark.operators.relational import biweight_location
    from reddit_etl_spark.operators.text import (
        source_cross_entropy,
        vocab_richness,
    )

    py = spark.createDataFrame([], "p double, y boolean")
    r = brier_decomposition(py, "p", "y").collect()[0]
    assert r["n"] == 0 and r["brier"] is None
    assert youden_threshold(py, "p", "y").count() == 0
    ab = spark.createDataFrame([], "a string, b string")
    r = weighted_kappa(ab, "a", "b", ["lo", "hi"]).collect()[0]
    assert r["n"] == 0 and r["kappa_w"] is None
    cy = spark.createDataFrame([], "c string, y boolean")
    r = cohens_h(cy, "c", "a", "y").collect()[0]
    assert r["n_a"] == 0 and r["cohens_h"] is None
    gv = spark.createDataFrame([], "g string, v double")
    assert biweight_location(gv, ["g"], "v").count() == 0
    st = spark.createDataFrame([], "source string, text string")
    assert vocab_richness(st, "source", "text").count() == 0
    assert source_cross_entropy(st, "source", "text").count() == 0
