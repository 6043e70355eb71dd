"""Empty-input robustness: every operator must return an empty result
with the right schema, not throw (the reference's P10 guard discipline
applied across the engine)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_vecs(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<double>")


def test_exact_dedup_empty(empty_docs):
    from reddit_etl_spark.operators.dedup import exact_dedup

    out = exact_dedup(empty_docs, "doc_id", ["text"])
    assert out.columns == ["doc_id", "dup_count"]
    assert out.count() == 0


def test_ngram_jaccard_empty(empty_docs):
    from reddit_etl_spark.operators.dedup import ngram_jaccard_pairs

    assert ngram_jaccard_pairs(empty_docs, "doc_id", "text").count() == 0


def test_minhash_empty(empty_docs):
    from reddit_etl_spark.operators.dedup import minhash_lsh_pairs

    assert minhash_lsh_pairs(empty_docs, "doc_id", "text").count() == 0


def test_simhash_empty(empty_docs):
    from reddit_etl_spark.operators.dedup import simhash_pairs

    assert simhash_pairs(empty_docs, "doc_id", "text").count() == 0


def test_text_profile_empty(empty_docs):
    from reddit_etl_spark.operators.text import text_profile

    out = text_profile(empty_docs, "doc_id", "text")
    assert out.count() == 0
    assert "quality_score" in out.columns


def test_sessionize_empty(spark):
    from reddit_etl_spark.operators.sessions import session_stats

    empty = spark.createDataFrame([], "user string, ts timestamp, value double")
    assert session_stats(empty, ["user"], "ts", value_col="value").count() == 0


def test_cosine_topk_empty_queries(spark, empty_vecs):
    from reddit_etl_spark.operators.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = cosine_topk(corpus, empty_vecs, "vec_id", "embedding", "vec_id")
    assert out.count() == 0


def test_docs_with_empty_text(spark):
    # degenerate rows (empty / whitespace text) flow through dedup
    from reddit_etl_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real text here"), (4, None)],
        "doc_id long, text string",
    )
    groups = exact_dedup(df, "doc_id", ["text"]).count()
    assert groups >= 2  # ''/'   ' normalize together; NULL group separate
    minhash_lsh_pairs(df, "doc_id", "text").count()  # must not throw


def test_new_operators_empty_inputs(spark):
    """P10 discipline for the round-2 operators: empty frames flow
    through with correct (empty) results, never errors."""
    from reddit_etl_spark.operators.curation import (
        decontaminate_bloom,
        materialize_packed_text,
        weighted_sample,
    )
    from reddit_etl_spark.operators.dedup import incremental_exact_dedup
    from reddit_etl_spark.operators.relational import column_profile
    from reddit_etl_spark.operators.similarity import (
        cosine_topk_quantized,
        quantize_embeddings,
    )
    from reddit_etl_spark.operators.text import unigram_logprob_score

    empty_docs = spark.createDataFrame(
        [], "doc_id long, source string, text string, tokens long"
    )
    docs = spark.createDataFrame(
        [(1, "s", "some text", 2)],
        "doc_id long, source string, text string, tokens long",
    )

    assert weighted_sample(empty_docs, "doc_id", "tokens", k=3).count() == 0
    assert (
        decontaminate_bloom(docs, empty_docs, "doc_id", "text", n=2).count() == 0
    )
    assert decontaminate_bloom(empty_docs, docs, "doc_id", "text", n=2).count() == 0
    assert unigram_logprob_score(empty_docs, "doc_id", "text").count() == 0
    assert (
        materialize_packed_text(
            empty_docs, "doc_id", "text", "tokens", 10, "source"
        ).count()
        == 0
    )
    s, k = incremental_exact_dedup(empty_docs, None, "doc_id", ["text"])
    assert s.count() == 0 and k.count() == 0

    prof = column_profile(empty_docs, ["doc_id"]).collect()
    assert len(prof) == 1 and prof[0].n_rows == 0

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert quantize_embeddings(empty_vecs, "embedding").count() == 0
    assert (
        cosine_topk_quantized(
            empty_vecs, empty_vecs, "vec_id", "embedding", "vec_id"
        ).count()
        == 0
    )


def test_round3_operators_empty_inputs(spark, empty_docs):
    from reddit_etl_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_band_index,
    )
    from reddit_etl_spark.operators.graph import connected_components
    from reddit_etl_spark.operators.rangejoin import interval_join

    # star CC on an empty edge list
    empty_edges = spark.createDataFrame([], "a long, b long")
    for algo in ("min", "star"):
        assert connected_components(empty_edges, "a", "b", algorithm=algo).count() == 0

    # incremental minhash with empty batch / empty index
    s, idx = incremental_minhash_dedup(empty_docs, None, "doc_id", "text")
    assert s.count() == 0 and idx.count() == 0
    assert minhash_band_index(empty_docs, "doc_id", "text").count() == 0
    some = spark.createDataFrame(
        [(1, "one real document with plenty of words inside it")],
        "doc_id long, text string",
    )
    idx1 = minhash_band_index(some, "doc_id", "text")
    s2, _ = incremental_minhash_dedup(empty_docs, idx1, "doc_id", "text")
    assert s2.count() == 0

    # interval_join derived bucket over an EMPTY interval side
    pts = spark.createDataFrame(
        [("u", 1, "2025-09-01 00:05:00")],
        "k string, pid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    empty_ivs = spark.createDataFrame(
        [], "k string, iid long, s timestamp, e timestamp"
    )
    assert interval_join(pts, empty_ivs, ["k"], "ts", "s", "e").count() == 0
    left = interval_join(pts, empty_ivs, ["k"], "ts", "s", "e", how="left")
    assert left.count() == 1  # unmatched point kept with NULL interval cols


def test_round5_session_operators_empty_inputs(spark):
    from reddit_etl_spark.operators.dedup import jw_blocked_pairs
    from reddit_etl_spark.operators.graph import pagerank, triangle_counts
    from reddit_etl_spark.operators.multimodal import phash_pairs, phash_table
    from reddit_etl_spark.operators.relational import (
        item_affinity,
        linear_trend,
    )
    from reddit_etl_spark.operators.series import (
        concurrency_peaks,
        gap_fill,
        running_total,
        time_weighted_avg,
    )

    iv = spark.createDataFrame([], "s long, e long")
    assert concurrency_peaks(iv, "s", "e").count() == 0
    ords = spark.createDataFrame([], "ord long, v long")
    out = running_total(ords, "ord", "v")
    assert out.count() == 0 and "running_total" in out.columns

    ts = spark.createDataFrame([], "k string, ts timestamp, v double")
    assert time_weighted_avg(ts, ["k"], "ts", "v").count() == 0
    assert gap_fill(ts, ["k"], "ts", "v").count() == 0

    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges).count() == 0
    e2 = spark.createDataFrame([], "a long, b long")
    tri = triangle_counts(e2, "a", "b")
    assert tri.count() == 0
    assert tri.columns == ["node", "degree", "triangles", "clustering"]

    names = spark.createDataFrame([], "id string, name string")
    assert jw_blocked_pairs(names, "id", "name").count() == 0

    media = spark.createDataFrame([], "asset_id string, payload binary")
    hashes = phash_table(media)
    assert hashes.count() == 0
    assert phash_pairs(hashes).count() == 0

    baskets = spark.createDataFrame([], "o long, i string")
    aff = item_affinity(baskets, "o", "i")
    assert aff.count() == 0
    assert aff.columns == [
        "item_a", "item_b", "support", "conf_a_to_b", "conf_b_to_a", "lift",
    ]

    xy = spark.createDataFrame([], "k string, x double, y double")
    t = linear_trend(xy, ["k"], "x", "y")
    assert t.count() == 0 and t.columns == ["k", "n", "slope", "intercept", "r2"]


# ------------------------------------------------------- round-10 wave


def test_round10_stats_ops_empty(spark):
    from reddit_etl_spark.operators.relational import (
        cvm_two_sample,
        diff_in_diff,
        kruskal_wallis,
        logrank_test,
        odds_ratio,
        shrunk_rates,
    )

    e1 = spark.createDataFrame([], "g string, v double, s string")
    assert cvm_two_sample(e1, ["g"], "v", "s", "a", "b").count() == 0
    assert kruskal_wallis(e1, ["g"], "v", "s").count() == 0
    e2 = spark.createDataFrame([], "g string, t long, obs boolean, s string")
    assert logrank_test(e2, [], "t", "obs", "s", "a", "b").count() == 0
    e3 = spark.createDataFrame(
        [], "g string, t boolean, p boolean, v double"
    )
    assert diff_in_diff(e3, ["g"], "t", "p", "v").count() == 0
    e4 = spark.createDataFrame([], "g string, e boolean, y boolean")
    assert odds_ratio(e4, ["g"], "e", "y").count() == 0
    e5 = spark.createDataFrame([], "g string, ent string, k long, n long")
    assert shrunk_rates(e5, ["g"], ["ent"], "k", "n").count() == 0


def test_round10_series_ops_empty(spark):
    from reddit_etl_spark.operators.series import (
        kendall_tau,
        mann_kendall_trend,
        mase,
        pinball_loss,
        transition_entropy,
    )

    e = spark.createDataFrame([], "g string, t long, v long")
    assert mann_kendall_trend(e, ["g"], "t", "v").count() == 0
    # both kendall lanes
    ed = spark.createDataFrame([], "g string, x double, y double")
    assert kendall_tau(ed, ["g"], "x", "y", pairs="join").count() == 0
    assert kendall_tau(ed, ["g"], "x", "y", pairs="knight").count() == 0
    assert kendall_tau(ed, ["g"], "x", "y", pairs="auto").count() == 0
    e2 = spark.createDataFrame([], "g string, o long, a double, f double")
    assert mase(e2, ["g"], "o", "a", "f").count() == 0
    assert pinball_loss(e2, ["g"], "a", "f").count() == 0
    e3 = spark.createDataFrame([], "u long, ts long, eid long, s string")
    assert transition_entropy(e3, "u", ["ts", "eid"], "s").count() == 0


def test_round10_text_classify_ops_empty(spark, empty_docs):
    from reddit_etl_spark.operators.classify import (
        cohens_kappa,
        expected_calibration_error,
        gains_table,
        pr_curve,
    )
    from reddit_etl_spark.operators.curation import hellinger_drift
    from reddit_etl_spark.operators.dq import digit_uniformity, mask_profile
    from reddit_etl_spark.operators.retrieval import rbo_overlap
    from reddit_etl_spark.operators.text import (
        char_entropy,
        heaps_law,
        mattr,
        tokenizer_fertility,
        vocab_coverage,
        vocab_overlap,
    )

    assert char_entropy(empty_docs, "doc_id", "text").count() == 0
    assert mattr(empty_docs, "doc_id", "text").count() == 0
    assert heaps_law(empty_docs, "doc_id", "text").count() == 0
    d2 = empty_docs.withColumn("source", F.lit("s"))
    assert vocab_coverage(d2, ["source"], "text").count() == 0
    assert vocab_overlap(d2, "source", "text").count() == 0
    assert tokenizer_fertility(d2, ["source"], "text").count() == 0
    ek = spark.createDataFrame([], "g string, a string, b string")
    assert cohens_kappa(ek, ["g"], "a", "b").count() == 0
    es = spark.createDataFrame([], "p double, y boolean")
    assert expected_calibration_error(es, "p", "y").count() == 1  # 0-row rollup
    assert pr_curve(es, [], "p", "y").count() == 0
    eg = spark.createDataFrame([], "g string, id long, s double, y boolean")
    assert gains_table(eg, ["g"], "id", "s", "y").count() == 0
    er = spark.createDataFrame([], "g string, id long, rank long")
    assert rbo_overlap(er, er, ["g"], "id", "rank").count() == 0
    ev = spark.createDataFrame([], "g string, v double")
    assert hellinger_drift(ev, ev, "v", ["g"]).count() == 0
    assert digit_uniformity(ev, ["g"], "v").count() == 0
    assert mask_profile(ev.withColumn("m", F.lit("x")), ["g"], "m").count() == 0


# ------------------------------------------------------- round-10 wave 4


def test_roc_auc_empty(spark):
    from reddit_etl_spark.operators.classify import roc_auc

    empty = spark.createDataFrame([], "g string, s double, y boolean")
    out = roc_auc(empty, ["g"], "s", "y")
    assert out.columns == ["g", "n_pos", "n_neg", "auc", "gini"]
    assert out.count() == 0


def test_mcnemar_empty(spark):
    from reddit_etl_spark.operators.classify import mcnemar_test

    empty = spark.createDataFrame([], "g string, a boolean, b boolean")
    assert mcnemar_test(empty, ["g"], "a", "b").count() == 0


def test_decision_stump_empty(spark):
    from reddit_etl_spark.operators.classify import decision_stump

    empty = spark.createDataFrame([], "x double, y boolean")
    out = decision_stump(empty, "x", "y")
    assert out.count() == 0
    assert "gain_nats" in out.columns


def test_jarque_bera_empty(spark):
    from reddit_etl_spark.operators.series import jarque_bera

    empty = spark.createDataFrame([], "g string, v double")
    assert jarque_bera(empty, ["g"], "v").count() == 0


def test_durbin_watson_empty(spark):
    from reddit_etl_spark.operators.series import durbin_watson

    empty = spark.createDataFrame([], "g string, t long, v double")
    assert durbin_watson(empty, ["g"], "t", "v").count() == 0


def test_page_hinkley_empty(spark):
    from reddit_etl_spark.operators.series import page_hinkley

    empty = spark.createDataFrame([], "g string, t long, v double")
    assert page_hinkley(empty, ["g"], "t", "v").count() == 0


def test_theil_index_empty(spark):
    from reddit_etl_spark.operators.relational import theil_index

    empty = spark.createDataFrame([], "g string, v double")
    assert theil_index(empty, ["g"], "v").count() == 0


def test_brown_forsythe_empty(spark):
    from reddit_etl_spark.operators.relational import brown_forsythe

    empty = spark.createDataFrame([], "c string, v double")
    out = brown_forsythe(empty, "v", "c")
    # groupBy-less aggregate: one row with n=0, NULL stat is the
    # documented shape for global-form reducers (logrank precedent
    # is filtered; here n=0 row is explicit and k_classes=0)
    rows = out.collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0]["w_stat"] is None


def test_jackknife_empty(spark):
    from reddit_etl_spark.operators.relational import jackknife_groups

    empty = spark.createDataFrame([], "g string, v double")
    rows = jackknife_groups(empty, "g", "v").collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0]["se_jack"] is None


def test_chapman_empty(spark):
    from reddit_etl_spark.operators.text import vocab_capture_recapture

    empty = spark.createDataFrame([], "source string, text string")
    assert vocab_capture_recapture(empty, "source", "text").count() == 0


# ------------------------------------------------------- round-10 wave 5


def test_cohens_d_empty(spark):
    from reddit_etl_spark.operators.relational import cohens_d

    empty = spark.createDataFrame([], "g string, v double, c string")
    assert cohens_d(empty, ["g"], "v", "c", "a", "b").count() == 0


def test_friedman_empty(spark):
    from reddit_etl_spark.operators.relational import friedman_test

    empty = spark.createDataFrame([], "b long, t string, v double")
    rows = friedman_test(empty, "b", "t", "v").collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0]["chi2_f"] is None


def test_hill_empty(spark):
    from reddit_etl_spark.operators.relational import hill_tail_index

    empty = spark.createDataFrame([], "g string, v double")
    assert hill_tail_index(empty, ["g"], "v").count() == 0


def test_lorenz_empty(spark):
    from reddit_etl_spark.operators.relational import lorenz_deciles

    empty = spark.createDataFrame([], "v double")
    assert lorenz_deciles(empty, "v").count() == 0


def test_runs_test_empty(spark):
    from reddit_etl_spark.operators.series import runs_test

    empty = spark.createDataFrame([], "g string, o long, v double")
    assert runs_test(empty, ["g"], "o", "v").count() == 0


def test_grubbs_empty(spark):
    from reddit_etl_spark.operators.series import grubbs_statistic

    empty = spark.createDataFrame([], "g string, v double")
    assert grubbs_statistic(empty, ["g"], "v").count() == 0


def test_gumbel_empty(spark):
    from reddit_etl_spark.operators.series import gumbel_block_maxima

    empty = spark.createDataFrame([], "g string, b long, v double")
    assert gumbel_block_maxima(empty, ["g"], "b", "v").count() == 0


def test_imr_empty(spark):
    from reddit_etl_spark.operators.series import imr_control_chart

    empty = spark.createDataFrame([], "g string, o long, v double")
    assert imr_control_chart(empty, ["g"], "o", "v").count() == 0


def test_cochran_q_empty(spark):
    from reddit_etl_spark.operators.classify import cochran_q

    empty = spark.createDataFrame([], "g string, a boolean, b boolean")
    assert cochran_q(empty, ["g"], ["a", "b"]).count() == 0


def test_fightin_words_empty(spark):
    from reddit_etl_spark.operators.text import fightin_words

    empty = spark.createDataFrame([], "source string, text string")
    assert fightin_words(empty, "source", "text").count() == 0


# ------------------------------------------------------- round-10 wave 6


def test_ad2_empty(spark):
    from reddit_etl_spark.operators.relational import (
        anderson_darling_two_sample,
    )

    empty = spark.createDataFrame([], "v double, c string")
    rows = anderson_darling_two_sample(empty, "v", "c", "a").collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0]["a2"] is None


def test_dunn_empty(spark):
    from reddit_etl_spark.operators.relational import dunn_test

    empty = spark.createDataFrame([], "c string, v double")
    assert dunn_test(empty, "v", "c").count() == 0


def test_srm_empty(spark):
    from reddit_etl_spark.operators.relational import srm_check

    empty = spark.createDataFrame([], "arm string")
    # empty data vs a non-empty design IS a mismatch -> in-plan raise
    import pytest as _pytest

    with _pytest.raises(Exception, match="arm mismatch"):
        srm_check(empty, "arm", {"0": 1.0}).collect()


def test_poisson_two_rate_empty(spark):
    from reddit_etl_spark.operators.relational import poisson_two_rate

    empty = spark.createDataFrame([], "g string, w boolean, d long")
    assert poisson_two_rate(empty, ["g"], "w", "d").count() == 0


def test_cem_empty(spark):
    from reddit_etl_spark.operators.relational import cem_match

    empty = spark.createDataFrame([], "t boolean, s string")
    assert cem_match(empty, "t", ["s"]).count() == 0


def test_pettitt_empty(spark):
    from reddit_etl_spark.operators.series import pettitt_test

    empty = spark.createDataFrame([], "g string, o long, v double")
    assert pettitt_test(empty, ["g"], "o", "v").count() == 0


def test_ols_influence_empty(spark):
    from reddit_etl_spark.operators.series import ols_influence

    empty = spark.createDataFrame([], "g string, x long, y double")
    assert ols_influence(empty, ["g"], "x", "y").count() == 0


def test_decomposition_strength_empty(spark):
    from reddit_etl_spark.operators.series import decomposition_strength

    empty = spark.createDataFrame([], "g string, day date, v double")
    assert decomposition_strength(empty, ["g"], "day", "v").count() == 0


# ------------------------------------------------------- round-10 wave 7


def test_gopher_flags_empty(spark):
    from reddit_etl_spark.operators.curation import gopher_quality_flags

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = gopher_quality_flags(empty, "doc_id", "text")
    assert out.count() == 0 and "pass_all" in out.columns


def test_ess_empty(spark):
    from reddit_etl_spark.operators.curation import effective_sample_size

    empty = spark.createDataFrame([], "g string, w double")
    assert effective_sample_size(empty, ["g"], "w").count() == 0


def test_ngram_novelty_empty_test(spark):
    from reddit_etl_spark.operators.curation import ngram_novelty

    train = spark.createDataFrame([("a b c d",)], "text string")
    empty = spark.createDataFrame([], "text string")
    r = ngram_novelty(train, empty, "text").collect()[0]
    assert r["test_grams"] == 0 and r["novelty"] is None


def test_fleiss_empty(spark):
    from reddit_etl_spark.operators.classify import fleiss_kappa

    empty = spark.createDataFrame([], "i long, c string")
    rows = fleiss_kappa(empty, "i", "c").collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0]["fleiss_kappa"] is None


def test_qte_empty(spark):
    from reddit_etl_spark.operators.relational import (
        quantile_treatment_effect,
    )

    empty = spark.createDataFrame([], "v double, cls string")
    assert quantile_treatment_effect(
        empty, "v", "cls", "t", "c"
    ).count() == 0


def test_shapley_empty(spark):
    from reddit_etl_spark.operators.attribution import shapley_attribution

    empty = spark.createDataFrame([], "j long, ch string, cv boolean")
    out = shapley_attribution(empty, "j", "ch", "cv")
    assert out.count() == 0
    assert "shapley_value" in out.columns


# ------------------------------------------------------- round-10 wave 8


def test_pairwise_mean_tests_empty(spark):
    from reddit_etl_spark.operators.relational import pairwise_mean_tests

    empty = spark.createDataFrame([], "c string, v double")
    assert pairwise_mean_tests(empty, "v", "c", "tukey").count() == 0
    assert pairwise_mean_tests(
        empty, "v", "c", "games_howell"
    ).count() == 0


def test_welch_anova_empty(spark):
    from reddit_etl_spark.operators.relational import welch_anova

    empty = spark.createDataFrame([], "c string, v double")
    rows = welch_anova(empty, "v", "c").collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0]["w_stat"] is None


def test_bartlett_empty(spark):
    from reddit_etl_spark.operators.relational import bartlett_test

    empty = spark.createDataFrame([], "c string, v double")
    rows = bartlett_test(empty, "v", "c").collect()
    assert len(rows) <= 1
    if rows:
        assert rows[0]["chi2_stat"] is None


# ------------------------------------------------------- round-10 wave 9


def test_delta_ratio_empty(spark):
    from reddit_etl_spark.operators.relational import delta_method_ratio

    empty = spark.createDataFrame([], "g string, x double, y double")
    assert delta_method_ratio(empty, ["g"], "x", "y").count() == 0


def test_yuen_empty(spark):
    from reddit_etl_spark.operators.relational import yuen_trimmed_test

    empty = spark.createDataFrame([], "v double, c string")
    assert yuen_trimmed_test(empty, "v", "c", "a", "b").count() == 0


def test_km_summary_empty(spark):
    from reddit_etl_spark.operators.relational import km_summary

    empty = spark.createDataFrame([], "g string, t long, obs boolean")
    assert km_summary(empty, ["g"], "t", "obs").count() == 0


def test_fs_weights_empty(spark):
    from reddit_etl_spark.operators.dedup import fellegi_sunter_weights

    empty = spark.createDataFrame([], "is_match boolean, f boolean")
    rows = fellegi_sunter_weights(empty, "is_match", ["f"]).collect()
    # the melt always emits one row per field; all stats NULL-guarded
    assert len(rows) == 1
    assert rows[0]["m"] is None and rows[0]["w_agree"] is None
