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
    # ROUND-9 rotation contract (judge r8 next-round #4: head drawn
    # OLDEST-FIRST so no query's most-recent driver row predates
    # r04). Head = 12 new round-9 registrations + 18 stalest
    # (r01-r03 attestations) + 4 operators touched this round + the
    # 16 alphabetically-first r04 entries. Every rotated-out entry
    # carried a green r08 row and stays oracle-checked in the tail.
    new_r9 = {
        "hhi_supplier_nations", "nelson_aalen_segments",
        "power_mde_events", "isoweek_rollup_orders",
        "clustering_coeff_nations", "ratio_estimator_lineitem",
        "ldiversity_customer_release", "kendall_tau_daily",
        "calibration_brier_events", "jsd_source_docs",
        "mmr_rerank_embeddings", "winsorized_orders",
    }
    stale_r01_r03 = {
        "asof_attribution", "curation_pipeline", "decontaminate_bloom",
        "dedup_simhash", "distinct_parts_skewfree",
        "embedding_neardup_lsh", "events_json", "funnel_conversion",
        "group_percentiles", "neardup_components", "ntile_quartiles",
        "pack_sequences", "pivot_status_by_priority",
        "retention_cohorts", "rollup_hierarchy", "similarity_topk_int8",
        "similarity_topk_ivf", "topk_global",
    }
    touched_r9 = {
        "quantile_normalize_doclen", "link_prediction_suppliers",
        "sse_changepoint_daily", "burstiness_event_types",
    }
    for q in new_r9 | stale_r01_r03 | touched_r9:
        assert q in head, q
    # r08-attested entries rotated out — still registered + oracle-
    # checked (spot sample across the r08 waves)
    for q in (
        "q01_overview", "q09_join_having", "q15_ranked_view",
        "dedup_minhash_lsh", "curation_pipeline_full",
        "tpch_q6_forecast_revenue", "tpch_q21_waiting_supplier",
        "sprt_event_quality", "image_phash_neardup",
        "cohort_ltv_curve", "sla_business_days",
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
