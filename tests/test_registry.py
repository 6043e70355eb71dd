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
    # ROUND-12 rotation contract (judge r11 #3 + the standing rule
    # "driver head = current backlog, then oldest attestations").
    # The 19 round-11-born queries that had never held a driver
    # CORRECTNESS row through r11 (tools/attestation_backlog.py at the
    # r11 close) must ALL ride the r12 head; the remaining slots carry
    # this round's new registrations plus the stalest r05 attestations.
    backlog_r11 = {
        "ks_expfit_values", "atkinson_customer_revenue",
        "cliffs_delta_click_error", "hodges_lehmann_click_error",
        "uncertainty_status_priority", "ordinal_assoc_lines",
        "agreement_user_halves", "seasonal_mk_daily", "cox_stuart_daily",
        "dispersion_daily_counts", "brier_decomp_events",
        "youden_purchase_value", "weighted_kappa_user_value",
        "cohens_h_click_error", "biweight_value_types",
        "vocab_richness_sources", "source_cross_entropy_docs",
        "partial_corr_lineitem", "covariate_balance_arms",
    }
    assert len(backlog_r11) == 19
    assert backlog_r11 <= set(head)
    # the whole r11 head (13 wave-1 base + 37 r10-backlog promotions,
    # all driver-attested in CORRECTNESS_r11) rotated out — still
    # registered + oracle-checked (spot sample)
    for q in (
        "wilcoxon_user_halves", "jonckheere_priority_value",
        "bowker_user_shift", "jarque_bera_values", "shapley_channels",
        "fs_linkage_parts", "km_summary_segments",
        "q03_by_hour", "q08_left_join_rollup", "q13_trailing_window",
        "mann_kendall_daily", "similarity_topk_lsh", "tfidf_top_terms",
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
