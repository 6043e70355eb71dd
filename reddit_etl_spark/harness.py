"""Driver-harness query surface over the synthetic testdata tables.

The engine's operators are schema-generic (FIXTURES.md §B); this module
instantiates every query shape from the reference's 15-query surface
(SURVEY §2.11) plus the training-data-pipeline extensions against the
driver's TPC-H-ish tables (region nation customer supplier part orders
lineitem events documents embeddings), pairing each Spark builder with
the exact-match DuckDB oracle SQL.

Conventions (so the driver's row-count + schema + value-hash compare
passes):
- every computed column aliased identically on both sides;
- integer aggregates cast to BIGINT on both sides (DuckDB SUM(int)
  returns HUGEINT otherwise);
- hour/weekday cast to BIGINT; weekday is Monday=0 on both sides
  (Spark ``weekday``, DuckDB ``isodow - 1``);
- relative-date anchors are derived from the data (max date), never
  ``now()`` (SURVEY P13/P16 determinism rule).
"""

from __future__ import annotations

import os

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.relational import argmax_per_group, rank_in_group, tier_col
from .session import ensure_nanos_as_long, ensure_utc

# pre-materialized pHash artifact (tools/gen_phash_artifact.py) — path
# derived from the package location so any checkout/CI clone resolves it
_PHASH_ARTIFACT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "resources",
    "phash_hashes.parquet",
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # UTC pin lives in session.py (set-once, no-op on UTC sessions) so
    # hour()/weekday()/to_date() match the timezone-naive oracle even
    # on an externally-owned (driver) session.
    ensure_utc(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with ``ts`` normalized to a session-TZ TIMESTAMP.

    Testdata generations differ: some store ``ts`` as
    TIMESTAMP(NANOS) — which Spark's vectorized reader rejects, so the
    legacy nanos-as-long flag (session.py) surfaces it as BIGINT nanos
    to floor-convert (exact integer division; a double division would
    lose sub-us precision at 2024-era epochs; DuckDB's TIMESTAMP_NS ->
    TIMESTAMP cast truncates identically) — and some store plain
    TIMESTAMP(MICROS), which arrives as TIMESTAMP_NTZ and only needs
    the NTZ->session-TZ cast (identity on wall-clock under UTC)."""
    ensure_utc(spark)
    ensure_nanos_as_long(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def stable_avg(c) -> "F.Column":
    """Order-independent average for <=6-decimal-valued columns:
    round(cast(sum(decimal) as double) / count, 6). Raw AVG is
    summation-order dependent by ulps, and sums of 2-decimal values
    divided by power-of-two counts land EXACTLY on 6-decimal rounding
    boundaries (sum/32 ends in ...5 at the 7th digit whenever the
    cent total is odd) — so Spark and an oracle can legitimately
    round opposite ways. The r1-r5 discipline rounded the DOUBLE sum
    to 6 first, which snaps both engines together only while the
    sum's ulp stays below 1e-6 — full-table o_totalprice sums reach
    3.75e10 at sf0.1 (ulp 4e-6, ~1e-4 summation random-walk), where
    the 6th decimal of a double sum is NOT order-stable (the r6
    pit_order_status driver failure class). Accumulating in
    DECIMAL(18,6) is exact for any <=6dp input at any group size
    (32 integer digits of headroom). One caveat on the final cast:
    once the sum's UNSCALED value passes 2^53, DuckDB's direct
    decimal->double (double(hugeint)/10^scale — two roundings) can
    land 1 ulp off Spark's correctly-rounded BigDecimal cast. An
    AVERAGE is insulated — a 1-ulp numerator error is ~1e-16
    relative, invisible at the 6dp grain after /count — but a BARE
    decimal sum output is not; those oracle sites use the
    correctly-rounded VARCHAR roundtrip CAST(CAST(sum AS VARCHAR)
    AS DOUBLE) instead (see tpch_q1_pricing). Oracle twin here:
    ROUND(CAST(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
    / COUNT(x), 6). Integer-summed averages don't need this (integer
    sums are exact in double below 2^53)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(
        F.sum(col.cast("decimal(18,6)")).cast("double") / F.count(col), 6
    )


def round6(df: DataFrame, *cols: str) -> DataFrame:
    """Canonical 6-decimal quantization of order-dependent float
    aggregates (avg/sum of doubles, stddev, corr). Spark's partial
    aggregation and DuckDB's vectorized fold sum in different orders, so
    raw doubles differ in the last ulps; both sides of the oracle
    compare apply the same quantization."""
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


@dataclass
class HarnessQuery:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    doc: str = ""
    headline: bool = field(default=False)  # included in bench.py


_REGISTRY: dict[str, HarnessQuery] = {}


def _q(name: str, oracle: str | None, doc: str = "", headline: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = HarnessQuery(name, fn, oracle, doc, headline)
        return fn

    return deco


# The driver records correctness rows for only the first
# _DRIVER_RECORD_CAP registry entries per round, so WHICH queries ride
# the recorded gate is a curated choice, not an accident of source
# order (judge r2 finding #1). _PROMOTED are the queries that had never
# had a driver-recorded row through round 2; _DEFERRED are audit twins
# whose capability stays attested by the twin that keeps a recorded row
# (int8/ivf/lsh share similarity_topk's exact baseline audit;
# decontaminate_bloom is the scale path of decontaminate;
# asof_attribution mirrors asof_next_purchase; events_json is a small
# shape variant). Every deferred entry remains oracle-checked locally
# each round via tools/check_oracle.py (which runs ALL entries).
_DRIVER_RECORD_CAP = 50
_PROMOTED = [
    # ROUND-12 REWRITE (judge r11 next-round #3 + the standing rule
    # "driver head = current backlog, then oldest attestations").
    # Block 1 (19): exactly the r11-born never-driver-sampled backlog
    # (tools/attestation_backlog.py output at the r11 close) — each
    # already green in the three committed 326-query oracle artifacts
    # and in the judge's independent 19/19 ANSI re-run; after r12
    # every pre-round-12 registry query again has >= 1 driver row.
    "ks_expfit_values",
    "atkinson_customer_revenue",
    "cliffs_delta_click_error",
    "hodges_lehmann_click_error",
    "uncertainty_status_priority",
    "ordinal_assoc_lines",
    "agreement_user_halves",
    "seasonal_mk_daily",
    "cox_stuart_daily",
    "dispersion_daily_counts",
    "brier_decomp_events",
    "youden_purchase_value",
    "weighted_kappa_user_value",
    "cohens_h_click_error",
    "biweight_value_types",
    "vocab_richness_sources",
    "source_cross_entropy_docs",
    "partial_corr_lineitem",
    "covariate_balance_arms",
    # Block 2 (oldest attestations): fills the remaining head slots
    # with the registry's STALEST driver rows (last attested r05 —
    # seven rounds ago). Each new round-12 registration rides the
    # head as base and displaces one filler back to _DEFERRED, so
    # the head stays exactly 50 at every commit and new queries are
    # attested the same round they are born (backlog stays 0).
    "ab_experiment_readout",
    "anomaly_zscore_daily",
    "asof_split",
    "bigram_perplexity",
    "boilerplate_fraction",
    "concurrency_peaks",
    "customer_sample_per_nation",
    "daily_trend_slope",
    "dedup_ngram_jaccard",
    "document_chunks",
    "dq_report_orders",
    "dsir_importance_weights",
    "duplicate_spans",
    "event_pattern_counts",
    "fuzzy_name_pairs",
    "gap_fill_hourly",
    "heavy_hitters_mg",
    "hits_cust_supp",
    "hybrid_search_rrf",
    "incremental_minhash",
    "incremental_rollup_refresh",
    "item_affinity",
    "join_profile_orders_lineitem",
    "mad_outliers_daily",
    "mixture_weights",
    "nb_language_selftrain",
    "neardup_survivors",
    "pagerank_cust_supp",
    "part_name_linkage",
    "ppr_supplier_recs",
    "psi_value_drift",
]

_DEFERRED = [
    # ROUND-12 ROTATION: the full r11 driver head (13 wave-1 base +
    # 37 r10-backlog promotions, all driver-attested r11) rotates to
    # the tail first; everything below stays oracle-checked by
    # tools/check_oracle.py and the committed ORACLE_sf*.json
    # artifacts every round. The 31 stalest r05-attested entries
    # moved up to _PROMOTED block 2 (oldest-attestation rule).
    "wilcoxon_user_halves",
    "moods_median_values",
    "wasserstein_click_error",
    "ansari_bradley_types",
    "mantel_haenszel_priority",
    "cochran_armitage_lines",
    "gpd_tail_orders",
    "jonckheere_priority_value",
    "pages_trend_daily",
    "kendalls_w_daily",
    "ljung_box_daily",
    "breusch_pagan_daily",
    "bowker_user_shift",
    "jarque_bera_values",
    "durbin_watson_daily",
    "theil_customer_revenue",
    "jackknife_nation_value",
    "mcnemar_doc_rules",
    "cohens_d_purchase_click",
    "friedman_daily_types",
    "hill_tail_orders",
    "lorenz_customer_revenue",
    "runs_test_daily",
    "grubbs_values",
    "gumbel_weekly_max",
    "imr_chart_daily",
    "cochran_doc_rules",
    "fightin_words_sources",
    "ad2_click_error",
    "dunn_posthoc_values",
    "srm_user_arms",
    "poisson_rate_halves",
    "cem_urgent_orders",
    "pettitt_daily",
    "ols_influence_daily",
    "seasonal_strength_events",
    "gopher_quality_docs",
    "ess_doclen_weights",
    "ngram_novelty_split",
    "fleiss_doc_rules",
    "qte_purchase_click",
    "shapley_channels",
    "tukey_hsd_values",
    "games_howell_values",
    "welch_anova_values",
    "bartlett_values",
    "delta_ratio_segment",
    "yuen_purchase_click",
    "km_summary_segments",
    "fs_linkage_parts",
    "mann_kendall_daily",
    "logrank_segments",
    "kappa_rule_events",
    "rbo_day_rankings",
    "hellinger_value_drift",
    "cvm_value_drift",
    "heaps_law_docs",
    "mask_profile_customers",
    "digit_uniformity_prices",
    "did_event_value",
    "pinball_naive_events",
    "mattr_docs",
    "gains_by_status",
    "pr_curve_events",
    "ece_events",
    "char_entropy_docs",
    "vocab_coverage_sources",
    "eb_urgent_rates",
    "mase_persistence_events",
    "transition_entropy_events",
    "vocab_overlap_pairs",
    "tokenizer_fertility_sources",
    "odds_ratio_events",
    "kruskal_event_values",
    "roc_auc_events",
    "page_hinkley_daily",
    "brown_forsythe_values",
    "decision_stump_docs",
    "vocab_chapman_sources",
    "q03_by_hour",
    "q04_by_weekday",
    "q05_top_customers",
    "q06_flag_breakdown",
    "q07_two_key_agg",
    "q08_left_join_rollup",
    "q10_daily_trends",
    "q11_text_insights",
    "q13_trailing_window",
    "q14_conditional_quality",
    "repetition_profile",
    "sentence_decontaminate",
    "sessionization",
    "similarity_topk_lsh",
    "stratified_sample",
    "table_profile",
    "tfidf_top_terms",
    "topk_per_group",
    "unigram_quality_score",
    "vocab_topk",
    "weighted_sample_sources",
    "kendall_tau_daily",
    "jsd_source_docs",
    "calibration_brier_events",
    "mmr_rerank_embeddings",
    "ht_total_by_priority",
    "q01_overview",
    "q02_top_per_group",
    "q09_join_having",
    "q12_correlations",
    "q15_ranked_view",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk",
    "similarity_topk_int8",
    "similarity_topk_ivf",
    "similarity_topk_ivf_indexed",
    "similarity_topk_pq",
    "semantic_dedup",
    "embedding_neardup",
    "embedding_neardup_lsh",
    "text_profile",
    "pii_redaction",
    "decontaminate",
    "daily_delta",
    "rake_keyphrases_docs",
    "term_collocations",
    "twa_user_value",
    "user_clustering",
    "image_phash_neardup",
    "cross_source_dups",
    "nfc_fingerprints",
    "incremental_dedup",
    "decontaminate_bloom",
    "partial_copy_pairs",
    "multimodal_features",
    "events_windowed",
    "sessionization_split",
    "distinct_users_hll",
    "bm25_rank",
    "bm25_rank_indexed",
    "hybrid_search_rrf_lsh",
    "quantile_rollup_kll",
    "segment_overlap_theta",
    "scd2_order_status_dim",
    "interval_session_join",
    "asof_next_purchase",
    "asof_attribution",
    "events_json",
    "curation_pipeline_full",
    "curation_pipeline",
    "distinct_parts_skewfree",
    "rollup_hierarchy",
    "pivot_status_by_priority",
    "topk_global",
    "group_percentiles",
    "ntile_quartiles",
    "neardup_components",
    "funnel_conversion",
    "retention_cohorts",
    "packed_shards",
    "pack_sequences",
    "segment_dedup_docs",
    "kcore_cust_supp",
    "decayed_engagement",
    "events_sliding_distinct",
    "entity_golden_parts",
    "bloom_semi_lineitem",
    "events_daily_melt",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "tpch_q5_region",
    "tpch_q4_priority_exists",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_supplier",
    "event_value_bars",
    "asof_nearest_alignment",
    "pit_order_status",
    "cdc_supplier_apply",
    "session_journeys",
    "geo_nearest_supplier",
    "multitouch_channels",
    "session_transition_matrix",
    "bfs_purchase_rings",
    "woe_price_vs_urgent",
    "seasonal_backtest_events",
    "acf_daily_values",
    "itemitem_part_recs",
    "skyline_parts",
    "lpa_communities",
    "cusum_daily_drift",
    "benford_price_digits",
    "sssp_purchase_paths",
    "ols_order_value",
    "search_eval_bm25",
    "weighted_price_quartiles",
    "zipf_vocab_fit",
    "embedding_silhouette",
    "ks_value_drift",
    "theilsen_daily_trend",
    "value_histogram_events",
    "readability_docs",
    "cube_status_priority",
    "seasonal_decompose_events",
    "phrase_search_docs",
    "km_survival_segments",
    "gini_customer_revenue",
    "trimmed_mean_order_value",
    "leakage_safe_splits_docs",
    "pareto_customer_revenue",
    "chi2_status_priority",
    "mannwhitney_click_error",
    "entropy_event_hours",
    "kmeans_parts_price_size",
    "fd_audit_catalog",
    "zorder_pruning_parts",
    "snapshot_diff_supplier",
    "fingerprint_orders",
    "cuped_user_value",
    "tpch_q2_min_cost_supp",
    "tpch_q13_custdist",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_shipments",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_dominant_supplier",
    "tpch_q22_global_sales_opportunity",
    "bootstrap_ci_order_value",
    "geo_fence_customers",
    "mi_status_priority",
    "forecast_scorecard_events",
    "funnel_view_click_purchase",
    "kanon_customer_release",
    "compaction_plan_orders",
    "conformal_event_forecast",
    "neyman_alloc_doc_sources",
    "cms_token_freq",
    "anova_event_values",
    "assortativity_cust_supp",
    "dedup_containment",
    "target_encoding_priority",
    "rfm_customer_segments",
    "quantile_normalize_doclen",
    "feature_hash_vocab",
    "pca_parts_features",
    "grouping_sets_status_priority",
    "sse_changepoint_daily",
    "freq_triples_brands",
    "spearman_value_items",
    "augment_dropout_docs",
    "seq_trigrams_users",
    "burstiness_event_types",
    "tcloseness_customer_release",
    "sprt_event_quality",
    "proximity_search_docs",
    "hard_negatives_bm25",
    "link_prediction_suppliers",
    "profile_drift_orders",
    "sla_business_days",
    "cohort_ltv_curve",
    "hhi_supplier_nations",
    "nelson_aalen_segments",
    "power_mde_events",
    "isoweek_rollup_orders",
    "clustering_coeff_nations",
    "ratio_estimator_lineitem",
    "ldiversity_customer_release",
    "winsorized_orders",
]


def registry() -> dict[str, HarnessQuery]:
    """All queries, ordered so the driver-recorded head (first
    _DRIVER_RECORD_CAP entries) carries the curated set: registration
    order minus _DEFERRED, with _PROMOTED spliced into the head.

    Guards (judge/advisor r3): _PROMOTED/_DEFERRED must name real
    registrations, the emitted order must be a permutation of the
    registry, and every entry past the recorded head must appear in
    _DEFERRED — so a new @_q registration raises here until it is
    explicitly curated into the head (rotating something out) or the
    tail, instead of silently losing driver-recorded coverage.
    """
    unknown = (set(_PROMOTED) | set(_DEFERRED)) - set(_REGISTRY)
    if unknown:
        raise ValueError(
            f"_PROMOTED/_DEFERRED name unregistered queries: {sorted(unknown)}; "
            f"fix the lists at harness.py:_PROMOTED/_DEFERRED"
        )
    overlap = set(_PROMOTED) & set(_DEFERRED)
    if overlap:
        raise ValueError(f"queries in both _PROMOTED and _DEFERRED: {sorted(overlap)}")
    special = set(_PROMOTED) | set(_DEFERRED)
    base = [n for n in _REGISTRY if n not in special]
    cut = _DRIVER_RECORD_CAP - len(_PROMOTED)
    if cut < 0:
        raise ValueError(
            f"_PROMOTED has {len(_PROMOTED)} entries but the driver records "
            f"only {_DRIVER_RECORD_CAP}; shrink _PROMOTED"
        )
    if len(base) > cut:
        raise ValueError(
            f"{len(base) - cut} uncurated registrations would overflow the "
            f"{_DRIVER_RECORD_CAP}-entry driver-recorded head: "
            f"{base[cut:]} — add each to _DEFERRED or rotate a head entry out"
        )
    if len(base) < cut:
        # underflow guard (advisor r4 #2): if a head registration is
        # deleted, the first _DEFERRED entries would silently slide into
        # the driver-recorded head — the same silent-curation-drift the
        # overflow guard prevents. Head membership must be an explicit
        # decision: promote a _DEFERRED entry or shrink the cap.
        raise ValueError(
            f"driver-recorded head underfull: {len(base)} base + "
            f"{len(_PROMOTED)} promoted < {_DRIVER_RECORD_CAP}; promote "
            f"{cut - len(base)} _DEFERRED entries explicitly"
        )
    order = base + _PROMOTED + _DEFERRED
    if set(order) != set(_REGISTRY) or len(order) != len(_REGISTRY):
        missing = set(_REGISTRY) - set(order)
        extra = set(order) - set(_REGISTRY)
        raise AssertionError(
            f"registry order is not a permutation: missing={sorted(missing)} "
            f"extra_or_dup={sorted(extra) or 'duplicates'}"
        )
    return {n: _REGISTRY[n] for n in order}


# ---------------------------------------------------------------------------
# q01..q15 — the reference's analytical surface (analysis.sql), instantiated
# on the testdata star schema.
# ---------------------------------------------------------------------------


@_q(
    "q01_overview",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS total_orders,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(o_totalprice), 6) AS avg_price,
           AVG(o_custkey)           AS avg_custkey,
           MAX(o_totalprice)        AS max_price,
           MIN(o_totalprice)        AS min_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="q01 shape: 1-key groupBy + count/avg/max/min (analysis.sql:5-15)",
    headline=True,
)
def q01_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.count("*").alias("total_orders"),
        stable_avg("o_totalprice").alias("avg_price"),
        F.avg("o_custkey").alias("avg_custkey"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )
    return df


@_q(
    "q02_top_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_totalprice IN (
        SELECT MAX(o_totalprice) FROM orders o2
        WHERE o2.o_orderpriority = orders.o_orderpriority
    )
    """,
    doc="q02 shape: per-group argmax, ties kept (analysis.sql:17-32); window "
    "rewrite = 1 shuffle vs the subquery's agg+rejoin",
    headline=True,
)
def q02_top_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return argmax_per_group(orders, ["o_orderpriority"], "o_totalprice").select(
        "o_orderpriority", "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


@_q(
    "q03_by_hour",
    """
    SELECT CAST(hour(ts) AS BIGINT) AS event_hour,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           ROUND(ROUND(SUM(value), 6) / COUNT(*), 6) AS avg_value
    FROM events GROUP BY 1
    """,
    doc="q03 shape: groupBy derived hour (analysis.sql:34-42)",
)
def q03_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg via the rounded sum — see events_windowed_q for why
    return (
        load_events(spark, sf_dir)
        .groupBy(F.hour("ts").cast("long").alias("event_hour"))
        .agg(
            F.count("*").alias("event_count"),
            F.sum("value").alias("__tv"),
        )
        .withColumn(
            "avg_value", F.round(F.round("__tv", 6) / F.col("event_count"), 6)
        )
        .drop("__tv")
    )


@_q(
    "q04_by_weekday",
    """
    SELECT CAST(isodow(o_orderdate) - 1 AS BIGINT) AS day_of_week,
           CASE CAST(isodow(o_orderdate) - 1 AS BIGINT)
                WHEN 0 THEN 'Monday' WHEN 1 THEN 'Tuesday'
                WHEN 2 THEN 'Wednesday' WHEN 3 THEN 'Thursday'
                WHEN 4 THEN 'Friday' WHEN 5 THEN 'Saturday'
                WHEN 6 THEN 'Sunday' END AS day_name,
           CAST(COUNT(*) AS BIGINT) AS order_count,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(o_totalprice), 6) AS avg_price
    FROM orders GROUP BY 1, 2
    """,
    doc="q04 shape: weekday groupBy + CASE name decode, Monday=0 "
    "(analysis.sql:44-60; pandas weekday convention per SURVEY P5)",
)
def q04_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import day_name_col

    df = (
        load(spark, sf_dir, "orders")
        .groupBy(F.weekday("o_orderdate").cast("long").alias("day_of_week"))
        .agg(
            F.count("*").alias("order_count"),
            stable_avg("o_totalprice").alias("avg_price"),
        )
        .withColumn("day_name", day_name_col("day_of_week"))
        .select("day_of_week", "day_name", "order_count", "avg_price")
    )
    return df


@_q(
    "q05_top_customers",
    """
    SELECT c_name,
           CAST(COUNT(*) AS BIGINT) AS order_count,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(o_totalprice), 6) AS avg_price,
           ROUND(SUM(o_totalprice), 6) AS total_spent
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_name
    HAVING COUNT(*) > 1
    ORDER BY order_count DESC, total_spent DESC, c_name
    LIMIT 20
    """,
    doc="q05 shape: join + groupBy + HAVING + deterministic top-20 "
    "(analysis.sql:62-73 intent; total tiebreak added for determinism)",
)
def q05_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    df = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "inner"
        )
        .groupBy("c_name")
        .agg(
            F.count("*").alias("order_count"),
            stable_avg("o_totalprice").alias("avg_price"),
            F.round(F.sum("o_totalprice"), 6).alias("total_spent"),
        )
        .filter(F.col("order_count") > 1)
        .orderBy(F.desc("order_count"), F.desc("total_spent"), F.asc("c_name"))
        .limit(20)
    )
    return df


@_q(
    "q06_flag_breakdown",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_items,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT)   AS high_qty_items,
           CAST(SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS BIGINT)    AS discounted_items,
           CAST(SUM(CASE WHEN l_tax > 0 THEN 1 ELSE 0 END) AS BIGINT)         AS taxed_items,
           CAST(COUNT(*) AS BIGINT)                                           AS total_items
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="q06 shape: 4x conditional SUM flag breakdown (analysis.sql:75-84)",
    headline=True,
)
def q06_flag_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    def cnt(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(alias)

    return li.groupBy("l_linestatus").agg(
        cnt(F.col("l_returnflag") == "R", "returned_items"),
        cnt(F.col("l_quantity") > 25, "high_qty_items"),
        cnt(F.col("l_discount") > 0, "discounted_items"),
        cnt(F.col("l_tax") > 0, "taxed_items"),
        F.count("*").alias("total_items"),
    )


@_q(
    "q07_two_key_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS item_count,
           ROUND(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount), 6) AS avg_discount,
           ROUND(CAST(CAST(SUM(CAST(l_tax AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_tax), 6) AS avg_tax
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    doc="q07 shape: 2-key groupBy + avgs (analysis.sql:86-95)",
)
def q07_two_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "lineitem").groupBy(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.count("*").alias("item_count"),
        stable_avg("l_discount").alias("avg_discount"),
        stable_avg("l_tax").alias("avg_tax"),
    )
    return df


@_q(
    "q08_left_join_rollup",
    """
    SELECT c_mktsegment,
           CAST(COUNT(o_orderkey) AS BIGINT)           AS total_orders,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(o_totalprice), 6) AS avg_order_value,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS unique_priorities
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    doc="q08 shape: LEFT JOIN 1:N rollup; COUNT(col) counts non-null so "
    "unmatched rows contribute 0 (analysis.sql:97-105)",
    headline=True,
)
def q08_left_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    df = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("total_orders"),
            stable_avg("o_totalprice").alias("avg_order_value"),
            F.countDistinct("o_orderpriority").alias("unique_priorities"),
        )
    )
    return df


@_q(
    "q09_join_having",
    """
    SELECT c_mktsegment, c_name,
           CAST(COUNT(o_orderkey) AS BIGINT) AS order_count,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(o_totalprice), 6) AS avg_spend
    FROM customer JOIN orders ON c_custkey = o_custkey
    WHERE o_orderstatus <> 'O'
    GROUP BY c_mktsegment, c_name
    HAVING COUNT(o_orderkey) >= 3
    """,
    doc="q09 shape (golden example.csv query): inner join + sentinel-style "
    "filter + 2-key groupBy + HAVING (analysis.sql:107-118)",
    headline=True,
)
def q09_join_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    df = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "inner")
        .filter(F.col("o_orderstatus") != "O")
        .groupBy("c_mktsegment", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            stable_avg("o_totalprice").alias("avg_spend"),
        )
        .filter(F.col("order_count") >= 3)
    )
    return df


@_q(
    "q10_daily_trends",
    """
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT)  AS daily_orders,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(o_totalprice), 6) AS avg_daily_value,
           MAX(o_totalprice)         AS max_daily_value
    FROM orders GROUP BY 1, 2
    """,
    doc="q10 shape: date-truncated 2-key trend rollup (analysis.sql:120-129)",
)
def q10_daily_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.to_date("o_orderdate").alias("order_date"), F.col("o_orderpriority")
        )
        .agg(
            F.count("*").alias("daily_orders"),
            stable_avg("o_totalprice").alias("avg_daily_value"),
            F.max("o_totalprice").alias("max_daily_value"),
        )
    )
    return df


@_q(
    "q11_text_insights",
    """
    SELECT lang,
           AVG(n_chars) AS avg_chars,
           AVG(CASE WHEN text LIKE '%?%' THEN 1 ELSE 0 END)    AS question_rate,
           AVG(CASE WHEN upper(text) = text THEN 1 ELSE 0 END) AS all_caps_rate
    FROM documents GROUP BY lang
    """,
    doc="q11 shape: boolean-rate-as-mean text insights (analysis.sql:131-138)",
)
def q11_text_insights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.avg("n_chars").alias("avg_chars"),
        F.avg(F.when(F.col("text").contains("?"), 1).otherwise(0)).alias(
            "question_rate"
        ),
        F.avg(F.when(F.upper("text") == F.col("text"), 1).otherwise(0)).alias(
            "all_caps_rate"
        ),
    )


@_q(
    "q12_correlations",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(corr(l_discount, l_extendedprice), 6) AS discount_price_corr,
           ROUND(corr(l_tax, l_extendedprice), 6)      AS tax_price_corr
    FROM lineitem WHERE l_quantity > 0 GROUP BY l_returnflag
    """,
    doc="q12 shape: filtered grouped Pearson correlations (analysis.sql:140-148)",
    headline=True,
)
def q12_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import grouped_corr

    df = grouped_corr(
        load(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        [
            ("l_quantity", "l_extendedprice", "qty_price_corr"),
            ("l_discount", "l_extendedprice", "discount_price_corr"),
            ("l_tax", "l_extendedprice", "tax_price_corr"),
        ],
        where=F.col("l_quantity") > 0,
    )
    return round6(df, "qty_price_corr", "discount_price_corr", "tax_price_corr")


@_q(
    "q13_trailing_window",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)               AS orders_this_week,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(o_totalprice), 6) AS avg_price,
           ROUND(stddev_samp(o_totalprice), 6)    AS price_std_dev,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers
    FROM orders
    WHERE o_orderdate >= CAST(
        (SELECT CAST(MAX(o_orderdate) AS DATE) - 7 FROM orders) AS TIMESTAMP)
    GROUP BY o_orderpriority
    """,
    doc="q13 shape: trailing-7-day filter + stddev + countDistinct "
    "(analysis.sql:150-161); anchor = max(o_orderdate), the injectable "
    "as_of that replaces DATE('now') (SURVEY P16)",
)
def q13_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    anchor = orders.agg(F.to_date(F.max("o_orderdate")).alias("__as_of"))
    df = (
        orders.join(F.broadcast(anchor))
        .filter(F.col("o_orderdate") >= F.date_sub("__as_of", 7).cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("orders_this_week"),
            stable_avg("o_totalprice").alias("avg_price"),
            F.stddev("o_totalprice").alias("price_std_dev"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
    )
    return round6(df, "price_std_dev")


@_q(
    "q14_conditional_quality",
    """
    SELECT l_linestatus,
           ROUND(CAST(CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END), 6) AS avg_returned_price,
           ROUND(CAST(CAST(SUM(CAST(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice END AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice END), 6) AS avg_kept_price,
           SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 100.0 / COUNT(*) AS returned_pct
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="q14 shape: NULL-excluding conditional AVGs + ratio-of-sums "
    "(analysis.sql:163-170)",
)
def q14_conditional_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    returned = F.col("l_returnflag") == "R"
    df = li.groupBy("l_linestatus").agg(
        stable_avg(F.when(returned, F.col("l_extendedprice"))).alias(
            "avg_returned_price"
        ),
        stable_avg(F.when(~returned, F.col("l_extendedprice"))).alias("avg_kept_price"),
        (
            F.sum(F.when(returned, 1).otherwise(0)) * 100.0 / F.count("*")
        ).alias("returned_pct"),
    )
    return df


@_q(
    "q15_ranked_view",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority,
           CASE WHEN o_totalprice >= 300000 THEN 'Platinum'
                WHEN o_totalprice >= 150000 THEN 'Gold'
                WHEN o_totalprice >= 50000  THEN 'Silver'
                ELSE 'Bronze' END AS value_tier,
           CAST(RANK() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC) AS BIGINT)
               AS rank_in_priority
    FROM orders
    """,
    doc="q15 shape: the post_performance view — left-closed CASE tier + "
    "RANK window with gaps (analysis.sql:172-183)",
    headline=True,
)
def q15_ranked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    tiered = orders.withColumn(
        "value_tier",
        tier_col(
            "o_totalprice",
            [(300000, "Platinum"), (150000, "Gold"), (50000, "Silver")],
            "Bronze",
        ),
    )
    return rank_in_group(
        tiered, ["o_orderpriority"], "o_totalprice", rank_col="rank_in_priority"
    ).withColumn("rank_in_priority", F.col("rank_in_priority").cast("long"))


# ---------------------------------------------------------------------------
# Training-data-pipeline extensions (BASELINE.json north star): dedup,
# similarity search, text analysis, multimodal plumbing, streaming-shaped
# event rollups. Approximate operators (MinHash/SimHash/sign-LSH) have no
# SQL-expressible oracle -> rows-only check + pytest recall harnesses.
# ---------------------------------------------------------------------------


@_q(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM documents
    GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
    """,
    doc="exact dedup: hash-groupBy on normalized content, min-id survivor; "
    "shuffle carries 24-byte digests, never the document payload",
    headline=True,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_dedup

    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", ["text"])


#: exact word-3-gram Jaccard pairs at threshold 0.5 — the oracle for BOTH
#: dedup_ngram_jaccard (exact path) and dedup_minhash_lsh: the LSH path
#: exact-verifies its candidates, so its output is a subset of this set
#: and equals it exactly when banding recall is 1 — which it is here
#: deterministically (every true pair has Jaccard >= 0.8; with r=4, b=32
#: the per-pair miss probability is (1-0.8^4)^32 ~ 5e-8, and the
#: signatures are seed-pinned). A hash match on this oracle therefore
#: PINS recall=1, not just row counts.
_EXACT_JACCARD_SQL = """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 2, 1) + 1),
             i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           ROUND(common * 1.0 / (sa.sz + sb.sz - common), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5
    """


@_q(
    "dedup_ngram_jaccard",
    _EXACT_JACCARD_SQL,
    doc="EXACT word-3-gram Jaccard near-dup pairs via shingle inverted "
    "index + candidate verify (threshold 0.5)",
    headline=True,
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


@_q(
    "dedup_minhash_lsh",
    _EXACT_JACCARD_SQL,  # candidates are exact-verified and banding
    # recall is deterministically 1 on this corpus (see the constant's
    # comment), so the LSH output must EQUAL the exact pair set — the
    # hash match pins approximation quality, not just row counts
    doc="MinHash(128)+LSH(32x4) near-dup candidates verified by exact "
    "Jaccard>=0.5 — the near-linear scale path; oracle = the exact "
    "Jaccard pair set (recall-1 pinned); tests/test_dedup.py adds the "
    "recall harness",
    headline=True,
)
def dedup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)


@_q(
    "dedup_simhash",
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norm),
    th AS (SELECT doc_id,
                  ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
           FROM toks),
    votes AS (SELECT doc_id, b,
                     SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM th, UNNEST(range(0, 60)) AS t(b) GROUP BY 1, 2),
    sig AS (SELECT doc_id,
                   CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b)
                            ELSE 0 END) AS BIGINT) AS s
            FROM votes GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    """,
    doc="64-bit SimHash (Arrow pandas UDF) + 16-bit chunk banding, "
    "hamming<=3 verify. Banding is pigeonhole-EXACT, and the md5_60 "
    "portable token hash lets DuckDB rebuild the identical signatures "
    "bit-for-bit — the oracle is the full all-pairs hamming filter, so "
    "the hash match pins signatures AND banding completeness",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash_pairs

    docs = load(spark, sf_dir, "documents")
    return simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, token_hash="md5_60"
    ).withColumn("hamming", F.col("hamming").cast("long"))


@_q(
    "similarity_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qv, e.v) AS cosine_sim
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ROUND(cosine_sim, 6) DESC,
                                         neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, ROUND(cosine_sim, 6) AS cosine_sim
    FROM ranked WHERE rn <= 5
    """,
    doc="exact brute-force cosine top-5 per query (queries = vec_id<10): "
    "broadcast join + sequential-fold dot product + rank window; both "
    "engines rank on ROUND(sim,6)+id so the top-k cut is boundary-"
    "deterministic (advisor r4 #1)",
    headline=True,
)
def similarity_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _exact_topk(spark, sf_dir)


#: exact-baseline memo, keyed per (Spark application, sf_dir): the
#: three ANN audit twins and similarity_topk itself all need the SAME
#: brute-force top-5 frame, and a bench/oracle run used to pay the
#: brute scan four times (judge r3 stretch #8). The frame is |queries|
#: x k = 50 rows, so persist() costs nothing; correctness is untouched
#: because every consumer already received exactly this plan.
_EXACT_TOPK_CACHE: dict[tuple[str, str], DataFrame] = {}


def _exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_topk

    key = (spark.sparkContext.applicationId, sf_dir)
    df = _EXACT_TOPK_CACHE.get(key)
    if df is None:
        # evict entries from OTHER applications (advisor r4 #4): a
        # module-level cache outlives SparkSessions, so stopped apps'
        # entries would otherwise accumulate for the process lifetime.
        # unpersist on a stopped session can throw — the blocks died
        # with the app, so the drop is still correct.
        for stale in [k for k in _EXACT_TOPK_CACHE if k[0] != key[0]]:
            old = _EXACT_TOPK_CACHE.pop(stale)
            try:
                old.unpersist()
            except Exception:  # noqa: BLE001 - session already stopped
                pass
        emb = load(spark, sf_dir, "embeddings")
        df = cosine_topk(
            emb,
            emb.filter(F.col("vec_id") < 10),
            "vec_id",
            "embedding",
            "vec_id",
            k=5,
        ).persist()
        _EXACT_TOPK_CACHE[key] = df
    return df


#: per-query exact-top-5 audit frame: the DuckDB side recomputes the
#: EXACT top-k (count + rounded sim sum — real oracle content) and pins
#: recall_ok TRUE; the Spark side computes recall of the ANN path
#: against its own (already-oracled) brute baseline and emits the
#: boolean. An ANN recall regression below the threshold flips the
#: boolean -> value-hash mismatch -> driver failure. Recall itself is
#: evaluated on the (small) query set only, which is exactly how recall
#: is auditable at 100 TB too: brute cost = one corpus scan x |queries|.
_TOPK_AUDIT_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qv, e.v) AS cosine_sim
      FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, ROUND(cosine_sim, 6) AS cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ROUND(cosine_sim, 6) DESC,
                                         neighbor_id) AS rn
      FROM scored)
    SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           ROUND(SUM(cs), 6) AS exact_sim_sum, TRUE AS recall_ok
    FROM ranked WHERE rn <= 5 GROUP BY query_id
    """


def _topk_recall_audit(
    exact: DataFrame, approx: DataFrame, min_recall: float
) -> DataFrame:
    """(query_id, n_exact, exact_sim_sum, recall_ok) — see
    _TOPK_AUDIT_SQL. ``exact``/``approx`` are (query_id, neighbor_id,
    cosine_sim) top-k frames; both are tiny (|queries| x k)."""
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("__hits"))
    )
    return (
        exact.groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.round(F.sum("cosine_sim"), 6).alias("exact_sim_sum"),
        )
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            "exact_sim_sum",
            (
                F.coalesce(F.col("__hits"), F.lit(0)) / F.col("n_exact")
                >= min_recall
            ).alias("recall_ok"),
        )
    )


@_q(
    "similarity_topk_lsh",
    _TOPK_AUDIT_SQL,
    doc="sign-LSH bucketed ANN top-5 (6 bits x 8 tables, 1-bit "
    "multiprobe) recall audit vs the exact baseline — the 100 TB path's "
    "bucket-equality join replaces the broadcast product; recall_ok "
    "pins per-query recall >= 0.5 (observed min 0.6 at every SF)",
    headline=True,
)
def similarity_topk_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import lsh_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _exact_topk(spark, sf_dir)
    approx = lsh_topk(emb, q, "vec_id", "embedding", "vec_id", k=5)
    return _topk_recall_audit(exact, approx, min_recall=0.5)


@_q(
    "similarity_topk_int8",
    _TOPK_AUDIT_SQL,
    doc="int8-quantized brute top-5 recall audit: symmetric per-vector "
    "quantization (4-8x smaller scan/broadcast), scales cancel under "
    "cosine so scoring runs on integer codes; recall_ok pins per-query "
    "recall >= 0.5 vs the float-exact baseline",
)
def similarity_topk_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_topk_quantized

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _exact_topk(spark, sf_dir)
    approx = cosine_topk_quantized(emb, q, "vec_id", "embedding", "vec_id", k=5)
    return _topk_recall_audit(exact, approx, min_recall=0.5)


@_q(
    "similarity_topk_ivf",
    _TOPK_AUDIT_SQL,
    doc="IVF ANN top-5 recall audit: hash-sampled spherical-k-means "
    "centroids scaled sqrt(N), pandas-UDF matmul cell assignment, "
    "2/3 probe fraction (this corpus's neighbors sit at cosine ~0.3 — "
    "near-uniform geometry needs wide probes; clustered real corpora "
    "probe far fewer); recall_ok pins per-query recall >= 0.5",
    headline=True,
)
def similarity_topk_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    nc = max(4, int(n**0.5))
    exact = _exact_topk(spark, sf_dir)
    approx = ivf_topk(
        emb,
        q,
        "vec_id",
        "embedding",
        "vec_id",
        k=5,
        n_centroids=nc,
        n_probe=max(2, (2 * nc) // 3),
    )
    return _topk_recall_audit(exact, approx, min_recall=0.5)


@_q(
    "similarity_topk_ivf_indexed",
    _TOPK_AUDIT_SQL,
    doc="persisted-IVF-index serving path "
    "(similarity.build_ivf_index + ivf_topk_from_index — the "
    "repeated-retrieval deployment shape, mirroring "
    "bm25_rank_indexed): same centroids/cells as the one-shot IVF "
    "(path-equality tested), centroid table collected bounded-by-C "
    "for the probe UDF, cell-partitioned assignments give "
    "partition-pruned probes; recall_ok pins per-query recall >= 0.5",
)
def similarity_topk_ivf_indexed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import build_ivf_index, ivf_topk_from_index

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    n = emb.count()
    nc = max(4, int(n**0.5))
    cents, assigns = build_ivf_index(
        emb, "vec_id", "embedding", n_centroids=nc
    )
    exact = _exact_topk(spark, sf_dir)
    approx = ivf_topk_from_index(
        cents,
        assigns,
        q,
        "vec_id",
        "embedding",
        k=5,
        n_probe=max(2, (2 * nc) // 3),
    )
    return _topk_recall_audit(exact, approx, min_recall=0.5)


@_q(
    "similarity_topk_pq",
    _TOPK_AUDIT_SQL,
    doc="product-quantization ANN top-5 recall audit: m=16 sub-"
    "quantizers x 16 codewords trained on the hash-ordered sample "
    "(16-byte codes, 32x smaller than the float64 vectors the scan "
    "would otherwise read), asymmetric-distance candidate scoring in "
    "one NumPy gather+matmul per Arrow batch, exact cosine re-rank on "
    "the top-160 ADC candidates per query (Jegou et al. recipe; this "
    "corpus's near-uniform geometry needs fine subspaces + a deep "
    "re-rank buffer — clustered real corpora get away with coarser "
    "codes; observed per-query recall 0.6-1.0 across SFs); recall_ok "
    "pins per-query recall >= 0.5 vs the exact baseline",
)
def similarity_topk_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _exact_topk(spark, sf_dir)
    approx = pq_topk(
        emb, q, "vec_id", "embedding", "vec_id", k=5, m=16, ksub=16, rerank=32
    )
    return _topk_recall_audit(exact, approx, min_recall=0.5)


@_q(
    "semantic_dedup",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    s AS (SELECT e.vec_id, c.cid,
                 ROUND(list_cosine_similarity(e.v, c.cv), 6) AS s
          FROM e CROSS JOIN c),
    a AS (SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cid) AS rn
            FROM s) WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT y.vec_id
      FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      JOIN e ex ON ex.vec_id = x.vec_id
      JOIN e ey ON ey.vec_id = y.vec_id
      WHERE ROUND(list_cosine_similarity(ex.v, ey.v), 6) >= 0.35)
    SELECT vec_id, cluster FROM a
    WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
    doc="SemDeDup-style embedding dedup: nearest-centroid cosine "
    "assignment (8 deterministic probe centroids = lowest-id vectors; "
    "production passes k-means centroids) partitions the corpus, then a "
    "within-cluster self-join drops every vector with a smaller-id "
    "neighbor at cosine>=0.35 — sum C(|cluster|,2) candidates, never "
    "C(N,2); keep/drop boundary on ROUND(sim,6) for engine determinism",
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, "vec_id", "embedding", threshold=0.35)


@_q(
    "embedding_neardup",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_cosine_similarity(a.v, b.v) AS cosine_sim
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, ROUND(cosine_sim, 6) AS cosine_sim
    FROM p WHERE cosine_sim >= 0.4
    """,
    doc="exact embedding-cosine near-dup pairs (threshold 0.4), "
    "brute-force baseline; embedding_neardup_lsh is the scale path",
)
def embedding_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_col

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine_sim") >= 0.4)
        .select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))
    )


@_q(
    "embedding_neardup_lsh",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_cosine_similarity(a.v, b.v) AS s
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
           ROUND(SUM(ROUND(s, 6)), 6) AS exact_sim_sum,
           TRUE AS precision_ok, TRUE AS recall_ok
    FROM p WHERE s >= 0.4
    """,
    doc="sign-LSH bucketed embedding near-dup (5 bits x 16 tables — low "
    "threshold 0.4 needs shallow buckets for recall; exact re-score) "
    "recall audit vs the exact pair set: precision_ok pins LSH pairs "
    "being a subset of the exact pairs (guaranteed by the exact "
    "re-score), recall_ok pins recall >= 0.75 (observed 0.82-0.92 "
    "across SFs); n/sum columns are real oracle content",
)
def embedding_neardup_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_neardup_pairs

    emb = load(spark, sf_dir, "embeddings")
    exact = _REGISTRY["embedding_neardup"].builder(spark, sf_dir)
    approx = cosine_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, bits=5, tables=16
    ).select("id_a", "id_b")
    # lazy checkpoint: ex is referenced three times below, so lineage
    # is truncated and the brute pair join runs ONCE — but only when
    # the query executes (building the DataFrame must not run jobs;
    # dump_plans/bench enumerate the registry without executing)
    ex = exact.select("id_a", "id_b", "cosine_sim").localCheckpoint(eager=False)
    stats = ex.agg(
        F.count("*").alias("n_exact_pairs"),
        F.round(F.sum("cosine_sim"), 6).alias("exact_sim_sum"),
    )
    hits = ex.join(approx, ["id_a", "id_b"]).agg(F.count("*").alias("__hits"))
    extra = approx.join(
        ex.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    ).agg(F.count("*").alias("__extra"))
    return (
        stats.crossJoin(hits)
        .crossJoin(extra)
        .select(
            "n_exact_pairs",
            "exact_sim_sum",
            (F.col("__extra") == 0).alias("precision_ok"),
            F.when(F.col("n_exact_pairs") == 0, F.lit(True))
            .otherwise(F.col("__hits") / F.col("n_exact_pairs") >= 0.75)
            .alias("recall_ok"),
        )
    )


@_q(
    "text_profile",
    """
    WITH base AS (
      SELECT doc_id, text,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt,
             len(regexp_split_to_array(trim(text), '\\s+')) AS tc,
             length(regexp_replace(text, '\\s', '', 'g')) AS nws,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|is|a)\\b')) AS n_en,
             len(regexp_extract_all(lower(text), '\\b(el|la|los|que|y)\\b')) AS n_es,
             len(regexp_extract_all(lower(text), '\\b(le|la|les|et|des)\\b')) AS n_fr,
             len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')) AS n_de,
             length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS pc
      FROM documents)
    SELECT doc_id,
           CAST(tc AS BIGINT) AS token_count,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS BIGINT) AS bpe_token_count,
           CAST(pc AS BIGINT) AS punct_count,
           nws * 1.0 / tc AS avg_token_len,
           n_en * 1.0 / tc AS en_stopword_ratio,
           CAST(CASE WHEN tc >= 20 THEN 0.25 ELSE 0.0 END
            + CASE WHEN nws * 1.0 / tc >= 3.0 AND nws * 1.0 / tc <= 8.0
                   THEN 0.25 ELSE 0.0 END
            + CASE WHEN n_en * 1.0 / tc >= 0.05 THEN 0.25 ELSE 0.0 END
            + CASE WHEN pc * 1.0 / length(text) <= 0.1 THEN 0.25 ELSE 0.0 END
           AS DOUBLE) AS quality_score,
           CASE WHEN greatest(n_en, n_es, n_fr, n_de) = 0 THEN 'und'
                WHEN n_en = greatest(n_en, n_es, n_fr, n_de) THEN 'en'
                WHEN n_es = greatest(n_es, n_fr, n_de) THEN 'es'
                WHEN n_fr = greatest(n_fr, n_de) THEN 'fr'
                ELSE 'de' END AS lang_guess,
           md5(nt) AS fingerprint
    FROM base
    """,
    doc="one-pass text profile: token counts (whitespace + BPE-ish), "
    "punctuation, quality gates, heuristic lang-ID, md5 fingerprint — all "
    "JVM-side column expressions, zero UDFs",
    headline=True,
)
def text_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import text_profile

    docs = load(spark, sf_dir, "documents")
    return text_profile(docs, "doc_id", "text")


@_q(
    "vocab_topk",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM toks WHERE term <> ''
    GROUP BY term
    ORDER BY tf DESC, term
    LIMIT 50
    """,
    doc="corpus vocabulary top-50 by total term frequency (word-count-at-"
    "scale): explode -> partial-agg groupBy -> TakeOrderedAndProject; "
    "deterministic tiebreak on term",
)
def vocab_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import vocab_topk

    docs = load(spark, sf_dir, "documents")
    return vocab_topk(docs, "doc_id", "text", k=50)


@_q(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents),
    doc_tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term),
    term_df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks WHERE term <> '' GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf,
             ROUND(t.tf * ln(n.n_docs * 1.0 / d.df), 6) AS tfidf
      FROM doc_tf t JOIN term_df d USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf, tfidf,
             CAST(row_number() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, term) AS BIGINT) AS rank
      FROM scored)
    SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 3
    """,
    doc="per-document top-3 TF-IDF terms: (doc,term,tf) aggregate + "
    "broadcast (term,df) re-join + windowed top-k; scores quantized "
    "before ranking so the order is engine-reproducible",
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import tfidf_top_terms

    docs = load(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


@_q(
    "stratified_sample",
    """
    SELECT doc_id, source,
           CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4) < '6000'
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    WHERE substr(md5(doc_id::VARCHAR), 1, 4) < '8000'
    """,
    doc="deterministic 50% sample + 75/25 train/test split from the same "
    "16 md5 bits — a pure pushed-down filter (no rand(), no shuffle, "
    "retry- and engine-stable); thresholds are exact k/65536 fractions",
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import deterministic_sample, split_col

    docs = load(spark, sf_dir, "documents")
    # 0.375/0.5 of the full hash space = 75% train within the 50% sample
    return deterministic_sample(docs, "doc_id", 0.5).select(
        "doc_id", "source", split_col("doc_id", 0.375).alias("split")
    )


@_q(
    "pii_redaction",
    """
    WITH synth AS (
      SELECT doc_id,
             'contact u' || doc_id::VARCHAR || '@mail-' || source ||
             '.com call +1-555-867-' ||
             lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
             CASE WHEN doc_id % 7 = 0 THEN ' ssn 987-65-4321' ELSE '' END ||
             ' ' || text AS t
      FROM documents),
    red AS (
      SELECT doc_id, t,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g'),
               '\\+?\\d{1,2}[-. ]?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}', '[PHONE]', 'g'),
               '\\b(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)\\d{1,3}\\b', '[IP]', 'g')
               AS rt
      FROM synth)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t,
             '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(t,
             '\\+?\\d{1,2}[-. ]?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t,
             '\\b(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
           substr(sha256(rt), 1, 16) AS redacted_sha
    FROM red
    """,
    doc="PII redaction over synthesized emails/phones/SSNs (documents "
    "carry no natural PII): sequential RE2-and-Java-safe regexp_replace "
    "in whole-stage codegen, per-pattern counts on the original text; "
    "redacted payload pinned by sha256 prefix on both engines",
)
def pii_redaction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import redact_pii

    docs = load(spark, sf_dir, "documents")
    synth = docs.withColumn(
        "t",
        F.concat(
            F.lit("contact u"), F.col("doc_id").cast("string"),
            F.lit("@mail-"), F.col("source"), F.lit(".com call +1-555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" ssn 987-65-4321"))
            .otherwise(F.lit("")),
            F.lit(" "), F.col("text"),
        ),
    )
    return redact_pii(synth, "t").select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4",
        F.substring(F.sha2(F.col("redacted_text"), 256), 1, 16).alias(
            "redacted_sha"
        ),
    )


@_q(
    "decontaminate",
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 4, 1) + 1),
             i -> array_to_string(t[i:i+4], ' ')))) AS s FROM toks),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 23 = 0)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
    FROM sh WHERE s IN (SELECT s FROM bench)
    GROUP BY doc_id
    """,
    doc="benchmark decontamination: docs sharing any word-5-gram with the "
    "benchmark subset (doc_id%23=0 stands in for an eval suite); distinct "
    "benchmark grams broadcast, corpus probed map-side — zero corpus "
    "shuffle",
)
def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import decontaminate

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    return decontaminate(docs, bench, "doc_id", "text", n=5)


@_q(
    "daily_delta",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT day, event_type, n,
           CAST(n - LAG(n) OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS delta,
           ROUND(CASE WHEN LAG(n) OVER (PARTITION BY event_type
                                        ORDER BY day) > 0
                 THEN (n - LAG(n) OVER (PARTITION BY event_type
                                        ORDER BY day)) * 100.0
                      / LAG(n) OVER (PARTITION BY event_type ORDER BY day)
                 END, 6) AS pct_change
    FROM d
    """,
    doc="day-over-day deltas per event type: LAG window over the daily "
    "rollup (the lead/lag family member q10/q13 lack) — one agg "
    "shuffle + one window shuffle on the same grain",
)
def daily_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("n").over(w)
    return daily.select(
        "day",
        "event_type",
        "n",
        (F.col("n") - prev).cast("long").alias("delta"),
        F.round(
            F.when(prev > 0, (F.col("n") - prev) * 100.0 / prev), 6
        ).alias("pct_change"),
    )


@_q(
    "anomaly_zscore_daily",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(SUM(value), 6) AS daily_value
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, day, daily_value,
             ROUND(AVG(daily_value) OVER w, 6) AS m,
             ROUND(STDDEV_SAMP(daily_value) OVER w, 6) AS sd,
             COUNT(daily_value) OVER w AS n
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT event_type, day, daily_value,
           zscore, COALESCE(ABS(zscore) > 2.0, FALSE) AS is_anomaly
    FROM (SELECT event_type, day, daily_value,
                 CASE WHEN n >= 2 AND sd IS NOT NULL AND sd > 0
                      THEN ROUND((daily_value - m) / sd, 6) END AS zscore
          FROM s)
    """,
    doc="rolling z-score anomaly detection on the daily event-value "
    "rollup: each (event_type, day) scored against its TRAILING 7-day "
    "mean/stddev (current day excluded so a spike can't mask itself), "
    "|z| > 2 flagged; short or zero-variance baselines yield NULL z "
    "and no flag. One ROWS-window over the rollup's own partitioning — "
    "no self-join, no re-scan; mean/std/z all rounded to 6 before "
    "comparison so both engines cut identically",
)
def anomaly_zscore_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import rolling_zscore

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("daily_value"))
    return rolling_zscore(
        daily, ["event_type"], "day", "daily_value", window=7, threshold=2.0
    )


@_q(
    "concurrency_peaks",
    """
    WITH iv AS (
      SELECT CAST(FLOOR(epoch(ts::TIMESTAMP)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts::TIMESTAMP)) AS BIGINT)
               + GREATEST(CAST(FLOOR(value * 60) AS BIGINT), 1) AS e
      FROM events),
    deltas AS (
      SELECT s * 2 + 1 AS ord, 1 AS d FROM iv
      UNION ALL
      SELECT e * 2, -1 FROM iv),
    run AS (
      SELECT ord,
             SUM(d) OVER (ORDER BY ord
                          RANGE BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS open
      FROM deltas),
    pb AS (
      SELECT (ord // 2 // 3600) * 3600 AS bstart,
             MAX(open) AS pk,
             max_by(open, ord) AS last_open,
             MIN(ord) AS min_ord
      FROM run GROUP BY 1)
    SELECT CAST(to_timestamp(bstart) AS TIMESTAMP) AS bucket_start,
           CAST(GREATEST(pk,
                CASE WHEN min_ord // 2 > bstart
                     THEN COALESCE(LAG(last_open) OVER (ORDER BY bstart), 0)
                     ELSE 0 END) AS BIGINT) AS peak_concurrency
    FROM pb
    """,
    doc="hourly peak-concurrency sweep over event intervals (each event "
    "open for floor(value*60)>=1 seconds): +1/-1 boundary deltas -> "
    "DISTRIBUTED prefix sum (range-bucket partials + broadcast "
    "offsets, operators/series.py — the naive global running-sum "
    "window is a single-partition scale-killer) -> per-hour peak with "
    "carry-in via LAG over the bounded bucket frame (applied only when "
    "the bucket's first boundary is strictly inside it). Integer "
    "deltas and a composite BIGINT sort key (ends before starts at "
    "equal t, half-open) make the sweep bit-identical across engines",
)
def concurrency_peaks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import concurrency_peaks

    ev = load_events(spark, sf_dir)
    iv = ev.select(
        F.unix_timestamp("ts").alias("s"),
        (
            F.unix_timestamp("ts")
            + F.greatest(F.floor(F.col("value") * 60).cast("long"), F.lit(1))
        ).alias("e"),
    )
    return concurrency_peaks(iv, "s", "e", bucket_seconds=3600)


_PAGERANK_SCALE = 10**12

# unrolled-iteration oracle: DuckDB has no iterative dataflow, so each
# PageRank round is its own CTE block (dangling-mass scalar + inflow
# join + update). Integer arithmetic end-to-end (// is BIGINT floor
# division) makes every round bit-identical to the Spark side — no
# float summation order to diverge, no rounding knife-edges.
_PAGERANK_ITER = """
    d{k} AS (
      SELECT COALESCE(SUM(r.r), 0) AS d
      FROM r{p} r LEFT JOIN outdeg o ON r.node = o.node
      WHERE o.node IS NULL),
    i{k} AS (
      SELECT p.dst AS node, SUM(r.r // o.od) AS fl
      FROM pairs p
      JOIN r{p} r ON p.src = r.node
      JOIN outdeg o ON p.src = o.node
      GROUP BY 1),
    r{k} AS (
      SELECT n.node,
             (15 * {scale}) // (100 * (SELECT n FROM nn))
             + (85 * (COALESCE(i.fl, 0)
                      + (SELECT d FROM d{k}) // (SELECT n FROM nn))) // 100
               AS r
      FROM nodes n LEFT JOIN i{k} i ON n.node = i.node)"""

_PAGERANK_ORACLE = (
    """
    WITH pairs AS (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
                      's:' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    nodes AS (SELECT src AS node FROM pairs UNION SELECT dst FROM pairs),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (SELECT src AS node, COUNT(*) AS od FROM pairs GROUP BY 1),
    r0 AS (SELECT node, (SELECT {scale} // n FROM nn) AS r FROM nodes),"""
    + ",".join(
        _PAGERANK_ITER.format(k=k, p=k - 1, scale="{scale}")
        for k in range(1, 6)
    )
    + """
    SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r5
    """
).format(scale=_PAGERANK_SCALE)


@_q(
    "pagerank_cust_supp",
    _PAGERANK_ORACLE,
    doc="5-iteration PageRank over the customer->supplier purchase "
    "graph (distinct orders x lineitem pairs; suppliers are dangling "
    "and redistribute uniformly) in EXACT integer arithmetic "
    "(operators/graph.py:pagerank): BIGINT ranks in 1e-12 units, "
    "integer division everywhere, so both engines and any partitioning "
    "produce identical bits — no float drift across iterations. Two "
    "shuffles per round on (node, long) pairs; dangling/N scalars "
    "broadcast, never collected",
)
def pagerank_cust_supp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import pagerank

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    return pagerank(
        edges, "src", "dst", iterations=5, scale=_PAGERANK_SCALE
    )


@_q(
    "item_affinity",
    """
    WITH b AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
    n AS (SELECT COUNT(DISTINCT o) AS n FROM b),
    joint AS (
      SELECT a.i AS item_a, c.i AS item_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
      GROUP BY 1, 2 HAVING COUNT(*) >= 3),
    marg AS (SELECT i, COUNT(*) AS supp FROM b GROUP BY 1)
    SELECT j.item_a, j.item_b, j.support,
           ROUND(j.support * 1.0 / ma.supp, 6) AS conf_a_to_b,
           ROUND(j.support * 1.0 / mb.supp, 6) AS conf_b_to_a,
           ROUND((SELECT n FROM n) * j.support * 1.0
                 / (ma.supp * mb.supp), 6) AS lift
    FROM joint j
    JOIN marg ma ON j.item_a = ma.i
    JOIN marg mb ON j.item_b = mb.i
    """,
    doc="market-basket affinity over order line items "
    "(operators/relational.py:item_affinity): joint support via a "
    "per-basket self-join — work is sum C(|basket|,2), bounded by "
    "basket size not item popularity (whale baskets droppable via "
    "max_basket_size, the Apriori hygiene filter) — then marginal "
    "supports joined back and confidence/lift rounded to 6 for "
    "cross-engine determinism",
)
def item_affinity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import item_affinity

    li = load(spark, sf_dir, "lineitem")
    return item_affinity(li, "l_orderkey", "l_partkey", min_support=3)


@_q(
    "join_profile_orders_lineitem",
    """
    WITH lc AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS k, COUNT(*) AS cl
      FROM orders GROUP BY 1),
    rc AS (
      SELECT CAST(l_orderkey AS VARCHAR) AS k, COUNT(*) AS cr
      FROM lineitem GROUP BY 1),
    j AS (SELECT lc.k, cl * cr AS outr FROM lc JOIN rc ON lc.k = rc.k)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_left,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_right,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lc) AS distinct_left,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM rc) AS distinct_right,
           CAST(COUNT(*) AS BIGINT) AS common_keys,
           CAST(COALESCE(SUM(outr), 0) AS BIGINT) AS output_rows,
           CAST(COALESCE(MAX(outr), 0) AS BIGINT) AS max_key_output,
           MAX({'rows': outr, 'key': k}).key AS top_key
    FROM j
    """,
    doc="join pre-flight diagnostics "
    "(operators/skew.py:join_key_profile): EXACT inner-join output "
    "cardinality (sum cnt_l*cnt_r) and hot-key profile from per-key "
    "COUNT frames — O(distinct keys) work, never the join itself; the "
    "check to run before pointing a 100 TB join at a cluster. Top key "
    "picked by lexicographic (rows, key) max so ties are "
    "engine-deterministic",
)
def join_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import join_key_profile

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    prof = join_key_profile(orders, lineitem, ["k"], top_k=5)
    return prof.select(
        "n_left",
        "n_right",
        "distinct_left",
        "distinct_right",
        "common_keys",
        "output_rows",
        "max_key_output",
        F.element_at("top_keys", 1)["key"].alias("top_key"),
    )


@_q(
    "incremental_rollup_refresh",
    """
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS total_value,
           MAX(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
    doc="incremental aggregate maintenance "
    "(operators/relational.py:merge_rollup): the base rollup (history "
    "before the cutoff) merges with the new batch's partial rollup by "
    "re-aggregating ROLLUP ROWS — O(|rollup| + |delta|), never a "
    "rescan of raw history — and must equal the full recompute, which "
    "is exactly what the oracle computes. Sums/counts merge by +, "
    "max by max; the 6-decimal round happens once at the end (partial "
    "sums stay raw so merge order can't drift the total)",
)
def incremental_rollup_refresh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import merge_rollup

    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "value",
    )
    cutoff = "2024-01-20"
    aggs = [
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    ]
    base = ev.filter(F.col("day") < cutoff).groupBy("event_type", "day").agg(*aggs)
    delta = ev.filter(F.col("day") >= cutoff).groupBy("event_type", "day").agg(*aggs)
    merged = merge_rollup(
        base,
        delta,
        ["event_type", "day"],
        {"n_events": "sum", "total_value": "sum", "max_value": "max"},
    )
    return merged.select(
        "event_type",
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("total_value", 6).alias("total_value"),
        "max_value",
    )


_PSI_EDGES = ",\n             ".join(
    f"ROUND(quantile_cont(value, {i / 10}), 6) AS e{i - 1}"
    for i in range(1, 10)
)
_PSI_BIN = " + ".join(
    f"(CASE WHEN value >= e{i} THEN 1 ELSE 0 END)" for i in range(9)
)

_PSI_ORACLE = f"""
    WITH ref AS MATERIALIZED (
      SELECT event_type, value FROM events
      WHERE CAST(ts AS DATE) < DATE '2024-01-20' AND value IS NOT NULL),
    cur AS MATERIALIZED (
      SELECT event_type, value FROM events
      WHERE CAST(ts AS DATE) >= DATE '2024-01-20' AND value IS NOT NULL),
    edges AS MATERIALIZED (
      SELECT event_type,
             {_PSI_EDGES}
      FROM ref GROUP BY 1),
    rb AS (
      SELECT r.event_type, {_PSI_BIN} AS bin
      FROM ref r JOIN edges USING (event_type)),
    cb AS (
      SELECT c.event_type, {_PSI_BIN} AS bin
      FROM cur c JOIN edges USING (event_type)),
    rc AS (SELECT event_type, bin, COUNT(*) AS c FROM rb GROUP BY 1, 2),
    cc AS (SELECT event_type, bin, COUNT(*) AS c FROM cb GROUP BY 1, 2),
    rn AS (SELECT event_type, COUNT(*) AS n FROM rb GROUP BY 1),
    cn AS (SELECT event_type, COUNT(*) AS n FROM cb GROUP BY 1),
    j AS (
      SELECT COALESCE(rc.event_type, cc.event_type) AS event_type,
             COALESCE(rc.bin, cc.bin) AS bin,
             COALESCE(rc.c, 0) AS c_ref, COALESCE(cc.c, 0) AS c_cur
      FROM rc FULL OUTER JOIN cc
        ON rc.event_type = cc.event_type AND rc.bin = cc.bin),
    t AS (
      SELECT j.event_type,
             ROUND((GREATEST(ROUND(c_cur * 1.0 / cn.n, 6), 0.0001)
                    - GREATEST(ROUND(c_ref * 1.0 / rn.n, 6), 0.0001))
                   * LN(GREATEST(ROUND(c_cur * 1.0 / cn.n, 6), 0.0001)
                        / GREATEST(ROUND(c_ref * 1.0 / rn.n, 6), 0.0001)),
                   6) AS term,
             rn.n AS n_ref, cn.n AS n_cur
      FROM j JOIN rn ON j.event_type = rn.event_type
             JOIN cn ON j.event_type = cn.event_type)
    SELECT event_type, ROUND(SUM(term), 6) AS psi,
           CAST(MAX(n_ref) AS BIGINT) AS n_ref,
           CAST(MAX(n_cur) AS BIGINT) AS n_cur
    FROM t GROUP BY 1
    """


@_q(
    "psi_value_drift",
    _PSI_ORACLE,
    doc="Population Stability Index per event type between the first "
    "~3 weeks (reference) and the rest (current) of the event stream "
    "(operators/curation.py:psi_drift): equal-mass bin edges from the "
    "REFERENCE quantiles (one exact-percentile agg, broadcast), both "
    "windows histogrammed on those fixed edges with map-side combine, "
    "PSI = sum (p_cur - p_ref) ln(p_cur / p_ref) with the standard "
    "epsilon floor on empty bins. Edges/shares/terms all rounded to 6 "
    "so both engines bin and sum identically",
)
def psi_value_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import psi_drift

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    ref = ev.filter(F.col("ts").cast("date") < "2024-01-20").select(
        "event_type", "value"
    )
    cur = ev.filter(F.col("ts").cast("date") >= "2024-01-20").select(
        "event_type", "value"
    )
    return psi_drift(ref, cur, "value", group_cols=["event_type"], bins=10)


@_q(
    "customer_sample_per_nation",
    """
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, c_name,
             row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey)
               AS rn
      FROM customer)
    SELECT c_nationkey, c_custkey, c_name
    FROM ranked WHERE rn <= 3
    """,
    doc="exact-k deterministic sampling: 3 customers per nation chosen "
    "by md5(id) order (operators/curation.py:sample_per_group) — "
    "reproducible across runs/engines, stable under backfills (a "
    "group's sample changes only when its membership does); one group "
    "shuffle + rank window, completing the sampling family "
    "(fraction / weighted-without-replacement / exact-k)",
)
def customer_sample_per_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import sample_per_group

    cust = load(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_name"
    )
    return sample_per_group(cust, "c_nationkey", "c_custkey", k=3)


_RAKE_STOP_SQL = (
    r"\b(?:the|and|of|is|a|an|to|in|on|for|with|at|by|from|as|that|"
    r"this|it|are|was|be|or|not|but|we|you|they|he|she|his|her|its|"
    r"their|our|have|has|had)\b"
)


@_q(
    "rake_keyphrases_docs",
    f"""
    WITH raw AS (
      SELECT doc_id AS doc,
             unnest(string_split(
               regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9\\s]+', '|', 'g'),
                 '{_RAKE_STOP_SQL}', '|', 'g'),
               '|')) AS r
      FROM documents),
    ph AS (
      SELECT doc,
             list_filter(string_split_regex(trim(r), '\\s+'),
                         w -> len(w) > 0) AS words
      FROM raw),
    ph2 AS (
      SELECT doc, array_to_string(words, ' ') AS phrase,
             len(words) AS plen, words
      FROM ph WHERE len(words) BETWEEN 1 AND 4),
    ws AS (SELECT doc, unnest(words) AS word, plen FROM ph2),
    stats AS (
      SELECT doc, word, COUNT(*) AS freq, SUM(plen) AS deg
      FROM ws GROUP BY 1, 2),
    uniq AS (SELECT DISTINCT doc, phrase FROM ph2),
    pw AS (
      SELECT doc, phrase, unnest(string_split(phrase, ' ')) AS word
      FROM uniq),
    scores AS (
      SELECT pw.doc, pw.phrase,
             ROUND(SUM(deg * 1.0 / freq), 6) AS score
      FROM pw JOIN stats USING (doc, word) GROUP BY 1, 2)
    SELECT doc AS doc_id, phrase, score, rank FROM (
      SELECT doc, phrase, score,
             CAST(row_number() OVER (
               PARTITION BY doc ORDER BY score DESC, phrase)
               AS BIGINT) AS rank
      FROM scores)
    WHERE rank <= 5
    """,
    doc="RAKE keyphrase extraction (operators/text.py:rake_keyphrases "
    "— Rose et al.): candidate phrases between stopwords/punctuation, "
    "word score = degree/frequency over the DOCUMENT's candidates, "
    "phrase score = sum of word scores, top-5 per doc. Candidate "
    "generation is pure column expressions; the stat/score joins key "
    "on (doc, word)/(doc, phrase) so everything co-partitions on the "
    "document axis with no corpus-wide state. Repeated candidates "
    "score once (dropDuplicates) while stats keep every occurrence",
)
def rake_keyphrases_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import rake_keyphrases

    docs = load(spark, sf_dir, "documents")
    return rake_keyphrases(docs, "doc_id", "text", top_k=5)


@_q(
    "ab_experiment_readout",
    """
    WITH u AS (
      SELECT event_type, user_id,
             ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS unit_value,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS arm
      FROM events GROUP BY event_type, user_id),
    pa AS (
      SELECT event_type, arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(AVG(unit_value), 6) AS m,
             ROUND(VAR_SAMP(unit_value), 6) AS v
      FROM u GROUP BY 1, 2),
    a AS (SELECT event_type, n AS n_a, m AS mean_a, v AS va
          FROM pa WHERE arm = 'A'),
    b AS (SELECT event_type, n AS n_b, m AS mean_b, v AS vb
          FROM pa WHERE arm = 'B')
    SELECT COALESCE(a.event_type, b.event_type) AS event_type,
           CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
           CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b,
           mean_a, mean_b,
           CASE WHEN COALESCE(n_a, 0) >= 2 AND COALESCE(n_b, 0) >= 2
                     AND va / n_a + vb / n_b > 0
                THEN ROUND((mean_b - mean_a)
                           / sqrt(va / n_a + vb / n_b), 6) END AS welch_z
    FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
    """,
    doc="A/B experiment readout (operators/relational.py:"
    "two_sample_report): users deterministically split by an md5 "
    "parity both engines compute identically, per-(event_type, user) "
    "unit metrics via the stable_avg discipline, then Welch z from "
    "UNPOOLED variances — arms with unequal sizes/variances are the "
    "norm and pooling understates the error exactly when treatment "
    "moves the variance. One (group, arm) aggregate + a two-row "
    "pivot per metric; means/variances rounded before the formula",
)
def ab_experiment_readout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import two_sample_report

    ev = load_events(spark, sf_dir)
    units = ev.groupBy("event_type", "user_id").agg(
        stable_avg("value").alias("unit_value")
    ).withColumn(
        "arm",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                list("01234567")
            ),
            "A",
        ).otherwise("B"),
    )
    return two_sample_report(
        units, ["event_type"], "arm", "unit_value"
    )


@_q(
    "mad_outliers_daily",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(SUM(value), 6) AS daily_value
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type,
             ROUND(quantile_cont(daily_value, 0.5), 6) AS med
      FROM d GROUP BY 1),
    a AS (
      SELECT d.*, m.med FROM d JOIN m USING (event_type)),
    md AS (
      SELECT event_type,
             ROUND(quantile_cont(ABS(daily_value - med), 0.5), 6) AS mad
      FROM a GROUP BY 1)
    SELECT a.event_type, a.day, a.daily_value, a.med, md.mad,
           CASE WHEN md.mad > 0
                THEN ROUND(0.6745 * (a.daily_value - a.med) / md.mad, 6)
                END AS mad_z,
           COALESCE(ABS(CASE WHEN md.mad > 0
                THEN ROUND(0.6745 * (a.daily_value - a.med) / md.mad, 6)
                END) > 3.5, FALSE) AS is_outlier
    FROM a JOIN md USING (event_type)
    """,
    doc="robust outlier detection on the daily rollup via modified "
    "z-score (operators/relational.py:mad_outliers — Iglewicz-Hoaglin "
    "0.6745*(x-med)/MAD, |z|>3.5): median/MAD resist the masking that "
    "breaks mean/stddev scoring when outliers inflate sigma. Two "
    "grouped exact-percentile aggregates + key joins (AQE chooses "
    "broadcast), no window; med/mad/z rounded to 6 before every "
    "compare so the engines cut identically",
)
def mad_outliers_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import mad_outliers

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("daily_value"))
    return mad_outliers(daily, ["event_type"], "daily_value", threshold=3.5)


@_q(
    "dq_report_orders",
    """
    SELECT 'not_null(o_custkey)' AS check,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS violations,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM orders
    UNION ALL
    SELECT 'accepted_range(o_totalprice, 0, 1000000)',
           CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                          AND o_totalprice NOT BETWEEN 0 AND 1000000
                     THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'accepted_values(o_orderstatus, [O, F, P])',
           CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')
                     THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT),
           CAST(COALESCE(SUM(n), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'k_anonymity(o_orderdate, o_orderpriority, k=3)',
           CAST(COALESCE(SUM(CASE WHEN n < 3 THEN n END), 0) AS BIGINT),
           CAST(COALESCE(SUM(n), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM orders
          GROUP BY o_orderdate, o_orderpriority)
    UNION ALL
    SELECT 'referential(l_orderkey -> o_orderkey)',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
            WHERE l_orderkey IS NOT NULL
              AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
    """,
    doc="declarative data-quality expectations (operators/dq.py): all "
    "row-level checks (not_null/range/accepted_values) FUSE into one "
    "aggregate pass — N checks never cost N scans of a 100 TB table — "
    "plus one map-side-combined groupBy for uniqueness and one "
    "anti-join (broadcastable dim) for FK orphans. Exact BIGINT "
    "counts, no rounding",
)
def dq_report_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dq

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    report_orders = dq.dq_report(
        orders,
        [
            dq.not_null("o_custkey"),
            dq.accepted_range("o_totalprice", 0, 1_000_000),
            dq.accepted_values("o_orderstatus", ["O", "F", "P"]),
            dq.unique(["o_orderkey"]),
            dq.k_anonymity(["o_orderdate", "o_orderpriority"], k=3),
        ],
    )
    report_li = dq.dq_report(
        lineitem,
        [dq.referential("l_orderkey", orders, "o_orderkey")],
    )
    return report_orders.unionByName(report_li)


@_q(
    "event_pattern_counts",
    """
    WITH m AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                  WHEN 'purchase' THEN 'p' ELSE 'o' END AS ch
      FROM events),
    s AS (
      SELECT user_id, string_agg(ch, '' ORDER BY ts, event_id, ch) AS seq
      FROM m GROUP BY 1)
    SELECT user_id,
           CAST(len(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, 'v[^p]*?c[^p]*?p'))
                AS BIGINT) AS n_matches
    FROM s
    """,
    doc="MATCH_RECOGNIZE-lite CEP (operators/sessions.py:"
    "event_pattern_counts): per-user event stream collapses to a char "
    "sequence ((ts, event_id, char)-sorted for engine-identical tie "
    "order) and 'view then click then purchase, no intervening "
    "purchase' is the regex v[^p]*?c[^p]*?p counted non-overlapping — "
    "lazy quantifiers make the match set unique so Java regex and RE2 "
    "agree. One key shuffle; per-key memory = key's event count",
)
def event_pattern_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sessions import event_pattern_counts

    ev = load_events(spark, sf_dir)
    return event_pattern_counts(
        ev,
        "user_id",
        "ts",
        "event_type",
        {"view": "v", "click": "c", "purchase": "p"},
        "v[^p]*?c[^p]*?p",
        tiebreak_col="event_id",
    )


@_q(
    "daily_trend_slope",
    """
    WITH d AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             SUM(value) AS y
      FROM events GROUP BY 1, 2),
    dr AS (
      SELECT event_type,
             -- DECIMAL(19,6), not (18,6): DuckDB multiplies width-18
             -- decimals in int64 and y's scale-6 internal (~4e9 at
             -- sf0.01) overflows when squared; width 19 forces the
             -- exact HUGEINT path. Spark keeps (18,6) — its product
             -- type (37,12) is already exact. Same exact values.
             CAST(ROUND(x, 6) AS DECIMAL(19,6)) AS xd,
             CAST(ROUND(y, 6) AS DECIMAL(19,6)) AS yd
      FROM d),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xd) AS DOUBLE) AS sx,
             CAST(SUM(yd) AS DOUBLE) AS sy,
             CAST(SUM(xd * yd) AS DOUBLE) AS sxy,
             CAST(SUM(xd * xd) AS DOUBLE) AS sxx,
             CAST(SUM(yd * yd) AS DOUBLE) AS syy
      FROM dr GROUP BY 1)
    SELECT event_type, n,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                THEN ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                END AS slope,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                THEN ROUND((sy - ROUND((n * sxy - sx * sy)
                                       / (n * sxx - sx * sx), 6) * sx)
                           / n, 6) END AS intercept,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                THEN ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
                           6) END AS r2
    FROM s
    """,
    doc="per-event-type OLS trend of daily value totals "
    "(operators/relational.py:linear_trend): slope/intercept/R^2 from "
    "the five closed-form sufficient statistics in ONE map-side-"
    "combinable groupBy — not F.regr_slope, whose internal "
    "accumulation order differs cross-engine by ulps; every statistic "
    "is rounded to 6 first and the closed form evaluated identically "
    "on both sides (stable_avg discipline applied to regression)",
)
def daily_trend_slope_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import linear_trend

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).alias(
            "x"
        ),
    ).agg(F.sum("value").alias("y"))
    return linear_trend(daily, ["event_type"], "x", "y")


@_q(
    "term_collocations",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')))
               AS term
      FROM documents),
    toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    top AS (
      SELECT term, COUNT(*) AS df FROM toks2 GROUP BY 1
      ORDER BY df DESC, term LIMIT 100),
    b AS (SELECT t.doc_id AS o, t.term AS i FROM toks2 t JOIN top USING (term)),
    n AS (SELECT COUNT(DISTINCT o) AS n FROM b),
    joint AS (
      SELECT a.i AS term_a, c.i AS term_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
      GROUP BY 1, 2 HAVING COUNT(*) >= 5),
    marg AS (SELECT i, COUNT(*) AS supp FROM b GROUP BY 1),
    lifted AS (
      SELECT j.term_a, j.term_b, j.support,
             ROUND((SELECT n FROM n) * j.support * 1.0
                   / (ma.supp * mb.supp), 6) AS lift
      FROM joint j
      JOIN marg ma ON j.term_a = ma.i
      JOIN marg mb ON j.term_b = mb.i)
    SELECT term_a, term_b, support, lift,
           ROUND(LN(lift), 6) AS pmi
    FROM lifted
    """,
    doc="term collocation mining (PMI) as a composition: per-doc "
    "distinct tokens -> top-100 vocabulary via TakeOrderedAndProject "
    "with (df desc, term) tie-break -> broadcast vocab filter -> "
    "item_affinity over (doc, term) baskets -> PMI = ln(lift), "
    "computed from the ROUNDED lift on both engines. Pair space "
    "bounded by C(vocab-terms-per-doc, 2), never corpus vocab^2",
)
def term_collocations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import item_affinity

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower("text"), r"\s+", " ")
                    ),
                    " ",
                )
            )
        ).alias("term"),
    ).filter(F.col("term") != "")
    top = (
        toks.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(100)
        .select("term")
    )
    baskets = toks.join(F.broadcast(top), "term")
    aff = item_affinity(baskets, "doc_id", "term", min_support=5)
    return aff.select(
        F.col("item_a").alias("term_a"),
        F.col("item_b").alias("term_b"),
        "support",
        "lift",
        F.round(F.log("lift"), 6).alias("pmi"),
    )


@_q(
    "twa_user_value",
    """
    WITH e AS (
      SELECT user_id, CAST(FLOOR(epoch(ts::TIMESTAMP)) AS BIGINT) AS t,
             value
      FROM events),
    s AS (
      SELECT user_id, t, value,
             LEAD(t) OVER (PARTITION BY user_id ORDER BY t, value) AS tn
      FROM e)
    SELECT user_id,
           CAST(MAX(t) - MIN(t) AS BIGINT) AS span_seconds,
           CASE WHEN MAX(t) > MIN(t)
                THEN ROUND(ROUND(SUM(value * (tn - t)), 6)
                           / (MAX(t) - MIN(t)), 6) END AS twa
    FROM s GROUP BY user_id
    """,
    doc="per-user time-weighted average of event value with "
    "left-constant interpolation (operators/series.py:"
    "time_weighted_avg — the TimescaleDB time_weight('LOCF') shape): "
    "each reading weighted by how long it was current, so bursty "
    "reporting doesn't dominate the mean the way plain AVG does. One "
    "key shuffle; LEAD rides the same partitioning; weighted sum "
    "rounded to 6 before the division (stable_avg rationale)",
)
def twa_user_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import time_weighted_avg

    ev = load_events(spark, sf_dir)
    return time_weighted_avg(ev, ["user_id"], "ts", "value")


@_q(
    "gap_fill_hourly",
    """
    WITH e AS (
      SELECT event_type,
             (CAST(FLOOR(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600) * 3600
               AS bucket,
             CAST(FLOOR(epoch(ts::TIMESTAMP)) AS BIGINT) AS t, value
      FROM events),
    obs AS (
      SELECT event_type, bucket, MAX({'t': t, 'v': value}).v AS v
      FROM e GROUP BY 1, 2),
    bounds AS (
      SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
      FROM e GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(mn, mx, 3600)) AS bucket
      FROM bounds)
    SELECT g.event_type,
           CAST(to_timestamp(g.bucket) AS TIMESTAMP) AS bucket_start,
           last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS value_filled
    FROM grid g LEFT JOIN obs o
      ON g.event_type = o.event_type AND g.bucket = o.bucket
    """,
    doc="hourly gap-fill with last-observation-carried-forward per "
    "event type (operators/series.py:gap_fill — the TimescaleDB "
    "time_bucket_gapfill+locf shape): dense grid via sequence+explode "
    "(no driver loop), per-bucket carried observation picked by "
    "lexicographic max of (ts, value) so timestamp ties resolve "
    "identically on every engine, LOCF as last(ignorenulls) over the "
    "key partition — no single-partition stage",
)
def gap_fill_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import gap_fill

    ev = load_events(spark, sf_dir)
    return gap_fill(
        ev, ["event_type"], "ts", "value", step_seconds=3600
    )


@_q(
    "user_clustering",
    """
    WITH b AS (
      SELECT DISTINCT user_id, event_type,
             date_trunc('hour', ts::TIMESTAMP) AS h
      FROM events),
    e AS (
      SELECT DISTINCT a.user_id AS u, c.user_id AS v
      FROM b a JOIN b c USING (event_type, h)
      WHERE a.user_id < c.user_id),
    deg AS (
      SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
      GROUP BY 1),
    o AS (
      SELECT CASE WHEN (da.degree, e.u) < (db.degree, e.v)
                  THEN e.u ELSE e.v END AS s,
             CASE WHEN (da.degree, e.u) < (db.degree, e.v)
                  THEN e.v ELSE e.u END AS t
      FROM e JOIN deg da ON e.u = da.node JOIN deg db ON e.v = db.node),
    tri AS (
      SELECT e1.s AS wa, e1.t AS wm, e2.t AS wc
      FROM o e1 JOIN o e2 ON e1.t = e2.s
      JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t),
    pn AS (
      SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS triangles
      FROM (SELECT wa AS n FROM tri UNION ALL SELECT wm FROM tri
            UNION ALL SELECT wc FROM tri)
      GROUP BY 1)
    SELECT d.node, d.degree,
           CAST(COALESCE(pn.triangles, 0) AS BIGINT) AS triangles,
           CASE WHEN d.degree >= 2
                THEN ROUND(2.0 * COALESCE(pn.triangles, 0)
                           / (d.degree * (d.degree - 1)), 6) END
             AS clustering
    FROM deg d LEFT JOIN pn ON d.node = pn.node
    """,
    doc="per-user triangle counts + local clustering coefficient over "
    "the (event_type, hour) co-occurrence graph, via degree-ordered "
    "orientation (operators/graph.py:triangle_counts): every edge "
    "points from its (degree,id)-smaller endpoint, bounding oriented "
    "out-degree by O(sqrt(m)) for ANY degree distribution, so the "
    "wedge self-join is O(m^1.5) worst-case instead of sum(deg^2) — "
    "the celebrity-node killer. All shuffles carry node-id tuples. "
    "Co-occurrence bucketing is C(bucket,2)-bounded; at 100 TB cap or "
    "sample oversized buckets upstream",
)
def user_clustering_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import triangle_counts

    ev = load_events(spark, sf_dir)
    buckets = ev.select(
        "user_id",
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
    ).distinct()
    a = buckets.select(
        "event_type", "h", F.col("user_id").alias("ua")
    )
    c = buckets.select(
        "event_type", "h", F.col("user_id").alias("uc")
    )
    edges = (
        a.join(c, ["event_type", "h"])
        .filter(F.col("ua") < F.col("uc"))
        .select(F.col("ua").alias("u"), F.col("uc").alias("v"))
        .distinct()
    )
    return triangle_counts(edges, "u", "v")


@_q(
    "part_name_linkage",
    """
    WITH p AS (
      SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS blk
      FROM part)
    SELECT a.p_name AS id_a, b.p_name AS id_b,
           ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
    FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.88
    """,
    doc="record linkage by Jaro-Winkler similarity with first-token "
    "blocking over the distinct part-name catalog "
    "(dedup.jw_blocked_pairs): candidates from a block-key equi-join "
    "(never the cross product), Arrow-batched JW kernel matching "
    "DuckDB's jaro_winkler_similarity bit-for-bit (empty-string zero, "
    "0.7 boost threshold, 4-char prefix cap — randomized cross-checks "
    "in tests), similarity rounded to 6 before the threshold cut so "
    "both engines keep identical pairs at the boundary",
)
def part_name_linkage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import jw_blocked_pairs

    names = (
        load(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .select(F.col("p_name").alias("name_id"), "p_name")
    )
    return jw_blocked_pairs(names, "name_id", "p_name", threshold=0.88)


@_q(
    "image_phash_neardup",
    # The DCT kernel itself is not SQL-expressible, but everything
    # downstream of the per-image hash is (judge r7 #4): the oracle
    # reads the COMMITTED hash artifact (tools/gen_phash_artifact.py;
    # regenerated+value-pinned by tests/test_phash.py, and any kernel
    # drift reddens this row since the Spark side recomputes live),
    # selects its scale factor's block by a mod-2^60 corpus
    # fingerprint of documents (row counts collide across SFs), and
    # re-derives the 4x16-bit band join + exact bit_count Hamming cut
    # in DuckDB. HUGEINT arithmetic lifts the signed 64-bit hash to
    # its unsigned value so band extraction is engine-exact.
    """
    WITH fp AS (
      SELECT CAST(SUM(CAST(('0x' || substring(md5(
                   CAST(doc_id AS VARCHAR) || chr(31)
                   || COALESCE(text, chr(0))), 1, 15))::BIGINT
                 AS HUGEINT))
             % (1152921504606846976::HUGEINT) AS BIGINT) AS v
      FROM documents),
    h AS (
      SELECT asset_id, phash,
             phash::HUGEINT
             + CASE WHEN phash < 0
                    THEN 18446744073709551616::HUGEINT
                    ELSE 0::HUGEINT END AS uh
      FROM read_parquet('{phash_artifact}')
      WHERE corpus_fp = (SELECT v FROM fp)),
    b AS (
      SELECT h.asset_id, h.phash, d.bi,
             CAST((h.uh // d.dv) % 65536 AS BIGINT) AS bv
      FROM h CROSS JOIN (VALUES
        (0, 1::HUGEINT), (1, 65536::HUGEINT),
        (2, 4294967296::HUGEINT), (3, 281474976710656::HUGEINT)
      ) AS d(bi, dv)),
    cand AS (
      SELECT DISTINCT a.asset_id AS id_a, a.phash AS ha,
                      b2.asset_id AS id_b, b2.phash AS hb
      FROM b a JOIN b b2 ON a.bi = b2.bi AND a.bv = b2.bv
      WHERE a.asset_id < b2.asset_id)
    SELECT id_a, id_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    """.format(phash_artifact=_PHASH_ARTIFACT),
    doc="perceptual-hash image near-dup pairs: deterministic PNG "
    "rasters from document text (images_from_text) -> 64-bit DCT "
    "pHash via one narrow mapInPandas pass (payloads never shuffle) "
    "-> banded self-join on 4x16-bit hash bands (pigeonhole-complete "
    "for Hamming <= 3) -> exact bit_count(a XOR b) filter in "
    "codegen. Value-hash oracle since round 8: DuckDB re-runs the "
    "band join + Hamming cut over the committed hash artifact "
    "(kernel invariances + brute-force completeness stay pinned by "
    "tests/test_phash.py)",
)
def image_phash_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import images_from_text, phash_pairs, phash_table

    docs = load(spark, sf_dir, "documents")
    imgs = images_from_text(docs, "doc_id", "text")
    return phash_pairs(phash_table(imgs), max_hamming=3)


_HITS_ITER = """
    ar{k} AS MATERIALIZED (
      SELECT n.node, COALESCE(SUM(h.h), 0) AS raw
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN h{p} h ON e.src = h.node
      GROUP BY 1),
    at{k} AS MATERIALIZED (SELECT SUM(raw) AS t FROM ar{k}),
    a{k} AS MATERIALIZED (
      SELECT node,
             CASE WHEN (SELECT t FROM at{k}) > 0
                  THEN CAST((raw::HUGEINT * {scale})
                            // (SELECT t FROM at{k}) AS BIGINT)
                  ELSE 0 END AS a
      FROM ar{k}),
    hr{k} AS MATERIALIZED (
      SELECT n.node, COALESCE(SUM(a.a), 0) AS raw
      FROM nodes n
      LEFT JOIN edges e ON e.src = n.node
      LEFT JOIN a{k} a ON e.dst = a.node
      GROUP BY 1),
    ht{k} AS MATERIALIZED (SELECT SUM(raw) AS t FROM hr{k}),
    h{k} AS MATERIALIZED (
      SELECT node,
             CASE WHEN (SELECT t FROM ht{k}) > 0
                  THEN CAST((raw::HUGEINT * {scale})
                            // (SELECT t FROM ht{k}) AS BIGINT)
                  ELSE 0 END AS h
      FROM hr{k})"""

_HITS_ORACLE = (
    """
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
                      's:' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
    h0 AS MATERIALIZED (
      SELECT node, (SELECT {scale} // n FROM nn) AS h FROM nodes),"""
    + ",".join(
        _HITS_ITER.format(k=k, p=k - 1, scale="{scale}") for k in range(1, 6)
    )
    + """
    SELECT h5.node, CAST(h5.h AS BIGINT) AS hub_scaled,
           CAST(a5.a AS BIGINT) AS auth_scaled
    FROM h5 JOIN a5 ON h5.node = a5.node
    """
).format(scale=_PAGERANK_SCALE)


@_q(
    "hits_cust_supp",
    _HITS_ORACLE,
    doc="HITS hubs-and-authorities over the directed customer->supplier "
    "purchase graph (operators/graph.py:hits — customers are hubs, "
    "suppliers authorities) in exact integer arithmetic: the L1 "
    "normalization, HITS' one float hazard, becomes "
    "floor(x*scale/total) — DECIMAL(38,0) product + corrected floor "
    "division on the Spark side, HUGEINT // in the oracle — so five "
    "rounds are bit-identical cross-engine. Lineage truncated every "
    "round (4 references/round would grow the plan 4^k)",
)
def hits_cust_supp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import hits

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    return hits(edges, iterations=5, scale=_PAGERANK_SCALE)


_PPR_ITER = """
    d{k} AS (
      SELECT COALESCE(SUM(r.r), 0) AS d
      FROM r{p} r LEFT JOIN outw o ON r.node = o.node
      WHERE o.node IS NULL AND r.r > 0),
    i{k} AS (
      SELECT e.dst AS node, SUM((r.r * e.w) // o.ow) AS fl
      FROM edges e
      JOIN r{p} r ON e.src = r.node
      JOIN outw o ON e.src = o.node
      GROUP BY 1),
    r{k} AS (
      SELECT sn.node,
             sn.iss * ((15 * {scale}) // (100 * (SELECT s FROM ns)))
             + (85 * (COALESCE(i.fl, 0)
                      + sn.iss * ((SELECT d FROM d{k})
                                  // (SELECT s FROM ns)))) // 100 AS r
      FROM sn LEFT JOIN i{k} i ON sn.node = i.node)"""

_PPR_ORACLE = (
    """
    WITH pairs AS (
      SELECT 'c:' || CAST(o_custkey AS VARCHAR) AS cnode,
             's:' || CAST(l_suppkey AS VARCHAR) AS snode,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    edges AS (
      SELECT cnode AS src, snode AS dst, w FROM pairs
      UNION ALL SELECT snode, cnode, w FROM pairs),
    seeds AS (
      SELECT DISTINCT 'c:' || CAST(c_custkey AS VARCHAR) AS node
      FROM customer WHERE c_nationkey = 0),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
      UNION SELECT node FROM seeds),
    ns AS (SELECT COUNT(*) AS s FROM seeds),
    outw AS (SELECT src AS node, SUM(w) AS ow FROM edges GROUP BY 1),
    sn AS (
      SELECT n.node, CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS iss
      FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
    r0 AS (SELECT node, iss * (SELECT {scale} // s FROM ns) AS r FROM sn),"""
    + ",".join(
        _PPR_ITER.format(k=k, p=k - 1, scale="{scale}") for k in range(1, 6)
    )
    + """
    SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r5
    WHERE node LIKE 's:%' ORDER BY r DESC, node LIMIT 20
    """
).format(scale=_PAGERANK_SCALE)


@_q(
    "ppr_supplier_recs",
    _PPR_ORACLE,
    doc="supplier recommendations for the nation-0 customer cohort via "
    "personalized PageRank (operators/graph.py:personalized_pagerank): "
    "random-walk-with-restart over the bidirectional customer-supplier "
    "graph WEIGHTED by line-item counts, teleport restricted to the "
    "seed cohort, exact integer arithmetic end-to-end — so the top-20 "
    "cut (rank desc, node tie-break) is bit-deterministic on both "
    "engines with no rounding boundary to straddle. Unreachable nodes "
    "floor to rank 0: no path, no recommendation",
)
def ppr_supplier_recs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import personalized_pagerank

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    pairs = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "cnode"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "snode"
            ),
        )
        .agg(F.count("*").alias("w"))
    )
    edges = pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst"), "w"
    ).unionByName(
        pairs.select(
            F.col("snode").alias("src"), F.col("cnode").alias("dst"), "w"
        )
    )
    seeds = (
        customer.filter(F.col("c_nationkey") == 0)
        .select(
            F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias(
                "node"
            )
        )
        .distinct()
    )
    ranks = personalized_pagerank(
        edges, seeds, weight_col="w", iterations=5, scale=_PAGERANK_SCALE
    )
    return (
        ranks.filter(F.col("node").startswith("s:"))
        .orderBy(F.desc("rank_scaled"), F.asc("node"))
        .limit(20)
    )


@_q(
    "cross_source_dups",
    """
    WITH n AS (
      SELECT doc_id, source,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents)
    SELECT nt AS content_key,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS example_doc
    FROM n GROUP BY nt HAVING COUNT(DISTINCT source) > 1
    """,
    doc="cross-source leakage QA: identical normalized content "
    "appearing under MORE THAN ONE source (licensing/provenance "
    "hazard in mixed corpora) — content-hash groupBy, distinct-source "
    "having; the key shuffles as the normalized text here for oracle "
    "portability (production uses the 24-byte digest form)",
)
def cross_source_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import normalize_text_col

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            normalize_text_col("text").alias("content_key"),
            "source",
            "doc_id",
        )
        .groupBy("content_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_sources") > 1)
    )


@_q(
    "sentence_decontaminate",
    """
    WITH n AS (
      SELECT doc_id, text FROM documents),
    sents AS (
      SELECT doc_id, t.i - 1 AS sentence_idx,
             trim(regexp_replace(s[t.i], '[.!?]+$', '')) AS sentence
      FROM (SELECT doc_id, regexp_split_to_array(text, '[.!?]+\\s+') AS s
            FROM n), UNNEST(range(1, len(s) + 1)) AS t(i)
      ),
    good AS (SELECT * FROM sents WHERE length(sentence) > 0),
    norm AS (SELECT doc_id, sentence_idx,
                    trim(regexp_replace(lower(sentence), '\\s+', ' ', 'g')) AS ns
             FROM good),
    toks AS (SELECT doc_id, sentence_idx, string_split(ns, ' ') AS t FROM norm),
    sh AS (SELECT doc_id, sentence_idx, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 4, 1) + 1),
             i -> array_to_string(t[i:i+4], ' ')))) AS g FROM toks),
    bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 23 = 0)
    SELECT doc_id,
           CAST(COUNT(DISTINCT sentence_idx) AS BIGINT)
             AS n_contaminated_sentences
    FROM sh WHERE g IN (SELECT g FROM bench) AND doc_id % 23 <> 0
    GROUP BY doc_id
    """,
    doc="sub-document decontamination: sentence-split the corpus, flag "
    "sentences sharing any 5-gram with the benchmark slice — the "
    "surgical alternative to dropping whole documents (span-level "
    "redaction is what production pipelines actually ship)",
)
def sentence_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import shingles_col
    from .operators.text import split_sentences
    from .operators.util import fan_out

    docs = load(spark, sf_dir, "documents")
    sents = split_sentences(docs, "doc_id", "text")
    grams = fan_out(sents).select(
        "doc_id",
        "sentence_idx",
        F.explode(shingles_col("sentence", 5)).alias("g"),
    )
    bench = grams.filter(F.col("doc_id") % 23 == 0).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") % 23 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sentence_idx").alias("n_contaminated_sentences")
        )
    )


@_q(
    "nfc_fingerprints",
    """
    SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5 FROM documents
    """,
    doc="Unicode NFC normalization (Arrow unicodedata kernel — the "
    "pre-hash step multilingual exact dedup needs) fingerprinted per "
    "doc; DuckDB's native nfc_normalize is the oracle, so the hash "
    "match pins byte-exact normalization parity",
)
def nfc_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import normalize_unicode

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return normalize_unicode(docs, "text").select(
        "doc_id", F.md5("text").alias("nfc_md5")
    )


@_q(
    "unigram_quality_score",
    """
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM n),
    tok2 AS (SELECT * FROM tok WHERE length(term) > 0),
    stats AS (SELECT term, COUNT(*) AS tf FROM tok2 GROUP BY term),
    tot AS (SELECT CAST(SUM(tf) AS DOUBLE) AS total FROM stats),
    vocab AS (SELECT term, ln(tf / (SELECT total FROM tot)) AS lp
              FROM stats ORDER BY tf DESC, term LIMIT 100)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(ROUND(SUM(COALESCE(v.lp,
                 ln(0.5 / (SELECT total FROM tot)))), 6) / COUNT(*), 6)
             AS avg_logprob
    FROM tok2 LEFT JOIN vocab v USING (term)
    GROUP BY doc_id
    """,
    doc="LM-free quality gate: mean unigram log-probability per doc "
    "(CCNet-style perplexity proxy) with a top-100 corpus vocab and an "
    "OOV floor of ln(0.5/total); rounded-sum averaging for engine "
    "float parity",
)
def unigram_quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import unigram_logprob_score

    docs = load(spark, sf_dir, "documents")
    out = unigram_logprob_score(docs, "doc_id", "text", vocab_size=100)
    return out


@_q(
    "bigram_perplexity",
    r"""
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      FROM documents),
    arrs AS (SELECT doc_id, string_split(nt, ' ') AS a FROM n),
    tok AS (SELECT doc_id, unnest(a) AS term FROM arrs),
    tok2 AS (SELECT * FROM tok WHERE length(term) > 0),
    uni AS (SELECT term, COUNT(*) AS tf FROM tok2 GROUP BY term),
    vocab AS (SELECT term FROM uni ORDER BY tf DESC, term LIMIT 100),
    vd AS (SELECT CAST(COUNT(DISTINCT CASE WHEN v.term IS NULL
                   THEN '<unk>' ELSE t.term END) AS DOUBLE) AS vd
           FROM tok2 t LEFT JOIN vocab v USING (term)),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(a) - 1, 0) + 1),
                         i -> {'w1': a[i], 'w2': a[i + 1]})) AS p
           FROM arrs),
    bg2 AS (SELECT doc_id, p.w1 AS w1r, p.w2 AS w2r FROM bg),
    bgm AS (SELECT doc_id,
                   CASE WHEN v1.term IS NULL THEN '<unk>' ELSE w1r END AS w1,
                   CASE WHEN v2.term IS NULL THEN '<unk>' ELSE w2r END AS w2
            FROM bg2 LEFT JOIN vocab v1 ON v1.term = bg2.w1r
                     LEFT JOIN vocab v2 ON v2.term = bg2.w2r),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c12
            FROM bgm GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c1 FROM bgm GROUP BY w1),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             ROUND(ROUND(SUM(ln((c12.c12 + 0.5)
                   / (c1.c1 + 0.5 * (SELECT vd FROM vd)))), 6)
                   / COUNT(*), 6) AS avg_logprob
      FROM bgm JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
      GROUP BY doc_id)
    SELECT doc_id, n_bigrams, avg_logprob,
           ROUND(exp(-avg_logprob), 2) AS perplexity
    FROM agg
    """,
    doc="bigram-LM quality gate (CCNet recipe, one rung above the "
    "unigram proxy): add-0.5-smoothed conditional bigram model over a "
    "top-100 closed vocab + <unk>, per-doc mean log p(w2|w1) and "
    "perplexity; bigrams come straight off each token array (no window, "
    "no position shuffle), model tables broadcast back",
)
def bigram_perplexity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import bigram_logprob_score

    docs = load(spark, sf_dir, "documents")
    return bigram_logprob_score(docs, "doc_id", "text", vocab_size=100)


@_q(
    "nb_language_selftrain",
    r"""
    WITH lab AS (
      SELECT doc_id, text,
             len(regexp_extract_all(lower(text), '\b(the|and|of|is|a)\b')) AS n_en,
             len(regexp_extract_all(lower(text), '\b(el|la|los|que|y)\b')) AS n_es,
             len(regexp_extract_all(lower(text), '\b(le|la|les|et|des)\b')) AS n_fr,
             len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS n_de
      FROM documents),
    lab2 AS (SELECT doc_id, text,
             CASE WHEN greatest(n_en, n_es, n_fr, n_de) = 0 THEN 'und'
                  WHEN n_en = greatest(n_en, n_es, n_fr, n_de) THEN 'en'
                  WHEN n_es = greatest(n_es, n_fr, n_de) THEN 'es'
                  WHEN n_fr = greatest(n_fr, n_de) THEN 'fr'
                  ELSE 'de' END AS label
             FROM lab),
    tok AS (SELECT doc_id, label,
                   unnest(string_split(trim(regexp_replace(lower(text),
                          '\s+', ' ', 'g')), ' ')) AS term
            FROM lab2),
    tok2 AS (SELECT * FROM tok WHERE length(term) > 0),
    tc AS (SELECT label, term, CAST(COUNT(*) AS DOUBLE) AS n
           FROM tok2 GROUP BY label, term),
    cs AS (SELECT label, CAST(COUNT(*) AS DOUBLE) AS n_docs
           FROM lab2 GROUP BY label),
    tt AS (SELECT label, SUM(n) AS n_tokens FROM tc GROUP BY label),
    vn AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS vn FROM tc),
    nd AS (SELECT SUM(n_docs) AS nd FROM cs),
    dtf AS (SELECT doc_id, label, term, CAST(COUNT(*) AS DOUBLE) AS tf
            FROM tok2 GROUP BY doc_id, label, term),
    cls AS (SELECT cs.label AS cls, ln(cs.n_docs / (SELECT nd FROM nd)) AS prior,
                   COALESCE(tt.n_tokens, 0) AS n_tokens
            FROM cs LEFT JOIN tt USING (label)),
    sc AS (SELECT d.doc_id, d.label, c.cls,
                  ROUND(c.prior + ROUND(SUM(d.tf * ln(
                        (COALESCE(m.n, 0) + 1.0)
                        / (c.n_tokens + 1.0 * (SELECT vn FROM vn)))), 6), 6)
                    AS score
           FROM dtf d CROSS JOIN cls c
           LEFT JOIN tc m ON m.label = c.cls AND m.term = d.term
           GROUP BY d.doc_id, d.label, c.cls, c.prior)
    SELECT doc_id, label, cls AS predicted, score FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, cls) AS rn
      FROM sc) WHERE rn = 1
    """,
    doc="distributed multinomial Naive Bayes, self-trained: heuristic "
    "marker lang-ID labels the corpus, two groupBy passes train the "
    "count model (class stats + sparse (label,term) counts), one "
    "broadcast model join + per-doc aggregate scores every document, "
    "argmax on the rounded log-posterior with class tiebreak — the "
    "fastText-style filter-training shape as pure aggregates",
)
def nb_language_selftrain_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import nb_self_train_language

    docs = load(spark, sf_dir, "documents")
    return nb_self_train_language(docs, "doc_id", "text")


@_q(
    "duplicate_spans",
    r"""
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM n),
    sh AS (SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                         i -> array_to_string(t[i:i+7], ' '))) AS span
           FROM toks)
    SELECT span,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM sh
    GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, span
    LIMIT 50
    """,
    doc="exact repeated 8-token spans across documents (the bounded "
    "groupBy core of suffix-array substring dedup, Lee et al.): span "
    "explode -> map-side-combined count/countDistinct -> "
    "TakeOrderedAndProject top-50; localizes boilerplate that document-"
    "level MinHash/SimHash can only flag wholesale",
)
def duplicate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import duplicate_spans

    docs = load(spark, sf_dir, "documents")
    return duplicate_spans(docs, "doc_id", "text", n=8, min_docs=2, k=50)


@_q(
    "incremental_dedup",
    """
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    d1 AS (SELECT * FROM n WHERE doc_id % 2 = 0),
    d2 AS (SELECT * FROM n WHERE doc_id % 2 = 1),
    w AS (SELECT nt, MIN(doc_id) AS doc_id FROM d2 GROUP BY nt)
    SELECT doc_id FROM w
    WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.nt = w.nt)
    """,
    doc="incremental exact dedup: batch 2 (odd ids) deduped within "
    "itself then anti-joined against batch 1's persisted content-key "
    "index — the production daily-increment shape: O(batch + index "
    "probe), never a corpus recompute",
)
def incremental_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import incremental_exact_dedup

    docs = load(spark, sf_dir, "documents")
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    day2 = docs.filter(F.col("doc_id") % 2 == 1)
    _, keys1 = incremental_exact_dedup(day1, None, "doc_id", ["text"])
    survivors, _ = incremental_exact_dedup(day2, keys1, "doc_id", ["text"])
    return survivors


@_q(
    "incremental_minhash",
    """
    WITH RECURSIVE norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 2, 1) + 1),
             i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b FROM pairs0
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5),
    e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
           WHERE id_a % 2 = 1 AND id_b % 2 = 1
           UNION ALL
           SELECT id_b, id_a FROM pairs
           WHERE id_a % 2 = 1 AND id_b % 2 = 1),
    reach(node, label) AS (
      SELECT a, a FROM e2
      UNION
      SELECT e2.b, reach.label FROM reach JOIN e2 ON e2.a = reach.node),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    within AS (
      SELECT doc_id FROM norm WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT node FROM comp WHERE node <> component)),
    cross_dup AS (
      SELECT DISTINCT CASE WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS doc_id
      FROM pairs WHERE (id_a % 2) <> (id_b % 2))
    SELECT doc_id FROM within
    WHERE doc_id NOT IN (SELECT doc_id FROM cross_dup)
    """,
    doc="incremental NEAR-dup dedup: batch 2 (odd ids) deduped within "
    "itself via MinHash-candidate + exact-verify clusters, then filtered "
    "against batch 1's persisted (band, bh) index — per-increment cost "
    "is one signature pass + one band hash-join, with the index updated "
    "append-only. Oracle = exact-Jaccard semantics (within-batch "
    "min-id survivors minus cross-day near-dups): the hash match pins "
    "BOTH banding recall (every true cross-day dup collides) and "
    "precision (no false band collision drops a clean doc) on this "
    "corpus, not just row counts",
)
def incremental_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import incremental_minhash_dedup, minhash_band_index

    docs = load(spark, sf_dir, "documents")
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    day2 = docs.filter(F.col("doc_id") % 2 == 1)
    idx = minhash_band_index(day1, "doc_id", "text")
    survivors, _ = incremental_minhash_dedup(
        day2, idx, "doc_id", "text", threshold=0.5
    )
    return survivors.select("doc_id")


@_q(
    "weighted_sample_sources",
    """
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ln((('0x' || substring(
                     md5(doc_id::VARCHAR || chr(31) || '42'), 1, 15))::BIGINT
                 + 1.0) / (1152921504606846976.0 + 1.0)) / n_chars AS k
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
    ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY k DESC, doc_id) AS rn
      FROM keyed)
    SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 5
    """,
    doc="Efraimidis-Spirakis weighted sampling without replacement: "
    "top-5 docs per source with inclusion probability proportional to "
    "n_chars; u is md5-derived so the SAMPLE ITSELF is deterministic "
    "and engine-portable — DuckDB rebuilds identical exponential keys "
    "and the hash match pins the exact sampled row set",
)
def weighted_sample_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import weighted_sample

    docs = load(spark, sf_dir, "documents")
    return weighted_sample(
        docs.select("source", "doc_id", "n_chars"),
        "doc_id",
        "n_chars",
        k=5,
        group_col="source",
        seed=42,
    )


@_q(
    "decontaminate_bloom",
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 4, 1) + 1),
             i -> array_to_string(t[i:i+4], ' ')))) AS s FROM toks),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 23 = 0)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams,
           TRUE AS bloom_ok
    FROM sh WHERE s IN (SELECT s FROM bench)
    GROUP BY doc_id
    """,
    doc="Bloom-filter decontamination audit: the bit-array path (a "
    "~1.8 B/gram broadcast vs tens of bytes per gram string) must flag "
    "a SUPERSET of the exact path per doc — bloom_ok pins the "
    "no-false-negative guarantee doc-by-doc, and the exact columns "
    "are value-checked against DuckDB",
)
def decontaminate_bloom_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import decontaminate, decontaminate_bloom

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    exact = decontaminate(docs, bench, "doc_id", "text", n=5)
    bloom = decontaminate_bloom(docs, bench, "doc_id", "text", n=5)
    return exact.join(bloom, "doc_id", "left").select(
        "doc_id",
        "n_contaminated_grams",
        (
            F.col("n_flagged_grams").isNotNull()
            & (F.col("n_flagged_grams") >= F.col("n_contaminated_grams"))
        ).alias("bloom_ok"),
    )


@_q(
    "partial_copy_pairs",
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    grams AS (
      SELECT doc_id, i AS pos,
             ('0x' || substring(md5(substring(nt, i, 25)), 1, 15))::BIGINT AS h
      FROM norm, UNNEST(range(1, greatest(length(nt) - 24, 1) + 1)) AS t(i)),
    wins AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 25 FOLLOWING) AS fp,
             COUNT(*) OVER (PARTITION BY doc_id) AS ng
      FROM grams),
    fps AS (SELECT DISTINCT doc_id, fp FROM wins
            WHERE pos <= greatest(ng - 25, 1))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
    doc="winnowing (MOSS) partial-copy detection: char-25-gram hashes, "
    "window-26 min selection (any 50+ char shared span guaranteed "
    "caught), pairs sharing >= 2 fingerprints — catches excerpts "
    "whole-document digests and Jaccard thresholds miss. The md5_60 "
    "portable gram hash lets DuckDB rebuild the identical fingerprint "
    "sets, so the full pipeline is oracle-checked end-to-end",
)
def partial_copy_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import partial_copy_pairs

    docs = load(spark, sf_dir, "documents")
    return partial_copy_pairs(
        docs, "doc_id", "text", min_shared=2, hash_fn="md5_60"
    )


@_q(
    "multimodal_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS asset_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_count,
           sha256(text) AS sha256
    FROM documents
    """,
    doc="multimodal binary-column plumbing: UTF-8 payloads through the "
    "mapInPandas feature extractor (decode stubbed; Arrow batch shape, "
    "schema, and hashing real) — feature vector checked in pytest",
)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import extract_media_features, media_from_text

    docs = load(spark, sf_dir, "documents")
    media = media_from_text(docs, "doc_id", "text")
    return extract_media_features(media).select("asset_id", "byte_count", "sha256")


@_q(
    "events_windowed",
    """
    SELECT CAST(date_trunc('hour', ts::TIMESTAMP) AS TIMESTAMP) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           ROUND(SUM(value), 6) AS total_value,
           ROUND(ROUND(SUM(value), 6) / COUNT(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc="1-hour tumbling-window rollup over the event stream table — the "
    "batch twin of streaming/stats_stream.py (same semantics, proven "
    "equivalent in tests)",
    headline=True,
)
def events_windowed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        load_events(spark, sf_dir)
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("event_count"),
            F.sum("value").alias("total_value"),
        )
        # avg derived from the ROUNDED sum: summation order differs
        # between engines by ulps, and a raw AVG can land exactly on a
        # 6-decimal rounding boundary (observed at sf0.1: .4728125);
        # rounding the sum first (inputs have 2 decimals — ulp noise
        # is 13 orders below the boundary) makes the division
        # bit-identical on both sides
        .withColumn(
            "avg_value", F.round(F.round("total_value", 6) / F.col("event_count"), 6)
        )
    )
    return round6(df, "total_value")


@_q(
    "sessionization",
    """
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
    lagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM lagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           ROUND(SUM(value), 6) AS total_value
    FROM sess GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization (30-min gap): lag -> flag -> running-sum "
    "session ids, one shuffle shared by both windows and the rollup; "
    "streaming twin in operators/sessions.py (applyInPandasWithState)",
    headline=True,
)
def sessionization_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sessions import session_stats

    ev = load_events(spark, sf_dir)
    df = session_stats(ev, ["user_id"], "ts", gap="30 minutes", value_col="value")
    return round6(df, "total_value")


@_q(
    "sessionization_split",
    """
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
    lagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM lagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           ROUND(SUM(value), 6) AS total_value
    FROM sess GROUP BY user_id, session_id
    """,
    doc="skew-split sessionization (split='auto': per-(key, time-bucket) "
    "windows + boundary-session stitch) vs the SAME plain-window DuckDB "
    "oracle as `sessionization` — the cross-engine proof that the "
    "whale-key path is value-identical, not just path-equality-tested",
)
def sessionization_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sessions import session_stats

    ev = load_events(spark, sf_dir)
    df = session_stats(
        ev, ["user_id"], "ts", gap="30 minutes", value_col="value",
        split="auto", split_buckets=16,
    )
    return round6(df, "total_value")


@_q(
    "distinct_users_hll",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users_exact,
           TRUE AS hll_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="mergeable HLL distinct-user rollup (DataSketches, 4KB/group): "
    "per (event_type, day) sketches merged up to event_type without "
    "rescanning. Audit output: the exact distinct count (oracle "
    "content) plus hll_within_5pct — the sketch estimate vs exact, "
    "bounded at 5% relative error (tests/test_tree_sketch.py proves "
    "the bound; a sketch regression flips the boolean and fails the "
    "driver hash check)",
)
def distinct_users_hll_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import hll_merge_rollup, hll_rollup

    ev = load_events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    fine = hll_rollup(ev, ["event_type", "day"], "user_id")
    est = hll_merge_rollup(fine, ["event_type"]).select(
        "event_type", F.col("distinct_estimate").alias("__est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "distinct_users_exact",
        (
            F.abs(F.col("__est") - F.col("distinct_users_exact"))
            / F.col("distinct_users_exact")
            <= 0.05
        ).alias("hll_within_5pct"),
    )


#: the BM25 oracle recomputes the full Okapi formula from raw text;
#: shared by bm25_rank (direct scorer) and bm25_rank_indexed (scores
#: from a prebuilt postings/stats index — same truth by construction)
_BM25_SQL = """
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks,
             len(string_split_regex(trim(text), '\\s+')) AS dl
      FROM documents),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM docs),
    tf AS (
      SELECT doc_id, dl, t, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, dl, UNNEST(toks) AS t FROM docs)
      WHERE t IN ('data', 'model', 'training')
      GROUP BY doc_id, dl, t),
    dfreq AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t)
    SELECT tf.doc_id,
           ROUND(SUM(
             ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))
           ), 6) AS bm25
    FROM tf JOIN dfreq USING (t) CROSS JOIN stats s
    GROUP BY tf.doc_id
    """


@_q(
    "bm25_rank",
    _BM25_SQL,
    doc="Okapi BM25 lexical ranking for a fixed 3-term query over the "
    "documents corpus: postings filtered to query terms BEFORE any "
    "shuffle, df/N/avgdl broadcast back, one groupBy for the score; "
    "no top-k cut so the result set is boundary-deterministic for the "
    "cross-engine hash",
)
def bm25_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import bm25_scores

    docs = load(spark, sf_dir, "documents")
    return bm25_scores(docs, "doc_id", "text", ["data", "model", "training"])


@_q(
    "bm25_rank_indexed",
    _BM25_SQL,
    doc="BM25 from a prebuilt postings/stats index (build_bm25_index + "
    "bm25_from_index) — the repeated-retrieval shape at 100 TB: a "
    "persisted term-partitioned postings table turns each query into a "
    "|terms|-partition scan instead of a corpus scan. Same oracle as "
    "bm25_rank: the index path must reproduce the direct scorer "
    "bit-for-bit at 6 decimals",
)
def bm25_rank_indexed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import bm25_from_index, build_bm25_index

    docs = load(spark, sf_dir, "documents")
    postings, stats = build_bm25_index(docs, "doc_id", "text")
    return bm25_from_index(
        postings, stats, "doc_id", ["data", "model", "training"]
    )


#: the hybrid-RRF oracle recomputes BOTH legs exactly (BM25 formula +
#: brute cosine) and the fusion; shared by the exact query and the
#: bucketed-ANN audit twin (which compares the same exact fusion and
#: folds the bucketed leg's recall into an audited boolean)
_HYBRID_RRF_SQL = """
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks,
             len(string_split_regex(trim(text), '\\s+')) AS dl
      FROM documents),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM docs),
    tf AS (
      SELECT doc_id, dl, t, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, dl, UNNEST(toks) AS t FROM docs)
      WHERE t IN ('data', 'model', 'training')
      GROUP BY doc_id, dl, t),
    dfreq AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t),
    bm AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))
             ), 6) AS bm25
      FROM tf JOIN dfreq USING (t) CROSS JOIN stats s
      GROUP BY tf.doc_id),
    lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
      FROM bm QUALIFY lex_rank <= 20),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    cos AS (
      SELECT e.vec_id AS doc_id,
             ROUND(list_cosine_similarity(q.qv, e.v), 6) AS sim
      FROM e CROSS JOIN q WHERE e.vec_id <> 0),
    ann AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY sim DESC, doc_id) AS ann_rank
      FROM cos QUALIFY ann_rank <= 20)
    SELECT COALESCE(lex.doc_id, ann.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / (60 + lex_rank), 0)
                 + COALESCE(1.0 / (60 + ann_rank), 0), 6) AS rrf,
           CAST(COALESCE(lex_rank, -1) AS BIGINT) AS lex_rank,
           CAST(COALESCE(ann_rank, -1) AS BIGINT) AS ann_rank
    FROM lex FULL OUTER JOIN ann USING (doc_id)
    """


def _hybrid_exact_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-cosine top-20 for query doc 0 — the hybrid ANN leg's
    correctness baseline, shared by the exact and bucketed variants."""
    from .operators.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb,
        emb.filter(F.col("vec_id") == 0),
        "vec_id",
        "embedding",
        "vec_id",
        k=20,
    )


@_q(
    "hybrid_search_rrf",
    _HYBRID_RRF_SQL,
    doc="hybrid retrieval: BM25 lexical top-20 fused with brute-cosine "
    "ANN top-20 (query doc 0) via reciprocal rank fusion (k=60) — the "
    "families composed end-to-end; ranks computed over ROUNDED scores "
    "with id tie-breaks so the rank integers are engine-deterministic",
)
def hybrid_search_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import rrf_fuse
    from .operators.text import bm25_scores

    docs = load(spark, sf_dir, "documents")
    lex = bm25_scores(docs, "doc_id", "text", ["data", "model", "training"])
    return rrf_fuse(lex, _hybrid_exact_ann(spark, sf_dir), k=20)


@_q(
    "hybrid_search_rrf_lsh",
    f"SELECT base.*, TRUE AS ann_recall_ok FROM ({_HYBRID_RRF_SQL}) base",
    doc="hybrid retrieval with the BUCKETED ANN leg (sign-LSH, the "
    "100 TB path — production call: retrieval.hybrid_search(ann='lsh')): "
    "the compared frame is the exact fusion the oracle can recompute, "
    "with the LSH leg's top-20 recall vs the brute leg folded into "
    "ann_recall_ok (>=10/20 pinned TRUE oracle-side) — the "
    "similarity_topk_lsh audit pattern applied to the composition",
)
def hybrid_search_rrf_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import rrf_fuse, topk_id_recall
    from .operators.similarity import lsh_topk
    from .operators.text import bm25_scores

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    exact = _hybrid_exact_ann(spark, sf_dir)
    approx = lsh_topk(
        emb, emb.filter(F.col("vec_id") == 0), "vec_id", "embedding", "vec_id", k=20
    )
    flag = topk_id_recall(exact, approx, min_hits=10).withColumnRenamed(
        "recall_ok", "ann_recall_ok"
    )
    lex = bm25_scores(docs, "doc_id", "text", ["data", "model", "training"])
    return rrf_fuse(lex, exact, k=20).crossJoin(F.broadcast(flag))


@_q(
    "document_chunks",
    """
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, toks,
             GREATEST(1, CAST(CEIL((len(toks) - 8) / 24.0) AS BIGINT)) AS k
      FROM t),
    e AS (SELECT doc_id, toks, len(toks) AS n,
                 UNNEST(range(k)) AS chunk_id FROM c)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(toks[(chunk_id*24+1):(chunk_id*24+32)], ' ')
             AS chunk_text,
           CAST(LEAST(32, n - chunk_id*24) AS BIGINT) AS chunk_token_count
    FROM e
    """,
    doc="sliding-window document chunking (32-token windows, 8-token "
    "overlap): sequence/transform/slice + ONE posexplode — no UDF, no "
    "shuffle, chunks stream narrow off the scan; oracle rebuilds the "
    "same windows with DuckDB list slicing",
)
def document_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", chunk_tokens=32, overlap=8)


@_q(
    "fuzzy_name_pairs",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_distance
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    doc="entity resolution: EXACT Levenshtein<=1 pairs over customer "
    "names via SymSpell deletion-neighborhood candidates (|s|+1 posting "
    "rows per string, bucket-equality join, exact verify) — the oracle "
    "is DuckDB's brute-force O(n^2) levenshtein cross join, so the "
    "candidate generation's completeness is value-checked, not assumed",
)
def fuzzy_name_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import edit_distance_pairs

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_name")
    )
    return edit_distance_pairs(cust, "c_custkey", "c_name").select(
        F.col("id_a"), F.col("id_b"), F.col("edit_distance")
    )


@_q(
    "quantile_rollup_kll",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,
           ROUND(quantile_cont(value, 0.9), 6) AS p90_exact,
           TRUE AS kll_rank_ok
    FROM events GROUP BY event_type
    """,
    doc="mergeable KLL quantile rollup: per-(event_type, day) sketches "
    "merged to event_type WITHOUT rescanning raw data; kll_rank_ok pins "
    "the merged estimate's EXACT rank within p±0.05 (k=200 → ~1.65% "
    "rank error), so a sketch/merge regression flips the value hash",
)
def quantile_rollup_kll_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import kll_merge_rollup, kll_rollup

    ev = load_events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    fine = kll_rollup(ev, ["event_type", "day"], "value")
    merged = kll_merge_rollup(fine, ["event_type"], probabilities=(0.5, 0.9))
    ests = merged.select("event_type", "p50_est", "p90_est")
    ranked = (
        ev.join(F.broadcast(ests), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.5), 6).alias("p50_exact"),
            F.round(F.percentile("value", 0.9), 6).alias("p90_exact"),
            F.avg((F.col("value") <= F.col("p50_est")).cast("double")).alias(
                "__r50"
            ),
            F.avg((F.col("value") <= F.col("p90_est")).cast("double")).alias(
                "__r90"
            ),
        )
    )
    return ranked.select(
        "event_type",
        "p50_exact",
        "p90_exact",
        (
            (F.abs(F.col("__r50") - 0.5) <= 0.05)
            & (F.abs(F.col("__r90") - 0.9) <= 0.05)
        ).alias("kll_rank_ok"),
    )


@_q(
    "segment_overlap_theta",
    """
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS clickers_exact,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS purchasers_exact,
           (SELECT CAST(COUNT(*) AS BIGINT)
              FROM c JOIN p USING (user_id)) AS overlap_exact,
           TRUE AS theta_within_5pct
    """,
    doc="Theta-sketch segment overlap (clickers ∩ purchasers): set "
    "algebra HLL can't do — intersection/difference estimated from two "
    "KB-sized sketches without co-locating the raw distinct sets; "
    "theta_within_5pct pins |A|, |B| and |A∩B| estimates against the "
    "exact join (5% rel. tolerance, exact-mode sketches below lg_k)",
)
def segment_overlap_theta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import theta_overlap

    ev = load_events(spark, sf_dir)
    est = theta_overlap(ev, "event_type", "user_id", "click", "purchase")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchasers = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    exact = (
        clickers.agg(F.count("*").alias("clickers_exact"))
        .crossJoin(purchasers.agg(F.count("*").alias("purchasers_exact")))
        .crossJoin(
            clickers.join(purchasers, "user_id").agg(
                F.count("*").alias("overlap_exact")
            )
        )
    )
    rel_ok = (
        lambda est_c, ex_c: F.abs(est_c - ex_c) <= 0.05 * F.greatest(ex_c, F.lit(1))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "clickers_exact",
        "purchasers_exact",
        "overlap_exact",
        (
            rel_ok(F.col("a_est"), F.col("clickers_exact"))
            & rel_ok(F.col("b_est"), F.col("purchasers_exact"))
            & rel_ok(F.col("intersection_est"), F.col("overlap_exact"))
        ).alias("theta_within_5pct"),
    )


@_q(
    "dsir_importance_weights",
    r"""
    WITH n AS (SELECT doc_id, lang,
                      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
               FROM documents),
    arrs AS (SELECT doc_id, lang, string_split(nt, ' ') AS a FROM n),
    uni AS (SELECT doc_id, lang, unnest(a) AS g FROM arrs),
    bi AS (SELECT doc_id, lang,
                  unnest(list_transform(range(1, greatest(len(a) - 1, 0) + 1),
                         i -> a[i] || ' ' || a[i + 1])) AS g
           FROM arrs),
    grams AS (SELECT * FROM uni WHERE length(g) > 0
              UNION ALL SELECT * FROM bi WHERE length(g) > 0),
    b AS (SELECT doc_id, (lang = 'en') AS tgt,
                 ('0x' || substring(md5(g), 1, 15))::BIGINT % 256 AS bk
          FROM grams),
    counts AS (SELECT bk, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tc,
                      COUNT(*) AS rc
               FROM b GROUP BY bk),
    tot AS (SELECT SUM(tc) AS t, SUM(rc) AS r FROM counts),
    ratio AS (SELECT bk, ROUND(ln((tc + 1.0) / (t + 256))
                             - ln((rc + 1.0) / (r + 256)), 6) AS lr
              FROM counts, tot)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           ROUND(SUM(lr), 6) AS dsir_logratio
    FROM b JOIN ratio USING (bk) GROUP BY doc_id
    """,
    doc="DSIR importance weights (Xie et al., NeurIPS 2023): hashed "
    "unigram+bigram features (portable md5_60 % 256 buckets), add-1 "
    "smoothed bucket probabilities, per-doc sum of target-vs-raw "
    "log-ratios with lang='en' as the target slice — the importance-"
    "resampling scorer that upweights documents n-gram-similar to the "
    "target domain. One gram explode feeds both the KB-sized bucket "
    "table (broadcast back) and the per-doc sum; full formula "
    "recomputed cross-engine including the hash",
)
def dsir_importance_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import dsir_logratio

    docs = load(spark, sf_dir, "documents")
    return dsir_logratio(
        docs, "doc_id", "text", target=F.col("lang") == "en", buckets=256
    )


@_q(
    "scd2_order_status_dim",
    """
    WITH u0 AS (
      SELECT o_custkey AS k, o_orderdate AS ts, MIN(o_orderstatus) AS status
      FROM orders GROUP BY 1, 2),
    chain AS (
      SELECT c_custkey AS k, TIMESTAMP '1970-01-01' AS ts,
             'NEW' AS status, 0 AS prio
      FROM customer
      UNION ALL SELECT k, ts, status, 1 FROM u0),
    collapsed AS (
      SELECT k, ts, status, prio FROM (
        SELECT k, ts, status, prio,
               lag(status) OVER (PARTITION BY k ORDER BY ts, prio) AS prev
        FROM chain)
      WHERE prev IS NULL OR prev <> status)
    SELECT k AS c_custkey, status, ts AS valid_from,
           lead(ts) OVER (PARTITION BY k ORDER BY ts, prio) AS valid_to,
           lead(ts) OVER (PARTITION BY k ORDER BY ts, prio) IS NULL
             AS is_current
    FROM collapsed
    """,
    doc="SCD type-2 dimension maintenance: the reference's INSERT OR "
    "REPLACE upsert (script.py:265) destroys history — scd2_apply "
    "keeps it, closing the open version at each attribute change and "
    "opening a new one (valid_from/valid_to/is_current), with "
    "deterministic same-instant tie-break, consecutive-duplicate "
    "collapse, and late-update drop. Seeded from customer (open 'NEW' "
    "rows at epoch) + every order's (custkey, orderdate, status) as "
    "the update stream; full versioned snapshot compared cross-engine",
)
def scd2_order_status_dim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scd import scd2_apply

    current = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        F.lit("NEW").alias("status"),
        F.to_timestamp(F.lit("1970-01-01")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("effective_ts"),
    )
    return scd2_apply(current, updates, ["c_custkey"], ["status"])


@_q(
    "heavy_hitters_mg",
    """
    WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS exact_count
               FROM documents GROUP BY lang),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT lang, exact_count, TRUE AS present_ok, TRUE AS bound_ok
    FROM c, n WHERE exact_count > n / 4.0
    """,
    doc="Misra-Gries heavy hitters (capacity 3 over documents.lang): "
    "mergeable per-partition summaries (mapInPandas, <=capacity "
    "counters each) merged by counter-sum + trim — P x capacity "
    "summary rows replace the exact GROUP BY's full distinct-key "
    "shuffle at 100 TB. The audit emits every value whose TRUE "
    "frequency exceeds N/(capacity+1) (the MG presence guarantee) "
    "with its exact count; present_ok pins the sketch surfacing it, "
    "bound_ok pins est <= true <= est + N/(capacity+1) "
    "(Agarwal et al., Mergeable Summaries, PODS 2012)",
)
def heavy_hitters_mg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import freq_items_mg

    docs = load(spark, sf_dir, "documents")
    capacity = 3
    mg = freq_items_mg(docs, "lang", capacity)
    exact = docs.groupBy("lang").agg(F.count("*").alias("exact_count"))
    n = docs.agg(F.count("*").alias("__n"))
    guaranteed = exact.crossJoin(F.broadcast(n)).filter(
        F.col("exact_count") > F.col("__n") / (capacity + 1.0)
    )
    return (
        guaranteed.join(mg.withColumnRenamed("est_count", "__est"), "lang", "left")
        .select(
            "lang",
            "exact_count",
            F.col("__est").isNotNull().alias("present_ok"),
            (
                F.col("__est").isNotNull()
                & (F.col("__est") <= F.col("exact_count"))
                & (
                    F.col("exact_count") - F.col("__est")
                    <= F.col("__n") / (capacity + 1.0)
                )
            ).alias("bound_ok"),
        )
    )


@_q(
    "interval_session_join",
    """
    WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type
               FROM events),
    clicks AS (SELECT user_id, ts FROM e WHERE event_type = 'click'),
    lagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM clicks WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM lagged),
    bounds AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM sess GROUP BY user_id, session_id)
    SELECT e.event_id, e.user_id, e.event_type, e.ts,
           b.session_id, b.session_start
    FROM e JOIN bounds b
      ON e.user_id = b.user_id
     AND e.ts BETWEEN b.session_start AND b.session_end
    """,
    doc="composition: click-only sessionization -> interval join assigning "
    "EVERY event type into its user's click-session window; the range "
    "join runs as bucket-equality hash join + exact BETWEEN post-filter "
    "(no nested-loop product)",
)
def interval_session_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.rangejoin import interval_join
    from .operators.sessions import session_stats

    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    bounds = session_stats(clicks, ["user_id"], "ts", gap="30 minutes").select(
        "user_id", "session_id", "session_start", "session_end"
    )
    points = ev.select("event_id", "user_id", "event_type", "ts")
    return interval_join(
        points, bounds, on=["user_id"], point_ts="ts",
        start_ts="session_start", end_ts="session_end", bucket="1 hour",
    ).select(
        "event_id", "user_id", "event_type", "ts", "session_id", "session_start"
    )


@_q(
    "asof_next_purchase",
    """
    WITH clicks AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
                    FROM events WHERE event_type = 'click'),
    purchases AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events
                  WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts,
           ROUND(p.value, 6) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
    doc="FORWARD as-of join: each click matched to the user's NEXT "
    "purchase at-or-after it (conversion attribution) — same single "
    "union+carry window plan as the backward form with only the sort "
    "direction flipped; oracle is DuckDB's native forward ASOF JOIN",
)
def asof_next_purchase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["ts", "value"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_right").alias("purchase_ts"),
        F.round("value_right", 6).alias("purchase_value"),
    )


@_q(
    "asof_split",
    """
    WITH clicks AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
                    FROM events WHERE event_type = 'click'),
    purchases AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events
                  WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts,
           ROUND(p.value, 6) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
    doc="skew-split as-of join (split='auto': per-(key, time-bucket) "
    "carry windows + synthetic carry-in rows) vs DuckDB's native ASOF "
    "JOIN — same oracle as `asof_next_purchase`, proving the hot-key "
    "path value-identical cross-engine",
)
def asof_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["ts", "value"],
        direction="forward",
        split="auto",
        split_buckets=16,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_right").alias("purchase_ts"),
        F.round("value_right", 6).alias("purchase_value"),
    )


@_q(
    "asof_attribution",
    """
    WITH clicks AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
                    FROM events WHERE event_type = 'click'),
    views AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events
              WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, c.ts,
           v.ts AS view_ts,
           ROUND(v.value, 6) AS view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    doc="as-of join (attribution: each click matched to the user's most "
    "recent prior view) via the linear union + carry-forward-window "
    "trick — ONE shuffle over |L|+|R|, no quadratic theta-join; oracle "
    "is DuckDB's native ASOF JOIN",
    headline=True,
)
def asof_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("value").alias("view_value")
    )
    out = asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="view_ts",
        value_cols=["view_ts", "view_value"],
    )
    return out.select(
        "event_id", "user_id", "ts", "view_ts",
        F.round("view_value", 6).alias("view_value"),
    )


@_q(
    "events_json",
    """
    SELECT event_type,
           AVG(CAST(json_extract(props, '$.k') AS BIGINT)) AS avg_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
    doc="semi-structured props extraction (get_json_object) + rollup",
)
def events_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_events(spark, sf_dir)
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.avg("k").alias("avg_k"), F.max("k").alias("max_k"))
    )


@_q(
    "topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    doc="per-group head (row_number <= k) — vectorized form of the "
    "reference's per-post comment cap (script.py:167, SURVEY O5)",
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import top_k_per_group

    orders = load(spark, sf_dir, "orders").withColumn(
        "__ord", F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("nk"))
    )
    return top_k_per_group(
        orders, ["o_orderpriority"], "__ord", 3
    ).select("o_orderpriority", "o_orderkey", "o_totalprice")


@_q(
    "curation_pipeline_full",
    """
    WITH RECURSIVE prof AS (
      SELECT doc_id, source, text,
             len(regexp_split_to_array(trim(text), '\\s+')) AS tc,
             length(regexp_replace(text, '[\\w\\s]', '', 'g')) * 1.0
                 / length(text) AS pr,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    kept AS (SELECT doc_id, source, tc, nt FROM prof
             WHERE tc >= 20 AND pr <= 0.1),
    ex AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY nt),
    k2 AS (SELECT k.* FROM kept k JOIN ex USING (doc_id)),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM k2),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 2, 1) + 1),
             i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5
      UNION ALL
      SELECT id_b, id_a FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5),
    reach(n, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a),
    comp AS (SELECT n, MIN(r) AS component FROM reach GROUP BY n),
    surv AS (SELECT * FROM k2 WHERE doc_id NOT IN
             (SELECT n FROM comp WHERE component <> n)),
    g5 AS (SELECT s.doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t.t) - 4, 1) + 1),
             i -> array_to_string(t.t[i:i+4], ' ')))) AS g
           FROM surv s JOIN toks t USING (doc_id)),
    bt AS (SELECT doc_id, string_split(nt, ' ') AS t FROM prof
           WHERE doc_id % 23 = 0),
    bench5 AS (SELECT DISTINCT unnest(list_distinct(list_transform(
                 range(1, greatest(len(t) - 4, 1) + 1),
                 i -> array_to_string(t[i:i+4], ' ')))) AS g FROM bt),
    cont AS (SELECT DISTINCT doc_id FROM g5
             WHERE g IN (SELECT g FROM bench5)),
    clean AS (SELECT * FROM surv WHERE doc_id NOT IN
              (SELECT doc_id FROM cont)),
    binned AS (
      SELECT source, tc,
             CAST(floor(COALESCE(SUM(tc) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 2000) AS BIGINT) AS bin
      FROM clean)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_kept,
           CAST(SUM(tc) AS BIGINT) AS token_budget,
           CAST(COUNT(DISTINCT bin) AS BIGINT) AS n_bins
    FROM binned GROUP BY source
    """,
    doc="the FULL training-data sweep as one Spark plan: quality gate "
    "(length + punctuation ratio) -> exact dedup -> near-dup cluster "
    "removal (Jaccard>=0.5, min-id survivor) -> benchmark "
    "decontamination (5-gram, doc_id%23 bench) -> per-source token "
    "budget + packed 2000-token bin count; every stage is an operator "
    "oracle-verified standalone, composed here end-to-end",
)
def curation_pipeline_full_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import decontaminate, pack_sequences
    from .operators.dedup import exact_dedup, ngram_jaccard_pairs
    from .operators.graph import connected_components, dedup_survivors
    from .operators.text import punct_count_col, token_count_col

    docs = load(spark, sf_dir, "documents")
    kept = (
        docs.withColumn("tc", token_count_col("text"))
        .withColumn("pr", punct_count_col("text") / F.length("text"))
        .filter((F.col("tc") >= 20) & (F.col("pr") <= 0.1))
        .select("doc_id", "source", "text", "tc")
    )
    k2 = kept.join(
        exact_dedup(kept, "doc_id", ["text"]).select("doc_id"), "doc_id",
        "left_semi",
    )
    pairs = ngram_jaccard_pairs(k2, "doc_id", "text", n=3, threshold=0.5)
    comps = connected_components(pairs, "id_a", "id_b")
    surv = dedup_survivors(k2, comps, "doc_id")
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    contaminated = decontaminate(surv, bench, "doc_id", "text", n=5)
    clean = surv.join(contaminated.select("doc_id"), "doc_id", "left_anti")
    packed = pack_sequences(
        clean.select("doc_id", "source", "tc"), "doc_id", "tc", 2000, "source"
    )
    return (
        clean.join(packed.select("doc_id", "bin"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("docs_kept"),
            F.sum("tc").cast("long").alias("token_budget"),
            F.countDistinct("bin").alias("n_bins"),
        )
    )


@_q(
    "curation_pipeline",
    """
    WITH prof AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS tc,
             length(regexp_replace(text, '[\\w\\s]', '', 'g')) * 1.0
                 / length(text) AS pr,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    kept AS (SELECT doc_id, tc, nt FROM prof WHERE tc >= 20 AND pr <= 0.1),
    dedup AS (SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS dup_count,
                     MIN(tc) AS tc
              FROM kept GROUP BY nt)
    SELECT CAST(COUNT(*) AS BIGINT)  AS docs_kept,
           CAST(SUM(tc) AS BIGINT)   AS token_budget,
           CAST(SUM(dup_count) - COUNT(*) AS BIGINT) AS dups_removed
    FROM dedup
    """,
    doc="composed curation pipeline: quality gate (length + punctuation "
    "ratio) -> exact content dedup -> corpus token budget, one Spark plan "
    "— the end-to-end training-data sweep shape",
    headline=True,
)
def curation_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_dedup
    from .operators.text import punct_count_col, token_count_col

    docs = load(spark, sf_dir, "documents")
    kept = (
        docs.withColumn("tc", token_count_col("text"))
        .withColumn("pr", punct_count_col("text") / F.length("text"))
        .filter((F.col("tc") >= 20) & (F.col("pr") <= 0.1))
    )
    survivors = exact_dedup(kept, "doc_id", ["text"]).join(
        kept.select("doc_id", "tc"), "doc_id"
    )
    return survivors.agg(
        F.count("*").alias("docs_kept"),
        F.sum("tc").alias("token_budget"),
        (F.sum("dup_count") - F.count("*")).cast("long").alias("dups_removed"),
    )


@_q(
    "distinct_parts_skewfree",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="exact COUNT(DISTINCT) via the two-phase skew-free pattern "
    "(distinct on (group, value) spreads hot groups across the cluster "
    "before the per-group count) — operators/skew.py",
)
def distinct_parts_skewfree_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_count_distinct

    li = load(spark, sf_dir, "lineitem")
    return salted_count_distinct(
        li, ["l_returnflag"], "l_partkey", alias="distinct_parts"
    )


@_q(
    "rollup_hierarchy",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS item_count,
           -- VARCHAR roundtrip: DuckDB's direct decimal->double is
           -- double(hugeint)/10^scale (two roundings, off by 1 ulp
           -- once the unscaled value passes 2^53); string->double is
           -- correctly rounded and matches Spark's BigDecimal cast
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS VARCHAR) AS DOUBLE)
             AS total_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (flag -> flag+status -> grand total) in "
    "one pass — the partial-aggregation tree Spark shares across "
    "grouping sets (beyond the reference's flat GROUP BYs)",
)
def rollup_hierarchy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    df = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("item_count"),
            # exact decimal: the grand-total row sums all lineitem
            # (3.2e10 at sf0.1)
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "item_count",
            "total_price",
        )
    )
    # no round6: the decimal sum casts to the exact value's nearest
    # double on both engines — quantization has nothing left to do
    return df


@_q(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
    doc="pivot (status columns per priority) with explicit pivot values — "
    "no extra pass to discover categories",
)
def pivot_status_by_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .fillna(0)
    )


@_q(
    "topk_global",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
    doc="global top-k with total tiebreak — plans as TakeOrderedAndProject "
    "(per-partition heaps, no full sort; reference nlargest script.py:312)",
)
def topk_global_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@_q(
    "group_percentiles",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="EXACT per-group percentiles (linear interpolation, matching "
    "DuckDB quantile_cont) — the exact complement to the GK approx-"
    "quantile sketch in operators/sketch.py; at 100 TB prefer the "
    "sketch, audit with this",
)
def group_percentiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "lineitem")
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.percentile("l_extendedprice", 0.25), 6).alias("p25"),
            F.round(F.percentile("l_extendedprice", 0.50), 6).alias("p50"),
            F.round(F.percentile("l_extendedprice", 0.75), 6).alias("p75"),
        )
    )


@_q(
    "ntile_quartiles",
    """
    WITH tiled AS (
      SELECT o_orderpriority, o_totalprice,
             ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders)
    SELECT o_orderpriority, CAST(quartile AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM tiled GROUP BY o_orderpriority, quartile
    """,
    doc="ntile(4) cohort bucketing per priority (deterministic via total "
    "tiebreak on o_orderkey) + per-bucket stats — the W-family operator "
    "the 15-query surface lacks (RANK/argmax are covered by q15/q02)",
)
def ntile_quartiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        df.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@_q(
    "neardup_components",
    """
    WITH RECURSIVE norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 2, 1) + 1),
             i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5
      UNION ALL
      SELECT id_b, id_a FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5),
    reach(n, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a)
    SELECT n AS doc_id, CAST(MIN(r) AS BIGINT) AS component
    FROM reach GROUP BY n
    """,
    doc="near-dup CLUSTERS from exact Jaccard>=0.5 pairs via iterative "
    "min-label propagation (diameter-bounded rounds, (node,label)-only "
    "shuffles, localCheckpoint lineage truncation); oracle = transitive "
    "closure by recursive CTE",
)
def neardup_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    comps = connected_components(pairs, "id_a", "id_b")
    return comps.select(F.col("node").alias("doc_id"), "component")


@_q(
    "neardup_survivors",
    """
    WITH RECURSIVE norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 2, 1) + 1),
             i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5
      UNION ALL
      SELECT id_b, id_a FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5),
    reach(n, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a),
    comp AS (SELECT n, MIN(r) AS component FROM reach GROUP BY n)
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT n FROM comp WHERE component <> n)
    """,
    doc="end-to-end near-dup removal: cluster by exact Jaccard>=0.5, "
    "keep the min-id representative per cluster + all singletons "
    "(anti-join on ids, no broadcast hint — loser set is O(corpus) at "
    "web duplicate rates, AQE picks the strategy)",
)
def neardup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import connected_components, dedup_survivors

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    comps = connected_components(pairs, "id_a", "id_b")
    return dedup_survivors(docs, comps, "doc_id").select("doc_id")


@_q(
    "funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 24 HOURS
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL 24 HOURS
      GROUP BY e.user_id),
    lags AS (
      SELECT c.user_id,
             epoch_us(c.t2) - epoch_us(v.t1) AS lag2,
             epoch_us(p.t3) - epoch_us(c.t2) AS lag3
      FROM v JOIN c ON v.user_id = c.user_id
      LEFT JOIN p ON c.user_id = p.user_id)
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS event, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(NULL AS DOUBLE) AS avg_lag_us FROM v
      UNION ALL
      SELECT 2, 'click', CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(lag2) * 1.0 / COUNT(lag2), 6) FROM lags
      UNION ALL
      SELECT 3, 'purchase', CAST(COUNT(t3) AS BIGINT),
             ROUND(SUM(lag3) * 1.0 / COUNT(lag3), 6) FROM lags LEFT JOIN p
             ON lags.user_id = p.user_id WHERE t3 IS NOT NULL)
    """,
    doc="3-step ordered funnel (view -> click -> purchase, each within "
    "24h of the prior step): per-step min-timestamp aggregates chained "
    "by user-key joins; lags in exact integer microseconds so the "
    "averages are summation-order-independent",
)
def funnel_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.join(v, "user_id")
        .filter(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    lags = (
        v.join(c, "user_id")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            (F.unix_micros("t2") - F.unix_micros("t1")).alias("lag2"),
            (F.unix_micros("t3") - F.unix_micros("t2")).alias("lag3"),
        )
    )
    s1 = v.agg(
        F.lit(1).alias("step"), F.lit("view").alias("event"),
        F.count("*").alias("n_users"),
        F.lit(None).cast("double").alias("avg_lag_us"),
    )
    s2 = lags.agg(
        F.lit(2).alias("step"), F.lit("click").alias("event"),
        F.count("*").alias("n_users"),
        F.round(F.sum("lag2") / F.count("lag2"), 6).alias("avg_lag_us"),
    )
    s3 = lags.filter(F.col("lag3").isNotNull()).agg(
        F.lit(3).alias("step"), F.lit("purchase").alias("event"),
        F.count("*").alias("n_users"),
        F.round(F.sum("lag3") / F.count("lag3"), 6).alias("avg_lag_us"),
    )
    return s1.unionByName(s2).unionByName(s3)


@_q(
    "retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT e.user_id, f.cohort_date,
             date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT cohort_date, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active WHERE day_offset <= 7
    GROUP BY cohort_date, day_offset
    """,
    doc="cohort retention matrix: first-seen date per user, distinct "
    "active (user, day-offset) pairs, counts per (cohort, offset<=7); "
    "one user-key shuffle reused by both aggregates",
)
def retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    active = (
        ev.join(firsts, "user_id")
        .select(
            "user_id", "cohort_date",
            F.datediff("d", "cohort_date").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
    )
    return active.groupBy("cohort_date", F.col("day_offset").cast("long").alias("day_offset")).agg(
        F.count("*").alias("n_users")
    )


@_q(
    "table_profile",
    """
    SELECT 'o_orderkey' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
    doc="one-pass data profiling: per-column row/null/exact-distinct "
    "counts + min/max in a single scan (one aggregate, inline unpivot "
    "of the 1-row result) — the first query against any new data drop",
)
def table_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import column_profile

    orders = load(spark, sf_dir, "orders")
    return column_profile(
        orders, ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    )


@_q(
    "packed_shards",
    """
    WITH t AS (
      SELECT doc_id, source, text,
             len(regexp_split_to_array(trim(text), '\\s+')) AS tokens
      FROM documents),
    b AS (
      SELECT doc_id, source, text, tokens,
             CAST(floor(COALESCE(SUM(tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 2000) AS BIGINT) AS bin
      FROM t)
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS total_tokens,
           string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS text
    FROM b GROUP BY source, bin
    """,
    doc="materialized training shards: pack_sequences bins joined back "
    "to text and concatenated in pack order (array_sort of (order, "
    "text) structs — no second window); the payload a trainer consumes",
)
def packed_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import materialize_packed_text
    from .operators.text import token_count_col

    docs = load(spark, sf_dir, "documents").withColumn(
        "tokens", token_count_col("text")
    )
    return materialize_packed_text(
        docs, "doc_id", "text", "tokens", budget=2000, group_col="source"
    )


@_q(
    "pack_sequences",
    """
    WITH t AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(trim(text), '\\s+')) AS tokens
      FROM documents),
    b AS (
      SELECT source, tokens,
             CAST(floor(COALESCE(SUM(tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 500) AS BIGINT) AS bin
      FROM t)
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS total_tokens
    FROM b GROUP BY source, bin
    """,
    doc="next-fit sequence packing into 500-token training bins, "
    "parallel per source shard (window cumsum, no sequential loop); "
    "output is the per-bin fill profile",
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import pack_sequences
    from .operators.text import token_count_col

    docs = load(spark, sf_dir, "documents").withColumn(
        "tokens", token_count_col("text")
    )
    packed = pack_sequences(docs, "doc_id", "tokens", 500, "source")
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("long").alias("total_tokens"),
    )


@_q(
    "repetition_profile",
    """
    WITH base AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS l
      FROM documents),
    grams AS (
      SELECT doc_id, l,
             list_transform(range(1, greatest(len(l) - 1, 1) + 1),
               i -> array_to_string(l[i:i+1], ' ')) AS bg,
             list_transform(range(1, greatest(len(l) - 2, 1) + 1),
               i -> array_to_string(l[i:i+2], ' ')) AS tg
      FROM base),
    stats AS (
      SELECT doc_id,
             CAST(len(l) AS BIGINT) AS n_tokens,
             ROUND(1.0 - len(list_distinct(l)) * 1.0 / len(l), 6)
               AS dup_unigram_frac,
             ROUND(list_max(list_transform(list_distinct(bg),
                     d -> len(list_filter(bg, x -> x = d)))) * 1.0 / len(bg), 6)
               AS top_bigram_frac,
             ROUND(1.0 - len(list_distinct(tg)) * 1.0 / len(tg), 6)
               AS dup_trigram_frac
      FROM grams)
    SELECT doc_id, n_tokens, dup_unigram_frac, top_bigram_frac,
           dup_trigram_frac,
           (dup_unigram_frac <= 0.6 AND top_bigram_frac <= 0.18
            AND dup_trigram_frac <= 0.4) AS passes_repetition
    FROM stats
    """,
    doc="Gopher-style within-document repetition filters (dup unigram/"
    "trigram fraction, top-bigram share): per-row higher-order array "
    "functions, zero explode, zero shuffle — embarrassingly parallel "
    "over the scan",
)
def repetition_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import repetition_profile

    docs = load(spark, sf_dir, "documents")
    return repetition_profile(docs, "doc_id", "text")


@_q(
    "boilerplate_fraction",
    """
    WITH base AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS l
      FROM base_docs),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(l) - 2, 1) + 1),
               i -> array_to_string(l[i:i+2], ' '))) AS grams
      FROM base),
    g AS (
      SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM sh),
    bp AS (
      SELECT gram, 1 AS is_bp
      FROM (SELECT gram, COUNT(*) AS doc_freq FROM g GROUP BY gram)
      WHERE doc_freq >= 3)
    SELECT g.doc_id,
           CAST(MAX(g.n_grams) AS BIGINT) AS n_grams,
           CAST(COALESCE(SUM(bp.is_bp), 0) AS BIGINT) AS n_boilerplate,
           ROUND(COALESCE(SUM(bp.is_bp), 0) * 1.0 / MAX(g.n_grams), 6)
             AS boilerplate_frac
    FROM g LEFT JOIN bp ON g.gram = bp.gram
    GROUP BY g.doc_id
    """.replace("base_docs", "documents"),
    doc="per-document boilerplate contamination: corpus 3-grams present "
    "in >=3 docs (distinct-per-doc explode -> partial-agg count) "
    "broadcast back against each document's gram set; two scans, no "
    "corpus shuffle in the probe pass",
)
def boilerplate_fraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import boilerplate_fraction

    docs = load(spark, sf_dir, "documents")
    return boilerplate_fraction(docs, "doc_id", "text", n=3, min_docs=3)


@_q(
    "mixture_weights",
    """
    WITH t AS (
      SELECT source,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                  AS BIGINT) AS tokens
      FROM documents GROUP BY source),
    w AS (
      SELECT source, tokens,
             ROUND(pow(tokens, 0.7)
                   / SUM(pow(tokens, 0.7)) OVER (), 6) AS weight
      FROM t)
    SELECT source, tokens, weight,
           ROUND(1000000 * weight / tokens, 6) AS epochs
    FROM w
    """,
    doc="temperature-scaled training-mixture weights per source "
    "(w = tokens^0.7 / sum tokens^0.7) + implied epochs for a 1M-token "
    "budget: corpus collapses to |sources| rows before the tiny "
    "single-partition normalizer window",
)
def mixture_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import mixture_weights
    from .operators.text import token_count_col

    docs = load(spark, sf_dir, "documents").withColumn(
        "tokens", token_count_col("text")
    )
    return mixture_weights(
        docs, "source", "tokens", temperature=0.7, target_tokens=1_000_000
    )


@_q(
    "segment_dedup_docs",
    """
    WITH ws AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE text IS NOT NULL),
    segs AS (
      SELECT doc_id, g - 1 AS pos,
             array_to_string(w[(g-1)*10+1 : (g-1)*10+10], ' ') AS seg
      FROM ws, LATERAL (
        SELECT UNNEST(generate_series(
          1, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS g) t),
    marked AS (
      SELECT doc_id, pos, seg,
             COUNT(*) OVER (PARTITION BY k) AS occ,
             ROW_NUMBER() OVER (PARTITION BY k
                                ORDER BY doc_id, pos) AS rn
      FROM (SELECT doc_id, pos, seg,
                   lower(trim(regexp_replace(seg, '\\s+', ' ', 'g'))) AS k
            FROM segs)),
    rebuilt AS (
      SELECT doc_id,
             COALESCE(string_agg(seg, ' ' ORDER BY pos)
                      FILTER (WHERE occ = 1 OR rn = 1), '')
               AS text_deduped,
             CAST(COUNT(*) AS BIGINT) AS n_segments,
             CAST(COUNT(*) FILTER (WHERE occ > 1 AND rn > 1) AS BIGINT)
               AS n_removed
      FROM marked GROUP BY doc_id)
    SELECT d.doc_id, r.text_deduped,
           CAST(COALESCE(r.n_segments, 0) AS BIGINT) AS n_segments,
           CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """,
    doc="CCNet-style corpus-wide segment dedup with document "
    "reassembly (operators/dedup.py:segment_dedup): every 10-word "
    "window hashed across the WHOLE corpus, duplicated segments keep "
    "only the globally first (doc_id, pos) occurrence, and each "
    "document is stitched back together from its surviving segments "
    "in order. Document text never shuffles: pass 1 moves only "
    "(id, pos, xxhash64) tuples, the kill list regroups into one "
    "small removed-positions array per affected doc, and a final "
    "id-equi-join + map-side higher-order filter rebuilds the text "
    "at the scan site — two hash-sized shuffles + one id join at any "
    "corpus size",
    headline=True,
)
def segment_dedup_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import segment_dedup

    docs = load(spark, sf_dir, "documents")
    return segment_dedup(
        docs, "doc_id", "text", words_per_segment=10, keep="first"
    )


_KCORE_ITER = """
    k{i} AS MATERIALIZED (
      SELECT a FROM e{p} GROUP BY a
      HAVING COUNT(*) >= (SELECT k FROM kk)),
    e{i} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{p} e
      JOIN k{i} x ON e.a = x.a
      JOIN k{i} y ON e.b = y.a)"""

_KCORE_ORACLE = (
    """
    WITH ed AS MATERIALIZED (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
                      's:' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    e0 AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT src AS a, dst AS b FROM ed
        UNION
        SELECT dst AS a, src AS b FROM ed)
      WHERE a <> b),
    kk AS MATERIALIZED (
      SELECT GREATEST((COUNT(*) // COUNT(DISTINCT a)) * 9 // 16, 1)
        AS k FROM e0),"""
    + ",".join(
        _KCORE_ITER.format(i=i, p=i - 1) for i in range(1, 5)
    )
    + """
    SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM e4 GROUP BY a
    """
)


@_q(
    "kcore_cust_supp",
    _KCORE_ORACLE,
    doc="k-core of the undirected customer-supplier co-purchase graph "
    "(operators/graph.py:kcore) at a DATA-DERIVED threshold "
    "k = (2E div N) * 9 div 16 —9/16 of the integer mean degree, "
    "which peels a meaningful fraction of nodes at every SF instead "
    "of pinning a magic constant that goes trivial as density grows. "
    "4 fixed peel rounds, each dropping every node with fewer than k "
    "surviving neighbors plus its edges; peeling is idempotent at its "
    "fixpoint, so a fixed round count is bit-deterministic and "
    "oracle-replayable (the fixed-iteration PageRank/HITS "
    "discipline). Per round: one map-side-combined degree agg + two "
    "semi-joins, all shuffles on (node, node) pairs; the edge frame "
    "shrinks monotonically and lineage is cut every round",
)
def kcore_cust_supp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import kcore

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    # data-derived threshold: 9/16 of the integer mean degree of the
    # undirected simple graph, in the same integer arithmetic the
    # oracle uses ((2E div N) * 9 div 16) — one tiny scalar action
    # before the peel loop
    und = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).union(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).filter(F.col("a") != F.col("b")).distinct()
    row = und.agg(
        F.count("*").alias("e2"), F.count_distinct("a").alias("n")
    ).first()
    # clamp to 1: a graph with integer mean degree 1 would derive
    # k=0, which kcore rejects while the oracle would keep all nodes
    k = max((row["e2"] // row["n"]) * 9 // 16, 1)
    return kcore(edges, k=k, rounds=4)


@_q(
    "decayed_engagement",
    """
    WITH ev AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
             value, event_id
      FROM events),
    mx AS (SELECT MAX(ts_s) AS now FROM ev),
    dec AS (
      SELECT user_id,
             ROUND(SUM(value * POWER(
               0.5, ((SELECT now FROM mx) - ts_s) / 604800.0)), 6)
               AS decayed_value,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM ev GROUP BY user_id),
    r AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts_s, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM ev),
    ew AS (
      SELECT user_id,
             ROUND(SUM(CASE WHEN rn = 1 THEN POWER(0.7, n - 1) * value
                            ELSE 0.3 * POWER(0.7, n - rn) * value END),
                   6) AS ewma
      FROM r GROUP BY user_id)
    SELECT d.user_id, d.decayed_value, d.n_events, e.ewma
    FROM dec d JOIN ew e USING (user_id)
    """,
    doc="recency-weighted engagement per user "
    "(operators/series.py:decayed_sum + ewma_last): half-life decay "
    "(one-week, 0.5^(age/hl) on integer-second ages) gives the "
    "trending score, and the closed-form EWMA (alpha=0.3, seeded at "
    "the first observation, every exponent nonnegative so weights "
    "only shrink — no rescaled-window blowup on long series) gives "
    "the smoothed current level. Each is one map-side-combined "
    "groupBy / one key-partitioned window over a single shuffle; the "
    "as-of instant is MAX(ts), injectable (D3)",
)
def decayed_engagement_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import decayed_sum, ewma_last

    ev = load_events(spark, sf_dir)
    dec = decayed_sum(
        ev, "user_id", "ts", "value", half_life_s=7 * 86400
    )
    # order the EWMA on FLOORED seconds + event_id, exactly like the
    # oracle: ordering by the sub-second ts would rank same-second
    # events by microseconds where the oracle ranks them by event_id
    # — a latent cross-engine divergence (floor-of-epoch rule)
    ew = ewma_last(
        ev.withColumn("ts_s", F.floor(F.unix_timestamp("ts"))),
        "user_id",
        ["ts_s", "event_id"],
        "value",
        alpha=0.3,
    )
    return dec.join(ew.select("user_id", "ewma"), "user_id")


@_q(
    "events_sliding_distinct",
    """
    WITH ev AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
      FROM events),
    wins AS (
      SELECT user_id, ((t // 1800) - i) * 1800 AS ws
      FROM ev CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS i) g
      WHERE ((t // 1800) - i) * 1800 > t - 7200)
    SELECT make_timestamp(ws * 1000000) AS window_start,
           make_timestamp((ws + 7200) * 1000000) AS window_end,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM wins GROUP BY ws
    """,
    doc="2-hour windows hopping every 30 minutes over the event stream "
    "(operators/series.py:sliding_window_rollup): every event lands "
    "in exactly 4 windows (F.window replicates rows into covering "
    "windows BEFORE the shuffle), each window counts exact distinct "
    "users + events — one map-side-combined groupBy at a bounded 4x "
    "replication; at higher duration/slide ratios the agg switches "
    "to the mergeable HLL sketch so copies stay bytes, not id sets. "
    "Window assignment on integer-second boundaries matches the "
    "floor-of-epoch oracle exactly (window starts are multiples of "
    "the slide)",
)
def events_sliding_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import sliding_window_rollup

    ev = load_events(spark, sf_dir)
    return sliding_window_rollup(
        ev,
        "ts",
        "2 hours",
        "30 minutes",
        [
            F.count_distinct("user_id").cast("long").alias("distinct_users"),
            F.count("*").cast("long").alias("n_events"),
        ],
    )


@_q(
    "entity_golden_parts",
    """
    WITH RECURSIVE names AS (
      SELECT DISTINCT p_name FROM part),
    pairs AS (
      SELECT a.p_name AS id_a, b.p_name AS id_b
      FROM names a
      JOIN names b
        ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
       AND a.p_name < b.p_name
      WHERE ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6)
            >= 0.88),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach(n, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a),
    comp AS (SELECT n, MIN(r) AS root FROM reach GROUP BY n),
    labeled AS (
      SELECT pt.p_name, pt.p_retailprice, pt.p_size,
             COALESCE(c.root, pt.p_name) AS cluster
      FROM part pt LEFT JOIN comp c ON pt.p_name = c.n)
    SELECT cluster,
           CAST(COUNT(DISTINCT p_name) AS BIGINT) AS n_variants,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS avg_price,
           CAST(MAX(p_size) AS BIGINT) AS max_size
    FROM labeled GROUP BY cluster
    """,
    doc="entity resolution to GOLDEN RECORDS over the part catalog "
    "(operators/graph.py:resolve_entities): Jaro-Winkler blocked "
    "pairs (>= 0.88, first-token blocking — never the cross product) "
    "become clusters by min-label connected components, singletons "
    "keep their own id, and each cluster collapses to one canonical "
    "row (variant count, member count, stable-avg price, max size). "
    "Survivorship is caller-supplied aggregates, not baked-in "
    "policy; CC shuffles (node,label) pairs only and records join "
    "the label table once",
)
def entity_golden_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import jw_blocked_pairs
    from .operators.graph import resolve_entities

    part = load(spark, sf_dir, "part")
    names = (
        part.select("p_name")
        .distinct()
        .select(F.col("p_name").alias("name_id"), "p_name")
    )
    pairs = jw_blocked_pairs(names, "name_id", "p_name", threshold=0.88)
    return resolve_entities(
        part,
        "p_name",
        pairs.select("id_a", "id_b"),
        [
            F.count_distinct("p_name").cast("long").alias("n_variants"),
            F.count("*").cast("long").alias("n_parts"),
            stable_avg("p_retailprice").alias("avg_price"),
            F.max("p_size").cast("long").alias("max_size"),
        ],
    )


@_q(
    "bloom_semi_lineitem",
    """
    WITH keys AS (
      SELECT DISTINCT o_orderkey FROM orders
      JOIN customer ON o_custkey = c_custkey
      WHERE c_nationkey = 0)
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
           TRUE AS bloom_exact,
           TRUE AS bloom_pruned
    FROM lineitem JOIN keys ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
    doc="Bloom-pruned semi-join (operators/skew.py:bloom_semi_join): "
    "lineitem rows restricted to nation-0 customers' orders. The "
    "filter builds DISTRIBUTED (per-64-bit-word BIT_OR aggregation; "
    "driver/broadcast memory = bits/8 bytes by PARAMETER, never key "
    "count), broadcasts once, and an Arrow kernel drops non-matching "
    "rows AT THE SCAN before any shuffle; the surviving sliver exact-"
    "verifies through a plain semi-join, so the result equals the "
    "un-pruned semi-join bit-for-bit. Audit booleans baked into the "
    "hash: bloom_exact = pruned+verified equals the plain semi-join "
    "row count; bloom_pruned = the no-verify stream's false positives "
    "stay within 5x the analytic (1-e^(-kn/bits))^k rate applied to "
    "the PROBE side — a bound that holds at any SF because the "
    "filter is sized to the key count (16 bits/key, >= 2^20) and the "
    "allowance scales with the rows actually probed (no false "
    "negatives by construction)",
)
def bloom_semi_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _math

    from .operators.skew import bloom_semi_join, build_bloom

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    keys = (
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"]
        )
        .filter(F.col("c_nationkey") == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # size the filter to the key count (16 bits/key, >= 2^20) so the
    # FP rate stays ~constant as SF grows, and build it ONCE — the
    # same (arr, bits, k) serves the probe and both audits
    n_keys = keys.count()
    bits = 1 << max(20, _math.ceil(_math.log2(max(16 * n_keys, 2))))
    filt = build_bloom(keys, "l_orderkey", bits=bits, k=5)
    pruned = bloom_semi_join(
        lineitem, keys, "l_orderkey", verify=False, prebuilt=filt
    ).localCheckpoint(eager=False)
    got = pruned.join(keys, "l_orderkey", "semi")
    # audits: exactness vs the plain semi-join, and pruning power —
    # the FP allowance scales with the PROBE side (expected FPs =
    # fp_rate x non-matching rows), not the match count, so the bound
    # holds at any SF; 5x headroom over the analytic rate
    exact_n = lineitem.join(keys, "l_orderkey", "semi").count()
    big_n = lineitem.count()
    got_n = got.count()
    pruned_n = pruned.count()
    fp_rate = (1.0 - _math.exp(-5.0 * n_keys / bits)) ** 5
    bloom_exact = bool(got_n == exact_n)
    bloom_pruned = bool(
        pruned_n <= exact_n + 5.0 * fp_rate * big_n + 64
    )
    return got.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("l_quantity").cast("long").alias("total_qty"),
        F.lit(bloom_exact).alias("bloom_exact"),
        F.lit(bloom_pruned).alias("bloom_pruned"),
    )


@_q(
    "events_daily_melt",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(*) FILTER (WHERE event_type = 'error')
                  AS BIGINT) AS n_errors
      FROM events GROUP BY 1)
    SELECT day, metric, value
    FROM daily UNPIVOT (value FOR metric IN (n_events, n_users, n_errors))
    """,
    doc="wide-to-long reshape (melt / UNPIVOT) of the daily event "
    "rollup via Spark's native unpivot: the tidy-data long form "
    "metric stores and plotting layers consume. Zero extra shuffle — "
    "unpivot is a narrow row-expansion (x3 here) on top of the "
    "rollup's one aggregate exchange; ids stay columns, measure "
    "names become data",
)
def events_daily_melt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("n_errors"),
    )
    return daily.unpivot(
        ["day"], ["n_events", "n_users", "n_errors"], "metric", "value"
    )


@_q(
    "tpch_q1_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           -- VARCHAR roundtrips: the scale-6 sum_charge's UNSCALED
           -- value passes 2^53 around sf0.2, where DuckDB's direct
           -- decimal->double (double(hugeint)/10^scale, two
           -- roundings) drifts 1 ulp from Spark's correctly-rounded
           -- BigDecimal cast; string->double is correctly rounded
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                     AS VARCHAR) AS DOUBLE)
             AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(3,2)))
                     AS VARCHAR) AS DOUBLE)
             AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(3,2))
                    * CAST(1 + l_tax AS DECIMAL(3,2)))
                     AS VARCHAR) AS DOUBLE)
             AS sum_charge,
           ROUND(ROUND(SUM(l_quantity), 6) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary over lineitem: the canonical "
    "wide-aggregate scan — one map-side-combined groupBy on two "
    "low-cardinality keys, the ship-date filter pushed to the scan. "
    "Money sums accumulate as EXACT decimals (a double sum of the "
    "3-factor charge reaches ~2.3e10 at sf0.1, where ulp ~5e-6 makes "
    "the 6th decimal order-dependent; DECIMAL(12,2) x DECIMAL(3,2) "
    "products stay within 38-digit exact arithmetic on both engines) "
    "and only the final identical value casts to double; averages "
    "divide the exact sum in double (round-sum-then-divide rule)",
)
def tpch_q1_pricing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("2001-09-01").cast("date")
    )
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    dfac = (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
    tfac = (F.lit(1) + F.col("l_tax")).cast("decimal(3,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.sum(ep).cast("double").alias("sum_base_price"),
        F.sum(ep * dfac).cast("double").alias("sum_disc_price"),
        F.sum(ep * dfac * tfac).cast("double").alias("sum_charge"),
        F.round(
            F.round(F.sum("l_quantity"), 6) / F.count("*"), 6
        ).alias("avg_qty"),
        F.round(
            F.sum(ep).cast("double") / F.count("*"), 6
        ).alias("avg_price"),
        F.round(
            F.sum(F.col("l_discount").cast("decimal(3,2)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_disc"),
        F.count("*").cast("long").alias("count_order"),
    )


@_q(
    "tpch_q3_priority",
    """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
             AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '2000-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '2000-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: segment-filtered 3-way join "
    "(customer filter pushed to the scan; customer/orders sides "
    "shrink before the lineitem join, AQE free to broadcast the "
    "filtered build side), revenue rollup per open order, global "
    "top-10 via TakeOrderedAndProject with a full deterministic "
    "tie-break (revenue desc, date, orderkey)",
)
def tpch_q3_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("2000-03-15").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("2000-03-15").cast("date")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            "l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                6,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@_q(
    "tpch_q5_region",
    """
    SELECT n.n_name,
           -- VARCHAR roundtrip = correctly-rounded decimal->double
           -- (matches Spark; DuckDB's direct cast drifts 1 ulp past
           -- an unscaled 2^53)
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l.l_discount AS DECIMAL(3,2)))
                     AS VARCHAR) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 local-supplier volume: the 6-way star join — "
    "region/nation/supplier collapse to broadcastable dims, the "
    "local-supplier condition (customer and supplier share a nation) "
    "rides the lineitem join, date range pushed to the orders scan; "
    "one final map-side-combined rollup per nation",
)
def tpch_q5_region_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            # exact decimal product sum: nation-level revenue reaches
            # ~1e9 at sf0.1 where a double sum's 6th decimal is
            # order-dependent (the tpch_q1 discipline)
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@_q(
    "tpch_q4_priority_exists",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS -> LEFT SEMI join "
    "(ref analysis.sql has no subquery forms; this closes the "
    "semi-join gap the Bloom variant approximates). The testdata "
    "lacks l_commitdate/l_receiptdate, so 'late' is adapted to "
    "l_returnflag='R' — the relational shape (date-filtered fact, "
    "dedup-free EXISTS via semi join, priority rollup) is the "
    "capability. Plan: the date filter pushes to the orders scan, "
    "the semi join shuffles only (orderkey) pairs and short-circuits "
    "per match — no DISTINCT materialization of the inner side",
)
def tpch_q4_priority_exists_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


@_q(
    "tpch_q18_large_orders",
    """
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_totalprice,
           CAST(q.total_qty AS BIGINT) AS total_qty
    FROM orders o
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300) q
      ON q.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY q.total_qty DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: large-volume orders — IN-subquery over a "
    "grouped HAVING, rewritten as a join against the aggregated "
    "keys (Catalyst's own rewrite of IN (SELECT..GROUP BY..HAVING)). "
    "Quantity sums are integers (exact in double); top-100 ordered "
    "desc with the unique orderkey tiebreak compiles to "
    "TakeOrderedAndProject — no global sort materializes. The "
    "having filter reduces the build side to ~1% of orders BEFORE "
    "either join; customer attaches last so only winners join it",
)
def tpch_q18_large_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    q = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(q, o["o_orderkey"] == q["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(100)
    )


@_q(
    "tpch_q21_waiting_supplier",
    """
    WITH l1 AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem WHERE l_returnflag = 'R'),
    lall AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lall l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: suppliers who kept orders waiting — the "
    "hardest classic relational pattern, a SEMI + ANTI self-join "
    "chain on the same fact ('another supplier contributed to this "
    "order' EXISTS, 'no other supplier was late on it' NOT EXISTS). "
    "Adapted to the testdata: 'late' = l_returnflag='R' (no "
    "commit/receipt dates). Both correlated subqueries compile to "
    "LEFT SEMI / LEFT ANTI joins on (orderkey, suppkey) pairs "
    "deduplicated FIRST — the shuffled payload is distinct pairs, "
    "never raw lineitem; the 100-row supplier dim broadcasts; the "
    "self-join inequality rides the orderkey equi-key. Top-20 with "
    "name tiebreak -> TakeOrderedAndProject",
    headline=True,
)
def tpch_q21_waiting_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    # ONE flagged pair aggregation expresses both subquery branches
    # (lall and its R-filtered subset)
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("__has_r")
    )
    lall = pairs.select("l_orderkey", "l_suppkey")
    l1 = pairs.filter(F.col("__has_r") == 1).select(
        "l_orderkey", "l_suppkey"
    )
    # SHUFFLE_HASH on the inner sides: broadcasting a fact-derived
    # pair set is the local-mode default here but impossible at
    # 100 TB; hashed shuffle joins co-partition all three branches on
    # l_orderkey — measured ~35% faster than the broadcast plan at
    # sf0.1 AND the only shape that survives scale
    l2 = lall.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    ).hint("shuffle_hash")
    l3 = l1.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    ).hint("shuffle_hash")
    cand = l1.join(
        l2,
        (l1["l_orderkey"] == l2["o2"]) & (l1["l_suppkey"] != l2["s2"]),
        "left_semi",
    ).join(
        l3,
        (l1["l_orderkey"] == l3["o3"]) & (l1["l_suppkey"] != l3["s3"]),
        "left_anti",
    )
    return (
        cand.join(F.broadcast(s), cand["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@_q(
    "event_value_bars",
    """
    WITH ev AS (
      SELECT event_type, event_id, value,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS t
      FROM events),
    r AS (
      SELECT event_type, value,
             t - (t % 21600) AS b,
             ROW_NUMBER() OVER (PARTITION BY event_type, t - (t % 21600)
                                ORDER BY t, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, t - (t % 21600)
                                ORDER BY t DESC, event_id DESC) AS rn_d
      FROM ev)
    SELECT event_type,
           make_timestamp(b * 1000000) AS bar_start,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume,
           ROUND(SUM(value), 6) AS total
    FROM r GROUP BY event_type, b
    """,
    doc="6-hour OHLC bars per event type "
    "(operators/series.py:resample_bars): open/high/low/close/volume "
    "via pure min_by/max_by aggregates over a (floored-second, "
    "event_id) total order — ONE map-side-combined groupBy, no window "
    "pass at all (the oracle spells the same semantics with "
    "row-number windows since DuckDB's arg_min lacks composite "
    "ordering). The downsampling shape metric stores and market-data "
    "rollups use",
)
def event_value_bars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import resample_bars

    ev = load_events(spark, sf_dir)
    return resample_bars(
        ev, "event_type", "ts", "value", bucket_seconds=21600,
        tie_col="event_id",
    )


@_q(
    "asof_nearest_alignment",
    """
    WITH u AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
             1 AS is_left, event_id, CAST(NULL AS DOUBLE) AS rv
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT), 0, NULL, value
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL),
    c AS (
      SELECT *,
             last_value(CASE WHEN is_left = 0
                             THEN {'t': t, 'rv': rv} END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY t, is_left, rv NULLS FIRST
                     ROWS UNBOUNDED PRECEDING) AS mb,
             last_value(CASE WHEN is_left = 0
                             THEN {'t': t, 'rv': rv} END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY t DESC, is_left, rv NULLS FIRST
                     ROWS UNBOUNDED PRECEDING) AS mf
      FROM u),
    pick AS (
      SELECT user_id, event_id, t,
             CASE WHEN mb IS NULL THEN mf
                  WHEN mf IS NULL THEN mb
                  WHEN (mf.t - t) < (t - mb.t) THEN mf
                  ELSE mb END AS m
      FROM c WHERE is_left = 1)
    SELECT user_id, event_id AS click_id, m.rv AS purchase_value,
           CAST(ABS(m.t - t) AS BIGINT) AS gap_s
    FROM pick
    """,
    doc="nearest-neighbor as-of alignment "
    "(operators/asof.py:asof_join(direction='nearest')): every click "
    "matched to the CLOSEST purchase of the same user on either side "
    "of the timeline (exact-distance ties go backward, the pandas "
    "merge_asof convention). Both carries run over ONE key "
    "partitioning — two window sorts, one shuffle, |L|+|R| rows, no "
    "candidate blowup; timestamps floored to seconds on both engines "
    "(floor-of-epoch rule)",
)
def asof_nearest_alignment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    sec = F.timestamp_seconds(F.floor(F.unix_timestamp("ts")))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", sec.alias("cts"), F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", sec.alias("pts"), F.col("value").alias("purchase_value")
    )
    # tie_cols: two purchases in the same floored second pick the
    # GREATEST value deterministically on both engines
    out = asof_join(
        clicks, purchases, ["user_id"], "cts", "pts", direction="nearest",
        value_cols=["purchase_value", "pts"], tie_cols=["purchase_value"],
    )
    return out.select(
        "user_id",
        "click_id",
        "purchase_value",
        F.abs(
            F.unix_timestamp("pts") - F.unix_timestamp("cts")
        ).cast("long").alias("gap_s"),
    )


@_q(
    "pit_order_status",
    """
    WITH u0 AS (
      SELECT o_custkey AS k, o_orderdate AS ts, MIN(o_orderstatus) AS status
      FROM orders GROUP BY 1, 2),
    chain AS (
      SELECT c_custkey AS k, TIMESTAMP '1970-01-01' AS ts,
             'NEW' AS status, 0 AS prio
      FROM customer
      UNION ALL SELECT k, ts, status, 1 FROM u0),
    collapsed AS (
      SELECT k, ts, status, prio FROM (
        SELECT k, ts, status, prio,
               lag(status) OVER (PARTITION BY k ORDER BY ts, prio) AS prev
        FROM chain)
      WHERE prev IS NULL OR prev <> status),
    dim AS (
      SELECT k AS c_custkey, status, ts AS valid_from,
             lead(ts) OVER (PARTITION BY k ORDER BY ts, prio) AS valid_to
      FROM collapsed)
    SELECT d.status AS status_at_order,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           -- VARCHAR roundtrip = correctly-rounded decimal->double
           -- (matches Spark; DuckDB's direct cast drifts 1 ulp past
           -- an unscaled 2^53)
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                     AS VARCHAR) AS DOUBLE)
             AS total_price
    FROM orders o JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND o.o_orderdate >= d.valid_from
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    GROUP BY d.status
    """,
    doc="point-in-time-correct SCD2 lookup "
    "(operators/scd.py:point_in_time_join): every order joins the "
    "customer-status VERSION valid at its order date — the "
    "feature-store primitive that prevents time travel (rows see the "
    "values that existed at event time, never later corrections). "
    "Implemented as the as-of backward carry on valid_from (one key "
    "shuffle, versions per key are non-overlapping so the latest "
    "start <= ts is the only candidate) + a map-side half-open "
    "validity check; the oracle runs the explicit interval join",
)
def pit_order_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scd import point_in_time_join, scd2_apply

    current = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        F.lit("NEW").alias("status"),
        F.to_timestamp(F.lit("1970-01-01")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("effective_ts"),
    )
    dim = scd2_apply(current, updates, ["c_custkey"], ["status"])
    facts = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderdate",
        "o_totalprice",
    )
    pit = point_in_time_join(
        facts, dim, ["c_custkey"], "o_orderdate", value_cols=["status"]
    )
    return pit.groupBy(F.col("status").alias("status_at_order")).agg(
        F.count("*").cast("long").alias("n_orders"),
        # exact DECIMAL accumulation: group sums reach ~1.25e9 where
        # a double sum's 6th decimal is order-dependent (ulp 2.4e-7,
        # ~1e-5 random-walk over 5e5 addends) — the r6 driver-env
        # hash FAIL. Both engines sum the same exact decimal, then
        # cast the identical value to double.
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@_q(
    "cdc_supplier_apply",
    """
    WITH ch AS (
      SELECT l_suppkey AS s_suppkey,
             l_orderkey * 10 + l_linenumber AS seq,
             CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
             ROUND(l_extendedprice, 6) AS new_bal
      FROM lineitem),
    latest AS (
      SELECT * FROM (
        SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY s_suppkey
                                        ORDER BY seq DESC) AS rn
        FROM ch) WHERE rn = 1),
    kept AS (
      SELECT s.s_suppkey, s.s_name, s.s_nationkey,
             ROUND(s.s_acctbal, 6) AS s_acctbal
      FROM supplier s
      WHERE NOT EXISTS (SELECT 1 FROM ch
                        WHERE ch.s_suppkey = s.s_suppkey)),
    upserts AS (
      SELECT s.s_suppkey, s.s_name, s.s_nationkey, l.new_bal AS s_acctbal
      FROM latest l JOIN supplier s ON s.s_suppkey = l.s_suppkey
      WHERE l.op <> 'D')
    SELECT * FROM kept UNION ALL SELECT * FROM upserts
    """,
    doc="change-data-capture apply (operators/scd.py:apply_cdc): a "
    "Debezium-style change batch (full row images + op + sequence) "
    "applied to the supplier snapshot — highest sequence per key "
    "wins, deletes drop the row, untouched keys pass through, and "
    "replaying the batch is idempotent. One window over the CHANGE "
    "batch (never the base), one anti join, one union; the demo "
    "derives changes from lineitem (latest line per supplier updates "
    "the balance; a returned last line deletes the supplier)",
)
def cdc_supplier_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scd import apply_cdc

    supplier = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey",
        F.round("s_acctbal", 6).alias("s_acctbal"),
    )
    li = load(spark, sf_dir, "lineitem")
    # one lineitem projection carries the full row image — no
    # self-join back for a column the same row already holds
    changes = li.select(
        F.col("l_suppkey").alias("s_suppkey"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("seq"),
        F.when(F.col("l_returnflag") == "R", "D").otherwise("U").alias("op"),
        F.round("l_extendedprice", 6).alias("s_acctbal"),
    ).join(
        supplier.select("s_suppkey", "s_name", "s_nationkey"), "s_suppkey"
    ).select("s_suppkey", "s_name", "s_nationkey", "s_acctbal", "op", "seq")
    return apply_cdc(supplier, changes, ["s_suppkey"], "seq")


@_q(
    "session_journeys",
    """
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id,
                      event_type FROM events),
    lagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) - 1
               AS session_id
      FROM lagged),
    j AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id)
               AS journey
      FROM sess GROUP BY user_id, session_id)
    SELECT journey,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j GROUP BY journey
    ORDER BY n_sessions DESC, journey LIMIT 20
    """,
    doc="journey mining (operators/sessions.py:session_journeys): the "
    "top within-session event-type SEQUENCES — path DISCOVERY where "
    "CEP counting answers only known patterns. Sessionize (one key "
    "shuffle shared by both windows), fold each session's ordered "
    "types into a '>'-joined path via sort_array(collect_list) — "
    "per-session memory, no corpus-wide state — then one "
    "map-side-combined journey count and a deterministic "
    "TakeOrderedAndProject top-20 (count desc, journey asc); "
    "same-timestamp steps tie-break on event_id in both engines",
)
def session_journeys_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sessions import session_journeys

    ev = load_events(spark, sf_dir)
    return session_journeys(
        ev, ["user_id"], "ts", "event_type",
        gap="30 minutes", top_k=20, tie_col="event_id",
    )


# Engine-portable synthetic coordinates: uniform-ish lat in [-60, 60)
# and lon in [-180, 180) from md5 top-60 bits of the entity key — the
# same md5_60 idiom every hash-derived oracle query uses, so DuckDB
# reproduces the exact doubles (modulo and division are the same IEEE
# ops on both engines).
def _synth_coord(key: str, salt: str, span_micro: int, offset: float):
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(span_micro)) / F.lit(1_000_000.0) - F.lit(offset)


_GEO_COORD_SQL = (
    "((('0x' || substring(md5(CAST({key} AS VARCHAR) || '{salt}'), 1, 15))"
    "::BIGINT % {span}) / 1000000.0 - {off})"
)


@_q(
    "geo_nearest_supplier",
    """
    WITH c AS (
      SELECT c_custkey,
             {clat} AS lat, {clon} AS lon
      FROM customer),
    s AS (
      SELECT s_suppkey,
             {slat} AS lat, {slon} AS lon
      FROM supplier),
    p AS (
      SELECT c.c_custkey, s.s_suppkey,
             ROUND(2 * 6371.0088 * ASIN(SQRT(LEAST(1.0,
               SIN(RADIANS(s.lat - c.lat) / 2) ^ 2
               + COS(RADIANS(c.lat)) * COS(RADIANS(s.lat))
                 * SIN(RADIANS(s.lon - c.lon) / 2) ^ 2))), 6)
               AS distance_km
      FROM c CROSS JOIN s),
    r AS (
      SELECT c_custkey, s_suppkey, distance_km,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY distance_km, s_suppkey) AS rn
      FROM p WHERE distance_km <= 1500.0)
    SELECT c_custkey, s_suppkey, distance_km, CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 2
    """.format(
        clat=_GEO_COORD_SQL.format(
            key="c_custkey", salt=":lat", span=120_000_000, off=60
        ),
        clon=_GEO_COORD_SQL.format(
            key="c_custkey", salt=":lon", span=360_000_000, off=180
        ),
        slat=_GEO_COORD_SQL.format(
            key="s_suppkey", salt=":lat", span=120_000_000, off=60
        ),
        slon=_GEO_COORD_SQL.format(
            key="s_suppkey", salt=":lon", span=360_000_000, off=180
        ),
    ),
    doc="grid-pruned spatial KNN join (operators/geo.py:grid_knn_join): "
    "each customer's 2 nearest suppliers within 1500 km by exact "
    "haversine on md5-synthesized coordinates. Spark generates "
    "candidates from a 3x3 degree-grid cell equi-join (9|L| + |R| "
    "cell-keyed rows shuffled, never the |L|x|R| product; lon cells "
    "wrap mod n so the +-180 seam is a plain neighbor) and ranks by "
    "(rounded-6 distance, s_suppkey); the DuckDB oracle is the "
    "EXHAUSTIVE cross join, so every row is also a completeness "
    "proof of the geometric prune bounds (d >= R|dphi|; "
    "d >= (2/pi) R cos(phimax) |dlambda|)",
)
def geo_nearest_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.geo import grid_knn_join

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        _synth_coord("c_custkey", ":lat", 120_000_000, 60.0).alias("lat"),
        _synth_coord("c_custkey", ":lon", 360_000_000, 180.0).alias("lon"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _synth_coord("s_suppkey", ":lat", 120_000_000, 60.0).alias("lat"),
        _synth_coord("s_suppkey", ":lon", 360_000_000, 180.0).alias("lon"),
    )
    return grid_knn_join(
        cust, supp, "c_custkey", "s_suppkey",
        radius_km=1500.0, k=2, max_abs_lat=60.0,
    )


@_q(
    "multitouch_channels",
    """
    WITH t AS (
      SELECT user_id, ts::TIMESTAMP AS touch_ts, event_id AS touch_id,
             event_type AS channel
      FROM events WHERE event_type IN ('click', 'view')),
    c AS (
      SELECT user_id, ts::TIMESTAMP AS conv_ts, event_id AS conv_id,
             value AS conv_value
      FROM events WHERE event_type = 'purchase'),
    p AS (
      SELECT c.conv_id, c.conv_value, t.channel, t.touch_id,
             CAST(FLOOR(epoch(c.conv_ts)) AS BIGINT)
               - CAST(FLOOR(epoch(t.touch_ts)) AS BIGINT) AS age_s
      FROM c JOIN t ON t.user_id = c.user_id
        AND t.touch_ts >= c.conv_ts - INTERVAL 3 DAY
        AND t.touch_ts <= c.conv_ts),
    w AS (SELECT *, POWER(0.5, age_s / 86400.0) AS wt FROM p),
    cr AS (
      SELECT conv_id, conv_value, channel,
             ROUND(wt / SUM(wt) OVER (PARTITION BY conv_id), 6) AS credit
      FROM w)
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
           ROUND(SUM(credit), 6) AS total_credit,
           ROUND(SUM(credit * conv_value), 6) AS credited_value
    FROM cr GROUP BY channel ORDER BY channel
    """,
    doc="multi-touch attribution (operators/attribution.py): every "
    "click/view in the 3-day lookback before each purchase earns "
    "time-decayed credit (half-life 1 day), normalized per "
    "conversion, rolled up by channel. Pairing is the bucketed "
    "interval join (conversion windows explode to <= 2 lookback-wide "
    "buckets; equi-join on (user, bucket) — no per-user cross join); "
    "normalization is a window keyed by conversion id, state bounded "
    "by in-window touch count. Ages are exact integer seconds; "
    "credits rounded 6 per the cross-engine convention. The as-of "
    "family's asof_attribution answers the LAST-touch special case; "
    "this is the general model",
)
def multitouch_channels_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.attribution import multitouch_attribution

    ev = load_events(spark, sf_dir)
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
    )
    convs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("conv_ts"),
        F.col("event_id").alias("conv_id"),
        F.col("value").alias("conv_value"),
    )
    credited = multitouch_attribution(
        touches, convs, ["user_id"], "touch_ts", "conv_ts",
        "conv_id", "touch_id",
        lookback="3 days", model="time_decay", half_life="1 day",
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.countDistinct("conv_id").cast("long").alias("n_conversions"),
            F.round(F.sum("credit"), 6).alias("total_credit"),
            F.round(F.sum(F.col("credit") * F.col("conv_value")), 6).alias(
                "credited_value"
            ),
        )
        .orderBy("channel")
    )


@_q(
    "session_transition_matrix",
    """
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id,
                      event_type FROM events),
    lagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) - 1
               AS session_id
      FROM lagged),
    steps AS (
      SELECT event_type,
             LEAD(event_type) OVER w2 AS nxt,
             ROW_NUMBER() OVER w2 AS rn
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, session_id
                    ORDER BY ts, event_id)),
    trans AS (
      SELECT event_type AS from_type, COALESCE(nxt, '__END__') AS to_type
      FROM steps
      UNION ALL
      SELECT '__START__', event_type FROM steps WHERE rn = 1),
    cnt AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM trans GROUP BY 1, 2)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
           ROUND(n / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM cnt ORDER BY from_type, to_type
    """,
    doc="first-order Markov transition matrix over within-session "
    "event types with virtual __START__/__END__ states "
    "(operators/sessions.py:session_transitions) — entry points, "
    "drop-off rates, and step probabilities factorized from the same "
    "sessionization journey mining ranks whole paths over. One key "
    "shuffle (sessionize), per-session array fold + zero-shuffle "
    "adjacent-pair transform, one map-side count; the probability "
    "window runs over the (|types|+1)^2 matrix, broadcast-scale "
    "regardless of corpus size. p is exact long/long division "
    "rounded 6",
)
def session_transition_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sessions import session_transitions

    ev = load_events(spark, sf_dir)
    return session_transitions(
        ev, ["user_id"], "ts", "event_type",
        gap="30 minutes", tie_col="event_id",
    )


_BFS_ITER = """
    f{k} AS MATERIALIZED (
      SELECT DISTINCT u.b AS node
      FROM und u JOIN v{p} s ON u.a = s.node AND s.d = {p_hop}
      EXCEPT
      SELECT node FROM v{p}),
    v{k} AS MATERIALIZED (
      SELECT node, d FROM v{p}
      UNION ALL
      SELECT node, {k_hop} AS d FROM f{k})"""

_BFS_ORACLE = (
    """
    WITH pairs AS (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
                      's:' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    und AS (
      SELECT src AS a, dst AS b FROM pairs
      UNION
      SELECT dst AS a, src AS b FROM pairs),
    v0 AS (
      SELECT DISTINCT 's:' || CAST(s_suppkey AS VARCHAR) AS node, 0 AS d
      FROM supplier WHERE s_suppkey <= 5),"""
    + ",".join(
        _BFS_ITER.format(k=k, p=k - 1, p_hop=k - 1, k_hop=k)
        for k in range(1, 5)
    )
    + """
    SELECT node, CAST(d AS BIGINT) AS dist FROM v4
    """
)


@_q(
    "bfs_purchase_rings",
    _BFS_ORACLE,
    doc="multi-source BFS (operators/graph.py:bfs_distances): minimum "
    "hop distance from the nation-0 supplier cohort over the "
    "undirected customer<->supplier purchase graph, out to 4 hops — "
    "reachability rings / blast radius as one primitive. Per hop one "
    "frontier x edge equi-join (shuffle = the frontier's incident "
    "edges, shrinking as rings saturate), one distinct, one key-sized "
    "anti join; visited frame lazily checkpointed per round against "
    "2^hops plan growth. Integer distances — bit-deterministic, "
    "oracle-replayable (fixed round count like kcore/pagerank)",
)
def bfs_purchase_rings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import bfs_distances

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    seeds = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 5)
        .select(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias(
                "node"
            )
        )
    )
    return bfs_distances(
        edges, seeds, "node", max_hops=4, directed=False
    )


_WOE_EDGES = ",\n             ".join(
    f"ROUND(quantile_cont(v, {i / 10}), 6) AS e{i - 1}"
    for i in range(1, 10)
)
_WOE_BIN = " + ".join(
    f"(CASE WHEN v >= e{i} THEN 1 ELSE 0 END)" for i in range(9)
)

_WOE_ORACLE = f"""
    WITH base AS MATERIALIZED (
      SELECT o_totalprice AS v,
             (o_orderpriority = '1-URGENT') AS y
      FROM orders WHERE o_totalprice IS NOT NULL),
    edges AS MATERIALIZED (
      SELECT {_WOE_EDGES}
      FROM base),
    binned AS (
      SELECT {_WOE_BIN} AS bin, y FROM base CROSS JOIN edges),
    cnt AS (
      SELECT bin, COUNT(*) AS n,
             SUM(CASE WHEN y THEN 1 ELSE 0 END) AS ne
      FROM binned GROUP BY 1),
    t AS (
      SELECT bin, n, ne,
             GREATEST(ROUND(ne * 1.0 / SUM(ne) OVER (), 6), 0.0001) AS de,
             GREATEST(ROUND((n - ne) * 1.0 / SUM(n - ne) OVER (), 6),
                      0.0001) AS dn
      FROM cnt)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n AS BIGINT) AS n,
           CAST(ne AS BIGINT) AS n_event,
           ROUND(ROUND(ne * 1.0, 6) / n, 6) AS event_rate,
           de AS dist_event, dn AS dist_nonevent,
           ROUND(LN(de / dn), 6) AS woe,
           ROUND((de - dn) * LN(de / dn), 6) AS iv_term,
           ROUND(SUM(ROUND((de - dn) * LN(de / dn), 6)) OVER (), 6)
             AS iv_total
    FROM t ORDER BY bin
    """


@_q(
    "woe_price_vs_urgent",
    _WOE_ORACLE,
    doc="supervised feature binning (operators/curation.py:"
    "woe_iv_bins): order price in 10 equal-mass bins scored by Weight "
    "of Evidence against the is-urgent label, with the Information "
    "Value decomposition — the scorecard/feature-selection readout "
    "one rung above PSI's unsupervised drift. One exact-percentile "
    "aggregate (edges broadcast), one map-side-combined (bin, label) "
    "count, then arithmetic over <= 10 rows (the unpartitioned "
    "windows run on the bin matrix, bounded by construction). "
    "Distributions round to 6 BEFORE ln so both engines feed "
    "identical doubles into the log",
)
def woe_price_vs_urgent_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import woe_iv_bins

    orders = load(spark, sf_dir, "orders")
    return woe_iv_bins(
        orders, "o_totalprice",
        F.col("o_orderpriority") == "1-URGENT", bins=10,
    )


_DAILY_ROLLUP_SQL = """
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(SUM(value), 6) AS v
      FROM events GROUP BY 1, 2"""


@_q(
    "seasonal_backtest_events",
    f"""
    WITH r AS MATERIALIZED ({_DAILY_ROLLUP_SQL}),
    s AS (
      SELECT a.event_type, a.v AS av, f.v AS fv
      FROM r a JOIN r f
        ON f.event_type = a.event_type AND a.day = f.day + 7)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           ROUND(ROUND(SUM(ABS(av - fv)), 6) / COUNT(*), 6) AS mae,
           ROUND(SQRT(ROUND(SUM((av - fv) * (av - fv)), 6) / COUNT(*)),
                 6) AS rmse,
           ROUND(ROUND(SUM(CASE WHEN av > 0 THEN ABS(av - fv) / av END),
                       6)
                 / COUNT(CASE WHEN av > 0 THEN 1 END), 6) AS mape
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="seasonal-naive forecast backtest (operators/series.py:"
    "seasonal_naive_backtest): predict each day's per-type value "
    "total with the actual from 7 days earlier, score MAE/RMSE/MAPE "
    "per type — the baseline every forecasting model must beat, as a "
    "continuous monitor. One self-join of the DAILY ROLLUP on "
    "(key, day-7) — rollup-sized, never event-sized — plus one "
    "map-side-combined aggregate; error means follow the stable_avg "
    "round-sum-then-divide rule",
)
def seasonal_backtest_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import seasonal_naive_backtest

    ev = load_events(spark, sf_dir)
    rollup = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    return seasonal_naive_backtest(
        rollup, ["event_type"], "day", "v", period_days=7
    )


_ACF_ORACLE = (
    f"WITH r AS MATERIALIZED ({_DAILY_ROLLUP_SQL})\n    "
    + "\n    UNION ALL\n    ".join(
        f"""SELECT a.event_type, CAST({lag} AS BIGINT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CORR(a.v, f.v), 6) AS acf
    FROM r a JOIN r f
      ON f.event_type = a.event_type AND a.day = f.day + {lag}
    GROUP BY a.event_type"""
        for lag in range(1, 8)
    )
    + "\n    ORDER BY event_type, lag"
)


@_q(
    "acf_daily_values",
    _ACF_ORACLE,
    doc="autocorrelation function per event type "
    "(operators/series.py:acf_by_key): Pearson correlation of the "
    "daily value series against itself at lags 1..7 — the "
    "seasonality/persistence diagnostic that picks the "
    "seasonal-naive period worth backtesting. Per lag one "
    "rollup-sized self-join on (key, day-lag) with pairwise-complete "
    "semantics on gappy series; correlations round 6 (the q12 "
    "convention). Each lag is an independent branch over the REDUCED "
    "rollup, never raw events",
)
def acf_daily_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import acf_by_key

    ev = load_events(spark, sf_dir)
    rollup = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    return acf_by_key(rollup, ["event_type"], "day", "v", max_lag=7)


@_q(
    "itemitem_part_recs",
    """
    WITH r AS MATERIALIZED (
      SELECT o_custkey AS u, l_partkey AS i,
             ROUND(SUM(l_quantity), 6) AS rt
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    norms AS MATERIALIZED (
      SELECT i, ROUND(SUM(rt * rt), 6) AS ss FROM r GROUP BY 1),
    pairs AS (
      SELECT a.i AS ia, b.i AS ib, COUNT(*) AS nc,
             ROUND(SUM(a.rt * b.rt), 6) AS dot
      FROM r a JOIN r b ON a.u = b.u AND a.i < b.i
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    sym AS (
      SELECT ia AS item, ib AS neighbor, nc, dot FROM pairs
      UNION ALL
      SELECT ib AS item, ia AS neighbor, nc, dot FROM pairs),
    sc AS (
      SELECT item, neighbor, nc,
             ROUND(dot / (SQRT(na.ss) * SQRT(nb.ss)), 6) AS cosine
      FROM sym
      JOIN norms na ON na.i = item
      JOIN norms nb ON nb.i = neighbor),
    rk AS (
      SELECT item, neighbor, nc, cosine,
             ROW_NUMBER() OVER (PARTITION BY item
                                ORDER BY cosine DESC, neighbor) AS rank
      FROM sc)
    SELECT item, neighbor, CAST(nc AS BIGINT) AS n_common, cosine,
           CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= 5
    """,
    doc="item-item neighborhood CF (operators/relational.py:"
    "itemitem_topk): each part's 5 most cosine-similar parts by "
    "quantity-weighted co-purchase across customers, min 2 co-buyers "
    "— the 'bought X also bought' model table; affinity answers "
    "lift-vs-chance and ppr random-walk closeness, this ranks by "
    "rating cosine. Pair work = sum_u C(#items_u, 2) (whale-user cap "
    "available), item-keyed norm joins, per-item rank window on "
    "candidates only — never an item x item product. Quantity sums "
    "are integer-valued so every aggregate is exact in double; "
    "cosine rounds 6 before the deterministic (cosine desc, "
    "neighbor) cut",
)
def itemitem_part_recs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import itemitem_topk

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ratings = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).select("o_custkey", "l_partkey", "l_quantity")
    return itemitem_topk(
        ratings, "o_custkey", "l_partkey", "l_quantity",
        k=5, min_common=2,
    )


@_q(
    "skyline_parts",
    """
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice
             OR q.p_size > p.p_size))
      AND p.p_size IS NOT NULL AND p.p_retailprice IS NOT NULL
    """,
    doc="2D Pareto skyline (operators/relational.py:skyline_2d): the "
    "parts no other part beats on BOTH price (min) and size (max) — "
    "the multi-objective answer set a single sort key cannot "
    "express. Spark plans it with NO dominance self-join and NO "
    "single-partition window: monotone range-bucketing on the x "
    "axis, per-bucket max-y partials, an exclusive suffix-max over "
    "the <= buckets-row frame (higher bucket implies strictly better "
    "x, so hmax >= y kills outright), and within-bucket dense-rank + "
    "RANGE-frame windows riding ONE bucket-keyed shuffle. The DuckDB "
    "oracle is the quadratic NOT EXISTS dominance test — every green "
    "row proves the bucketed plan against brute force. Exact double "
    "comparisons end to end; no rounding anywhere",
)
def skyline_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import skyline_2d

    part = load(spark, sf_dir, "part")
    return skyline_2d(
        part.select("p_partkey", "p_size", "p_retailprice"),
        "p_retailprice", "p_size", x_dir="min", y_dir="max",
    ).select("p_partkey", "p_size", "p_retailprice")


_LPA_ITER = """
    l{k} AS MATERIALIZED (
      SELECT a AS node, label FROM (
        SELECT u.a, l.label, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY u.a
                                  ORDER BY COUNT(*) DESC, l.label)
                 AS rn
        FROM und u JOIN l{p} l ON u.b = l.node
        GROUP BY u.a, l.label)
      WHERE rn = 1)"""

_LPA_ORACLE = (
    """
    WITH pairs AS (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
                      's:' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    und0 AS (
      SELECT src AS a, dst AS b FROM pairs
      UNION
      SELECT dst AS a, src AS b FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM und0),
    und AS (
      SELECT a, b FROM und0
      UNION
      SELECT node AS a, node AS b FROM nodes),
    l0 AS (SELECT node, node AS label FROM nodes),"""
    + ",".join(_LPA_ITER.format(k=k, p=k - 1) for k in range(1, 5))
    + """
    SELECT node, label FROM l4
    """
)


@_q(
    "lpa_communities",
    _LPA_ORACLE,
    doc="synchronous label propagation, 4 fixed rounds with self-loop "
    "damping (operators/graph.py:label_propagation): locally dense "
    "communities on the customer<->supplier purchase graph — "
    "connected components merges everything reachable, LPA finds the "
    "neighborhoods inside one component. Most-frequent-neighbor-label "
    "votes, ties to the MINIMUM label (a total order: "
    "bit-deterministic, fixed-round oracle-replayable; the self vote "
    "damps sync-LPA's period-2 bipartite oscillation). Per round one "
    "edge x label join + one map-side (node, label) count + one "
    "per-node argmax window; labels checkpointed per round",
)
def lpa_communities_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import label_propagation

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    return label_propagation(edges, "src", "dst", rounds=4)


@_q(
    "cusum_daily_drift",
    f"""
    WITH r AS MATERIALIZED ({_DAILY_ROLLUP_SQL}),
    st AS (
      SELECT event_type, day, v,
             ROUND(SUM(v) OVER (PARTITION BY event_type), 6)
               / COUNT(v) OVER (PARTITION BY event_type) AS mu,
             ROUND(STDDEV_SAMP(v) OVER (PARTITION BY event_type), 6)
               AS sigma
      FROM r),
    d AS (
      SELECT event_type, day, v,
             CAST(FLOOR((v - mu) * 1000000.0) AS BIGINT) AS dd,
             CAST(FLOOR(sigma * 250000.0) AS BIGINT) AS kk,
             CAST(FLOOR(sigma * 2000000.0) AS BIGINT) AS hh
      FROM st),
    p AS (
      SELECT event_type, day, v, hh,
             SUM(dd - kk) OVER w AS ph,
             SUM(-dd - kk) OVER w AS pl
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    s AS (
      SELECT event_type, day, v, hh,
             ph - LEAST(CAST(0 AS BIGINT), MIN(ph) OVER w) AS shi,
             pl - LEAST(CAST(0 AS BIGINT), MIN(pl) OVER w) AS slo
      FROM p
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_type, day, v,
           ROUND(shi / 1000000.0, 6) AS s_hi,
           ROUND(slo / 1000000.0, 6) AS s_lo,
           COALESCE(shi > hh, FALSE) AS alarm_hi,
           COALESCE(slo > hh, FALSE) AS alarm_lo
    FROM s ORDER BY event_type, day
    """,
    doc="two-sided CUSUM drift monitor per event type "
    "(operators/series.py:cusum_changepoints): Page's cumulative-sum "
    "detector over the daily value rollup with the classic "
    "k=0.25sigma allowance / h=2sigma alarm — catches a sustained "
    "small level shift that the per-point z-score gate "
    "(anomaly_zscore_daily) never trips. The max(0, .) recursion is "
    "window-expressible via its prefix-sum closed form S_t = P_t - "
    "min(0, min_prefix P), so the whole detector is one running SUM "
    "+ one running MIN on a single (key, day) sort — no UDF, no "
    "iteration. Deltas quantize to exact micros BIGINTs before any "
    "running arithmetic (the concurrency_peaks discipline), so "
    "Spark's incremental and DuckDB's segment-tree window "
    "accumulation orders are unobservable",
)
def cusum_daily_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import cusum_changepoints

    ev = load_events(spark, sf_dir)
    rollup = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    return cusum_changepoints(
        rollup, ["event_type"], "day", "v", h=2.0, k=0.25, relative=True
    )


@_q(
    "benford_price_digits",
    """
    WITH d AS (
      SELECT CAST(regexp_extract(
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
               '[1-9]', 0) AS BIGINT) AS digit
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND regexp_extract(
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
              '[1-9]', 0) <> ''),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM d GROUP BY digit),
    exp AS (
      SELECT d.digit, ROUND(LOG10(1.0 + 1.0 / d.digit), 6) AS exp_freq
      FROM (SELECT UNNEST(GENERATE_SERIES(1, 9)) AS digit) d),
    j AS (
      SELECT e.digit, COALESCE(o.n_obs, 0) AS n_obs, e.exp_freq,
             SUM(COALESCE(o.n_obs, 0)) OVER () AS n_total
      FROM exp e LEFT JOIN obs o ON o.digit = e.digit)
    SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
           CAST(n_total AS BIGINT) AS n_total,
           ROUND(n_obs / n_total, 6) AS obs_freq,
           exp_freq,
           ROUND((n_obs - n_total * exp_freq)
                 * (n_obs - n_total * exp_freq)
                 / (n_total * exp_freq), 6) AS chi2_part
    FROM j ORDER BY digit
    """,
    doc="Benford first-digit audit of line-item prices "
    "(operators/dq.py:benford_digit_test): observed leading-digit "
    "frequencies vs log10(1+1/d) with per-digit chi-square "
    "contributions — the fabricated/truncated-data smell test for "
    "financial columns. Digits come from the DECIMAL string "
    "rendering, not FLOOR(LOG10()) (ulp cliff at powers of ten; "
    "doubles render differently across engines, decimals exactly); "
    "the chi2 expectation uses the 6dp-rounded Benford constant so "
    "both engines square the same double. One column-pruned "
    "aggregate pass to 9 rows + a broadcast 9-row expected table",
)
def benford_price_digits_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dq import benford_digit_test

    li = load(spark, sf_dir, "lineitem")
    return benford_digit_test(
        li.select(
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price")
        ),
        "price",
    )


_SSSP_ITER = """
    d{k} AS MATERIALIZED (
      SELECT node, MIN(d) AS d FROM (
        SELECT node, d FROM d{p}
        UNION ALL
        SELECT e.b AS node, x.d + e.w AS d
        FROM e JOIN d{p} x ON e.a = x.node)
      GROUP BY node)"""

_SSSP_ORACLE = (
    """
    WITH pe AS (
      SELECT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
             's:' || CAST(l_suppkey AS VARCHAR) AS dst,
             CAST(MIN(l_quantity) AS BIGINT) AS w
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    und AS (
      SELECT src AS a, dst AS b, w FROM pe
      UNION ALL
      SELECT dst AS a, src AS b, w FROM pe),
    e AS (
      SELECT a, b, MIN(w) AS w FROM und WHERE a <> b GROUP BY a, b),
    d0 AS (
      SELECT DISTINCT 's:' || CAST(s_suppkey AS VARCHAR) AS node,
             CAST(0 AS BIGINT) AS d
      FROM supplier WHERE s_suppkey <= 5),"""
    + ",".join(_SSSP_ITER.format(k=k, p=k - 1) for k in range(1, 5))
    + """
    SELECT node, CAST(d AS BIGINT) AS dist FROM d4
    """
)


@_q(
    "sssp_purchase_paths",
    _SSSP_ORACLE,
    doc="multi-source weighted shortest paths, bounded Bellman-Ford "
    "(operators/graph.py:shortest_paths): cheapest quantity-weighted "
    "path from the seed supplier cohort over the undirected "
    "customer<->supplier purchase graph within 4 edges — the "
    "cost-aware generalization of bfs_purchase_rings (hops become "
    "weights). Per round one frontier x edges equi-join (relaxation "
    "candidates come only from nodes whose distance improved — "
    "identical result to full relaxation, a fraction of the "
    "shuffle), one map-side MIN, one key-sized full join; state "
    "lazily checkpointed per round. Integer weights -> exact BIGINT "
    "distances, bit-deterministic, replayed by a fixed-depth "
    "unrolled-CTE oracle",
)
def sssp_purchase_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import shortest_paths

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .agg(F.min("l_quantity").cast("long").alias("w"))
    )
    seeds = supplier.where(F.col("s_suppkey") <= 5).select(
        F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias(
            "node"
        )
    )
    return shortest_paths(
        edges, seeds, "node", "src", "dst", "w", rounds=4
    ).select("node", "dist")


@_q(
    "ols_order_value",
    """
    WITH per_order AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS y,
             CAST(COUNT(*) AS DECIMAL(18,2)) AS x1,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS x2
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2, 3),
    m AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS DOUBLE) AS s1,
             CAST(SUM(x2) AS DOUBLE) AS s2,
             CAST(SUM(y)  AS DOUBLE) AS sy,
             CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
             CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
             CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
             CAST(SUM(x1 * y)  AS DOUBLE) AS s1y,
             CAST(SUM(x2 * y)  AS DOUBLE) AS s2y,
             CAST(SUM(y * y)   AS DOUBLE) AS syy
      FROM per_order GROUP BY 1),
    c AS (
      SELECT *, CAST(n AS DOUBLE) AS nd,
             (CAST(n AS DOUBLE) * (s11*s22 - s12*s12)
              - s1 * (s1*s22 - s12*s2)
              + s2 * (s1*s12 - s11*s2)) AS det,
             (sy * (s11*s22 - s12*s12)
              - s1 * (s1y*s22 - s12*s2y)
              + s2 * (s1y*s12 - s11*s2y)) AS det0,
             (CAST(n AS DOUBLE) * (s1y*s22 - s12*s2y)
              - sy * (s1*s22 - s12*s2)
              + s2 * (s1*s2y - s1y*s2)) AS det1,
             (CAST(n AS DOUBLE) * (s11*s2y - s1y*s12)
              - s1 * (s1*s2y - s1y*s2)
              + sy * (s1*s12 - s11*s2)) AS det2
      FROM m)
    SELECT o_orderpriority, n,
           CASE WHEN n >= 3 AND det <> 0
                THEN ROUND(det0 / det, 6) END AS b0,
           CASE WHEN n >= 3 AND det <> 0
                THEN ROUND(det1 / det, 6) END AS b1,
           CASE WHEN n >= 3 AND det <> 0
                THEN ROUND(det2 / det, 6) END AS b2,
           CASE WHEN n >= 3 AND det <> 0
                     AND (syy - sy*sy/nd) > 0
                THEN ROUND(1 - (syy - ((det0/det)*sy
                                       + (det1/det)*s1y
                                       + (det2/det)*s2y))
                             / (syy - sy*sy/nd), 6) END AS r2
    FROM c ORDER BY o_orderpriority
    """,
    doc="one-pass multiple linear regression per order priority "
    "(operators/relational.py:ols_two_features): o_totalprice ~ "
    "line_count + total_quantity solved from the nine "
    "normal-equation moments by Cramer's rule — how a linear model "
    "fits at 100 TB, the shuffle carrying nine numbers per group. "
    "Moments are EXACT DECIMAL(18,2) sums (y*y reaches 1e15 where "
    "double ulps beat any round-6 fix), cast to double only for the "
    "fixed-operation-order closed form, so both engines produce "
    "bit-identical coefficients; the oracle spells Cramer in the "
    "same expansion order — that order is part of the contract",
)
def ols_order_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import ols_two_features

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    per_order = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
        )
        .agg(
            F.count(F.lit(1)).cast("decimal(18,2)").alias("x1"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("x2"),
        )
    )
    return ols_two_features(
        per_order, ["o_orderpriority"], "y", "x1", "x2"
    )


_EVAL_QSETS = {
    "q1": ["join", "hash"],
    "q2": ["scan", "filter", "column"],
    "q3": ["stream", "window", "batch"],
}


def _eval_block(qid: str, terms: list[str]) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    arr = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    return f"""
    tf_{qid} AS (
      SELECT doc_id, dl, t, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, dl, UNNEST(toks) AS t FROM docs)
      WHERE t IN ({tl})
      GROUP BY doc_id, dl, t),
    dfreq_{qid} AS (
      SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf_{qid} GROUP BY t),
    bm_{qid} AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))
             ), 6) AS bm25
      FROM tf_{qid} tf JOIN dfreq_{qid} dfreq USING (t)
      CROSS JOIN stats s
      GROUP BY tf.doc_id),
    rk_{qid} AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
      FROM bm_{qid} QUALIFY rank <= 10),
    rel_{qid} AS (
      SELECT doc_id, rel FROM (
        SELECT doc_id,
               len(list_intersect(list_distinct(toks), {arr})) AS rel
        FROM docs)
      WHERE rel > 0),
    got_{qid} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_ranked,
             ROUND(SUM(COALESCE(rel, 0) / log2(rank + 1)), 6) AS dcg,
             MAX(CASE WHEN rel > 0 THEN 1.0 / rank END) AS mrr,
             CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS hits
      FROM rk_{qid} LEFT JOIN rel_{qid} USING (doc_id)),
    ideal_{qid} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rel,
             ROUND(SUM(CASE WHEN rn <= 10
                            THEN rel / log2(rn + 1) END), 6) AS idcg
      FROM (SELECT rel,
                   row_number() OVER (ORDER BY rel DESC, doc_id) AS rn
            FROM rel_{qid}))"""


_EVAL_FINAL = """
    SELECT '{qid}' AS query_id, n_ranked, n_rel,
           ROUND(dcg / idcg, 6) AS ndcg,
           ROUND(COALESCE(mrr, 0), 6) AS mrr,
           ROUND(COALESCE(hits, 0) / 10.0, 6) AS precision,
           CASE WHEN n_rel > 0
                THEN ROUND(hits / n_rel, 6) END AS recall
    FROM got_{qid} CROSS JOIN ideal_{qid}"""

_SEARCH_EVAL_ORACLE = (
    """
    WITH docs AS MATERIALIZED (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks,
             len(string_split_regex(trim(text), '\\s+')) AS dl
      FROM documents),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM docs),"""
    + ",".join(_eval_block(q, t) for q, t in _EVAL_QSETS.items())
    + "\n    UNION ALL".join(
        _EVAL_FINAL.format(qid=q) for q in _EVAL_QSETS
    )
    + "\n    ORDER BY query_id"
)


@_q(
    "search_eval_bm25",
    _SEARCH_EVAL_ORACLE,
    doc="offline retrieval evaluation "
    "(operators/retrieval.py:ranking_metrics): NDCG@10 / MRR@10 / "
    "precision@10 / recall@10 for three fixed term-set queries, BM25 "
    "rankings judged against graded term-coverage relevance — the "
    "readout that says whether a ranker change helped BEFORE it "
    "ships. Each leg's top-10 is cut by orderBy().limit(10) "
    "(TakeOrderedAndProject, fully distributed) before the 10-row "
    "rank window; the metrics join is (queries x k)-sized; IDCG "
    "windows only each query's judged pool. DCG uses linear gain "
    "rel/log2(rank+1) (Jarvelin-Kekalainen), log2 sums round 6 "
    "before the cross-engine-shared ratio",
)
def search_eval_bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import bm25_search_eval

    docs = load(spark, sf_dir, "documents")
    return bm25_search_eval(docs, "doc_id", "text", _EVAL_QSETS, k=10)


_WQ_PS = (0.25, 0.5, 0.75)

_WQ_ORACLE = (
    """
    WITH base AS (
      SELECT o_orderpriority AS pri,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
             CAST(l_quantity AS BIGINT) AS w
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_extendedprice IS NOT NULL AND l_quantity > 0),
    g AS (SELECT pri, v, SUM(w) AS w FROM base GROUP BY pri, v),
    c AS (
      SELECT pri, v,
             CAST(SUM(w) OVER (PARTITION BY pri ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS cw,
             CAST(SUM(w) OVER (PARTITION BY pri) AS BIGINT) AS tw
      FROM g)
    """
    + "\n    UNION ALL".join(
        f"""
    SELECT pri AS o_orderpriority, CAST({p} AS DOUBLE) AS p,
           MIN(CASE WHEN cw >= {p} * tw THEN v END) AS wq,
           CAST(MAX(tw) AS BIGINT) AS total_w
    FROM c GROUP BY pri"""
        for p in _WQ_PS
    )
    + "\n    ORDER BY o_orderpriority, p"
)


@_q(
    "weighted_price_quartiles",
    _WQ_ORACLE,
    doc="exact quantity-weighted price quartiles per order priority "
    "(operators/relational.py:weighted_percentiles): the smallest "
    "price whose cumulative UNIT volume reaches p of the total — the "
    "per-unit distribution approx_percentile cannot weight and "
    "explode-by-weight cannot afford. Weight pre-aggregated per "
    "distinct value before the cumulative window, so tie order is "
    "unobservable and every running weight is an exact BIGINT; one "
    "map-side-combined groupBy + one window over the REDUCED "
    "distinct-value frame + one conditional-min pass for all three "
    "quartiles",
)
def weighted_price_quartiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import weighted_percentiles

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    j = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select(
        F.col("o_orderpriority"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        F.col("l_quantity").alias("w"),
    )
    return weighted_percentiles(
        j, ["o_orderpriority"], "v", "w", ps=_WQ_PS
    )


@_q(
    "zipf_vocab_fit",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               AS term
      FROM documents),
    ts AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term <> ''
      GROUP BY term ORDER BY tf DESC, term LIMIT 500),
    r AS (
      SELECT tf, row_number() OVER (ORDER BY tf DESC, term) AS rank
      FROM ts),
    pts AS (SELECT log2(rank) AS x, log2(tf) AS y FROM r),
    ptsr AS (
      SELECT -- DECIMAL(19,6): see daily_trend_slope's oracle — width
             -- 19 forces DuckDB's exact HUGEINT multiply path
             CAST(ROUND(x, 6) AS DECIMAL(19,6)) AS xd,
             CAST(ROUND(y, 6) AS DECIMAL(19,6)) AS yd
      FROM pts),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xd) AS DOUBLE) AS sx,
             CAST(SUM(yd) AS DOUBLE) AS sy,
             CAST(SUM(xd * yd) AS DOUBLE) AS sxy,
             CAST(SUM(xd * xd) AS DOUBLE) AS sxx,
             CAST(SUM(yd * yd) AS DOUBLE) AS syy
      FROM ptsr),
    s AS (
      SELECT n, sx, sy, sxy, sxx, syy,
             CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
                  THEN ROUND((n * sxy - sx * sy)
                             / (n * sxx - sx * sx), 6) END AS slope
      FROM m)
    SELECT n, slope,
           CASE WHEN slope IS NOT NULL
                THEN ROUND((sy - slope * sx) / n, 6) END AS intercept,
           CASE WHEN slope IS NOT NULL AND (n * syy - sy * sy) > 0
                THEN ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                           / ((n * sxx - sx * sx)
                              * (n * syy - sy * sy)), 6) END AS r2
    FROM s
    """,
    doc="Zipf's-law corpus health gauge (operators/text.py:zipf_fit): "
    "log-log OLS of term frequency vs rank over the top-500 "
    "vocabulary — organic language sits near slope -1, template "
    "floods bend the curve. Vocabulary aggregate with map-side "
    "combine, distributed TakeOrderedAndProject cut, rank window "
    "over the reduced 500-row frame only, then linear_trend's "
    "rounded-moment closed form (sufficient statistics round 6 "
    "before the shared formula; the oracle mirrors intercept from "
    "the ROUNDED slope)",
)
def zipf_vocab_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import zipf_fit

    docs = load(spark, sf_dir, "documents")
    return zipf_fit(docs, "doc_id", "text", top_n=500)


@_q(
    "embedding_silhouette",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (
      SELECT vec_id AS cid, v AS cv,
             row_number() OVER (ORDER BY vec_id) AS ci
      FROM e ORDER BY vec_id LIMIT 8),
    sc AS (
      SELECT e.vec_id, c.cid, c.ci,
             ROUND(list_cosine_similarity(e.v, c.cv), 6) AS s
      FROM e CROSS JOIN c),
    rk AS (
      SELECT vec_id, cid, s,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY s DESC, ci) AS rn
      FROM sc),
    tb AS (
      SELECT a.vec_id, a.cid AS cluster,
             (1 - a.s) AS da, (1 - b.s) AS db
      FROM rk a JOIN rk b ON a.vec_id = b.vec_id
      WHERE a.rn = 1 AND b.rn = 2),
    sil AS (
      SELECT cluster, da, db,
             CASE WHEN GREATEST(da, db) > 0
                  THEN ROUND((db - da) / GREATEST(da, db), 6)
                  ELSE 0.0 END AS s
      FROM tb)
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(ROUND(SUM(s), 6) / COUNT(*), 6) AS mean_silhouette,
           ROUND(ROUND(SUM(da), 6) / COUNT(*), 6) AS mean_dist_own,
           ROUND(ROUND(SUM(db), 6) / COUNT(*), 6) AS mean_dist_next
    FROM sil GROUP BY cluster ORDER BY cluster
    """,
    doc="simplified silhouette per cluster "
    "(operators/similarity.py:cluster_silhouette): mean "
    "(b-a)/max(a,b) with a = cosine distance to own (nearest) "
    "centroid, b = to the second-nearest — the clustering family's "
    "evaluation rung, as ranking_metrics is for search. One k-row "
    "broadcast cross join, one groupBy whose payload is the "
    "k-element struct list (k bounded, vectors never shuffle), one "
    "map-side-combined per-cluster mean with the stable_avg "
    "round-sum-then-divide rule; sims round 6 before best/second "
    "ordering so the assignment boundary is engine-deterministic",
)
def embedding_silhouette_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cluster_silhouette

    emb = load(spark, sf_dir, "embeddings")
    return cluster_silhouette(emb, "vec_id", "embedding", n_clusters=8)


@_q(
    "ks_value_drift",
    """
    WITH base AS (
      SELECT CAST(isodow(ts) - 1 AS BIGINT) AS wd, value AS v,
             (event_type = 'click') AS isa
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
    per_v AS (
      SELECT wd, v,
             SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS cb
      FROM base GROUP BY wd, v),
    c AS (
      SELECT wd, v,
             SUM(ca) OVER w AS cca, SUM(cb) OVER w AS ccb,
             SUM(ca) OVER g AS na, SUM(cb) OVER g AS nb
      FROM per_v
      WINDOW w AS (PARTITION BY wd ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             g AS (PARTITION BY wd)),
    d AS (
      SELECT wd, v, na, nb,
             ROUND(ABS(CAST(cca AS DOUBLE) / na
                       - CAST(ccb AS DOUBLE) / nb), 6) AS dd
      FROM c),
    m AS (SELECT *, MAX(dd) OVER (PARTITION BY wd) AS dmax
          FROM d WHERE na > 0 AND nb > 0)
    SELECT wd AS weekday, CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           MAX(dmax) AS ks_stat, MIN(v) AS ks_at
    FROM m WHERE dd = dmax GROUP BY wd ORDER BY wd
    """,
    doc="exact two-sample Kolmogorov-Smirnov drift per weekday "
    "(operators/relational.py:ks_two_sample): D = max |ECDF_click - "
    "ECDF_view| over the pooled distinct values — the binning-free "
    "complement to psi_value_drift (PSI misses within-bin shifts and "
    "needs edges). ECDFs are cumulative INTEGER counts over the "
    "distinct-value frame divided by integer totals, so both engines "
    "divide the same numbers; D rounds 6 before the argmax and the "
    "location reports the smallest attaining value. One "
    "map-side-combined groupBy to distinct values + cumulative "
    "windows over the reduced frame",
)
def ks_value_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import ks_two_sample

    ev = load_events(spark, sf_dir)
    base = ev.select(
        F.weekday("ts").cast("long").alias("weekday"),
        "value",
        "event_type",
    )
    return ks_two_sample(
        base, ["weekday"], "value", "event_type", "click", "view"
    )


@_q(
    "theilsen_daily_trend",
    f"""
    WITH r AS MATERIALIZED ({_DAILY_ROLLUP_SQL}),
    base AS (
      SELECT event_type,
             CAST(day - DATE '1970-01-01' AS DOUBLE) AS x, v AS y
      FROM r WHERE v IS NOT NULL),
    pairs AS (
      SELECT a.event_type,
             ROUND((b.y - a.y) / (b.x - a.x), 6) AS m
      FROM base a JOIN base b
        ON a.event_type = b.event_type AND a.x < b.x),
    ms AS (
      SELECT event_type, m,
             row_number() OVER (PARTITION BY event_type ORDER BY m)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM pairs),
    slope AS (
      SELECT event_type, m AS slope, CAST(cnt AS BIGINT) AS n_pairs
      FROM ms WHERE rn = FLOOR((cnt + 1) / 2)),
    resid AS (
      SELECT b.event_type, s.slope, s.n_pairs,
             ROUND(b.y - s.slope * b.x, 6) AS bb
      FROM base b JOIN slope s USING (event_type)),
    ri AS (
      SELECT event_type, slope, n_pairs, bb,
             row_number() OVER (PARTITION BY event_type ORDER BY bb)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nn
      FROM resid),
    sel AS (
      SELECT event_type, n_pairs, slope, bb AS intercept
      FROM ri WHERE rn = FLOOR((nn + 1) / 2)),
    counts AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM base GROUP BY 1)
    SELECT c.event_type, c.n, s.n_pairs, s.slope, s.intercept
    FROM counts c LEFT JOIN sel s USING (event_type)
    ORDER BY c.event_type
    """,
    doc="Theil-Sen robust trend per event type "
    "(operators/relational.py:theil_sen): slope = median of all "
    "pairwise daily slopes, intercept = median residual — shrugs off "
    "~29% outliers where daily_trend_slope's OLS chases them; the "
    "robust rung of the regression family, as MAD is to stddev. "
    "EXACT (no sampling) because the input is the per-key DAILY "
    "ROLLUP: the pair join is O(days^2) per key on the reduced "
    "frame, the acf/seasonal contract. Lower-median (type-1) "
    "selection by row position over round-6 values — no middle-pair "
    "averaging, engine-deterministic under slope ties",
)
def theilsen_daily_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import theil_sen

    ev = load_events(spark, sf_dir)
    rollup = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    pts = rollup.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("1970-01-01"))
        .cast("double")
        .alias("x"),
        F.col("v").alias("y"),
    )
    return theil_sen(pts, ["event_type"], "x", "y")


@_q(
    "value_histogram_events",
    """
    WITH base AS (
      SELECT event_type AS g, value AS v FROM events
      WHERE value IS NOT NULL),
    stats AS (
      SELECT g, CAST(MIN(v) AS DOUBLE) AS lo,
             CAST(MAX(v) AS DOUBLE) AS hi
      FROM base GROUP BY g),
    counts AS (
      SELECT b.g,
             CASE WHEN (s.hi - s.lo) / 10.0 > 0
                  THEN LEAST(9, CAST(FLOOR((b.v - s.lo)
                        / ((s.hi - s.lo) / 10.0)) AS BIGINT))
                  ELSE 0 END AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM base b JOIN stats s USING (g)
      GROUP BY 1, 2),
    grid AS (
      SELECT s.g, s.lo, s.hi, CAST(t.b AS BIGINT) AS bucket
      FROM stats s CROSS JOIN
           (SELECT UNNEST(GENERATE_SERIES(0, 9)) AS b) t)
    SELECT grid.g AS event_type, grid.bucket AS bucket,
           ROUND(grid.lo + grid.bucket * ((grid.hi - grid.lo) / 10.0),
                 6) AS lo,
           ROUND(grid.lo + (grid.bucket + 1)
                 * ((grid.hi - grid.lo) / 10.0), 6) AS hi,
           CAST(COALESCE(counts.n, 0) AS BIGINT) AS n
    FROM grid LEFT JOIN counts
      ON counts.g = grid.g AND counts.bucket = grid.bucket
    ORDER BY event_type, bucket
    """,
    doc="per-event-type equal-width value histogram, empty buckets "
    "included (operators/relational.py:value_histogram): the shape "
    "readout next to group_percentiles' equal-mass cuts. One "
    "map-side-combined min/max aggregate, broadcast of group stats "
    "back onto the rows, one (group, bucket) count, and a "
    "broadcast-scale groups x bins grid left join; bucket boundaries "
    "derive from exact extremes so both engines cut identically, "
    "max lands in the last bucket by the LEAST(bins-1) clamp",
)
def value_histogram_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import value_histogram

    ev = load_events(spark, sf_dir)
    return value_histogram(
        ev.select(F.col("event_type"), F.col("value")),
        ["event_type"],
        "value",
        bins=10,
    )


@_q(
    "readability_docs",
    """
    WITH base AS (
      SELECT doc_id,
             CAST(COALESCE(length(
               regexp_replace(text, '[^A-Za-z0-9]', '', 'g')), 0)
                  AS BIGINT) AS n_chars,
             CAST(COALESCE(len(list_filter(
               string_split_regex(trim(text), '\\s+'),
               x -> length(x) > 0)), 0) AS BIGINT) AS n_words,
             CAST(COALESCE(len(regexp_extract_all(text, '[.!?]+')), 0)
                  AS BIGINT) AS n_raw_sents
      FROM documents),
    counted AS (
      SELECT doc_id, n_chars, n_words,
             CASE WHEN n_words > 0
                  THEN GREATEST(CAST(1 AS BIGINT), n_raw_sents)
                  ELSE CAST(0 AS BIGINT) END AS n_sentences
      FROM base)
    SELECT doc_id, n_chars, n_words, n_sentences,
           CASE WHEN n_words > 0
                THEN (471 * n_chars * n_sentences
                      + 50 * n_words * n_words
                      - 2143 * n_words * n_sentences)
                     / (100.0 * n_words * n_sentences) END AS ari,
           CASE WHEN n_words > 0
                THEN (588 * n_chars - 2960 * n_sentences
                      - 1580 * n_words)
                     / (100.0 * n_words) END AS coleman_liau
    FROM counted ORDER BY doc_id
    """,
    doc="per-document readability indices "
    "(operators/text.py:readability_scores): ARI and Coleman-Liau "
    "from pure character/word/sentence counts — grade-level bands "
    "for curation filters on an interpretable scale, no syllable "
    "dictionary. Pure column expressions in codegen, zero shuffles "
    "beyond the scan; integer counts make both engines' ratio "
    "doubles identical; sentence count floors at 1 for non-empty "
    "text (a fragment is one sentence)",
)
def readability_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import readability_scores

    docs = load(spark, sf_dir, "documents")
    return readability_scores(docs, "doc_id", "text")


@_q(
    "cube_status_priority",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2
                + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           -- VARCHAR roundtrip = correctly-rounded decimal->double
           -- (matches Spark; DuckDB's direct cast drifts 1 ulp past
           -- an unscaled 2^53)
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS VARCHAR) AS DOUBLE)
             AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE lattice over (status, priority): every subtotal "
    "combination — both one-dimension margins, the full cross, and "
    "the grand total — in ONE shared partial-aggregation pass "
    "(completing the grouping-sets family next to rollup_hierarchy's "
    "linear hierarchy and the explicit pivot). The grouping-ID "
    "bitmask disambiguates a genuine NULL group from a subtotal row "
    "— COALESCE('ALL') alone cannot",
)
def cube_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    df = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").cast("long").alias("n_orders"),
            # exact decimal: the grand-total cell sums ALL orders
            # (3.75e10 at sf0.1 — double's 6th decimal is luck there)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias(
                "o_orderstatus"
            ),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias(
                "o_orderpriority"
            ),
            "gid",
            "n_orders",
            "total_value",
        )
    )
    # no round6: exact decimal sum -> identical double on both engines
    return df


@_q(
    "seasonal_decompose_events",
    f"""
    WITH r AS MATERIALIZED ({_DAILY_ROLLUP_SQL}),
    base AS (
      SELECT event_type, day, v,
             CASE WHEN COUNT(v) OVER w = 7
                  THEN ROUND(AVG(v) OVER w, 6) END AS trend,
             CAST((((day - DATE '1970-01-01') % 7) + 7) % 7
                  AS BIGINT) AS phase
      FROM r
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY (day - DATE '1970-01-01')
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (SELECT *, v - trend AS dt FROM base),
    sr AS (
      SELECT event_type, phase,
             ROUND(ROUND(SUM(dt), 6) / COUNT(dt), 6) AS s_raw
      FROM det GROUP BY 1, 2),
    sa AS (
      SELECT event_type, phase,
             ROUND(s_raw
                   - ROUND(SUM(s_raw) OVER (PARTITION BY event_type), 6)
                     / COUNT(s_raw) OVER (PARTITION BY event_type),
                   6) AS s
      FROM sr)
    SELECT d.event_type, d.day, d.v AS v, d.trend, sa.s AS seasonal,
           ROUND(d.v - d.trend - sa.s, 6) AS remainder
    FROM det d LEFT JOIN sa
      ON sa.event_type = d.event_type AND sa.phase = d.phase
    ORDER BY 1, 2
    """,
    doc="classical additive seasonal decomposition per event type "
    "(operators/series.py:classical_decompose): value = trend "
    "(centered 7-point MA, honestly NULL at edges) + seasonal "
    "(re-centered per-phase mean of the detrended series) + "
    "remainder — the 'is Monday always like this' separator that the "
    "drift monitors should watch the REMAINDER of. One key window + "
    "one (key, phase) map-side aggregate + a broadcast-scale "
    "re-centering of <= 7 indices; exact integer phase arithmetic, "
    "stable_avg means",
)
def seasonal_decompose_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import classical_decompose

    ev = load_events(spark, sf_dir)
    rollup = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    return classical_decompose(rollup, ["event_type"], "day", "v", period=7)


@_q(
    "phrase_search_docs",
    """
    WITH d AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents),
    p AS (
      SELECT doc_id, unnest(toks) AS t,
             unnest(range(len(toks))) AS pos
      FROM d),
    m AS (
      SELECT a.doc_id, a.pos AS start
      FROM p a JOIN p b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      WHERE a.t = 'table' AND b.t = 'hash')
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(start) AS BIGINT) AS first_pos
    FROM m GROUP BY doc_id ORDER BY doc_id
    """,
    doc="exact token-phrase retrieval ('table hash') over positional "
    "postings (operators/text.py:phrase_search): the positional rung "
    "of the retrieval family — bm25 ranks bags, this answers THE "
    "phrase, overlaps counted correctly where substring counting "
    "fails. Postings filtered to the phrase's terms before any "
    "shuffle (the BM25 discipline), one (doc, pos+offset) equi-join "
    "per additional term; match set is the output",
)
def phrase_search_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import phrase_search

    docs = load(spark, sf_dir, "documents")
    return phrase_search(docs, "doc_id", "text", ["table", "hash"])


@_q(
    "km_survival_segments",
    """
    WITH span AS (
      SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
      FROM orders GROUP BY 1),
    g AS (SELECT MAX(o_orderdate) AS m FROM orders),
    subj AS (
      SELECT c.c_mktsegment AS seg,
             CAST(CAST(span.l AS DATE) - CAST(span.f AS DATE)
                  AS BIGINT) AS t,
             (CAST(g.m AS DATE) - CAST(span.l AS DATE)) > 90 AS obs
      FROM span JOIN customer c ON c.c_custkey = span.o_custkey
      CROSS JOIN g),
    counts AS (
      SELECT seg, t,
             SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS d,
             SUM(CASE WHEN obs THEN 0 ELSE 1 END) AS cc
      FROM subj GROUP BY 1, 2),
    c2 AS (
      SELECT seg, t, d, cc,
             SUM(d + cc) OVER (PARTITION BY seg)
               - COALESCE(SUM(d + cc) OVER (PARTITION BY seg ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS n
      FROM counts),
    c3 AS (SELECT *, 1 - CAST(d AS DOUBLE) / n AS f FROM c2),
    c4 AS (
      SELECT *,
             SUM(CASE WHEN f <= 0 THEN 1 ELSE 0 END) OVER w AS zeros,
             SUM(CASE WHEN f > 0 THEN ln(f) END) OVER w AS slnf
      FROM c3
      WINDOW w AS (PARTITION BY seg ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT seg AS c_mktsegment, t, CAST(n AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(cc AS BIGINT) AS n_censored,
           CASE WHEN zeros > 0 THEN 0.0
                ELSE ROUND(EXP(slnf), 6) END AS survival
    FROM c4 ORDER BY 1, 2
    """,
    doc="Kaplan-Meier customer-lifetime curves per market segment "
    "(operators/relational.py:km_survival): lifetime = first-to-last "
    "order span, churn observed when inactivity exceeds 90 days "
    "before the dataset horizon, otherwise right-CENSORED — still "
    "at-risk subjects count for as long as they were observed "
    "instead of biasing the curve. One (group, duration) aggregate "
    "to distinct times, then at-risk series and the survival product "
    "(exp-sum-ln; exact integer ratio factors; explicit zero-factor "
    "flag because ln(0) is NULL in Spark but -inf elsewhere) on ONE "
    "ordered window over the reduced frame",
)
def km_survival_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import km_survival

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    span = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    gmax = orders.agg(F.max("o_orderdate").alias("m"))
    subj = (
        span.join(customer, span["o_custkey"] == customer["c_custkey"])
        .crossJoin(F.broadcast(gmax))
        .select(
            F.col("c_mktsegment"),
            F.datediff("l", "f").cast("long").alias("t"),
            (F.datediff("m", "l") > 90).alias("obs"),
        )
    )
    return km_survival(subj, ["c_mktsegment"], "t", "obs")


@_q(
    "gini_customer_revenue",
    """
    WITH rev AS (
      SELECT c.c_mktsegment AS seg,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DECIMAL(18,2)) * 100
                  AS DECIMAL(18,0)) AS vc
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY seg, o.o_custkey),
    r AS (
      SELECT seg, vc,
             row_number() OVER (PARTITION BY seg ORDER BY vc) AS i
      FROM rev),
    a AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(vc) AS VARCHAR) AS DOUBLE) AS sv,
             CAST(CAST(SUM(CAST(i AS DECIMAL(38,0))
                      * CAST(vc AS DECIMAL(38,0))) AS VARCHAR)
                  AS DOUBLE) AS siv
      FROM r GROUP BY seg)
    SELECT seg AS c_mktsegment, n, ROUND(sv / 100.0, 6) AS total,
           CASE WHEN sv > 0
                THEN ROUND((2 * siv - (CAST(n AS DOUBLE) + 1) * sv)
                           / (CAST(n AS DOUBLE) * sv), 6) END AS gini
    FROM a ORDER BY seg
    """,
    doc="Gini concentration of per-customer revenue by market segment "
    "(operators/relational.py:gini_coefficient): 'does 1% of the "
    "customers carry 60% of the revenue' — the mass-concentration "
    "readout next to join_profile's hot-key diagnostics. Rank "
    "formula over ascending values (tie order unobservable: tied "
    "values contribute v*(i1+i2) either way); cents quantization via "
    "DECIMAL and DECIMAL(38,0) rank-weighted moments (n^2*max_v "
    "passes int64 at warehouse scale), one fixed double expression "
    "at the end",
)
def gini_customer_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import gini_coefficient

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("revenue")
        )
    )
    return gini_coefficient(rev, ["c_mktsegment"], "revenue")


@_q(
    "trimmed_mean_order_value",
    """
    WITH base AS (
      SELECT o_orderpriority AS pri,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v
      FROM orders WHERE o_totalprice IS NOT NULL),
    r AS (
      SELECT pri, v,
             row_number() OVER (PARTITION BY pri ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY pri) AS n
      FROM base),
    a AS (
      SELECT pri, CAST(MAX(n) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(v AS DECIMAL(38,2))) AS VARCHAR)
                  AS DOUBLE) AS s_all,
             CAST(CAST(SUM(CASE WHEN rn > FLOOR(n * 0.1)
                            AND rn <= n - FLOOR(n * 0.1)
                           THEN CAST(v AS DECIMAL(38,2)) END)
                  AS VARCHAR) AS DOUBLE) AS s_kept,
             CAST(SUM(CASE WHEN rn > FLOOR(n * 0.1)
                            AND rn <= n - FLOOR(n * 0.1)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM r GROUP BY pri)
    SELECT pri AS o_orderpriority, n, n_kept,
           s_all / n AS mean,
           CASE WHEN n_kept > 0 THEN s_kept / n_kept END AS trimmed
    FROM a ORDER BY pri
    """,
    doc="10%-trimmed mean of order value per priority "
    "(operators/relational.py:trimmed_mean): drop each tail's "
    "floor(n*0.1) values, average the rest — the robust center that "
    "survives fat tails where the plain mean follows them (emitted "
    "side by side for the contrast); third robust rung next to MAD "
    "and Theil-Sen. Cut-boundary ties are order-invariant (cut rows "
    "are interchangeable with kept rows of equal value); "
    "DECIMAL-exact sums, one exact division each, no rounding",
)
def trimmed_mean_order_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import trimmed_mean

    orders = load(spark, sf_dir, "orders")
    return trimmed_mean(
        orders.select("o_orderpriority", "o_totalprice"),
        ["o_orderpriority"],
        "o_totalprice",
        trim=0.1,
    )


@_q(
    "leakage_safe_splits_docs",
    """
    WITH RECURSIVE norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 2, 1) + 1),
             i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5
      UNION ALL
      SELECT id_b, id_a FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5),
    reach(n, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.n, e.b FROM reach JOIN edges e ON reach.r = e.a),
    comp AS (SELECT n AS doc_id, CAST(MIN(r) AS BIGINT) AS component
             FROM reach GROUP BY n)
    SELECT d.doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS cluster,
           CASE WHEN substring(md5(CAST(COALESCE(c.component, d.doc_id)
                                        AS VARCHAR)), 1, 4) < 'e666'
                THEN 'train' ELSE 'test' END AS split
    FROM documents d LEFT JOIN comp c USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="leakage-safe train/test split "
    "(operators/curation.py:leakage_safe_splits): every near-dup "
    "CLUSTER (exact Jaccard>=0.5 components) lands wholly on one "
    "side — a per-document split puts 95%-identical twins on "
    "opposite sides and manufactures eval contamination at split "
    "time. Cluster representative hashed with the split_col md5 "
    "discipline (singletons hash their own id); components shuffle "
    "(node, label) longs only, the corpus joins the component map "
    "once",
)
def leakage_safe_splits_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import leakage_safe_splits
    from .operators.dedup import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return leakage_safe_splits(
        docs, "doc_id", pairs, train_fraction=0.9
    ).select("doc_id", "cluster", "split")


@_q(
    "pareto_customer_revenue",
    """
    WITH rev AS (
      SELECT c.c_mktsegment AS seg,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DECIMAL(18,2)) * 100
                  AS DECIMAL(38,0)) AS vc
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY seg, o.o_custkey),
    r AS (
      SELECT seg, vc,
             row_number() OVER (PARTITION BY seg ORDER BY vc DESC)
               AS rn,
             CAST(SUM(vc) OVER (PARTITION BY seg ORDER BY vc DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS cum,
             CAST(SUM(vc) OVER (PARTITION BY seg) AS DOUBLE) AS tot
      FROM rev),
    a AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(CASE WHEN cum >= 0.8 * tot THEN rn END)
                  AS BIGINT) AS n_top,
             MAX(tot) AS tot,
             MIN(CASE WHEN cum >= 0.8 * tot THEN cum END) AS cum_at
      FROM r GROUP BY seg)
    SELECT seg AS c_mktsegment, n,
           CASE WHEN tot > 0 THEN n_top END AS n_top,
           CASE WHEN tot > 0 THEN ROUND(n_top / n, 6) END AS frac_rows,
           CASE WHEN tot > 0 THEN ROUND(cum_at / tot, 6) END
             AS top_share
    FROM a ORDER BY seg
    """,
    doc="Pareto 80% readout per market segment "
    "(operators/relational.py:pareto_fraction): the smallest number "
    "and fraction of top customers covering 80% of revenue — the "
    "actionable companion to gini_customer_revenue's single index. "
    "Same exactness plumbing: cents DECIMAL quantization, exact "
    "integer descending cumulative (tie order unobservable — equal "
    "values contribute equally), one threshold multiply of the "
    "exact total; one rank window + one conditional-min aggregate",
)
def pareto_customer_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import pareto_fraction

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("revenue")
        )
    )
    return pareto_fraction(
        rev, ["c_mktsegment"], "revenue", share=0.8
    )


@_q(
    "chi2_status_priority",
    """
    WITH base AS (
      SELECT o_orderstatus AS a, o_orderpriority AS b
      FROM orders
      WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL),
    obs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o
            FROM base GROUP BY 1, 2),
    ma AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ra
           FROM base GROUP BY 1),
    mb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rb
           FROM base GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    grid AS (
      SELECT ma.ra, mb.rb, nn.n, COALESCE(obs.o, 0) AS o
      FROM ma CROSS JOIN mb CROSS JOIN nn
      LEFT JOIN obs ON obs.a = ma.a AND obs.b = mb.b),
    s AS (
      SELECT MAX(n) AS n,
             SUM((o - (ra * rb) / n) * (o - (ra * rb) / n)
                 / ((ra * rb) / n)) AS chi2
      FROM grid),
    lv AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ma) AS la,
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM mb) AS lb)
    SELECT s.n,
           lv.la AS levels_a, lv.lb AS levels_b,
           CAST((lv.la - 1) * (lv.lb - 1) AS BIGINT) AS dof,
           ROUND(s.chi2, 6) AS chi2,
           CASE WHEN (lv.la - 1) * (lv.lb - 1) > 0
                THEN ROUND(SQRT(s.chi2 / (s.n * LEAST(lv.la - 1,
                                                      lv.lb - 1))), 6)
           END AS cramers_v
    FROM s CROSS JOIN lv
    """,
    doc="Pearson chi-square independence test + Cramér's V over the "
    "(o_orderstatus x o_orderpriority) contingency table "
    "(operators/relational.py:chi2_independence) — the categorical "
    "complement to ks_two_sample (numeric CDFs) and "
    "two_sample_report (Welch means). Observed counts exact; every "
    "expected count is one double division of exact integers; the "
    "cell sum spans |A|x|B| tiny terms. Two marginal groupBys + one "
    "pair groupBy over the fact; the grid is built from broadcast "
    "MARGINALS, never the fact",
)
def chi2_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import chi2_independence

    orders = load(spark, sf_dir, "orders")
    return chi2_independence(orders, "o_orderstatus", "o_orderpriority")


@_q(
    "mannwhitney_click_error",
    """
    WITH base AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events
      WHERE event_type IN ('click', 'error') AND value IS NOT NULL),
    pv AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS ta,
                  CAST(SUM(1 - ia) AS BIGINT) AS tb
           FROM base GROUP BY v),
    r AS (
      SELECT ta, tb, ta + tb AS t,
             CAST(COALESCE(SUM(ta + tb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c
      FROM pv),
    agg AS (
      -- HUGEINT accumulation mirrors the operator's DECIMAL(38,0):
      -- the 2x rank sum totals ~N(N+1) and t^3 passes 2^63 at a
      -- ~2.1M-row tie group, so BIGINT would overflow at scale
      SELECT CAST(SUM(ta) AS BIGINT) AS na,
             CAST(SUM(tb) AS BIGINT) AS nb,
             CAST(SUM(CAST(ta AS HUGEINT)
                      * (2 * CAST(c AS HUGEINT) + ta + tb + 1))
                  AS HUGEINT) AS r2a,
             CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT)
               AS ties
      FROM r)
    SELECT na AS n_a, nb AS n_b,
           CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) / 2
             AS u_a,
           CASE WHEN na > 0 AND nb > 0 AND
                     CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
                     * (CAST(na + nb + 1 AS DOUBLE)
                        - CAST(ties AS DOUBLE)
                          / (CAST(na + nb AS DOUBLE)
                             * CAST(na + nb - 1 AS DOUBLE))) > 0
                THEN ROUND(CAST(r2a - CAST(na AS HUGEINT) * (na + 1)
                                - CAST(na AS HUGEINT) * nb AS DOUBLE)
                  / (2.0 * SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                     / 12.0
                     * (CAST(na + nb + 1 AS DOUBLE)
                        - CAST(ties AS DOUBLE)
                          / (CAST(na + nb AS DOUBLE)
                             * CAST(na + nb - 1 AS DOUBLE))))), 6)
           END AS z,
           CASE WHEN na > 0 AND nb > 0 AND
                     CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
                     * (CAST(na + nb + 1 AS DOUBLE)
                        - CAST(ties AS DOUBLE)
                          / (CAST(na + nb AS DOUBLE)
                             * CAST(na + nb - 1 AS DOUBLE))) > 0
                THEN ROUND(CAST(r2a - CAST(na AS HUGEINT) * (na + 1)
                                - CAST(na AS HUGEINT) * nb AS DOUBLE)
                  / (2.0 * SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                     / 12.0
                     * (CAST(na + nb + 1 AS DOUBLE)
                        - CAST(ties AS DOUBLE)
                          / (CAST(na + nb AS DOUBLE)
                             * CAST(na + nb - 1 AS DOUBLE)))))
                  / SQRT(CAST(na + nb AS DOUBLE)), 6)
           END AS r_effect
    FROM agg
    """,
    doc="Mann-Whitney U (rank-sum) test between 'click' and 'error' "
    "event values (operators/relational.py:mann_whitney_u) — the "
    "rank-based two-sample rung next to KS and Welch. Cent-quantized "
    "values make tie groups exact; midranks accumulate as exact "
    "DECIMAL(38,0) (oracle: HUGEINT) 2x-scaled sums via the "
    "(2c+t+1) closed form over "
    "DISTINCT values, so U, the tie term and the z variance are "
    "integer-exact before one final double evaluation. The ordered "
    "prefix window runs over the value DOMAIN (~49k cents), not the "
    "fact — constant-bounded at any scale factor",
)
def mannwhitney_click_error_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.relational import mann_whitney_u

    ev = load_events(spark, sf_dir)
    return mann_whitney_u(
        ev, "value", "event_type", "click", "error", scale=100
    )


@_q(
    "entropy_event_hours",
    """
    WITH base AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL),
    pair AS (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS o
             FROM base GROUP BY 1, 2),
    g AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS gt FROM base GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    t AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS tt
          FROM pair GROUP BY 1)
    SELECT p.event_type,
           MAX(t.tt) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cats,
           ROUND(-SUM((o * 1.0 / tt) * log2(o * 1.0 / tt)), 6)
             AS entropy_bits,
           ROUND(SUM((o * 1.0 / tt)
                     * log2((o * 1.0 / tt) / (gt * 1.0 / n))), 6)
             AS kl_vs_global_bits
    FROM pair p
    JOIN t ON t.event_type = p.event_type
    JOIN g ON g.c = p.c
    CROSS JOIN nn
    GROUP BY p.event_type
    """,
    doc="Shannon entropy of each event type's hour-of-day "
    "distribution + KL divergence from the global hour distribution "
    "(operators/dq.py:categorical_entropy) — the information-"
    "theoretic drift readout next to PSI's binned score. Exact "
    "integer counts feed identical closed-form doubles (libm log2 "
    "ulps sit far below the 6dp grain; <=24 terms per sum). One "
    "pair groupBy + one broadcast category marginal; the fact never "
    "joins itself",
)
def entropy_event_hours_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dq import categorical_entropy

    ev = load_events(spark, sf_dir).withColumn(
        "hour_of_day", F.hour("ts").cast("long")
    )
    return categorical_entropy(ev, ["event_type"], "hour_of_day")


@_q(
    "kmeans_parts_price_size",
    """
    WITH pts AS MATERIALIZED (
      SELECT p_partkey AS id,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                  AS BIGINT) AS x0,
             CAST(p_size AS BIGINT) * 2000 AS x1
      FROM part),
    c0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY id) - 1 AS cid,
             x0 AS cx, x1 AS cy
      FROM (SELECT id, x0, x1 FROM pts ORDER BY id LIMIT 4)),
    a1 AS MATERIALIZED (
      SELECT id, x0, x1, cid FROM (
        SELECT p.id, p.x0, p.x1, c.cid,
               (p.x0 - c.cx) * (p.x0 - c.cx)
               + (p.x1 - c.cy) * (p.x1 - c.cy) AS d
        FROM pts p CROSS JOIN c0 c)
      QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, cid) = 1),
    c1 AS MATERIALIZED (
      SELECT c.cid,
             CAST(COALESCE(s.sx // s.n, c.cx) AS BIGINT) AS cx,
             CAST(COALESCE(s.sy // s.n, c.cy) AS BIGINT) AS cy
      FROM c0 c LEFT JOIN (
        SELECT cid, COUNT(*) AS n, SUM(x0) AS sx, SUM(x1) AS sy
        FROM a1 GROUP BY cid) s ON s.cid = c.cid),
    a2 AS MATERIALIZED (
      SELECT id, x0, x1, cid FROM (
        SELECT p.id, p.x0, p.x1, c.cid,
               (p.x0 - c.cx) * (p.x0 - c.cx)
               + (p.x1 - c.cy) * (p.x1 - c.cy) AS d
        FROM pts p CROSS JOIN c1 c)
      QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, cid) = 1),
    c2 AS MATERIALIZED (
      SELECT c.cid,
             CAST(COALESCE(s.sx // s.n, c.cx) AS BIGINT) AS cx,
             CAST(COALESCE(s.sy // s.n, c.cy) AS BIGINT) AS cy
      FROM c1 c LEFT JOIN (
        SELECT cid, COUNT(*) AS n, SUM(x0) AS sx, SUM(x1) AS sy
        FROM a2 GROUP BY cid) s ON s.cid = c.cid),
    a3 AS MATERIALIZED (
      SELECT id, x0, x1, cid FROM (
        SELECT p.id, p.x0, p.x1, c.cid,
               (p.x0 - c.cx) * (p.x0 - c.cx)
               + (p.x1 - c.cy) * (p.x1 - c.cy) AS d
        FROM pts p CROSS JOIN c2 c)
      QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, cid) = 1),
    c3 AS MATERIALIZED (
      SELECT c.cid,
             CAST(COALESCE(s.sx // s.n, c.cx) AS BIGINT) AS cx,
             CAST(COALESCE(s.sy // s.n, c.cy) AS BIGINT) AS cy
      FROM c2 c LEFT JOIN (
        SELECT cid, COUNT(*) AS n, SUM(x0) AS sx, SUM(x1) AS sy
        FROM a3 GROUP BY cid) s ON s.cid = c.cid),
    af AS (
      SELECT id, cid FROM (
        SELECT p.id, c.cid,
               (p.x0 - c.cx) * (p.x0 - c.cx)
               + (p.x1 - c.cy) * (p.x1 - c.cy) AS d
        FROM pts p CROSS JOIN c3 c)
      QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, cid) = 1)
    SELECT CAST(c.cid AS BIGINT) AS cluster,
           CAST(g.n AS BIGINT) AS n_points,
           c.cx AS centroid_price_cents,
           c.cy AS centroid_size_units
    FROM (SELECT cid, COUNT(*) AS n FROM af GROUP BY cid) g
    JOIN c3 c ON c.cid = g.cid
    """,
    doc="Integer-exact Lloyd k-means (k=4, 3 fixed iterations) over "
    "parts in (price-cents, size*2000) feature space "
    "(operators/clustering.py:kmeans_lloyd) — the clustering "
    "TRAINING rung next to embedding_silhouette's evaluation and "
    "the ANN family's sampled coarse quantizers. Deterministic "
    "smallest-key init, exact BIGINT squared distances with "
    "centroid-id tiebreaks, exact floor-division centroid updates: "
    "every iteration is bit-identical on any engine or partitioning "
    "(the pagerank discipline applied to ML). Per iteration the "
    "fact only flows through one broadcast k-way argmin + one "
    "map-side-combined groupBy; driver state is k centroid rows",
)
def kmeans_parts_price_size_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.clustering import kmeans_lloyd

    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("price_cents"),
        (F.col("p_size").cast("long") * 2000).alias("size_units"),
    )
    return kmeans_lloyd(
        part,
        "p_partkey",
        ["price_cents", "size_units"],
        k=4,
        iterations=3,
    )


@_q(
    "fd_audit_catalog",
    """
    WITH f1 AS (
      SELECT 'part: p_brand->p_type' AS fd, nr
      FROM (SELECT COUNT(DISTINCT p_type)
                   + CASE WHEN COUNT(*) > COUNT(p_type)
                          THEN 1 ELSE 0 END AS nr
            FROM part WHERE p_brand IS NOT NULL GROUP BY p_brand)),
    f2 AS (
      SELECT 'part: p_type->p_size' AS fd, nr
      FROM (SELECT COUNT(DISTINCT p_size)
                   + CASE WHEN COUNT(*) > COUNT(p_size)
                          THEN 1 ELSE 0 END AS nr
            FROM part WHERE p_type IS NOT NULL GROUP BY p_type)),
    f3 AS (
      SELECT 'supplier: s_nationkey->n_name' AS fd, nr
      FROM (SELECT COUNT(DISTINCT n_name)
                   + CASE WHEN COUNT(*) > COUNT(n_name)
                          THEN 1 ELSE 0 END AS nr
            FROM supplier JOIN nation ON n_nationkey = s_nationkey
            WHERE s_nationkey IS NOT NULL GROUP BY s_nationkey)),
    f4 AS (
      SELECT 'orders: o_orderkey->o_orderstatus' AS fd, nr
      FROM (SELECT COUNT(DISTINCT o_orderstatus)
                   + CASE WHEN COUNT(*) > COUNT(o_orderstatus)
                          THEN 1 ELSE 0 END AS nr
            FROM orders WHERE o_orderkey IS NOT NULL
            GROUP BY o_orderkey)),
    u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2
          UNION ALL SELECT * FROM f3 UNION ALL SELECT * FROM f4)
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS lhs_keys,
           CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_keys,
           ROUND(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS violation_rate,
           CAST(MAX(nr) AS BIGINT) AS max_rhs_values,
           MAX(nr) <= 1 AS holds
    FROM u GROUP BY fd
    """,
    doc="Functional-dependency audit across four candidate "
    "dependencies (operators/dq.py:fd_violations): two catalog FDs "
    "that FAIL on this data (brand->type, type->size), one that "
    "HOLDS via the dimension join (nationkey->name), and one "
    "primary-key FD (orderkey->status). The schema-discovery rung "
    "of the DQ family: each FD is one two-level distinct rollup "
    "(pair groupBy then key groupBy — pair cardinality shuffles, "
    "never the fact) reduced to a single row; NULL rhs values are "
    "counted as values via a NULL-flagged struct",
)
def fd_audit_catalog_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dq import fd_violations

    part = load(spark, sf_dir, "part")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    sn = sup.join(
        F.broadcast(nat),
        sup["s_nationkey"] == nat["n_nationkey"],
    )
    frames = [
        fd_violations(part, ["p_brand"], "p_type", "part: p_brand->p_type"),
        fd_violations(part, ["p_type"], "p_size", "part: p_type->p_size"),
        fd_violations(
            sn, ["s_nationkey"], "n_name", "supplier: s_nationkey->n_name"
        ),
        fd_violations(
            orders,
            ["o_orderkey"],
            "o_orderstatus",
            "orders: o_orderkey->o_orderstatus",
        ),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@_q(
    "zorder_pruning_parts",
    """
    WITH pts AS (
      SELECT p_partkey,
             CAST(p_size AS BIGINT) AS size,
             (CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                   AS BIGINT) - 90000) // 400 AS pb
      FROM part),
    zk AS (
      SELECT p_partkey, size, pb,
             ( ((pb >> 0) & 1) << 0 ) | ( ((size >> 0) & 1) << 1 )
           | ( ((pb >> 1) & 1) << 2 ) | ( ((size >> 1) & 1) << 3 )
           | ( ((pb >> 2) & 1) << 4 ) | ( ((size >> 2) & 1) << 5 )
           | ( ((pb >> 3) & 1) << 6 ) | ( ((size >> 3) & 1) << 7 )
           | ( ((pb >> 4) & 1) << 8 ) | ( ((size >> 4) & 1) << 9 )
           | ( ((pb >> 5) & 1) << 10 ) | ( ((size >> 5) & 1) << 11 )
           | ( ((pb >> 6) & 1) << 12 ) | ( ((size >> 6) & 1) << 13 )
           | ( ((pb >> 7) & 1) << 14 ) | ( ((size >> 7) & 1) << 15 )
             AS zkey
      FROM pts),
    gz AS (
      SELECT ntile(16) OVER (ORDER BY zkey, p_partkey) AS fg,
             size, pb
      FROM zk),
    gl AS (
      SELECT ntile(16) OVER (ORDER BY pb, size, p_partkey) AS fg,
             size, pb
      FROM pts),
    sz AS (
      SELECT 'zorder' AS layout, CAST(fg AS BIGINT) AS file_group,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(pb) AS BIGINT) AS min_pb,
             CAST(MAX(pb) AS BIGINT) AS max_pb,
             CAST(MIN(size) AS BIGINT) AS min_size,
             CAST(MAX(size) AS BIGINT) AS max_size
      FROM gz GROUP BY fg),
    sl AS (
      SELECT 'linear' AS layout, CAST(fg AS BIGINT) AS file_group,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(pb) AS BIGINT) AS min_pb,
             CAST(MAX(pb) AS BIGINT) AS max_pb,
             CAST(MIN(size) AS BIGINT) AS min_size,
             CAST(MAX(size) AS BIGINT) AS max_size
      FROM gl GROUP BY fg),
    u AS (SELECT * FROM sz UNION ALL SELECT * FROM sl)
    SELECT layout, file_group, n_rows, min_pb, max_pb,
           min_size, max_size,
           (max_size < 10 OR min_size > 20) AS prunable
    FROM u
    """,
    doc="Z-order vs linear layout pruning audit over part "
    "(operators/layout.py:zorder_key + layout_pruning_stats): "
    "interleave (price-bucket, size) bits into a Morton key, split "
    "the sorted table into 16 simulated files, and report each "
    "file's min/max footer stats plus whether a predicate on the "
    "SECONDARY dimension (size 10-20; domain is 1-50, so pruning is "
    "earned per-group, never vacuous) could SKIP it — the "
    "Delta/Iceberg OPTIMIZE ZORDER capability as a measurable "
    "operator, posed the way it matters: the linear layout is "
    "sorted by price-bucket first, so its files span all sizes and "
    "prune NOTHING on a size predicate (0/16 at sf0.01+), while the "
    "z-ordered layout stays narrow in both dimensions and skips "
    "8-11 of 16 (measured at sf0.001/0.01/0.1). Pure bit-arithmetic "
    "column expressions (codegen, no UDF); at scale the ntile "
    "stands in for repartitionByRange on the same key and the stats "
    "frame IS per-file metadata (n_groups rows)",
)
def zorder_pruning_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.layout import layout_pruning_stats, zorder_key

    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("size"),
        F.expr(
            "(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
            " - 90000) div 400"
        ).alias("pb"),
    )
    box = {"size": (10, 20)}
    z = layout_pruning_stats(
        part.withColumn("__z", zorder_key(["pb", "size"], bits=8)),
        ["pb", "size"],
        F.col("__z"),
        "p_partkey",
        16,
        box,
        "zorder",
    )
    lin = layout_pruning_stats(
        part.withColumn(
            "__lin",
            F.col("pb") * F.lit(1 << 16) + F.col("size"),
        ),
        ["pb", "size"],
        F.col("__lin"),
        "p_partkey",
        16,
        box,
        "linear",
    )
    return z.unionByName(lin)


@_q(
    "snapshot_diff_supplier",
    """
    WITH old AS (
      SELECT s_suppkey, s_name, s_nationkey,
             ROUND(s_acctbal, 6) AS s_acctbal
      FROM supplier),
    new AS (
      -- deterministic synthetic replica drift: drop keys %17=3,
      -- rebalance keys %11=0, append shifted copies of keys %23=0
      SELECT s_suppkey, s_name, s_nationkey,
             CASE WHEN s_suppkey % 11 = 0
                  THEN ROUND(s_acctbal + 100, 6) ELSE s_acctbal END
               AS s_acctbal
      FROM old WHERE s_suppkey % 17 <> 3
      UNION ALL
      SELECT s_suppkey + 100000, s_name, s_nationkey, s_acctbal
      FROM old WHERE s_suppkey % 23 = 0),
    j AS (
      SELECT COALESCE(n.s_suppkey, o.s_suppkey) AS s_suppkey,
             COALESCE(n.s_name, o.s_name) AS s_name,
             COALESCE(n.s_nationkey, o.s_nationkey) AS s_nationkey,
             CASE WHEN n.s_suppkey IS NOT NULL THEN n.s_acctbal
                  ELSE o.s_acctbal END AS s_acctbal,
             CASE
               WHEN o.s_suppkey IS NOT NULL AND n.s_suppkey IS NOT NULL
                    AND (o.s_name IS DISTINCT FROM n.s_name
                         OR o.s_nationkey IS DISTINCT FROM n.s_nationkey
                         OR o.s_acctbal IS DISTINCT FROM n.s_acctbal)
                 THEN 'U'
               WHEN o.s_suppkey IS NULL THEN 'I'
               WHEN n.s_suppkey IS NULL THEN 'D'
             END AS op
      FROM old o FULL OUTER JOIN new n ON o.s_suppkey = n.s_suppkey)
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal, op
    FROM j WHERE op IS NOT NULL
    """,
    doc="snapshot diff -> CDC batch (operators/scd.py:snapshot_diff),"
    " the INVERSE of cdc_supplier_apply: derive the I/U/D change "
    "batch that turns the supplier snapshot into a drifted replica — "
    "how replication validates and repairs without re-shipping the "
    "table. NULL-safe per-column comparison via struct eqNullSafe "
    "(no rendering, no hash false-negatives); identical rows emit "
    "nothing. ONE full outer join on the key both sides are already "
    "clustered by (bucketed warehouse layouts skip the exchange); "
    "roundtrip apply_cdc(old, diff) == new is pytest-pinned",
)
def snapshot_diff_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scd import snapshot_diff

    old = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey",
        F.round("s_acctbal", 6).alias("s_acctbal"),
    )
    new = (
        old.filter(F.col("s_suppkey") % 17 != 3)
        .withColumn(
            "s_acctbal",
            F.when(
                F.col("s_suppkey") % 11 == 0,
                F.round(F.col("s_acctbal") + 100, 6),
            ).otherwise(F.col("s_acctbal")),
        )
        .unionByName(
            old.filter(F.col("s_suppkey") % 23 == 0).withColumn(
                "s_suppkey", F.col("s_suppkey") + 100000
            )
        )
    )
    return snapshot_diff(old, new, ["s_suppkey"])


@_q(
    "fingerprint_orders",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substring(md5(
                 chr(0) || 'V' || CAST(o_orderkey AS VARCHAR)
              || chr(31) || chr(0) || 'V' || CAST(o_custkey AS VARCHAR)
              || chr(31) || chr(0) || 'V'
                 || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
              || chr(31) || chr(0) || 'V' || CAST(CAST(o_orderdate AS DATE)
                                             AS VARCHAR)), 1, 15))::BIGINT
             AS HUGEINT))
             % (1152921504606846976::HUGEINT) AS BIGINT) AS fingerprint
    FROM orders GROUP BY o_orderstatus
    """,
    doc="order-insensitive table fingerprint "
    "(operators/dq.py:table_fingerprint): per-status replication "
    "checksum — two copies of orders agree iff these mod-2^60 BIGINT "
    "residues of summed engine-portable md5_60 row hashes agree, "
    "under ANY row order, partitioning, or engine (the oracle "
    "recomputes the identical arithmetic; THIS GREEN ROW IS ITSELF "
    "the cross-engine replication check). Modular addition keeps "
    "mergeability: fp(A∪B) = (fp(A)+fp(B)) mod 2^60, so "
    "per-partition fingerprints roll up to any grain; the BIGINT "
    "residue dodges the bare-decimal→double ulp divergence that "
    "reddened the round-7 row. NULLs carry an impersonation-proof "
    "\\x00N tag; floats quantize to DECIMAL first (the round-6 "
    "compare rule). One map-side-combined groupBy",
)
def fingerprint_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dq import table_fingerprint

    orders = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_price"),
        F.col("o_orderdate").cast("date").alias("o_date"),
    )
    return table_fingerprint(
        orders,
        ["o_orderstatus"],
        ["o_orderkey", "o_custkey", "o_price", "o_date"],
    )


@_q(
    "cuped_user_value",
    """
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events
               WHERE value IS NOT NULL),
    pre AS (
      SELECT user_id,
             ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*), 6) AS x
      FROM e WHERE ts < TIMESTAMP '2024-01-16' GROUP BY user_id),
    post AS (
      SELECT user_id,
             ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*), 6) AS y
      FROM e WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY user_id),
    u AS (
      SELECT post.user_id, pre.x, post.y,
             CASE WHEN substring(md5(CAST(post.user_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS arm
      FROM post JOIN pre ON pre.user_id = post.user_id),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS VARCHAR)
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(y AS DECIMAL(38,6))) AS VARCHAR)
                  AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(18,6))
                           * CAST(y AS DECIMAL(18,6))
                           AS DECIMAL(38,12))) AS VARCHAR)
                  AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(18,6))
                           * CAST(x AS DECIMAL(18,6))
                           AS DECIMAL(38,12))) AS VARCHAR)
                  AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(18,6))
                           * CAST(y AS DECIMAL(18,6))
                           AS DECIMAL(38,12))) AS VARCHAR)
                  AS DOUBLE) AS syy,
             CAST(CAST(SUM(CASE WHEN arm = 'A'
                           THEN CAST(y AS DECIMAL(38,6)) END) AS VARCHAR)
                  AS DOUBLE)
               AS sya,
             CAST(CAST(SUM(CASE WHEN arm <> 'A'
                           THEN CAST(y AS DECIMAL(38,6)) END) AS VARCHAR)
                  AS DOUBLE)
               AS syb,
             CAST(CAST(SUM(CASE WHEN arm = 'A'
                           THEN CAST(x AS DECIMAL(38,6)) END) AS VARCHAR)
                  AS DOUBLE)
               AS sxa,
             CAST(CAST(SUM(CASE WHEN arm <> 'A'
                           THEN CAST(x AS DECIMAL(38,6)) END) AS VARCHAR)
                  AS DOUBLE)
               AS sxb
      FROM u)
    SELECT n_a,
           CAST(n - n_a AS BIGINT) AS n_b,
           ROUND(sya / n_a, 6) AS mean_a,
           ROUND(syb / (n - n_a), 6) AS mean_b,
           ROUND(syb / (n - n_a) - sya / n_a, 6) AS diff_raw,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
           ROUND(sya / n_a - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                 * (sxa / n_a - sx / n), 6) AS adj_mean_a,
           ROUND(syb / (n - n_a) - (n * sxy - sx * sy)
                 / (n * sxx - sx * sx)
                 * (sxb / (n - n_a) - sx / n), 6) AS adj_mean_b,
           ROUND((syb / (n - n_a) - (n * sxy - sx * sy)
                  / (n * sxx - sx * sx) * (sxb / (n - n_a) - sx / n))
                 - (sya / n_a - (n * sxy - sx * sy)
                    / (n * sxx - sx * sx) * (sxa / n_a - sx / n)), 6)
             AS diff_adj,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS var_reduction
    FROM m
    """,
    doc="CUPED variance-reduced A/B readout "
    "(operators/relational.py:cuped_readout): each user's "
    "second-half value metric adjusted by their PRE-period covariate "
    "(first-half mean, stable_avg discipline), theta = cov/var from "
    "EXACT DECIMAL moments (ols_order_value discipline — summation "
    "order unobservable), arms by the md5 parity both engines "
    "compute identically. One unit-frame aggregate -> 1 row; "
    "var_reduction = corr(x,y)^2 is the variance the covariate "
    "removes. The workhorse rung above ab_experiment_readout's raw "
    "Welch readout",
)
def cuped_user_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import cuped_readout

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    split = F.lit("2024-01-16").cast("timestamp")
    pre = (
        ev.filter(F.col("ts") < split)
        .groupBy("user_id")
        .agg(stable_avg("value").alias("x"))
    )
    post = (
        ev.filter(F.col("ts") >= split)
        .groupBy("user_id")
        .agg(stable_avg("value").alias("y"))
    )
    units = post.join(pre, "user_id").withColumn(
        "arm",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                list("01234567")
            ),
            "A",
        ).otherwise("B"),
    )
    return cuped_readout(units, "arm", "y", "x", "A", "B")


@_q(
    "tpch_q2_min_cost_supp",
    """
    WITH cand AS (
      SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT c.l_partkey AS p_partkey,
           p.p_brand,
           s.s_name,
           n.n_name,
           ROUND(c.l_extendedprice, 6) AS min_price
    FROM cand c
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE c.l_extendedprice = (SELECT MIN(c2.l_extendedprice)
                               FROM cand c2
                               WHERE c2.l_partkey = c.l_partkey)
    ORDER BY min_price DESC, p_partkey, s_name LIMIT 100
    """,
    doc="TPC-H Q2 shape: cheapest in-region supplier per part — the "
    "CORRELATED SCALAR-MIN subquery, compiled as aggregate-then-"
    "rejoin (groupBy min on the candidate frame + equi-join back), "
    "the third argmin form next to q02's window argmax and "
    "topk_per_group's row_number cut: no per-group window state, "
    "partial-aggregable, ties kept — the shape to prefer when groups "
    "are huge and only the extreme row survives. Adapted to the "
    "testdata (no partsupp table): candidates are EUROPE lineitems. "
    "Region/nation/supplier dims broadcast; the candidate frame "
    "shuffles once on partkey for the min and reuses that exchange "
    "for the rejoin. Top-100 -> TakeOrderedAndProject",
)
def tpch_q2_min_cost_supp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part")
    # the candidate frame carries the dim attributes through, so the
    # argmin rejoin never touches the dims again (no self-join)
    cand = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("l_partkey", "l_extendedprice", "s_name", "n_name")
    )
    mins = cand.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("__min_price")
    )
    winners = cand.join(mins, "l_partkey").filter(
        F.col("l_extendedprice") == F.col("__min_price")
    )
    return (
        winners.join(F.broadcast(p), winners["l_partkey"] == p["p_partkey"])
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_brand",
            "s_name",
            "n_name",
            F.round("l_extendedprice", 6).alias("min_price"),
        )
        .orderBy(F.col("min_price").desc(), "p_partkey", "s_name")
        .limit(100)
    )


@_q(
    "tpch_q13_custdist",
    """
    WITH co AS (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: distribution of orders per customer "
    "INCLUDING zero-order customers — the LEFT JOIN + COUNT(col) + "
    "re-aggregate double grouping; the join predicate carries the "
    "non-key filter (pushed to the orders scan under the LEFT join "
    "rewrite), so excluded orders count as absent, not as dropped "
    "customers. First groupBy shuffles (custkey) pairs; the second "
    "aggregates the per-customer counts — output is the tiny count "
    "histogram. Adapted filter: non-URGENT orders (testdata has no "
    "o_comment)",
)
def tpch_q13_custdist_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    co = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@_q(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                         * CAST(l_discount AS DECIMAL(3,2)))
                     AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '2000-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '2001-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecasting revenue change: the purest "
    "scan-dominated classic — three conjunctive filters all pushed "
    "to the parquet scan (date range, discount band, quantity cap), "
    "one exact DECIMAL(12,2)x(3,2) product sum, map-side partial "
    "aggregation into a single-row reduce: ZERO join, ZERO groupBy "
    "shuffle; at 100 TB the plan is min/max-pruned row groups + one "
    "all-reduce. Discount literals compare against the same parquet "
    "doubles on both engines; the sum leaves decimal via the "
    "correctly-rounded VARCHAR roundtrip",
)
def tpch_q6_forecast_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("2000-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("2001-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_discount").cast("decimal(3,2)")
        )
        .cast("double")
        .alias("revenue")
    )


@_q(
    "tpch_q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * CAST(1 - l.l_discount AS DECIMAL(3,2)))
                     AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND CAST(l.l_shipdate AS DATE) >= DATE '2000-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 volume shipping: bilateral trade between two "
    "nations by year — the two-role dimension pattern (nation joins "
    "TWICE, once through the supplier leg, once through the "
    "customer leg) plus a disjunctive cross-leg predicate. Plan: "
    "nation/supplier/customer broadcast; the nation-pair filter "
    "cannot push below the joins (it correlates both legs) but the "
    "date filter pushes to the lineitem scan; one groupBy shuffle "
    "on the tiny (nation, nation, year) key. Exact decimal volume, "
    "VARCHAR-roundtrip output, fully-ordered deterministic result",
)
def tpch_q7_volume_shipping_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") >= F.lit("2000-01-01").cast("date")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("__n1key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("__n2key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n1), F.col("__n1key") == s["s_nationkey"])
        .join(F.broadcast(n2), F.col("__n2key") == c["c_nationkey"])
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_q(
    "tpch_q8_market_share",
    """
    WITH vol AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l.l_discount AS DECIMAL(3,2)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY')
    SELECT o_year,
           ROUND(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume
                               ELSE CAST(0 AS DECIMAL(16,4)) END) AS VARCHAR) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 national market share: NATION_3 suppliers' slice "
    "of AMERICA customers' ECONOMY-part revenue by order year — the "
    "conditional-share-of-total pattern over a six-dim snowflake "
    "(nation joins twice again). Both numerator and denominator "
    "accumulate as exact DECIMAL(16,4) before ONE double division "
    "(a ratio is ulp-insulated: 1e-16 relative error sits 10 "
    "orders below the 6dp grain). All dims broadcast; region/type "
    "filters cut the fact before the groupBy; one tiny (year) "
    "shuffle",
)
def tpch_q8_market_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = n.select(
        F.col("n_nationkey").alias("__n2key"),
        F.col("n_regionkey").alias("__n2region"),
    )
    n1 = n.select(
        F.col("n_nationkey").alias("__n1key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n2), F.col("__n2key") == c["c_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == F.col("__n2region"))
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n1), F.col("__n1key") == s["s_nationkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
            ).alias("volume"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3", F.col("volume")
                    ).otherwise(F.lit(0).cast("decimal(16,4)"))
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@_q(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                           * CAST(1 - l.l_discount AS DECIMAL(3,2))
                         - CAST(l.l_quantity AS DECIMAL(12,0))
                           * (CAST(p.p_retailprice AS DECIMAL(12,2))
                              * CAST(0.6 AS DECIMAL(2,1))))
                     AS VARCHAR) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 product-type profit: per supplier-nation per year, "
    "profit = revenue minus cost over name-matched parts. Adapted "
    "to the testdata (no partsupp.ps_supplycost): unit cost is the "
    "documented proxy 0.6 * p_retailprice, keeping the shape — a "
    "LIKE-filtered part dim, a four-join fact expansion, and a "
    "subtraction of two money products — intact. Every term is "
    "exact decimal (2dp x 2dp, integer qty x 3dp cost), so the "
    "group sums are order-exact; output via the correctly-rounded "
    "VARCHAR roundtrip. Part/supplier/nation broadcast; the LIKE "
    "filter cuts part BEFORE its join (predicate pushdown into the "
    "dim scan); one (nation, year) groupBy shuffle",
)
def tpch_q9_product_profit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(3,2)") - F.col("l_quantity").cast("decimal(12,0)") * (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit("0.6").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@_q(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           ROUND(CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l.l_discount AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE), 6) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '2001-01-01'
      AND o.o_orderdate < TIMESTAMP '2001-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting: top-20 customers by "
    "revenue lost to returns in a quarter. The quarter filter "
    "pushes to the orders scan and the returnflag filter to the "
    "lineitem scan BEFORE the join, so the joined fact is ~1/12 x "
    "~1/3 of lineitem; nation broadcasts; per-customer groups are "
    "a handful of rows (exact decimal sums; the 6dp-rounded value "
    "plus the unique custkey tiebreak makes the top-20 cut "
    "deterministic) and the LIMIT compiles to "
    "TakeOrderedAndProject — no global sort",
)
def tpch_q10_returned_items_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
                ).cast("double"),
                6,
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_q(
    "tpch_q11_important_parts",
    """
    WITH cand AS (
      SELECT l.l_partkey,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l.l_discount AS DECIMAL(3,2)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'),
    per AS (
      SELECT l_partkey, SUM(val) AS value FROM cand GROUP BY l_partkey),
    tot AS (SELECT SUM(value) AS total FROM per)
    SELECT per.l_partkey AS p_partkey,
           ROUND(CAST(per.value AS DOUBLE), 6) AS part_value
    FROM per CROSS JOIN tot
    WHERE per.value > tot.total * CAST(0.001 AS DECIMAL(6,4))
    ORDER BY part_value DESC, p_partkey
    """,
    doc="TPC-H Q11 important stock: parts whose in-region revenue "
    "exceeds a FRACTION of the region total — the "
    "share-of-global-scalar HAVING pattern. Adapted to the testdata "
    "(no partsupp): value is ASIA-supplier lineitem revenue. The "
    "cut compares exact decimals on BOTH sides (group sum vs total "
    "x exact decimal 0.001), so membership is engine- and "
    "partitioning-exact — only the displayed value rounds to 6dp. "
    "Plan: region/nation/supplier broadcast, one partkey groupBy, "
    "a 1-row broadcast total joined back; nothing row-scale moves "
    "twice",
)
def tpch_q11_important_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cand = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
        .select(
            "l_partkey",
            (
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
            ).alias("__val"),
        )
    )
    per = cand.groupBy("l_partkey").agg(F.sum("__val").alias("__value"))
    tot = per.agg(F.sum("__value").alias("__total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(
            F.col("__value")
            > F.col("__total") * F.lit("0.001").cast("decimal(6,4)")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("__value").cast("double"), 6).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@_q(
    "tpch_q12_late_shipments",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE)
            > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
      AND CAST(l.l_shipdate AS DATE) >= DATE '2000-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '2001-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    doc="TPC-H Q12 shipping modes / late lines: conditional priority "
    "counts over lines that shipped late. Adapted to the testdata "
    "(no l_shipmode/commitdate/receiptdate): 'late' is shipdate "
    "more than 60 days after the order date, grouped by linestatus "
    "— the cross-table date-arithmetic predicate (it references "
    "BOTH sides, so it evaluates post-join while the year filter "
    "still pushes to the lineitem scan) and the dual conditional "
    "count are the capability. One equi-join shuffle on orderkey, "
    "one 2-row groupBy",
)
def tpch_q12_late_shipments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("2000-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("2001-01-01").cast("date"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 60)
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@_q(
    "tpch_q14_promo_revenue",
    """
    SELECT ROUND(100.0
                 * CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                                      * CAST(1 - l.l_discount AS DECIMAL(3,2))
                                 ELSE CAST(0 AS DECIMAL(16,4)) END) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                            * CAST(1 - l.l_discount AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '2000-09-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '2000-10-01'
    """,
    doc="TPC-H Q14 promotion effect: promo-typed parts' percentage "
    "of one month's revenue. The testdata's p_type is already the "
    "category ('PROMO'), so the LIKE 'PROMO%%' prefix becomes "
    "equality. Month filter pushes to the lineitem scan, part "
    "broadcasts, single-row conditional-share readout; both sums "
    "exact decimal with ONE final double division (ratio is "
    "ulp-insulated)",
)
def tpch_q14_promo_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("2000-09-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("2000-10-01").cast("date"))
    )
    p = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(3,2)")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(
                        F.lit(0).cast("decimal(16,4)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@_q(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l_discount AS DECIMAL(3,2))) AS total_rev
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '2000-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '2000-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           ROUND(CAST(rev.total_rev AS DOUBLE), 6) AS total_revenue
    FROM rev
    JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 top supplier: the revenue VIEW + scalar-MAX "
    "subquery classic — per-supplier quarter revenue, then exactly "
    "the supplier(s) hitting the maximum (ties kept, per the spec). "
    "The max comparison happens on exact DECIMAL revenue, so the "
    "winner set is engine- and partitioning-exact; only the display "
    "value rounds. Plan: one suppkey groupBy (map-side combined), a "
    "1-row broadcast max joined back — the aggregate-then-rejoin "
    "argmax, third use of the q2/q15 pattern; supplier dim "
    "broadcasts",
)
def tpch_q15_top_supplier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("2000-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("2000-04-01").cast("date"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
        ).alias("__total_rev")
    )
    mx = rev.agg(F.max("__total_rev").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("__total_rev") == F.col("__max_rev"))
        .join(F.broadcast(s), s["s_suppkey"] == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("__total_rev").cast("double"), 6).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@_q(
    "tpch_q16_supplier_cnt",
    """
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ok_supp AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs pr
    JOIN part p ON p.p_partkey = pr.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 5, 9, 15, 20)
      AND pr.l_suppkey IN (SELECT s_suppkey FROM ok_supp)
    GROUP BY p.p_brand, p.p_type, CAST(p.p_size AS BIGINT)
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
    """,
    doc="TPC-H Q16 parts/supplier relationship: distinct supplier "
    "counts per (brand, type, size) bucket with a NOT-this-brand "
    "filter and an excluded-supplier subquery. Adapted to the "
    "testdata (no partsupp, no s_comment): the part-supplier "
    "relation is DISTINCT lineitem pairs and the 'complaints' "
    "exclusion is suppliers with negative account balance, kept as "
    "a semi-join (the spec's NOT IN has no NULLs here). Pairs "
    "dedup first — the COUNT DISTINCT shuffles (brand,type,size, "
    "suppkey) pairs, never raw lineitem; part and the supplier "
    "filter broadcast. Fully-ordered deterministic output",
)
def tpch_q16_supplier_cnt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 5, 9, 15, 20)
    )
    ok = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0)
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(p), pairs["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(ok.select("s_suppkey")),
            pairs["l_suppkey"] == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy(
            "p_brand", "p_type", F.col("p_size").cast("long").alias("p_size")
        )
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@_q(
    "tpch_q17_small_qty_revenue",
    """
    WITH pa AS (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT ROUND(CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa    ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#7'
      AND l.l_quantity < 0.2 * pa.avg_qty
    """,
    doc="TPC-H Q17 small-quantity-order revenue: lines whose "
    "quantity is under 20%% of their part's average — the "
    "correlated per-group AVG subquery, compiled as "
    "aggregate-then-rejoin on partkey. Quantities are "
    "integer-valued doubles, so each part's sum/count average and "
    "the 0.2x threshold are bit-identical on both engines; the "
    "kept-line price sum is exact decimal with one final /7 "
    "division. The brand filter cuts part to ~4%% before its "
    "broadcast join; the per-part average is a partkey-keyed "
    "aggregate whose exchange co-partitions with the rejoin",
)
def tpch_q17_small_qty_revenue_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#7")
    pa = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(pa, li["l_partkey"] == F.col("__pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast(
                    "double"
                )
                / F.lit(7.0),
                6,
            ).alias("avg_yearly")
        )
    )


@_q(
    "tpch_q19_disjunctive_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * CAST(1 - l.l_discount AS DECIMAL(3,2)))
                     AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 discounted revenue: the disjunction-of-"
    "conjunctions predicate (three brand/size/quantity bands "
    "OR-ed) spanning BOTH join sides — the shape that tests an "
    "optimizer's ability to split a cross-side OR: the "
    "part-only disjuncts (brand+size) reduce the broadcast side, "
    "the quantity bounds (1..30 overall) derive a scan-level "
    "filter, and the full predicate evaluates post-join. Exact "
    "decimal sum, VARCHAR-roundtrip output, single-row reduce "
    "(a bare aggregate keeps the row even when nothing matches)",
)
def tpch_q19_disjunctive_revenue_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(3,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@_q(
    "tpch_q20_dominant_supplier",
    """
    WITH sp AS (
      SELECT l.l_suppkey, l.l_partkey,
             CAST(SUM(l.l_quantity) AS BIGINT) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'ECONOMY'
        AND CAST(l.l_shipdate AS DATE) >= DATE '2000-01-01'
        AND CAST(l.l_shipdate AS DATE) < DATE '2001-01-01'
      GROUP BY l.l_suppkey, l.l_partkey),
    pt AS (
      SELECT l_partkey,
             CAST(SUM(qty) AS BIGINT) AS total_qty,
             CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM sp GROUP BY l_partkey),
    dominant AS (
      SELECT DISTINCT sp.l_suppkey
      FROM sp JOIN pt ON pt.l_partkey = sp.l_partkey
      WHERE 2 * sp.qty * pt.n_supp > 3 * pt.total_qty
        AND pt.n_supp >= 2)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 potential part promotion: suppliers holding a "
    "dominant share of a part's flow — the nested "
    "IN(SELECT..WHERE correlated-aggregate-threshold) shape. "
    "Adapted to the testdata (no partsupp.ps_availqty): a supplier "
    "qualifies on a part if its year-2000 shipped quantity exceeds "
    "1.5x the part's per-supplier mean, written CROSS-MULTIPLIED "
    "(2*qty*n_supp > 3*total) so the comparison is exact BIGINT — "
    "no division, engine-exact membership at any scale. Plan: one "
    "(supp, part) groupBy, one part rollup, an equi-join back on "
    "partkey (the threshold is scale-free, so the dominant set "
    "stays non-degenerate at every SF), then a semi join into the "
    "region-filtered supplier dim (broadcast)",
)
def tpch_q20_dominant_supplier_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("2000-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("2001-01-01").cast("date"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sp = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").cast("long").alias("__qty"))
    )
    pt = sp.groupBy(F.col("l_partkey").alias("__ptk")).agg(
        F.sum("__qty").cast("long").alias("__total_qty"),
        F.count("*").cast("long").alias("__n_supp"),
    )
    dominant = (
        sp.join(pt, sp["l_partkey"] == F.col("__ptk"))
        .filter(
            (F.col("__n_supp") >= 2)
            & (
                F.lit(2) * F.col("__qty") * F.col("__n_supp")
                > F.lit(3) * F.col("__total_qty")
            )
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
        .join(dominant, s["s_suppkey"] == dominant["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@_q(
    "tpch_q22_global_sales_opportunity",
    """
    WITH rich AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(c.c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer c),
    thr AS (
      SELECT SUM(bal) AS pos_sum,
             CAST(COUNT(*) AS BIGINT) AS pos_cnt
      FROM rich WHERE bal > 0),
    elig AS (
      -- cross-multiplied threshold: bal > avg(positive bal), written
      -- bal * cnt > sum so both sides stay exact DECIMAL (no
      -- engine-dependent decimal division)
      SELECT r.c_custkey, r.c_nationkey, r.bal
      FROM rich r CROSS JOIN thr
      WHERE r.bal * thr.pos_cnt > thr.pos_sum
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = r.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01'))
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(CAST(SUM(e.bal) AS DOUBLE), 6) AS totacctbal
    FROM elig e
    JOIN nation n ON n.n_nationkey = e.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="TPC-H Q22 global sales opportunity: customers richer than "
    "the average positive balance with NO RECENT ORDERS (none since "
    "2000-01-01; every testdata customer has SOME order, so the "
    "spec's dormancy window keeps the anti join non-vacuous) — "
    "scalar AVG subquery + NOT EXISTS anti join + rollup. Adapted "
    "to the testdata (no c_phone): grouped by nation instead of "
    "phone prefix. The above-average cut is CROSS-MULTIPLIED (bal "
    "> sum) so membership compares exact decimals — decimal "
    "division rounds differently per engine and a double average "
    "is summation-order dependent; neither can flip a customer "
    "here. Plan: 1-row broadcast threshold, anti join shuffles "
    "only custkeys, nation broadcasts into the tiny rollup",
)
def tpch_q22_global_sales_opportunity_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("__bal"),
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    n = load(spark, sf_dir, "nation")
    thr = c.filter(F.col("__bal") > 0).agg(
        F.sum("__bal").alias("__pos_sum"),
        F.count("*").cast("long").alias("__pos_cnt"),
    )
    elig = (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("__bal") * F.col("__pos_cnt") > F.col("__pos_sum"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
    )
    return (
        elig.join(F.broadcast(n), n["n_nationkey"] == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("__bal").cast("double"), 6).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


#: Poisson(1) inverse-CDF thresholds on a uniform in [0, 1e9) — the
#: SQL mirror of operators/resample.py:_POISSON1_THRESHOLDS.
_POIS_SQL_W = (
    "CASE WHEN {u} < 367879441 THEN 0 WHEN {u} < 735758882 THEN 1 "
    "WHEN {u} < 919698602 THEN 2 WHEN {u} < 981011843 THEN 3 "
    "WHEN {u} < 996340153 THEN 4 ELSE 5 END"
)


@_q(
    "bootstrap_ci_order_value",
    """
    WITH reps AS (SELECT unnest(range(64)) AS b),
    cells AS (
      SELECT o.o_orderstatus, reps.b,
             SUM(({w}) * CAST(o.o_totalprice AS DECIMAL(18,6))) AS num,
             CAST(SUM({w}) AS BIGINT) AS den
      FROM orders o CROSS JOIN reps
      WHERE o.o_orderkey IS NOT NULL
        AND TRY_CAST(o.o_totalprice AS DECIMAL(18,6)) IS NOT NULL
      GROUP BY o.o_orderstatus, reps.b),
    means AS (
      SELECT o_orderstatus, b,
             ROUND(CAST(num AS DOUBLE) / den, 6) AS mean_b
      FROM cells WHERE den > 0),
    ranked AS (
      SELECT o_orderstatus, b, mean_b,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY mean_b, b) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS m
      FROM means),
    ci AS (
      SELECT o_orderstatus,
             CAST(MAX(m) AS BIGINT) AS n_replicates,
             MAX(CASE WHEN rn = FLOOR(m * 0.05) + 1
                      THEN mean_b END) AS ci_lo,
             MAX(CASE WHEN rn = m - FLOOR(m * 0.05)
                      THEN mean_b END) AS ci_hi
      FROM ranked GROUP BY o_orderstatus),
    pt AS (
      -- the operator's admission rule verbatim (resample.py): NULL
      -- ids and values that do not TRY_CAST into DECIMAL(18,6) are
      -- excluded identically on both engines
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS point_mean
      FROM orders
      WHERE o_orderkey IS NOT NULL
        AND TRY_CAST(o_totalprice AS DECIMAL(18,6)) IS NOT NULL
      GROUP BY o_orderstatus)
    SELECT pt.o_orderstatus, pt.n_rows, pt.point_mean,
           ci.n_replicates, ci.ci_lo, ci.ci_hi
    FROM pt LEFT JOIN ci ON ci.o_orderstatus = pt.o_orderstatus
    ORDER BY pt.o_orderstatus
    """.format(
        w=_POIS_SQL_W.format(
            u="(('0x' || substring(md5(CAST(o.o_orderkey AS VARCHAR)"
            " || ':' || CAST(reps.b AS VARCHAR) || ':boot'), 1, 15))"
            "::BIGINT % 1000000000)"
        )
    ),
    doc="deterministic Poisson-bootstrap 90%% CI for mean order value "
    "per status (operators/resample.py:poisson_bootstrap_ci) — the "
    "distribution-free inference rung the closed-form tests can't "
    "cover (Chamandy et al. 2012's one-pass massive-data bootstrap). "
    "Each row's weight in replicate b is the inverse-CDF Poisson(1) "
    "bucket of md5_60(id:b:salt), so BOTH engines draw identical "
    "resamples and the full CI is value-checked, not rows-only. "
    "Exact DECIMAL weighted sums per replicate, one double division, "
    "integer rank selection at floor(m*alpha/2). Plan: explode x64 "
    "BEFORE a map-side combined groupBy — the exchange carries "
    "(status, b) cells, never the exploded fact",
)
def bootstrap_ci_order_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.resample import poisson_bootstrap_ci

    o = load(spark, sf_dir, "orders")
    return poisson_bootstrap_ci(
        o,
        ["o_orderstatus"],
        "o_totalprice",
        "o_orderkey",
        replicates=64,
        alpha=0.1,
    )


#: geofence polygons in integer micro-degrees (x = lon, y = lat) —
#: shared by the Spark builder and (via _fence_edges_sql) the DuckDB
#: oracle so there is exactly one source of truth for the geometry.
_FENCE_POLYGONS = [
    (
        "atlantic_box",
        [
            (-40_000_000, 10_000_000),
            (-10_000_000, 10_000_000),
            (-10_000_000, 40_000_000),
            (-40_000_000, 40_000_000),
        ],
    ),
    (
        "pacific_tri",
        [
            (110_000_000, -20_000_000),
            (170_000_000, 5_000_000),
            (125_000_000, 35_000_000),
        ],
    ),
    (
        "indian_pent",
        [
            (55_000_000, -25_000_000),
            (85_000_000, -20_000_000),
            (90_000_000, 5_000_000),
            (70_000_000, 15_000_000),
            (50_000_000, 0),
        ],
    ),
]


def _fence_edges_sql() -> str:
    rows = []
    for pid, verts in _FENCE_POLYGONS:
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            rows.append(f"('{pid}', {x1}, {y1}, {x2}, {y2})")
    return ", ".join(rows)


@_q(
    "geo_fence_customers",
    """
    WITH pts AS (
      SELECT c_custkey,
             (('0x' || substring(md5(CAST(c_custkey AS VARCHAR)
                || ':lon'), 1, 15))::BIGINT %% 360000000) - 180000000
               AS px,
             (('0x' || substring(md5(CAST(c_custkey AS VARCHAR)
                || ':lat'), 1, 15))::BIGINT %% 120000000) - 60000000
               AS py
      FROM customer),
    edges(poly_id, x1, y1, x2, y2) AS (VALUES %s),
    crossings AS (
      SELECT p.c_custkey, e.poly_id,
             SUM(CASE WHEN ((e.y1 > p.py) <> (e.y2 > p.py))
                       AND (((e.y2 > e.y1) AND
                             ((p.py - e.y1) * (e.x2 - e.x1)
                              - (p.px - e.x1) * (e.y2 - e.y1)) > 0)
                         OR ((e.y2 < e.y1) AND
                             ((p.py - e.y1) * (e.x2 - e.x1)
                              - (p.px - e.x1) * (e.y2 - e.y1)) < 0))
                      THEN 1 ELSE 0 END) AS k
      FROM pts p CROSS JOIN edges e
      GROUP BY p.c_custkey, e.poly_id)
    SELECT c_custkey, poly_id
    FROM crossings WHERE k %% 2 = 1
    ORDER BY c_custkey, poly_id
    """
    % _fence_edges_sql(),
    doc="geofencing join (operators/geo.py:point_in_polygon_join): "
    "which customers' md5-synthesized micro-degree coordinates fall "
    "inside three literal fence polygons, by EXACT-BIGINT ray "
    "casting (half-open straddle rule + division-free "
    "cross-multiplied intersection test — no epsilon, no float "
    "slope, bit-identical verdicts on any engine). The containment "
    "rung of the spatial family next to grid_knn_join's proximity "
    "rung. Spark prunes candidates by per-polygon bounding box "
    "before any edge row is emitted; the DuckDB oracle is the "
    "EXHAUSTIVE points x edges product, so every green row also "
    "proves the bbox rejection drops no true member",
)
def geo_fence_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import token_hash_col
    from .operators.geo import point_in_polygon_join

    # the canonical md5_60 hash (dedup.token_hash_col) keyed by
    # custkey+salt, reduced to integer micro-degrees
    def _coord(salt: str, span: int, off: int):
        h = token_hash_col(
            F.concat(F.col("c_custkey").cast("string"), F.lit(salt)),
            "md5_60",
        )
        return F.pmod(h, F.lit(span)) - F.lit(off)

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord(":lon", 360_000_000, 180_000_000).alias("px"),
        _coord(":lat", 120_000_000, 60_000_000).alias("py"),
    )
    return point_in_polygon_join(
        cust, "c_custkey", "px", "py", _FENCE_POLYGONS
    ).orderBy("c_custkey", "poly_id")


@_q(
    "mi_status_priority",
    """
    WITH base AS (
      SELECT o_orderstatus AS a, o_orderpriority AS b
      FROM orders
      WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL),
    obs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o
            FROM base GROUP BY a, b),
    ma AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ra
           FROM base GROUP BY a),
    mb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rb
           FROM base GROUP BY b),
    nn AS (SELECT CAST(SUM(ra) AS BIGINT) AS n FROM ma),
    mi AS (
      SELECT SUM((CAST(o AS DOUBLE) / n)
                 * LN((CAST(o AS DOUBLE) * n)
                      / (CAST(ra AS DOUBLE) * rb))
                 / 0.6931471805599453) AS v
      FROM obs JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn),
    ha AS (
      SELECT -SUM((CAST(ra AS DOUBLE) / n)
                  * LN(CAST(ra AS DOUBLE) / n)
                  / 0.6931471805599453) AS v,
             CAST(MAX(n) AS BIGINT) AS n
      FROM ma CROSS JOIN nn),
    hb AS (
      SELECT -SUM((CAST(rb AS DOUBLE) / n)
                  * LN(CAST(rb AS DOUBLE) / n)
                  / 0.6931471805599453) AS v
      FROM mb CROSS JOIN nn)
    SELECT ha.n,
           ROUND(mi.v, 6) AS mi_bits,
           ROUND(ha.v, 6) AS h_a,
           ROUND(hb.v, 6) AS h_b,
           ROUND(ha.v - mi.v, 6) AS h_a_given_b,
           CASE WHEN LEAST(ha.v, hb.v) > 0
                THEN ROUND(mi.v / LEAST(ha.v, hb.v), 6) END AS redundancy
    FROM mi CROSS JOIN ha CROSS JOIN hb
    """,
    doc="mutual information I(status; priority) in bits "
    "(operators/relational.py:mutual_information) — the "
    "information-theoretic dependence readout next to chi-square's "
    "significance test: how many bits of one column the other "
    "carries, plus marginal entropies, conditional entropy and "
    "normalized redundancy (the feature-selection / leakage-screen "
    "number). Only OBSERVED pairs materialize (x log x -> 0); the "
    "same three map-side-combined aggregates as chi2 with broadcast "
    "marginals; per-cell log terms differ across libm in last ulps "
    "only — the round-6 sum over a handful of cells is 10 orders "
    "above that floor",
)
def mi_status_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import mutual_information

    o = load(spark, sf_dir, "orders")
    return mutual_information(o, "o_orderstatus", "o_orderpriority")


@_q(
    "forecast_scorecard_events",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE), 6)
               AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    scored AS (
      SELECT a.event_type,
             a.v - f.v AS e,
             ABS(a.v - f.v) AS ae,
             CASE WHEN ABS(a.v) + ABS(f.v) > 0
                  THEN 2.0 * ABS(a.v - f.v) / (ABS(a.v) + ABS(f.v))
                  ELSE 0.0 END AS sm
      FROM d a JOIN d f ON f.event_type = a.event_type
                       AND a.day = f.day + INTERVAL 7 DAY),
    naive AS (
      SELECT a.event_type, AVG(ABS(a.v - p.v)) AS nmae
      FROM d a JOIN d p ON p.event_type = a.event_type
                       AND a.day = p.day + INTERVAL 1 DAY
      GROUP BY a.event_type),
    per AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_scored,
             ROUND(AVG(ae), 6) AS mae,
             ROUND(AVG(sm), 6) AS smape,
             ROUND(AVG(e), 6) AS bias,
             AVG(ae) AS mae_raw
      FROM scored GROUP BY event_type)
    SELECT per.event_type, per.n_scored, per.mae, per.smape, per.bias,
           CASE WHEN naive.nmae > 0
                THEN ROUND(per.mae_raw / naive.nmae, 6) END AS mase
    FROM per LEFT JOIN naive ON naive.event_type = per.event_type
    ORDER BY per.event_type
    """,
    doc="forecast-accuracy scorecard "
    "(operators/series.py:forecast_scorecard): MAE / SMAPE / signed "
    "bias / MASE per event type for the seasonal-naive daily-value "
    "forecast — the evaluation rung closing the forecasting loop "
    "(backtest scores, conformal calibrates, this GRADES on the "
    "standard scale-free yardsticks; MASE's denominator is the "
    "in-sample naive-1 MAE per Hyndman-Koehler 2006, NULL on "
    "constant series). Two self-joins of the already-reduced daily "
    "rollup + one per-key aggregate — nothing event-scale moves",
)
def forecast_scorecard_events_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.series import forecast_scorecard

    ev = load_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("v")
        )
    )
    return forecast_scorecard(
        daily, ["event_type"], "day", "v", period_days=7
    )


@_q(
    "funnel_view_click_purchase",
    """
    WITH e AS (SELECT user_id AS u, ts, event_type AS ty FROM events),
    s1 AS (SELECT u, MIN(ts) AS t FROM e WHERE ty = 'view' GROUP BY u),
    s2 AS (
      SELECT e.u, MIN(e.ts) AS t
      FROM e JOIN s1 ON s1.u = e.u
      WHERE e.ty = 'click' AND e.ts > s1.t
        AND e.ts <= s1.t + INTERVAL 1 DAY
      GROUP BY e.u),
    s3 AS (
      SELECT e.u, MIN(e.ts) AS t
      FROM e JOIN s2 ON s2.u = e.u
      WHERE e.ty = 'purchase' AND e.ts > s2.t
        AND e.ts <= s2.t + INTERVAL 1 DAY
      GROUP BY e.u),
    c AS (
      SELECT 1 AS step_idx, 'view' AS step,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
      UNION ALL
      SELECT 2, 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM s3))
    SELECT CAST(step_idx AS BIGINT) AS step_idx, step, n_users,
           CASE WHEN LAG(n_users) OVER (ORDER BY step_idx) > 0
                THEN ROUND(CAST(n_users AS DOUBLE)
                           / LAG(n_users) OVER (ORDER BY step_idx), 6)
           END AS conv_from_prev,
           CASE WHEN FIRST_VALUE(n_users) OVER (ORDER BY step_idx) > 0
                THEN ROUND(CAST(n_users AS DOUBLE)
                           / FIRST_VALUE(n_users)
                             OVER (ORDER BY step_idx), 6)
           END AS conv_from_first
    FROM c ORDER BY step_idx
    """,
    doc="windowed funnel analysis "
    "(operators/sessions.py:funnel_conversion): users completing "
    "view -> click (within 1 day, strictly after) -> purchase "
    "(within 1 day of the click) — the attrition readout that "
    "factors the session family's raw sequences (journeys rank "
    "paths, transitions factor hops, the funnel measures a CHOSEN "
    "path). Per-user MIN timestamps make the definition order-free "
    "and engine-exact; each step is a user-keyed aggregate whose "
    "joins all co-partition on the same key; the conversion readout "
    "is a 3-row lag window",
)
def funnel_view_click_purchase_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.sessions import funnel_conversion

    ev = load_events(spark, sf_dir)
    return funnel_conversion(
        ev,
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
        within="1 day",
    )


@_q(
    "kanon_customer_release",
    """
    WITH g AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT o_orderpriority)
                  + MAX(CASE WHEN o_orderpriority IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS l
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c_mktsegment, c_nationkey, bal_band),
    thr(k_threshold) AS (VALUES (2), (5), (10))
    SELECT CAST(thr.k_threshold AS BIGINT) AS k_threshold,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN g.n < thr.k_threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS violating_groups,
           CAST(SUM(CASE WHEN g.n < thr.k_threshold THEN g.n ELSE 0 END)
                AS BIGINT) AS violating_rows,
           ROUND(CAST(SUM(CASE WHEN g.n < thr.k_threshold
                               THEN g.n ELSE 0 END) AS DOUBLE)
                 / SUM(g.n), 6) AS pct_rows_at_risk,
           CAST(SUM(CASE WHEN g.l <= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS homogeneous_groups,
           CAST(MIN(g.n) AS BIGINT) AS min_group_size,
           CAST(MIN(g.l) AS BIGINT) AS min_l
    FROM g CROSS JOIN thr
    GROUP BY thr.k_threshold
    ORDER BY k_threshold
    """,
    doc="k-anonymity / l-diversity release audit "
    "(operators/privacy.py:k_anonymity_report): re-identification "
    "risk of publishing the customer-order join keyed by the "
    "(segment, nation, balance-band) quasi-identifiers with order "
    "priority as the sensitive attribute — per threshold k, the "
    "groups/rows/share below k plus sensitive-constant (l=1) group "
    "counts, the homogeneity attack l-diversity exists to catch. "
    "The measurement rung next to curation's PII REDACTION: redact "
    "removes direct identifiers, this audits the indirect ones left "
    "behind. One QI groupBy (map-side combined) to a "
    "|combinations|-sized frame; thresholds broadcast; exact counts "
    "with one final double division",
)
def kanon_customer_release_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.privacy import k_anonymity_report

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    rel = c.join(o, o["o_custkey"] == c["c_custkey"], "left").select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
        "o_orderpriority",
    )
    return k_anonymity_report(
        rel,
        ["c_mktsegment", "c_nationkey", "bal_band"],
        "o_orderpriority",
        thresholds=(2, 5, 10),
    )


@_q(
    "compaction_plan_orders",
    """
    WITH files AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS sz
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    binned AS (
      SELECT d, sz,
             CAST(COALESCE(SUM(sz) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) // 500 AS grp
      FROM files),
    grouped AS (
      SELECT CAST(grp AS BIGINT) AS group_id,
             CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(sz) AS BIGINT) AS total_size,
             MIN(d) AS first_key,
             MAX(d) AS last_key
      FROM binned GROUP BY grp)
    SELECT 'daily_orders' AS plan, group_id, n_files, total_size,
           first_key, last_key,
           (total_size < 500) AS undersized
    FROM grouped ORDER BY group_id
    """,
    doc="small-file compaction planner "
    "(operators/layout.py:compaction_plan): daily order partitions "
    "(the classic too-many-small-files shape) coalesced into "
    "~500-row output groups by cumulative-sum binning in date order "
    "— the ADJACENT-merge strategy Delta/Iceberg OPTIMIZE uses, "
    "preserving clustering where global bin packing would destroy "
    "it. Exact BIGINT `div` on the running total (a double quotient "
    "truncates wrong past 2^53); the planner's input is per-file "
    "METADATA (n_files rows), so the single-partition ordered "
    "window is listing-sized at any data scale. The layout family's "
    "maintenance rung next to zorder_pruning_parts' placement rung",
)
def compaction_plan_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.layout import compaction_plan

    files = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("sz"))
    )
    return compaction_plan(
        files, "sz", "d", target_size=500, plan_name="daily_orders"
    )


@_q(
    "conformal_event_forecast",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE), 6)
               AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)),
    scored AS (
      SELECT a.event_type, a.day,
             ROUND(ABS(a.v - f.v), 6) AS r
      FROM d a JOIN d f ON f.event_type = a.event_type
                       AND a.day = f.day + INTERVAL 7 DAY),
    marked AS (
      SELECT event_type, day, r,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM scored),
    m2 AS (SELECT *, CAST(FLOOR(n * 0.6) AS BIGINT) AS ncal FROM marked),
    q AS (
      SELECT event_type, r AS qhat FROM (
        SELECT event_type, r, ncal,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY r, day) AS rr
        FROM m2 WHERE rn <= ncal)
      WHERE rr = CAST(CEIL((ncal + 1) * 0.8) AS BIGINT)
        AND CAST(CEIL((ncal + 1) * 0.8) AS BIGINT) <= ncal),
    ev AS (SELECT * FROM m2 WHERE rn > ncal)
    SELECT ev.event_type,
           CAST(MAX(ev.ncal) AS BIGINT) AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           MAX(q.qhat) AS qhat,
           CASE WHEN MAX(q.qhat) IS NOT NULL
                THEN ROUND(SUM(CASE WHEN ev.r <= q.qhat
                                    THEN 1 ELSE 0 END) * 1.0
                           / COUNT(*), 6) END AS coverage,
           ROUND(0.8, 6) AS target
    FROM ev LEFT JOIN q ON q.event_type = ev.event_type
    GROUP BY ev.event_type
    ORDER BY ev.event_type
    """,
    doc="split-conformal prediction intervals "
    "(operators/series.py:conformal_backtest_intervals) calibrating "
    "the seasonal-naive forecast on per-type daily value sums: qhat "
    "= the ceil((1-alpha)(n_cal+1))-th smallest calibration "
    "|residual| (the finite-sample conformal rank, not the naive "
    "empirical quantile), eval coverage measured against +/-qhat — "
    "the distribution-free calibration layer the backtest's point "
    "errors lack. Residuals round-6 BEFORE ranking with day "
    "tie-breaks (selection bit-identical cross-engine); everything "
    "runs on the already-reduced daily rollup",
)
def conformal_event_forecast_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.series import conformal_backtest_intervals

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("v")
    )
    return conformal_backtest_intervals(
        daily, ["event_type"], "day", "v",
        period_days=7, cal_frac=0.6, alpha=0.2,
    )


@_q(
    "neyman_alloc_doc_sources",
    """
    WITH per AS (
      SELECT source AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(n_chars AS HUGEINT)
                      * CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sxx
      FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL
      GROUP BY source),
    sig AS (
      SELECT stratum, n_rows,
             ROUND(SQRT(GREATEST(CASE WHEN n_rows >= 2
               THEN CAST(n_rows * sxx - sx * sx AS DOUBLE)
                    / (n_rows * (n_rows - 1)) ELSE 0 END, 0)), 6)
               AS sigma
      FROM per),
    wtd AS (
      SELECT stratum, n_rows, sigma,
             n_rows * CAST(ROUND(sigma * 1000000, 0) AS BIGINT) AS weight
      FROM sig),
    tot AS (SELECT SUM(CAST(weight AS HUGEINT)) AS wt FROM wtd),
    staged AS (
      SELECT stratum, n_rows, sigma, weight,
             CASE WHEN tot.wt > 0
                  THEN CAST(CAST(weight AS HUGEINT) * 1000 // tot.wt
                            AS BIGINT) ELSE 0 END AS base,
             CASE WHEN tot.wt > 0
                  THEN CAST(CAST(weight AS HUGEINT) * 1000 % tot.wt
                            AS HUGEINT) ELSE 0 END AS rem
      FROM wtd CROSS JOIN tot)
    SELECT stratum, n_rows, sigma,
           CAST(weight AS BIGINT) AS weight,
           -- MAX(weight) OVER () > 0 mirrors the operator's
           -- all-zero-weight guard: a table where every stratum is
           -- constant allocates NOTHING (no remainder top-up)
           CAST(base + CASE WHEN MAX(weight) OVER () > 0
                             AND ROW_NUMBER() OVER (ORDER BY rem DESC,
                                                    stratum ASC)
                                 <= 1000 - SUM(base) OVER ()
                            THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM staged ORDER BY stratum
    """,
    doc="Neyman-optimal sample allocation "
    "(operators/curation.py:neyman_allocation): a 1000-probe "
    "inspection budget split across document sources by n_h ∝ "
    "N_h·σ_h (σ from exact DECIMAL moments of n_chars) — the "
    "variance-minimizing stratified design, sized where strata are "
    "big AND variable; the design-time rung in front of "
    "sample_exact_k_per_group's executors. Integer-exact "
    "largest-remainder arithmetic ((budget·w) div/mod W on "
    "DECIMAL(38,0)), so Σ alloc == budget bit-identically on any "
    "engine. One stratum aggregate + one strata-frame window",
)
def neyman_alloc_doc_sources_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.curation import neyman_allocation

    docs = load(spark, sf_dir, "documents")
    return neyman_allocation(docs, "source", "n_chars", budget=1000)


@_q(
    "cms_token_freq",
    """
    WITH toks AS (
      SELECT unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               AS term
      FROM documents),
    tk AS (SELECT term FROM toks WHERE term <> ''),
    counts AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tk GROUP BY term),
    top20 AS (
      SELECT term, tf FROM counts ORDER BY tf DESC, term LIMIT 20),
    rr AS (SELECT unnest([0, 1, 2, 3]) AS r),
    cells AS (
      SELECT rr.r,
             ('0x' || substring(md5('cms' || chr(31)
                || CAST(rr.r AS VARCHAR) || chr(31) || tk.term), 1, 15))
               ::BIGINT % 512 AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tk CROSS JOIN rr GROUP BY 1, 2),
    est AS (
      SELECT q.term, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est
      FROM (SELECT t.term, rr.r,
                   ('0x' || substring(md5('cms' || chr(31)
                      || CAST(rr.r AS VARCHAR) || chr(31) || t.term),
                      1, 15))::BIGINT % 512 AS b
            FROM top20 t CROSS JOIN rr) q
      LEFT JOIN cells c ON c.r = q.r AND c.b = q.b
      GROUP BY q.term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM tk)
    SELECT t.term, t.tf, e.est,
           CAST(e.est - t.tf AS BIGINT) AS overshoot,
           (e.est - t.tf) <= (3 * n.n_tok) // 512 AS within_bound
    FROM top20 t JOIN est e ON e.term = t.term CROSS JOIN n
    """,
    doc="Count-Min frequency estimates "
    "(operators/sketch.py:count_min_sketch/count_min_lookup): a "
    "4x512 counter grid over document tokens point-queried for the "
    "top-20 true-frequency terms, with the exact counts joined back "
    "as the audit — overshoot >= 0 by construction (CMS never "
    "undercounts) and the (3/width)·N bound baked into the compared "
    "hash. The frequency-ESTIMATE rung next to Misra-Gries' top-k: "
    "arbitrary point queries from O(d·w) mergeable state "
    "(grids add cell-wise — the HLL/KLL/Theta rollup contract). "
    "md5_60 row-salted hashes make the sketch AND every estimate "
    "bit-identical cross-engine: fully value-checked, not rows-only. "
    "Shuffle payload = counter cells (<= partitions·d·w), never "
    "tokens",
)
def cms_token_freq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import count_min_lookup, count_min_sketch
    from .operators.text import normalize_text_col

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(normalize_text_col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(
        F.count("*").cast("long").alias("tf")
    )
    top20 = counts.orderBy(F.col("tf").desc(), "term").limit(20)
    sketch = count_min_sketch(toks, "term", depth=4, width=512)
    est = count_min_lookup(sketch, top20.select("term"), "term",
                           depth=4, width=512)
    n_tok = toks.agg(F.count("*").cast("long").alias("n_tok"))
    return (
        top20.join(est, "term")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "term",
            "tf",
            "est",
            (F.col("est") - F.col("tf")).cast("long").alias("overshoot"),
            (
                (F.col("est") - F.col("tf"))
                <= F.expr("(3 * n_tok) div 512")
            ).alias("within_bound"),
        )
    )


@_q(
    "anova_event_values",
    """
    WITH base AS (
      SELECT event_type AS g, CAST(value AS DECIMAL(18,6)) AS v
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL),
    per AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS gn,
             SUM(CAST(v AS DECIMAL(38,6))) AS s,
             SUM(CAST(v * v AS DECIMAL(38,12))) AS ss
      FROM base GROUP BY g),
    agg AS (
      SELECT CAST(SUM(gn) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(CAST(SUM(CAST(s AS DECIMAL(38,6))) AS VARCHAR)
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(ss AS DECIMAL(38,12))) AS VARCHAR)
                  AS DOUBLE) AS sxx,
             SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(gn AS DOUBLE)) AS sb
      FROM per)
    SELECT n, k,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(n - k AS BIGINT) AS df2,
           CASE WHEN k >= 2 AND n - k > 0
                     AND (sxx - sx * sx / n) - (sb - sx * sx / n) > 0
                THEN ROUND(((sb - sx * sx / n) / (k - 1))
                           / (((sxx - sx * sx / n) - (sb - sx * sx / n))
                              / (n - k)), 6) END AS f_stat,
           CASE WHEN k >= 2 AND sxx - sx * sx / n > 0
                THEN ROUND((sb - sx * sx / n) / (sxx - sx * sx / n), 6)
           END AS eta_sq
    FROM agg
    """,
    doc="one-way ANOVA across event types "
    "(operators/relational.py:anova_oneway): F and eta-squared from "
    "per-group EXACT DECIMAL moments — the k-group generalization "
    "completing the two-sample family (Welch means, Mann-Whitney "
    "ranks, KS CDFs, chi-square categories). One map-side-combined "
    "groupBy to k moment rows + a k-row reduce; the only double "
    "summation is the k-term between-group sum (k tiny). No p-value "
    "by design — the F CDF has no deterministic cross-engine builtin",
)
def anova_event_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import anova_oneway

    ev = load_events(spark, sf_dir)
    return anova_oneway(ev, "event_type", "value")


@_q(
    "assortativity_cust_supp",
    """
    WITH e AS (
      SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS a,
             's:' || CAST(l.l_suppkey AS VARCHAR) AS b
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    doubled AS (
      SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d
            FROM doubled GROUP BY a),
    paired AS (
      SELECT dx.d AS x, dy.d AS y
      FROM doubled j
      JOIN deg dx ON dx.a = j.a
      JOIN deg dy ON dy.a = j.b),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                  AS DOUBLE) AS syy
      FROM paired),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
    SELECT nn.n_nodes, m.n_pairs,
           CASE WHEN m.n_pairs * sxx - sx * sx > 0
                     AND m.n_pairs * syy - sy * sy > 0
                THEN ROUND((m.n_pairs * sxy - sx * sy)
                           / SQRT((m.n_pairs * sxx - sx * sx)
                                  * (m.n_pairs * syy - sy * sy)), 6)
           END AS r
    FROM m CROSS JOIN nn
    """,
    doc="degree assortativity of the customer-supplier purchase "
    "graph (operators/graph.py:degree_assortativity): Pearson r of "
    "endpoint degrees over the doubled edge list — bipartite "
    "purchase graphs skew NEGATIVE (big buyers meet many small "
    "suppliers); the one-number structural summary next to the "
    "degree stats the iterative family conditions on. Exact BIGINT "
    "degrees and DECIMAL(38,0) moments -> one identical double "
    "closed form; one node-sized degree agg + two edge shuffles "
    "(the CC/pagerank exchange shape) + a 1-row reduce",
)
def assortativity_cust_supp_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.graph import degree_assortativity

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    return degree_assortativity(edges, "src", "dst")


# --------------------------------------------------------------------
# round-8 wave: containment dedup, feature-pipeline transforms
# (LOO target encoding, quantile normalization, feature hashing,
# integer PCA), survey estimation (Horvitz-Thompson), RFM
# segmentation, and the explicit GROUPING SETS shape
# --------------------------------------------------------------------


@_q(
    "dedup_containment",
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - 2, 1) + 1),
             i -> array_to_string(t[i:i+2], ' ')))) AS s FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    directed AS (
      SELECT id_a, id_b, common FROM pairs
      UNION ALL
      SELECT id_b AS id_a, id_a AS id_b, common FROM pairs)
    SELECT d.id_a, d.id_b,
           ROUND(d.common * 1.0 / sa.sz, 6) AS containment
    FROM directed d JOIN sizes sa ON sa.doc_id = d.id_a
    WHERE d.common * 1.0 / sa.sz >= 0.6
    """,
    doc="directed n-gram containment pairs C(A->B) = |A∩B|/|A| >= 0.6 "
    "(operators/dedup.py:ngram_containment_pairs) — the ASYMMETRIC "
    "near-dup detector Jaccard cannot express: a short document "
    "quoted inside a long one scores J ~ |A|/|B| (invisible) but "
    "containment 1.0. Most training-set leakage is "
    "containment-shaped. Auto plan selection like the Jaccard "
    "sibling: the inverted-index 3-shuffle plan on tame shingle "
    "frequencies, the asymmetric prefix-probe plan (only A's "
    "rarest-first prefix probes the FULL index — pigeonhole-complete "
    "since |A∩B| >= ceil(t|A|)) once sum(df^2) blows past 32x "
    "sum(df). Both directions of each undirected pair emit from ONE "
    "aggregate via F.inline, never a union",
)
def dedup_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import ngram_containment_pairs

    docs = load(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6)


@_q(
    "target_encoding_priority",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS x
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'),
    g AS (
      SELECT o_orderpriority,
             SUM(x) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM base GROUP BY o_orderpriority)
    SELECT b.o_orderkey, b.o_orderpriority,
           CAST(CAST(b.x AS VARCHAR) AS DOUBLE) AS o_totalprice,
           CASE WHEN g.n > 1
                THEN ROUND(CAST(CAST(g.s - b.x AS VARCHAR) AS DOUBLE)
                           / (g.n - 1), 6) END AS loo_encoding
    FROM base b JOIN g USING (o_orderpriority)
    """,
    doc="leave-one-out target encoding of order priority on the "
    "cents-exact order value "
    "(operators/relational.py:target_encode_loo): enc_i = "
    "(S_g - x_i)/(n_g - 1) — the high-cardinality categorical "
    "feature that never leaks the row's own label (singletons emit "
    "NULL, no synthetic prior). ONE window shuffle on the category "
    "key — no aggregate re-join; numerator stays exact DECIMAL "
    "(unscaled ~1e10 at sf0.1, three orders under 2^53), one double "
    "division per row, round-6. 2001 slice bounds the compare frame",
)
def target_encoding_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import target_encode_loo

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return target_encode_loo(
        orders, "o_orderpriority", "o_totalprice", ["o_orderkey"]
    )


@_q(
    "rfm_customer_segments",
    """
    WITH per AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       DATE '2001-09-01') AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey, recency_days, frequency,
             CAST(CAST(m AS VARCHAR) AS DOUBLE) AS monetary,
             6 - ntile(5) OVER (ORDER BY recency_days, o_custkey)
               AS r_score,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY m, o_custkey) AS m_score
      FROM per)
    SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
           frequency, monetary,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS rfm,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                THEN 'champion'
                WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored
    """,
    doc="RFM quintile segmentation "
    "(operators/relational.py:rfm_scores): per-customer recency/"
    "frequency/cents-exact monetary, each scored 1-5 by ntile(5) "
    "over a TOTAL order (metric, custkey) — both engines implement "
    "standard SQL ntile, so tie handling is identical — plus the "
    "concatenated code and a coarse label ladder. One customer-key "
    "groupBy shuffle; the three ntile windows run over the "
    "AGGREGATED per-customer frame (3-4 orders smaller than the "
    "fact table; past ~1e8 customers swap exact ntile for boundary "
    "joins off group_percentiles — the exact rank form is what the "
    "oracle pins)",
)
def rfm_customer_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import rfm_scores

    orders = load(spark, sf_dir, "orders")
    return rfm_scores(
        orders, "o_custkey", "o_orderdate", "o_totalprice", "2001-09-01"
    )


@_q(
    "ht_total_by_priority",
    """
    WITH marked AS (
      SELECT o_orderpriority AS stratum,
             CAST(o_totalprice AS DECIMAL(18,2)) AS x,
             100 + 50 * (('0x' || substring(md5(o_orderpriority), 1, 15))
                         ::BIGINT % 8) AS rate,
             ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
               ::BIGINT % 1000 AS h
      FROM orders),
    per AS (
      SELECT stratum,
             CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(SUM(CASE WHEN h < rate THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
             CAST(MAX(rate) AS BIGINT) AS rate_permille,
             SUM(CASE WHEN h < rate THEN x END) AS s,
             SUM(CASE WHEN h < rate
                      THEN CAST(x * x AS DECIMAL(38,4)) END) AS q,
             SUM(x) AS tt
      FROM marked GROUP BY stratum)
    SELECT stratum, n_pop, n_sampled, rate_permille,
           ROUND(CAST(CAST(s AS VARCHAR) AS DOUBLE) * 1000.0
                 / rate_permille, 6) AS ht_total,
           ROUND(sqrt(CAST(CAST(q AS VARCHAR) AS DOUBLE)
                      * (1000.0 - rate_permille) * 1000.0
                      / (rate_permille * rate_permille)), 6) AS ht_se,
           ROUND(CAST(CAST(tt AS VARCHAR) AS DOUBLE), 6) AS true_total,
           ROUND((CAST(CAST(s AS VARCHAR) AS DOUBLE) * 1000.0
                  / rate_permille
                  - CAST(CAST(tt AS VARCHAR) AS DOUBLE))
                 / CAST(CAST(tt AS VARCHAR) AS DOUBLE), 6) AS rel_err
    FROM per ORDER BY stratum
    """,
    doc="stratified Poisson sampling + Horvitz-Thompson estimation "
    "(operators/relational.py:horvitz_thompson_total): "
    "deterministic-by-hash membership (md5_60 per-mille — replayable "
    "on any engine), per-stratum rates 100-450‰ derived from the "
    "stratum name hash, HT total = S·1000/rate with its exact "
    "Poisson-design variance, the TRUE total as audit column. The "
    "'scan 0.x%, estimate the total, KNOW the error bar' primitive a "
    "100 TB pipeline audits itself with; x² sums pass 2^53 unscaled "
    "at sf0.1, so the oracle routes every decimal sum through the "
    "VARCHAR roundtrip. One groupBy, map-side combined",
)
def ht_total_by_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import token_hash_col
    from .operators.relational import horvitz_thompson_total

    orders = load(spark, sf_dir, "orders")
    rate = (
        F.lit(100)
        + F.lit(50)
        * F.pmod(token_hash_col(F.col("o_orderpriority"), "md5_60"), F.lit(8))
    )
    return horvitz_thompson_total(
        orders, "o_orderpriority", "o_totalprice", "o_orderkey", rate
    )


@_q(
    "quantile_normalize_doclen",
    """
    WITH vals AS (
      SELECT doc_id, source AS grp, CAST(n_chars AS DOUBLE) AS v
      FROM documents WHERE n_chars IS NOT NULL),
    n AS (SELECT COUNT(*) AS nt FROM vals),
    pooled AS (
      SELECT row_number() OVER (ORDER BY v, doc_id) AS pr, v AS pv
      FROM vals),
    ranked AS (
      SELECT doc_id, grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v, doc_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS ng
      FROM vals),
    pos AS (
      SELECT doc_id, grp, v,
             CASE WHEN ng > 1
                  THEN CAST(rn - 1 AS BIGINT)
                       * (SELECT nt - 1 FROM n)
                  ELSE (SELECT nt - 1 FROM n) END AS num,
             CASE WHEN ng > 1 THEN CAST(ng - 1 AS BIGINT)
                  ELSE 2 END AS den
      FROM ranked)
    SELECT p.doc_id, p.grp AS source, p.v AS n_chars,
           ROUND(lo.pv + ((p.num % p.den) * 1.0 / p.den)
                         * (COALESCE(hi.pv, lo.pv) - lo.pv), 6)
             AS normalized
    FROM pos p
    JOIN pooled lo ON lo.pr - 1 = p.num // p.den
    LEFT JOIN pooled hi ON hi.pr - 2 = p.num // p.den
    """,
    doc="quantile normalization of per-source document-length "
    "distributions onto the pooled distribution "
    "(operators/relational.py:quantile_normalize) — the "
    "feature-alignment transform that makes 'p90 length' mean the "
    "same thing across corpus sources before mixing/thresholding. "
    "Interpolation is EXACT-integer: pooled position num/den = "
    "(rn-1)(N-1)/(ng-1) kept rational (integer div/mod — never a "
    "double multiply whose floor could straddle an ulp differently "
    "per engine), one double interpolation at the end, round-6. "
    "Singletons map to the pooled median by the same arithmetic. One "
    "group window + one pooled rank (single-task over the value "
    "frame; at 100 TB the pooled reference becomes a merged KLL "
    "sketch — the exact form is what the oracle pins) + two "
    "rank-equi joins",
)
def quantile_normalize_doclen_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import quantile_normalize

    docs = load(spark, sf_dir, "documents")
    return quantile_normalize(docs, "source", "n_chars", "doc_id").select(
        "doc_id",
        "source",
        "n_chars",
        "normalized",
    )


@_q(
    "feature_hash_vocab",
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    toks AS (
      SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norm),
    b AS (
      SELECT doc_id, tok,
             ('0x' || substring(md5(tok), 1, 15))::BIGINT % 256 AS bucket
      FROM toks WHERE tok <> '')
    SELECT bucket,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS collision_tokens,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="hashing-trick feature audit "
    "(operators/text.py:feature_hash_stats): bag-of-words tokens "
    "hash into 256 fixed slots (pmod(md5_60, 256) — the "
    "engine-portable hash, so the bucketing replays identically in "
    "the oracle) and the table reports each slot's collision load "
    "(distinct vocabulary), tf, and df. The feature-engineering rung "
    "of the text stack: downstream models train on hashed counts "
    "with NO vocabulary broadcast — key cardinality is fixed at 256 "
    "at plan time, the point of feature hashing at 100 TB. One "
    "bucket-keyed groupBy",
)
def feature_hash_vocab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import feature_hash_stats

    docs = load(spark, sf_dir, "documents")
    return feature_hash_stats(docs, "doc_id", "text", n_buckets=256)


def _pca_oracle_sql() -> str:
    """Unrolled HUGEINT power iteration replaying
    operators/relational.py:pca_top_component verbatim: scatter
    matrix M = n·Σxx − Σx·Σxᵀ from exact moments, 12 iterations of
    v ← trunc(M·v · 10^6 / max|M·v|) (DuckDB ``//`` truncates toward
    zero — ``_trunc_div`` mirrors that, NOT Python floor), sign
    pinned by the largest-|component|, loadings and the ppm-exact
    explained ratio emitted after one double division each."""
    it = """
    ,u{k} AS MATERIALIZED (
      SELECT m11*v1 + m12*v2 + m13*v3 AS u1,
             m12*v1 + m22*v2 + m23*v3 AS u2,
             m13*v1 + m23*v2 + m33*v3 AS u3, m11, m12, m13, m22, m23, m33
      FROM v{p}),
    v{k} AS MATERIALIZED (
      SELECT CASE WHEN greatest(abs(u1), abs(u2), abs(u3)) = 0 THEN u1
                  ELSE (u1 * 1000000::HUGEINT)
                       // greatest(abs(u1), abs(u2), abs(u3)) END AS v1,
             CASE WHEN greatest(abs(u1), abs(u2), abs(u3)) = 0 THEN u2
                  ELSE (u2 * 1000000::HUGEINT)
                       // greatest(abs(u1), abs(u2), abs(u3)) END AS v2,
             CASE WHEN greatest(abs(u1), abs(u2), abs(u3)) = 0 THEN u3
                  ELSE (u3 * 1000000::HUGEINT)
                       // greatest(abs(u1), abs(u2), abs(u3)) END AS v3,
             m11, m12, m13, m22, m23, m33
      FROM u{k})"""
    chain = "".join(it.format(k=k, p=k - 1) for k in range(1, 13))
    return (
        """
    WITH f AS (
      SELECT CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS x1,
             CAST(p_size AS BIGINT) AS x2,
             CAST(length(p_name) AS BIGINT) AS x3
      FROM part),
    mo AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x1::HUGEINT) AS s1, SUM(x2::HUGEINT) AS s2,
             SUM(x3::HUGEINT) AS s3,
             SUM(x1::HUGEINT * x1) AS p11, SUM(x1::HUGEINT * x2) AS p12,
             SUM(x1::HUGEINT * x3) AS p13, SUM(x2::HUGEINT * x2) AS p22,
             SUM(x2::HUGEINT * x3) AS p23, SUM(x3::HUGEINT * x3) AS p33
      FROM f),
    m AS (
      SELECT n*p11 - s1*s1 AS m11, n*p12 - s1*s2 AS m12,
             n*p13 - s1*s3 AS m13, n*p22 - s2*s2 AS m22,
             n*p23 - s2*s3 AS m23, n*p33 - s3*s3 AS m33, n
      FROM mo),
    v0 AS (
      SELECT 1000000::HUGEINT AS v1, 1000000::HUGEINT AS v2,
             1000000::HUGEINT AS v3, m11, m12, m13, m22, m23, m33
      FROM m)"""
        + chain
        + """
    ,signed AS (
      SELECT CASE WHEN (CASE
                WHEN abs(v1) >= abs(v2) AND abs(v1) >= abs(v3) THEN v1
                WHEN abs(v2) >= abs(v3) THEN v2 ELSE v3 END) < 0
             THEN -v1 ELSE v1 END AS v1,
             CASE WHEN (CASE
                WHEN abs(v1) >= abs(v2) AND abs(v1) >= abs(v3) THEN v1
                WHEN abs(v2) >= abs(v3) THEN v2 ELSE v3 END) < 0
             THEN -v2 ELSE v2 END AS v2,
             CASE WHEN (CASE
                WHEN abs(v1) >= abs(v2) AND abs(v1) >= abs(v3) THEN v1
                WHEN abs(v2) >= abs(v3) THEN v2 ELSE v3 END) < 0
             THEN -v3 ELSE v3 END AS v3,
             m11, m12, m13, m22, m23, m33
      FROM v12),
    fin AS (
      SELECT v1, v2, v3,
             greatest(abs(v1), abs(v2), abs(v3)) AS vmax,
             v1*(m11*v1 + m12*v2 + m13*v3)
             + v2*(m12*v1 + m22*v2 + m23*v3)
             + v3*(m13*v1 + m23*v2 + m33*v3) AS num,
             v1*v1 + v2*v2 + v3*v3 AS den,
             m11 + m22 + m33 AS tr
      FROM signed),
    ppm AS (
      SELECT v1, v2, v3, vmax,
             CASE WHEN den * tr > 0
                  THEN num // ((den * tr) // 1000000::HUGEINT)
                  ELSE 0 END AS ppm
      FROM fin),
    n1 AS (SELECT n FROM m)
    SELECT f.feature,
           ROUND(CAST(CASE f.feature
                   WHEN 'price_cents' THEN p.v1
                   WHEN 'size' THEN p.v2
                   ELSE p.v3 END AS DOUBLE) / CAST(p.vmax AS DOUBLE), 6)
             AS loading,
           ROUND(CAST(p.ppm AS DOUBLE) / 1000000.0, 6)
             AS explained_ratio,
           CAST((SELECT n FROM n1) AS BIGINT) AS n
    FROM (VALUES ('price_cents'), ('size'), ('name_len')) AS f(feature)
    CROSS JOIN ppm p
    """
    )


@_q(
    "pca_parts_features",
    _pca_oracle_sql(),
    doc="dominant principal component of (price-cents, size, "
    "name-length) over part via EXACT-INTEGER power iteration "
    "(operators/relational.py:pca_top_component — the pagerank "
    "discipline applied to linear algebra): one map-side-combined "
    "moment aggregate (n, Σx, Σxx — 9 numbers), the k×k scatter "
    "matrix and 12 renormalized iterations run on plain ints "
    "(driver-side, k=3-bounded, like kmeans' k-row collect), "
    "truncating division matching DuckDB HUGEINT ``//`` (which "
    "truncates toward zero, NOT floor — measured), sign pinned "
    "positive on the largest loading. The oracle replays every "
    "iteration verbatim in an unrolled MATERIALIZED HUGEINT CTE "
    "chain — bit-identical linear algebra across engines, no float "
    "accumulation anywhere",
)
def pca_parts_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import pca_top_component

    part = load(spark, sf_dir, "part")
    return pca_top_component(
        part,
        {
            "price_cents": (
                F.col("p_retailprice").cast("decimal(12,2)") * 100
            ).cast("long"),
            "size": F.col("p_size"),
            "name_len": F.length("p_name"),
        },
    )


@_q(
    "grouping_sets_status_priority",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2
                + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS VARCHAR) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="explicit GROUPING SETS — the two one-dimension margins plus "
    "the grand total WITHOUT the cross cells (the report shape CUBE "
    "overproduces and ROLLUP cannot express; completes the "
    "grouping-sets family: pivot / rollup_hierarchy / "
    "cube_status_priority / this). Same single shared "
    "partial-aggregation pass and grouping-ID bitmask discipline as "
    "the CUBE sibling; exact decimal totals via the VARCHAR "
    "roundtrip on the oracle side",
)
def grouping_sets_status_priority_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias(
                "o_orderpriority"
            ),
            "gid",
            "n_orders",
            "total_value",
        )
    )


@_q(
    "sse_changepoint_daily",
    f"""
    WITH r AS MATERIALIZED ({_DAILY_ROLLUP_SQL}),
    q AS (
      SELECT event_type, day,
             CAST(FLOOR(v * 1000000 + 0.5) AS BIGINT) AS x
      FROM r),
    b AS (
      SELECT event_type, day, x,
             SUM(x) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS sl,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS nl,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(x) OVER (PARTITION BY event_type) AS s
      FROM q),
    cand AS (
      SELECT event_type, day AS split_at, sl, nl,
             s - sl AS sr, n - nl AS nr
      FROM b WHERE nl < n AND n >= 2),
    scored AS (
      SELECT event_type, split_at, sl, nl, sr, nr,
             ((sl::HUGEINT * sl * nr + sr::HUGEINT * sr * nl)
              * 1000000) // (nl::HUGEINT * nr) AS score
      FROM cand),
    pick AS (
      SELECT event_type, split_at, sl, nl, sr, nr, score,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY score DESC, split_at) AS rn
      FROM scored)
    SELECT event_type, split_at,
           CAST(nl AS BIGINT) AS n_before,
           CAST(nr AS BIGINT) AS n_after,
           ROUND(sl / 1000000.0 / nl, 6) AS mean_before,
           ROUND(sr / 1000000.0 / nr, 6) AS mean_after,
           ROUND(sr / 1000000.0 / nr - sl / 1000000.0 / nl, 6) AS shift,
           CAST(score AS VARCHAR) AS score
    FROM pick WHERE rn = 1 ORDER BY event_type
    """,
    doc="exact single-changepoint localization per event type "
    "(operators/series.py:sse_changepoint): the split of the daily "
    "value series minimizing SSE_left + SSE_right — the binary-"
    "segmentation step behind PELT-style detectors, and the offline "
    "LEVEL-SHIFT localizer next to CUSUM's sequential alarm "
    "(cusum_daily_drift says 'drifting since about here'; this names "
    "THE split under an optimality criterion). Minimizing SSE is "
    "maximizing S_L^2/n_L + S_R^2/n_R (prefix sums; the sum-of-"
    "squares term cancels across candidates), so the whole detector "
    "is one (key, day) sort window + a per-key argmax — no "
    "iteration, no UDF. Cross-engine exactness: values quantize to "
    "micros BIGINTs, the argmax score is the DETERMINISTIC integer "
    "floor((S_L^2 n_R + S_R^2 n_L) * 1e6 / (n_L n_R)) in "
    "DECIMAL(38,0) via the subtract-pmod floor-quotient form (plain "
    "decimal `div` RETURNS BIGINT and wraps past 2^63 — measured; "
    "all terms positive so the floor equals DuckDB HUGEINT `//` "
    "truncation), ties broken on the earliest split, and the score "
    "emits as a STRING (the fingerprint_orders bare-decimal lesson). "
    "Floats appear only in the reported means, rounded round-6",
)
def sse_changepoint_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import sse_changepoint

    ev = load_events(spark, sf_dir)
    rollup = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    return sse_changepoint(rollup, ["event_type"], "day", "v")


@_q(
    "freq_triples_brands",
    """
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS i
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    nb AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM b),
    f1 AS MATERIALIZED (
      SELECT i, CAST(COUNT(*) AS BIGINT) AS supp
      FROM b GROUP BY i
      HAVING CAST(COUNT(*) AS BIGINT) * 10000 >= 20 * (SELECT n FROM nb)),
    bf AS MATERIALIZED (SELECT b.o, b.i FROM b JOIN f1 USING (i)),
    pib AS MATERIALIZED (
      SELECT a.o, a.i AS ia, c.i AS ib
      FROM bf a JOIN bf c ON a.o = c.o AND a.i < c.i),
    f2 AS MATERIALIZED (
      SELECT ia, ib FROM pib GROUP BY ia, ib
      HAVING CAST(COUNT(*) AS BIGINT) * 10000 >= 20 * (SELECT n FROM nb)),
    cand AS (
      SELECT fp.o, fp.ia, fp.ib, e.i AS ic
      FROM (SELECT pib.o, pib.ia, pib.ib
            FROM pib JOIN f2 USING (ia, ib)) fp
      JOIN bf e ON e.o = fp.o AND e.i > fp.ib
      JOIN f2 p2 ON p2.ia = fp.ia AND p2.ib = e.i
      JOIN f2 p3 ON p3.ia = fp.ib AND p3.ib = e.i),
    tri AS (
      SELECT ia, ib, ic, CAST(COUNT(*) AS BIGINT) AS support
      FROM cand GROUP BY ia, ib, ic
      HAVING CAST(COUNT(*) AS BIGINT) * 10000 >= 20 * (SELECT n FROM nb))
    SELECT t.ia AS item_a, t.ib AS item_b, t.ic AS item_c, t.support,
           ROUND(CAST(t.support AS DOUBLE) / (SELECT n FROM nb), 6)
             AS support_frac,
           ROUND(CAST((SELECT n FROM nb)::HUGEINT * (SELECT n FROM nb)
                      * t.support AS DOUBLE)
                 / CAST(sa.supp::HUGEINT * sb.supp * sc.supp AS DOUBLE), 6)
             AS lift
    FROM tri t JOIN f1 sa ON sa.i = t.ia JOIN f1 sb ON sb.i = t.ib
    JOIN f1 sc ON sc.i = t.ic
    ORDER BY item_a, item_b, item_c
    """,
    doc="Apriori frequent 3-itemsets over per-order brand baskets "
    "(operators/relational.py:frequent_triples): every brand triple "
    "co-bought in >= 0.2% of orders, with support and lift vs full "
    "independence — extends item_affinity's pairs to the first "
    "combinatorial Apriori level, with the downward-closure prune "
    "applied BEFORE the count shuffle (both new sub-pairs of each "
    "candidate extension must be in the threshold-bounded frequent-"
    "pair set, which broadcasts). Relative support thresholds are "
    "cross-multiplied (supp * 10000 >= permyriad * N) so no engine "
    "divides; work is sum_baskets C(|b|,3)-bounded by basket size, "
    "never item popularity, and a max_basket_size hygiene filter "
    "guards the whale-basket blowup at 100 TB. Fractions/lift emit "
    "as round-6 doubles (all products < 2^53 — exact in double)",
)
def freq_triples_brands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import frequent_triples

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    b = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    return frequent_triples(
        b, "l_orderkey", "p_brand", min_support_permyriad=20
    )


@_q(
    "spearman_value_items",
    """
    WITH j AS (
      SELECT o.o_orderpriority, o.o_totalprice AS x, c.n_items AS y
      FROM orders o JOIN (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem GROUP BY l_orderkey) c
      ON o.o_orderkey = c.l_orderkey),
    r AS (
      SELECT o_orderpriority,
             2 * rank() OVER (PARTITION BY o_orderpriority ORDER BY x)
               + COUNT(*) OVER (PARTITION BY o_orderpriority, x) - 1
               AS rx,
             2 * rank() OVER (PARTITION BY o_orderpriority ORDER BY y)
               + COUNT(*) OVER (PARTITION BY o_orderpriority, y) - 1
               AS ry
      FROM j),
    m AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rx::HUGEINT) AS sx, SUM(ry::HUGEINT) AS sy,
             SUM(rx::HUGEINT * ry) AS sxy,
             SUM(rx::HUGEINT * rx) AS sxx,
             SUM(ry::HUGEINT * ry) AS syy
      FROM r GROUP BY o_orderpriority)
    SELECT o_orderpriority, n,
           CASE WHEN n::HUGEINT * sxx - sx * sx > 0
                 AND n::HUGEINT * syy - sy * sy > 0
                THEN ROUND(
                  CAST(CAST(n::HUGEINT * sxy - sx * sy AS VARCHAR)
                       AS DOUBLE)
                  / (sqrt(CAST(CAST(n::HUGEINT * sxx - sx * sx AS VARCHAR)
                               AS DOUBLE))
                     * sqrt(CAST(CAST(n::HUGEINT * syy - sy * sy
                                      AS VARCHAR) AS DOUBLE))), 6)
           END AS spearman_rho
    FROM m ORDER BY o_orderpriority
    """,
    doc="per-priority Spearman rank correlation between order value "
    "and line-item count (operators/relational.py:spearman_corr): "
    "Pearson on AVERAGE ranks with exact tie handling (the d^2 "
    "shortcut is wrong under ties) — the monotone-association "
    "companion to q12's Pearson corr. Doubled ranks are exact "
    "BIGINTs (tie-run average rank is always a half-integer; the "
    "factor 2 cancels), moments accumulate in DECIMAL(38,0)/HUGEINT "
    "(n * Sxy passes int64 at 60k-row groups), the numerator crosses "
    "to double through the VARCHAR roundtrip (playbook: bare "
    "decimal-magnitude outputs past 2^53), and sqrt splits the "
    "denominator BEFORE multiplication (dx * dy would pass "
    "DECIMAL(38)). Two rank windows + one tie-count window per "
    "variable, one map-side-combined moment aggregate",
)
def spearman_value_items_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import spearman_corr

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n_items")
    )
    j = orders.join(cnt, orders.o_orderkey == cnt.l_orderkey).select(
        "o_orderpriority", "o_totalprice", "n_items"
    )
    return spearman_corr(j, ["o_orderpriority"], "o_totalprice", "n_items")


@_q(
    "augment_dropout_docs",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
      FROM documents WHERE text IS NOT NULL),
    pos AS (
      SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS i,
             len(l) AS nt
      FROM toks),
    mark AS (
      SELECT doc_id, tok, i, nt,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
                                    || CAST(i AS VARCHAR) || ':aug1'),
                                1, 15))::BIGINT % 1000 AS h
      FROM pos)
    SELECT doc_id, CAST(MAX(nt) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN h >= 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           COALESCE(string_agg(CASE WHEN h >= 100 THEN tok END,
                               ' ' ORDER BY i), '') AS text_aug
    FROM mark GROUP BY doc_id
    """,
    doc="deterministic token-dropout augmentation over documents "
    "(operators/text.py:augment_token_dropout): drop each whitespace "
    "token with p = 100/1000 decided by the canonical md5_60 hash of "
    "id:position:seed — the denoising augmentation for LLM training "
    "data made replayable (same id/pos/seed -> same decision on any "
    "engine/partitioning/rerun; vary the seed for independent "
    "epochs). Position-keyed, not token-keyed, so repeated tokens "
    "drop independently and adversarial content cannot bias its own "
    "survival. ZERO shuffles — split/HOF-filter/array_join are "
    "row-local column expressions in whole-stage codegen; runs at "
    "scan speed as one narrow map. The oracle replays the hash via "
    "unnest WITH ordinality + ordered string_agg",
)
def augment_dropout_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import augment_token_dropout

    docs = load(spark, sf_dir, "documents")
    return augment_token_dropout(docs, "doc_id", "text", 100, "aug1")


@_q(
    "seq_trigrams_users",
    """
    WITH e AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT t1, t2, t3,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys
    FROM e WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3 ORDER BY t1, t2, t3
    """,
    doc="frequent ordered event-type trigrams per user "
    "(operators/sessions.py:sequence_ngrams): every contiguous "
    "3-step type sequence in each user's time-ordered history, with "
    "total occurrences and distinct users — the order-sensitive "
    "mining rung between session_transition_matrix (first-order "
    "Markov pairs) and session_journeys (whole paths): trigrams see "
    "second-order structure the pair matrix factorizes away. ONE "
    "sort shuffle: lead windows emit the n-gram rows directly — no "
    "collect_list array, so a whale user with 10^7 events costs "
    "10^7 ROWS, never a 10^7-element in-memory array (the "
    "100 TB-safe shape); then one map-side-combined count over at "
    "most |types|^3 groups. event_id tie-breaks equal timestamps on "
    "both engines",
)
def seq_trigrams_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sessions import sequence_ngrams

    ev = load_events(spark, sf_dir)
    return sequence_ngrams(
        ev, ["user_id"], "ts", "event_type", n=3, tie_col="event_id"
    )


@_q(
    "burstiness_event_types",
    """
    WITH s AS (
      SELECT event_type, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
      FROM events),
    g AS (
      SELECT event_type,
             sec - lag(sec) OVER (PARTITION BY event_type
                                  ORDER BY sec, event_id) AS d
      FROM s),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             SUM(d::HUGEINT) AS sd, SUM(d::HUGEINT * d) AS qd
      FROM g WHERE d IS NOT NULL GROUP BY event_type)
    SELECT event_type, n_gaps,
           ROUND(CAST(CAST(sd AS VARCHAR) AS DOUBLE) / n_gaps, 6)
             AS mean_gap_s,
           -- every sample-std term guards n_gaps > 1 (advisor r8: a
           -- key with exactly 2 events has one gap -> the unguarded
           -- form divides by zero where the operator emits NULL)
           CASE WHEN n_gaps > 1 THEN
             ROUND(sqrt(CAST(CAST(n_gaps::HUGEINT * qd - sd * sd
                                  AS VARCHAR) AS DOUBLE)
                        / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1))), 6)
           END AS std_gap_s,
           CASE WHEN n_gaps > 1 AND sd > 0 THEN
             ROUND(sqrt(CAST(CAST(n_gaps::HUGEINT * qd - sd * sd
                                  AS VARCHAR) AS DOUBLE)
                        / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1)))
                   / (CAST(CAST(sd AS VARCHAR) AS DOUBLE) / n_gaps), 6)
           END AS cv,
           CASE WHEN n_gaps > 1 AND sd > 0 THEN
             ROUND((sqrt(CAST(CAST(n_gaps::HUGEINT * qd - sd * sd
                                   AS VARCHAR) AS DOUBLE)
                         / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1)))
                    - CAST(CAST(sd AS VARCHAR) AS DOUBLE) / n_gaps)
                   / (sqrt(CAST(CAST(n_gaps::HUGEINT * qd - sd * sd
                                     AS VARCHAR) AS DOUBLE)
                           / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1)))
                      + CAST(CAST(sd AS VARCHAR) AS DOUBLE) / n_gaps), 6)
           END AS burstiness
    FROM m ORDER BY event_type
    """,
    doc="point-process inter-arrival analysis per event type "
    "(operators/series.py:burstiness): gap count, mean/sample-std of "
    "the inter-event gap, CV, and the Goh-Barabasi burstiness index "
    "B = (sigma - mu)/(sigma + mu) — regular traffic B < 0, Poisson "
    "B ~ 0, heavy bursts B -> 1; the arrival-TIMING readout the "
    "value-based drift family (z-score/CUSUM/changepoint) has no "
    "view of. Exactness: timestamps floor to whole-second BIGINTs "
    "(the epoch discipline — DuckDB epoch() is fractional and "
    "::BIGINT rounds), the lag ORDER is the floored integers + "
    "event_id (engine-independent even for sub-second inputs), "
    "moments accumulate DECIMAL(38,0)/HUGEINT (sum d^2 is the "
    "t^2-overflow class), and every float derives from (n, S, Q) "
    "via identical double expressions with the VARCHAR-roundtrip "
    "crossing. One sort window + one map-side-combined aggregate",
)
def burstiness_event_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import burstiness

    ev = load_events(spark, sf_dir)
    return burstiness(ev, ["event_type"], "ts", tie_col="event_id")


@_q(
    "tcloseness_customer_release",
    """
    WITH rel AS MATERIALIZED (
      SELECT c_mktsegment, c_nationkey,
             CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
             o_orderpriority AS s
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE o_orderpriority IS NOT NULL),
    gv AS MATERIALIZED (
      SELECT c_mktsegment, c_nationkey, bal_band, s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM rel GROUP BY 1, 2, 3, 4),
    grp AS (SELECT c_mktsegment, c_nationkey, bal_band,
                   CAST(SUM(c) AS BIGINT) AS ng
            FROM gv GROUP BY 1, 2, 3),
    gdist AS MATERIALIZED (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS gc,
             row_number() OVER (ORDER BY s) AS j
      FROM rel GROUP BY s),
    tot AS (SELECT CAST(SUM(gc) AS BIGINT) AS nn,
                   CAST(COUNT(*) AS BIGINT) AS m FROM gdist),
    dense AS (
      SELECT g.c_mktsegment, g.c_nationkey, g.bal_band, gl.j,
             g.ng, t.nn, t.m,
             COALESCE(v.c, 0)::HUGEINT * t.nn
               - gl.gc::HUGEINT * g.ng AS d
      FROM grp g CROSS JOIN gdist gl CROSS JOIN tot t
      LEFT JOIN gv v ON v.c_mktsegment = g.c_mktsegment
        AND v.c_nationkey = g.c_nationkey
        AND v.bal_band = g.bal_band AND v.s = gl.s),
    cum AS (
      SELECT *, SUM(d) OVER (
        PARTITION BY c_mktsegment, c_nationkey, bal_band
        ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS r
      FROM dense),
    per AS (
      SELECT c_mktsegment, c_nationkey, bal_band,
             MAX(ng) AS ng, MAX(nn) AS nn, MAX(m) AS m,
             SUM(abs(r)) AS emd
      FROM cum WHERE j < m OR m = 1 GROUP BY 1, 2, 3),
    pt AS (
      SELECT per.*, th.t_permille,
             CASE WHEN m > 1 THEN
               ROUND(CAST(CAST(emd AS VARCHAR) AS DOUBLE)
                     / (CAST(ng AS DOUBLE) * nn * (m - 1)), 6)
             ELSE 0.0 END AS t_g,
             CASE WHEN emd * 1000
                       > th.t_permille::HUGEINT * ng * nn * (m - 1)
                  THEN 1 ELSE 0 END AS viol
      FROM per CROSS JOIN (VALUES (150), (200), (300))
        AS th(t_permille))
    SELECT t_permille / 1000.0 AS t_threshold,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(viol) AS BIGINT) AS violating_groups,
           CAST(SUM(ng * viol) AS BIGINT) AS violating_rows,
           ROUND(SUM(ng * viol) / SUM(ng), 6) AS pct_rows_at_risk,
           ROUND(MAX(t_g), 6) AS max_t
    FROM pt GROUP BY t_permille ORDER BY t_threshold
    """,
    doc="t-closeness release audit over the same (segment, nation, "
    "balance-band) quasi-identifier frame as kanon_customer_release "
    "(operators/privacy.py:t_closeness_report) — the rung ABOVE "
    "k-anonymity/l-diversity: a group can be large AND diverse yet "
    "leak because its sensitive DISTRIBUTION skews from the "
    "table's; t-closeness bounds the Earth Mover's Distance between "
    "them. Ordered-domain EMD = mean |cumulative difference|, "
    "scaled to the exact integer c_i*N - C_i*n_g in DECIMAL(38,0)/"
    "HUGEINT (n*N passes int64 at 100 TB), threshold tests "
    "cross-multiplied — floats only in the reported max_t/pct. One "
    "(QI, s) groupBy, then a |groups| x m dense frame off a "
    "broadcast m-row global distribution + one cumulative window",
)
def tcloseness_customer_release_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.privacy import t_closeness_report

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    rel = c.join(o, o["o_custkey"] == c["c_custkey"], "left").select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
        "o_orderpriority",
    )
    return t_closeness_report(
        rel,
        ["c_mktsegment", "c_nationkey", "bal_band"],
        "o_orderpriority",
        thresholds_permille=(150, 200, 300),
    )


@_q(
    "sprt_event_quality",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(CASE WHEN value > 500 THEN 1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM events GROUP BY 1, 2),
    st AS (
      SELECT event_type, day,
             CAST(FLOOR((s * 0.09531017980432493
                         + (t - s) * -0.10536051565782628) * 1000000)
                  AS BIGINT) AS stp
      FROM d),
    run AS (
      SELECT event_type, day,
             SUM(stp) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS llr
      FROM st),
    crossed AS (
      SELECT event_type, day, llr,
             CASE WHEN llr >= 2772588 THEN 'accept_h1'
                  WHEN llr <= -1558145 THEN 'accept_h0' END AS cr
      FROM run),
    fc AS (
      SELECT event_type, day AS decided_at, cr AS decision,
             llr AS llr_dec
      FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) AS rn
            FROM crossed WHERE cr IS NOT NULL) WHERE rn = 1),
    tails AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_periods,
             arg_max(llr, day) AS llr_end
      FROM crossed GROUP BY event_type)
    SELECT t.event_type,
           COALESCE(f.decision, 'continue') AS decision,
           f.decided_at, t.n_periods,
           ROUND(COALESCE(f.llr_dec, t.llr_end) / 1000000.0, 6)
             AS llr
    FROM tails t LEFT JOIN fc f ON f.event_type = t.event_type
    ORDER BY t.event_type
    """,
    doc="Wald SPRT per event type on the daily share of high-value "
    "events (operators/series.py:sprt_decisions): sequential test of "
    "H1 p=0.55 vs H0 p=0.5 (alpha=0.05, beta=0.2) on the Bernoulli "
    "stream success := value > 500 — the sequential-decision rung "
    "next to the batch tests (chi2/MWU/ANOVA decide after seeing "
    "everything; SPRT reports WHEN the evidence sufficed, at ~half "
    "the fixed-n sample size). The two per-observation log terms and "
    "both Wald boundaries are computed ONCE in Python and injected "
    "as identical double literals into BOTH engines, each day\'s LLR "
    "is the identical IEEE expression on identical integers, and it "
    "quantizes to micros BIGINTs BEFORE the running sum (the CUSUM "
    "discipline) — so the crossing day is engine-exact. One sort "
    "window + one argmin window + one per-key tail aggregate",
)
def sprt_event_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import sprt_decisions

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").cast("long").alias("trials"),
        F.sum(F.when(F.col("value") > 500, 1).otherwise(0))
        .cast("long")
        .alias("successes"),
    )
    return sprt_decisions(
        daily,
        ["event_type"],
        "day",
        "successes",
        "trials",
        p0=0.5,
        p1=0.55,
        alpha=0.05,
        beta=0.2,
    )


@_q(
    "proximity_search_docs",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w,
             generate_subscripts(
               string_split_regex(lower(trim(text)), '\\s+'), 1) - 1
               AS pos
      FROM documents),
    q AS (SELECT doc_id, w, pos FROM toks
          WHERE w IN ('hash', 'scan', 'table')),
    anchors AS (SELECT doc_id, pos AS p FROM q),
    nn0 AS (SELECT a.doc_id, a.p, MIN(j.pos) AS nn FROM anchors a
            JOIN q j ON j.doc_id = a.doc_id AND j.w = 'hash'
              AND j.pos >= a.p GROUP BY 1, 2),
    nn1 AS (SELECT a.doc_id, a.p, MIN(j.pos) AS nn FROM anchors a
            JOIN q j ON j.doc_id = a.doc_id AND j.w = 'scan'
              AND j.pos >= a.p GROUP BY 1, 2),
    nn2 AS (SELECT a.doc_id, a.p, MIN(j.pos) AS nn FROM anchors a
            JOIN q j ON j.doc_id = a.doc_id AND j.w = 'table'
              AND j.pos >= a.p GROUP BY 1, 2),
    spans AS (
      SELECT a.doc_id, a.p,
             greatest(n0.nn, n1.nn, n2.nn) - a.p + 1 AS w
      FROM anchors a
      JOIN nn0 n0 ON n0.doc_id = a.doc_id AND n0.p = a.p
      JOIN nn1 n1 ON n1.doc_id = a.doc_id AND n1.p = a.p
      JOIN nn2 n2 ON n2.doc_id = a.doc_id AND n2.p = a.p
      WHERE greatest(n0.nn, n1.nn, n2.nn) - a.p + 1 <= 12),
    pick AS (
      SELECT doc_id, w, p,
             row_number() OVER (PARTITION BY doc_id ORDER BY w, p)
               AS rn,
             COUNT(*) OVER (PARTITION BY doc_id) AS nw
      FROM spans)
    SELECT doc_id, CAST(w AS BIGINT) AS min_span,
           CAST(p AS BIGINT) AS span_start,
           CAST(nw AS BIGINT) AS n_windows
    FROM pick WHERE rn = 1
    """,
    doc="proximity retrieval: documents where 'hash', 'scan', and "
    "'table' all co-occur within a 12-token span, any order "
    "(operators/text.py:proximity_search) — the middle rung of the "
    "positional family between bm25_rank (bag of words) and "
    "phrase_search_docs (exact consecutive order). Exact "
    "minimum-window semantics: every query-term occurrence anchors "
    "a candidate left end; the span to the nearest at-or-after "
    "occurrence of each term is the tightest window there, and the "
    "true minimum's left end is always such an occurrence — the "
    "sweep is exhaustive, no heuristic. Postings filtered to the "
    "query terms BEFORE any shuffle (the BM25/phrase discipline); "
    "per-doc cost quadratic only in per-document QUERY-TERM "
    "frequency. All positions exact BIGINTs; ties break (width, "
    "start) on both engines via the struct-min",
)
def proximity_search_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import proximity_search

    docs = load(spark, sf_dir, "documents")
    return proximity_search(
        docs, "doc_id", "text", ["hash", "scan", "table"], window=12
    )


_HARDNEG_QSETS = {
    # mixed: 'dup' is the one genuinely rare term (df ~5% of docs) —
    # its 25x idf puts covering docs on top, and the tail of the
    # top-40 is high-tf partial matches = the hard negatives
    "hq1": ["dup", "key", "fast"],
    # easy: two ubiquitous terms — coverage saturates, all positives
    "hq2": ["join", "hash"],
    # impossible: 'model' has no postings, so full coverage cannot
    # happen — every top-40 doc is a hard negative (the generator
    # still yields training signal on an unanswerable query)
    "hq3": ["dup", "model", "scan"],
}


def _hardneg_block(qid: str, terms: list[str], k: int) -> str:
    tset = sorted({t.lower() for t in terms})
    tl = ", ".join(f"'{t}'" for t in tset)
    m = len(tset)
    return f"""
    sc_{qid} AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))
             ), 6) AS bm25,
             CAST(COUNT(DISTINCT tf.t) AS BIGINT) AS n_covered
      FROM (SELECT doc_id, dl, t, CAST(COUNT(*) AS DOUBLE) AS tf
            FROM toks WHERE t IN ({tl}) GROUP BY doc_id, dl, t) tf
      JOIN (SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
            FROM toks WHERE t IN ({tl}) GROUP BY t) dfreq
        ON dfreq.t = tf.t
      CROSS JOIN stats s
      GROUP BY tf.doc_id),
    top_{qid} AS (
      SELECT '{qid}' AS query_id, doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                  AS BIGINT) AS rank,
             bm25, n_covered,
             CASE WHEN n_covered = {m} THEN 'positive'
                  ELSE 'hard_negative' END AS role
      FROM sc_{qid} ORDER BY bm25 DESC, doc_id LIMIT {k})"""


def _hardneg_oracle() -> str:
    blocks = ",".join(
        _hardneg_block(qid, ts, 40) for qid, ts in _HARDNEG_QSETS.items()
    )
    selects = " UNION ALL ".join(
        f"SELECT * FROM top_{qid}" for qid in _HARDNEG_QSETS
    )
    return f"""
    WITH docs AS MATERIALIZED (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tok,
             len(string_split_regex(trim(text), '\\s+')) AS dl
      FROM documents),
    toks AS MATERIALIZED (
      SELECT doc_id, dl, UNNEST(tok) AS t FROM docs),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl
              FROM docs),
    {blocks}
    {selects} ORDER BY query_id, rank
    """


@_q(
    "hard_negatives_bm25",
    _hardneg_oracle(),
    doc="hard-negative mining for retrieval-model training "
    "(operators/retrieval.py:hard_negatives): per query the BM25 "
    "top-40 labeled positive (covers every query term) or HARD "
    "negative (high score, missing a term) — the pairs that teach a "
    "ranker; random negatives are trivially separable and carry no "
    "gradient (the DPR recipe). Labels are the same deterministic "
    "term-coverage pseudo-qrel search_eval_bm25 judges with, so the "
    "generator and the evaluator agree on relevance. Three query "
    "profiles pinned: mixed (rare 'dup' anchors positives, high-tf "
    "partial matches trail as negatives), saturated (all positive), "
    "unanswerable (zero-df term: all negatives). Corpus tokenized "
    "ONCE into the shared checkpointed index; per query a "
    "|terms|-partition score + TakeOrderedAndProject cut; ranked "
    "ties break on round-6 bm25 then doc_id — both engines order "
    "the same rounded doubles",
)
def hard_negatives_bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import hard_negatives

    docs = load(spark, sf_dir, "documents")
    return hard_negatives(docs, "doc_id", "text", _HARDNEG_QSETS, k=40)


@_q(
    "link_prediction_suppliers",
    """
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    degl AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS dl FROM e GROUP BY s),
    degr AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS dr FROM e GROUP BY c),
    ew AS (SELECT e.s, e.c, 1000000000 // dr AS w
           FROM e JOIN degr USING (c)),
    pairs AS (
      SELECT a.s AS node_a, b.s AS node_b,
             CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             CAST(SUM(a.w) AS BIGINT) AS ra_nanos
      FROM ew a JOIN ew b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    scored AS (
      SELECT p.node_a, p.node_b, p.common_neighbors,
             ROUND(p.common_neighbors * 1.0
                   / (da.dl + db.dl - p.common_neighbors), 6) AS jaccard,
             ROUND(p.ra_nanos / 1000000000.0, 6)
               AS resource_allocation,
             p.ra_nanos
      FROM pairs p JOIN degl da ON da.s = p.node_a
      JOIN degl db ON db.s = p.node_b)
    SELECT node_a, node_b, common_neighbors, jaccard,
           resource_allocation
    FROM scored
    ORDER BY ra_nanos DESC, common_neighbors DESC, node_a, node_b
    LIMIT 50
    """,
    doc="bipartite link prediction over the supplier-customer graph "
    "(operators/graph.py:link_prediction): top-50 supplier pairs by "
    "shared customer neighborhoods under the three classic indices — "
    "common neighbors, Jaccard, and Resource Allocation "
    "sum 1/deg(z) (Zhou/Lu/Zhang 2009 — down-weights promiscuous "
    "hubs where CN cannot; 'suppliers sharing many LOW-degree "
    "customers are likely substitutes'). The candidate-generation "
    "rung under the recommendation family's rankers. Exactness: RA "
    "terms are floor(1e9/deg) BIGINT nanos via true INTEGER "
    "division — deliberately NOT Adamic-Adar, whose 1/ln(deg) puts "
    "a transcendental inside a per-term floor where libm-vs-JVM "
    "last-ulps could straddle. Pair work = sum_z C(deg_z, 2), "
    "bounded by right-side degree (item_affinity's argument); "
    "weights attach BEFORE the pair shuffle; degree frames "
    "broadcast; TakeOrderedAndProject cut on (RA, CN, pair)",
)
def link_prediction_suppliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import link_prediction

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey", "o_custkey"
    )
    return link_prediction(
        edges, "l_suppkey", "o_custkey", min_common=2, top_k=50
    )


@_q(
    "profile_drift_orders",
    """
    WITH po AS (
      SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_old,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nulls_old,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_old
      FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01' UNION ALL 
      SELECT 'o_orderpriority' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_old,
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nulls_old,
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS ndv_old
      FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01' UNION ALL 
      SELECT 'o_orderstatus' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_old,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nulls_old,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS ndv_old
      FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01' UNION ALL 
      SELECT 'o_totalprice' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_old,
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nulls_old,
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS ndv_old
      FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'),
    pn AS (
      SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nulls_new,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_new
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' UNION ALL 
      SELECT 'o_orderpriority' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nulls_new,
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS ndv_new
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' UNION ALL 
      SELECT 'o_orderstatus' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nulls_new,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS ndv_new
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' UNION ALL 
      SELECT 'o_totalprice' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nulls_new,
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS ndv_new
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01')
    SELECT po.col_name AS "column", n_old, n_new,
           CASE WHEN n_old > 0
                THEN ROUND(nulls_old * 1.0 / n_old, 6) END
             AS null_rate_old,
           CASE WHEN n_new > 0
                THEN ROUND(nulls_new * 1.0 / n_new, 6) END
             AS null_rate_new,
           CASE WHEN n_old > 0 AND n_new > 0
                THEN ROUND(nulls_new * 1.0 / n_new
                           - nulls_old * 1.0 / n_old, 6) END
             AS null_rate_delta,
           ndv_old, ndv_new,
           CASE WHEN ndv_old > 0
                THEN ROUND(ndv_new * 1.0 / ndv_old, 6) END AS ndv_ratio
    FROM po JOIN pn ON pn.col_name = po.col_name
    ORDER BY po.col_name
    """,
    doc="column-profile drift between the pre- and post-2001 order "
    "snapshots (operators/dq.py:profile_drift): per column exact row "
    "counts, null rates, distinct counts, the null-rate delta and "
    "NDV ratio — the data-contract monitor that catches what schema "
    "checks cannot (the column still exists and types, but its null "
    "rate tripled or its enum collapsed). The drift rung of the DQ "
    "family: dq_report asserts point-in-time expectations, fd_audit "
    "discovers structure, this compares two points in time. ONE "
    "fused aggregate pass per snapshot (null counts ride the same "
    "map-side combine; exact per-column COUNT DISTINCTs expand — "
    "swap in the HLL sketch ops when profiling 100s of columns at "
    "100 TB); the long form is an F.inline over the aggregate row "
    "and the join is |columns|-sized. Guarded divisions: an empty "
    "side reports NULL rates, never an ANSI division error",
)
def profile_drift_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dq import profile_drift

    orders = load(spark, sf_dir, "orders")
    cut = F.lit("2001-01-01").cast("timestamp")
    return profile_drift(
        orders.filter(F.col("o_orderdate") < cut),
        orders.filter(F.col("o_orderdate") >= cut),
        ["o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice"],
    )


@_q(
    "sla_business_days",
    """
    WITH ship AS (
      SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      FROM lineitem GROUP BY l_orderkey),
    j AS (
      SELECT o.o_orderpriority,
             date_diff('day', DATE '1900-01-01',
                       CAST(o.o_orderdate AS DATE)) AS ma,
             date_diff('day', DATE '1900-01-01', s.first_ship) AS mb
      FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND s.first_ship IS NOT NULL),
    bdv AS (
      SELECT o_orderpriority,
             (5 * ((mb - mb % 7) // 7) + least(mb % 7, 5))
             - (5 * ((ma - ma % 7) // 7) + least(ma % 7, 5)) AS bd
      FROM j),
    pv AS (
      SELECT o_orderpriority, bd, CAST(COUNT(*) AS BIGINT) AS c
      FROM bdv GROUP BY 1, 2),
    cum AS (
      SELECT o_orderpriority, bd, c,
             SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY bd
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cm,
             SUM(c) OVER (PARTITION BY o_orderpriority) AS n
      FROM pv)
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n,
           ROUND(CAST(SUM(bd * c) AS DOUBLE) / MAX(n), 6) AS mean_bd,
           ROUND(CAST(SUM(CASE WHEN bd > 30 THEN c ELSE 0 END)
                      AS DOUBLE) / MAX(n), 6) AS breach_rate,
           CAST(MIN(CASE WHEN cm * 100 >= 50 * n THEN bd END)
                AS BIGINT) AS p50_bd,
           CAST(MIN(CASE WHEN cm * 100 >= 90 * n THEN bd END)
                AS BIGINT) AS p90_bd
    FROM cum GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="business-day fulfillment SLA per order priority "
    "(operators/relational.py:business_day_sla over "
    "business_days_col): weekend-excluding days from order date to "
    "first ship date — naive datediff is wrong by ~2/7 on any SLA. "
    "The calendar arithmetic is a CLOSED FORM (bd(d) = 5*(m div 7) "
    "+ least(m mod 7, 5) off a fixed Monday anchor) — O(1) per row "
    "in codegen, no calendar table, no per-day explode; a "
    "decade-long interval costs the same as a day. Exact type-1 "
    "percentiles by rank selection over the (group, duration) "
    "distinct frame (weighted-percentiles discipline, "
    "cross-multiplied cum*100 >= p*n), exact BIGINT durations, "
    "divisions only in the reported mean/breach rate",
)
def sla_business_days_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import business_day_sla

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
    )
    j = orders.join(ship, orders.o_orderkey == ship.l_orderkey).select(
        "o_orderpriority", "o_orderdate", "first_ship"
    )
    return business_day_sla(
        j,
        ["o_orderpriority"],
        "o_orderdate",
        "first_ship",
        sla_days=30,
        percentiles=(50, 90),
    )


@_q(
    "cohort_ltv_curve",
    """
    WITH f AS (
      SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS fd
      FROM orders GROUP BY o_custkey),
    coh AS (
      SELECT o_custkey, CAST(date_trunc('month', fd) AS DATE)
               AS cohort_month,
             year(fd) * 12 + month(fd) AS cym
      FROM f),
    sizes AS (SELECT cohort_month, CAST(COUNT(*) AS BIGINT)
                AS cohort_size
              FROM coh GROUP BY 1),
    cells AS (
      SELECT c.cohort_month,
             year(CAST(o.o_orderdate AS DATE)) * 12
               + month(CAST(o.o_orderdate AS DATE)) - c.cym
               AS age_months,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN coh c ON c.o_custkey = o.o_custkey
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort_month, age_months, n_orders, rev,
             SUM(rev) OVER (PARTITION BY cohort_month
                            ORDER BY age_months
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumrev
      FROM cells)
    SELECT c.cohort_month, CAST(age_months AS BIGINT) AS age_months,
           n_orders,
           ROUND(CAST(CAST(rev AS VARCHAR) AS DOUBLE), 2) AS revenue,
           ROUND(CAST(CAST(cumrev AS VARCHAR) AS DOUBLE), 2)
             AS cum_revenue,
           s.cohort_size,
           ROUND(CAST(CAST(cumrev AS VARCHAR) AS DOUBLE)
                 / s.cohort_size, 6) AS ltv_per_member
    FROM cum c JOIN sizes s USING (cohort_month)
    ORDER BY c.cohort_month, age_months
    """,
    doc="cohort lifetime-value curve "
    "(operators/relational.py:cohort_ltv_curve): customers cohort by "
    "first-order month; each (cohort, age) cell reports period "
    "revenue, cumulative revenue, and LTV per cohort member — the "
    "monetary companion to comeback-counting retention (retention "
    "says WHO returns; this prices what returning is WORTH). "
    "Cohort/age are pure integer month arithmetic (year*12+month — "
    "no months_between float), revenue rides exact DECIMAL(18,2) "
    "sums with the cumulative window over the months^2-bounded "
    "AGGREGATE frame, decimals cross to double via the VARCHAR "
    "roundtrip, one division per cell. One entity aggregate + one "
    "cell aggregate; nothing fact-sized shuffles twice",
)
def cohort_ltv_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import cohort_ltv_curve

    orders = load(spark, sf_dir, "orders")
    return cohort_ltv_curve(orders, "o_custkey", "o_orderdate", "o_totalprice")


# ---------------------------------------------------------------------------
# round-9 wave: market concentration, survival hazard, experiment planning,
# calendar parity, graph transitivity, survey ratio estimation, l-diversity,
# Kendall tau-b, score calibration, corpus JSD, MMR re-ranking, winsorized
# moments
# ---------------------------------------------------------------------------


@_q(
    "hhi_supplier_nations",
    """
    WITH per_firm AS (
      SELECT n.n_name, l.l_suppkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT n_name, v,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY v DESC, l_suppkey) AS rn
      FROM per_firm),
    m AS (
      SELECT n_name,
             CAST(COUNT(*) AS BIGINT) AS n_firms,
             SUM(v) AS s,
             SUM(CAST(v * v AS DECIMAL(38,4))) AS q,
             SUM(CASE WHEN rn <= 4 THEN v END) AS top
      FROM ranked GROUP BY 1)
    SELECT n_name, n_firms,
           ROUND(CAST(CAST(s AS VARCHAR) AS DOUBLE), 2) AS total_value,
           ROUND(10000.0 * CAST(CAST(q AS VARCHAR) AS DOUBLE)
                 / (CAST(CAST(s AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(s AS VARCHAR) AS DOUBLE)), 6) AS hhi,
           ROUND(CAST(CAST(top AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(s AS VARCHAR) AS DOUBLE), 6) AS cr4
    FROM m ORDER BY n_name
    """,
    doc="Herfindahl-Hirschman concentration of supplier revenue per "
    "nation (operators/relational.py:hhi_concentration): HHI on the "
    "0-10000 antitrust scale + CR4 top-firm share — the "
    "market-structure scalar next to gini_customer_revenue's "
    "inequality curve. Firm revenue rides DECIMAL(18,2) cents, the "
    "squared-share moment DECIMAL(38,4) (the t^2 overflow class), "
    "CR4 ranks on the exact decimal with a suppkey tiebreak, and "
    "every decimal crosses to double via the VARCHAR bridge. One "
    "firm aggregate + one per-market rank window over the "
    "firm-cardinality frame + one map-side-combined rollup",
)
def hhi_supplier_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import hhi_concentration

    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    joined = li.join(
        supp, li["l_suppkey"] == supp["s_suppkey"]
    ).join(nat, supp["s_nationkey"] == nat["n_nationkey"])
    return hhi_concentration(
        joined, ["n_name"], "l_suppkey", "l_extendedprice"
    )


@_q(
    "nelson_aalen_segments",
    """
    WITH span AS (
      SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
      FROM orders GROUP BY 1),
    g AS (SELECT MAX(o_orderdate) AS m FROM orders),
    subj AS (
      SELECT c.c_mktsegment AS seg,
             CAST(CAST(span.l AS DATE) - CAST(span.f AS DATE)
                  AS BIGINT) AS t,
             (CAST(g.m AS DATE) - CAST(span.l AS DATE)) > 90 AS obs
      FROM span JOIN customer c ON c.c_custkey = span.o_custkey
      CROSS JOIN g),
    counts AS (
      SELECT seg, t,
             CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT) AS c
      FROM subj GROUP BY 1, 2),
    atrisk AS (
      SELECT seg, t, d, c,
             SUM(d + c) OVER (PARTITION BY seg)
             - COALESCE(SUM(d + c) OVER (PARTITION BY seg ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS n,
             (1000000000 * d) // (
               SUM(d + c) OVER (PARTITION BY seg)
               - COALESCE(SUM(d + c) OVER (PARTITION BY seg ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0)) AS h
      FROM counts)
    SELECT seg AS c_mktsegment, t,
           CAST(n AS BIGINT) AS n_risk, d AS n_events, c AS n_censored,
           -- half-up at the nano->micro boundary IN INTEGERS, then an
           -- exact micros/1e6 double (ROUND(cum/1e9, 6) diverges on a
           -- ..500-nanos cumulative: measured 1e-6 flip at sf0.1)
           ((SUM(h) OVER (PARTITION BY seg ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             + 500) // 1000) / 1000000.0 AS na_hazard
    FROM atrisk
    """,
    doc="Nelson-Aalen cumulative hazard per market segment "
    "(operators/relational.py:nelson_aalen_hazard) on the SAME "
    "censored-duration frame as km_survival_segments (first->last "
    "order span, censored within 90 days of the horizon) — the "
    "additive companion curve: each d/n term quantizes to "
    "floor(1e9*d/n) BIGINT nanos via integer division and the curve "
    "is a cumulative BIGINT sum (the CUSUM discipline), so it is "
    "bit-exact cross-engine where KM's exp-sum-ln needed a "
    "zero-factor flag. Same reduced-frame plan as KM: one "
    "(segment, duration) aggregate + per-segment ordered windows",
)
def nelson_aalen_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import nelson_aalen_hazard

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    span = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    gmax = orders.agg(F.max("o_orderdate").alias("m"))
    subj = (
        span.join(customer, span["o_custkey"] == customer["c_custkey"])
        .crossJoin(F.broadcast(gmax))
        .select(
            F.col("c_mktsegment"),
            F.datediff("l", "f").cast("long").alias("t"),
            (F.datediff("m", "l") > 90).alias("obs"),
        )
    )
    return nelson_aalen_hazard(subj, ["c_mktsegment"], "t", "obs")


from .operators.series import NORMAL_QUANTILES as _NQ  # noqa: E402

_MDE_Z = _NQ[0.975] + _NQ[0.8]


@_q(
    "power_mde_events",
    f"""
    WITH x AS (
      SELECT event_type,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS xq
      FROM events WHERE value IS NOT NULL),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(xq::HUGEINT) AS s, SUM(xq::HUGEINT * xq) AS q
      FROM x GROUP BY 1),
    v AS (
      SELECT event_type, n,
             CAST(s AS DOUBLE) / n / 1000000.0 AS mean,
             CASE WHEN n > 1 THEN
               CAST(CAST(n::HUGEINT * q - s * s AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * (n - 1)) / 1000000000000.0
             END AS vr
      FROM m)
    SELECT event_type, n,
           ROUND(mean, 6) AS mean,
           ROUND(SQRT(vr), 6) AS std,
           ROUND({_MDE_Z!r} * SQRT(2.0 * vr / n), 6) AS mde_abs,
           ROUND(CASE WHEN mean <> 0 THEN
                   {_MDE_Z!r} * SQRT(2.0 * vr / n) / mean END, 6)
             AS mde_rel
    FROM v ORDER BY event_type
    """,
    doc="minimal detectable effect per event type at the current "
    "sample size (operators/series.py:power_mde): the "
    "experiment-PLANNING rung of the A/B family — Lehr-form "
    "MDE = (z_0.975 + z_0.8) * sqrt(2 s^2 / n) with the z quantiles "
    "injected as ONE published double literal into both engines "
    "(NORMAL_QUANTILES — no erf/ppf in any plan). Variance follows "
    "the burstiness discipline: micros BIGINT quantization, "
    "DECIMAL(38,0)/HUGEINT moments, the VARCHAR-bridge decimal->"
    "double crossing, identical double expressions. One "
    "map-side-combined aggregate",
)
def power_mde_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import power_mde

    ev = load_events(spark, sf_dir)
    return power_mde(ev, ["event_type"], "value")


@_q(
    "isoweek_rollup_orders",
    """
    SELECT CAST(isoyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_year,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS VARCHAR) AS DOUBLE), 2) AS revenue
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="ISO-8601 week rollup of orders (calendar parity next to "
    "sla_business_days' weekday arithmetic): the year-boundary trap "
    "the naive YEAR()+WEEK() rollup gets wrong — Dec 30 1996 is ISO "
    "week 1 of 1997, so grouping by calendar year splits that week "
    "across two rows. Spark extract(YEAROFWEEK)/weekofyear == DuckDB "
    "isoyear()/weekofyear() (both ISO), verified at the boundary "
    "dates. Revenue rides DECIMAL(18,2) with the VARCHAR bridge; one "
    "map-side-combined aggregate",
)
def isoweek_rollup_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.expr("extract(YEAROFWEEK FROM o_orderdate)")
            .cast("long")
            .alias("iso_year"),
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
        .orderBy("iso_year", "iso_week")
    )


@_q(
    "clustering_coeff_nations",
    """
    WITH raw AS MATERIALIZED (
      -- MATERIALIZED: E/und are referenced ~5x downstream (und twice,
      -- the wedge-closing join once more) — inlined, each reference
      -- re-runs the 4-way fact join (measured: 300s -> ~2s at sf0.1)
      SELECT DISTINCT c.c_nationkey AS x, s.s_nationkey AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey),
    E AS MATERIALIZED (
      SELECT DISTINCT LEAST(x, y) AS u, GREATEST(x, y) AS v
      FROM raw WHERE x <> y),
    und AS (
      SELECT u AS a, v AS b FROM E
      UNION ALL SELECT v AS a, u AS b FROM E),
    deg AS (
      SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM und GROUP BY 1),
    tri AS (
      SELECT w.node, CAST(COUNT(*) AS BIGINT) AS triangles
      FROM (
        SELECT u1.a AS node, u1.b AS x, u2.b AS y
        FROM und u1 JOIN und u2 ON u1.a = u2.a AND u1.b < u2.b) w
      JOIN E ON E.u = LEAST(w.x, w.y) AND E.v = GREATEST(w.x, w.y)
      GROUP BY 1),
    pern AS (
      SELECT d.node, d.degree, COALESCE(t.triangles, 0) AS triangles
      FROM deg d LEFT JOIN tri t ON t.node = d.node),
    gstats AS (
      SELECT ROUND(CAST(SUM(triangles) AS DOUBLE)
                   / CAST(SUM(degree * (degree - 1) // 2) AS DOUBLE), 6)
               AS transitivity
      FROM pern)
    SELECT node, degree, triangles,
           CASE WHEN degree >= 2 THEN
             ROUND(2.0 * triangles / (degree * (degree - 1)), 6)
           END AS clustering,
           transitivity
    FROM pern CROSS JOIN gstats ORDER BY node
    """,
    doc="local clustering coefficients + global transitivity of the "
    "nation trade graph (operators/graph.py:clustering_profile over "
    "triangle_counts): nations are linked when any customer bought "
    "from any supplier across the pair; per-node C = 2T/(d(d-1)) and "
    "the graph-level C = sum T_v / sum C(d_v,2) (== 3*triangles/"
    "wedges since each triangle counts at 3 corners). Spark runs the "
    "degree-ordered-orientation O(m^1.5) pipeline (hub-proof — "
    "SCALE_PROBE:triangle_hub_guard); the oracle re-derives the same "
    "counts by direct wedge self-join on the 25-node graph. Integer "
    "counts throughout; two double divisions, round-6",
)
def clustering_coeff_nations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import clustering_profile

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    edges = (
        o.join(c, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .select(
            F.col("c_nationkey").alias("x"), F.col("s_nationkey").alias("y")
        )
        .filter(F.col("x") != F.col("y"))
        .distinct()
    )
    return clustering_profile(edges, "x", "y")


@_q(
    "ratio_estimator_lineitem",
    """
    WITH marked AS (
      SELECT l_returnflag AS stratum,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS y,
             CAST(l_quantity AS DECIMAL(18,2)) AS x,
             ('0x' || substring(md5(l_orderkey || ':' || l_linenumber),
                                1, 15))::BIGINT % 1000 < 200 AS inc
      FROM lineitem),
    per AS (
      SELECT stratum,
             CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(SUM(CASE WHEN inc THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
             SUM(CASE WHEN inc THEN y END) AS sy,
             SUM(CASE WHEN inc THEN x END) AS sx,
             SUM(x) AS tx, SUM(y) AS ty
      FROM marked GROUP BY stratum),
    est AS (
      SELECT stratum, n_pop, n_sampled,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS rhat,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sx AS VARCHAR) AS DOUBLE)
               * CAST(CAST(tx AS VARCHAR) AS DOUBLE) AS ratio_est,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) * 1000.0 / 200
               AS expand_est,
             CAST(CAST(ty AS VARCHAR) AS DOUBLE) AS true_y
      FROM per)
    SELECT stratum, n_pop, n_sampled,
           ROUND(rhat, 6) AS r_hat,
           ROUND(ratio_est, 6) AS ratio_total,
           ROUND(expand_est, 6) AS expansion_total,
           ROUND(true_y, 6) AS true_total,
           ROUND((ratio_est - true_y) / true_y, 6) AS ratio_rel_err,
           ROUND((expand_est - true_y) / true_y, 6) AS expansion_rel_err
    FROM est ORDER BY stratum
    """,
    doc="stratified ratio estimator of lineitem revenue from a 20% "
    "deterministic md5 sample with exact quantity totals as the "
    "auxiliary (operators/relational.py:ratio_estimator_total) — the "
    "survey-sampling companion to ht_total_by_priority: when sum(x) "
    "is known exactly (catalog metadata), expanding the sample RATIO "
    "y/x by the true X beats plain 1/pi expansion wherever y "
    "correlates with x; both estimates + both relative errors ride "
    "the output so the win is auditable. Same md5_60 replayable "
    "sampling, exact decimal sums, VARCHAR-bridge crossings, one "
    "map-side-combined aggregate",
)
def ratio_estimator_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import ratio_estimator_total

    li = load(spark, sf_dir, "lineitem").withColumn(
        "__k",
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        ),
    )
    return ratio_estimator_total(
        li, "l_returnflag", "l_extendedprice", F.col("l_quantity"), "__k", 200
    )


@_q(
    "ldiversity_customer_release",
    f"""
    WITH rel AS (
      SELECT c.c_mktsegment,
             CAST(FLOOR(c.c_acctbal / 2000) AS BIGINT) AS bal_band,
             o.o_orderpriority AS s
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE o.o_orderpriority IS NOT NULL),
    gv AS (
      SELECT c_mktsegment, bal_band, s, CAST(COUNT(*) AS BIGINT) AS c
      FROM rel GROUP BY 1, 2, 3),
    grp AS (
      SELECT c_mktsegment, bal_band,
             CAST(SUM(c) AS BIGINT) AS ng,
             CAST(COUNT(*) AS BIGINT) AS dst,
             ln(CAST(SUM(c) AS BIGINT))
               - SUM(CAST(c AS DOUBLE) * ln(c)) / CAST(SUM(c) AS BIGINT)
               AS H
      FROM gv GROUP BY 1, 2),
    th(l, lnl) AS (VALUES (2, {__import__('math').log(2)!r}),
                          (3, {__import__('math').log(3)!r}),
                          (5, {__import__('math').log(5)!r}))
    SELECT CAST(l AS BIGINT) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN dst >= l THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_distinct_l,
           CAST(SUM(CASE WHEN H >= lnl THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_entropy_l,
           ROUND(SUM(CASE WHEN dst >= l THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS pct_distinct_l,
           ROUND(SUM(CASE WHEN H >= lnl THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS pct_entropy_l,
           MIN(dst) AS min_distinct,
           ROUND(EXP(MIN(H)), 6) AS min_entropy_l,
           MAX(CASE WHEN dst < l THEN ng END) AS largest_violating_group
    FROM grp CROSS JOIN th
    GROUP BY l ORDER BY l
    """,
    doc="l-diversity audit of the (mktsegment, balance-band) release "
    "against order priority (operators/privacy.py:l_diversity_report) "
    "— the missing rung between kanon_customer_release (group SIZE) "
    "and tcloseness_customer_release (distribution distance): "
    "distinct-l demands >= l sensitive values per QI class, "
    "entropy-l the stronger exp(H) >= l, compared exp-free as "
    "H >= ln(l) with ln(l) injected as identical Python double "
    "literals into both engines. Distinct counts are exact BIGINTs "
    "from one (QI, s) aggregate; entropy follows the entropy-family "
    "double discipline. One aggregate chain, one row per threshold",
)
def ldiversity_customer_release_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.privacy import l_diversity_report

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    rel = c.join(o, o["o_custkey"] == c["c_custkey"], "left").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
        "o_orderpriority",
    )
    return l_diversity_report(
        rel, ["c_mktsegment", "bal_band"], "o_orderpriority", (2, 3, 5)
    )


@_q(
    "kendall_tau_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS yv
      FROM events GROUP BY 1, 2),
    q AS (
      -- x/yv are already BIGINTs: tau depends only on orderings, so
      -- the operator's integral lane (advisor r9 #4) skips the *1e6
      -- re-quantization — a no-op on C/D/ties that would otherwise
      -- overflow BIGINT on large daily value masses
      SELECT event_type, x AS xq, yv AS yq,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY x, yv) AS i
      FROM daily),
    cd AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN (a.xq - b.xq)::HUGEINT * (a.yq - b.yq) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS C,
             CAST(SUM(CASE WHEN (a.xq - b.xq)::HUGEINT * (a.yq - b.yq) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS D
      FROM q a JOIN q b ON a.event_type = b.event_type AND a.i < b.i
      GROUP BY 1),
    t1 AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n1,
             CAST(SUM(t) AS BIGINT) AS n
      FROM (SELECT event_type, xq, CAST(COUNT(*) AS BIGINT) AS t
            FROM q GROUP BY 1, 2) GROUP BY 1),
    t2 AS (
      SELECT event_type, CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n2
      FROM (SELECT event_type, yq, CAST(COUNT(*) AS BIGINT) AS t
            FROM q GROUP BY 1, 2) GROUP BY 1)
    SELECT t1.event_type, t1.n,
           COALESCE(cd.C, 0) AS concordant,
           COALESCE(cd.D, 0) AS discordant,
           CASE WHEN (n * (n - 1) // 2) > n1
                 AND (n * (n - 1) // 2) > n2 THEN
             ROUND((cd.C - cd.D)
                   / (SQRT(CAST((n * (n - 1) // 2) - n1 AS DOUBLE))
                      * SQRT(CAST((n * (n - 1) // 2) - n2 AS DOUBLE))), 6)
           END AS tau_b
    FROM t1 JOIN t2 USING (event_type)
    LEFT JOIN cd USING (event_type)
    WHERE t1.n >= 2
    ORDER BY t1.event_type
    """,
    doc="Kendall tau-b between daily event count and daily value mass "
    "per event type (operators/series.py:kendall_tau) — the "
    "pair-concordance companion to spearman_value_items: counts HOW "
    "OFTEN busier days are higher-value days, with exact tie "
    "correction. Daily value mass is an exact micros BIGINT sum; "
    "both inputs are integral so the operator's integral lane uses "
    "them as-is (tau is ordering-only — re-quantization was the "
    "advisor-r9 overflow hazard), pair "
    "signs are DECIMAL(38,0)/HUGEINT products of BIGINT differences "
    "(a double product's sign can flip on cancellation), and the "
    "sqrt factors split before multiplying. pairs='auto' rides the "
    "join lane here (groups = days-per-type, far under the "
    "scale_lanes.PAIR_LANE_MAX_GROUP_ROWS cut); the Knight "
    "O(n log n) inversion lane takes over on oversized groups",
)
def kendall_tau_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import kendall_tau

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").cast("long").alias("x"),
        F.sum(
            F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("yv"),
    )
    return kendall_tau(daily, ["event_type"], "x", "yv")


@_q(
    "calibration_brier_events",
    """
    WITH base AS (
      SELECT CAST(FLOOR(LEAST(value / 500.0, 1.0) * 1000000 + 0.5)
                  AS BIGINT) AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL),
    binned AS (
      SELECT LEAST((p * 20) // 1000000, 19) AS bin, p, y,
             (p - y * 1000000)::HUGEINT * (p - y * 1000000) AS e2
      FROM base),
    g AS (
      SELECT ROUND(CAST(CAST(SUM(e2) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) / 1000000000000.0, 6) AS brier
      FROM binned),
    b AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(p::HUGEINT) AS sp, CAST(SUM(y) AS BIGINT) AS sy
      FROM binned GROUP BY 1)
    SELECT CAST(bin AS BIGINT) AS bin,
           ROUND(bin / 20.0, 6) AS bin_lo, n,
           ROUND(CAST(sp AS DOUBLE) / n / 1000000.0, 6) AS mean_predicted,
           ROUND(sy / CAST(n AS DOUBLE), 6) AS observed_rate,
           ROUND(sy / CAST(n AS DOUBLE)
                 - CAST(sp AS DOUBLE) / n / 1000000.0, 6) AS gap,
           brier
    FROM b CROSS JOIN g ORDER BY bin
    """,
    doc="reliability diagram + Brier score for the 'value predicts a "
    "purchase' score (operators/classify.py:calibration_report): "
    "p = min(value/500, 1) against the binary purchase outcome, 20 "
    "FIXED-WIDTH bins (no global rank anywhere — deliberately not "
    "the decile form), per-bin predicted-vs-observed gap, and the "
    "global Brier proper score on every row via a 1-row broadcast. "
    "Scores quantize to micros BIGINTs, bin ids come from integer "
    "division of the micros (never a double floor), squared errors "
    "accumulate DECIMAL(38,0)/HUGEINT with the VARCHAR bridge. Two "
    "map-side-combined aggregates",
)
def calibration_brier_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import calibration_report

    ev = load_events(spark, sf_dir)
    scored = ev.select(
        F.least(F.col("value") / 500.0, F.lit(1.0)).alias("p"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return calibration_report(scored, "p", "y", n_bins=20)


@_q(
    "jsd_source_docs",
    """
    WITH toks AS (
      SELECT source,
             unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               ' ')) AS tok
      FROM documents),
    counts AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2),
    totals AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS N,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM counts GROUP BY 1),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS shared_vocab,
             SUM(CAST(a.c AS DOUBLE) / ta.N
                 * ln(2.0 * (CAST(a.c AS DOUBLE) / ta.N)
                      / (CAST(a.c AS DOUBLE) / ta.N
                         + CAST(b.c AS DOUBLE) / tb.N))
                 + CAST(b.c AS DOUBLE) / tb.N
                 * ln(2.0 * (CAST(b.c AS DOUBLE) / tb.N)
                      / (CAST(a.c AS DOUBLE) / ta.N
                         + CAST(b.c AS DOUBLE) / tb.N))) AS sh,
             CAST(SUM(a.c) AS BIGINT) AS sca,
             CAST(SUM(b.c) AS BIGINT) AS scb
      FROM counts a
      JOIN counts b ON a.tok = b.tok AND a.source < b.source
      JOIN totals ta ON ta.source = a.source
      JOIN totals tb ON tb.source = b.source
      GROUP BY 1, 2),
    pairs AS (
      -- every unordered pair seated from totals; zero-shared-vocab
      -- pairs get empty sums and the identity collapses to jsd = ln 2
      -- exactly (the operator's absence contract, advisor r9 #5)
      SELECT ta.source AS source_a, tb.source AS source_b,
             ta.vocab AS vocab_a, tb.vocab AS vocab_b,
             COALESCE(s.shared_vocab, 0) AS shared_vocab,
             COALESCE(s.sh, 0.0) AS sh,
             COALESCE(s.sca, 0) AS sca, COALESCE(s.scb, 0) AS scb,
             ta.N AS na, tb.N AS nb
      FROM totals ta
      JOIN totals tb ON ta.source < tb.source
      LEFT JOIN shared s
        ON s.source_a = ta.source AND s.source_b = tb.source)
    SELECT source_a, source_b, vocab_a, vocab_b,
           CAST(shared_vocab AS BIGINT) AS shared_vocab,
           ROUND(0.5 * (sh + 0.6931471805599453
                 * (2.0 - CAST(sca AS DOUBLE) / na
                        - CAST(scb AS DOUBLE) / nb)), 6) AS jsd_nats,
           ROUND(0.5 * (sh + 0.6931471805599453
                 * (2.0 - CAST(sca AS DOUBLE) / na
                        - CAST(scb AS DOUBLE) / nb))
                 / 0.6931471805599453, 6) AS jsd_norm
    FROM pairs ORDER BY source_a, source_b
    """,
    doc="pairwise Jensen-Shannon divergence between sources' token "
    "distributions (operators/text.py:jsd_source_divergence) — the "
    "symmetric bounded corpus-mixture distance next to the "
    "one-vs-rest KL readouts. Shuffle-light identity: "
    "disjoint-vocabulary mass contributes exactly ln2*(1 - "
    "sum_shared p), and sum_shared p rides EXACT integer count sums, "
    "so the pair join is an INNER join on the shared vocabulary only "
    "(never full-outer/dense); only the log terms are float "
    "(entropy-family discipline, ulps die at round-6; ln2 injected "
    "as the same literal into both engines). One token aggregate + "
    "one vocab self-join + one map-side-combined pair rollup",
)
def jsd_source_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import jsd_source_divergence

    docs = load(spark, sf_dir, "documents")
    return jsd_source_divergence(docs, "source", "text")


def _mmr_oracle(k: int = 10, pool: int = 50) -> str:
    """Unrolled greedy-MMR replay in DuckDB SQL (the ppr/pagerank
    unrolled-CTE discipline: a sequential algorithm becomes k chained
    CTEs). Step 1 is pure relevance; step i scores every remaining
    pool row as 0.7*rel - (1.0 - 0.7)*max(sim to selected) — the
    literals written EXACTLY as the operator computes them — and
    picks the (score DESC, id) argmax."""
    parts = [
        # MATERIALIZED: the unrolled steps reference pool/sims ~2k
        # times; without it DuckDB inlines the parquet scan per
        # reference and exhausts file descriptors (measured: "Too
        # many open files" at k=10)
        "WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v"
        " FROM embeddings),",
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0),",
        "scored AS (SELECT e.vec_id AS id, e.v,"
        " ROUND(list_cosine_similarity(e.v, q.qv), 6) AS rel"
        " FROM e CROSS JOIN q WHERE e.vec_id <> 0),",
        f"pool AS MATERIALIZED (SELECT id, v, rel FROM scored"
        f" ORDER BY rel DESC, id LIMIT {pool}),",
        "sims AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib,"
        " ROUND(list_cosine_similarity(a.v, b.v), 6) AS s"
        " FROM pool a JOIN pool b ON a.id < b.id),",
        "simsym AS MATERIALIZED (SELECT ia AS i, ib AS j, s FROM sims"
        " UNION ALL SELECT ib AS i, ia AS j, s FROM sims),",
        "s1 AS MATERIALIZED (SELECT id, rel, 0.7 * rel AS score"
        " FROM pool ORDER BY 0.7 * rel DESC, id LIMIT 1),",
        "sel1 AS MATERIALIZED (SELECT id, rel, score, 1 AS rank"
        " FROM s1),",
    ]
    for i in range(2, k + 1):
        prev = f"sel{i - 1}"
        # every step MATERIALIZED (sel_i references sel_(i-1) twice,
        # so inlined CTEs expand the tree ~3^k-fold — measured k=10
        # planner hang), and the max-sim term is a plain join +
        # GROUP BY over the symmetric sims frame (a correlated scalar
        # MAX subquery was measured minutes-slow even materialized)
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT p.id, p.rel,"
            f" 0.7 * p.rel - (1.0 - 0.7) * MAX(ss.s) AS score"
            f" FROM pool p JOIN simsym ss ON ss.i = p.id"
            f" JOIN {prev} t ON t.id = ss.j"
            f" WHERE p.id NOT IN (SELECT id FROM {prev})"
            f" GROUP BY p.id, p.rel"
            f" ORDER BY score DESC, p.id LIMIT 1),"
        )
        parts.append(
            f"sel{i} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL"
            f" SELECT id, rel, score, {i} AS rank FROM s{i}),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id,"
        f" rel AS relevance, ROUND(score, 6) AS mmr_score"
        f" FROM sel{k} ORDER BY rank"
    )
    return "\n".join(parts)


@_q(
    "mmr_rerank_embeddings",
    _mmr_oracle(k=10, pool=50),
    doc="Maximal Marginal Relevance re-ranking of the vec_id=0 query "
    "over the embedding corpus (operators/retrieval.py:mmr_rerank, "
    "Carbonell & Goldstein 1998): cosine top-50 candidate pool cut "
    "by TakeOrderedAndProject (the corpus-sized stage), then the "
    "greedy lam*rel - (1-lam)*max-sim-to-selected selection of k=10 "
    "— relevance/pair sims ROUND to 6 before any comparison "
    "(similarity_topk's convention) with ascending-id tiebreaks, so "
    "the inherently sequential greedy is engine-exact: the oracle "
    "replays it as 10 unrolled argmax CTEs (the ppr unrolled-replay "
    "discipline). Spark collects only the pool + its C(50,2) sims "
    "(the retrieval-family bounded-collect contract)",
)
def mmr_rerank_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import mmr_rerank

    emb = load(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    ]
    return mmr_rerank(
        emb.filter(F.col("vec_id") != 0),
        "vec_id",
        "embedding",
        qv,
        k=10,
        pool=50,
        lam=0.7,
    )


@_q(
    "winsorized_orders",
    """
    WITH vals AS (
      SELECT o_orderpriority AS g,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v
      FROM orders WHERE o_totalprice IS NOT NULL),
    dist AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM vals GROUP BY 1, 2),
    run AS (
      SELECT g, v,
             SUM(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(c) OVER (PARTITION BY g) AS n
      FROM dist),
    lo AS (
      SELECT g, MIN(v) AS blo FROM run
      WHERE cum >= CEIL(n * 10 / 100.0) GROUP BY g),
    hi AS (
      SELECT g, MIN(v) AS bhi FROM run
      WHERE cum >= CEIL(n * 90 / 100.0) GROUP BY g),
    clamped AS (
      SELECT vals.g, GREATEST(LEAST(v, bhi), blo) AS w, blo, bhi
      FROM vals JOIN lo ON lo.g = vals.g JOIN hi ON hi.g = vals.g),
    m AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             MIN(blo) AS blo, MIN(bhi) AS bhi,
             SUM(CAST(w AS DECIMAL(38,2))) AS s,
             SUM(CAST(w * w AS DECIMAL(38,4))) AS q
      FROM clamped GROUP BY g)
    SELECT g AS o_orderpriority, n,
           ROUND(CAST(blo AS DOUBLE), 2) AS lower_bound,
           ROUND(CAST(bhi AS DOUBLE), 2) AS upper_bound,
           ROUND(CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS winsorized_mean,
           CASE WHEN n > 1 THEN
             ROUND(SQRT((CAST(n AS DOUBLE)
                         * CAST(CAST(q AS VARCHAR) AS DOUBLE)
                         - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                           * CAST(CAST(s AS VARCHAR) AS DOUBLE))
                        / (CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) - 1))), 6)
           END AS winsorized_std
    FROM m ORDER BY o_orderpriority
    """,
    doc="winsorized mean/std of order value per priority "
    "(operators/relational.py:winsorized_stats): p10/p90 clamping — "
    "the robust-moments companion to trimmed_mean_order_value "
    "(trimming drops the tails and shrinks n; winsorizing caps their "
    "leverage and keeps every vote). Nearest-rank boundaries come "
    "from a running-count crossing over the (group, DISTINCT value) "
    "frame — the weighted_price_quartiles discipline, value-"
    "cardinality-sized windows, never a group sort; cents-exact "
    "DECIMAL moments with VARCHAR-bridge crossings; sample std from "
    "one double expression",
)
def winsorized_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import winsorized_stats

    orders = load(spark, sf_dir, "orders")
    return winsorized_stats(
        orders, ["o_orderpriority"], "o_totalprice", 10, 90
    )


# ---------------------------------------------------------------------------
# Round-10 wave: trend/survival/quasi-experimental inference (Mann-Kendall,
# log-rank, diff-in-diff), agreement & ranking eval (Cohen's kappa, RBO,
# pinball loss), distribution drift (Hellinger/Bhattacharyya, Cramér-von
# Mises), structural DQ (format masks, cent-digit uniformity), and corpus
# growth/diversity (Heaps' law, MATTR).


@_q(
    "mann_kendall_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2),
    q AS (SELECT event_type,
                 CAST(day - DATE '1970-01-01' AS BIGINT) AS t, v
          FROM daily),
    cd AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN (a.t - b.t)::HUGEINT * (a.v - b.v) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN (a.t - b.t)::HUGEINT * (a.v - b.v) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM q a JOIN q b ON a.event_type = b.event_type AND a.t < b.t
      GROUP BY 1),
    vt AS (
      SELECT event_type,
             SUM(tc::HUGEINT * (tc - 1) * (2 * tc + 5)) AS tv,
             CAST(SUM(tc) AS BIGINT) AS n
      FROM (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS tc
            FROM q GROUP BY 1, 2) GROUP BY 1),
    m AS (
      SELECT vt.event_type, n,
             CAST(COALESCE(c, 0) - COALESCE(d, 0) AS BIGINT) AS s_stat,
             ROUND(CAST(CAST(n::HUGEINT * (n - 1) * (2 * n + 5) - tv
                             AS VARCHAR) AS DOUBLE) / 18.0, 6) AS var_s
      FROM vt LEFT JOIN cd USING (event_type) WHERE n >= 2),
    z AS (
      SELECT *, CASE WHEN var_s > 0 THEN
          ROUND(CASE WHEN s_stat > 0 THEN (s_stat - 1) / SQRT(var_s)
                     WHEN s_stat < 0 THEN (s_stat + 1) / SQRT(var_s)
                     ELSE 0.0 END, 6) END AS z
      FROM m)
    SELECT event_type, n, s_stat, var_s, z,
           CASE WHEN z IS NULL THEN NULL
                WHEN z > 1.959963984540054 THEN 'increasing'
                WHEN z < -1.959963984540054 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM z ORDER BY event_type
    """,
    doc="Mann-Kendall monotonic-trend test on daily event counts per "
    "type (operators/series.py:mann_kendall_trend): S = sum of pair "
    "signs over time (= kendall's C - D with x = time, so the "
    "operator REUSES the kendall pair machinery and inherits both the "
    "join lane and the Knight O(n log n) lane + the shared "
    "PAIR_LANE_MAX_GROUP_ROWS guard), tie-corrected Var(S) in "
    "DECIMAL(38,0)/HUGEINT, continuity-corrected z from the ROUNDED "
    "variance, and the 5% two-sided trend call against the injected "
    "NORMAL_QUANTILES literal",
)
def mann_kendall_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import mann_kendall_trend

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("v"))
    daily = daily.select(
        "event_type",
        F.datediff("day", F.lit("1970-01-01")).cast("long").alias("t"),
        "v",
    )
    return mann_kendall_trend(daily, ["event_type"], "t", "v")


@_q(
    "logrank_segments",
    """
    WITH span AS (
      SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
      FROM orders GROUP BY 1),
    g AS (SELECT MAX(o_orderdate) AS m FROM orders),
    subj AS (
      SELECT c.c_mktsegment AS seg,
             CAST(CAST(span.l AS DATE) - CAST(span.f AS DATE)
                  AS BIGINT) AS t,
             (CAST(g.m AS DATE) - CAST(span.l AS DATE)) > 90 AS obs
      FROM span JOIN customer c ON c.c_custkey = span.o_custkey
      CROSS JOIN g
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
    per_t AS (
      SELECT t,
             CAST(SUM(CASE WHEN seg = 'BUILDING' AND obs
                           THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN seg <> 'BUILDING' AND obs
                           THEN 1 ELSE 0 END) AS BIGINT) AS d2,
             CAST(SUM(CASE WHEN seg = 'BUILDING'
                           THEN 1 ELSE 0 END) AS BIGINT) AS l1,
             CAST(SUM(CASE WHEN seg <> 'BUILDING'
                           THEN 1 ELSE 0 END) AS BIGINT) AS l2
      FROM subj GROUP BY 1),
    c2 AS (
      SELECT *, SUM(l1) OVER () AS na, SUM(l2) OVER () AS nb,
             SUM(l1) OVER ()
               - COALESCE(SUM(l1) OVER (ORDER BY t ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
             SUM(l2) OVER ()
               - COALESCE(SUM(l2) OVER (ORDER BY t ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
      FROM per_t),
    terms AS (
      SELECT na, nb, d1, d2,
             (d1 + d2) * (n1 / (n1 + n2)) AS e1,
             CASE WHEN n1 + n2 > 1 THEN
               (d1 + d2) * (n1 / (n1 + n2)) * (1 - n1 / (n1 + n2))
               * ((n1 + n2) - (d1 + d2)) / ((n1 + n2) - 1)
             ELSE 0.0 END AS v
      FROM c2)
    SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(SUM(d1) AS BIGINT) AS events_a,
           CAST(SUM(d2) AS BIGINT) AS events_b,
           ROUND(SUM(e1), 6) AS expected_a,
           ROUND(CASE WHEN SUM(v) > 0 THEN
             SUM(d1 - e1) * SUM(d1 - e1) / SUM(v) END, 6) AS chi2
    FROM terms
    """,
    doc="two-sample log-rank test between the BUILDING and MACHINERY "
    "customer-lifetime curves (operators/relational.py:logrank_test) "
    "— the inference rung over the same subjects km_survival_segments "
    "draws: hypergeometric expected events and variance at each "
    "distinct pooled event time, censored subjects at risk exactly as "
    "long as observed, chi2 = (O-E)^2/V with 1 df. At-risk series "
    "ride cumulative windows over the REDUCED distinct-duration "
    "frame; every count is an exact BIGINT off one (side, duration) "
    "aggregate",
)
def logrank_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import logrank_test

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    span = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    gmax = orders.agg(F.max("o_orderdate").alias("m"))
    subj = (
        span.join(customer, span["o_custkey"] == customer["c_custkey"])
        .crossJoin(F.broadcast(gmax))
        .select(
            F.col("c_mktsegment"),
            F.datediff("l", "f").cast("long").alias("t"),
            (F.datediff("m", "l") > 90).alias("obs"),
        )
    )
    return logrank_test(
        subj, [], "t", "obs", "c_mktsegment", "BUILDING", "MACHINERY"
    )


@_q(
    "kappa_rule_events",
    """
    WITH rated AS (
      SELECT event_type,
             CASE WHEN value < 25 THEN 'low'
                  WHEN value < 75 THEN 'mid' ELSE 'high' END AS a,
             CASE WHEN hour(ts) < 8 THEN 'low'
                  WHEN hour(ts) < 16 THEN 'mid' ELSE 'high' END AS b
      FROM events WHERE value IS NOT NULL),
    cells AS (SELECT event_type, a, b, CAST(COUNT(*) AS BIGINT) AS c
              FROM rated GROUP BY 1, 2, 3),
    rws AS (SELECT event_type, a, CAST(SUM(c) AS BIGINT) AS r
            FROM cells GROUP BY 1, 2),
    cls AS (SELECT event_type, b AS a, CAST(SUM(c) AS BIGINT) AS cl
            FROM cells GROUP BY 1, 2),
    crs AS (SELECT rws.event_type,
                   SUM(r::HUGEINT * cl) AS rc
            FROM rws JOIN cls USING (event_type, a) GROUP BY 1),
    dg AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS diag
           FROM cells WHERE a = b GROUP BY 1),
    tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
            FROM cells GROUP BY 1),
    j AS (
      SELECT tot.event_type, n,
             COALESCE(diag, 0) AS diag,
             COALESCE(rc, 0) AS rc
      FROM tot LEFT JOIN dg USING (event_type)
      LEFT JOIN crs USING (event_type)),
    k AS (
      SELECT event_type, n,
             diag / CAST(n AS DOUBLE) AS po,
             CAST(CAST(rc AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * n) AS pe
      FROM j)
    SELECT event_type, n,
           ROUND(po, 6) AS observed_agreement,
           ROUND(pe, 6) AS expected_agreement,
           ROUND(CASE WHEN pe < 1 THEN (po - pe) / (1 - pe) END, 6)
             AS kappa
    FROM k ORDER BY event_type
    """,
    doc="Cohen's kappa between the value band (fixed 25/75 cuts) and "
    "the time-of-day band per event type "
    "(operators/classify.py:cohens_kappa): chance-corrected agreement "
    "— raw accuracy is inflated by whatever both labelings predict "
    "most, kappa subtracts the marginal-product luck. One (group, a, "
    "b) cell aggregate; marginals re-aggregate the label-cardinality "
    "cell frame; the p_e cross-moment rides DECIMAL(38,0)/HUGEINT "
    "(row*col reaches n^2)",
)
def kappa_rule_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import cohens_kappa

    ev = load_events(spark, sf_dir)
    rated = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.when(F.col("value") < 25, "low")
        .when(F.col("value") < 75, "mid")
        .otherwise("high")
        .alias("value_band"),
        F.when(F.hour("ts") < 8, "low")
        .when(F.hour("ts") < 16, "mid")
        .otherwise("high")
        .alias("time_band"),
    )
    return cohens_kappa(rated, ["event_type"], "value_band", "time_band")


def _rbo_day_rankings_oracle() -> str:
    """RBO oracle with the SAME suffix-weight literals the operator
    injects (rbo_suffix_weights — no pow() in either plan). The
    literals are CAST to DOUBLE explicitly: DuckDB parses a bare
    decimal literal as DECIMAL, whose exact-decimal sum can differ
    from Spark's double sum in the 6th decimal AND whose str() canon
    keeps trailing zeros ('0.493280' vs the float's '0.49328') —
    measured as the one sf0.1 hash mismatch of round 10."""
    from .operators.retrieval import rbo_suffix_weights

    w = rbo_suffix_weights(0.9, 20)
    weights = (
        "CAST(["
        + ", ".join(repr(x) for x in w)
        + "] AS DOUBLE[])"
    )
    one_minus_p = f"CAST({1.0 - 0.9!r} AS DOUBLE)"
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS mass
      FROM events GROUP BY 1, 2),
    ra AS (
      SELECT event_type, day, rk FROM (
        SELECT event_type, day,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, day) AS rk
        FROM daily) WHERE rk <= 20),
    rb AS (
      SELECT event_type, day, rk FROM (
        SELECT event_type, day,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY mass DESC, day) AS rk
        FROM daily) WHERE rk <= 20),
    shared AS (
      SELECT ra.event_type,
             CAST(COUNT(*) AS BIGINT) AS overlap_k,
             SUM(list_extract({weights},
                 CAST(GREATEST(ra.rk, rb.rk) AS INTEGER))) AS s
      FROM ra JOIN rb ON ra.event_type = rb.event_type
                     AND ra.day = rb.day
      GROUP BY 1),
    ta AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_a
           FROM ra GROUP BY 1),
    tb AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_b
           FROM rb GROUP BY 1)
    SELECT ta.event_type, n_a, n_b,
           COALESCE(overlap_k, 0) AS overlap_k,
           ROUND({one_minus_p} * COALESCE(s, 0.0), 6) AS rbo
    FROM ta JOIN tb USING (event_type)
    LEFT JOIN shared USING (event_type)
    ORDER BY event_type
    """


@_q(
    "rbo_day_rankings",
    _rbo_day_rankings_oracle(),
    doc="Rank-Biased Overlap (Webber/Moffat/Zobel, p=0.9, depth 20) "
    "between each event type's busiest-days ranking (by count) and "
    "its highest-value-days ranking (by micros mass) — "
    "operators/retrieval.py:rbo_overlap. Per shared item the "
    "contribution is the suffix weight W[max(ra, rb)], computed "
    "driver-side and injected as IDENTICAL double literals into both "
    "engines (the NORMAL_QUANTILES discipline — no pow() in any "
    "plan); truncated lower-bound form, zero-overlap groups seated "
    "with rbo = 0 from the per-side totals (the jsd absence "
    "contract)",
)
def rbo_day_rankings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.retrieval import rbo_overlap

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
        ).cast("long").alias("mass"),
    )
    wa = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("day"))
    wb = Window.partitionBy("event_type").orderBy(
        F.desc("mass"), F.asc("day")
    )
    a = (
        daily.withColumn("rank", F.row_number().over(wa))
        .filter(F.col("rank") <= 20)
        .select("event_type", "day", "rank")
    )
    b = (
        daily.withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= 20)
        .select("event_type", "day", "rank")
    )
    return rbo_overlap(a, b, ["event_type"], "day", "rank", p=0.9, k=20)


@_q(
    "hellinger_value_drift",
    """
    WITH ref AS (
      SELECT event_type,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
               // 25000000 AS bin,
             CAST(COUNT(*) AS BIGINT) AS cr
      FROM events
      WHERE value IS NOT NULL AND value >= 0
        AND ts < TIMESTAMP '2024-01-16'
      GROUP BY 1, 2),
    cur AS (
      SELECT event_type,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
               // 25000000 AS bin,
             CAST(COUNT(*) AS BIGINT) AS cc
      FROM events
      WHERE value IS NOT NULL AND value >= 0
        AND ts >= TIMESTAMP '2024-01-16'
      GROUP BY 1, 2),
    tr AS (SELECT event_type, CAST(SUM(cr) AS BIGINT) AS n_ref
           FROM ref GROUP BY 1),
    tc AS (SELECT event_type, CAST(SUM(cc) AS BIGINT) AS n_cur
           FROM cur GROUP BY 1),
    sh AS (
      SELECT ref.event_type,
             SUM(SQRT(CAST(cr AS DOUBLE) * cc)) AS s
      FROM ref JOIN cur USING (event_type, bin) GROUP BY 1),
    j AS (
      SELECT tr.event_type, n_ref, n_cur,
             COALESCE(s / SQRT(CAST(n_ref AS DOUBLE) * n_cur), 0.0)
               AS bc
      FROM tr JOIN tc USING (event_type)
      LEFT JOIN sh USING (event_type))
    SELECT event_type, n_ref, n_cur,
           ROUND(bc, 6) AS bc,
           ROUND(SQRT(GREATEST(0.0, 1 - bc)), 6) AS hellinger,
           ROUND(CASE WHEN bc > 0 THEN -LN(bc) END, 6) AS bhattacharyya
    FROM j ORDER BY event_type
    """,
    doc="Hellinger/Bhattacharyya drift of the event-value distribution "
    "across the mid-month cutover, per event type "
    "(operators/curation.py:hellinger_drift) — the bounded METRIC "
    "companion to psi_value_drift: true distance in [0,1], no epsilon "
    "floor (disjoint support scores exactly 1). Fixed-width 25-unit "
    "bins on the micros integers (the calibration grid discipline); "
    "BC rides the shared-support INNER join only (zero-count terms "
    "vanish — the jsd identity); counts exact BIGINTs, sqrt terms "
    "summed then round-6",
)
def hellinger_value_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import hellinger_drift

    ev = load_events(spark, sf_dir)
    cutoff = F.lit("2024-01-16").cast("timestamp")
    return hellinger_drift(
        ev.filter(F.col("ts") < cutoff),
        ev.filter(F.col("ts") >= cutoff),
        "value",
        ["event_type"],
        bin_width=25.0,
    )


@_q(
    "cvm_value_drift",
    """
    WITH base AS (
      SELECT CAST(isodow(ts) - 1 AS BIGINT) AS wd, value AS v,
             (event_type = 'click') AS isa
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
    per_v AS (
      SELECT wd, v,
             SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS cb
      FROM base GROUP BY wd, v),
    c AS (
      SELECT wd, v, ca, cb,
             SUM(ca) OVER w AS cca, SUM(cb) OVER w AS ccb,
             SUM(ca) OVER g AS na, SUM(cb) OVER g AS nb
      FROM per_v
      WINDOW w AS (PARTITION BY wd ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             g AS (PARTITION BY wd)),
    t AS (
      SELECT wd, na, nb,
             CAST(ca + cb AS DOUBLE)
               * (CAST(cca AS DOUBLE) / na - CAST(ccb AS DOUBLE) / nb)
               * (CAST(cca AS DOUBLE) / na - CAST(ccb AS DOUBLE) / nb)
               AS term
      FROM c WHERE na > 0 AND nb > 0)
    SELECT wd AS weekday, CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           ROUND(SUM(term)
                 * (CAST(MAX(na) AS DOUBLE) * MAX(nb)
                    / ((MAX(na) + MAX(nb)) * (MAX(na) + MAX(nb)))),
                 6) AS cvm
    FROM t GROUP BY wd ORDER BY wd
    """,
    doc="exact two-sample Cramér-von Mises drift per weekday, click "
    "vs view values (operators/relational.py:cvm_two_sample) — the "
    "whole-distribution companion to ks_value_drift over the SAME "
    "framing: KS reads the single worst ECDF gap, CvM integrates the "
    "squared gap over every pooled observation, so many-small-shifts "
    "drift scores where KS barely moves. Identical machinery: "
    "cumulative INTEGER counts over the distinct pooled values, "
    "windows value-cardinality-sized, gap^2 terms summed then round-6",
)
def cvm_value_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import cvm_two_sample

    ev = load_events(spark, sf_dir)
    base = ev.select(
        F.weekday("ts").cast("long").alias("weekday"),
        "value",
        "event_type",
    )
    return cvm_two_sample(
        base, ["weekday"], "value", "event_type", "click", "view"
    )


@_q(
    "heaps_law_docs",
    """
    WITH tp AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                 ' ')) AS tok
        FROM documents)
      WHERE tok <> ''),
    b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM tp),
    firsts AS (SELECT tok, MIN(doc_id) AS fd FROM tp GROUP BY 1),
    vcp AS (
      SELECT CASE WHEN hi = lo THEN 10
                  ELSE GREATEST(1, LEAST(10,
                    CAST(CEIL(((fd - lo) * 10) / (hi - lo))
                         AS BIGINT))) END AS cp,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM firsts CROSS JOIN b GROUP BY 1),
    ncp AS (
      SELECT CASE WHEN hi = lo THEN 10
                  ELSE GREATEST(1, LEAST(10,
                    CAST(CEIL(((doc_id - lo) * 10) / (hi - lo))
                         AS BIGINT))) END AS cp,
             CAST(SUM(nt) AS BIGINT) AS n
      FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt
            FROM tp GROUP BY 1) CROSS JOIN b
      GROUP BY 1),
    grid AS (
      SELECT gs.cp,
             CASE WHEN hi = lo THEN hi
                  ELSE lo + CAST(FLOOR((gs.cp * (hi - lo)) / 10)
                                 AS BIGINT) END AS id_hi
      FROM (SELECT unnest(range(1, 11)) AS cp) gs CROSS JOIN b),
    curve AS (
      SELECT g.cp, g.id_hi,
             SUM(COALESCE(v, 0)) OVER (ORDER BY g.cp) AS vocab_cum,
             SUM(COALESCE(n, 0)) OVER (ORDER BY g.cp) AS n_tokens_cum
      FROM grid g LEFT JOIN vcp USING (cp) LEFT JOIN ncp USING (cp)),
    cnz AS (SELECT * FROM curve WHERE n_tokens_cum > 0),
    fit AS (
      SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM (SELECT LN(CAST(n_tokens_cum AS DOUBLE)) AS x,
                   LN(CAST(vocab_cum AS DOUBLE)) AS y FROM cnz)),
    f2 AS (
      SELECT CASE WHEN k * sxx - sx * sx > 0
                  THEN (k * sxy - sx * sy) / (k * sxx - sx * sx)
             END AS beta, k, sx, sy
      FROM fit)
    SELECT CAST(cp AS BIGINT) AS checkpoint,
           CAST(id_hi AS BIGINT) AS id_hi,
           CAST(n_tokens_cum AS BIGINT) AS n_tokens_cum,
           CAST(vocab_cum AS BIGINT) AS vocab_cum,
           ROUND(beta, 6) AS heaps_beta,
           ROUND(EXP((sy - beta * sx) / k), 6) AS heaps_k
    FROM cnz CROSS JOIN f2 ORDER BY 1
    """,
    doc="Heaps'-law vocabulary-growth curve over the documents corpus "
    "(operators/text.py:heaps_law, 10 checkpoints): V = k*N^beta "
    "fitted in ln-space by OLS over the checkpoint frame. NO global "
    "ordered scan — the doc-id range splits into equal-width cuts by "
    "exact integer arithmetic off one min/max aggregate, each token's "
    "FIRST-occurrence doc and each doc's token count bucket by pure "
    "column arithmetic (ceil/floor spelled identically both engines — "
    "a bare long cast would round in one engine and truncate in the "
    "other), cumulative sums ride the K-row grid. The tokenizer-"
    "sizing / synthetic-text readout next to zipf_vocab_fit",
)
def heaps_law_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import heaps_law

    docs = load(spark, sf_dir, "documents")
    return heaps_law(docs, "doc_id", "text", checkpoints=10)


@_q(
    "mask_profile_customers",
    """
    WITH m AS (
      SELECT c_mktsegment,
             CASE WHEN c_name IS NULL THEN '∅'
                  ELSE regexp_replace(regexp_replace(regexp_replace(
                         c_name, '[0-9]', '9', 'g'),
                         '[a-z]', 'a', 'g'),
                         '[A-Z]', 'A', 'g') END AS mask
      FROM customer),
    c AS (SELECT c_mktsegment, mask, CAST(COUNT(*) AS BIGINT) AS n
          FROM m GROUP BY 1, 2),
    r AS (
      SELECT *, SUM(n) OVER (PARTITION BY c_mktsegment) AS tot,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, mask) AS rk
      FROM c)
    SELECT c_mktsegment, mask, n,
           ROUND(CAST(n AS DOUBLE) / tot, 6) AS share,
           CAST(rk AS BIGINT) AS rank
    FROM r WHERE rk <= 3 ORDER BY c_mktsegment, rank
    """,
    doc="format-mask frequency profile of customer names per segment "
    "(operators/dq.py:mask_profile, Potter's-Wheel masks: digits->9, "
    "lower->a, upper->A): the STRUCTURE rung of the DQ family — "
    "catches a second format/ID scheme before any explicit rule "
    "exists for it. One narrow regexp projection in the scan, one "
    "(group, mask) aggregate, top-3 per group by count with the "
    "mask-ascending deterministic tie-break",
)
def mask_profile_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dq import mask_profile

    cust = load(spark, sf_dir, "customer")
    return mask_profile(cust, ["c_mktsegment"], "c_name", top_n=3)


@_q(
    "digit_uniformity_prices",
    """
    WITH cells AS (
      SELECT o_orderpriority,
             CAST(ABS(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS DECIMAL(18,0))) % 100 AS BIGINT) AS c,
             CAST(COUNT(*) AS BIGINT) AS cn
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY 1, 2),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY cn DESC, c) AS r
      FROM cells),
    a AS (
      SELECT o_orderpriority,
             CAST(SUM(cn) AS BIGINT) AS n,
             SUM(cn::HUGEINT * cn) AS q,
             CAST(SUM(CASE WHEN c = 0 THEN cn ELSE 0 END)
                  AS BIGINT) AS n00,
             MAX(CASE WHEN r = 1 THEN c END) AS top_cell,
             MAX(CASE WHEN r = 1 THEN cn END) AS topn
      FROM rk GROUP BY 1)
    SELECT o_orderpriority, n,
           ROUND(CAST(CAST(q AS VARCHAR) AS DOUBLE) * 100.0 / n - n, 6)
             AS chi2,
           ROUND(n00 / CAST(n AS DOUBLE), 6) AS share_00,
           CAST(top_cell AS BIGINT) AS top_cell,
           ROUND(topn * 100.0 / n, 6) AS top_cell_lift
    FROM a ORDER BY o_orderpriority
    """,
    doc="last-two-cent-digit uniformity chi2 per order priority "
    "(operators/dq.py:digit_uniformity) — Benford's OTHER end: the "
    "mantissa signature that catches hand-entered amounts (.00/.99 "
    "spikes), single-seed synthetic data, and rounded re-imports, "
    "none of which move the leading digit benford_price_digits "
    "watches. Cents via the DECIMAL(18,2) cast (gini discipline), "
    "chi2 = sum(obs^2)*100/n - n over exact DECIMAL(38,0)/HUGEINT "
    "moments, plus the round-cents share and the top cell's lift vs "
    "the uniform 1%",
)
def digit_uniformity_prices_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dq import digit_uniformity

    orders = load(spark, sf_dir, "orders")
    return digit_uniformity(orders, ["o_orderpriority"], "o_totalprice")


@_q(
    "did_event_value",
    """
    WITH base AS (
      SELECT event_type, (user_id % 2 = 1) AS t,
             (ts >= TIMESTAMP '2024-01-16') AS p,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT event_type,
        CAST(SUM(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS ntp0,
        SUM(CASE WHEN t AND NOT p THEN v::HUGEINT END) AS stp0,
        SUM(CASE WHEN t AND NOT p THEN v::HUGEINT * v END) AS qtp0,
        CAST(SUM(CASE WHEN t AND p THEN 1 ELSE 0 END) AS BIGINT) AS ntp1,
        SUM(CASE WHEN t AND p THEN v::HUGEINT END) AS stp1,
        SUM(CASE WHEN t AND p THEN v::HUGEINT * v END) AS qtp1,
        CAST(SUM(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END)
             AS BIGINT) AS ncp0,
        SUM(CASE WHEN NOT t AND NOT p THEN v::HUGEINT END) AS scp0,
        SUM(CASE WHEN NOT t AND NOT p THEN v::HUGEINT * v END) AS qcp0,
        CAST(SUM(CASE WHEN NOT t AND p THEN 1 ELSE 0 END)
             AS BIGINT) AS ncp1,
        SUM(CASE WHEN NOT t AND p THEN v::HUGEINT END) AS scp1,
        SUM(CASE WHEN NOT t AND p THEN v::HUGEINT * v END) AS qcp1
      FROM base GROUP BY 1),
    m AS (
      SELECT event_type, ntp0, ntp1, ncp0, ncp1,
        (CASE WHEN ntp1 > 0 THEN
           CAST(CAST(stp1 AS VARCHAR) AS DOUBLE) / ntp1 / 1000000.0 END
         - CASE WHEN ntp0 > 0 THEN
           CAST(CAST(stp0 AS VARCHAR) AS DOUBLE) / ntp0 / 1000000.0 END)
        - (CASE WHEN ncp1 > 0 THEN
           CAST(CAST(scp1 AS VARCHAR) AS DOUBLE) / ncp1 / 1000000.0 END
         - CASE WHEN ncp0 > 0 THEN
           CAST(CAST(scp0 AS VARCHAR) AS DOUBLE) / ncp0 / 1000000.0 END)
          AS did,
        SQRT(
          CASE WHEN ntp1 > 1 THEN
            CAST(CAST(ntp1::HUGEINT * qtp1 - stp1 * stp1 AS VARCHAR)
                 AS DOUBLE)
            / (CAST(ntp1 AS DOUBLE) * ntp1 * (ntp1 - 1))
            / 1000000000000.0 END
          + CASE WHEN ntp0 > 1 THEN
            CAST(CAST(ntp0::HUGEINT * qtp0 - stp0 * stp0 AS VARCHAR)
                 AS DOUBLE)
            / (CAST(ntp0 AS DOUBLE) * ntp0 * (ntp0 - 1))
            / 1000000000000.0 END
          + CASE WHEN ncp1 > 1 THEN
            CAST(CAST(ncp1::HUGEINT * qcp1 - scp1 * scp1 AS VARCHAR)
                 AS DOUBLE)
            / (CAST(ncp1 AS DOUBLE) * ncp1 * (ncp1 - 1))
            / 1000000000000.0 END
          + CASE WHEN ncp0 > 1 THEN
            CAST(CAST(ncp0::HUGEINT * qcp0 - scp0 * scp0 AS VARCHAR)
                 AS DOUBLE)
            / (CAST(ncp0 AS DOUBLE) * ncp0 * (ncp0 - 1))
            / 1000000000000.0 END) AS se
      FROM g)
    SELECT event_type,
           ntp0 AS n_treat_pre, ntp1 AS n_treat_post,
           ncp0 AS n_ctrl_pre, ncp1 AS n_ctrl_post,
           ROUND(did, 6) AS did, ROUND(se, 6) AS se,
           ROUND(CASE WHEN se > 0 THEN did / se END, 6) AS t_stat
    FROM m ORDER BY event_type
    """,
    doc="difference-in-differences of event value per type across the "
    "mid-month cutover, treatment = odd user ids "
    "(operators/relational.py:diff_in_diff): (treat_post - treat_pre) "
    "- (ctrl_post - ctrl_pre) with the 4-cell pooled SE — the "
    "quasi-experimental rung next to cuped/ab_readout for when the "
    "split is observed, not randomized. All 4 cells ride ONE "
    "map-side-combined aggregate (conditional sums); micros BIGINTs, "
    "DECIMAL(38,0)/HUGEINT moments, single double expressions",
)
def did_event_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import diff_in_diff

    ev = load_events(spark, sf_dir)
    frame = ev.select(
        "event_type",
        (F.col("user_id") % 2 == 1).alias("treat"),
        (F.col("ts") >= F.lit("2024-01-16").cast("timestamp")).alias(
            "post"
        ),
        "value",
    )
    return diff_in_diff(frame, ["event_type"], "treat", "post", "value")


@_q(
    "pinball_naive_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS mic
      FROM events GROUP BY 1, 2),
    lagd AS (
      SELECT event_type, mic,
             lag(mic) OVER (PARTITION BY event_type ORDER BY day)
               AS fmic
      FROM daily),
    q AS (
      SELECT event_type,
             CAST(FLOOR((mic / 1000000.0) * 1000000 + 0.5) AS BIGINT)
               AS a,
             CAST(FLOOR((fmic / 1000000.0) * 1000000 + 0.5) AS BIGINT)
               AS f
      FROM lagd WHERE fmic IS NOT NULL),
    fanned AS (
      SELECT q.*, tau.tau, tau.pct
      FROM q CROSS JOIN (VALUES (0.5, 50), (0.9, 90)) tau(tau, pct)),
    l AS (
      SELECT event_type, tau,
             CASE WHEN a - f >= 0 THEN pct::HUGEINT * (a - f)
                  ELSE (100 - pct)::HUGEINT * (f - a) END AS loss
      FROM fanned)
    SELECT event_type, tau, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(CAST(SUM(loss) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) / 100.0 / 1000000.0, 6) AS pinball
    FROM l GROUP BY 1, 2 ORDER BY event_type, tau
    """,
    doc="mean pinball (quantile) loss of the naive persistence "
    "forecast (yesterday's daily value mass) at tau = 0.5 and 0.9 per "
    "event type (operators/series.py:pinball_loss) — the scoring rule "
    "for QUANTILE forecasts that forecast_scorecard's MAE/bias cannot "
    "judge. Daily masses are exact micros BIGINTs; tau*100 is an "
    "exact integer factor so every loss term is an exact BIGINT, "
    "summed DECIMAL(38,0)/HUGEINT, ONE double division at the end; "
    "the double round-trip micros -> dollars -> micros is replayed "
    "IDENTICALLY in both engines",
)
def pinball_naive_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import pinball_loss

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
        ).cast("long").alias("mic")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    scored = (
        daily.withColumn("actual", F.col("mic") / 1e6)
        .withColumn("forecast", F.lag("mic").over(w) / 1e6)
        .filter(F.col("forecast").isNotNull())
    )
    return pinball_loss(
        scored, ["event_type"], "actual", "forecast", (0.5, 0.9)
    )


@_q(
    "mattr_docs",
    """
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               ' '), x -> len(x) > 0) AS l
      FROM documents),
    dn AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n
           FROM docs WHERE len(l) > 0),
    toks AS (
      SELECT doc_id, unnest(l) AS tok,
             unnest(range(1, len(l) + 1)) AS pos
      FROM dn),
    spans AS (
      SELECT doc_id, unnest(range(1, CAST(n - 25 + 2 AS BIGINT))) AS s
      FROM dn WHERE n > 25),
    wins AS (
      SELECT t.doc_id, s.s,
             CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS dcnt
      FROM toks t JOIN spans s
        ON s.doc_id = t.doc_id AND t.pos >= s.s AND t.pos < s.s + 25
      GROUP BY 1, 2),
    mv AS (SELECT doc_id, CAST(SUM(dcnt) AS BIGINT) AS sd
           FROM wins GROUP BY 1),
    ttr AS (
      SELECT doc_id, n,
             ROUND(CAST(len(list_distinct(l)) AS BIGINT)
                   / CAST(n AS DOUBLE), 6) AS ttr
      FROM dn)
    SELECT ttr.doc_id, n AS n_tokens, ttr,
           CASE WHEN n <= 25 THEN ttr
                ELSE ROUND(sd / (CAST(n - 24 AS DOUBLE) * 25), 6)
           END AS mattr
    FROM ttr LEFT JOIN mv USING (doc_id)
    """,
    doc="Moving-Average Type-Token Ratio per document, window 25 "
    "(operators/text.py:mattr, Covington & McFall 2010) — the "
    "length-independent lexical-diversity feature next to "
    "repetition_profile: raw TTR inevitably falls with length "
    "(Heaps' law), MATTR averages every sliding 25-token span's TTR. "
    "Spark side is ENTIRELY row-local higher-order array expressions "
    "fused into the scan (zero shuffles, zero UDFs); the oracle "
    "replays it as a position-range join + COUNT DISTINCT — a "
    "genuinely different evaluation strategy, which is what makes "
    "the cross-engine hash meaningful",
)
def mattr_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import mattr

    docs = load(spark, sf_dir, "documents")
    return mattr(docs, "doc_id", "text", window=25)


# ---------------------------------------------------------------------------
# Round-10 wave 2: model-operating-point eval (gains table, PR curve, ECE),
# corpus coverage (char entropy, Good-Turing/Chao1), rate de-noising
# (empirical-Bayes shrinkage), scale-free forecast scoring (MASE), and
# behavioral predictability (transition entropy).


@_q(
    "gains_by_status",
    """
    WITH base AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
    tiled AS (
      SELECT o_orderstatus, y,
             ntile(10) OVER (PARTITION BY o_orderstatus
                             ORDER BY o_totalprice DESC, o_orderkey)
               AS b
      FROM base),
    per AS (
      SELECT o_orderstatus, b, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS positives
      FROM tiled GROUP BY 1, 2),
    c AS (
      SELECT *,
             SUM(n) OVER (PARTITION BY o_orderstatus ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND
                          CURRENT ROW) AS cn,
             SUM(positives) OVER (PARTITION BY o_orderstatus ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND
                          CURRENT ROW) AS cp,
             SUM(n) OVER (PARTITION BY o_orderstatus) AS tn,
             SUM(positives) OVER (PARTITION BY o_orderstatus) AS tp
      FROM per)
    SELECT o_orderstatus, CAST(b AS BIGINT) AS bucket, n, positives,
           ROUND(positives / CAST(n AS DOUBLE), 6) AS response_rate,
           ROUND(CASE WHEN tp > 0 THEN cp / CAST(tp AS DOUBLE) END, 6)
             AS cum_capture,
           ROUND(CASE WHEN tp > 0 THEN
             (cp / CAST(cn AS DOUBLE)) / (tp / CAST(tn AS DOUBLE))
           END, 6) AS cum_lift
    FROM c ORDER BY o_orderstatus, bucket
    """,
    doc="gains/lift table: order-value deciles per order status "
    "against the urgent/high-priority outcome "
    "(operators/classify.py:gains_table) — the campaign-targeting "
    "readout calibration deliberately is not: how much of the outcome "
    "does the top of the ranking CAPTURE, robust to any monotone "
    "miscalibration. Tile window ordered (score DESC, id ASC) — a "
    "bare score order would make tile boundaries tie-ambiguous "
    "across engines; counts exact BIGINTs, rates/capture/lift single "
    "double expressions",
)
def gains_by_status_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import gains_table

    orders = load(spark, sf_dir, "orders")
    frame = orders.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("y"),
    )
    return gains_table(
        frame, ["o_orderstatus"], "o_orderkey", "o_totalprice", "y", 10
    )


@_q(
    "pr_curve_events",
    """
    WITH scored AS (
      SELECT LEAST(value / 500.0, 1.0) AS s,
             (event_type = 'purchase') AS y
      FROM events WHERE value IS NOT NULL),
    fanned AS (
      SELECT s, y, t.t AS threshold
      FROM scored CROSS JOIN (
        VALUES (0.1), (0.2), (0.3), (0.4), (0.5), (0.6), (0.7),
               (0.8), (0.9)) t(t)),
    agg AS (
      SELECT threshold,
             CAST(SUM(CASE WHEN s >= threshold THEN 1 ELSE 0 END)
                  AS BIGINT) AS predicted_pos,
             CAST(SUM(CASE WHEN s >= threshold AND y THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN s < threshold AND y THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn
      FROM fanned GROUP BY 1),
    m AS (
      SELECT *,
             CASE WHEN predicted_pos > 0
                  THEN tp / CAST(predicted_pos AS DOUBLE) END AS prec,
             CASE WHEN tp + fn > 0
                  THEN tp / CAST(tp + fn AS DOUBLE) END AS rec
      FROM agg)
    SELECT threshold, predicted_pos, tp, fn,
           ROUND(prec, 6) AS precision,
           ROUND(rec, 6) AS recall,
           ROUND(CASE WHEN predicted_pos > 0 AND tp + fn > 0 AND tp > 0
                 THEN 2.0 * (prec * rec) / (prec + rec) END, 6) AS f1
    FROM m ORDER BY threshold
    """,
    doc="precision/recall/F1 at a fixed threshold grid for the "
    "'value predicts a purchase' score "
    "(operators/classify.py:pr_curve) — the operating-point table a "
    "deployed filter's cutoff is picked from, between "
    "calibration_report (is the score a probability) and gains_table "
    "(what does the top capture). Thresholds injected as literals; "
    "rows fan x9 into ONE map-side-combined aggregate (the "
    "pinball/bootstrap bounded-literal-factor shape); empty "
    "denominators NULL, never zero",
)
def pr_curve_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import pr_curve

    ev = load_events(spark, sf_dir)
    scored = ev.filter(F.col("value").isNotNull()).select(
        F.least(F.col("value") / 500.0, F.lit(1.0)).alias("p"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return pr_curve(scored, [], "p", "y")


@_q(
    "ece_events",
    """
    WITH base AS (
      SELECT CAST(FLOOR(LEAST(value / 500.0, 1.0) * 1000000 + 0.5)
                  AS BIGINT) AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL),
    binned AS (
      SELECT LEAST((p * 20) // 1000000, 19) AS bin, p, y,
             (p - y * 1000000)::HUGEINT * (p - y * 1000000) AS e2
      FROM base),
    b AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(p::HUGEINT) AS sp, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(e2) AS q
      FROM binned GROUP BY 1),
    g AS (
      SELECT bin, n, sy, sp, q,
             ABS(sy / CAST(n AS DOUBLE)
                 - CAST(CAST(sp AS VARCHAR) AS DOUBLE) / n / 1000000.0)
               AS gap
      FROM b)
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM(gap * n) / SUM(n), 6) AS ece,
           ROUND(MAX(gap), 6) AS mce,
           ROUND(CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) / SUM(n)
                 / 1000000000000.0, 6) AS brier
    FROM g
    """,
    doc="Expected/Maximum Calibration Error one-row scorecard for the "
    "same score calibration_brier_events diagrams "
    "(operators/classify.py:expected_calibration_error): ECE = "
    "n-weighted mean |observed - predicted| per bin, MCE = the worst "
    "bin, Brier alongside — the number a model gate thresholds on. "
    "Same clamped-micros binning as the report; gaps computed from "
    "the EXACT integer sums, not the rounded display columns",
)
def ece_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import expected_calibration_error

    ev = load_events(spark, sf_dir)
    scored = ev.filter(F.col("value").isNotNull()).select(
        F.least(F.col("value") / 500.0, F.lit(1.0)).alias("p"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return expected_calibration_error(scored, "p", "y", n_bins=20)


@_q(
    "char_entropy_docs",
    """
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
      FROM documents),
    chars AS (
      SELECT doc_id, unnest(string_split(s, '')) AS ch
      FROM norm WHERE len(s) > 0),
    cells AS (
      SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
      FROM chars GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS distinct_chars,
           ROUND(LN(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * LN(CAST(c AS DOUBLE))) / SUM(c), 6)
             AS entropy_nats
    FROM cells GROUP BY doc_id
    """,
    doc="per-document character-level Shannon entropy over the "
    "normalized text (operators/text.py:char_entropy) — the lowest-"
    "level synthetic-text/encoding-damage detector: base64 blobs, "
    "minified code and keyboard mashing show up FIRST in the char "
    "distribution (English prose ~2.8-3.1 nats, uniform base64 ~4.1). "
    "Count-form identity H = ln n - sum(c ln c)/n — one log per "
    "DISTINCT char; the shuffle carries at most |alphabet| rows per "
    "doc",
)
def char_entropy_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import char_entropy

    docs = load(spark, sf_dir, "documents")
    return char_entropy(docs, "doc_id", "text")


@_q(
    "vocab_coverage_sources",
    """
    WITH toks AS (
      SELECT source, tok FROM (
        SELECT source,
               unnest(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                 ' ')) AS tok
        FROM documents)
      WHERE tok <> ''),
    counts AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS singletons,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS doubletons,
           ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                 / CAST(SUM(c) AS DOUBLE), 6) AS gt_unseen_mass,
           ROUND(COUNT(*)
                 + SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                   * (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
                   / (2.0 * (SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                             + 1)), 6) AS chao1_vocab
    FROM counts GROUP BY source ORDER BY source
    """,
    doc="Good-Turing unseen-vocabulary mass + bias-corrected Chao1 "
    "vocabulary estimate per source "
    "(operators/text.py:vocab_coverage) — 'how much vocabulary "
    "HAVEN'T we seen': Heaps extrapolates from the growth "
    "trajectory, Good-Turing/Chao1 read it off the "
    "singleton/doubleton counts — the corpus-coverage gate before "
    "freezing a tokenizer. Five exact BIGINT moments off one (group, "
    "token) aggregate re-aggregated; the (n2+1) bias-corrected Chao1 "
    "form is defined even with zero doubletons",
)
def vocab_coverage_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import vocab_coverage

    docs = load(spark, sf_dir, "documents")
    return vocab_coverage(docs, ["source"], "text")


@_q(
    "eb_urgent_rates",
    """
    WITH per_cust AS (
      SELECT c.c_mktsegment, c.c_custkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2),
    pool AS (
      SELECT c_mktsegment,
             SUM(k) / CAST(SUM(n) AS DOUBLE) AS pool
      FROM per_cust GROUP BY 1)
    SELECT p.c_mktsegment, p.c_custkey, n, k,
           ROUND(CASE WHEN n > 0 THEN k / CAST(n AS DOUBLE) END, 6)
             AS raw_rate,
           ROUND(pool, 6) AS pooled_rate,
           ROUND((k + 20 * pool) / (n + 20), 6) AS shrunk_rate
    FROM per_cust p JOIN pool USING (c_mktsegment)
    ORDER BY p.c_mktsegment, p.c_custkey
    """,
    doc="empirical-Bayes shrunk per-customer urgent-order rates "
    "within market segments (operators/relational.py:shrunk_rates, "
    "prior strength 20): (k + s*pooled)/(n + s) pulls 1-of-1 "
    "customers toward their segment's pooled rate and lets "
    "high-volume customers keep their data — the variance-control "
    "companion to target_encode_loo's leakage control, and the "
    "standard de-noising before anything RANKS on a per-entity rate. "
    "Pooled rates ride exact BIGINT sums, broadcast back",
)
def eb_urgent_rates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import shrunk_rates

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    per = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                (F.col("o_orderpriority") == "1-URGENT").cast("long")
            ).cast("long").alias("k"),
        )
    )
    return shrunk_rates(
        per, ["c_mktsegment"], ["c_custkey"], "k", "n", prior_strength=20
    )


@_q(
    "mase_persistence_events",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS mic
      FROM events GROUP BY 1, 2),
    lagd AS (
      SELECT event_type, day, mic,
             lag(mic) OVER (PARTITION BY event_type ORDER BY day)
               AS fmic
      FROM daily),
    q AS (
      SELECT event_type, day,
             CAST(FLOOR((mic / 1000000.0) * 1000000 + 0.5) AS BIGINT)
               AS a,
             CAST(FLOOR((fmic / 1000000.0) * 1000000 + 0.5) AS BIGINT)
               AS f
      FROM lagd),
    withnaive AS (
      SELECT event_type, a, f,
             lag(a, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS nv
      FROM q),
    agg AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN f IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_scored,
             SUM(CASE WHEN f IS NOT NULL
                      THEN ABS(a - f)::HUGEINT END) AS se,
             CAST(SUM(CASE WHEN nv IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_naive,
             SUM(CASE WHEN nv IS NOT NULL
                      THEN ABS(a - nv)::HUGEINT END) AS sn
      FROM withnaive GROUP BY 1),
    m AS (
      SELECT event_type, n_scored, n_naive,
             CASE WHEN n_scored > 0 THEN
               CAST(CAST(se AS VARCHAR) AS DOUBLE) / n_scored
               / 1000000.0 END AS mae,
             CASE WHEN n_naive > 0 THEN
               CAST(CAST(sn AS VARCHAR) AS DOUBLE) / n_naive
               / 1000000.0 END AS mae_naive
      FROM agg)
    SELECT event_type, n_scored, n_naive,
           ROUND(mae, 6) AS mae,
           ROUND(mae_naive, 6) AS mae_naive,
           ROUND(CASE WHEN mae_naive > 0 THEN mae / mae_naive END, 6)
             AS mase
    FROM m ORDER BY event_type
    """,
    doc="Mean Absolute Scaled Error of the persistence forecast "
    "(yesterday's daily value mass) against the weekly seasonal "
    "naive, per event type (operators/series.py:mase, Hyndman-"
    "Koehler) — the SCALE-FREE forecast score the MAE/RMSE/MAPE "
    "scorecard lacks: MASE < 1 uniformly means 'beats repeating last "
    "week' on every series. Both MAE numerators are exact BIGINT "
    "|diff| sums over micros; one division of two single-division "
    "doubles",
)
def mase_persistence_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import mase

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
        ).cast("long").alias("mic")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.withColumn("actual", F.col("mic") / 1e6).withColumn(
        "forecast", F.lag("mic").over(w) / 1e6
    )
    return mase(
        scored, ["event_type"], "day", "actual", "forecast", season=7
    )


@_q(
    "transition_entropy_events",
    """
    WITH seq AS (
      SELECT event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nx
      FROM events),
    cells AS (
      SELECT s, nx, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE nx IS NOT NULL GROUP BY 1, 2),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY s
                                   ORDER BY c DESC, nx) AS rk
      FROM cells),
    agg AS (
      SELECT s, CAST(SUM(c) AS BIGINT) AS n_transitions,
             CAST(COUNT(*) AS BIGINT) AS distinct_next,
             SUM(c * LN(CAST(c AS DOUBLE))) AS clnc,
             MAX(CASE WHEN rk = 1 THEN nx END) AS top_next,
             MAX(CASE WHEN rk = 1 THEN c END) AS topc
      FROM ranked GROUP BY 1),
    h AS (
      SELECT *, LN(CAST(n_transitions AS DOUBLE))
                - clnc / n_transitions AS hh
      FROM agg)
    SELECT s AS state, n_transitions, distinct_next,
           ROUND(hh, 6) AS entropy_nats,
           ROUND(CASE WHEN distinct_next > 1 THEN
             hh / LN(CAST(distinct_next AS DOUBLE)) END, 6)
             AS entropy_norm,
           top_next,
           ROUND(topc / CAST(n_transitions AS DOUBLE), 6) AS top_share
    FROM h ORDER BY state
    """,
    doc="next-event predictability per event type "
    "(operators/series.py:transition_entropy): Shannon entropy of "
    "the successor distribution off each user's (ts, event_id)-"
    "ordered stream — the entropy rollup OVER "
    "session_transition_matrix ('from THIS state, how predictable is "
    "what happens next'), plus the dominant successor and its share. "
    "Count-form identity, one log per DISTINCT successor; the pair "
    "stream rides one (user, order) sort window",
)
def transition_entropy_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import transition_entropy

    ev = load_events(spark, sf_dir)
    return transition_entropy(
        ev, "user_id", ["ts", "event_id"], "event_type"
    )


# ---------------------------------------------------------------------------
# Round-10 wave 3: source-set geometry (vocabulary overlap), tokenizer
# budget (fertility), effect-size inference (odds ratio / relative risk),
# and k-sample rank inference (Kruskal-Wallis).


@_q(
    "vocab_overlap_pairs",
    """
    WITH vocab AS (
      SELECT DISTINCT source, tok FROM (
        SELECT source,
               unnest(string_split(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                 ' ')) AS tok
        FROM documents)
      WHERE tok <> ''),
    totals AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v
               FROM vocab GROUP BY 1),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM vocab a JOIN vocab b
        ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2),
    pairs AS (
      SELECT ta.source AS source_a, tb.source AS source_b,
             ta.v AS vocab_a, tb.v AS vocab_b,
             COALESCE(s.shared, 0) AS shared
      FROM totals ta JOIN totals tb ON ta.source < tb.source
      LEFT JOIN shared s
        ON s.source_a = ta.source AND s.source_b = tb.source)
    SELECT source_a, source_b, vocab_a, vocab_b, shared,
           ROUND(shared / CAST(vocab_a + vocab_b - shared AS DOUBLE), 6)
             AS jaccard,
           ROUND(shared / CAST(vocab_a AS DOUBLE), 6) AS containment_a,
           ROUND(shared / CAST(vocab_b AS DOUBLE), 6) AS containment_b
    FROM pairs ORDER BY source_a, source_b
    """,
    doc="pairwise source-vocabulary overlap "
    "(operators/text.py:vocab_overlap) — the SET-level companion to "
    "jsd_source_docs' distributional distance: Jaccard plus BOTH "
    "directed containments, which catch the subset relationships "
    "Jaccard hides ('src_b is 95% contained in src_a' = remove it "
    "from the mixture). One (source, token) DISTINCT aggregate, one "
    "inner self-join on token, every unordered pair seated from the "
    "m-row totals (the jsd absence discipline)",
)
def vocab_overlap_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import vocab_overlap

    docs = load(spark, sf_dir, "documents")
    return vocab_overlap(docs, "source", "text")


@_q(
    "tokenizer_fertility_sources",
    """
    WITH base AS (
      SELECT source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                  AS BIGINT) AS w,
             CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS BIGINT) AS s,
             CAST(length(regexp_replace(text, '\\s', '', 'g'))
                  AS BIGINT) AS c
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS words,
           CAST(SUM(s) AS BIGINT) AS subword_tokens,
           ROUND(SUM(s) / CAST(SUM(w) AS DOUBLE), 6) AS fertility,
           ROUND(SUM(c) / CAST(SUM(s) AS DOUBLE), 6)
             AS chars_per_subword
    FROM base GROUP BY source ORDER BY source
    """,
    doc="tokenizer fertility per source "
    "(operators/text.py:tokenizer_fertility): subword tokens per "
    "whitespace word off the repo's deterministic BPE-ish proxy "
    "(letter runs / digit runs / single symbols — text_profile's "
    "counter) — the tokens-per-word budget number every LLM cost "
    "model runs on; a fertility SHIFT between snapshots flags an "
    "upstream encoding regression. One map-side-combined aggregate, "
    "exact BIGINT sums",
)
def tokenizer_fertility_sources_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.text import tokenizer_fertility

    docs = load(spark, sf_dir, "documents")
    return tokenizer_fertility(docs, ["source"], "text")


@_q(
    "odds_ratio_events",
    """
    WITH g AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN user_id % 2 = 1 AND value >= 100
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN user_id % 2 = 1 AND value < 100
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN user_id % 2 = 0 AND value >= 100
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN user_id % 2 = 0 AND value < 100
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    m AS (
      SELECT event_type, a, b, c, d,
             CASE WHEN b * c > 0 THEN
               CAST(CAST(a::HUGEINT * d AS VARCHAR) AS DOUBLE)
               / CAST(CAST(b::HUGEINT * c AS VARCHAR) AS DOUBLE)
             END AS orr,
             CASE WHEN a + b > 0 AND c + d > 0 AND c > 0 THEN
               (a / CAST(a + b AS DOUBLE))
               / (c / CAST(c + d AS DOUBLE))
             END AS rr,
             CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
               SQRT(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
             END AS se
      FROM g)
    SELECT event_type,
           a + b AS n_exposed, c + d AS n_unexposed, a, c,
           ROUND(orr, 6) AS odds_ratio,
           ROUND(rr, 6) AS relative_risk,
           ROUND(EXP(CASE WHEN orr > 0 THEN LN(orr) END
                     - 1.959963984540054 * se), 6) AS ci_lo,
           ROUND(EXP(CASE WHEN orr > 0 THEN LN(orr) END
                     + 1.959963984540054 * se), 6) AS ci_hi
    FROM m ORDER BY event_type
    """,
    doc="2x2 odds ratio + relative risk with the Woolf log-CI per "
    "event type, exposure = odd user ids, outcome = value >= 100 "
    "(operators/relational.py:odds_ratio) — the effect-SIZE rung "
    "next to chi2/woe ('2.4x the odds, CI [1.8, 3.2]' is the number "
    "a decision uses). Four cells in ONE conditional aggregate; "
    "cross products in DECIMAL(38,0)/HUGEINT (a*d reaches n^2); z "
    "injected as the NORMAL_QUANTILES literal; zero cells -> NULL "
    "CI, not a silent Haldane correction",
)
def odds_ratio_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import odds_ratio

    ev = load_events(spark, sf_dir)
    frame = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        (F.col("user_id") % 2 == 1).alias("exposed"),
        (F.col("value") >= 100).alias("outcome"),
    )
    return odds_ratio(frame, ["event_type"], "exposed", "outcome")


@_q(
    "kruskal_event_values",
    """
    WITH base AS (
      SELECT CAST(isodow(ts) - 1 AS BIGINT) AS wd, value AS v,
             event_type AS cls
      FROM events WHERE value IS NOT NULL),
    cells AS (
      SELECT wd, v, cls, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2, 3),
    per_v AS (
      SELECT wd, v, CAST(SUM(c) AS BIGINT) AS tv
      FROM cells GROUP BY 1, 2),
    rv AS (
      SELECT wd, v, tv,
             COALESCE(SUM(tv) OVER (PARTITION BY wd ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cum
      FROM per_v),
    rv2 AS (SELECT wd, v, cum + (tv + 1) / 2.0 AS avgrank FROM rv),
    pc AS (
      SELECT c.wd, c.cls, CAST(SUM(c.c) AS BIGINT) AS n_c,
             SUM(c.c * r.avgrank) AS r
      FROM cells c JOIN rv2 r ON r.wd = c.wd AND r.v = c.v
      GROUP BY 1, 2),
    ties AS (
      SELECT wd, SUM(tv::HUGEINT * tv * tv - tv) AS t3t,
             CAST(SUM(tv) AS BIGINT) AS n
      FROM per_v GROUP BY 1),
    ag AS (
      SELECT wd, CAST(COUNT(*) AS BIGINT) AS k_classes,
             SUM(r * r / n_c) AS rr
      FROM pc GROUP BY 1),
    m AS (
      SELECT t.wd, n, k_classes,
             12.0 / (CAST(n AS DOUBLE) * (n + 1)) * rr - 3.0 * (n + 1)
               AS h,
             1.0 - CAST(CAST(t3t AS VARCHAR) AS DOUBLE)
                   / (CAST(n AS DOUBLE) * n * n - n) AS corr
      FROM ties t JOIN ag USING (wd))
    SELECT wd AS weekday, n, k_classes,
           ROUND(h, 6) AS h_stat,
           ROUND(CASE WHEN corr > 0 THEN h / corr END, 6)
             AS h_corrected
    FROM m ORDER BY weekday
    """,
    doc="Kruskal-Wallis H across the five event types per weekday "
    "(operators/relational.py:kruskal_wallis) — the k-sample "
    "extension of mannwhitney_click_error: rank-based k-way 'same "
    "distribution?' with average ranks + the standard tie "
    "correction. Mann-Whitney reduced-frame discipline verbatim: "
    "average ranks derived as cum_before + (tv+1)/2 on the "
    "DISTINCT-value frame (exact .0/.5 rationals off integer "
    "cumulative windows — no row-level rank window anywhere); cubic "
    "tie terms in DECIMAL(38,0)/HUGEINT",
)
def kruskal_event_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import kruskal_wallis

    ev = load_events(spark, sf_dir)
    base = ev.filter(F.col("value").isNotNull()).select(
        F.weekday("ts").cast("long").alias("weekday"),
        "value",
        "event_type",
    )
    return kruskal_wallis(base, ["weekday"], "value", "event_type")


# ---------------------------------------------------------------------------
# round-10 wave 4: classifier eval, robust stats, design-based estimation
# ---------------------------------------------------------------------------


@_q(
    "roc_auc_events",
    """
    WITH base AS (
      SELECT CAST(isodow(ts) - 1 AS BIGINT) AS wd,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL),
    per_v AS (
      SELECT wd, v, CAST(SUM(y) AS BIGINT) AS tp,
             CAST(SUM(1 - y) AS BIGINT) AS tn
      FROM base GROUP BY 1, 2),
    r AS (
      SELECT wd, tp, tn,
             COALESCE(SUM(tp + tn) OVER (PARTITION BY wd ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS c
      FROM per_v),
    r2 AS (
      SELECT wd, tp, tn,
             tp::HUGEINT * (2 * c + tp + tn + 1) AS r2p
      FROM r),
    ag AS (
      SELECT wd, CAST(SUM(tp) AS BIGINT) AS n_pos,
             CAST(SUM(tn) AS BIGINT) AS n_neg,
             SUM(r2p) AS r2p
      FROM r2 GROUP BY 1),
    m AS (
      SELECT wd, n_pos, n_neg,
             CASE WHEN n_pos > 0 AND n_neg > 0 THEN
               CAST(r2p - n_pos::HUGEINT * (n_pos + 1) AS DOUBLE)
               / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
             END AS auc
      FROM ag)
    SELECT wd AS weekday, n_pos, n_neg,
           ROUND(auc, 6) AS auc,
           ROUND(2.0 * auc - 1.0, 6) AS gini
    FROM m ORDER BY weekday
    """,
    doc="exact tie-aware ROC AUC of value as a purchase score per "
    "weekday (operators/classify.py:roc_auc) — the threshold-free "
    "rung of the classifier-eval ladder next to pr_curve (fixed "
    "thresholds), calibration_brier (probability quality) and "
    "gains_by_status (lift): AUC = the Mann-Whitney U normalized by "
    "n_pos*n_neg, so it rides that operator's reduced-frame "
    "discipline verbatim — midranks as (2c+t+1)/2 exact integers on "
    "the DISTINCT-score frame, 2x rank sums in DECIMAL(38,0)/"
    "HUGEINT, no row-level rank window",
)
def roc_auc_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import roc_auc

    ev = load_events(spark, sf_dir)
    frame = ev.filter(F.col("value").isNotNull()).select(
        F.weekday("ts").cast("long").alias("weekday"),
        "value",
        (F.col("event_type") == "purchase").alias("y"),
    )
    return roc_auc(frame, ["weekday"], "value", "y")


@_q(
    "jarque_bera_values",
    """
    WITH base AS (
      SELECT event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    ag AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(v::HUGEINT) AS s1,
             SUM(v::HUGEINT * v) AS s2,
             SUM(v::HUGEINT * v * v) AS s3,
             SUM((v::HUGEINT * v) * (v::HUGEINT * v)) AS s4
      FROM base GROUP BY 1),
    m AS (
      SELECT event_type, n,
             CAST(n AS DOUBLE) AS nd,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS d1,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS d2,
             CAST(CAST(s3 AS VARCHAR) AS DOUBLE) AS d3,
             CAST(CAST(s4 AS VARCHAR) AS DOUBLE) AS d4
      FROM ag),
    mm AS (
      SELECT event_type, n, nd,
             d1 / nd AS m1,
             d2 / nd - (d1 / nd) * (d1 / nd) AS m2,
             d3 / nd - 3.0 * (d1 / nd) * (d2 / nd)
               + 2.0 * (d1 / nd) * (d1 / nd) * (d1 / nd) AS m3,
             d4 / nd - 4.0 * (d1 / nd) * (d3 / nd)
               + 6.0 * (d1 / nd) * (d1 / nd) * (d2 / nd)
               - 3.0 * (d1 / nd) * (d1 / nd) * (d1 / nd) * (d1 / nd)
               AS m4
      FROM m),
    st AS (
      SELECT event_type, n, nd, m1, m2,
             CASE WHEN n >= 2 AND m2 > 0
                  THEN m3 / POWER(m2, 1.5) END AS skew,
             CASE WHEN n >= 2 AND m2 > 0
                  THEN m4 / (m2 * m2) END AS kurt
      FROM mm)
    SELECT event_type, n,
           ROUND(m1 / 100.0, 6) AS mean,
           ROUND(skew, 6) AS skewness,
           ROUND(kurt, 6) AS kurtosis,
           ROUND(nd / 6.0 * (skew * skew
                 + (kurt - 3.0) * (kurt - 3.0) / 4.0), 6) AS jb_stat
    FROM st ORDER BY event_type
    """,
    doc="Jarque-Bera normality statistic of value per event type "
    "(operators/series.py:jarque_bera) — JB = n/6*(S^2 + (K-3)^2/4) "
    "off sample skewness and kurtosis: the one-pass moment test "
    "that flags heavy tails before anything assumes Gaussian "
    "(z-score fences, CUPED, power_mde all do). Values quantized to "
    "cents; all four raw power sums exact in DECIMAL(38,0)/HUGEINT "
    "(x^4 crosses 2^63 LONG overflow at ~6e4 rows of 1e5-cent "
    "values); S and K are identical double expressions of exact "
    "integers via the raw-moment identities, scale cancelling. ONE "
    "map-side-combined aggregate — no window, no join",
)
def jarque_bera_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import jarque_bera

    ev = load_events(spark, sf_dir)
    return jarque_bera(ev, ["event_type"], "value")


_DAILY_MEAN_SQL = """
      SELECT event_type,
             CAST(ts AS DATE) AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(value), 6) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
"""


def _daily_mean_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared bounded rollup for the serial-correlation family: daily
    mean value per event type, the stable_avg discipline + round-6 so
    the downstream DECIMAL(18,6) re-cast is exact on both engines."""
    ev = load_events(spark, sf_dir)
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value"),
                6,
            ).alias("v")
        )
    )


@_q(
    "durbin_watson_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    mu AS (
      SELECT event_type,
             CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS mu
      FROM daily GROUP BY 1),
    e AS (
      SELECT d.event_type, d.v - mu AS e,
             d.v - mu - LAG(d.v - mu) OVER (
               PARTITION BY d.event_type ORDER BY d.day) AS dd
      FROM daily d JOIN mu USING (event_type)),
    ag AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(e * e) AS sse, SUM(dd * dd) AS ssd
      FROM e GROUP BY 1),
    m AS (
      SELECT event_type, n,
             CASE WHEN n >= 2 AND sse > 0 THEN ssd / sse END AS dw
      FROM ag)
    SELECT event_type, n, ROUND(dw, 6) AS dw,
           ROUND(1.0 - dw / 2.0, 6) AS rho1
    FROM m ORDER BY event_type
    """,
    doc="Durbin-Watson serial-correlation statistic per event type "
    "over the daily mean-value series "
    "(operators/series.py:durbin_watson) — DW = sum((e_t-e_t-1)^2)/"
    "sum(e_t^2) with mean-centered residuals: the residual-"
    "autocorrelation check that says whether acf_daily_values' "
    "lag-1 story survives centering (DW ~ 2(1-rho1)). Fed the "
    "bounded daily rollup (acf contract); means off DECIMAL(18,6) "
    "sums; one lag window over the days-sized frame",
)
def durbin_watson_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import durbin_watson

    daily = _daily_mean_frame(spark, sf_dir)
    return durbin_watson(daily, ["event_type"], "day", "v")


@_q(
    "page_hinkley_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    pref AS (
      SELECT event_type, day, v,
             CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS m
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    u AS (
      SELECT event_type, day,
             SUM(v - m - 0.0) OVER w AS u
      FROM pref
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    g AS (
      SELECT event_type, day,
             u - MIN(u) OVER w AS ph
      FROM u
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(ph), 6) AS ph_max,
           MIN(CASE WHEN ph > 25.0 THEN day END) AS alarm_at,
           CAST(SUM(CASE WHEN ph > 25.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms
    FROM g GROUP BY 1 ORDER BY event_type
    """,
    doc="Page-Hinkley mean-shift detector per event type over the "
    "daily mean series (operators/series.py:page_hinkley) — the "
    "sequential cousin of cusum_daily_drift: U_t = prefix sum of "
    "(x - running prefix mean - delta), alarm when U_t - min U "
    "exceeds lambda. delta=0.0 / lambda=25.0 injected into both "
    "plans (NORMAL_QUANTILES discipline); prefix means ride exact "
    "DECIMAL(18,6) prefix sums over the round-6 daily frame, so "
    "both engines fold the identical doubles in the identical ASC "
    "order. Three ordered windows over the days-sized rollup",
)
def page_hinkley_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import page_hinkley

    daily = _daily_mean_frame(spark, sf_dir)
    return page_hinkley(
        daily, ["event_type"], "day", "v", delta=0.0, lam=25.0
    )


@_q(
    "theil_customer_revenue",
    """
    WITH rev AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS r
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey, o_custkey),
    q AS (
      SELECT c_nationkey AS g,
             CAST(ROUND(r * 100, 0) AS BIGINT) AS v
      FROM rev WHERE r IS NOT NULL),
    ag AS (
      SELECT g,
             CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n,
             CAST(SUM(CASE WHEN v > 0 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dropped,
             SUM(CASE WHEN v > 0 THEN v::HUGEINT END) AS s1,
             SUM(CASE WHEN v > 0
                 THEN CAST(v AS DOUBLE) * LN(CAST(v AS DOUBLE)) END)
               AS sxlx,
             SUM(CASE WHEN v > 0 THEN LN(CAST(v AS DOUBLE)) END)
               AS slx
      FROM q GROUP BY 1),
    m AS (
      SELECT g, n, n_dropped,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
               AS vbar,
             sxlx, slx, CAST(n AS DOUBLE) AS nd
      FROM ag)
    SELECT g AS c_nationkey, n, n_dropped,
           ROUND(CASE WHEN n > 0 THEN vbar / 100.0 END, 6) AS mean,
           ROUND(CASE WHEN n > 0
                 THEN sxlx / (nd * vbar) - LN(vbar) END, 6) AS theil_t,
           ROUND(CASE WHEN n > 0
                 THEN LN(vbar) - slx / nd END, 6) AS theil_l
    FROM m ORDER BY c_nationkey
    """,
    doc="Theil T and L inequality of per-customer revenue within "
    "each nation (operators/relational.py:theil_index) — the "
    "decomposable-entropy rungs next to gini_customer_revenue "
    "(rank-based) and pareto/HHI (concentration): unlike Gini, "
    "Theil decomposes exactly into between+within, which is what "
    "mixture audits report. ONE map-side-combined aggregate (the "
    "identities fold the mean out — no second pass); cents exact in "
    "DECIMAL(38,0)/HUGEINT; the x*ln(x) double folds renormalize by "
    "n*mu so summation-order ulps land ~1e-13 RELATIVE, invisible "
    "at round-6",
)
def theil_customer_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import theil_index

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("r")
        )
    )
    return theil_index(rev, ["c_nationkey"], "r")


@_q(
    "brown_forsythe_values",
    """
    WITH base AS (
      SELECT event_type AS c,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    per_v AS (
      SELECT c, v, CAST(COUNT(*) AS BIGINT) AS t
      FROM base GROUP BY 1, 2),
    cum AS (
      SELECT c, v, t,
             SUM(t) OVER (PARTITION BY c ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumt,
             SUM(t) OVER (PARTITION BY c) AS nc
      FROM per_v),
    med AS (
      SELECT c, MIN(v) AS med
      FROM cum WHERE cumt * 2 >= nc GROUP BY 1),
    z AS (
      SELECT p.c, p.t, ABS(p.v - med.med) AS z
      FROM per_v p JOIN med ON p.c = med.c),
    zc AS (
      SELECT c, CAST(SUM(t) AS BIGINT) AS ni,
             SUM(z::HUGEINT * t) AS sz,
             SUM((z::HUGEINT * z) * t) AS szz
      FROM z GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(ni) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k_classes,
             SUM(sz) AS sza,
             SUM(CAST(CAST(sz AS VARCHAR) AS DOUBLE)
                 * CAST(CAST(sz AS VARCHAR) AS DOUBLE)
                 / CAST(ni AS DOUBLE)) AS szin,
             SUM(CAST(CAST(szz AS VARCHAR) AS DOUBLE)
                 - CAST(CAST(sz AS VARCHAR) AS DOUBLE)
                 * CAST(CAST(sz AS VARCHAR) AS DOUBLE)
                 / CAST(ni AS DOUBLE)) AS ssw
      FROM zc),
    m AS (
      SELECT n, k_classes,
             CAST(n AS DOUBLE) AS nd, CAST(k_classes AS DOUBLE) AS kd,
             szin - CAST(CAST(sza AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(sza AS VARCHAR) AS DOUBLE)
                    / CAST(n AS DOUBLE) AS ssb,
             ssw
      FROM tot)
    SELECT n, k_classes,
           ROUND(CASE WHEN k_classes >= 2 AND ssw > 0
                 THEN (nd - kd) / (kd - 1.0) * ssb / ssw END, 6)
             AS w_stat,
           CAST(k_classes - 1 AS BIGINT) AS dof1,
           CAST(n - k_classes AS BIGINT) AS dof2
    FROM m
    """,
    doc="Brown-Forsythe variance-homogeneity test across the five "
    "event types (operators/relational.py:brown_forsythe) — the "
    "robust Levene variant (median centers): the missing rung "
    "between anova_event_values (means, assumes equal variance) and "
    "kruskal (distribution shifts): 'did the SPREAD change'. LOWER "
    "median per class off ONE prefix window on the DISTINCT-value "
    "frame (exact + engine-agnostic where interpolated medians "
    "differ by ulps); |x-med| then exact cent integers, both "
    "quadratic forms in DECIMAL(38,0)/HUGEINT via raw-moment "
    "identities; W one double expression of exact integers",
)
def brown_forsythe_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import brown_forsythe

    ev = load_events(spark, sf_dir)
    return brown_forsythe(
        ev.select("value", "event_type"), "value", "event_type"
    )


@_q(
    "jackknife_nation_value",
    """
    WITH base AS (
      SELECT c_nationkey AS g,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders JOIN customer ON o_custkey = c_custkey),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS ni,
             SUM(v::HUGEINT) AS si,
             SUM(v::HUGEINT * v) AS sqi
      FROM base GROUP BY 1),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS g,
             CAST(SUM(ni) AS BIGINT) AS n,
             SUM(si) AS s,
             SUM(sqi) AS sq
      FROM per_g),
    loo AS (
      SELECT t.g, t.n, t.s, t.sq,
             CAST(CAST(t.s - p.si AS VARCHAR) AS DOUBLE)
               / CAST(t.n - p.ni AS DOUBLE)
             - CAST(CAST(t.s AS VARCHAR) AS DOUBLE)
               / CAST(t.n AS DOUBLE) AS d
      FROM per_g p CROSS JOIN tot t),
    st AS (
      SELECT g, n, s, sq,
             SUM(d) AS dsum, SUM(d * d) AS dsq
      FROM loo GROUP BY 1, 2, 3, 4),
    m AS (
      SELECT g, n,
             CAST(g AS DOUBLE) AS gd, CAST(n AS DOUBLE) AS nd,
             CAST(CAST(s AS VARCHAR) AS DOUBLE)
               / CAST(n AS DOUBLE) AS mean_q,
             dsum, dsq,
             CAST(CAST(sq AS VARCHAR) AS DOUBLE) AS sqd
      FROM st)
    SELECT g, n, ROUND(mean_q / 100.0, 6) AS mean,
           ROUND(CASE WHEN g >= 2 THEN
             SQRT(GREATEST((gd - 1.0) / gd
               * (dsq - dsum * dsum / gd), 0.0)) END
             / 100.0, 6) AS se_jack,
           ROUND(CASE WHEN n >= 2 THEN
             SQRT(GREATEST((sqd / nd - mean_q * mean_q) / nd, 0.0)) END
             / 100.0, 6) AS se_naive
    FROM m
    """,
    doc="delete-one-NATION jackknife standard error for the mean "
    "order value (operators/relational.py:jackknife_groups) — the "
    "design-based variance answer when rows arrive in clusters and "
    "the iid bootstrap understates the error: theta_(i) = mean "
    "excluding nation i, SE^2 = (g-1)/g * sum((theta_(i) - "
    "theta_bar)^2); reports the iid se_naive from the same pass for "
    "the design-effect comparison. ONE map-side-combined groupBy "
    "over the fact + arithmetic on the 25-row nation frame "
    "(broadcast totals); leave-one-out means are single double "
    "divisions of exact DECIMAL/BIGINT sums",
)
def jackknife_nation_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import jackknife_groups

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_nationkey").alias("g"), F.col("o_totalprice").alias("x")
    )
    return jackknife_groups(base, "g", "x")


@_q(
    "mcnemar_doc_rules",
    """
    WITH base AS (
      SELECT lang,
             n_chars >= 250 AS a,
             len(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) >= 45 AS b
      FROM documents),
    ag AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
               AS both_fire,
             CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
               AS BIGINT) AS only_a,
             CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
               AS BIGINT) AS only_b,
             CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
               AS BIGINT) AS neither
      FROM base GROUP BY 1)
    SELECT lang, n, both_fire, only_a, only_b, neither,
           ROUND(CASE WHEN only_a + only_b > 0 THEN
             POWER(ABS(CAST(only_a - only_b AS DOUBLE)) - 1.0, 2)
             / CAST(only_a + only_b AS DOUBLE) END, 6)
             AS mcnemar_chi2,
           ROUND(CAST(only_a + only_b AS DOUBLE) / n, 6)
             AS disagree_rate
    FROM ag ORDER BY lang
    """,
    doc="McNemar's paired test of two document-quality rules "
    "(n_chars >= 250 vs >= 45 whitespace words) per language "
    "(operators/classify.py:mcnemar_test) — 'do two filters "
    "disagree SYSTEMATICALLY', the question chi2 (unpaired) can't "
    "answer: both rules fire on the same rows, so only the "
    "discordant cells b, c carry information; continuity-corrected "
    "(|b-c|-1)^2/(b+c), chi-square(1) under H0. All four cells off "
    "ONE conditional aggregate — no join, no window",
)
def mcnemar_doc_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import mcnemar_test
    from .operators.text import normalize_text_col

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        (F.col("n_chars") >= 250).alias("ra"),
        (
            F.size(F.split(normalize_text_col("text"), " ")) >= 45
        ).alias("rb"),
    )
    out = mcnemar_test(base, ["lang"], "ra", "rb")
    return out.withColumnRenamed("both", "both_fire")


@_q(
    "decision_stump_docs",
    """
    WITH base AS (
      SELECT CAST(n_chars AS DOUBLE) AS x,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
      WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
    per_v AS (
      SELECT x, CAST(SUM(y) AS BIGINT) AS p,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS q
      FROM base GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(p) AS BIGINT) AS tp,
             CAST(SUM(q) AS BIGINT) AS tq
      FROM per_v),
    cum AS (
      SELECT x,
             CAST(SUM(p) OVER w AS BIGINT) AS lp,
             CAST(SUM(q) OVER w AS BIGINT) AS lq
      FROM per_v
      WINDOW w AS (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    j AS (SELECT * FROM cum CROSS JOIN tot),
    m AS (
      SELECT x, lp, lq, tp, tq,
             tp - lp AS rp, tq - lq AS rq,
             lp + lq AS nl, (tp - lp) + (tq - lq) AS nr,
             tp + tq AS n
      FROM j),
    e AS (
      SELECT x, n, nl, nr, lp, rp,
             -(CASE WHEN tp > 0 THEN CAST(tp AS DOUBLE) / CAST(n AS DOUBLE)
                    * LN(CAST(tp AS DOUBLE) / CAST(n AS DOUBLE))
                    ELSE 0.0 END
               + CASE WHEN tq > 0 THEN CAST(tq AS DOUBLE) / CAST(n AS DOUBLE)
                      * LN(CAST(tq AS DOUBLE) / CAST(n AS DOUBLE))
                      ELSE 0.0 END) AS hp,
             -(CASE WHEN lp > 0
                    THEN CAST(lp AS DOUBLE) / CAST(nl AS DOUBLE)
                    * LN(CAST(lp AS DOUBLE) / CAST(nl AS DOUBLE))
                    ELSE 0.0 END
               + CASE WHEN lq > 0
                      THEN CAST(lq AS DOUBLE) / CAST(nl AS DOUBLE)
                      * LN(CAST(lq AS DOUBLE) / CAST(nl AS DOUBLE))
                      ELSE 0.0 END) AS hl,
             -(CASE WHEN rp > 0
                    THEN CAST(rp AS DOUBLE) / CAST(nr AS DOUBLE)
                    * LN(CAST(rp AS DOUBLE) / CAST(nr AS DOUBLE))
                    ELSE 0.0 END
               + CASE WHEN rq > 0
                      THEN CAST(rq AS DOUBLE) / CAST(nr AS DOUBLE)
                      * LN(CAST(rq AS DOUBLE) / CAST(nr AS DOUBLE))
                      ELSE 0.0 END) AS hr
      FROM m WHERE nr > 0)
    SELECT x AS threshold,
           CAST(n AS BIGINT) AS n,
           CAST(nl AS BIGINT) AS n_left,
           CAST(nr AS BIGINT) AS n_right,
           lp AS pos_left, rp AS pos_right,
           ROUND(hp, 6) AS entropy_parent,
           ROUND(hp - (CAST(nl AS DOUBLE) / CAST(n AS DOUBLE) * hl
                 + CAST(nr AS DOUBLE) / CAST(n AS DOUBLE) * hr), 6)
             AS gain_nats
    FROM e
    ORDER BY gain_nats DESC, threshold
    LIMIT 1
    """,
    doc="best single-threshold split of n_chars against lang='en' "
    "by information gain (operators/classify.py:decision_stump) — "
    "the 1-node decision tree every learned quality classifier is "
    "compared to: 'is there ONE cutoff on this signal, and how much "
    "does it buy'. Candidates = DISTINCT feature values (HLL "
    "fail-fast above max_distinct — silent binning would change "
    "the answer); exact left/right class counts off ONE prefix "
    "window on the distinct frame; entropies identical double "
    "expressions of exact integers; smallest-threshold tiebreak; "
    "global top-1 via TakeOrderedAndProject",
)
def decision_stump_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import decision_stump

    docs = load(spark, sf_dir, "documents")
    base = docs.select("n_chars", (F.col("lang") == "en").alias("y"))
    return decision_stump(base, "n_chars", "y")


@_q(
    "vocab_chapman_sources",
    """
    WITH raw AS (
      SELECT source,
             string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ') AS arr
      FROM documents),
    grams AS (
      SELECT DISTINCT source,
             arr[u.i] || ' ' || arr[u.i + 1] AS gram
      FROM raw, unnest(range(1, len(arr))) AS u(i)
      WHERE length(arr[u.i]) > 0 AND length(arr[u.i + 1]) > 0),
    totals AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS v
      FROM grams GROUP BY 1),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM grams a JOIN grams b
        ON a.gram = b.gram AND a.source < b.source
      GROUP BY 1, 2),
    geo AS (
      SELECT ta.source AS source_a, tb.source AS source_b,
             ta.v AS vocab_a, tb.v AS vocab_b,
             COALESCE(s.shared, 0) AS m
      FROM totals ta JOIN totals tb ON ta.source < tb.source
      LEFT JOIN shared s
        ON s.source_a = ta.source AND s.source_b = tb.source),
    est AS (
      SELECT source_a, source_b, vocab_a, vocab_b, m,
             CAST((vocab_a + 1)::HUGEINT * (vocab_b + 1) AS DOUBLE)
               / CAST(m + 1 AS DOUBLE) - 1.0 AS n_hat,
             CAST((vocab_a + 1)::HUGEINT * (vocab_b + 1) AS DOUBLE)
               * CAST(vocab_a - m AS DOUBLE)
               * CAST(vocab_b - m AS DOUBLE)
               / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
                  * CAST(m + 2 AS DOUBLE)) AS var,
             vocab_a + vocab_b - m AS uo
      FROM geo)
    SELECT source_a, source_b, vocab_a, vocab_b, m AS shared,
           CAST(uo AS BIGINT) AS union_observed,
           ROUND(CASE WHEN vocab_a > 0 AND vocab_b > 0
                 THEN n_hat END, 6) AS chapman_total,
           ROUND(CASE WHEN vocab_a > 0 AND vocab_b > 0
                 THEN GREATEST(n_hat - CAST(uo AS DOUBLE), 0.0) END, 6)
             AS unseen,
           ROUND(CASE WHEN vocab_a > 0 AND vocab_b > 0
                 THEN SQRT(var) END, 6) AS se_chapman
    FROM est ORDER BY source_a, source_b
    """,
    doc="Chapman capture-recapture estimate of the total BIGRAM "
    "vocabulary from each source pair's overlap "
    "(operators/text.py:vocab_capture_recapture) — the 'how much "
    "more is out there' rung above vocab_overlap_pairs: source A's "
    "bigram vocab = first capture, B's = marked recapture, N_hat = "
    "(n_a+1)(n_b+1)/(m+1)-1 with Seber's SE; N_hat - |union "
    "observed| = the unseen mass a coverage plan still owes "
    "(heaps_law's other angle). Bigrams because the saturated "
    "unigram vocab degenerates. vocab_overlap's inverted-index "
    "geometry verbatim: one DISTINCT aggregate, one gram self-join, "
    "pairs seated from totals; max_sources fail-fast forwarded",
)
def vocab_chapman_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import vocab_capture_recapture

    docs = load(spark, sf_dir, "documents")
    return vocab_capture_recapture(
        docs, "source", "text", ngram=2, max_sources=64
    )


# ---------------------------------------------------------------------------
# round-10 wave 5: effect sizes, extremes, SPC, paired k-sample, enrichment
# ---------------------------------------------------------------------------


@_q(
    "cohens_d_purchase_click",
    """
    WITH base AS (
      SELECT CAST(isodow(ts) - 1 AS BIGINT) AS wd,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             event_type = 'purchase' AS a
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')),
    ag AS (
      SELECT wd,
             CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             SUM(CASE WHEN a THEN v::HUGEINT END) AS sa,
             SUM(CASE WHEN NOT a THEN v::HUGEINT END) AS sb,
             SUM(CASE WHEN a THEN v::HUGEINT * v END) AS qa,
             SUM(CASE WHEN NOT a THEN v::HUGEINT * v END) AS qb
      FROM base GROUP BY 1),
    m AS (
      SELECT wd, n_a, n_b,
             CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
             CAST(CAST(sa AS VARCHAR) AS DOUBLE) AS da,
             CAST(CAST(sb AS VARCHAR) AS DOUBLE) AS db,
             CAST(CAST(qa AS VARCHAR) AS DOUBLE) AS dqa,
             CAST(CAST(qb AS VARCHAR) AS DOUBLE) AS dqb
      FROM ag),
    mm AS (
      SELECT wd, n_a, n_b, na, nb,
             da / na AS ma, db / nb AS mb,
             dqa - da * da / na AS ssa,
             dqb - db * db / nb AS ssb
      FROM m),
    st AS (
      SELECT wd, n_a, n_b, na, nb, ma, mb,
             (ssa + ssb) / (na + nb - 2.0) AS sp2,
             n_a >= 2 AND n_b >= 2 AND ssa + ssb > 0 AS ok
      FROM mm),
    dd AS (
      SELECT wd, n_a, n_b, ma, mb, sp2, ok, na, nb,
             CASE WHEN ok THEN (ma - mb) / SQRT(sp2) END AS d
      FROM st)
    SELECT wd AS weekday, n_a, n_b,
           ROUND(ma / 100.0, 6) AS mean_a,
           ROUND(mb / 100.0, 6) AS mean_b,
           ROUND(CASE WHEN ok THEN SQRT(sp2) END / 100.0, 6)
             AS sd_pooled,
           ROUND(d, 6) AS cohens_d,
           ROUND(d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 6)
             AS hedges_g
    FROM dd ORDER BY weekday
    """,
    doc="Cohen's d + Hedges' g standardized purchase-vs-click value "
    "difference per weekday (operators/relational.py:cohens_d) — "
    "the effect-SIZE rung power_mde CONSUMES to size an experiment "
    "and mann_whitney's rank shift can't give in value units. "
    "Per-class Σv/Σv² exact in DECIMAL(38,0)/HUGEINT off ONE "
    "conditional aggregate; scale cancels in d and g; the Γ-ratio "
    "small-sample correction is the closed 1−3/(4n−9) form",
)
def cohens_d_purchase_click_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import cohens_d

    ev = load_events(spark, sf_dir)
    frame = ev.select(
        F.weekday("ts").cast("long").alias("weekday"),
        "value",
        "event_type",
    )
    return cohens_d(
        frame, ["weekday"], "value", "event_type", "purchase", "click"
    )


@_q(
    "friedman_daily_types",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    q AS (
      SELECT day AS b, event_type AS t,
             CAST(ROUND(v * 1000000, 0) AS BIGINT) AS v
      FROM daily),
    kt AS (SELECT COUNT(DISTINCT t) AS k FROM q),
    cb AS (
      SELECT b FROM q GROUP BY b
      HAVING COUNT(*) = (SELECT k FROM kt)),
    base AS (SELECT q.* FROM q JOIN cb USING (b)),
    cells AS (
      SELECT b, v, CAST(COUNT(*) AS BIGINT) AS tv
      FROM base GROUP BY 1, 2),
    rk AS (
      SELECT b, v,
             2 * COALESCE(SUM(tv) OVER (PARTITION BY b ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + tv + 1 AS r2
      FROM cells),
    per_t AS (
      SELECT base.t, SUM(rk.r2::HUGEINT) AS r2sum,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM base JOIN rk ON base.b = rk.b AND base.v = rk.v
      GROUP BY 1),
    ties AS (
      SELECT SUM(tv::HUGEINT * tv * tv - tv) AS t3t FROM cells),
    ag AS (
      SELECT MAX(n) AS n_blocks,
             CAST(COUNT(*) AS BIGINT) AS k_treatments,
             SUM(CAST(CAST(r2sum * r2sum AS VARCHAR) AS DOUBLE)) AS rr4
      FROM per_t),
    m AS (
      SELECT n_blocks, k_treatments,
             CAST(n_blocks AS DOUBLE) AS n,
             CAST(k_treatments AS DOUBLE) AS k,
             rr4, CAST(CAST(t3t AS VARCHAR) AS DOUBLE) AS t3td
      FROM ag CROSS JOIN ties),
    st AS (
      SELECT n_blocks, k_treatments, n, k,
             12.0 / (n * k * (k + 1.0)) * (rr4 / 4.0)
               - 3.0 * n * (k + 1.0) AS chi2,
             1.0 - t3td / (n * k * (k * k - 1.0)) AS corr,
             n_blocks >= 1 AND k_treatments >= 2 AS ok
      FROM m)
    SELECT CAST(n_blocks AS BIGINT) AS n_blocks, k_treatments,
           ROUND(CASE WHEN ok THEN chi2 END, 6) AS chi2_f,
           ROUND(CASE WHEN ok AND corr > 0 THEN chi2 / corr END, 6)
             AS chi2_f_corrected
    FROM st
    """,
    doc="Friedman rank test of the five event types across matched "
    "day blocks (operators/relational.py:friedman_test) — the "
    "PAIRED k-sample rung next to kruskal (unpaired) and mcnemar "
    "(paired binary): within each day the k daily means are ranked; "
    "chi2_F asks whether any type consistently out-ranks. "
    "Mann-Whitney midrank identity applied BLOCKWISE ((2c+tv+1) "
    "exact 2x integers on (block, value) cells — the within-block "
    "window is k-bounded, millions of blocks parallelize); "
    "incomplete blocks dropped whole; tie correction in "
    "DECIMAL(38,0)/HUGEINT",
)
def friedman_daily_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import friedman_test

    daily = _daily_mean_frame(spark, sf_dir)
    return friedman_test(daily, "day", "event_type", "v")


@_q(
    "hill_tail_orders",
    """
    WITH base AS (
      SELECT o_orderpriority AS g,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders WHERE o_totalprice IS NOT NULL),
    pos AS (SELECT g, v FROM base WHERE v > 0),
    per_v AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS t
      FROM pos GROUP BY 1, 2),
    cum AS (
      SELECT g, v, t,
             COALESCE(SUM(t) OVER (PARTITION BY g ORDER BY v DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS above,
             SUM(t) OVER (PARTITION BY g) AS n
      FROM per_v),
    cut AS (
      SELECT g, v, n,
             LEAST(t, 200 - above) AS taken
      FROM cum WHERE above < 200),
    ag AS (
      SELECT g, CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(taken) AS BIGINT) AS n_taken,
             SUM(CAST(taken AS DOUBLE) * LN(CAST(v AS DOUBLE)))
               AS slnv,
             MIN(v) AS xk
      FROM cut GROUP BY 1),
    m AS (
      SELECT g, n, n_taken,
             CAST(xk AS DOUBLE) AS xkd,
             slnv / CAST(n_taken AS DOUBLE)
               - LN(CAST(xk AS DOUBLE)) AS excess
      FROM ag)
    SELECT g AS o_orderpriority, n, n_taken,
           ROUND(xkd / 100.0, 6) AS x_k,
           ROUND(CASE WHEN n_taken >= 2 AND excess > 0
                 THEN 1.0 / excess END, 6) AS hill_alpha,
           ROUND(excess, 6) AS log_mean_excess
    FROM m ORDER BY o_orderpriority
    """,
    doc="Hill power-law tail index over the 200 largest order values "
    "per priority (operators/relational.py:hill_tail_index) — the "
    "TAIL companion to zipf_vocab_fit's rank-frequency body and "
    "gumbel's block maxima: small alpha = heavy tail = a handful of "
    "orders dominate. The top-k cut rides the DISTINCT-value frame "
    "with deterministic tie SPLITTING (taken = min(t, k-above) — "
    "never row identity); n_taken, sum(taken*ln v) and x_k exact; "
    "no row-level top-k sort of the fact",
)
def hill_tail_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import hill_tail_index

    orders = load(spark, sf_dir, "orders")
    return hill_tail_index(
        orders.select(
            F.col("o_orderpriority").alias("o_orderpriority"),
            "o_totalprice",
        ),
        ["o_orderpriority"],
        "o_totalprice",
        k=200,
    )


@_q(
    "lorenz_customer_revenue",
    """
    WITH rev AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS r
      FROM orders GROUP BY o_custkey),
    q AS (SELECT CAST(ROUND(r * 100, 0) AS BIGINT) AS v FROM rev),
    per_v AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM q GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n,
             SUM(v::HUGEINT * t) AS total
      FROM per_v),
    cum AS (
      SELECT v, t,
             COALESCE(SUM(t) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS c
      FROM per_v),
    d10 AS (
      SELECT cum.*, tot.n, tot.total, dd.decile
      FROM cum CROSS JOIN tot
      CROSS JOIN (SELECT UNNEST(range(1, 11)) AS decile) dd),
    sl AS (
      SELECT decile, n, total,
             GREATEST(0, LEAST(c + t,
                 FLOOR(decile * n / 10.0))
               - GREATEST(c, FLOOR((decile - 1) * n / 10.0)))
               AS taken,
             v
      FROM d10),
    sliced AS (
      SELECT decile, n, total,
             CAST(SUM(taken) AS BIGINT) AS n_units,
             SUM(CAST(taken AS HUGEINT) * v) AS dsum
      FROM sl WHERE taken > 0 GROUP BY 1, 2, 3),
    sh AS (
      SELECT decile, n_units,
             CAST(CAST(dsum AS VARCHAR) AS DOUBLE) AS dsumd,
             CAST(CAST(total AS VARCHAR) AS DOUBLE) AS totald
      FROM sliced),
    fin AS (
      SELECT decile, n_units,
             ROUND(dsumd / 100.0, 6) AS total,
             ROUND(dsumd / totald, 6) AS share,
             SUM(dsumd / totald) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cs
      FROM sh)
    SELECT CAST(decile AS BIGINT) AS decile, n_units, total, share,
           ROUND(cs, 6) AS cum_share
    FROM fin ORDER BY decile
    """,
    doc="exact Lorenz curve of per-customer revenue at decile "
    "resolution (operators/relational.py:lorenz_deciles) — the "
    "CURVE behind gini_customer_revenue's scalar ('the bottom half "
    "holds 25%'). Equal-count deciles with integer boundaries "
    "floor(d*n/10); a tie block straddling a boundary SPLITS BY "
    "COUNT, never by row identity; per-decile sums exact in "
    "DECIMAL(38,0)/HUGEINT off the distinct-value frame (the "
    "gini/mann_whitney reduced-frame discipline); the 10-way "
    "explode touches the REDUCED frame only",
)
def lorenz_customer_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import lorenz_deciles

    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("r")
    )
    return lorenz_deciles(rev, "r")


@_q(
    "runs_test_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    q AS (
      SELECT event_type AS g, day AS o,
             CAST(ROUND(v * 1000000, 0) AS BIGINT) AS v
      FROM daily),
    per_v AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS t
      FROM q GROUP BY 1, 2),
    med AS (
      SELECT g, MIN(v) AS med FROM (
        SELECT g, v,
               SUM(t) OVER (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum,
               SUM(t) OVER (PARTITION BY g) AS n
        FROM per_v) WHERE cum * 2 >= n GROUP BY 1),
    signed AS (
      SELECT q.g, q.o,
             CASE WHEN q.v > med.med THEN 1 ELSE 0 END AS s
      FROM q JOIN med ON q.g = med.g
      WHERE q.v <> med.med),
    flips AS (
      SELECT g, s,
             CASE WHEN LAG(s) OVER (PARTITION BY g ORDER BY o)
                  IS DISTINCT FROM s THEN 1 ELSE 0 END AS newrun
      FROM signed),
    ag AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS n_above,
             CAST(COUNT(*) - SUM(s) AS BIGINT) AS n_below,
             CAST(SUM(newrun) AS BIGINT) AS runs
      FROM flips GROUP BY 1),
    m AS (
      SELECT g, n, n_above, n_below, runs,
             2.0 * n_above * n_below / CAST(n AS DOUBLE) + 1.0 AS mu
      FROM ag),
    mm AS (
      SELECT g, n, n_above, n_below, runs, mu,
             (mu - 1.0) * (mu - 2.0) / (CAST(n AS DOUBLE) - 1.0)
               AS var
      FROM m)
    SELECT g AS event_type, n, n_above, n_below, runs,
           ROUND(CASE WHEN n_above > 0 AND n_below > 0 AND var > 0
                 THEN (CAST(runs AS DOUBLE) - mu) / SQRT(var) END, 6)
             AS z
    FROM mm ORDER BY event_type
    """,
    doc="Wald-Wolfowitz runs test of the daily mean series per event "
    "type (operators/series.py:runs_test) — 'do the above/below-"
    "median signs cluster': too few runs = sticky regimes, too many "
    "= oscillation; the non-parametric cousin of durbin_watson "
    "needing no residual model. LOWER-median contract "
    "(brown_forsythe precedent), ties-with-median dropped "
    "(standard); signs exact off micro-quantized dailies; one lag "
    "window over the bounded rollup",
)
def runs_test_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import runs_test

    daily = _daily_mean_frame(spark, sf_dir)
    return runs_test(daily, ["event_type"], "day", "v")


@_q(
    "grubbs_values",
    """
    WITH base AS (
      SELECT event_type AS g,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    per_v AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS t
      FROM base GROUP BY 1, 2),
    mom AS (
      SELECT g, CAST(SUM(t) AS BIGINT) AS n,
             SUM(v::HUGEINT * t) AS s1,
             SUM((v::HUGEINT * v) * t) AS s2
      FROM per_v GROUP BY 1),
    m AS (
      SELECT g, n,
             CAST(n AS DOUBLE) AS nd,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS d1,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS d2
      FROM mom),
    mm AS (
      SELECT g, n, nd, d1 / nd AS mean_q,
             (d2 - d1 * d1 / nd) / (nd - 1.0) AS var_q
      FROM m),
    dev AS (
      SELECT p.g, p.v,
             ABS(CAST(p.v AS DOUBLE) - mm.mean_q) AS dv,
             mm.n, mm.mean_q, mm.var_q,
             ROW_NUMBER() OVER (PARTITION BY p.g
               ORDER BY ABS(CAST(p.v AS DOUBLE) - mm.mean_q) DESC,
                        p.v ASC) AS rn
      FROM per_v p JOIN mm ON p.g = mm.g),
    top AS (SELECT * FROM dev WHERE rn = 1),
    st AS (
      SELECT g, n, mean_q, var_q, v, dv,
             SQRT(GREATEST(var_q, 0.0)) AS sd_q,
             n >= 3 AND var_q > 0 AS ok
      FROM top)
    SELECT g AS event_type, n,
           ROUND(mean_q / 100.0, 6) AS mean,
           ROUND(CASE WHEN ok THEN sd_q END / 100.0, 6) AS sd,
           CAST(v AS DOUBLE) / 100.0 AS outlier_value,
           ROUND(CASE WHEN ok THEN dv / sd_q END, 6) AS g_stat
    FROM st ORDER BY event_type
    """,
    doc="Grubbs' single-outlier statistic per event type "
    "(operators/series.py:grubbs_statistic) — G = max|x-mean|/sd, "
    "'how many sample sd does the single worst value sit out': the "
    "parametric screen next to mad_outliers' robust fences, "
    "reporting the offending value. Moments exact off the "
    "(group, value) frame in DECIMAL(38,0)/HUGEINT; argmax on the "
    "DISTINCT-value frame with a smaller-value tiebreak; the fact "
    "is scanned once, no window over it",
)
def grubbs_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import grubbs_statistic

    ev = load_events(spark, sf_dir)
    return grubbs_statistic(ev, ["event_type"], "value")


@_q(
    "gumbel_weekly_max",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    q AS (
      SELECT event_type AS g,
             CAST(weekofyear(day) AS BIGINT) AS blk,
             CAST(ROUND(v * 1000000, 0) AS BIGINT) AS v
      FROM daily),
    bmax AS (
      SELECT g, blk, MAX(v) AS m FROM q GROUP BY 1, 2),
    ag AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             SUM(m::HUGEINT) AS s1,
             SUM(m::HUGEINT * m) AS s2
      FROM bmax GROUP BY 1),
    m AS (
      SELECT g, n_blocks,
             CAST(n_blocks AS DOUBLE) AS nd,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS d1,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS d2
      FROM ag),
    mm AS (
      SELECT g, n_blocks, nd, d1 / nd AS mean_q,
             (d2 - d1 * d1 / nd) / (nd - 1.0) AS var_q
      FROM m),
    fit AS (
      SELECT g, n_blocks, mean_q,
             SQRT(GREATEST(var_q, 0.0)) * 0.7796968012336793 AS beta,
             n_blocks >= 2 AND var_q > 0 AS ok
      FROM mm),
    fit2 AS (
      SELECT g, n_blocks, mean_q, beta, ok,
             mean_q - 0.5772156649015329 * beta AS loc
      FROM fit)
    SELECT g AS event_type, n_blocks,
           ROUND(mean_q / 1000000.0, 6) AS block_max_mean,
           ROUND(CASE WHEN ok THEN loc END / 1000000.0, 6)
             AS gumbel_loc,
           ROUND(CASE WHEN ok THEN beta END / 1000000.0, 6)
             AS gumbel_scale,
           ROUND(CASE WHEN ok THEN
             loc - beta * LN(-LN(1.0 - 1.0 / 52.0)) END / 1000000.0,
             6) AS return_level
    FROM fit2 ORDER BY event_type
    """,
    doc="Gumbel extreme-value fit on weekly maxima of the daily mean "
    "per event type (operators/series.py:gumbel_block_maxima) — "
    "method of moments (loc = mean − γ·β, β = s·√6/π, γ and √6/π "
    "injected literals) + the 52-week return level ('the weekly max "
    "you exceed about once a year') — the tail-risk rung next to "
    "hill_tail_orders. Block maxima exact (max of quantized "
    "micros); moments in DECIMAL(38,0)/HUGEINT; ONE block-max "
    "aggregate + one reduce, no window",
)
def gumbel_weekly_max_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import gumbel_block_maxima

    daily = _daily_mean_frame(spark, sf_dir)
    return gumbel_block_maxima(
        daily.withColumn("wk", F.weekofyear("day").cast("long")),
        ["event_type"],
        "wk",
        "v",
        return_period=52,
        scale=1_000_000,
    )


@_q(
    "imr_chart_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    lagd AS (
      SELECT event_type AS g, day AS o, v AS x,
             ABS(v - LAG(v) OVER (PARTITION BY event_type
                 ORDER BY day)) AS mr
      FROM daily),
    st AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(x) AS xbar,
             CAST(SUM(CAST(mr AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(mr) AS mrbar
      FROM lagd GROUP BY 1),
    j AS (
      SELECT l.g, l.o, l.x, st.n, st.xbar, st.mrbar,
             st.xbar - 2.66 * st.mrbar AS lcl,
             st.xbar + 2.66 * st.mrbar AS ucl
      FROM lagd l JOIN st ON l.g = st.g)
    SELECT g AS event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           ROUND(MAX(xbar), 6) AS center,
           ROUND(MAX(mrbar), 6) AS mr_mean,
           ROUND(MAX(lcl), 6) AS lcl,
           ROUND(MAX(ucl), 6) AS ucl,
           ROUND(MAX(3.267 * mrbar), 6) AS mr_ucl,
           CAST(SUM(CASE WHEN x < lcl OR x > ucl THEN 1 ELSE 0 END)
                AS BIGINT) AS n_breaches,
           MIN(CASE WHEN x < lcl OR x > ucl THEN o END)
             AS first_breach_at
    FROM j GROUP BY 1 ORDER BY event_type
    """,
    doc="individuals / moving-range (I-MR) Shewhart control chart of "
    "the daily mean per event type "
    "(operators/series.py:imr_control_chart) — center ± 2.66·MRbar "
    "natural process limits (2.66 = 3/d2 at subgroup 2; constants "
    "injected), MR upper limit 3.267·MRbar, breach count + first "
    "breach day: the SPC rung next to page_hinkley (sequential) and "
    "cusum (cumulative). xbar/MRbar ride exact DECIMAL(18,6) sums "
    "of the round-6 rollup; one lag window + one reduce + one "
    "breach pass, all rollup-sized",
)
def imr_chart_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import imr_control_chart

    daily = _daily_mean_frame(spark, sf_dir)
    return imr_control_chart(daily, ["event_type"], "day", "v")


@_q(
    "cochran_doc_rules",
    """
    WITH base AS (
      SELECT lang,
             CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS r1,
             CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS r2,
             CASE WHEN len(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) >= 45 THEN 1 ELSE 0 END
               AS r3
      FROM documents),
    ag AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r1) AS BIGINT) AS fires_len150,
             CAST(SUM(r2) AS BIGINT) AS fires_len250,
             CAST(SUM(r3) AS BIGINT) AS fires_words45,
             CAST(SUM(r1 + r2 + r3) AS BIGINT) AS t,
             CAST(SUM((r1 + r2 + r3) * (r1 + r2 + r3)) AS BIGINT)
               AS r2sum
      FROM base GROUP BY 1),
    m AS (
      SELECT lang, n, fires_len150, fires_len250, fires_words45,
             CAST(t AS DOUBLE) AS td, CAST(r2sum AS DOUBLE) AS r2d,
             CAST(fires_len150 AS DOUBLE) AS c1,
             CAST(fires_len250 AS DOUBLE) AS c2,
             CAST(fires_words45 AS DOUBLE) AS c3
      FROM ag),
    st AS (
      SELECT lang, n, fires_len150, fires_len250, fires_words45,
             (c1 - td / 3.0) * (c1 - td / 3.0)
             + (c2 - td / 3.0) * (c2 - td / 3.0)
             + (c3 - td / 3.0) * (c3 - td / 3.0) AS num,
             3.0 * td - r2d AS den
      FROM m)
    SELECT lang, n, CAST(3 AS BIGINT) AS k_rules,
           fires_len150, fires_len250, fires_words45,
           ROUND(CASE WHEN den > 0 THEN 6.0 * num / den END, 6)
             AS cochran_q
    FROM st ORDER BY lang
    """,
    doc="Cochran's Q across three paired document-quality rules "
    "(n_chars>=150, n_chars>=250, words>=45) per language "
    "(operators/classify.py:cochran_q) — the k-rule extension of "
    "mcnemar_doc_rules (k=2 reduces to McNemar uncorrected): 'do "
    "these k filters fire at genuinely different rates on the SAME "
    "rows'. All cells exact off ONE conditional aggregate; rows "
    "where every rule agrees drop out of the denominator naturally; "
    "k(k-1)=6 injected",
)
def cochran_doc_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import cochran_q
    from .operators.text import normalize_text_col

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        (F.col("n_chars") >= 150).alias("len150"),
        (F.col("n_chars") >= 250).alias("len250"),
        (
            F.size(F.split(normalize_text_col("text"), " ")) >= 45
        ).alias("words45"),
    )
    return cochran_q(base, ["lang"], ["len150", "len250", "words45"])


@_q(
    "fightin_words_sources",
    """
    WITH toks AS (
      SELECT source AS g,
             unnest(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS tok
      FROM documents),
    counts AS (
      SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS y
      FROM toks WHERE length(tok) > 0 GROUP BY 1, 2),
    tok_tot AS (
      SELECT tok, CAST(SUM(y) AS BIGINT) AS yw FROM counts GROUP BY 1),
    grp_tot AS (
      SELECT g, CAST(SUM(y) AS BIGINT) AS ns FROM counts GROUP BY 1),
    n_tot AS (SELECT CAST(SUM(yw) AS BIGINT) AS n FROM tok_tot),
    j AS (
      SELECT c.g, c.tok, c.y, t.yw, s.ns, n.n,
             100.0 * CAST(t.yw AS DOUBLE) / CAST(n.n AS DOUBLE) AS aw
      FROM counts c
      JOIN tok_tot t ON c.tok = t.tok
      JOIN grp_tot s ON c.g = s.g
      CROSS JOIN n_tot n),
    sc AS (
      SELECT g, tok, y, yw - y AS yr, ns, n, aw,
             LN((CAST(y AS DOUBLE) + aw)
                / (CAST(ns AS DOUBLE) + 100.0
                   - CAST(y AS DOUBLE) - aw))
             - LN((CAST(yw - y AS DOUBLE) + aw)
                  / (CAST(n - ns AS DOUBLE) + 100.0
                     - CAST(yw - y AS DOUBLE) - aw)) AS delta,
             1.0 / (CAST(y AS DOUBLE) + aw)
             + 1.0 / (CAST(yw - y AS DOUBLE) + aw) AS var
      FROM j),
    zr AS (
      SELECT g AS source, tok AS token,
             y AS count_in, CAST(yr AS BIGINT) AS count_rest,
             ROUND(delta, 6) AS delta_logodds,
             ROUND(delta / SQRT(var), 6) AS zscore
      FROM sc),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY zscore DESC, token ASC) AS rn
      FROM zr)
    SELECT source, token, count_in, count_rest, delta_logodds,
           zscore
    FROM rk WHERE rn <= 3
    ORDER BY source, zscore DESC, token
    """,
    doc="Monroe-Colaresi-Quinn 'Fightin' Words' token enrichment — "
    "top-3 tokens per source by the informative-Dirichlet log-odds "
    "z (operators/text.py:fightin_words; Political Analysis 16(4) "
    "2008 §3.5.2) — the statistically-grounded replacement for "
    "tfidf_top_terms when comparing SOURCES: the corpus-rate prior "
    "(alpha0=100 injected) shrinks low-count noise so z means the "
    "same thing at 10 counts and 10k. Counts exact off one "
    "(source, token) aggregate; rest = totals − own (no self-join); "
    "per-source top-k on round-6 z with a token tiebreak",
)
def fightin_words_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import fightin_words

    docs = load(spark, sf_dir, "documents")
    return fightin_words(
        docs, "source", "text", prior_strength=100.0, top_k=3
    )


# ---------------------------------------------------------------------------
# round-10 wave 6: distribution tests, experiment audits, matched designs
# ---------------------------------------------------------------------------


@_q(
    "ad2_click_error",
    """
    WITH base AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'error')),
    per_v AS (
      SELECT v, CAST(SUM(a) AS BIGINT) AS fa,
             CAST(COUNT(*) AS BIGINT) AS l
      FROM base GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(fa) AS BIGINT) AS na,
             CAST(SUM(l) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_values
      FROM per_v),
    cum AS (
      SELECT v, fa, l,
             COALESCE(SUM(fa) OVER w, 0) AS cfa,
             COALESCE(SUM(l) OVER w, 0) AS cl
      FROM per_v
      WINDOW w AS (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    terms AS (
      SELECT t.na, t.n - t.na AS nb, t.n, t.n_values,
             c.l,
             2 * c.cfa + c.fa AS m2a,
             2 * c.cl + c.l AS b2
      FROM cum c CROSS JOIN tot t),
    terms2 AS (
      SELECT na, nb, n, n_values, l, b2,
             n::HUGEINT * m2a - na::HUGEINT * b2 AS num_a,
             n::HUGEINT * (b2 - m2a) - nb::HUGEINT * b2 AS num_b,
             b2::HUGEINT * (2 * n - b2) - n::HUGEINT * l AS den
      FROM terms),
    summed AS (
      SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
             MAX(n_values) AS n_values, MAX(n) AS n,
             SUM(CASE WHEN den > 0 THEN
               CAST(l AS DOUBLE)
               * (CAST(CAST(num_a * num_a AS VARCHAR) AS DOUBLE)
                    / CAST(na AS DOUBLE)
                  + CAST(CAST(num_b * num_b AS VARCHAR) AS DOUBLE)
                    / CAST(nb AS DOUBLE))
               / (CAST(n AS DOUBLE)
                  * CAST(CAST(den AS VARCHAR) AS DOUBLE))
             ELSE 0.0 END) AS s
      FROM terms2)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_values AS BIGINT) AS n_values,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 AND n_values >= 2
                 THEN (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)
                      * s END, 6) AS a2
    FROM summed
    """,
    doc="tie-adjusted two-sample Anderson-Darling (Scholz-Stephens "
    "A2_akN, k=2) between click and error values "
    "(operators/relational.py:anderson_darling_two_sample) — the "
    "distribution-equality rung that weights the TAILS where "
    "ks_value_drift's max-gap is tail-blind and cvm integrates "
    "uniformly. Midrank quantities in 2x integer units on the "
    "DISTINCT pooled frame; every numerator/denominator an exact "
    "DECIMAL(38,0)/HUGEINT ((N·M2)^2 ~ 4N^4 inside 38 digits to "
    "N~1e9); one prefix window + one reduce",
)
def ad2_click_error_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import anderson_darling_two_sample

    ev = load_events(spark, sf_dir)
    return anderson_darling_two_sample(
        ev.filter(F.col("event_type").isin("click", "error")).select(
            "value", "event_type"
        ),
        "value",
        "event_type",
        "click",
    )


@_q(
    "dunn_posthoc_values",
    """
    WITH base AS (
      SELECT event_type AS c,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    cells AS (
      SELECT c, v, CAST(COUNT(*) AS BIGINT) AS f
      FROM base GROUP BY 1, 2),
    per_v AS (
      SELECT v, CAST(SUM(f) AS BIGINT) AS tv FROM cells GROUP BY 1),
    rv AS (
      SELECT v,
             2 * COALESCE(SUM(tv) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + tv + 1 AS r2
      FROM per_v),
    per_c AS (
      SELECT cells.c, CAST(SUM(cells.f) AS BIGINT) AS n,
             SUM(cells.f::HUGEINT * rv.r2) AS r2sum
      FROM cells JOIN rv ON cells.v = rv.v GROUP BY 1),
    gstats AS (
      SELECT CAST(SUM(tv) AS BIGINT) AS nn,
             SUM(tv::HUGEINT * tv * tv - tv) AS t3t
      FROM per_v),
    pairs AS (
      SELECT a.c AS class_a, b.c AS class_b,
             a.n AS n_a, b.n AS n_b,
             a.r2sum AS ra, b.r2sum AS rb, g.nn, g.t3t
      FROM per_c a JOIN per_c b ON a.c < b.c CROSS JOIN gstats g),
    m AS (
      SELECT class_a, class_b, n_a, n_b,
             CAST(CAST(ra AS VARCHAR) AS DOUBLE)
               / (2.0 * CAST(n_a AS DOUBLE)) AS ra_bar,
             CAST(CAST(rb AS VARCHAR) AS DOUBLE)
               / (2.0 * CAST(n_b AS DOUBLE)) AS rb_bar,
             (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
              - CAST(CAST(t3t AS VARCHAR) AS DOUBLE)
                / (CAST(nn AS DOUBLE) - 1.0)) / 12.0 AS sigma2
      FROM pairs)
    SELECT class_a, class_b, n_a, n_b,
           ROUND(ra_bar, 6) AS mean_rank_a,
           ROUND(rb_bar, 6) AS mean_rank_b,
           ROUND(CASE WHEN sigma2 > 0 THEN (ra_bar - rb_bar)
                 / SQRT(sigma2 * (1.0 / n_a + 1.0 / n_b)) END, 6)
             AS z
    FROM m ORDER BY class_a, class_b
    """,
    doc="Dunn's post-hoc pairwise rank z for all C(5,2) event-type "
    "pairs (operators/relational.py:dunn_test) — WHICH classes "
    "differ once kruskal_event_values says 'some class differs'; "
    "tie-corrected Dunn variance, raw z (no multiplicity correction "
    "baked in — k is visible for Bonferroni/Holm). Mann-Whitney "
    "midrank discipline: 2x rank sums exact DECIMAL(38,0)/HUGEINT "
    "on the DISTINCT-value frame; the pair join touches the k-row "
    "class frame only",
)
def dunn_posthoc_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import dunn_test

    ev = load_events(spark, sf_dir)
    return dunn_test(
        ev.select("value", "event_type"), "value", "event_type"
    )


@_q(
    "srm_user_arms",
    """
    WITH obs AS (
      SELECT CAST(user_id % 4 AS VARCHAR) AS arm,
             CAST(COUNT(*) AS BIGINT) AS n_observed
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_observed) AS BIGINT) AS n FROM obs),
    ex AS (
      SELECT * FROM (VALUES ('0', 0.25), ('1', 0.25), ('2', 0.25),
                            ('3', 0.25)) AS t(arm, expected_share)),
    j AS (
      SELECT obs.arm, obs.n_observed, ex.expected_share, tot.n
      FROM obs JOIN ex USING (arm) CROSS JOIN tot)
    SELECT arm, n_observed,
           ROUND(expected_share, 6) AS expected_share,
           ROUND(CAST(n_observed AS DOUBLE) / n, 6) AS observed_share,
           ROUND((n_observed - n * expected_share)
                 / (n * expected_share), 6) AS rel_dev,
           ROUND((n_observed - n * expected_share)
                 * (n_observed - n * expected_share)
                 / (n * expected_share), 6) AS chi2_term
    FROM j ORDER BY arm
    """,
    doc="sample-ratio-mismatch audit of a 4-arm user_id%4 assignment "
    "against the designed 25% shares "
    "(operators/relational.py:srm_check) — the FIRST thing an "
    "experiment readout checks before ab_experiment_readout's "
    "effect math means anything: per-arm chi2 terms (sum = the SRM "
    "statistic, dof k-1) plus relative deviations showing WHICH arm "
    "leaks. Designed shares are injected literals; an arm present "
    "in data but absent from the design raises in-plan rather than "
    "vanishing. ONE count aggregate",
)
def srm_user_arms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import srm_check

    ev = load_events(spark, sf_dir)
    return srm_check(
        ev.select((F.col("user_id") % 4).cast("string").alias("arm")),
        "arm",
        {"0": 0.25, "1": 0.25, "2": 0.25, "3": 0.25},
    )


@_q(
    "poisson_rate_halves",
    """
    WITH base AS (
      SELECT event_type,
             day(ts) <= 15 AS w1,
             CAST(ts AS DATE) AS d
      FROM events),
    ag AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN w1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN w1 THEN 0 ELSE 1 END) AS BIGINT) AS c2,
             CAST(COUNT(DISTINCT CASE WHEN w1 THEN d END) AS BIGINT)
               AS t1,
             CAST(COUNT(DISTINCT CASE WHEN NOT w1 THEN d END)
                  AS BIGINT) AS t2
      FROM base GROUP BY 1)
    SELECT event_type, c1, c2, t1, t2,
           ROUND(CASE WHEN t1 > 0 THEN CAST(c1 AS DOUBLE) / t1 END, 6)
             AS rate1,
           ROUND(CASE WHEN t2 > 0 THEN CAST(c2 AS DOUBLE) / t2 END, 6)
             AS rate2,
           ROUND(CASE WHEN c2 > 0 AND t1 > 0 AND t2 > 0 THEN
             (CAST(c1 AS DOUBLE) / t1) / (CAST(c2 AS DOUBLE) / t2)
             END, 6) AS rate_ratio,
           ROUND(CASE WHEN c1 > 0 AND c2 > 0 AND t1 > 0 AND t2 > 0
             THEN LN((CAST(c1 AS DOUBLE) / t1)
                     / (CAST(c2 AS DOUBLE) / t2))
                  / SQRT(1.0 / c1 + 1.0 / c2) END, 6) AS z
    FROM ag ORDER BY event_type
    """,
    doc="two-window Poisson rate comparison per event type (first "
    "vs second half of the month, exposure = distinct active days) "
    "(operators/relational.py:poisson_two_rate) — 'did the event "
    "RATE change', the count-process companion to "
    "cohens_d_purchase_click's mean shift: rate ratio + Wald z on "
    "the log ratio (1/c1 + 1/c2 variance); zero counts -> NULL z "
    "(the caller falls back to an exact binomial). ONE aggregate "
    "with conditional counts + conditional COUNT DISTINCTs",
)
def poisson_rate_halves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import poisson_two_rate

    ev = load_events(spark, sf_dir)
    return poisson_two_rate(
        ev.select(
            "event_type",
            (F.dayofmonth("ts") <= 15).alias("w1"),
            F.to_date("ts").alias("d"),
        ),
        ["event_type"],
        "w1",
        "d",
    )


@_q(
    "cem_urgent_orders",
    """
    WITH base AS (
      SELECT o_orderpriority = '1-URGENT' AS t,
             CAST(FLOOR(o_totalprice / 100000) AS BIGINT) AS pb,
             CAST(isodow(o_orderdate) - 1 AS BIGINT) AS wd
      FROM orders),
    per_s AS (
      SELECT pb, wd,
             CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
               AS n_treated,
             CAST(SUM(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT)
               AS n_control
      FROM base GROUP BY 1, 2),
    matched AS (
      SELECT * FROM per_s WHERE n_treated > 0 AND n_control > 0),
    tot AS (
      SELECT CAST(SUM(n_treated) AS BIGINT) AS ta,
             CAST(SUM(n_control) AS BIGINT) AS ca
      FROM per_s),
    ktot AS (
      SELECT CAST(SUM(n_treated) AS BIGINT) AS tk,
             CAST(SUM(n_control) AS BIGINT) AS ck
      FROM matched)
    SELECT m.pb, m.wd, m.n_treated, m.n_control,
           ROUND(CAST(m.n_treated AS DOUBLE) / m.n_control
                 * (CAST(k.ck AS DOUBLE) / k.tk), 6)
             AS control_weight,
           CAST(t.ta - k.tk AS BIGINT) AS pruned_treated,
           CAST(t.ca - k.ck AS BIGINT) AS pruned_control
    FROM matched m CROSS JOIN tot t CROSS JOIN ktot k
    ORDER BY pb, wd
    """,
    doc="Coarsened Exact Matching strata + control weights for "
    "urgent-vs-rest orders over (100k-price-bin, weekday) strata "
    "(operators/relational.py:cem_match; Iacus-King-Porro) — the "
    "design-based selection-bias control upstream of any "
    "treated-vs-control readout: strata lacking either group are "
    "pruned (visibly — pruned_* columns), surviving controls "
    "weighted (n_t/n_c)·(C_kept/T_kept) so the weighted control "
    "covariate distribution matches the treated exactly at the "
    "stratum grain. ONE (strata, treatment) aggregate; weights "
    "single divisions of exact integers",
)
def cem_urgent_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import cem_match

    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        (F.col("o_orderpriority") == "1-URGENT").alias("t"),
        F.floor(F.col("o_totalprice") / 100000).cast("long").alias("pb"),
        F.weekday("o_orderdate").cast("long").alias("wd"),
    )
    return cem_match(base, "t", ["pb", "wd"])


@_q(
    "pettitt_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    q AS (
      SELECT event_type AS g, day AS o,
             CAST(ROUND(v * 1000000, 0) AS BIGINT) AS v
      FROM daily),
    per_v AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS tv
      FROM q GROUP BY 1, 2),
    rv AS (
      SELECT g, v,
             2 * COALESCE(SUM(tv) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + tv + 1 AS r2
      FROM per_v),
    u AS (
      SELECT q.g, q.o,
             SUM(rv.r2::HUGEINT) OVER (PARTITION BY q.g ORDER BY q.o
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - ROW_NUMBER() OVER (PARTITION BY q.g ORDER BY q.o)
               ::HUGEINT
               * (COUNT(*) OVER (PARTITION BY q.g) + 1) AS uu,
             COUNT(*) OVER (PARTITION BY q.g) AS n
      FROM q JOIN rv ON q.g = rv.g AND q.v = rv.v),
    top AS (
      SELECT g, o, uu, n,
             ROW_NUMBER() OVER (PARTITION BY g
               ORDER BY ABS(uu) DESC, o ASC) AS rn
      FROM u)
    SELECT g AS event_type, CAST(n AS BIGINT) AS n,
           ROUND(CASE WHEN n >= 2 THEN
             ABS(CAST(CAST(uu AS VARCHAR) AS DOUBLE)) END, 6)
             AS k_stat,
           o AS change_at,
           ROUND(CASE WHEN n >= 2 THEN
             CAST(CAST(uu AS VARCHAR) AS DOUBLE) END, 6)
             AS u_at_change
    FROM top WHERE rn = 1 ORDER BY event_type
    """,
    doc="Pettitt rank change-point test on the daily mean series per "
    "event type (operators/series.py:pettitt_test) — the RANK-based "
    "single change-point locator next to sse_changepoint_daily "
    "(mean/SSE split, outlier-sensitive) and cusum: U_t = 2·sum "
    "prefix midranks − t(N+1) (exact under ties via midranks — "
    "tied pairs contribute 0 to the sgn double sum), K = max|U_t|, "
    "earliest-t tiebreak. 2x midranks exact integers off the "
    "distinct frame; one time-prefix window over the bounded rollup",
)
def pettitt_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import pettitt_test

    daily = _daily_mean_frame(spark, sf_dir)
    return pettitt_test(daily, ["event_type"], "day", "v")


@_q(
    "ols_influence_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    pts AS (
      SELECT event_type AS g,
             CAST(day(day) AS BIGINT) AS x, v AS y
      FROM daily),
    mom AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS DECIMAL(18,0))) AS sx,
             SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
               AS sxx,
             SUM(CAST(y AS DECIMAL(18,6))) AS sy,
             SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,6)))
               AS sxy,
             SUM(CAST(CAST(y AS DECIMAL(18,6))
                 * CAST(y AS DECIMAL(18,6)) AS DECIMAL(28,12))) AS syy
      FROM pts GROUP BY 1),
    m AS (
      SELECT g, n, CAST(n AS DOUBLE) AS nd,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dx,
             CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dxx,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS dy,
             CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dxy,
             CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS dyy
      FROM mom),
    fit AS (
      SELECT g, n, nd, dx / nd AS xbar,
             dxx - dx * dx / nd AS ssx,
             dyy - dy * dy / nd AS ssy,
             dxy - dx * dy / nd AS spxy, dx, dy
      FROM m),
    fit2 AS (
      SELECT g, n, nd, xbar, ssx,
             spxy / ssx AS beta,
             dy / nd - spxy / ssx * xbar AS alpha,
             (ssy - spxy / ssx * spxy) / (nd - 2.0) AS s2
      FROM fit),
    pt AS (
      SELECT p.g, p.x, p.y,
             p.y - (f.alpha + f.beta * p.x) AS e,
             1.0 / f.nd + (p.x - f.xbar) * (p.x - f.xbar) / f.ssx
               AS h,
             f.s2, f.n
      FROM pts p JOIN fit2 f ON p.g = f.g
      WHERE f.n > 2),
    scored AS (
      SELECT g, x, y,
             ROUND(e, 6) AS residual,
             ROUND(h, 6) AS leverage,
             ROUND(CASE WHEN s2 > 0 THEN
               e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) END, 6)
               AS cooks_d
      FROM pt),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY g
               ORDER BY cooks_d DESC NULLS LAST, x ASC) AS rn
      FROM scored)
    SELECT g AS event_type, x, y, residual, leverage, cooks_d
    FROM rk WHERE rn <= 3
    ORDER BY event_type, cooks_d DESC, x
    """,
    doc="OLS influence diagnostics on the daily trend fit per event "
    "type — top-3 days by Cook's distance with leverage and "
    "residual (operators/series.py:ols_influence) — 'which single "
    "day is dragging the slope', the diagnostic rung behind "
    "ols_order_value: h = 1/n + (x−x̄)²/Sxx, D = e²h/(2s²(1−h)²). "
    "Integer x + round-6 y make every moment an exact DECIMAL sum; "
    "per-point terms identical doubles; round-6 D rank with an x "
    "tiebreak",
)
def ols_influence_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import ols_influence

    daily = _daily_mean_frame(spark, sf_dir)
    return ols_influence(
        daily.withColumn("x", F.dayofmonth("day").cast("long")),
        ["event_type"],
        "x",
        "v",
        top_k=3,
    )


@_q(
    "seasonal_strength_events",
    f"""
    WITH r AS MATERIALIZED ({_DAILY_ROLLUP_SQL}),
    base AS (
      SELECT event_type, day, v,
             CASE WHEN COUNT(v) OVER w = 7
                  THEN ROUND(AVG(v) OVER w, 6) END AS trend,
             CAST((((day - DATE '1970-01-01') % 7) + 7) % 7
                  AS BIGINT) AS phase
      FROM r
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY (day - DATE '1970-01-01')
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (SELECT *, v - trend AS dt FROM base),
    sr AS (
      SELECT event_type, phase,
             ROUND(ROUND(SUM(dt), 6) / COUNT(dt), 6) AS s_raw
      FROM det GROUP BY 1, 2),
    sa AS (
      SELECT event_type, phase,
             ROUND(s_raw
                   - ROUND(SUM(s_raw) OVER (PARTITION BY event_type), 6)
                     / COUNT(s_raw) OVER (PARTITION BY event_type),
                   6) AS s
      FROM sr),
    comp AS (
      SELECT d.event_type, d.trend AS trend, sa.s AS seasonal,
             ROUND(d.v - d.trend - sa.s, 6) AS remainder
      FROM det d LEFT JOIN sa
        ON sa.event_type = d.event_type AND sa.phase = d.phase
      WHERE d.trend IS NOT NULL),
    ag AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_interior,
             SUM(CAST(remainder AS DECIMAL(18,6))) AS s_r,
             SUM(CAST(remainder * remainder AS DECIMAL(28,12)))
               AS q_r,
             SUM(CAST(seasonal + remainder AS DECIMAL(18,6))) AS s_sr,
             SUM(CAST((seasonal + remainder) * (seasonal + remainder)
                 AS DECIMAL(28,12))) AS q_sr,
             SUM(CAST(trend + remainder AS DECIMAL(18,6))) AS s_tr,
             SUM(CAST((trend + remainder) * (trend + remainder)
                 AS DECIMAL(28,12))) AS q_tr
      FROM comp GROUP BY 1),
    m AS (
      SELECT event_type, n_interior,
             CAST(n_interior AS DOUBLE) AS nd,
             (CAST(CAST(q_r AS VARCHAR) AS DOUBLE)
              - CAST(CAST(s_r AS VARCHAR) AS DOUBLE)
                * CAST(CAST(s_r AS VARCHAR) AS DOUBLE)
                / CAST(n_interior AS DOUBLE))
               / CAST(n_interior AS DOUBLE) AS vr,
             (CAST(CAST(q_sr AS VARCHAR) AS DOUBLE)
              - CAST(CAST(s_sr AS VARCHAR) AS DOUBLE)
                * CAST(CAST(s_sr AS VARCHAR) AS DOUBLE)
                / CAST(n_interior AS DOUBLE))
               / CAST(n_interior AS DOUBLE) AS vsr,
             (CAST(CAST(q_tr AS VARCHAR) AS DOUBLE)
              - CAST(CAST(s_tr AS VARCHAR) AS DOUBLE)
                * CAST(CAST(s_tr AS VARCHAR) AS DOUBLE)
                / CAST(n_interior AS DOUBLE))
               / CAST(n_interior AS DOUBLE) AS vtr
      FROM ag)
    SELECT event_type, n_interior,
           ROUND(CASE WHEN n_interior >= 2 AND vsr > 0
                 THEN GREATEST(0.0, 1.0 - vr / vsr) END, 6)
             AS seasonal_strength,
           ROUND(CASE WHEN n_interior >= 2 AND vtr > 0
                 THEN GREATEST(0.0, 1.0 - vr / vtr) END, 6)
             AS trend_strength
    FROM m ORDER BY event_type
    """,
    doc="Hyndman seasonal/trend strength per event type off the "
    "classical decomposition "
    "(operators/series.py:decomposition_strength) — F_s = max(0, 1 "
    "− Var(R)/Var(S+R)), F_t likewise with trend: 'how much of this "
    "series is actually seasonal vs noise', the scalar that decides "
    "whether seasonal_naive_backtest is even the right baseline. "
    "Rides seasonal_decompose_events' oracle decomposition verbatim "
    "(honest NULL-trend edges excluded); variances off exact "
    "DECIMAL(18,6)/(28,12) sums over the bounded interior",
)
def seasonal_strength_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import decomposition_strength

    ev = load_events(spark, sf_dir)
    rollup = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    return decomposition_strength(
        rollup, ["event_type"], "day", "v", period=7
    )


# ---------------------------------------------------------------------------
# round-10 wave 7: LLM-curation audits, agreement, distributional effects
# ---------------------------------------------------------------------------


@_q(
    "gopher_quality_docs",
    """
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents),
    feat AS (
      SELECT doc_id, t,
             CAST(len(list_filter(string_split(t, ' '),
                  w -> length(w) > 0)) AS BIGINT) AS n_words,
             CAST(len(list_filter(string_split(t, ' '),
                  w -> regexp_matches(w, '[a-z]'))) AS BIGINT)
               AS n_alpha,
             CAST(len(string_split(t, '#')) - 1
                  + len(string_split(t, '...')) - 1 AS BIGINT)
               AS n_sym
      FROM norm),
    m AS (
      SELECT doc_id, n_words,
             CASE WHEN n_words > 0 THEN
               CAST(length(t) - (n_words - 1) AS DOUBLE) / n_words
             END AS mwl,
             CASE WHEN n_words > 0 THEN
               CAST(n_sym AS DOUBLE) / n_words END AS symr,
             CASE WHEN n_words > 0 THEN
               CAST(n_alpha AS DOUBLE) / n_words END AS alphar
      FROM feat),
    flags AS (
      SELECT doc_id, n_words,
             ROUND(mwl, 6) AS mean_word_len,
             ROUND(symr, 6) AS symbol_word_ratio,
             ROUND(alphar, 6) AS alpha_word_ratio,
             n_words >= 50 AND n_words <= 100000 AS pass_min_words,
             COALESCE(mwl >= 3.0 AND mwl <= 10.0, FALSE)
               AS pass_word_len,
             COALESCE(symr <= 0.1, FALSE) AS pass_symbol_ratio,
             COALESCE(alphar >= 0.8, FALSE) AS pass_alpha_ratio
      FROM m)
    SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
           alpha_word_ratio, pass_min_words, pass_word_len,
           pass_symbol_ratio, pass_alpha_ratio,
           pass_min_words AND pass_word_len AND pass_symbol_ratio
             AND pass_alpha_ratio AS pass_all
    FROM flags ORDER BY doc_id
    """,
    doc="Gopher-style rule-based document quality flags (Rae et al. "
    "2021 Table A1, the repeatable subset) "
    "(operators/curation.py:gopher_quality_flags) — the classic "
    "pre-filter every LLM pipeline runs before any learned scorer: "
    "word-count window, mean-word-length window, symbol/word ratio, "
    "alphabetic-word ratio, composite pass. Thresholds injected "
    "(GOPHER_RULES literals); empty docs FAIL min_words rather than "
    "NULL (a filter must decide). Pure column expressions over one "
    "scan — zero shuffles, codegen-friendly",
)
def gopher_quality_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import gopher_quality_flags

    docs = load(spark, sf_dir, "documents")
    out = gopher_quality_flags(docs, "doc_id", "text")
    return out.orderBy("doc_id")


@_q(
    "ess_doclen_weights",
    """
    WITH w AS (
      SELECT source,
             CAST(ROUND(n_chars * 1000000, 0) AS BIGINT) AS v
      FROM documents WHERE n_chars IS NOT NULL),
    ag AS (
      SELECT source,
             CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n,
             CAST(SUM(CASE WHEN v > 0 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dropped,
             SUM(CASE WHEN v > 0 THEN v::HUGEINT END) AS s1,
             SUM(CASE WHEN v > 0 THEN v::HUGEINT * v END) AS s2,
             MAX(CASE WHEN v > 0 THEN v END) AS wmax
      FROM w GROUP BY 1),
    m AS (
      SELECT source, n, n_dropped,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS d1,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS d2,
             CAST(wmax AS DOUBLE) AS wm
      FROM ag)
    SELECT source, n, n_dropped,
           ROUND(CASE WHEN n > 0 THEN d1 / 1000000.0 END, 6)
             AS sum_weight,
           ROUND(CASE WHEN n > 0 THEN d1 * d1 / d2 END, 6) AS ess,
           ROUND(CASE WHEN n > 0 THEN d1 * d1 / d2 / n END, 6)
             AS ess_ratio,
           ROUND(CASE WHEN n > 0 THEN wm / d1 END, 6)
             AS max_weight_share
    FROM m ORDER BY source
    """,
    doc="Kish effective sample size of document-length sampling "
    "weights per source "
    "(operators/curation.py:effective_sample_size) — the audit "
    "between computing weights (DSIR, CEM, mixture epochs) and "
    "trusting anything weighted by them: ESS = (Σw)²/Σw², "
    "ess_ratio = ESS/n ('your 1M weighted rows carry 50k rows of "
    "information'), plus the largest single weight's share (the "
    "one-row-dominates tell). Σw/Σw² exact in "
    "DECIMAL(38,0)/HUGEINT off ONE aggregate; unit cancels",
)
def ess_doclen_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import effective_sample_size

    docs = load(spark, sf_dir, "documents")
    return effective_sample_size(
        docs.select("source", F.col("n_chars").alias("w")),
        ["source"],
        "w",
    )


@_q(
    "ngram_novelty_split",
    """
    WITH grams AS (
      SELECT doc_id % 2 = 1 AS is_test, g.gram
      FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')), ' ') AS arr
        FROM documents) d,
      LATERAL (
        SELECT arr[u.i] || ' ' || arr[u.i + 1] || ' ' || arr[u.i + 2]
                 AS gram
        FROM unnest(range(1, len(arr) - 1)) AS u(i)
        WHERE length(arr[u.i]) > 0 AND length(arr[u.i + 1]) > 0
          AND length(arr[u.i + 2]) > 0) g),
    train_g AS (
      SELECT DISTINCT gram FROM grams WHERE NOT is_test),
    test_counts AS (
      SELECT gram, CAST(COUNT(*) AS BIGINT) AS c
      FROM grams WHERE is_test GROUP BY 1),
    unseen AS (
      SELECT t.gram, t.c FROM test_counts t
      LEFT JOIN train_g tr ON t.gram = tr.gram
      WHERE tr.gram IS NULL),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS test_grams,
             CAST(SUM(c) AS BIGINT) AS test_occurrences
      FROM test_counts),
    un AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS unseen_grams,
             CAST(COALESCE(SUM(c), 0) AS BIGINT)
               AS unseen_occurrences
      FROM unseen)
    SELECT test_grams, unseen_grams,
           ROUND(CASE WHEN test_grams > 0 THEN
             CAST(unseen_grams AS DOUBLE) / test_grams END, 6)
             AS novelty,
           test_occurrences, unseen_occurrences,
           ROUND(CASE WHEN test_occurrences > 0 THEN
             CAST(unseen_occurrences AS DOUBLE) / test_occurrences
             END, 6) AS novelty_weighted
    FROM tot CROSS JOIN un
    """,
    doc="trigram novelty of the odd-doc_id half against the even "
    "half (operators/curation.py:ngram_novelty) — the memorization/"
    "coverage audit decontaminate's boolean hit-test doesn't give: "
    "what FRACTION of held-out n-grams never appear in training "
    "(near 0 = the eval quotes the train set; near 1 = "
    "out-of-domain), distinct-gram and occurrence-weighted rates. "
    "Spark joins on xxhash64 of the gram (vocabulary-sized frames, "
    "one LEFT ANTI join); the oracle joins the gram strings — "
    "identical counts absent a 64-bit collision",
)
def ngram_novelty_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curation import ngram_novelty

    docs = load(spark, sf_dir, "documents")
    return ngram_novelty(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "text",
        n=3,
    )


@_q(
    "fleiss_doc_rules",
    """
    WITH ratings AS (
      SELECT doc_id AS i,
             CASE WHEN n_chars >= 150 THEN 'pass' ELSE 'fail' END AS c
      FROM documents
      UNION ALL
      SELECT doc_id,
             CASE WHEN n_chars >= 250 THEN 'pass' ELSE 'fail' END
      FROM documents
      UNION ALL
      SELECT doc_id,
             CASE WHEN len(string_split(trim(regexp_replace(
                 lower(text), '\\s+', ' ', 'g')), ' ')) >= 45
               THEN 'pass' ELSE 'fail' END
      FROM documents),
    nij AS (
      SELECT i, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM ratings GROUP BY 1, 2),
    per_i AS (
      SELECT i, CAST(SUM(n) AS BIGINT) AS r,
             CAST(SUM(n * n) AS BIGINT) AS sq
      FROM nij GROUP BY 1),
    items AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(MAX(r) AS BIGINT) AS n_raters,
             SUM(CAST(sq - r AS DOUBLE)
                 / (CAST(r AS DOUBLE) * (r - 1))) AS psum
      FROM per_i),
    cats AS (
      SELECT c, CAST(SUM(n) AS BIGINT) AS cn FROM nij GROUP BY 1),
    cat_stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_categories,
             CAST(SUM(cn) AS BIGINT) AS total,
             SUM(CAST(cn AS DOUBLE) * CAST(cn AS DOUBLE)) AS csq
      FROM cats),
    m AS (
      SELECT n_items, n_raters, k_categories,
             psum / n_items AS p_bar,
             csq / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
               AS p_e
      FROM items CROSS JOIN cat_stats)
    SELECT n_items, n_raters, k_categories,
           ROUND(p_bar, 6) AS p_bar,
           ROUND(p_e, 6) AS p_e,
           ROUND(CASE WHEN p_e < 1.0 THEN (p_bar - p_e) / (1.0 - p_e)
                 END, 6) AS fleiss_kappa
    FROM m
    """,
    doc="Fleiss' kappa across three document-quality 'raters' (the "
    "cochran rules as votes) (operators/classify.py:fleiss_kappa) — "
    "the k-rater agreement rung above cohens_kappa (2 raters): the "
    "audit for 3+ annotator or model-as-judge labeling runs. "
    "Constant-r design enforced in-plan (unequal rater counts "
    "RAISE, not bias); all n_ij exact off two aggregates; the "
    "N-sized P̄ fold is a mean (order ulps ~1e-16·√N relative)",
)
def fleiss_doc_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import fleiss_kappa
    from .operators.text import normalize_text_col

    docs = load(spark, sf_dir, "documents")
    p = F.when
    r1 = docs.select(
        F.col("doc_id").alias("i"),
        p(F.col("n_chars") >= 150, "pass").otherwise("fail").alias("c"),
    )
    r2 = docs.select(
        F.col("doc_id").alias("i"),
        p(F.col("n_chars") >= 250, "pass").otherwise("fail").alias("c"),
    )
    r3 = docs.select(
        F.col("doc_id").alias("i"),
        p(
            F.size(F.split(normalize_text_col("text"), " ")) >= 45,
            "pass",
        )
        .otherwise("fail")
        .alias("c"),
    )
    return fleiss_kappa(r1.union(r2).union(r3), "i", "c")


@_q(
    "qte_purchase_click",
    """
    WITH base AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1
                  WHEN event_type = 'click' THEN 0 END AS t,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events
      WHERE value IS NOT NULL
        AND event_type IN ('purchase', 'click')),
    per_v AS (
      SELECT t, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2),
    cum AS (
      SELECT t, v,
             SUM(c) OVER (PARTITION BY t ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cm,
             SUM(c) OVER (PARTITION BY t) AS n
      FROM per_v),
    ps AS (SELECT UNNEST([0.25, 0.5, 0.75]) AS p),
    q AS (
      SELECT t, p, MIN(v) AS q, MAX(n) AS n
      FROM cum CROSS JOIN ps
      WHERE cm >= CEIL(p * n)
      GROUP BY 1, 2)
    SELECT ROUND(CAST(tq.p AS DOUBLE), 6) AS p,
           CAST(tq.n AS BIGINT) AS n_t,
           CAST(cq.n AS BIGINT) AS n_c,
           ROUND(CAST(tq.q AS DOUBLE) / 100.0, 6) AS q_treated,
           ROUND(CAST(cq.q AS DOUBLE) / 100.0, 6) AS q_control,
           ROUND(CAST(tq.q AS DOUBLE) / 100.0
                 - CAST(cq.q AS DOUBLE) / 100.0, 6) AS qte
    FROM (SELECT * FROM q WHERE t = 1) tq
    FULL JOIN (SELECT * FROM q WHERE t = 0) cq ON tq.p = cq.p
    ORDER BY p
    """,
    doc="quantile treatment effect of purchase vs click values at "
    "p = .25/.5/.75 "
    "(operators/relational.py:quantile_treatment_effect) — the "
    "DISTRIBUTIONAL effect readout where cohens_d only moves the "
    "mean ('the median gained nothing, the p75 lost 4.30'). LOWER-"
    "quantile contract (sorted element at ceil(p·n) — exact and "
    "engine-agnostic, brown_forsythe's median generalized); ps "
    "injected; quantiles off exact cumulative counts on the "
    "DISTINCT-value frame",
)
def qte_purchase_click_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import quantile_treatment_effect

    ev = load_events(spark, sf_dir)
    return quantile_treatment_effect(
        ev.select("value", "event_type"),
        "value",
        "event_type",
        "purchase",
        "click",
    )


@_q(
    "shapley_channels",
    """
    WITH conv AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY 1),
    touches AS (
      SELECT DISTINCT e.user_id, e.event_type AS ch
      FROM events e WHERE e.event_type <> 'purchase'),
    journeys AS (
      SELECT t.user_id,
             BIT_OR(CASE t.ch WHEN 'click' THEN 1 WHEN 'error' THEN 2
                    WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END)
               AS mask,
             MAX(c.converted) AS conv
      FROM touches t JOIN conv c ON t.user_id = c.user_id
      GROUP BY 1),
    sets AS (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS nc
      FROM journeys GROUP BY 1),
    coal AS (SELECT UNNEST(range(0, 16)) AS s),
    ch AS (
      SELECT * FROM (VALUES ('click', 1), ('error', 2),
                            ('signup', 4), ('view', 8))
             AS t(channel, b)),
    pairs AS (
      SELECT coal.s, ch.channel, ch.b,
             ((coal.s >> 0) & 1) + ((coal.s >> 1) & 1)
             + ((coal.s >> 2) & 1) + ((coal.s >> 3) & 1) AS pc
      FROM coal CROSS JOIN ch WHERE (coal.s & ch.b) = 0),
    terms AS (
      SELECT p.channel,
             CASE p.pc WHEN 0 THEN 0.25 WHEN 1 THEN 1.0 / 12.0
                       WHEN 2 THEN 1.0 / 12.0 WHEN 3 THEN 0.25 END
             * (COALESCE(CAST(vsc.nc AS DOUBLE) / vsc.n, 0.0)
                - COALESCE(CAST(vs.nc AS DOUBLE) / vs.n, 0.0))
               AS term
      FROM pairs p
      LEFT JOIN sets vs ON vs.mask = p.s
      LEFT JOIN sets vsc ON vsc.mask = p.s + p.b),
    phi AS (
      SELECT channel, SUM(term) AS phi FROM terms GROUP BY 1),
    touched AS (
      SELECT ch.channel, CAST(COUNT(*) AS BIGINT) AS touched_journeys
      FROM journeys j JOIN ch ON (j.mask & ch.b) <> 0
      GROUP BY 1),
    pt AS (
      SELECT SUM(CASE WHEN phi > 0 THEN phi END) AS ptot FROM phi)
    SELECT p.channel,
           COALESCE(t.touched_journeys, 0) AS touched_journeys,
           ROUND(p.phi, 6) AS shapley_value,
           ROUND(CASE WHEN pt.ptot > 0 THEN
             GREATEST(p.phi, 0.0) / pt.ptot END, 6) AS shapley_share
    FROM phi p LEFT JOIN touched t ON p.channel = t.channel
    CROSS JOIN pt
    ORDER BY p.channel
    """,
    doc="exact Shapley-value channel attribution over per-user touch "
    "sets, conversion = purchase "
    "(operators/attribution.py:shapley_attribution; Zhao-Mahboobi-"
    "Moeini 2018) — the game-theoretic rung above multitouch's "
    "rule-based credits: v(S) = conversion rate of journeys whose "
    "touched set is exactly S (unobserved sets v=0, standard), "
    "phi from the factorial-weighted coalition sweep. ONE journey "
    "aggregate + a 2^k·k broadcast coalition frame (k=4 here; "
    "max_channels fail-fast guards the 2^k blowup). The four "
    "factorial weights and the channel->bit map are injected "
    "identically into both plans",
)
def shapley_channels_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.attribution import shapley_attribution

    ev = load_events(spark, sf_dir)
    conv = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "__cv"
        )
    )
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
        .join(conv, "user_id")
        .withColumn("converted", F.col("__cv") == 1)
    )
    return shapley_attribution(
        touches, "user_id", "channel", "converted"
    )


# ---------------------------------------------------------------------------
# round-10 wave 8: the parametric k-sample family (post-hoc + omnibus)
# ---------------------------------------------------------------------------

_CLASS_MOMENTS_SQL = """
      SELECT event_type AS c,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)::HUGEINT) AS s1,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)::HUGEINT
                 * CAST(ROUND(value * 100, 0) AS BIGINT)) AS s2
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1
"""


@_q(
    "tukey_hsd_values",
    f"""
    WITH mom AS ({_CLASS_MOMENTS_SQL}),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                 - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                   * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE)) AS ssw
      FROM mom),
    pairs AS (
      SELECT a.c AS class_a, b.c AS class_b,
             a.n AS n_a, b.n AS n_b,
             CAST(CAST(a.s1 AS VARCHAR) AS DOUBLE)
               / CAST(a.n AS DOUBLE) AS ma,
             CAST(CAST(b.s1 AS VARCHAR) AS DOUBLE)
               / CAST(b.n AS DOUBLE) AS mb,
             t.nn, t.k, t.ssw
      FROM mom a JOIN mom b ON a.c < b.c CROSS JOIN tot t),
    m AS (
      SELECT class_a, class_b, n_a, n_b, ma, mb,
             ssw / (CAST(nn AS DOUBLE) - k) AS mse,
             CAST(nn - k AS DOUBLE) AS dfree,
             n_a >= 2 AND n_b >= 2
               AND ssw / (CAST(nn AS DOUBLE) - k) > 0 AS ok
      FROM pairs),
    mm AS (
      SELECT class_a, class_b, n_a, n_b, ma, mb, dfree, ok,
             SQRT(mse / 2.0 * (1.0 / n_a + 1.0 / n_b)) AS se
      FROM m)
    SELECT class_a, class_b, n_a, n_b,
           ROUND(ma / 100.0, 6) AS mean_a,
           ROUND(mb / 100.0, 6) AS mean_b,
           ROUND((ma - mb) / 100.0, 6) AS diff,
           ROUND(CASE WHEN ok THEN se END / 100.0, 6) AS se,
           ROUND(CASE WHEN ok THEN ABS(ma - mb) / se END, 6)
             AS q_stat,
           ROUND(CASE WHEN ok THEN dfree END, 6) AS df
    FROM mm ORDER BY class_a, class_b
    """,
    doc="Tukey HSD studentized-range q for all C(5,2) event-type "
    "pairs (operators/relational.py:pairwise_mean_tests, "
    "method='tukey') — the MEAN-based post-hoc next to "
    "dunn_posthoc_values' rank z: pooled within-class MSE, q = "
    "|diff|/sqrt(MSE/2·(1/ni+1/nj)), df = N−k; no critical value "
    "(the range-distribution lookup is the caller's). Per-class "
    "moments exact DECIMAL(38,0)/HUGEINT off ONE aggregate; the "
    "pair join touches the k-row class frame",
)
def tukey_hsd_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import pairwise_mean_tests

    ev = load_events(spark, sf_dir)
    return pairwise_mean_tests(
        ev.select("value", "event_type"), "value", "event_type", "tukey"
    )


@_q(
    "games_howell_values",
    f"""
    WITH mom AS ({_CLASS_MOMENTS_SQL}),
    pairs AS (
      SELECT a.c AS class_a, b.c AS class_b,
             a.n AS n_a, b.n AS n_b,
             CAST(CAST(a.s1 AS VARCHAR) AS DOUBLE)
               / CAST(a.n AS DOUBLE) AS ma,
             CAST(CAST(b.s1 AS VARCHAR) AS DOUBLE)
               / CAST(b.n AS DOUBLE) AS mb,
             (CAST(CAST(a.s2 AS VARCHAR) AS DOUBLE)
              - CAST(CAST(a.s1 AS VARCHAR) AS DOUBLE)
                * CAST(CAST(a.s1 AS VARCHAR) AS DOUBLE)
                / CAST(a.n AS DOUBLE)) / (CAST(a.n AS DOUBLE) - 1.0)
               AS va,
             (CAST(CAST(b.s2 AS VARCHAR) AS DOUBLE)
              - CAST(CAST(b.s1 AS VARCHAR) AS DOUBLE)
                * CAST(CAST(b.s1 AS VARCHAR) AS DOUBLE)
                / CAST(b.n AS DOUBLE)) / (CAST(b.n AS DOUBLE) - 1.0)
               AS vb
      FROM mom a JOIN mom b ON a.c < b.c),
    m AS (
      SELECT class_a, class_b, n_a, n_b, ma, mb, va, vb,
             (va / n_a + vb / n_b) / 2.0 AS se2,
             (va / n_a + vb / n_b) * (va / n_a + vb / n_b)
             / (va * va / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1.0))
                + vb * vb / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1.0)))
               AS dfree,
             n_a >= 2 AND n_b >= 2
               AND (va / n_a + vb / n_b) / 2.0 > 0 AS ok
      FROM pairs)
    SELECT class_a, class_b, n_a, n_b,
           ROUND(ma / 100.0, 6) AS mean_a,
           ROUND(mb / 100.0, 6) AS mean_b,
           ROUND((ma - mb) / 100.0, 6) AS diff,
           ROUND(CASE WHEN ok THEN SQRT(se2) END / 100.0, 6) AS se,
           ROUND(CASE WHEN ok THEN ABS(ma - mb) / SQRT(se2) END, 6)
             AS q_stat,
           ROUND(CASE WHEN ok THEN dfree END, 6) AS df
    FROM m ORDER BY class_a, class_b
    """,
    doc="Games-Howell pairwise q with per-pair Welch-Satterthwaite "
    "df (operators/relational.py:pairwise_mean_tests, "
    "method='games_howell') — the unequal-variance standard where "
    "tukey_hsd_values' pooled MSE assumes homoscedasticity "
    "(bartlett/brown_forsythe decide which applies). Same exact "
    "moment machinery; q = |diff|/sqrt((vi/ni+vj/nj)/2)",
)
def games_howell_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import pairwise_mean_tests

    ev = load_events(spark, sf_dir)
    return pairwise_mean_tests(
        ev.select("value", "event_type"),
        "value",
        "event_type",
        "games_howell",
    )


@_q(
    "welch_anova_values",
    f"""
    WITH mom AS ({_CLASS_MOMENTS_SQL}),
    good AS (
      SELECT c, n,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
               / CAST(n AS DOUBLE) AS m,
             (CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
              - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
               AS var,
             n >= 2 AND
             (CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
              - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                / CAST(n AS DOUBLE)) > 0 AS ok
      FROM mom),
    st AS (
      SELECT CAST(SUM(CASE WHEN ok THEN n END) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
               AS k_classes,
             CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
               AS k_dropped,
             SUM(CASE WHEN ok THEN n / var END) AS sw,
             SUM(CASE WHEN ok THEN n / var * m END) AS swm
      FROM good),
    terms AS (
      SELECT st.n, st.k_classes, st.k_dropped,
             SUM(g.n / g.var * (g.m - st.swm / st.sw)
                 * (g.m - st.swm / st.sw)) AS num,
             SUM((1.0 - (g.n / g.var) / st.sw)
                 * (1.0 - (g.n / g.var) / st.sw)
                 / (CAST(g.n AS DOUBLE) - 1.0)) AS lam
      FROM good g CROSS JOIN st
      WHERE g.ok GROUP BY 1, 2, 3),
    m AS (
      SELECT n, k_classes, k_dropped, num, lam,
             CAST(k_classes AS DOUBLE) AS k
      FROM terms)
    SELECT n, k_classes, k_dropped,
           ROUND(CASE WHEN k_classes >= 2 THEN
             (num / (k - 1.0))
             / (1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * lam) END, 6)
             AS w_stat,
           CAST(k_classes - 1 AS BIGINT) AS df1,
           ROUND(CASE WHEN k_classes >= 2 AND lam > 0 THEN
             (k * k - 1.0) / (3.0 * lam) END, 6) AS df2
    FROM m
    """,
    doc="Welch's heteroscedastic one-way ANOVA across the five event "
    "types (operators/relational.py:welch_anova) — the omnibus "
    "equal-means test WITHOUT the equal-variance assumption "
    "anova_event_values makes (and brown_forsythe tests): "
    "variance-weighted means, Satterthwaite df2. Degenerate classes "
    "(n<2 or zero variance) are excluded VISIBLY (k_dropped) — an "
    "Inf weight would silently poison the statistic. Exact moment "
    "machinery; k-row arithmetic",
)
def welch_anova_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import welch_anova

    ev = load_events(spark, sf_dir)
    return welch_anova(ev.select("value", "event_type"), "value", "event_type")


@_q(
    "bartlett_values",
    f"""
    WITH mom AS ({_CLASS_MOMENTS_SQL}),
    ssf AS (
      SELECT c, n,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
             - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
               * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
               / CAST(n AS DOUBLE) AS ss
      FROM mom),
    ag AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k_classes,
             SUM(ss) AS ssw,
             SUM((CAST(n AS DOUBLE) - 1.0)
                 * LN(ss / (CAST(n AS DOUBLE) - 1.0))) AS slnv,
             SUM(1.0 / (CAST(n AS DOUBLE) - 1.0)) AS sinv
      FROM ssf),
    m AS (
      SELECT n, k_classes,
             CAST(n AS DOUBLE) AS nd, CAST(k_classes AS DOUBLE) AS k,
             ssw, slnv, sinv
      FROM ag)
    SELECT n, k_classes,
           ROUND(CASE WHEN k_classes >= 2 THEN
             ((nd - k) * LN(ssw / (nd - k)) - slnv)
             / (1.0 + (sinv - 1.0 / (nd - k)) / (3.0 * (k - 1.0)))
             END, 6) AS chi2_stat,
           CAST(k_classes - 1 AS BIGINT) AS dof
    FROM m
    """,
    doc="Bartlett's equal-variance test across the five event types "
    "(operators/relational.py:bartlett_test) — the parametric, "
    "more-powerful counterpart to brown_forsythe_values (use "
    "Bartlett when jarque_bera says the tails are sane): chi2 = "
    "[(N−k)ln s_p² − Σ(ni−1)ln si²]/C, dof k−1. Zero-variance or "
    "n<2 classes RAISE in-plan (ln diverges; silently dropping one "
    "changes the hypothesis). Exact moment machinery; scale cancels "
    "inside the log differences",
)
def bartlett_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import bartlett_test

    ev = load_events(spark, sf_dir)
    return bartlett_test(
        ev.select("value", "event_type"), "value", "event_type"
    )


# ---------------------------------------------------------------------------
# round-10 wave 9: ratio-metric inference, robust two-sample, survival
# summaries, probabilistic linkage
# ---------------------------------------------------------------------------


@_q(
    "delta_ratio_segment",
    """
    WITH per_c AS (
      SELECT c.c_mktsegment AS seg,
             CAST(ROUND(SUM(o_totalprice) * 1000000, 0) AS BIGINT)
               AS x,
             CAST(ROUND(COUNT(*) * 1000000, 0) AS BIGINT) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY seg, o.o_custkey),
    ag AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x::HUGEINT) AS sx, SUM(y::HUGEINT) AS sy,
             SUM(x::HUGEINT * x) AS sxx, SUM(y::HUGEINT * y) AS syy,
             SUM(x::HUGEINT * y) AS sxy
      FROM per_c GROUP BY 1),
    m AS (
      SELECT seg, n, CAST(n AS DOUBLE) AS nd,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dx,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS dy,
             CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dxx,
             CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS dyy,
             CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dxy,
             sy <> 0 AND n >= 2 AS ok
      FROM ag),
    mm AS (
      SELECT seg, n, ok, dx / dy AS r, dy / nd AS my,
             (dxx - dx * dx / nd) / (nd - 1.0) AS vx,
             (dyy - dy * dy / nd) / (nd - 1.0) AS vy,
             (dxy - dx * dy / nd) / (nd - 1.0) AS cxy, nd
      FROM m),
    st AS (
      SELECT seg, n, ok, r,
             SQRT(GREATEST((vx + r * r * vy - 2.0 * r * cxy)
                           / (nd * my * my), 0.0)) AS se
      FROM mm)
    SELECT seg AS c_mktsegment, n,
           ROUND(CASE WHEN ok THEN r END, 6) AS ratio,
           ROUND(CASE WHEN ok THEN se END, 6) AS se,
           ROUND(CASE WHEN ok THEN r - 1.959963984540054 * se END, 6)
             AS ci_lo,
           ROUND(CASE WHEN ok THEN r + 1.959963984540054 * se END, 6)
             AS ci_hi
    FROM st ORDER BY c_mktsegment
    """,
    doc="delta-method CI for revenue-per-order per market segment "
    "with CUSTOMER-level clustering "
    "(operators/relational.py:delta_method_ratio) — the variance a "
    "ratio-of-sums metric actually has: r = Σx/Σy over per-customer "
    "(revenue, order-count) pairs, Var(r) ≈ (σx² + r²σy² − "
    "2r·σxy)/(nȳ²) — the covariance term per-unit correlation makes "
    "mandatory and a naive per-row average silently drops. All five "
    "sums exact DECIMAL(38,0)/HUGEINT off ONE aggregate; z "
    "injected (NORMAL_QUANTILES)",
)
def delta_ratio_segment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import delta_method_ratio

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    per_c = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum("o_totalprice").alias("x"),
            F.count("*").cast("double").alias("y"),
        )
    )
    return delta_method_ratio(per_c, ["c_mktsegment"], "x", "y")


@_q(
    "yuen_purchase_click",
    """
    WITH base AS (
      SELECT event_type = 'purchase' AS a,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')),
    per_v AS (
      SELECT a, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2),
    run AS (
      SELECT a, v, c,
             SUM(c) OVER (PARTITION BY a ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER (PARTITION BY a) AS n
      FROM per_v),
    run2 AS (
      SELECT *, CAST(FLOOR(n * 0.2) AS BIGINT) AS g FROM run),
    lo AS (
      SELECT a, MIN(v) AS lo FROM run2 WHERE cum >= g + 1 GROUP BY 1),
    hi AS (
      SELECT a, MIN(v) AS hi FROM run2 WHERE cum >= n - g GROUP BY 1),
    j AS (
      SELECT r.*, lo.lo, hi.hi,
             GREATEST(LEAST(r.v, hi.hi), lo.lo) AS wv
      FROM run2 r JOIN lo ON r.a = lo.a JOIN hi ON r.a = hi.a),
    ag AS (
      SELECT a, MAX(n) AS nn, MAX(g) AS gg,
             MAX(lo) AS blo, MAX(hi) AS bhi,
             SUM(c::HUGEINT * wv) AS sw,
             SUM(c::HUGEINT * (wv::HUGEINT * wv)) AS sww,
             SUM(CASE WHEN v < lo THEN c::HUGEINT * v END)
               AS sum_below,
             SUM(CASE WHEN v < lo THEN c END) AS cnt_below,
             SUM(CASE WHEN v > hi THEN c::HUGEINT * v END)
               AS sum_above,
             SUM(CASE WHEN v > hi THEN c END) AS cnt_above,
             SUM(c::HUGEINT * v) AS stot
      FROM j GROUP BY 1),
    m AS (
      SELECT a, nn, gg,
             CAST(nn AS DOUBLE) AS nd, CAST(gg AS DOUBLE) AS gd,
             CAST(nn AS DOUBLE) - 2.0 * gg AS h,
             (COALESCE(CAST(CAST(sum_below AS VARCHAR) AS DOUBLE), 0.0)
              + (gg - COALESCE(cnt_below, 0)) * CAST(blo AS DOUBLE))
               AS low_g,
             (COALESCE(CAST(CAST(sum_above AS VARCHAR) AS DOUBLE), 0.0)
              + (gg - COALESCE(cnt_above, 0)) * CAST(bhi AS DOUBLE))
               AS high_g,
             CAST(CAST(stot AS VARCHAR) AS DOUBLE) AS stotd,
             (CAST(CAST(sww AS VARCHAR) AS DOUBLE)
              - CAST(CAST(sw AS VARCHAR) AS DOUBLE)
                * CAST(CAST(sw AS VARCHAR) AS DOUBLE)
                / CAST(nn AS DOUBLE)) / (CAST(nn AS DOUBLE) - 1.0)
               AS sw2
      FROM ag),
    sides AS (
      SELECT a, nn, gg, h,
             (stotd - low_g - high_g) / h AS tm,
             (nd - 1.0) * sw2 / (h * (h - 1.0)) AS d
      FROM m),
    pair AS (
      SELECT ta.nn AS n_a, tb.nn AS n_b, ta.gg AS g_a, tb.gg AS g_b,
             ta.tm AS tma, tb.tm AS tmb,
             ta.d AS da, tb.d AS db, ta.h AS ha, tb.h AS hb
      FROM (SELECT * FROM sides WHERE a) ta
      CROSS JOIN (SELECT * FROM sides WHERE NOT a) tb)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(g_a AS BIGINT) AS g_a, CAST(g_b AS BIGINT) AS g_b,
           ROUND(tma / 100.0, 6) AS trimmed_mean_a,
           ROUND(tmb / 100.0, 6) AS trimmed_mean_b,
           ROUND((tma - tmb) / 100.0, 6) AS diff,
           ROUND(CASE WHEN ha >= 2 AND hb >= 2 AND da + db > 0 THEN
             (tma - tmb) / SQRT(da + db) END, 6) AS t_stat,
           ROUND(CASE WHEN ha >= 2 AND hb >= 2 AND da + db > 0 THEN
             (da + db) * (da + db)
             / (da * da / (ha - 1.0) + db * db / (hb - 1.0)) END, 6)
             AS df
    FROM pair
    """,
    doc="Yuen's 20%-trimmed two-sample test, purchase vs click "
    "values (operators/relational.py:yuen_trimmed_test) — the "
    "ROBUST Welch t for the heavy tails jarque_bera_values flags: "
    "trimmed means + winsorized variances, Satterthwaite df. "
    "Positional trim rides the DISTINCT-value frame (boundary = "
    "running-count crossing; value-clamping equals positional "
    "winsorization exactly; boundary tie mass splits BY COUNT — the "
    "hill/lorenz discipline); all sums DECIMAL(38,0)/HUGEINT",
)
def yuen_purchase_click_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import yuen_trimmed_test

    ev = load_events(spark, sf_dir)
    return yuen_trimmed_test(
        ev.select("value", "event_type"),
        "value",
        "event_type",
        "purchase",
        "click",
        trim=0.2,
    )


@_q(
    "km_summary_segments",
    """
    WITH span AS (
      SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
      FROM orders GROUP BY 1),
    g AS (SELECT MAX(o_orderdate) AS m FROM orders),
    subj AS (
      SELECT c.c_mktsegment AS seg,
             CAST(CAST(span.l AS DATE) - CAST(span.f AS DATE)
                  AS BIGINT) AS t,
             (CAST(g.m AS DATE) - CAST(span.l AS DATE)) > 90 AS obs
      FROM span JOIN customer c ON c.c_custkey = span.o_custkey
      CROSS JOIN g),
    counts AS (
      SELECT seg, t,
             SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS d,
             SUM(CASE WHEN obs THEN 0 ELSE 1 END) AS cc
      FROM subj GROUP BY 1, 2),
    c2 AS (
      SELECT seg, t, d, cc,
             SUM(d + cc) OVER (PARTITION BY seg)
               - COALESCE(SUM(d + cc) OVER (PARTITION BY seg ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS n
      FROM counts),
    c3 AS (SELECT *, 1 - CAST(d AS DOUBLE) / n AS f FROM c2),
    c4 AS (
      SELECT *,
             SUM(CASE WHEN f <= 0 THEN 1 ELSE 0 END) OVER w AS zeros,
             SUM(CASE WHEN f > 0 THEN ln(f) END) OVER w AS slnf
      FROM c3
      WINDOW w AS (PARTITION BY seg ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    curve AS (
      SELECT seg, t, d, cc,
             CASE WHEN zeros > 0 THEN 0.0
                  ELSE ROUND(EXP(slnf), 6) END AS survival
      FROM c4),
    seg2 AS (
      SELECT seg, t, d, d + cc AS subj, survival,
             LEAD(t) OVER (PARTITION BY seg ORDER BY t) AS tnext,
             FIRST_VALUE(t) OVER (PARTITION BY seg ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS tfirst,
             MAX(t) OVER (PARTITION BY seg) AS tmax
      FROM curve),
    ag AS (
      SELECT seg,
             CAST(SUM(subj) AS BIGINT) AS n_subjects,
             CAST(SUM(d) AS BIGINT) AS n_events,
             MIN(CASE WHEN survival <= 0.5 THEN t END) AS median_t,
             SUM(CAST(survival AS DECIMAL(18,6))
                 * CAST(tnext - t AS DECIMAL(18,0))) AS area,
             MAX(tfirst) AS t0,
             CAST(MAX(tmax) AS BIGINT) AS horizon_t
      FROM seg2 GROUP BY 1)
    SELECT seg AS c_mktsegment, n_subjects, n_events,
           CAST(median_t AS BIGINT) AS median_t,
           ROUND(COALESCE(CAST(CAST(area AS VARCHAR) AS DOUBLE), 0.0)
                 + CAST(t0 AS DOUBLE), 6) AS rmst,
           horizon_t
    FROM ag ORDER BY c_mktsegment
    """,
    doc="median survival + restricted mean survival time per market "
    "segment off the Kaplan-Meier curve "
    "(operators/relational.py:km_summary) — the two SCALARS a "
    "lifetime readout reports where km_survival_segments gives the "
    "curve: median = first t with S(t) <= 0.5 (NULL when most "
    "survive the horizon — a fact, not imputed), RMST = area under "
    "the step curve to the last observed time (the horizon-honest "
    "expected lifetime). Rides the round-6 curve verbatim; "
    "rectangles = round-6 S x integer days in exact DECIMAL(28,6)",
)
def km_summary_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import km_summary

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    span = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"), F.max("o_orderdate").alias("l")
    )
    gmax = orders.agg(F.max("o_orderdate").alias("m"))
    subj = (
        span.join(customer, span.o_custkey == customer.c_custkey)
        .crossJoin(F.broadcast(gmax))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.datediff(F.col("l"), F.col("f")).cast("long").alias("t"),
            (F.datediff(F.col("m"), F.col("l")) > 90).alias("obs"),
        )
    )
    return km_summary(subj, ["seg"], "t", "obs").withColumnRenamed(
        "seg", "c_mktsegment"
    )


@_q(
    "fs_linkage_parts",
    """
    WITH p AS (
      SELECT p_partkey, p_brand, p_type, p_size,
             CAST(FLOOR(p_retailprice / 10) AS BIGINT) AS pb,
             string_split(p_type, ' ')[1] AS tw
      FROM part),
    pairs AS (
      SELECT a.p_type = b.p_type AS is_match,
             a.p_size = b.p_size AS agree_size,
             a.pb = b.pb AS agree_price10,
             a.tw = b.tw AS agree_typeword
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
    wide AS (
      SELECT CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
               AS nm,
             CAST(SUM(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT)
               AS nu,
             CAST(SUM(CASE WHEN is_match AND agree_size THEN 1
                      ELSE 0 END) AS BIGINT) AS am_size,
             CAST(SUM(CASE WHEN NOT is_match AND agree_size THEN 1
                      ELSE 0 END) AS BIGINT) AS au_size,
             CAST(SUM(CASE WHEN is_match AND agree_price10 THEN 1
                      ELSE 0 END) AS BIGINT) AS am_pb,
             CAST(SUM(CASE WHEN NOT is_match AND agree_price10 THEN 1
                      ELSE 0 END) AS BIGINT) AS au_pb,
             CAST(SUM(CASE WHEN is_match AND agree_typeword THEN 1
                      ELSE 0 END) AS BIGINT) AS am_tw,
             CAST(SUM(CASE WHEN NOT is_match AND agree_typeword THEN 1
                      ELSE 0 END) AS BIGINT) AS au_tw
      FROM pairs),
    melted AS (
      SELECT 'agree_price10' AS field, nm, nu, am_pb AS am,
             au_pb AS au FROM wide
      UNION ALL
      SELECT 'agree_size', nm, nu, am_size, au_size FROM wide
      UNION ALL
      SELECT 'agree_typeword', nm, nu, am_tw, au_tw FROM wide),
    m AS (
      SELECT field, nm, nu, am, au,
             CAST(am AS DOUBLE) / nm AS mr,
             CAST(au AS DOUBLE) / nu AS ur
      FROM melted)
    SELECT field, nm AS n_match, nu AS n_unmatch,
           am AS agree_match, au AS agree_unmatch,
           ROUND(CASE WHEN nm > 0 AND nu > 0 THEN mr END, 6) AS m,
           ROUND(CASE WHEN nm > 0 AND nu > 0 THEN ur END, 6) AS u,
           ROUND(CASE WHEN am > 0 AND au > 0 THEN
             (LN(mr) - LN(ur)) / 0.6931471805599453 END, 6)
             AS w_agree,
           ROUND(CASE WHEN nm > am AND nu > au THEN
             (LN(1.0 - mr) - LN(1.0 - ur)) / 0.6931471805599453
             END, 6) AS w_disagree
    FROM m ORDER BY field
    """,
    doc="Fellegi-Sunter linkage weights over brand-blocked part "
    "pairs, truth = same p_type, fields = size / price-decade / "
    "first type-word agreement "
    "(operators/dedup.py:fellegi_sunter_weights; Fellegi-Sunter "
    "1969) — the probabilistic-linkage rung above the module's "
    "threshold rules: per field m = P(agree|match), u = "
    "P(agree|non-match), log2 agreement/disagreement weights. The "
    "readout DEMONSTRATES field selection: the type-word field "
    "carries m = 1 and a strong positive weight while size/price "
    "agree at their random rates (m ≈ u, weights ≈ 0) — exactly "
    "what F-S is for. Blocked pair frame (the module discipline) + "
    "ONE conditional aggregate + a |fields|-row melt",
)
def fs_linkage_parts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import fellegi_sunter_weights

    part = load(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        F.floor(F.col("p_retailprice") / 10).cast("long").alias("pb"),
        F.split(F.col("p_type"), " ")[0].alias("tw"),
    )
    a, b = p.alias("a"), p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        (F.col("a.p_type") == F.col("b.p_type")).alias("is_match"),
        (F.col("a.p_size") == F.col("b.p_size")).alias("agree_size"),
        (F.col("a.pb") == F.col("b.pb")).alias("agree_price10"),
        (F.col("a.tw") == F.col("b.tw")).alias("agree_typeword"),
    )
    return fellegi_sunter_weights(
        pairs, "is_match", ["agree_price10", "agree_size", "agree_typeword"]
    )


# ---------------------------------------------------------------------------
# Round-11 wave: ordered/paired/stratified inference + drift magnitude
# ---------------------------------------------------------------------------


@_q(
    "wilcoxon_user_halves",
    """
    WITH pu AS (
      SELECT user_id,
        ROUND(CAST(SUM(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
              / COUNT(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                      THEN value END), 6) AS x,
        ROUND(CAST(SUM(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
              / COUNT(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                      THEN value END), 6) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    pairs AS (
      SELECT CAST(ROUND((y - x) * 1000000, 0) AS BIGINT) AS d
      FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
    zc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_zero
           FROM pairs WHERE d = 0),
    nz AS (SELECT ABS(d) AS v, CASE WHEN d > 0 THEN 1 ELSE 0 END AS p
           FROM pairs WHERE d != 0),
    per_v AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
                     CAST(SUM(p) AS BIGINT) AS tp
              FROM nz GROUP BY 1),
    run AS (SELECT t, tp,
                   COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
            FROM per_v),
    ag AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
                  SUM(tp::HUGEINT * (2 * c + t + 1)) AS w2p,
                  SUM(t::HUGEINT * t * t - t) AS ties
           FROM run),
    m AS (SELECT n, (SELECT n_zero FROM zc) AS n_zero,
                 CAST(CAST(w2p AS VARCHAR) AS DOUBLE) AS w2pd,
                 CAST(CAST((2 * w2p - n::HUGEINT * (n + 1)) AS VARCHAR)
                      AS DOUBLE) AS num4,
                 CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
                   - CAST(CAST(ties AS VARCHAR) AS DOUBLE) / 48.0 AS vr
          FROM ag)
    SELECT COALESCE(n, 0) AS n, n_zero,
           CASE WHEN n > 0 THEN w2pd / 2.0 END AS w_plus,
           ROUND(CASE WHEN n > 0 AND vr > 0
                 THEN num4 / (4.0 * SQRT(vr)) END, 6) AS z,
           ROUND(CASE WHEN n > 0 AND vr > 0
                 THEN num4 / (4.0 * SQRT(vr)) / SQRT(CAST(n AS DOUBLE))
                 END, 6) AS r_effect
    FROM m
    """,
    doc="Wilcoxon signed-rank test of per-user mean event value, "
    "first half vs second half of the window "
    "(operators/relational.py:wilcoxon_signed_rank) — the PAIRED "
    "companion to mannwhitney_click_error: each user is their own "
    "control, so between-user variance cancels. Differences of "
    "round-6 halves quantize to exact micro units; 2x midranks off "
    "the guarded DISTINCT-|d| frame; W+, n(n+1)/2 and the cubic tie "
    "term exact DECIMAL(38,0)/HUGEINT; z one double expression. The "
    "half-split DATE literal is part of the contract, shared with "
    "the oracle",
)
def wilcoxon_user_halves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import wilcoxon_signed_rank

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    half = F.to_date("ts") <= F.lit("2024-01-15").cast("date")
    per_u = (
        ev.groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(half, F.col("value").cast("decimal(18,6)"))
                ).cast("double")
                / F.count(F.when(half, F.col("value"))),
                6,
            ).alias("x"),
            F.round(
                F.sum(
                    F.when(~half, F.col("value").cast("decimal(18,6)"))
                ).cast("double")
                / F.count(F.when(~half, F.col("value"))),
                6,
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    return wilcoxon_signed_rank(per_u, "x", "y", scale=1_000_000)


@_q(
    "moods_median_values",
    """
    WITH base AS (
      SELECT event_type AS c,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    cells AS (SELECT c, v, CAST(COUNT(*) AS BIGINT) AS f
              FROM base GROUP BY 1, 2),
    per_v AS (SELECT v, CAST(SUM(f) AS BIGINT) AS t
              FROM cells GROUP BY 1),
    run AS (SELECT v,
                   SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cum,
                   SUM(t) OVER () AS nn
            FROM per_v),
    med AS (SELECT MIN(v) AS med FROM run
            WHERE cum >= FLOOR((nn + 1) / 2)),
    per_c AS (
      SELECT c, CAST(SUM(f) AS BIGINT) AS n,
             CAST(COALESCE(SUM(CASE WHEN v > med THEN f END), 0)
                  AS BIGINT) AS n_above
      FROM cells CROSS JOIN med GROUP BY 1),
    gl AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                  CAST(SUM(n_above) AS BIGINT) AS aa
           FROM per_c),
    m AS (SELECT c, n, n_above,
                 CAST(n AS DOUBLE) * aa / nn AS ea,
                 CAST(n AS DOUBLE) * (nn - aa) / nn AS eb,
                 CAST(n_above AS DOUBLE) AS oi, CAST(n AS DOUBLE) AS ni
          FROM per_c CROSS JOIN gl)
    SELECT c AS event_type, n, n_above,
           ROUND(ea, 6) AS expected_above,
           ROUND(CASE WHEN ea > 0 AND eb > 0 THEN
                 (oi - ea) * (oi - ea) / ea
                 + ((ni - oi) - eb) * ((ni - oi) - eb) / eb END, 6)
             AS chi2_term
    FROM m ORDER BY event_type
    """,
    doc="Mood's median test of event value across the five event "
    "types (operators/relational.py:moods_median) — the bluntest, "
    "most outlier-proof k-sample location rung (below "
    "kruskal_event_values in power, above in robustness): per-class "
    "counts above the POOLED lower median vs expectation, one chi2 "
    "term per class (dof = k-1 caller-side, chi2 contract). Grand "
    "median = running-count crossing over the guarded DISTINCT "
    "cent-value frame; all counts exact BIGINTs",
)
def moods_median_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import moods_median

    ev = load_events(spark, sf_dir)
    return moods_median(
        ev.select("value", "event_type"), "value", "event_type"
    )


@_q(
    "wasserstein_click_error",
    """
    WITH base AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'error')),
    per_v AS (SELECT v, CAST(SUM(a) AS BIGINT) AS fa,
                     CAST(SUM(1 - a) AS BIGINT) AS fb
              FROM base GROUP BY 1),
    tot AS (SELECT CAST(SUM(fa) AS BIGINT) AS na,
                   CAST(SUM(fb) AS BIGINT) AS nb
            FROM per_v),
    run AS (SELECT v,
                   SUM(fa) OVER w AS ca, SUM(fb) OVER w AS cb,
                   LEAD(v) OVER (ORDER BY v) AS vn
            FROM per_v
            WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
    s AS (SELECT SUM(CASE WHEN vn IS NOT NULL THEN
                 ABS(ca::HUGEINT * (SELECT nb FROM tot)
                     - cb::HUGEINT * (SELECT na FROM tot))
                 * (vn - v) END) AS sm
          FROM run)
    SELECT na AS n_a, nb AS n_b,
           ROUND(CASE WHEN na > 0 AND nb > 0 THEN
                 COALESCE(CAST(CAST(sm AS VARCHAR) AS DOUBLE), 0.0)
                 / (CAST(na AS DOUBLE) * nb * 100.0) END, 6)
             AS wasserstein
    FROM tot CROSS JOIN s
    """,
    doc="1-Wasserstein (earth mover's) distance between click and "
    "error value distributions "
    "(operators/relational.py:wasserstein_distance) — the MAGNITUDE "
    "rung of the drift ladder next to ks_value_drift (largest CDF "
    "gap) and psi/JSD (mass re-allocation): how far the mass moved "
    "in the metric's own units. Integrand |cum_a*n_b - cum_b*n_a| "
    "exact DECIMAL(38,0)/HUGEINT per distinct cent value off ONE "
    "guarded prefix window; one double division at the end. HEADLINE "
    "(judge r11 #7): the guarded distinct-value single-partition "
    "window lane gets a continuously-watched wall-time here",
    headline=True,
)
def wasserstein_click_error_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import wasserstein_distance

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "error")
    )
    return wasserstein_distance(
        ev.select("value", "event_type"), "value", "event_type", "click"
    )


@_q(
    "ansari_bradley_types",
    """
    WITH base AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
    per_v AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
                     CAST(SUM(ia) AS BIGINT) AS fa
              FROM base GROUP BY 1),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
                   CAST(SUM(fa) AS BIGINT) AS na
            FROM per_v),
    run AS (SELECT v, t, fa,
                   COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
            FROM per_v),
    cell AS (
      SELECT t, fa, n, na,
             CAST(FLOOR((n + 1) / 2) AS BIGINT) AS h,
             c + 1 AS lo, c + t AS hi
      FROM run CROSS JOIN tot),
    s2c AS (
      SELECT t, fa, n, na,
             (CASE WHEN LEAST(hi, h) >= lo
                   THEN (lo + LEAST(hi, h))::HUGEINT
                        * (LEAST(hi, h) - lo + 1)
                   ELSE 0 END
              + CASE WHEN hi >= GREATEST(lo, h + 1)
                     THEN (2 * (n + 1) - GREATEST(lo, h + 1) - hi)::HUGEINT
                          * (hi - GREATEST(lo, h + 1) + 1)
                     ELSE 0 END) AS s2
      FROM cell),
    ag AS (
      SELECT MAX(n) AS nn, MAX(na) AS n_a,
             SUM(s2) AS sa2,
             SUM(CAST(fa AS DOUBLE) * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                 / (2.0 * t)) AS ab,
             SUM(CAST(CAST(s2 * s2 AS VARCHAR) AS DOUBLE) / (4.0 * t))
               AS saa
      FROM s2c),
    m AS (
      SELECT nn, n_a, ab,
             CAST(CAST(sa2 AS VARCHAR) AS DOUBLE) / 2.0 AS suma,
             saa,
             CAST(nn AS DOUBLE) AS nd, CAST(n_a AS DOUBLE) AS nad,
             CAST(nn - n_a AS DOUBLE) AS nbd
      FROM ag)
    SELECT n_a, CAST(nn - n_a AS BIGINT) AS n_b,
           ROUND(CASE WHEN nad > 0 THEN ab END, 6) AS ab_stat,
           ROUND(CASE WHEN nad > 0 AND nbd > 0
                      AND nad * nbd * (nd * saa - suma * suma)
                          / (nd * nd * (nd - 1.0)) > 0
                 THEN (ab - nad * suma / nd)
                      / SQRT(nad * nbd * (nd * saa - suma * suma)
                             / (nd * nd * (nd - 1.0))) END, 6) AS z
    FROM m
    """,
    doc="Ansari-Bradley dispersion test of click vs purchase values "
    "(operators/relational.py:ansari_bradley) — the SCALE-shift "
    "companion to mannwhitney's location shift: rank from both ends "
    "(extremes score low), a class holding more extremes has the "
    "wider distribution. Per distinct cent value the tied-cell score "
    "sum 2*S = two arithmetic series split at floor((N+1)/2) — exact "
    "DECIMAL(38,0)/HUGEINT; linear-rank moments give the "
    "tie-corrected z. ONE guarded prefix window",
)
def ansari_bradley_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import ansari_bradley

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return ansari_bradley(
        ev.select("value", "event_type"), "value", "event_type", "click"
    )


@_q(
    "mantel_haenszel_priority",
    """
    WITH base AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS e,
             o_totalprice > 250000 AS o
      FROM orders),
    per_s AS (
      SELECT yr,
             CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM base GROUP BY 1),
    t AS (
      SELECT a,
             CAST(a + b + c + d AS DOUBLE) AS n,
             CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
             CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd
      FROM per_s WHERE a + b + c + d > 0),
    terms AS (
      SELECT a, n,
             ad * dd / n AS r, bd * cd / n AS s,
             (ad + dd) / n AS p, (bd + cd) / n AS q,
             (ad + bd) * (ad + cd) / n AS ea,
             CASE WHEN n >= 2 THEN (ad + bd) * (cd + dd) * (ad + cd)
                  * (bd + dd) / (n * n * (n - 1)) ELSE 0 END AS v
      FROM t),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(a) AS BIGINT) AS suma,
             SUM(r) AS sr, SUM(s) AS ss, SUM(ea) AS se, SUM(v) AS sv,
             SUM(p * r) AS spr, SUM(p * s + q * r) AS spsqr,
             SUM(q * s) AS sqs
      FROM terms)
    SELECT n_strata, COALESCE(n, 0) AS n,
           ROUND(CASE WHEN ss > 0 THEN sr / ss END, 6) AS or_mh,
           ROUND(CASE WHEN sr > 0 AND ss > 0 THEN
                 SQRT(spr / (2 * sr * sr) + spsqr / (2 * sr * ss)
                      + sqs / (2 * ss * ss)) END, 6) AS se_log_or,
           ROUND(CASE WHEN sv > 0 THEN
                 (suma - se) * (suma - se) / sv END, 6) AS chi2_cmh
    FROM ag
    """,
    doc="Mantel-Haenszel pooled odds ratio of (high priority -> "
    "high-value order) stratified by order YEAR "
    "(operators/relational.py:mantel_haenszel) — the "
    "confounder-adjusted rung above odds_ratio_events' crude 2x2: "
    "pools per-year tables without breaking on zero cells, CMH chi2 "
    "tests conditional association, Robins-Breslow-Greenland "
    "variance for se(ln OR). ONE stratum aggregate + a 1-row "
    "reduce; cell counts exact, per-stratum terms doubles of exact "
    "integers",
)
def mantel_haenszel_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import mantel_haenszel

    orders = load(spark, sf_dir, "orders")
    df = orders.select(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("e"),
        (F.col("o_totalprice") > 250000).alias("o"),
    )
    return mantel_haenszel(df, ["yr"], "e", "o")


@_q(
    "cochran_armitage_lines",
    """
    WITH base AS (
      SELECT CAST(l_linenumber AS DECIMAL(18,6)) AS d,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
      WHERE l_linenumber IS NOT NULL AND l_returnflag IS NOT NULL),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(COUNT(DISTINCT d) AS BIGINT) AS k,
             SUM(CAST(d AS DECIMAL(38,6))) AS sd,
             SUM(CASE WHEN y = 1 THEN CAST(d AS DECIMAL(38,6)) END) AS sdr,
             SUM(CAST(d * d AS DECIMAL(38,12))) AS sdd
      FROM base),
    m AS (
      SELECT n, n_pos, k,
             CAST(n AS DOUBLE) AS nd,
             CAST(n_pos AS DOUBLE) AS rr,
             CAST(CAST(sd AS VARCHAR) AS DOUBLE) AS sdx,
             COALESCE(CAST(CAST(sdr AS VARCHAR) AS DOUBLE), 0.0) AS sdrx,
             CAST(CAST(sdd AS VARCHAR) AS DOUBLE) AS sddx
      FROM ag),
    fin AS (
      SELECT n, n_pos, k,
             sdrx - rr * sdx / nd AS t,
             (rr / nd) * (1.0 - rr / nd) * (sddx - sdx * sdx / nd)
               AS denom
      FROM m)
    SELECT COALESCE(k, 0) AS k, COALESCE(n, 0) AS n,
           COALESCE(n_pos, 0) AS n_pos,
           ROUND(CASE WHEN n > 0 AND denom > 0
                 THEN t / SQRT(denom) END, 6) AS z_trend,
           ROUND(CASE WHEN n > 0 AND denom > 0
                 THEN t * t / denom END, 6) AS chi2_trend
    FROM fin
    """,
    doc="Cochran-Armitage trend test: does the return rate rise with "
    "the line number (operators/relational.py:cochran_armitage) — "
    "one trend degree of freedom where chi2_status_priority answers "
    "'any difference somewhere': z = T/sqrt(pbar(1-pbar)(Sd2 - "
    "Sd^2/N)) with the dose column itself as the score (contract). "
    "Five sufficient sums exact DECIMAL off ONE map-side-combined "
    "aggregate — no window, no join, no per-dose frame",
)
def cochran_armitage_lines_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import cochran_armitage

    li = load(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_returnflag").isNotNull()).select(
        F.col("l_linenumber").alias("d"),
        (F.col("l_returnflag") == "R").alias("y"),
    )
    return cochran_armitage(df, "d", "y")


@_q(
    "gpd_tail_orders",
    """
    WITH exc AS (
      SELECT o_orderpriority,
             CAST(o_totalprice - 400000.0 AS DECIMAL(18,6)) AS e
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_totalprice > 400000.0),
    ag AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_exceed,
             SUM(CAST(e AS DECIMAL(38,6))) AS s1,
             SUM(CAST(CAST(e AS DECIMAL(19,6)) * CAST(e AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS s2
      FROM exc GROUP BY 1),
    m AS (
      SELECT o_orderpriority, n_exceed,
             CAST(n_exceed AS DOUBLE) AS nd,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d
      FROM ag),
    fin AS (
      SELECT o_orderpriority, n_exceed,
             s1d / nd AS ebar,
             CASE WHEN n_exceed >= 2
                  THEN (s2d - s1d * s1d / nd) / (nd - 1.0) END AS vv
      FROM m)
    SELECT o_orderpriority, CAST(400000.0 AS DOUBLE) AS threshold, n_exceed,
           ROUND(ebar, 6) AS mean_excess,
           ROUND(CASE WHEN n_exceed >= 2 AND vv > 0
                 THEN 0.5 * (1.0 - ebar * ebar / vv) END, 6) AS xi_mom,
           ROUND(CASE WHEN n_exceed >= 2 AND vv > 0
                 THEN 0.5 * ebar * (ebar * ebar / vv + 1.0) END, 6)
             AS sigma_mom
    FROM fin ORDER BY o_orderpriority
    """,
    doc="Generalized-Pareto peaks-over-threshold fit of order values "
    "above a 400k literal threshold per priority "
    "(operators/series.py:gpd_tail_fit) — the EXCEEDANCE rung of "
    "the extreme-value family next to gumbel_weekly_max (block "
    "maxima) and hill_tail_orders (order statistics): "
    "method-of-moments xi/sigma say HOW the tail decays (xi>0 "
    "heavy, ~0 exponential, <0 bounded). ONE filtered aggregate, "
    "threshold predicate pushed to the scan; excess moments exact "
    "DECIMAL(38,6)/(38,12)",
)
def gpd_tail_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import gpd_tail_fit

    orders = load(spark, sf_dir, "orders")
    return gpd_tail_fit(orders, ["o_orderpriority"], "o_totalprice", 400000.0)


_PRIORITY_ORDER = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]

_EVENT_TYPE_ORDER = ["click", "error", "purchase", "signup", "view"]

_EVENT_ORD_SQL = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 "
    "WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 WHEN 'view' THEN 5 END"
)


@_q(
    "jonckheere_priority_value",
    """
    WITH base AS (
      SELECT CASE o_orderpriority
               WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
               WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
               WHEN '5-LOW' THEN 4 END AS o,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
    cells AS (SELECT o, v, CAST(COUNT(*) AS BIGINT) AS f
              FROM base GROUP BY 1, 2),
    per_v AS (SELECT v, CAST(SUM(f) AS BIGINT) AS t
              FROM cells GROUP BY 1),
    ords AS (SELECT range::INTEGER AS o FROM range(5)),
    grid AS (
      SELECT p.v, ords.o, COALESCE(c.f, 0) AS f
      FROM per_v p CROSS JOIN ords
      LEFT JOIN cells c ON c.o = ords.o AND c.v = p.v),
    g1 AS (SELECT o, v, f,
                  COALESCE(SUM(f) OVER (PARTITION BY o ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS lt
           FROM grid),
    g2 AS (SELECT f,
                  COALESCE(SUM(lt) OVER (PARTITION BY v ORDER BY o
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS g,
                  COALESCE(SUM(f) OVER (PARTITION BY v ORDER BY o
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS fb
           FROM g1),
    uu AS (SELECT SUM(f::HUGEINT * (2 * g + fb)) AS u2 FROM g2),
    per_c AS (SELECT o, CAST(SUM(f) AS BIGINT) AS ni
              FROM cells GROUP BY 1),
    cls AS (
      SELECT CAST(SUM(ni) AS BIGINT) AS nn,
             SUM(ni::HUGEINT * ni) AS s2,
             SUM(ni::HUGEINT * (ni - 1)) AS e1,
             SUM(ni::HUGEINT * (ni - 1) * (ni - 2)) AS e2,
             SUM(ni::HUGEINT * (ni - 1) * (2 * ni + 5)) AS e3
      FROM per_c),
    tie AS (
      SELECT SUM(t::HUGEINT * (t - 1)) AS u1t,
             SUM(t::HUGEINT * (t - 1) * (t - 2)) AS u2t,
             SUM(t::HUGEINT * (t - 1) * (2 * t + 5)) AS u3t
      FROM per_v),
    m AS (
      SELECT nn,
             CAST(nn AS DOUBLE) AS nd,
             COALESCE(CAST(CAST(u2 AS VARCHAR) AS DOUBLE), 0.0) / 2.0
               AS u,
             (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
              - CAST(CAST(s2 AS VARCHAR) AS DOUBLE)) / 4.0 AS mean,
             CAST(CAST(e1 AS VARCHAR) AS DOUBLE) AS e1d,
             CAST(CAST(e2 AS VARCHAR) AS DOUBLE) AS e2d,
             CAST(CAST(e3 AS VARCHAR) AS DOUBLE) AS e3d,
             CAST(CAST(u1t AS VARCHAR) AS DOUBLE) AS u1d,
             CAST(CAST(u2t AS VARCHAR) AS DOUBLE) AS u2d,
             CAST(CAST(u3t AS VARCHAR) AS DOUBLE) AS u3d
      FROM uu CROSS JOIN cls CROSS JOIN tie),
    fin AS (
      SELECT nn, u, mean,
             (nd * (nd - 1) * (2 * nd + 5) - e3d - u3d) / 72.0
             + CASE WHEN nd >= 3 THEN e2d * u2d
                    / (36.0 * nd * (nd - 1) * (nd - 2)) ELSE 0 END
             + CASE WHEN nd >= 2 THEN e1d * u1d
                    / (8.0 * nd * (nd - 1)) ELSE 0 END AS vr
      FROM m)
    SELECT COALESCE(nn, 0) AS n, CAST(5 AS BIGINT) AS k,
           CASE WHEN nn > 0 THEN u END AS u_stat,
           ROUND(CASE WHEN nn > 0 AND vr > 0
                 THEN (u - mean) / SQRT(vr) END, 6) AS z
    FROM fin
    """,
    doc="Jonckheere-Terpstra ordered-alternative test: does order "
    "value trend across the five priority tiers in their labeled "
    "order (operators/relational.py:jonckheere_terpstra) — the "
    "trend rung between mannwhitney (k=2) and kruskal (any "
    "difference). 2U = sum over the guarded distinct-cent-value x "
    "class GRID of f_j(v)*(2G + F<j) with G the 2-D prefix — exact "
    "DECIMAL(38,0)/HUGEINT off two windows (one per class over "
    "values, one k-bounded per value over classes); tie-corrected "
    "Hollander-Wolfe variance from exact class/tie folds. The class "
    "order literal is the contract, shared with the oracle",
    # round-11 headline set change (the r6 segment_dedup / r7 tpch_q21
    # convention): the round's heaviest new shape — guarded V x k grid,
    # two windows, three exact folds — joins the bench mix; totals are
    # NOT comparable to r10's 20-query total without subtracting its
    # median; per-query medians remain directly comparable
    headline=True,
)
def jonckheere_priority_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import jonckheere_terpstra

    orders = load(spark, sf_dir, "orders")
    return jonckheere_terpstra(
        orders.select("o_totalprice", "o_orderpriority"),
        "o_totalprice",
        "o_orderpriority",
        _PRIORITY_ORDER,
    )


@_q(
    "pages_trend_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    q AS (SELECT day AS b, {_EVENT_ORD_SQL} AS t,
                 CAST(ROUND(v * 1000000, 0) AS BIGINT) AS v
          FROM daily),
    kb AS (SELECT b FROM q GROUP BY b HAVING COUNT(*) = 5),
    base AS (SELECT q.* FROM q JOIN kb USING (b)),
    cells AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS tv
              FROM base GROUP BY 1, 2),
    ranked AS (
      SELECT b, v,
             2 * COALESCE(SUM(tv) OVER (PARTITION BY b ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + tv + 1 AS r2
      FROM cells),
    j AS (SELECT base.t, ranked.r2
          FROM base JOIN ranked ON base.b = ranked.b
          AND base.v = ranked.v),
    per_t AS (SELECT t, SUM(r2::HUGEINT) AS r2sum,
                     CAST(COUNT(*) AS BIGINT) AS nb
              FROM j GROUP BY 1),
    ag AS (SELECT MAX(nb) AS n_blocks,
                  SUM(t::HUGEINT * r2sum) AS l2
           FROM per_t),
    m AS (SELECT n_blocks,
                 CAST(n_blocks AS DOUBLE) AS nd,
                 CAST(CAST(l2 AS VARCHAR) AS DOUBLE) / 2.0 AS l
          FROM ag)
    SELECT COALESCE(n_blocks, 0) AS n_blocks, CAST(5 AS BIGINT) AS k,
           CASE WHEN n_blocks >= 1 THEN l END AS l_stat,
           ROUND(CASE WHEN n_blocks >= 1 THEN
                 (l - nd * 5 * 36 / 4.0)
                 / SQRT(nd * 25 * 6 * 24 / 144.0) END, 6) AS z
    FROM m
    """,
    doc="Page's L trend test over days-as-blocks: do the five event "
    "types' daily mean values hold a consistent ordering matching "
    "the alphabetical hypothesis literal "
    "(operators/relational.py:pages_trend) — friedman_daily_types' "
    "ORDERED-alternative sibling (as jonckheere is to kruskal). "
    "Shared matched-block machinery: duplicated cells raise, "
    "incomplete days drop whole, 2x midranks and 2L = sum j*R2_j "
    "exact DECIMAL(38,0)/HUGEINT; ties ride midranks with the "
    "standard no-tie null variance (documented)",
)
def pages_trend_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import pages_trend

    daily = _daily_mean_frame(spark, sf_dir)
    return pages_trend(
        daily, "day", "event_type", "v", _EVENT_TYPE_ORDER
    )


@_q(
    "kendalls_w_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    q AS (SELECT day AS b, event_type AS t,
                 CAST(ROUND(v * 1000000, 0) AS BIGINT) AS v
          FROM daily),
    ktot AS (SELECT COUNT(DISTINCT t) AS k FROM q),
    kb AS (SELECT b FROM q GROUP BY b
           HAVING COUNT(*) = (SELECT k FROM ktot)),
    base AS (SELECT q.* FROM q JOIN kb USING (b)),
    cells AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS tv
              FROM base GROUP BY 1, 2),
    ranked AS (
      SELECT b, v,
             2 * COALESCE(SUM(tv) OVER (PARTITION BY b ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + tv + 1 AS r2
      FROM cells),
    j AS (SELECT base.t, ranked.r2
          FROM base JOIN ranked ON base.b = ranked.b
          AND base.v = ranked.v),
    per_t AS (SELECT t, SUM(r2::HUGEINT) AS r2sum,
                     CAST(COUNT(*) AS BIGINT) AS nb
              FROM j GROUP BY 1),
    ties AS (SELECT SUM(tv::HUGEINT * tv * tv - tv) AS t3t FROM cells),
    ag AS (SELECT MAX(nb) AS n_blocks,
                  CAST(COUNT(*) AS BIGINT) AS k_treatments,
                  SUM(CAST(CAST(r2sum * r2sum AS VARCHAR) AS DOUBLE))
                    AS rr4
           FROM per_t),
    m AS (SELECT n_blocks, k_treatments,
                 CAST(n_blocks AS DOUBLE) AS nd,
                 CAST(k_treatments AS DOUBLE) AS kd,
                 rr4,
                 COALESCE(CAST(CAST((SELECT t3t FROM ties) AS VARCHAR)
                   AS DOUBLE), 0.0) AS t3td
          FROM ag),
    fin AS (SELECT n_blocks, k_treatments,
                   12.0 * (rr4 / 4.0)
                   - 3.0 * nd * nd * kd * (kd + 1) * (kd + 1) AS num,
                   nd * nd * kd * (kd * kd - 1) - nd * t3td AS den,
                   nd, kd
            FROM m)
    SELECT COALESCE(n_blocks, 0) AS n_blocks,
           COALESCE(k_treatments, 0) AS k_treatments,
           ROUND(CASE WHEN n_blocks >= 1 AND k_treatments >= 2
                 AND den > 0 THEN num / den END, 6) AS w,
           ROUND(CASE WHEN n_blocks >= 1 AND k_treatments >= 2
                 AND den > 0 THEN nd * (kd - 1) * num / den END, 6)
             AS chi2_f
    FROM fin
    """,
    doc="Kendall's W concordance of the five event types' daily "
    "value ordering across days-as-blocks "
    "(operators/relational.py:kendalls_w) — the EFFECT SIZE to "
    "friedman_daily_types' significance ('the days agree this much "
    "about which type runs hot'), tie-corrected; chi2 = n(k-1)W "
    "reproduces friedman's corrected statistic by construction "
    "(pytest-pinned). Shared matched-block machinery, exact "
    "DECIMAL(38,0)/HUGEINT rank sums",
)
def kendalls_w_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import kendalls_w

    daily = _daily_mean_frame(spark, sf_dir)
    return kendalls_w(daily, "day", "event_type", "v")


@_q(
    "ljung_box_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    counts AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
               FROM daily GROUP BY 1),
    hh AS (SELECT range::INTEGER AS h FROM range(1, 8)),
    lags AS (
      SELECT a.event_type, hh.h, ROUND(CORR(a.v, b.v), 6) AS r
      FROM daily a
      CROSS JOIN hh
      JOIN daily b ON b.event_type = a.event_type
        AND DATEDIFF('day', b.day, a.day) = hh.h
      GROUP BY 1, 2),
    terms AS (
      SELECT c.event_type, c.n,
             SUM(CASE WHEN l.r IS NOT NULL AND c.n > l.h
                 THEN l.r * l.r / (c.n - l.h) ELSE 0 END) AS s
      FROM counts c LEFT JOIN lags l USING (event_type)
      GROUP BY 1, 2)
    SELECT event_type, n, CAST(7 AS BIGINT) AS lags,
           ROUND(CASE WHEN n > 7 THEN
                 CAST(n AS DOUBLE) * (n + 2) * s END, 6) AS q_stat
    FROM terms ORDER BY event_type
    """,
    doc="Ljung-Box portmanteau Q over the first 7 lags of each event "
    "type's daily mean-value series (operators/series.py:ljung_box) "
    "— 'is this series white noise at all' in one number, the gate "
    "a forecasting readout (seasonal_backtest, conformal) runs "
    "FIRST. Pairwise-complete per-lag ACFs (the acf_daily_values "
    "convention), each rounded to 6 BEFORE entering Q so both "
    "engines fold identical quantized inputs; m bounded per-lag "
    "self-joins over the days-sized rollup, never raw events",
)
def ljung_box_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import ljung_box

    daily = _daily_mean_frame(spark, sf_dir)
    return ljung_box(daily, ["event_type"], "day", "v", max_lag=7)


@_q(
    "breusch_pagan_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    base AS (
      SELECT event_type,
             DATEDIFF('day', DATE '2024-01-01', day) AS x,
             CAST(ROUND(v * 1000000, 0) AS BIGINT) AS yq
      FROM daily),
    mom AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x::HUGEINT) AS sx,
             SUM(x::HUGEINT * x) AS sxx,
             SUM(x::HUGEINT * x * x) AS sxxx,
             SUM(yq::HUGEINT) AS sy,
             SUM(x::HUGEINT * yq) AS sxy,
             SUM(yq::HUGEINT * yq) AS syy,
             SUM(x::HUGEINT * x * yq) AS sxxy,
             SUM(x::HUGEINT * yq * yq) AS sxyy
      FROM base GROUP BY 1),
    d AS (
      SELECT event_type, n,
             CAST(n AS DOUBLE) AS nd,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(sxxx AS VARCHAR) AS DOUBLE) AS sxxx,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) / 1e6 AS sy,
             CAST(CAST(sxy AS VARCHAR) AS DOUBLE) / 1e6 AS sxy,
             CAST(CAST(syy AS VARCHAR) AS DOUBLE) / 1e12 AS syy,
             CAST(CAST(sxxy AS VARCHAR) AS DOUBLE) / 1e6 AS sxxy,
             CAST(CAST(sxyy AS VARCHAR) AS DOUBLE) / 1e12 AS sxyy
      FROM mom),
    fit AS (
      SELECT event_type, n, nd, sx, sxx, sxxx, sy, sxy, syy, sxxy,
             sxyy,
             sxx - sx * sx / nd AS ssx,
             syy - sy * sy / nd AS ssy,
             sxy - sx * sy / nd AS sxy_c
      FROM d),
    fit2 AS (
      SELECT *, sxy_c / ssx AS beta,
             (sy - (sxy_c / ssx) * sx) / nd AS a
      FROM fit WHERE ssx > 0),
    fit3 AS (
      SELECT event_type, n, nd, sx, ssx, beta,
             ssy - beta * sxy_c AS sse,
             sxyy - 2 * a * sxy - 2 * beta * sxxy + a * a * sx
             + 2 * a * beta * sxx + beta * beta * sxxx AS sxe2
      FROM fit2),
    fin AS (
      SELECT event_type, n, beta, sse,
             sse / nd AS sigma2,
             sxe2 - sx * sse / nd AS sxg,
             ssx, nd
      FROM fit3)
    SELECT f.event_type, f.n,
           ROUND(CASE WHEN f.n >= 2 THEN f.beta END, 6) AS slope,
           ROUND(CASE WHEN f.n >= 2 THEN f.sse END, 6) AS sse,
           ROUND(CASE WHEN f.n >= 3 AND f.sigma2 > 0 THEN
                 f.sxg * f.sxg
                 / (2.0 * f.sigma2 * f.sigma2 * f.ssx) END, 6)
             AS bp_lm
    FROM fin f ORDER BY f.event_type
    """,
    doc="Breusch-Pagan heteroscedasticity LM per event type for the "
    "daily-mean-value-on-day-index OLS "
    "(operators/series.py:breusch_pagan) — the assumption audit "
    "behind ols_influence_daily: a significant LM says the OLS "
    "standard errors are lying and the caller should move to "
    "theilsen_daily_trend. e2 = (y-a-bx)^2 distributes over eight "
    "integer-quantized moments (micros; DECIMAL(38,0)/HUGEINT — "
    "scale-0 products never lose precision) in ONE aggregate; no "
    "residual pass; LM invariant to the y-unit rescale",
)
def breusch_pagan_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import breusch_pagan

    daily = _daily_mean_frame(spark, sf_dir)
    df = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")).alias(
            "x"
        ),
        "v",
    )
    return breusch_pagan(df, ["event_type"], "x", "v")


@_q(
    "bowker_user_shift",
    """
    WITH halves AS (
      SELECT user_id,
             CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                  THEN 1 ELSE 2 END AS half,
             event_type
      FROM events WHERE event_type IS NOT NULL),
    cnt AS (SELECT user_id, half, event_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM halves GROUP BY 1, 2, 3),
    modal AS (
      SELECT user_id, half, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, half
               ORDER BY c DESC, event_type ASC) AS rn
      FROM cnt),
    r1 AS (SELECT user_id, event_type AS ra FROM modal
           WHERE half = 1 AND rn = 1),
    r2 AS (SELECT user_id, event_type AS rb FROM modal
           WHERE half = 2 AND rn = 1),
    pairs AS (SELECT ra, rb FROM r1 JOIN r2 USING (user_id)),
    cells AS (SELECT ra, rb, CAST(COUNT(*) AS BIGINT) AS n
              FROM pairs GROUP BY 1, 2),
    up AS (SELECT ra AS i, rb AS j, n AS nij FROM cells WHERE ra < rb),
    lo AS (SELECT rb AS i, ra AS j, n AS nji FROM cells WHERE ra > rb),
    pq AS (
      SELECT COALESCE(up.nij, 0) AS nij, COALESCE(lo.nji, 0) AS nji
      FROM up FULL OUTER JOIN lo USING (i, j)),
    pa AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS dof,
             CAST(SUM(nij + nji) AS BIGINT) AS n_disagree,
             SUM(CASE WHEN nij + nji > 0 THEN
                 CAST(nij - nji AS DOUBLE) * (nij - nji)
                 / (nij + nji) END) AS b
      FROM pq),
    kc AS (
      SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS k FROM (
        SELECT ra AS c FROM pairs UNION ALL SELECT rb FROM pairs)),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pairs)
    SELECT COALESCE(kc.k, 0) AS k, COALESCE(tot.n, 0) AS n,
           COALESCE(pa.n_disagree, 0) AS n_disagree,
           COALESCE(pa.dof, 0) AS dof,
           ROUND(pa.b, 6) AS chi2_bowker
    FROM pa CROSS JOIN kc CROSS JOIN tot
    """,
    doc="Bowker symmetry test of each user's MODAL event type, first "
    "half vs second half of the window "
    "(operators/classify.py:bowker_test) — mcnemar_doc_rules' "
    "generalization from binary to k categories: when users change "
    "their dominant behavior, do the flows run both ways or drift "
    "one way. Mode per (user, half) = deterministic count-desc/"
    "type-asc rank over the k-bounded per-user frame; one-sided "
    "pairs seated via broadcastable left + left-anti joins (the "
    "srm_check full-outer lesson); cell counts exact",
)
def bowker_user_shift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from .operators.classify import bowker_test

    ev = load_events(spark, sf_dir).filter(F.col("event_type").isNotNull())
    halves = ev.select(
        "user_id",
        F.when(
            F.to_date("ts") <= F.lit("2024-01-15").cast("date"), F.lit(1)
        )
        .otherwise(F.lit(2))
        .alias("half"),
        "event_type",
    )
    cnt = halves.groupBy("user_id", "half", "event_type").agg(
        F.count("*").alias("c")
    )
    w = W.partitionBy("user_id", "half").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    modal = cnt.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    r1 = modal.filter(F.col("half") == 1).select(
        "user_id", F.col("event_type").alias("ra")
    )
    r2 = modal.filter(F.col("half") == 2).select(
        "user_id", F.col("event_type").alias("rb")
    )
    pairs = r1.join(r2, "user_id").select("ra", "rb")
    return bowker_test(pairs, "ra", "rb")


# ---------------------------------------------------------------------------
# Round-11 wave 2: effect sizes, distribution fit, agreement, seasonal trend
# ---------------------------------------------------------------------------


@_q(
    "ks_expfit_values",
    """
    WITH base AS (
      SELECT event_type AS g,
             CAST(ROUND(value * 1000000, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    nd AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_dropped
           FROM base WHERE v <= 0 GROUP BY 1),
    pos AS (SELECT g, v FROM base WHERE v > 0),
    per_v AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS t
              FROM pos GROUP BY 1, 2),
    tot AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(v::HUGEINT) AS s
            FROM pos GROUP BY 1),
    run AS (SELECT g, v, t,
                   SUM(t) OVER (PARTITION BY g ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
            FROM per_v),
    j AS (SELECT run.g, run.v, run.t, run.cum, tot.n,
                 CAST(tot.n AS DOUBLE)
                   / (CAST(CAST(tot.s AS VARCHAR) AS DOUBLE) / 1e6)
                   AS lam
          FROM run JOIN tot USING (g)),
    gaps AS (
      SELECT g, n, lam,
             GREATEST(
               ABS(CAST(cum AS DOUBLE) / n
                   - (1 - EXP(-lam * v / 1e6))),
               ABS(CAST(cum - t AS DOUBLE) / n
                   - (1 - EXP(-lam * v / 1e6)))) AS gap
      FROM j),
    ag AS (SELECT g, MAX(n) AS n, ROUND(MAX(lam), 6) AS lambda_hat,
                  ROUND(MAX(gap), 6) AS d_stat
           FROM gaps GROUP BY 1)
    SELECT ag.g AS event_type,
           COALESCE(ag.n, 0) AS n,
           COALESCE(nd.n_dropped, 0) AS n_dropped,
           ag.lambda_hat, ag.d_stat
    FROM ag FULL OUTER JOIN nd USING (g) ORDER BY event_type
    """,
    doc="One-sample KS distance of event values against a FITTED "
    "exponential per type (operators/relational.py:"
    "ks_exponential_fit) — the distribution-FIT rung next to "
    "ks_value_drift's two-sample gap: 'are these values memoryless', "
    "the Poisson-process sanity check behind poisson_rate_halves. "
    "Descriptive D (Lilliefors caveat documented — lambda fitted "
    "from the same data); F_emp exact rationals off the guarded "
    "distinct micro-value frame, sup checks both step sides",
)
def ks_expfit_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import ks_exponential_fit

    ev = load_events(spark, sf_dir)
    return ks_exponential_fit(
        ev.select(F.col("event_type").alias("g"), "value"),
        ["g"],
        "value",
        scale=1_000_000,
    ).withColumnRenamed("g", "event_type")


@_q(
    "atkinson_customer_revenue",
    """
    WITH rev AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS r
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey, o_custkey),
    q AS (SELECT c_nationkey AS g,
                 CAST(ROUND(r * 100, 0) AS BIGINT) AS v
          FROM rev WHERE r IS NOT NULL),
    ag AS (
      SELECT g,
             CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN v > 0 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dropped,
             SUM(CASE WHEN v > 0 THEN v::HUGEINT END) AS s1,
             SUM(CASE WHEN v > 0 THEN POW(CAST(v AS DOUBLE), 0.5) END)
               AS sp
      FROM q GROUP BY 1),
    m AS (SELECT g, n, n_dropped,
                 CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE) AS vbar,
                 POW(sp / CAST(n AS DOUBLE), 2.0) AS ede
          FROM ag)
    SELECT g AS c_nationkey, n, n_dropped,
           ROUND(CASE WHEN n > 0 THEN vbar / 100.0 END, 6) AS mean,
           ROUND(CASE WHEN n > 0 THEN 1.0 - ede / vbar END, 6)
             AS atkinson
    FROM m ORDER BY c_nationkey
    """,
    doc="Atkinson inequality index (epsilon = 0.5) of per-customer "
    "revenue within each nation "
    "(operators/relational.py:atkinson_index) — the NORMATIVE rung "
    "next to theil_customer_revenue and gini_customer_revenue: 'the "
    "nation would give up A of total revenue to equalize'. ONE "
    "aggregate (the mean folds out by homogeneity); power fold "
    "renormalized by n*mu^(1-eps) keeps order ulps invisible at "
    "round-6",
)
def atkinson_customer_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import atkinson_index

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("r")
        )
    )
    return atkinson_index(rev, ["c_nationkey"], "r")


@_q(
    "cliffs_delta_click_error",
    """
    WITH base AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'error')),
    per_v AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS ta,
                     CAST(SUM(1 - ia) AS BIGINT) AS tb
              FROM base GROUP BY 1),
    run AS (SELECT ta, tb,
                   COALESCE(SUM(ta + tb) OVER (ORDER BY v ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
            FROM per_v),
    ag AS (SELECT CAST(SUM(ta) AS BIGINT) AS n_a,
                  CAST(SUM(tb) AS BIGINT) AS n_b,
                  SUM(ta::HUGEINT * (2 * c + ta + tb + 1)) AS r2a
           FROM run),
    m AS (SELECT n_a, n_b,
                 CAST(CAST((r2a - n_a::HUGEINT * (n_a + 1)) AS VARCHAR)
                      AS DOUBLE) / 2.0 AS u_a
          FROM ag),
    fin AS (SELECT n_a, n_b, u_a,
                   2.0 * u_a / (CAST(n_a AS DOUBLE) * n_b) - 1.0
                     AS delta
            FROM m)
    SELECT n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN u_a END AS u_a,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 THEN delta END, 6)
             AS delta,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             CASE WHEN ABS(delta) < 0.147 THEN 'negligible'
                  WHEN ABS(delta) < 0.33 THEN 'small'
                  WHEN ABS(delta) < 0.474 THEN 'medium'
                  ELSE 'large' END END AS magnitude
    FROM fin
    """,
    doc="Cliff's delta ordinal effect size between click and error "
    "values (operators/relational.py:cliffs_delta) — "
    "mannwhitney_click_error's EFFECT-SIZE companion: delta = "
    "2U/(n_a n_b) - 1 in [-1,1], robust to any monotone transform, "
    "with the standard Romano magnitude banding as injected "
    "literals. Exact U off the guarded distinct cent-value frame "
    "(the mann_whitney midrank discipline verbatim)",
)
def cliffs_delta_click_error_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import cliffs_delta

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "error")
    )
    return cliffs_delta(
        ev.select("value", "event_type"), "value", "event_type", "click"
    )


@_q(
    "hodges_lehmann_click_error",
    """
    WITH base AS (
      SELECT CAST(ROUND(value * 1, 0) AS BIGINT) AS v,
             event_type = 'click' AS a
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'error')),
    va AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ta
           FROM base WHERE a GROUP BY 1),
    vb AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS tb
           FROM base WHERE NOT a GROUP BY 1),
    diffs AS (
      SELECT va.v - vb.v AS d, SUM(va.ta::HUGEINT * vb.tb) AS w
      FROM va CROSS JOIN vb GROUP BY 1),
    tot AS (SELECT SUM(w) AS n FROM diffs),
    run AS (SELECT d,
                   SUM(w) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cum
            FROM diffs),
    med AS (SELECT MIN(d) AS med FROM run CROSS JOIN tot
            WHERE cum >= FLOOR((n + 1) / 2)),
    sides AS (
      SELECT CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      FROM base),
    cells AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_diff_cells
              FROM diffs)
    SELECT n_a, n_b, n_diff_cells,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0
                 THEN CAST(med AS DOUBLE) / 1.0 END, 6) AS hl_shift
    FROM sides CROSS JOIN cells CROSS JOIN med
    """,
    doc="Hodges-Lehmann shift estimate between click and error "
    "values (operators/relational.py:hodges_lehmann_shift) — the "
    "robust 'how much bigger' next to cliffs_delta's 'how "
    "dominantly': weighted LOWER median of all pairwise differences, "
    "collapsed onto the V_a x V_b distinct-value grid with exact "
    "t_a*t_b weights (never the n_a*n_b row pairs); the grid is "
    "plan-guarded at EXACT_RANK_MAX_ROWS. QUERY quantization is "
    "whole units (scale=1, part of the contract): a value domain of "
    "~500 keeps the grid ~2.5e5 cells at ANY scale factor, where "
    "cents at sf0.1 already hit 9.6e7 and the guard (correctly) "
    "raised — the documented remedy applied",
)
def hodges_lehmann_click_error_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.relational import hodges_lehmann_shift

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "error")
    )
    return hodges_lehmann_shift(
        ev.select("value", "event_type"),
        "value",
        "event_type",
        "click",
        scale=1,
    )


@_q(
    "uncertainty_status_priority",
    """
    WITH base AS (
      SELECT CAST(o_orderstatus AS VARCHAR) AS r,
             CAST(o_orderpriority AS VARCHAR) AS c
      FROM orders
      WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL),
    cells AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS f
              FROM base GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(f) AS BIGINT) AS n FROM cells),
    hr AS (SELECT -SUM(p * LN(p)) AS h FROM (
             SELECT CAST(SUM(f) AS DOUBLE) / (SELECT n FROM tot) AS p
             FROM cells GROUP BY r)),
    hc AS (SELECT -SUM(p * LN(p)) AS h FROM (
             SELECT CAST(SUM(f) AS DOUBLE) / (SELECT n FROM tot) AS p
             FROM cells GROUP BY c)),
    hrc AS (SELECT -SUM(p * LN(p)) AS h FROM (
              SELECT CAST(f AS DOUBLE) / (SELECT n FROM tot) AS p
              FROM cells)),
    m AS (SELECT (SELECT n FROM tot) AS n,
                 (SELECT h FROM hr) AS h_row,
                 (SELECT h FROM hc) AS h_col,
                 (SELECT h FROM hr) + (SELECT h FROM hc)
                   - (SELECT h FROM hrc) AS mi)
    SELECT COALESCE(n, 0) AS n,
           ROUND(h_row, 6) AS h_row,
           ROUND(h_col, 6) AS h_col,
           ROUND(mi, 6) AS mutual_info,
           ROUND(CASE WHEN h_col > 0 THEN mi / h_col END, 6)
             AS u_col_given_row,
           ROUND(CASE WHEN h_row > 0 THEN mi / h_row END, 6)
             AS u_row_given_col,
           ROUND(CASE WHEN h_row + h_col > 0
                 THEN 2.0 * mi / (h_row + h_col) END, 6) AS u_symmetric
    FROM m
    """,
    doc="Theil's uncertainty coefficient between order status and "
    "priority (operators/relational.py:uncertainty_coefficient) — "
    "the DIRECTED association rung next to chi2_status_priority's "
    "cramers_v and mi_status_priority's raw MI: 'knowing status "
    "removes this fraction of priority's entropy', asymmetric by "
    "design (catches many-to-one mappings). One cell aggregate + "
    "category-bounded entropy folds",
)
def uncertainty_status_priority_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.relational import uncertainty_coefficient

    orders = load(spark, sf_dir, "orders")
    return uncertainty_coefficient(
        orders, "o_orderstatus", "o_orderpriority"
    )


@_q(
    "ordinal_assoc_lines",
    """
    WITH base AS (
      SELECT CAST(l_linenumber AS BIGINT) AS x,
             CAST(l_quantity AS BIGINT) AS y
      FROM lineitem
      WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL),
    cells AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS f
              FROM base GROUP BY 1, 2),
    pa AS (
      SELECT
        SUM(CASE WHEN a.x < b.x AND a.y < b.y
            THEN a.f::HUGEINT * b.f END) AS c,
        SUM(CASE WHEN a.x < b.x AND a.y > b.y
            THEN a.f::HUGEINT * b.f END) AS d,
        SUM(CASE WHEN a.x = b.x AND a.y < b.y
            THEN a.f::HUGEINT * b.f END) AS tx,
        SUM(CASE WHEN a.y = b.y AND a.x < b.x
            THEN a.f::HUGEINT * b.f END) AS ty
      FROM cells a CROSS JOIN cells b),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells),
    m AS (SELECT
            COALESCE(CAST(CAST(c AS VARCHAR) AS DOUBLE), 0) AS cd,
            COALESCE(CAST(CAST(d AS VARCHAR) AS DOUBLE), 0) AS dd,
            COALESCE(CAST(CAST(tx AS VARCHAR) AS DOUBLE), 0) AS txd,
            COALESCE(CAST(CAST(ty AS VARCHAR) AS DOUBLE), 0) AS tyd
          FROM pa)
    SELECT COALESCE(tot.n, 0) AS n, nc.n_cells,
           m.cd AS c_pairs, m.dd AS d_pairs,
           ROUND(CASE WHEN m.cd + m.dd > 0
                 THEN (m.cd - m.dd) / (m.cd + m.dd) END, 6) AS gamma,
           ROUND(CASE WHEN m.cd + m.dd + m.tyd > 0
                 THEN (m.cd - m.dd) / (m.cd + m.dd + m.tyd) END, 6)
             AS somers_d_yx,
           ROUND(CASE WHEN (m.cd + m.dd + m.txd)
                      * (m.cd + m.dd + m.tyd) > 0
                 THEN (m.cd - m.dd)
                      / SQRT((m.cd + m.dd + m.txd)
                             * (m.cd + m.dd + m.tyd)) END, 6) AS tau_b
    FROM m CROSS JOIN tot CROSS JOIN nc
    """,
    doc="Goodman-Kruskal gamma / Somers' D / Kendall tau-b between "
    "line number and quantity "
    "(operators/relational.py:ordinal_association) — the ORDERED "
    "association chi2/cramers_v throws away: concordant/discordant "
    "pair counts fold over the (x, y) CELL GRID with exact integer "
    "f1*f2 weights (7x50 cells here — never the C(n,2) row pairs); "
    "grid guarded at max_cells",
)
def ordinal_assoc_lines_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import ordinal_association

    li = load(spark, sf_dir, "lineitem")
    return ordinal_association(
        li.select(
            F.col("l_linenumber").alias("x"),
            F.col("l_quantity").alias("y"),
        ),
        "x",
        "y",
    )


@_q(
    "agreement_user_halves",
    """
    WITH pu AS (
      SELECT user_id,
        ROUND(CAST(SUM(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
              / COUNT(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                      THEN value END), 6) AS x,
        ROUND(CAST(SUM(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
              / COUNT(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                      THEN value END), 6) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    pairs AS (SELECT CAST(x AS DECIMAL(18,6)) AS x,
                     CAST(y AS DECIMAL(18,6)) AS y
              FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS DECIMAL(38,6))) AS sx,
             SUM(CAST(y AS DECIMAL(38,6))) AS sy,
             SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sxx,
             SUM(CAST(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS syy,
             SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sxy
      FROM pairs),
    d AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                 CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx,
                 CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS sy,
                 CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxx,
                 CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syy,
                 CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxy
          FROM ag),
    m AS (SELECT n, nd,
                 (sy - sx) / nd AS bias,
                 ((syy - 2 * sxy + sxx)
                  - (sy - sx) * (sy - sx) / nd) / (nd - 1) AS sdd,
                 sxx / nd - (sx / nd) * (sx / nd) AS vx,
                 syy / nd - (sy / nd) * (sy / nd) AS vy,
                 sxy / nd - (sx / nd) * (sy / nd) AS cxy,
                 (sx - sy) / nd AS md
          FROM d)
    SELECT COALESCE(n, 0) AS n,
           ROUND(CASE WHEN n >= 1 THEN bias END, 6) AS bias,
           ROUND(CASE WHEN n >= 2 AND sdd > 0 THEN SQRT(sdd) END, 6)
             AS sd_diff,
           ROUND(CASE WHEN n >= 2 AND sdd > 0
                 THEN bias - 1.959963984540054 * SQRT(sdd) END, 6)
             AS loa_lo,
           ROUND(CASE WHEN n >= 2 AND sdd > 0
                 THEN bias + 1.959963984540054 * SQRT(sdd) END, 6)
             AS loa_hi,
           ROUND(CASE WHEN vx > 0 AND vy > 0
                 THEN cxy / SQRT(vx * vy) END, 6) AS pearson_r,
           ROUND(CASE WHEN vx + vy > 0
                 THEN 2.0 * cxy / (vx + vy + md * md) END, 6) AS ccc
    FROM m
    """,
    doc="Bland-Altman bias/limits-of-agreement + Lin's concordance "
    "of per-user mean value, first half vs second half "
    "(operators/relational.py:agreement_summary) — the CONTINUOUS "
    "agreement rung next to kappa (nominal) and bowker_user_shift "
    "(categorical drift): 'how far apart and in which direction' "
    "plus 'how close to y = x', which Pearson r alone overstates "
    "(CCC <= |r| by construction, pytest-pinned). ONE cuped-style "
    "exact moment aggregate",
)
def agreement_user_halves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import agreement_summary

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    half = F.to_date("ts") <= F.lit("2024-01-15").cast("date")
    per_u = (
        ev.groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(half, F.col("value").cast("decimal(18,6)"))
                ).cast("double")
                / F.count(F.when(half, F.col("value"))),
                6,
            ).alias("x"),
            F.round(
                F.sum(
                    F.when(~half, F.col("value").cast("decimal(18,6)"))
                ).cast("double")
                / F.count(F.when(~half, F.col("value"))),
                6,
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    return agreement_summary(per_u, "x", "y")


@_q(
    "seasonal_mk_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2),
    q AS (SELECT event_type,
                 CAST(EXTRACT(ISODOW FROM day) AS BIGINT) - 1 AS season,
                 CAST(day - DATE '1970-01-01' AS BIGINT) AS t, v
          FROM daily),
    cd AS (
      SELECT a.event_type, a.season,
             CAST(SUM(CASE WHEN (a.t - b.t)::HUGEINT * (a.v - b.v) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN (a.t - b.t)::HUGEINT * (a.v - b.v) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM q a JOIN q b
        ON a.event_type = b.event_type AND a.season = b.season
        AND a.t < b.t
      GROUP BY 1, 2),
    vt AS (
      SELECT event_type, season,
             SUM(tc::HUGEINT * (tc - 1) * (2 * tc + 5)) AS tv,
             CAST(SUM(tc) AS BIGINT) AS n
      FROM (SELECT event_type, season, v,
                   CAST(COUNT(*) AS BIGINT) AS tc
            FROM q GROUP BY 1, 2, 3) GROUP BY 1, 2),
    per_season AS (
      SELECT vt.event_type, vt.season, vt.n,
             CAST(COALESCE(c, 0) - COALESCE(d, 0) AS BIGINT) AS s,
             ROUND(CAST(CAST(n::HUGEINT * (n - 1) * (2 * n + 5) - tv
                             AS VARCHAR) AS DOUBLE) / 18.0, 6) AS vs
      FROM vt LEFT JOIN cd USING (event_type, season) WHERE n >= 2),
    ag AS (
      SELECT event_type,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_seasons,
             CAST(SUM(s) AS BIGINT) AS s_stat,
             ROUND(SUM(vs), 6) AS var_s
      FROM per_season GROUP BY 1),
    z AS (
      SELECT *, CASE WHEN var_s > 0 THEN
          ROUND(CASE WHEN s_stat > 0
                     THEN (s_stat - 1) / SQRT(var_s)
                     WHEN s_stat < 0
                     THEN (s_stat + 1) / SQRT(var_s)
                     ELSE 0.0 END, 6) END AS z
      FROM ag)
    SELECT event_type, n, n_seasons, s_stat, var_s, z,
           CASE WHEN z IS NULL THEN NULL
                WHEN z > 1.959963984540054 THEN 'increasing'
                WHEN z < -1.959963984540054 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM z ORDER BY event_type
    """,
    doc="Seasonal Mann-Kendall trend test on daily event counts per "
    "type, seasons = weekday "
    "(operators/series.py:seasonal_mann_kendall; Hirsch-Slack) — "
    "mann_kendall_daily with the weekly cycle CONTROLLED FOR: S and "
    "Var(S) within each weekday, summed (independence additivity, "
    "documented), continuity-corrected z on the totals. Pure "
    "composition over mann_kendall_trend — inherits both kendall "
    "lanes and the shared pair guard",
)
def seasonal_mk_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import seasonal_mann_kendall

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("v"))
    daily = daily.select(
        "event_type",
        # ISO dow − 1 (Mon=0): Spark dayofweek is 1=Sunday
        ((F.dayofweek("day") + 5) % 7).cast("long").alias("season"),
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("t"),
        "v",
    )
    return seasonal_mann_kendall(
        daily, ["event_type"], "t", "v", "season"
    )


@_q(
    "cox_stuart_daily",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    q AS (SELECT event_type AS g, day AS o,
                 CAST(ROUND(v * 1000000, 0) AS BIGINT) AS v
          FROM daily),
    rn AS (SELECT g, v,
                  ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) AS rn,
                  COUNT(*) OVER (PARTITION BY g) AS n
           FROM q),
    first AS (SELECT g, rn AS i, v AS v1, n FROM rn
              WHERE rn <= CAST(FLOOR(n / 2) AS BIGINT)),
    second AS (SELECT g, rn - (n - CAST(FLOOR(n / 2) AS BIGINT)) AS i,
                      v AS v2
               FROM rn WHERE rn > n - CAST(FLOOR(n / 2) AS BIGINT)),
    pairs AS (SELECT first.g, first.n, v1, v2
              FROM first JOIN second USING (g, i)),
    ag AS (SELECT g, CAST(MAX(n) AS BIGINT) AS n,
                  CAST(COUNT(*) AS BIGINT) AS m_pairs,
                  CAST(SUM(CASE WHEN v2 > v1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_pos,
                  CAST(SUM(CASE WHEN v2 < v1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_neg
           FROM pairs GROUP BY 1)
    SELECT g AS event_type, n, m_pairs, n_pos, n_neg,
           ROUND(CASE WHEN n_pos + n_neg > 0 THEN
                 CAST(n_pos - n_neg AS DOUBLE)
                 / SQRT(CAST(n_pos + n_neg AS DOUBLE)) END, 6) AS z
    FROM ag ORDER BY event_type
    """,
    doc="Cox-Stuart sign test for trend on each event type's daily "
    "mean-value series (operators/series.py:cox_stuart_trend) — the "
    "bluntest trend rung (below mann_kendall in power, above in "
    "simplicity): pair the first half with the second half "
    "positionally, sign-test the differences. One row_number window "
    "over the bounded daily rollup + one positional self-join",
)
def cox_stuart_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import cox_stuart_trend

    daily = _daily_mean_frame(spark, sf_dir)
    return cox_stuart_trend(
        daily.select(
            F.col("event_type").alias("g"), F.col("day").alias("o"), "v"
        ),
        ["g"],
        "o",
        "v",
    ).withColumnRenamed("g", "event_type")


@_q(
    "dispersion_daily_counts",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    ag AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x::HUGEINT) AS s1,
             SUM(x::HUGEINT * x) AS s2
      FROM daily GROUP BY 1),
    m AS (SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
                 CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
                 CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d
          FROM ag),
    fin AS (SELECT event_type, n,
                   s1d / nd AS mean,
                   CASE WHEN n >= 2 THEN
                     (s2d - s1d * s1d / nd) / (nd - 1) END AS variance,
                   nd
            FROM m)
    SELECT event_type, n,
           ROUND(CASE WHEN n >= 1 THEN mean END, 6) AS mean,
           ROUND(variance, 6) AS variance,
           ROUND(CASE WHEN n >= 2 AND mean > 0
                 THEN variance / mean END, 6) AS dispersion,
           ROUND(CASE WHEN n >= 2 AND mean > 0
                 THEN (nd - 1) * variance / mean END, 6) AS chi2
    FROM fin ORDER BY event_type
    """,
    doc="Index of dispersion (variance-to-mean) of daily event "
    "counts per type (operators/series.py:dispersion_index) — the "
    "Poissonness gate BEFORE poisson_rate_halves' rate-ratio z "
    "means anything: D >> 1 = bursts (burstiness_event_types' "
    "distributional cousin), D << 1 = rate limiting. ONE aggregate "
    "over the daily rollup; exact DECIMAL(38,0)/HUGEINT moments",
)
def dispersion_daily_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.series import dispersion_index

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    return dispersion_index(daily, ["event_type"], "x")


# ---------------------------------------------------------------------------
# Round-11 wave 3: score quality, ordinal agreement, robust location,
# vocabulary economics
# ---------------------------------------------------------------------------


@_q(
    "brier_decomp_events",
    """
    WITH base AS (
      SELECT GREATEST(0, LEAST(1000000,
               CAST(FLOOR(LEAST(value / 500.0, 1.0) * 1000000 + 0.5)
                    AS BIGINT))) AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    binned AS (
      SELECT LEAST(19, CAST(FLOOR(p * 20 / 1000000.0) AS BIGINT)) AS b,
             p, y
      FROM base),
    per_bin AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS nk,
             CAST(SUM(p) AS BIGINT) AS sp,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM((p - y * 1000000)::HUGEINT * (p - y * 1000000)) AS se
      FROM binned GROUP BY 1),
    gl AS (
      SELECT CAST(SUM(nk) AS BIGINT) AS n,
             CAST(SUM(sy) AS BIGINT) AS ty,
             SUM(se) AS tse
      FROM per_bin),
    terms AS (
      SELECT MAX(g.n) AS n, MAX(g.ty) AS ty,
             MAX(CAST(CAST(g.tse AS VARCHAR) AS DOUBLE)) AS tse,
             SUM(pb.nk * POW(CAST(pb.sp AS DOUBLE) / pb.nk / 1e6
                             - CAST(pb.sy AS DOUBLE) / pb.nk, 2))
               AS rel_n,
             SUM(pb.nk * POW(CAST(pb.sy AS DOUBLE) / pb.nk
                             - CAST(g.ty AS DOUBLE) / g.n, 2)) AS res_n
      FROM per_bin pb CROSS JOIN gl g),
    m AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                 CAST(ty AS DOUBLE) / n AS ob,
                 tse, rel_n, res_n
          FROM terms)
    SELECT COALESCE(n, 0) AS n, CAST(20 AS BIGINT) AS n_bins,
           ROUND(CASE WHEN n > 0 THEN ob END, 6) AS base_rate,
           ROUND(CASE WHEN n > 0 THEN tse / nd / 1e12 END, 6) AS brier,
           ROUND(CASE WHEN n > 0 THEN rel_n / nd - res_n / nd
                 + ob * (1 - ob) END, 6) AS brier_binned,
           ROUND(CASE WHEN n > 0 THEN rel_n / nd END, 6) AS reliability,
           ROUND(CASE WHEN n > 0 THEN res_n / nd END, 6) AS resolution,
           ROUND(CASE WHEN n > 0 THEN ob * (1 - ob) END, 6)
             AS uncertainty
    FROM m
    """,
    doc="Murphy decomposition of the Brier score for the synthetic "
    "value->purchase probability "
    "(operators/classify.py:brier_decomposition) — WHY "
    "calibration_brier_events' score is bad: reliability (fixable "
    "by recalibration) vs resolution (needs a better score) vs the "
    "base-rate uncertainty floor; brier - brier_binned = within-bin "
    "forecast variance. The calibration_report micros/bin "
    "discipline verbatim; all bin sums exact",
)
def brier_decomp_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import brier_decomposition

    ev = load_events(spark, sf_dir)
    scored = ev.select(
        F.least(F.col("value") / 500.0, F.lit(1.0)).alias("p"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return brier_decomposition(scored, "p", "y", n_bins=20)


@_q(
    "youden_purchase_value",
    """
    WITH base AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    per_v AS (SELECT v, CAST(SUM(y) AS BIGINT) AS tp,
                     CAST(SUM(1 - y) AS BIGINT) AS tn
              FROM base GROUP BY 1),
    tot AS (SELECT CAST(SUM(tp) AS BIGINT) AS np,
                   CAST(SUM(tn) AS BIGINT) AS nn
            FROM per_v),
    run AS (SELECT v,
                   SUM(tp) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cp,
                   SUM(tn) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cn
            FROM per_v),
    j AS (SELECT run.v, run.cp, run.cn, tot.np, tot.nn,
                 run.cp::HUGEINT * tot.nn - run.cn::HUGEINT * tot.np
                   AS jn
          FROM run CROSS JOIN tot),
    best AS (SELECT * FROM j ORDER BY jn DESC, v ASC LIMIT 1)
    SELECT CAST(np + nn AS BIGINT) AS n,
           np AS n_pos, nn AS n_neg,
           ROUND(CASE WHEN np > 0 AND nn > 0
                 THEN CAST(v AS DOUBLE) / 100.0 END, 6) AS threshold,
           ROUND(CASE WHEN np > 0 AND nn > 0
                 THEN CAST(cp AS DOUBLE) / np END, 6) AS tpr,
           ROUND(CASE WHEN np > 0 AND nn > 0
                 THEN CAST(cn AS DOUBLE) / nn END, 6) AS fpr,
           ROUND(CASE WHEN np > 0 AND nn > 0
                 THEN CAST(cp AS DOUBLE) / np
                      - CAST(cn AS DOUBLE) / nn END, 6) AS youden_j
    FROM best
    """,
    doc="Youden-J-optimal value threshold for flagging purchases "
    "(operators/classify.py:youden_threshold) — the OPERATING POINT "
    "roc_auc_events' area doesn't pick: argmax TPR(t) - FPR(t) over "
    "'predict purchase when value >= t', ties toward the lowest "
    "threshold. Exact integer J numerator cp*Nn - cn*Np off ONE "
    "guarded descending prefix window over distinct cent values; "
    "argmax is a TakeOrdered(1)",
)
def youden_purchase_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import youden_threshold

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isNotNull()
    )
    return youden_threshold(
        ev.select(
            F.col("value").alias("s"),
            (F.col("event_type") == "purchase").alias("y"),
        ),
        "s",
        "y",
        scale=100,
    )


@_q(
    "weighted_kappa_user_value",
    """
    WITH pu AS (
      SELECT user_id,
        ROUND(CAST(SUM(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
              / COUNT(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                      THEN value END), 6) AS x,
        ROUND(CAST(SUM(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
              / COUNT(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
                      THEN value END), 6) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    tiers AS (
      SELECT CASE WHEN x < 50 THEN 0 WHEN x < 150 THEN 1 ELSE 2 END
               AS i,
             CASE WHEN y < 50 THEN 0 WHEN y < 150 THEN 1 ELSE 2 END
               AS j
      FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
    cells AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS f
              FROM tiers GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(f) AS BIGINT) AS n FROM cells),
    ma AS (SELECT i, CAST(SUM(f) AS BIGINT) AS fa FROM cells GROUP BY 1),
    mb AS (SELECT j, CAST(SUM(f) AS BIGINT) AS fb FROM cells GROUP BY 1),
    po AS (SELECT SUM(ABS(i - j) / 2.0 * f
                      / (SELECT n FROM tot)) AS po
           FROM cells),
    pe AS (SELECT SUM(ABS(ma.i - mb.j) / 2.0
                      * ma.fa * mb.fb
                      / ((SELECT n FROM tot)::DOUBLE
                         * (SELECT n FROM tot))) AS pe
           FROM ma CROSS JOIN mb)
    SELECT COALESCE((SELECT n FROM tot), 0) AS n,
           CAST(3 AS BIGINT) AS k,
           ROUND((SELECT po FROM po), 6) AS po_w,
           ROUND((SELECT pe FROM pe), 6) AS pe_w,
           ROUND(CASE WHEN (SELECT pe FROM pe) > 0
                 THEN 1.0 - (SELECT po FROM po) / (SELECT pe FROM pe)
                 END, 6) AS kappa_w
    """,
    doc="Linear weighted kappa of each user's value TIER (lo/mid/hi "
    "at the 50/150 literal cuts), first half vs second half "
    "(operators/classify.py:weighted_kappa) — kappa_rule_events' "
    "ordinal upgrade and bowker_user_shift's agreement-strength "
    "complement: disagreeing by one tier is not disagreeing by two. "
    "Exact cells/marginals, k x k expected grid, injected rational "
    "weights",
)
def weighted_kappa_user_value_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.classify import weighted_kappa

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    half = F.to_date("ts") <= F.lit("2024-01-15").cast("date")
    per_u = (
        ev.groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(half, F.col("value").cast("decimal(18,6)"))
                ).cast("double")
                / F.count(F.when(half, F.col("value"))),
                6,
            ).alias("x"),
            F.round(
                F.sum(
                    F.when(~half, F.col("value").cast("decimal(18,6)"))
                ).cast("double")
                / F.count(F.when(~half, F.col("value"))),
                6,
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )

    def tier(c):
        return (
            F.when(F.col(c) < 50, F.lit("lo"))
            .when(F.col(c) < 150, F.lit("mid"))
            .otherwise(F.lit("hi"))
        )

    tiers = per_u.select(tier("x").alias("a"), tier("y").alias("b"))
    return weighted_kappa(tiers, "a", "b", ["lo", "mid", "hi"])


@_q(
    "cohens_h_click_error",
    """
    WITH base AS (
      SELECT event_type = 'click' AS a,
             CASE WHEN value > 100 THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'error')),
    ag AS (
      SELECT CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN a THEN y END) AS BIGINT) AS ra,
             CAST(SUM(CASE WHEN NOT a THEN y END) AS BIGINT) AS rb
      FROM base),
    m AS (SELECT n_a, n_b,
                 COALESCE(ra, 0) / CAST(n_a AS DOUBLE) AS pa,
                 COALESCE(rb, 0) / CAST(n_b AS DOUBLE) AS pb
          FROM ag)
    SELECT n_a, n_b,
           ROUND(CASE WHEN n_a > 0 THEN pa END, 6) AS p_a,
           ROUND(CASE WHEN n_b > 0 THEN pb END, 6) AS p_b,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 THEN pa - pb END, 6)
             AS risk_diff,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 THEN
                 2 * ASIN(SQRT(pa)) - 2 * ASIN(SQRT(pb)) END, 6)
             AS cohens_h
    FROM m
    """,
    doc="Cohen's h effect size for P(value > 100) between click and "
    "error events (operators/classify.py:cohens_h) — the "
    "proportion-scale companion to cohens_d_purchase_click (means) "
    "and cliffs_delta_click_error (dominance): arcsine-stabilized "
    "difference, constant detectability across the base-rate range. "
    "ONE conditional aggregate",
)
def cohens_h_click_error_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.classify import cohens_h

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "error")
        & F.col("value").isNotNull()
    )
    return cohens_h(
        ev.select("event_type", (F.col("value") > 100).alias("y")),
        "event_type",
        "click",
        "y",
    )


@_q(
    "biweight_value_types",
    """
    WITH base AS (
      SELECT event_type AS g,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    dist AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS t
             FROM base GROUP BY 1, 2),
    run AS (SELECT g, v, t,
                   SUM(t) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
                     UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   SUM(t) OVER (PARTITION BY g) AS n
            FROM dist),
    med AS (SELECT g, MIN(v) AS med FROM run
            WHERE cum * 2 >= n GROUP BY 1),
    dev AS (SELECT d.g, ABS(d.v - med.med) AS ad,
                   CAST(SUM(d.t) AS BIGINT) AS t
            FROM dist d JOIN med USING (g) GROUP BY 1, 2),
    rund AS (SELECT g, ad, t,
                    SUM(t) OVER (PARTITION BY g ORDER BY ad ROWS BETWEEN
                      UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                    SUM(t) OVER (PARTITION BY g) AS n
             FROM dev),
    mad AS (SELECT g, MIN(ad) AS mad FROM rund
            WHERE cum * 2 >= n GROUP BY 1),
    jm AS (SELECT d.g, d.v, d.t, med.med, mad.mad,
                  CASE WHEN mad.mad > 0 THEN
                    (d.v - med.med) / (6.0 * mad.mad) END AS u
           FROM dist d JOIN med USING (g) JOIN mad USING (g)),
    ag AS (
      SELECT g, CAST(SUM(t) AS BIGINT) AS n,
             MAX(med) AS med, MAX(mad) AS mad,
             SUM(CASE WHEN mad > 0 AND ABS(u) < 1 THEN
                 (v - med) * POW(1 - u * u, 2) * t END) AS num,
             SUM(CASE WHEN mad > 0 AND ABS(u) < 1 THEN
                 POW(1 - u * u, 2) * t END) AS den
      FROM jm GROUP BY 1)
    SELECT g AS event_type, n,
           ROUND(CAST(med AS DOUBLE) / 100.0, 6) AS median,
           ROUND(CAST(mad AS DOUBLE) / 100.0, 6) AS mad,
           ROUND(CASE WHEN mad > 0 AND den > 0
                 THEN (med + num / den) / 100.0
                 ELSE CAST(med AS DOUBLE) / 100.0 END, 6)
             AS biweight_loc
    FROM ag ORDER BY event_type
    """,
    doc="Tukey biweight one-step robust location of event value per "
    "type (operators/relational.py:biweight_location) — the "
    "robust-location rung above the median (trimmed_mean drops a "
    "fixed fraction; the biweight down-weights smoothly, c = 6): "
    "median and MAD are running-count crossings over GUARDED "
    "distinct-cent frames, the weighted fold rides the same reduced "
    "frame — the fact is scanned once",
)
def biweight_value_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import biweight_location

    ev = load_events(spark, sf_dir)
    return biweight_location(
        ev.select(F.col("event_type").alias("g"), "value"), ["g"], "value"
    ).withColumnRenamed("g", "event_type")


@_q(
    "vocab_richness_sources",
    """
    WITH toks AS (
      SELECT source,
             unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               ' ')) AS tok
      FROM documents),
    counts AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2),
    ag AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dis
      FROM counts GROUP BY 1)
    SELECT source, n_tokens, vocab, hapax, dis,
           ROUND(CASE WHEN n_tokens > 0 THEN
                 CAST(hapax AS DOUBLE) / n_tokens END, 6)
             AS gt_unseen_mass,
           ROUND(CASE WHEN vocab > 0 THEN
                 vocab + CAST(hapax AS DOUBLE) * (hapax - 1)
                 / (2.0 * (dis + 1)) END, 6) AS chao1
    FROM ag ORDER BY source
    """,
    doc="Vocabulary richness + unseen-mass estimators per document "
    "source (operators/text.py:vocab_richness) — the 'how much "
    "vocabulary is OUT there' readout next to heaps_law_docs' "
    "growth fit: Good-Turing unseen mass n1/N (keep crawling if "
    "high) and bias-corrected Chao1 total-vocabulary floor "
    "(exhausted if ~V). One (source, token) aggregate + a "
    "frequency-of-frequencies rollup — vocabulary-sized, never "
    "corpus-sized",
)
def vocab_richness_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import vocab_richness

    docs = load(spark, sf_dir, "documents")
    return vocab_richness(docs, "source", "text")


@_q(
    "source_cross_entropy_docs",
    """
    WITH toks AS (
      SELECT source,
             unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               ' ')) AS tok
      FROM documents),
    counts AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2),
    pool AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cp
             FROM counts GROUP BY 1),
    tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS np,
                   CAST(COUNT(*) AS BIGINT) AS vp
            FROM pool),
    j AS (SELECT counts.source, counts.c, pool.cp, tot.np, tot.vp
          FROM counts JOIN pool USING (tok) CROSS JOIN tot),
    ag AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             SUM(c * LN((cp + 0.5) / (np + 0.5 * vp)) / LN(2))
               AS sxp,
             SUM(c * LN(CAST(c AS DOUBLE)) / LN(2)) AS sxs
      FROM j GROUP BY 1),
    m AS (SELECT source, n_tokens, vocab,
                 CAST(n_tokens AS DOUBLE) AS nd, sxp, sxs
          FROM ag),
    fin AS (SELECT source, n_tokens, vocab,
                   -sxp / nd AS h_cross,
                   LN(nd) / LN(2) - sxs / nd AS h_source
            FROM m WHERE n_tokens > 0)
    SELECT source, n_tokens, vocab,
           ROUND(h_source, 6) AS h_source,
           ROUND(h_cross, 6) AS h_cross,
           ROUND(h_cross - h_source, 6) AS kl_vs_pool,
           ROUND(POW(2.0, h_cross), 6) AS ppl_vs_pool
    FROM fin ORDER BY source
    """,
    doc="Per-source cross-entropy (bits/token) against the pooled "
    "add-0.5-smoothed unigram LM "
    "(operators/text.py:source_cross_entropy) — the mixture-audit "
    "number jsd_source_docs' symmetric distance doesn't give: "
    "'this source costs H bits/token under the corpus model', "
    "kl_vs_pool isolates divergence from own entropy, ppl = 2^H is "
    "what a tokenizer/LM budget planner quotes. One (source, token) "
    "aggregate + a pooled rollup reusing it; log folds renormalized "
    "by N_src",
)
def source_cross_entropy_docs_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators.text import source_cross_entropy

    docs = load(spark, sf_dir, "documents")
    return source_cross_entropy(docs, "source", "text")


@_q(
    "partial_corr_lineitem",
    """
    WITH base AS (
      SELECT CAST(l_quantity AS DECIMAL(18,6)) AS x,
             CAST(l_extendedprice AS DECIMAL(18,6)) AS y,
             CAST(l_discount AS DECIMAL(18,6)) AS z
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS DECIMAL(38,6))) AS sx,
             SUM(CAST(y AS DECIMAL(38,6))) AS sy,
             SUM(CAST(z AS DECIMAL(38,6))) AS sz,
             SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sxx,
             SUM(CAST(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS syy,
             SUM(CAST(CAST(z AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS szz,
             SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sxy,
             SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sxz,
             SUM(CAST(CAST(y AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS syz
      FROM base),
    d AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                 CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx,
                 CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS sy,
                 CAST(CAST(sz AS VARCHAR) AS DOUBLE) AS sz,
                 CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxx,
                 CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syy,
                 CAST(CAST(szz AS VARCHAR) AS DOUBLE) AS szz,
                 CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxy,
                 CAST(CAST(sxz AS VARCHAR) AS DOUBLE) AS sxz,
                 CAST(CAST(syz AS VARCHAR) AS DOUBLE) AS syz
          FROM ag),
    rs AS (
      SELECT n,
        ROUND((nd*sxy - sx*sy)
              / SQRT((nd*sxx - sx*sx) * (nd*syy - sy*sy)), 6) AS r_xy,
        ROUND((nd*sxz - sx*sz)
              / SQRT((nd*sxx - sx*sx) * (nd*szz - sz*sz)), 6) AS r_xz,
        ROUND((nd*syz - sy*sz)
              / SQRT((nd*syy - sy*sy) * (nd*szz - sz*sz)), 6) AS r_yz
      FROM d),
    fin AS (
      SELECT *, SQRT((1 - r_xz*r_xz) * (1 - r_yz*r_yz)) AS den
      FROM rs)
    SELECT n, r_xy, r_xz, r_yz,
           ROUND(CASE WHEN den > 0
                 THEN (r_xy - r_xz*r_yz) / den END, 6) AS partial_r
    FROM fin
    """,
    doc="Partial correlation of quantity and extended price "
    "controlling for discount (operators/relational.py:partial_corr) "
    "— the 3-variable confounder check next to q12_correlations' raw "
    "Pearson grid: a raw correlation that collapses when z is "
    "partialled out was z all along. Nine exact DECIMAL moments in "
    "ONE aggregate; each pairwise r rounds to 6 BEFORE composing "
    "(the ljung_box quantize-then-compose convention)",
)
def partial_corr_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import partial_corr

    li = load(spark, sf_dir, "lineitem")
    return partial_corr(li, "l_quantity", "l_extendedprice", "l_discount")


@_q(
    "covariate_balance_arms",
    """
    WITH base AS (
      SELECT user_id % 2 = 0 AS a,
             CAST(value AS DECIMAL(18,6)) AS v_value,
             CAST(EXTRACT(DAY FROM CAST(ts AS DATE)) AS DECIMAL(18,6))
               AS v_day
      FROM events WHERE value IS NOT NULL),
    mom AS (
      SELECT
        CAST(COUNT(CASE WHEN a THEN v_value END) AS BIGINT) AS n_a_value,
        SUM(CASE WHEN a THEN CAST(v_value AS DECIMAL(38,6)) END)
          AS s_a_value,
        SUM(CASE WHEN a THEN CAST(v_value * v_value AS DECIMAL(38,12))
            END) AS q_a_value,
        CAST(COUNT(CASE WHEN NOT a THEN v_value END) AS BIGINT)
          AS n_b_value,
        SUM(CASE WHEN NOT a THEN CAST(v_value AS DECIMAL(38,6)) END)
          AS s_b_value,
        SUM(CASE WHEN NOT a THEN
            CAST(v_value * v_value AS DECIMAL(38,12)) END) AS q_b_value,
        CAST(COUNT(CASE WHEN a THEN v_day END) AS BIGINT) AS n_a_day,
        SUM(CASE WHEN a THEN CAST(v_day AS DECIMAL(38,6)) END)
          AS s_a_day,
        SUM(CASE WHEN a THEN CAST(v_day * v_day AS DECIMAL(38,12)) END)
          AS q_a_day,
        CAST(COUNT(CASE WHEN NOT a THEN v_day END) AS BIGINT)
          AS n_b_day,
        SUM(CASE WHEN NOT a THEN CAST(v_day AS DECIMAL(38,6)) END)
          AS s_b_day,
        SUM(CASE WHEN NOT a THEN
            CAST(v_day * v_day AS DECIMAL(38,12)) END) AS q_b_day
      FROM base),
    melted AS (
      SELECT 'day' AS covariate, n_a_day AS n_a, n_b_day AS n_b,
             CAST(CAST(s_a_day AS VARCHAR) AS DOUBLE) AS sa,
             CAST(CAST(q_a_day AS VARCHAR) AS DOUBLE) AS qa,
             CAST(CAST(s_b_day AS VARCHAR) AS DOUBLE) AS sb,
             CAST(CAST(q_b_day AS VARCHAR) AS DOUBLE) AS qb
      FROM mom
      UNION ALL
      SELECT 'value', n_a_value, n_b_value,
             CAST(CAST(s_a_value AS VARCHAR) AS DOUBLE),
             CAST(CAST(q_a_value AS VARCHAR) AS DOUBLE),
             CAST(CAST(s_b_value AS VARCHAR) AS DOUBLE),
             CAST(CAST(q_b_value AS VARCHAR) AS DOUBLE)
      FROM mom),
    m AS (
      SELECT covariate, n_a, n_b,
             CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
             sa / n_a AS ma, sb / n_b AS mb,
             (qa - sa * sa / n_a) / (n_a - 1) AS va,
             (qb - sb * sb / n_b) / (n_b - 1) AS vb
      FROM melted),
    fin AS (
      SELECT covariate, n_a, n_b, ma, mb,
             (va + vb) / 2.0 AS pooled,
             n_a >= 2 AND n_b >= 2 AND (va + vb) / 2.0 > 0 AS ok
      FROM m)
    SELECT covariate, n_a, n_b,
           ROUND(CASE WHEN n_a > 0 THEN ma END, 6) AS mean_a,
           ROUND(CASE WHEN n_b > 0 THEN mb END, 6) AS mean_b,
           ROUND(CASE WHEN ok THEN (ma - mb) / SQRT(pooled) END, 6)
             AS smd,
           CASE WHEN ok THEN
             ABS(ROUND((ma - mb) / SQRT(pooled), 6)) < 0.1 END
             AS balanced
    FROM fin ORDER BY covariate
    """,
    doc="Standardized-mean-difference balance table between the two "
    "user-parity arms over event value and day-of-month "
    "(operators/relational.py:covariate_balance) — the FIRST table "
    "an experiment readout shows (srm_user_arms checks the counts; "
    "this checks the covariates): |SMD| < 0.1 is the conventional "
    "balance line (injected literal). ONE conditional moment "
    "aggregate — covariates widen the projection, not the shuffle — "
    "plus a k-row literal melt",
)
def covariate_balance_arms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import covariate_balance

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    df = ev.select(
        (F.col("user_id") % 2 == 0).alias("arm"),
        F.col("value").alias("value"),
        F.dayofmonth(F.to_date("ts")).alias("day"),
    )
    return covariate_balance(df, "arm", True, False, ["day", "value"])
