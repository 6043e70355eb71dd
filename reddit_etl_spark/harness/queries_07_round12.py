"""Harness queries (part 7): round-12 registrations.

Wave 1 — association/effect/agreement completion: Cramér's V (+ the
adjusted-residuals drill-down), rank-biserial/CLES, Glass's Δ, η²/ω²,
Krippendorff's alpha, Gwet's AC1 and Stuart-Maxwell marginal
homogeneity. Each pairs a Spark builder with an independent DuckDB
oracle per the package conventions (see __init__ docstring).
"""

from __future__ import annotations

from ._common import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _q,
    load,
    load_events,
)
from .queries_04_series_tpch import (  # noqa: F401
    _DAILY_MEAN_SQL,
    _daily_mean_frame,
)


@_q(
    "cramers_v_status_priority",
    """
    WITH cells AS (
      SELECT o_orderstatus AS x, o_orderpriority AS y,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2),
    rm AS (SELECT x, CAST(SUM(o) AS BIGINT) AS rm FROM cells GROUP BY 1),
    cm AS (SELECT y, CAST(SUM(o) AS BIGINT) AS cm FROM cells GROUP BY 1),
    s AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT cells.x) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT cells.y) AS BIGINT) AS c,
             SUM(CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
                 / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE))) AS sm
      FROM cells JOIN rm USING (x) JOIN cm USING (y)),
    m AS (
      SELECT n, r, c,
             CAST(n AS DOUBLE) * (sm - 1.0) AS chi2,
             CAST(n AS DOUBLE) * (sm - 1.0) / CAST(n AS DOUBLE) AS phi2,
             CAST(r AS DOUBLE) AS rd, CAST(c AS DOUBLE) AS cd,
             CAST(n AS DOUBLE) AS nd
      FROM s),
    m2 AS (
      SELECT n, r, c, chi2,
             SQRT(phi2 / LEAST(rd - 1.0, cd - 1.0)) AS v,
             GREATEST(phi2 - (rd - 1.0) * (cd - 1.0) / (nd - 1.0), 0.0)
               AS phi2p,
             rd - (rd - 1.0) * (rd - 1.0) / (nd - 1.0) AS rp,
             cd - (cd - 1.0) * (cd - 1.0) / (nd - 1.0) AS cp,
             r >= 2 AND c >= 2 AND n >= 2 AS ok
      FROM m)
    SELECT n, r, c,
           ROUND(CASE WHEN ok THEN chi2 END, 6) AS chi2,
           ROUND(CASE WHEN ok THEN v END, 6) AS cramers_v,
           ROUND(CASE WHEN ok THEN
             SQRT(phi2p / LEAST(rp - 1.0, cp - 1.0)) END, 6)
             AS cramers_v_corrected
    FROM m2
    """,
    doc="Bias-corrected Cramér's V between order status and priority "
    "(operators/relational.py:cramers_v) — the symmetric 0..1 "
    "effect-size rung next to chi2_status_priority (significance) "
    "and mi_status_priority (information). χ² via the observed-"
    "cells-only n·(Σo²/(rm·cm) − 1) identity off ONE cell "
    "aggregate + two broadcast margin rollups; Bergsma correction "
    "closed-form",
)
def cramers_v_status_priority_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.relational import cramers_v

    return cramers_v(
        load(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority"
    )


@_q(
    "chi2_residuals_status_priority",
    """
    WITH cells AS (
      SELECT o_orderstatus AS x, o_orderpriority AS y,
             CAST(COUNT(*) AS BIGINT) AS observed
      FROM orders GROUP BY 1, 2),
    rm AS (SELECT x, CAST(SUM(observed) AS BIGINT) AS rm
           FROM cells GROUP BY 1),
    cm AS (SELECT y, CAST(SUM(observed) AS BIGINT) AS cm
           FROM cells GROUP BY 1),
    tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cells),
    j AS (
      SELECT x, y, observed,
             CAST(rm AS DOUBLE) AS rmd, CAST(cm AS DOUBLE) AS cmd,
             CAST(n AS DOUBLE) AS nd
      FROM cells JOIN rm USING (x) JOIN cm USING (y) CROSS JOIN tot),
    e AS (
      SELECT x, y, observed, rmd * cmd / nd AS ex,
             SQRT(rmd * cmd / nd * (1.0 - rmd / nd) * (1.0 - cmd / nd))
               AS den
      FROM j)
    SELECT x, y, observed,
           ROUND(ex, 6) AS expected,
           ROUND(CASE WHEN den > 0 THEN
             (CAST(observed AS DOUBLE) - ex) / den END, 6)
             AS adj_residual
    FROM e ORDER BY x, y
    """,
    doc="Haberman adjusted standardized residuals per (status, "
    "priority) cell (operators/relational.py:chi2_residuals) — the "
    "WHERE to cramers_v's HOW MUCH: |r| > 2 names the cells driving "
    "the association. Observed cells + margins exact off one "
    "aggregate + two broadcast rollups; zero cells omitted by "
    "documented contract on both engines",
)
def chi2_residuals_status_priority_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.relational import chi2_residuals

    return chi2_residuals(
        load(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority"
    )


@_q(
    "rank_biserial_click_error",
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
      SELECT ta, tb,
             CAST(COALESCE(SUM(ta + tb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c
      FROM pv),
    agg AS (
      SELECT CAST(SUM(ta) AS BIGINT) AS na,
             CAST(SUM(tb) AS BIGINT) AS nb,
             CAST(SUM(CAST(ta AS HUGEINT)
                      * (2 * CAST(c AS HUGEINT) + ta + tb + 1))
                  AS HUGEINT) AS r2a
      FROM r),
    u AS (
      SELECT na, nb,
             CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) AS u2
      FROM agg)
    SELECT na AS n_a, nb AS n_b,
           CASE WHEN na > 0 AND nb > 0 THEN u2 / 2 END AS u_a,
           ROUND(CASE WHEN na > 0 AND nb > 0 THEN
             u2 / (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) END, 6)
             AS cles,
           ROUND(CASE WHEN na > 0 AND nb > 0 THEN
             2.0 * (u2 / (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
             - 1.0 END, 6) AS rank_biserial
    FROM u
    """,
    doc="Rank-biserial correlation + common-language effect size for "
    "click-vs-error values (operators/relational.py:rank_biserial) "
    "— the directly-interpretable effect rung: CLES = P(random "
    "click > random error, ties half); rank-biserial = 2·CLES − 1 "
    "equals cliffs_delta_click_error computed via the midrank "
    "prefix lane instead of the cell grid — the cross-lane "
    "agreement is itself an audit. 2×U exact DECIMAL(38,0)/HUGEINT "
    "off the guarded distinct-value window",
)
def rank_biserial_click_error_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.relational import rank_biserial

    ev = load_events(spark, sf_dir)
    return rank_biserial(ev, "value", "event_type", "click", "error")


@_q(
    "glass_delta_purchase_click",
    """
    WITH base AS (
      SELECT CAST(value AS DECIMAL(18,6)) AS x,
             event_type = 'purchase' AS a
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')),
    ag AS (
      SELECT CAST(COUNT(CASE WHEN a THEN 1 END) AS BIGINT) AS n_a,
             CAST(COUNT(CASE WHEN NOT a THEN 1 END) AS BIGINT) AS n_b,
             SUM(CASE WHEN a THEN CAST(x AS DECIMAL(38,6)) END) AS sa,
             SUM(CASE WHEN NOT a THEN CAST(x AS DECIMAL(38,6)) END) AS sb,
             SUM(CASE WHEN a THEN CAST(x * x AS DECIMAL(38,12)) END)
               AS qa,
             SUM(CASE WHEN NOT a THEN CAST(x * x AS DECIMAL(38,12)) END)
               AS qb
      FROM base),
    m AS (
      SELECT n_a, n_b,
             CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
             CAST(CAST(sa AS VARCHAR) AS DOUBLE) AS da,
             CAST(CAST(sb AS VARCHAR) AS DOUBLE) AS db,
             CAST(CAST(qa AS VARCHAR) AS DOUBLE) AS dqa,
             CAST(CAST(qb AS VARCHAR) AS DOUBLE) AS dqb
      FROM ag),
    mm AS (
      SELECT n_a, n_b, na, nb,
             da / na AS ma, db / nb AS mb,
             (dqa - da * da / na) / (na - 1.0) AS va,
             (dqb - db * db / nb) / (nb - 1.0) AS vb
      FROM m),
    st AS (
      SELECT n_a, n_b, na, nb, ma, mb, va, vb,
             SQRT(((na - 1.0) * va + (nb - 1.0) * vb)
                  / (na + nb - 2.0)) AS sp,
             n_a >= 2 AND n_b >= 2 AS ok
      FROM mm)
    SELECT n_a, n_b,
           ROUND(CASE WHEN ok AND sp > 0 THEN (ma - mb) / sp END, 6)
             AS cohens_d,
           ROUND(CASE WHEN ok AND sp > 0 THEN
             (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)) * ((ma - mb) / sp)
             END, 6) AS hedges_g,
           ROUND(CASE WHEN ok AND vb > 0 THEN (ma - mb) / SQRT(vb)
             END, 6) AS glass_delta
    FROM st
    """,
    doc="Glass's Δ (control-sd standardization) with pooled d and "
    "Hedges' g, purchase vs click values, UNGROUPED "
    "(operators/relational.py:standardized_effects) — Δ = (x̄_a − "
    "x̄_b)/s_b is the right denominator when treatment changes "
    "spread as well as location; the pooled d/g here also cross-"
    "audit cohens_d_purchase_click's per-weekday lane (different "
    "grouping, same moment discipline). ONE conditional DECIMAL "
    "moment aggregate",
)
def glass_delta_purchase_click_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.relational import standardized_effects

    ev = load_events(spark, sf_dir)
    return standardized_effects(
        ev, "value", "event_type", "purchase", "click"
    )


@_q(
    "eta_squared_event_values",
    """
    WITH base AS (
      SELECT event_type AS g, CAST(value AS DECIMAL(18,6)) AS x
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    pg AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
             SUM(CAST(x AS DECIMAL(38,6))) AS sg,
             SUM(CAST(x * x AS DECIMAL(38,12))) AS qg
      FROM base GROUP BY 1),
    ag AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(CAST(SUM(CAST(sg AS DECIMAL(38,6))) AS VARCHAR)
                  AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(qg AS DECIMAL(38,12))) AS VARCHAR)
                  AS DOUBLE) AS q,
             SUM(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                 / CAST(ng AS DOUBLE)) AS sb
      FROM pg),
    m AS (
      SELECT n, k,
             CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
             q - s * s / CAST(n AS DOUBLE) AS sst,
             sb - s * s / CAST(n AS DOUBLE) AS ssb
      FROM ag),
    m2 AS (
      SELECT n, k, nd, kd, sst, ssb,
             (sst - ssb) / (nd - kd) AS msw,
             ssb / sst AS eta2,
             n > k AND k >= 2 AND sst > 0 AS ok
      FROM m)
    SELECT n, k,
           ROUND(CASE WHEN ok THEN eta2 END, 6) AS eta_squared,
           ROUND(CASE WHEN ok THEN
             (ssb - (kd - 1.0) * msw) / (sst + msw) END, 6)
             AS omega_squared,
           ROUND(CASE WHEN ok AND eta2 < 1.0 THEN
             SQRT(eta2 / (1.0 - eta2)) END, 6) AS cohens_f
    FROM m2
    """,
    doc="η², ω² and Cohen's f for value-by-event-type "
    "(operators/relational.py:variance_explained) — the effect-size "
    "readout next to anova_event_values' F: how much variance the "
    "grouping explains, bias-corrected (ω²), plus the f that "
    "power_mde planning consumes. Per-group exact DECIMAL moments "
    "off one aggregate + one k-row fold",
)
def eta_squared_event_values_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.relational import variance_explained

    ev = load_events(spark, sf_dir)
    return variance_explained(ev, "value", "event_type")


@_q(
    "krippendorff_alpha_doc_rules",
    """
    WITH ratings AS (
      SELECT doc_id AS u,
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
    nuc AS (
      SELECT u, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM ratings GROUP BY 1, 2),
    per_u AS (
      SELECT u, CAST(SUM(n) AS BIGINT) AS m,
             SUM(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS sq
      FROM nuc GROUP BY 1 HAVING SUM(n) >= 2),
    units AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(m) AS BIGINT) AS nn,
             SUM((CAST(m AS DOUBLE) * CAST(m AS DOUBLE) - sq)
                 / (CAST(m AS DOUBLE) - 1.0)) AS do_sum
      FROM per_u),
    ncs AS (
      SELECT c, CAST(SUM(n) AS BIGINT) AS nc
      FROM nuc JOIN per_u USING (u) GROUP BY 1),
    cats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_categories,
             SUM(CAST(nc AS DOUBLE) * CAST(nc AS DOUBLE)) AS csq
      FROM ncs),
    m AS (
      SELECT n_units, nn, k_categories,
             do_sum / CAST(nn AS DOUBLE) AS d_o,
             (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - csq)
               / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)) AS d_e
      FROM units CROSS JOIN cats)
    SELECT n_units,
           COALESCE(nn, 0) AS n_ratings,
           COALESCE(k_categories, 0) AS k_categories,
           ROUND(CASE WHEN nn >= 2 THEN d_o END, 6) AS d_o,
           ROUND(CASE WHEN nn >= 2 AND d_e > 0 THEN d_e END, 6) AS d_e,
           ROUND(CASE WHEN nn >= 2 AND d_e > 0 THEN 1.0 - d_o / d_e
             END, 6) AS alpha
    FROM m
    """,
    doc="Krippendorff's alpha (nominal) across the three document-"
    "quality raters (operators/classify.py:krippendorff_alpha) — "
    "the missing-tolerant agreement rung above fleiss_doc_rules' "
    "constant-r design: units contribute with ANY number of "
    "ratings. D_o via the within-unit closed form m² − Σn_uc² "
    "(no pair join); all counts exact off one (unit, value) "
    "aggregate + two rollups",
)
def krippendorff_alpha_doc_rules_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.classify import krippendorff_alpha
    from ..operators.text import normalize_text_col

    docs = load(spark, sf_dir, "documents")
    pf = F.lit("pass")
    ff = F.lit("fail")
    r1 = docs.select(
        F.col("doc_id").alias("u"),
        F.when(F.col("n_chars") >= 150, pf).otherwise(ff).alias("c"),
    )
    r2 = docs.select(
        F.col("doc_id").alias("u"),
        F.when(F.col("n_chars") >= 250, pf).otherwise(ff).alias("c"),
    )
    r3 = docs.select(
        F.col("doc_id").alias("u"),
        F.when(
            F.size(F.split(normalize_text_col("text"), " ")) >= 45, pf
        )
        .otherwise(ff)
        .alias("c"),
    )
    return krippendorff_alpha(r1.unionAll(r2).unionAll(r3), "u", "c")


@_q(
    "gwets_ac1_doc_rules",
    """
    WITH base AS (
      SELECT CASE WHEN n_chars >= 150 THEN 'pass' ELSE 'fail' END AS a,
             CASE WHEN len(string_split(trim(regexp_replace(
                 lower(text), '\\s+', ' ', 'g')), ' ')) >= 45
               THEN 'pass' ELSE 'fail' END AS b
      FROM documents),
    cells AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY 1, 2),
    ma AS (SELECT a AS c, CAST(SUM(n) AS BIGINT) AS na
           FROM cells GROUP BY 1),
    mb AS (SELECT b AS c, CAST(SUM(n) AS BIGINT) AS nb
           FROM cells GROUP BY 1),
    marg AS (
      SELECT COALESCE(ma.c, mb.c) AS c,
             COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
      FROM ma FULL OUTER JOIN mb ON ma.c = mb.c),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             SUM(CASE WHEN a = b THEN n END) AS agree
      FROM cells),
    mf AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS q,
             SUM(((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                  / (2.0 * CAST(tot.n AS DOUBLE)))
                 * (1.0 - (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                    / (2.0 * CAST(tot.n AS DOUBLE)))) AS pisum
      FROM marg CROSS JOIN tot),
    m AS (
      SELECT n, q,
             COALESCE(CAST(agree AS DOUBLE), 0.0) / CAST(n AS DOUBLE)
               AS po,
             pisum / (CAST(q AS DOUBLE) - 1.0) AS pe
      FROM tot CROSS JOIN mf)
    SELECT n, q,
           ROUND(CASE WHEN n > 0 THEN po END, 6) AS po,
           ROUND(CASE WHEN n > 0 AND q >= 2 AND pe < 1.0 THEN pe END, 6)
             AS pe,
           ROUND(CASE WHEN n > 0 AND q >= 2 AND pe < 1.0 THEN
             (po - pe) / (1.0 - pe) END, 6) AS ac1
    FROM m
    """,
    doc="Gwet's AC1 between the two mcnemar_doc_rules raters "
    "(operators/classify.py:gwets_ac1) — the prevalence-robust "
    "companion to cohens_kappa: under the skewed marginals quality "
    "rules produce (most docs pass), kappa's squared-marginal "
    "chance term collapses (the kappa paradox) while AC1's "
    "π(1−π)/(q−1) stays calibrated. One cell aggregate + margin "
    "rollups, all exact",
)
def gwets_ac1_doc_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import gwets_ac1
    from ..operators.text import normalize_text_col

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        F.when(F.col("n_chars") >= 150, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("ra"),
        F.when(
            F.size(F.split(normalize_text_col("text"), " ")) >= 45,
            F.lit("pass"),
        )
        .otherwise(F.lit("fail"))
        .alias("rb"),
    )
    return gwets_ac1(base, "ra", "rb")


@_q(
    "stuart_maxwell_user_shift",
    """
    WITH per AS (
      SELECT user_id,
             CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
                  THEN 1 ELSE 2 END AS half,
             SUM(CAST(value AS DECIMAL(18,6))) AS s,
             CAST(COUNT(value) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    tiers AS (
      SELECT user_id, half,
             CASE WHEN s < 30 * c THEN 'lo'
                  WHEN s < 60 * c THEN 'mid'
                  ELSE 'hi' END AS tier
      FROM per),
    pairs AS (
      SELECT t1.tier AS x, t2.tier AS y
      FROM tiers t1 JOIN tiers t2 USING (user_id)
      WHERE t1.half = 1 AND t2.half = 2),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN x='lo'  AND y='lo'  THEN 1 ELSE 0 END) AS DOUBLE) AS n11,
             CAST(SUM(CASE WHEN x='lo'  AND y='mid' THEN 1 ELSE 0 END) AS DOUBLE) AS n12,
             CAST(SUM(CASE WHEN x='lo'  AND y='hi'  THEN 1 ELSE 0 END) AS DOUBLE) AS n13,
             CAST(SUM(CASE WHEN x='mid' AND y='lo'  THEN 1 ELSE 0 END) AS DOUBLE) AS n21,
             CAST(SUM(CASE WHEN x='mid' AND y='mid' THEN 1 ELSE 0 END) AS DOUBLE) AS n22,
             CAST(SUM(CASE WHEN x='mid' AND y='hi'  THEN 1 ELSE 0 END) AS DOUBLE) AS n23,
             CAST(SUM(CASE WHEN x='hi'  AND y='lo'  THEN 1 ELSE 0 END) AS DOUBLE) AS n31,
             CAST(SUM(CASE WHEN x='hi'  AND y='mid' THEN 1 ELSE 0 END) AS DOUBLE) AS n32,
             CAST(SUM(CASE WHEN x='hi'  AND y='hi'  THEN 1 ELSE 0 END) AS DOUBLE) AS n33
      FROM pairs),
    d AS (
      SELECT n,
             (n11 + n12 + n13) - (n11 + n21 + n31) AS d1,
             (n21 + n22 + n23) - (n12 + n22 + n32) AS d2,
             (n31 + n32 + n33) - (n13 + n23 + n33) AS d3,
             (n12 + n21) / 2.0 AS nb12,
             (n13 + n31) / 2.0 AS nb13,
             (n23 + n32) / 2.0 AS nb23
      FROM ag),
    f AS (
      SELECT n, d1, d2, d3,
             2.0 * (nb12 * nb23 + nb12 * nb13 + nb13 * nb23) AS den,
             nb23 * d1 * d1 + nb13 * d2 * d2 + nb12 * d3 * d3 AS num
      FROM d)
    SELECT n,
           CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
           CAST(d3 AS BIGINT) AS d3,
           ROUND(CASE WHEN den > 0 THEN num / den END, 6) AS chi2_sm
    FROM f
    """,
    doc="Stuart-Maxwell marginal-homogeneity test of each user's "
    "value TIER (lo/mid/hi by exact decimal thresholds), first half "
    "vs second half (operators/classify.py:stuart_maxwell_test) — "
    "bowker_user_shift's complement: Bowker asks if disagreement is "
    "symmetric cell-by-cell; Stuart-Maxwell asks if the MARGINS "
    "moved (did the tier mix drift). k=3 closed form, dof=2; tier "
    "decision compares the exact DECIMAL sum against "
    "threshold×count so no engine's division order can flip a "
    "boundary row; nine cells off ONE conditional aggregate",
)
def stuart_maxwell_user_shift_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.classify import stuart_maxwell_test

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    per = ev.groupBy(
        "user_id",
        F.when(
            F.to_date("ts") <= F.lit("2024-01-15").cast("date"), F.lit(1)
        )
        .otherwise(F.lit(2))
        .alias("half"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        F.count("value").alias("c"),
    )
    tier = (
        F.when(F.col("s") < 30 * F.col("c"), F.lit("lo"))
        .when(F.col("s") < 60 * F.col("c"), F.lit("mid"))
        .otherwise(F.lit("hi"))
    )
    tiers = per.select("user_id", "half", tier.alias("tier"))
    pairs = (
        tiers.filter(F.col("half") == 1)
        .select("user_id", F.col("tier").alias("x"))
        .join(
            tiers.filter(F.col("half") == 2).select(
                "user_id", F.col("tier").alias("y")
            ),
            "user_id",
        )
    )
    return stuart_maxwell_test(pairs, "x", "y", ("lo", "mid", "hi"))


# ---- wave 2: nonparametric completion + calibration significance ----


@_q(
    "brunner_munzel_click_error",
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
      SELECT ta, tb,
             CAST(COALESCE(SUM(ta + tb) OVER wp, 0) AS BIGINT) AS c,
             CAST(COALESCE(SUM(ta) OVER wp, 0) AS BIGINT) AS ca,
             CAST(COALESCE(SUM(tb) OVER wp, 0) AS BIGINT) AS cb
      FROM pv
      WINDOW wp AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING)),
    agg AS (
      SELECT CAST(SUM(ta) AS BIGINT) AS n_a,
             CAST(SUM(tb) AS BIGINT) AS n_b,
             SUM(ta::HUGEINT * (2 * c + ta + tb + 1)) AS ra2,
             SUM(tb::HUGEINT * (2 * c + ta + tb + 1)) AS rb2,
             SUM(ta::HUGEINT * (2 * cb + tb)) AS da2,
             SUM(tb::HUGEINT * (2 * ca + ta)) AS db2,
             SUM(ta::HUGEINT * (2 * cb + tb) * (2 * cb + tb)) AS daa4,
             SUM(tb::HUGEINT * (2 * ca + ta) * (2 * ca + ta)) AS dbb4
      FROM r),
    m AS (
      SELECT n_a, n_b,
             CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
             CAST(CAST(ra2 AS VARCHAR) AS DOUBLE) / 2.0 AS ra,
             CAST(CAST(rb2 AS VARCHAR) AS DOUBLE) / 2.0 AS rb,
             CAST(CAST(da2 AS VARCHAR) AS DOUBLE) AS dda2,
             CAST(CAST(db2 AS VARCHAR) AS DOUBLE) AS ddb2,
             CAST(CAST(daa4 AS VARCHAR) AS DOUBLE) AS ddaa4,
             CAST(CAST(dbb4 AS VARCHAR) AS DOUBLE) AS ddbb4
      FROM agg),
    k AS (
      SELECT n_a, n_b, na, nb, ra / na AS rba, rb / nb AS rbb,
             ra / na - (na + 1.0) / 2.0 AS ka,
             rb / nb - (nb + 1.0) / 2.0 AS kb,
             dda2, ddb2, ddaa4, ddbb4
      FROM m),
    s AS (
      SELECT n_a, n_b, na, nb, rba, rbb,
             (ddaa4 / 4.0 - 2.0 * ka * (dda2 / 2.0) + ka * ka * na)
               / (na - 1.0) AS s2a,
             (ddbb4 / 4.0 - 2.0 * kb * (ddb2 / 2.0) + kb * kb * nb)
               / (nb - 1.0) AS s2b
      FROM k),
    f AS (
      SELECT n_a, n_b, na, nb, rba, rbb, s2a, s2b,
             na * s2a + nb * s2b AS pooled
      FROM s)
    SELECT n_a, n_b,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 THEN
             (rbb - (nb + 1.0) / 2.0) / na END, 6) AS p_hat,
           ROUND(CASE WHEN n_a >= 2 AND n_b >= 2 AND pooled > 0 THEN
             na * nb * (rbb - rba) / ((na + nb) * SQRT(pooled)) END, 6)
             AS w_bm,
           ROUND(CASE WHEN n_a >= 2 AND n_b >= 2 AND pooled > 0 THEN
             pooled * pooled
             / ((na * s2a) * (na * s2a) / (na - 1.0)
                + (nb * s2b) * (nb * s2b) / (nb - 1.0)) END, 6)
             AS df_bm
    FROM f
    """,
    doc="Brunner-Munzel generalized Wilcoxon, click vs error values "
    "(operators/relational.py:brunner_munzel) — the rank test that "
    "stays valid when the treatment changes SPREAD as well as "
    "location (rank Behrens-Fisher), where mann_whitney's variance "
    "assumes a pure shift. Rank sums + ΣtD + ΣtD² exact "
    "DECIMAL(38,0)/HUGEINT in 2x/4x units off ONE guarded prefix "
    "window via 2D_a = 2c_b+t_b; S_i² by algebraic expansion — no "
    "second pass",
)
def brunner_munzel_click_error_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.relational import brunner_munzel

    ev = load_events(spark, sf_dir)
    return brunner_munzel(ev, "value", "event_type", "click", "error")


@_q(
    "cucconi_click_error",
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
      SELECT ta, tb,
             CAST(COALESCE(SUM(ta + tb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c
      FROM pv),
    agg AS (
      SELECT CAST(SUM(ta) AS BIGINT) AS n_a,
             CAST(SUM(tb) AS BIGINT) AS n_b,
             SUM(tb::HUGEINT * (2 * c + ta + tb + 1)
                 * (2 * c + ta + tb + 1)) AS r4,
             SUM(tb::HUGEINT * (2 * c + ta + tb + 1)) AS r2
      FROM r),
    m AS (
      SELECT n_a, n_b,
             CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
             CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn,
             CAST(CAST(r4 AS VARCHAR) AS DOUBLE) / 4.0 AS sr2,
             CAST(CAST(r2 AS VARCHAR) AS DOUBLE) / 2.0 AS sr
      FROM agg),
    uv AS (
      SELECT n_a, n_b, na, nb, nn, sr2,
             nb * (nn + 1.0) * (nn + 1.0) - 2.0 * (nn + 1.0) * sr + sr2
               AS ss2,
             SQRT(na * nb * (nn + 1.0) * (2.0 * nn + 1.0)
                  * (8.0 * nn + 11.0) / 5.0) AS den
      FROM m),
    f AS (
      SELECT n_a, n_b, nn,
             (6.0 * sr2 - nb * (nn + 1.0) * (2.0 * nn + 1.0)) / den AS u,
             (6.0 * ss2 - nb * (nn + 1.0) * (2.0 * nn + 1.0)) / den AS v,
             2.0 * (nn * nn - 4.0)
               / ((2.0 * nn + 1.0) * (8.0 * nn + 11.0)) - 1.0 AS rho
      FROM uv)
    SELECT n_a, n_b,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 AND nn >= 3 THEN u END, 6)
             AS u_stat,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 AND nn >= 3 THEN v END, 6)
             AS v_stat,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 AND nn >= 3 THEN rho
             END, 6) AS rho,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 AND nn >= 3 THEN
             (u * u + v * v - 2.0 * rho * u * v)
             / (2.0 * (1.0 - rho * rho)) END, 6) AS c_stat
    FROM f
    """,
    doc="Cucconi joint location-scale test, click vs error values "
    "(operators/relational.py:cucconi_test) — ONE statistic where "
    "mann_whitney (shift) + ansari_bradley (spread) need a "
    "Bonferroni pair: squared pooled ranks and squared contrary "
    "ranks of the error sample, combined with their exact null "
    "correlation. 4ΣR² exact DECIMAL(38,0)/HUGEINT off the guarded "
    "prefix window; midranks under ties (documented convention)",
)
def cucconi_click_error_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import cucconi_test

    ev = load_events(spark, sf_dir)
    return cucconi_test(ev, "value", "event_type", "click", "error")


@_q(
    "quade_daily_types",
    f"""
    WITH daily AS ({_DAILY_MEAN_SQL}),
    kt AS (SELECT COUNT(DISTINCT event_type) AS k FROM daily),
    cb AS (SELECT day FROM daily GROUP BY day
           HAVING COUNT(*) = (SELECT k FROM kt)),
    base AS (SELECT daily.day AS b, daily.event_type AS t, daily.v AS x
             FROM daily JOIN cb ON daily.day = cb.day),
    cells AS (SELECT b, x, CAST(COUNT(*) AS BIGINT) AS tc
              FROM base GROUP BY 1, 2),
    rk AS (
      SELECT b, x,
             CAST(COALESCE(SUM(tc) OVER (PARTITION BY b ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS DOUBLE)
             + (CAST(tc AS DOUBLE) + 1.0) / 2.0 AS r
      FROM cells),
    ranked AS (
      SELECT base.b, base.t, rk.r
      FROM base JOIN rk ON base.b = rk.b AND base.x = rk.x),
    rng AS (SELECT b, ROUND(MAX(x) - MIN(x), 6) AS rg
            FROM base GROUP BY 1),
    rv AS (SELECT rg, CAST(COUNT(*) AS BIGINT) AS tc FROM rng GROUP BY 1),
    rvr AS (
      SELECT rg,
             CAST(COALESCE(SUM(tc) OVER (ORDER BY rg
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS DOUBLE)
             + (CAST(tc AS DOUBLE) + 1.0) / 2.0 AS q
      FROM rv),
    blocks AS (SELECT b, q FROM rng JOIN rvr USING (rg)),
    s AS (
      SELECT ranked.t,
             blocks.q * (ranked.r
               - (CAST((SELECT k FROM kt) AS DOUBLE) + 1.0) / 2.0) AS s
      FROM ranked JOIN blocks USING (b)),
    per_t AS (
      SELECT t, SUM(s) AS sj, SUM(s * s) AS a,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM s GROUP BY 1),
    ag AS (
      SELECT CAST(MAX(nb) AS BIGINT) AS n_blocks,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(MIN(nb) AS BIGINT) AS nbmin,
             SUM(a) AS aa, SUM(sj * sj) AS bsum
      FROM per_t),
    f AS (
      SELECT n_blocks, k,
             bsum / CAST(n_blocks AS DOUBLE) AS b, aa,
             n_blocks >= 2 AND k >= 2 AND nbmin = n_blocks
               AND aa - bsum / CAST(n_blocks AS DOUBLE) > 0 AS ok
      FROM ag)
    SELECT n_blocks, k,
           ROUND(CASE WHEN ok THEN
             (CAST(n_blocks AS DOUBLE) - 1.0) * b / (aa - b) END, 6)
             AS f_quade,
           CASE WHEN ok THEN k - 1 END AS dof1,
           CASE WHEN ok THEN (n_blocks - 1) * (k - 1) END AS dof2
    FROM f
    """,
    doc="Quade test over daily mean values by event type "
    "(operators/relational.py:quade_test) — friedman_daily_types' "
    "range-weighted upgrade: blocks (days) where the treatments "
    "actually differ carry the signal, uniformly more powerful at "
    "small k. Complete blocks only (the friedman convention); "
    "midranks over the 6-dp-rounded cell means so rank decisions "
    "are engine-identical; S terms are exact multiples of 0.25 in "
    "double, so the folds are order-exact without DECIMAL",
)
def quade_daily_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import quade_test

    daily = _daily_mean_frame(spark, sf_dir)
    return quade_test(daily, "day", "event_type", "v")


@_q(
    "hosmer_lemeshow_events",
    """
    WITH base AS (
      SELECT CAST(FLOOR(GREATEST(LEAST(value / 500.0, 1.0), 0.0)
                        * 1000000 + 0.5)
                  AS BIGINT) AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL),
    binned AS (
      SELECT LEAST((p * 10) // 1000000, 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(p::HUGEINT) AS sp
      FROM base GROUP BY 1),
    t AS (
      SELECT bin, n, sy,
             CAST(CAST(sp AS VARCHAR) AS DOUBLE) / 1000000.0 AS e
      FROM binned),
    u AS (
      SELECT n, sy, e,
             e > 0 AND e < CAST(n AS DOUBLE) AS usable
      FROM t),
    ag AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_bins,
             SUM(CASE WHEN usable THEN
                 (CAST(sy AS DOUBLE) - e) * (CAST(sy AS DOUBLE) - e)
                 / (e * (1.0 - e / CAST(n AS DOUBLE))) END) AS chi2,
             CAST(SUM(CASE WHEN usable THEN 1 ELSE 0 END) AS BIGINT)
               AS ub
      FROM u)
    SELECT n, n_bins,
           ROUND(CASE WHEN ub >= 3 THEN chi2 END, 6) AS chi2_hl,
           CASE WHEN ub >= 3 THEN ub - 2 END AS dof
    FROM ag
    """,
    doc="Hosmer-Lemeshow goodness-of-fit χ² for the ece_events score "
    "(operators/classify.py:hosmer_lemeshow) — the significance "
    "rung of the calibration family: ece reports the SIZE of "
    "miscalibration, this one whether it exceeds sampling noise "
    "(χ²(bins−2)). Fixed-width clamped-micros bins (deterministic "
    "everywhere) instead of engine-divergent deciles-of-risk; "
    "degenerate bins excluded from fold AND dof on both engines",
)
def hosmer_lemeshow_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import hosmer_lemeshow

    ev = load_events(spark, sf_dir)
    scored = ev.filter(F.col("value").isNotNull()).select(
        (F.col("value") / 500.0).alias("p"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return hosmer_lemeshow(scored, "p", "y", bins=10)


# ---- wave 3: closed-form regression + causal designs ----


@_q(
    "ols2_lineitem_price",
    """
    WITH base AS (
      SELECT CAST(ROUND(l_extendedprice * 1000000, 0) AS BIGINT) AS y,
             CAST(ROUND(l_quantity * 1000000, 0) AS BIGINT) AS x1,
             CAST(ROUND(l_discount * 1000000, 0) AS BIGINT) AS x2
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        AND l_discount IS NOT NULL),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x1::HUGEINT) AS s1,
             SUM(x2::HUGEINT) AS s2,
             SUM(y::HUGEINT) AS sy,
             SUM(x1::HUGEINT * x1) AS s11,
             SUM(x2::HUGEINT * x2) AS s22,
             SUM(x1::HUGEINT * x2) AS s12,
             SUM(x1::HUGEINT * y) AS s1y,
             SUM(x2::HUGEINT * y) AS s2y,
             SUM(y::HUGEINT * y) AS syy
      FROM base),
    d AS (
      SELECT n, CAST(n AS DOUBLE) AS nd,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / 1e6 AS d1,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / 1e6 AS d2,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) / 1e6 AS dy,
             CAST(CAST(s11 AS VARCHAR) AS DOUBLE) / 1e12 AS d11,
             CAST(CAST(s22 AS VARCHAR) AS DOUBLE) / 1e12 AS d22,
             CAST(CAST(s12 AS VARCHAR) AS DOUBLE) / 1e12 AS d12,
             CAST(CAST(s1y AS VARCHAR) AS DOUBLE) / 1e12 AS d1y,
             CAST(CAST(s2y AS VARCHAR) AS DOUBLE) / 1e12 AS d2y,
             CAST(CAST(syy AS VARCHAR) AS DOUBLE) / 1e12 AS dyy
      FROM ag),
    c AS (
      SELECT n, nd, d1, d2, dy,
             d11 - d1 * d1 / nd AS c11,
             d22 - d2 * d2 / nd AS c22,
             d12 - d1 * d2 / nd AS c12,
             d1y - d1 * dy / nd AS c1y,
             d2y - d2 * dy / nd AS c2y,
             dyy - dy * dy / nd AS cyy
      FROM d),
    b AS (
      SELECT n, nd, d1, d2, dy, c1y, c2y, cyy,
             c11 * c22 - c12 * c12 AS det,
             (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
             (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
      FROM c),
    f AS (
      SELECT n, nd,
             (dy - b1 * d1 - b2 * d2) / nd AS b0, b1, b2,
             (b1 * c1y + b2 * c2y) / cyy AS r2,
             n >= 4 AND det > 0 AND cyy > 0 AS ok
      FROM b)
    SELECT n,
           ROUND(CASE WHEN ok THEN b0 END, 6) AS b0,
           ROUND(CASE WHEN ok THEN b1 END, 6) AS b1,
           ROUND(CASE WHEN ok THEN b2 END, 6) AS b2,
           ROUND(CASE WHEN ok THEN r2 END, 6) AS r2,
           ROUND(CASE WHEN ok THEN
             1.0 - (1.0 - r2) * (nd - 1.0) / (nd - 3.0) END, 6) AS adj_r2
    FROM f
    """,
    doc="Two-regressor closed-form OLS: extendedprice ~ quantity + "
    "discount (operators/relational.py:ols2) — the rung above "
    "ols_order_value's simple regression: Cramer-rule solve of the "
    "centered normal equations from NINE exact DECIMAL moments in "
    "ONE map-side aggregate; the honest ceiling of closed-form "
    "regression before an iterative solver",
)
def ols2_lineitem_price_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import ols2

    li = load(spark, sf_dir, "lineitem")
    return ols2(li, "l_extendedprice", "l_quantity", "l_discount")


@_q(
    "deming_part_price",
    """
    WITH unit AS (
      SELECT l_partkey,
             FLOOR((CAST(CAST(SUM(CAST(FLOOR((l_extendedprice / l_quantity)
                   * 1000000.0 + 0.5) AS HUGEINT)) AS VARCHAR) AS DOUBLE)
                   / 1000000.0 / COUNT(*)) * 1000000.0 + 0.5)
                   / 1000000.0 AS y
      FROM lineitem WHERE l_quantity > 0 GROUP BY 1),
    base AS (
      SELECT CAST(FLOOR(p.p_retailprice * 1000000.0 + 0.5) AS BIGINT) AS x,
             CAST(FLOOR(u.y * 1000000.0 + 0.5) AS BIGINT) AS y
      FROM unit u JOIN part p ON u.l_partkey = p.p_partkey
      WHERE p.p_retailprice IS NOT NULL),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x::HUGEINT) AS sx,
             SUM(y::HUGEINT) AS sy,
             SUM(x::HUGEINT * x) AS sxx,
             SUM(y::HUGEINT * y) AS syy,
             SUM(x::HUGEINT * y) AS sxy
      FROM base),
    d AS (
      SELECT n, CAST(n AS DOUBLE) AS nd,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) / 1e6 AS dx,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) / 1e6 AS dy,
             CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / 1e12 AS dxx,
             CAST(CAST(syy AS VARCHAR) AS DOUBLE) / 1e12 AS dyy,
             CAST(CAST(sxy AS VARCHAR) AS DOUBLE) / 1e12 AS dxy
      FROM ag),
    c AS (
      SELECT n, nd, dx, dy,
             dxx / nd - (dx / nd) * (dx / nd) AS sxx,
             dyy / nd - (dy / nd) * (dy / nd) AS syy,
             dxy / nd - (dx / nd) * (dy / nd) AS sxy
      FROM d),
    b AS (
      SELECT n, nd, dx, dy, sxx, syy, sxy,
             (syy - 1.0 * sxx
              + SQRT((syy - 1.0 * sxx) * (syy - 1.0 * sxx)
                     + 4.0 * 1.0 * sxy * sxy)) / (2.0 * sxy) AS beta,
             n >= 3 AND sxy <> 0 AND sxx > 0 AND syy > 0 AS ok
      FROM c)
    SELECT n,
           FLOOR((CASE WHEN ok THEN beta END)
                 * 1000000.0 + 0.5) / 1000000.0 AS slope,
           FLOOR((CASE WHEN ok THEN dy / nd - beta * (dx / nd) END)
                 * 1000000.0 + 0.5) / 1000000.0 AS intercept,
           FLOOR((CASE WHEN ok THEN sxy / SQRT(sxx * syy) END)
                 * 1000000.0 + 0.5) / 1000000.0 AS pearson_r
    FROM b
    """,
    doc="Deming errors-in-variables line between catalog retail price "
    "and observed mean unit sell price per part "
    "(operators/relational.py:deming_regression, λ=1) — the method-"
    "comparison regression for two NOISY measurements of the same "
    "quantity, where OLS attenuates the slope. Per-part mean unit "
    "price from IEEE-only floor-micros snaps (the r12/r13 driver "
    "record's red row: thousands of l_extendedprice/l_quantity "
    "quotients sit EXACTLY on .5e-6 boundaries, where "
    "CAST(double AS DECIMAL(18,6)) / ROUND(double, 6) tie-breaking "
    "is engine- and version-variant; floor(x*1e6+0.5) is "
    "bit-identical everywhere); five exact DECIMAL moments, "
    "closed-form β",
)
def deming_part_price_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import deming_regression
    from ..operators.util import round6_floor

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    uq_micros = F.floor(
        (F.col("l_extendedprice") / F.col("l_quantity")) * 1000000.0
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    unit = li.groupBy("l_partkey").agg(
        round6_floor(
            F.sum(uq_micros).cast("string").cast("double")
            / 1000000.0
            / F.count("*")
        ).alias("y")
    )
    part = load(spark, sf_dir, "part").filter(
        F.col("p_retailprice").isNotNull()
    )
    base = unit.join(
        part.select(
            F.col("p_partkey").alias("l_partkey"), "p_retailprice"
        ),
        "l_partkey",
    )
    return deming_regression(base, "p_retailprice", "y")


@_q(
    "ipw_ate_urgent_value",
    """
    WITH base AS (
      SELECT o_orderstatus AS s1,
             CAST(year(o_orderdate) AS BIGINT) AS s2,
             o_orderpriority = '1-URGENT' AS t,
             CAST(o_totalprice AS DECIMAL(18,6)) AS y
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
    per_s AS (
      SELECT s1, s2,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(CASE WHEN t THEN 1 END) AS BIGINT) AS nt,
             SUM(CASE WHEN t THEN CAST(y AS DECIMAL(38,6)) END) AS syt,
             SUM(CASE WHEN NOT t THEN CAST(y AS DECIMAL(38,6)) END) AS syc
      FROM base GROUP BY 1, 2),
    m AS (
      SELECT n, nt,
             nt > 0 AND nt < n AS used,
             CAST(n AS DOUBLE) AS ns, CAST(nt AS DOUBLE) AS ntd,
             COALESCE(CAST(CAST(syt AS VARCHAR) AS DOUBLE), 0.0) AS dyt,
             COALESCE(CAST(CAST(syc AS VARCHAR) AS DOUBLE), 0.0) AS dyc,
             syt, syc
      FROM per_s),
    ag AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(CASE WHEN used THEN n END) AS BIGINT) AS n_used,
             SUM(CASE WHEN used THEN
                 dyt / (ntd / ns) - dyc / (1.0 - ntd / ns) END) AS ipw,
             SUM(CASE WHEN used THEN
                 ns * (dyt / ntd - dyc / (ns - ntd)) END) AS strat,
             CAST(SUM(CASE WHEN used THEN nt END) AS BIGINT) AS tt,
             SUM(CASE WHEN used THEN CAST(syt AS DECIMAL(38,6)) END)
               AS syt,
             SUM(CASE WHEN used THEN CAST(syc AS DECIMAL(38,6)) END)
               AS syc
      FROM m),
    f AS (
      SELECT n, n_strata, COALESCE(n_used, 0) AS n_used, ipw, strat,
             CAST(COALESCE(n_used, 0) AS DOUBLE) AS nu,
             CAST(tt AS DOUBLE) AS ttd,
             CAST(CAST(syt AS VARCHAR) AS DOUBLE) AS dyt,
             CAST(CAST(syc AS VARCHAR) AS DOUBLE) AS dyc
      FROM ag)
    SELECT n, n_strata, n_used,
           ROUND(CASE WHEN n_used > 0 THEN
             dyt / ttd - dyc / (nu - ttd) END, 6) AS naive_diff,
           ROUND(CASE WHEN n_used > 0 THEN ipw / nu END, 6) AS ate_ipw,
           ROUND(CASE WHEN n_used > 0 THEN strat / nu END, 6)
             AS ate_strat
    FROM f
    """,
    doc="Stratified IPW average treatment effect of URGENT priority "
    "on order value, strata = (status, order year) "
    "(operators/relational.py:ipw_ate) — the observed-confounder "
    "causal rung between cem_urgent_orders (drops unmatched "
    "strata) and cuped_user_value (randomized): within-stratum "
    "treatment share IS the propensity; Horvitz-Thompson and the "
    "blocking estimator ride the same aggregate so their gap is a "
    "one-subtraction audit. No-overlap strata drop from both "
    "(documented, mirrored)",
)
def ipw_ate_urgent_value_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import ipw_ate

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
    )
    base = orders.select(
        F.col("o_orderstatus").alias("s1"),
        F.year("o_orderdate").cast("long").alias("s2"),
        (F.col("o_orderpriority") == "1-URGENT").alias("t"),
        F.col("o_totalprice").alias("y"),
    )
    return ipw_ate(base, "t", "y", ["s1", "s2"])


@_q(
    "rdd_urgent_rate_price",
    """
    WITH base AS (
      SELECT CAST(ROUND((o_totalprice - 250000.0) * 1000000, 0)
                  AS BIGINT) AS x,
             CAST(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1000000 ELSE 0 END AS BIGINT) AS y
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
        AND o_totalprice >= 150000.0 AND o_totalprice < 350000.0),
    ag AS (
      SELECT
        CAST(COUNT(CASE WHEN x < 0 THEN 1 END) AS BIGINT) AS nl,
        SUM(CASE WHEN x < 0 THEN x::HUGEINT END) AS sxl,
        SUM(CASE WHEN x < 0 THEN y::HUGEINT END) AS syl,
        SUM(CASE WHEN x < 0 THEN x::HUGEINT * x END) AS sxxl,
        SUM(CASE WHEN x < 0 THEN x::HUGEINT * y END) AS sxyl,
        CAST(COUNT(CASE WHEN x >= 0 THEN 1 END) AS BIGINT) AS nr,
        SUM(CASE WHEN x >= 0 THEN x::HUGEINT END) AS sxr,
        SUM(CASE WHEN x >= 0 THEN y::HUGEINT END) AS syr,
        SUM(CASE WHEN x >= 0 THEN x::HUGEINT * x END) AS sxxr,
        SUM(CASE WHEN x >= 0 THEN x::HUGEINT * y END) AS sxyr
      FROM base),
    d AS (
      SELECT nl, nr,
             CAST(nl AS DOUBLE) AS nld, CAST(nr AS DOUBLE) AS nrd,
             CAST(CAST(sxl AS VARCHAR) AS DOUBLE) / 1e6 AS dxl,
             CAST(CAST(syl AS VARCHAR) AS DOUBLE) / 1e6 AS dyl,
             CAST(CAST(sxxl AS VARCHAR) AS DOUBLE) / 1e12 AS dxxl,
             CAST(CAST(sxyl AS VARCHAR) AS DOUBLE) / 1e12 AS dxyl,
             CAST(CAST(sxr AS VARCHAR) AS DOUBLE) / 1e6 AS dxr,
             CAST(CAST(syr AS VARCHAR) AS DOUBLE) / 1e6 AS dyr,
             CAST(CAST(sxxr AS VARCHAR) AS DOUBLE) / 1e12 AS dxxr,
             CAST(CAST(sxyr AS VARCHAR) AS DOUBLE) / 1e12 AS dxyr
      FROM ag),
    c AS (
      SELECT nl, nr, nld, nrd, dxl, dyl, dxr, dyr,
             dxxl - dxl * dxl / nld AS cxxl,
             dxyl - dxl * dyl / nld AS cxyl,
             dxxr - dxr * dxr / nrd AS cxxr,
             dxyr - dxr * dyr / nrd AS cxyr
      FROM d),
    s AS (
      SELECT nl, nr,
             cxyl / cxxl AS sl,
             (dyl - (cxyl / cxxl) * dxl) / nld AS il,
             cxyr / cxxr AS sr,
             (dyr - (cxyr / cxxr) * dxr) / nrd AS ir,
             nl >= 3 AND cxxl > 0 AS okl,
             nr >= 3 AND cxxr > 0 AS okr
      FROM c)
    SELECT nl AS n_left, nr AS n_right,
           ROUND(CASE WHEN okl AND okr THEN ir - il END, 6) + 0.0 AS jump,
           ROUND(CASE WHEN okl THEN il END, 6) + 0.0 AS intercept_left,
           ROUND(CASE WHEN okr THEN ir END, 6) + 0.0
             AS intercept_right,
           ROUND(CASE WHEN okl THEN sl END, 6) + 0.0 AS slope_left,
           ROUND(CASE WHEN okr THEN sr END, 6) + 0.0 AS slope_right
    FROM s
    """,
    doc="Sharp regression discontinuity: jump in the urgent-or-high "
    "priority RATE at the 250k order-value cutoff, bandwidth 100k "
    "(operators/relational.py:rdd_sharp) — the threshold-assignment "
    "causal design did/ipw can't cover: local LINEAR fit each side "
    "from exact DECIMAL moments of the centered running variable, "
    "ONE conditional aggregate, rectangular kernel (deterministic)",
)
def rdd_urgent_rate_price_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import rdd_sharp

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
    )
    base = orders.select(
        "o_totalprice",
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("y"),
    )
    return rdd_sharp(base, "o_totalprice", "y", 250000.0, 100000.0)


@_q(
    "weighted_corr_lineitem",
    """
    WITH base AS (
      SELECT CAST(ROUND(l_discount * 1000000, 0) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 1000000, 0) AS BIGINT) AS y,
             CAST(ROUND(l_quantity * 1000000, 0) AS BIGINT) AS w
      FROM lineitem
      WHERE l_discount IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_quantity IS NOT NULL AND l_quantity > 0),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(w::HUGEINT) AS sw,
             SUM(w::HUGEINT * x) AS swx,
             SUM(w::HUGEINT * y) AS swy,
             SUM(w::HUGEINT * x * x) AS swxx,
             SUM(w::HUGEINT * y * y) AS swyy,
             SUM(w::HUGEINT * x * y) AS swxy,
             SUM(x::HUGEINT) AS sx,
             SUM(y::HUGEINT) AS sy,
             SUM(x::HUGEINT * x) AS sxx,
             SUM(y::HUGEINT * y) AS syy,
             SUM(x::HUGEINT * y) AS sxy
      FROM base),
    d AS (
      SELECT n,
             CAST(n AS DOUBLE) AS nd,
             CAST(CAST(sw AS VARCHAR) AS DOUBLE) / 1e6 AS dw,
             CAST(CAST(swx AS VARCHAR) AS DOUBLE) / 1e12 AS dwx,
             CAST(CAST(swy AS VARCHAR) AS DOUBLE) / 1e12 AS dwy,
             CAST(CAST(swxx AS VARCHAR) AS DOUBLE) / 1e18 AS dwxx,
             CAST(CAST(swyy AS VARCHAR) AS DOUBLE) / 1e18 AS dwyy,
             CAST(CAST(swxy AS VARCHAR) AS DOUBLE) / 1e18 AS dwxy,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) / 1e6 AS dx,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) / 1e6 AS dy,
             CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / 1e12 AS dxx,
             CAST(CAST(syy AS VARCHAR) AS DOUBLE) / 1e12 AS dyy,
             CAST(CAST(sxy AS VARCHAR) AS DOUBLE) / 1e12 AS dxy
      FROM ag),
    c AS (
      SELECT n, dw,
             dwxx - dwx * dwx / dw AS cxx,
             dwyy - dwy * dwy / dw AS cyy,
             dwxy - dwx * dwy / dw AS cxy,
             dxx - dx * dx / nd AS uxx,
             dyy - dy * dy / nd AS uyy,
             dxy - dx * dy / nd AS uxy
      FROM d)
    SELECT n,
           ROUND(dw, 6) AS sum_w,
           ROUND(CASE WHEN n >= 2 AND cxx > 0 AND cyy > 0 THEN
             cxy / SQRT(cxx * cyy) END, 6) AS r_weighted,
           ROUND(CASE WHEN n >= 2 AND uxx > 0 AND uyy > 0 THEN
             uxy / SQRT(uxx * uyy) END, 6) AS r_unweighted
    FROM c
    """,
    doc="Quantity-weighted Pearson correlation between discount and "
    "extended price (operators/relational.py:weighted_corr) — "
    "q12_correlations' CORR counts a 50-unit lineitem as one row of "
    "evidence; the weighted moments count it as fifty. Six weighted "
    "+ five unweighted exact DECIMAL moments off ONE aggregate; the "
    "unweighted r rides along so the weighting's effect is one "
    "subtraction",
)
def weighted_corr_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import weighted_corr

    li = load(spark, sf_dir, "lineitem")
    return weighted_corr(li, "l_discount", "l_extendedprice", "l_quantity")


# ---- wave 4: time-series completion (SPC, stationarity, memory) ----

_POOLED_DAILY_SQL = """
      SELECT CAST(ts AS DATE) AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(value), 6) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY 1
"""


def _pooled_daily_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled (all-types) daily mean value — the wave-4 shared
    bounded series; same stable_avg + round-6 discipline as
    _daily_mean_frame."""
    ev = load_events(spark, sf_dir)
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value"),
                6,
            ).alias("v")
        )
    )


@_q(
    "ewma_chart_daily",
    f"""
    WITH daily AS ({_POOLED_DAILY_SQL}),
    idx AS (
      SELECT day AS ord, v AS value,
             ROW_NUMBER() OVER (ORDER BY day) AS t
      FROM daily),
    mom AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(38,6))) AS s,
             SUM(CAST(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))
                      AS DECIMAL(38,12))) AS q
      FROM idx),
    zs AS (
      SELECT i.ord, i.value, i.t,
             SUM(POWER(0.5, i.t - j.t) * j.value) AS zsum
      FROM idx i JOIN idx j ON j.t <= i.t
      GROUP BY 1, 2, 3),
    m AS (
      SELECT ord, value, t, zsum,
             CAST(n AS DOUBLE) AS nd,
             CAST(CAST(s AS VARCHAR) AS DOUBLE) AS ds,
             CAST(CAST(q AS VARCHAR) AS DOUBLE) AS dq
      FROM zs CROSS JOIN mom),
    e AS (
      SELECT ord, value,
             0.5 * zsum + POWER(0.5, CAST(t AS DOUBLE)) * (ds / nd)
               AS z,
             ds / nd AS mu,
             3.0 * SQRT((dq - ds * ds / nd) / (nd - 1.0))
             * SQRT(0.5 / 1.5
                    * (1.0 - POWER(0.5, 2.0 * CAST(t AS DOUBLE))))
               AS half
      FROM m)
    SELECT ord, value,
           ROUND(z, 6) AS ewma,
           ROUND(mu + half, 6) AS ucl,
           ROUND(mu - half, 6) AS lcl,
           z > mu + half OR z < mu - half AS signal
    FROM e ORDER BY ord
    """,
    doc="EWMA control chart over the pooled daily mean value, λ=0.5 "
    "L=3 (operators/series.py:ewma_chart) — the SPC rung between "
    "imr_chart_daily (memoryless individuals) and cusum_daily_drift "
    "(cumulative): small sustained shifts trip the tightening "
    "time-varying limits. λ=0.5 is the DYADIC choice — (1−λ)^k = "
    "2^−k is exact in binary floating point, keeping both engines' "
    "weights identical; bounded triangular self-join on the 30-row "
    "daily frame",
)
def ewma_chart_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import ewma_chart

    daily = _pooled_daily_frame(spark, sf_dir)
    return ewma_chart(daily, "day", "v")


@_q(
    "kpss_level_daily",
    f"""
    WITH daily AS ({_POOLED_DAILY_SQL}),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(v AS DECIMAL(38,6))) AS s
      FROM daily),
    dm AS (
      SELECT day,
             v - CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
               AS e,
             ROW_NUMBER() OVER (ORDER BY day) AS t
      FROM daily CROSS JOIN mom),
    st AS (
      SELECT t, e,
             SUM(e) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t
      FROM dm),
    g0 AS (
      SELECT SUM(s_t * s_t) AS ss, SUM(e * e) AS g0 FROM st),
    bart AS (
      SELECT SUM(2.0 * (1.0 - j / 6.0) * g) AS bart
      FROM (
        SELECT j.j, SUM(a.e * b.e) AS g
        FROM (VALUES (1), (2), (3), (4), (5)) AS j(j)
        JOIN st a ON TRUE
        JOIN st b ON b.t = a.t - j.j
        GROUP BY 1)),
    f AS (
      SELECT n, ss, g0, COALESCE(bart, 0.0) AS bart
      FROM mom CROSS JOIN g0 CROSS JOIN bart),
    f2 AS (
      SELECT n,
             ss / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
               / ((g0 + bart) / CAST(n AS DOUBLE)) AS eta,
             (g0 + bart) / CAST(n AS DOUBLE) AS s2lr
      FROM f)
    SELECT n,
           ROUND(CASE WHEN n >= 7 AND s2lr > 0 THEN eta END, 6)
             AS eta_kpss,
           ROUND(CASE WHEN n >= 7 AND s2lr > 0 THEN s2lr END, 6)
             AS sigma2_lr
    FROM f2
    """,
    doc="KPSS level-stationarity statistic over the pooled daily "
    "mean, Bartlett lags=5 (operators/series.py:kpss_level) — the "
    "null-REVERSED companion to mann_kendall_daily: significance "
    "here means the series WANDERS from its level. Demeaned partial "
    "sums off one ordered prefix window over the bounded frame; "
    "long-run variance from 5 bounded lag self-joins",
)
def kpss_level_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import kpss_level

    daily = _pooled_daily_frame(spark, sf_dir)
    return kpss_level(daily, "day", "v", lags=5)


@_q(
    "pacf_daily",
    f"""
    WITH daily AS ({_POOLED_DAILY_SQL}),
    lagd AS (
      SELECT l.lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             ROUND(CORR(a.v, b.v), 6) AS acf
      FROM (VALUES (1), (2), (3)) AS l(lag)
      JOIN daily a ON TRUE
      JOIN daily b ON b.day + CAST(l.lag AS INTEGER) = a.day
      GROUP BY 1),
    piv AS (
      SELECT SUM(CASE WHEN lag = 1 THEN acf END) AS r1,
             SUM(CASE WHEN lag = 2 THEN acf END) AS r2,
             SUM(CASE WHEN lag = 3 THEN acf END) AS r3
      FROM lagd),
    dl AS (
      SELECT r1, r2, r3,
             r1 AS p1,
             CASE WHEN 1.0 - r1 * r1 <> 0 THEN
               (r2 - r1 * r1) / (1.0 - r1 * r1) END AS p2
      FROM piv),
    dl2 AS (
      SELECT r1, r2, r3, p1, p2,
             r1 * (1.0 - p2) AS phi21
      FROM dl),
    dl3 AS (
      SELECT p1, p2,
             CASE WHEN 1.0 - phi21 * r1 - p2 * r2 <> 0 THEN
               (r3 - phi21 * r2 - p2 * r1)
               / (1.0 - phi21 * r1 - p2 * r2) END AS p3
      FROM dl2),
    pac AS (
      SELECT 1 AS lag, ROUND(p1, 6) AS pacf FROM dl3
      UNION ALL SELECT 2, ROUND(p2, 6) FROM dl3
      UNION ALL SELECT 3, ROUND(p3, 6) FROM dl3)
    SELECT CAST(lagd.lag AS BIGINT) AS lag, n_pairs, acf, pacf
    FROM lagd JOIN pac ON lagd.lag = pac.lag
    ORDER BY lag
    """,
    doc="Partial autocorrelation at lags 1-3 of the pooled daily "
    "mean via Durbin-Levinson closed forms "
    "(operators/series.py:pacf_lags) — acf_daily_values says WHICH "
    "lags carry memory; pacf says whether lag-j memory is DIRECT "
    "or lag-1 propagated (the AR-order readout). D-L algebra runs "
    "on the round-6 pairwise-complete lag correlations, so both "
    "engines compute from identical inputs",
)
def pacf_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import pacf_lags

    daily = _pooled_daily_frame(spark, sf_dir)
    return pacf_lags(daily, "day", "v")


@_q(
    "ccf_click_error_daily",
    """
    WITH clickd AS (
      SELECT CAST(ts AS DATE) AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(value), 6) AS v
      FROM events WHERE value IS NOT NULL AND event_type = 'click'
      GROUP BY 1),
    errd AS (
      SELECT CAST(ts AS DATE) AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(value), 6) AS v
      FROM events WHERE value IS NOT NULL AND event_type = 'error'
      GROUP BY 1)
    SELECT CAST(l.lag AS BIGINT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CORR(a.v, b.v), 6) AS ccf
    FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) AS l(lag)
    JOIN clickd a ON TRUE
    JOIN errd b ON b.day - CAST(l.lag AS INTEGER) = a.day
    GROUP BY 1 ORDER BY 1
    """,
    doc="Cross-correlation between click and error daily mean values "
    "at lags -3..+3 (operators/series.py:ccf_lagged) — the LEAD/LAG "
    "diagnostic acf can't give: a peak at lag k > 0 says clicks "
    "lead errors by k days. Pairwise-complete Pearson per lag over "
    "two day-grain rollups; 7 bounded joins",
)
def ccf_click_error_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import ccf_lagged

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())

    def daily(t):
        return (
            ev.filter(F.col("event_type") == t)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast(
                        "double"
                    )
                    / F.count("value"),
                    6,
                ).alias("v")
            )
        )

    return ccf_lagged(daily("click"), daily("error"), "day", "v", max_lag=3)


@_q(
    "diebold_mariano_events",
    f"""
    WITH daily AS ({_POOLED_DAILY_SQL}),
    d AS (
      SELECT s.day,
             (s.v - fa.v) * (s.v - fa.v)
             - (s.v - fb.v) * (s.v - fb.v) AS dt
      FROM daily s
      JOIN daily fa ON fa.day + 1 = s.day
      JOIN daily fb ON fb.day + 7 = s.day),
    idx AS (
      SELECT dt, ROW_NUMBER() OVER (ORDER BY day) AS t FROM d),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(dt) AS sd FROM idx),
    cent AS (
      SELECT t, dt - sd / CAST(n AS DOUBLE) AS e
      FROM idx CROSS JOIN mom),
    g0 AS (SELECT SUM(e * e) AS g0 FROM cent),
    bart AS (
      SELECT SUM(2.0 * (1.0 - j / 7.0) * g) AS bart
      FROM (
        SELECT j.j, SUM(a.e * b.e) AS g
        FROM (VALUES (1), (2), (3), (4), (5), (6)) AS j(j)
        JOIN cent a ON TRUE
        JOIN cent b ON b.t = a.t - j.j
        GROUP BY 1)),
    f AS (
      SELECT n, sd, g0, COALESCE(bart, 0.0) AS bart
      FROM mom CROSS JOIN g0 CROSS JOIN bart),
    f2 AS (
      SELECT n,
             sd / CAST(n AS DOUBLE) AS mean_d,
             (g0 + bart) / CAST(n AS DOUBLE) AS s2lr
      FROM f)
    SELECT n,
           ROUND(mean_d, 6) AS mean_d,
           ROUND(CASE WHEN n >= 8 AND s2lr > 0 THEN
             mean_d / SQRT(s2lr / CAST(n AS DOUBLE)) END, 6) AS dm_stat
    FROM f2
    """,
    doc="Diebold-Mariano test: lag-1 persistence vs lag-7 seasonal-"
    "naive forecasts of the pooled daily mean, squared-error loss, "
    "Bartlett lags=6 (operators/series.py:diebold_mariano) — "
    "forecast_scorecard_events reports each model's error; DM says "
    "whether the DIFFERENCE beats sampling noise given the "
    "autocorrelated loss differentials a plain t-test ignores",
)
def diebold_mariano_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import diebold_mariano

    daily = _pooled_daily_frame(spark, sf_dir)
    return diebold_mariano(daily, "day", "v", lag_a=1, lag_b=7, lags=6)


@_q(
    "turning_points_daily",
    f"""
    WITH daily AS ({_POOLED_DAILY_SQL}),
    tri AS (
      SELECT LAG(v) OVER (ORDER BY day) AS p, v,
             LEAD(v) OVER (ORDER BY day) AS nx
      FROM daily),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN p IS NOT NULL AND nx IS NOT NULL
                  AND ((v > p AND v > nx) OR (v < p AND v < nx))
                  THEN 1 ELSE 0 END) AS BIGINT) AS turning_pts
      FROM tri)
    SELECT n, turning_pts,
           ROUND(CASE WHEN n >= 3 THEN
             2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0 END, 6) AS expected,
           ROUND(CASE WHEN n >= 4
                  AND (16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0 > 0 THEN
             (CAST(turning_pts AS DOUBLE)
              - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
             / SQRT((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0) END, 6)
             AS z
    FROM ag
    """,
    doc="Turning-point randomness test on the pooled daily mean "
    "(operators/series.py:turning_points) — the smallest randomness "
    "rung next to runs_test_daily (median signs) and ljung_box "
    "(autocorrelation): strict local extrema count vs E = 2(n−2)/3, "
    "Var = (16n−29)/90; too few turns = trend, too many = "
    "alternation. One lag/lead window over the bounded frame",
)
def turning_points_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import turning_points

    daily = _pooled_daily_frame(spark, sf_dir)
    return turning_points(daily, "day", "v")


@_q(
    "hurst_rs_hourly",
    """
    WITH hourly AS (
      SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS BIGINT) AS hr,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(value), 6) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    idx AS (
      SELECT v AS x,
             ROW_NUMBER() OVER (ORDER BY day, hr) - 1 AS t
      FROM hourly),
    sized AS (
      SELECT s.ws, t // s.ws AS b, x, t
      FROM (VALUES (8), (16), (32)) AS s(ws) JOIN idx ON TRUE),
    complete AS (
      SELECT ws, b FROM sized GROUP BY 1, 2
      HAVING COUNT(*) = MAX(ws)),
    blk AS (
      SELECT sized.ws, sized.b, sized.x, sized.t
      FROM sized JOIN complete USING (ws, b)),
    bstat AS (
      SELECT ws, b, AVG(x) AS m, STDDEV_POP(x) AS sd
      FROM blk GROUP BY 1, 2),
    dev AS (
      SELECT blk.ws, blk.b,
             SUM(blk.x - bstat.m)
               OVER (PARTITION BY blk.ws, blk.b ORDER BY blk.t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             bstat.sd AS sd
      FROM blk JOIN bstat USING (ws, b)),
    rs AS (
      SELECT ws, b,
             (MAX(cum) - MIN(cum)) / MAX(sd) AS rs, MAX(sd) AS sd
      FROM dev GROUP BY 1, 2),
    per AS (
      SELECT ws,
             CAST(COUNT(*) AS BIGINT) AS nb,
             ROUND(AVG(rs), 6) AS mrs
      FROM rs WHERE sd > 0 GROUP BY 1),
    pts AS (
      SELECT LOG2(CAST(ws AS DOUBLE)) AS lx, LOG2(mrs) AS ly
      FROM per WHERE mrs IS NOT NULL AND nb > 0 AND mrs > 0),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sizes,
             SUM(lx) AS sx, SUM(ly) AS sy,
             SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
      FROM pts),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM hourly)
    SELECT n,
           ROUND(CASE WHEN n_sizes >= 2
                  AND sxx - sx * sx / CAST(n_sizes AS DOUBLE) > 0 THEN
             (sxy - sx * sy / CAST(n_sizes AS DOUBLE))
             / (sxx - sx * sx / CAST(n_sizes AS DOUBLE)) END, 6)
             AS hurst,
           n_sizes
    FROM tot CROSS JOIN fit
    """,
    doc="Hurst exponent by rescaled-range analysis over the hourly "
    "mean value series, window sizes 8/16/32 "
    "(operators/series.py:hurst_rs) — the long-memory readout next "
    "to acf (short memory) and kpss (wandering): H≈0.5 random, "
    ">0.5 persistent, <0.5 mean-reverting. Complete blocks only; "
    "within-block prefix sums run in identical order on both "
    "engines; closed-form log-log fit on round-6 per-size means",
)
def hurst_rs_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import hurst_rs

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    hourly = ev.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").cast("long").alias("hr")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("value"),
            6,
        ).alias("v")
    ).select(
        F.struct("day", "hr").alias("ord"), "v"
    )
    return hurst_rs(hourly, "ord", "v", window_sizes=(8, 16, 32))


# ---- wave 5: inequality tails + text/pipeline economics ----


@_q(
    "palma_customer_revenue",
    """
    WITH rev AS (
      SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        * 100, 0) AS BIGINT) AS v
      FROM orders GROUP BY o_custkey),
    per_v AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t
              FROM rev GROUP BY 1),
    cells AS (
      SELECT v, t,
             CAST(COALESCE(SUM(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c
      FROM per_v),
    tot AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n,
             SUM(t::HUGEINT * v) AS y
      FROM cells),
    j AS (
      SELECT v, t, c, n, y,
             CAST(FLOOR(n * 0.4) AS BIGINT) AS k40,
             CAST(FLOOR(n * 0.1) AS BIGINT) AS k10
      FROM cells CROSS JOIN tot),
    takes AS (
      SELECT n, y,
             GREATEST(0, LEAST(t, k40 - c)) AS tb,
             GREATEST(0, LEAST(t, k10 - (n - (c + t)))) AS tt,
             v
      FROM j),
    ag AS (
      SELECT MAX(n) AS n, MAX(y) AS y,
             SUM(tb::HUGEINT * v) AS b,
             SUM(tt::HUGEINT * v) AS tp
      FROM takes),
    f AS (
      SELECT n,
             CAST(CAST(b AS VARCHAR) AS DOUBLE)
               / CAST(CAST(y AS VARCHAR) AS DOUBLE) AS bshare,
             CAST(CAST(tp AS VARCHAR) AS DOUBLE)
               / CAST(CAST(y AS VARCHAR) AS DOUBLE) AS tshare,
             n >= 10 AND CAST(CAST(y AS VARCHAR) AS DOUBLE) > 0 AS ok
      FROM ag)
    SELECT n,
           ROUND(CASE WHEN ok THEN bshare END, 6) AS bottom40_share,
           ROUND(CASE WHEN ok THEN tshare END, 6) AS top10_share,
           ROUND(CASE WHEN ok AND bshare > 0 THEN tshare / bshare
             END, 6) AS palma
    FROM f
    """,
    doc="Palma ratio of per-customer revenue: top-10% share over "
    "bottom-40% share (operators/relational.py:palma_ratio) — the "
    "tails-against-each-other inequality readout next to "
    "gini_customer_revenue (curve integral), atkinson (welfare) and "
    "lorenz deciles (the curve itself). Boundary-straddling tied "
    "cells contribute (k − below)·v exactly; guarded distinct-value "
    "prefix window in exact DECIMAL cents",
)
def palma_customer_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import palma_ratio

    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return palma_ratio(rev, "revenue", scale=100)


@_q(
    "hoover_customer_revenue",
    """
    WITH rev AS (
      SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        * 100, 0) AS BIGINT) AS v
      FROM orders GROUP BY o_custkey),
    per_v AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t
              FROM rev GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n,
             SUM(t::HUGEINT * v) AS y
      FROM per_v),
    ag AS (
      SELECT MAX(n) AS n, MAX(y) AS y,
             SUM(t::HUGEINT * ABS(n::HUGEINT * v - y)) AS ad
      FROM per_v CROSS JOIN tot)
    SELECT n,
           ROUND(CASE WHEN n > 0
                  AND CAST(CAST(y AS VARCHAR) AS DOUBLE) > 0 THEN
             CAST(CAST(ad AS VARCHAR) AS DOUBLE)
             / (2.0 * CAST(n AS DOUBLE)
                * CAST(CAST(y AS VARCHAR) AS DOUBLE)) END, 6) AS hoover
    FROM ag
    """,
    doc="Hoover (Robin Hood) index of per-customer revenue "
    "(operators/relational.py:hoover_index) — the inequality number "
    "with an operational reading: the fraction of total revenue "
    "that would have to move to equalize customers. The "
    "Σ|n·y_i − Y| form keeps every term an exact integer in cents — "
    "TWO DECIMAL folds, no window, no sort (contrast palma's "
    "guarded prefix lane)",
)
def hoover_customer_revenue_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.relational import hoover_index

    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    return hoover_index(rev, "revenue", scale=100)


@_q(
    "simpson_diversity_sources",
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
             SUM(c::HUGEINT * c) AS f2
      FROM counts GROUP BY 1),
    m AS (
      SELECT source, n_tokens, vocab,
             CAST(n_tokens AS DOUBLE) AS nd,
             CAST(CAST(f2 AS VARCHAR) AS DOUBLE) AS df2
      FROM ag),
    d AS (
      SELECT source, n_tokens, vocab,
             (df2 - nd) / (nd * (nd - 1.0)) AS sd2, nd, df2
      FROM m)
    SELECT source, n_tokens, vocab,
           ROUND(CASE WHEN n_tokens >= 2 THEN sd2 END, 6) AS simpson_d,
           ROUND(CASE WHEN n_tokens >= 2 THEN 1.0 - sd2 END, 6)
             AS gini_simpson,
           ROUND(CASE WHEN n_tokens >= 2 AND sd2 > 0 THEN 1.0 / sd2
             END, 6) AS inv_simpson,
           ROUND(CASE WHEN n_tokens >= 2 THEN
             10000.0 * (df2 - nd) / (nd * nd) END, 6) AS yules_k
    FROM d ORDER BY source
    """,
    doc="Simpson-family vocabulary concentration per source: repeat "
    "probability D, Gini-Simpson, effective vocabulary 1/D and "
    "Yule's K (operators/text.py:simpson_diversity) — the repeat-"
    "probability rung next to char_entropy (bits) and "
    "vocab_richness_sources (unseen mass): a source whose effective "
    "vocabulary collapses is boilerplate. Exact integer Σf² off the "
    "vocabulary-sized aggregate",
)
def simpson_diversity_sources_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.text import simpson_diversity

    docs = load(spark, sf_dir, "documents")
    return simpson_diversity(docs, "source", "text")


@_q(
    "padding_waste_docs",
    """
    WITH lens AS (
      SELECT len(list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               ' '), x -> x <> '')) AS ntok
      FROM documents WHERE text IS NOT NULL),
    b AS (
      SELECT CASE WHEN ntok <= 16 THEN 16 WHEN ntok <= 32 THEN 32
                  WHEN ntok <= 64 THEN 64 WHEN ntok <= 128 THEN 128
                  WHEN ntok <= 256 THEN 256 WHEN ntok <= 512 THEN 512
                  WHEN ntok <= 1024 THEN 1024 ELSE 2048 END AS bucket_len,
             LEAST(ntok, 2048) AS len_eff
      FROM lens),
    ag AS (
      SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
             CAST(COUNT(*) AS BIGINT) AS docs,
             CAST(SUM(len_eff) AS BIGINT) AS tokens,
             CAST(SUM(bucket_len - len_eff) AS BIGINT) AS padded_slots
      FROM b GROUP BY 1)
    SELECT bucket_len, docs, tokens, padded_slots,
           ROUND(CAST(padded_slots AS DOUBLE)
                 / (CAST(docs AS DOUBLE) * bucket_len), 6) AS waste_frac
    FROM ag ORDER BY bucket_len
    """,
    doc="Padding-waste report for power-of-two length bucketing over "
    "documents (operators/curation.py:padding_waste) — the batching-"
    "economics readout next to pack_sequences (which eliminates the "
    "waste by concat-packing): per bucket, how many padded slots a "
    "length-bucketed trainer pays. CASE-ladder integer bucketing "
    "(no float log2), longest bucket clips (truncation ≠ padding)",
)
def padding_waste_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import padding_waste

    docs = load(spark, sf_dir, "documents")
    return padding_waste(docs, "text")


@_q(
    "burrows_delta_sources",
    """
    WITH toks AS (
      SELECT source,
             unnest(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               ' ')) AS tok
      FROM documents),
    counts AS (
      SELECT source AS s, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2),
    panel AS (
      SELECT tok FROM (
        SELECT tok, SUM(c) AS tot FROM counts GROUP BY 1
        ORDER BY tot DESC, tok ASC LIMIT 30)),
    totals AS (SELECT s, CAST(SUM(c) AS BIGINT) AS n
               FROM counts GROUP BY 1),
    grid AS (SELECT s, n, tok FROM totals CROSS JOIN panel),
    freq AS (
      SELECT grid.s, grid.tok,
             COALESCE(CAST(c AS DOUBLE), 0.0) / CAST(n AS DOUBLE) AS f
      FROM grid LEFT JOIN counts
        ON counts.s = grid.s AND counts.tok = grid.tok),
    stats AS (
      SELECT tok, AVG(f) AS mu, STDDEV_SAMP(f) AS sd
      FROM freq GROUP BY 1),
    z AS (
      SELECT s, freq.tok,
             CASE WHEN sd > 0 THEN (f - mu) / sd ELSE 0.0 END AS z
      FROM freq JOIN stats ON stats.tok = freq.tok),
    pairs AS (
      SELECT a.s AS source_a, b.s AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             ROUND(AVG(ABS(a.z - b.z)), 6) AS delta
      FROM z a JOIN z b ON a.tok = b.tok AND a.s < b.s
      GROUP BY 1, 2)
    SELECT source_a, source_b, n_words, delta
    FROM pairs ORDER BY source_a, source_b
    """,
    doc="Burrows' Delta stylometric distance between document "
    "sources over the 30 highest-frequency (function) words "
    "(operators/text.py:burrows_delta) — the GENERATOR-drift rung "
    "next to jsd_source_docs (topic mass): two sources with "
    "different topics but one template sit close; a source whose "
    "Delta jumps changed its author/generator. Deterministic "
    "(count DESC, token ASC) panel; z-scores across sources per "
    "word",
)
def burrows_delta_sources_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import burrows_delta

    docs = load(spark, sf_dir, "documents")
    return burrows_delta(docs, "source", "text", top_k=30)


@_q(
    "taylors_law_events",
    """
    WITH cells AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2, 3),
    per_g AS (
      SELECT event_type, hr,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(c) AS BIGINT) AS s,
             SUM(c::HUGEINT * c) AS q
      FROM cells GROUP BY 1, 2),
    m AS (
      SELECT CAST(k AS DOUBLE) AS kd,
             CAST(s AS DOUBLE) / CAST(k AS DOUBLE) AS mean,
             (CAST(CAST(q AS VARCHAR) AS DOUBLE)
              - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(k AS DOUBLE)))
               / (CAST(k AS DOUBLE) - 1.0) AS var,
             k
      FROM per_g),
    pts AS (
      SELECT LN(mean) AS lx, LN(var) AS ly
      FROM m WHERE k >= 2 AND mean > 0 AND var > 0),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             SUM(lx) AS sx, SUM(ly) AS sy,
             SUM(lx * lx) AS sxx, SUM(ly * ly) AS syy,
             SUM(lx * ly) AS sxy
      FROM pts),
    c AS (
      SELECT n_groups,
             CAST(n_groups AS DOUBLE) AS ng,
             sxx - sx * sx / CAST(n_groups AS DOUBLE) AS cxx,
             syy - sy * sy / CAST(n_groups AS DOUBLE) AS cyy,
             sxy - sx * sy / CAST(n_groups AS DOUBLE) AS cxy,
             sx, sy
      FROM fit)
    SELECT n_groups,
           ROUND(CASE WHEN n_groups >= 3 AND cxx > 0 AND cyy > 0 THEN
             cxy / cxx END, 6) AS slope_b,
           ROUND(CASE WHEN n_groups >= 3 AND cxx > 0 AND cyy > 0 THEN
             (sy - (cxy / cxx) * sx) / ng END, 6) AS intercept_log_a,
           ROUND(CASE WHEN n_groups >= 3 AND cxx > 0 AND cyy > 0 THEN
             cxy * cxy / (cxx * cyy) END, 6) AS r2
    FROM c
    """,
    doc="Taylor's power law Var ≈ a·Mean^b fitted across (event_type "
    "× hour-of-day) groups of daily counts "
    "(operators/relational.py:taylors_law) — the fluctuation-"
    "scaling diagnostic: b=1 Poisson arrivals, b→2 bursty/clustered; "
    "a drifting b means the arrival process changed even when "
    "totals didn't. Exact integer cell counts; closed-form log-log "
    "fit",
)
def taylors_law_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import taylors_law

    ev = load_events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hr"),
        F.to_date("ts").alias("day"),
    )
    return taylors_law(base, ["event_type", "hr"], ["day"])


@_q(
    "footrule_day_rankings",
    """
    WITH counts AS (
      SELECT CAST(ts AS DATE) AS d, event_type AS i,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT d, i,
             ROW_NUMBER() OVER (PARTITION BY d
               ORDER BY c DESC, i ASC) AS r
      FROM counts),
    pairs AS (
      SELECT a.d AS day, a.i, a.r, b.r AS rp
      FROM ranked a
      JOIN ranked b ON b.d + 1 = a.d AND b.i = a.i),
    ag AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ABS(r - rp)) AS BIGINT) AS footrule
      FROM pairs GROUP BY 1)
    SELECT day, k, footrule,
           ROUND(CASE WHEN FLOOR(CAST(k AS DOUBLE) * k / 2.0) > 0 THEN
             CAST(footrule AS DOUBLE)
             / FLOOR(CAST(k AS DOUBLE) * k / 2.0)
             ELSE 0.0 END, 6) AS normalized
    FROM ag ORDER BY day
    """,
    doc="Spearman footrule displacement between consecutive days' "
    "event-type rankings, normalized by the ⌊k²/2⌋ maximum "
    "(operators/relational.py:footrule_day_rankings) — the CHURN "
    "companion to rbo_day_rankings: RBO is top-weighted similarity; "
    "the footrule is total rank movement, 0 = frozen leaderboard, "
    "1 = full reversal. Deterministic (count DESC, item ASC) ranks",
)
def footrule_day_rankings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import footrule_day_rankings

    ev = load_events(spark, sf_dir)
    base = ev.select(F.to_date("ts").alias("day"), "event_type")
    return footrule_day_rankings(base, "day", "event_type")


# ---- wave 6 (tail-parked: the r12 head is full at backlog+31, so
# these carry three-profile + ANSI local attestation in the committed
# ORACLE_*.json artifacts and are the named r13 head candidates) ----


@_q(
    "lepage_click_error",
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
      SELECT v, ta, tb, ta + tb AS t,
             CAST(COALESCE(SUM(ta + tb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c
      FROM pv),
    mw AS (
      SELECT CAST(SUM(ta) AS BIGINT) AS na,
             CAST(SUM(tb) AS BIGINT) AS nb,
             CAST(SUM(CAST(ta AS HUGEINT)
                      * (2 * CAST(c AS HUGEINT) + ta + tb + 1))
                  AS HUGEINT) AS r2a,
             CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties
      FROM r),
    zw AS (
      SELECT na, nb,
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
             END AS z_location
      FROM mw),
    cell AS (
      SELECT r.t, r.ta AS fa, tot.n, tot.na2,
             CAST(FLOOR((tot.n + 1) / 2) AS BIGINT) AS h,
             r.c + 1 AS lo, r.c + r.t AS hi
      FROM r CROSS JOIN (
        SELECT CAST(SUM(ta + tb) AS BIGINT) AS n,
               CAST(SUM(ta) AS BIGINT) AS na2 FROM pv) tot),
    s2c AS (
      SELECT t, fa, n, na2,
             (CASE WHEN LEAST(hi, h) >= lo
                   THEN (lo + LEAST(hi, h))::HUGEINT
                        * (LEAST(hi, h) - lo + 1)
                   ELSE 0 END
              + CASE WHEN hi >= GREATEST(lo, h + 1)
                     THEN (2 * (n + 1) - GREATEST(lo, h + 1) - hi)::HUGEINT
                          * (hi - GREATEST(lo, h + 1) + 1)
                     ELSE 0 END) AS s2
      FROM cell),
    abg AS (
      SELECT MAX(n) AS nn, MAX(na2) AS n_a,
             SUM(s2) AS sa2,
             SUM(CAST(fa AS DOUBLE) * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                 / (2.0 * t)) AS ab,
             SUM(CAST(CAST(s2 * s2 AS VARCHAR) AS DOUBLE) / (4.0 * t))
               AS saa
      FROM s2c),
    zab AS (
      SELECT ROUND(CASE WHEN CAST(n_a AS DOUBLE) > 0
                    AND CAST(nn - n_a AS DOUBLE) > 0
                    AND CAST(n_a AS DOUBLE) * CAST(nn - n_a AS DOUBLE)
                        * (CAST(nn AS DOUBLE) * saa
                           - (CAST(CAST(sa2 AS VARCHAR) AS DOUBLE) / 2.0)
                             * (CAST(CAST(sa2 AS VARCHAR) AS DOUBLE) / 2.0))
                        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                           * (CAST(nn AS DOUBLE) - 1.0)) > 0
              THEN (ab - CAST(n_a AS DOUBLE)
                         * (CAST(CAST(sa2 AS VARCHAR) AS DOUBLE) / 2.0)
                         / CAST(nn AS DOUBLE))
                   / SQRT(CAST(n_a AS DOUBLE) * CAST(nn - n_a AS DOUBLE)
                          * (CAST(nn AS DOUBLE) * saa
                             - (CAST(CAST(sa2 AS VARCHAR) AS DOUBLE) / 2.0)
                               * (CAST(CAST(sa2 AS VARCHAR) AS DOUBLE) / 2.0))
                          / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                             * (CAST(nn AS DOUBLE) - 1.0))) END, 6)
               AS z_scale
      FROM abg)
    SELECT na AS n_a, nb AS n_b, z_location, z_scale,
           ROUND(z_location * z_location + z_scale * z_scale, 6)
             AS lepage_l
    FROM zw CROSS JOIN zab
    """,
    doc="Lepage combined location-scale test, click vs error values "
    "(operators/relational.py:lepage_test) — χ²(2) combination of "
    "the tie-corrected Mann-Whitney z and Ansari-Bradley z; the "
    "deliberate cross-check against cucconi_click_error (two "
    "different combinations of the same rank information must tell "
    "one story). L computed from the ROUND-6 component z's so the "
    "composition is engine-identical by construction",
)
def lepage_click_error_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import lepage_test

    ev = load_events(spark, sf_dir)
    return lepage_test(ev, "value", "event_type", "click", "error")


@_q(
    "van_elteren_click_weekday",
    """
    WITH base AS (
      SELECT CAST(isodow(ts) - 1 AS BIGINT) AS s,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events
      WHERE event_type IN ('click', 'error') AND value IS NOT NULL),
    cells AS (
      SELECT s, v, CAST(SUM(ia) AS BIGINT) AS ta,
             CAST(SUM(1 - ia) AS BIGINT) AS tb
      FROM base GROUP BY 1, 2),
    r AS (
      SELECT s, ta, tb, ta + tb AS t,
             CAST(COALESCE(SUM(ta + tb) OVER (PARTITION BY s ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c
      FROM cells),
    per_s AS (
      SELECT s,
             CAST(SUM(ta) AS BIGINT) AS m,
             CAST(SUM(tb) AS BIGINT) AS nb,
             SUM(ta::HUGEINT * (2 * c + ta + tb + 1)) AS r2a,
             SUM(t::HUGEINT * (2 * c + ta + tb + 1)
                 * (2 * c + ta + tb + 1)) AS q4
      FROM r GROUP BY 1),
    mm AS (
      SELECT m, nb,
             CAST(m AS DOUBLE) AS md, CAST(nb AS DOUBLE) AS nbd,
             CAST(m + nb AS DOUBLE) AS ns,
             CAST(CAST(r2a AS VARCHAR) AS DOUBLE) / 2.0 AS ra,
             CAST(CAST(q4 AS VARCHAR) AS DOUBLE) / 4.0 AS sr2
      FROM per_s),
    terms AS (
      SELECT m, nb, md, nbd, ns, ra,
             1.0 / (ns + 1.0) AS wgt,
             (sr2 - ns * (ns + 1.0) * (ns + 1.0) / 4.0) / (ns - 1.0)
               AS rvar,
             m > 0 AND nb > 0 AND ns >= 2 AS usable
      FROM mm),
    fold AS (
      SELECT CAST(SUM(m + nb) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_strata,
             SUM(CASE WHEN usable THEN wgt * ra END) AS w,
             SUM(CASE WHEN usable THEN wgt * md * (ns + 1.0) / 2.0 END)
               AS e,
             SUM(CASE WHEN usable THEN
                 wgt * wgt * md * nbd * rvar / ns END) AS var
      FROM terms)
    SELECT n, n_strata,
           ROUND(w, 6) AS w_stat,
           ROUND(CASE WHEN var > 0 THEN (w - e) / SQRT(var) END, 6) AS z
    FROM fold
    """,
    doc="Van Elteren stratified rank test of click vs error values, "
    "strata = weekday (operators/relational.py:van_elteren) — "
    "mantel_haenszel's continuous-outcome sibling: a within-stratum "
    "Wilcoxon combined with locally-most-powerful 1/(N_s+1) "
    "weights, so weekday level shifts can't masquerade as a "
    "click/error difference. Per-stratum midrank sums and Σr² "
    "exact 2x/4x DECIMAL off stratum-partitioned prefix windows "
    "(parallel partitions, no global sort)",
)
def van_elteren_click_weekday_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.relational import van_elteren

    ev = load_events(spark, sf_dir)
    base = ev.select(
        F.weekday("ts").cast("long").alias("s"), "value", "event_type"
    )
    return van_elteren(
        base, "value", "event_type", "click", "error", ["s"]
    )


@_q(
    "cv_qcd_event_types",
    """
    WITH base AS (
      SELECT event_type AS grp, CAST(value AS DOUBLE) AS x,
             CAST(value AS DECIMAL(18,6)) AS xd
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    ag AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(xd AS DECIMAL(38,6))) AS s,
             SUM(CAST(xd * xd AS DECIMAL(38,12))) AS q,
             quantile_cont(x, 0.25) AS q1,
             quantile_cont(x, 0.75) AS q3
      FROM base GROUP BY 1),
    m AS (
      SELECT grp, n, q1, q3,
             CAST(n AS DOUBLE) AS nd,
             CAST(CAST(s AS VARCHAR) AS DOUBLE) AS ds,
             CAST(CAST(q AS VARCHAR) AS DOUBLE) AS dq
      FROM ag),
    f AS (
      SELECT grp, n, q1, q3, ds / nd AS mean,
             (dq - ds * ds / nd) / (nd - 1.0) AS var, nd
      FROM m)
    SELECT grp, n,
           ROUND(mean, 6) AS mean,
           ROUND(CASE WHEN n >= 2 AND mean <> 0 AND var >= 0 THEN
             SQRT(var) / mean END, 6) AS cv,
           ROUND(CASE WHEN q3 + q1 <> 0 THEN (q3 - q1) / (q3 + q1)
             END, 6) AS qcd
    FROM f ORDER BY grp
    """,
    doc="Coefficient of variation + quartile coefficient of "
    "dispersion per event type "
    "(operators/relational.py:cv_qcd_by_group) — the two RELATIVE-"
    "spread readouts (moment vs robust); CV >> QCD = tail outliers, "
    "not broad spread — one-line triage before the EVT family. "
    "Exact DECIMAL moments + exact linear-interpolated quartiles "
    "(percentile ≡ quantile_cont) in one aggregate",
)
def cv_qcd_event_types_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import cv_qcd_by_group

    ev = load_events(spark, sf_dir)
    return cv_qcd_by_group(ev, "event_type", "value")


@_q(
    "robust_shape_values",
    """
    WITH base AS (
      SELECT CAST(value AS DOUBLE) AS x FROM events
      WHERE value IS NOT NULL),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             quantile_cont(x, 0.125) AS e1, quantile_cont(x, 0.25) AS e2,
             quantile_cont(x, 0.375) AS e3, quantile_cont(x, 0.5) AS e4,
             quantile_cont(x, 0.625) AS e5, quantile_cont(x, 0.75) AS e6,
             quantile_cont(x, 0.875) AS e7
      FROM base)
    SELECT n,
           ROUND(CASE WHEN n >= 4 AND e6 - e2 > 0 THEN
             (e6 + e2 - 2.0 * e4) / (e6 - e2) END, 6) AS bowley_skew,
           ROUND(CASE WHEN n >= 8 AND e6 - e2 > 0 THEN
             ((e7 - e5) + (e3 - e1)) / (e6 - e2) END, 6)
             AS moors_kurtosis
    FROM ag
    """,
    doc="Bowley skewness + Moors kurtosis of event values from exact "
    "octiles (operators/relational.py:robust_shape) — the heavy-"
    "tail-proof shape numbers next to jarque_bera_values' moment "
    "versions: one wild row moves third/fourth moments arbitrarily "
    "but no quantile at all, so moment-vs-quantile divergence IS "
    "the outlier alarm. Moors' normal reference ≈ 1.233",
)
def robust_shape_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import robust_shape

    ev = load_events(spark, sf_dir)
    return robust_shape(ev, "value")


@_q(
    "longest_run_daily",
    f"""
    WITH daily AS ({_POOLED_DAILY_SQL}),
    med AS (SELECT quantile_cont(v, 0.5) AS med FROM daily),
    signed AS (
      SELECT day, v > med AS up
      FROM daily CROSS JOIN med WHERE v <> med),
    isl AS (
      SELECT up,
             ROW_NUMBER() OVER (ORDER BY day)
             - ROW_NUMBER() OVER (PARTITION BY up ORDER BY day) AS isl
      FROM signed),
    runs AS (
      SELECT up, isl, CAST(COUNT(*) AS BIGINT) AS len
      FROM isl GROUP BY 1, 2),
    ag AS (
      SELECT CAST(SUM(len) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_runs,
             MAX(CASE WHEN up THEN len END) AS la,
             MAX(CASE WHEN NOT up THEN len END) AS lb
      FROM runs)
    SELECT COALESCE(n, 0) AS n, COALESCE(n_runs, 0) AS n_runs,
           CAST(COALESCE(la, 0) AS BIGINT) AS longest_above,
           CAST(COALESCE(lb, 0) AS BIGINT) AS longest_below
    FROM ag
    """,
    doc="Longest above/below-median runs of the pooled daily mean "
    "(operators/series.py:longest_run) — the extreme-run companion "
    "to runs_test_daily: a series can pass the run COUNT while "
    "hiding one pathological stretch. Gaps-and-islands rewrite "
    "(row_number difference) — pure windows, no recursion; exact "
    "median, equal-to-median days drop (runs_test convention)",
)
def longest_run_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import longest_run

    daily = _pooled_daily_frame(spark, sf_dir)
    return longest_run(daily, "day", "v")


@_q(
    "record_highs_daily",
    f"""
    WITH daily AS ({_POOLED_DAILY_SQL}),
    marked AS (
      SELECT v > COALESCE(MAX(v) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               -1e308) AS rec
      FROM daily),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN rec THEN 1 ELSE 0 END) AS BIGINT)
               AS records
      FROM marked),
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily),
    hsum AS (
      SELECT SUM(1.0 / t) AS hn,
             SUM(1.0 / (CAST(t AS DOUBLE) * t)) AS hn2
      FROM idx),
    h AS (
      SELECT ag.n, ag.records, hsum.hn, hsum.hn2
      FROM ag CROSS JOIN hsum)
    SELECT n, records,
           ROUND(CASE WHEN n >= 1 THEN hn END, 6) AS expected,
           ROUND(CASE WHEN n >= 2 AND hn - hn2 > 0 THEN
             (CAST(records AS DOUBLE) - hn) / SQRT(hn - hn2) END, 6)
             AS z
    FROM h
    """,
    doc="Record-high count of the pooled daily mean vs the "
    "distribution-free i.i.d. expectation H_n "
    "(operators/series.py:record_highs) — the t-th point is a "
    "running max with probability exactly 1/t under "
    "exchangeability, so E = H_n and Var = H_n − H_n^(2) with NO "
    "distributional assumptions or tie corrections (strict "
    "records): ratcheting levels show up before mann_kendall sees "
    "a mean trend. One prefix-max window + a bounded harmonic fold",
)
def record_highs_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import record_highs

    daily = _pooled_daily_frame(spark, sf_dir)
    return record_highs(daily, "day", "v")


# ---- wave 7: p-value infrastructure (shared A-S normal CDF) ----


@_q(
    "bh_fdr_daily",
    f"""
    WITH daily AS ({_POOLED_DAILY_SQL}),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(CAST(v AS DECIMAL(38,6))) AS s,
             SUM(CAST(CAST(v AS DECIMAL(18,6))
                      * CAST(v AS DECIMAL(18,6))
                      AS DECIMAL(38,12))) AS q
      FROM daily),
    zz AS (
      SELECT day, m,
             (v - CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(m AS DOUBLE))
             / SQRT((CAST(CAST(q AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                       / CAST(m AS DOUBLE))
                    / (CAST(m AS DOUBLE) - 1.0)) AS z
      FROM daily CROSS JOIN mom),
    ps AS (
      SELECT day, m,
             2.0 * (1.0 - 
    (CASE WHEN (ABS(zz.z)) >= 0 THEN
       1.0 - EXP(-(ABS(ABS(zz.z)) * ABS(ABS(zz.z))) / 2.0) / 2.5066282746310002
             * ((1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
                * (0.319381530
                   + (1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
                   * (-0.356563782
                      + (1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
                      * (1.781477937
                         + (1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
                         * (-1.821255978
                            + (1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
                            * 1.330274429)))))
     ELSE
       EXP(-(ABS(ABS(zz.z)) * ABS(ABS(zz.z))) / 2.0) / 2.5066282746310002
       * ((1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
          * (0.319381530
             + (1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
             * (-0.356563782
                + (1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
                * (1.781477937
                   + (1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
                   * (-1.821255978
                      + (1.0 / (1.0 + 0.2316419 * ABS(ABS(zz.z))))
                      * 1.330274429)))))
     END)
) AS p
      FROM zz),
    ranked AS (
      SELECT m, p, ROW_NUMBER() OVER (ORDER BY p, day) AS i
      FROM ps),
    flagged AS (
      SELECT m, p, i,
             p <= CAST(i AS DOUBLE) * 0.05 / CAST(m AS DOUBLE) AS le
      FROM ranked),
    kmax AS (SELECT MAX(CASE WHEN le THEN i END) AS k FROM flagged),
    ag AS (
      SELECT CAST(MAX(m) AS BIGINT) AS m,
             CAST(COALESCE(MAX(k), 0) AS BIGINT) AS n_rejected,
             MAX(CASE WHEN i = k THEN p END) AS thr,
             CAST(SUM(CASE WHEN p > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS over,
             MIN(p) AS minp
      FROM flagged CROSS JOIN kmax)
    SELECT m, n_rejected,
           ROUND(thr, 6) AS bh_threshold,
           ROUND(CASE WHEN m > 0 THEN
             LEAST(CAST(over AS DOUBLE) / (0.5 * CAST(m AS DOUBLE)), 1.0)
             END, 6) AS pi0_storey,
           ROUND(minp, 6) AS min_p
    FROM ag
    """,
    doc="Benjamini-Hochberg FDR + Storey pi0 over the pooled daily "
    "mean's two-sided normal anomaly p-values, q=0.05 "
    "(operators/series.py:bh_fdr) — the multiple-testing rung the "
    "anomaly family lacks: 30 days at alpha=0.05 expect 1.5 false "
    "alarms; BH bounds the false-discovery RATE across the panel "
    "and pi0 estimates the null fraction. Phi via the shared "
    "Abramowitz-Stegun closed form (operators/util.py:norm_cdf) — "
    "identical algebra on both engines, cross-engine diff ~1 ulp",
)
def bh_fdr_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import bh_fdr

    daily = _pooled_daily_frame(spark, sf_dir)
    return bh_fdr(daily, "day", "v", q=0.05, lam=0.5)


@_q(
    "ad_normal_values",
    """
    WITH base AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    per_v AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t
              FROM base GROUP BY 1),
    mom AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n,
             SUM(t::HUGEINT * v) AS s,
             SUM(t::HUGEINT * v * v) AS q
      FROM per_v),
    cells AS (
      SELECT v, t,
             CAST(COALESCE(SUM(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c,
             n, s, q
      FROM per_v CROSS JOIN mom),
    zc AS (
      SELECT t, c, n,
             (CAST(v AS DOUBLE)
              - CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
             / SQRT((CAST(CAST(q AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                       / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0)) AS z,
             SQRT((CAST(CAST(q AS VARCHAR) AS DOUBLE)
                   - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                     * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0)) AS sd
      FROM cells),
    terms AS (
      SELECT n, sd,
             CAST((c + t) * (c + t) - c * c AS DOUBLE)
               * LN(GREATEST(
    (CASE WHEN (zc.z) >= 0 THEN
       1.0 - EXP(-(ABS(zc.z) * ABS(zc.z)) / 2.0) / 2.5066282746310002
             * ((1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                * (0.319381530
                   + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                   * (-0.356563782
                      + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                      * (1.781477937
                         + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                         * (-1.821255978
                            + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                            * 1.330274429)))))
     ELSE
       EXP(-(ABS(zc.z) * ABS(zc.z)) / 2.0) / 2.5066282746310002
       * ((1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
          * (0.319381530
             + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
             * (-0.356563782
                + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                * (1.781477937
                   + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                   * (-1.821255978
                      + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                      * 1.330274429)))))
     END)
, 1e-300)) AS t1,
             CAST(t * (2 * n + 1)
                  - ((c + t) * (c + t + 1) - c * (c + 1)) AS DOUBLE)
               * LN(GREATEST(1.0 - 
    (CASE WHEN (zc.z) >= 0 THEN
       1.0 - EXP(-(ABS(zc.z) * ABS(zc.z)) / 2.0) / 2.5066282746310002
             * ((1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                * (0.319381530
                   + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                   * (-0.356563782
                      + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                      * (1.781477937
                         + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                         * (-1.821255978
                            + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                            * 1.330274429)))))
     ELSE
       EXP(-(ABS(zc.z) * ABS(zc.z)) / 2.0) / 2.5066282746310002
       * ((1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
          * (0.319381530
             + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
             * (-0.356563782
                + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                * (1.781477937
                   + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                   * (-1.821255978
                      + (1.0 / (1.0 + 0.2316419 * ABS(zc.z)))
                      * 1.330274429)))))
     END)
, 1e-300)) AS t2
      FROM zc),
    ag AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n, MAX(sd) AS sd,
             SUM(t1 + t2) AS fold
      FROM terms),
    f AS (
      SELECT n, sd,
             -CAST(n AS DOUBLE) - fold / CAST(n AS DOUBLE) AS ad2
      FROM ag)
    SELECT n,
           ROUND(CASE WHEN n >= 8 AND sd > 0 THEN ad2 END, 6) AS ad_stat,
           ROUND(CASE WHEN n >= 8 AND sd > 0 THEN
             ad2 * (1.0 + 0.75 / CAST(n AS DOUBLE)
                    + 2.25 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             END, 6) AS ad_star
    FROM f
    """,
    doc="One-sample Anderson-Darling test of event values against a "
    "FITTED normal (operators/relational.py:ad_normal) — the "
    "tail-weighted distribution-fit rung next to jarque_bera "
    "(moments) and ks_expfit (exponential): decides whether "
    "z-score alerting is legitimate on this metric. Reversed-index "
    "term folded onto the same cell via j=n+1-i; exact integer "
    "index sums off the guarded prefix window; A*2 small-sample "
    "adjustment rides along",
)
def ad_normal_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import ad_normal

    ev = load_events(spark, sf_dir)
    return ad_normal(ev, "value", scale=100)
