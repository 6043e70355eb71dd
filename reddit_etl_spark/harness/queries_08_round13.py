"""Harness queries (part 8): round-13 registrations.

One capped wave (judge r12 #3: head slack goes to stale
re-attestations, so net-new registrations stay ≤ the slack after the
backlog + deming re-attestation are seated): Lilliefors normality
(max-gap companion to ad_normal), Kuiper cyclic two-sample, Hoeffding's
D general dependence, Blomqvist's medial correlation, the paired sign
test, Breslow-Day OR homogeneity (mantel_haenszel's mandatory
companion), total-variation drift, and categorical feature screening.
Each pairs a Spark builder with an independent DuckDB oracle per the
package conventions (see __init__ docstring).
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
from ..operators.util import NORM_CDF_SQL

_PHI_Z = NORM_CDF_SQL.format(z="zc.z")
_PHI_ABS_Z = NORM_CDF_SQL.format(z="ABS(zc.z)")


@_q(
    "lilliefors_values",
    f"""
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
             CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
               AS mu,
             SQRT((CAST(CAST(q AS VARCHAR) AS DOUBLE)
                   - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                     * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0)) AS sd,
             (CAST(v AS DOUBLE)
              - CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
             / SQRT((CAST(CAST(q AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                       / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0)) AS z
      FROM cells),
    gaps AS (
      SELECT n, mu, sd,
             CAST(c + t AS DOUBLE) / n - {_PHI_Z} AS dp,
             {_PHI_Z} - CAST(c AS DOUBLE) / n AS dm
      FROM zc),
    ag AS (
      SELECT MAX(n) AS n, MAX(mu) AS mu, MAX(sd) AS sd,
             MAX(dp) AS dp, MAX(dm) AS dm
      FROM gaps)
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(mu / 100, 6) AS mean,
           ROUND(CASE WHEN sd > 0 THEN sd / 100 END, 6) AS sd,
           ROUND(CASE WHEN n >= 4 AND sd > 0 THEN
             GREATEST(dp, dm) END, 6) AS d_stat
    FROM ag
    """,
    doc="Lilliefors one-sample KS statistic of event values against "
    "the FITTED normal (operators/relational.py:lilliefors_normal) "
    "— the max-single-gap companion to ad_normal_values' "
    "tail-weighted integral: passing AD but failing Lilliefors "
    "means one localized distortion, the reverse diffuse tail "
    "thickness. Exact DECIMAL moments, guarded distinct-value "
    "prefix window, shared A-S normal CDF on both engines",
)
def lilliefors_values_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import lilliefors_normal

    ev = load_events(spark, sf_dir)
    return lilliefors_normal(ev, "value", scale=100)


@_q(
    "kuiper_click_error_hours",
    """
    WITH base AS (
      SELECT CAST(hour(ts) AS BIGINT) AS v,
             (event_type = 'click') AS isa
      FROM events
      WHERE ts IS NOT NULL AND event_type IN ('click', 'error')),
    per_v AS (
      SELECT v,
             CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS cb
      FROM base GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb
      FROM per_v),
    run AS (
      SELECT SUM(ca) OVER w AS cca, SUM(cb) OVER w AS ccb, na, nb
      FROM per_v CROSS JOIN tot
      WINDOW w AS (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    d AS (
      SELECT MAX(na) AS na, MAX(nb) AS nb,
             MAX(cca::HUGEINT * nb - ccb::HUGEINT * na) AS dp,
             MAX(ccb::HUGEINT * na - cca::HUGEINT * nb) AS dm
      FROM run)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(CASE WHEN na > 0 AND nb > 0 THEN
             CAST(CAST(dp AS VARCHAR) AS DOUBLE)
             / (CAST(na AS DOUBLE) * nb) END, 6) AS d_plus,
           ROUND(CASE WHEN na > 0 AND nb > 0 THEN
             CAST(CAST(dm AS VARCHAR) AS DOUBLE)
             / (CAST(na AS DOUBLE) * nb) END, 6) AS d_minus,
           ROUND(CASE WHEN na > 0 AND nb > 0 THEN
             (CAST(CAST(dp AS VARCHAR) AS DOUBLE)
              + CAST(CAST(dm AS VARCHAR) AS DOUBLE))
             / (CAST(na AS DOUBLE) * nb) END, 6) AS kuiper_v
    FROM d
    """,
    doc="Kuiper two-sample test between click and error events over "
    "HOUR-OF-DAY (operators/relational.py:kuiper_two_sample) — the "
    "cyclic-safe KS: V = D+ + D- is invariant to rotating the value "
    "origin, the correct statistic on a circular domain where a "
    "shift straddling midnight quietly drains KS power. Exact "
    "integer cumulative counts, DECIMAL cross-product numerators, "
    "one double division per output",
)
def kuiper_click_error_hours_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import kuiper_two_sample

    ev = load_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    base = ev.select(
        F.hour("ts").cast("long").alias("hr"), "event_type"
    )
    return kuiper_two_sample(base, "hr", "event_type", "click", "error")


@_q(
    "hoeffding_d_lineitem",
    """
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
    cells AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS f
      FROM base GROUP BY 1, 2),
    per_cell AS (
      SELECT a.x AS x1, a.y AS y1, a.f AS f1,
             COALESCE(SUM(CASE WHEN b.x < a.x AND b.y < a.y
                          THEN b.f END), 0) AS ltlt,
             COALESCE(SUM(CASE WHEN b.x = a.x AND b.y < a.y
                          THEN b.f END), 0) AS eqlt,
             COALESCE(SUM(CASE WHEN b.x < a.x AND b.y = a.y
                          THEN b.f END), 0) AS lteq,
             COALESCE(SUM(CASE WHEN b.x < a.x THEN b.f END), 0) AS ltx,
             COALESCE(SUM(CASE WHEN b.x = a.x THEN b.f END), 0) AS eqx,
             COALESCE(SUM(CASE WHEN b.y < a.y THEN b.f END), 0) AS lty,
             COALESCE(SUM(CASE WHEN b.y = a.y THEN b.f END), 0) AS eqy
      FROM cells a CROSS JOIN cells b
      GROUP BY 1, 2, 3),
    scaled AS (
      SELECT f1,
             4 + 4 * ltlt + 2 * (eqlt + lteq) + (f1 - 1) AS q4,
             2 * ltx + eqx + 1 AS r2,
             2 * lty + eqy + 1 AS s2
      FROM per_cell),
    ag AS (
      SELECT CAST(SUM(f1) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             SUM(f1::HUGEINT * (q4 - 4) * (q4 - 8)) AS d1,
             SUM(f1::HUGEINT * (r2 - 2) * (r2 - 4)
                 * (s2 - 2) * (s2 - 4)) AS d2,
             SUM(f1::HUGEINT * (r2 - 4) * (s2 - 4) * (q4 - 4)) AS d3
      FROM scaled),
    m AS (
      SELECT n, n_cells, CAST(n AS DOUBLE) AS nd,
             COALESCE(CAST(CAST(d1 AS VARCHAR) AS DOUBLE), 0.0) / 16.0
               AS d1d,
             COALESCE(CAST(CAST(d2 AS VARCHAR) AS DOUBLE), 0.0) / 16.0
               AS d2d,
             COALESCE(CAST(CAST(d3 AS VARCHAR) AS DOUBLE), 0.0) / 16.0
               AS d3d
      FROM ag)
    SELECT n, n_cells,
           ROUND(CASE WHEN n >= 5 THEN
             30.0 * ((nd - 2.0) * (nd - 3.0) * d1d + d2d
                     - 2.0 * (nd - 2.0) * d3d)
             / (nd * (nd - 1.0) * (nd - 2.0) * (nd - 3.0) * (nd - 4.0))
             END, 6) AS hoeffding_d
    FROM m
    """,
    doc="Hoeffding's D between l_quantity and l_discount (cents) "
    "(operators/relational.py:hoeffding_d) — GENERAL dependence "
    "where kendall/spearman/ordinal_assoc only score monotone "
    "co-movement: a U-shaped or checkerboard relation scores ~0 on "
    "all of them but is real dependence. Everything folds over the "
    "50x11 cell grid with Hmisc-compatible tie weights as exact "
    "scaled integers (4Q/2R/2S), D-sums x16 in DECIMAL(38,0), one "
    "guarded cells^2 dominance join",
    headline=True,  # round-13 headline add (the guarded cells² shape
    # gets a continuously-watched wall time, as r12 did wasserstein);
    # totals NOT comparable to r12's 22-query total without
    # subtracting its median
)
def hoeffding_d_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import hoeffding_d

    li = load(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("y"),
    )
    return hoeffding_d(base, "x", "y")


@_q(
    "blomqvist_beta_lineitem",
    """
    WITH base AS (
      SELECT CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
    med AS (
      SELECT quantile_cont(x, 0.5) AS mx, quantile_cont(y, 0.5) AS my
      FROM base),
    ag AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN (x > mx AND y > my)
                           OR (x < mx AND y < my)
                      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN (x > mx AND y < my)
                           OR (x < mx AND y > my)
                      THEN 1 ELSE 0 END) AS BIGINT) AS nd
      FROM base CROSS JOIN med)
    SELECT n,
           CAST(nc + nd AS BIGINT) AS n_used,
           ROUND(CASE WHEN nc + nd > 0 THEN
             CAST(nc - nd AS DOUBLE) / (nc + nd) END, 6) AS beta,
           ROUND(CASE WHEN nc + nd > 0 THEN
             CAST(nc - nd AS DOUBLE) / (nc + nd)
             * SQRT(CAST(nc + nd AS DOUBLE)) END, 6) AS z
    FROM ag
    """,
    doc="Blomqvist's medial correlation between l_quantity and "
    "l_extendedprice (operators/relational.py:blomqvist_beta) — the "
    "cheapest robust dependence number: quadrant concordance around "
    "the two medians, invariant to monotone transforms and tail "
    "outliers; the triage rung before kendall/hoeffding. Medians "
    "via exact interpolated percentile (Spark percentile = DuckDB "
    "quantile_cont), on-median points excluded (standard)",
)
def blomqvist_beta_lineitem_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import blomqvist_beta

    li = load(spark, sf_dir, "lineitem")
    return blomqvist_beta(li, "l_quantity", "l_extendedprice")


@_q(
    "sign_test_user_halves",
    f"""
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
      SELECT CAST(ROUND((y - x) * 100, 0) AS BIGINT) AS d
      FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
    ag AS (
      SELECT CAST(SUM(CASE WHEN d != 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n,
             CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
             CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS s_plus
      FROM pairs),
    zc AS (
      SELECT n, n_zero, s_plus,
             SIGN(CAST(s_plus AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             * GREATEST(ABS(CAST(s_plus AS DOUBLE)
                            - CAST(n AS DOUBLE) / 2.0) - 0.5, 0.0)
             / (0.5 * SQRT(CAST(n AS DOUBLE))) AS z
      FROM ag)
    SELECT COALESCE(n, 0) AS n, n_zero, s_plus,
           ROUND(CASE WHEN n > 0 THEN z END, 6) + 0.0 AS z,
           ROUND(CASE WHEN n > 0 THEN
             LEAST(1.0, 2.0 * (1.0 - {_PHI_ABS_Z})) END, 6) AS p_value
    FROM zc
    """,
    doc="Paired sign test of per-user mean event value, first half vs "
    "second half (operators/relational.py:sign_test_paired) — the "
    "assumption-free floor under wilcoxon_user_halves: only the "
    "SIGN of each within-pair difference, so no symmetry premise; "
    "the right readout when the difference distribution is skewed "
    "enough to invalidate Wilcoxon. Binomial(n, 1/2) normal "
    "approximation with continuity correction, p via the shared "
    "A-S normal CDF",
)
def sign_test_user_halves_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import sign_test_paired

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    split = F.lit("2024-01-15").cast("date")
    pre = F.when(F.to_date("ts") <= split, F.col("value"))
    post = F.when(F.to_date("ts") > split, F.col("value"))
    pu = ev.groupBy("user_id").agg(
        F.round(
            F.sum(pre.cast("decimal(18,6)")).cast("double") / F.count(pre),
            6,
        ).alias("x"),
        F.round(
            F.sum(post.cast("decimal(18,6)")).cast("double")
            / F.count(post),
            6,
        ).alias("y"),
    )
    return sign_test_paired(
        pu.filter(F.col("x").isNotNull() & F.col("y").isNotNull()),
        "x",
        "y",
        scale=100,
    )


@_q(
    "breslow_day_priority",
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
    mh AS (
      SELECT CAST(SUM(a + b + c + d) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_strata,
             SUM(CASE WHEN a + b + c + d > 0 THEN
                 CAST(a AS DOUBLE) * d / (a + b + c + d) END) AS r,
             SUM(CASE WHEN a + b + c + d > 0 THEN
                 CAST(b AS DOUBLE) * c / (a + b + c + d) END) AS s
      FROM per_s),
    j AS (
      SELECT p.*, mh.n, mh.n_strata, mh.r, mh.s, mh.r / mh.s AS orm,
             CAST(p.a + p.b AS DOUBLE) AS m1,
             CAST(p.c + p.d AS DOUBLE) AS m0,
             CAST(p.a + p.c AS DOUBLE) AS n1,
             CAST(p.a + p.b + p.c + p.d AS DOUBLE) AS nt
      FROM per_s p CROSS JOIN mh),
    ev AS (
      SELECT *,
             CASE WHEN ABS(orm - 1.0) < 1e-12 THEN m1 * n1 / nt
                  ELSE (orm * (m1 + n1) + (m0 - n1)
                        - SQRT((orm * (m1 + n1) + (m0 - n1))
                               * (orm * (m1 + n1) + (m0 - n1))
                               - 4.0 * (orm - 1.0) * orm * m1 * n1))
                       / (2.0 * (orm - 1.0)) END AS e_a,
             a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0
               AND s > 0 AND r > 0 AS usable
      FROM j),
    terms AS (
      SELECT n, n_strata, orm, usable,
             (CAST(a AS DOUBLE) - e_a) * (CAST(a AS DOUBLE) - e_a)
             * (1.0 / e_a + 1.0 / (m1 - e_a) + 1.0 / (n1 - e_a)
                + 1.0 / (m0 - n1 + e_a)) AS term
      FROM ev),
    ag AS (
      SELECT MAX(n) AS n, MAX(n_strata) AS n_strata,
             CAST(SUM(CASE WHEN usable THEN 1 ELSE 0 END) AS BIGINT)
               AS n_used,
             MAX(CASE WHEN s > 0 THEN orm END) AS orm,
             SUM(CASE WHEN usable THEN term END) AS bd
      FROM (SELECT t.*, e2.s FROM terms t
            CROSS JOIN (SELECT MAX(s) AS s FROM mh) e2))
    SELECT CAST(n AS BIGINT) AS n, CAST(n_strata AS BIGINT) AS n_strata,
           n_used,
           ROUND(orm, 6) AS or_mh,
           ROUND(CASE WHEN n_used >= 2 THEN bd END, 6) AS bd_stat,
           CASE WHEN n_used >= 2 THEN CAST(n_used - 1 AS BIGINT) END
             AS dof
    FROM ag
    """,
    doc="Breslow-Day homogeneity of the (high priority -> high value) "
    "odds ratio across order YEARS "
    "(operators/relational.py:breslow_day) — "
    "mantel_haenszel_priority's mandatory companion on the SAME "
    "cells: the pooled or_mh is only meaningful if stratum ORs are "
    "homogeneous, and BD chi2(strata-1) tests exactly that via the "
    "quadratic-root expected a-cell under the common OR. Exact "
    "integer cells, libm-free (sqrt only), degenerate strata drop "
    "from fold AND df on both engines",
)
def breslow_day_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import breslow_day

    orders = load(spark, sf_dir, "orders")
    df = orders.select(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("e"),
        (F.col("o_totalprice") > 250000).alias("o"),
    )
    return breslow_day(df, ["yr"], "e", "o")


@_q(
    "tvd_value_drift",
    """
    WITH base AS (
      SELECT CAST(isodow(ts) - 1 AS BIGINT) AS wd, value AS v,
             (event_type = 'click') AS isa
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
    per_v AS (
      SELECT wd, v,
             CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS cb
      FROM base GROUP BY wd, v),
    c AS (
      SELECT wd, ca, cb,
             SUM(ca) OVER (PARTITION BY wd) AS na,
             SUM(cb) OVER (PARTITION BY wd) AS nb
      FROM per_v),
    ag AS (
      SELECT wd, CAST(MAX(na) AS BIGINT) AS n_a,
             CAST(MAX(nb) AS BIGINT) AS n_b,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             SUM(ABS(ca::HUGEINT * nb - cb::HUGEINT * na)) AS s
      FROM c GROUP BY wd)
    SELECT wd AS weekday, n_a, n_b, n_values,
           ROUND(CASE WHEN n_a > 0 AND n_b > 0 THEN
             CAST(CAST(s AS VARCHAR) AS DOUBLE)
             / (2.0 * CAST(n_a AS DOUBLE) * n_b) END, 6) AS tvd
    FROM ag ORDER BY weekday
    """,
    doc="Total variation distance between click and view value "
    "distributions per weekday "
    "(operators/relational.py:tvd_two_sample) — the bluntest drift "
    "number over the cvm_value_drift framing: TVD IS the largest "
    "probability mass any event can disagree on, the number a "
    "drift SLO is written against directly. Exact integer cells, "
    "DECIMAL cross-product numerators, ONE double division per "
    "group",
)
def tvd_value_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import tvd_two_sample

    ev = load_events(spark, sf_dir)
    base = ev.select(
        F.weekday("ts").cast("long").alias("weekday"),
        "value",
        "event_type",
    )
    return tvd_two_sample(
        base, ["weekday"], "value", "event_type", "click", "view"
    )


@_q(
    "feature_screen_orders",
    """
    WITH melted AS (
      SELECT 'o_orderpriority' AS feature,
             CAST(o_orderpriority AS VARCHAR) AS value,
             CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END AS y
      FROM orders WHERE o_totalprice IS NOT NULL
        AND o_orderpriority IS NOT NULL
      UNION ALL
      SELECT 'o_orderstatus',
             CAST(o_orderstatus AS VARCHAR),
             CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END
      FROM orders WHERE o_totalprice IS NOT NULL
        AND o_orderstatus IS NOT NULL
      UNION ALL
      SELECT 'order_year',
             CAST(EXTRACT(YEAR FROM o_orderdate) AS VARCHAR),
             CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END
      FROM orders WHERE o_totalprice IS NOT NULL
        AND o_orderdate IS NOT NULL),
    cells AS (
      SELECT feature, value,
             CAST(COUNT(*) AS BIGINT) AS nv,
             CAST(SUM(y) AS BIGINT) AS pv
      FROM melted GROUP BY 1, 2),
    folds AS (
      SELECT feature,
             CAST(SUM(nv) AS BIGINT) AS n,
             CAST(SUM(pv) AS BIGINT) AS pos,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             SUM(CAST(nv AS DOUBLE) * (
               -(CASE WHEN pv > 0 AND pv < nv THEN
                   (CAST(pv AS DOUBLE) / nv)
                   * LN(CAST(pv AS DOUBLE) / nv) / 0.6931471805599453
                 ELSE 0.0 END
                 + CASE WHEN pv > 0 AND pv < nv THEN
                   (1.0 - CAST(pv AS DOUBLE) / nv)
                   * LN(1.0 - CAST(pv AS DOUBLE) / nv)
                   / 0.6931471805599453
                 ELSE 0.0 END))) AS hc,
             SUM(CAST(nv AS DOUBLE) * 2.0 * (CAST(pv AS DOUBLE) / nv)
                 * (1.0 - CAST(pv AS DOUBLE) / nv)) AS gc
      FROM cells GROUP BY 1),
    lab AS (
      SELECT feature, n, n_values, hc, gc,
             CAST(pos AS DOUBLE) / n AS p,
             pos > 0 AND pos < n AS ok
      FROM folds),
    fin AS (
      SELECT feature, n, n_values, hc, gc, ok,
             -(CASE WHEN ok THEN p * LN(p) / 0.6931471805599453
               ELSE 0.0 END
               + CASE WHEN ok THEN
                 (1.0 - p) * LN(1.0 - p) / 0.6931471805599453
               ELSE 0.0 END) AS hl,
             2.0 * p * (1.0 - p) AS gl
      FROM lab)
    SELECT feature, n, n_values,
           ROUND(hl, 6) AS h_label,
           ROUND(CASE WHEN ok THEN hl - hc / n END, 6) AS info_gain,
           ROUND(CASE WHEN ok THEN gl - gc / n END, 6) AS gini_drop
    FROM fin ORDER BY feature
    """,
    doc="Categorical-feature screening of (priority, status, order "
    "year) against the high-value-order label "
    "(operators/classify.py:feature_screening) — one-pass triage "
    "BEFORE any model: information gain and Gini impurity drop per "
    "feature rank which columns deserve a decision_stump/woe_iv "
    "look. A literal stack melt means the fact is scanned ONCE for "
    "all features; exact integer cells, entropy-family ln/ln2 "
    "discipline",
)
def feature_screen_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import feature_screening

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    df = orders.select(
        "o_orderpriority",
        "o_orderstatus",
        F.year("o_orderdate").alias("order_year"),
        (F.col("o_totalprice") > 250000).alias("high_value"),
    )
    return feature_screening(
        df,
        ["o_orderpriority", "o_orderstatus", "order_year"],
        "high_value",
    )
