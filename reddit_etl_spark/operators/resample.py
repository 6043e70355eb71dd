"""Deterministic resampling inference: hash-seeded Poisson bootstrap
confidence intervals.

The engine's readouts report point estimates (means, shares, OLS
coefficients) and closed-form tests (Welch, MWU, KS, chi-square,
ANOVA); the bootstrap is the missing distribution-free inference rung
— a CI for ANY statistic without a variance formula. The classical
obstacle at scale is resampling-with-replacement (a global N-draw per
replicate); the standard scale-out answer is the POISSON bootstrap
(Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012): each row enters replicate b with weight ~ Poisson(1),
independently per (row, b) — one pass, no global coordination, and
for large n the replicate distribution converges to the classical
bootstrap's.

Determinism (the repo's cross-engine discipline): the Poisson draw is
NOT random — it is the inverse-CDF bucket of a uniform derived from
md5_60(row_id : b : salt), the same engine-portable hash idiom the
SimHash/winnowing/CMS oracles use. Both engines therefore draw the
IDENTICAL weight for every (row, replicate) pair: the whole CI is
value-checkable, not rows-only. Weights cap at 5 (P[X>5] ~ 1.4e-4 —
the truncation shifts replicate means by < 3e-5 relative and is
applied identically on both engines, so it is a documented estimator
choice, not a divergence).

Scale notes (100 TB):
- The fact explodes x B (replicate index 0..B-1) BEFORE a map-side
  combined groupBy, so the exchange carries (group, b) cells — B x
  |groups| rows — never the exploded fact. B is a bounded parameter
  (default 64).
- Replicate means use exact DECIMAL weighted sums over
  integer-quantized values with ONE double division, so each
  replicate estimate is partitioning/engine-exact; the CI rank
  selection orders by (round6 mean, b) — fully deterministic.
- No reference counterpart (script.py has no inference surface);
  extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: inverse-CDF thresholds for Poisson(1) on a uniform integer in
#: [0, 1e9): floor(CDF(k) * 1e9). Hard constants so both engines
#: bucket identically; cumulative pmf e^-1 * sum 1/k!.
_POISSON1_THRESHOLDS = (
    367879441,  # P[X=0]
    735758882,  # P[X<=1]
    919698602,  # P[X<=2]
    981011843,  # P[X<=3]
    996340153,  # P[X<=4]  (above: weight 5, the documented cap)
)
_UNIFORM_SPAN = 1_000_000_000


def poisson_weight_col(id_col, b_col, salt: str = "boot"):
    """Deterministic Poisson(1) weight for (row ``id_col``, replicate
    ``b_col``): md5_60 of 'id:b:salt' reduced mod 1e9, then the
    inverse-CDF bucket against the hard-coded thresholds. Pure
    column expression (codegen); DuckDB twin uses the identical
    md5-substring/threshold arithmetic."""
    from .dedup import token_hash_col

    idc = id_col if not isinstance(id_col, str) else F.col(id_col)
    bc = b_col if not isinstance(b_col, str) else F.col(b_col)
    # token_hash_col('md5_60') is THE canonical engine-portable hash
    # (curation.py:182) — one definition shared with SimHash /
    # winnowing / CMS so oracle parity cannot drift
    u = F.pmod(
        token_hash_col(
            F.concat_ws(
                ":", idc.cast("string"), bc.cast("string"), F.lit(salt)
            ),
            "md5_60",
        ),
        F.lit(_UNIFORM_SPAN),
    )
    w = F.lit(5)
    for k in range(len(_POISSON1_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < _POISSON1_THRESHOLDS[k], F.lit(k)).otherwise(w)
    return w


def poisson_bootstrap_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    replicates: int = 64,
    alpha: float = 0.1,
    salt: str = "boot",
) -> DataFrame:
    """Percentile-bootstrap CI for the per-group MEAN of
    ``value_col`` via ``replicates`` deterministic Poisson(1)
    resamples.

    Per replicate b: mean_b = sum(w*x) / sum(w) with w =
    ``poisson_weight_col`` — exact DECIMAL(18,6) weighted numerator,
    BIGINT denominator, one double division rounded to 6 (the
    stable_avg discipline). Replicates whose total weight is 0
    (P ~ e^-n, only tiny groups) are excluded identically on both
    engines. The CI is the percentile pair at ranks
    floor(alpha/2 * m) + 1 and m - floor(alpha/2 * m) over the m
    valid replicate means, ordered (mean, b) — integer rank math,
    no interpolation, engine-exact.

    Admission rule (shared with the streaming twin): rows with a
    NULL id or a value that does not TRY_CAST into DECIMAL(18,6)
    (NULL, NaN, +/-Inf, |value| >= 1e12) are excluded from counts,
    means, and resamples — identically under ANSI-on and ANSI-off.

    Returns per group: (group..., n_rows BIGINT, point_mean,
    n_replicates BIGINT, ci_lo, ci_hi); n_replicates is NULL when
    every replicate drew total weight 0 (possible only for tiny
    groups).
    """
    if replicates < 4:
        raise ValueError("replicates must be >= 4")
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    keys = list(group_cols)
    # admission rule, shared verbatim with the streaming twin: a row
    # participates iff its id is non-NULL (a hash-resample needs a
    # key) and its value TRY_CASTs into DECIMAL(18,6) — NULL, NaN,
    # +/-Inf and out-of-range values are excluded IDENTICALLY under
    # ANSI-on and ANSI-off sessions (a plain cast would throw on one
    # and NULL-poison counts on the other)
    xd = F.expr(f"try_cast({value_col} AS DECIMAL(18,6))")
    base = df.filter(
        F.col(id_col).isNotNull() & xd.isNotNull()
    ).select(
        *keys,
        F.col(id_col).alias("__id"),
        xd.alias("__x"),
    )
    point = base.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.round(
            F.sum("__x").cast("double") / F.count("*"), 6
        ).alias("point_mean"),
    )
    exploded = base.withColumn(
        "__b", F.explode(F.sequence(F.lit(0), F.lit(replicates - 1)))
    ).withColumn("__w", poisson_weight_col(F.col("__id"), F.col("__b"), salt))
    cells = (
        exploded.groupBy(*keys, "__b")
        .agg(
            F.sum(
                (F.col("__w").cast("decimal(18,6)") * F.col("__x")).cast(
                    "decimal(28,6)"
                )
            ).alias("__num"),
            F.sum("__w").cast("long").alias("__den"),
        )
        .filter(F.col("__den") > 0)
        .select(
            *keys,
            "__b",
            F.round(
                F.col("__num").cast("double") / F.col("__den"), 6
            ).alias("__mean_b"),
        )
    )
    w_rank = Window.partitionBy(*keys).orderBy("__mean_b", "__b")
    ranked = cells.select(
        *keys,
        "__mean_b",
        F.row_number().over(w_rank).alias("__rn"),
        F.count("*").over(Window.partitionBy(*keys)).alias("__m"),
    )
    lo_rank = F.floor(F.col("__m") * F.lit(alpha / 2.0)).cast("long") + 1
    hi_rank = F.col("__m") - F.floor(
        F.col("__m") * F.lit(alpha / 2.0)
    ).cast("long")
    ci = ranked.groupBy(*keys).agg(
        F.max("__m").cast("long").alias("n_replicates"),
        F.max(F.when(F.col("__rn") == lo_rank, F.col("__mean_b"))).alias(
            "ci_lo"
        ),
        F.max(F.when(F.col("__rn") == hi_rank, F.col("__mean_b"))).alias(
            "ci_hi"
        ),
    )
    # null-safe join: a NULL group key is a real category (groupBy
    # keeps it) and must carry its CI — plain key-list joins would
    # strand it with NULL n_replicates
    cond = None
    for k in keys:
        c = point[k].eqNullSafe(ci[k])
        cond = c if cond is None else cond & c
    return (
        point.join(ci, cond, "left")
        .select(
            *[point[k] for k in keys],
            "n_rows",
            "point_mean",
            "n_replicates",
            "ci_lo",
            "ci_hi",
        )
        .orderBy(*keys)
    )
