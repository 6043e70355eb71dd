"""Privacy risk auditing: k-anonymity and l-diversity over
quasi-identifier groups.

A training-data/analytics pipeline that ships derived datasets needs
to MEASURE re-identification risk before release: a row is k-anonymous
when at least k-1 other rows share its quasi-identifier (QI)
combination (Sweeney 2002), and a QI group is l-diverse when it
contains at least l distinct sensitive values (Machanavajjhala 2007 —
k-anonymity alone leaks when a group's sensitive attribute is
constant). This module is the measurement rung next to the curation
family's PII redaction: redact detects direct identifiers; this
audits the INDIRECT ones left behind.

Exactness: everything is counts over exact groupings — no floats
until the final at-risk percentage, which divides two exact BIGINTs
once (round-6).

Scale: one QI groupBy over the fact (map-side combined) produces the
group-size/diversity frame — |QI-combinations| rows; every readout
after that is group-frame-sized. The thresholds parameter is a tiny
literal frame. No reference counterpart; extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    thresholds: Sequence[int] = (2, 5, 10),
) -> DataFrame:
    """Risk report for releasing ``df`` keyed by the ``qi_cols``
    quasi-identifiers with ``sensitive_col`` as the protected
    attribute.

    Per threshold k: how many QI groups (and rows, and what share of
    rows) fall below k — i.e. would violate k-anonymity — and how
    many groups are sensitive-constant (l = 1, the homogeneity
    attack l-diversity exists to catch). Global min group size
    (the dataset's actual k) and min l ride every row.

    Rows with NULL in any QI column form their own NULL-keyed groups
    (NULL is a value an attacker can observe); NULL sensitive values
    count as one distinct value.

    Returns per threshold: (k_threshold BIGINT, n_groups BIGINT,
    violating_groups BIGINT, violating_rows BIGINT, pct_rows_at_risk,
    homogeneous_groups BIGINT, min_group_size BIGINT, min_l BIGINT),
    ordered by k_threshold.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    ks = sorted(set(int(k) for k in thresholds))
    if not ks or ks[0] < 1:
        raise ValueError("thresholds must be positive integers")
    s = F.col(sensitive_col)
    groups = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count("*").cast("long").alias("__n"),
        # COUNT DISTINCT ignores NULL on every engine; NULL is still
        # an observable sensitive value, so add it back explicitly
        (
            F.count_distinct(s)
            + F.max(F.when(s.isNull(), 1).otherwise(0))
        )
        .cast("long")
        .alias("__l"),
    )
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(int(k),) for k in ks], schema="k_threshold long"
    )
    # the THRESHOLD frame broadcasts (a handful of rows); the group
    # frame can be |QI-combinations|-sized and stays put
    joined = groups.select("__n", "__l").crossJoin(F.broadcast(thr))
    return (
        joined.groupBy("k_threshold")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum(F.when(F.col("__n") < F.col("k_threshold"), 1).otherwise(0))
            .cast("long")
            .alias("violating_groups"),
            F.sum(
                F.when(F.col("__n") < F.col("k_threshold"), F.col("__n"))
                .otherwise(0)
            )
            .cast("long")
            .alias("violating_rows"),
            F.round(
                F.sum(
                    F.when(
                        F.col("__n") < F.col("k_threshold"), F.col("__n")
                    ).otherwise(0)
                )
                / F.sum("__n"),
                6,
            ).alias("pct_rows_at_risk"),
            F.sum(F.when(F.col("__l") <= 1, 1).otherwise(0))
            .cast("long")
            .alias("homogeneous_groups"),
            F.min("__n").cast("long").alias("min_group_size"),
            F.min("__l").cast("long").alias("min_l"),
        )
        .orderBy("k_threshold")
    )


def t_closeness_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    thresholds_permille: Sequence[int] = (150, 200, 300),
) -> DataFrame:
    """t-closeness audit (Li/Li/Venkatasubramanian 2007) — the rung
    ABOVE k-anonymity/l-diversity: a QI group can be large (k ok) and
    diverse (l ok) yet still leak because its sensitive DISTRIBUTION
    differs from the table's (a group that is 90% '1-URGENT' tells an
    attacker plenty even with all 5 values present). A group is
    t-close when the Earth Mover's Distance between its sensitive
    distribution and the global one is <= t.

    EMD over the ORDERED sensitive domain has the closed form
    t = (1/(m-1)) * sum_{i<m} |r_i| with r_i the cumulative
    difference of the two distributions at the i-th ordered value.
    Exactness: r_i scales to the integer c_i*N - C_i*n_g (group count
    x global total minus global count x group total) accumulated in
    DECIMAL(38,0) — n*N passes int64 at 100 TB — so the threshold
    test cross-multiplies to exact integers
    (sum|r| * 1000 > thr_permille * n_g * N * (m-1)); floats appear
    only in the reported max_t / pct columns. Rows with a NULL
    sensitive value are EXCLUDED (an ordered axis has no place for
    them — and Spark sorts NULL first where DuckDB sorts it last).

    Plan: one (QI, s) groupBy (map-side combined) -> a
    |groups| x m dense frame via a broadcast of the m-row global
    distribution -> one cumulative window per group ordered by the
    sensitive rank. Cost is the textbook |groups| * m, with m the
    (categorical) sensitive cardinality. Output one row per
    threshold, k_anonymity_report-shaped.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    ths = sorted(set(int(t) for t in thresholds_permille))
    if not ths or ths[0] <= 0:
        raise ValueError("thresholds_permille must be positive")
    d38 = "decimal(38,0)"
    base = df.filter(F.col(sensitive_col).isNotNull())
    gv = base.groupBy(*qi_cols, sensitive_col).agg(
        F.count("*").cast("long").alias("__c")
    )
    groups = gv.groupBy(*qi_cols).agg(
        F.sum("__c").cast("long").alias("__ng")
    )
    glob = (
        base.groupBy(sensitive_col)
        .agg(F.count("*").cast("long").alias("__gc"))
        .withColumn(
            "__j",
            F.row_number().over(Window.orderBy(sensitive_col)),
        )
    )
    tot = glob.agg(
        F.sum("__gc").cast("long").alias("__N"),
        F.count("*").cast("long").alias("__m"),
    )
    dense = (
        groups.crossJoin(F.broadcast(glob))
        .join(gv, [*qi_cols, sensitive_col], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            *qi_cols,
            "__j",
            "__ng",
            "__N",
            "__m",
            (
                F.coalesce(F.col("__c"), F.lit(0)).cast(d38) * F.col("__N")
                - F.col("__gc").cast(d38) * F.col("__ng")
            ).alias("__d"),
        )
    )
    wcum = (
        Window.partitionBy(*qi_cols)
        .orderBy("__j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.withColumn("__r", F.sum("__d").over(wcum))
    per_group = (
        # m == 1 keeps its single (zero-difference) row so every
        # group still reports: a point-mass sensitive domain is
        # trivially t-close (t = 0), not "audit never ran"
        cum.filter((F.col("__j") < F.col("__m")) | (F.col("__m") == 1))
        .groupBy(*qi_cols)
        .agg(
            F.first("__ng").alias("__ng"),
            F.first("__N").alias("__N"),
            F.first("__m").alias("__m"),
            F.sum(F.abs(F.col("__r"))).cast(d38).alias("__emd"),
        )
        .withColumn(
            "__t",
            F.when(F.col("__m") > 1, F.round(
                F.col("__emd").cast("double")
                / (
                    F.col("__ng").cast("double")
                    * F.col("__N")
                    * (F.col("__m") - 1)
                ),
                6,
            )).otherwise(F.lit(0.0)),
        )
    )
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(int(t),) for t in ths], schema="t_permille long"
    )
    joined = per_group.crossJoin(F.broadcast(thr))
    viol = (
        F.col("__emd") * 1000
        > F.col("t_permille").cast(d38)
        * F.col("__ng")
        * F.col("__N")
        * (F.col("__m") - 1)
    ).cast("int")
    return (
        joined.groupBy("t_permille")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum(viol).cast("long").alias("violating_groups"),
            F.sum(F.col("__ng") * viol).cast("long").alias("violating_rows"),
            F.round(
                F.sum(F.col("__ng") * viol)
                / F.sum("__ng"),
                6,
            ).alias("pct_rows_at_risk"),
            F.round(F.max("__t"), 6).alias("max_t"),
        )
        .select(
            (F.col("t_permille") / F.lit(1000.0)).alias("t_threshold"),
            "n_groups",
            "violating_groups",
            "violating_rows",
            "pct_rows_at_risk",
            "max_t",
        )
        .orderBy("t_threshold")
    )


def l_diversity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    l_values: Sequence[int] = (2, 3, 5),
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the rung
    BETWEEN k-anonymity and t-closeness that this family lacked:
    k-anonymity counts group SIZE (a group of 50 that all share one
    diagnosis is k-safe and fully leaked), distinct l-diversity
    demands >= l DISTINCT sensitive values per QI group, and
    entropy l-diversity demands the stronger exp(H(group)) >= l (50
    values where one holds 96% of the mass barely beats distinct-l;
    entropy-l catches it).

    Per threshold l: groups passing distinct-l, groups passing
    entropy-l, their percentages, the worst (minimum) distinct count
    and minimum entropy-l over the table, and the size of the largest
    VIOLATING group under distinct-l (the headline risk number — how
    many people share the most-exposed equivalence class).

    Exactness: distinct counts are exact BIGINTs (one (QI, s)
    aggregate, never count_distinct over raw rows); the distinct-l
    verdict is pure integer compare. Entropy uses the same
    exact-count -> double ln discipline as entropy_event_hours
    (H = ln(n) - sum(c*ln(c))/n over exact integers; the ulps die at
    the round-6 report columns, and the entropy-l THRESHOLD compare
    uses exp-free cross-form H >= ln(l) with ln(l) injected as one
    Python literal per threshold — identical in both engines). NULL
    sensitive values are excluded (same rule and reason as
    t_closeness_report).

    Plan: one (QI, s) groupBy -> one QI rollup -> threshold rows via
    a tiny literal frame; k_anonymity_report-shaped output, one row
    per l.
    """
    import math  # noqa: PLC0415

    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    ls = sorted(set(int(v) for v in l_values))
    if not ls or ls[0] < 2:
        raise ValueError("l_values must all be >= 2")
    base = df.filter(F.col(sensitive_col).isNotNull())
    gv = base.groupBy(*qi_cols, sensitive_col).agg(
        F.count("*").cast("long").alias("__c")
    )
    groups = gv.groupBy(*qi_cols).agg(
        F.sum("__c").cast("long").alias("__ng"),
        F.count("*").cast("long").alias("__distinct"),
        # H = ln(n) - sum(c ln c)/n, over exact integers
        F.sum(F.col("__c").cast("double") * F.log(F.col("__c"))).alias(
            "__clnc"
        ),
    ).withColumn(
        "__H",
        F.log(F.col("__ng")) - F.col("__clnc") / F.col("__ng"),
    )
    rows = []
    for lv in ls:
        ln_l = math.log(lv)
        agg = groups.agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum((F.col("__distinct") >= lv).cast("long")).alias(
                "groups_distinct_l"
            ),
            F.sum((F.col("__H") >= F.lit(ln_l)).cast("long")).alias(
                "groups_entropy_l"
            ),
            F.min("__distinct").alias("min_distinct"),
            F.round(F.exp(F.min("__H")), 6).alias("min_entropy_l"),
            F.max(
                F.when(F.col("__distinct") < lv, F.col("__ng"))
            ).alias("largest_violating_group"),
        ).withColumn("l", F.lit(lv).cast("long"))
        rows.append(agg)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select(
        "l",
        "n_groups",
        "groups_distinct_l",
        "groups_entropy_l",
        F.round(
            F.col("groups_distinct_l") / F.col("n_groups"), 6
        ).alias("pct_distinct_l"),
        F.round(
            F.col("groups_entropy_l") / F.col("n_groups"), 6
        ).alias("pct_entropy_l"),
        "min_distinct",
        "min_entropy_l",
        "largest_violating_group",
    ).orderBy("l")
