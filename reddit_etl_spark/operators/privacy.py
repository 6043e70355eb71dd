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

from pyspark.sql import DataFrame
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
