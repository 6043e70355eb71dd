"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting handles most sort-merge skew at runtime;
these operators cover the cases AQE cannot:

- ``salted_join``: a hot-key 1:N join where ONE side has pathological
  key concentration (the web-scale "null key / default key / celebrity
  key" problem). The skewed side gets a random salt in [0, salt);
  the other side replicates each row ``salt`` times. The hot key's
  rows then spread over ``salt`` reducers instead of one straggler.
- ``salted_count_distinct``: COUNT(DISTINCT x) BY key with a hot key —
  two-phase: distinct on (key, salt-free x) first (spreads by x),
  then count per key. Exact, no single-reducer bottleneck.

Both are pure DataFrame compositions — no partitioner APIs — so they
survive AQE re-planning and work identically on any cluster size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side,
    replicate ``other`` per salt value, join on (keys + salt).

    Replication multiplies ``other``'s shuffle volume by ``salt`` —
    the right trade when ``other`` is the smaller side but too big to
    broadcast and the skewed side has straggler keys. Result equals
    the plain join exactly (salt columns are internal).

    Only ``inner``/``left``(-outer) are supported: a right/full outer
    would emit each unmatched ``other`` row once per salt replica."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got how={how!r}"
        )
    keys = list(on)
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=0) * salt).cast("int")
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted.join(replicated, [*keys, "__salt"], how).drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    alias: str = "distinct_count",
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per group without funneling
    each group through one reducer: phase 1 dedups (group, value)
    pairs — partitioned by BOTH, so a hot group spreads across the
    cluster — phase 2 counts survivors per group (a partial-aggregated
    count, skew-free)."""
    return (
        df.select(*group_cols, distinct_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(distinct_col).alias(alias))
    )
