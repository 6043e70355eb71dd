"""Hierarchy operators over the flat comment tree.

The reference flattens the comment tree at extraction but keeps
``parent_id`` (script.py:176), so the hierarchy is recoverable —
these operators recover it at scale.

``with_depth`` uses pointer doubling: each round joins every node's
current ancestor to THAT node's ancestor, doubling the resolved
distance — O(log depth) self-joins instead of O(depth). Real comment
trees have depth <= ~50, so 6 rounds close them; each round is one
equi-join Catalyst plans freely (AQE picks broadcast when the
frontier shrinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_depth(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
    root_prefix: str = "t3_",
    max_rounds: int = 6,
) -> DataFrame:
    """Annotate each comment with its tree depth (top-level = 0).

    ``parent_id`` uses the reference's reddit convention: ``t3_<post>``
    marks a top-level comment, ``t1_<comment>`` a reply. Chains broken
    by a missing parent (partially extracted trees) terminate at the
    break — the hops to it still count. Chains deeper than
    2^max_rounds stay unresolved and get depth NULL.
    """
    # state: (id, ancestor, steps) — ancestor is the t1_-stripped
    # parent comment id; NULL ancestor means the chain reached a root.
    state = df.select(
        F.col(id_col).alias("__id"),
        F.when(
            F.col(parent_col).startswith(root_prefix), F.lit(None)
        ).otherwise(F.regexp_replace(parent_col, r"^t1_", "")).alias("__anc"),
        F.when(F.col(parent_col).startswith(root_prefix), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("__steps"),
    )
    for _ in range(max_rounds):
        hop = state.select(
            F.col("__id").alias("__hid"),
            F.col("__anc").alias("__hanc"),
            F.col("__steps").alias("__hsteps"),
        )
        state = (
            state.join(hop, state["__anc"] == hop["__hid"], "left")
            .select(
                "__id",
                F.when(F.col("__anc").isNull(), F.lit(None))
                .otherwise(F.col("__hanc"))
                .alias("__anc"),
                F.when(F.col("__anc").isNull(), F.col("__steps"))
                .otherwise(F.col("__steps") + F.coalesce("__hsteps", F.lit(0)))
                .alias("__steps"),
            )
        )
    depth = F.when(F.col("__anc").isNull(), F.col("__steps"))
    return df.join(
        state.select(
            F.col("__id").alias(id_col), depth.alias("depth")
        ),
        id_col,
    )


def subtree_sizes(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_id",
) -> DataFrame:
    """Direct-reply count per comment (1-level subtree size) — the
    flat-table aggregation the hierarchy supports without recursion."""
    replies = df.select(
        F.regexp_replace(parent_col, r"^t1_", "").alias(id_col)
    ).groupBy(id_col).agg(F.count("*").alias("direct_replies"))
    return df.join(replies, id_col, "left").fillna(
        {"direct_replies": 0}
    )
