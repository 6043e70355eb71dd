"""Distributed clustering TRAINING operators.

The engine already evaluates clusterings (embedding_silhouette) and
uses sampled centroids inside the ANN family (IVF coarse quantizer,
SemDeDup buckets); this module adds the training rung: Lloyd's
k-means as a deterministic, cross-engine-exact distributed loop.

Why integer-exact: a float k-means is bit-unstable across engines
and partitionings — centroid means drift by summation-order ulps,
and a point equidistant-by-ulps to two centroids flips its
assignment, which CASCADES through every later iteration (the same
failure class the repo's iterative graph family solved with scaled
BIGINT units; see graph.py pagerank). Here features are exact
integer units (the caller quantizes, e.g. cents), distances are
exact BIGINT squared-Euclidean, the argmin tie-breaks on centroid
id, and centroid updates are exact floor divisions sum(x) div n —
so every iteration's state is bit-identical on any engine, any
partitioning, any scale factor.

Scale design (the Lloyd loop IS the canonical distributed ML shape):
centroids are k tiny rows that live on the driver and BROADCAST each
iteration; the fact never moves — each iteration is one map-side
assignment (k comparisons per row against the broadcast list, no
join shuffle: the k-way argmin unrolls into a column expression) and
one map-side-combined groupBy producing k partial sums. Iterations
are a fixed count, not convergence-tested, so the plan depth is
bounded and cacheable. No reference counterpart (the reference has
no ML surface); extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    feature_cols: Sequence[str],
    k: int = 4,
    iterations: int = 3,
) -> DataFrame:
    """Fixed-iteration Lloyd k-means over exact-integer features.

    Features must already be integer-valued columns (quantize floats
    to units first — cents, scaled sizes); they are cast to BIGINT.
    Init is deterministic: the k rows with the smallest ``id_col``
    seed the centroids (documented, reproducible, and oracle-twin
    expressible — not kmeans++, whose RNG has no cross-engine twin).
    Each iteration assigns every point to the nearest centroid by
    exact squared-Euclidean distance (ties -> smallest centroid id)
    and recomputes each centroid as the exact floor-division mean of
    its members; a cluster that loses all members keeps its previous
    centroid (the standard keep-alive rule, deterministic).

    Driver state is k*(len(features)) BIGINTs per iteration — the
    only collect() in the loop is the k-row centroid frame.

    Returns the final assignment: (cluster BIGINT, n_points BIGINT,
    centroid_<f> BIGINT per feature) — one row per surviving
    cluster, exact integers end to end (no rounding anywhere).
    """
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    feats = list(feature_cols)
    if not feats:
        # no features -> no distance; fail loudly instead of building
        # an unparseable plan (empty argmin array / trailing-comma
        # centroid schema)
        raise ValueError("feature_cols must be non-empty")
    pts = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(f).cast("long").alias(f"__x{i}") for i, f in enumerate(feats)],
    ).filter(
        F.expr(
            " AND ".join(f"__x{i} IS NOT NULL" for i in range(len(feats)))
        )
    )
    seed_rows = (
        pts.orderBy("__id").limit(k).collect()
    )  # k rows — driver-bounded by parameter
    if not seed_rows:
        # zero usable rows: the empty clustering, with the output
        # schema intact (no centroids to seed from)
        spark = SparkSession.getActiveSession() or df.sparkSession
        return spark.createDataFrame(
            [],
            schema="cluster long, n_points long, "
            + ", ".join(f"centroid_{f} long" for f in feats),
        )
    cents: list[tuple[int, list[int]]] = [
        (ci, [int(r[f"__x{i}"]) for i in range(len(feats))])
        for ci, r in enumerate(seed_rows)
    ]

    def _assign_expr():
        # unrolled k-way argmin as ONE column expression: for each
        # point, the centroid with minimal exact distance, ties to the
        # smallest id — array of (dist, cid) structs, array_min picks
        # the lexicographic minimum exactly
        entries = []
        for ci, cv in cents:
            d = None
            for i, v in enumerate(cv):
                t = (F.col(f"__x{i}") - F.lit(v)) * (
                    F.col(f"__x{i}") - F.lit(v)
                )
                d = t if d is None else d + t
            entries.append(F.struct(d.alias("d"), F.lit(ci).alias("c")))
        return F.array_min(F.array(*entries))["c"]

    assigned = None
    for _ in range(iterations):
        assigned = pts.withColumn("__cl", _assign_expr())
        sums = (
            assigned.groupBy("__cl")
            .agg(
                F.count("*").alias("__n"),
                *[
                    F.sum(f"__x{i}").alias(f"__s{i}")
                    for i in range(len(feats))
                ],
            )
            .collect()
        )  # k rows — driver-bounded by parameter
        by_cl = {int(r["__cl"]): r for r in sums}
        new_cents = []
        for ci, old in cents:
            r = by_cl.get(ci)
            if r is None or int(r["__n"]) == 0:
                new_cents.append((ci, old))  # keep-alive
            else:
                n = int(r["__n"])
                # exact floor division; feature units are non-negative
                # in every caller, so // matches SQL's div
                new_cents.append(
                    (ci, [int(r[f"__s{i}"]) // n for i in range(len(feats))])
                )
        cents = new_cents

    final = pts.withColumn("__cl", _assign_expr())
    cent_df_rows = [(ci, *cv) for ci, cv in cents]
    spark = SparkSession.getActiveSession() or df.sparkSession
    cent_df = spark.createDataFrame(
        cent_df_rows,
        schema="__cl long, "
        + ", ".join(f"__c{i} long" for i in range(len(feats))),
    )
    out = (
        final.groupBy("__cl")
        .agg(F.count("*").cast("long").alias("n_points"))
        .join(F.broadcast(cent_df), "__cl")
        .select(
            F.col("__cl").cast("long").alias("cluster"),
            "n_points",
            *[
                F.col(f"__c{i}").alias(f"centroid_{feats[i]}")
                for i in range(len(feats))
            ],
        )
    )
    return out
