"""Connected components over a pair/edge list — turns near-duplicate
PAIRS (dedup.py emits pairs) into duplicate CLUSTERS, so "keep one doc
per cluster" is a groupBy(component) instead of ad-hoc pair chasing.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round, a node's label becomes the min of its own
and its neighbors' labels; converged when no label changes. Rounds
needed = graph diameter — for dedup graphs (tight clusters of copies,
diameter 2-4) that is a handful of rounds, NOT O(n).

Scale notes:
- Each round is one shuffle pair (join on node + min-aggregate); the
  shuffled payload is (node, label) longs only, never document data.
- Lineage is truncated with localCheckpoint every few rounds —
  unbounded iterative lineage is the classic Spark iterative-algorithm
  OOM/stack killer at scale.
- The convergence test (did any label change?) is a count on the
  propagation delta — one action per round, unavoidable for iterative
  fixpoints in Spark's model (Pregel does the same under the hood).
- For web-scale graphs with giant components / high-degree hubs, swap
  min-propagation for the large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond") —
  same join primitives, provably fewer rounds on skewed graphs. The
  dedup-cluster use case here never sees such components, so the
  simpler fixpoint wins.

No reference counterpart (the reference never clusters duplicates);
part of the training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable
    via undirected edges. Only nodes present in ``edges`` appear;
    singletons are trivially their own component and need no pass
    through the algorithm."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    und = und.persist()
    labels = labels.persist()
    for i in range(max_iter):
        # candidate label for b: current label of each neighbor a
        cand = und.join(
            labels, und["a"] == labels["node"], "inner"
        ).select(F.col("b").alias("node"), "component")
        new_labels = (
            labels.unionByName(cand)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "node")
            .filter(F.col("o.component") != F.col("n.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels


def dedup_survivors(
    docs: DataFrame,
    components: DataFrame,
    id_col: str,
) -> DataFrame:
    """Keep exactly one document per duplicate cluster (the min-id one,
    i.e. the component label itself) plus every unclustered singleton,
    via an anti-join against the non-survivor set.

    No broadcast hint: on a web-scale corpus 30-50% of documents are
    duplicates, so the loser set is O(corpus) — forcing a broadcast
    would OOM the driver. The anti-join shuffles only ids; AQE picks a
    broadcast automatically when the loser set IS small."""
    losers = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
