"""Connected components: fixpoint correctness on shapes that need
multiple propagation rounds, cluster survivor selection."""

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.graph import connected_components, dedup_survivors


def _components(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, "a", "b").collect()
    }


def test_chain_collapses_to_min(spark):
    # path 1-2-3-4-5-6: diameter 5 forces several propagation rounds
    got = _components(spark, [(i, i + 1) for i in range(1, 6)])
    assert got == {i: 1 for i in range(1, 7)}


def test_separate_components_stay_separate(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_edge_direction_is_ignored(spark):
    # same component regardless of which endpoint is src
    assert _components(spark, [(5, 1), (2, 5)]) == {1: 1, 2: 1, 5: 1}


def test_matches_union_find_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    nodes = {v for e in edges for v in e}
    expect = {}
    for v in nodes:
        root = find(v)
        expect[v] = min(u for u in nodes if find(u) == root)

    assert _components(spark, edges) == expect


def test_dedup_survivors_keeps_one_per_cluster(spark):
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    comps = connected_components(
        spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a long, b long"),
        "a", "b",
    )
    kept = sorted(
        r["doc_id"] for r in dedup_survivors(docs, comps, "doc_id").collect()
    )
    # 2,3 (dups of 1) and 8 (dup of 7) dropped; singletons kept
    assert kept == [0, 1, 4, 5, 6, 7, 9]
