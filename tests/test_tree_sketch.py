"""Tree-depth (vs a DuckDB recursive CTE) and sketch-operator tests."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.sketch import (
    approx_distinct,
    approx_quantiles,
    hll_merge_rollup,
    hll_rollup,
)
from reddit_etl_spark.operators.tree import subtree_sizes, with_depth


def test_with_depth_matches_recursive_cte(spark, comments):
    got = {
        r.id: r.depth
        for r in with_depth(comments, "id", "parent_id").collect()
    }
    con = duckdb.connect()
    con.register("comments", comments.select("id", "parent_id").toPandas())
    want = dict(
        con.execute(
            """
            WITH RECURSIVE d AS (
              SELECT id, 0 AS depth FROM comments
              WHERE parent_id LIKE 't3_%'
              UNION ALL
              SELECT c.id, d.depth + 1 FROM comments c
              JOIN d ON c.parent_id = 't1_' || d.id
            )
            SELECT id, depth FROM d
            """
        ).fetchall()
    )
    assert len(got) == comments.count()
    for cid, depth in want.items():
        assert got[cid] == depth, cid


def test_with_depth_deep_chain(spark):
    # a 40-deep chain closes within 6 doubling rounds (2^6 = 64)
    rows = [("c0", "t3_post")] + [
        (f"c{i}", f"t1_c{i - 1}") for i in range(1, 40)
    ]
    df = spark.createDataFrame(rows, "id string, parent_id string")
    got = {r.id: r.depth for r in with_depth(df).collect()}
    assert got == {f"c{i}": i for i in range(40)}


def test_subtree_sizes(spark):
    df = spark.createDataFrame(
        [("a", "t3_p"), ("b", "t1_a"), ("c", "t1_a"), ("d", "t1_b")],
        "id string, parent_id string",
    )
    got = {r.id: r.direct_replies for r in subtree_sizes(df).collect()}
    assert got == {"a": 2, "b": 1, "c": 0, "d": 0}


# --- sketches --------------------------------------------------------------


@pytest.fixture(scope="module")
def keyed(spark):
    df = spark.range(0, 50_000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 7).alias("sub"),
        (F.col("id") % 997).alias("x"),
        F.col("id").cast("double").alias("v"),
    )
    df.persist()
    df.count()
    return df


def test_hll_rollup_estimate_within_tolerance(keyed):
    got = {r.g: r.distinct_estimate for r in hll_rollup(keyed, ["g"], "x").collect()}
    want = {
        r.g: r.dc
        for r in keyed.groupBy("g").agg(F.countDistinct("x").alias("dc")).collect()
    }
    for g, est in got.items():
        assert abs(est - want[g]) / want[g] < 0.05


def test_hll_merge_matches_direct_rollup(keyed):
    # fine sketches (g, sub) merged up to g ~= direct sketch at g
    fine = hll_rollup(keyed, ["g", "sub"], "x")
    merged = {
        r.g: r.distinct_estimate
        for r in hll_merge_rollup(fine, ["g"]).collect()
    }
    direct = {
        r.g: r.distinct_estimate for r in hll_rollup(keyed, ["g"], "x").collect()
    }
    # sketch union is deterministic: merged estimate == direct estimate
    assert merged == direct


def test_approx_distinct_tolerance(keyed):
    got = {r.g: r.approx_distinct for r in approx_distinct(keyed, ["g"], "x").collect()}
    want = {
        r.g: r.dc
        for r in keyed.groupBy("g").agg(F.countDistinct("x").alias("dc")).collect()
    }
    for g in want:
        assert abs(got[g] - want[g]) / want[g] < 0.1


def test_approx_quantiles_ordering(keyed):
    rows = approx_quantiles(keyed, ["g"], "v").collect()
    for r in rows:
        assert r.p50 <= r.p90 <= r.p99


def test_kll_rollup_merge_matches_exact_ranks(spark):
    """Merged-from-daily KLL quantiles must sit at the right EXACT
    rank (±5%; k=200 gives ~1.65% rank error) — and merging must not
    need the raw data again."""
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.sketch import kll_merge_rollup, kll_rollup

    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 7).alias("day"),
        (F.pow(F.col("id") % 1000, 1.3)).alias("v"),
    )
    fine = kll_rollup(df, ["g", "day"], "v")
    assert fine.count() == 28  # 4 x 7 (coprime) fine groups
    merged = kll_merge_rollup(fine, ["g"], probabilities=(0.5, 0.9))
    est = {r.g: (r.p50_est, r.p90_est) for r in merged.collect()}
    for g in range(4):
        vals = sorted(
            r.v for r in df.filter(F.col("g") == g).select("v").collect()
        )
        for p, e in zip((0.5, 0.9), est[g]):
            rank = sum(1 for v in vals if v <= e) / len(vals)
            assert abs(rank - p) <= 0.05, (g, p, e, rank)


def test_theta_overlap_set_algebra(spark):
    """Theta intersection/union/difference estimates vs planted exact
    overlap (sketches are exact below lg_k capacity here)."""
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.sketch import theta_overlap

    # A = 0..599, B = 400..899 -> |A|=600 |B|=500 |A∩B|=200 |A∪B|=900
    rows = [("a", i) for i in range(600)] + [("b", i) for i in range(400, 900)]
    df = spark.createDataFrame(rows, "seg string, uid long")
    r = theta_overlap(df, "seg", "uid", "a", "b").first()
    assert abs(r.a_est - 600) <= 600 * 0.05
    assert abs(r.b_est - 500) <= 500 * 0.05
    assert abs(r.intersection_est - 200) <= 200 * 0.1
    assert abs(r.union_est - 900) <= 900 * 0.05
    assert abs(r.a_minus_b_est - 400) <= 400 * 0.1


def test_mg_heavy_hitters_guarantee(spark):
    """Every value with true frequency > N/(capacity+1) must appear in
    the merged MG output with est <= true <= est + N/(capacity+1) —
    the mergeable-summaries contract, on a skewed planted stream."""
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.sketch import freq_items_mg

    # 10k rows: 'a' 40%, 'b' 25%, 'c' 10%, 200 rare values share 25%
    rows = (
        [("a",)] * 4000
        + [("b",)] * 2500
        + [("c",)] * 1000
        + [(f"r{i % 200}",) for i in range(2500)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    n = len(rows)
    cap = 5
    out = {r.v: r.est_count for r in freq_items_mg(df, "v", cap).collect()}
    assert len(out) <= cap
    true = {"a": 4000, "b": 2500, "c": 1000}
    bound = n / (cap + 1)
    for v, t in true.items():
        if t > bound:  # a and b are guaranteed; c (10%) is not
            assert v in out, (v, out)
        if v in out:
            assert out[v] <= t
            assert t - out[v] <= bound, (v, t, out[v], bound)


def test_mg_exact_when_under_capacity(spark):
    """Fewer distinct values than capacity -> MG degenerates to exact
    counts (no decrements ever fire)."""
    from reddit_etl_spark.operators.sketch import freq_items_mg

    rows = [("x",)] * 30 + [("y",)] * 20 + [("z",)] * 10
    df = spark.createDataFrame(rows, "v string").repartition(4)
    out = {r.v: r.est_count for r in freq_items_mg(df, "v", 8).collect()}
    assert out == {"x": 30, "y": 20, "z": 10}


class TestCountMinSketch:
    def test_never_undercounts_and_exact_when_wide(self, spark):
        from reddit_etl_spark.operators.sketch import (
            count_min_lookup,
            count_min_sketch,
        )

        items = [(f"w{i % 7}",) for i in range(70)]
        df = spark.createDataFrame(items, "t string")
        # width >> distinct items: no collisions possible per row,
        # estimates are exact
        sk = count_min_sketch(df, "t", depth=4, width=4096)
        q = spark.createDataFrame([(f"w{i}",) for i in range(7)], "t string")
        got = {r["t"]: r["est"] for r in count_min_lookup(sk, q, "t", 4, 4096).collect()}
        assert got == {f"w{i}": 10 for i in range(7)}
        # narrow width may collide but NEVER undercounts
        sk2 = count_min_sketch(df, "t", depth=2, width=4)
        got2 = {r["t"]: r["est"] for r in count_min_lookup(sk2, q, "t", 2, 4).collect()}
        assert all(v >= 10 for v in got2.values())

    def test_mergeable_grids_add_cellwise(self, spark):
        from pyspark.sql import functions as F

        from reddit_etl_spark.operators.sketch import count_min_sketch

        a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "t string")
        b = spark.createDataFrame([("x",)] * 4 + [("z",)] * 1, "t string")
        whole = a.unionByName(b)
        merged = (
            count_min_sketch(a, "t", 3, 64)
            .unionByName(count_min_sketch(b, "t", 3, 64))
            .groupBy("r", "b")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        direct = count_min_sketch(whole, "t", 3, 64)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_absent_item_estimates_zero_and_nulls_excluded(self, spark):
        from reddit_etl_spark.operators.sketch import (
            count_min_lookup,
            count_min_sketch,
        )

        df = spark.createDataFrame([("x",), (None,)], "t string")
        sk = count_min_sketch(df, "t", depth=4, width=4096)
        q = spark.createDataFrame([("nope",)], "t string")
        got = count_min_lookup(sk, q, "t", 4, 4096).collect()
        assert got[0]["est"] == 0

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from reddit_etl_spark.operators.sketch import count_min_sketch

        df = spark.createDataFrame([("x",)], "t string")
        with _pytest.raises(ValueError):
            count_min_sketch(df, "t", depth=0)
        with _pytest.raises(ValueError):
            count_min_sketch(df, "t", width=0)
