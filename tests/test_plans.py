"""Plan-shape tests — the 100 TB contract, asserted (SURVEY §4.2).

Each test pins a physical-plan property that must survive scale-up:
pushdown, pruning, broadcast choice, top-k strategy, shuffle counts.
A regression here is a performance bug even if results stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    uses_take_ordered,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def customer(spark):
    return spark.read.parquet(f"{SF_DIR}/customer.parquet")


def test_filter_pushed_to_scan(orders):
    df = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    pf = pushed_filters(df)
    assert any("o_orderstatus" in f for f in pf), pf


def test_column_pruning_reaches_scan(orders):
    df = orders.select("o_orderkey", "o_totalprice")
    cols = scan_columns(df)
    assert cols and set(cols[0]) == {"o_orderkey", "o_totalprice"}


def test_projection_only_filter_prunes(orders):
    # filter column must be read, but nothing else beyond the projection
    df = orders.filter(F.col("o_totalprice") > 100.0).select("o_orderkey")
    cols = scan_columns(df)
    assert cols and set(cols[0]) == {"o_orderkey", "o_totalprice"}


def test_small_dim_join_broadcasts(spark, customer, orders):
    # AQE should pick broadcast-hash for the small customer side
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    joined.collect()
    assert has_broadcast_join(joined)


def test_global_topk_avoids_full_sort(orders):
    df = orders.orderBy(F.desc("o_totalprice")).limit(10)
    assert uses_take_ordered(df)


def test_single_agg_is_one_shuffle(orders):
    df = orders.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    assert count_exchanges(df) == 1


def test_window_rewrite_single_shuffle(orders):
    # q02's argmax-per-group: the window rewrite must not add a second
    # exchange beyond the partitionBy shuffle
    from reddit_etl_spark.operators.relational import argmax_per_group

    df = argmax_per_group(orders, ["o_orderpriority"], "o_totalprice")
    assert count_exchanges(df) == 1


def test_transform_chain_adds_no_shuffle(spark, posts_raw):
    from reddit_etl_spark.transform import transform_posts

    assert count_exchanges(transform_posts(posts_raw)) == 0


def test_text_profile_is_narrow(spark):
    from reddit_etl_spark.operators.text import text_profile

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert count_exchanges(text_profile(docs, "doc_id", "text")) == 0


def test_shingle_arrays_prechkpt_shape(spark):
    """The shared shingling pass (PLANS.md footnote): scan pruned to
    (doc_id, text), exactly one exchange (fan_out's round-robin — the
    expensive shingle work must parallelize past the scan), and no
    join/agg before materialization."""
    from reddit_etl_spark.operators.dedup import shingle_arrays

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    arrays = shingle_arrays(docs, "doc_id", "text", 3, materialize=False)
    assert count_exchanges(arrays) == 1
    assert scan_columns(arrays) == [["doc_id", "text"]]


def test_ngram_jaccard_lazy_plan_is_three_shuffles(spark):
    """The no-max_df ngram path on an UNmaterialized arrays projection:
    co-occurrence join (2 exchanges) + pair agg reuses one of them —
    sizes ride the posting, so no post-hoc size joins appear. The
    fan_out exchanges of the two posting branches are the only others."""
    from unittest.mock import patch

    from reddit_etl_spark.operators import dedup as D

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # bypass the checkpoint so the WHOLE plan is inspectable
    with patch.object(
        D,
        "shingle_arrays",
        lambda df, idc, tc, n, materialize=True: D.fan_out(df).select(
            F.col(idc), D.hashed_shingles_col(tc, n).alias("__arr")
        ),
    ):
        pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    # no size joins: the only joins are the single shingle-equality
    # self-join; everything else is aggregation
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    # exchanges: 2 fan_out round-robins + 2 join-side hash exchanges +
    # 1 pair-agg exchange at most (AQE may reuse/elide some)
    assert count_exchanges(pairs) <= 5


def test_asof_join_single_exchange(spark):
    """The union+carry as-of plan: ONE hash exchange on the key for
    both directions (the claim in SCALING.md's per-operator table)."""
    import datetime as dt

    from reddit_etl_spark.operators.asof import asof_join

    t0 = dt.datetime(2025, 9, 1)
    left = spark.createDataFrame(
        [(1, "u", t0)], "id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", t0, 1.0)], "user string, ts timestamp, value double"
    )
    for direction in ("backward", "forward"):
        out = asof_join(
            left, right, on=["user"], left_ts="ts", right_ts="ts",
            value_cols=["value"], direction=direction,
        )
        assert count_exchanges(out) == 1, direction


def test_sessionize_single_exchange(spark):
    import datetime as dt

    from reddit_etl_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        [("u", dt.datetime(2025, 9, 1, 10, i)) for i in range(5)],
        "user string, ts timestamp",
    )
    assert count_exchanges(sessionize(df, ["user"], "ts")) == 1


def test_weighted_sample_global_is_take_ordered(spark):
    from reddit_etl_spark.operators.curation import weighted_sample

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("w")
    )
    out = weighted_sample(df, "id", "w", k=5)
    assert uses_take_ordered(out)  # no global sort for the top-k


def test_weighted_percentiles_single_pass_for_all_ps(spark):
    """All requested ps must ride ONE evaluation — the union-of-selects
    spelling re-scanned and re-shuffled the upstream once per p
    (review r6: 6 FileScans/9 exchanges for three quartiles)."""
    from reddit_etl_spark.operators.relational import weighted_percentiles

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
        (F.col("id") % 3 + 1).alias("w"),
    )
    out = weighted_percentiles(df, ["g"], "v", "w", ps=(0.25, 0.5, 0.75))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 0          # in-memory range source
    assert count_exchanges(out) <= 3
    # and on a real file source: one scan total, not one per p
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.lit("g").alias("g"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("w"),
    )
    out2 = weighted_percentiles(li, ["g"], "v", "w", ps=(0.25, 0.5, 0.75))
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("FileScan") == 1


def test_ks_two_sample_two_exchanges(spark):
    from reddit_etl_spark.operators.relational import ks_two_sample

    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 41).cast("double").alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("side"),
    )
    out = ks_two_sample(df, ["g"], "v", "side", "a", "b")
    assert count_exchanges(out) <= 2


def test_benford_scan_prunes_to_value_column(spark):
    from reddit_etl_spark.operators.dq import benford_digit_test

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price")
    )
    out = benford_digit_test(li, "price")
    cols = scan_columns(out)
    assert cols == [["l_extendedprice"]]


def test_tpch_q6_single_exchange_all_filters_pushed(spark):
    # Q6 is the pure scan-dominated classic: 3 conjunctive filters
    # must reach the parquet scan and the only exchange is the
    # single-row final reduce
    from reddit_etl_spark.harness import _REGISTRY

    df = _REGISTRY["tpch_q6_forecast_revenue"].builder(spark, SF_DIR)
    assert count_exchanges(df) == 1
    pf = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, (col, pf)


def test_tpch_q19_disjunction_splits_to_both_scans(spark):
    # the OR-of-conjunctions must derive PUSHED scan filters on BOTH
    # sides: quantity bounds on lineitem, brand/size disjuncts on the
    # broadcast part side — asserted against PushedFilters, not scan
    # column lists (which would match even with no pushdown at all)
    from reddit_etl_spark.harness import _REGISTRY

    df = _REGISTRY["tpch_q19_disjunctive_revenue"].builder(spark, SF_DIR)
    assert has_broadcast_join(df)
    pf = pushed_filters(df)
    assert any("l_quantity" in f for f in pf), ("lineitem quantity", pf)
    assert any("p_brand" in f for f in pf), ("part brand disjunct", pf)


def test_geofence_edges_broadcast_zero_fact_side_join_shuffle(spark):
    # the polygon edge literal must broadcast; the only exchange is
    # the partial-aggregated parity groupBy
    from reddit_etl_spark.operators.geo import point_in_polygon_join

    pts = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 100).alias("x"),
        (F.col("id") % 50).alias("y"),
    )
    out = point_in_polygon_join(
        pts, "id", "x", "y", [("sq", [(0, 0), (30, 0), (30, 30), (0, 30)])]
    )
    assert has_broadcast_join(out)
    assert count_exchanges(out) <= 1


def test_bootstrap_explode_never_shuffles_fact(spark):
    # the x64 explode must be map-side: the exchanges carry (group,
    # b) cells and group-frame joins, never the exploded fact. Bound:
    # point agg (1) + cell agg (1) + rank window (1) + ci agg (1) +
    # final join sides — all on frames <= groups x B rows.
    from reddit_etl_spark.operators.resample import poisson_bootstrap_ci

    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    out = poisson_bootstrap_ci(df, ["g"], "v", "rid", replicates=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the explode (Generate) must feed a map-side aggregate DIRECTLY:
    # the plan node immediately ABOVE the Generate line (its parent)
    # is a HashAggregate, never an Exchange — an Exchange there would
    # mean the raw exploded fact shuffles
    lines = plan.splitlines()
    gen_lines = [i for i, ln in enumerate(lines) if "Generate explode" in ln]
    assert gen_lines, plan
    for i in gen_lines:
        parent = next(
            ln for ln in reversed(lines[:i]) if ln.strip()
        )
        assert "Exchange" not in parent, (parent, lines[i])
        assert "HashAggregate" in parent or "Project" in parent, parent


def test_compaction_plan_input_is_metadata_sized(spark):
    # the planner runs on a per-file metadata frame: one ordered
    # window + one group aggregate; the single-partition window is
    # the documented listing-sized cost
    from reddit_etl_spark.operators.layout import compaction_plan

    files = spark.range(200).select(
        F.col("id").alias("fid"), (F.col("id") % 7 * 100 + 50).alias("sz")
    )
    out = compaction_plan(files, "sz", "fid", 500)
    assert count_exchanges(out) <= 3  # window sort + agg + final order


# ------------------------------------------------------ round-10 wave


def test_mattr_is_scan_fused(spark):
    """MATTR's contract is ZERO shuffles — tokens, sliding spans,
    distinct counts and the mean are array expressions fused into the
    scan; an Exchange appearing here means someone rewrote it through
    an explode+groupBy."""
    from reddit_etl_spark.operators.text import mattr

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert count_exchanges(mattr(docs, "doc_id", "text")) == 0


def test_diff_in_diff_is_one_aggregate(spark):
    """All four DiD cells ride ONE map-side-combined aggregate —
    exactly one shuffle (the group-key exchange), never four jobs."""
    from reddit_etl_spark.operators.relational import diff_in_diff

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type",
        (F.col("user_id") % 2 == 1).alias("t"),
        (F.col("user_id") % 3 == 0).alias("p"),
        "value",
    )
    df = diff_in_diff(ev, ["event_type"], "t", "p", "value")
    # the group-key aggregate exchange + the display orderBy's range
    # exchange over the group-cardinality result — nothing else
    assert count_exchanges(df) <= 2


def test_kendall_knight_lane_single_data_exchange(spark):
    """The Knight lane's only data-sized exchange is the hash
    partition into applyInPandas — the pair join's exchanges (and its
    quadratic output) must be absent from the plan."""
    from reddit_etl_spark.operators.series import kendall_tau

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "value", (F.col("user_id") % 100).alias("y")
    )
    knight = kendall_tau(ev, ["event_type"], "value", "y", pairs="knight")
    join_lane = kendall_tau(ev, ["event_type"], "value", "y", pairs="join")
    k_plan = knight._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in k_plan
    assert "SortMergeJoin" not in k_plan
    # and the join lane genuinely is the pair-join shape it claims
    j_plan = join_lane._jdf.queryExecution().executedPlan().toString()
    assert "Join" in j_plan


def test_pr_curve_single_aggregate_after_fan(spark):
    """The threshold fan-out is a literal-array explode feeding ONE
    map-side-combined aggregate — one exchange total."""
    from reddit_etl_spark.operators.classify import pr_curve

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        (F.col("value") / 500.0).alias("s"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    df = pr_curve(ev, [], "s", "y")
    # one exchange for the aggregate + the final sort's range exchange
    assert count_exchanges(df) <= 2


def test_roc_auc_no_row_level_rank(spark):
    """roc_auc's prefix window runs over the DISTINCT-score frame
    (post-aggregate), never a row-level rank over the fact — the
    mann_whitney reduced-frame discipline."""
    from reddit_etl_spark.operators.classify import roc_auc

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type",
        "value",
        (F.col("user_id") % 2 == 1).alias("y"),
    )
    df = roc_auc(ev, ["event_type"], "value", "y")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the window's child must be an Aggregate (the distinct-value
    # reduce), i.e. the plan reads ...Window <- Aggregate... not
    # Window directly over the scan
    i_win = plan.index("Window")
    assert "Aggregate" in plan[i_win:]


def test_decision_stump_top1_is_take_ordered(spark):
    """The argmax over candidates is a TakeOrderedAndProject — never
    a global sort materializing the full candidate frame."""
    from reddit_etl_spark.operators.classify import decision_stump

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "n_chars", (F.col("lang") == "en").alias("y")
    )
    df = decision_stump(docs, "n_chars", "y")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_jarque_bera_single_aggregate(spark):
    """All four power sums ride ONE map-side-combined aggregate —
    one group exchange plus the display sort, nothing else."""
    from reddit_etl_spark.operators.series import jarque_bera

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df = jarque_bera(ev, ["event_type"], "value")
    assert count_exchanges(df) <= 2


def test_theil_single_aggregate(spark):
    """The identities fold the mean out — ONE aggregate over the
    fact, no second scan / no join back."""
    from reddit_etl_spark.operators.relational import theil_index

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        (F.col("o_orderkey") % 7).alias("g"), "o_totalprice"
    )
    df = theil_index(orders, ["g"], "o_totalprice")
    assert count_exchanges(df) <= 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_jackknife_totals_broadcast(spark):
    """The 1-row totals frame joins back by broadcast — the fact is
    scanned once, and no shuffle join appears."""
    from reddit_etl_spark.operators.relational import jackknife_groups

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        (F.col("o_orderkey") % 7).alias("g"), "o_totalprice"
    )
    df = jackknife_groups(orders, "g", "o_totalprice")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_brown_forsythe_median_join_is_broadcast(spark):
    """The k-row median frame broadcasts back onto the per-value
    counts — never a shuffle join against the distinct frame."""
    from reddit_etl_spark.operators.relational import brown_forsythe

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df = brown_forsythe(ev.select("value", "event_type"), "value", "event_type")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hill_no_fact_sort(spark):
    """The top-k cut rides the distinct-value frame — no global sort
    or row-level rank of the fact; the only window input is the
    (group, value) aggregate."""
    from reddit_etl_spark.operators.relational import hill_tail_index

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderpriority", "o_totalprice"
    )
    df = hill_tail_index(
        orders, ["o_orderpriority"], "o_totalprice", k=200
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    i_win = plan.index("Window")
    assert "Aggregate" in plan[i_win:]


def test_friedman_midrank_window_is_block_partitioned(spark):
    """The within-block midrank window partitions BY BLOCK (k-bounded
    per partition) — never an unpartitioned window."""
    from reddit_etl_spark.operators.relational import friedman_test

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.to_date("ts").alias("b"), F.col("event_type").alias("t"),
        F.col("value").alias("v"),
    ).filter(F.col("v").isNotNull()).groupBy("b", "t").agg(
        F.round(F.avg("v"), 6).alias("v")
    )
    df = friedman_test(ev, "b", "t", "v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window nodes in the friedman plan"
    # every window spec partitions by the block column __b — an
    # unpartitioned spec would start with the frame definition instead
    assert all(s.lstrip().startswith("__b") for s in specs), specs


def test_cochran_q_single_aggregate(spark):
    """All Q inputs (per-rule counts, T, sum R^2) ride ONE
    map-side-combined aggregate."""
    from reddit_etl_spark.operators.classify import cochran_q

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "lang",
        (F.col("n_chars") >= 150).alias("r1"),
        (F.col("n_chars") >= 250).alias("r2"),
    )
    df = cochran_q(docs, ["lang"], ["r1", "r2"])
    assert count_exchanges(df) <= 2


def test_fightin_words_totals_broadcast(spark):
    """Token/group totals join back broadcast; the only shuffle-sized
    frame is the (source, token) aggregate."""
    from reddit_etl_spark.operators.text import fightin_words

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = fightin_words(docs, "source", "text", top_k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ad2_single_distinct_frame_window(spark):
    """AD's prefix window runs over the DISTINCT pooled-value frame
    (post-aggregate) — the mann_whitney discipline."""
    from reddit_etl_spark.operators.relational import (
        anderson_darling_two_sample,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "value", "event_type"
    )
    df = anderson_darling_two_sample(ev, "value", "event_type", "click")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    i_win = plan.index("Window")
    assert "Aggregate" in plan[i_win:]


def test_cem_single_fact_aggregate(spark):
    """CEM is ONE (strata, treatment) aggregate over the fact plus
    broadcast totals — no fact-sized second pass."""
    from reddit_etl_spark.operators.relational import cem_match

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        (F.col("o_orderpriority") == "1-URGENT").alias("t"),
        F.floor(F.col("o_totalprice") / 100000).alias("pb"),
    )
    df = cem_match(orders, "t", ["pb"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("FileScan") <= 1 or "InMemory" in plan


def test_pettitt_midrank_window_group_partitioned(spark):
    """Both pettitt windows partition by group — never an
    unpartitioned fact-sized window."""
    from reddit_etl_spark.operators.series import pettitt_test

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", F.to_date("ts").alias("d"), "value"
    ).groupBy("event_type", "d").agg(F.round(F.avg("value"), 6).alias("v"))
    df = pettitt_test(ev, ["event_type"], "d", "v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    assert all(s.lstrip().startswith("event_type") for s in specs), specs


def test_gopher_flags_zero_shuffles(spark):
    """Pure column expressions over one scan — the text_profile
    discipline."""
    from reddit_etl_spark.operators.curation import gopher_quality_flags

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert count_exchanges(
        gopher_quality_flags(docs, "doc_id", "text")
    ) == 0


def test_ess_single_aggregate(spark):
    from reddit_etl_spark.operators.curation import effective_sample_size

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source", F.col("n_chars").alias("w")
    )
    assert count_exchanges(
        effective_sample_size(docs, ["source"], "w")
    ) <= 2


def test_shapley_nothing_datasized_past_journeys(spark):
    """Past the journey aggregate everything is 2^k-sized and joins
    broadcast — no shuffle join appears downstream."""
    from reddit_etl_spark.operators.attribution import shapley_attribution

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", F.col("event_type").alias("channel"))
        .distinct()
        .withColumn("converted", F.col("user_id") % 3 == 0)
    )
    df = shapley_attribution(touches, "user_id", "channel", "converted")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------- round-11 wave


def test_youden_argmax_is_take_ordered(spark):
    """The J argmax is a TakeOrderedAndProject(1) over the reduced
    distinct-score frame — never a global sort materialization."""
    from reddit_etl_spark.operators.classify import youden_threshold

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "value", (F.col("event_type") == "purchase").alias("y")
    )
    df = youden_threshold(ev, "value", "y")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mantel_haenszel_single_aggregate(spark, orders):
    """ONE stratum aggregate + a 1-row fold — no join, no window."""
    from reddit_etl_spark.operators.relational import mantel_haenszel

    df = mantel_haenszel(
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("e"),
            (F.col("o_totalprice") > 250000).alias("o"),
        ),
        ["yr"],
        "e",
        "o",
    )
    assert count_exchanges(df) <= 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_cochran_armitage_single_aggregate(spark):
    from reddit_etl_spark.operators.relational import cochran_armitage

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_linenumber").alias("d"),
        (F.col("l_returnflag") == "R").alias("y"),
    )
    df = cochran_armitage(li, "d", "y")
    assert count_exchanges(df) <= 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_agreement_dispersion_brier_single_aggregate(spark):
    """The one-moment-aggregate family: no join, <= 2 exchanges."""
    from reddit_etl_spark.operators.relational import agreement_summary
    from reddit_etl_spark.operators.series import dispersion_index

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pair = ev.select(
        F.col("value").alias("x"), (F.col("value") * 1.1).alias("y")
    )
    assert count_exchanges(agreement_summary(pair, "x", "y")) <= 2
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("x")
    ).select(F.lit("g").alias("g"), "x")
    assert count_exchanges(dispersion_index(daily, ["g"], "x")) <= 3


def test_wilcoxon_window_over_aggregate(spark):
    """The signed-rank prefix window reads the DISTINCT-|d| aggregate
    (the mann_whitney reduced-frame discipline), never fact rows."""
    from reddit_etl_spark.operators.relational import wilcoxon_signed_rank

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("value").alias("x"), (F.col("value") * 1.01 + 1).alias("y")
    )
    df = wilcoxon_signed_rank(ev, "x", "y")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    i_win = plan.index("Window")
    assert "Aggregate" in plan[i_win:]


def test_jonckheere_grid_windows_partitioned(spark, orders):
    """Both grid windows are PARTITIONED (per class over values,
    per value over classes) — no unpartitioned spec anywhere."""
    import re

    from reddit_etl_spark.operators.relational import jonckheere_terpstra

    df = jonckheere_terpstra(
        orders.select("o_totalprice", "o_orderpriority"),
        "o_totalprice",
        "o_orderpriority",
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    assert all(s.lstrip().startswith("__") for s in specs), specs


def test_bowker_no_full_outer(spark):
    """One-sided pairs seat via broadcastable left + left-anti —
    never an unbroadcastable FullOuter (the srm_check lesson)."""
    from reddit_etl_spark.operators.classify import bowker_test

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("event_type").alias("ra"),
        F.concat(F.lit("x_"), "event_type").alias("rb"),
    )
    df = bowker_test(ev, "ra", "rb")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" not in plan


def test_source_cross_entropy_single_fact_scan_shape(spark):
    """The pooled rollup re-aggregates the (source, token) frame —
    the plan never joins two independent corpus scans."""
    from reddit_etl_spark.operators.text import source_cross_entropy

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = source_cross_entropy(docs, "source", "text")
    df.count()  # materialize the lazy checkpoint
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the (source, token) aggregate is checkpoint-pinned: all three
    # consumers read the pinned blocks, so the corpus scan appears
    # at most once in the executed plan
    assert plan.count("Scan parquet") <= 1, plan.count("Scan parquet")
