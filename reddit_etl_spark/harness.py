"""Driver-harness query surface over the synthetic testdata tables.

The engine's operators are schema-generic (FIXTURES.md §B); this module
instantiates every query shape from the reference's 15-query surface
(SURVEY §2.11) plus the training-data-pipeline extensions against the
driver's TPC-H-ish tables (region nation customer supplier part orders
lineitem events documents embeddings), pairing each Spark builder with
the exact-match DuckDB oracle SQL.

Conventions (so the driver's row-count + schema + value-hash compare
passes):
- every computed column aliased identically on both sides;
- integer aggregates cast to BIGINT on both sides (DuckDB SUM(int)
  returns HUGEINT otherwise);
- hour/weekday cast to BIGINT; weekday is Monday=0 on both sides
  (Spark ``weekday``, DuckDB ``isodow - 1``);
- relative-date anchors are derived from the data (max date), never
  ``now()`` (SURVEY P13/P16 determinism rule).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.relational import argmax_per_group, rank_in_group, tier_col

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin UTC so hour()/weekday()/to_date() match the (timezone-naive)
    # oracle regardless of the calling session's default.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read nanos as long and floor-convert to microseconds
    (exact integer division — a double division would lose sub-us
    precision at 2024-era epochs). DuckDB's TIMESTAMP_NS -> TIMESTAMP
    cast truncates identically."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )


def round6(df: DataFrame, *cols: str) -> DataFrame:
    """Canonical 6-decimal quantization of order-dependent float
    aggregates (avg/sum of doubles, stddev, corr). Spark's partial
    aggregation and DuckDB's vectorized fold sum in different orders, so
    raw doubles differ in the last ulps; both sides of the oracle
    compare apply the same quantization."""
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


@dataclass
class HarnessQuery:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    doc: str = ""
    headline: bool = field(default=False)  # included in bench.py


_REGISTRY: dict[str, HarnessQuery] = {}


def _q(name: str, oracle: str | None, doc: str = "", headline: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = HarnessQuery(name, fn, oracle, doc, headline)
        return fn

    return deco


def registry() -> dict[str, HarnessQuery]:
    return dict(_REGISTRY)


# ---------------------------------------------------------------------------
# q01..q15 — the reference's analytical surface (analysis.sql), instantiated
# on the testdata star schema.
# ---------------------------------------------------------------------------


@_q(
    "q01_overview",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS total_orders,
           ROUND(AVG(o_totalprice), 6) AS avg_price,
           AVG(o_custkey)           AS avg_custkey,
           MAX(o_totalprice)        AS max_price,
           MIN(o_totalprice)        AS min_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="q01 shape: 1-key groupBy + count/avg/max/min (analysis.sql:5-15)",
    headline=True,
)
def q01_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.count("*").alias("total_orders"),
        F.avg("o_totalprice").alias("avg_price"),
        F.avg("o_custkey").alias("avg_custkey"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )
    return round6(df, "avg_price")


@_q(
    "q02_top_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_totalprice IN (
        SELECT MAX(o_totalprice) FROM orders o2
        WHERE o2.o_orderpriority = orders.o_orderpriority
    )
    """,
    doc="q02 shape: per-group argmax, ties kept (analysis.sql:17-32); window "
    "rewrite = 1 shuffle vs the subquery's agg+rejoin",
    headline=True,
)
def q02_top_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return argmax_per_group(orders, ["o_orderpriority"], "o_totalprice").select(
        "o_orderpriority", "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


@_q(
    "q03_by_hour",
    """
    SELECT CAST(hour(ts) AS BIGINT) AS event_hour,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           ROUND(AVG(value), 6)     AS avg_value
    FROM events GROUP BY 1
    """,
    doc="q03 shape: groupBy derived hour (analysis.sql:34-42)",
)
def q03_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        load_events(spark, sf_dir)
        .groupBy(F.hour("ts").cast("long").alias("event_hour"))
        .agg(
            F.count("*").alias("event_count"),
            F.avg("value").alias("avg_value"),
        )
    )
    return round6(df, "avg_value")


@_q(
    "q04_by_weekday",
    """
    SELECT CAST(isodow(o_orderdate) - 1 AS BIGINT) AS day_of_week,
           CASE CAST(isodow(o_orderdate) - 1 AS BIGINT)
                WHEN 0 THEN 'Monday' WHEN 1 THEN 'Tuesday'
                WHEN 2 THEN 'Wednesday' WHEN 3 THEN 'Thursday'
                WHEN 4 THEN 'Friday' WHEN 5 THEN 'Saturday'
                WHEN 6 THEN 'Sunday' END AS day_name,
           CAST(COUNT(*) AS BIGINT) AS order_count,
           ROUND(AVG(o_totalprice), 6) AS avg_price
    FROM orders GROUP BY 1, 2
    """,
    doc="q04 shape: weekday groupBy + CASE name decode, Monday=0 "
    "(analysis.sql:44-60; pandas weekday convention per SURVEY P5)",
)
def q04_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import day_name_col

    df = (
        load(spark, sf_dir, "orders")
        .groupBy(F.weekday("o_orderdate").cast("long").alias("day_of_week"))
        .agg(
            F.count("*").alias("order_count"),
            F.avg("o_totalprice").alias("avg_price"),
        )
        .withColumn("day_name", day_name_col("day_of_week"))
        .select("day_of_week", "day_name", "order_count", "avg_price")
    )
    return round6(df, "avg_price")


@_q(
    "q05_top_customers",
    """
    SELECT c_name,
           CAST(COUNT(*) AS BIGINT) AS order_count,
           ROUND(AVG(o_totalprice), 6) AS avg_price,
           ROUND(SUM(o_totalprice), 6) AS total_spent
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_name
    HAVING COUNT(*) > 1
    ORDER BY order_count DESC, total_spent DESC, c_name
    LIMIT 20
    """,
    doc="q05 shape: join + groupBy + HAVING + deterministic top-20 "
    "(analysis.sql:62-73 intent; total tiebreak added for determinism)",
)
def q05_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    df = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "inner"
        )
        .groupBy("c_name")
        .agg(
            F.count("*").alias("order_count"),
            F.avg("o_totalprice").alias("avg_price"),
            F.sum("o_totalprice").alias("total_spent"),
        )
        .filter(F.col("order_count") > 1)
        .orderBy(F.desc("order_count"), F.desc("total_spent"), F.asc("c_name"))
        .limit(20)
    )
    return round6(df, "avg_price", "total_spent")


@_q(
    "q06_flag_breakdown",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_items,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT)   AS high_qty_items,
           CAST(SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS BIGINT)    AS discounted_items,
           CAST(SUM(CASE WHEN l_tax > 0 THEN 1 ELSE 0 END) AS BIGINT)         AS taxed_items,
           CAST(COUNT(*) AS BIGINT)                                           AS total_items
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="q06 shape: 4x conditional SUM flag breakdown (analysis.sql:75-84)",
    headline=True,
)
def q06_flag_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    def cnt(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(alias)

    return li.groupBy("l_linestatus").agg(
        cnt(F.col("l_returnflag") == "R", "returned_items"),
        cnt(F.col("l_quantity") > 25, "high_qty_items"),
        cnt(F.col("l_discount") > 0, "discounted_items"),
        cnt(F.col("l_tax") > 0, "taxed_items"),
        F.count("*").alias("total_items"),
    )


@_q(
    "q07_two_key_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS item_count,
           ROUND(AVG(l_discount), 6) AS avg_discount,
           ROUND(AVG(l_tax), 6)      AS avg_tax
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    doc="q07 shape: 2-key groupBy + avgs (analysis.sql:86-95)",
)
def q07_two_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "lineitem").groupBy(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.count("*").alias("item_count"),
        F.avg("l_discount").alias("avg_discount"),
        F.avg("l_tax").alias("avg_tax"),
    )
    return round6(df, "avg_discount", "avg_tax")


@_q(
    "q08_left_join_rollup",
    """
    SELECT c_mktsegment,
           CAST(COUNT(o_orderkey) AS BIGINT)           AS total_orders,
           ROUND(AVG(o_totalprice), 6)                 AS avg_order_value,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS unique_priorities
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    doc="q08 shape: LEFT JOIN 1:N rollup; COUNT(col) counts non-null so "
    "unmatched rows contribute 0 (analysis.sql:97-105)",
    headline=True,
)
def q08_left_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    df = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("total_orders"),
            F.avg("o_totalprice").alias("avg_order_value"),
            F.countDistinct("o_orderpriority").alias("unique_priorities"),
        )
    )
    return round6(df, "avg_order_value")


@_q(
    "q09_join_having",
    """
    SELECT c_mktsegment, c_name,
           CAST(COUNT(o_orderkey) AS BIGINT) AS order_count,
           ROUND(AVG(o_totalprice), 6)       AS avg_spend
    FROM customer JOIN orders ON c_custkey = o_custkey
    WHERE o_orderstatus <> 'O'
    GROUP BY c_mktsegment, c_name
    HAVING COUNT(o_orderkey) >= 3
    """,
    doc="q09 shape (golden example.csv query): inner join + sentinel-style "
    "filter + 2-key groupBy + HAVING (analysis.sql:107-118)",
    headline=True,
)
def q09_join_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    df = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "inner")
        .filter(F.col("o_orderstatus") != "O")
        .groupBy("c_mktsegment", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.avg("o_totalprice").alias("avg_spend"),
        )
        .filter(F.col("order_count") >= 3)
    )
    return round6(df, "avg_spend")


@_q(
    "q10_daily_trends",
    """
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT)  AS daily_orders,
           ROUND(AVG(o_totalprice), 6) AS avg_daily_value,
           MAX(o_totalprice)         AS max_daily_value
    FROM orders GROUP BY 1, 2
    """,
    doc="q10 shape: date-truncated 2-key trend rollup (analysis.sql:120-129)",
)
def q10_daily_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.to_date("o_orderdate").alias("order_date"), F.col("o_orderpriority")
        )
        .agg(
            F.count("*").alias("daily_orders"),
            F.avg("o_totalprice").alias("avg_daily_value"),
            F.max("o_totalprice").alias("max_daily_value"),
        )
    )
    return round6(df, "avg_daily_value")


@_q(
    "q11_text_insights",
    """
    SELECT lang,
           AVG(n_chars) AS avg_chars,
           AVG(CASE WHEN text LIKE '%?%' THEN 1 ELSE 0 END)    AS question_rate,
           AVG(CASE WHEN upper(text) = text THEN 1 ELSE 0 END) AS all_caps_rate
    FROM documents GROUP BY lang
    """,
    doc="q11 shape: boolean-rate-as-mean text insights (analysis.sql:131-138)",
)
def q11_text_insights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.avg("n_chars").alias("avg_chars"),
        F.avg(F.when(F.col("text").contains("?"), 1).otherwise(0)).alias(
            "question_rate"
        ),
        F.avg(F.when(F.upper("text") == F.col("text"), 1).otherwise(0)).alias(
            "all_caps_rate"
        ),
    )


@_q(
    "q12_correlations",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(corr(l_discount, l_extendedprice), 6) AS discount_price_corr,
           ROUND(corr(l_tax, l_extendedprice), 6)      AS tax_price_corr
    FROM lineitem WHERE l_quantity > 0 GROUP BY l_returnflag
    """,
    doc="q12 shape: filtered grouped Pearson correlations (analysis.sql:140-148)",
    headline=True,
)
def q12_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import grouped_corr

    df = grouped_corr(
        load(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        [
            ("l_quantity", "l_extendedprice", "qty_price_corr"),
            ("l_discount", "l_extendedprice", "discount_price_corr"),
            ("l_tax", "l_extendedprice", "tax_price_corr"),
        ],
        where=F.col("l_quantity") > 0,
    )
    return round6(df, "qty_price_corr", "discount_price_corr", "tax_price_corr")


@_q(
    "q13_trailing_window",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT)               AS orders_this_week,
           ROUND(AVG(o_totalprice), 6)            AS avg_price,
           ROUND(stddev_samp(o_totalprice), 6)    AS price_std_dev,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers
    FROM orders
    WHERE o_orderdate >= CAST(
        (SELECT CAST(MAX(o_orderdate) AS DATE) - 7 FROM orders) AS TIMESTAMP)
    GROUP BY o_orderpriority
    """,
    doc="q13 shape: trailing-7-day filter + stddev + countDistinct "
    "(analysis.sql:150-161); anchor = max(o_orderdate), the injectable "
    "as_of that replaces DATE('now') (SURVEY P16)",
)
def q13_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    anchor = orders.agg(F.to_date(F.max("o_orderdate")).alias("__as_of"))
    df = (
        orders.join(F.broadcast(anchor))
        .filter(F.col("o_orderdate") >= F.date_sub("__as_of", 7).cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("orders_this_week"),
            F.avg("o_totalprice").alias("avg_price"),
            F.stddev("o_totalprice").alias("price_std_dev"),
            F.countDistinct("o_custkey").alias("unique_customers"),
        )
    )
    return round6(df, "avg_price", "price_std_dev")


@_q(
    "q14_conditional_quality",
    """
    SELECT l_linestatus,
           ROUND(AVG(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE NULL END), 6) AS avg_returned_price,
           ROUND(AVG(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE NULL END), 6) AS avg_kept_price,
           SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 100.0 / COUNT(*) AS returned_pct
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="q14 shape: NULL-excluding conditional AVGs + ratio-of-sums "
    "(analysis.sql:163-170)",
)
def q14_conditional_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    returned = F.col("l_returnflag") == "R"
    df = li.groupBy("l_linestatus").agg(
        F.avg(F.when(returned, F.col("l_extendedprice"))).alias(
            "avg_returned_price"
        ),
        F.avg(F.when(~returned, F.col("l_extendedprice"))).alias("avg_kept_price"),
        (
            F.sum(F.when(returned, 1).otherwise(0)) * 100.0 / F.count("*")
        ).alias("returned_pct"),
    )
    return round6(df, "avg_returned_price", "avg_kept_price")


@_q(
    "q15_ranked_view",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority,
           CASE WHEN o_totalprice >= 300000 THEN 'Platinum'
                WHEN o_totalprice >= 150000 THEN 'Gold'
                WHEN o_totalprice >= 50000  THEN 'Silver'
                ELSE 'Bronze' END AS value_tier,
           CAST(RANK() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC) AS BIGINT)
               AS rank_in_priority
    FROM orders
    """,
    doc="q15 shape: the post_performance view — left-closed CASE tier + "
    "RANK window with gaps (analysis.sql:172-183)",
    headline=True,
)
def q15_ranked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    tiered = orders.withColumn(
        "value_tier",
        tier_col(
            "o_totalprice",
            [(300000, "Platinum"), (150000, "Gold"), (50000, "Silver")],
            "Bronze",
        ),
    )
    return rank_in_group(
        tiered, ["o_orderpriority"], "o_totalprice", rank_col="rank_in_priority"
    ).withColumn("rank_in_priority", F.col("rank_in_priority").cast("long"))
