"""Streaming dedup and compaction maintenance tests."""

from __future__ import annotations

import datetime as dt
import glob

from pyspark.sql import functions as F

from reddit_etl_spark.sinks.writers import append_parquet, compact_parquet
from reddit_etl_spark.streaming.stats_stream import streaming_dedup


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    base = dt.datetime(2025, 9, 1, 10, 0)
    rows = [
        ("a", base, 1.0),
        ("a", base + dt.timedelta(minutes=1), 2.0),  # re-delivery of key a
        ("b", base + dt.timedelta(minutes=2), 3.0),
        ("b", base + dt.timedelta(minutes=3), 4.0),  # re-delivery of key b
        ("c", base + dt.timedelta(minutes=4), 5.0),
    ]
    df = spark.createDataFrame(rows, "id string, ts timestamp, value double")
    src = str(tmp_path / "in")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        streaming_dedup(stream, ["id"], "ts", within="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT id FROM dedup_out").collect()
    assert sorted(r.id for r in got) == ["a", "b", "c"]


def test_compact_parquet_reduces_files(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    # simulate micro-batch accretion: many small appends
    for _ in range(6):
        append_parquet(df.repartition(8), path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 40
    total_before = spark.read.parquet(path).count()

    n = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    after = glob.glob(f"{path}/*.parquet")
    assert len(after) == n < before
    assert spark.read.parquet(path).count() == total_before


def test_range_layout_files_are_disjoint_and_skippable(spark, tmp_path):
    """write_range_layout: per-file value ranges are disjoint (footer
    min/max prunes whole files) and a selective filter's scan reads
    fewer files than the table has."""
    import os

    from pyspark.sql import functions as F

    from reddit_etl_spark.sinks.writers import write_range_layout

    df = spark.range(0, 100_000).select(
        (F.col("id") % 9973).alias("k"), F.col("id").alias("v")
    )
    path = str(tmp_path / "ranged")
    write_range_layout(df, path, ["k"], num_files=8)

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    assert len(files) == 8
    ranges = []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
            .first()
        )
        ranges.append((r.lo, r.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint: file-level min/max CAN prune

    # and nothing was lost
    assert spark.read.parquet(path).count() == 100_000
    got = spark.read.parquet(path).filter(F.col("k") == 5).count()
    assert got == df.filter(F.col("k") == 5).count()


def test_compact_accepts_relative_path(spark, tmp_path, monkeypatch):
    """A relative path must compact the intended directory: building
    'file://relative' would parse the first segment as a URI authority
    and read/write somewhere else entirely (advisor r3)."""
    monkeypatch.chdir(tmp_path)
    df = spark.range(0, 1_000).select(F.col("id"), (F.col("id") % 3).alias("k"))
    for _ in range(3):
        append_parquet(df.repartition(4), str(tmp_path / "rel"))
    before = spark.read.parquet(str(tmp_path / "rel")).count()
    n = compact_parquet(spark, "rel", target_file_bytes=64 * 1024 * 1024)
    assert n >= 1
    assert len(glob.glob(str(tmp_path / "rel") + "/*.parquet")) == n
    assert spark.read.parquet(str(tmp_path / "rel")).count() == before


def test_compact_rejects_remote_schemes(spark):
    import pytest

    from reddit_etl_spark.sinks.writers import compact_parquet

    for bad in ("s3a://bucket/table", "hdfs://nn/table"):
        with pytest.raises(ValueError, match="local paths only"):
            compact_parquet(spark, bad)


def test_zorder_order_matches_unsigned_morton_full_32bit(spark):
    """zorder_value_col must sort by the UNSIGNED Morton code across
    the full 32-bit input range — inputs with bit 31 set previously
    overflowed into the long's sign bit and sorted FIRST (ADVICE r2
    finding)."""
    from pyspark.sql import functions as F

    from reddit_etl_spark.sinks.writers import zorder_value_col

    def morton(x, y):  # unsigned reference interleave
        z = 0
        for i in range(32):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [
        (0, 0), (1, 1), (123, 456),
        (2**31 - 1, 2**31 - 1),        # largest codes with bit63 clear
        (0, 2**31), (2**31, 0),        # y/x bit 31 set — overflow zone
        (2**31, 2**31),
        (2**32 - 1, 2**32 - 1),        # all bits set
        (7, 2**32 - 1), (2**32 - 1, 7),
    ]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "z", zorder_value_col("x", "y")
    )
    got = [(r.x, r.y) for r in df.orderBy("z").collect()]
    want = sorted(pts, key=lambda p: morton(p[0], p[1]))
    assert got == want


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """Z-order vs single-column range layout: the Morton layout keeps
    per-file bounding boxes small in BOTH dimensions, so a predicate
    on the SECOND column can prune files too."""
    import os

    from pyspark.sql import functions as F

    from reddit_etl_spark.sinks.writers import (
        write_range_layout,
        write_zorder_layout,
    )

    n = 1 << 16
    side = 1 << 8
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        ((F.col("id") * 2654435761) % side).alias("y"),  # decorrelated
        F.col("id").alias("v"),
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zorder_layout(df, zpath, "x", "y", num_files=16)
    write_range_layout(df, rpath, ["x"], num_files=16)

    def bboxes(path):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            r = (
                spark.read.parquet(os.path.join(path, f))
                .agg(
                    F.min("x"), F.max("x"), F.min("y"), F.max("y"),
                )
                .first()
            )
            out.append((r[1] - r[0] + 1, r[3] - r[2] + 1))
        return out

    zb = bboxes(zpath)
    rb = bboxes(rpath)
    avg_y_extent_z = sum(b[1] for b in zb) / len(zb)
    avg_y_extent_r = sum(b[1] for b in rb) / len(rb)
    # the x-only range layout leaves y unconstrained per file (~full
    # side); z-order bounds it
    assert avg_y_extent_r > side * 0.9
    assert avg_y_extent_z < side * 0.6
    # and x stays bounded too (both layouts constrain x)
    assert sum(b[0] for b in zb) / len(zb) < side * 0.6
    # nothing lost
    assert spark.read.parquet(zpath).count() == n


# ---------------------------------------------------------------------------
# merge_parquet — file-level copy-on-write MERGE (the D7 follow-up)
# ---------------------------------------------------------------------------


def _make_table(spark, path, n_files=8, rows=800):
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).alias("grp"),
        F.lit("orig").alias("val"),
    )
    df.repartitionByRange(n_files, "k").write.parquet(path)
    import glob as g

    return sorted(g.glob(f"{path}/*.parquet"))


def test_merge_parquet_rewrites_only_affected_files(spark, tmp_path):
    from reddit_etl_spark.sinks.writers import merge_parquet

    path = str(tmp_path / "t")
    before_files = _make_table(spark, path)
    assert len(before_files) >= 6
    # touch keys living in (at most) two range files + insert new keys
    src = spark.createDataFrame(
        [(0, 0, "upd"), (1, 1, "upd"), (5000, 0, "new"), (5001, 1, "new")],
        "k long, grp long, val string",
    )
    stats = merge_parquet(spark, path, src, ["k"])
    assert stats["files_rewritten"] <= 2  # keys 0,1 are range-clustered
    import glob as g

    after_files = sorted(g.glob(f"{path}/*.parquet"))
    untouched = [f for f in before_files if f in after_files]
    # every non-affected original file is still there, byte-identical name
    assert len(untouched) == len(before_files) - stats["files_rewritten"]

    got = {r.k: r.val for r in spark.read.parquet(path).collect()}
    assert len(got) == 802  # 800 original + 2 inserts
    assert got[0] == "upd" and got[1] == "upd"
    assert got[5000] == "new" and got[5001] == "new"
    assert got[2] == "orig"  # rode along in a rewritten file, unchanged


def test_merge_parquet_delete_and_idempotence(spark, tmp_path):
    from reddit_etl_spark.sinks.writers import merge_parquet

    path = str(tmp_path / "t")
    _make_table(spark, path, n_files=4, rows=200)
    src = spark.createDataFrame(
        [(7, 0, "x"), (9, 0, "x")], "k long, grp long, val string"
    )
    stats = merge_parquet(
        spark, path, src, ["k"], when_matched="delete", when_not_matched="ignore"
    )
    assert stats["rows_deleted"] == 2 and stats["rows_inserted"] == 0
    remaining = {r.k for r in spark.read.parquet(path).collect()}
    assert 7 not in remaining and 9 not in remaining
    assert len(remaining) == 198

    # idempotent: merging the same update twice converges
    upd = spark.createDataFrame([(10, 0, "u")], "k long, grp long, val string")
    merge_parquet(spark, path, upd, ["k"])
    merge_parquet(spark, path, upd, ["k"])
    rows = [r for r in spark.read.parquet(path).collect() if r.k == 10]
    assert len(rows) == 1 and rows[0].val == "u"


def test_merge_parquet_matched_ignore_appends_only(spark, tmp_path):
    from reddit_etl_spark.sinks.writers import merge_parquet

    path = str(tmp_path / "t")
    before = _make_table(spark, path, n_files=4, rows=100)
    src = spark.createDataFrame(
        [(3, 0, "SHOULD_NOT_APPLY"), (900, 0, "new")],
        "k long, grp long, val string",
    )
    stats = merge_parquet(spark, path, src, ["k"], when_matched="ignore")
    assert stats["files_rewritten"] == 0
    import glob as g

    assert all(f in g.glob(f"{path}/*.parquet") for f in before)
    got = {r.k: r.val for r in spark.read.parquet(path).collect()}
    assert got[3] == "orig" and got[900] == "new"


def test_merge_parquet_guards(spark, tmp_path):
    import pytest

    from reddit_etl_spark.sinks.writers import merge_parquet, upsert_partitioned

    path = str(tmp_path / "t")
    _make_table(spark, path, n_files=2, rows=50)
    dup = spark.createDataFrame(
        [(1, 0, "a"), (1, 0, "b")], "k long, grp long, val string"
    )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_parquet(spark, path, dup, ["k"])
    with pytest.raises(ValueError, match="local paths only"):
        merge_parquet(
            spark, "s3a://bucket/t",
            spark.createDataFrame([(1, 0, "a")], "k long, grp long, val string"),
            ["k"],
        )
    # hive-partitioned tables are refused
    ppath = str(tmp_path / "p")
    df = spark.createDataFrame([(1, "a", 1.0)], "d long, k string, v double")
    upsert_partitioned(df, ppath, ["d"])
    with pytest.raises(ValueError, match="hive-partitioned"):
        merge_parquet(
            spark, ppath,
            spark.createDataFrame([(1, "a", 2.0)], "d long, k string, v double"),
            ["k"],
        )


def test_merge_parquet_affected_file_cap(spark, tmp_path):
    import glob as g

    import pytest

    from reddit_etl_spark.sinks.writers import merge_parquet

    path = str(tmp_path / "t")
    before = sorted(g.glob(f"{path}/*.parquet")) or _make_table(
        spark, path, n_files=6, rows=120
    )
    # touch a key in every range file -> affected files > cap of 2
    src = spark.createDataFrame(
        [(k, 0, "u") for k in range(0, 120, 20)], "k long, grp long, val string"
    )
    with pytest.raises(ValueError, match="more than 2 files"):
        merge_parquet(spark, path, src, ["k"], max_affected_files=2)
    # the guard fired BEFORE any write or rename: table untouched
    assert sorted(g.glob(f"{path}/*.parquet")) == before
    assert {r.val for r in spark.read.parquet(path).collect()} == {"orig"}
    with pytest.raises(ValueError, match="max_affected_files must be >= 1"):
        merge_parquet(spark, path, src, ["k"], max_affected_files=0)
    # a generous cap lets the same merge through
    stats = merge_parquet(spark, path, src, ["k"], max_affected_files=100)
    assert stats["rows_updated"] == 6


def test_merge_parquet_percent_encoded_path(spark, tmp_path):
    """input_file_name() URIs percent-encode spaces; the rename must
    decode them or the swap crashes mid-merge (advisor r4 #3)."""
    from reddit_etl_spark.sinks.writers import merge_parquet

    path = str(tmp_path / "with space" / "t")
    _make_table(spark, path, n_files=2, rows=40)
    src = spark.createDataFrame([(3, 0, "upd")], "k long, grp long, val string")
    stats = merge_parquet(spark, path, src, ["k"])
    assert stats["rows_updated"] == 1
    got = {r.k: r.val for r in spark.read.parquet(path).collect()}
    assert got[3] == "upd" and len(got) == 40


def test_merge_parquet_noop_touches_nothing(spark, tmp_path):
    from reddit_etl_spark.sinks.writers import merge_parquet

    path = str(tmp_path / "t")
    before = _make_table(spark, path, n_files=3, rows=60)
    src = spark.createDataFrame([], "k long, grp long, val string")
    stats = merge_parquet(spark, path, src, ["k"])
    assert stats["files_rewritten"] == 0
    import glob as g

    assert sorted(g.glob(f"{path}/*.parquet")) == before


def test_orc_roundtrip_with_partition_pruning(spark, tmp_path):
    import os

    from reddit_etl_spark.sinks.writers import read_orc, write_orc

    rows = [("click", 1, 10.0), ("click", 2, 20.0), ("view", 3, 30.0)]
    df = spark.createDataFrame(rows, "event_type string, id long, v double")
    path = str(tmp_path / "orc_tbl")
    write_orc(df, path, partition_by=["event_type"])
    # partition columns become directory names
    assert os.path.isdir(os.path.join(path, "event_type=click"))

    back = read_orc(spark, path)
    got = sorted((r["event_type"], r["id"], r["v"]) for r in back.collect())
    assert got == sorted(rows)

    # a partition filter prunes to one subtree: only 'click' files read
    pruned = back.filter(F.col("event_type") == "click")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "click" in plan  # partition filter reached the scan


def test_orc_unpartitioned_schema_survives(spark, tmp_path):
    from reddit_etl_spark.sinks.writers import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", 2.5, True)], "i long, s string, d double, b boolean"
    )
    path = str(tmp_path / "orc_flat")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert back.collect() == df.collect()
