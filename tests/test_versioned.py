"""Snapshot-versioned parquet tables (sinks/versioned.py): commits,
time travel, logical overwrite, rollback, and vacuum safety."""

from __future__ import annotations

import os

import pytest

from reddit_etl_spark.sinks.versioned import (
    read_versioned,
    rollback,
    vacuum,
    versions,
    write_versioned,
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def _keys(df):
    return sorted(r["k"] for r in df.collect())


def test_append_commits_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    assert versions(t) == []
    v0 = write_versioned(_rows(spark, 0, 3), t)
    v1 = write_versioned(_rows(spark, 3, 5), t)
    assert (v0, v1) == (0, 1) and versions(t) == [0, 1]
    assert _keys(read_versioned(spark, t)) == [0, 1, 2, 3, 4]
    assert _keys(read_versioned(spark, t, version=0)) == [0, 1, 2]


def test_overwrite_is_logical(spark, tmp_path):
    t = str(tmp_path / "t")
    write_versioned(_rows(spark, 0, 3), t)
    write_versioned(_rows(spark, 10, 12), t, mode="overwrite")
    assert _keys(read_versioned(spark, t)) == [10, 11]
    # the pre-overwrite version is still fully readable
    assert _keys(read_versioned(spark, t, version=0)) == [0, 1, 2]


def test_rollback_publishes_new_version(spark, tmp_path):
    t = str(tmp_path / "t")
    write_versioned(_rows(spark, 0, 3), t)
    write_versioned(_rows(spark, 100, 200), t)  # the bad commit
    v = rollback(t, 0)
    assert v == 2 and versions(t) == [0, 1, 2]
    assert _keys(read_versioned(spark, t)) == [0, 1, 2]
    # the bad version stays auditable
    assert len(_keys(read_versioned(spark, t, version=1))) == 103


def test_missing_version_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, t)
    write_versioned(_rows(spark, 0, 1), t)
    with pytest.raises(FileNotFoundError, match="version 7"):
        read_versioned(spark, t, version=7)
    with pytest.raises(FileNotFoundError):
        rollback(t, 9)


def test_vacuum_keeps_retained_versions_readable(spark, tmp_path):
    t = str(tmp_path / "t")
    write_versioned(_rows(spark, 0, 3), t)
    write_versioned(_rows(spark, 10, 12), t, mode="overwrite")
    write_versioned(_rows(spark, 20, 22), t)  # appends onto v1
    removed = vacuum(t, keep_last=2)
    # v0's directory is referenced only by v0 -> removed with it
    assert len(removed) == 1 and versions(t) == [1, 2]
    assert _keys(read_versioned(spark, t, version=1)) == [10, 11]
    assert _keys(read_versioned(spark, t)) == [10, 11, 20, 21]
    assert not os.path.exists(removed[0])


def test_vacuum_never_removes_dirs_shared_with_live_versions(spark, tmp_path):
    t = str(tmp_path / "t")
    write_versioned(_rows(spark, 0, 3), t)
    write_versioned(_rows(spark, 3, 5), t)  # append: shares v0's dir
    removed = vacuum(t, keep_last=1)
    # v0's manifest goes, but its data dir is still referenced by v1
    assert removed == [] and versions(t) == [1]
    assert _keys(read_versioned(spark, t)) == [0, 1, 2, 3, 4]


def test_vacuum_include_orphans_reclaims_crashed_commits(spark, tmp_path):
    import json
    import os

    t = str(tmp_path / "t")
    write_versioned(_rows(spark, 0, 3), t)
    # simulate a crashed commit: data dir written, manifest never landed
    orphan = os.path.join(t, "data", "99999999-deadbeef")
    _rows(spark, 50, 52).write.parquet(orphan)
    stale_tmp = os.path.join(t, "_manifests", "v00000009.json.tmp-ab12cd34")
    with open(stale_tmp, "w") as f:
        json.dump({}, f)

    assert vacuum(t, keep_last=1) == []  # default never touches orphans
    assert os.path.isdir(orphan)
    removed = vacuum(t, keep_last=1, include_orphans=True)
    assert removed == [orphan]
    assert not os.path.exists(orphan) and not os.path.exists(stale_tmp)
    # the committed version is untouched
    assert _keys(read_versioned(spark, t)) == [0, 1, 2]
