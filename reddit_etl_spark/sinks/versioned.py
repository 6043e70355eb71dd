"""Snapshot-versioned parquet tables: commits, time travel, rollback.

A minimal manifest layer over plain parquet that supplies the three
table-format capabilities the rest of `sinks/` doesn't: atomic
commits, reads AS OF any past version, and O(1) rollback — without a
Delta/Iceberg dependency (none is installed here, and none is needed
for this slice of the contract; `merge_parquet` and dynamic partition
overwrite in writers.py already cover row-level upserts).

Layout::

    <table>/
      data/<version>-<nonce>/   parquet files of one commit (immutable)
      _manifests/v00000017.json  {"version", "dirs": [...], "mode"}

A manifest lists the DATA DIRECTORIES visible at that version — one
entry per commit, never per file, so the manifest stays O(commits)
(a 100 TB table with hourly commits for a decade is ~90k entries of a
few bytes; file-level manifests are what force log compaction on real
formats, and nothing here needs file granularity because commits are
immutable whole directories).

Atomicity: a commit writes its data directory first, then publishes
the manifest via write-temp + ``os.rename`` — atomic on POSIX, so a
reader sees either the old version or the new one, never a torn
state. Concurrent writers are last-writer-wins on the version number
(documented, like upsert_partitioned); serialize commits externally
if you need a lock.

Reads: ``read_versioned`` hands Spark the exact directory list for
the requested version — partition pruning and predicate pushdown
behave exactly as on any multi-path parquet read. Old versions stay
readable until ``vacuum`` removes directories no retained manifest
references.

No reference counterpart (the reference overwrites one SQLite file);
extension surface, pytest-attested (I/O has no SQL oracle).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_DATA = "data"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, _MANIFESTS)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version:08d}.json")


def versions(path: str) -> list[int]:
    """All committed versions, ascending. Empty list for a fresh path."""
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def write_versioned(
    df: DataFrame,
    path: str,
    mode: str = "append",
) -> int:
    """Commit ``df`` as a new version; returns the version number.

    ``mode='append'``: the new version sees all prior data plus this
    commit. ``mode='overwrite'``: the new version sees ONLY this
    commit (prior versions remain readable — overwrite is a logical
    operation, nothing is deleted until ``vacuum``).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be 'append' or 'overwrite'")
    vs = versions(path)
    new_version = (vs[-1] + 1) if vs else 0
    commit_dir = os.path.join(
        path, _DATA, f"{new_version:08d}-{uuid.uuid4().hex[:8]}"
    )
    df.write.mode("error").parquet(commit_dir)
    if mode == "append" and vs:
        dirs = _read_manifest(path, vs[-1])["dirs"] + [commit_dir]
    else:
        dirs = [commit_dir]
    os.makedirs(_manifest_dir(path), exist_ok=True)
    tmp = _manifest_path(path, new_version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(
            {"version": new_version, "mode": mode, "dirs": dirs}, f
        )
    os.rename(tmp, _manifest_path(path, new_version))
    return new_version


def read_versioned(
    spark: SparkSession,
    path: str,
    version: int | None = None,
) -> DataFrame:
    """Read the table AS OF ``version`` (default: latest). Raises
    FileNotFoundError for a version that was never committed."""
    vs = versions(path)
    if not vs:
        raise FileNotFoundError(f"no versions committed at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(
            f"version {v} not found at {path} (have {vs[0]}..{vs[-1]})"
        )
    return spark.read.parquet(*_read_manifest(path, v)["dirs"])


def rollback(path: str, version: int) -> int:
    """Publish a NEW version whose visible data is exactly that of
    ``version`` (roll-forward history model: the bad commits stay in
    the log, auditable, and nothing is deleted). Returns the new
    version number."""
    vs = versions(path)
    if version not in vs:
        raise FileNotFoundError(f"version {version} not found at {path}")
    target = _read_manifest(path, version)
    new_version = vs[-1] + 1
    tmp = _manifest_path(path, new_version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": new_version,
                "mode": f"rollback:{version}",
                "dirs": target["dirs"],
            },
            f,
        )
    os.rename(tmp, _manifest_path(path, new_version))
    return new_version


def vacuum(
    path: str, keep_last: int = 1, include_orphans: bool = False
) -> list[str]:
    """Delete data directories referenced by NO retained manifest,
    keeping the last ``keep_last`` versions readable (older manifests
    are removed too). Returns the removed directories.

    ``include_orphans=True`` additionally reclaims commit debris that
    no manifest EVER referenced — data directories from commits that
    crashed between the parquet write and the manifest rename, and
    stale ``.json.tmp-*`` manifest files. Off by default because it is
    only safe with no concurrent writer: an in-flight commit's data
    directory looks identical to a crashed one until its manifest
    lands. Run it from the same (single-writer) maintenance schedule
    that owns commits.

    Safe order: manifests first, then directories — a crash mid-vacuum
    leaves only unreferenced garbage, never a readable version with
    missing data."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = versions(path)
    removed: list[str] = []
    if len(vs) > keep_last:
        keep, drop = vs[-keep_last:], vs[:-keep_last]
        live: set[str] = set()
        for v in keep:
            live.update(_read_manifest(path, v)["dirs"])
        dead: set[str] = set()
        for v in drop:
            dead.update(
                d for d in _read_manifest(path, v)["dirs"] if d not in live
            )
        for v in drop:
            os.remove(_manifest_path(path, v))
        for d in sorted(dead):
            shutil.rmtree(d, ignore_errors=True)
        removed.extend(sorted(dead))
    if include_orphans:
        # compare REAL paths: manifests store dirs as spelled at write
        # time, and a vacuum invoked via a different spelling (relative
        # vs absolute, symlinked root) must never mistake every live
        # commit for an orphan and delete the table
        referenced: set[str] = set()
        for v in versions(path):
            referenced.update(
                os.path.realpath(d) for d in _read_manifest(path, v)["dirs"]
            )
        data_root = os.path.join(path, _DATA)
        if os.path.isdir(data_root):
            for name in sorted(os.listdir(data_root)):
                d = os.path.join(data_root, name)
                if os.path.realpath(d) not in referenced:
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(d)
        mdir = _manifest_dir(path)
        if os.path.isdir(mdir):
            for name in os.listdir(mdir):
                if ".json.tmp-" in name:
                    os.remove(os.path.join(mdir, name))
    return removed
