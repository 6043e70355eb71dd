"""Per-query job/stage profile: run each named (default: headline)
registry query once (after one untimed warm rep) and record wall
time, job count, stage count, total executor run ms, shuffle-read MB,
and the top stages by executor time — the round-13 optimization
round's "where does the time go" instrument (guide §1).

Usage: python tools/profile_r13.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_spark.harness import registry  # noqa: E402
from reddit_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    reg = registry()
    if not names:
        names = sorted(n for n, hq in reg.items() if hq.headline)
    spark = get_spark("profile-r13")
    spark.sparkContext.setLogLevel("OFF")

    # warmup (mirrors bench.py): scan + shuffle + python worker pool
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.groupBy("r_name").count().count()
    import pandas as _pd  # noqa: PLC0415

    def _noop(batches):
        for pdf in batches:
            yield _pd.DataFrame({"r_regionkey": pdf["r_regionkey"]})

    warm.repartition(64).select("r_regionkey").mapInPandas(
        _noop, schema="r_regionkey long"
    ).count()

    _jvm = spark.sparkContext._jvm
    _store = spark.sparkContext._jsc.sc().statusStore()
    _darr = spark.sparkContext._gateway.new_array(_jvm.double, 0)
    tracker = spark.sparkContext.statusTracker()

    def _stages_after(last_max_id: int):
        lst = _store.stageList(
            _jvm.java.util.ArrayList(), False, False, _darr,
            _jvm.java.util.ArrayList(),
        )
        it = lst.iterator()
        stages, new_max = [], last_max_id
        while it.hasNext():
            s = it.next()
            sid = s.stageId()
            if sid <= last_max_id:
                break
            new_max = max(new_max, sid)
            stages.append(
                {
                    "id": sid,
                    "ms": int(s.executorRunTime()),
                    "sh_mb": round(s.shuffleReadBytes() / 1e6, 2),
                    "tasks": int(s.numCompleteTasks()),
                    "name": str(s.name())[:60],
                }
            )
        return new_max, stages

    def _head_stage_id() -> int:
        _m, st = _stages_after(-1)
        return _m

    def drop_leaked_blocks() -> None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jmap.values()):
            rdd.unpersist(True)

    drop_leaked_blocks()
    out = {}
    for name in names:
        hq = reg[name]
        hq.builder(spark, sf_dir).count()  # untimed warm rep
        drop_leaked_blocks()
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        sid0 = _head_stage_id()
        t0 = time.perf_counter()
        hq.builder(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        jobs1 = len(tracker.getJobIdsForGroup(None) or [])
        _m, stages = _stages_after(sid0)
        drop_leaked_blocks()
        stages.sort(key=lambda s: -s["ms"])
        rec = {
            "wall_s": round(wall, 3),
            "jobs": jobs1 - jobs0,
            "stages": len(stages),
            "exec_ms": sum(s["ms"] for s in stages),
            "sh_mb": round(sum(s["sh_mb"] for s in stages), 2),
            "top": stages[:5],
        }
        out[name] = rec
        print(
            f"{name:32s} wall={rec['wall_s']:6.3f}s jobs={rec['jobs']:3d} "
            f"stages={rec['stages']:3d} exec={rec['exec_ms']:6d}ms "
            f"shuffle={rec['sh_mb']:8.2f}MB"
        )
        for s in rec["top"][:3]:
            print(f"    stage {s['id']:4d} {s['ms']:6d}ms {s['sh_mb']:7.2f}MB "
                  f"{s['tasks']:4d}t {s['name']}")
    path = "/tmp/profile_r13.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"# -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
