"""A/B the round-11 bench discipline inside ONE session (judge r11 #1).

Round 11 regressed the headline total 10.234 -> 13.825 s (+35%) with
byte-identical plans, a FASTER numpy calib, and a builder mid-round run
of 9.107 s on the same code — so the suspects are (a) the r11 harness
change (a blocking unpersist + ``System.gc()`` cycle immediately before
every timed rep) and (b) inter-session machine phase. This script
separates them, per query, in one JVM:

  variant A  — exactly the r11 loop: throwaway, cleanup, then each
               timed rep followed by ``drop_leaked_blocks()`` (blocking
               unpersist sweep + ``System.gc()``).
  variant B  — throwaway, then the timed reps back-to-back with NO
               per-rep cleanup; one cleanup after the block.

For each query both variants run ADJACENTLY (so the host's multi-minute
throughput phase hits both equally) and the A/B block order alternates
by query index (so "second block is warmer" bias cancels across the
set). Output: one JSON line with per-query medians for both variants
plus the totals, and a per-query ratio table on stderr.

Usage: python tools/bench_ab.py [sf_dir]   (default /root/testdata/sf0.1)
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
    spark = get_spark("bench-ab")
    spark.sparkContext.setLogLevel("OFF")

    # same warmup as bench.py
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.groupBy("r_name").count().count()
    import pandas as _pd  # noqa: PLC0415

    def _noop(batches):
        for pdf in batches:
            yield _pd.DataFrame({"r_regionkey": pdf["r_regionkey"]})

    warm.repartition(64).select("r_regionkey").mapInPandas(
        _noop, schema="r_regionkey long"
    ).count()

    jvm_gc = spark.sparkContext._jvm.System.gc

    def drop_leaked_blocks() -> None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jmap.values()):
            rdd.unpersist(True)
        jvm_gc()

    drop_leaked_blocks()
    n_reps = 5
    headline = sorted(
        ((n, hq) for n, hq in registry().items() if hq.headline),
        key=lambda p: p[0],
    )

    def run_a(builder) -> list[float]:
        """r11 discipline: cleanup (unpersist sweep + System.gc) after
        every rep — i.e. a GC cycle immediately before each timed rep."""
        runs = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            builder(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            drop_leaked_blocks()
        return sorted(runs)

    def run_b(builder) -> list[float]:
        """between-queries-only discipline: reps back-to-back, one
        cleanup after the whole block."""
        runs = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            builder(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        drop_leaked_blocks()
        return sorted(runs)

    med_a: dict[str, float] = {}
    med_b: dict[str, float] = {}
    for i, (name, hq) in enumerate(headline):
        hq.builder(spark, sf_dir).count()  # per-query throwaway
        drop_leaked_blocks()
        if i % 2 == 0:
            ra, rb = run_a(hq.builder), run_b(hq.builder)
            order = "AB"
        else:
            rb, ra = run_b(hq.builder), run_a(hq.builder)
            order = "BA"
        med_a[name] = round(ra[len(ra) // 2], 3)
        med_b[name] = round(rb[len(rb) // 2], 3)
        ratio = med_a[name] / max(med_b[name], 1e-9)
        print(
            f"# {name} [{order}]: A={med_a[name]:.3f}s B={med_b[name]:.3f}s "
            f"A/B={ratio:.2f} runsA={[round(t, 2) for t in ra]} "
            f"runsB={[round(t, 2) for t in rb]}",
            file=sys.stderr,
        )

    import numpy as _np  # noqa: PLC0415

    m = _np.random.RandomState(0).rand(512, 512)
    t0 = time.perf_counter()
    for _ in range(20):
        m = m @ m / _np.linalg.norm(m)
    calib_numpy = round((time.perf_counter() - t0) * 1000, 1)

    out = {
        "metric": "bench_ab",
        "total_a_r11_percleanup": round(sum(med_a.values()), 3),
        "total_b_perquery_cleanup": round(sum(med_b.values()), 3),
        "ratio_a_over_b": round(sum(med_a.values()) / sum(med_b.values()), 3),
        "queries_a": med_a,
        "queries_b": med_b,
        "n": n_reps,
        "calib_numpy_ms": calib_numpy,
        "sf": sf_dir,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
