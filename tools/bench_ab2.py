"""Second-stage bench A/B (judge r11 #1): is the per-rep penalty the
blocking unpersist sweep or the ``System.gc()`` riding with it?

bench_ab.py showed the r11 discipline (unpersist sweep + System.gc
after every rep) costs ~8% overall and +72% on dedup_ngram_jaccard vs
cleanup-between-queries-only. The unpersist sweep alone already drops
leaked localCheckpoint blocks synchronously (that was the r10 minhash
fix); the trailing full-GC cycle is the redundant suspect — a G1 full
collection right before a timed rep can spill concurrent phases into
it. Three variants, interleaved per query, on the queries bench_ab
flagged:

  G — unpersist sweep + System.gc per rep   (r11 discipline)
  U — unpersist sweep only per rep          (candidate r12 discipline)
  N — nothing per rep, one sweep per query  (bench_ab variant B)

Usage: python tools/bench_ab2.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_spark.harness import registry  # noqa: E402
from reddit_etl_spark.session import get_spark  # noqa: E402

QUERIES = [
    "curation_pipeline",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_profile",
    "similarity_topk_ivf",
]
N = 7


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-ab2")
    spark.sparkContext.setLogLevel("OFF")
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.groupBy("r_name").count().count()

    jvm_gc = spark.sparkContext._jvm.System.gc

    def sweep() -> None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jmap.values()):
            rdd.unpersist(True)

    reg = registry()
    out: dict[str, dict[str, float]] = {}
    for qi, name in enumerate(QUERIES):
        hq = reg[name]
        hq.builder(spark, sf_dir).count()  # throwaway
        sweep()
        jvm_gc()
        meds: dict[str, float] = {}
        arrays: dict[str, list[float]] = {}
        # rotate variant order per query to cancel position bias
        variants = ["G", "U", "N"]
        variants = variants[qi % 3 :] + variants[: qi % 3]
        for v in variants:
            runs = []
            for _ in range(N):
                t0 = time.perf_counter()
                hq.builder(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
                if v == "G":
                    sweep()
                    jvm_gc()
                elif v == "U":
                    sweep()
            if v == "N":
                sweep()
            runs.sort()
            meds[v] = round(runs[N // 2], 3)
            arrays[v] = [round(t, 2) for t in runs]
        out[name] = meds
        print(f"# {name} order={''.join(variants)}: {meds} {arrays}", file=sys.stderr)

    import numpy as _np  # noqa: PLC0415

    m = _np.random.RandomState(0).rand(512, 512)
    t0 = time.perf_counter()
    for _ in range(20):
        m = m @ m / _np.linalg.norm(m)
    calib = round((time.perf_counter() - t0) * 1000, 1)
    print(json.dumps({"metric": "bench_ab2", "queries": out, "calib_numpy_ms": calib}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
