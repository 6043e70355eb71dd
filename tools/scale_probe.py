"""Scale-growth probe: run representative operators at 1x / 2x / 4x
the sf0.1 data volume (id-shifted unions, so duplicate structure is
preserved rather than multiplied) and print wall times + growth
ratios. Near-linear growth (ratio ~ volume ratio, not quadratic) is
the local evidence that the candidate-generation plans stay bounded.

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from reddit_etl_spark.harness import load, load_events  # noqa: E402
from reddit_etl_spark.session import get_spark  # noqa: E402


def replicate(df: DataFrame, id_col: str, times: int, stride: int) -> DataFrame:
    """times copies with shifted ids: copy k gets id + k*stride. Text
    payloads are left IDENTICAL across copies, so every original
    near-dup pair appears times^2-fold — the WORST case for candidate
    growth, which is exactly what the probe should stress."""
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(k * stride))
        for k in range(times)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from reddit_etl_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from reddit_etl_spark.operators.sessions import sessionize

    docs = load(spark, sf_dir, "documents").localCheckpoint(eager=True)
    events = load_events(spark, sf_dir).localCheckpoint(eager=True)

    results: dict[str, dict[int, float]] = {}

    def probe(name, fn):
        results[name] = {}
        for times in (1, 2, 4):
            t0 = time.perf_counter()
            n = fn(times)
            dt = round(time.perf_counter() - t0, 2)
            results[name][times] = dt
            print(f"# {name} x{times}: {dt}s rows={n}", file=sys.stderr)

    probe(
        "dedup_exact",
        lambda t: exact_dedup(
            replicate(docs, "doc_id", t, 10_000_000), "doc_id", ["text"]
        ).count(),
    )
    probe(
        "dedup_minhash_lsh",
        lambda t: minhash_lsh_pairs(
            replicate(docs, "doc_id", t, 10_000_000), "doc_id", "text",
            threshold=0.5,
        ).count(),
    )
    probe(
        "dedup_ngram_jaccard_maxdf",
        # max_df caps the cross-copy shingle blowup — the documented
        # web-scale configuration for replicated/boilerplate corpora
        lambda t: ngram_jaccard_pairs(
            replicate(docs, "doc_id", t, 10_000_000), "doc_id", "text",
            threshold=0.5, max_df=64,
        ).count(),
    )
    probe(
        "sessionization",
        lambda t: sessionize(
            replicate(events, "event_id", t, 1_000_000_000),
            ["user_id"], "ts",
        ).count(),
    )

    print(json.dumps({"sf_dir": sf_dir, "times": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
