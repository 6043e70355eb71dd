"""Dump .explain('formatted') for named (or all headline) registry
queries to plans/r14/<query>_<tag>.txt — the round-13 optimization
round's before/after plan evidence.

Usage: python tools/explain_r14.py <tag> [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_spark.harness import registry  # noqa: E402
from reddit_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    reg = registry()
    if not names:
        names = sorted(n for n, hq in reg.items() if hq.headline)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-r14")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = reg[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} — explain('formatted'), tag={tag}\n")
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: exchanges~{n_ex} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
