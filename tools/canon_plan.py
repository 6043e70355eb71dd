"""Dump the CANONICALIZED optimized logical plan of registry queries.

The round-14 py4j-reduction rewrites (Column-API expression chains ->
single F.expr strings) must not change what any query computes. Two
plans whose canonicalized forms are byte-identical are the same query
(exprIds and aliases erased, literals and operator trees intact), so
diffing this dump before/after a rewrite PROVES result equality
stronger than any sampled comparison.

Usage: python tools/canon_plan.py <outdir> [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_spark.harness import registry  # noqa: E402
from reddit_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:]
    reg = registry()
    if not names:
        names = sorted(n for n, hq in reg.items() if hq.headline)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("canon-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = reg[name].builder(spark, sf_dir)
        canon = (
            df._jdf.queryExecution().optimizedPlan().canonicalized().toString()
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(canon)
        print(f"{name}: {len(canon)} chars")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
