"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry through Spark and its
``oracle_sql()`` through DuckDB over the same parquet tables, then
compares row count, column names/types, and an order-insensitive
value hash (floats canonicalized to 9 decimals, per FIXTURES.md).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from reddit_etl_spark.harness import TABLES  # noqa: E402
from reddit_etl_spark.session import get_spark  # noqa: E402


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, colnames) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted(
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\x1e".join(canon).encode()).hexdigest()[:16]
    return len(canon), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only (no oracle) rows={len(srows)} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sn, sh = table_hash(srows, scols)
        on, oh = table_hash(orows, ocols)
        ok = sn == on and sh == oh and sorted(scols) == sorted(ocols)
        status = "PASS" if ok else "FAIL"
        print(
            f"{status} {name}: spark={sn}/{sh} oracle={on}/{oh} "
            f"[{time.time()-t0:.1f}s]"
        )
        if not ok:
            failures.append(name)
            if sorted(scols) != sorted(ocols):
                print(f"     cols spark={sorted(scols)} oracle={sorted(ocols)}")
            else:
                sset = {tuple(map(canon_cell, r)) for r in srows}
                oset = {tuple(map(canon_cell, r)) for r in orows}
                for r in list(sset - oset)[:3]:
                    print(f"     spark-only:  {r}")
                for r in list(oset - sset)[:3]:
                    print(f"     oracle-only: {r}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
