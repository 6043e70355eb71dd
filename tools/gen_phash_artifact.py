"""Generate the committed pHash oracle artifact.

``image_phash_neardup``'s DCT kernel is not SQL-expressible, but
everything downstream of the per-image hash IS: the 4x16-bit band
join and the exact bit_count(a XOR b) <= 3 cut. This tool
materializes the per-image 64-bit hashes once per test scale factor
(the Arrow kernel, the same ``images_from_text -> phash_table`` path
the query runs) into ONE committed parquet at
``reddit_etl_spark/resources/phash_hashes.parquet`` with columns
(corpus_fp BIGINT, asset_id STRING, phash BIGINT), keyed by a
mod-2^60 corpus fingerprint of the documents table that produced
each block (the ``table_fingerprint`` discipline: sum of md5_60 row
hashes of ``doc_id || 0x1f || text`` — row-order-free, and both
engines compute it identically; a plain row COUNT cannot key the
blocks because sf0.001 and sf0.01 both hold 500 documents with
entirely different contents).

The oracle SQL then selects its block via
``corpus_fp = (SELECT <same fingerprint expr> FROM documents)`` —
self-selecting per scale factor with a single static SQL string —
and recomputes the band join + Hamming cut in DuckDB over the
committed hashes. The
artifact is self-policing two ways:

- tests/test_phash.py regenerates the sf0.001 + sf0.01 blocks from
  the live kernel and value-compares them against the committed file;
- if the kernel ever changes without re-running this tool, the Spark
  side of the oracle compare diverges from the committed hashes and
  the row turns red.

Usage: python tools/gen_phash_artifact.py [sf_dir ...]
(defaults to /root/testdata/sf{0.001,0.01,0.1})
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from reddit_etl_spark.harness import load  # noqa: E402
from reddit_etl_spark.session import get_spark  # noqa: E402

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "reddit_etl_spark",
    "resources",
    "phash_hashes.parquet",
)

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def corpus_fingerprint(docs) -> int:
    """mod-2^60 fingerprint of (doc_id, text) — must stay expression-
    identical to the SELECT in image_phash_neardup's oracle SQL."""
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.dedup import token_hash_col

    row = (
        token_hash_col(
            F.concat_ws(
                "\x1f",
                F.col("doc_id").cast("string"),
                F.coalesce(F.col("text"), F.lit("\x00")),
            ),
            "md5_60",
        )
        .cast("decimal(38,0)")
    )
    return int(
        docs.agg(
            F.pmod(F.sum(row), F.lit(1 << 60).cast("decimal(38,0)"))
            .cast("long")
            .alias("fp")
        ).collect()[0]["fp"]
    )


def hash_block(spark, sf_dir: str) -> list[tuple[int, str, int]]:
    """(corpus_fp, asset_id, phash) rows for one scale factor — the
    same pipeline image_phash_neardup_q runs up to the hash table."""
    from reddit_etl_spark.operators.multimodal import (
        images_from_text,
        phash_table,
    )

    docs = load(spark, sf_dir, "documents")
    fp = corpus_fingerprint(docs)
    rows = phash_table(images_from_text(docs, "doc_id", "text")).collect()
    return sorted((fp, r["asset_id"], r["phash"]) for r in rows)


def main() -> int:
    sf_dirs = sys.argv[1:] or DEFAULT_SF_DIRS
    spark = get_spark("gen-phash-artifact")
    blocks: list[tuple[int, str, int]] = []
    fps = set()
    for sf_dir in sf_dirs:
        block = hash_block(spark, sf_dir)
        print(f"{sf_dir}: corpus_fp={block[0][0]} hashes={len(block)}")
        if block[0][0] in fps:
            raise SystemExit(f"corpus_fp collision for {sf_dir}")
        fps.add(block[0][0])
        blocks.extend(block)
    os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
    table = pa.table(
        {
            "corpus_fp": pa.array([b[0] for b in blocks], pa.int64()),
            "asset_id": pa.array([b[1] for b in blocks], pa.string()),
            "phash": pa.array([b[2] for b in blocks], pa.int64()),
        }
    )
    pq.write_table(table, ARTIFACT, compression="zstd")
    print(f"wrote {ARTIFACT}: {table.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
