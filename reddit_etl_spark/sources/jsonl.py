"""JSONL ingestion with a dead-letter channel.

The canonical raw-corpus landing format for LLM-data pipelines is
newline-delimited JSON, and at 100 TB some fraction of lines is always
malformed (truncated uploads, encoding damage, schema drift). This
source reads once and splits the stream into (good, dead) frames:

- good: rows that parse AND carry every required field, typed to the
  caller's schema;
- dead: the raw offending line plus a machine-usable reason
  ('malformed' vs 'missing_required'), preserving the original bytes
  for replay after a fix — the dead-letter contract the multimodal
  codec path already follows.

Built on Spark's native JSON reader in PERMISSIVE mode with
``columnNameOfCorruptRecord``, so parsing stays JVM-side (no Python in
the hot path) and scales with the scan: no shuffle, one pass, both
outputs are narrow filters over the same parsed frame. Spark caches
the parsed projection per file split; the two filters do NOT re-read
the input twice when written in the same job (and a caller who wants
single-materialization guarantees can persist the parsed frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: column Spark populates with the raw line when JSON parsing fails
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON; return ``(good, dead)``.

    ``schema`` is the contract the good frame honors exactly (field
    order included). ``required`` names fields that must be non-null
    for a row to count as good — a parsed-but-empty doc row is as
    unusable as a malformed one, and silently admitting it poisons
    downstream token counts. Defaults to no required fields.

    The dead frame is (raw_line string, reason string) with reason in
    {'malformed', 'missing_required'}; raw_line is the original input
    line verbatim in both cases, so a fixed parser can replay the
    dead-letter output directly.
    """
    required = required or []
    # text + from_json rather than spark.read.json: (a) the original
    # bytes of EVERY dead row survive verbatim (the native reader only
    # retains them for malformed rows), and (b) it sidesteps the
    # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction
    # that forbids plans touching only the internal corrupt column
    # (e.g. dead.count()). Parsing is still the JVM JacksonParser —
    # same codepath, no Python.
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(
            "value",
            read_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__d"),
    )
    data_cols = [f.name for f in schema.fields]
    # a null struct (unparseable beyond recovery) counts as malformed
    is_malformed = (
        F.col("__d").isNull() | F.col("__d").getField(CORRUPT_COL).isNotNull()
    )
    missing = F.lit(False)
    for c in required:
        missing = missing | F.col("__d").getField(c).isNull()
    good = parsed.filter(~is_malformed & ~missing).select(
        *[F.col("__d").getField(c).alias(c) for c in data_cols]
    )
    dead = parsed.filter(is_malformed | missing).select(
        "raw_line",
        F.when(is_malformed, F.lit("malformed"))
        .otherwise(F.lit("missing_required"))
        .alias("reason"),
    )
    return good, dead


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write a frame as newline-delimited JSON. ``n_files`` coalesces
    for small exports; at scale leave it None so each task writes its
    own shard (no exchange)."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").json(path)
