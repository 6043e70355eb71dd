"""Spark-SQL twins for the SQL-expressible extension queries.

The reference's 15-query surface exists three ways (DataFrame builders,
Spark SQL strings, harness instantiations — SURVEY §2.11). This module
extends the same discipline to the training-data surface: every
extension query whose semantics fit Spark SQL gets a SQL string that
must produce EXACTLY the DataFrame builder's result (equivalence is
tested per query at sf0.001). Kernel-backed operators (MinHash,
SimHash, LSH, codecs) are DataFrame-only by nature and excluded.

Register the testdata tables first::

    spark.read.parquet(f"{sf}/documents.parquet").createOrReplaceTempView("documents")
    spark.read.parquet(f"{sf}/events.parquet") ... (see harness.load_events)
"""

from __future__ import annotations

#: query name (matching harness registry) -> Spark SQL producing the
#: identical result frame
EXTENSION_SQL: dict[str, str] = {
    "daily_delta": """
        WITH d AS (
          SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT day, event_type, n,
               CAST(n - LAG(n) OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS delta,
               ROUND(CASE WHEN LAG(n) OVER (PARTITION BY event_type
                                            ORDER BY day) > 0
                     THEN (n - LAG(n) OVER (PARTITION BY event_type
                                            ORDER BY day)) * 100.0D
                          / LAG(n) OVER (PARTITION BY event_type
                                         ORDER BY day)
                     END, 6) AS pct_change
        FROM d
    """,
    "cross_source_dups": """
        WITH n AS (
          SELECT doc_id, source,
                 trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS nt
          FROM documents)
        SELECT nt AS content_key,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT source) AS n_sources,
               MIN(doc_id) AS example_doc
        FROM n GROUP BY nt HAVING COUNT(DISTINCT source) > 1
    """,
    "weighted_sample_sources": """
        WITH keyed AS (
          SELECT source, doc_id, n_chars,
                 ln((CAST(conv(substring(md5(concat_ws('\\u001f',
                        CAST(doc_id AS STRING), '42')), 1, 15), 16, 10)
                     AS BIGINT) + CAST(1 AS DOUBLE))
                    / (1152921504606846976.0D + 1.0D)) / n_chars AS k
          FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        ranked AS (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY k DESC, doc_id) AS rn
          FROM keyed)
        SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 5
    """,
    "incremental_dedup": """
        WITH n AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS nt
          FROM documents),
        d1 AS (SELECT * FROM n WHERE doc_id % 2 = 0),
        d2 AS (SELECT * FROM n WHERE doc_id % 2 = 1),
        w AS (SELECT nt, MIN(doc_id) AS doc_id FROM d2 GROUP BY nt)
        SELECT doc_id FROM w
        WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.nt = w.nt)
    """,
}
