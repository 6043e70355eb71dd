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
    "item_affinity": """
        WITH b AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
        n AS (SELECT COUNT(DISTINCT o) AS n FROM b),
        joint AS (
          SELECT a.i AS item_a, c.i AS item_b,
                 CAST(COUNT(*) AS BIGINT) AS support
          FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
          GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        marg AS (SELECT i, COUNT(*) AS supp FROM b GROUP BY 1)
        SELECT j.item_a, j.item_b, j.support,
               ROUND(j.support / ma.supp, 6) AS conf_a_to_b,
               ROUND(j.support / mb.supp, 6) AS conf_b_to_a,
               ROUND((SELECT n FROM n) * j.support / (ma.supp * mb.supp),
                     6) AS lift
        FROM joint j
        JOIN marg ma ON j.item_a = ma.i
        JOIN marg mb ON j.item_b = mb.i
    """,
    "twa_user_value": """
        WITH e AS (
          SELECT user_id, unix_timestamp(ts) AS t, value FROM events),
        s AS (
          SELECT user_id, t, value,
                 LEAD(t) OVER (PARTITION BY user_id
                               ORDER BY t, value) AS tn
          FROM e)
        SELECT user_id,
               CAST(MAX(t) - MIN(t) AS BIGINT) AS span_seconds,
               CASE WHEN MAX(t) > MIN(t)
                    THEN ROUND(ROUND(SUM(value * (tn - t)), 6)
                               / (MAX(t) - MIN(t)), 6) END AS twa
        FROM s GROUP BY user_id
    """,
    "gap_fill_hourly": """
        WITH e AS (
          SELECT event_type,
                 CAST(FLOOR(unix_timestamp(ts) / 3600) * 3600 AS BIGINT)
                   AS bucket,
                 unix_timestamp(ts) AS t, value
          FROM events),
        obs AS (
          SELECT event_type, bucket,
                 MAX(struct(t, value)).value AS v
          FROM e GROUP BY 1, 2),
        bounds AS (
          SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
          FROM e GROUP BY 1),
        grid AS (
          SELECT event_type,
                 explode(sequence(mn, mx, CAST(3600 AS BIGINT))) AS bucket
          FROM bounds)
        SELECT g.event_type,
               timestamp_seconds(g.bucket) AS bucket_start,
               last(o.v, true) OVER (
                 PARTITION BY g.event_type ORDER BY g.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS value_filled
        FROM grid g LEFT JOIN obs o
          ON g.event_type = o.event_type AND g.bucket = o.bucket
    """,
    "segment_dedup_docs": """
        WITH ws AS (
          SELECT doc_id, split(trim(text), '\\\\s+') AS w
          FROM documents WHERE text IS NOT NULL),
        segs AS (
          SELECT doc_id, g AS pos,
                 array_join(slice(w, g * 10 + 1, 10), ' ') AS seg
          FROM ws
          LATERAL VIEW explode(
            sequence(0, int(ceil(size(w) / 10.0)) - 1)) t AS g),
        marked AS (
          SELECT doc_id, pos, seg,
                 COUNT(*) OVER (PARTITION BY k) AS occ,
                 ROW_NUMBER() OVER (PARTITION BY k
                                    ORDER BY doc_id, pos) AS rn
          FROM (SELECT doc_id, pos, seg,
                       lower(trim(regexp_replace(seg, '\\\\s+', ' '))) AS k
                FROM segs)),
        rebuilt AS (
          SELECT doc_id,
                 array_join(transform(
                   array_sort(collect_list(
                     CASE WHEN occ = 1 OR rn = 1
                          THEN struct(pos, seg) END)),
                   x -> x.seg), ' ') AS text_deduped,
                 CAST(COUNT(*) AS BIGINT) AS n_segments,
                 CAST(SUM(CASE WHEN occ > 1 AND rn > 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_removed
          FROM marked GROUP BY doc_id)
        SELECT d.doc_id, r.text_deduped,
               COALESCE(r.n_segments, 0L) AS n_segments,
               COALESCE(r.n_removed, 0L) AS n_removed
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """,
    "decayed_engagement": """
        WITH ev AS (
          SELECT user_id, unix_timestamp(ts) AS t, value, event_id
          FROM events),
        mx AS (SELECT MAX(t) AS now FROM ev),
        dec AS (
          SELECT user_id,
                 ROUND(SUM(value * POWER(
                   0.5D, ((SELECT now FROM mx) - t) / 604800.0D)), 6)
                   AS decayed_value,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM ev GROUP BY user_id),
        r AS (
          SELECT user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM ev),
        ew AS (
          SELECT user_id,
                 ROUND(SUM(CASE WHEN rn = 1
                                THEN POWER(0.7D, n - 1) * value
                                ELSE 0.3D * POWER(0.7D, n - rn) * value
                           END), 6) AS ewma
          FROM r GROUP BY user_id)
        SELECT d.user_id, d.decayed_value, d.n_events, e.ewma
        FROM dec d JOIN ew e USING (user_id)
    """,
    "event_value_bars": """
        WITH ev AS (
          SELECT event_type, event_id, value,
                 unix_timestamp(ts) AS t
          FROM events),
        r AS (
          SELECT event_type, value,
                 t - (t % 21600) AS b,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type, t - (t % 21600)
                   ORDER BY t, event_id) AS rn_a,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type, t - (t % 21600)
                   ORDER BY t DESC, event_id DESC) AS rn_d
          FROM ev)
        SELECT event_type,
               timestamp_seconds(b) AS bar_start,
               ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
               ROUND(MAX(value), 6) AS high,
               ROUND(MIN(value), 6) AS low,
               ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
               CAST(COUNT(*) AS BIGINT) AS volume,
               ROUND(SUM(value), 6) AS total
        FROM r GROUP BY event_type, b
    """,
    "events_sliding_distinct": """
        SELECT window.start AS window_start,
               window.end AS window_end,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY window(ts, '2 hours', '30 minutes')
    """,
    "user_clustering": """
        WITH b AS (
          SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
          FROM events),
        e AS (
          SELECT DISTINCT a.user_id AS u, c.user_id AS v
          FROM b a JOIN b c ON a.event_type = c.event_type AND a.h = c.h
          WHERE a.user_id < c.user_id),
        deg AS (
          SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
          GROUP BY 1),
        o AS (
          SELECT CASE WHEN struct(da.degree, e.u) < struct(db.degree, e.v)
                      THEN e.u ELSE e.v END AS s,
                 CASE WHEN struct(da.degree, e.u) < struct(db.degree, e.v)
                      THEN e.v ELSE e.u END AS t
          FROM e JOIN deg da ON e.u = da.node
                 JOIN deg db ON e.v = db.node),
        tri AS (
          SELECT e1.s AS wa, e1.t AS wm, e2.t AS wc
          FROM o e1 JOIN o e2 ON e1.t = e2.s
          JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t),
        pn AS (
          SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS triangles
          FROM (SELECT wa AS n FROM tri UNION ALL SELECT wm FROM tri
                UNION ALL SELECT wc FROM tri)
          GROUP BY 1)
        SELECT d.node, d.degree,
               CAST(COALESCE(pn.triangles, 0) AS BIGINT) AS triangles,
               CASE WHEN d.degree >= 2
                    THEN ROUND(2.0D * COALESCE(pn.triangles, 0)
                               / (d.degree * (d.degree - 1)), 6) END
                 AS clustering
        FROM deg d LEFT JOIN pn ON d.node = pn.node
    """,
}
