"""Slowly-changing-dimension maintenance (SCD type 2).

The reference engine's upsert surface is INSERT OR REPLACE
(``script.py:265`` — last write wins, history destroyed). A
warehouse-grade dimension keeps the history instead: every attribute
change CLOSES the open version row (``valid_to`` stamped) and OPENS a
new one — the type-2 contract every downstream as-of join
(:mod:`.asof`) needs to answer "what was this customer's segment when
the order shipped?".

Spark-first shape: the whole apply is window functions + one union —
no collect, no iterative driver logic. The update batch shuffles once
on the dimension key; CLOSED history rows pass through untouched
(append-only at 100 TB: pair with ``merge_parquet``/partition
overwrite so only partitions holding open rows rewrite).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Apply an update batch to a type-2 dimension; returns the new
    full snapshot (closed history + recomputed open chains).

    ``current`` carries one OPEN row per key (``current_flag`` true,
    ``valid_to`` null) plus any closed history; ``updates`` carries
    (key, tracked attrs, ``ts_col``) — multiple updates per key in one
    batch chain correctly in timestamp order.

    Semantics (the standard merge contract):

    - several update rows on the same (key, ts) collapse to ONE
      deterministically (min attr struct) — cross-engine reproducible;
    - an update whose attrs equal the previous version's attrs creates
      NO new version (consecutive-duplicate collapse, evaluated
      against the open row for the first update of each key);
    - surviving updates become versions: ``valid_from`` = ts,
      ``valid_to`` = next version's ts, last one open;
    - the previously-open row closes at the key's first surviving
      update ts; keys with no surviving updates pass through
      unchanged;
    - LATE updates (ts <= the open row's ``valid_from``) are dropped —
      rewriting closed history would break the append-only layout;
      route them to a dead-letter channel upstream if they matter.

    Every window partitions on the dimension key, so the one exchange
    is the key shuffle of the (small) update batch plus open rows;
    closed history is a pass-through scan.
    """
    keys = list(key_cols)
    tracked = list(tracked_cols)
    out_cols = [*keys, *tracked, valid_from, valid_to, current_flag]

    open_rows = current.filter(F.col(current_flag)).select(
        *keys, *tracked, F.col(valid_from)
    )
    closed_rows = current.filter(~F.col(current_flag)).select(*out_cols)

    # one update per (key, ts): min struct over the tracked attrs
    u = (
        updates.groupBy(*keys, F.col(ts_col).alias("__ts"))
        .agg(F.min(F.struct(*tracked)).alias("__a"))
        .select(*keys, "__ts", *[F.col(f"__a.{c}").alias(c) for c in tracked])
    )
    # drop late updates: ts must be strictly after the key's open
    # valid_from (keys absent from `current` keep all their updates)
    u = u.join(
        open_rows.select(*keys, F.col(valid_from).alias("__open_from")),
        keys,
        "left",
    ).filter(
        F.col("__open_from").isNull() | (F.col("__ts") > F.col("__open_from"))
    )

    # seed each key's chain with its open row (priority 0 sorts before
    # any update at the same instant), then collapse consecutive
    # duplicate attr tuples per key in time order
    seed = open_rows.select(
        *keys,
        F.col(valid_from).alias("__ts"),
        *tracked,
        F.lit(0).alias("__prio"),
    )
    chain = seed.unionByName(u.drop("__open_from").withColumn("__prio", F.lit(1)))
    w = Window.partitionBy(*keys).orderBy("__ts", "__prio")
    attr = F.struct(*tracked)
    # null-safe compare: a tracked attr that IS NULL must equal itself,
    # or nullable attributes would spuriously drop versions
    chain = chain.withColumn("__prev", F.lag(attr).over(w)).filter(
        F.col("__prev").isNull() | ~F.col("__prev").eqNullSafe(attr)
    )
    versions = chain.select(
        *keys,
        *tracked,
        F.col("__ts").alias(valid_from),
        F.lead("__ts").over(w).alias(valid_to),
        F.lead("__ts").over(w).isNull().alias(current_flag),
    )
    # keys with no update rows never entered `chain` only if they also
    # had no open row; open rows always seed, so untouched keys come
    # back as (valid_to null, is_current true) == their input state
    return closed_rows.unionByName(versions.select(*out_cols))


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    value_cols: Sequence[str] | None = None,
    suffix: str = "_dim",
) -> DataFrame:
    """Point-in-time-correct lookup against an SCD2 history: each fact
    row joins the dimension VERSION whose half-open validity interval
    [valid_from, valid_to) contains the fact timestamp — the
    feature-store primitive that prevents time travel (training rows
    must see the feature values that EXISTED at event time, never
    later corrections).

    Plan: the as-of backward carry on ``valid_from`` (ONE shuffle on
    the key over |facts|+|versions| rows — versions per key are
    non-overlapping, so the latest valid_from <= ts IS the only
    candidate) plus a map-side validity check against the carried
    ``valid_to`` (NULL = still open). No interval explode, no
    range-bucket join, no candidate blowup. Facts with NULL
    timestamps or no covering version get NULL features (LEFT
    semantics, like the as-of family).
    """
    vcols = list(
        value_cols
        if value_cols is not None
        else [
            c
            for c in dim.columns
            if c not in (*on, valid_from, valid_to, "is_current")
        ]
    )
    from .asof import asof_join

    carried = asof_join(
        facts,
        dim,
        on,
        fact_ts,
        valid_from,
        value_cols=[*vcols, valid_to],
        suffix=suffix,
        direction="backward",
    )
    vt = valid_to if valid_to not in facts.columns else f"{valid_to}{suffix}"
    ok = F.col(vt).isNull() | (F.col(fact_ts) < F.col(vt))
    out = carried
    for c in vcols:
        name = c if c not in facts.columns else f"{c}{suffix}"
        out = out.withColumn(name, F.when(ok, F.col(name)))
    return out.drop(vt)


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture batch (Debezium-style row images)
    to a snapshot: for each key the HIGHEST-``seq_col`` change wins —
    insert/update ('I'/'U') replaces the row with the change's image,
    delete ('D') removes it; keys without changes pass through
    untouched. The idempotent replay contract: applying the same
    batch twice yields the same table.

    ``(keys, seq_col)`` must be unique (CDC logs are; enforced by a
    deterministic rank, ties would be a source bug). ``changes``
    must carry the base's non-key columns as the full new row image
    plus ``op_col`` and ``seq_col``.

    Plan: one window over the CHANGE batch (partitioned by key —
    O(|changes|), never the base), one anti join to drop superseded
    base rows (change keys broadcastable when the batch is small),
    one union. The base table never shuffles beyond the anti-join
    probe; at 100 TB pair with ``merge_parquet`` so only files
    containing changed keys rewrite.
    """
    ks = list(keys)
    w = Window.partitionBy(*ks).orderBy(F.desc(seq_col))
    # an unknown or NULL op must FAIL LOUDLY: under three-valued
    # logic a NULL op would slip past `op != 'D'` while its key still
    # anti-joins the base row away — a silent delete. raise_error
    # fires lazily, per offending row, on any executor.
    checked_op = F.when(
        F.col(op_col).isin("I", "U", "D"), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("apply_cdc: op must be I/U/D, got "),
                F.coalesce(F.col(op_col), F.lit("NULL")),
            )
        )
    )
    latest = (
        changes.withColumn(op_col, checked_op)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = latest.filter(F.col(op_col) != "D").select(*base.columns)
    touched = changes.select(*ks).distinct()
    kept = base.join(touched, ks, "left_anti")
    return kept.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Derive the CDC change batch that turns ``old`` into ``new`` —
    the INVERSE of :func:`apply_cdc`: keys only in ``new`` emit an
    insert ('I') with the new row image, keys only in ``old`` a
    delete ('D') with the old image, keys in both whose non-key
    attributes differ an update ('U') with the new image; identical
    rows emit NOTHING (the diff of a table with itself is empty).
    Roundtrip contract (tested): ``apply_cdc(old, snapshot_diff(old,
    new) + any seq) == new``.

    This is how replication VALIDATES and repairs: instead of
    re-shipping a 100 TB snapshot, ship the (usually tiny) diff.
    Comparison is NULL-safe per column (NULL == NULL holds, NULL vs
    value is a change) via an eqNullSafe conjunction — no string
    rendering, no hash false-negatives, exact on every type.

    Both snapshots must be key-unique (the apply_cdc precondition).
    Plan: ONE full outer join on the key columns — each side shuffles
    once on the key it is already clustered by in a well-laid-out
    warehouse (bucketed/sorted tables co-locate and skip the
    exchange); the change classification is a map-side expression.
    Output = base columns + ``op``.
    """
    ks = list(keys)
    attrs = [c for c in old.columns if c not in ks]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot schemas differ: {sorted(old.columns)} vs "
            f"{sorted(new.columns)}"
        )
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in ks],
        F.struct(*[F.col(a) for a in attrs]).alias("__o"),
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in ks],
        F.struct(*[F.col(a) for a in attrs]).alias("__n"),
        F.lit(True).alias("__in_n"),
    )
    cond = None
    for k in ks:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    in_o = F.coalesce(F.col("__in_o"), F.lit(False))
    in_n = F.coalesce(F.col("__in_n"), F.lit(False))
    # struct eqNullSafe compares fields recursively NULL-safely
    changed = ~F.col("__o").eqNullSafe(F.col("__n"))
    op = (
        F.when(in_o & in_n & changed, F.lit("U"))
        .when(~in_o & in_n, F.lit("I"))
        .when(in_o & ~in_n, F.lit("D"))
    )
    image = F.when(in_n, F.col("__n")).otherwise(F.col("__o"))
    keyv = [
        F.when(in_n, F.col(f"__kn_{k}"))
        .otherwise(F.col(f"__ko_{k}"))
        .alias(k)
        for k in ks
    ]
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *keyv,
            *[image.getField(a).alias(a) for a in attrs],
            "op",
        )
    )
