"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting handles most sort-merge skew at runtime;
these operators cover the cases AQE cannot:

- ``salted_join``: a hot-key 1:N join where ONE side has pathological
  key concentration (the web-scale "null key / default key / celebrity
  key" problem). The skewed side gets a random salt in [0, salt);
  the other side replicates each row ``salt`` times. The hot key's
  rows then spread over ``salt`` reducers instead of one straggler.
- ``salted_count_distinct``: COUNT(DISTINCT x) BY key with a hot key —
  two-phase: distinct on (key, salt-free x) first (spreads by x),
  then count per key. Exact, no single-reducer bottleneck.
- ``join_key_profile``: the pre-flight diagnostic that tells you a
  join NEEDS the levers above before you run it — exact output
  cardinality and hot-key contribution from per-key count frames.

All are pure DataFrame compositions — no partitioner APIs — so they
survive AQE re-planning and work identically on any cluster size.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side,
    replicate ``other`` per salt value, join on (keys + salt).

    Replication multiplies ``other``'s shuffle volume by ``salt`` —
    the right trade when ``other`` is the smaller side but too big to
    broadcast and the skewed side has straggler keys. Result equals
    the plain join exactly (salt columns are internal).

    Only ``inner``/``left``(-outer) are supported: a right/full outer
    would emit each unmatched ``other`` row once per salt replica."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got how={how!r}"
        )
    keys = list(on)
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=0) * salt).cast("int")
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted.join(replicated, [*keys, "__salt"], how).drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    alias: str = "distinct_count",
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per group without funneling
    each group through one reducer: phase 1 dedups (group, value)
    pairs — partitioned by BOTH, so a hot group spreads across the
    cluster — phase 2 counts survivors per group (a partial-aggregated
    count, skew-free)."""
    return (
        df.select(*group_cols, distinct_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(distinct_col).alias(alias))
    )


def join_key_profile(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    top_k: int = 5,
) -> DataFrame:
    """Pre-flight diagnostics for an equi-join: EXACT join output
    cardinality and skew profile computed from per-key count frames,
    O(distinct keys) work instead of running (and possibly exploding)
    the join itself. This is the check to run BEFORE pointing a 100 TB
    join at a cluster: ``output_rows`` is the exact SUM(cnt_l * cnt_r)
    the inner join would emit, and ``max_key_output`` says whether one
    hot key produces most of it (the straggler salting/AQE must
    absorb).

    Output (single row): n_left, n_right, distinct_left,
    distinct_right, common_keys, output_rows, max_key_output (exact
    BIGINTs), and top_keys: the ``top_k`` (rows, key) structs by
    output contribution, sorted descending with the key string as the
    tie-break so the array is engine-deterministic.

    Plan: two map-side-combined groupBys + one join of the COUNT
    frames (distinct-key-sized, never data-sized) + one aggregate;
    the two total counts attach as broadcast scalars.
    """
    keys = list(on)
    # a NULL in any key column can never match in an equi-join; drop
    # those rows BEFORE counting (concat_ws skips NULL components, so
    # they would otherwise collapse into matchable strings and
    # overcount)
    notnull = F.lit(True)
    for k in keys:
        notnull = notnull & F.col(k).isNotNull()
    # group/join on a STRUCT of the key columns — no string encoding,
    # so composite keys can never collide regardless of their content
    # (('ab','c') vs ('a','bc'), or values containing any separator)
    kc = F.struct(
        *[F.col(k).cast("string").alias(f"_{i}") for i, k in enumerate(keys)]
    )
    lc = (
        left.filter(notnull)
        .select(kc.alias("__k"))
        .groupBy("__k")
        .agg(F.count("*").alias("__cl"))
    )
    rc = (
        right.filter(notnull)
        .select(kc.alias("__k"))
        .groupBy("__k")
        .agg(F.count("*").alias("__cr"))
    )
    # the struct becomes a display label only AFTER the exact per-key
    # counts join; "\x1f" (a VISIBLE escape, unlike a raw control
    # byte) keeps the label unambiguous for ordinary keys, and a
    # collision here can only blur the label text, never the counts
    joined = lc.join(rc, "__k").select(
        F.concat_ws(
            "\x1f", *[F.col("__k")[f"_{i}"] for i in range(len(keys))]
        ).alias("__k"),
        (F.col("__cl") * F.col("__cr")).alias("__out"),
    )
    totals_l = left.agg(F.count(F.lit(1)).alias("n_left")).crossJoin(
        lc.agg(F.count(F.lit(1)).alias("distinct_left"))
    )
    totals_r = right.agg(F.count(F.lit(1)).alias("n_right")).crossJoin(
        rc.agg(F.count(F.lit(1)).alias("distinct_right"))
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("common_keys"),
        F.coalesce(F.sum("__out"), F.lit(0)).alias("output_rows"),
        F.coalesce(F.max("__out"), F.lit(0)).alias("max_key_output"),
        # take the LAST min(top_k, n) of the ascending sort = the top
        # contributors; a fixed -top_k start would return [] whenever
        # fewer than top_k keys exist (negative index past the array
        # head), so the start is clamped to the array size
        F.expr(
            "reverse(slice("
            "  sort_array(collect_list(struct(__out AS rows, __k AS key))),"
            # 1-based slice: start 0 is invalid, so the empty-group
            # case uses (start 1, length 0) for a typed empty array
            f"  CASE WHEN size(collect_list(__k)) = 0 THEN 1"
            f"       ELSE -least({top_k}, size(collect_list(__k))) END,"
            f"  least({top_k}, size(collect_list(__k)))"
            "))"
        ).alias("top_keys"),
    )
    return (
        agg.crossJoin(F.broadcast(totals_l))
        .crossJoin(F.broadcast(totals_r))
        .select(
            F.col("n_left").cast("long").alias("n_left"),
            F.col("n_right").cast("long").alias("n_right"),
            F.col("distinct_left").cast("long").alias("distinct_left"),
            F.col("distinct_right").cast("long").alias("distinct_right"),
            F.col("common_keys").cast("long").alias("common_keys"),
            F.col("output_rows").cast("long").alias("output_rows"),
            F.col("max_key_output").cast("long").alias("max_key_output"),
            "top_keys",
        )
    )


def build_bloom(
    keys: DataFrame,
    key_col: str,
    bits: int = 1 << 23,
    k: int = 5,
):
    """Distributed Bloom-filter build over a key column: every key
    sets ``k`` bit positions by double hashing (h1 + i*h2 mod bits,
    both legs xxhash64 with different seeds), positions aggregate as
    per-64-bit-word BIT_ORs, and the word frame assembles into one
    numpy uint64 array at the driver.

    Driver/broadcast memory is bounded by ``bits/8`` BYTES — a
    parameter you choose — never by the key count: a billion keys
    through a 2^30-bit filter still collects at most 128 MiB of
    words. (Contrast a broadcast semi-join, whose build side grows
    with the keys.) False-positive rate ~ (1 - e^(-k*n/bits))^k; no
    false negatives by construction.

    Returns (numpy_bit_words, bits, k) for :func:`bloom_semi_join` or
    any custom prober.
    """
    if bits < 64 or bits & (bits - 1):
        raise ValueError("bits must be a power of two >= 64")
    h1 = F.xxhash64(F.col(key_col))
    h2 = F.xxhash64(F.col(key_col), F.lit(-7046029254386353131))
    # Reduce each hash leg mod bits BEFORE combining: h1 + i*h2 on
    # full-range int64 hashes would overflow — silently wrapping
    # under ansi=false but throwing ARITHMETIC_OVERFLOW under Spark
    # 4's default ANSI session. Because bits is a power of two
    # dividing 2^64, (h1 + i*h2) mod 2^64 mod bits == (h1 mod bits +
    # i*(h2 mod bits)) mod bits, so these residues are bit-identical
    # to the probe kernel's wrapping-uint64 positions while the
    # intermediates stay < k * bits (no overflow in any ANSI mode).
    r1 = F.pmod(h1, F.lit(bits))
    r2 = F.pmod(h2, F.lit(bits))
    probes = keys.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.pmod(r1 + i * r2, F.lit(bits)),
            )
        ).alias("__pos")
    )
    words = (
        probes.select(
            F.expr("shiftrightunsigned(__pos, 6)").alias("__w"),
            F.expr("shiftleft(1L, cast(__pos % 64 AS INT))").alias("__m"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__m)").alias("__bits"))
    )
    arr = np.zeros(bits >> 6, dtype=np.uint64)
    pdf = words.toPandas()
    arr[pdf["__w"].to_numpy()] = pdf["__bits"].to_numpy().astype(np.int64).view(np.uint64)
    return arr, bits, k


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    bits: int = 1 << 23,
    k: int = 5,
    verify: bool = True,
    prebuilt: tuple | None = None,
) -> DataFrame:
    """Semi-join ``big`` to ``small``'s key set with a Bloom-filter
    pre-prune: the 100 TB shuffle-reduction pattern when the probe
    side is huge and mostly non-matching. The filter (built
    distributed, ``bits/8`` bytes regardless of key count) broadcasts
    once; an Arrow-batched kernel drops non-matching rows AT THE SCAN
    — before any shuffle — and the surviving sliver flows into an
    exact semi-join (``verify=True``, the default) that removes the
    Bloom's false positives, so the result is EXACTLY the plain
    semi-join, just cheaper to reach. ``verify=False`` returns the
    pruned stream as-is (no false negatives, FP rate set by
    bits/k — the decontamination-probe trade).

    The kernel probes all k positions vectorized (wrapping uint64
    double hashing, identical to the build); Python cost is one Arrow
    batch pass over the big side, repaid by shuffling only matches.
    ``prebuilt`` takes a ``build_bloom`` result so one filter build
    serves many probes (audits, retries, multiple fact tables) —
    without it every call pays a fresh distributed build + broadcast.
    """
    from pyspark.sql.functions import pandas_udf

    arr, bits, k = (
        prebuilt
        if prebuilt is not None
        else build_bloom(small.select(on), on, bits=bits, k=k)
    )
    sc = big.sparkSession.sparkContext
    barr = sc.broadcast(arr)
    mask = np.uint64(bits - 1)

    @pandas_udf("boolean")
    def _might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        a = barr.value
        # mask each leg BEFORE combining — same reduction the build
        # side applies (pmod per leg); identical residues because
        # bits divides 2^64, and the intermediates stay < k * bits
        x1 = h1.to_numpy(dtype=np.int64).view(np.uint64) & mask
        x2 = h2.to_numpy(dtype=np.int64).view(np.uint64) & mask
        ok = np.ones(len(x1), dtype=bool)
        for i in range(k):
            pos = (x1 + np.uint64(i) * x2) & mask
            w = a[(pos >> np.uint64(6)).astype(np.int64)]
            ok &= (w >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return pd.Series(ok)

    h1 = F.xxhash64(F.col(on))
    h2 = F.xxhash64(F.col(on), F.lit(-7046029254386353131))
    pruned = big.filter(_might_contain(h1, h2))
    if not verify:
        return pruned
    return pruned.join(small.select(on).distinct(), on, "semi")
