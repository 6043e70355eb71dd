"""Curation operators: deterministic sampling exactness/stability,
stratified rates, split composition, and PII redaction semantics."""

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.curation import (
    PII_PATTERNS,
    deterministic_sample,
    hash_threshold,
    redact_pii,
    split_col,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumn(
        "stratum", (F.col("id") % 2 == 0).cast("string")
    )


def test_hash_threshold_exact_fractions():
    assert hash_threshold(0.5) == "8000"
    assert hash_threshold(0.25) == "4000"
    assert hash_threshold(0.0) == "0000"
    with pytest.raises(ValueError):
        hash_threshold(1.5)


def test_sample_is_deterministic_and_near_rate(ids):
    a = {r["id"] for r in deterministic_sample(ids, "id", 0.5).collect()}
    b = {r["id"] for r in deterministic_sample(ids, "id", 0.5).collect()}
    assert a == b  # rerun-stable (no rand())
    assert 0.45 <= len(a) / 2000 <= 0.55


def test_sample_is_nested_by_fraction(ids):
    # a smaller fraction selects a subset of a larger one (same hash bits)
    small = {r["id"] for r in deterministic_sample(ids, "id", 0.2).collect()}
    big = {r["id"] for r in deterministic_sample(ids, "id", 0.6).collect()}
    assert small <= big


def test_stratified_rates(ids):
    got = deterministic_sample(
        ids, "id", 0.1, strata_col="stratum", fractions={"true": 0.8}
    )
    counts = {r["stratum"]: r["n"] for r in
              got.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts["true"] / 1000 > 0.7      # boosted stratum
    assert counts.get("false", 0) / 1000 < 0.2  # default rate


def test_split_partitions_everything(ids):
    tagged = ids.select("id", split_col("id", 0.9).alias("split"))
    counts = {r["split"]: r["n"] for r in
              tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] + counts["test"] == 2000
    assert counts["train"] / 2000 > 0.85


def test_sample_plans_as_pure_filter(ids):
    plan = deterministic_sample(ids, "id", 0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.org call +1-555-867-5309 ssn 123-45-6789 "
             "ip 10.0.0.255 clean tail")],
        "id long, t string",
    )
    row = redact_pii(df, "t").collect()[0]
    assert (row["n_email"], row["n_ssn"], row["n_phone"], row["n_ipv4"]) == (
        1, 1, 1, 1,
    )
    red = row["redacted_text"]
    assert "[EMAIL]" in red and "[SSN]" in red and "[PHONE]" in red \
        and "[IP]" in red
    assert "@" not in red and "5309" not in red and "123-45" not in red
    assert red.endswith("clean tail")


def test_redact_pii_counts_on_original_text(spark):
    # SSN is also digit-shaped; counts must come from the original text,
    # not from post-replacement remnants
    df = spark.createDataFrame([(1, "x 123-45-6789 y")], "id long, t string")
    row = redact_pii(df, "t").collect()[0]
    assert row["n_ssn"] == 1 and row["n_phone"] == 0


def test_patterns_are_re2_safe():
    # no backreferences / lookaround (so the DuckDB RE2 oracle accepts them)
    for rx, _ in PII_PATTERNS.values():
        assert "(?=" not in rx and "(?<" not in rx and "\\1" not in rx


def _py_next_fit(rows, budget):
    """Pure-python reference for the next-fit-with-overflow rule."""
    out = {}
    by_group = {}
    for rid, grp, tok in sorted(rows, key=lambda r: (r[1], r[0])):
        prior = by_group.get(grp, 0)
        out[rid] = prior // budget
        by_group[grp] = prior + tok
    return out


def test_pack_sequences_hand_example(spark):
    rows = [(1, "g", 200), (2, "g", 200), (3, "g", 200), (4, "g", 990),
            (5, "g", 10)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, tokens long")
    from reddit_etl_spark.operators.curation import pack_sequences

    got = {r["doc_id"]: r["bin"] for r in
           pack_sequences(df, "doc_id", "tokens", 500, "grp").collect()}
    # priors: 0,200,400,600,1590 -> bins 0,0,0,1,3 (bin 2 skipped by the
    # 990-token doc straddling two boundaries)
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 3}
    assert got == _py_next_fit(rows, 500)


def test_pack_sequences_matches_python_reference(spark):
    import random

    rng = random.Random(11)
    rows = [(i, f"g{rng.randrange(4)}", rng.randrange(1, 700))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, tokens long")
    from reddit_etl_spark.operators.curation import pack_sequences

    got = {r["doc_id"]: r["bin"] for r in
           pack_sequences(df, "doc_id", "tokens", 1000, "grp").collect()}
    assert got == _py_next_fit(rows, 1000)


def test_pack_sequences_single_shuffle(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        F.lit(100).alias("tokens"),
    )
    from reddit_etl_spark.operators.curation import pack_sequences

    plan = pack_sequences(df, "doc_id", "tokens", 500, "grp") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_boilerplate_fraction_flags_template_docs(spark):
    from reddit_etl_spark.operators.curation import boilerplate_fraction

    header = "this site uses cookies"
    docs = [(i, f"{header} unique words {i} here now") for i in range(4)]
    docs.append((99, "completely different content with no shared grams"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           boilerplate_fraction(df, "doc_id", "text", n=3, min_docs=3).collect()}
    # the 4 template docs share the header's two 3-grams
    for i in range(4):
        assert got[i]["n_boilerplate"] >= 2
        assert got[i]["boilerplate_frac"] > 0
    assert got[99]["n_boilerplate"] == 0
    assert got[99]["boilerplate_frac"] == 0.0


def test_boilerplate_probe_join_is_broadcast(spark):
    from reddit_etl_spark.operators.curation import boilerplate_fraction

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(8)],
        "doc_id long, text string",
    )
    plan = boilerplate_fraction(df, "doc_id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_mixture_weights_sum_to_one_and_epochs(spark):
    from reddit_etl_spark.operators.curation import mixture_weights

    df = spark.createDataFrame(
        [("a", 1000), ("a", 1000), ("b", 100), ("c", 10)],
        "source string, tokens long",
    )
    rows = {r["source"]: r for r in
            mixture_weights(df, "source", "tokens", temperature=0.7,
                            target_tokens=10_000).collect()}
    assert sum(r["weight"] for r in rows.values()) == pytest.approx(1.0, abs=1e-5)
    # temperature < 1 upweights small sources relative to proportional
    assert rows["c"]["weight"] > 10 / 2110
    assert rows["a"]["weight"] < 2000 / 2110
    # epochs = target * weight / tokens
    for r in rows.values():
        assert r["epochs"] == pytest.approx(
            round(10_000 * r["weight"] / r["tokens"], 6), abs=1e-6)


def test_bloom_decontaminate_superset_of_exact(spark):
    from reddit_etl_spark.operators.curation import (
        decontaminate,
        decontaminate_bloom,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text with no overlap at all here"),
            (3, "the quick brown fox jumps over something else entirely"),
            (4, "another clean document nothing shared with benchmarks"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    exact = {
        r.doc_id: r.n_contaminated_grams
        for r in decontaminate(docs, bench, "doc_id", "text", n=5).collect()
    }
    bloom = {
        r.doc_id: r.n_flagged_grams
        for r in decontaminate_bloom(docs, bench, "doc_id", "text", n=5).collect()
    }
    assert set(exact) == {1, 3}
    # no false negatives: every exactly-contaminated doc is flagged,
    # with at least as many grams
    for doc_id, n in exact.items():
        assert bloom.get(doc_id, 0) >= n
    # determinism
    again = {
        r.doc_id: r.n_flagged_grams
        for r in decontaminate_bloom(docs, bench, "doc_id", "text", n=5).collect()
    }
    assert again == bloom


def test_bloom_decontaminate_fp_rate_bounded(spark):
    # 300 clean docs vs a disjoint benchmark: at fpp=1e-3 the expected
    # flagged-doc count is << 1; allow a generous margin
    from reddit_etl_spark.operators.curation import decontaminate_bloom

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("clean doc words "),
            F.col("id").cast("string"),
            F.lit(" alpha "),
            F.col("id").cast("string"),
            F.lit(" beta "),
            F.col("id").cast("string"),
            F.lit(" gamma delta epsilon zeta"),
        ).alias("text"),
    )
    bench = spark.createDataFrame(
        [(0, "totally different benchmark sentence about oceans and tides")],
        "doc_id long, text string",
    )
    flagged = decontaminate_bloom(
        docs, bench, "doc_id", "text", n=5, fpp=1e-3
    ).count()
    assert flagged <= 2


def test_bloom_decontaminate_null_text_docs(spark):
    """NULL-text docs must flow through (unflagged), not kill the
    stage: a NULL shingle array arrives in the Arrow kernel as None
    (ADVICE r2 finding — np.asarray(None) raised TypeError)."""
    from reddit_etl_spark.operators.curation import decontaminate_bloom

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, None),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    flagged = {
        r.doc_id: r.n_flagged_grams
        for r in decontaminate_bloom(docs, bench, "doc_id", "text", n=5).collect()
    }
    assert 1 in flagged and flagged[1] > 0
    assert 2 not in flagged  # NULL text: no grams, not contaminated
    assert 3 not in flagged


def test_bloom_decontaminate_empty_benchmark(spark):
    from reddit_etl_spark.operators.curation import decontaminate_bloom

    docs = spark.createDataFrame(
        [(1, "some document text here with several words")],
        "doc_id long, text string",
    )
    bench = docs.filter(F.lit(False))
    assert decontaminate_bloom(docs, bench, "doc_id", "text", n=5).count() == 0


def test_weighted_sample_deterministic_and_proportional(spark):
    from reddit_etl_spark.operators.curation import weighted_sample

    # 2 heavy rows (w=1000) + 98 light rows (w=1): across many seeds the
    # heavies should be sampled far more often than any light row
    df = spark.createDataFrame(
        [(i, 1000 if i < 2 else 1) for i in range(100)], "id long, w long"
    )
    heavy_hits = light_hits = 0
    for seed in range(30):
        ids = {r.id for r in weighted_sample(df, "id", "w", k=5, seed=seed).collect()}
        assert len(ids) == 5
        heavy_hits += len(ids & {0, 1})
        light_hits += len(ids - {0, 1})
    # inclusion probability for a heavy row is ~1; lights share the rest
    assert heavy_hits >= 55  # of 60 possible
    # determinism: same seed -> identical sample
    a = {r.id for r in weighted_sample(df, "id", "w", k=5, seed=7).collect()}
    b = {r.id for r in weighted_sample(df, "id", "w", k=5, seed=7).collect()}
    assert a == b


def test_weighted_sample_consistency_under_deletion(spark):
    """Consistent-sampling property: removing non-sampled rows never
    changes which of the remaining rows survive (keys are per-row,
    independent of the rest of the frame)."""
    from reddit_etl_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(200)], "id long, w long"
    )
    full = {r.id for r in weighted_sample(df, "id", "w", k=10, seed=3).collect()}
    # drop half the non-sampled rows
    reduced = df.filter(
        F.col("id").isin([*full]) | (F.col("id") % 2 == 0)
    )
    again = {
        r.id for r in weighted_sample(reduced, "id", "w", k=10, seed=3).collect()
    }
    # every originally-sampled row still present must still win or be
    # displaced only by rows that were already ahead of it — with the
    # same key function, the top-10 of a superset restricted to the
    # subset can only IMPROVE a surviving row's rank
    assert full <= set(r.id for r in reduced.select("id").collect())
    assert full == again


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from reddit_etl_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -1), (4, None)], "id long, w long"
    )
    ids = {r.id for r in weighted_sample(df, "id", "w", k=10).collect()}
    assert ids == {1}


def test_weighted_sample_per_group_k(spark):
    from reddit_etl_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i + 1) for i in range(60)],
        "id long, g string, w long",
    )
    out = weighted_sample(df, "id", "w", k=4, group_col="g")
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 4, "g1": 4, "g2": 4}


def test_materialize_packed_text_order_and_budget(spark):
    from reddit_etl_spark.operators.curation import materialize_packed_text

    df = spark.createDataFrame(
        [
            (1, "s", "one two three", 3),
            (2, "s", "four five", 2),
            (3, "s", "six seven eight nine", 4),
            (4, "s", "ten", 1),
        ],
        "doc_id long, source string, text string, tokens long",
    )
    rows = sorted(
        materialize_packed_text(
            df, "doc_id", "text", "tokens", budget=5, group_col="source"
        ).collect(),
        key=lambda r: r.bin,
    )
    # next-fit: doc1+doc2 fill bin0 (5 tokens); doc3 starts bin1 and
    # overshoots; doc4 lands in bin1 (prior sum 9 -> floor(9/5)=1)
    assert [(r.bin, r.n_docs, r.total_tokens) for r in rows] == [
        (0, 2, 5),
        (1, 2, 5),
    ]
    assert rows[0].text == "one two three\n\nfour five"
    assert rows[1].text == "six seven eight nine\n\nten"


def test_dsir_upweights_target_like_documents(spark):
    """A document sharing the target slice's n-gram profile must score
    a higher importance log-ratio than one sharing the raw-only
    profile — the DSIR selection property."""
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.curation import dsir_logratio

    target_text = "solar panels convert sunlight into clean energy"
    offtop_text = "the stock market closed lower on tuesday again"
    rows = (
        [(i, target_text, True) for i in range(10)]
        + [(100 + i, offtop_text, False) for i in range(10)]
        + [(200, "solar panels convert sunlight", False)]  # target-like
        + [(201, "the stock market closed lower", False)]  # raw-like
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    out = {
        r.doc_id: r.dsir_logratio
        for r in dsir_logratio(
            df, "doc_id", "text", target=F.col("is_tgt"), buckets=64
        ).collect()
    }
    assert out[200] > out[201], (out[200], out[201])
    # target members themselves score above raw-only members
    assert out[0] > out[100]


def test_dsir_emits_all_nonempty_docs(spark):
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.curation import dsir_logratio

    df = spark.createDataFrame(
        [(1, "a b c", True), (2, "", False), (3, None, False), (4, "d", False)],
        "doc_id long, text string, t boolean",
    )
    out = dsir_logratio(df, "doc_id", "text", target=F.col("t")).collect()
    ids = {r.doc_id for r in out}
    assert ids == {1, 4}  # empty/null text has no grams -> absent
    ng = {r.doc_id: r.n_grams for r in out}
    assert ng[1] == 5  # 3 unigrams + 2 bigrams
    assert ng[4] == 1


# ---------------------------------------------------------------------------
# sample_per_group / psi_drift — round-5 additions
# ---------------------------------------------------------------------------


def test_sample_per_group_exact_k_and_stability(spark):
    from reddit_etl_spark.operators.curation import sample_per_group

    rows = [(g, i) for g in ("a", "b") for i in range(20)] + [("tiny", 0)]
    df = spark.createDataFrame(rows, "g string, id long")
    got = sample_per_group(df, "g", "id", k=5).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], set()).add(r["id"])
    assert len(by_g["a"]) == len(by_g["b"]) == 5
    assert by_g["tiny"] == {0}  # min(k, |group|)
    # stability: adding rows to ANOTHER group never changes a's sample
    df2 = df.unionByName(
        spark.createDataFrame([("b", i) for i in range(20, 40)], "g string, id long")
    )
    got2 = {
        r["id"]
        for r in sample_per_group(df2, "g", "id", k=5).collect()
        if r["g"] == "a"
    }
    assert got2 == by_g["a"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        sample_per_group(df, "g", "id", k=0)


def test_psi_drift_detects_shift_not_noise(spark):
    from reddit_etl_spark.operators.curation import psi_drift

    ref = spark.createDataFrame([(float(i % 100),) for i in range(500)], "v double")
    same = spark.createDataFrame([(float(i % 100),) for i in range(300)], "v double")
    shifted = spark.createDataFrame(
        [(float(i % 100) + 60,) for i in range(300)], "v double"
    )
    psi_same = psi_drift(ref, same, "v").collect()[0]["psi"]
    psi_shift = psi_drift(ref, shifted, "v").collect()[0]["psi"]
    assert psi_same < 0.01
    assert psi_shift > 0.25  # the "take action" threshold


def test_psi_drift_grouped_and_counts(spark):
    from reddit_etl_spark.operators.curation import psi_drift

    ref = spark.createDataFrame(
        [("a", float(i)) for i in range(100)]
        + [("b", float(i)) for i in range(100)],
        "g string, v double",
    )
    cur = spark.createDataFrame(
        # "a": 50 samples evenly covering the same 0..99 support;
        # "b": shifted wholesale
        [("a", float((i * 2) % 100)) for i in range(50)]
        + [("b", float(i) + 80.0) for i in range(50)],
        "g string, v double",
    )
    got = {r["g"]: r for r in psi_drift(ref, cur, "v", group_cols=["g"]).collect()}
    assert got["a"]["psi"] < 0.1 < got["b"]["psi"]
    assert got["a"]["n_ref"] == 100 and got["a"]["n_cur"] == 50


def test_materialize_packed_text_with_distinct_order_col(spark):
    from reddit_etl_spark.operators.curation import materialize_packed_text

    rows = [
        (1, "s", 10, "b-text", 2),
        (2, "s", 10, "a-text", 1),
    ]
    df = spark.createDataFrame(
        rows, "id long, source string, tokens long, text string, created long"
    )
    got = materialize_packed_text(
        df, "id", "text", "tokens", budget=100,
        group_col="source", order_col="created",
    ).collect()
    assert len(got) == 1
    # packing order follows created (2 before 1), so does the text
    assert got[0]["text"].startswith("a-text")


class TestWoeIvBins:
    def test_hand_computed_two_bins(self, spark):
        import math

        from reddit_etl_spark.operators.curation import woe_iv_bins

        # 8 rows, 2 equal-mass bins (edge = median): low values mostly
        # non-events, high values mostly events
        rows = [
            (1.0, False), (2.0, False), (3.0, False), (4.0, True),
            (11.0, True), (12.0, True), (13.0, True), (14.0, False),
        ]
        df = spark.createDataFrame(rows, ["v", "y"])
        out = {
            r["bin"]: r
            for r in woe_iv_bins(df, "v", "y", bins=2).collect()
        }
        assert set(out) == {0, 1}
        lo, hi = out[0], out[1]
        assert lo["n"] == hi["n"] == 4
        assert lo["n_event"] == 1 and hi["n_event"] == 3
        # dist_event: 1/4 vs 3/4; dist_nonevent: 3/4 vs 1/4
        assert lo["dist_event"] == 0.25 and hi["dist_event"] == 0.75
        assert lo["woe"] == round(math.log(0.25 / 0.75), 6)
        assert hi["woe"] == round(math.log(0.75 / 0.25), 6)
        want_term = round((0.75 - 0.25) * math.log(3.0), 6)
        assert hi["iv_term"] == want_term
        assert lo["iv_total"] == hi["iv_total"] == round(2 * want_term, 6)

    def test_uninformative_feature_has_near_zero_iv(self, spark):
        import random

        from reddit_etl_spark.operators.curation import woe_iv_bins

        rng = random.Random(3)
        rows = [(rng.random(), rng.random() < 0.3) for _ in range(2000)]
        df = spark.createDataFrame(rows, ["v", "y"])
        out = woe_iv_bins(df, "v", "y", bins=5).collect()
        assert out[0]["iv_total"] < 0.02  # "useless" band
        # equal-mass bins: each holds ~1/5 of the rows
        for r in out:
            assert abs(r["n"] - 400) < 120

    def test_empty_event_bin_takes_epsilon_floor(self, spark):
        from reddit_etl_spark.operators.curation import woe_iv_bins

        rows = [(float(i), i >= 10) for i in range(20)]
        df = spark.createDataFrame(rows, ["v", "y"])
        out = {
            r["bin"]: r for r in woe_iv_bins(df, "v", "y", bins=2).collect()
        }
        # bin 0 has zero events -> dist_event floored at 1e-4, WOE finite
        assert out[0]["dist_event"] == 1e-4
        assert out[0]["woe"] is not None and out[0]["woe"] < -5

    def test_bad_bins_rejected(self, spark):
        import pytest as _pytest

        from reddit_etl_spark.operators.curation import woe_iv_bins

        df = spark.createDataFrame([(1.0, True)], ["v", "y"])
        with _pytest.raises(ValueError, match="bins"):
            woe_iv_bins(df, "v", "y", bins=1)


def test_leakage_safe_splits_cluster_atomicity(spark):
    from reddit_etl_spark.operators.curation import leakage_safe_splits

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 11)], "doc_id long, text string"
    )
    # near-dup graph: {1,2,3} and {7,8} are clusters; rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    out = leakage_safe_splits(docs, "doc_id", pairs, train_fraction=0.5)
    rows = {r["doc_id"]: (r["cluster"], r["split"]) for r in out.collect()}
    assert len(rows) == 10
    # every cluster lands WHOLLY on one side
    assert rows[1] == rows[2] == rows[3]
    assert rows[7] == rows[8]
    assert rows[1][0] == 1 and rows[7][0] == 7   # min-label reps
    # singletons keep their own id as the cluster
    assert rows[5][0] == 5
    # assignments agree with split_col on the representative
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.curation import split_col

    want = {
        r["c"]: r["s"]
        for r in spark.createDataFrame(
            [(c,) for c in {v[0] for v in rows.values()}], "c long"
        ).select("c", split_col(F.col("c"), 0.5).alias("s")).collect()
    }
    for doc, (c, s) in rows.items():
        assert s == want[c], doc


def test_leakage_safe_splits_vs_naive_split_leaks(spark):
    """The motivating property: with enough near-dup pairs, a naive
    per-doc split separates at least one pair; the cluster split
    never does."""
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.curation import (
        leakage_safe_splits,
        split_col,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in range(200)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(100)], "id_a long, id_b long"
    )
    naive = {r["doc_id"]: r["s"] for r in docs.select(
        "doc_id", split_col(F.col("doc_id"), 0.5).alias("s")).collect()}
    assert any(naive[a] != naive[b] for a, b in ((i, i + 100)
                                                 for i in range(100)))
    safe = {r["doc_id"]: r["split"] for r in
            leakage_safe_splits(docs, "doc_id", pairs,
                                train_fraction=0.5).collect()}
    assert all(safe[a] == safe[b] for a, b in ((i, i + 100)
                                               for i in range(100)))


class TestNeymanAllocation:
    def test_allocates_by_size_times_sigma(self, spark):
        from reddit_etl_spark.operators.curation import neyman_allocation

        # A: N=2, sigma = sqrt(50); B: constant -> sigma 0, weight 0
        rows = [("A", 0), ("A", 10), ("B", 5), ("B", 5), ("B", 5)]
        df = spark.createDataFrame(rows, "s string, v long")
        got = {r["stratum"]: r for r in neyman_allocation(df, "s", "v", 10).collect()}
        assert got["A"]["sigma"] == round(50 ** 0.5, 6)
        assert got["B"]["sigma"] == 0.0 and got["B"]["weight"] == 0
        assert got["A"]["alloc"] == 10 and got["B"]["alloc"] == 0

    def test_largest_remainder_sums_to_budget(self, spark):
        from reddit_etl_spark.operators.curation import neyman_allocation

        # three identical strata, budget 10 -> 3/3/3 + 1 to 'A'
        rows = [(s, v) for s in ("A", "B", "C") for v in (0, 10)]
        df = spark.createDataFrame(rows, "s string, v long")
        got = {r["stratum"]: r["alloc"] for r in neyman_allocation(df, "s", "v", 10).collect()}
        assert got == {"A": 4, "B": 3, "C": 3}
        assert sum(got.values()) == 10

    def test_degenerate_inputs(self, spark):
        import pytest as _pytest

        from reddit_etl_spark.operators.curation import neyman_allocation

        # all strata constant -> all weights 0 -> all allocs 0
        df = spark.createDataFrame([("A", 1), ("A", 1)], "s string, v long")
        got = neyman_allocation(df, "s", "v", 5).collect()
        assert got[0]["alloc"] == 0
        with _pytest.raises(ValueError):
            neyman_allocation(df, "s", "v", -1)

    def test_oracle_twin_matches_on_all_constant_strata(self, spark):
        # regression: the DuckDB oracle's largest-remainder top-up
        # must carry the operator's all-zero-weight guard — on a
        # table where EVERY stratum is constant both sides allocate
        # 0 everywhere (the unguarded oracle handed +1 to up to
        # `budget` strata)
        import duckdb

        from reddit_etl_spark.harness import _REGISTRY
        from reddit_etl_spark.operators.curation import neyman_allocation

        rows = [(f"s{i}", 7) for i in range(4) for _ in range(3)]
        df = spark.createDataFrame(rows, "source string, n_chars long")
        got = {
            r["stratum"]: r["alloc"]
            for r in neyman_allocation(df, "source", "n_chars", 1000).collect()
        }
        assert got == {f"s{i}": 0 for i in range(4)}
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM (VALUES "
            + ", ".join(f"('s{i}', 7)" for i in range(4) for _ in range(3))
            + ") t(source, n_chars)"
        )
        oracle = {
            r[0]: r[4]
            for r in con.execute(
                _REGISTRY["neyman_alloc_doc_sources"].oracle
            ).fetchall()
        }
        assert oracle == got
