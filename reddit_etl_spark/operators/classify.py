"""Distributed multinomial Naive Bayes text classification.

The count-based classifier family (fastText-style quality/language
filters) expressed as pure aggregates: training is two groupBy passes
over the exploded token stream (per-class token counts + class
document/token totals), scoring is one broadcast model join and one
per-document aggregate. No gradient loop, no Python in the hot path —
the whole thing is partial-aggregable and AQE-friendly, which is what
lets it run as a single sweep over a 100 TB corpus.

Model: p(c | d) ∝ p(c) · Π_t p(t | c)^tf(d,t) with add-alpha
(Lidstone) smoothing, p(t | c) = (c(t,c) + α) / (T(c) + α·|V|), |V| =
the training vocabulary size. Tokens unseen in training score the
per-class floor (c(t,c) = 0) against the same |V| — deterministic and
engine-portable.

Float parity contract (repo-wide): per-doc log-likelihood sums use
rounded-sum averaging (round the sum to 6 BEFORE adding the prior,
round the total to 6), and the argmax ranks on the rounded score with
a class-name tiebreak — so the predicted label is identical in any
engine that agrees to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text_col


def _token_pairs(df: DataFrame, text_col: str, *carry: str) -> DataFrame:
    toks = F.explode(F.split(normalize_text_col(text_col), " ")).alias("term")
    return df.select(*carry, toks).filter(F.length("term") > 0)


def nb_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB model; returns ``(class_stats,
    term_counts)`` — both persistable DataFrames, so a 100 TB training
    sweep runs once and the model tables (|C| and |C|x|V| rows) are
    reused across scoring runs.

    class_stats: (label, n_docs, n_tokens); term_counts: (label, term,
    n). Two shuffles total, both collapsed map-side: the (label, term)
    partial aggregate and the tiny per-label rollup.
    """
    pairs = _token_pairs(df, text_col, label_col)
    term_counts = pairs.groupBy(label_col, "term").agg(
        F.count("*").cast("double").alias("n")
    )
    # per-class token totals roll up from the (label, term) aggregate —
    # |C|x|V| rows, not the corpus — and doc counts come off the base
    # frame with a broadcast-friendly |C|-row result
    tok_totals = term_counts.groupBy(label_col).agg(
        F.sum("n").alias("n_tokens")
    )
    doc_counts = df.groupBy(label_col).agg(
        F.count("*").cast("double").alias("n_docs")
    )
    class_stats = doc_counts.join(tok_totals, label_col, "left").fillna(
        0.0, subset=["n_tokens"]
    )
    return class_stats, term_counts


def nb_predict(
    df: DataFrame,
    id_col: str,
    text_col: str,
    class_stats: DataFrame,
    term_counts: DataFrame,
    label_col: str = "label",
    alpha: float = 1.0,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Score every document against every class and return the argmax:
    (id, *keep_cols, predicted, score) with score = the winning class's
    rounded log-posterior.

    Shape: the corpus aggregates to (doc, term, tf) once; a broadcast
    cross join against the |C|-row class table fans each doc-term out
    by |C| (documented, bounded by the class count); the sparse
    (label, term) model joins back broadcast (|C|x|V| rows — model
    tables are vocabulary-sized, never corpus-sized). One shuffle
    carries (doc, label, partial-sum) and the final argmax window
    touches |C| rows per doc.

    Documents with zero tokens have no likelihood terms and are absent
    from the result (same contract as the other token-stream
    operators).
    """
    keep = keep_cols or []
    pairs = _token_pairs(df, text_col, id_col, *keep)
    doc_tf = pairs.groupBy(id_col, *keep, "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    vocab_n = term_counts.select(
        F.countDistinct("term").cast("double").alias("__vn")
    )
    total_docs = class_stats.agg(F.sum("n_docs").alias("__nd"))
    classes = (
        class_stats.crossJoin(F.broadcast(total_docs))
        .crossJoin(F.broadcast(vocab_n))
        .select(
            F.col(label_col).alias("__cls"),
            F.log(F.col("n_docs") / F.col("__nd")).alias("__prior"),
            F.col("n_tokens"),
            F.col("__vn"),
        )
    )
    model = term_counts.select(
        F.col(label_col).alias("__cls"), "term", F.col("n").alias("__tc")
    )
    a = F.lit(float(alpha))
    scored = (
        doc_tf.crossJoin(F.broadcast(classes))
        .join(F.broadcast(model), ["__cls", "term"], "left")
        .withColumn(
            "__lp",
            F.col("tf")
            * F.log(
                (F.coalesce(F.col("__tc"), F.lit(0.0)) + a)
                / (F.col("n_tokens") + a * F.col("__vn"))
            ),
        )
        .groupBy(id_col, *keep, "__cls")
        .agg(
            F.round(
                F.first("__prior") + F.round(F.sum("__lp"), 6), 6
            ).alias("__score")
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__score"), F.asc("__cls"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            *keep,
            F.col("__cls").alias("predicted"),
            F.col("__score").alias("score"),
        )
    )


def nb_self_train_language(
    df: DataFrame, id_col: str, text_col: str, alpha: float = 1.0
) -> DataFrame:
    """Self-training demo pipeline: label every document with the
    heuristic marker-based language ID, train NB on those labels, and
    re-score the corpus — the distillation shape (noisy heuristic
    teacher -> trained count model) used to bootstrap quality and
    language filters when no human labels exist. Returns (id, label,
    predicted, score); `label` is the heuristic teacher's call,
    `predicted` the model's.

    The NB model generalizes beyond the teacher: documents whose
    marker words are absent (teacher says 'und') still get a real
    class posterior from the rest of their vocabulary.
    """
    from .text import lang_id_col

    labeled = df.select(
        F.col(id_col), F.col(text_col), lang_id_col(text_col).alias("label")
    )
    class_stats, term_counts = nb_train(labeled, id_col, text_col, "label")
    return nb_predict(
        labeled,
        id_col,
        text_col,
        class_stats,
        term_counts,
        label_col="label",
        alpha=alpha,
        keep_cols=["label"],
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Reliability diagram + Brier score for a probabilistic score
    against a binary outcome — the score-QUALITY audit the classifier
    family lacks: nb_predict says WHICH class, ranking_metrics says
    whether the ORDER is right; this says whether "0.8" actually
    means 80% ("is the quality-filter score a probability or just a
    monotone gadget"). Fixed-WIDTH bins, not quantile bins — so no
    global rank anywhere and the diagram's x-axis is stable across
    runs/engines/datasets (the lift/decile form needs the
    sketch-boundary machinery; the reliability form deliberately
    doesn't).

    Per bin [i/n, (i+1)/n): count, mean predicted score, observed
    positive rate, and the gap (observed - predicted, the calibration
    error with sign). Every row also carries the GLOBAL Brier score
    mean((p - y)^2) — the proper scoring rule the diagram
    decomposes — via a 1-row broadcast.

    Exactness: scores quantize to micros BIGINTs (floor(p*1e6 + 0.5)
    — exact on round-6 inputs) and are CLAMPED to [0, 1e6] on BOTH
    sides before anything reads them (a probability outside [0,1] is
    treated as saturated) — the lower clamp matters for engine
    parity, not just hygiene: a negative micros value would bin via
    Spark's ``div`` (truncates toward zero → bin 0) but via another
    engine's floor division (→ bin -1), a silent cross-engine
    divergence (advisor r9 #2). Bin ids derive from the clamped
    micros integer (micros * n_bins div 1e6, upper-clamped to
    n_bins-1 — never a double multiply whose floor could straddle an
    ulp); sums of micros and of squared-micros errors accumulate
    BIGINT / DECIMAL(38,0); every reported double is one division
    over exact integers, round-6. Rows with NULL score or label are
    excluded.

    Plan: one map-side-combined bin aggregate + one 1-row global
    aggregate broadcast back. Scan-bound at any scale.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    d38 = "decimal(38,0)"
    p_mic = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(1_000_000).cast("long"),
            F.floor(F.col(score_col) * 1_000_000 + F.lit(0.5)).cast("long"),
        ),
    )
    y = F.col(label_col).cast("boolean").cast("long")
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        p_mic.alias("__p"),
        y.alias("__y"),
    ).withColumn(
        "__bin",
        F.least(
            F.expr(f"(__p * {n_bins}) div 1000000"), F.lit(n_bins - 1)
        ).cast("long"),
    ).withColumn(
        "__e2",
        F.expr("CAST((__p - __y * 1000000) AS DECIMAL(38,0))")
        * (F.col("__p") - F.col("__y") * 1_000_000),
    )
    bins = base.groupBy("__bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__p").cast(d38).alias("__sp"),
        F.sum("__y").cast("long").alias("__sy"),
    )
    glob = base.agg(
        (
            F.sum("__e2").cast("double")
            / F.count("*")
            / F.lit(1_000_000_000_000.0)
        ).alias("__brier")
    ).select(F.round("__brier", 6).alias("brier"))
    return (
        bins.crossJoin(F.broadcast(glob))
        .select(
            F.col("__bin").alias("bin"),
            F.round(F.col("__bin") / F.lit(float(n_bins)), 6).alias(
                "bin_lo"
            ),
            "n",
            F.round(
                F.col("__sp").cast("double") / F.col("n") / 1e6, 6
            ).alias("mean_predicted"),
            F.round(F.col("__sy") / F.col("n"), 6).alias("observed_rate"),
            F.round(
                F.col("__sy") / F.col("n")
                - F.col("__sp").cast("double") / F.col("n") / 1e6,
                6,
            ).alias("gap"),
            "brier",
        )
        .orderBy("bin")
    )


def cohens_kappa(
    df: DataFrame,
    group_cols,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa per group between two categorical labelings —
    the chance-corrected agreement readout the classifier family
    lacks: raw accuracy between a heuristic rule and the ground truth
    (or two annotators, or two model versions) is inflated by
    whatever both sides predict most; kappa subtracts the agreement
    their marginals would produce by luck:

        kappa = (p_o - p_e) / (1 - p_e)
        p_o   = Σ_k n_kk / n
        p_e   = Σ_k row_k · col_k / n²

    The standard gate for "is this cheap label worth training on"
    (kappa ≥ 0.6 ~ substantial, Landis & Koch).

    Exactness: every count is a BIGINT off ONE (group, a, b) cell
    aggregate; row/col marginals re-aggregate the CELL frame (label-
    cardinality-sized, never fact-sized); the p_e cross-moment
    accumulates DECIMAL(38,0) (row·col reaches n² — past int64 at
    warehouse scale); p_o/p_e/kappa are single double expressions
    over exact integers, round-6. Degenerate groups where p_e = 1
    (both raters constant) emit NULL kappa. NULL labels on either
    side are excluded.

    Returns (group..., n BIGINT, observed_agreement, expected_agreement,
    kappa).
    """
    keys = list(group_cols)
    d38 = "decimal(38,0)"
    base = df.filter(
        F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    ).select(
        *keys,
        F.col(rater_a_col).cast("string").alias("__a"),
        F.col(rater_b_col).cast("string").alias("__b"),
    )
    cells = base.groupBy(*keys, "__a", "__b").agg(
        F.count("*").cast("long").alias("__c")
    )
    rows = cells.groupBy(*keys, "__a").agg(
        F.sum("__c").cast("long").alias("__row")
    )
    cols = cells.groupBy(*keys, "__b").agg(
        F.sum("__c").cast("long").alias("__col")
    ).withColumnRenamed("__b", "__a")
    cross = (
        rows.join(cols, [*keys, "__a"], "inner")
        .groupBy(*keys)
        .agg(
            F.sum(F.col("__row").cast(d38) * F.col("__col"))
            .cast(d38)
            .alias("__rc")
        )
    )
    diag = cells.filter(F.col("__a") == F.col("__b")).groupBy(*keys).agg(
        F.sum("__c").cast("long").alias("__diag")
    )
    tot = cells.groupBy(*keys).agg(F.sum("__c").cast("long").alias("n"))
    g = (
        tot.join(diag, keys, "left")
        .join(cross, keys, "left")
        .withColumn("__diag", F.coalesce(F.col("__diag"), F.lit(0)))
        .withColumn("__rc", F.coalesce(F.col("__rc"), F.lit(0).cast(d38)))
    )
    po = F.col("__diag") / F.col("n")
    pe = F.col("__rc").cast("double") / (
        F.col("n").cast("double") * F.col("n")
    )
    kappa = F.when(pe < 1, (po - pe) / (1 - pe))
    return g.select(
        *keys,
        "n",
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.round(kappa, 6).alias("kappa"),
    ).orderBy(*keys)


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Expected / Maximum Calibration Error — the ONE-NUMBER rollup of
    calibration_report's reliability diagram (the number a model gate
    thresholds on, where the diagram is what a human reads):

        ECE = Σ_bins (n_b / N) · |observed_b - predicted_b|
        MCE = max_bins |observed_b - predicted_b|

    Same fixed-width binning, same clamped-micros exactness contract
    as calibration_report (identical bin ids by construction); the
    per-bin gap here is computed from the EXACT integer sums, not the
    report's rounded display columns, so ECE is one double expression
    over exact integers, round-6. Brier rides along for the complete
    one-row scorecard.

    Plan: one map-side-combined bin aggregate + one |bins|-row rollup.
    Returns ONE row: (n BIGINT, n_bins BIGINT, ece, mce, brier).
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    d38 = "decimal(38,0)"
    p_mic = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(1_000_000).cast("long"),
            F.floor(F.col(score_col) * 1_000_000 + F.lit(0.5)).cast("long"),
        ),
    )
    y = F.col(label_col).cast("boolean").cast("long")
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(p_mic.alias("__p"), y.alias("__y")).withColumn(
        "__bin",
        F.least(
            F.expr(f"(__p * {n_bins}) div 1000000"), F.lit(n_bins - 1)
        ).cast("long"),
    ).withColumn(
        "__e2",
        F.expr("CAST((__p - __y * 1000000) AS DECIMAL(38,0))")
        * (F.col("__p") - F.col("__y") * 1_000_000),
    )
    bins = base.groupBy("__bin").agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("__p").cast(d38).alias("__sp"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum("__e2").cast(d38).alias("__q"),
    )
    gap = F.abs(
        F.col("__sy") / F.col("__n")
        - F.col("__sp").cast("double") / F.col("__n") / 1e6
    )
    return bins.agg(
        F.sum("__n").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_bins"),
        F.round(
            F.sum(gap * F.col("__n")) / F.sum("__n"), 6
        ).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
        F.round(
            F.sum("__q").cast("double")
            / F.sum("__n")
            / F.lit(1_000_000_000_000.0),
            6,
        ).alias("brier"),
    )


def gains_table(
    df: DataFrame,
    group_cols,
    id_col: str,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Gains / lift table per group: rank entities by score
    descending, cut into ``n_buckets`` equal-size tiles, and report
    each tile's response rate, cumulative capture and cumulative lift
    — the campaign-targeting readout ("mail decile 1 and reach 38% of
    responders at 3.8x random") that the reliability diagram
    deliberately is NOT (calibration asks whether 0.8 MEANS 80%;
    gains asks how much of the outcome the top of the ranking
    captures, which survives any monotone miscalibration).

    Determinism: the tile window orders by (score DESC, id ASC) — a
    bare score order would make tile boundaries tie-ambiguous across
    engines. Counts are exact BIGINTs; rates/capture/lift are single
    double expressions over them, round-6. NULL scores/labels are
    excluded.

    Scale: the ntile window partitions by the GROUP key — per-group
    frames are per-entity AGGREGATES (feed rollups, the rfm_scores
    contract); for a single global gains table past
    scale_lanes.EXACT_RANK_MAX_ROWS entities, use rfm_scores' sketch
    boundary lane as the template (documented trade, not silently
    planned).

    Returns (group..., bucket BIGINT, n BIGINT, positives BIGINT,
    response_rate, cum_capture, cum_lift).
    """
    if n_buckets < 2:
        raise ValueError("gains_table needs n_buckets >= 2")
    keys = list(group_cols)
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *keys,
        F.col(id_col).alias("__id"),
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("boolean").cast("long").alias("__y"),
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("__s"), F.asc("__id"))
    tiled = base.withColumn("__b", F.ntile(n_buckets).over(w))
    per = tiled.groupBy(*keys, "__b").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__y").cast("long").alias("positives"),
    )
    kw = Window.partitionBy(*keys)
    cw = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = (
        per.withColumn("__cn", F.sum("n").over(cw))
        .withColumn("__cp", F.sum("positives").over(cw))
        .withColumn("__tn", F.sum("n").over(kw))
        .withColumn("__tp", F.sum("positives").over(kw))
    )
    lift = F.when(
        F.col("__tp") > 0,
        (F.col("__cp") / F.col("__cn"))
        / (F.col("__tp") / F.col("__tn")),
    )
    return enriched.select(
        *keys,
        F.col("__b").cast("long").alias("bucket"),
        "n",
        "positives",
        F.round(F.col("positives") / F.col("n"), 6).alias("response_rate"),
        F.round(
            F.when(F.col("__tp") > 0, F.col("__cp") / F.col("__tp")), 6
        ).alias("cum_capture"),
        F.round(lift, 6).alias("cum_lift"),
    ).orderBy(*keys, "bucket")


def pr_curve(
    df: DataFrame,
    group_cols,
    score_col: str,
    label_col: str,
    thresholds=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """Precision / recall / F1 at a fixed threshold grid per group —
    the operating-point readout between calibration_report (is the
    score a probability) and gains_table (how much does the top
    capture): a deployed filter runs at ONE cutoff, and this is the
    table that cutoff is picked from.

    The grid is injected as literals (prediction = score >= t, the
    same double comparison in both engines); rows fan x|thresholds|
    into ONE map-side-combined aggregate (the pinball/bootstrap
    bounded-literal-factor shape). Counts are exact BIGINTs;
    precision/recall/F1 are single divisions, round-6; empty
    denominators yield NULL (no predictions / no positives is an
    undefined point, not zero).

    Returns (group..., threshold, predicted_pos BIGINT, tp BIGINT,
    fn BIGINT, precision, recall, f1).
    """
    keys = list(group_cols)
    ts = list(thresholds)
    if not ts:
        raise ValueError("pr_curve needs at least one threshold")
    grid = F.array(*[F.lit(float(t)) for t in ts])
    base = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(
            *keys,
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("boolean").alias("__y"),
        )
        .withColumn("__t", F.explode(grid))
    )
    pred = F.col("__s") >= F.col("__t")
    agg = base.groupBy(*keys, F.col("__t").alias("threshold")).agg(
        F.sum(pred.cast("long")).alias("predicted_pos"),
        F.sum((pred & F.col("__y")).cast("long")).alias("tp"),
        F.sum(((~pred) & F.col("__y")).cast("long")).alias("fn"),
    )
    prec = F.when(
        F.col("predicted_pos") > 0, F.col("tp") / F.col("predicted_pos")
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    )
    f1 = F.when(
        (F.col("predicted_pos") > 0)
        & (F.col("tp") + F.col("fn") > 0)
        & (F.col("tp") > 0),
        2.0 * (prec * rec) / (prec + rec),
    )
    return agg.select(
        *keys,
        "threshold",
        F.col("predicted_pos").cast("long").alias("predicted_pos"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fn").cast("long").alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy(*keys, "threshold")


def roc_auc(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    scale: int = 100,
) -> DataFrame:
    """Exact ROC AUC (with tie handling) per group — the
    threshold-free rung of the classifier-eval ladder next to
    pr_curve (fixed thresholds), calibration_report (probability
    quality) and gains_table (business lift): AUC = P(score_pos >
    score_neg) + 0.5·P(tie), i.e. the Mann-Whitney U statistic
    normalized by n_pos·n_neg, so it inherits mann_whitney_u's
    reduced-frame exactness discipline verbatim.

    Exactness: scores quantize to ``1/scale`` units (exact BIGINT
    for inputs with that many decimals); per DISTINCT score the
    midrank is (2c + t + 1)/2 off the prefix count c and tie size t,
    so the positives' 2x rank sum accumulates as exact
    DECIMAL(38,0) integers (~N² — BIGINT wraps past ~3e9 rows) and
    AUC = (2R_pos − n_pos(n_pos+1)) / (2·n_pos·n_neg) is one double
    division of exact integers, identical on any engine. No
    row-level rank window anywhere.

    Plan at scale: one groupBy (group, score) over the fact, then
    ONE ordered prefix-sum window per group over DISTINCT scores —
    bounded by the score DOMAIN (e.g. ~`scale`·range values), not
    the row count — then a 1-row-per-group reduce. Groups with no
    positives or no negatives return NULL auc (undefined, not 0).

    Returns (group_cols..., n_pos BIGINT, n_neg BIGINT, auc,
    gini) where gini = 2·auc − 1 (the accuracy ratio).
    """
    keys = [F.col(c) for c in group_cols]
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *keys,
        F.round(F.col(score_col) * scale, 0).cast("long").alias("__s"),
        F.col(label_col).cast("boolean").cast("int").alias("__y"),
    )
    per_v = base.groupBy(*group_cols, "__s").agg(
        F.sum("__y").alias("__tp"),
        F.sum(F.lit(1) - F.col("__y")).alias("__tn"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ranked = per_v.select(
        *group_cols,
        "__tp",
        "__tn",
        F.coalesce(F.sum(F.col("__tp") + F.col("__tn")).over(w), F.lit(0))
        .alias("__c"),
    ).select(
        *group_cols,
        "__tp",
        "__tn",
        # positives at this score contribute tp * (2c + t + 1) to the
        # 2x rank sum — exact integers end to end
        (
            dec(F.col("__tp"))
            * dec(
                F.lit(2) * F.col("__c") + F.col("__tp") + F.col("__tn") + 1
            )
        )
        .cast("decimal(38,0)")
        .alias("__r2p"),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.sum("__tp").cast("long").alias("n_pos"),
        F.sum("__tn").cast("long").alias("n_neg"),
        F.sum("__r2p").cast("decimal(38,0)").alias("__r2p"),
    )
    np_, nn_ = F.col("n_pos"), F.col("n_neg")
    # AUC = U_pos / (n_pos*n_neg), U_pos = R_pos - n_pos(n_pos+1)/2,
    # all in exact 2x units: (2R - np(np+1)) / (2 np nn)
    u2 = (F.col("__r2p") - dec(np_) * dec(np_ + 1)).cast("decimal(38,0)")
    auc = F.when(
        (np_ > 0) & (nn_ > 0),
        u2.cast("double") / (2.0 * np_.cast("double") * nn_.cast("double")),
    )
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(2.0 * auc - 1.0, 6).alias("gini"),
    ).orderBy(*group_cols)


def mcnemar_test(
    df: DataFrame,
    group_cols: list[str],
    rule_a_col: str,
    rule_b_col: str,
) -> DataFrame:
    """McNemar's test for PAIRED binary rules per group — "do two
    filters disagree systematically?", the question chi2_independence
    (unpaired) cannot answer: both rules fire on the SAME rows, so
    only the discordant cells carry information. b = rows where only
    rule A fires, c = only rule B; the continuity-corrected statistic
    is (|b−c|−1)²/(b+c), chi-square with 1 dof under H0 (the classic
    Edwards correction). No p-value — same (stat, dof) contract as
    chi2_independence.

    Exactness: all four cells are exact integers off ONE conditional
    aggregate; the statistic is one double expression of exact
    integers, identical on any engine. b+c = 0 (the rules never
    disagree) returns NULL stat — undefined, not 0.

    Plan at scale: a single map-side-combined groupBy over the fact —
    no join, no window, no shuffle beyond the group keys.

    Returns (group_cols..., n BIGINT, both BIGINT, only_a BIGINT,
    only_b BIGINT, neither BIGINT, mcnemar_chi2, disagree_rate).
    """
    a = F.col(rule_a_col).cast("boolean")
    b = F.col(rule_b_col).cast("boolean")
    base = df.filter(a.isNotNull() & b.isNotNull())
    agg = base.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum((a & b).cast("long")).cast("long").alias("both"),
        F.sum((a & ~b).cast("long")).cast("long").alias("only_a"),
        F.sum((~a & b).cast("long")).cast("long").alias("only_b"),
        F.sum((~a & ~b).cast("long")).cast("long").alias("neither"),
    )
    bb, cc = F.col("only_a"), F.col("only_b")
    disc = bb + cc
    stat = F.when(
        disc > 0,
        F.pow(F.abs((bb - cc).cast("double")) - 1.0, 2)
        / disc.cast("double"),
    )
    return agg.select(
        *group_cols,
        "n",
        "both",
        "only_a",
        "only_b",
        "neither",
        F.round(stat, 6).alias("mcnemar_chi2"),
        F.round(disc.cast("double") / F.col("n"), 6).alias("disagree_rate"),
    ).orderBy(*group_cols)


def decision_stump(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    max_distinct: int = 100_000,
) -> DataFrame:
    """Best single-threshold split of a numeric feature against a
    binary label by information gain — the 1-node decision tree that
    answers "is there ONE cutoff on this quality signal that
    separates the classes, and how much does it buy?" (the
    interpretable baseline every learned quality classifier gets
    compared to). Split form: feature <= t goes left; the chosen t
    maximizes gain with a smallest-t tiebreak, so the answer is
    engine-deterministic.

    Exactness: candidate thresholds are the DISTINCT feature values;
    per value the (pos, neg) counts are exact integers and ONE
    ordered prefix-sum window turns them into exact left/right class
    counts per candidate. Entropies are then identical double
    expressions of exact integers (x·ln x terms over 4 cells), and
    the argmax ranks on the round-6 gain with the threshold
    tiebreak. The all-one-side candidate (t = max value) is excluded
    — a split must leave both children non-empty.

    Plan at scale: one groupBy (feature) over the fact, one ordered
    prefix window over the DISTINCT-value frame, one global top-1
    (TakeOrderedAndProject). The window is single-partition, bounded
    by the value DOMAIN, not the row count — but a genuinely
    continuous feature makes the domain the row count, so the
    operator HLL-counts distinct values first (NDV_SKETCH_RSD
    accuracy — a blow-up detector, not a census) and FAILS FAST
    above ``max_distinct`` (theil_sen convention: silent
    quantization would change the answer — the caller opts in by
    binning upstream, e.g. F.round(feature, 2)).

    Returns one row: (threshold, n BIGINT, n_left BIGINT, n_right
    BIGINT, pos_left BIGINT, pos_right BIGINT, entropy_parent,
    gain_nats).
    """
    base = df.filter(
        F.col(feature_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(feature_col).cast("double").alias("__x"),
        F.col(label_col).cast("boolean").cast("long").alias("__y"),
    )
    per_v = base.groupBy("__x").agg(
        F.sum("__y").alias("__p"),
        (F.count("*") - F.sum("__y")).alias("__q"),
    )
    # fail-fast guard (scale_lanes count-then-branch convention): one
    # approx NDV aggregate over two fact columns — the same scan the
    # per_v groupBy pays — before committing to the single-partition
    # candidate window. Silent quantization would change the chosen
    # threshold, so above the bound the caller must bin explicitly.
    from .scale_lanes import NDV_SKETCH_RSD

    n_distinct = base.agg(
        F.approx_count_distinct("__x", rsd=NDV_SKETCH_RSD).alias("d")
    ).collect()[0]["d"]
    if n_distinct > max_distinct:
        raise ValueError(
            f"decision_stump: ~{n_distinct} distinct feature values "
            f"exceed max_distinct={max_distinct}; bin the feature "
            f"upstream (e.g. F.round(col, 2)) — silent quantization "
            f"would change the chosen threshold"
        )
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_v.agg(
        F.sum("__p").cast("long").alias("__tp"),
        F.sum("__q").cast("long").alias("__tq"),
    )
    cum = per_v.select(
        "__x",
        F.sum("__p").over(w).cast("long").alias("__lp"),
        F.sum("__q").over(w).cast("long").alias("__lq"),
    ).crossJoin(F.broadcast(tot))
    # plogp(k, n): k/n * ln(k/n) with the 0 ln 0 = 0 convention, as
    # the identical expression both engines evaluate over exact ints
    def ent(p, q):
        n = (p + q).cast("double")
        return -(
            F.when(p > 0, p.cast("double") / n * F.log(p.cast("double") / n))
            .otherwise(F.lit(0.0))
            + F.when(
                q > 0, q.cast("double") / n * F.log(q.cast("double") / n)
            ).otherwise(F.lit(0.0))
        )

    lp, lq = F.col("__lp"), F.col("__lq")
    tp, tq = F.col("__tp"), F.col("__tq")
    rp, rq = tp - lp, tq - lq
    nl, nr = lp + lq, rp + rq
    n = tp + tq
    h_parent = ent(tp, tq)
    gain = h_parent - (
        nl.cast("double") / n.cast("double") * ent(lp, lq)
        + nr.cast("double") / n.cast("double") * ent(rp, rq)
    )
    cand = cum.filter(nr > 0).select(
        F.col("__x").alias("threshold"),
        n.cast("long").alias("n"),
        nl.cast("long").alias("n_left"),
        nr.cast("long").alias("n_right"),
        lp.cast("long").alias("pos_left"),
        rp.cast("long").alias("pos_right"),
        F.round(h_parent, 6).alias("entropy_parent"),
        F.round(gain, 6).alias("gain_nats"),
    )
    return cand.orderBy(F.col("gain_nats").desc(), F.col("threshold")).limit(
        1
    )


def cochran_q(
    df: DataFrame,
    group_cols: list[str],
    rule_cols: list[str],
) -> DataFrame:
    """Cochran's Q test for k PAIRED binary rules per group — the
    k-rule extension of mcnemar_test (k = 2 reduces to McNemar's
    uncorrected chi-square): "do these k filters fire at genuinely
    different rates on the same rows?" Q = k(k−1)·Σⱼ(Cⱼ − T/k)² /
    (k·T − ΣᵢRᵢ²), Cⱼ = per-rule fire counts, Rᵢ = per-row fire
    count, T = ΣRᵢ; chi-square with k−1 dof under H0. Rows where
    every rule agrees (Rᵢ = 0 or k) carry no information and drop
    out of the denominator naturally.

    Exactness: Cⱼ, T, ΣRᵢ² are exact integers off ONE conditional
    aggregate (Rᵢ and Rᵢ² are row-local byte arithmetic over the k
    columns); Q is one double expression of exact integers; the Σⱼ
    numerator is an at-most-k-term double fold of exact values.
    Degenerate groups (denominator 0) return NULL q.

    Plan at scale: one map-side-combined aggregate over the fact —
    no join, no window; k widens the projection, not the shuffle.

    Returns (group_cols..., n BIGINT, k_rules BIGINT, then one
    fires_<rule> BIGINT per rule, cochran_q).
    """
    k = len(rule_cols)
    if k < 2:
        raise ValueError("cochran_q: need at least 2 rule columns")
    bools = [F.col(c).cast("boolean") for c in rule_cols]
    cond = bools[0].isNotNull()
    for b in bools[1:]:
        cond = cond & b.isNotNull()
    base = df.filter(cond)
    ri = sum((b.cast("long") for b in bools[1:]), bools[0].cast("long"))
    aggs = [F.count("*").cast("long").alias("n")]
    for c, b in zip(rule_cols, bools):
        aggs.append(
            F.sum(b.cast("long")).cast("long").alias(f"fires_{c}")
        )
    aggs.append(F.sum(ri).cast("long").alias("__t"))
    aggs.append(F.sum(ri * ri).cast("long").alias("__r2"))
    agg = base.groupBy(*group_cols).agg(*aggs)
    t = F.col("__t").cast("double")
    r2 = F.col("__r2").cast("double")
    kd = float(k)
    num = None
    for c in rule_cols:
        term = (
            F.col(f"fires_{c}").cast("double") - t / F.lit(kd)
        )
        term = term * term
        num = term if num is None else num + term
    den = F.lit(kd) * t - r2
    q = F.when(den > 0, F.lit(kd * (kd - 1.0)) * num / den)
    return agg.select(
        *group_cols,
        "n",
        F.lit(k).cast("long").alias("k_rules"),
        *[F.col(f"fires_{c}") for c in rule_cols],
        F.round(q, 6).alias("cochran_q"),
    ).orderBy(*group_cols)


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    category_col: str,
) -> DataFrame:
    """Fleiss' kappa for inter-rater agreement with r raters per item
    — the k-rater extension of cohens_kappa (2 raters): each row is
    one rating (item, category); κ = (P̄ − P_e)/(1 − P_e) with P_i =
    (Σⱼn_ij² − r)/(r(r−1)) and P_e = Σⱼp_j². The agreement audit for
    LLM labeling runs with 3+ annotators (or 3+ model-as-judge
    votes): "is the label noise random or systematic". The design
    requires a CONSTANT rater count per item — unequal counts RAISE
    (an in-plan guard) rather than silently biasing P̄.

    Exactness: all n_ij, r, N, category totals are exact integers
    off two aggregates; P̄ and P_e are double folds over the item and
    category frames (each term a double of exact integers; the item
    fold is N-sized — its summation-order ulp is ~1e-16·√N relative
    on a mean, invisible at round-6). κ is one double expression.

    Plan at scale: one (item, category) aggregate, one item rollup,
    one category rollup — all map-side-combined; no window, no join
    beyond two broadcast 1-row totals.

    Returns one row: (n_items BIGINT, n_raters BIGINT, k_categories
    BIGINT, p_bar, p_e, fleiss_kappa).
    """
    base = df.filter(
        F.col(item_col).isNotNull() & F.col(category_col).isNotNull()
    ).select(
        F.col(item_col).alias("__i"), F.col(category_col).alias("__c")
    )
    nij = base.groupBy("__i", "__c").agg(F.count("*").alias("__n"))
    per_i = nij.groupBy("__i").agg(
        F.sum("__n").cast("long").alias("__r"),
        F.sum(F.col("__n") * F.col("__n")).cast("long").alias("__sq"),
    )
    rstats = per_i.agg(
        F.min("__r").alias("__rmin"), F.max("__r").alias("__rmax")
    )
    per_i = per_i.crossJoin(F.broadcast(rstats)).withColumn(
        "__r",
        F.when(
            F.col("__rmin") == F.col("__rmax"), F.col("__r")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "fleiss_kappa: unequal rater counts per item "
                        "(min "
                    ),
                    F.col("__rmin").cast("string"),
                    F.lit(", max "),
                    F.col("__rmax").cast("string"),
                    F.lit(") — the design requires constant r"),
                )
            )
        ),
    )
    items = per_i.agg(
        F.count("*").cast("long").alias("n_items"),
        F.max("__r").cast("long").alias("n_raters"),
        F.sum(
            (F.col("__sq") - F.col("__r")).cast("double")
            / (
                F.col("__r").cast("double")
                * (F.col("__r") - 1).cast("double")
            )
        ).alias("__psum"),
    )
    cats = nij.groupBy("__c").agg(
        F.sum("__n").cast("long").alias("__cn")
    )
    cat_stats = cats.agg(
        F.count("*").cast("long").alias("k_categories"),
        F.sum("__cn").cast("long").alias("__total"),
        F.sum(
            F.col("__cn").cast("double") * F.col("__cn").cast("double")
        ).alias("__csq"),
    )
    j = items.crossJoin(F.broadcast(cat_stats))
    p_bar = F.col("__psum") / F.col("n_items").cast("double")
    p_e = F.col("__csq") / (
        F.col("__total").cast("double") * F.col("__total").cast("double")
    )
    ok = (F.col("n_items") > 0) & (F.col("n_raters") >= 2)
    kappa = F.when(ok & (p_e < 1.0), (p_bar - p_e) / (1.0 - p_e))
    return j.select(
        "n_items",
        "n_raters",
        "k_categories",
        F.round(F.when(ok, p_bar), 6).alias("p_bar"),
        F.round(F.when(ok, p_e), 6).alias("p_e"),
        F.round(kappa, 6).alias("fleiss_kappa"),
    )


def bowker_test(
    df: DataFrame,
    rating_a_col: str,
    rating_b_col: str,
) -> DataFrame:
    """Bowker's test of symmetry / marginal homogeneity over a k×k
    paired-ratings table — mcnemar_test's generalization from binary
    to k categories (Bowker 1948; k = 2 reduces exactly to McNemar):
    each unit is categorized twice (two raters, two model versions,
    two time halves) and B = Σ_{i<j} (n_ij − n_ji)²/(n_ij + n_ji)
    asks whether the DISAGREEMENTS are directionally balanced —
    "when users change their dominant behavior, do the flows run
    both ways or drift one way". Pairs with n_ij + n_ji = 0 drop
    from both B and dof (the standard treatment); dof = the number
    of contributing off-diagonal pairs. chi2 contract — no p-value.

    Exactness: cell counts are exact BIGINTs off ONE (a, b)
    aggregate; each pair term is one double division of exact
    integers and the fold runs over the k²-bounded cell frame.

    Plan at scale: one count aggregate over the fact, one
    k²-bounded self-join of the cell frame on the mirrored key
    (broadcast — cells are category-cardinality-sized), one 1-row
    reduce.

    Returns one row: (k BIGINT, n BIGINT, n_disagree BIGINT, dof
    BIGINT, chi2_bowker) — k counts distinct categories seen in
    either column; chi2 NULL when no off-diagonal pair contributes.
    """
    base = df.filter(
        F.col(rating_a_col).isNotNull() & F.col(rating_b_col).isNotNull()
    ).select(
        F.col(rating_a_col).cast("string").alias("__ra"),
        F.col(rating_b_col).cast("string").alias("__rb"),
    )
    cells = base.groupBy("__ra", "__rb").agg(
        F.count("*").cast("long").alias("__n")
    )
    upper = cells.filter(F.col("__ra") < F.col("__rb")).select(
        F.col("__ra").alias("__i"),
        F.col("__rb").alias("__j"),
        F.col("__n").alias("__nij"),
    )
    lower = cells.filter(F.col("__ra") > F.col("__rb")).select(
        F.col("__rb").alias("__i"),
        F.col("__ra").alias("__j"),
        F.col("__n").alias("__nji"),
    )
    # Spark cannot broadcast a FULL OUTER join (the srm_check lesson,
    # advisor r10) — seat both one-sided pairs via a broadcast left
    # join plus a broadcast left-anti re-injection instead
    both = upper.join(F.broadcast(lower), ["__i", "__j"], "left").select(
        F.col("__nij"),
        F.coalesce(F.col("__nji"), F.lit(0)).alias("__nji"),
    )
    only_lower = lower.join(
        F.broadcast(upper), ["__i", "__j"], "left_anti"
    ).select(F.lit(0).cast("long").alias("__nij"), F.col("__nji"))
    pairs = both.unionByName(only_lower)
    d = (F.col("__nij") - F.col("__nji")).cast("double")
    s = (F.col("__nij") + F.col("__nji")).cast("double")
    pair_agg = pairs.agg(
        F.count("*").cast("long").alias("dof"),
        F.sum(F.col("__nij") + F.col("__nji")).cast("long").alias(
            "n_disagree"
        ),
        F.sum(F.when(s > 0, d * d / s)).alias("__b"),
    )
    kcats = (
        base.select(F.col("__ra").alias("__c"))
        .unionByName(base.select(F.col("__rb").alias("__c")))
        .agg(F.count_distinct("__c").cast("long").alias("k"))
    )
    tot = base.agg(F.count("*").cast("long").alias("n"))
    agg = (
        pair_agg.crossJoin(F.broadcast(kcats)).crossJoin(F.broadcast(tot))
    )
    return agg.select(
        F.coalesce(F.col("k"), F.lit(0)).cast("long").alias("k"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.col("n_disagree"), F.lit(0)).cast("long").alias(
            "n_disagree"
        ),
        F.coalesce(F.col("dof"), F.lit(0)).cast("long").alias("dof"),
        F.round(F.col("__b"), 6).alias("chi2_bowker"),
    )


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Murphy decomposition of the Brier score — WHY a probabilistic
    score is bad, where calibration_report's brier says only HOW bad:
    over fixed-width bins, brier_binned = RELIABILITY − RESOLUTION +
    UNCERTAINTY, where reliability Σn_k(p̄_k − ō_k)²/N is the
    calibration penalty (fixable by recalibrating), resolution
    Σn_k(ō_k − ō)²/N is the discrimination reward (not fixable
    without a better score), and uncertainty ō(1 − ō) is the
    irreducible base-rate floor. The decomposition is EXACT for the
    bin-averaged forecast; the raw per-row brier differs by the
    within-bin forecast variance (reported alongside — the gap IS
    that variance, a binning-fineness diagnostic).

    Exactness: the calibration_report micros discipline verbatim —
    scores clamp to [0, 1e6] micros, bin ids by integer division,
    all bin sums exact BIGINT/DECIMAL(38,0); every output is a
    double expression of exact integers, round-6.

    Plan at scale: one map-side-combined bin aggregate (≤ n_bins
    rows) + one 1-row fold. Scan-bound.

    Returns one row: (n BIGINT, n_bins BIGINT, base_rate, brier,
    brier_binned, reliability, resolution, uncertainty).
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    d38 = "decimal(38,0)"
    p_mic = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(1_000_000).cast("long"),
            F.floor(F.col(score_col) * 1_000_000 + F.lit(0.5)).cast("long"),
        ),
    )
    y = F.col(label_col).cast("boolean").cast("long")
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(p_mic.alias("__p"), y.alias("__y"))
    # integer-exact bin id: __p*n_bins <= 2e7 is exact in double and
    # the quotient can only sit >= 1e-6 below an integer boundary, so
    # floor is ulp-stable (the calibration_report div discipline)
    bin_id = F.least(
        F.lit(n_bins - 1).cast("long"),
        F.floor(F.col("__p") * n_bins / 1_000_000).cast("long"),
    ).cast("long")
    per_bin = base.groupBy(bin_id.alias("__b")).agg(
        F.count("*").cast("long").alias("__nk"),
        F.sum("__p").cast("long").alias("__sp"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum(
            (
                (F.col("__p") - F.col("__y") * 1_000_000).cast(d38)
                * (F.col("__p") - F.col("__y") * 1_000_000).cast(d38)
            ).cast(d38)
        )
        .cast(d38)
        .alias("__se"),
    )
    glob = per_bin.agg(
        F.sum("__nk").cast("long").alias("n"),
        F.sum("__sy").cast("long").alias("__ty"),
        F.sum("__se").cast(d38).alias("__tse"),
    )
    j = per_bin.crossJoin(F.broadcast(glob))
    nk = F.col("__nk").cast("double")
    nn = F.col("n").cast("double")
    pbar = F.col("__sp").cast("double") / nk / 1e6
    obar_k = F.col("__sy").cast("double") / nk
    obar = F.col("__ty").cast("double") / nn
    terms = j.agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.col("__ty")).cast("long").alias("__ty"),
        F.max(
            F.col("__tse").cast("string").cast("double")
        ).alias("__tse"),
        F.sum(nk * (pbar - obar_k) * (pbar - obar_k)).alias("__rel_n"),
        F.sum(nk * (obar_k - obar) * (obar_k - obar)).alias("__res_n"),
    )
    nn2 = F.col("n").cast("double")
    ob = F.col("__ty").cast("double") / nn2
    rel = F.col("__rel_n") / nn2
    res = F.col("__res_n") / nn2
    unc = ob * (1.0 - ob)
    brier = F.col("__tse") / nn2 / 1e12
    ok = F.col("n") > 0
    return terms.select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.lit(n_bins).cast("long").alias("n_bins"),
        F.round(F.when(ok, ob), 6).alias("base_rate"),
        F.round(F.when(ok, brier), 6).alias("brier"),
        F.round(F.when(ok, rel - res + unc), 6).alias("brier_binned"),
        F.round(F.when(ok, rel), 6).alias("reliability"),
        F.round(F.when(ok, res), 6).alias("resolution"),
        F.round(F.when(ok, unc), 6).alias("uncertainty"),
    )


def youden_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Youden-J-optimal decision threshold from the ROC — the
    OPERATING POINT roc_auc's area deliberately doesn't pick:
    J(t) = TPR(t) − FPR(t) over thresholds "predict positive when
    score ≥ t", maximized; the standard threshold choice when false
    positives and false negatives cost the same. Ties on J break
    toward the LOWEST threshold (more recall at equal J) —
    deterministic, shared with the oracle.

    Exactness: scores quantize to ``1/scale``; at each distinct
    score the cumulative positive/negative counts from above are
    exact integers off ONE guarded descending prefix window
    (roc_auc's reduced-frame discipline), and the argmax runs on the
    exact integer J numerator cpos·N_neg − cneg·N_pos — never a
    double comparison.

    Plan at scale: one (score) aggregate, ONE guarded descending
    prefix window over distinct scores, one 1-row argmax reduce.

    Returns one row: (n BIGINT, n_pos BIGINT, n_neg BIGINT,
    threshold, tpr, fpr, youden_j) — NULL when either class is
    empty.
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    from .scale_lanes import guard_rows_or_raise

    y = F.col(label_col).cast("boolean").cast("long")
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.round(F.col(score_col) * scale, 0).cast("long").alias("__v"),
        y.alias("__y"),
    )
    per_v = base.groupBy("__v").agg(
        F.sum("__y").alias("__tp"),
        F.sum(F.lit(1) - F.col("__y")).alias("__tn"),
    )
    # merged guard (round-13 opt): the totals crossJoin doubles as the
    # fail-fast — one pass over the distinct score frame instead of
    # guard_distinct_frame's second count aggregate + second broadcast
    w = (
        Window.orderBy(F.col("__v").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per_v.agg(
        F.sum("__tp").cast("long").alias("__np"),
        F.sum("__tn").cast("long").alias("__nn"),
        F.count(F.lit(1)).alias("__fr"),
    )
    run = (
        per_v.crossJoin(F.broadcast(tot))
        .filter(guard_rows_or_raise(F.col("__fr"), "youden_threshold"))
        .select(
            "__v",
            F.sum("__tp").over(w).alias("__cp"),
            F.sum("__tn").over(w).alias("__cn"),
            "__np",
            "__nn",
        )
    )
    # exact integer J numerator: cpos*N_neg - cneg*N_pos
    jnum = (
        dec(F.col("__cp")) * dec(F.col("__nn"))
        - dec(F.col("__cn")) * dec(F.col("__np"))
    ).cast("decimal(38,0)")
    ranked = run.select(
        "__v", "__cp", "__cn", "__np", "__nn", jnum.alias("__j")
    )
    best = ranked.orderBy(F.col("__j").desc(), F.col("__v").asc()).limit(1)

    def dbl(c):
        return c.cast("string").cast("double")

    np_, nn_ = F.col("__np"), F.col("__nn")
    ok = (np_ > 0) & (nn_ > 0)
    tpr = F.col("__cp").cast("double") / np_.cast("double")
    fpr = F.col("__cn").cast("double") / nn_.cast("double")
    return best.select(
        (np_ + nn_).cast("long").alias("n"),
        np_.cast("long").alias("n_pos"),
        nn_.cast("long").alias("n_neg"),
        F.round(
            F.when(ok, F.col("__v").cast("double") / F.lit(float(scale))),
            6,
        ).alias("threshold"),
        F.round(F.when(ok, tpr), 6).alias("tpr"),
        F.round(F.when(ok, fpr), 6).alias("fpr"),
        F.round(F.when(ok, tpr - fpr), 6).alias("youden_j"),
    )


def weighted_kappa(
    df: DataFrame,
    rating_a_col: str,
    rating_b_col: str,
    categories: list,
    weights: str = "linear",
) -> DataFrame:
    """Cohen's weighted kappa over ORDINAL paired ratings —
    kappa_rule_events' ordinal upgrade (and bowker_test's
    agreement-strength complement): disagreeing by one tier is not
    the same as disagreeing by four, so disagreement weights
    w_ij = |i−j|/(k−1) (``weights='linear'``) or ((i−j)/(k−1))²
    (``'quadratic'`` — the ICC-equivalent form) scale each cell's
    penalty; κ_w = 1 − Σw·p_obs / Σw·p_exp with the usual
    independence expectation. ``categories`` is the ordered literal
    (shared with the oracle); ratings outside it RAISE.

    Exactness: observed cells and both marginals are exact BIGINTs
    off ONE (a, b) aggregate; the k×k expected grid is a broadcast
    marginal cross join; both weighted sums fold over ≤k² rows as
    doubles of exact integers with injected rational weights.

    Plan at scale: one cell aggregate + k-bounded marginal frames +
    one k²-row fold. Nothing fact-sized past the first shuffle.

    Returns one row: (n BIGINT, k BIGINT, po_w, pe_w, kappa_w) —
    NULL kappa when the expected disagreement is 0 (a constant
    rating pair).
    """
    if weights not in ("linear", "quadratic"):
        raise ValueError(
            f"weights must be linear|quadratic, got {weights!r}"
        )
    k = len(categories)
    if k < 2:
        raise ValueError("weighted_kappa needs >= 2 ordered categories")

    def ordx(col):
        e = F.lit(None).cast("int")
        for i, cname in enumerate(categories):
            e = F.when(F.col(col) == cname, F.lit(i)).otherwise(e)
        return F.coalesce(
            e,
            F.raise_error(
                F.concat(
                    F.lit("weighted_kappa: rating outside categories: "),
                    F.col(col).cast("string"),
                )
            ).cast("int"),
        )

    base = df.filter(
        F.col(rating_a_col).isNotNull() & F.col(rating_b_col).isNotNull()
    ).select(ordx(rating_a_col).alias("__i"), ordx(rating_b_col).alias("__j"))
    cells = base.groupBy("__i", "__j").agg(
        F.count("*").cast("long").alias("__f")
    )
    tot = cells.agg(F.sum("__f").cast("long").alias("__n"))
    ma = cells.groupBy("__i").agg(F.sum("__f").cast("long").alias("__fa"))
    mb = cells.groupBy("__j").agg(F.sum("__f").cast("long").alias("__fb"))

    def wexpr(i, j):
        d = F.abs(i - j).cast("double") / F.lit(float(k - 1))
        return d * d if weights == "quadratic" else d

    po = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                wexpr(F.col("__i"), F.col("__j"))
                * F.col("__f").cast("double")
                / F.col("__n").cast("double")
            ).alias("__po")
        )
    )
    pe = (
        ma.crossJoin(F.broadcast(mb))
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                wexpr(F.col("__i"), F.col("__j"))
                * F.col("__fa").cast("double")
                * F.col("__fb").cast("double")
                / (
                    F.col("__n").cast("double")
                    * F.col("__n").cast("double")
                )
            ).alias("__pe")
        )
    )
    agg = tot.crossJoin(F.broadcast(po)).crossJoin(F.broadcast(pe))
    ok = (F.col("__n") > 0) & (F.col("__pe") > 0)
    return agg.select(
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.round(F.col("__po"), 6).alias("po_w"),
        F.round(F.col("__pe"), 6).alias("pe_w"),
        F.round(
            F.when(ok, 1.0 - F.col("__po") / F.col("__pe")), 6
        ).alias("kappa_w"),
    )


def cohens_h(
    df: DataFrame,
    class_col: str,
    class_a,
    outcome_col: str,
) -> DataFrame:
    """Cohen's h effect size between two proportions — the
    proportion-scale companion to cohens_d (means) and cliffs_delta
    (dominance): h = 2·asin√p_a − 2·asin√p_b, the arcsine-stabilized
    difference whose detectability is constant across the base-rate
    range (a 1pp lift at p=0.5 and at p=0.01 are wildly different
    effects; h says so where the raw risk difference lies). Rows
    with a class outside {class_a, anything-else} split as a vs b —
    feed a two-class frame for a crisp contrast.

    Exactness: the four counts are exact off ONE conditional
    aggregate; h is a single double expression (asin is IEEE-pinned
    on both engines to the final ulp — invisible at round-6).

    Plan at scale: ONE map-side-combined aggregate — no window, no
    join.

    Returns one row: (n_a BIGINT, n_b BIGINT, p_a, p_b, risk_diff,
    cohens_h) — NULLs when either class is empty.
    """
    is_a = F.col(class_col) == class_a
    y = F.col(outcome_col).cast("boolean").cast("long")
    base = df.filter(
        F.col(class_col).isNotNull() & F.col(outcome_col).isNotNull()
    ).select(is_a.alias("__a"), y.alias("__y"))
    agg = base.agg(
        F.sum(F.col("__a").cast("long")).cast("long").alias("n_a"),
        F.sum((~F.col("__a")).cast("long")).cast("long").alias("n_b"),
        F.sum(F.when(F.col("__a"), F.col("__y"))).cast("long").alias("__ra"),
        F.sum(F.when(~F.col("__a"), F.col("__y"))).cast("long").alias("__rb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    pa = F.coalesce(F.col("__ra"), F.lit(0)).cast("double") / na
    pb = F.coalesce(F.col("__rb"), F.lit(0)).cast("double") / nb
    h = 2.0 * F.asin(F.sqrt(pa)) - 2.0 * F.asin(F.sqrt(pb))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        F.coalesce(F.col("n_a"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("long").alias("n_b"),
        F.round(F.when(F.col("n_a") > 0, pa), 6).alias("p_a"),
        F.round(F.when(F.col("n_b") > 0, pb), 6).alias("p_b"),
        F.round(F.when(ok, pa - pb), 6).alias("risk_diff"),
        F.round(F.when(ok, h), 6).alias("cohens_h"),
    )


def krippendorff_alpha(
    df: DataFrame, unit_col: str, value_col: str
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) from long-format ratings
    (one row per (unit, rating)) — the agreement coefficient that,
    unlike fleiss_kappa's constant-r design, tolerates MISSING
    ratings: units with any number of raters contribute, units with
    fewer than two pairable ratings drop out. The labeling-ops rung
    for "k annotators, incomplete coverage" — exactly what a
    model-as-judge run over a sampled corpus produces.

    Computational form (Krippendorff 2004, nominal): with n_uc the
    count of category c in unit u, m_u = Σ_c n_uc (pairable units
    m_u ≥ 2 only), N = Σ_u m_u and n_c = Σ_u n_uc:
    D_o = (1/N)·Σ_u Σ_c n_uc(m_u − n_uc)/(m_u − 1),
    D_e = Σ_c n_c(N − n_c) / (N(N−1)), α = 1 − D_o/D_e.

    Exactness: all counts exact BIGINTs off one (unit, value)
    aggregate; one unit-level rollup + one category rollup; the fold
    is double expressions of exact integers.

    Plan at scale: one (unit, value) aggregate, one (unit) rollup,
    one (value) rollup, two 1-row reduces crossed via broadcast. No
    window, no pair join (the within-unit pair sums collapse into
    the n_uc(m_u − n_uc) closed form).

    Returns one row: (n_units BIGINT, n_ratings BIGINT, k_categories
    BIGINT, d_o, d_e, alpha) — alpha NULL when D_e degenerates.
    """
    nuc = (
        df.filter(
            F.col(unit_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(
            F.col(unit_col).alias("__u"), F.col(value_col).alias("__c")
        )
        .agg(F.count("*").alias("__n"))
    )
    per_u = nuc.groupBy("__u").agg(
        F.sum("__n").alias("__m"),
        F.sum(F.col("__n").cast("double") * F.col("__n").cast("double"))
        .alias("__sq"),
    ).filter(F.col("__m") >= 2)
    # Σ_c n_uc(m_u − n_uc) = m_u² − Σ_c n_uc²
    units = per_u.agg(
        F.count("*").cast("long").alias("n_units"),
        F.sum("__m").cast("long").alias("__nn"),
        F.sum(
            (
                F.col("__m").cast("double") * F.col("__m").cast("double")
                - F.col("__sq")
            )
            / (F.col("__m").cast("double") - 1.0)
        ).alias("__do_sum"),
    )
    # category margins over PAIRABLE units only
    ncs = (
        nuc.join(F.broadcast(per_u.select("__u")), "__u")
        .groupBy("__c")
        .agg(F.sum("__n").alias("__nc"))
    )
    cats = ncs.agg(
        F.count("*").cast("long").alias("k_categories"),
        F.sum(
            F.col("__nc").cast("double") * F.col("__nc").cast("double")
        ).alias("__csq"),
    )
    agg = units.crossJoin(F.broadcast(cats))
    nn = F.col("__nn").cast("double")
    d_o = F.col("__do_sum") / nn
    d_e = (nn * nn - F.col("__csq")) / (nn * (nn - 1.0))
    ok = (F.col("__nn") >= 2) & (d_e > 0)
    return agg.select(
        "n_units",
        F.coalesce(F.col("__nn"), F.lit(0)).cast("long").alias("n_ratings"),
        F.coalesce(F.col("k_categories"), F.lit(0))
        .cast("long")
        .alias("k_categories"),
        F.round(F.when(F.col("__nn") >= 2, d_o), 6).alias("d_o"),
        F.round(F.when(ok, d_e), 6).alias("d_e"),
        F.round(F.when(ok, 1.0 - d_o / d_e), 6).alias("alpha"),
    )


def gwets_ac1(df: DataFrame, ra_col: str, rb_col: str) -> DataFrame:
    """Gwet's AC1 for two raters — the prevalence-robust companion to
    cohens_kappa: kappa collapses toward 0 when one category
    dominates (the "kappa paradox" — 95% raw agreement, kappa 0.2),
    because its chance term squares the marginals; AC1's chance term
    pe = (1/(q−1))·Σ_c π_c(1−π_c) with π_c = (p_Ac + p_Bc)/2 stays
    calibrated under skew, which is the normal condition for quality
    rules (most documents pass).

    Exactness: one (ra, rb) cell aggregate with exact counts; the
    marginal shares and the fold are double expressions.

    Plan at scale: one cell aggregate (category²-bounded), two
    margin rollups of it, one 1-row reduce. No window, no re-scan.

    Returns one row: (n BIGINT, q BIGINT, po, pe, ac1) — NULLs when
    pe degenerates.
    """
    cells = (
        df.filter(F.col(ra_col).isNotNull() & F.col(rb_col).isNotNull())
        .groupBy(F.col(ra_col).alias("__a"), F.col(rb_col).alias("__b"))
        .agg(F.count("*").alias("__n"))
    )
    ma = cells.groupBy(F.col("__a").alias("__c")).agg(
        F.sum("__n").alias("__na")
    )
    mb = cells.groupBy(F.col("__b").alias("__c")).agg(
        F.sum("__n").alias("__nb")
    )
    marg = ma.join(mb, "__c", "full").select(
        "__c",
        F.coalesce(F.col("__na"), F.lit(0)).alias("__na"),
        F.coalesce(F.col("__nb"), F.lit(0)).alias("__nb"),
    )
    tot = cells.agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n"))).alias(
            "__agree"
        ),
    )
    mfold = marg.crossJoin(F.broadcast(tot)).agg(
        F.count("*").cast("long").alias("q"),
        F.sum(
            (
                (
                    F.col("__na").cast("double")
                    + F.col("__nb").cast("double")
                )
                / (2.0 * F.col("n").cast("double"))
            )
            * (
                1.0
                - (
                    F.col("__na").cast("double")
                    + F.col("__nb").cast("double")
                )
                / (2.0 * F.col("n").cast("double"))
            )
        ).alias("__pisum"),
    )
    agg = tot.crossJoin(F.broadcast(mfold))
    n = F.col("n").cast("double")
    q = F.col("q").cast("double")
    po = F.coalesce(F.col("__agree").cast("double"), F.lit(0.0)) / n
    pe = F.col("__pisum") / (q - 1.0)
    ok = (F.col("n") > 0) & (F.col("q") >= 2) & (pe < 1.0)
    return agg.select(
        "n",
        "q",
        F.round(F.when(F.col("n") > 0, po), 6).alias("po"),
        F.round(F.when(ok, pe), 6).alias("pe"),
        F.round(F.when(ok, (po - pe) / (1.0 - pe)), 6).alias("ac1"),
    )


def stuart_maxwell_test(
    df: DataFrame, x_col: str, y_col: str, categories
) -> DataFrame:
    """Stuart-Maxwell marginal-homogeneity test for a PAIRED 3-class
    labeling — bowker_test's complement: Bowker asks "is the
    disagreement SYMMETRIC cell by cell"; Stuart-Maxwell asks "did
    the MARGINS move" (did the overall class mix shift between the
    two measurements), which is the readout that matters when a
    re-labeling run or model upgrade is suspected of drifting the
    class distribution. ``categories`` is the caller's 3-element
    class order literal (shared with the oracle); other counts
    RAISE — the k=3 closed form below is exact, higher k needs a
    matrix inverse this operator intentionally doesn't hide.

    Closed form (k=3, dof=2): with d_i = n_i· − n_·i and n̄_ij =
    (n_ij + n_ji)/2, χ² = (n̄_23·d_1² + n̄_13·d_2² + n̄_12·d_3²) /
    (2·(n̄_12·n̄_23 + n̄_12·n̄_13 + n̄_13·n̄_23)).

    Exactness: one (x, y) cell aggregate; the nine cells pivot into
    one row via conditional sums (exact BIGINTs); χ² is one double
    expression.

    Plan at scale: one cell aggregate + one 1-row conditional-sum
    fold. No window, no join.

    Returns one row: (n BIGINT, d1 BIGINT, d2 BIGINT, d3 BIGINT,
    chi2_sm) — chi2 NULL when the off-diagonal mass degenerates.
    """
    if len(categories) != 3:
        raise ValueError(
            "stuart_maxwell_test: exactly 3 categories required, got "
            f"{len(categories)}"
        )
    c1, c2, c3 = categories
    base = df.filter(
        F.col(x_col).isin(list(categories))
        & F.col(y_col).isin(list(categories))
    ).select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))

    def cell(i, j):
        return F.sum(
            F.when((F.col("__x") == i) & (F.col("__y") == j), 1).otherwise(0)
        ).cast("double")

    agg = base.agg(
        F.count("*").cast("long").alias("n"),
        *[
            cell(i, j).alias(f"__n{a}{b}")
            for a, i in enumerate((c1, c2, c3), 1)
            for b, j in enumerate((c1, c2, c3), 1)
        ],
    )

    def nn(a, b):
        return F.col(f"__n{a}{b}")

    d1 = (nn(1, 1) + nn(1, 2) + nn(1, 3)) - (nn(1, 1) + nn(2, 1) + nn(3, 1))
    d2 = (nn(2, 1) + nn(2, 2) + nn(2, 3)) - (nn(1, 2) + nn(2, 2) + nn(3, 2))
    d3 = (nn(3, 1) + nn(3, 2) + nn(3, 3)) - (nn(1, 3) + nn(2, 3) + nn(3, 3))
    nb12 = (nn(1, 2) + nn(2, 1)) / 2.0
    nb13 = (nn(1, 3) + nn(3, 1)) / 2.0
    nb23 = (nn(2, 3) + nn(3, 2)) / 2.0
    den = 2.0 * (nb12 * nb23 + nb12 * nb13 + nb13 * nb23)
    chi2 = (nb23 * d1 * d1 + nb13 * d2 * d2 + nb12 * d3 * d3) / den
    return agg.select(
        "n",
        d1.cast("long").alias("d1"),
        d2.cast("long").alias("d2"),
        d3.cast("long").alias("d3"),
        F.round(F.when(den > 0, chi2), 6).alias("chi2_sm"),
    )


def hosmer_lemeshow(
    df: DataFrame, p_col: str, y_col: str, bins: int = 10
) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit χ² for a probability score —
    the SIGNIFICANCE rung of the calibration family: ece_events
    reports the size of the miscalibration, brier_decomposition its
    decomposition, this one whether it exceeds sampling noise
    (χ²(bins−2) under good calibration). Fixed-width bins on the
    clamped-micros score (the ece binning convention) rather than
    the textbook deciles-of-risk: equal-count deciles need a global
    quantile whose tie-handling differs across engines, while fixed
    bins are deterministic everywhere and keep the test's χ²
    distribution under H0.

    Exactness: per-bin n, Σy, Σp(micros) exact off one aggregate;
    χ² = Σ (Σy − E)²/(E(1−E/n)) in doubles of exact integers.
    Bins where the denominator degenerates (E = 0 or E = n) are
    excluded from the fold and the dof (documented, both engines).

    Plan at scale: one map-side-combined (bin) aggregate + one
    bins-row reduce. No window, no join.

    Returns one row: (n BIGINT, n_bins BIGINT, chi2_hl, dof BIGINT)
    — chi2 NULL when fewer than 3 usable bins.
    """
    base = df.filter(F.col(p_col).isNotNull()).select(
        # clamp SYMMETRICALLY to [0, 1] (advisor r12): a score below 0
        # otherwise yields a negative micro key and a phantom negative
        # bin id, contradicting the clamped-micros convention
        F.floor(
            F.greatest(F.least(F.col(p_col), F.lit(1.0)), F.lit(0.0))
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__p"),
        F.col(y_col).cast("int").alias("__y"),
    )
    binned = base.groupBy(
        # exact integer bin key (`div`), mirroring the oracle's `//`
        F.least(
            F.expr(f"(__p * {int(bins)}) div 1000000"),
            F.lit(bins - 1),
        )
        .cast("long")
        .alias("__bin")
    ).agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum(F.col("__p").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__sp"),
    )
    nd = F.col("__n").cast("double")
    e = F.col("__sp").cast("string").cast("double") / 1000000.0
    usable = (e > 0) & (e < nd)
    term = (
        (F.col("__sy").cast("double") - e)
        * (F.col("__sy").cast("double") - e)
        / (e * (1.0 - e / nd))
    )
    agg = binned.agg(
        F.sum("__n").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_bins"),
        F.sum(F.when(usable, term)).alias("__chi2"),
        F.sum(F.when(usable, 1).otherwise(0)).cast("long").alias("__ub"),
    )
    ok = F.col("__ub") >= 3
    return agg.select(
        "n",
        "n_bins",
        F.round(F.when(ok, F.col("__chi2")), 6).alias("chi2_hl"),
        F.when(ok, F.col("__ub") - 2).cast("long").alias("dof"),
    )


def feature_screening(
    df: DataFrame,
    feature_cols,
    label_col: str,
) -> DataFrame:
    """Categorical-feature screening against a boolean label — the
    one-pass triage BEFORE any model: for each candidate feature,
    the information gain H(y) − Σ_v (n_v/n)·H(y|v) and the Gini
    impurity drop G(y) − Σ_v (n_v/n)·G(y|v) rank which columns are
    worth a deeper look (decision_stump then fits the best split of
    ONE feature; woe_iv scores binned continuous ones — this ranks
    the whole candidate list in one job).

    Exactness: the melt is a literal stack projection (no shuffle
    added — features widen the aggregate key, not the scan); all
    (feature, value) counts are exact BIGINTs off ONE cell
    aggregate; entropies are double folds of exact integers with
    the entropy-family ln/ln2 discipline (0·log 0 ≡ 0), round-6.

    Plan at scale: one stacked (feature, value) aggregate + one
    (feature) rollup. The fact is scanned once for ALL features.

    Returns (feature, n BIGINT, n_values BIGINT, h_label,
    info_gain, gini_drop) ordered by feature — NULL gains when the
    label is constant.
    """
    feats = list(feature_cols)
    stack_expr = "stack({k}, {args}) as (feature, value)".format(
        k=len(feats),
        args=", ".join(
            f"'{c}', cast(`{c}` as string)" for c in feats
        ),
    )
    base = df.filter(F.col(label_col).isNotNull()).select(
        F.expr(stack_expr),
        F.col(label_col).cast("boolean").cast("long").alias("__y"),
    ).filter(F.col("value").isNotNull())
    cells = base.groupBy("feature", "value").agg(
        F.count("*").cast("long").alias("__nv"),
        F.sum("__y").cast("long").alias("__pv"),
    )
    LN2 = 0.6931471805599453

    def h(p):
        # binary entropy in bits with the 0·log0 = 0 convention
        return -(
            F.when((p > 0) & (p < 1), p * F.log(p) / LN2).otherwise(0.0)
            + F.when(
                (p > 0) & (p < 1), (1.0 - p) * F.log(1.0 - p) / LN2
            ).otherwise(0.0)
        )

    nv = F.col("__nv").cast("double")
    pv = F.col("__pv").cast("double") / nv
    agg = cells.groupBy("feature").agg(
        F.sum("__nv").cast("long").alias("n"),
        F.sum("__pv").cast("long").alias("__pos"),
        F.count("*").cast("long").alias("n_values"),
        F.sum(nv * h(pv)).alias("__hc"),
        F.sum(nv * 2.0 * pv * (1.0 - pv)).alias("__gc"),
    )
    n = F.col("n").cast("double")
    p = F.col("__pos").cast("double") / n
    h_label = h(p)
    g_label = 2.0 * p * (1.0 - p)
    ok = (F.col("__pos") > 0) & (F.col("__pos") < F.col("n"))
    return agg.select(
        "feature",
        "n",
        "n_values",
        F.round(h_label, 6).alias("h_label"),
        F.round(F.when(ok, h_label - F.col("__hc") / n), 6).alias(
            "info_gain"
        ),
        F.round(F.when(ok, g_label - F.col("__gc") / n), 6).alias(
            "gini_drop"
        ),
    ).orderBy("feature")


def spiegelhalter_z(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Spiegelhalter's z-test of calibration (Spiegelhalter 1986) —
    the HYPOTHESIS-TEST rung of the calibration family next to
    ece (binned gap magnitude), brier_decomp (score decomposition)
    and hosmer_lemeshow (binned χ²): under perfect calibration the
    Brier score's excess over its minimum has mean zero, giving
    z = Σ(o−p)(1−2p) / √(Σ(1−2p)²·p(1−p)) ~ N(0,1) — binning-free,
    so it cannot be gamed by bin-edge choice. Two-sided p via the
    shared A-S Φ.

    Exactness: the hosmer_lemeshow clamped-micros discipline —
    scores clamp to [0,1] and quantize to exact micro integers
    p_mic ∈ [0, 1e6]; the numerator Σ(o·1e6 − p_mic)(1e6 − 2p_mic)
    and denominator Σ(1e6 − 2p_mic)²·p_mic·(1e6 − p_mic) are exact
    DECIMAL(38,0) folds (term ≤ 1e24 — inside 38 digits to n≈1e14);
    z composes in doubles on the 1-row frame with the micro scales
    cancelling: z = (num/1e12)/√(den/1e24) = num/√den.

    Plan at scale: ONE map-side-combined aggregate. Degenerate
    inputs (n = 0 or every score exactly 0/1 → zero variance)
    return NULL z.

    Returns one row: (n BIGINT, brier, z, p).
    """
    from .util import norm_cdf

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    p_mic = F.round(
        F.greatest(
            F.lit(0.0), F.least(F.col(score_col).cast("double"), F.lit(1.0))
        )
        * 1000000.0,
        0,
    ).cast("long")
    o_mic = F.col(label_col).cast("boolean").cast("long") * F.lit(1000000)
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(p_mic.alias("__p"), o_mic.alias("__o"))
    one = F.lit(1000000)
    num_t = dec(F.col("__o") - F.col("__p")) * dec(
        one - 2 * F.col("__p")
    )
    den_t = (
        (dec(one - 2 * F.col("__p")) * dec(one - 2 * F.col("__p"))).cast(
            "decimal(38,0)"
        )
        * (dec(F.col("__p")) * dec(one - F.col("__p"))).cast(
            "decimal(38,0)"
        )
    ).cast("decimal(38,0)")
    sq_t = (
        dec(F.col("__o") - F.col("__p")) * dec(F.col("__o") - F.col("__p"))
    ).cast("decimal(38,0)")
    agg = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(num_t.cast("decimal(38,0)")).cast("decimal(38,0)").alias(
            "__num"
        ),
        F.sum(den_t).cast("decimal(38,0)").alias("__den"),
        F.sum(sq_t).cast("decimal(38,0)").alias("__sq"),
    )

    def dbl(name):
        return F.col(name).cast("string").cast("double")

    n = F.col("n").cast("double")
    brier = dbl("__sq") / (n * 1.0e12)
    z = dbl("__num") / F.sqrt(dbl("__den"))
    ok = F.col("n") > 0
    okz = ok & (dbl("__den") > 0.0)
    return agg.select(
        "n",
        F.round(F.when(ok, brier), 6).alias("brier"),
        F.round(F.when(okz, z), 6).alias("z"),
        F.round(F.when(okz, 2.0 * norm_cdf(-F.abs(z))), 6).alias("p"),
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols,
) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient over k item
    columns — the RELIABILITY rung of the rater/rule family next to
    cochran_q (do the items' marginal rates differ), fleiss_kappa
    (chance-corrected agreement) and icc (variance decomposition):
    α = k/(k−1)·(1 − Σᵢσᵢ²/σ_T²) asks whether the k items move
    together enough to be summed into one scale score. Items here
    are numeric (booleans cast to 0/1 — the KR-20 special case).

    Exactness: all sufficient moments (per-item Σxᵢ, Σxᵢ², plus the
    TOTAL score's ΣT, ΣT² with T = Σᵢxᵢ computed row-local) are
    exact DECIMAL(38,0) folds of micro-scaled integers; variances
    (sample, n−1) compose in doubles on the 1-row frame.

    Plan at scale: ONE map-side-combined aggregate; k widens the
    projection, not the shuffle. Rows with any NULL item are
    excluded (listwise, the classical convention). NULL alpha when
    n < 2 or σ_T² = 0.

    Returns one row: (n BIGINT, k BIGINT, var_total, sum_item_vars,
    alpha).
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    items = list(item_cols)
    k = len(items)
    if k < 2:
        raise ValueError("cronbach_alpha: need at least 2 item columns")
    base = df
    for c in items:
        base = base.filter(F.col(c).isNotNull())
    mics = [
        F.round(F.col(c).cast("double") * 1000000.0, 0)
        .cast("long")
        .alias(f"__m{i}")
        for i, c in enumerate(items)
    ]
    base = base.select(*mics)
    total = sum(
        [F.col(f"__m{i}") for i in range(1, k)], F.col("__m0")
    ).alias("__tot")
    base = base.select("*", total)
    aggs = [F.count("*").cast("long").alias("n")]
    for i in range(k):
        aggs.append(
            F.sum(dec(F.col(f"__m{i}")))
            .cast("decimal(38,0)")
            .alias(f"__s{i}")
        )
        aggs.append(
            F.sum(
                (dec(F.col(f"__m{i}")) * dec(F.col(f"__m{i}"))).cast(
                    "decimal(38,0)"
                )
            )
            .cast("decimal(38,0)")
            .alias(f"__q{i}")
        )
    aggs.append(
        F.sum(dec(F.col("__tot"))).cast("decimal(38,0)").alias("__st")
    )
    aggs.append(
        F.sum(
            (dec(F.col("__tot")) * dec(F.col("__tot"))).cast(
                "decimal(38,0)"
            )
        )
        .cast("decimal(38,0)")
        .alias("__qt")
    )
    agg = base.agg(*aggs)

    def dbl(name):
        return F.col(name).cast("string").cast("double")

    n = F.col("n").cast("double")
    scale2 = 1.0e12
    var_t = (dbl("__qt") - dbl("__st") * dbl("__st") / n) / (
        (n - 1.0) * scale2
    )
    item_vars = None
    for i in range(k):
        v = (dbl(f"__q{i}") - dbl(f"__s{i}") * dbl(f"__s{i}") / n) / (
            (n - 1.0) * scale2
        )
        item_vars = v if item_vars is None else item_vars + v
    alpha = (
        F.lit(float(k) / (k - 1.0)) * (1.0 - item_vars / var_t)
    )
    ok = (F.col("n") >= 2) & (var_t > 0.0)
    return agg.select(
        "n",
        F.lit(k).cast("long").alias("k"),
        F.round(F.when(F.col("n") >= 2, var_t), 6).alias("var_total"),
        F.round(F.when(F.col("n") >= 2, item_vars), 6).alias(
            "sum_item_vars"
        ),
        F.round(F.when(ok, alpha), 6).alias("alpha"),
    )
