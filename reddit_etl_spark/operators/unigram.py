"""Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece
``unigram`` model) — the second real trainable tokenizer next to BPE,
trained Spark-first by DISTRIBUTED EM.

Where BPE greedily merges pairs, the unigram model keeps a
probabilistic piece vocabulary and segments by Viterbi under piece
log-probs — the algorithm behind T5/ALBERT/XLNet vocabularies. The
scale split mirrors ``bpe.py``:

- TRAINING reduces to the word-frequency table (distributed groupBy,
  top ``max_words`` collected — the same bounded driver input every
  production trainer uses), but the EM E-STEP runs DISTRIBUTED: the
  word table parallelizes back out, each Arrow batch runs
  forward-backward lattices per word under the broadcast piece
  probabilities and emits per-piece expected counts, and one
  map-side-combined groupBy reduces them. The M-step normalizes the
  vocab-sized count table at the driver. Per-iteration cost is
  O(words x len x max_piece_len) spread across the cluster; nothing
  corpus-sized ever revisits the driver.
- APPLICATION is an Arrow-batched Viterbi with a per-batch word
  cache — O(distinct words per batch) Python work, like BPE apply.

Determinism: per-word lattices are order-independent; the one
order-dependent float reduction (summing expected counts across
words) is snapped by rounding aggregated counts to 6 decimals before
normalization (the repo's float-aggregate rule), and every pruning /
Viterbi tie breaks lexicographically — so training twice, on any
partitioning, yields byte-identical vocabularies (pinned by tests).

Simplifications vs full SentencePiece, documented deliberately: seed
vocab = most frequent substrings (freq x length score) rather than
the ESA-based seed, and pruning keeps the top pieces by expected
count in one cut instead of iterative likelihood-loss pruning. The
EM itself (lattice forward-backward, frequency-weighted expected
counts, renormalization) is the real algorithm; tests pin parity
against a serial reference implementation of the same spec.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from .bpe import word_frequencies

_UNK_PENALTY = 20.0  # extra nats below the rarest real piece


def _seed_vocab(
    freqs: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Initial piece set: every single character seen (coverage
    guarantee), plus the top multi-char substrings by
    frequency x length (ties: lexicographic), uniformly initialized
    probabilities."""
    subs: Counter = Counter()
    chars: set[str] = set()
    for w, c in freqs:
        chars.update(w)
        n = len(w)
        for i in range(n):
            for l in range(2, min(max_piece_len, n - i) + 1):
                subs[w[i : i + l]] += c * l
    ranked = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))
    pieces = set(chars)
    for s, _ in ranked:
        if len(pieces) >= seed_size + len(chars):
            break
        pieces.add(s)
    p0 = 1.0 / max(len(pieces), 1)
    return {s: p0 for s in pieces}


def _expected_counts_word(
    w: str, freq: int, probs: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Forward-backward over the segmentation lattice of one word:
    expected number of times each piece is used, times ``freq``.
    Exact doubles; order-independent (per-word computation)."""
    n = len(w)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        a = 0.0
        for j in range(max(0, i - max_piece_len), i):
            p = probs.get(w[j:i])
            if p and alpha[j] > 0:
                a += alpha[j] * p
        alpha[i] = a
    z = alpha[n]
    if z <= 0.0:
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        b = 0.0
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            p = probs.get(w[i:j])
            if p and beta[j] > 0:
                b += p * beta[j]
        beta[i] = b
    out: dict[str, float] = {}
    for i in range(n):
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            s = w[i:j]
            p = probs.get(s)
            if p and alpha[i] > 0 and beta[j] > 0:
                out[s] = out.get(s, 0.0) + freq * alpha[i] * p * beta[j] / z
    return out


def _em_counts(
    words: DataFrame, probs: dict[str, float], max_piece_len: int
) -> list[tuple[str, float]]:
    """One distributed E-step: per-batch lattice passes emit local
    (piece, count) partials, one map-side-combined groupBy reduces
    them; the result is vocab-bounded."""
    spark = words.sparkSession
    bprobs = spark.sparkContext.broadcast(probs)
    schema = StructType(
        [
            StructField("piece", StringType()),
            StructField("cnt", DoubleType()),
        ]
    )

    def estep(batches):
        pv = bprobs.value
        for pdf in batches:
            acc: dict[str, float] = {}
            for w, c in zip(pdf["w"], pdf["c"]):
                for s, v in _expected_counts_word(
                    w, int(c), pv, max_piece_len
                ).items():
                    acc[s] = acc.get(s, 0.0) + v
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "cnt": list(acc.values())}
            )

    agg = (
        words.mapInPandas(estep, schema)
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    # the ONLY order-dependent float reduction — snap it (round) and
    # SORT it before the M-step, so both the per-piece values and the
    # normalizer's summation order are identical on any partitioning
    return sorted((r["piece"], round(r["cnt"], 6)) for r in agg)


def train_unigram(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 512,
    max_piece_len: int = 6,
    max_words: int = 50_000,
    em_iters: int = 3,
    seed_multiplier: int = 4,
) -> dict[str, float]:
    """Train the unigram LM vocabulary; returns piece -> LOG prob
    (natural log), the model ``unigram_encode`` consumes.

    ``em_iters`` EM rounds on the seeded vocabulary, one deterministic
    prune to ``vocab_size`` (all single characters always survive —
    the coverage guarantee), then one re-estimation round on the
    pruned vocabulary.
    """
    if vocab_size < 2:
        raise ValueError("vocab_size must be >= 2")
    freqs = word_frequencies(df, text_col, max_words)
    if not freqs:
        return {}
    probs = _seed_vocab(freqs, seed_multiplier * vocab_size, max_piece_len)
    spark = df.sparkSession
    words = spark.createDataFrame(freqs, "w string, c long")

    def normalize(counts: list[tuple[str, float]]) -> dict[str, float]:
        total = sum(c for _, c in counts)
        if total <= 0:
            return probs
        return {s: c / total for s, c in counts if c > 0}

    for _ in range(max(em_iters, 1)):
        probs = normalize(_em_counts(words, probs, max_piece_len))
    # prune: chars always stay; multi-char pieces keep the top slots
    # by expected count (ties lexicographic — deterministic)
    counts = dict(_em_counts(words, probs, max_piece_len))
    chars = {s for s in probs if len(s) == 1}
    multi = sorted(
        ((s, c) for s, c in counts.items() if len(s) > 1 and c > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = set(chars)
    for s, _ in multi:
        if len(keep) >= max(vocab_size, len(chars)):
            break
        keep.add(s)
    probs = {s: p for s, p in probs.items() if s in keep}
    total = sum(probs.values())
    probs = {s: p / total for s, p in probs.items()}
    probs = normalize(_em_counts(words, probs, max_piece_len))
    return {s: math.log(p) for s, p in sorted(probs.items())}


def _viterbi(w: str, logp: dict[str, float], max_piece_len: int, floor: float) -> list[str]:
    """Best segmentation under piece log-probs. Unknown characters
    fall back to themselves at ``floor`` (always encodable). Ties
    break toward the LONGER last piece — deterministic. (No further
    tiebreak is needed: at a fixed end position, equal length means
    the SAME piece, so (score, length) is already total over the
    candidates.)"""
    n = len(w)
    best: list[tuple[float, int, str]] = [(-math.inf, 0, "")] * (n + 1)
    best[0] = (0.0, 0, "")
    for i in range(1, n + 1):
        cand: tuple[tuple[float, int], int, str] | None = None
        for j in range(max(0, i - max_piece_len), i):
            s = w[j:i]
            lp = logp.get(s)
            if lp is None:
                if len(s) == 1:
                    lp = floor
                else:
                    continue
            if best[j][0] == -math.inf:
                continue
            # max by (score, piece length) — longer piece wins ties
            key = (best[j][0] + lp, i - j)
            if cand is None or key > cand[0]:
                cand = (key, j, s)
        assert cand is not None  # single-char fallback guarantees it
        best[i] = (cand[0][0], cand[1], cand[2])
    out: list[str] = []
    i = n
    while i > 0:
        _, j, s = best[i]
        out.append(s)
        i = j
    return out[::-1]


def unigram_encode(
    df: DataFrame,
    text_col: str,
    model: dict[str, float],
    out_col: str = "pieces",
    max_piece_len: int = 6,
) -> DataFrame:
    """Segment whitespace-split words into model pieces (Viterbi),
    returning the input plus ``out_col: array<string>``. Arrow-batched
    with a per-batch word cache; the model broadcasts once."""
    spark = df.sparkSession
    bmodel = spark.sparkContext.broadcast(model)
    floor = (min(bmodel.value.values()) if bmodel.value else 0.0) - _UNK_PENALTY

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        logp = bmodel.value
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            pieces: list[str] = []
            for w in t.lower().split():
                enc = cache.get(w)
                if enc is None:
                    enc = _viterbi(w, logp, max_piece_len, floor)
                    cache[w] = enc
                pieces.extend(enc)
            out.append(pieces)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
