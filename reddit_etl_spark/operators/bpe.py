"""Byte-pair encoding — a real trainable subword tokenizer for
token-budget accounting, trained and applied Spark-first.

The reference has no tokenizer at all; ``text.py`` provides
whitespace and BPE-ish-regex token COUNTS. This module adds the real
thing (Sennrich et al. 2016, the algorithm GPT-2/RoBERTa-family
vocabularies descend from), with the scale split put where it
belongs:

- TRAINING needs only the word-frequency table, not the corpus: the
  exact per-word counts come from a distributed groupBy (shuffle
  carries (word, count) — at 100 TB the distinct-word table is
  orders of magnitude below the corpus), and only the top
  ``max_words`` rows are collected to the driver, where the merge
  loop runs over ~max_words short symbol sequences with incremental
  pair-count maintenance. This mirrors how production BPE trainers
  work (they all reduce to word frequencies first).
- APPLICATION is embarrassingly parallel: the ordered merge list
  broadcasts (a few KB) inside an Arrow-batched pandas UDF that
  caches encodings per distinct word within each batch — the Python
  cost is O(distinct words per batch), not O(tokens).

Determinism: pair ties during training break by (count, pair) max —
lexicographically largest pair on equal counts — so training twice on
the same corpus yields byte-identical merge lists (pinned by tests).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

END_OF_WORD = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str, max_words: int = 50_000
) -> list[tuple[str, int]]:
    """Exact corpus word frequencies (lowercased, whitespace split),
    top ``max_words`` by (count desc, word) — the bounded driver-side
    input BPE training needs. One distributed aggregate; the sort is
    a TakeOrdered over (word, count) pairs."""
    words = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .filter(F.length("w") > 0)
    )
    top = (
        words.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_words)
        .collect()
    )
    return [(r.w, r.c) for r in top]


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus. Returns
    ``[(left, right), ...]`` — apply order IS priority order."""
    freqs = word_frequencies(df, text_col, max_words)
    # symbol sequences per word, weighted by corpus frequency
    seqs: dict[int, list[str]] = {}
    weight: dict[int, int] = {}
    for i, (w, c) in enumerate(freqs):
        seqs[i] = [*w, END_OF_WORD]
        weight[i] = c

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, sym in seqs.items():
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += weight[i]
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        # deterministic argmax: highest count, lexicographically
        # largest pair on ties
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or (c, p) > best:
                best = (c, p)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        merged = pair[0] + pair[1]
        # rewrite only the words containing the pair, incrementally
        # maintaining pair counts (the classic trainer optimization)
        for i in list(pair_words[pair]):
            sym = seqs[i]
            wgt = weight[i]
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] -= wgt
                pair_words[(a, b)].discard(i)
            out = []
            j = 0
            while j < len(sym):
                if (
                    j + 1 < len(sym)
                    and sym[j] == pair[0]
                    and sym[j + 1] == pair[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            seqs[i] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += wgt
                pair_words[(a, b)].add(i)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE application to one word: repeatedly merge the
    lowest-rank adjacent pair (all its occurrences, left to right)."""
    sym = [*word, END_OF_WORD]
    while len(sym) > 1:
        best_rank = None
        for a, b in zip(sym, sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = (a, b)
        if best_rank is None:
            break
        out = []
        j = 0
        while j < len(sym):
            if j + 1 < len(sym) and sym[j] == best[0] and sym[j + 1] == best[1]:
                out.append(best[0] + best[1])
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return sym


def bpe_tokens_col(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Column of BPE tokens (array<string>) for ``text``. Arrow-
    batched pandas UDF with a per-batch distinct-word cache; the merge
    ranks ship once per executor via closure serialization."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(col: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(t):
            if t is None:
                return None
            toks: list[str] = []
            for w in t.lower().split():
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks

        return col.map(enc)

    return _encode(text)


def bpe_token_counts(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    tokens_col: str = "bpe_tokens",
    count_col: str = "bpe_token_count",
) -> DataFrame:
    """Attach real-BPE tokens and their count — the token-budget
    column curation pipelines bin and pack on (the regex approximation
    in ``text.py`` stays the zero-Python default)."""
    out = df.withColumn(tokens_col, bpe_tokens_col(F.col(text_col), merges))
    return out.withColumn(count_col, F.size(tokens_col).cast("long"))
