"""Real-BPE tokenizer: training determinism, parity with a naive
reference implementation, round-trip reconstruction, and the
distributed-application contract."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.bpe import (
    END_OF_WORD,
    bpe_token_counts,
    encode_word,
    train_bpe,
    word_frequencies,
)


def _naive_train(freqs, num_merges):
    """Textbook Sennrich trainer: full pair recount every step, same
    (count, pair) tie-break — the oracle for the incremental trainer."""
    vocab = {tuple(w) + (END_OF_WORD,): c for w, c in freqs}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for sym, c in vocab.items():
            out, j = [], 0
            while j < len(sym):
                if (
                    j + 1 < len(sym)
                    and sym[j] == best[0]
                    and sym[j + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newer newer newer newer"),
        (3, "newest newest newest widest widest"),
        (4, "the quick brown fox the quick brown fox"),
        (5, "low lower lowest newer newest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_matches_naive_reference(corpus):
    freqs = word_frequencies(corpus, "text")
    fast = train_bpe(corpus, "text", num_merges=30)
    naive = _naive_train(freqs, 30)
    assert fast == naive


def test_train_deterministic(corpus):
    assert train_bpe(corpus, "text", num_merges=20) == train_bpe(
        corpus, "text", num_merges=20
    )


def test_classic_merge_order(corpus):
    """The textbook low/lower/newest corpus learns frequent character
    pairs first; every merge must concatenate adjacent symbols."""
    merges = train_bpe(corpus, "text", num_merges=10)
    assert len(merges) == 10
    built = {a + b for a, b in merges}
    # later merges may only reference symbols that exist (chars or
    # earlier merge outputs)
    known = set("abcdefghijklmnopqrstuvwxyz") | {END_OF_WORD}
    for a, b in merges:
        assert set(a) <= set("abcdefghijklmnopqrstuvwxyz") or a in built or a in known
        assert b == END_OF_WORD or set(b) <= set(
            "abcdefghijklmnopqrstuvwxyz"
        ) or b in built


def test_encode_word_greedy_rank_order():
    # ranks: ('l','o') first, then ('lo','w') — "low" -> ["low</w>"]
    # only if ('low', '</w>') merged; with two merges we get ["low", "</w>"]
    ranks = {("l", "o"): 0, ("lo", "w"): 1}
    assert encode_word("low", ranks) == ["low", END_OF_WORD]
    # unknown word falls back to characters + end marker
    assert encode_word("xyz", ranks) == ["x", "y", "z", END_OF_WORD]


def test_distributed_encode_round_trips(corpus):
    """Concatenated tokens (end-marker aware) reconstruct the exact
    normalized text for every document — lossless tokenization."""
    merges = train_bpe(corpus, "text", num_merges=25)
    out = bpe_token_counts(corpus, "text", merges)
    for r in out.collect():
        rebuilt = (
            "".join(r.bpe_tokens)
            .replace(END_OF_WORD, " ")
            .strip()
        )
        assert rebuilt == " ".join(r.text.lower().split())
        assert r.bpe_token_count == len(r.bpe_tokens)


def test_distributed_encode_matches_driver_encode(corpus):
    """The pandas-UDF path must agree with driver-side encode_word on
    every word (same ranks, same greedy order)."""
    merges = train_bpe(corpus, "text", num_merges=15)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {r.doc_id: r.bpe_tokens for r in bpe_token_counts(corpus, "text", merges).collect()}
    for r in corpus.collect():
        want = []
        for w in r.text.lower().split():
            want.extend(encode_word(w, ranks))
        assert out[r.doc_id] == want


def test_null_text_tokenizes_to_null(spark):
    df = spark.createDataFrame([(1, None), (2, "ok ok")], "doc_id long, text string")
    merges = [("o", "k")]
    rows = {r.doc_id: r for r in bpe_token_counts(df, "text", merges).collect()}
    assert rows[1].bpe_tokens is None and rows[1].bpe_token_count == -1
    assert rows[2].bpe_tokens == ["ok", END_OF_WORD, "ok", END_OF_WORD]


def test_more_merges_fewer_tokens(corpus):
    """Compression monotonicity on the training corpus: a larger merge
    list can only shorten (or keep) total token counts."""
    small = bpe_token_counts(corpus, "text", train_bpe(corpus, "text", 5))
    big = bpe_token_counts(corpus, "text", train_bpe(corpus, "text", 40))
    n_small = small.agg(F.sum("bpe_token_count")).first()[0]
    n_big = big.agg(F.sum("bpe_token_count")).first()[0]
    assert n_big < n_small
