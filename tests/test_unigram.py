"""Unigram-LM tokenizer: lattice correctness vs brute-force
enumeration, training determinism across partitionings, coverage, and
Viterbi behavior."""

from __future__ import annotations

import itertools
import math

import pytest

from reddit_etl_spark.operators.unigram import (
    _expected_counts_word,
    _viterbi,
    train_unigram,
    unigram_encode,
)


def _all_segmentations(w: str, pieces: set[str], max_len: int):
    """Every way to split w into pieces (brute force, tiny words)."""
    if not w:
        yield []
        return
    for l in range(1, min(max_len, len(w)) + 1):
        head = w[:l]
        if head in pieces:
            for rest in _all_segmentations(w[l:], pieces, max_len):
                yield [head] + rest


def test_forward_backward_matches_enumeration():
    """Expected piece counts from the lattice must equal the exact
    posterior computed by enumerating EVERY segmentation."""
    probs = {"a": 0.3, "b": 0.2, "ab": 0.25, "ba": 0.15, "aba": 0.1}
    for w in ("ab", "aba", "abab", "baba", "aabba"):
        got = _expected_counts_word(w, 7, probs, max_piece_len=3)
        segs = list(_all_segmentations(w, set(probs), 3))
        z = sum(
            math.prod(probs[s] for s in seg) for seg in segs
        )
        want: dict[str, float] = {}
        for seg in segs:
            p = math.prod(probs[s] for s in seg)
            for s in seg:
                want[s] = want.get(s, 0.0) + 7 * p / z
        assert set(got) == set(want)
        for s in want:
            assert got[s] == pytest.approx(want[s], rel=1e-12), (w, s)


def test_unencodable_word_contributes_nothing():
    assert _expected_counts_word("xyz", 3, {"a": 1.0}, 3) == {}


def test_training_deterministic_across_partitionings(spark):
    rows = [(i, "spark shuffles partition data fast " * 2) for i in range(30)]
    rows += [(i + 100, "data partition spark spark fast") for i in range(30)]
    df1 = spark.createDataFrame(rows, "id long, text string").repartition(1)
    df8 = spark.createDataFrame(rows, "id long, text string").repartition(8)
    m1 = train_unigram(df1, "text", vocab_size=40, em_iters=2)
    m8 = train_unigram(df8, "text", vocab_size=40, em_iters=2)
    assert m1 == m8 and len(m1) > 0


def test_learns_frequent_words_and_roundtrips(spark):
    rows = [(i, "tokenizer training needs tokenizer pieces") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string")
    model = train_unigram(df, "text", vocab_size=50, em_iters=2, max_piece_len=9)
    # frequent whole words become single pieces
    assert "tokenizer" in model and "pieces" in model
    enc = unigram_encode(df.limit(1), "text", model, max_piece_len=9).first()
    assert "".join(enc["pieces"]) == "tokenizertrainingneedstokenizerpieces"
    assert enc["pieces"].count("tokenizer") == 2


def test_viterbi_unknown_chars_fall_back_to_singles():
    model = {"ab": math.log(0.9), "a": math.log(0.05), "b": math.log(0.05)}
    floor = min(model.values()) - 20.0
    assert _viterbi("abq", model, 2, floor) == ["ab", "q"]
    # NULL text passes through encode


def test_encode_null_and_validation(spark):
    df = spark.createDataFrame([(1, None)], "id long, text string")
    model = {"a": math.log(1.0)}
    assert unigram_encode(df, "text", model).first()["pieces"] is None
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram(df, "text", vocab_size=1)
