"""Perceptual-hash near-dup tests (operators/multimodal.py pHash path).

Kernel invariances are mathematical properties of the DCT (brightness
shifts move only DC; positive contrast scaling preserves every
sign-vs-median comparison), so they are asserted EXACTLY. The banded
pair join's completeness is a pigeonhole theorem (Hamming <= 3 over
4 x 16-bit bands must agree on a band) — asserted against brute force
on hash sets with planted near pairs.
"""

from __future__ import annotations

import numpy as np
import pytest

from reddit_etl_spark.operators import codecs
from reddit_etl_spark.operators.codecs import UnsupportedMediaError
from reddit_etl_spark.operators.multimodal import (
    images_from_text,
    phash64,
    phash_pairs,
    phash_table,
)


def _smooth(seed: int, lo: int = 40, hi: int = 200) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return np.kron(
        rs.randint(lo, hi, (8, 8)).astype(np.uint8), np.ones((8, 8), np.uint8)
    )


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_phash_brightness_shift_exact_invariance():
    img = _smooth(1)
    shifted = (img.astype(int) + 30).astype(np.uint8)  # headroom: no clip
    assert phash64(codecs.encode_png(img)) == phash64(
        codecs.encode_png(shifted)
    )


def test_phash_contrast_scale_invariance():
    img = _smooth(3)
    scaled = np.clip(img.astype(float) * 1.2, 0, 255).astype(np.uint8)
    # u8 re-quantization can flip a bit near the median; stay tiny
    assert _ham(
        phash64(codecs.encode_png(img)), phash64(codecs.encode_png(scaled))
    ) <= 2


def test_phash_resize_and_format_invariance():
    img = _smooth(1)
    big = np.kron(img, np.ones((2, 2), np.uint8))
    h_png = phash64(codecs.encode_png(img))
    assert _ham(h_png, phash64(codecs.encode_png(big))) <= 2
    # same pixels, different container
    assert phash64(codecs.encode_gif(img)) == h_png


def test_phash_separates_different_images():
    hs = [phash64(codecs.encode_png(_smooth(s))) for s in range(2, 12)]
    dists = [_ham(a, b) for i, a in enumerate(hs) for b in hs[i + 1 :]]
    assert min(dists) > 10  # unrelated content is far apart


def test_phash_dc_bit_clear():
    for s in range(5):
        assert phash64(codecs.encode_png(_smooth(s))) & 1 == 0


def test_phash_rejects_garbage():
    with pytest.raises(UnsupportedMediaError):
        phash64(b"not an image at all")


def _pairs(spark, hashes, max_hamming=3):
    df = spark.createDataFrame(
        [(f"a{i}", int(np.int64(np.uint64(h)))) for i, h in enumerate(hashes)],
        "asset_id string, phash long",
    )
    return {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_pairs(df, max_hamming=max_hamming).collect()
    }


def test_phash_pairs_banding_complete_vs_brute_force(spark):
    rs = np.random.RandomState(0)
    hashes = [int(rs.randint(0, 2**63)) for _ in range(40)]
    # plant near pairs at every radius 0..3 and one just-outside at 4
    for d in (0, 1, 2, 3, 4):
        h = hashes[d]
        for bit in rs.choice(64, size=d, replace=False):
            h ^= 1 << int(bit)
        hashes.append(h)
    got = _pairs(spark, hashes)
    signed = [int(np.int64(np.uint64(h))) for h in hashes]
    want = {
        (f"a{i}", f"a{j}", _ham(a, b))
        for i, a in enumerate(signed)
        for j, b in enumerate(signed)
        if i < j and _ham(a, b) <= 3
    }
    assert got == want
    assert len(want) >= 4  # the planted radius-0..3 pairs are present


def test_phash_pairs_rejects_radius_beyond_pigeonhole(spark):
    df = spark.createDataFrame([("a", 0)], "asset_id string, phash long")
    with pytest.raises(ValueError, match="max_hamming"):
        phash_pairs(df, max_hamming=4).collect()


def test_phash_table_dead_letter(spark):
    rows = [
        ("ok", bytearray(codecs.encode_png(_smooth(1)))),
        ("bad", bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "asset_id string, payload binary")
    got = {
        r["asset_id"]: r["phash"]
        for r in phash_table(df, on_error="null").collect()
    }
    assert got["ok"] is not None and got["bad"] is None
    with pytest.raises(Exception, match="no codec"):
        phash_table(df, on_error="raise").collect()


def test_phash_end_to_end_duplicate_texts_pair_at_zero(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "the quick brown fox jumps over the lazy dog " * 40),
            ("d2", "the quick brown fox jumps over the lazy dog " * 40),
            ("d3", "completely different content with other words " * 40),
        ],
        "doc_id string, text string",
    )
    imgs = images_from_text(docs, "doc_id", "text")
    pairs = phash_pairs(phash_table(imgs)).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [
        ("d1", "d2", 0)
    ]


def test_committed_hash_artifact_matches_live_kernel(spark):
    """The oracle for image_phash_neardup verifies the band join +
    Hamming cut in DuckDB over the COMMITTED hash artifact
    (tools/gen_phash_artifact.py). This pins the artifact against the
    live kernel at the two cheap scale factors, so a kernel change
    without regeneration fails here before it reddens the oracle row."""
    import pyarrow.parquet as pq

    import tools.gen_phash_artifact as gen

    committed = pq.read_table(gen.ARTIFACT).to_pydict()
    by_fp: dict[int, set] = {}
    for fp, aid, ph in zip(
        committed["corpus_fp"], committed["asset_id"], committed["phash"]
    ):
        by_fp.setdefault(fp, set()).add((aid, ph))
    assert len(by_fp) >= 3  # one block per committed scale factor
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        live = gen.hash_block(spark, sf_dir)
        fp = live[0][0]
        assert fp in by_fp, f"no committed block for {sf_dir}"
        assert {(a, p) for _, a, p in live} == by_fp[fp], sf_dir
