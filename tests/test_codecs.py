"""Real-codec tests: PNG/BMP/PPM decode, WAV resample, and the
``decode='real'`` multimodal paths end-to-end through Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators import codecs
from reddit_etl_spark.operators.codecs import UnsupportedMediaError
from reddit_etl_spark.operators.multimodal import (
    extract_media_features,
    resample_audio,
    resize_images,
    sample_frames,
)


def _img(h, w, c, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)


# ---------------------------------------------------------------------------
# pure codec units
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _img(7, 5, channels, seed=channels)
    data = codecs.encode_png(img)
    assert codecs.sniff(data) == "png"
    out = codecs.decode_png(data)
    np.testing.assert_array_equal(out, img)


def test_png_paeth_and_sub_filters_decode():
    # hand-build a PNG using filter types 1 (Sub), 2 (Up), 3 (Avg), 4
    # (Paeth) so the unfilter loop is exercised, then compare against a
    # filter-0 encode of the same pixels
    import zlib

    img = _img(4, 6, 3, seed=9)
    stride = 6 * 3
    rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for y, ftype in enumerate([1, 2, 3, 4]):
        cur = img[y].reshape(-1).astype(np.int32)
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
        prev = cur
    raw = b"".join(rows)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_palette_png_decode():
    import zlib

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = codecs.decode_png(data)
    np.testing.assert_array_equal(out, palette[idx])


def test_bmp_decode_24bit_bottom_up():
    # 2x2 24-bit BMP, rows padded to 4 bytes, bottom-up, BGR order
    px = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )  # RGB, row 0 = top
    row_size = (2 * 3 + 3) & ~3  # 8
    pixel_data = b""
    for y in (1, 0):  # bottom-up
        row = b""
        for x in range(2):
            r, g, b = px[y, x]
            row += bytes([b, g, r])
        pixel_data += row + b"\x00" * (row_size - len(row))
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    data = header + dib + pixel_data
    out = codecs.decode_bmp(data)
    np.testing.assert_array_equal(out, px)


def test_ppm_pgm_decode_with_comment():
    px = _img(3, 2, 3, seed=3)
    data = b"P6\n# a comment\n2 3\n255\n" + px.tobytes()
    np.testing.assert_array_equal(codecs.decode_ppm(data), px)
    gray = _img(2, 2, 1, seed=4)
    data = b"P5 2 2 255\n" + gray.tobytes()
    np.testing.assert_array_equal(codecs.decode_ppm(data), gray)


def test_decode_image_dispatch_and_unknown():
    img = _img(3, 3, 3, seed=5)
    np.testing.assert_array_equal(codecs.decode_image(codecs.encode_png(img)), img)
    with pytest.raises(UnsupportedMediaError, match="no codec"):
        codecs.decode_image(b"\xff\xd8\xff not really a jpeg" if codecs.HAVE_PIL else b"garbage")


def test_resize_nearest_identity_and_downscale():
    img = _img(8, 8, 3, seed=6)
    np.testing.assert_array_equal(codecs.resize_nearest(img, 8, 8), img)
    half = codecs.resize_nearest(img, 4, 4)
    assert half.shape == (4, 4, 3)
    # center-sampled: output (0,0) pulls from input (1,1)
    np.testing.assert_array_equal(half[0, 0], img[1, 1])


def test_wav_roundtrip_and_resample():
    rate = 8_000
    t = np.arange(rate) / rate
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    data = codecs.encode_wav(sine, rate)
    assert codecs.sniff(data) == "wav"
    out, r = codecs.decode_wav(data)
    assert r == rate and out.shape == (rate, 1)
    np.testing.assert_allclose(out[:, 0], sine, atol=1e-3)
    up = codecs.resample_linear(out, rate, 16_000)
    assert up.shape == (16_000, 1)
    # a 440 Hz sine resampled stays a 440 Hz sine (the final sample
    # clamps to the source tail instead of extrapolating — skip it)
    expect = 0.5 * np.sin(2 * np.pi * 440 * np.arange(16_000) / 16_000)
    np.testing.assert_allclose(up[:-1, 0], expect[:-1], atol=5e-2)


def test_split_png_frames():
    frames = [codecs.encode_png(_img(2, 2, 3, seed=s)) for s in range(3)]
    parts = codecs.split_png_frames(b"".join(frames))
    assert parts == frames


# ---------------------------------------------------------------------------
# decode='real' through Spark
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def png_media(spark):
    rows = []
    for i in range(4):
        img = _img(6, 6, 3, seed=i)
        rows.append((str(i), bytearray(codecs.encode_png(img)), 3_000))
    return spark.createDataFrame(
        rows, "asset_id string, payload binary, duration_ms long"
    )


def test_real_resize_through_spark(spark, png_media):
    out = {
        r.asset_id: r
        for r in resize_images(
            png_media, target_width=3, target_height=3, decode="real"
        ).collect()
    }
    assert set(out) == {"0", "1", "2", "3"}
    for aid, r in out.items():
        img = codecs.decode_png(
            codecs.encode_png(_img(6, 6, 3, seed=int(aid)))
        )
        expect = codecs.resize_nearest(codecs.to_grayscale(img), 3, 3)
        assert bytes(r.payload) == expect.tobytes()


def test_real_features_image_histogram(spark, png_media):
    out = {
        r.asset_id: r.feature
        for r in extract_media_features(
            png_media, decode="real", feature_dim=4
        ).collect()
    }
    for aid, feat in out.items():
        img = _img(6, 6, 3, seed=int(aid))
        expect = codecs.image_histogram(img, 4)
        np.testing.assert_allclose(feat, expect, atol=1e-12)
        assert abs(sum(feat) - 1.0) < 1e-9


def test_real_features_wav_and_deadletter(spark):
    wav = codecs.encode_wav(np.linspace(-0.9, 0.9, 1000), 8_000)
    df = spark.createDataFrame(
        [("a", bytearray(wav)), ("bad", bytearray(b"not media"))],
        "asset_id string, payload binary",
    )
    rows = {
        r.asset_id: r
        for r in extract_media_features(
            df, decode="real", feature_dim=4, on_error="null"
        ).collect()
    }
    assert rows["bad"].feature is None  # dead-lettered, stage survived
    feat = rows["a"].feature
    assert len(feat) == 4 and abs(sum(feat) - 1.0) < 1e-9
    # linspace amplitude histogram over [-1,1] is ~uniform in covered bins
    assert all(f > 0 for f in feat)

    with pytest.raises(Exception, match="UnsupportedMediaError|no codec"):
        extract_media_features(df, decode="real", on_error="raise").collect()


def test_real_frame_sampling_through_spark(spark):
    frames = [codecs.encode_png(_img(2, 2, 3, seed=s)) for s in range(4)]
    df = spark.createDataFrame(
        [("v", bytearray(b"".join(frames)), 4_000)],
        "asset_id string, payload binary, duration_ms long",
    )
    rows = sorted(
        sample_frames(df, every_ms=1_000, max_frames=8, decode="real").collect(),
        key=lambda r: r.frame_index,
    )
    # duration 4000ms, 4 source frames -> sampled ts 0/1000/2000/3000
    # map to source frames 0/1/2/3
    assert [r.frame_ts_ms for r in rows] == [0, 1000, 2000, 3000]
    assert [bytes(r.payload) for r in rows] == frames


def test_resample_audio_through_spark(spark):
    rate = 8_000
    sine = 0.5 * np.sin(2 * np.pi * 220 * np.arange(rate) / rate)
    df = spark.createDataFrame(
        [("a", bytearray(codecs.encode_wav(sine, rate))), ("bad", bytearray(b"x"))],
        "asset_id string, payload binary",
    )
    rows = {
        r.asset_id: r
        for r in resample_audio(df, target_rate=4_000, on_error="null").collect()
    }
    assert rows["bad"].payload is None
    good = rows["a"]
    assert good.sample_rate == 4_000 and good.num_samples == 4_000
    out, r = codecs.decode_wav(bytes(good.payload))
    expect = 0.5 * np.sin(2 * np.pi * 220 * np.arange(4_000) / 4_000)
    np.testing.assert_allclose(out[:, 0], expect, atol=5e-2)


# ---------------------------------------------------------------------------
# property-based round-trips (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        c=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_png_roundtrip_property(h, w, c, seed):
        img = np.random.RandomState(seed).randint(
            0, 256, (h, w, c), dtype=np.uint8
        )
        np.testing.assert_array_equal(
            codecs.decode_png(codecs.encode_png(img)), img
        )

    @given(
        n=st.integers(1, 500),
        ch=st.sampled_from([1, 2]),
        rate=st.sampled_from([8_000, 16_000, 44_100]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_wav_roundtrip_property(n, ch, rate, seed):
        x = np.random.RandomState(seed).uniform(-0.99, 0.99, size=(n, ch))
        out, r = codecs.decode_wav(codecs.encode_wav(x, rate))
        assert r == rate and out.shape == (n, ch)
        # 0.5 LSB rounding + the 32767-encode/32768-decode asymmetry
        np.testing.assert_allclose(out, x, atol=1e-4)

    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        gray=st.booleans(),
        ss=st.sampled_from(["444", "422", "420"]),
        ri=st.sampled_from([0, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_jpeg_roundtrip_property(h, w, gray, ss, ri, seed):
        rng = np.random.RandomState(seed)
        # smooth-ish content (random low-res upsampled) so a fixed
        # tolerance is meaningful; q=95 keeps quantization tight
        small = rng.randint(0, 256, (max(1, h // 4), max(1, w // 4), 1 if gray else 3))
        img = small.repeat(4, axis=0).repeat(4, axis=1)[:h, :w].astype(np.uint8)
        if gray:
            img = img[:, :, 0]
        dec = codecs.decode_jpeg(
            codecs.encode_jpeg(img, quality=95, subsampling=ss, restart_interval=ri)
        )
        want = img[:, :, None] if gray else img
        assert dec.shape == want.shape
        err = np.abs(dec.astype(int) - want.astype(int))
        # blocky content + q95: small error everywhere except chroma
        # edges under subsampling (averaged block boundaries)
        assert err.max() <= (40 if ss != "444" and not gray else 16)

    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        gray=st.booleans(),
        ss=st.sampled_from(["444", "422", "420"]),
        ri=st.sampled_from([0, 2]),
        q=st.sampled_from([30, 85, 95]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_jpeg_progressive_equals_baseline_property(
        h, w, gray, ss, ri, q, seed
    ):
        """The progressive scan script completes its successive
        approximation, so decoded coefficients — hence PIXELS — must
        equal the baseline encoding bit-for-bit at any size, sampling,
        quality, or restart interval."""
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (h, w, 1 if gray else 3)).astype(np.uint8)
        if gray:
            img = img[:, :, 0]
        base = codecs.decode_jpeg(
            codecs.encode_jpeg(
                img, quality=q, subsampling=ss, restart_interval=ri
            )
        )
        prog = codecs.decode_jpeg(
            codecs.encode_jpeg(
                img, quality=q, subsampling=ss, restart_interval=ri,
                progressive=True,
            )
        )
        np.testing.assert_array_equal(base, prog)

    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        ncol=st.integers(1, 8),
        gray=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_gif_roundtrip_property(h, w, ncol, gray, seed):
        rng = np.random.RandomState(seed)
        if gray:
            img = rng.randint(0, 256, (h, w), dtype=np.uint8)
            want = np.repeat(img[:, :, None], 3, axis=2)
        else:
            pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
            img = pal[rng.randint(0, ncol, (h, w))]
            want = img
        np.testing.assert_array_equal(
            codecs.decode_gif(codecs.encode_gif(img)), want
        )

    @given(
        h=st.integers(1, 10),
        w=st.integers(1, 10),
        tw=st.integers(1, 10),
        th=st.integers(1, 10),
    )
    @settings(max_examples=40, deadline=None)
    def test_resize_property_shape_and_value_domain(h, w, tw, th):
        img = np.random.RandomState(h * 100 + w).randint(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        out = codecs.resize_nearest(img, tw, th)
        assert out.shape == (th, tw, 3)
        # nearest-neighbour never invents values
        flat = {tuple(px) for row in img for px in row}
        assert all(tuple(px) in flat for row in out for px in row)


def test_corrupt_payloads_dead_letter_not_crash(spark):
    """Review finding: corrupt payloads of a KNOWN format (truncated
    PNG, short BMP, garbage PPM) must dead-letter like unknown formats
    — the stdlib decoders' zlib/struct/ValueError surface as
    UnsupportedMediaError."""
    good = codecs.encode_png(_img(4, 4, 3, seed=1))
    corrupt = [
        good[: len(good) // 2],          # truncated PNG (zlib error)
        b"BM" + b"\x00" * 14,            # short BMP header
        b"P6 garbage",                   # unparseable PPM fields
    ]
    for payload in corrupt:
        with pytest.raises(UnsupportedMediaError):
            codecs.decode_image(payload)

    df = spark.createDataFrame(
        [("ok", bytearray(good))]
        + [(f"bad{i}", bytearray(p)) for i, p in enumerate(corrupt)],
        "asset_id string, payload binary",
    )
    rows = {
        r.asset_id: r.feature
        for r in extract_media_features(
            df, decode="real", feature_dim=4, on_error="null"
        ).collect()
    }
    assert rows["ok"] is not None
    assert all(rows[f"bad{i}"] is None for i in range(3))

    resized = {
        r.asset_id: r.payload
        for r in resize_images(
            df, target_width=2, target_height=2, decode="real", on_error="null"
        ).collect()
    }
    assert resized["ok"] is not None and resized["bad0"] is None

    frames = sample_frames(
        df.withColumn("duration_ms", F.lit(2000)),
        decode="real",
        on_error="skip",
    ).collect()
    # the splitter slices on PNG signatures without decoding, so the
    # truncated-PNG asset still yields (truncated) frames; only
    # non-PNG-stream assets are skipped
    assert {r.asset_id for r in frames} == {"ok", "bad0"}


def test_bmp_top_down_and_32bit():
    # negative height = top-down row order; 32-bit adds alpha
    px = _img(2, 2, 4, seed=8)
    row_bytes = b""
    for y in range(2):  # top-down: row 0 first
        for x in range(2):
            r, g, b, a = px[y, x]
            row_bytes += bytes([b, g, r, a])
    header = b"BM" + struct.pack("<IHHI", 54 + len(row_bytes), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(row_bytes), 0, 0, 0, 0
    )
    out = codecs.decode_bmp(header + dib + row_bytes)
    np.testing.assert_array_equal(out, px)


def test_unsupported_variants_rejected():
    # 16-bit PPM
    with pytest.raises(UnsupportedMediaError, match="16-bit"):
        codecs.decode_ppm(b"P6 1 1 65535\n" + b"\x00" * 6)
    # interlaced PNG
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(UnsupportedMediaError, match="interlaced"):
        codecs.decode_png(data)
    # 16-bit-depth PNG
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(UnsupportedMediaError, match="bit depth"):
        codecs.decode_png(data)


# ---------------------------------------------------------------------------
# JPEG baseline codec (stdlib path)
# ---------------------------------------------------------------------------


def test_jpeg_uniform_color_roundtrip_exact():
    # a flat block has only a DC coefficient -> survives quantization
    img = np.full((16, 24, 3), [120, 64, 200], dtype=np.uint8)
    enc = codecs.encode_jpeg(img, quality=90)
    assert codecs.sniff(enc) == "jpeg"
    dec = codecs.decode_jpeg(enc)
    assert dec.shape == img.shape
    np.testing.assert_array_equal(dec, img)


def test_jpeg_gradient_roundtrip_within_tolerance():
    x = np.linspace(0, 255, 64)
    y = np.linspace(0, 255, 48)
    xx, yy = np.meshgrid(x, y)
    img = np.stack([xx, yy, (xx + yy) / 2], axis=-1).astype(np.uint8)
    for ss, tol in (("444", 8), ("422", 12), ("420", 14)):
        dec = codecs.decode_jpeg(
            codecs.encode_jpeg(img, quality=90, subsampling=ss)
        )
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= tol, (ss, err.max())


def test_jpeg_grayscale_single_component():
    g = np.outer(np.linspace(0, 255, 40), np.ones(56)).astype(np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(g, quality=85))
    assert dec.shape == (40, 56, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 4


def test_jpeg_noise_psnr_and_odd_dims():
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(noise, quality=95))
    mse = ((dec.astype(float) - noise.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) > 30  # q95 keeps PSNR high
    odd = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    for ss in ("444", "422", "420"):
        assert codecs.decode_jpeg(
            codecs.encode_jpeg(odd, quality=95, subsampling=ss)
        ).shape == (17, 13, 3)


def test_jpeg_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)
    base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=92))
    for ri in (1, 3):
        withr = codecs.decode_jpeg(
            codecs.encode_jpeg(img, quality=92, restart_interval=ri)
        )
        np.testing.assert_array_equal(withr, base)


def test_jpeg_through_decode_image_dispatch():
    img = np.full((8, 8, 3), [10, 200, 30], dtype=np.uint8)
    if codecs.HAVE_PIL:
        pytest.skip("stdlib jpeg path shadowed by PIL")
    dec = codecs.decode_image(codecs.encode_jpeg(img, quality=95))
    np.testing.assert_array_equal(dec, img)


def test_jpeg_unsupported_sof_and_corrupt_rejected():
    # lossless (SOF3) must dead-letter, not crash (progressive SOF2 is
    # SUPPORTED as of round 4 — see test_jpeg_progressive_*)
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = bytearray(codecs.encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC3
    with pytest.raises(UnsupportedMediaError, match="non-baseline"):
        codecs.decode_jpeg(bytes(enc))
    # truncated scan data decodes-or-dead-letters, never crashes
    enc2 = codecs.encode_jpeg(img)
    try:
        codecs.decode_jpeg(enc2[: len(enc2) - 10])
    except UnsupportedMediaError:
        pass


def test_jpeg_baseline_truncated_mid_scan_dead_letters():
    """A baseline stream whose entropy segment ends (EOI appears)
    before the last MCU must dead-letter, not silently decode the
    remaining blocks from 1-padding (advisor r4 #5). Progressive
    multi-scan streams keep their marker-terminated scans working."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    enc = codecs.encode_jpeg(img, quality=95)
    sos = enc.find(b"\xff\xda")
    entropy_start = sos + 2 + int.from_bytes(enc[sos + 2 : sos + 4], "big")
    entropy_end = len(enc) - 2  # strip EOI
    assert entropy_end - entropy_start > 200
    # keep only the first quarter of the entropy data, then EOI.
    # With the standard tables the 1-padding usually trips "invalid
    # huffman code"; the MCU-count guard is the net for tables/offsets
    # where pads decode as VALID symbols — either way: dead-letter.
    cut = entropy_start + (entropy_end - entropy_start) // 4
    mangled = enc[:cut] + b"\xff\xd9"
    with pytest.raises(
        UnsupportedMediaError,
        match="before the last MCU|invalid huffman|AC overflow",
    ):
        codecs.decode_jpeg(mangled)
    # the untouched stream still decodes, as does a progressive one
    codecs.decode_jpeg(enc)
    codecs.decode_jpeg(codecs.encode_jpeg(img, quality=95, progressive=True))


def test_bitreader_pad_accounting():
    """pad_bits_consumed distinguishes pre-filled pads (lookahead in
    acc) from pads the decoder actually READ, and restart() resets the
    per-interval accounting — the bookkeeping behind the truncated-
    baseline guard."""
    from reddit_etl_spark.operators.codecs import _BitReader

    # 2 real bytes then EOF: reading 16 bits consumes no pads even
    # though _fill pre-loaded pad bytes into acc
    r = _BitReader(b"\xab\xcd", 0)
    assert r.bits(16) == 0xABCD
    assert r.pad_bits_consumed == 0
    # 7 more bits: legal trailing-padding territory
    assert r.bits(7) == 0b1111111
    assert r.pad_bits_consumed == 7
    # an eighth pad bit crosses into garbage-decode territory
    r.bits(1)
    assert r.pad_bits_consumed == 8

    # a marker mid-stream pads exactly like EOF
    r2 = _BitReader(b"\xab\xff\xd9\x00", 1 - 1)
    assert r2.bits(8) == 0xAB
    r2.bits(8)
    assert r2.pad_bits_consumed == 8

    # restart() resets the interval accounting
    r3 = _BitReader(b"\xab\xff\xd0\xcd", 0)
    r3.bits(8)
    r3.bits(4)  # 4 pad bits consumed at the interval tail
    assert r3.pad_bits_consumed == 4
    r3.restart()
    assert r3.pad_bits_consumed == 0
    assert r3.bits(8) == 0xCD


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("ri", [0, 3])
def test_jpeg_progressive_equals_baseline(sub, ri):
    """Progressive (SOF2) decode: spectral selection + successive
    approximation reconstruct the exact quantized coefficients, so the
    decoded image is IDENTICAL to the baseline encoding — across
    subsamplings (exercises non-interleaved AC scan geometry) and
    restart intervals (per-scan RSTn with EOB-run/pred resets)."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    base = codecs.encode_jpeg(img, quality=85, subsampling=sub, restart_interval=ri)
    prog = codecs.encode_jpeg(
        img, quality=85, subsampling=sub, restart_interval=ri, progressive=True
    )
    # sanity: it IS a progressive stream (SOF2 present, multiple SOS)
    assert b"\xff\xc2" in prog and prog.count(b"\xff\xda") >= 6
    np.testing.assert_array_equal(codecs.decode_jpeg(base), codecs.decode_jpeg(prog))


def test_jpeg_progressive_grayscale_and_flat():
    """Grayscale progressive (single-component scans) and an all-flat
    image (maximal EOB-run aggregation across blocks)."""
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (21, 18), dtype=np.uint8)
    for img in (g, np.zeros((40, 56), np.uint8), np.full((16, 16), 201, np.uint8)):
        base = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90))
        prog = codecs.decode_jpeg(
            codecs.encode_jpeg(img, quality=90, progressive=True)
        )
        np.testing.assert_array_equal(base, prog)


def test_jpeg_progressive_through_decode_image_dispatch():
    """decode_image must route progressive JPEG bytes through the
    stdlib path (the r3 dead-letter gap this round closes)."""
    img = np.full((10, 12, 3), 77, np.uint8)
    data = codecs.encode_jpeg(img, progressive=True)
    out = codecs.decode_image(data)
    assert out.shape == (10, 12, 3)
    assert int(np.abs(out.astype(int) - 77).max()) <= 2


def test_jpeg_quality_monotonic_size():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    sizes = [len(codecs.encode_jpeg(img, quality=q)) for q in (30, 60, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


# ---------------------------------------------------------------------------
# GIF codec (stdlib path)
# ---------------------------------------------------------------------------


def test_gif_roundtrip_exact_palettized():
    img = np.zeros((20, 30, 3), dtype=np.uint8)
    img[5:15, 10:20] = [255, 0, 0]
    img[0:5, :] = [0, 128, 255]
    enc = codecs.encode_gif(img)
    assert codecs.sniff(enc) == "gif"
    np.testing.assert_array_equal(codecs.decode_gif(enc), img)
    if not codecs.HAVE_PIL:
        np.testing.assert_array_equal(codecs.decode_image(enc), img)


def test_gif_roundtrip_max_palette_and_gray():
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    img = np.stack([idx, 255 - idx, (idx * 7) % 256], axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(codecs.decode_gif(codecs.encode_gif(img)), img)
    g = (np.arange(16 * 16).reshape(16, 16) % 200).astype(np.uint8)
    np.testing.assert_array_equal(
        codecs.decode_gif(codecs.encode_gif(g)),
        np.repeat(g[:, :, None], 3, axis=2),
    )


def test_gif_too_many_colors_rejected():
    grad = np.arange(80 * 80, dtype=np.uint32)
    big = (
        np.stack([(grad >> 16) & 255, (grad >> 8) & 255, grad & 255], axis=-1)
        .reshape(80, 80, 3)
        .astype(np.uint8)
    )
    with pytest.raises(ValueError, match="256 unique colors"):
        codecs.encode_gif(big)


def _craft_gif(
    screen_wh, frames, interlace=False, gce=False, transparent=None,
    bg=0, local_pal=None, disposals=None,
):
    """Hand-assemble a GIF from (left, top, indices(h,w)) frames over a
    shared 4-color palette — exercises decoder paths the single-frame
    encoder never emits (interlace, animation, extensions,
    transparency, local color tables)."""
    sw, sh = screen_wh
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | 1, bg, 0)  # 4-entry GCT
    out += pal.tobytes()
    for fi, (left, top, idx) in enumerate(frames):
        disposal = disposals[fi] if disposals else 0
        if gce or transparent is not None or disposal:
            tflag = (1 if transparent is not None else 0) | (disposal << 2)
            out += bytes(
                [0x21, 0xF9, 0x04, tflag, 0, 0, transparent or 0, 0]
            )
        h, w = idx.shape
        if interlace:
            order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                     for r in range(s, h, st)]
            idx = idx[order]
        iflags = 0x40 if interlace else 0
        if local_pal is not None:
            iflags |= 0x80 | 1  # 4-entry local color table
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, iflags)
        if local_pal is not None:
            out += np.asarray(local_pal, dtype=np.uint8).tobytes()
        mcs = 2
        out.append(mcs)
        lzw = codecs._gif_lzw_encode(mcs, idx.astype(np.uint8))
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out), pal


def test_gif_interlaced_decode():
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 4, (16, 12)).astype(np.uint8)
    enc, pal = _craft_gif((12, 16), [(0, 0, idx)], interlace=True)
    np.testing.assert_array_equal(codecs.decode_gif(enc), pal[idx])


def test_gif_animation_first_frame_and_offset_composite():
    rng = np.random.default_rng(4)
    f1 = rng.integers(0, 4, (4, 6)).astype(np.uint8)
    f2 = rng.integers(0, 4, (8, 10)).astype(np.uint8)
    # first frame is 6x4 at offset (2, 3) on a 10x8 screen; decoder
    # must composite onto the background color and ignore frame 2
    enc, pal = _craft_gif((10, 8), [(2, 3, f1), (0, 0, f2)], gce=True)
    want_idx = np.zeros((8, 10), dtype=np.uint8)
    want_idx[3:7, 2:8] = f1
    np.testing.assert_array_equal(codecs.decode_gif(enc), pal[want_idx])


def test_gif_transparency_shows_background():
    """Transparent pixels must composite to the BACKGROUND color, not
    render their palette entry (code-review r3 finding)."""
    idx = np.array([[1, 2], [2, 1]], dtype=np.uint8)
    enc, pal = _craft_gif((2, 2), [(0, 0, idx)], transparent=2, bg=3)
    got = codecs.decode_gif(enc)
    want = np.empty((2, 2, 3), dtype=np.uint8)
    want[0, 0] = pal[1]
    want[1, 1] = pal[1]
    want[0, 1] = pal[3]  # transparent -> background (index 3 = blue)
    want[1, 0] = pal[3]
    np.testing.assert_array_equal(got, want)


def test_gif_background_uses_global_table_not_local():
    """bg is a GLOBAL-table index by spec; a frame-local color table
    must not be used to resolve it (code-review r3 finding)."""
    idx = np.zeros((1, 1), dtype=np.uint8)  # 1x1 frame at (0,0) of 3x1
    local = [[9, 9, 9], [8, 8, 8], [7, 7, 7], [6, 6, 6]]
    enc, pal = _craft_gif(
        (3, 1), [(0, 0, idx)], bg=2, local_pal=local
    )
    got = codecs.decode_gif(enc)
    np.testing.assert_array_equal(got[0, 0], [9, 9, 9])   # frame: local[0]
    np.testing.assert_array_equal(got[0, 1], pal[2])      # bg: GLOBAL[2]
    np.testing.assert_array_equal(got[0, 2], pal[2])


def test_jpeg_single_component_ignores_declared_sampling():
    """T.81: a one-component scan is non-interleaved (one block per
    MCU, raster order) — declared 2x2 frame sampling factors must not
    change the layout (code-review r3 finding)."""
    g = np.outer(np.linspace(0, 255, 32), np.ones(16)).astype(np.uint8)
    enc = bytearray(codecs.encode_jpeg(g, quality=90))
    i = enc.find(b"\xff\xc0")
    # SOF0: FF C0 len(2) prec(1) h(2) w(2) ncomp(1) [id hv tq]
    assert enc[i + 11] == 0x11
    enc[i + 11] = 0x22  # declare h=v=2 on the single component
    np.testing.assert_array_equal(
        codecs.decode_jpeg(bytes(enc)), codecs.decode_jpeg(codecs.encode_jpeg(g, quality=90))
    )


def test_jpeg_fill_bytes_before_restart_marker():
    """T.81 B.1.1.2 allows 0xFF fill bytes before any marker — the
    reader must skip them, not dead-letter (code-review r3 finding)."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    enc = codecs.encode_jpeg(img, quality=92, restart_interval=1)
    base = codecs.decode_jpeg(enc)
    padded = enc.replace(b"\xff\xd0", b"\xff\xff\xd0").replace(
        b"\xff\xd1", b"\xff\xff\xff\xd1"
    )
    assert len(padded) > len(enc)
    np.testing.assert_array_equal(codecs.decode_jpeg(padded), base)


def test_gif_decode_all_frames_with_disposal():
    """decode_gif_frames composites progressively: disposal 1 leaves
    the previous frame visible, disposal 2 restores the background
    between frames."""
    f1 = np.full((2, 2), 1, dtype=np.uint8)   # red patch at (0,0)
    f2 = np.full((2, 2), 2, dtype=np.uint8)   # green patch at (2,2)
    for disposal, f1_persists in ((1, True), (2, False)):
        enc, pal = _craft_gif(
            (4, 4), [(0, 0, f1), (2, 2, f2)], disposals=[disposal, 0]
        )
        frames = codecs.decode_gif_frames(enc)
        assert len(frames) == 2
        np.testing.assert_array_equal(frames[0][0, 0], pal[1])
        np.testing.assert_array_equal(frames[1][2, 2], pal[2])
        got_f1_in_2 = np.array_equal(frames[1][0, 0], pal[1])
        assert got_f1_in_2 == f1_persists, disposal
    # disposal 3: restore-to-previous — frame 1's patch must be undone
    enc, pal = _craft_gif(
        (4, 4), [(0, 0, f1), (0, 0, f2), (2, 2, f1)],
        disposals=[0, 3, 0],
    )
    frames = codecs.decode_gif_frames(enc)
    np.testing.assert_array_equal(frames[1][0, 0], pal[2])  # f2 visible
    np.testing.assert_array_equal(frames[2][0, 0], pal[1])  # f2 undone


def test_gif_animated_frame_sampling_through_spark(spark):
    from reddit_etl_spark.operators.multimodal import sample_frames

    f1 = np.full((3, 3), 1, dtype=np.uint8)
    f2 = np.full((3, 3), 2, dtype=np.uint8)
    f3 = np.full((3, 3), 3, dtype=np.uint8)
    enc, pal = _craft_gif(
        (3, 3), [(0, 0, f1), (0, 0, f2), (0, 0, f3)], gce=True
    )
    media = spark.createDataFrame(
        [("g1", bytearray(enc), 3000)],
        "asset_id string, payload binary, duration_ms long",
    )
    out = sample_frames(
        media, every_ms=1000, max_frames=3, decode="real"
    ).collect()
    assert len(out) == 3
    # each sampled payload is a decodable PNG of the composited frame
    for row, want_idx in zip(sorted(out, key=lambda r: r.frame_index), (1, 2, 3)):
        img = codecs.decode_png(bytes(row.payload))
        np.testing.assert_array_equal(img[0, 0], pal[want_idx])


def test_gif_corrupt_dead_letters():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    enc = codecs.encode_gif(img)
    with pytest.raises(UnsupportedMediaError):
        codecs.decode_gif(enc[:20])  # truncated mid-header/data
    with pytest.raises(UnsupportedMediaError, match="not a GIF"):
        codecs.decode_gif(b"NOTAGIF" + enc)


def test_stereo_wav_resample_preserves_channels():
    rate = 8_000
    t = np.arange(rate) / rate
    stereo = np.stack(
        [0.5 * np.sin(2 * np.pi * 220 * t), 0.25 * np.sin(2 * np.pi * 440 * t)],
        axis=1,
    )
    out, r = codecs.decode_wav(codecs.encode_wav(stereo, rate))
    assert out.shape == (rate, 2)
    down = codecs.resample_linear(out, rate, 4_000)
    assert down.shape == (4_000, 2)
    # channels stay independent: each keeps its own amplitude
    assert 0.4 < np.abs(down[:, 0]).max() < 0.6
    assert 0.2 < np.abs(down[:, 1]).max() < 0.3
