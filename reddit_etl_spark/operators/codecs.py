"""Real media codecs: import-guarded PIL with pure-stdlib fallbacks.

The multimodal operators (reference has none — this is the
training-data extension surface; see SURVEY.md §2.11) need a real
``decode='real'`` path. This container ships no image/audio libraries,
so the strategy is:

1. **PIL, if importable** — full format coverage (JPEG et al.).
2. **Pure-stdlib decoders otherwise** — PNG (zlib inflate + scanline
   unfilter in numpy), BMP (uncompressed 24/32-bit), PPM/PGM binary,
   and WAV via the stdlib ``wave`` module. These are *real* decoders
   producing pixel/sample arrays, not stubs.
3. **UnsupportedMediaError** for anything else, so callers can
   dead-letter bad assets instead of failing the whole job.

Everything here is driver/executor-agnostic pure-Python + numpy —
safe to ship inside Arrow-batched mapInPandas kernels.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

try:  # pragma: no cover - exercised only where PIL is installed
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover
    _PILImage = None

HAVE_PIL = _PILImage is not None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class UnsupportedMediaError(ValueError):
    """Payload is not a format any available codec can decode."""


# ---------------------------------------------------------------------------
# format sniffing
# ---------------------------------------------------------------------------


def sniff(data: bytes) -> str:
    """Best-effort container detection from magic bytes."""
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"P6"):
        return "ppm"
    if data.startswith(b"P5"):
        return "pgm"
    if data.startswith(b"RIFF") and data[8:12] == b"WAVE":
        return "wav"
    if data.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if data.startswith(b"GIF8"):
        return "gif"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG — pure stdlib+numpy decode (8-bit, non-interlaced) and encode
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/px


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG per-scanline filtering (types 0-4). Returns (H, stride)."""
    out = np.empty((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth depend on the previous pixel in the same
            # row — inherently sequential, done in a per-line int loop.
            cur = np.zeros(stride, dtype=np.uint8)
            li = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(pv[x])
                if ftype == 1:
                    rec = li[x] + a
                elif ftype == 3:
                    rec = li[x] + ((a + b) >> 1)
                else:  # Paeth
                    c = int(pv[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec = li[x] + pred
                cur[x] = rec & 0xFF
        else:
            raise UnsupportedMediaError(f"PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H, W, C) uint8."""
    if not data.startswith(_PNG_SIG):
        raise UnsupportedMediaError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise UnsupportedMediaError(f"PNG bit depth {bit_depth}")
            if interlace:
                raise UnsupportedMediaError("interlaced PNG")
            if color_type not in _PNG_CHANNELS:
                raise UnsupportedMediaError(f"PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise UnsupportedMediaError("PNG missing IHDR")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise UnsupportedMediaError("PNG data length mismatch")
    img = _png_unfilter(raw, height, stride, channels).reshape(
        height, width, channels
    )
    if color_type == 3:  # palette lookup -> RGB
        if palette is None:
            raise UnsupportedMediaError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W) or (H, W, C) uint8 to PNG (filter 0, 8-bit)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP / PPM / PGM — uncompressed raster formats
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to (H, W, 3|4) uint8 RGB."""
    if not data.startswith(b"BM"):
        raise UnsupportedMediaError("not a BMP")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise UnsupportedMediaError("BMP core header unsupported")
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(f"BMP bpp={bpp} compression={compression}")
    flip = height > 0
    height = abs(height)
    nch = bpp // 8
    row_size = (width * nch + 3) & ~3
    img = np.empty((height, width, nch), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(
            data, dtype=np.uint8, count=width * nch, offset=pixel_offset + y * row_size
        ).reshape(width, nch)
        img[height - 1 - y if flip else y] = row
    # BGR(A) -> RGB(A)
    img = img[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]
    return img


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) / PGM (P5), maxval <= 255."""
    if data[:2] not in (b"P5", b"P6"):
        raise UnsupportedMediaError("not a binary PPM/PGM")
    channels = 3 if data[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PPM unsupported")
    n = width * height * channels
    return np.frombuffer(data, dtype=np.uint8, count=n, offset=pos).reshape(
        height, width, channels
    )


# ---------------------------------------------------------------------------
# image entry points used by the multimodal operators
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray:
    """Decode an image payload to (H, W, C) uint8 via PIL or stdlib."""
    data = bytes(data)
    if HAVE_PIL:  # pragma: no cover - PIL absent in this container
        try:
            with _PILImage.open(io.BytesIO(data)) as im:
                arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
                return arr
        except Exception as exc:
            raise UnsupportedMediaError(f"PIL decode failed: {exc}") from exc
    kind = sniff(data)
    try:
        if kind == "png":
            return decode_png(data)
        if kind == "bmp":
            return decode_bmp(data)
        if kind in ("ppm", "pgm"):
            return decode_ppm(data)
    except UnsupportedMediaError:
        raise
    except (zlib.error, struct.error, ValueError, IndexError) as exc:
        # corrupt payload of a KNOWN format (truncated IDAT, short BMP
        # header, garbage PPM fields): same dead-letter class as an
        # unknown format — callers' on_error handling must see ONE
        # exception type or a single bad asset fails the stage
        raise UnsupportedMediaError(f"corrupt {kind} payload: {exc}") from exc
    raise UnsupportedMediaError(
        f"no codec for format '{kind}' (stdlib path supports png/bmp/ppm/pgm; "
        "install PIL for jpeg/gif/...)"
    )


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """(H, W, C) -> (H, W) uint8 using Rec.601 luma weights."""
    if img.ndim == 2:
        return img
    if img.shape[2] == 1:
        return img[:, :, 0]
    if img.shape[2] == 2:  # gray + alpha
        return img[:, :, 0]
    rgb = img[:, :, :3].astype(np.float64)
    return (rgb @ np.array([0.299, 0.587, 0.114])).round().astype(np.uint8)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize via pure numpy fancy indexing."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(np.int64)
    xs = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(np.int64)
    return img[ys][:, xs]


def image_histogram(img: np.ndarray, bins: int) -> np.ndarray:
    """Normalized grayscale intensity histogram — a real (if simple)
    image feature: deterministic, codec-independent, length ``bins``."""
    gray = to_grayscale(img)
    hist, _ = np.histogram(gray, bins=bins, range=(0, 256))
    total = hist.sum()
    return hist / total if total else hist.astype(np.float64)


# ---------------------------------------------------------------------------
# WAV audio — stdlib ``wave`` decode/encode + numpy linear resample
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV to (float64 samples in [-1, 1] shaped (n, channels),
    sample_rate). Supports 8/16/32-bit integer PCM."""
    try:
        with wave.open(io.BytesIO(bytes(data)), "rb") as wf:
            nch = wf.getnchannels()
            rate = wf.getframerate()
            sampwidth = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as exc:
        raise UnsupportedMediaError(f"WAV decode failed: {exc}") from exc
    if sampwidth == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sampwidth == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise UnsupportedMediaError(f"WAV sample width {sampwidth}")
    return x.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode float samples in [-1, 1] (n,) or (n, ch) to 16-bit WAV."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def resample_linear(
    samples: np.ndarray, src_rate: int, dst_rate: int
) -> np.ndarray:
    """Linear-interpolation resample (n, ch) -> (round(n*dst/src), ch)."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[0]
    if src_rate == dst_rate or n == 0:
        return arr
    m = int(round(n * dst_rate / src_rate))
    src_pos = np.arange(m) * (src_rate / dst_rate)
    i0 = np.minimum(src_pos.astype(np.int64), n - 1)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = (src_pos - i0)[:, None]
    return arr[i0] * (1.0 - frac) + arr[i1] * frac


# ---------------------------------------------------------------------------
# "raw frames" video container: concatenated PNG frames
# ---------------------------------------------------------------------------


def split_png_frames(data: bytes) -> list[bytes]:
    """Split a concatenated-PNG stream (the engine's raw-frames video
    container — what an upstream ffmpeg dump stage would emit) into
    individual PNG payloads."""
    data = bytes(data)
    if not data.startswith(_PNG_SIG):
        raise UnsupportedMediaError("not a PNG frame stream")
    starts = []
    pos = 0
    while True:
        idx = data.find(_PNG_SIG, pos)
        if idx < 0:
            break
        starts.append(idx)
        pos = idx + len(_PNG_SIG)
    starts.append(len(data))
    return [data[starts[i] : starts[i + 1]] for i in range(len(starts) - 1)]
