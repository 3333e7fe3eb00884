"""Real strict media decode (round-4 VERDICT item 5).

The corpus is constructed byte-by-byte IN the test from the public
format specs (PNG RFC 2083 / netpbm / RIFF WAVE), so the expected
pixels and samples are known exactly and independently of the decoder
under test. The forward direction (encode/filter) lives here; the
library implements only the reverse (decode/unfilter).
"""

import struct
import zlib

import numpy as np
import pytest

from redo_log_parser_spark.functions.multimodal import (
    FEATURE_DIM,
    _strict_decode,
    decode_media,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def make_png(px: np.ndarray, color_type: int, filters=None) -> bytes:
    """Encode (h, w, ch) uint8 pixels as a PNG, forward-filtering each
    scanline with the given per-row filter types (spec §9 formulas)."""
    h, w, ch = px.shape
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y, ftype in zip(range(h), filters):
        line = px[y].ravel().astype(np.int64)
        raw.append(ftype)
        if ftype == 0:
            enc = line
        elif ftype == 2:
            enc = (line - prev) % 256
        else:
            enc = np.zeros(w * ch, dtype=np.int64)
            for x in range(w * ch):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:
                    enc[x] = (line[x] - a) % 256
                elif ftype == 3:
                    enc[x] = (line[x] - (a + b) // 2) % 256
                elif ftype == 4:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    enc[x] = (line[x] - pred) % 256
        raw.extend(int(v) & 0xFF for v in enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def expected_image_features(px: np.ndarray) -> list[float]:
    g = px.astype(np.float64) / 255.0
    gray = g[:, :, :3].mean(axis=2) if px.shape[2] >= 3 else g[:, :, 0]
    segs = np.array_split(gray.ravel(), FEATURE_DIM)
    return [float(s.mean()) if s.size else 0.0 for s in segs]


def make_wav(samples: np.ndarray, rate: int, channels: int) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


RNG = np.random.RandomState(1234)
PX_RGB = RNG.randint(0, 256, size=(9, 7, 3)).astype(np.uint8)
PX_GRAY = RNG.randint(0, 256, size=(5, 6, 1)).astype(np.uint8)
PX_RGBA = RNG.randint(0, 256, size=(4, 4, 4)).astype(np.uint8)


def test_png_rgb_filter0_exact():
    w, h, n_frames, feat = _strict_decode(make_png(PX_RGB, 2))
    assert (w, h, n_frames) == (7, 9, 1)
    assert feat == pytest.approx(expected_image_features(PX_RGB), abs=1e-12)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_each_filter_type_roundtrips(ftype):
    png = make_png(PX_RGB, 2, filters=[0] + [ftype] * 8)
    _, _, _, feat = _strict_decode(png)
    assert feat == pytest.approx(expected_image_features(PX_RGB), abs=1e-12)


def test_png_mixed_filters_gray_and_rgba():
    png_g = make_png(PX_GRAY, 0, filters=[0, 1, 2, 3, 4])
    w, h, _, feat = _strict_decode(png_g)
    assert (w, h) == (6, 5)
    assert feat == pytest.approx(expected_image_features(PX_GRAY), abs=1e-12)
    png_a = make_png(PX_RGBA, 6, filters=[0, 4, 2, 3])
    _, _, _, feat_a = _strict_decode(png_a)
    # alpha channel excluded from grayscale
    assert feat_a == pytest.approx(expected_image_features(PX_RGBA), abs=1e-12)


def test_ppm_binary_and_ascii_match():
    hdr = b"P6 7 9 255\n"
    p6 = hdr + PX_RGB.tobytes()
    ascii_body = " ".join(str(int(v)) for v in PX_RGB.ravel())
    p3 = b"P3\n# a comment\n7 9\n255\n" + ascii_body.encode()
    for payload in (p6, p3):
        w, h, n_frames, feat = _strict_decode(payload)
        assert (w, h, n_frames) == (7, 9, 1)
        assert feat == pytest.approx(expected_image_features(PX_RGB), abs=1e-12)


def test_pgm_binary():
    p5 = b"P5\n6 5\n255\n" + PX_GRAY.tobytes()
    w, h, _, feat = _strict_decode(p5)
    assert (w, h) == (6, 5)
    assert feat == pytest.approx(expected_image_features(PX_GRAY), abs=1e-12)


def test_wav_pcm16():
    t = np.arange(800)
    samples = (np.sin(2 * np.pi * t / 50.0) * 12000).astype(np.int64)
    stereo = np.repeat(samples, 2)  # L==R interleave
    payload = make_wav(stereo, rate=8000, channels=2)
    rate, channels, n_frames, feat = _strict_decode(payload)
    assert (rate, channels, n_frames) == (8000, 2, 800)
    want = np.abs(stereo.astype(np.float64) / 32768.0)
    segs = np.array_split(want, FEATURE_DIM)
    assert feat == pytest.approx([float(s.mean()) for s in segs], abs=1e-12)


def test_truncated_and_bad_payloads_raise():
    with pytest.raises(ValueError, match="unsupported magic"):
        _strict_decode(b"\xff\xd8\xff\xe0JFIF")  # JPEG needs a codec
    with pytest.raises(ValueError, match="truncated"):
        _strict_decode(b"P6 4 4 255\n\x00\x01")
    with pytest.raises(ValueError, match="color type"):
        px = PX_GRAY
        bad = make_png(px, 0).replace(
            _chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0)),
            _chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0)),
        )
        _strict_decode(bad)


def test_strict_decode_through_spark(spark):
    rows = [
        ("png", bytearray(make_png(PX_RGB, 2, filters=[4] * 9))),
        ("ppm", bytearray(b"P6 7 9 255\n" + PX_RGB.tobytes())),
        ("wav", bytearray(make_wav(
            (np.arange(200) % 64 * 512 - 16000).astype(np.int64), 16000, 1))),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {
        r["media_id"]: r
        for r in decode_media(df, mode="strict").collect()
    }
    assert got["png"]["width"] == 7 and got["png"]["height"] == 9
    assert got["png"]["feature"] == pytest.approx(
        expected_image_features(PX_RGB), abs=1e-6)
    assert got["ppm"]["feature"] == pytest.approx(
        got["png"]["feature"], abs=1e-6)  # same pixels, two containers
    assert got["wav"]["width"] == 16000 and got["wav"]["n_frames"] == 200
    assert got["wav"]["n_bytes"] > 0


def test_strict_decode_on_error_keep_routes_bad_rows(spark):
    """on_error='keep' (the 100 TB posture): one corrupt payload in the
    batch must not kill the job — it keeps identity + n_bytes, nulls
    the metadata, and carries the exception text in decode_error;
    clean rows are byte-identical to the on_error='fail' result."""
    import pyspark.sql.utils  # noqa: F401

    good = bytearray(b"P6 7 9 255\n" + PX_RGB.tobytes())
    rows = [
        ("ok", good),
        ("bad_magic", bytearray(b"GIF89a not supported")),
        ("truncated", bytearray(b"P6 7 9 255\n" + PX_RGB.tobytes()[:10])),
        ("empty", bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = decode_media(df, mode="strict", on_error="keep")
    assert "decode_error" in out.columns
    got = {r["media_id"]: r for r in out.collect()}
    assert got["ok"]["decode_error"] is None
    assert got["ok"]["feature"] == pytest.approx(
        expected_image_features(PX_RGB), abs=1e-6)
    for bad in ("bad_magic", "truncated", "empty"):
        assert got[bad]["width"] is None and got[bad]["feature"] is None
        assert "ValueError" in got[bad]["decode_error"]
        assert got[bad]["n_bytes"] == len(dict(rows)[bad])
    # default stays fail-fast: the same frame raises through Spark
    with pytest.raises(Exception, match="unsupported magic|truncated"):
        decode_media(df, mode="strict").collect()


def test_crlf_delimited_binary_pnm_raises():
    """A CR as the single post-maxval delimiter means the payload went
    through CRLF/text-mode translation — the binary raster is
    untrustworthy (its 0x0A bytes were likely rewritten too). Silently
    skipping one byte decoded shifted-by-one pixels that PASSED the
    size check (review r5s5); strict must surface it, not invent data."""
    crlf = b"P6 7 9 255\r\n" + PX_RGB.tobytes()
    with pytest.raises(ValueError, match="CRLF/text-mode"):
        _strict_decode(crlf)
    # ASCII formats tokenize on whitespace runs — CRLF headers are fine
    p2 = b"P2\r\n6 5\r\n255\r\n" + b" ".join(
        str(v).encode() for v in PX_GRAY.ravel()
    )
    w, h, _, feat = _strict_decode(p2)
    assert (w, h) == (6, 5) and len(feat) == FEATURE_DIM
