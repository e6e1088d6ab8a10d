"""Real multimodal decoders: BMP/PNG/GIF/PPM geometry and RIFF/WAVE
header + numpy sample statistics — pure struct/numpy parsing with
golden byte fixtures, plus the Spark mapInPandas round trips."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ir_spark.operators.multimodal import (
    decode_image,
    decode_image_meta,
    decode_wav,
    decode_wav_meta,
    synth_bmp,
    synth_wav,
)


def _golden_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def test_decode_image_formats():
    assert decode_image(synth_bmp(17, 9)) == (17, 9, "bmp")
    # top-down BMP stores negative height
    neg = bytearray(synth_bmp(5, 3))
    neg[22:26] = struct.pack("<i", -3)
    assert decode_image(bytes(neg)) == (5, 3, "bmp")
    assert decode_image(_golden_png(640, 480)) == (640, 480, "png")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert decode_image(gif) == (320, 200, "gif")
    ppm = b"P6\n# a comment\n12 34\n255\n" + b"\x00" * (12 * 34 * 3)
    assert decode_image(ppm) == (12, 34, "ppm")
    pgm = b"P5 7 8 255 " + b"\x00" * 56
    assert decode_image(pgm) == (7, 8, "pgm")
    assert decode_image(b"not an image at all") is None
    assert decode_image(b"") is None


def test_synth_bmp_is_spec_conformant():
    w, h = 10, 4
    p = synth_bmp(w, h)
    row = ((3 * w + 3) // 4) * 4
    assert len(p) == 54 + row * h
    assert struct.unpack_from("<I", p, 2)[0] == len(p)  # file size field
    assert struct.unpack_from("<H", p, 28)[0] == 24  # bpp


def test_decode_wav_analytic_stats():
    n, a = 101, 12345
    meta = decode_wav(synth_wav(n, a, sample_rate=8000))
    assert meta["n_channels"] == 1
    assert meta["sample_rate"] == 8000
    assert meta["bit_depth"] == 16
    assert meta["n_samples"] == n
    assert meta["duration_us"] == n * 1_000_000 // 8000
    # alternating +/-a: RMS == a exactly, every adjacent pair crosses
    assert meta["rms_micro"] == a * 1_000_000
    assert meta["peak"] == a
    assert meta["zero_crossings"] == n - 1
    assert decode_wav(b"RIFFxxxxNOPE") is None
    assert decode_wav(b"short") is None


def test_decode_wav_matches_numpy_on_random_samples():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, size=500, dtype=np.int16)
    data = x.astype("<i2").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    meta = decode_wav(wav)
    xf = x.astype(np.float64)
    assert meta["rms_micro"] == int(round(float(np.sqrt(np.mean(xf * xf))) * 1e6))
    assert meta["peak"] == int(np.max(np.abs(xf)))
    assert meta["zero_crossings"] == int(
        np.sum(np.signbit(xf[1:]) != np.signbit(xf[:-1])))


def test_spark_image_meta_mixed_formats(spark):
    rows = [
        (1, synth_bmp(17, 9)),
        (2, _golden_png(32, 16)),
        (3, b"opaque jpeg-ish payload xxxxx"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id long, payload binary")
    got = {r.doc_id: (r.width, r.height, r.format, r.n_bytes)
           for r in decode_image_meta(df).collect()}
    assert got[1] == (17, 9, "bmp", len(rows[0][1]))
    assert got[2] == (32, 16, "png", len(rows[1][1]))
    assert got[3][2] == "fake"  # unrecognized -> declared stub path


def test_spark_wav_meta_roundtrip(spark):
    rows = [(1, synth_wav(50, 1000)), (2, b"not audio")]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_wav_meta(df).collect()}
    assert got[1].n_samples == 50
    assert got[1].rms_micro == 1000 * 1_000_000
    assert got[1].zero_crossings == 49
    assert got[2].n_channels == 0  # schema-stable non-WAV row


# --- real PNG pixel decode (round 3) -------------------------------------------


def test_png_pixel_roundtrip_all_color_types_and_filters():
    import numpy as np

    from ir_spark.operators.multimodal import decode_png_pixels, synth_png

    chans = {0: 1, 2: 3, 4: 2, 6: 4}
    for ct, ch in chans.items():
        for w, h, s in ((1, 1, 0), (7, 11, 3), (16, 5, 9), (3, 13, 42)):
            px = decode_png_pixels(synth_png(w, h, s, color_type=ct))
            assert px is not None and px.shape == (h, w, ch)
            y, x, c = np.ogrid[:h, :w, :ch]
            want = ((s * 7 + c * 11 + x * 3 + y * 5) % 256).astype(np.uint8)
            assert (px == want).all(), (ct, w, h, s)


def test_png_decode_rejects_unsupported():
    from ir_spark.operators.multimodal import decode_png_pixels, synth_bmp

    assert decode_png_pixels(b"not a png") is None
    assert decode_png_pixels(synth_bmp(4, 4)) is None
    # truncated PNG (signature only)
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\n") is None


def test_image_pixel_stats_real_and_fallback(spark):
    import pandas as pd

    from ir_spark.operators.multimodal import image_pixel_stats, synth_png

    rows = [(1, synth_png(4, 5, seed=1, color_type=2)),
            (2, synth_png(3, 6, seed=2, color_type=0)),
            (3, b"unsupported bytes")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]))
    got = {r["doc_id"]: r for r in image_pixel_stats(df).collect()}
    r1 = got[1]
    assert (r1["width"], r1["height"], r1["channels"]) == (4, 5, 3)
    # exact mean recompute for doc 1 channel 0
    vals = [(1 * 7 + 0 * 11 + x * 3 + y * 5) % 256
            for x in range(4) for y in range(5)]
    assert r1["mean_r_micro"] == int(sum(vals) / len(vals) * 1e6 + 0.5)
    # grayscale repeats the single channel across r/g/b
    r2 = got[2]
    assert r2["channels"] == 1
    assert r2["mean_r_micro"] == r2["mean_g_micro"] == r2["mean_b_micro"]
    # unsupported payloads yield NULL stats, not fakes
    r3 = got[3]
    assert r3["width"] is None and r3["mean_r_micro"] is None


def test_png_roundtrip_property_random_arrays():
    """encode_png/decode_png_pixels are exact inverses on arbitrary
    uint8 content — not just the gate's closed-form pattern."""
    import numpy as np

    from ir_spark.operators.multimodal import decode_png_pixels, encode_png

    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from hypothesis.extra.numpy import arrays
    except ImportError:  # pragma: no cover - hypothesis is baked in
        rng = np.random.default_rng(7)
        for ch in (1, 2, 3, 4):
            px = rng.integers(0, 256, (9, 6, ch), dtype=np.uint8)
            assert (decode_png_pixels(encode_png(px)) == px).all()
        return

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12),
           st.sampled_from([1, 2, 3, 4]), st.data())
    def check(h, w, ch, data):
        px = data.draw(arrays(np.uint8, (h, w, ch)))
        out = decode_png_pixels(encode_png(px))
        assert out is not None and out.shape == px.shape
        assert (out == px).all()

    check()


def test_jpeg_geometry_decode():
    """JPEG marker walk: real SOF geometry, progressive SOF2, restart/
    fill tolerance, and honest None on streams without a frame."""
    from ir_spark.operators.multimodal import (_parse_jpeg, decode_image,
                                               synth_jpeg)

    assert decode_image(synth_jpeg(321, 123)) == (321, 123, "jpeg")
    assert decode_image(synth_jpeg(1, 1)) == (1, 1, "jpeg")
    assert decode_image(synth_jpeg(65535, 65535)) == (65535, 65535, "jpeg")
    # progressive (SOF2) carries geometry the same way
    prog = bytearray(synth_jpeg(40, 30))
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    assert decode_image(bytes(prog)) == (40, 30, "jpeg")
    # a DHT (0xC4) before the SOF must NOT be mistaken for a frame
    import struct as st

    dht = b"\xff\xc4" + st.pack(">H", 5) + b"\x00\x01\x02"
    j = synth_jpeg(7, 9)
    with_dht = j[:2] + dht + j[2:]
    assert decode_image(with_dht) == (7, 9, "jpeg")
    # fill bytes and restart markers are walked over
    weird = b"\xff\xd8\xff\xff\xff\xd0" + j[2:]
    assert decode_image(weird) == (7, 9, "jpeg")
    # no SOF before EOI / truncation / lost sync -> None (fake seam)
    assert _parse_jpeg(b"\xff\xd8\xff\xd9") is None
    assert _parse_jpeg(b"\xff\xd8garbage") is None
    assert _parse_jpeg(j[:10]) is None


def test_decode_image_meta_includes_jpeg(spark):
    from ir_spark.operators.multimodal import decode_image_meta, synth_jpeg

    rows = [(0, bytearray(synth_jpeg(64, 48))),
            (1, bytearray(b"unknown-bytes"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["width"], r["height"], r["format"])
           for r in decode_image_meta(df).collect()}
    assert got[0] == (64, 48, "jpeg")
    assert got[1][2] == "fake"
