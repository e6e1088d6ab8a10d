"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data table carries image/audio/video as ``binary``
columns next to text.  The Spark-side mechanics that must be right at
scale — schema, Arrow batch shape, column pruning (the binary column
must not be read by text-only queries), partition sizing against
``spark.sql.files.maxPartitionBytes`` — are all real here.  The codec
itself (PIL/ffmpeg-style decode) is NOT available in this environment,
so ``decode_image`` is stubbed: a clearly-marked deterministic fake
derives metadata from the bytes, and the real-decoder seam raises
``NotImplementedError``.

Pattern: ``mapInPandas`` over (id, payload) batches — Arrow moves the
binary column zero-copy; the UDF yields a metadata frame (never the
payload back, keeping shuffle width small).

Real decoders (no codec libs needed): container/header formats that
are pure struct parsing are decoded for REAL — BMP / PNG / GIF / JPEG
/ PPM / PGM image geometry and RIFF/WAVE audio (fmt + data chunks, plus
numpy sample statistics over the PCM payload).  Only payloads in none
of those formats fall back to the clearly-marked ``_fake_decode``
stand-in (the seam where PIL/ffmpeg plugs in on clusters that ship
them).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, format string"
)

def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for payloads ``decode_image`` does not
    recognize: derives a fake geometry from the byte length.  STUB —
    the seam where an external codec (PIL / ffmpeg) plugs in for
    formats beyond the struct-parseable set (BMP/PNG/GIF/JPEG/netpbm
    geometry is decoded for REAL above this fallback)."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, "fake")


def _parse_netpbm(p: bytes) -> tuple[int, int, str] | None:
    """P2/P3/P5/P6 header: magic, then whitespace/comment-separated
    ASCII width height [maxval]."""
    fmt = "pgm" if p[:2] in (b"P2", b"P5") else "ppm"
    toks: list[int] = []
    i = 2
    while i < len(p) and len(toks) < 2:
        c = p[i:i + 1]
        if c == b"#":  # comment to end of line
            while i < len(p) and p[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(p) and p[j:j + 1].isdigit():
                j += 1
            toks.append(int(p[i:j]))
            i = j
        else:
            return None
    if len(toks) < 2:
        return None
    return (toks[0], toks[1], fmt)


def _parse_jpeg(p: bytes) -> tuple[int, int, str] | None:
    """JPEG geometry from the first SOF frame header: walk the marker
    stream (each non-entropy segment is FF <marker> <u16 len>), stop at
    SOF0-SOF15 (except the DHT/JPG/DAC markers sharing the range) and
    read its height/width words.  Pure struct parsing — no pixel
    decode, no external codec."""
    if p[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(p)
    while i + 4 <= n:
        if p[i] != 0xFF:
            return None  # lost sync: corrupt or truncated
        marker = p[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack_from(">H", p, i + 2)[0]
        if seg_len < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h, w = struct.unpack_from(">HH", p, i + 5)
            return (int(w), int(h), "jpeg")
        i += 2 + seg_len
    return None


def decode_image(payload: bytes) -> tuple[int, int, str] | None:
    """REAL geometry decode for struct-parseable image containers:
    BMP (BITMAPINFOHEADER, signed height = top-down), PNG (IHDR),
    GIF (logical screen descriptor), JPEG (marker walk to the SOF
    frame header), PPM/PGM (ASCII header).  Returns
    None for unrecognized payloads (the external-codec seam)."""
    p = payload
    if p[:2] == b"\xff\xd8":
        return _parse_jpeg(p)
    if p[:2] == b"BM" and len(p) >= 26:
        w = struct.unpack_from("<i", p, 18)[0]
        h = struct.unpack_from("<i", p, 22)[0]
        return (w, abs(h), "bmp")
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
        w, h = struct.unpack_from(">II", p, 16)
        return (int(w), int(h), "png")
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        w, h = struct.unpack_from("<HH", p, 6)
        return (int(w), int(h), "gif")
    if p[:2] in (b"P2", b"P3", b"P5", b"P6"):
        return _parse_netpbm(p)
    return None


def synth_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic 24-bpp BMP (BITMAPINFOHEADER, 4-byte-aligned
    rows) — a REAL, spec-conformant file for fixtures and gates."""
    row = ((3 * width + 3) // 4) * 4
    data_size = row * height
    header = (b"BM" + struct.pack("<IHHI", 54 + data_size, 0, 0, 54)
              + struct.pack("<iiiHHIIiiII", 40, width, height, 1, 24, 0,
                            data_size, 2835, 2835, 0, 0))
    idx = np.arange(data_size, dtype=np.int64)
    pixels = ((idx * 31 + seed) % 256).astype(np.uint8)
    return header + pixels.tobytes()


def synth_jpeg(width: int, height: int) -> bytes:
    """Deterministic JPEG marker stream with a real JFIF APP0, a
    luminance DQT, and an SOF0 baseline frame header carrying the
    geometry — structurally valid for any marker-walking parser
    (what ``_parse_jpeg`` and web crawlers' sniffers read; entropy
    data is not included, exactly like a truncated crawl payload
    whose headers still parse)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        (i * 7) % 255 + 1 for i in range(64))
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", height, width) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload:binary) -> (doc_id, n_bytes, width, height,
    format) via an Arrow-batched kernel.  BMP/PNG/GIF/PPM/PGM payloads
    are decoded for real (``decode_image``); unrecognized payloads fall
    back to the ``_fake_decode`` stand-in with format='fake'.

    Only ``doc_id`` and the payload column cross into Python (select
    before calling keeps Parquet column pruning effective).
    """
    cols = df.select("doc_id", payload_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image(bytes(p)) or _fake_decode(bytes(p))
                     for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return cols.mapInPandas(kernel, DECODE_SCHEMA)


# --- audio (RIFF/WAVE): real header decode + numpy sample stats ------------

WAV_SCHEMA = ("doc_id long, n_bytes long, n_channels int, sample_rate int, "
              "bit_depth int, n_samples long, duration_us long, "
              "rms_micro long, peak int, zero_crossings long")


def synth_wav(n_samples: int, amplitude: int,
              sample_rate: int = 16000) -> bytes:
    """Deterministic PCM16 mono WAV: samples alternate +amplitude /
    -amplitude (exact analytic RMS = amplitude, zero crossings =
    n_samples - 1) — a REAL RIFF/WAVE file for fixtures and gates."""
    samples = np.empty(n_samples, dtype="<i2")
    samples[0::2] = amplitude
    samples[1::2] = -amplitude
    data = samples.tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                    sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> dict | None:
    """REAL RIFF/WAVE decode: walk the chunk list for fmt + data, then
    numpy statistics over the PCM16 samples (RMS, peak, zero
    crossings).  Returns None for non-WAV payloads AND for malformed/
    truncated ones (a corrupt crawl capture must yield the documented
    zeros row, not a struct.error that kills the whole Spark task)."""
    try:
        return _decode_wav_unsafe(payload)
    except (struct.error, ValueError, IndexError):
        return None


def _decode_wav_unsafe(payload: bytes) -> dict | None:
    p = payload
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        size = struct.unpack_from("<I", p, i + 4)[0]
        body = p[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    _audio_fmt, n_channels, sample_rate, _byte_rate, block_align, bits = fmt
    n_samples = len(data) // block_align if block_align else 0
    out = {"n_channels": int(n_channels), "sample_rate": int(sample_rate),
           "bit_depth": int(bits), "n_samples": int(n_samples),
           "duration_us": int(n_samples) * 1_000_000 // int(sample_rate)
           if sample_rate else 0}
    if bits == 16:
        x = np.frombuffer(data[: n_samples * block_align],
                          dtype="<i2").astype(np.float64)
        out["rms_micro"] = int(round(float(np.sqrt(np.mean(x * x))) * 1e6)) \
            if len(x) else 0
        out["peak"] = int(np.max(np.abs(x))) if len(x) else 0
        out["zero_crossings"] = int(np.sum(np.signbit(x[1:]) !=
                                           np.signbit(x[:-1]))) if len(x) > 1 else 0
    else:  # stats only defined for PCM16 here
        out["rms_micro"] = 0
        out["peak"] = 0
        out["zero_crossings"] = 0
    return out


def decode_wav_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload:binary) -> WAV header metadata + real numpy
    sample statistics, Arrow-batched.  Non-WAV payloads yield a row of
    zeros with n_channels = 0 (schema-stable; filter on it)."""
    cols = df.select("doc_id", payload_col)
    zero = {"n_channels": 0, "sample_rate": 0, "bit_depth": 0,
            "n_samples": 0, "duration_us": 0, "rms_micro": 0, "peak": 0,
            "zero_crossings": 0}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_wav(bytes(p)) or zero for p in pdf[payload_col]]
            out = {"doc_id": pdf["doc_id"],
                   "n_bytes": [len(bytes(p)) for p in pdf[payload_col]]}
            for k in ("n_channels", "sample_rate", "bit_depth", "n_samples",
                      "duration_us", "rms_micro", "peak", "zero_crossings"):
                out[k] = [m[k] for m in metas]
            yield pd.DataFrame(out)

    return cols.mapInPandas(kernel, WAV_SCHEMA)


FEATURE_DIM = 8
FEATURES_SCHEMA = "doc_id long, features array<double>"


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic pseudo-embedding from md5 of (payload, dim index),
    components in [-1, 1] at 1e-6 resolution.  STUB — the seam where a
    real vision/audio encoder (CLIP-style) plugs in on clusters that
    ship one; the Spark plumbing (schema, batching, downstream ANN
    compatibility) is real and tested."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(payload + f":{j}".encode()).hexdigest()[:8]
        out.append(((int(h, 16) % 2000001) - 1000000) / 1e6)
    return out


def extract_features(df: DataFrame, payload_col: str = "payload",
                     dim: int = FEATURE_DIM) -> DataFrame:
    """(doc_id, payload:binary) -> (doc_id, features:array<double>) via
    an Arrow-batched kernel.  Output feeds the similarity operators
    (cosine top-k / IVF / near-dup) unchanged — the multimodal
    embedding path of a curation pipeline."""
    cols = df.select("doc_id", payload_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "features": [
                    _fake_features(bytes(p), dim) for p in pdf[payload_col]
                ],
            })

    return cols.mapInPandas(kernel, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n_bytes: int = 1 << 10) -> DataFrame:
    """Video-style frame sampling plan: (doc_id, frame_no, byte_offset)
    rows derived from payload length — the partition-explode shape a
    real frame extractor would use (explode stays JVM-side; the decode
    of each sampled frame would be a second mapInPandas over ranges)."""
    from pyspark.sql import functions as F

    return df.select(
        "doc_id",
        F.posexplode(
            F.expr(
                # ceil-div so every payload yields >=1 frame; greatest
                # guards the sequence against counting down on empties
                f"transform(sequence(0, greatest(cast(ceil(length(payload) / {every_n_bytes}.0) as int), 1) - 1),"
                f" i -> i * {every_n_bytes})"
            )
        ).alias("frame_no", "byte_offset"),
    )


# --- real PNG pixel decode (stdlib zlib + numpy unfiltering) ------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/px


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import binascii
    import struct as _s

    return (_s.pack(">I", len(data)) + tag + data
            + _s.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF))


def _png_filter_scanline(ftype: int, raw: np.ndarray, prior: np.ndarray,
                         bpp: int) -> np.ndarray:
    """Apply PNG filter ``ftype`` to one raw scanline (encoder side)."""
    raw16 = raw.astype(np.int16)
    left = np.zeros_like(raw16)
    left[bpp:] = raw16[:-bpp]
    up = prior.astype(np.int16)
    upleft = np.zeros_like(raw16)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = raw16
    elif ftype == 1:
        out = raw16 - left
    elif ftype == 2:
        out = raw16 - up
    elif ftype == 3:
        out = raw16 - ((left + up) >> 1)
    elif ftype == 4:
        p = left + up - upleft
        pa, pb, pc = (np.abs(p - left), np.abs(p - up), np.abs(p - upleft))
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, upleft))
        out = raw16 - pred
    else:  # pragma: no cover - caller controls ftype
        raise ValueError(f"bad filter {ftype}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(px: np.ndarray, *, color_type: int | None = None) -> bytes:
    """Encode an (height, width, channels) uint8 array as a
    spec-conformant non-interlaced 8-bit PNG.  Scanline filters CYCLE
    through all five types (row % 5), so any decoder must perform real
    Sub/Up/Average/Paeth inversion, not just zlib."""
    import struct as _s
    import zlib

    height, width, ch = px.shape
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if _PNG_CHANNELS[color_type] != ch:
        raise ValueError("color_type does not match channel count")
    bpp = ch
    lines = bytearray()
    prior = np.zeros(width * ch, dtype=np.uint8)
    for row in range(height):
        raw = np.ascontiguousarray(px[row]).reshape(-1)
        ftype = row % 5
        lines.append(ftype)
        lines.extend(_png_filter_scanline(ftype, raw, prior, bpp).tobytes())
        prior = raw
    ihdr = _s.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
            + _png_chunk(b"IEND", b""))


def synth_png(width: int, height: int, seed: int = 0, *,
              color_type: int = 2) -> bytes:
    """Spec-conformant non-interlaced 8-bit PNG whose pixel (x, y,
    channel c) value is ``(seed*7 + c*11 + x*3 + y*5) % 256`` — the
    same closed form the gate oracle recomputes in SQL."""
    ch = _PNG_CHANNELS[color_type]
    y, x, c = np.ogrid[:height, :width, :ch]
    px = ((seed * 7 + c * 11 + x * 3 + y * 5) % 256).astype(np.uint8)
    return encode_png(px, color_type=color_type)


def decode_png_pixels(payload: bytes) -> np.ndarray | None:
    """REAL PNG pixel decode via stdlib zlib + numpy: non-interlaced
    8-bit gray/RGB/gray-alpha/RGBA, all five scanline filters
    (None/Sub/Up/Average/Paeth per RFC 2083).  Returns (height, width,
    channels) uint8, or None for signatures/variants this pure-python
    path does not cover (the seam where a codec lib plugs in), and for
    MALFORMED payloads (truncated IHDR, garbage IDAT) — a corrupt PNG
    must produce the caller\'s NULL-stats row, not a zlib/struct error
    that kills the whole Spark task."""
    import struct as _s
    import zlib

    try:
        return _decode_png_pixels_unsafe(payload)
    except (_s.error, zlib.error, ValueError, IndexError):
        return None


def _decode_png_pixels_unsafe(payload: bytes) -> np.ndarray | None:
    import struct as _s
    import zlib

    if not payload.startswith(_PNG_SIG):
        return None
    pos, ihdr, idat = len(_PNG_SIG), None, bytearray()
    while pos + 8 <= len(payload):
        (length,), tag = _s.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = _s.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if ihdr is None:
        return None
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp or filt or interlace or \
            color_type not in _PNG_CHANNELS:
        return None
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        return None
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int16)
    bpp = ch
    for row in range(height):
        line = raw[row * (stride + 1):(row + 1) * (stride + 1)]
        ftype = line[0]
        cur = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int16)
        if ftype == 0:
            rec = cur
        elif ftype == 2:
            rec = (cur + prior) & 0xFF
        elif ftype in (1, 3, 4):
            # left-dependent filters are sequential in x by definition;
            # recurrence over width*channels bytes per row
            rec = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                up = prior[i]
                upleft = prior[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = left if pa <= pb and pa <= pc else \
                        (up if pb <= pc else upleft)
                rec[i] = (cur[i] + pred) & 0xFF
        else:
            return None
        out[row] = rec.astype(np.uint8)
        prior = out[row].astype(np.int16)
    return out.reshape(height, width, ch)


PIXEL_STATS_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "mean_r_micro long, mean_g_micro long, mean_b_micro long, "
    "min_px int, max_px int"
)


def image_pixel_stats(df: DataFrame,
                      payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload:binary) -> per-channel pixel statistics from
    the REAL decoded pixel array (decode_png_pixels).  Non-decodable
    payloads yield a NULL-stats row rather than a fake, so downstream
    sees exactly which rows carried a supported codec.

    Means are micro-quantized from exact integer sums (uint8 pixels
    sum exactly in int64), so the values are bit-reproducible by an
    oracle that recomputes the synthetic pixel formula.  Grayscale
    repeats the single channel across mean_r/g/b."""
    cols = df.select("doc_id", payload_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                px = decode_png_pixels(bytes(p))
                if px is None:
                    rows.append((doc_id, None, None, None,
                                 None, None, None, None, None))
                    continue
                h, w, ch = px.shape
                n = h * w
                sums = px.reshape(-1, ch).astype(np.int64).sum(axis=0)
                # color channels only: gray (1ch) and gray+alpha (2ch)
                # repeat channel 0 across r/g/b — min(c, ch-1) would
                # leak the ALPHA plane into mean_g/mean_b for 2-channel
                # images; min/max below still cover every channel
                ncolor = 1 if ch <= 2 else 3
                # explicit half-up (not Python banker's round), matching
                # the SQL oracle's FLOOR(x*1e6 + 0.5)
                means = [int(int(sums[min(c, ncolor - 1)]) / n * 1e6 + 0.5)
                         for c in range(3)]
                rows.append((doc_id, w, h, ch, *means,
                             int(px.min()), int(px.max())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "channels", "mean_r_micro",
                "mean_g_micro", "mean_b_micro", "min_px", "max_px"])

    return cols.mapInPandas(kernel, PIXEL_STATS_SCHEMA)
