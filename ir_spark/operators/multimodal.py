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
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, format string"
)

_HAVE_REAL_DECODER = False  # PIL/imageio absent in this environment
try:  # pragma: no cover - real decoder only exists on full clusters
    import PIL.Image  # noqa: F401

    _HAVE_REAL_DECODER = True
except ImportError:
    pass


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for image decode: derives a fake
    geometry from the byte length.  STUB — replace with a real codec
    (PIL / turbojpeg) on clusters that ship one."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, "fake")


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload:binary) -> (doc_id, n_bytes, width, height,
    format) via an Arrow-batched kernel.

    Only ``doc_id`` and the payload column cross into Python (select
    before calling keeps Parquet column pruning effective).
    """
    cols = df.select("doc_id", payload_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_REAL_DECODER:  # pragma: no cover
                raise NotImplementedError(
                    "real image decode seam: wire PIL.Image.open here")
            metas = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
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
