"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's in-flight unit is (image bytes + caption + metadata)
(reference clip_inference/reader.py:158-178); here media are BinaryType
columns with a struct of typed metadata, and all per-item work runs in
Arrow-batched ``mapInPandas`` with the decoder constructed once per
Python worker (the mapper init-once pattern, mapper.py:16-48).

The image/audio codec libraries are NOT in this container, so the
decode kernels are deterministic STUBS behind ``_decode_image`` /
``_sample_frames`` (clearly marked); the Spark-side plumbing — schema,
batch shape, UDF signatures, partitioning — is real and tested. Swap
the stub body for PIL/ffmpeg calls on a real cluster; nothing else
changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta_width int, "
    "meta_height int, meta_duration_ms int"
)

FEATURES_FIELDS = "media_id long, kind string, feature array<float>, ok boolean"
THUMB_FIELDS = "media_id long, thumb binary, width int, height int"
FRAMES_FIELDS = "media_id long, frame_idx int, frame binary"

_FEATURE_DIM = 16  # 16 x 4 bytes == blake2b's max digest size


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels from payload bytes.
    Real implementation: PIL.Image.open(BytesIO(payload)) -> np array.
    Raises on empty payload the way a real decoder raises on corrupt
    bytes (exercises the error path)."""
    if not payload:
        raise ValueError("empty payload")  # NotImplemented-alike marker
    h = hashlib.blake2b(payload, digest_size=_FEATURE_DIM * 4).digest()
    arr = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
    return arr / 2**32


def extract_features(media: DataFrame) -> DataFrame:
    """media -> unit-norm feature vectors; corrupt rows yield ok=false
    with a null feature instead of being dropped silently (contrast:
    the reference drops corrupt rows in collate, reader.py:101-104 —
    unauditable at scale)."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavyweight model/codec would be constructed HERE, once
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    v = _decode_image(bytes(payload) if payload else b"")
                    n = float(np.linalg.norm(v))
                    feats.append(
                        (v / n if n else v).astype(np.float32)
                    )
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "ok": oks,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _go, schema=FEATURES_FIELDS
    )


def resize_thumbnails(media: DataFrame, size: int = 64) -> DataFrame:
    """STUB resize: deterministic digest 'thumbnail' of the payload;
    real impl swaps in PIL .resize(). Plumbing (binary->binary batch
    UDF, metadata passthrough) is the real part."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                hashlib.blake2b(
                    bytes(p) if p else b"", digest_size=size
                ).digest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "width": [size] * len(pdf),
                    "height": [size] * len(pdf),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _go, schema=THUMB_FIELDS
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB frame sampling for video rows: emits one deterministic
    'frame' per every_ms of meta_duration_ms (flatMap shape: 1 row in,
    N rows out — the UDTF/explode pattern). Real impl: ffmpeg keyframe
    extraction."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["meta_duration_ms"]
            ):
                n = max(int((dur or 0) // every_ms), 0)
                for i in range(n):
                    rows.append(
                        (
                            mid, i,
                            hashlib.blake2b(
                                (bytes(payload) if payload else b"")
                                + i.to_bytes(4, "little"),
                                digest_size=16,
                            ).digest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame"]
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "meta_duration_ms"
    ).mapInPandas(_go, schema=FRAMES_FIELDS)
