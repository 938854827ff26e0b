"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference's media path is cv2 frame decoding + YOLO inference
(`/root/reference/services/harvest_service.py:131-158,198-214`); this
container has no image/audio libraries, so the *decode kernels are stubbed*
(clearly marked) while everything Spark-side is real and tested: schema
(MEDIA_SCHEMA), Arrow batch shape, `mapInPandas` iterator plumbing,
partitioning, and the deterministic fake feature extractor used by tests.

At scale: binary payloads ride in parquet as-is; `mapInPandas` streams
Arrow record batches so one task never materializes its whole partition;
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory (set
low for large blobs); decode parallelism = partition count, repartition by
`media_id` upstream if blob sizes are skewed.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

DECODE_AVAILABLE = False  # no cv2/PIL/librosa in this container

_FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, payload_hash long, "
    "features array<string>"
)


def _fake_decode(payload: bytes, kind: str) -> list[str]:
    """Deterministic stand-in for the real decode kernel.

    REAL IMPLEMENTATION (stubbed: libs absent): image → PIL/cv2 decode +
    resize + channel stats; audio → PCM frame sample; video → keyframe
    sample at CLASSIFICATION_FPS stride (reference
    `services/harvest_service.py:156-157`).
    """
    if payload is None:
        return []
    return [f"{kind}:len={len(payload)}", f"head={payload[:4].hex()}"]


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode / feature-extract over binary payloads via ``mapInPandas``.

    Real Arrow-batched iterator plumbing; the per-payload kernel is the
    deterministic fake above until decode libs exist.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "payload_hash": payloads.map(
                        lambda b: 0 if b is None else zlib.crc32(bytes(b))
                    ).astype("int64"),
                    "features": [
                        _fake_decode(None if b is None else bytes(b), k)
                        for b, k in zip(payloads, pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(fn, schema=_FEATURE_SCHEMA)


def frame_sample(media: DataFrame, stride: int = 5) -> DataFrame:
    """Video frame sampling analog (P1 over frames): would decode and keep
    every ``stride``-th frame. Stubbed decode; plumbing kept so the operator
    slot exists."""
    if not DECODE_AVAILABLE:
        raise NotImplementedError(
            "frame decode requires cv2/av, absent in this container; "
            "Spark-side plumbing is exercised via extract_features()"
        )
