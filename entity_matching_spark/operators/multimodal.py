"""Multimodal column plumbing: opaque binary payloads + Arrow-batch features.

Large-scale training-data pipelines treat image/audio/video as opaque
``binary`` columns with typed metadata and decode/feature-extract via
Arrow-batched Python (mapInPandas). The decode libraries (PIL/ffmpeg/etc.)
are absent in this environment, so the decoder is pluggable:

- ``decoder="stats"`` (default): a deterministic fake decoder computing
  byte-level statistics — stands in for real decoding while keeping every
  Spark-side concern (schema, Arrow batch shape, partition parallelism,
  null/empty payload handling) real and tested.
- ``decoder="image"`` / ``"audio"``: raise NotImplementedError with a clear
  message; the UDF signature and output schema are what a real decoder would
  use, so wiring a library in is a body-swap, not a redesign.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "byte_sum bigint, byte_min int, byte_max int, "
    "byte_mean double, byte_std double, head_hex string, feature array<double>"
)


def _fake_decode_stats(payload: bytes | None) -> dict:
    """Deterministic byte-stat features (the stand-in decoder).

    byte_sum/byte_min/byte_max are exact integers so downstream comparisons
    (and the driver's cross-engine value hash) never depend on float
    summation order; byte_mean/byte_std/feature are the float feature path a
    real decoder would produce.
    """
    import numpy as np

    if payload is None or len(payload) == 0:
        return {
            "byte_sum": 0, "byte_min": 0, "byte_max": 0,
            "byte_mean": 0.0, "byte_std": 0.0, "head_hex": "", "feature": [0.0] * 4,
        }
    arr = np.frombuffer(payload, dtype=np.uint8)
    q = np.quantile(arr, [0.25, 0.5, 0.75]).tolist()
    return {
        "byte_sum": int(arr.sum(dtype=np.int64)),
        "byte_min": int(arr.min()),
        "byte_max": int(arr.max()),
        "byte_mean": float(arr.mean()),
        "byte_std": float(arr.std()),
        "head_hex": payload[:8].hex(),
        "feature": [float(arr.min()), *q],
    }


def extract_binary_features(
    payloads: DataFrame, decoder: str = "stats", batch_rows: int | None = None
) -> DataFrame:
    """(doc_id, payload binary, media_type, n_bytes) -> feature rows.

    mapInPandas keeps payload bytes inside Arrow batches (no per-row pickling
    through the JVM boundary) and preserves the input partitioning — at scale
    the decode cost dominates, so parallelism is the scan's parallelism.
    """
    if decoder != "stats":
        raise NotImplementedError(
            f"decoder={decoder!r}: real media decoding is stubbed in this "
            "environment (no image/audio libraries); use decoder='stats'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode_stats)
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "byte_sum": feats.map(lambda f: f["byte_sum"]),
                "byte_min": feats.map(lambda f: f["byte_min"]),
                "byte_max": feats.map(lambda f: f["byte_max"]),
                "byte_mean": feats.map(lambda f: f["byte_mean"]),
                "byte_std": feats.map(lambda f: f["byte_std"]),
                "head_hex": feats.map(lambda f: f["head_hex"]),
                "feature": feats.map(lambda f: f["feature"]),
            })
            yield out

    return payloads.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset bigint, frame_bytes int, frame_hash string"
)


def sample_frames(
    payloads: DataFrame,
    frame_size: int = 32,
    stride: int = 64,
    max_frames: int = 8,
    decoder: str = "bytes",
) -> DataFrame:
    """Frame sampling over opaque media payloads — the ONE-TO-MANY
    mapInPandas shape (each input row yields up to ``max_frames`` frame
    rows), which is the batch pattern video frame extraction needs.

    ``decoder="bytes"`` (default) treats every ``stride`` bytes as a frame
    boundary and hashes a ``frame_size``-byte window — a deterministic
    stand-in for container-aware parsing (ffmpeg/PyAV are absent in this
    environment) that keeps the Spark-side concerns real: Arrow batch
    explosion, per-frame schema, offset bookkeeping, parallelism = scan
    partitioning. ``decoder="video"`` raises NotImplementedError with the
    schema a real decoder would fill.
    """
    if decoder != "bytes":
        raise NotImplementedError(
            f"decoder={decoder!r}: container-aware frame decoding is stubbed "
            "in this environment (no ffmpeg/PyAV); use decoder='bytes'"
        )
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_offset": [],
                "frame_bytes": [], "frame_hash": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                for idx in range(max_frames):
                    off = idx * stride
                    if off >= len(payload):
                        break
                    chunk = bytes(payload[off:off + frame_size])
                    cols["doc_id"].append(doc_id)
                    cols["frame_idx"].append(idx)
                    cols["frame_offset"].append(off)
                    cols["frame_bytes"].append(len(chunk))
                    cols["frame_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(cols)

    return payloads.mapInPandas(run, schema=FRAME_SCHEMA)
