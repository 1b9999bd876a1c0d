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
