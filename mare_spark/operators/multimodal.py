"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract is real and tested — ``binary`` payload columns,
``struct`` metadata, Arrow-batched ``mapInPandas`` decode with a stable
output schema and bounded batch sizes. The actual media decoding is STUBBED
(image/audio libraries are not in this container): ``decoder="fake"``
produces a deterministic feature vector from the bytes so the pipeline is
end-to-end testable; ``decoder="image"``/``"audio"`` raise
``NotImplementedError`` at the point where PIL/librosa would be called.

At 100 TB: payloads stay opaque bytes until the latest possible stage
(decode is the expensive hop, so filter/dedup on metadata FIRST); decode
parallelism is partition-level; Arrow batching keeps the Python boundary
amortized. Frame-sampling/resize compose the same way — a mapInPandas over
(payload, params) → payload'.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal-shaped table from a text fixture: binary payload +
    typed metadata struct (what a real image/audio table looks like)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.lit(1).alias("channels"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a media decoder: md5 → FEATURE_DIM floats
    in [0, 1). Stable across runs/machines."""
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64) / 65536.0


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled "frame" of the
    payload (here: fixed-stride byte slices — a real video decoder would
    substitute keyframe extraction; the Spark shape — explode to
    (id, frame_idx, frame_bytes) with bounded fan-out — is identical).
    """
    from pyspark.sql import functions as F

    n = F.least(
        F.floor(F.length(payload_col) / every_n_bytes) + 1, F.lit(max_frames)
    ).cast("int")
    idx = F.sequence(F.lit(0), n - 1)
    return (
        df.select(id_col, payload_col, F.explode(idx).alias("frame_idx"))
        .select(
            id_col,
            "frame_idx",
            F.substring(
                F.col(payload_col), F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        )
    )


def resize_payload(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target_bytes: int = 128,
) -> DataFrame:
    """Resize/downsample plumbing: truncate-or-pad each payload to a fixed
    size (stands in for image resize; same contract — fixed-shape binary
    out, map-only, no shuffle)."""
    from pyspark.sql import functions as F

    padded = F.rpad(F.col(payload_col), target_bytes, bytes([0]))
    return df.select(
        F.col(id_col),
        F.substring(padded, 1, target_bytes).alias("payload_resized"),
        F.length(payload_col).alias("original_bytes"),
    )


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """Decode binary payloads to fixed-size feature vectors via Arrow-batched
    mapInPandas (vectorized Python; one worker per partition).

    ``decoder="image"|"audio"|"video"`` are stubs: the Spark plumbing
    (schema, batching, partitioning) is identical, only the per-bytes
    function differs — they raise ``NotImplementedError`` where the codec
    library would be invoked.
    """
    if decoder in ("image", "audio", "video"):
        raise NotImplementedError(
            f"{decoder} decoding requires codec libraries not present in this "
            "environment; use decoder='fake' for the deterministic test path"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")

    schema = f"{id_col} long, n_bytes int, features array<double>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)
