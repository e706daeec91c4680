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
