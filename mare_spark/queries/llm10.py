"""Round-8 registrations: the dependency-free media-decode row (real BMP
pixel / WAV PCM byte arithmetic, hash-checked against an oracle that
replays the same arithmetic from doc_id) and the RAG-shaped end-to-end
composition row (chunk -> embed -> IVF-PQ -> metadata-gated retrieval).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mare_spark.registry import register
from mare_spark.tables import read_table

# Synthetic-payload arithmetic shared by the Spark builder and the DuckDB
# oracle: even doc_ids become full 24bpp BMPs, odd doc_ids PCM WAVs, with
# every pixel byte / sample an explicit function of (doc_id, position) —
# so the oracle can recompute the decoded stats WITHOUT touching bytes,
# and any drift in the synthesizer's file layout or the decoder's
# unpacking (row padding, bottom-up order, int16 endianness, chunk walk)
# hash-fails the row.
_MEDIA_ORACLE = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END
           AS mime,
         CASE WHEN doc_id % 2 = 0
              THEN (1 + doc_id % 5) * (1 + doc_id % 4) * 3
              ELSE (8 + doc_id % 9) * (1 + doc_id % 2) END AS n
  FROM documents
),
v AS (
  SELECT doc_id, mime, n,
         CASE WHEN mime = 'image/bmp'
              THEN (doc_id * 7 + j * 13) % 256
              ELSE ((doc_id * 31 + j * 17) % 65536) - 32768 END AS val
  FROM b, UNNEST(range(n)) AS u(j)
)
SELECT doc_id, mime,
       CAST(count(*) AS BIGINT) AS n_units,
       CAST(sum(val) AS BIGINT) AS val_sum,
       CAST(min(val) AS INT) AS val_min,
       CAST(max(val) AS INT) AS val_max
FROM v
GROUP BY doc_id, mime
"""


@register("multimodal_media_stats", category="llm", oracle=_MEDIA_ORACLE)
def multimodal_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decoding, hash-checked: every document gets a COMPLETE
    synthetic media file (even doc_ids a spec-true 24bpp BMP — 54-byte
    header, bottom-up rows, 4-byte row padding; odd doc_ids a canonical
    PCM WAV — RIFF chunk chain, interleaved little-endian int16), whose
    pixel bytes / samples are explicit arithmetic in (doc_id, position).
    The engine must recover exact integer stats by actually PARSING and
    UNPACKING the bytes (:func:`multimodal.decode_media_stats` — mime
    sniff, then pure-numpy :func:`decode_bmp` / :func:`decode_wav`); the
    DuckDB oracle recomputes the same stats from the arithmetic alone,
    so a wrong stride, a missed bottom-up flip, or a sign error in the
    int16 unpack hash-fails.

    Scale shape: payload build + decode are one fused Arrow-batched
    scan-side pass, zero shuffle; per-row output is 6 scalars regardless
    of payload size — decode rides AFTER metadata-first filtering in a
    real pipeline (module docstring posture).
    """
    from mare_spark.operators.multimodal import (
        decode_media_stats,
        synthesize_media_payload,
    )

    @F.pandas_udf("binary")
    def build(ids: pd.Series) -> pd.Series:
        def one(i):
            i = int(i)
            if i % 2 == 0:
                w, h = 1 + i % 5, 1 + i % 4
                n = w * h * 3
                body = bytes(
                    ((i * 7 + np.arange(n) * 13) % 256).astype(np.uint8)
                )
                return synthesize_media_payload(
                    "bmp24", width=w, height=h, body=body
                )
            ch, frames = 1 + i % 2, 8 + i % 9
            n = frames * ch
            samples = (
                ((i * 31 + np.arange(n) * 17) % 65536) - 32768
            ).astype("<i2")
            return synthesize_media_payload(
                "wav", channels=ch,
                sample_rate=8000 + (i % 8) * 1000,
                body=samples.tobytes(),
            )

        return ids.map(one)

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.withColumn("payload", build(F.col("doc_id")))
    return decode_media_stats(payloads, "payload", "doc_id")
