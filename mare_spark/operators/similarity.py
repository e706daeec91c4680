"""Similarity search over embedding columns (``array<float>``).

* :func:`brute_force_topk` — exact top-k cosine against a query vector.
  The baseline: one map-only pass (dot products in JVM expression code) +
  ``TakeOrderedAndProject`` (per-partition heap, no global sort). At 100 TB
  this is a full scan but zero shuffle — often the right answer for a single
  ad-hoc query.
* :func:`ann_lsh_topk` — approximate top-k via signed-random-projection
  (hyperplane) LSH: bucket the corpus by sign-bit signature, search only
  buckets within a Hamming radius of the query's signature. The scale path
  for repeated queries: candidate set ∝ bucket sizes, not corpus size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mare_spark.operators.dedup import cosine_similarity


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine. Deterministic tie-break on the id column."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_signature(
    vec_col, planes: np.ndarray
):
    """Sign-bit signature (as one bigint) of a vector against fixed random
    hyperplanes — JVM expression code: one dot product per plane."""
    bits = []
    for i, plane in enumerate(planes):
        dot = None
        for j, w in enumerate(plane):
            term = F.element_at(vec_col, j + 1).cast("double") * float(w)
            dot = term if dot is None else dot + term
        bits.append(
            F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def embedding_lsh_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    bands: int = 16,
    bits_per_band: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-dup embedding pairs at scale: banded hyperplane LSH candidates +
    exact-cosine verify (the scale tier of
    :func:`mare_spark.operators.dedup.embedding_cosine_pairs`).

    Each band is an independent ``bits_per_band``-bit sign signature; pairs
    agreeing on ANY band become candidates (never a cross join). For cosine
    s, P(candidate) = 1-(1-(1-θ(s)/π)^bits)^bands — with 16×4 bits, ≈0.94
    at s=0.4 and ≈1-1e-9 at s=0.9. Verified pairs are exact (no false
    positives); recall is tunable via ``bands``.

    Scale: signature computation is map-only expression code; the self-join
    shuffles on (band, bucket) — uniform 4-bit buckets within bands. The
    dominant cost is Σ bucket² per band; raise ``bits_per_band`` to shrink
    buckets for larger corpora.
    """
    import numpy as np

    dim = len(df.select(vec_col).head()[0])
    rng = np.random.default_rng(seed)

    base = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")).persist()
    band_cols = []
    for b in range(bands):
        planes = rng.standard_normal((bits_per_band, dim))
        band_cols.append(hyperplane_signature(F.col("v"), planes))
    buckets = base.select(
        "vid", F.posexplode(F.array(*band_cols)).alias("band", "bucket")
    )
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vid") < F.col("y.vid")),
        )
        .select(F.col("x.vid").alias("id_a"), F.col("y.vid").alias("id_b"))
        .distinct()
    )
    v = base
    return (
        cand.join(v.withColumnsRenamed({"vid": "id_a", "v": "v_a"}), "id_a")
        .join(v.withColumnsRenamed({"vid": "id_b", "v": "v_b"}), "id_b")
        .withColumn(
            "cosine", F.round(cosine_similarity(F.col("v_a"), F.col("v_b")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    hamming_radius: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via hyperplane LSH.

    Corpus rows whose signature is within ``hamming_radius`` sign-bit flips
    of the query's signature are candidates; exact cosine is computed only
    for them. Recall rises with the radius (radius = num_planes → exact).

    Scale: signatures are computed once per corpus row (map-only — in
    production you'd persist them as a column); candidate filtering is a
    scan-side predicate (bit_count ≤ r) that prunes before the expensive
    cosine; no shuffle at all until the final top-k heap merge.
    """
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))

    q = np.asarray(query_vec, dtype=np.float64)
    q_sig = 0
    for i, plane in enumerate(planes):
        if float(np.dot(plane, q)) > 0:
            q_sig |= 1 << i

    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    sig = hyperplane_signature(F.col(vec_col), planes)
    return (
        df.withColumn("_sig", sig)
        .filter(
            F.bit_count(F.col("_sig").bitwiseXOR(F.lit(q_sig).cast("long")))
            <= hamming_radius
        )
        .select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), qcol), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
