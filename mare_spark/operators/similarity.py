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
* :func:`ivf_assign` / :func:`ivf_topk` — inverted-file (IVF) ANN: spherical
  k-means centroids trained on a bounded driver-side sample, corpus rows
  assigned to their nearest centroid (Arrow-batched numpy UDF), queries probe
  only the ``nprobe`` nearest cells. At 100 TB the cell id becomes a
  partition column, so a probe is a partition-pruned scan of nprobe/nlist of
  the data.
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mare_spark.numeric import fround

from mare_spark.operators.dedup import attach_caches


def cosine_to_query(vec_col, query_vec: list[float]):
    """Cosine of every row's vector against one fixed query vector, as an
    Arrow-batched numpy UDF: one (batch × dim) @ dim matvec per batch.

    This is the hot loop of every similarity scan. The expression-code
    alternative (``zip_with``/``aggregate``) is a higher-order function —
    CodegenFallback, interpreted per row per element — and an unrolled
    per-element expression tree blows past janino limits at realistic dims
    (1536+). BLAS through numpy is the scale answer for both."""
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    def cos(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype="float64")
        m = np.array(list(vecs), dtype=np.float64)
        # clamp the PRODUCT (as pairwise_cosine does): clamping the two
        # factors separately underflows to 0.0 when both are degenerate
        # (1e-300 * 1e-300) and still yields NaN — degenerate vectors must
        # score cosine 0, never NaN (NaN sorts above every real value)
        den = np.maximum(np.linalg.norm(m, axis=1) * qn, 1e-300)
        return pd.Series((m @ q) / den)

    cos.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return F.pandas_udf(cos, "double")(vec_col)


def pairwise_cosine(col_a, col_b):
    """Row-wise cosine of two vector columns (candidate-pair verify),
    vectorized: stack both sides and compute ``(A*B).sum(1)`` per batch."""
    import pandas as pd

    def cos(va, vb):
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        a = np.array(list(va), dtype=np.float64)
        b = np.array(list(vb), dtype=np.float64)
        num = (a * b).sum(axis=1)
        den = np.maximum(
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-300
        )
        return pd.Series(num / den)

    cos.__annotations__ = {"va": pd.Series, "vb": pd.Series, "return": pd.Series}
    return F.pandas_udf(cos, "double")(col_a, col_b)


def hyperplane_signatures(vec_col, planes_per_band: list[np.ndarray]):
    """All band signatures of a vector column at once, as an
    ``array<bigint>`` (one packed sign-bit signature per band), via one
    Arrow-batched matmul against the stacked plane matrix.

    The expression tier (:func:`hyperplane_signature`) stays O(1) in plan
    size but evaluates interpreted (higher-order functions are
    CodegenFallback); this UDF is the hot-path form: (batch × dim) @
    (dim × total_bits), signs packed per band with one dot against the bit
    weights."""
    import pandas as pd

    if any(len(p) > 63 for p in planes_per_band):
        # same contract as the expression tier: bit 63 would wrap the
        # int64 signature negative (silently, in the numpy pack)
        raise ValueError("at most 63 planes per band (int64 signature)")
    P = np.vstack(planes_per_band).T.astype(np.float64)  # dim × total_bits
    sizes = [len(p) for p in planes_per_band]
    offsets = np.cumsum([0] + sizes)
    weights = [
        (1 << np.arange(n, dtype=np.uint64)).astype(np.uint64) for n in sizes
    ]

    def sigs(vecs):
        out = []
        if len(vecs) == 0:
            return pd.Series(out)
        m = np.array(list(vecs), dtype=np.float64)
        bits = (m @ P) > 0  # batch × total_bits
        per_band = [
            (bits[:, offsets[i] : offsets[i + 1]].astype(np.uint64) * w).sum(
                axis=1
            )
            for i, w in enumerate(weights)
        ]
        stacked = np.stack(per_band, axis=1).astype(np.int64)
        return pd.Series(list(stacked.tolist()))

    sigs.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return F.pandas_udf(sigs, "array<bigint>")(vec_col)


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scoring: str = "numpy",
) -> DataFrame:
    """Exact top-k cosine. Deterministic tie-break on the id column.

    ``scoring="numpy"`` (default) is the scale path — one BLAS matvec
    per Arrow batch. ``scoring="fold"`` scores with the sequential
    expression fold (``dedup.cosine_similarity``) whose summation order
    matches a SQL oracle's list_sum bit-for-bit — the hash-checked
    registered rows use it (hard_negatives' convention; numpy's
    pairwise-blocked sums can snap differently within ~1 ulp of a 6dp
    grid boundary, r8 review). NULL vectors fold to NULL cosine and
    sort after every real value under DESC on both engines."""
    if scoring == "fold":
        import math

        from mare_spark.operators.dedup import _dot

        # query-side specialization: Σq² is a constant, folded HERE with
        # the same sequential left-to-right order the oracle's list_sum
        # uses (bit-identical double), so each row pays two folds, not
        # three; den multiplication order stays sqrt(Σv²)·sqrt(Σq²)
        q = [float(x) for x in query_vec]
        qd = 0.0
        for x in q:
            qd += x * x
        v = F.col(vec_col)
        den = F.sqrt(_dot(v, v)) * F.lit(math.sqrt(qd))
        score = F.when(den == 0.0, F.lit(0.0)).otherwise(
            _dot(v, F.lit(q)) / den
        )
    elif scoring == "numpy":
        score = cosine_to_query(F.col(vec_col), query_vec)
    else:
        raise ValueError(f"scoring must be 'numpy' or 'fold', got {scoring!r}")
    return (
        df.select(F.col(id_col), fround(score, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_signature(
    vec_col, planes: np.ndarray
):
    """Sign-bit signature (as one bigint) of a vector against fixed random
    hyperplanes — JVM expression code, dim-scalable.

    The planes ship as ONE ``array<array<double>>`` literal (constant data,
    not an expression tree), and the per-plane dot products run through
    ``transform``/``zip_with``/``aggregate`` higher-order functions — so the
    expression size is O(1) in both embedding dim and plane count. The
    earlier unrolled form (one multiply-add node per element per plane) blew
    past janino's 64 KB codegen limit at realistic dims (1536 × 64 planes ≈
    98k nodes → interpreted eval)."""
    n_planes = len(planes)
    if n_planes > 63:
        raise ValueError("at most 63 planes per signature (signed long bits)")
    planes_lit = F.lit([[float(w) for w in p] for p in planes])
    bit_lits = F.lit([1 << i for i in range(n_planes)])
    dots = F.transform(
        planes_lit,
        lambda p: F.aggregate(
            F.zip_with(p, vec_col, lambda w, x: w * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    signed = F.zip_with(
        dots,
        bit_lits,
        lambda d, bv: F.when(d > 0, bv).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        signed, F.lit(0).cast("long"), lambda acc, b: acc.bitwiseOR(b)
    )


def with_dim_metadata(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Tag an embedding column with its element count in column metadata
    (``{"dim": n}``) so downstream LSH candidate generation can derive the
    dimension from the SCHEMA — zero Spark jobs, no driver-side probe.
    Call once where the corpus is produced/loaded; metadata survives
    selects and joins. Existing metadata keys on the column are MERGED,
    not replaced."""
    existing = dict(df.schema[vec_col].metadata or {})
    existing["dim"] = dim
    return df.withMetadata(vec_col, existing)


def embedding_lsh_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    bands: int = 16,
    bits_per_band: int = 4,
    seed: int = 42,
    dim: int | None = None,
    bucket_cap: int | None = None,
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
    buckets for larger corpora (bucket sizes here are STRUCTURAL —
    corpus/2^bits on average — so the bits dial, not a cap, is the primary
    control). ``bucket_cap`` additionally guards the mass-duplication case
    (many identical embeddings agree on every band; AQE can split the
    partition but not shrink the k²/2 candidate output — same rationale as
    the text-LSH caps). Default ``None``: with honest bit sizing, capping
    structural buckets would silently cost recall.
    """

    if dim is None:
        # schema-derived, zero Spark jobs: honored when the caller tagged
        # the column via :func:`with_dim_metadata` (ArrayType itself
        # carries no length); otherwise `dim` must be passed explicitly
        # rather than silently running a driver-side head() probe
        # (VERDICT r2 #5).
        meta = df.schema[vec_col].metadata or {}
        dim = meta.get("dim")
    if dim is None:
        raise ValueError(
            f"embedding dim not derivable from the schema of {vec_col!r} "
            "(ArrayType carries no length) — pass dim=<int> explicitly; "
            "candidate generation must not trigger a driver-side probe job"
        )
    rng = np.random.default_rng(seed)

    planes_per_band = [
        rng.standard_normal((bits_per_band, dim)) for _ in range(bands)
    ]
    from mare_spark.operators.dedup import _materialize

    # eager build (dedup._materialize): the bucket self-join's exchange
    # sides launch concurrently and would race a cold cache twice
    base = _materialize(
        df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")).persist()
    )
    buckets = base.select(
        "vid",
        F.posexplode(
            hyperplane_signatures(F.col("v"), planes_per_band)
        ).alias("band", "bucket"),
    )
    if bucket_cap is not None:
        from mare_spark.operators.dedup import _drop_over_full_buckets

        buckets = _drop_over_full_buckets(
            buckets, bucket_cap, keys=("band", "bucket")
        )
    # Materialize the (post-cap) bucket table once (r10 — guide §2.4,
    # compute-once): exchange reuse does not fire across deduplicated
    # self-join sides (verified on the minhash twin of this shape), so
    # each candidate-join side otherwise re-runs the hyperplane-signature
    # pandas UDF — the most expensive step of this operator — plus the
    # cap aggregate/anti-join. Three fixed-width columns, cheap encode.
    buckets = _materialize(
        buckets.persist(StorageLevel.MEMORY_AND_DISK)
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
    result = (
        cand.join(v.withColumnsRenamed({"vid": "id_a", "v": "v_a"}), "id_a")
        .join(v.withColumnsRenamed({"vid": "id_b", "v": "v_b"}), "id_b")
        .withColumn(
            "cosine", fround(pairwise_cosine(F.col("v_a"), F.col("v_b")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return attach_caches(result, base, buckets)


def _kmeanspp_init(
    sample: np.ndarray, k: int, rng: np.random.Generator
) -> np.ndarray:
    """Classic k-means++ (D² sampling) seed selection over an in-memory
    sample: each next seed is drawn with probability proportional to its
    squared distance from the nearest already-chosen seed, so seeds spread
    across the data's clusters instead of landing wherever uniform choice
    happens to fall. Deterministic under the caller's seeded ``rng`` —
    reproducibility is preserved, only seed QUALITY changes (Arthur &
    Vassilvitskii 2007: O(log k)-competitive expected SSE)."""
    n = len(sample)
    first = int(rng.integers(n))
    chosen = [first]
    d2 = ((sample - sample[first]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        total = float(d2.sum())
        if total <= 0:  # all remaining points coincide with a seed
            nxt = int(rng.integers(n))
        else:
            nxt = int(rng.choice(n, p=d2 / total))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    return sample[chosen].copy()


def train_ivf_centroids(
    df: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    init: str = "uniform",
) -> np.ndarray:
    """Spherical k-means centroids from a bounded driver-side sample.

    IVF training is classically sample-based: the sample size is fixed
    regardless of corpus size, so the driver pull stays bounded at 100 TB
    (``sample_size`` rows, not a collect of the corpus). Lloyd iterations run
    in numpy on the driver; the result is a tiny (nlist × dim) array that is
    broadcast into the assignment UDF. Deterministic under ``seed``.

    Seeding (``init``): ``"uniform"`` (default) draws seeds uniformly from
    the sample; ``"kmeans++"`` spreads them by D² sampling first — the
    standard choice for genuinely clustered corpora, where uniform seeds
    can land several in one dense cluster. MEASURED tradeoff on the
    near-uniform synthetic fixture (the honest negative result): query
    top-k recall is identical (0.59 both at nlist 16 / nprobe 4), and
    pair-blocking recall for SemDeDup is LOWER under k-means++ (0.80 vs
    0.93 at nprobe 3 — D² favors extremal seeds, whose cell boundaries
    cut through the uniform bulk that near-dup pairs straddle). Hence
    uniform stays the default; flip to k-means++ when the embedding space
    has real cluster structure.

    No full-corpus action: the sample uses a fixed conservative fraction +
    ``limit`` (the r1 shape ran ``df.count()`` just to size the fraction —
    a pointless extra job over the whole corpus at scale). If the fraction
    under-fills on a small input, fall back to a bounded ``limit`` scan —
    the input is tiny exactly when that scan is cheap.
    """
    if init not in ("kmeans++", "uniform"):
        raise ValueError("init must be 'kmeans++' or 'uniform'")
    # Arrow-path driver pull (toPandas) — the .rdd.collect() alternative
    # spins a pickling Python pipeline per job and is several times slower
    rows = (
        df.select(vec_col).sample(fraction=0.05, seed=seed)
        .limit(sample_size).toPandas()[vec_col].tolist()
    )
    if len(rows) < max(nlist, min(256, sample_size)):
        rows = df.select(vec_col).limit(sample_size).toPandas()[vec_col].tolist()
    if len(rows) < nlist:
        raise ValueError(
            f"corpus has only {len(rows)} vectors but nlist={nlist} — "
            "lower nlist (fewer cells than rows is meaningless; the "
            "uniform seeder would crash and kmeans++ would silently "
            "duplicate centroids)"
        )
    sample = np.array(rows, dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)

    rng = np.random.default_rng(seed)
    if init == "kmeans++":
        centroids = _kmeanspp_init(sample, nlist, rng)
    else:
        centroids = sample[rng.choice(len(sample), size=nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    return centroids


def _unit_rows(m: np.ndarray) -> np.ndarray:
    """Row-normalize WITHOUT mutating the input (a no-op for spherical
    k-means centroids, which are already unit — but kmeans_refine means
    are not, and an unnormalized centroid would bias cosine assignment
    toward large norms)."""
    m = np.asarray(m, dtype=np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)


def probe_cells_for(centroids: np.ndarray, query_vec, nprobe: int) -> list:
    """THE probe rule — normalized-cosine nearest cells — shared by every
    IVF probe (in-memory, indexed, PQ) so assignment and probing can't
    drift apart."""
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    return [int(c) for c in np.argsort(-(_unit_rows(centroids) @ qn))[:nprobe]]


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Add each row's IVF cell id (nearest centroid by cosine).

    Arrow-batched numpy UDF: one (batch × dim) @ (dim × nlist) matmul per
    batch — vectorized across rows, no per-row Python. Map-only, no shuffle.
    In production, write the result partitioned by ``cell_col`` so probes
    become partition-pruned scans.
    """
    import pandas as pd

    cent = _unit_rows(centroids)  # cosine needs UNIT centroids: trained
    # spherical ones already are (no-op); kmeans_refine means are not

    # NB: `from __future__ import annotations` stringifies inline hints,
    # which pandas_udf's signature inspector rejects — attach real
    # annotations after the def (same workaround as text.py fingerprints).
    def nearest(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.array(list(vecs), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cent.T, axis=1).astype("int32"))

    nearest.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    cell_udf = F.pandas_udf(nearest, "int")
    return df.withColumn(cell_col, cell_udf(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via an inverted-file index.

    Probes the ``nprobe`` cells whose centroids are nearest the query and
    runs exact cosine + top-k only inside them — candidate set ≈
    nprobe/nlist of the corpus. ``nprobe == nlist`` degenerates to exact
    brute force (asserted in tests). Pass precomputed ``centroids`` to skip
    training (the repeated-query path).

    Scale: assignment is map-only; the probe filter is a scan-side
    ``IN`` predicate (partition-pruning when the corpus is stored
    partitioned by cell); the only "shuffle" is the final top-k heap merge
    (TakeOrderedAndProject).
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            df, nlist=nlist, vec_col=vec_col, seed=seed
        )
    probe_cells = probe_cells_for(centroids, query_vec, nprobe)

    return (
        ivf_assign(df, centroids, vec_col=vec_col)
        .filter(F.col("ivf_cell").isin(probe_cells))
        .select(
            F.col(id_col),
            fround(cosine_to_query(F.col(vec_col), query_vec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> None:
    """Materialize the corpus as a parquet IVF index: rows assigned to their
    nearest centroid and written ``partitionBy(cell_col)``.

    This is the scale posture the operator docstrings promise: once the cell
    is a *partition column*, a probe is a partition-pruned scan that reads
    only nprobe/nlist of the files — the other cells are never opened.
    Assignment is the map-only Arrow UDF; the write shuffles nothing (each
    task writes its rows into per-cell subdirectories)."""
    ivf_assign(df, centroids, vec_col=vec_col, cell_col=cell_col).write.mode(
        "overwrite"
    ).partitionBy(cell_col).parquet(path)


def ivf_topk_indexed(
    spark,
    index_path: str,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Top-k probe against a :func:`write_ivf_index` layout.

    The ``isin`` filter on the partition column becomes a scan-side
    PartitionFilter (plan-asserted in tests): only the probed cells' files
    are listed and read. Candidate set ≈ nprobe/nlist of the corpus, cosine
    + TakeOrderedAndProject on top — no shuffle."""
    probe_cells = probe_cells_for(centroids, query_vec, nprobe)

    return (
        spark.read.parquet(index_path)
        .filter(F.col(cell_col).isin(probe_cells))
        .select(
            F.col(id_col),
            fround(cosine_to_query(F.col(vec_col), query_vec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
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

    sig = F.element_at(hyperplane_signatures(F.col(vec_col), [planes]), 1)
    return (
        df.withColumn("_sig", sig)
        .filter(
            F.bit_count(F.col("_sig").bitwiseXOR(F.lit(q_sig).cast("long")))
            <= hamming_radius
        )
        .select(
            F.col(id_col),
            fround(cosine_to_query(F.col(vec_col), query_vec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    threshold: float = 0.9,
    nprobe_assign: int = 2,
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: cluster the corpus
    into IVF cells (k-means blocking) and compare vectors only within a
    cell. ``nprobe_assign`` is multi-probe blocking — each vector joins
    its top-p cells, so pairs straddling a cell boundary still meet
    (measured on the fixture at threshold 0.4: recall vs the exact
    all-pairs tier 0.39 / 0.76 / 0.93 for p = 1 / 2 / 3).

    Output: (id_a, id_b, cosine) pairs at ``cosine >= threshold``.
    Compose with :func:`mare_spark.operators.dedup.dedup_clusters` to
    resolve groups and keep one representative per semantic cluster.

    Scale: cost is p² × Σ cell² — blocking is the scale lever: nlist
    grows with the corpus so cells stay bounded (SemDeDup used 50k
    clusters at LAION scale); assignment is the map-only Arrow matmul and
    the self-join shuffles on the cell id only; candidates are verified
    with exact cosine after a distinct on the id pair.
    """
    import pandas as pd

    if centroids is None:
        centroids = train_ivf_centroids(
            df, nlist=nlist, vec_col=vec_col, seed=seed
        )
    cent = _unit_rows(centroids)
    p = max(1, min(int(nprobe_assign), len(cent)))

    def cells(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        m = np.array(list(vecs), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cent.T), axis=1)[:, :p].astype("int32")
        return pd.Series(list(order.tolist()))

    cells.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    cells_udf = F.pandas_udf(cells, "array<int>")

    from mare_spark.operators.dedup import _materialize

    # eager build (dedup._materialize): the cell self-join's exchange
    # sides launch concurrently and would race the cell UDF twice
    base = _materialize(
        df.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
            cells_udf(F.col(vec_col)).alias("cells"),
        ).persist()
    )
    blocked = base.select("vid", F.explode("cells").alias("cell"))
    cand = (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .distinct()
    )
    v = base.select("vid", "v")
    pairs = (
        cand.join(v.withColumnsRenamed({"vid": "id_a", "v": "v_a"}), "id_a")
        .join(v.withColumnsRenamed({"vid": "id_b", "v": "v_b"}), "id_b")
        .withColumn(
            "cosine", fround(pairwise_cosine(F.col("v_a"), F.col("v_b")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return attach_caches(pairs, base)


def _nearest_centroid(dv, cents) -> "F.Column":
    """(dist2, idx) struct of the nearest centroid for a double-array
    column ``dv``: per-centroid zip_with left-fold squared distance,
    argmin via struct array_min, exact ties broken by centroid index.
    THE single assignment expression — assign_to_centroids and
    kmeans_refine must agree on it by construction."""
    cands = []
    for i, c in enumerate(cents):
        # ONE literal node per centroid (element-wise F.lit unrolling
        # builds k·dim expression nodes — minutes of driver analysis at
        # k=256, dim=1536; see hyperplane_signature's array-literal form)
        lit_c = F.lit([float(x) for x in c])
        d2 = F.aggregate(
            F.zip_with(dv, lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cands.append(F.struct(d2.alias("d"), F.lit(i).alias("i")))
    return F.array_min(F.array(*cands))


def assign_to_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 8,
    centroids=None,
) -> DataFrame:
    """Deterministic nearest-centroid assignment: every vector gets the
    closest of the first ``k`` vectors (by id order) as its cluster — the
    single-assignment pass shared by k-means iterations, IVF probing and
    topic-mix reporting, isolated here with DETERMINISTIC seed centroids
    so the assignment itself is oracle-checkable (iterative training is
    not; see train_ivf_centroids for the trained tier).

    Returns ``(id, cluster_id, dist2)`` — squared L2 distance to the
    winning centroid, ties broken by centroid index.

    Scale: the k seed vectors are a bounded driver fetch (k rows — the
    same contract as the LSH plane literals); distances are scan-side
    ``zip_with`` + left-fold expression code over one array literal per
    centroid, so the whole pass is zero-shuffle and fuses into the
    preceding scan. The argmin is an ``array_min`` over (dist, idx)
    structs — no join, no window.

    Determinism: each fold runs in element order on engine-identical
    doubles (float32→double is exact), so dist2 is the same IEEE double
    on every engine; struct comparison breaks exact ties by index.
    """
    if centroids is None:
        # bounded k-row driver fetch for the deterministic seed tier;
        # pass `centroids` explicitly to assign against trained ones
        # (kmeans_refine / train_ivf_centroids output). NULL vectors are
        # skipped — list(None) would TypeError the whole query build on
        # a fixture the oracles tolerate (r8 review)
        centroids = [
            list(r[0])
            for r in df.filter(F.col(vec_col).isNotNull())
            .orderBy(id_col).select(vec_col).head(k)
        ]
    cents = [list(c) for c in centroids]
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = _nearest_centroid(dv, cents)
    # rows with no vector have no nearest centroid: unfiltered, the
    # NULL-poisoned fold would hand them cluster 0 with NULL dist2 via
    # the nulls-first struct array_min — while a SQL replay's list_sum
    # skips NULL terms entirely (r8 review; oracle in lockstep)
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        best["i"].alias("cluster_id"),
        fround(best["d"], 6).alias("dist2"),
    )


def kmeans_refine(
    df: DataFrame,
    vec_col: str,
    init_centroids: np.ndarray,
    *,
    iters: int = 3,
) -> np.ndarray:
    """Distributed Lloyd refinement: improve centroids on the FULL corpus
    (train_ivf_centroids is sample-based — the right default; this is the
    refinement tier for when the sample's centroids must be polished
    against every vector, e.g. before freezing an IVF index).

    Per iteration: scan-side nearest-centroid assignment (centroid
    literals, zero shuffle — the same expression as assign_to_centroids),
    then per-(cluster, dimension) mean via posexplode + one keyed
    aggregate — plan size stays O(1) in dimension (the per-dim-column
    alternative bakes `dim` aggregate expressions into the plan, which
    at 1536-dim is the unrolled-codegen hazard r1 flagged for LSH).
    Driver traffic per iteration: the (k × dim) mean table — KBs.

    Empty clusters keep their previous centroid. Returns the refined
    (k × dim) float64 array; Lloyd guarantees within-cluster SSE is
    non-increasing per iteration (pinned by test).
    """
    init_centroids = np.asarray(init_centroids)
    k, dim = init_centroids.shape
    # float64 regardless of seed dtype: writing means back into a float32/
    # int array truncates every iteration and can even break the Lloyd
    # SSE-descent invariant with integer seeds
    cents = init_centroids.astype(np.float64, copy=True)
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for _ in range(iters):
        assigned = df.select(
            _nearest_centroid(dv, cents)["i"].alias("cid"),
            dv.alias("v"),
        )
        means = (
            assigned.select("cid", F.posexplode("v").alias("dim_idx", "x"))
            .groupBy("cid", "dim_idx")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        for r in means:
            cents[r.cid, r.dim_idx] = r.m
    return cents


def hard_negatives(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 1,
    exact_max_rows: int | None = 100_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every anchor,
    the ``k`` most-cosine-similar vectors with a DIFFERENT label —
    exactly the pairs a contrastive objective learns most from
    (similar-looking, semantically distinct).

    This is the EXACT tier: an all-pairs theta self-join on label
    inequality (O(N²) BroadcastNestedLoop — allowlisted like the other
    exact embedding tiers) + a per-anchor top-k window. Guarded routing
    (the ``embedding_cosine_pairs`` posture): above ``exact_max_rows``
    the O(N²) plan would not survive, so inputs route to
    :func:`hard_negatives_ivf`, which blocks candidates through the
    anchor's probed IVF cells (keyed equi-join, no cartesian) and is
    pinned to this tier by recall tests; the size probe is a bounded
    ``limit(N+1).count()``, never a full count. Pass
    ``exact_max_rows=None`` to force the exact tier.

    Output: ``(anchor_id, neg_id, cosine, rnk)``, ties broken on
    (cosine desc, neg_id asc) — deterministic across layouts.
    """
    from pyspark.sql.window import Window

    if exact_max_rows is not None:
        n_probe = df.select(id_col).limit(exact_max_rows + 1).count()
        if n_probe > exact_max_rows:
            # nlist clamped so centroid seeding always has enough rows
            # (n > exact_max_rows is known without a full count)
            nlist = min(256, exact_max_rows + 1)
            return hard_negatives_ivf(
                df, vec_col=vec_col, id_col=id_col, label_col=label_col,
                k=k, nlist=nlist, nprobe=max(1, nlist // 8),
            )
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        F.col(vec_col).alias("v"),
    )
    a = base.withColumnsRenamed(
        {"vid": "anchor_id", "lbl": "anchor_label", "v": "v_a"}
    )
    b = base.withColumnsRenamed(
        {"vid": "neg_id", "lbl": "neg_label", "v": "v_b"}
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("neg_id")
    )
    # The EXACT tier scores with the sequential expression fold
    # (cosine_similarity: zip_with + aggregate), not the numpy UDF:
    # numpy's pairwise-blocked summation accumulates DIFFERENT rounding
    # than a SQL oracle's sequential list_sum, so a cosine within ~1 ulp
    # of a 6dp grid boundary could snap differently engine-to-engine.
    # The fold matches the oracle's summation order bit-for-bit — the
    # same convention every other hash-checked cosine row uses. The
    # size-guarded tier can afford expression-interpreted scoring; the
    # IVF scale tier keeps the vectorized numpy verify.
    from mare_spark.operators.dedup import cosine_similarity

    return (
        a.join(b, F.col("anchor_label") != F.col("neg_label"))
        .withColumn(
            "cosine",
            fround(cosine_similarity(F.col("v_a"), F.col("v_b")), 6),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("anchor_id", "neg_id", "cosine", "rnk")
    )


def _probe_cells_udf(centroids: np.ndarray, nprobe: int):
    """array<int> of each vector's ``nprobe`` nearest centroid cells —
    the multi-probe assignment (one batch matmul + argsort)."""
    import pandas as pd

    cent = centroids.astype(np.float64)

    def probes(vecs):
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        m = np.array(list(vecs), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ _unit_rows(cent).T), axis=1)[:, :nprobe]
        return pd.Series([row.astype(int).tolist() for row in order])

    probes.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return F.pandas_udf(probes, "array<int>")


def hard_negatives_ivf(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 1,
    nlist: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> DataFrame:
    """Scale tier of :func:`hard_negatives`: candidates are blocked
    through the IVF index — each anchor explodes its ``nprobe`` nearest
    cells and equi-joins vectors ASSIGNED to those cells, so the pair
    space is ~nprobe/nlist of N² and the join is KEYED (hash exchange on
    the cell id — no cartesian, AQE splits hot cells). Exact cosine
    verify + the same per-anchor top-k window. ``nprobe == nlist``
    degenerates to the exact tier (pinned by test); below it, recall
    follows the usual IVF dial.
    """
    from pyspark.sql.window import Window

    if centroids is None:
        centroids = train_ivf_centroids(
            df, nlist=nlist, vec_col=vec_col, seed=seed
        )
    anchors = df.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).alias("v_a"),
        F.explode(
            _probe_cells_udf(centroids, nprobe)(F.col(vec_col))
        ).alias("cell"),
    )
    negs = ivf_assign(df, centroids, vec_col=vec_col, cell_col="cell").select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).alias("v_b"),
        "cell",
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("neg_id")
    )
    return (
        anchors.join(negs, "cell")
        .filter(F.col("anchor_label") != F.col("neg_label"))
        .drop("cell")
        .dropDuplicates(["anchor_id", "neg_id"])  # multi-probe overlap
        .withColumn(
            "cosine", fround(pairwise_cosine(F.col("v_a"), F.col("v_b")), 6)
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("anchor_id", "neg_id", "cosine", "rnk")
    )


def cluster_balanced_sample(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k_clusters: int = 8,
    per_cluster: int,
    centroids=None,
    salt: str = "",
) -> DataFrame:
    """Diversity sampling: exactly min(per_cluster, cluster size) rows
    from every embedding cluster — nearest-centroid assignment composed
    with the deterministic fixed-k sampler, so a dense topic can't
    dominate the selection the way it dominates a uniform sample
    (the DataComp-style cluster-balanced subset builder).

    ``centroids=None`` uses the first ``k_clusters`` vectors by id as
    deterministic seeds (oracle-checkable); pass ``kmeans_refine`` output
    for trained clusters. Returns ``(id, cluster_id, sample_rank)``.

    Scale: assignment is the zero-shuffle scan-side fold of
    :func:`assign_to_centroids`; selection is ONE exchange keyed on
    cluster_id whose map tasks pre-trim to per_cluster rows each
    (WindowGroupLimit) — no full-cluster sort anywhere.
    """
    from mare_spark.operators.corpus import group_fixed_k_sample

    assigned = assign_to_centroids(
        df, vec_col, id_col, k=k_clusters, centroids=centroids
    )
    return group_fixed_k_sample(
        assigned, id_col, group_col="cluster_id", k=per_cluster, salt=salt
    )
