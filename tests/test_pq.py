"""Product quantization: determinism, the ADC identity, compression
recall, and layout independence — differential-tested against numpy
models (iterative training is not SQL-expressible, like k-means/PCA)."""

from __future__ import annotations

import numpy as np
import pytest

from mare_spark.tables import read_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_SMOKE, "embeddings").persist()


def test_codebooks_deterministic_and_layout_independent(spark, emb):
    from mare_spark.operators.pq import train_pq_codebooks

    a = train_pq_codebooks(emb, "embedding", "vec_id", m=8, nbits=4)
    b = train_pq_codebooks(
        emb.repartition(7), "embedding", "vec_id", m=8, nbits=4
    )
    assert a.shape == (8, 16, 8)
    np.testing.assert_array_equal(a, b)


def test_assign_matches_numpy_argmin(spark, emb):
    from mare_spark.operators.pq import pq_assign, train_pq_codebooks

    books = train_pq_codebooks(emb, "embedding", "vec_id", m=4, nbits=4)
    got = {
        r.vec_id: list(r.pq_codes)
        for r in pq_assign(emb, "embedding", books).collect()
    }
    raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in emb.collect()}
    dsub = books.shape[2]
    for vid, x in raw.items():
        want = [
            int((((books[j] - x[j * dsub : (j + 1) * dsub][None, :]) ** 2)
                 .sum(axis=1)).argmin())
            for j in range(books.shape[0])
        ]
        assert got[vid] == want, vid


def test_adc_identity_exact_vs_reconstruction(spark, emb):
    """ADC(q, codes) must equal the exact squared L2 between q and the
    code's reconstruction — the probe arithmetic adds NO error beyond
    quantization."""
    from mare_spark.operators.pq import (
        pq_assign,
        pq_reconstruct,
        pq_topk,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(emb, "embedding", "vec_id", m=8, nbits=4)
    coded = pq_assign(emb, "embedding", books)
    q = [r.embedding for r in emb.orderBy("vec_id").head(1)][0]
    top = pq_topk(coded, books, q, 20).collect()
    codes = {r.vec_id: list(r.pq_codes) for r in coded.collect()}
    qv = np.array(q, dtype=np.float64)
    for r in top:
        recon = pq_reconstruct(codes[r.vec_id], books)
        exact = float(((qv - recon) ** 2).sum())
        assert abs(r.adc_dist - exact) < 1e-9, r.vec_id


def test_pq_recall_against_exact_neighbors(spark, emb):
    """The production shape: ADC shortlist (5x over-fetch) + exact
    re-rank recovers the true L2 top-20 on the 64-dim fixture
    (measured 1.00 at m=16/nbits=6; pinned >= 0.9 for fixture drift),
    while the raw no-rerank ADC top-20 shows the quantization-only
    dial (measured 0.60)."""
    from mare_spark.operators.pq import (
        pq_assign,
        pq_topk,
        pq_topk_rerank,
        train_pq_codebooks,
    )

    raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in emb.collect()}
    q_id = sorted(raw)[0]
    q = raw[q_id]
    true_top = {
        vid for vid, _ in sorted(
            ((vid, float(((q - x) ** 2).sum())) for vid, x in raw.items()),
            key=lambda t: (t[1], t[0]),
        )[:20]
    }
    books = train_pq_codebooks(emb, "embedding", "vec_id", m=16, nbits=6)
    coded = pq_assign(emb, "embedding", books).persist()
    adc_only = {r.vec_id for r in pq_topk(coded, books, list(q), 20).collect()}
    assert len(adc_only & true_top) / 20 >= 0.4  # compression-only floor
    # coded still carries the raw vectors — exactly what rerank wants
    reranked = {
        r.vec_id
        for r in pq_topk_rerank(coded, books, list(q), 20).collect()
    }
    assert len(reranked & true_top) / 20 >= 0.9
    coded.unpersist()


def test_pq_validates_inputs(spark, emb):
    from mare_spark.operators.pq import pq_topk, train_pq_codebooks

    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(emb, "embedding", "vec_id", m=7)
    books = train_pq_codebooks(emb, "embedding", "vec_id", m=4, nbits=3)
    from mare_spark.operators.pq import pq_assign

    coded = pq_assign(emb, "embedding", books)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(coded, books, [0.0] * 3, 5)


def test_pq_topk_plan_is_take_ordered(spark, emb):
    from mare_spark import plans as P
    from mare_spark.operators.pq import (
        pq_assign,
        pq_topk,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(emb, "embedding", "vec_id", m=4, nbits=4)
    coded = pq_assign(emb, "embedding", books)
    q = [r.embedding for r in emb.orderBy("vec_id").head(1)][0]
    df = pq_topk(coded, books, q, 10)
    assert P.uses_take_ordered(df), P.formatted_plan(df)


def test_ivf_pq_composition_probe(spark, emb):
    """The two scale tiers COMPOSE into IVF-PQ: rows carry an IVF cell
    (partition-prunable) AND PQ codes; a probe scans only the query's
    nprobe nearest cells, ADC-shortlists inside them, and exact-reranks.
    Recall stays high while the probe touches a fraction of the rows —
    the structure a 100 TB deployment stores."""
    from pyspark.sql import functions as F

    from mare_spark.operators.pq import (
        pq_assign,
        pq_topk_rerank,
        train_pq_codebooks,
    )
    from mare_spark.operators.similarity import (
        ivf_assign,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(emb, nlist=8)
    books = train_pq_codebooks(emb, "embedding", "vec_id", m=16, nbits=6)
    table = pq_assign(
        ivf_assign(emb, cents), "embedding", books
    ).persist()
    try:
        raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
               for r in emb.collect()}
        q_id = sorted(raw)[0]
        q = raw[q_id]
        true_top = {
            vid for vid, _ in sorted(
                ((vid, float(((q - x) ** 2).sum()))
                 for vid, x in raw.items()),
                key=lambda t: (t[1], t[0]),
            )[:10]
        }
        # query-side probe: nprobe nearest cells by the same cosine rule
        # ivf_assign uses (normalized centroids)
        qn = q / max(np.linalg.norm(q), 1e-12)
        cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
        nprobe = 4
        probe_cells = [int(c) for c in np.argsort(-(cn @ qn))[:nprobe]]
        probed = table.filter(F.col("ivf_cell").isin(probe_cells))
        n_probed = probed.count()
        assert n_probed < table.count()  # the probe prunes
        got = {
            r.vec_id
            for r in pq_topk_rerank(probed, books, list(q), 10,
                                    shortlist=100).collect()
        }
        # IVF adds cell-miss loss on top of PQ; half-probe floor
        assert len(got & true_top) / 10 >= 0.5, (len(got & true_top), n_probed)
        # full probe (every cell) + rerank degenerates to near-exact
        all_cells = pq_topk_rerank(table, books, list(q), 10,
                                   shortlist=100).collect()
        assert len({r.vec_id for r in all_cells} & true_top) / 10 >= 0.9
    finally:
        table.unpersist()


def test_scalar_quantizer_error_bound_and_recall(spark, emb):
    """int8 SQ: per-coordinate reconstruction error <= half a grid step;
    top-10 by quantized distance matches the exact top-10 (4x tier is
    near-exact on the fixture); the fit is layout-independent."""
    from mare_spark.operators.pq import (
        fit_scalar_quantizer,
        sq_encode,
        sq_reconstruct,
        sq_topk,
    )

    mins, maxs = fit_scalar_quantizer(emb, "embedding", 64)
    mins2, maxs2 = fit_scalar_quantizer(
        emb.repartition(9), "embedding", 64
    )
    np.testing.assert_array_equal(mins, mins2)
    np.testing.assert_array_equal(maxs, maxs2)

    coded = sq_encode(emb, "embedding", mins, maxs).persist()
    try:
        raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
               for r in emb.collect()}
        half_step = (maxs - mins) / 255.0 / 2.0 + 1e-12
        for r in coded.limit(50).collect():
            recon = sq_reconstruct(r.sq_codes, mins, maxs)
            assert (np.abs(raw[r.vec_id] - recon) <= half_step).all()

        q_id = sorted(raw)[0]
        q = raw[q_id]
        true_top = [
            vid for vid, _ in sorted(
                ((vid, float(((q - x) ** 2).sum()))
                 for vid, x in raw.items()),
                key=lambda t: (t[1], t[0]),
            )[:10]
        ]
        got = [r.vec_id
               for r in sq_topk(coded, mins, maxs, list(q), 10).collect()]
        assert len(set(got) & set(true_top)) >= 9
    finally:
        coded.unpersist()


def test_scalar_quantizer_constant_dim_and_validation(spark):
    from mare_spark.operators.pq import (
        fit_scalar_quantizer,
        sq_encode,
        sq_topk,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [1.0, 7.0])],
        "vec_id long, embedding array<double>",
    )
    mins, maxs = fit_scalar_quantizer(df, "embedding", 2)
    assert mins[0] == maxs[0] == 1.0
    rows = {r.vec_id: list(r.sq_codes)
            for r in sq_encode(df, "embedding", mins, maxs).collect()}
    assert rows[0][0] == rows[1][0] == -128  # constant dim encodes 0-code
    import pytest

    with pytest.raises(Exception, match="dim"):
        sq_topk(sq_encode(df, "embedding", mins, maxs),
                mins, maxs, [0.0] * 3, 1)


def test_ivfpq_batch_equals_per_query_probe(spark, emb):
    """The batch probe (explode cells -> keyed join -> ADC -> per-query
    top-k window) returns the same ids per query as running the
    single-query indexed probe in a loop, and plans the top-k as a
    two-phase WindowGroupLimit with no cartesian join."""
    from pyspark.sql import functions as F

    from mare_spark import plans as P
    from mare_spark.operators.pq import (
        ivfpq_topk_batch,
        pq_assign,
        pq_topk,
        train_pq_codebooks,
    )
    from mare_spark.operators.similarity import (
        ivf_assign,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(emb, nlist=8)
    books = train_pq_codebooks(emb, "embedding", "vec_id", m=8, nbits=4)
    index = pq_assign(
        ivf_assign(emb, cents), "embedding", books
    ).persist()
    try:
        queries = (
            emb.orderBy("vec_id").limit(5)
            .select(F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qvec"))
        )
        batch = ivfpq_topk_batch(
            queries, index, cents, books, 5, nprobe=3
        )
        plan = P.formatted_plan(batch)
        assert "WindowGroupLimit" in plan, plan
        assert "CartesianProduct" not in plan, plan
        got = {}
        for r in batch.collect():
            got.setdefault(r.qid, []).append((r.rnk, r.vec_id))

        import numpy as np
        qn = {r.qid: np.asarray(r.qvec, dtype=np.float64)
              for r in queries.collect()}
        cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
        for qid, qv in qn.items():
            u = qv / max(np.linalg.norm(qv), 1e-12)
            cells = [int(c) for c in np.argsort(-(cn @ u))[:3]]
            want = [
                r.vec_id for r in pq_topk(
                    index.filter(F.col("ivf_cell").isin(cells)),
                    books, list(qv), 5,
                ).collect()
            ]
            assert [v for _rnk, v in sorted(got[qid])] == want, qid

        # the skew valve: salting the cell key must not change a single
        # row — per-split partial top-k commutes with the global window
        salted = ivfpq_topk_batch(
            queries, index, cents, books, 5, nprobe=3, cell_splits=3
        )
        assert sorted(
            (r.qid, r.rnk, r.vec_id, round(r.adc_dist, 9))
            for r in salted.collect()
        ) == sorted(
            (r.qid, r.rnk, r.vec_id, round(r.adc_dist, 9))
            for r in batch.collect()
        )
    finally:
        index.unpersist()


def test_pq_guard_paths_from_review(spark, emb):
    """Review-driven guards: probing with a DIFFERENT quantizer's m
    raises (never silently truncates the ADC sum); fitting a scalar
    quantizer on an empty frame raises; NULL codes in the batch probe
    drop out instead of crashing the job; NULL/ragged training samples
    raise with named causes."""
    from pyspark.sql import functions as F

    from mare_spark.operators.pq import (
        fit_scalar_quantizer,
        ivfpq_topk_batch,
        pq_assign,
        pq_topk,
        train_pq_codebooks,
    )
    from mare_spark.operators.similarity import train_ivf_centroids

    books8 = train_pq_codebooks(emb, "embedding", "vec_id", m=8, nbits=4)
    books16 = train_pq_codebooks(emb, "embedding", "vec_id", m=16, nbits=4)
    coded8 = pq_assign(emb, "embedding", books8)
    q = list(emb.select("embedding").head()[0])
    # same 64-dim space, wrong m: the dim check passes, the width check
    # must catch it
    with pytest.raises(Exception, match="quantizers differ"):
        pq_topk(coded8, books16, q, 3).collect()

    with pytest.raises(ValueError, match="empty input"):
        fit_scalar_quantizer(
            emb.filter(F.col("vec_id") < 0), "embedding", 64
        )

    with pytest.raises(ValueError, match="NULL"):
        train_pq_codebooks(
            emb.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 2 == 0, F.col("embedding")),
            ),
            "embedding", "vec_id", m=8,
        )

    # NULL codes rows drop out of the batch probe (parity with pq_topk)
    cents = train_ivf_centroids(emb, nlist=4)
    from mare_spark.operators.similarity import ivf_assign

    index = pq_assign(ivf_assign(emb, cents), "embedding", books8)
    index = index.withColumn(
        "pq_codes",
        F.when(F.col("vec_id") % 7 != 0, F.col("pq_codes")),
    )
    queries = emb.limit(2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ivfpq_topk_batch(queries, index, cents, books8, 5, nprobe=4)
    rows = out.collect()
    assert rows and all(r.vec_id % 7 != 0 for r in rows)


def test_sim_pq_recall_report_internally_consistent(spark):
    """The registered recall audit must be self-consistent: full-probe
    IVF-PQ hits == plain ADC hits (nprobe=nlist prunes nothing, so the
    two tiers score identical candidate sets), exact re-rank dominates
    raw ADC, the int8 tier is near-exact (half-step error), and every
    recall equals hits/(n_queries*k) exactly."""
    from mare_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    rows = {
        r.tier: r
        for r in all_queries()["sim_pq_recall_report"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert set(rows) == {
        "sq_int8", "pq_adc", "pq_rerank", "ivfpq_full", "ivfpq_n4"
    }
    for r in rows.values():
        assert r.recall == round(r.hits / (r.n_queries * r.k), 4)
        assert 0 <= r.hits <= r.n_queries * r.k
    assert rows["ivfpq_full"].hits == rows["pq_adc"].hits
    assert rows["pq_rerank"].hits >= rows["pq_adc"].hits
    assert rows["ivfpq_n4"].hits <= rows["ivfpq_full"].hits
    assert rows["sq_int8"].recall >= 0.95
    assert rows["pq_rerank"].recall >= 0.9


def test_exact_l2_batch_equals_per_query_expression(spark):
    """The r8 batched exact baseline (one Arrow job + per-query window
    top-k) must return exactly the per-query JVM-expression form it
    replaced, query by query, under the shared (dist, vec_id)
    tie-break."""
    from pyspark.sql import functions as F

    from mare_spark.queries.llm9 import _audit_queries, _exact_l2_topk_batch

    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = _audit_queries(emb)
    batch = _exact_l2_topk_batch(emb, queries, 20)
    assert set(batch) == {qid for qid, _ in queries}
    for qid, qv in queries:
        q = F.lit([float(x) for x in qv])
        d2 = F.aggregate(
            F.zip_with(
                F.col("embedding"), q,
                lambda x, y: (x.cast("double") - y) ** 2,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        loop = [
            r.vec_id
            for r in emb.select("vec_id", d2.alias("dist"))
            .orderBy("dist", "vec_id")
            .limit(20)
            .collect()
        ]
        assert batch[qid] == loop


def test_rag_retrieval_report_equals_stepwise_composition(spark):
    """The registered RAG row must be nothing more than its published
    steps: replaying chunk -> hashing-embed -> IVF/PQ train -> index ->
    per-language gate -> batch probe by hand, with the row's own fixed
    parameters, reproduces the report bit-identically — and each query's
    rank-1 hit is its own first chunk (the query IS that chunk's text,
    so anything else means the spaces drifted)."""
    from pyspark.sql import functions as F

    from mare_spark.operators.pq import (
        ivfpq_topk_batch,
        pq_assign,
        train_pq_codebooks,
    )
    from mare_spark.operators.similarity import ivf_assign, train_ivf_centroids
    from mare_spark.operators.text import hashing_embed, sliding_chunks
    from mare_spark.queries.llm10 import _RAG
    from mare_spark.registry import all_queries

    got = [
        tuple(r)
        for r in all_queries()["rag_retrieval_report"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]

    p = _RAG
    docs = read_table(spark, SF_SMOKE, "documents")
    chunks = sliding_chunks(
        docs, "text", "doc_id",
        window=p["window"], stride=p["stride"],
        keep_cols=("lang",), drop_redundant_tail=True,
    ).withColumn(
        "chunk_uid",
        (F.col("doc_id") * F.lit(1_000_000) + F.col("chunk_idx"))
        .cast("long"),
    )
    emb = hashing_embed(chunks, "chunk_text", dim=p["dim"]).persist()
    try:
        cents = train_ivf_centroids(emb, nlist=p["nlist"])
        books = train_pq_codebooks(
            emb, "embedding", "chunk_uid", m=p["m"], nbits=p["nbits"]
        )
        index = pq_assign(ivf_assign(emb, cents), "embedding", books)
        qrows = (
            emb.filter(F.col("chunk_idx") == 0)
            .select("doc_id", "lang", "embedding")
            .orderBy("doc_id")
            .limit(p["n_queries"])
            .collect()
        )
        want = []
        for q in qrows:
            qdf = spark.createDataFrame(
                [(int(q.doc_id), [float(x) for x in q.embedding])],
                "qid long, qvec array<double>",
            )
            rows = (
                ivfpq_topk_batch(
                    qdf, index.filter(F.col("lang") == q.lang),
                    cents, books, p["k"],
                    nprobe=p["nprobe"], id_col="chunk_uid",
                )
                .orderBy("rnk")
                .collect()
            )
            want.extend(
                (
                    r.qid, q.lang, r.rnk,
                    r.chunk_uid // 1_000_000, r.chunk_uid % 1_000_000,
                    round(r.adc_dist, 6),
                )
                for r in rows
            )
    finally:
        emb.unpersist()
    assert sorted(got) == sorted(want)
    top1 = {r[0]: (r[3], r[4]) for r in got if r[2] == 1}
    assert top1 == {qid: (qid, 0) for qid in top1}


def test_hashing_embed_contract(spark):
    """Feature-hashing embedder: unit norm for non-empty text, zero
    vector for empty/whitespace, NULL propagates, token-order
    independence (bag semantics), and a known single-token vector is
    one +/-1 bucket before normalization."""
    import hashlib

    import numpy as np

    from mare_spark.operators.text import hashing_embed

    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "beta beta alpha"), (3, ""),
         (4, "   "), (5, None), (6, "alpha")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.embedding
        for r in hashing_embed(df, "text", dim=16).collect()
    }
    assert got[5] is None
    assert got[3] == [0.0] * 16 and got[4] == [0.0] * 16
    assert got[1] == got[2]  # bag-of-tokens: order-free
    assert abs(np.linalg.norm(got[1]) - 1.0) < 1e-12
    h = hashlib.md5(b"alpha").digest()
    bucket = int.from_bytes(h[:8], "big") % 16
    sign = 1.0 if h[8] & 1 else -1.0
    expect = np.zeros(16); expect[bucket] = sign
    assert got[6] == expect.tolist()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hashing_embed(df, "text", dim=0)


def test_ivfpq_batch_skew_valve_under_real_skew(spark):
    """The cell_splits skew valve under ENGINEERED skew: ~60% of the
    corpus lands in one IVF cell; cell_splits=4 must (a) reproduce the
    unsalted results bit-identically and (b) measurably cut the max
    rows any one cogroup group carries — the valve's actual claim
    (pq.py cell_splits docs), previously pinned only for correctness.
    Group sizes are measured with the SAME key expressions the cogroup
    shuffles on, so the numbers are the group sizes its tasks see."""
    from pyspark.sql import functions as F

    from mare_spark.operators.pq import (
        ivfpq_topk_batch,
        pq_assign,
        train_pq_codebooks,
    )
    from mare_spark.operators.similarity import ivf_assign

    dim, n, hot = 8, 400, 240
    cents = np.eye(4, dim)  # 4 cells: unit basis directions
    rows = []
    for i in range(n):
        v = np.zeros(dim)
        if i < hot:  # 60%: tightly around e0 -> one hot cell
            v[0] = 1.0
            v[1] = ((i * 7) % 13) / 130.0
        else:  # the rest spread over e1..e3
            v[1 + i % 3] = 1.0
            v[4 + i % 4] = ((i * 11) % 17) / 170.0
        rows.append((i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(df, "embedding", "vec_id", m=4, nbits=4)
    index = ivf_assign(df, cents)
    cell_counts = {r.ivf_cell: r.cnt for r in
                   index.groupBy("ivf_cell").agg(F.count("*").alias("cnt"))
                   .collect()}
    assert cell_counts[0] >= n * 0.5, cell_counts  # the skew is real
    index = pq_assign(index, "embedding", books).persist()
    try:
        queries = spark.createDataFrame(
            [(0, rows[3][1]), (1, rows[5][1]), (2, rows[250][1])],
            "qid long, qvec array<double>",
        )
        base = sorted(
            (r.qid, r.vec_id, round(r.adc_dist, 12), r.rnk)
            for r in ivfpq_topk_batch(
                queries, index, cents, books, 10, nprobe=2
            ).collect()
        )
        salted = sorted(
            (r.qid, r.vec_id, round(r.adc_dist, 12), r.rnk)
            for r in ivfpq_topk_batch(
                queries, index, cents, books, 10, nprobe=2, cell_splits=4
            ).collect()
        )
        assert base == salted  # the valve never changes results

        # task-level evidence: max rows per cogroup key, measured with
        # the exact key expressions the batch prober shuffles on
        unsalted_max = (
            index.groupBy("ivf_cell").agg(F.count("*").alias("c"))
            .agg(F.max("c")).collect()[0][0]
        )
        salted_max = (
            index.withColumn(
                "_salt",
                F.pmod(F.xxhash64(F.col("vec_id")), F.lit(4)).cast("int"),
            )
            .groupBy("ivf_cell", "_salt").agg(F.count("*").alias("c"))
            .agg(F.max("c")).collect()[0][0]
        )
        assert unsalted_max == cell_counts[0]
        # splits=4 must cut the hottest group by >= 2x (expect ~4x;
        # the slack absorbs hash imbalance on 240 rows)
        assert salted_max * 2 <= unsalted_max, (salted_max, unsalted_max)
        print(f"skew-valve evidence: hot cell {unsalted_max} rows -> "
              f"max salted group {salted_max} rows at cell_splits=4")
    finally:
        index.unpersist()
