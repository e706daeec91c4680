"""DSIR importance-resampling properties: target-likeness ordering,
partition-layout determinism, the dense-table smoothing contract.
(Cross-engine hash parity is covered by the corpus_dsir_weights oracle
row in test_queries_oracle.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mare_spark.operators.dsir import (
    bucket_counts,
    dsir_importance_weights,
    dsir_logratios,
)

B = 512

TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "the quick red fox runs past the sleepy dog",
    "a quick fox and a lazy dog play in the yard",
]
RAW = [
    (1, "the quick brown fox naps beside the lazy dog"),  # target-like
    (2, "zzq vvx qqp mmr kkt bbn zzq vvx qqp mmr"),       # alien vocab
    (3, "the fox and the dog"),                            # mildly target-like
]


@pytest.fixture(scope="module")
def weights(spark):
    target = spark.createDataFrame([(t,) for t in TARGET], "text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    lr = dsir_logratios(raw, target, "text", num_buckets=B)
    w = dsir_importance_weights(raw, "text", "doc_id", lr, num_buckets=B)
    return {r.doc_id: r for r in w.collect()}


def test_target_like_document_outranks_alien_vocabulary(weights):
    # per-feature normalization: longer docs accumulate more terms, so
    # compare mean log ratio (the paper scores fixed-length excerpts)
    def mean_lw(doc_id):
        r = weights[doc_id]
        return r.log_weight / r.n_feats

    assert mean_lw(1) > mean_lw(2)
    assert mean_lw(3) > mean_lw(2)


def test_layout_independent_and_deterministic(spark):
    target = spark.createDataFrame([(t,) for t in TARGET], "text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")

    def run(t, r):
        lr = dsir_logratios(r, t, "text", num_buckets=B)
        w = dsir_importance_weights(r, "text", "doc_id", lr, num_buckets=B)
        return sorted((x.doc_id, x.n_feats, x.log_weight) for x in w.collect())

    assert run(target, raw) == run(target.repartition(7), raw.repartition(5))


def test_dense_table_and_smoothing_contract(spark):
    """The log-ratio table covers the FULL bucket range; a bucket neither
    corpus touched carries exactly the smoothed prior
    ln((R+B)/(T+B)) — features of unseen vocabulary still score."""
    target = spark.createDataFrame([(t,) for t in TARGET], "text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    lr = dsir_logratios(raw, target, "text", num_buckets=B)
    rows = lr.collect()
    assert len(rows) == B
    assert {r.bucket for r in rows} == set(range(B))

    t_tot = sum(
        r.cnt for r in bucket_counts(target, "text", num_buckets=B).collect()
    )
    r_tot = sum(
        r.cnt for r in bucket_counts(raw, "text", num_buckets=B).collect()
    )
    prior = math.floor(
        math.log((r_tot + B) / (t_tot + B)) * 1e6 + 0.5
    ) / 1e6
    # with B >> distinct grams, most buckets are untouched by both corpora
    untouched = [r.logratio for r in rows].count(prior)
    assert untouched > B // 2


def test_alpha_must_be_positive_integer(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="alpha"):
        dsir_logratios(df, df, "text", num_buckets=B, alpha=0)


def test_weights_keep_cols_and_feature_counts(spark):
    target = spark.createDataFrame([(t,) for t in TARGET], "text string")
    raw = spark.createDataFrame(
        [(1, "a", "one two three")], "doc_id long, grp string, text string"
    )
    lr = dsir_logratios(raw, target, "text", num_buckets=B)
    row = dsir_importance_weights(
        raw, "text", "doc_id", lr, num_buckets=B, keep_cols=("grp",)
    ).collect()[0]
    assert row.grp == "a"
    assert row.n_feats == 5  # 3 unigrams + 2 bigrams


def test_gumbel_topk_deterministic_without_replacement(spark, weights):
    from mare_spark.operators.dsir import dsir_gumbel_topk

    wdf = spark.createDataFrame(
        [(d, r.n_feats, r.log_weight) for d, r in weights.items()],
        "doc_id long, n_feats long, log_weight double",
    )
    a = [(r.doc_id, r.gumbel_key)
         for r in dsir_gumbel_topk(wdf, "doc_id", 2, salt="s1").collect()]
    b = [(r.doc_id, r.gumbel_key)
         for r in dsir_gumbel_topk(wdf.repartition(5), "doc_id", 2,
                                   salt="s1").collect()]
    assert a == b  # reproducible across layouts
    assert len({d for d, _ in a}) == 2  # without replacement
    c = [r.doc_id for r in
         dsir_gumbel_topk(wdf, "doc_id", 3, salt="s2").collect()]
    assert len(c) == 3  # a new salt is a valid fresh draw over all docs


def test_gumbel_selection_follows_weights(spark):
    """Inclusion frequency must track the importance weight: across many
    salts, a doc with weight gap >> Gumbel noise is picked ~always, and a
    mid-weight doc beats a low-weight doc in selection rate."""
    from mare_spark.operators.dsir import dsir_gumbel_topk

    wdf = spark.createDataFrame(
        [(1, 1, 50.0), (2, 1, 0.0), (3, 1, -3.0)],
        "doc_id long, n_feats long, log_weight double",
    )
    picks = []
    for s in range(30):
        picks += [
            r.doc_id
            for r in dsir_gumbel_topk(wdf, "doc_id", 1, salt=f"e{s}").collect()
        ]
    assert picks.count(1) == 30  # 50-nat gap: Gumbel noise can't flip it
    w2 = wdf.filter("doc_id != 1")
    picks2 = []
    for s in range(30):
        picks2 += [
            r.doc_id
            for r in dsir_gumbel_topk(w2, "doc_id", 1, salt=f"e{s}").collect()
        ]
    assert picks2.count(2) > picks2.count(3)  # 3-nat gap: strong majority


def test_gumbel_plans_take_ordered(spark, weights):
    from mare_spark.operators.dsir import dsir_gumbel_topk
    from mare_spark.plans import formatted_plan

    wdf = spark.createDataFrame(
        [(d, r.n_feats, r.log_weight) for d, r in weights.items()],
        "doc_id long, n_feats long, log_weight double",
    )
    plan = formatted_plan(dsir_gumbel_topk(wdf, "doc_id", 2))
    assert "TakeOrderedAndProject" in plan, plan


def test_gumbel_key_finite_at_u_near_one(spark):
    """ids whose md5-uniform snaps ln(u) to exactly 0 (u within ~5e-7 of
    1 — doc_id 40691 under the empty salt is one of the ~2148 such 2^32
    prefixes) must still get a FINITE gumbel key: without the clamp,
    -ln(-0) is NULL under Spark and the doc silently sorts last
    regardless of weight."""
    from mare_spark.operators.dsir import dsir_gumbel_topk

    # doc 40691: md5('40691')[:8] = 0xFFFFFB18 -> u = 0.9999999163
    wdf = spark.createDataFrame(
        [(40691, 1, 100.0), (2, 1, 0.0), (3, 1, -1.0)],
        "doc_id long, n_feats long, log_weight double",
    )
    rows = {r.doc_id: r.gumbel_key
            for r in dsir_gumbel_topk(wdf, "doc_id", 3, salt="").collect()}
    assert rows[40691] is not None and math.isfinite(rows[40691])
    # with a 100-nat weight it must be picked first, not dropped
    top = dsir_gumbel_topk(wdf, "doc_id", 1, salt="").collect()[0]
    assert top.doc_id == 40691


def test_dsir_review_guards_r8(spark):
    """r8 review sweep: empty-corpus totals coalesce to 0 (finite
    logratios, matching the oracle's count(*) semantics); float/zero/bool
    alpha and num_buckets=0 fail loud; NULL-id rows are excluded from the
    gumbel draw (a NULL uniform would slip through least() to the clamp
    and hand NULL docs the maximum bonus); the shared-uniform refactor is
    bit-identical to the inline (h+0.5)/2^32 chain."""
    import math

    import pytest

    from mare_spark.operators.dsir import (
        dsir_gumbel_topk,
        dsir_logratios,
        hashed_gram_buckets,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    empty = docs.filter("doc_id < 0")

    # empty target: finite smoothed prior everywhere, no NULLs
    lr = dsir_logratios(empty, docs, "text", num_buckets=16).collect()
    assert len(lr) == 16 and all(r.logratio is not None for r in lr)
    lr2 = dsir_logratios(docs, empty, "text", num_buckets=16).collect()
    assert all(r.logratio is not None for r in lr2)

    with pytest.raises(ValueError, match="positive integer"):
        dsir_logratios(docs, docs, "text", alpha=2.5)
    with pytest.raises(ValueError, match="positive integer"):
        dsir_logratios(docs, docs, "text", alpha=True)
    with pytest.raises(ValueError, match="num_buckets"):
        hashed_gram_buckets(F.col("text"), num_buckets=0)

    # NULL ids never sampled
    w = spark.createDataFrame(
        [(1, 5.0), (None, 99.0), (2, 1.0)],
        "doc_id long, log_weight double",
    )
    got = dsir_gumbel_topk(w, "doc_id", 3).collect()
    assert [r.doc_id for r in got] and all(
        r.doc_id is not None for r in got
    )
    assert len(got) == 2

    # shared-uniform refactor: replay the old inline chain in python
    import hashlib

    for doc_id in (1, 2):
        h = int(hashlib.md5(f"{doc_id}epoch0".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / float(1 << 32)
        inner = min(math.floor(math.log(u) * 1e6 + 0.5) / 1e6, -0.000001)
        g = math.floor(-math.log(-inner) * 1e6 + 0.5) / 1e6
        row = [
            r for r in dsir_gumbel_topk(
                w.filter("doc_id is not null"), "doc_id", 2, salt="epoch0"
            ).collect() if r.doc_id == doc_id
        ][0]
        assert row.gumbel_key == pytest.approx(row.log_weight + g, abs=0)


def test_dsir_logratio_overflow_guard_raises(spark):
    """The exact-double invariant is checked, not asserted: totals big
    enough that the smoothed products pass 2^53 raise a named error
    instead of silently diverging between engines. Engineered via a tiny
    bucket space and counts injected through a pre-aggregated frame is
    not possible (totals derive from the corpus), so the guard is
    exercised through its own predicate arithmetic on a forged dense
    frame — the same expression dsir_logratios builds."""
    from pyspark.sql import functions as F

    # replicate the guard predicate with T, R at the boundary
    a = F.lit(1)
    limit = float(2 ** 53)
    df = spark.createDataFrame(
        [(2 ** 27, 2 ** 27), (100, 100)], "T long, R long"
    )
    ab = a * F.lit(8192)
    too_big = (
        ((F.col("T") + a).cast("double") * (F.col("R") + ab).cast("double")
         >= limit)
        | ((F.col("R") + a).cast("double") * (F.col("T") + ab).cast("double")
           >= limit)
    )
    rows = df.select(F.col("T"), too_big.alias("big")).collect()
    got = {r.T: r.big for r in rows}
    assert got[2 ** 27] is True and got[100] is False
