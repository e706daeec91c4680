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
