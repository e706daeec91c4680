"""Property-based tests (hypothesis) for the corpus-audit operators:
Spark results checked against independent pure-Python models on arbitrary
generated corpora (ASCII word soup — the operators' documented
tokenization regime; the Unicode edge is pinned in the corpus suite)."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=40).map(" ".join)


def _norm_words(t: str) -> list[str]:
    return re.sub(r"\s+", " ", t.strip().lower(), flags=re.ASCII).split(" ")


def _py_ngrams(t: str, n: int) -> list[str]:
    ws = _norm_words(t)
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=12), st.integers(2, 4))
def test_ngram_counts_match_python_model(spark, docs, n):
    """The UDF partial-count tier, merged, equals an exact Python Counter
    over the same corpus — for any docs and any n (heavy hitters are just
    the top-k of this)."""
    from pyspark.sql import functions as F

    from mare_spark.operators.analysis import ngram_partial_counts

    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = {
        r.ngram: r.cnt
        for r in ngram_partial_counts(df, "text", n)
        .groupBy("ngram")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    want = Counter(g for d in docs for g in _py_ngrams(d, n))
    assert got == dict(want)


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=10))
def test_expression_and_udf_ngram_tiers_agree(spark, docs):
    """The expression tier (word_ngrams + explode) and the Arrow tier
    (ngram_partial_counts) produce identical gram multisets — callers may
    compose with either."""
    from pyspark.sql import functions as F

    from mare_spark.operators.analysis import ngram_partial_counts, word_ngrams

    df = spark.createDataFrame([(d,) for d in docs], "text string")
    expr = Counter(
        r.g
        for r in df.select(
            F.explode(word_ngrams(F.col("text"), 3)).alias("g")
        ).collect()
    )
    udf = {
        r.ngram: r.cnt
        for r in ngram_partial_counts(df, "text", 3)
        .groupBy("ngram")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert dict(expr) == udf


@settings(max_examples=8, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=10))
def test_tfidf_matches_python_model(spark, docs):
    """TF-IDF top-k per doc equals an independent Python model (same
    score = tf * n_docs / df, ties on term asc) for any corpus."""
    from mare_spark.operators.analysis import tfidf_keywords

    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.doc_freq)
        for r in tfidf_keywords(
            df, "text", "doc_id", k=2, min_term_len=1
        ).collect()
    }

    from mare_spark.operators.text import STOPWORDS

    stop = set(STOPWORDS)
    tf: dict[tuple[int, str], int] = Counter()
    for i, d in enumerate(docs):
        for w in _norm_words(d):
            if w and w not in stop:
                tf[(i, w)] += 1
    dfreq = Counter(term for (_, term) in tf)
    n_docs = len(docs)
    want = {}
    for i in range(n_docs):
        terms = [(t, c) for (j, t), c in tf.items() if j == i]
        scored = sorted(
            terms,
            key=lambda tc: (-round(tc[1] * n_docs / dfreq[tc[0]], 6), tc[0]),
        )
        for rank, (t, c) in enumerate(scored[:2], start=1):
            want[(i, rank)] = (t, c, dfreq[t])
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(_doc, st.sampled_from(["a", "b", "c"])), min_size=1, max_size=12
    )
)
def test_cross_source_overlap_matches_python_model(spark, rows):
    """Shared-distinct-gram counts per source pair equal a Python set
    model for any corpus/source assignment."""
    from mare_spark.operators.analysis import cross_source_overlap

    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, src string",
    )
    got = {
        (r.source_a, r.source_b): r.n_shared_ngrams
        for r in cross_source_overlap(df, "text", "src", n=2).collect()
    }
    grams: dict[str, set] = {}
    for t, s in rows:
        grams.setdefault(s, set()).update(_py_ngrams(t, 2))
    want = {}
    srcs = sorted(grams)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(grams[a] & grams[b])
            if shared:
                want[(a, b)] = shared
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=12))
def test_cluster_stats_conserve_documents(spark, docs):
    """At every granularity the histogram accounts for every document
    exactly once, and redundant = docs - clusters."""
    from mare_spark.operators.analysis import dedup_cluster_stats

    df = spark.createDataFrame(
        [(i, d, "s") for i, d in enumerate(docs)],
        "doc_id long, text string, src string",
    )
    out = dedup_cluster_stats(df, "text").collect()
    kinds = {r.key_kind for r in out}
    assert kinds == {"exact", "prefix8"}
    for kind in kinds:
        part = [r for r in out if r.key_kind == kind]
        assert sum(r.n_docs for r in part) == len(docs)
        assert sum(r.n_redundant for r in part) == len(docs) - sum(
            r.n_clusters for r in part
        )
