"""Semantic unit tests for operators.analysis (corpus-audit family) on
small planted corpora — the oracle sweep (test_queries_oracle) carries the
fixture-scale parity evidence; these pin the operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from mare_spark.operators.analysis import (
    cross_source_overlap,
    dedup_cluster_stats,
    embedding_norm_stats,
    length_histogram,
    ngram_heavy_hitters,
    tfidf_keywords,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


def test_word_ngrams_short_doc_yields_empty(spark):
    df = spark.createDataFrame([("one two",)], "text string")
    out = df.select(word_ngrams(F.col("text"), 3).alias("g")).head()
    assert out.g == []  # no phantom descending-sequence grams


def test_word_ngrams_count_and_content(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    out = df.select(word_ngrams(F.col("text"), 2).alias("g")).head()
    assert out.g == ["a b", "b c", "c d"]


def test_heavy_hitters_finds_planted_boilerplate(spark):
    boiler = "accept all cookies to continue"
    rows = [(i, f"{boiler} unique words {i} here", "s") for i in range(20)]
    rows += [(100, "completely different text entirely", "s")]
    top = ngram_heavy_hitters(_docs(spark, rows), "text", n=3, k=3).collect()
    assert top[0].ngram == "accept all cookies"
    assert top[0].n_occurrences == 20


def test_partial_counts_vectorized_edges_match_counter_reference(spark):
    """Edge pins for the r9 vectorized partial-count pass (flat batch
    array + doc-boundary window mask): docs with exactly n tokens, docs
    shorter than n, NULL/contentless docs interleaved between counted
    docs, and adjacent docs whose boundary windows must NOT fabricate
    cross-document grams. Reference: a pure-Python Counter over string
    grams."""
    from collections import Counter

    from mare_spark.operators.analysis import ngram_partial_counts
    from mare_spark.operators.dedup import py_tokens

    rows = [
        (0, "a b c"),          # exactly n tokens at n=3 → one gram
        (1, None),             # NULL between counted docs
        (2, "x y"),            # shorter than n → none
        (3, "c a b c"),        # shares boundary tokens with doc 0
        (4, ""),               # contentless
        (5, "b c a"),          # would chain with doc 3's tail if windows leaked
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 3
    got = Counter()
    for r in ngram_partial_counts(df, "text", n).collect():
        got[r.ngram] += r.cnt
    want: Counter = Counter()
    for _, t in rows:
        ws = py_tokens(t)
        if ws == [""]:
            continue
        for i in range(len(ws) - n + 1):
            want[" ".join(ws[i : i + n])] += 1
    assert got == want, (got, want)


def test_tfidf_rare_term_outranks_common(spark):
    # "shared" appears in every doc (df=3) — "zebra" only in doc 0 (df=1).
    rows = [
        (0, "shared zebra words", "s"),
        (1, "shared plain words", "s"),
        (2, "shared plain words", "s"),
    ]
    out = tfidf_keywords(_docs(spark, rows), "text", "doc_id", k=1)
    r0 = out.filter(F.col("doc_id") == 0).head()
    assert r0.term == "zebra"
    assert r0.doc_freq == 1 and r0.tf == 1
    assert r0.tfidf == 3.0  # tf(1) * n_docs(3) / df(1)


def test_length_histogram_shares_sum_to_one(spark):
    rows = [(i, " ".join(["w"] * (10 + 40 * (i % 3))), "s") for i in range(30)]
    df = _docs(spark, rows).withColumn("lang", F.lit("en"))
    out = length_histogram(df, "text", "lang")
    agg = out.agg(
        F.round(F.sum("share_of_group"), 4).alias("s"),
        F.sum("n_docs").alias("n"),
    ).head()
    assert agg.n == 30
    assert abs(agg.s - 1.0) < 1e-3


def test_cluster_stats_docs_total_matches_corpus(spark):
    rows = [(0, "same text here now", "s"), (1, "same TEXT  here now", "s"),
            (2, "other text", "s")]
    out = dedup_cluster_stats(_docs(spark, rows), "text").collect()
    for kind in ("exact", "prefix8"):
        part = [r for r in out if r.key_kind == kind]
        assert sum(r.n_docs for r in part) == 3
    exact2 = [r for r in out if r.key_kind == "exact" and r.cluster_size == 2]
    assert exact2 and exact2[0].n_clusters == 1  # normalization merged 0,1
    assert exact2[0].n_redundant == 1


def test_cross_source_overlap_counts_distinct_shared_grams(spark):
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, shared, "a"),
        (1, shared + " tail", "b"),
        (2, "nothing in common with those", "c"),
    ]
    out = cross_source_overlap(_docs(spark, rows), "text", "src", n=5).collect()
    assert len(out) == 1
    r = out[0]
    # "a" has 2 distinct 5-grams; both appear in b's 3-gram set of 5-grams.
    assert (r.source_a, r.source_b, r.n_shared_ngrams) == ("a", "b", 2)


def test_embedding_norm_stats_exact_values(spark):
    df = spark.createDataFrame(
        [(0, [3.0, 4.0], 1), (1, [6.0, 8.0], 1), (2, [0.0, 0.0], 2)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.label: r for r in embedding_norm_stats(df, "embedding", "label").collect()}
    assert out[1].n_vecs == 2
    assert out[1].avg_norm == 7.5 and out[1].min_norm == 5.0
    assert out[1].max_norm == 10.0
    assert out[2].avg_norm == 0.0


def test_apply_mixture_upweights_low_resource_stratum(spark):
    """With alpha < 1, the rare stratum's keep rate exceeds the dominant
    stratum's; membership is deterministic (same result twice); the rate
    table joins as a broadcast (no shuffle of the corpus)."""
    from mare_spark import plans as P
    from mare_spark.operators.corpus import apply_mixture_sampling

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = apply_mixture_sampling(df, "lang", "doc_id", alpha=0.5, base_rate=0.4)
    rates = {r.lang: r.rate for r in out.select("lang", "rate").distinct().collect()}
    assert rates["small"] > rates["big"]
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in out.collect())
    assert a == b and len(a) > 0
    assert P.count_broadcast_joins(out) >= 1, P.formatted_plan(out)


def test_vocab_stats_exact_counts(spark):
    df = spark.createDataFrame(
        [(0, "a b a", "en"), (1, "a c", "en"), (2, "x x", "de")],
        "doc_id long, text string, lang string",
    )
    from mare_spark.operators.analysis import vocab_stats

    out = {r.lang: r for r in vocab_stats(df, "text", "lang").collect()}
    en = out["en"]
    assert (en.n_tokens, en.n_types, en.n_hapax) == (5, 3, 2)  # b, c hapax
    assert en.type_token_ratio == 0.6
    de = out["de"]
    assert (de.n_tokens, de.n_types, de.n_hapax) == (2, 1, 0)


def test_lang_confusion_single_scan_no_join(spark):
    from mare_spark import plans as P
    from mare_spark.operators.analysis import lang_confusion_matrix

    df = spark.createDataFrame(
        [(0, "the cat is of the mat", "en"), (1, "el que la y es de", "en"),
         (2, "zz yy xx", "fr")],
        "doc_id long, text string, lang string",
    )
    out = {(r.lang_label, r.lang_pred): r.n_docs
           for r in lang_confusion_matrix(df, "text", "lang").collect()}
    assert out[("en", "en")] == 1
    assert out[("en", "es")] == 1
    assert out[("fr", "und")] == 1
    plan = P.formatted_plan(lang_confusion_matrix(df, "text", "lang"))
    assert "Join" not in plan, plan  # prediction computed in the label scan


def test_cluster_stats_null_text_excluded_and_never_merged(spark):
    """NULL-text docs are EXCLUDED from the audit (r8: in lockstep with
    exact_dedup, which filters them — two NULL docs would otherwise form
    one phantom 'duplicate cluster' on both engines and inflate the
    reported yield), and an empty doc still never merges with anything
    else (the r6 concat_ws hazard)."""
    from mare_spark.operators.analysis import dedup_cluster_stats

    df = spark.createDataFrame(
        [(0, None, "s"), (1, "", "s"), (2, "real text here", "s"),
         (3, None, "s")],
        "doc_id long, text string, src string",
    )
    out = dedup_cluster_stats(df, "text").collect()
    prefix = [r for r in out if r.key_kind == "prefix8"]
    # the two NULL docs are absent (no phantom size-2 cluster); '' and
    # 'real text' each group alone: exactly 2 singleton clusters
    assert {(r.cluster_size, r.n_clusters) for r in prefix} == {(1, 2)}
    exact = [r for r in out if r.key_kind == "exact"]
    assert {(r.cluster_size, r.n_clusters) for r in exact} == {(1, 2)}


def test_ngram_novelty_planted_overlap(spark):
    """A doc of wholly unique grams scores 1.0; two docs sharing their
    entire text score 0.0; a half-shared doc lands strictly between."""
    from mare_spark.operators.analysis import ngram_novelty

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        (0, shared),
        (1, shared),
        (2, "one two three four five six seven eight nine ten"),
        (3, shared + " unique tail of several more words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in ngram_novelty(df, "text", "doc_id", n=8).collect()}
    assert got[0].novelty == 0.0 and got[1].novelty == 0.0
    assert got[2].novelty == 1.0
    assert 0.0 < got[3].novelty < 1.0
    # doc 3 shares exactly one 8-gram (the aligned `shared` prefix)
    assert got[3].n_novel_ngrams == got[3].n_distinct_ngrams - 1


def test_sliding_chunks_offsets_and_coverage(spark):
    """Chunks start every stride tokens, cover the whole document, carry
    correct lengths, and reconstruct the document from stride-aligned
    prefixes."""
    from mare_spark.operators.text import sliding_chunks

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        sliding_chunks(df, "text", "doc_id", window=4, stride=3).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.start_token for r in out] == [0, 3, 6, 9]
    assert [r.chunk_tokens for r in out] == [4, 4, 4, 1]
    assert out[0].chunk_text == "w0 w1 w2 w3"
    assert out[-1].chunk_text == "w9"
    rebuilt = " ".join(" ".join(r.chunk_text.split()[:3]) for r in out)
    assert rebuilt == text


def test_sliding_chunks_property_reconstruction(spark):
    """For a batch of arbitrary word-soup docs: stride-aligned prefixes
    of the chunks reconstruct each document exactly, chunk counts equal
    ceil(n/stride), and every chunk length is min(window, n - start)."""
    import math
    import random

    from mare_spark.operators.text import sliding_chunks

    rng = random.Random(7)
    docs = [
        (i, " ".join(f"t{rng.randrange(30)}" for _ in range(rng.randrange(1, 40))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {}
    for r in sliding_chunks(df, "text", "doc_id", window=7, stride=4).collect():
        out.setdefault(r.doc_id, []).append(r)
    for i, text in docs:
        ws = text.split()
        rows = sorted(out[i], key=lambda r: r.chunk_idx)
        assert len(rows) == math.ceil(len(ws) / 4)
        for r in rows:
            assert r.start_token == r.chunk_idx * 4
            assert r.chunk_tokens == min(7, len(ws) - r.start_token)
        rebuilt = " ".join(
            " ".join(r.chunk_text.split()[:4]) for r in rows
        )
        assert rebuilt == text


# --- Unicode NFC normalization (round 6) -----------------------------------


def test_nfc_twins_defeat_exact_dedup_until_normalized(spark):
    """The selling point: composed ("é") and decomposed ("e"+combining
    acute) spellings are byte-different, so exact dedup keeps both —
    after normalize_nfc they collapse to one."""
    from mare_spark.operators.dedup import exact_dedup
    from mare_spark.operators.text import normalize_nfc

    composed = "café menu"
    decomposed = "café menu"
    assert composed != decomposed  # byte-different...
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed)], "doc_id long, text string"
    )
    assert exact_dedup(df, "text", "doc_id").count() == 2  # ...so both kept

    norm = normalize_nfc(df, "text").select(
        "doc_id", F.col("text_nfc").alias("text")
    )
    assert exact_dedup(norm, "text", "doc_id").count() == 1


def test_nfc_matches_duckdb_across_scripts(spark):
    """Engine parity behind the oracle: Python unicodedata NFC ==
    DuckDB nfc_normalize, across latin/ligature/hangul/combining-mark
    samples (ASCII passes through identically)."""
    import duckdb

    from mare_spark.operators.text import normalize_nfc

    samples = [
        "plain ascii",
        "café", "café",            # composed / decomposed
        "ﬁle ligature",                   # U+FB01 (NFC keeps it)
        "ångström",                # combining ring/diaeresis
        "한국어",                  # hangul syllables
        "ẛ̣",                        # multi-mark reordering
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.text_nfc for r in normalize_nfc(df, "text").collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        want = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert got[i] == want, (s, got[i], want)
    con.close()


def test_nfc_null_passthrough(spark):
    from mare_spark.operators.text import normalize_nfc

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert normalize_nfc(df, "text").collect()[0].text_nfc is None


def test_column_profile_counts_nulls_and_distincts(spark):
    from mare_spark.operators.analysis import column_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "x int, s string",
    )
    prof = {r.column_name: r for r in column_profile(df, ("x", "s")).collect()}
    assert prof["x"].n_rows == 4 and prof["x"].n_nulls == 1
    assert prof["x"].n_distinct == 3
    assert (prof["x"].min_value, prof["x"].max_value) == ("1", "3")
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert (prof["s"].min_value, prof["s"].max_value) == ("a", "b")


def test_column_profile_approx_tier_close_to_exact(spark):
    """approx=True (HLL at rsd=0.02) must land within a few percent of
    the exact distinct count — the zero-distinct-shuffle tier for wide
    profiles."""
    from pyspark.sql import functions as F

    from mare_spark.operators.analysis import column_profile

    df = spark.range(5000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("u")
    )
    exact = {r.column_name: r.n_distinct
             for r in column_profile(df, ("k", "u")).collect()}
    approx = {r.column_name: r.n_distinct
              for r in column_profile(df, ("k", "u"), approx=True).collect()}
    assert exact == {"k": 997, "u": 5000}
    for c in exact:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.06


def test_column_profile_requires_columns(spark):
    import pytest

    from mare_spark.operators.analysis import column_profile

    with pytest.raises(ValueError, match="at least one column"):
        column_profile(spark.range(1), ())


def test_analysis_review_contracts(spark):
    """Review-driven contracts: NULL/contentless docs emit NO phantom
    ''-grams (heavy hitters, cross-source), don't count as vocab
    types/hapax, histogram as 0-token docs, and don't deflate the
    embedding norm mean; the profile reports true numeric bounds
    alongside the lexicographic string ones."""
    from pyspark.sql import functions as F

    from mare_spark.operators.analysis import (
        column_profile,
        cross_source_overlap,
        embedding_norm_stats,
        length_histogram,
        ngram_heavy_hitters,
        vocab_stats,
    )

    docs = spark.createDataFrame(
        [(0, None, "A"), (1, "", "B"), (2, "real token here", "A")],
        "doc_id long, text string, src string",
    )
    hh = ngram_heavy_hitters(docs, "text", n=1, k=10).collect()
    assert all(r.ngram != "" for r in hh) and len(hh) == 3
    xs = cross_source_overlap(docs, "text", "src", n=1).collect()
    assert xs == []  # NULL/empty docs share nothing

    vs = vocab_stats(docs, "text", "src").collect()
    v = {r.grp if hasattr(r, "grp") else r[0]: r for r in vs}
    a = [r for r in vs if r[0] == "A"][0]
    assert a.n_types == 3 and a.n_tokens == 3  # '' never a type
    lh = {(r[0], r.length_bucket): r for r in
          length_histogram(docs, "text", "src").collect()}
    assert all(r.total_tokens in (0, 3) for r in lh.values())

    emb = spark.createDataFrame(
        [(0, [3.0, 4.0], 1), (1, None, 1)],
        "vec_id long, embedding array<double>, label int",
    )
    ns = embedding_norm_stats(emb, "embedding", "label").head()
    assert ns.n_vecs == 1 and ns.avg_norm == 5.0  # mean >= min again

    prof = {r.column_name: r for r in
            column_profile(docs, ("doc_id", "src")).collect()}
    assert prof["doc_id"].min_numeric == 0.0
    assert prof["doc_id"].max_numeric == 2.0
    assert prof["src"].min_numeric is None  # non-numeric column


def test_sliding_chunks_guards_and_tail_option(spark):
    """Review-driven: stride/window validate at call time; the
    drop_redundant_tail option removes subset-only final chunks while
    the default keeps the stride-prefix reconstruction contract."""
    import pytest

    from mare_spark.operators.text import sliding_chunks

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        sliding_chunks(df, "text", "doc_id", stride=0)
    out = sorted(
        sliding_chunks(df, "text", "doc_id", window=6, stride=3,
                       drop_redundant_tail=True).collect(),
        key=lambda r: r.chunk_idx,
    )
    # default would give ceil(10/3)=4 chunks (starts 0,3,6,9 — the 9
    # chunk is a subset of the 6 chunk); dropped-tail gives 3, and the
    # final chunk still reaches the document end
    assert [r.start_token for r in out] == [0, 3, 6]
    assert out[-1].chunk_text.endswith("w9")
