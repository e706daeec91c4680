"""Corpus-preparation queries (LLM family, round 2): repetition stats,
quality gates, PII scrubbing, eval-set decontamination, sequence packing,
and the corpus mix report — the filter/transform passes between raw
ingestion and tokenization in a pretraining data pipeline.

Every query here is SQL-expressible and carries a DuckDB oracle. The
shared fragments mirror mare_spark.queries.llm (normalized text, word
split) so all LLM-family oracles agree on tokenization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mare_spark.operators.corpus import (
    PII_PATTERNS,
    decontaminate_ngrams,
    ngram_overlap_report,
    pack_sequences,
    pii_scrub,
    quality_gates,
    repetition_stats,
    sql_temperature_pow,
)
from mare_spark.operators.text import STOPWORDS, tokens
from mare_spark.queries._decimal import fround

# ONE definition of the tokenization fragments (llm.py) — a hand-copied
# twin edited in one file but not the other would silently fork the word
# split between oracle families
from mare_spark.queries.llm import _NORM, _WORDS
from mare_spark.registry import register
from mare_spark.tables import read_table

_STOPLIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _duck_ngrams(n: int, words: str = "w") -> str:
    """Word n-grams over an already-bound DuckDB list column ``words``
    (1-based inclusive slices — same space-joined-slice semantics as
    operators.dedup.hashed_word_shingles, pre-hash)."""
    return (
        f"list_transform(range(1, greatest(len({words}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(({words})[i:i+{n - 1}], ' '))"
    )


# Most-frequent-word count over a bound list column — mirrors the scan-side
# transform in operators.corpus (O(d·n), no unnest/groupBy).
_TOP_WORD = (
    "list_max(list_transform(list_distinct(w), "
    "x -> len(list_filter(w, y -> y = x))))"
)


@register(
    "text_repetition_stats",
    category="llm",
    bench=True,
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    s AS (
      SELECT doc_id, len(w) AS n, len(list_distinct(w)) AS nd,
             {_TOP_WORD} AS top,
             {_duck_ngrams(2)} AS bg
      FROM w
    )
    SELECT doc_id, n AS n_tokens,
           (floor(nd / greatest(n, 1) * 1000000.0 + 0.5) / 1000000.0)
             AS distinct_word_ratio,
           (floor(top / greatest(n, 1) * 1000000.0 + 0.5) / 1000000.0)
             AS top_word_frac,
           (floor((len(bg) - len(list_distinct(bg))) / greatest(len(bg), 1)
                  * 1000000.0 + 0.5) / 1000000.0)
             AS dup_bigram_frac
    FROM s
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (distinct-word ratio, top-word
    fraction, duplicate-bigram fraction) — scan-side array expressions,
    no shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "text", "doc_id")


@register(
    "text_quality_gates",
    category="llm",
    oracle=f"""
    WITH w AS (SELECT doc_id, text, {_WORDS} AS w FROM documents),
    s AS (
      SELECT doc_id, len(w) AS n, length(text) AS n_chars,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
             length(replace({_NORM}, ' ', '')) / greatest(len(w), 1) AS avg_wl,
             len(list_filter(w, x -> list_contains({_STOPLIST}, x))) AS stop_hits,
             {_TOP_WORD} AS top
      FROM w
    )
    SELECT doc_id,
           CAST(n BETWEEN 25 AND 100000 AS INT) AS gate_len,
           CAST(avg_wl BETWEEN 2.0 AND 12.0 AS INT) AS gate_word_len,
           CAST(n_punct / greatest(n_chars, 1) <= 0.10 AS INT) AS gate_punct,
           CAST(stop_hits >= 2 AS INT) AS gate_stopwords,
           CAST(top / greatest(n, 1) <= 0.25 AS INT) AS gate_repetition,
           CAST(
             (n BETWEEN 25 AND 100000)
             AND (avg_wl BETWEEN 2.0 AND 12.0)
             AND (n_punct / greatest(n_chars, 1) <= 0.10)
             AND (stop_hits >= 2)
             AND (top / greatest(n, 1) <= 0.25)
           AS INT) AS kept
    FROM s
    """,
)
def text_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality filter (C4/Gopher-style): per-rule 0/1 gates plus
    the conjunction, for per-rule kill-rate auditing before dropping docs."""
    docs = read_table(spark, sf_dir, "documents")
    return quality_gates(docs, "text", "doc_id")


def _pii_scrub_oracle() -> str:
    email, ipv4, ssn = (p for _, p, _ in PII_PATTERNS)
    after_email = f"regexp_replace(text, '{email}', '<EMAIL>', 'g')"
    after_ip = f"regexp_replace({after_email}, '{ipv4}', '<IP>', 'g')"
    after_ssn = f"regexp_replace({after_ip}, '{ssn}', '<ID>', 'g')"
    # counts follow the operator's progressive-scrub order: each pattern is
    # counted on the text as already scrubbed by the previous patterns
    return f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{email}')) AS n_email,
           len(regexp_extract_all({after_email}, '{ipv4}')) AS n_ipv4,
           len(regexp_extract_all({after_ip}, '{ssn}')) AS n_ssn,
           md5({after_ssn}) AS scrubbed_md5
    FROM documents
    """


@register("text_pii_scrub", category="llm", oracle=_pii_scrub_oracle())
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / IPv4s / SSN-shaped ids): per-kind counts +
    md5 of the scrubbed text (the full scrubbed column stays on the
    operator API; the query hashes it to keep the result compact).
    Positive-match behavior is unit-tested on crafted rows in pytest — the
    fixture corpus is PII-free, so this query additionally proves the
    no-false-positive direction on clean text."""
    docs = read_table(spark, sf_dir, "documents")
    s = pii_scrub(docs, "text", "doc_id")
    return s.select(
        "doc_id", "n_email", "n_ipv4", "n_ssn",
        F.md5("scrubbed_text").alias("scrubbed_md5"),
    )


@register(
    "decontaminate_vs_eval",
    category="llm",
    bench=True,
    oracle=f"""
    WITH w AS (SELECT doc_id, source, lang, {_WORDS} AS w FROM documents),
    g AS (
      SELECT doc_id, source, unnest({_duck_ngrams(8)}) AS gram FROM w
    ),
    ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
    contam AS (
      SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram)
      WHERE g.source <> 'src0'
    )
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.source <> 'src0'
      AND NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = d.doc_id)
    """,
)
def decontaminate_vs_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: treat source 'src0' as the held-out eval
    corpus and drop every other document sharing any word 8-gram with it.
    Eval n-grams are hashed and broadcast — the training side is one scan +
    broadcast semi-join, never shuffled."""
    docs = read_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return decontaminate_ngrams(train, eval_df, "text", "doc_id", n=8).select(
        "doc_id", "lang"
    )


@register(
    "decontaminate_overlap_report",
    category="llm",
    oracle=f"""
    WITH w AS (SELECT doc_id, source, {_WORDS} AS w FROM documents),
    g AS (
      SELECT doc_id, source,
             unnest(list_distinct({_duck_ngrams(8)})) AS gram
      FROM w
    ),
    ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
    t AS (
      SELECT g.doc_id,
             count(*) AS n_grams,
             sum(CASE WHEN ev.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_matched
      FROM g LEFT JOIN ev USING (gram)
      WHERE g.source <> 'src0'
      GROUP BY g.doc_id
    )
    SELECT doc_id,
           n_grams,
           CAST(n_matched AS BIGINT) AS n_matched,
           (floor(n_matched / CAST(n_grams AS DOUBLE) * 1000000.0 + 0.5)
            / 1000000.0) AS overlap_frac
    FROM t
    WHERE n_matched >= 1
    """,
)
def decontaminate_overlap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded contamination vs the 'src0' eval corpus: for every other
    document sharing at least one word 8-gram with it, the distinct-gram
    count, matched count, and matched fraction — the report behind a
    fractional drop policy (decontaminate_vs_eval is the any-overlap
    special case). Same broadcast plan shape; one keyed groupBy."""
    docs = read_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return ngram_overlap_report(train, eval_df, "text", "doc_id", n=8).select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_matched").cast("long").alias("n_matched"),
        "overlap_frac",
    )


@register(
    "pack_training_sequences",
    category="llm",
    bench=True,
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, len({_WORDS}) AS n_tokens FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start
      FROM t
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(start / 512) AS BIGINT) AS seq_id,
           CAST(start % 512 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-cut sequence packing per language: documents in
    doc_id order land on a token tape cut every 512 tokens; output is each
    document's (seq_id, seq_offset) — deterministic shard assignment for a
    training-data writer. One shuffle on the group key + one windowed
    cumulative sum."""
    docs = read_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return pack_sequences(
        with_tokens, "n_tokens", "doc_id", group_col="lang", max_len=512
    )


@register(
    "corpus_mix_report",
    category="llm",
    oracle=f"""
    WITH t AS (SELECT lang, source, len({_WORDS}) AS nt FROM documents),
    g AS (
      SELECT lang, source, count(*) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens
      FROM t GROUP BY lang, source
    )
    SELECT lang, source, n_docs, n_tokens,
           (floor(n_tokens / sum(n_tokens) OVER () * 1000000.0 + 0.5)
            / 1000000.0) AS token_share
    FROM g
    """,
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix audit: documents and tokens per (lang, source) with
    each cell's share of total corpus tokens — the report that drives
    stratified-sampling rates. The share window runs over the grouped
    result (|langs|x|sources| rows), not the corpus."""
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents")
    g = (
        docs.select(
            "lang", "source", F.size(tokens(F.col("text"))).alias("nt")
        )
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens"))
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return g.select(
        "lang", "source", "n_docs", "n_tokens",
        fround(F.col("n_tokens") / total, 6).alias("token_share"),
    )


@register(
    "text_unigram_logprob",
    category="llm",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_WORDS}) AS w FROM documents),
    freq AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
    tot AS (SELECT sum(cnt) AS total FROM freq)
    SELECT tok.doc_id, count(*) AS n_tokens,
           (floor(CAST(sum(CAST(
                    (floor(ln(freq.cnt / tot.total) * 1000000.0 + 0.5)
                     / 1000000.0) AS DECIMAL(28,6))) AS DOUBLE)
                  / count(*) * 1000000.0 + 0.5) / 1000000.0) AS avg_logprob
    FROM tok, freq, tot
    WHERE tok.w = freq.w
    GROUP BY tok.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus' own
    word distribution — the cheap LM-perplexity stand-in for fluency
    ranking (corpus-adaptive: the 'model' is pass one's frequency table)."""
    from mare_spark.operators.corpus import unigram_logprob

    docs = read_table(spark, sf_dir, "documents")
    return unigram_logprob(docs, "text", "doc_id")


def _substring_candidates_oracle() -> str:
    from mare_spark.queries.llm import _FP_CTES, duck_rolling_fp

    return f"""
    {_FP_CTES},
    h AS (SELECT doc_id, {duck_rolling_fp(8)} AS fp FROM c),
    inv AS (SELECT DISTINCT doc_id, unnest(fp) AS fp FROM h),
    capped AS (SELECT fp FROM inv GROUP BY fp HAVING count(*) <= 1000),
    iv AS (SELECT doc_id, fp FROM inv WHERE fp IN (SELECT fp FROM capped))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM iv a JOIN iv b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
    HAVING count(*) >= 2
    """


@register(
    "dedup_substring_candidates",
    category="llm",
    oracle=_substring_candidates_oracle(),
)
def dedup_substring_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document substring-overlap candidates via shared winnowing
    fingerprints (bottom-8 rolling-hash sketch, window 8) — the
    distributable approximation of suffix-array substring dedup.

    Hash-checked (upgraded from rows-only): the oracle replays the
    window-8 polynomial fingerprint (`queries.llm.duck_rolling_fp`) and
    recomposes the freq-capped inverted-index pair count in SQL. Both
    sides ASCII-gate the corpus identically (zero rows dropped on current
    fixtures) so SQL codepoints equal the UDF's UTF-8 bytes."""
    from mare_spark.operators.dedup import substring_overlap_candidates

    docs = read_table(spark, sf_dir, "documents").filter(
        F.length("text") == F.octet_length("text")
    )
    return substring_overlap_candidates(
        docs, "text", "doc_id", window=8, keep=8, min_shared=2,
        # cap stated explicitly (registry doctrine: never a silent
        # library default — the oracle hardcodes the same 1000)
        max_fp_freq=1000,
    )


@register("dedup_semantic", category="llm", oracle=None)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: IVF-cell blocking (k-means)
    + within-cell exact cosine at >= 0.4 (the fixture's seeded near-dup
    band — its max pairwise cosine is ~0.51). Rows-only driver check
    (centroid training is iterative, not SQL); pytest verifies its pairs
    are a subset of the exact all-pairs tier with high recall (blocking
    puts near-identical vectors in one cell)."""
    from mare_spark.operators.similarity import semantic_dedup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(
        emb, "embedding", "vec_id", nlist=16, threshold=0.4, nprobe_assign=3
    )


@register(
    "sample_temperature_rates",
    category="llm",
    # nat^0.7 is the grid-snapped exp(0.7·ln) chain in integer micros,
    # generated from the operator's own fragment helper — never pow(),
    # whose Java/DuckDB implementations have no pinned ulp relationship
    oracle=f"""
    WITH g AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    n1 AS (SELECT lang, n, n / sum(n) OVER () AS nat FROM g),
    n2 AS (SELECT lang, n, nat,
           {sql_temperature_pow('nat', 0.7)} AS pm FROM n1),
    n3 AS (SELECT lang, n, nat,
           CAST(pm AS DOUBLE) / CAST(sum(pm) OVER () AS DOUBLE) AS temp
           FROM n2)
    SELECT lang, n,
           (floor(nat * 1000000.0 + 0.5) / 1000000.0) AS natural_share,
           (floor(temp * 1000000.0 + 0.5) / 1000000.0) AS temperature_share,
           (floor(temp / nat * 1000000.0 + 0.5) / 1000000.0) AS boost
    FROM n3
    """,
)
def sample_temperature_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.7) per-language mixing shares — the
    multilingual upweighting rule; boost is the factor to apply to a base
    sampling rate per stratum."""
    from mare_spark.operators.corpus import temperature_rates

    docs = read_table(spark, sf_dir, "documents")
    return temperature_rates(docs, "lang", alpha=0.7)


@register(
    "multimodal_frame_sample",
    category="llm",
    oracle="""
    WITH t AS (
      -- ceil, not floor+1: exact-multiple payloads emit no empty
      -- trailing frame; empty payloads emit no frames (operator fixed
      -- in lockstep, round 7)
      SELECT doc_id, text,
             least(CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 8) AS n
      FROM documents
      -- char-sliced frames equal byte-sliced frames only for pure-ASCII
      -- docs (DuckDB cannot slice BLOBs); both engines apply the SAME
      -- bytes==chars gate, so the compared row sets stay identical on
      -- any fixture content
      WHERE octet_length(encode(text)) = length(text)
    ),
    f AS (SELECT doc_id, text, unnest(range(0, n)) AS frame_idx FROM t)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           md5(substring(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_md5
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over binary payloads: bounded explode to
    (doc, frame_idx, stride-sliced frame bytes), hashed to a scalar for
    the harness. The DuckDB oracle can only slice by characters, so both
    sides gate on bytes==chars (pure-ASCII docs) — identical row sets on
    any fixture, byte-exact frames on the compared rows."""
    from mare_spark.operators.multimodal import attach_binary_payload, sample_frames

    docs = read_table(spark, sf_dir, "documents").filter(
        F.octet_length("text") == F.length("text")
    )
    mm = attach_binary_payload(docs, "text", "doc_id")
    frames = sample_frames(mm, "payload", "doc_id", every_n_bytes=64, max_frames=8)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5("frame_bytes").alias("frame_md5"),
    )
