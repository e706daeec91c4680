"""Round-6 registrations, second batch: materialized token-tape packing
(the sequences a dataloader actually reads), embedding-cluster-balanced
sampling (DataComp-style diversity selection), and the ANALYZE-style
column profile that drives join-strategy decisions at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mare_spark.queries.llm2 import _WORDS
from mare_spark.registry import register
from mare_spark.tables import read_table

_TAPE_LEN = 512
_TAPE_VOCAB = 32768  # hash-id space for the oracle-checkable tape run

# word -> deterministic token id: 60-bit md5 prefix mod the vocab size
# (the registry's cross-engine hash convention; positive on both engines)
_DUCK_WID = (
    f"CAST(CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % {_TAPE_VOCAB} "
    "AS INT)"
)


def _spark_word_ids(words):
    return F.transform(
        F.filter(words, lambda w: w != ""),
        lambda w: (
            F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")
            % _TAPE_VOCAB
        ).cast("int"),
    )


@register(
    "pack_token_ids_tape",
    category="llm",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_transform(list_filter({_WORDS}, w -> w <> ''),
                            w -> {_DUCK_WID}) AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, toks, len(toks) AS n,
             CAST(sum(len(toks)) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - len(toks) AS BIGINT) AS start
      FROM t WHERE len(toks) > 0
    ),
    p AS (
      SELECT lang, u.q AS seq_id,
             greatest(start, u.q * {_TAPE_LEN}) AS piece_start,
             toks[CAST(greatest(start, u.q * {_TAPE_LEN}) - start + 1 AS BIGINT)
                  : CAST(least(start + n, (u.q + 1) * {_TAPE_LEN}) - start AS BIGINT)]
               AS piece
      FROM c, UNNEST(range(start // {_TAPE_LEN},
                           (start + n - 1) // {_TAPE_LEN} + 1)) AS u(q)
    ),
    s AS (
      SELECT lang, seq_id,
             flatten(list(piece ORDER BY piece_start)) AS ids
      FROM p GROUP BY lang, seq_id
    )
    SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(len(ids) AS INT) AS n_tokens,
           md5(array_to_string(list_transform(ids, x -> CAST(x AS VARCHAR)),
                               ',')) AS ids_md5
    FROM s
    """,
)
def pack_token_ids_tape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized sequence packing, driver-checked end-to-end: documents
    tokenized to deterministic hash ids (md5-60-bit mod 32768 — the
    oracle-replayable stand-in for a learned BPE vocab), packed per
    language onto 512-token tapes by ``pack_token_tape``, each SEQUENCE
    row reduced to scalars (length + an md5 digest of the exact id
    order) for the hash gate. Two keyed exchanges, expression code only
    — no per-token explode, no UDF."""
    from mare_spark.operators.corpus import pack_token_tape
    from mare_spark.operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    with_ids = docs.select(
        "doc_id", "lang",
        _spark_word_ids(tokens(F.col("text"))).alias("ids"),
    )
    tape = pack_token_tape(
        with_ids, "ids", "doc_id", group_col="lang", max_len=_TAPE_LEN
    )
    return tape.select(
        "lang", "seq_id", "n_tokens",
        F.md5(
            F.array_join(
                F.transform("token_ids", lambda x: x.cast("string")), ","
            )
        ).alias("ids_md5"),
    )


_DIVERSITY_K = 8  # seed centroids (matches embedding_cluster_assign)
_PER_CLUSTER = 25


@register(
    "sample_cluster_balanced",
    category="llm",
    oracle=f"""
    WITH c AS (
      -- NULL seed/data vectors excluded in lockstep with
      -- assign_to_centroids (r8 review — the llm4 lockstep applied here)
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c_idx,
             embedding AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings
            WHERE embedding IS NOT NULL
            ORDER BY vec_id LIMIT {_DIVERSITY_K})
    ),
    d AS (
      SELECT e.vec_id, c.c_idx,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE)
                     - CAST(c.cvec[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE)
                     - CAST(c.cvec[i] AS DOUBLE)))) AS d2
      FROM embeddings e CROSS JOIN c
      WHERE e.embedding IS NOT NULL
    ),
    a AS (
      SELECT vec_id, c_idx, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_idx)
               AS rn
      FROM d
    )
    SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id,
           CAST(sample_rank AS INT) AS sample_rank
    FROM (
      SELECT vec_id, c_idx AS cluster_id,
             row_number() OVER (
               PARTITION BY c_idx
               ORDER BY md5(CAST(vec_id AS VARCHAR))) AS sample_rank
      FROM a WHERE rn = 1
    ) WHERE sample_rank <= {_PER_CLUSTER}
    """,
)
def sample_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cluster-balanced diversity sample: assign every vector to
    its nearest deterministic seed centroid, keep exactly
    min(25, cluster size) vectors per cluster by md5 order — the
    DataComp-style selection that stops one dense topic from dominating a
    training mix the way a uniform sample would. Zero-shuffle assignment
    + one WindowGroupLimit-bounded top-k exchange."""
    from mare_spark.operators.similarity import cluster_balanced_sample

    emb = read_table(spark, sf_dir, "embeddings")
    return cluster_balanced_sample(
        emb, "embedding", "vec_id",
        k_clusters=_DIVERSITY_K, per_cluster=_PER_CLUSTER,
    )


_PROFILE_COLS = ("doc_id", "lang", "source", "n_chars")


@register(
    "corpus_column_profile",
    category="llm",
    oracle="""
    SELECT 'doc_id' AS column_name, count(*) AS n_rows,
           CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           min(CAST(doc_id AS VARCHAR)) AS min_value,
           max(CAST(doc_id AS VARCHAR)) AS max_value,
           min(TRY_CAST(doc_id AS DOUBLE)) AS min_numeric,
           max(TRY_CAST(doc_id AS DOUBLE)) AS max_numeric
    FROM documents
    UNION ALL
    SELECT 'lang', count(*),
           CAST(count(*) - count(lang) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT),
           min(CAST(lang AS VARCHAR)), max(CAST(lang AS VARCHAR)),
           min(TRY_CAST(lang AS DOUBLE)) AS min_numeric,
           max(TRY_CAST(lang AS DOUBLE)) AS max_numeric
    FROM documents
    UNION ALL
    SELECT 'source', count(*),
           CAST(count(*) - count(source) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT),
           min(CAST(source AS VARCHAR)), max(CAST(source AS VARCHAR)),
           min(TRY_CAST(source AS DOUBLE)) AS min_numeric,
           max(TRY_CAST(source AS DOUBLE)) AS max_numeric
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*),
           CAST(count(*) - count(n_chars) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           min(CAST(n_chars AS VARCHAR)), max(CAST(n_chars AS VARCHAR)),
           min(TRY_CAST(n_chars AS DOUBLE)) AS min_numeric,
           max(TRY_CAST(n_chars AS DOUBLE)) AS max_numeric
    FROM documents
    """,
)
def corpus_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the documents table: per column,
    row/null/exact-distinct counts and lexicographic min/max — the
    statistics that decide broadcast-vs-shuffle joins, bucketing keys and
    partition columns before anyone runs a 100 TB query. One explode +
    one keyed aggregate; the string cast makes min/max engine-identical
    across types."""
    from mare_spark.operators.analysis import column_profile

    docs = read_table(spark, sf_dir, "documents")
    return column_profile(docs, _PROFILE_COLS)


_INTRA_CHUNK = 8


@register(
    "text_intra_doc_dedup",
    category="llm",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents
               -- the operator drops NULL-text docs; without this gate
               -- the oracle would emit a (doc_id, NULL, NULL) row
               WHERE text IS NOT NULL),
    c AS (
      SELECT doc_id,
             list_transform(
               range(0, CAST(ceil(len(w) / {_INTRA_CHUNK}.0) AS BIGINT)),
               i -> array_to_string(
                 w[i * {_INTRA_CHUNK} + 1 : i * {_INTRA_CHUNK} + {_INTRA_CHUNK}],
                 ' ')) AS chunks
      FROM t
    ),
    k AS (
      SELECT doc_id, chunks,
             list_filter(chunks,
               (c, i) -> list_position(chunks, c) = i) AS kept
      FROM c
    )
    SELECT doc_id,
           array_to_string(kept, ' ') AS clean_text,
           CAST(len(chunks) AS INT) AS n_chunks,
           CAST(len(chunks) - len(kept) AS INT) AS n_chunks_removed
    FROM k
    """,
)
def text_intra_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition removal: aligned 8-word chunks, first
    occurrence wins INSIDE each doc (the per-doc complement of the
    corpus-level chunk scrub — catches self-repeating generated/scraped
    text whose chunks are globally unique). Pure per-row expression code
    — zero shuffle, zero UDF; the oracle replays the indexed-lambda
    filter with DuckDB's 1-based list lambdas."""
    from mare_spark.operators.corpus import intra_doc_chunk_dedup

    docs = read_table(spark, sf_dir, "documents")
    return intra_doc_chunk_dedup(
        docs, "text", "doc_id", chunk_words=_INTRA_CHUNK
    )


_QSK = 256


@register(
    "events_quantile_sketch",
    category="llm",
    oracle=f"""
    WITH d AS (
      -- dedup per hash BEFORE the trim (min value per hash — the
      -- sketch's smallest-value-wins rule), mirroring the r8
      -- dedup-before-trim fix; with the fixture's unique event_ids the
      -- aggregate is a no-op, but the oracle must model the semantics
      SELECT event_type,
             md5(CAST(event_id AS VARCHAR) || ':') AS h,
             min(value) AS value
      FROM events
      -- the sketch excludes NULL ids/values before the trim; a NULL
      -- value in the bottom-k would waste the slot and shift the
      -- percentile indexing on this side only
      WHERE event_id IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY h) AS rn
      FROM d
    ),
    v AS (
      SELECT event_type, list_sort(list(value)) AS vals
      FROM s WHERE rn <= {_QSK}
      GROUP BY event_type
    )
    SELECT event_type,
           vals[greatest(1, CAST(ceil(0.5 * len(vals)) AS BIGINT))] AS p50,
           vals[greatest(1, CAST(ceil(0.9 * len(vals)) AS BIGINT))] AS p90,
           CAST(len(vals) AS INT) AS sample_rows
    FROM v
    """,
)
def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches, driver-checked through their defining
    property: per-(event_type, day) bottom-256 sketches roll up to
    event_type and read p50/p90 — and because bottom-k merges are EXACT,
    the oracle replays the read as ONE global bottom-k per event_type
    (per-day batching is provably invisible). Map-side WindowGroupLimit
    trims before each exchange; the rollup touches sketch rows only."""
    from mare_spark.operators.sketches import (
        merge_quantile_estimates,
        quantile_sketch_table,
    )

    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts").cast("string")
    )
    per_day = quantile_sketch_table(
        ev, "value", "event_id", ["event_type", "day"], k=_QSK
    )
    return merge_quantile_estimates(
        per_day, ["event_type"], [0.5, 0.9], k=_QSK
    )
