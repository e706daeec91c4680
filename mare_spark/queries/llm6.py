"""Round-5 registrations: tokenizer-training statistics (BPE) and the
deterministic epoch shuffle — the two remaining training-data-pipeline
primitives: learning a subword vocabulary from corpus statistics, and
replaying a reproducible global data order per training epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mare_spark.registry import register
from mare_spark.tables import read_table

_N_SHARDS = 8
_BPE_MERGES = 8


@register(
    "corpus_bpe_pair_counts",
    category="llm",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
      SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word
    ),
    p AS (
      SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                    i -> substr(word, i, 2))) AS pair, cnt
      FROM wc WHERE length(word) > 1
    )
    SELECT substr(pair, 1, 1) AS a, substr(pair, 2, 1) AS b,
           CAST(sum(cnt) AS BIGINT) AS pair_count
    FROM p GROUP BY a, b
    ORDER BY pair_count DESC, a, b LIMIT 50
    """,
)
def corpus_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent character-pair frequencies (occurrence-weighted) —
    the statistic the first BPE merge maximizes, exposed as the
    oracle-checkable view of the tokenizer-training family.

    Scale shape (operators.bpe.char_pair_counts): the only corpus-scale
    shuffle is the word-count aggregate; the bigram explode runs over the
    VOCAB (orders of magnitude smaller), pure expression code. Top-50 is
    TakeOrdered, never a global sort; (pair_count DESC, a, b) is a total
    order so both engines agree on the exact row set."""
    from mare_spark.operators.bpe import char_pair_counts

    docs = read_table(spark, sf_dir, "documents")
    return (
        char_pair_counts(docs, "text")
        .select("a", "b", F.col("pair_count").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "a", "b")
        .limit(50)
    )


@register("corpus_bpe_segment_report", category="llm", oracle=None)
def corpus_bpe_segment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn an 8-merge BPE table on the corpus, segment every document
    with it, and report per-language totals (docs, whitespace words, BPE
    tokens). Rows-only driver check BY DESIGN: merge learning is
    iterative (one aggregate per round — like k-means, not
    SQL-expressible); the learn/segment kernels are pinned against a
    pure-Python BPE reference in tests/test_bpe.py, including
    partition-layout independence of the learned table.

    Scale: the corpus is scanned once for word counts and once for
    segmentation (scan-side UDF, broadcast merge ranks, per-batch word
    memo); learning rounds touch only the persisted vocabulary table."""
    from mare_spark.operators.bpe import bpe_segment, learn_bpe_merges
    from mare_spark.operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, "text", _BPE_MERGES)
    seg = bpe_segment(docs, "text", merges)
    return (
        seg.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias(
                "total_words"
            ),
            F.sum(F.size("bpe_tokens")).cast("bigint").alias(
                "total_bpe_tokens"
            ),
        )
    )


@register(
    "corpus_epoch_shuffle",
    category="llm",
    oracle=f"""
    SELECT doc_id, shard, CAST(position AS INT) AS position FROM (
      SELECT doc_id, shard,
             row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
               AS position
      FROM (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR) || ':0:') AS ord,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                             || ':0:'), 1, 15)) AS BIGINT)
                    % {_N_SHARDS} AS INT) AS shard
        -- NULL doc_ids excluded in lockstep with epoch_shuffle (no
        -- replayable training-order address without a key)
        FROM documents WHERE doc_id IS NOT NULL
      )
    )
    """,
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-0 deterministic global shuffle of the documents table into
    8 shards: (doc_id, shard, position) such that reading shards sorted
    by position replays the epoch in a pseudo-random order that is a
    pure function of (doc_id, epoch) — reproducible across runs,
    partition layouts, and engines (md5 convention; rand()-based
    shuffles depend on partition layout and can't resume mid-epoch).

    Scale: one hash exchange on shard + independent per-shard sorts —
    at 100 TB, n_shards sized to the cluster's task width keeps each
    sort a few GB; nobody ever pays a full-corpus total order."""
    from mare_spark.operators.corpus import epoch_shuffle

    docs = read_table(spark, sf_dir, "documents")
    return epoch_shuffle(docs, "doc_id", n_shards=_N_SHARDS, epoch=0)


@register(
    "corpus_export_shards",
    category="llm",
    oracle=f"""
    SELECT CAST(shard AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_chars) AS BIGINT) AS n_tokens,
           CAST(bit_xor(prefix) AS BIGINT) AS id_xor
    FROM (
      SELECT n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS prefix,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % {_N_SHARDS} AS shard
      FROM documents
    )
    GROUP BY shard
    """,
)
def corpus_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export executed FOR REAL and hash-checked: the
    documents table is exported through
    ``operators.export.export_training_shards`` to a scratch directory
    (8 hash shards, one file each, manifest fingerprinting the written
    files), ``verify_export`` re-derives the stats from disk, and the
    MANIFEST is returned as the result. The oracle computes the expected
    per-shard (rows, token total, bit_xor id digest) straight from the
    sharding algebra — it never sees the files — so a lost row, a
    misassigned shard, or a digest drift between the written data and
    the manifest all hash-fail.

    Scale: one hash exchange on the 60-bit-md5 shard key + parallel
    sorted writes; the manifest aggregate is a bounded n_shards-row
    result (SCALE.md, export module docstring)."""
    import shutil
    import tempfile

    from mare_spark.operators.export import (
        export_training_shards,
        verify_export,
    )

    docs = read_table(spark, sf_dir, "documents")
    scratch = tempfile.mkdtemp(prefix="mare_export_q_")
    try:
        out = f"{scratch}/shards"
        export_training_shards(
            docs, out, id_col="doc_id", token_col="n_chars",
            n_shards=_N_SHARDS, keep_cols=("lang",),
        )
        manifest = verify_export(spark, out)  # files still on disk here
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    rows = [
        (s["shard"], s["rows"], s["tokens"], s["id_xor"])
        for s in manifest["shards"]
    ]
    return spark.createDataFrame(
        rows, "shard int, n_rows long, n_tokens long, id_xor long"
    )
