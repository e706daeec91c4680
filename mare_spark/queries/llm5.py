"""Round-4 additions: deterministic dataset splitting and the Python UDTF
surface — two pieces a production training-data pipeline needs that the
corpus didn't cover yet. Registered under the check-before-register rule:
both sit in the driver rotation's first-50, so they gain a driver
correctness row in the same round they appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mare_spark.registry import register
from mare_spark.tables import read_table


@register(
    "corpus_train_val_split",
    category="llm",
    oracle="""
    WITH b AS (
      SELECT lang,
             length(string_split(text, ' ')) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
               % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 98 THEN 'train'
                WHEN bucket = 98 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM b
    GROUP BY 1, 2
    """,
)
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split report (98/1/1 by md5 bucket).

    The split key is ``md5(doc_id) mod 100`` — content-independent,
    engine-independent (both engines emit the same lowercase hex for the
    same string), and stable across re-runs/re-partitions, which is the
    property a training split MUST have: re-materializing the corpus can
    never migrate a document across the train/eval boundary (the classic
    leakage bug with ``rand()``-based splits, whose draw depends on
    partition layout). Selecting on the hash also means adding documents
    never reshuffles existing assignments — splits only grow.

    Scale: one scan-side md5 + one keyed aggregate on (split, lang) —
    map-side partials, a 6-row-ish result. The same bucket expression,
    compared `< threshold`, is the streaming-safe sampler for any
    deterministic fraction.
    """
    d = read_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
    )
    split = (
        F.when(bucket < 98, "train").when(bucket == 98, "val").otherwise("test")
    )
    return (
        d.select(
            split.alias("split"),
            "lang",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "q_udtf_word_positions",
    category="relational",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE doc_id < 200
    )
    SELECT doc_id, CAST(i AS INT) - 1 AS pos, ws[CAST(i AS INT)] AS word
    FROM t, UNNEST(range(1, least(len(ws), 5) + 1)) AS u(i)
    """,
)
def q_udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function) via a LATERAL
    join: one input row fans out to N output rows with per-row Python
    logic — the missing piece of the UDF surface (scalar UDF / pandas_udf
    / applyInPandas / mapInPandas are all registered already). The UDTF
    emits (position, word) for each document's first five words; the
    oracle replays it with a lateral UNNEST.

    Deliberately the API-completeness tier: a Python UDTF is row-at-a-time
    (no Arrow batching), so hot paths should use posexplode/slice
    expression code — the docstring-level contract mirrored from the
    scalar-UDF family. Bounded here to 200 docs: the point is the
    surface, not throughput.
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, word string")
    class FirstWords:
        def eval(self, text: str, k: int):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")[:k]):
                yield i, w

    spark.udtf.register("first_words", FirstWords)
    read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).createOrReplaceTempView("docs_small")
    return spark.sql(
        """
        SELECT d.doc_id, f.pos, f.word
        FROM docs_small d,
             LATERAL first_words(d.text, 5) f
        """
    )
