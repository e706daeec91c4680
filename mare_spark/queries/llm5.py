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


def split_assignment(id_col: str):
    """THE deterministic 98/1/1 train/val/test assignment — 60-bit md5
    prefix mod 100 (see corpus_train_val_split's docstring for why).
    ONE definition: llm7's dedup_split_leakage audits exactly this
    assignment, so a hand-copied twin edited here but not there would
    make the leakage audit silently judge a DIFFERENT split."""
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(100),
    ).cast("int")
    return (
        F.when(bucket < 98, "train").when(bucket == 98, "val")
        .otherwise("test")
    )


def sql_split_case(id_expr: str) -> str:
    """DuckDB mirror of :func:`split_assignment` (same 60-bit prefix
    convention as the registry's other hash fragments)."""
    b = (
        f"CAST(CAST(('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), "
        "1, 15)) AS BIGINT) % 100 AS INT)"
    )
    return (
        f"CASE WHEN {b} < 98 THEN 'train' "
        f"WHEN {b} = 98 THEN 'val' ELSE 'test' END"
    )


@register(
    "corpus_train_val_split",
    category="llm",
    oracle=f"""
    WITH b AS (
      SELECT lang,
             length(string_split(text, ' ')) AS n_tokens,
             {sql_split_case("doc_id")} AS split
      FROM documents
    )
    SELECT split,
           lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM b
    GROUP BY 1, 2
    """,
)
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split report (98/1/1 by md5 bucket).

    The split key is ``md5(doc_id) mod 100`` (60-bit hash prefix — a
    16-bit prefix would give 65536 % 100 = 36 buckets one extra value, a
    measurable train-fraction skew; same fix class as epoch_shuffle r6) —
    content-independent,
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
    split = split_assignment("doc_id")
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
      WHERE doc_id < 200 AND text IS NOT NULL
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
    oracle replays it with a lateral UNNEST (NULL text excluded
    explicitly — DuckDB's least() IGNORES a NULL len(ws) rather than
    propagating it, so without the guard a NULL-text doc would emit 5
    phantom NULL-word rows the UDTF's None guard never yields).

    Deliberately the API-completeness tier: a Python UDTF is row-at-a-time
    (no Arrow batching), so hot paths should use posexplode/slice
    expression code — the docstring-level contract mirrored from the
    scalar-UDF family. Bounded here to 200 docs: the point is the
    surface, not throughput.
    """
    from pyspark.sql.functions import udtf

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


@register(
    "q_join_interval_binned",
    category="relational",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS vts
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, count(*) AS n_views
    FROM p JOIN v
      ON v.user_id = p.user_id
     AND v.vts >= p.pts - 1800000000
     AND v.vts <  p.pts
    GROUP BY 1, 2
    """,
)
def q_join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big x big interval join, executed as a KEYED join: views counted in
    each purchase's trailing 30-minute attribution window, via
    :func:`mare_spark.operators.ranges.binned_interval_join` — intervals
    explode across fixed 30-minute bins, points take their single bin,
    and the join runs as an ordinary shuffled equi-join on (bin, user)
    with the exact predicate re-checked. The same query written as a raw
    theta join would plan a per-user nested loop; binned, it passes the
    registry-wide no-cartesian audit with no allowlist entry.

    Timestamps go through ``unix_micros`` (Spark) / ``epoch_us`` (DuckDB)
    — exact integers on both engines, no sub-second truncation ambiguity
    at window boundaries. Counts are integers: trivially hash-stable.
    """
    from mare_spark.operators.ranges import binned_interval_join

    e = read_table(spark, sf_dir, "events")
    horizon_us = 1800 * 1_000_000
    # the fixture's ts is TIMESTAMP_NTZ; the session TZ is pinned UTC, so
    # the cast to (with-TZ) TIMESTAMP unix_micros requires is value-exact
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    points = e.filter(F.col("event_type") == "view").select(
        "user_id", us.alias("vts")
    )
    intervals = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id"),
        (us - F.lit(horizon_us)).alias("lo"),
        us.alias("hi"),
    )
    joined = binned_interval_join(
        points, intervals, "vts", "lo", "hi",
        bin_width=horizon_us, by="user_id",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("*").alias("n_views")
    )
