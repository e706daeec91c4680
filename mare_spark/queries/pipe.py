"""Container-pipeline queries (MaRe parity family, SURVEY §2B).

These run REAL shell commands over DataFrame partitions via the subprocess
backend (``sh -c`` semantics identical to the reference's container
entrypoint, DockerHelper.scala:104) and are cross-checked against pure-SQL
oracles — a differential test between the pipe paradigm and the relational
paradigm on the same data (the reference's own test methodology,
MaReTest.scala:19-26,60-62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mare_spark.codecs import TextFile
from mare_spark.dataset import MaRe
from mare_spark.registry import register
from mare_spark.tables import read_table


@register(
    "pipe_gc_count",
    category="pipe",
    bench=True,
    oracle="""
    SELECT CAST(sum(length(text) - length(regexp_replace(text, '[gc]', '', 'g')))
           AS BIGINT) AS gc_total
    FROM documents WHERE text IS NOT NULL
    -- NULL text excluded in lockstep with the pipe side: the TextFile
    -- codec rejects NULL records by contract (r8 review)
    """,
)
def pipe_gc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GC-count via containerized map + tree reduce — the reference's
    flagship pipeline (MaReTest.scala:35-66) re-targeted at the documents
    table: count 'g'/'c' characters per partition with awk, tree-reduce the
    partials by summing."""
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())  # TextFile rejects NULL records
        .select(F.col("text").alias("value"))
    )
    result = (
        MaRe(docs)
        .repartition(5)
        .map(
            input_mount=TextFile("/dna"),
            output_mount=TextFile("/count"),
            image="busybox:1",
            command="awk '{ n += gsub(/[gc]/, \"\") } END { print n+0 }' /dna > /count",
        )
        .reduce(
            input_mount=TextFile("/counts"),
            output_mount=TextFile("/sum"),
            image="busybox:1",
            command="awk '{ s += $1 } END { print s+0 }' /counts > /sum",
            depth=2,
        )
    )
    return result.df.select(F.col("value").cast("bigint").alias("gc_total"))


@register(
    "pipe_map_upper",
    category="pipe",
    oracle="""
    SELECT translate(text, 'abcdefghijklmnopqrstuvwxyz',
                           'ABCDEFGHIJKLMNOPQRSTUVWXYZ') AS value
    FROM documents
    WHERE text IS NOT NULL AND text <> '' AND NOT contains(text, chr(10))
    -- the oracle models what `tr '[:lower:]' '[:upper:]'` DOES, not what
    -- SQL upper() does: tr is byte-wise ASCII in the C locale (a Unicode
    -- 'e-acute' passes through unchanged where upper() would uppercase
    -- it) — translate() is the exact mirror. The WHERE pins the codec's
    -- record domain: NULL records are rejected by TextFile, embedded
    -- newlines would split one document into several records, and a
    -- trailing empty record is dropped by the Java-split read rule
    -- (r8 review — all three were fixture-lucky before)
    """,
)
def pipe_map_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only pipe: uppercase every record with ``tr`` — byte-wise ASCII
    in the C locale, which the oracle mirrors with translate() rather than
    the Unicode-aware upper(). Input is pinned to the TextFile codec's
    record domain (non-NULL, newline-free, non-empty) on BOTH sides."""
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & (F.col("text") != "")
            & ~F.col("text").contains("\n")
        )
        .select(F.col("text").alias("value"))
    )
    return (
        MaRe(docs)
        .repartition(4)
        .map(
            input_mount=TextFile("/in"),
            output_mount=TextFile("/out"),
            image="busybox:1",
            command="tr '[:lower:]' '[:upper:]' < /in > /out",
        )
        .df
    )


@register(
    "pipe_token_total",
    category="pipe",
    oracle="""
    SELECT CAST(sum(CASE WHEN t = '' THEN 0
                     ELSE len(regexp_split_to_array(t, '[ \t\n]+'))
                END) AS BIGINT)
           AS token_total
    FROM (
      SELECT regexp_replace(text, '^[ \t\n]+|[ \t\n]+$', '', 'g') AS t
      FROM documents WHERE text IS NOT NULL
    )
    -- awk NF semantics, mirrored exactly (r8 review): fields split on
    -- runs of BLANKS (space/tab; newlines are record boundaries, which
    -- sum out identically for a total) — plain trim() strips spaces
    -- only, so a leading tab would mint a phantom '' field here; an
    -- empty/whitespace-only record is 0 tokens; NULL text is excluded
    -- in lockstep with the codec's NULL rejection
    """,
)
def pipe_token_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token total via awk NF + tree reduce (associative sum)."""
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())  # TextFile rejects NULL records
        .select(F.col("text").alias("value"))
    )
    result = (
        MaRe(docs)
        .repartition(5)
        .map(
            input_mount=TextFile("/in"),
            output_mount=TextFile("/out"),
            image="busybox:1",
            command="awk '{ s += NF } END { print s+0 }' /in > /out",
        )
        .reduce(
            input_mount=TextFile("/in"),
            output_mount=TextFile("/out"),
            image="busybox:1",
            command="awk '{ s += $1 } END { print s+0 }' /in > /out",
            depth=3,
        )
    )
    return result.df.select(F.col("value").cast("bigint").alias("token_total"))
