"""Byte-pair-encoding (BPE) subword learning and segmentation.

The tokenizer-training half of a corpus pipeline: learn a merge table
from corpus statistics, then segment documents with it. The reference
has no subword layer (its per-record logic lives in user containers,
``MaRe.scala:63-100``); this extends the engine's text-analysis family
the same way the samplers and the quality classifier do.

Scale design — the part that matters at 100 TB:

* Learning NEVER iterates over the corpus. The only corpus-scale work is
  ONE word-count aggregation (``word_counts``: explode whitespace words →
  map-side-combined groupBy). Every merge round then runs against the
  persisted ``(word, cnt, syms)`` VOCABULARY table — its row count is the
  distinct-word vocabulary (millions of rows when the corpus is 100 TB,
  i.e. 4-6 orders of magnitude smaller than the corpus) — with exactly
  one best-pair row of driver traffic per round. This is the shape
  production BPE trainers use: count words once, learn on the count
  table.
* Pair counting per round is a keyed aggregate over the vocab (map-side
  partials; the pair key space is tiny), never a window.
* Merge application rewrites the symbol arrays with an Arrow-batched
  pandas UDF — the sanctioned UDF case: greedy left-to-right pair
  rewriting is a per-row loop no built-in expresses, and Spark's
  higher-order ``aggregate``/``transform`` lambdas are CodegenFallback
  (interpreted) anyway, as the MinHash signature path documents.
* Segmentation (`bpe_segment`) is scan-side only — broadcast merge
  ranks, zero shuffle — with a per-batch word memo so each DISTINCT word
  in an Arrow batch is segmented once (Zipf makes this the dominant
  saving: the top few thousand words cover most tokens).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """``(word, cnt)`` over whitespace-split words — the single
    corpus-scale aggregation BPE learning needs (registry convention:
    single-space split, empty tokens dropped)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def char_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Adjacent character-pair frequencies across the corpus, weighted by
    word occurrence — the statistic the FIRST BPE merge maximizes, as an
    oracle-checkable standalone view (no end-of-word marker, so both
    engines replay it with plain substring arithmetic).

    Plan: word-count aggregate (the corpus-scale shuffle), then a pure
    expression-code bigram explode over the VOCAB (sequence/substring —
    codegen, no UDF) and a second tiny keyed aggregate on the pair.
    Returns ``(a, b, pair_count)``.
    """
    wc = word_counts(df, text_col)
    bigrams = F.expr(
        "CASE WHEN length(word) > 1 THEN "
        "transform(sequence(1, length(word) - 1), "
        "i -> substring(word, i, 2)) ELSE array() END"
    )
    return (
        wc.select(F.explode(bigrams).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
        .select(
            F.substring("pair", 1, 1).alias("a"),
            F.substring("pair", 2, 1).alias("b"),
            "pair_count",
        )
    )


def _merge_pair_udf(a: str, b: str):
    """Greedy left-to-right rewrite of adjacent ``(a, b)`` into ``a+b``
    over symbol arrays (``"aaa"`` with merge ``(a,a)`` → ``[aa, a]`` —
    the standard BPE convention, pinned by test)."""

    @F.pandas_udf("array<string>")
    def merge(syms: pd.Series) -> pd.Series:
        def apply(s):
            out = []
            i, n = 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(apply)

    return merge


_ADJ_PAIRS = (
    "CASE WHEN size(syms) > 1 THEN "
    "transform(sequence(1, size(syms) - 1), "
    "i -> struct(syms[i - 1] AS a, syms[i] AS b)) "
    "ELSE array() END"
)


def learn_bpe_merges(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    *,
    end_marker: str = "</w>",
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges (Sennrich-style: words split
    to characters plus a terminal ``end_marker`` symbol; each round
    merges the globally most frequent adjacent symbol pair).

    Deterministic: ties on count break lexicographically on ``(a, b)``
    — partition-layout-independent, so the learned table is reproducible
    across runs and cluster shapes (pinned against a pure-Python
    reference in tests). Stops early when no pair reaches ``min_count``.

    Each round: one keyed pair-aggregate over the persisted vocab, a
    1-row ``best pair`` fetch (the only driver traffic), and one
    Arrow-batched rewrite of the symbol arrays; the new vocab is
    persisted and the previous round's released, so lineage stays one
    round deep. The corpus itself is scanned exactly once, by
    :func:`word_counts`.
    """
    chars = F.split(F.col("word"), "")
    syms = (
        F.concat(chars, F.array(F.lit(end_marker)))
        if end_marker
        else chars
    )
    wc = (
        word_counts(df, text_col)
        .select("word", "cnt", syms.alias("syms"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(num_merges):
            best = (
                wc.select(F.explode(F.expr(_ADJ_PAIRS)).alias("p"), "cnt")
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), "a", "b")
                .limit(1)
                .collect()
            )
            if not best or best[0]["n"] < min_count:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            nxt = wc.withColumn(
                "syms", _merge_pair_udf(a, b)(F.col("syms"))
            ).persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()  # materialize before dropping the previous round
            wc.unpersist()
            wc = nxt
    finally:
        wc.unpersist()
    return merges


def _segment_word(word: str, ranks: dict[tuple[str, str], int],
                  pairs: list[tuple[str, str]], end_marker: str) -> list[str]:
    """Segment one word by repeatedly applying the LOWEST-rank adjacent
    merge present (the standard BPE inference order — merge priority is
    learning order, not left-to-right position; within one merge the
    rewrite is the same greedy left-to-right pass as training)."""
    s = list(word) + ([end_marker] if end_marker else [])
    while len(s) > 1:
        r = min(
            (ranks[(s[i], s[i + 1])]
             for i in range(len(s) - 1) if (s[i], s[i + 1]) in ranks),
            default=None,
        )
        if r is None:
            break
        a, b = pairs[r]
        out, i, n = [], 0, len(s)
        while i < n:
            if i + 1 < n and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def bpe_segment(
    df: DataFrame,
    text_col: str,
    merges: Iterable[tuple[str, str]],
    *,
    end_marker: str = "</w>",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col``: the document's BPE tokens under the learned
    ``merges`` (words segmented independently, results concatenated in
    word order).

    Scan-side only — the merge-rank table rides the UDF closure
    (broadcast with the task binary; a merge table is KBs), zero
    shuffle. A per-batch memo segments each DISTINCT word once per Arrow
    batch — under Zipf that collapses most of the work.
    """
    pairs = [tuple(p) for p in merges]
    ranks = {p: i for i, p in enumerate(pairs)}

    @F.pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def apply(t):
            if t is None:
                return None
            out: list[str] = []
            for w in t.split(" "):
                if not w:
                    continue
                if w not in memo:
                    memo[w] = _segment_word(w, ranks, pairs, end_marker)
                out.extend(memo[w])
            return out

        return texts.map(apply)

    return df.withColumn(out_col, seg(F.col(text_col)))
