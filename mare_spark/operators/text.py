"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

Execution-tier policy (measured, not assumed):
* scalar string/regexp/length expressions are JVM codegen — true scan
  speed, and they compose with predicate pushdown (e.g.
  ``quality_stats(df).filter("quality >= 0.5")`` prunes before any
  downstream shuffle);
* higher-order array lambdas (``transform``/``filter``) are
  CodegenFallback — interpreted per row. They are kept only where the
  per-row array work is O(tokens) and bounded (stopword filters over
  ≤100-token arrays); anything heavier (rolling-hash fingerprints,
  per-doc token statistics, shingle hashing) runs as Arrow-batched
  UDFs — see ``doc_token_stats_udf`` and ``operators.dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mare_spark.operators.dedup import normalize_text, py_tokens
from mare_spark.numeric import fround

# Marker stopwords per language for the n-gram/stopword-overlap heuristic.
# Deliberately tiny: language ID at corpus scale is a scan-side heuristic,
# not a model. Deterministic and cheap beats accurate and slow for routing;
# route ambiguous docs to a real classifier downstream.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "es": ["el", "la", "de", "que", "y", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens(text_col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize_text(text_col), " ")


def token_count(text_col: Column) -> Column:
    return F.size(tokens(text_col))


def quality_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality signals + a composite score.

    Signals (all scan-side):
      * n_tokens / n_chars — length gates
      * avg_token_len — gibberish / boilerplate indicator
      * punct_ratio — non-alphanumeric density. The class is
        deliberately ASCII ([a-zA-Z0-9\s] complement): \p{L} tables can
        differ between Java regex and RE2 across Unicode versions (the
        PII module's compatibility rule), so non-Latin corpora should
        gate on the tokenizer-based signals, not punct_ratio.
      * stopword_ratio — natural-language-ness (the stopword filter is
        an interpreted higher-order lambda over the full token array;
        for Python-side hot paths prefer doc_token_stats_udf's Arrow
        pass, which computes the same count)
      * quality — weighted composite in [0, 1]; NULL for NULL text
    """
    t = tokens(F.col(text_col))
    n_tokens = F.size(t)
    n_chars = F.length(F.col(text_col))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(t, sw))  # distinct-marker hits
    stop_hits = F.size(F.filter(t, lambda w: F.array_contains(sw, w)))

    # raw ratios feed the composite; rounding happens only at output
    punct_ratio_raw = n_punct / F.greatest(n_chars, F.lit(1))
    stopword_ratio_raw = stop_hits / F.greatest(n_tokens, F.lit(1))
    punct_ratio = fround(punct_ratio_raw, 6)
    stopword_ratio = fround(stopword_ratio_raw, 6)
    avg_token_len = fround(
        (F.length(F.regexp_replace(normalize_text(F.col(text_col)), " ", "")))
        / F.greatest(n_tokens, F.lit(1)),
        6,
    )
    # composite: reward length (saturating) + stopword presence, punish punct
    length_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    quality = fround(
        F.greatest(
            F.least(
                0.5 * length_score + 0.5 * F.least(stopword_ratio_raw * 5, F.lit(1.0))
                - punct_ratio_raw,
                F.lit(1.0),
            ),
            F.lit(0.0),
        ),
        6,
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        avg_token_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        n_stop.alias("n_marker_words"),
        # least/greatest SKIP NULL operands (both engines), so without
        # the guard a NULL-text row scores a perfect 1.0 while every
        # other column is NULL — extraction failures must score NULL
        F.when(F.col(text_col).isNotNull(), quality).alias("quality"),
    )


def language_scores(text_col: Column) -> list[Column]:
    """Per-language marker-overlap scores (``score_<lang>`` aliased, in
    sorted language order) — the scan-side building block shared by
    :func:`language_id` and any composition that wants the prediction
    without a join (e.g. analysis.lang_confusion_matrix)."""
    t = tokens(text_col)
    return [
        F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in ws]))).alias(
            f"score_{lang}"
        )
        for lang, ws in sorted(LANG_MARKERS.items())
    ]


def language_pred(scores_prefix: str = "score_") -> Column:
    """Argmax language over already-bound ``score_<lang>`` columns (ties
    broken by language code order, 'und' when every score is zero)."""
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"{scores_prefix}{l}") for l in langs])
    pred = F.lit("und")
    # reversed so that earlier language codes win ties
    for l in reversed(langs):
        pred = F.when(
            (F.col(f"{scores_prefix}{l}") == best) & (best > 0), l
        ).otherwise(pred)
    # NULL scores (NULL text) -> NULL prediction: an extraction failure
    # is not an 'undetermined-language' document
    return F.when(best.isNull(), F.lit(None)).otherwise(pred)


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: distinct-marker-word overlap per language;
    highest count wins (ties broken by language code order); 'und'
    (undetermined) when nothing matches."""
    langs = sorted(LANG_MARKERS)
    scored = df.select(F.col(id_col), *language_scores(F.col(text_col)))
    return scored.select(
        id_col,
        language_pred().alias("lang_pred"),
        *[F.col(f"score_{l}") for l in langs],
    )


# BPE-ish pre-tokenization pattern: letter runs, digit runs, single
# punctuation — the coarse split a byte-pair tokenizer applies before
# merges. Kept to RE2-compatible constructs so the SQL oracle (DuckDB/RE2)
# and Spark (Java regex) agree character-for-character.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_ish_token_count(text_col: Column) -> Column:
    """Sub-word-style token count via the BPE-ish pre-tokenizer regex —
    the cheap scan-side estimator for 'how many tokens will this cost',
    within a constant factor of a real BPE tokenizer."""
    return F.size(
        F.regexp_extract_all(F.lower(text_col), F.lit(BPE_ISH_PATTERN), 0)
    )


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Both token-count tiers per document: whitespace words and BPE-ish
    sub-word pieces, plus their ratio (pieces-per-word ≈ tokenizer
    fertility — a language/quality signal)."""
    words = token_count(F.col(text_col))
    pieces = bpe_ish_token_count(F.col(text_col))
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        pieces.alias("n_bpe_ish_tokens"),
        fround(pieces / F.greatest(words, F.lit(1)), 6).alias("fertility"),
    )


def rolling_hash_fingerprint(
    df: DataFrame, text_col: str, id_col: str, window: int = 8, keep: int = 4
) -> DataFrame:
    """Winnowing-style document fingerprint: polynomial rolling hash over a
    sliding character window, keep the ``keep`` smallest hashes (a stable,
    order-insensitive content sketch robust to small edits).

    Arrow-batched pandas UDF (numpy): polynomial window hashes computed as
    ``window`` vectorized multiply-add passes over a byte sliding-window
    matrix — O(window) numpy ops per document, no per-character Python.
    Modulus 2^31-1 keeps every intermediate (< 2^39) inside uint64, so the
    whole recurrence stays in native integer arithmetic.
    """
    import numpy as np
    import pandas as pd

    # NB: this module uses `from __future__ import annotations`, which turns
    # type hints into strings that pandas_udf's signature inspector rejects —
    # set real annotations after the def instead of inline hints.
    def fingerprints(texts):
        B = np.uint64(257)
        M = np.uint64((1 << 31) - 1)
        out = []
        for t in texts:
            if t is None:
                out.append(None)  # NULL text: no fingerprint, never the
                # empty-doc [0] (which would pair failures with '' docs)
                continue
            s = t.lower()
            b = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
            if len(b) < window:
                out.append([int(b.sum()) if len(b) else 0])
                continue
            wins = np.lib.stride_tricks.sliding_window_view(b, window)
            acc = np.zeros(wins.shape[0], dtype=np.uint64)
            for j in range(window):  # Horner over the window dim: w ops total
                acc = (acc * B + wins[:, j]) % M
            picks = np.unique(acc)[:keep]  # sorted distinct, smallest first
            out.append([int(x) for x in picks])
        return pd.Series(out)

    fingerprints.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    fp_udf = F.pandas_udf(fingerprints, "array<bigint>")
    return df.select(F.col(id_col), fp_udf(F.col(text_col)).alias("fingerprint"))


def text_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document fingerprints:

    * ``fp_md5`` — order-sensitive content fingerprint (md5 of normalized
      text) for exact identity.
    * ``fp_sorted`` — bag-of-words fingerprint (md5 of the sorted distinct
      token list): invariant to word order — catches shuffled boilerplate.
    """
    t = tokens(F.col(text_col))
    # concat_ws never returns NULL (it skips NULL args), so fp_sorted of
    # a NULL doc would silently become md5('') — one phantom duplicate
    # group of every extraction failure; propagate the NULL instead
    fp_sorted = F.when(
        F.col(text_col).isNotNull(),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t)))),
    )
    return df.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("fp_md5"),
        fp_sorted.alias("fp_sorted"),
    )


def deterministic_uniform(key: Column, salt: str = "") -> Column:
    """Reproducible pseudo-uniform in [0, 1) from a key column: first 8 hex
    chars of md5 → 32-bit int → scale. Engine-portable (md5 is identical in
    DuckDB/Spark, unlike xxhash64), so sampled sets are oracle-checkable and
    stable across runs/cluster sizes — the property that matters when a
    sampling decision must be re-derivable months later at 100 TB.
    NULL keys hash to NULL and are DROPPED by every consumer's filter —
    rows that must be samplable need non-null keys."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified sampling — the training-data mixing primitive
    (per-language / per-source rates). Unlike ``df.sampleBy`` (partition-
    order-dependent RNG), membership is a pure function of the key, so the
    sample is reproducible, join-stable, and a scan-side filter: no shuffle,
    prunes before any downstream work. Strata absent from ``fractions`` are
    dropped (rate 0)."""
    u = deterministic_uniform(F.col(key_col), salt)
    rate = F.lit(0.0)
    for stratum, frac in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(frac))).otherwise(
            rate
        )
    return df.filter(u < rate)


def doc_token_stats_udf():
    """Per-document token statistics as one Arrow-batched UDF:
    ``struct<n, nd, top, nbg, nbgd, stop_hits, alpha_len>`` (token count,
    distinct tokens, max token multiplicity, bigram counts, stopword hits,
    total word chars).

    One Counter pass per document replaces the expression-code
    most-frequent-word transform, which is O(distinct x n) per row AND
    interpreted (higher-order-function lambdas are CodegenFallback).
    Tokenization mirrors normalize_text exactly (collapse whitespace,
    trim, lower, split on single space) so ratios computed from these
    counts hash-match the SQL oracles; all division and rounding stays
    JVM-side (Spark/DuckDB round half-up agree; Python's round does not).
    """
    from collections import Counter

    import pandas as pd

    stop = frozenset(STOPWORDS)

    def stats(texts):
        rows = []
        for t in texts:
            if t is None:
                # NULL text -> NULL stats (matching the expression tier's
                # tokens(NULL) -> NULL), never a phantom 1-token document
                rows.append((None,) * 7)
                continue
            ws = py_tokens(t)
            counts = Counter(ws)
            n = len(ws)
            bigrams = {(ws[i], ws[i + 1]) for i in range(n - 1)}
            rows.append(
                (
                    n,
                    len(counts),
                    max(counts.values()),
                    n - 1 if n >= 2 else 0,
                    len(bigrams),
                    sum(c for w, c in counts.items() if w in stop),
                    sum(len(w) for w in ws),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["n", "nd", "top", "nbg", "nbgd", "stop_hits", "alpha_len"],
        )

    stats.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(
        stats,
        "struct<n:int, nd:int, top:int, nbg:int, nbgd:int, "
        "stop_hits:int, alpha_len:int>",
    )


def sliding_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    window: int = 64,
    stride: int = 32,
    keep_cols: tuple[str, ...] = (),
    drop_redundant_tail: bool = False,
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/RAG preparation
    pass: each document becomes ceil(n_tokens/stride) chunks of up to
    ``window`` tokens starting every ``stride`` tokens, each carrying its
    exact tape position so retrieved chunks can be re-expanded to
    surrounding context.

    Returns ``(id, *keep_cols, chunk_idx, start_token, chunk_tokens,
    chunk_text)``; the final chunks shorten toward the document tail
    (documents are never padded).

    Tail contract: when ``window >= 2*stride`` (the defaults) the FINAL
    chunk's tokens are a strict subset of the penultimate chunk's. That
    is deliberate — a chunk at every stride-aligned start is what makes
    stride-prefix reconstruction exact (pinned by test) and keeps every
    token within ``stride`` of a chunk start for retrieval re-expansion.
    A pure RAG index that only wants distinct content can pass
    ``drop_redundant_tail=True`` to skip those subset tails
    (``max(1, ceil(max(0, n - window)/stride) + 1)`` chunks instead).

    Scale: pure scan-side expression code (sequence + slice + concat_ws)
    followed by a narrow posexplode — zero shuffles, no text ever leaves
    its partition. The fan-out is rows × ceil(n/stride), the same narrow
    flatMap shape as shingling.
    """
    if stride < 1 or window < 1:
        raise ValueError(
            f"window and stride must be >= 1, got window={window}, "
            f"stride={stride} (a zero stride would ANSI-divide-by-zero "
            "mid-job)"
        )
    w = tokens(F.col(text_col))
    n = F.size(w)
    if drop_redundant_tail:
        n_chunks = F.greatest(
            F.lit(1),
            (F.ceil(F.greatest(n - window, F.lit(0)) / F.lit(stride))
             + 1).cast("int"),
        )
    else:
        n_chunks = F.ceil(n / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * stride + 1, window)),
    )
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        "chunk_idx",
        (F.col("chunk_idx") * stride).alias("start_token"),
        F.size(F.split("chunk_text", " ")).alias("chunk_tokens"),
        "chunk_text",
    )


def normalize_nfc(
    df: DataFrame, text_col: str, out_col: str = "text_nfc"
) -> DataFrame:
    """Append the Unicode NFC normalization of a text column — the step
    that belongs BEFORE every hash-keyed operator in the engine: composed
    ("é" U+00E9) and decomposed ("e"+U+0301) spellings are visually
    identical but byte-different, so without canonical normalization
    exact dedup, digest-keyed chunk scrubbing, and md5 sampling all treat
    equal texts as distinct (pinned by test: NFC twins survive
    exact_dedup until normalized).

    Arrow-batched scan-side pass, zero shuffle. Fast path:
    ``unicodedata.is_normalized`` short-circuits already-NFC strings
    (ASCII always is) without allocating — on web corpora that is almost
    every row. Engine-parity: Python's unicodedata NFC and DuckDB's
    ``nfc_normalize`` produce identical strings (verified across scripts
    in tests), so NFC-derived digests stay oracle-checkable.
    """
    import pandas as pd

    def nfc(texts):
        import unicodedata

        def one(t):
            if t is None:
                return None
            if unicodedata.is_normalized("NFC", t):
                return t
            return unicodedata.normalize("NFC", t)

        return texts.map(one)

    nfc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return df.withColumn(out_col, F.pandas_udf(nfc, "string")(F.col(text_col)))


def hashing_embed(
    df: DataFrame,
    text_col: str,
    *,
    dim: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """Append a ``dim``-float unit vector for a text column via the
    feature-hashing trick (Weinberger et al. 2009): each whitespace
    token lands in bucket ``md5(token) mod dim`` with a ±1 sign from the
    hash's next bit, counts accumulate, and the vector is L2-normalized.
    Deterministic in the text alone — no model, no vocabulary, no fit
    pass — which is exactly what a retrieval pipeline needs for a
    model-free embedding tier (and what the RAG composition row uses to
    embed chunks and queries identically).

    Empty/whitespace-only texts get the zero vector (un-normalizable);
    NULL text propagates NULL.

    Scale: one Arrow-batched scan-side pass, zero shuffle; the per-token
    digest is the cost (cheap vs any model forward pass), and the output
    is ``dim`` doubles per row regardless of text size.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")

    def embed(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            v = np.zeros(dim, dtype=np.float64)
            for tok in t.split():
                h = hashlib.md5(tok.encode("utf-8")).digest()
                bucket = int.from_bytes(h[:8], "big") % dim
                sign = 1.0 if h[8] & 1 else -1.0
                v[bucket] += sign
            norm = np.linalg.norm(v)
            return (v / norm if norm > 0 else v).tolist()

        return texts.map(one)

    embed.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return df.withColumn(
        out_col, F.pandas_udf(embed, "array<double>")(F.col(text_col))
    )
