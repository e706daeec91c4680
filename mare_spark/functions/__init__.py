"""Column-level function library — the reusable expression builders behind
the operator modules, exposed as a flat namespace (all JVM-side expression
code unless noted)."""

from mare_spark.operators.dedup import (
    cosine_similarity,
    minhash_signature,
    normalize_text,
    simhash64,
    word_shingles,
)
from mare_spark.operators.text import token_count, tokens

__all__ = [
    "cosine_similarity",
    "minhash_signature",
    "normalize_text",
    "simhash64",
    "word_shingles",
    "token_count",
    "tokens",
]
