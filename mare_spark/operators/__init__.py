"""LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal) — the scale-path extensions beyond the reference's surface."""

from mare_spark.operators.dedup import (
    exact_dedup,
    embedding_cosine_pairs,
    minhash_lsh_join,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from mare_spark.operators.analysis import (
    cross_source_overlap,
    dedup_cluster_stats,
    embedding_norm_stats,
    lang_confusion_matrix,
    length_histogram,
    ngram_heavy_hitters,
    tfidf_keywords,
    vocab_stats,
)
from mare_spark.operators.asof import asof_join, asof_join_pandas
from mare_spark.operators.bpe import (
    bpe_segment,
    char_pair_counts,
    learn_bpe_merges,
)
from mare_spark.operators.corpus import epoch_shuffle
from mare_spark.operators.dsir import (
    dsir_importance_weights,
    dsir_logratios,
)
from mare_spark.operators.export import (
    export_training_shards,
    read_training_shards,
    refresh_training_shards,
    verify_export,
)
from mare_spark.operators.timeseries import gapfill_locf
from mare_spark.operators.scale import bucketed_table, join_bucketed, salted_join
from mare_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    embedding_lsh_pairs,
)
from mare_spark.operators.text import (
    language_id,
    quality_stats,
    text_fingerprint,
)

__all__ = [
    "exact_dedup",
    "embedding_cosine_pairs",
    "embedding_lsh_pairs",
    "minhash_lsh_join",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "ann_lsh_topk",
    "brute_force_topk",
    "asof_join",
    "asof_join_pandas",
    "bpe_segment",
    "char_pair_counts",
    "learn_bpe_merges",
    "epoch_shuffle",
    "dsir_logratios",
    "dsir_importance_weights",
    "export_training_shards",
    "read_training_shards",
    "refresh_training_shards",
    "verify_export",
    "gapfill_locf",
    "salted_join",
    "bucketed_table",
    "join_bucketed",
    "language_id",
    "quality_stats",
    "text_fingerprint",
    "ngram_heavy_hitters",
    "tfidf_keywords",
    "length_histogram",
    "dedup_cluster_stats",
    "cross_source_overlap",
    "embedding_norm_stats",
    "vocab_stats",
    "lang_confusion_matrix",
]
