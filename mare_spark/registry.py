"""Central query registry.

Every operator/query the engine claims in SURVEY.md §2B gets a named entry
here with (a) a PySpark builder ``fn(spark, sf_dir) -> DataFrame`` and
(b) optionally an equivalent ANSI-SQL string a DuckDB oracle can run on the
same parquet tables. The driver's correctness gate walks this registry via
``__spark_entry__.py``.

Determinism contract (shared with the oracle):
* every computed/aggregate column is aliased identically on both sides;
* float aggregates are rounded (2dp money, 4-6dp ratios) on both sides so
  summation-order differences between engines can't flip the value hash;
* result sets that are order-sensitive (top-k, limit) break ties with a
  unique key column so both engines agree on the exact row set.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL, or None → rows-only check
    category: str = "relational"
    bench: bool = False  # include in bench.py headline set
    doc: str = field(default="")


_REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    *,
    oracle: str | None,
    category: str = "relational",
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(
            name=name, fn=fn, oracle=oracle, category=category, bench=bench,
            doc=(fn.__doc__ or ""),
        )
        return fn

    return deco


# Driver-facing enumeration order. The driver's correctness gate records
# rows for the FIRST 50 registry entries (dict order), so this list decides
# which queries gain driver evidence each round.
#
# ROUND-4 ROTATION (executes the plan written here in round 3 and confirmed
# by VERDICT r3 "Next round" #2): front-load
#   1. the 21 round-3 registrations with no driver row across r1-r3
#      (every other registered query has at least one green row already);
#   2. the rows changed THIS round, which therefore need fresh evidence:
#      q_correlated_scalar (BroadcastNestedLoopJoin domain join rewritten
#      as a p_brand window — VERDICT r3 "What's wrong" #1) and
#      dedup_edit_distance (threshold-form levenshtein — both already in
#      set 1), plus any round-4 registrations (kept to a minimum per the
#      check-before-register budget rule: new names enter the first-50
#      only by displacing an already-green anchor);
#   3. high-value anchors with older green rows to fill the 50 budget —
#      cheap insurance that the decimal/oracle conventions stayed stable.
# Everything else follows in registration order. After r4 the
# never-checked backlog is exactly the set registered in r4 (rule:
# never-checked at end-of-round <= registered-this-round). All 5 round-4
# registrations sit in section 2 below, inside the first-50 window, so
# the backlog after CORRECTNESS_r04 is zero.
#
# ROUND-6 ROTATION (executes the plan written here in round 5 and
# VERDICT r5 "Next round" #1): the staleness ledger after r5 is
# 19 rows last-green in ROUND 2, 33 in round 3, 45 in round 4, 50 in
# round 5 —
#   1. queries whose operator path the round-6 diff touched:
#      corpus_epoch_shuffle (shard now derived from 60 hash bits, oracle
#      updated in lockstep), the BPE rows (learn_bpe_merges gained the
#      driver-side merge loop that corpus_bpe_segment_report executes),
#      and corpus_train_val_split (same 60-bit-prefix fix as the shuffle,
#      oracle in lockstep);
#   2. round-6 registrations (check-before-register): the capped-contract
#      simhash row (VERDICT r5 #6) and the live-streaming sessionize
#      replay (VERDICT r5 #7);
#   3. the q1/q5/pipeline anchors — convention canaries in every round;
#   4. ALL 19 round-2-stale rows (the oldest evidence in the ledger:
#      multimodal_decode, text_pii_scrub, the UDF-surface rows, the
#      r2-only TPC-H bodies), in registration order;
#   5. round-3-stale rows in registration order to fill the 50 budget,
#      with events_sessionize swapped in for q14 (its gaps-and-islands
#      construction is the oracle template the new replay row reuses —
#      refreshing both in one round pins the convention from both ends);
#      ten r3-stale fill rows (q_subquery_above_avg,
#      q_sql_returned_items, q_intersect_all, q_having, q_pivot,
#      q_join_range_band, q_join_left_outer, corpus_lang_confusion,
#      corpus_vocab_stats, sample_apply_mixture) displaced by the ten r6
#      registrations (corpus_dsir_weights, sample_dsir_gumbel,
#      multimodal_sniff_report, embedding_covariance,
#      embedding_pca_variance, text_bigram_logprob, sim_hard_negatives,
#      dedup_split_leakage, maintenance_merge_report, text_nfc_report —
#      check-before-register), q_except_all by the r6-touched
#      corpus_train_val_split, embedding_norm_stats by the 11th r6
#      registration corpus_export_shards (the export family's
#      hash-checked row — it exercises the real write path), and
#      text_rolling_fingerprint by the 12th, events_gapfill_locf
#      (time-bucket LOCF gap-fill — the new time-series family row),
#      and three more fill rows (text_tfidf_keywords,
#      corpus_length_histogram, cross_source_contamination) by the
#      session-2 r6 registrations pack_token_ids_tape (materialized
#      token-tape packing — the real dataloader artifact, arrays
#      digested to scalars for the hash gate), sample_cluster_balanced
#      (embedding-cluster-balanced diversity sampling) and
#      corpus_column_profile (ANALYZE-style stats), and a fourth —
#      sample_temperature_rates by text_intra_doc_dedup (within-doc
#      chunk dedup, the per-doc complement of the corpus scrub), and a
#      fifth — corpus_mix_report by events_quantile_sketch (the
#      mergeable bottom-k quantile tables' exact-merge property
#      hash-checked end-to-end: per-day sketches rolled up ≡ the
#      oracle's single global bottom-k) — each oracle verified at all
#      3 SFs before entering the window.
# The 28 r3-stale rows left over (sample_temperature_rates,
# corpus_mix_report, sample_apply_mixture,
# corpus_vocab_stats, corpus_lang_confusion, q_join_left_outer,
# q_join_range_band, q_having, q_pivot, q_intersect_all, q_except_all,
# q_sql_returned_items, q_subquery_above_avg, embedding_norm_stats,
# text_rolling_fingerprint, text_tfidf_keywords,
# corpus_length_histogram, cross_source_contamination, q14, q7, q11,
# q15, q19, q22, q8, events_tumbling/sliding/session_window) head the
# r7 rotation, followed by the 45 r4-stale rows in registration order.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- 1. round-6-touched operator paths --
    "corpus_epoch_shuffle", "corpus_bpe_segment_report",
    "corpus_bpe_pair_counts", "corpus_train_val_split",
    # -- 2. round-6 registrations --
    "dedup_simhash_capped", "streaming_sessionize_replay",
    "corpus_dsir_weights", "sample_dsir_gumbel",
    "multimodal_sniff_report", "embedding_covariance",
    "embedding_pca_variance", "text_bigram_logprob",
    "sim_hard_negatives", "dedup_split_leakage",
    "maintenance_merge_report", "text_nfc_report",
    "corpus_export_shards", "events_gapfill_locf",
    "pack_token_ids_tape", "sample_cluster_balanced",
    "corpus_column_profile", "text_intra_doc_dedup",
    "events_quantile_sketch",
    # -- 3. anchors --
    "q1_pricing_summary", "q5_local_supplier_volume", "pipeline_clean_corpus",
    # -- 4. all 19 round-2-stale rows (registration order) --
    "multimodal_decode", "text_repetition_stats", "text_quality_gates",
    "text_pii_scrub", "q_asof_join",
    "q_percentiles_exact", "q_percentiles_approx", "q_unpivot",
    "q_apply_in_pandas", "q_map_in_pandas", "q_udf_python_rowwise",
    "q2_cheapest_supplier_per_part", "q4_priority_with_late_items",
    "q12_priority_by_linestatus", "q13_customer_order_distribution",
    "q16_supplier_part_counts", "q18_large_orders",
    "q20_promo_volume_suppliers", "q21_sole_returning_supplier",
    # -- 5. round-3-stale rows (registration order; events_sessionize
    #       swapped in for q14 — see rotation note above) --
    "pipeline_clean_corpus_semantic",
    "text_unigram_logprob", "dedup_semantic",
    "corpus_ngram_heavy_hitters",
    "events_sessionize",
    # -- 6. the rest of the corpus follows in registration order --
)


def all_queries() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry,
    enumerated in :data:`DRIVER_PRIORITY` order (remaining queries follow in
    registration order)."""
    from mare_spark import queries  # noqa: F401  (side-effect: registration)

    ordered = {n: _REGISTRY[n] for n in DRIVER_PRIORITY if n in _REGISTRY}
    ordered.update({n: q for n, q in _REGISTRY.items() if n not in ordered})
    return ordered
