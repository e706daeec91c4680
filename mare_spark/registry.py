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
# ROUND-5 ROTATION PLAN (execute at the start of r5): with every
# registered query holding at least one driver row after r04, the next
# priority is RE-checking staleness — front-load (a) any query whose
# round-4/5 diff touched its operator path (this round: the jaccard/
# substring/edit-distance/chunk-scrub/novelty frequency-cap consumers,
# the samplers, text_unigram_logprob, decontaminate_overlap_report —
# all already in the r4 first-50 except the samplers' older siblings),
# then (b) the queries whose only green rows date to r1-r2, oldest
# first, in registration order. Keep the q1/q5/pipeline anchors in every
# round's 50 as convention canaries.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- 1. the 21 round-3 registrations with no driver row yet --
    "dedup_crawl_vs_index", "events_user_anomalies", "text_chunk_dedup",
    "text_quality_classifier", "sample_fixed_k_per_lang",
    "sample_token_budget", "text_ngram_novelty",
    "q_correlated_exists", "q_correlated_scalar",
    "events_funnel", "events_cohort_retention",
    "text_chunk_dedup_cms", "q_variant_json",
    "embedding_cluster_assign", "embedding_kmeans_refined",
    "dedup_edit_distance", "text_sliding_chunks",
    "corpus_snapshot_diff", "corpus_quality_funnel",
    "pipeline_clean_corpus_v3", "q_asof_join_forward",
    # -- 2. round-4 registrations (check-before-register: each lands here
    #       immediately, displacing an anchor below) --
    "streaming_heavy_hitters_replay",
    "corpus_train_val_split", "q_udtf_word_positions",
    "q_join_interval_binned", "decontaminate_overlap_report",
    # -- 3. anchors + remaining budget (all green in r1-r3; re-checked as
    #       convention-stability insurance) --
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_revenue_change", "q9_product_type_profit",
    "q10_returned_item_reporting", "q17_small_quantity_revenue",
    "q_agg_stats", "q_window_running", "q_grouping_sets",
    "q_udf_grouped_agg", "q_udf_pandas_scalar",
    "q_rollup", "q_cube", "q_math_conditional",
    "pipeline_clean_corpus", "pipeline_clean_corpus_v2",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_substring_candidates", "dedup_cluster_stats",
    "sim_topk_cosine", "multimodal_frame_sample",
    "text_rolling_fingerprint", "text_tfidf_keywords",
    "decontaminate_vs_eval", "pack_training_sequences",
    # -- 4. the rest of the corpus follows in registration order --
    "events_tumbling_window", "events_session_window",
    "q_join_left_outer", "q_join_range_band", "q_having", "q_pivot",
    "q_sql_returned_items", "q_subquery_above_avg",
    "q_intersect_all", "q_except_all",
    "corpus_mix_report", "text_unigram_logprob", "sample_temperature_rates",
    "events_sessionize", "sample_apply_mixture",
    "corpus_ngram_heavy_hitters", "corpus_length_histogram",
    "corpus_vocab_stats", "corpus_lang_confusion",
    "cross_source_contamination", "embedding_norm_stats",
    "dedup_semantic", "pipeline_clean_corpus_semantic",
    "multimodal_decode", "text_repetition_stats", "text_quality_gates",
    "text_pii_scrub", "q_asof_join", "q_percentiles_exact",
    "q2_cheapest_supplier_per_part", "q4_priority_with_late_items",
    "q7_volume_between_nations", "q8_national_market_share",
    "q11_important_suppliers", "q12_priority_by_linestatus",
    "q13_customer_order_distribution", "q14_promo_revenue_share",
    "q15_top_supplier", "q16_supplier_part_counts",
    "q18_large_orders", "q19_disjunctive_brackets",
    "q20_promo_volume_suppliers", "q21_sole_returning_supplier",
    "q22_idle_wealthy_customers", "events_sliding_window",
)


def all_queries() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry,
    enumerated in :data:`DRIVER_PRIORITY` order (remaining queries follow in
    registration order)."""
    from mare_spark import queries  # noqa: F401  (side-effect: registration)

    ordered = {n: _REGISTRY[n] for n in DRIVER_PRIORITY if n in _REGISTRY}
    ordered.update({n: q for n, q in _REGISTRY.items() if n not in ordered})
    return ordered
