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
# ROUND-5 ROTATION (executes the plan written here in round 4): after
# r04 every registered query has at least one driver row, so the budget
# shifts to RE-checking staleness —
#   1. queries whose operator path the round-5 diff touched and which
#      therefore need fresh evidence: the LSH-family bucket_cap became
#      opt-in (ADVICE r4) with the scale-facing entries now passing the
#      cap explicitly (dedup_minhash_lsh, dedup_crawl_vs_index) and
#      dedup_simhash reverting to uncapped pigeonhole completeness;
#   2. the q1/q5/pipeline anchors — convention canaries in every round;
#   3. the 30 remaining queries whose only green rows date to ROUND 1,
#      in registration order;
#   4. round-2-stale queries whose operator families saw round-4 edits
#      (decontaminate drop-set pin; grouped-map cost-model pass), then
#      the oldest-registered round-2-stale scalar/UDF rows to fill 50.
#   5. round-5 registrations (check-before-register: each lands inside
#      the first-50 immediately, displacing the tail of section 4, so
#      the never-checked backlog stays 0 at end of round).
# The ~16 remaining r2-stale rows (multimodal_decode, text_pii_scrub,
# q_asof_join, the r2-only TPC-H bodies, ...) head the r6 rotation.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- 1. round-5-touched operator paths --
    "dedup_minhash_lsh", "dedup_crawl_vs_index", "dedup_simhash",
    # -- 2. anchors --
    "q1_pricing_summary", "q5_local_supplier_volume", "pipeline_clean_corpus",
    # -- 3. last green row dates to round 1 (registration order) --
    "dedup_embedding_cosine", "dedup_clusters_resolve", "dedup_embedding_lsh",
    "sim_filtered_topk", "sim_ann_lsh", "sim_ann_ivf",
    "text_quality_stats", "text_lang_id", "text_fingerprint",
    "text_token_stats", "sample_stratified_by_lang",
    "pipe_gc_count", "pipe_map_upper", "pipe_token_total",
    "q_join_right_outer", "q_join_full_outer", "q_join_left_semi",
    "q_join_left_anti", "q_join_cross",
    "q_agg_count_distinct", "q_agg_approx_distinct",
    "q_window_rank", "q_window_topk_per_group", "q_window_lag_lead",
    "q_window_range_frame", "q_window_ntile_first_last",
    "q_orderby_limit", "q_sort_nulls_last",
    "q_union_all", "q_union_distinct",
    # -- 4. round-2-stale: r4-touched families first, then oldest funcs --
    "decontaminate_vs_eval", "pack_training_sequences",
    "q_intersect", "q_except", "q_filter_predicates",
    "q_string_funcs", "q_date_funcs", "q_array_funcs",
    "q_explode_word_count", "q_json_funcs", "q_from_json_map",
    # -- 5. round-5 registrations (check-before-register: in the first-50
    #       immediately; q_percentiles_approx/q_unpivot/q_apply_in_pandas
    #       displaced from section 4 into the r6 head below) --
    "corpus_bpe_pair_counts", "corpus_bpe_segment_report",
    "corpus_epoch_shuffle",
    # -- 6. remaining r2-stale rows: the head of the r6 rotation --
    "q_percentiles_approx", "q_unpivot", "q_apply_in_pandas",
    "q_map_in_pandas", "q_udf_python_rowwise",
    "multimodal_decode", "text_repetition_stats", "text_quality_gates",
    "text_pii_scrub", "q_asof_join", "q_percentiles_exact",
    "q2_cheapest_supplier_per_part", "q4_priority_with_late_items",
    "q12_priority_by_linestatus", "q13_customer_order_distribution",
    "q16_supplier_part_counts", "q18_large_orders",
    "q20_promo_volume_suppliers", "q21_sole_returning_supplier",
    # -- 7. the rest of the corpus follows in registration order --
)


def all_queries() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry,
    enumerated in :data:`DRIVER_PRIORITY` order (remaining queries follow in
    registration order)."""
    from mare_spark import queries  # noqa: F401  (side-effect: registration)

    ordered = {n: _REGISTRY[n] for n in DRIVER_PRIORITY if n in _REGISTRY}
    ordered.update({n: q for n, q in _REGISTRY.items() if n not in ordered})
    return ordered
