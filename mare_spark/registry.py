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


# Driver-facing enumeration order. The round-1 correctness gate recorded
# rows for exactly the FIRST 50 registry entries (dict order), leaving 43
# queries with no driver-side check. This list front-loads, deterministically:
#
# ROUND-3 ROTATION NOTE: once CORRECTNESS_r02 lands, front-load whatever the
# r2 gate did NOT reach — expected: corpus_mix_report, text_unigram_logprob,
# sample_temperature_rates, events_sessionize, multimodal_frame_sample,
# q_intersect_all, q_except_all, dedup_substring_candidates, dedup_semantic
# (rows-only) — plus any r2 row that erred; drop the re-confirmed anchors.
#   1. the 43 queries with no CORRECTNESS_r01 row (one representative per
#      SURVEY §2 family first — streaming, as-of, percentiles, UDF surface,
#      scalar fns, set ops — then TPC-H Q2–Q22), so they gain rows in r2;
#   2. the 2 queries repaired this round (array-output harness errs in r1);
#   3. high-value round-1-green representatives (already evidenced in
#      CORRECTNESS_r01.json) to fill any remaining checked-query budget.
# Everything else follows in registration order — across rounds 1+2 every
# registered query then has at least one driver correctness row.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- §2 families never checked in r1 --
    "events_tumbling_window", "events_sliding_window", "events_session_window",
    "q_asof_join",
    "q_percentiles_exact", "q_percentiles_approx",
    "q_udf_pandas_scalar", "q_udf_grouped_agg", "q_apply_in_pandas",
    "q_map_in_pandas", "q_udf_python_rowwise",
    "q_filter_predicates", "q_string_funcs", "q_date_funcs",
    "q_math_conditional", "q_array_funcs", "q_explode_word_count",
    "q_json_funcs", "q_from_json_map",
    "q_sql_returned_items", "q_subquery_above_avg",
    "q_intersect", "q_except", "q_unpivot",
    # -- TPC-H body never checked in r1 --
    "q2_cheapest_supplier_per_part", "q4_priority_with_late_items",
    "q6_revenue_change", "q7_volume_between_nations",
    "q8_national_market_share", "q9_product_type_profit",
    "q10_returned_item_reporting", "q11_important_suppliers",
    "q12_priority_by_linestatus", "q13_customer_order_distribution",
    "q14_promo_revenue_share", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_disjunctive_brackets",
    "q20_promo_volume_suppliers", "q21_sole_returning_supplier",
    "q22_idle_wealthy_customers",
    # -- repaired this round (array-typed outputs ERR'd the r1 harness) --
    "text_rolling_fingerprint", "multimodal_decode",
    # -- new corpus-preparation family (round 2) --
    "text_repetition_stats", "text_quality_gates", "decontaminate_vs_eval",
    "pack_training_sequences", "text_pii_scrub",
    # -- r1-green anchors + round-2 additions past the r1 check budget --
    "corpus_mix_report",
    "q1_pricing_summary", "dedup_exact", "dedup_ngram_jaccard",
    "pipeline_clean_corpus", "sim_topk_cosine",
)


def all_queries() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry,
    enumerated in :data:`DRIVER_PRIORITY` order (remaining queries follow in
    registration order)."""
    from mare_spark import queries  # noqa: F401  (side-effect: registration)

    ordered = {n: _REGISTRY[n] for n in DRIVER_PRIORITY if n in _REGISTRY}
    ordered.update({n: q for n, q in _REGISTRY.items() if n not in ordered})
    return ordered
