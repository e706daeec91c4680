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


def all_queries() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry."""
    from mare_spark import queries  # noqa: F401  (side-effect: registration)

    return dict(_REGISTRY)
