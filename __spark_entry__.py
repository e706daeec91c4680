"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every declared operator/query from SURVEY.md §2B, backed by
the central registry in :mod:`mare_spark.registry`.
``oracle_sql()`` — the DuckDB-runnable oracle for each SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from mare_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mare_spark.registry import all_queries

    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from mare_spark.registry import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
