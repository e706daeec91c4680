"""The driver imports __spark_entry__ and relies on three functions:
entry(spark) -> DataFrame (flagship, ≥0 rows, stable schema),
queries() -> {name: fn}, oracle_sql() -> {name: sql} with oracle keys a
subset of query keys. A drift here fails the round's smoke/correctness
gates, so the contract is pinned in CI."""

from __future__ import annotations


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert [f.name for f in df.schema.fields], "stable, non-empty schema"


def test_queries_and_oracles_contract(spark):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) >= 144, len(qs)  # never silently shrink the surface
    assert set(oracles) <= set(qs)
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())
    # enumeration starts with DRIVER_PRIORITY (decides which 50 get rows)
    from mare_spark.registry import DRIVER_PRIORITY

    assert list(qs)[: len(DRIVER_PRIORITY)] == list(DRIVER_PRIORITY)
