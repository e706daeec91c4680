from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mare_spark.codecs import TextFile
from mare_spark.engine import Engine
from mare_spark.sources.external import read_delta, read_jdbc
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_SMOKE)


def test_engine_sql_over_catalog(eng):
    out = eng.sql("SELECT count(*) AS n FROM lineitem").collect()
    assert out[0].n == 6000


def test_engine_table_and_register(eng):
    top = eng.table("orders").orderBy(F.desc("o_totalprice")).limit(5)
    eng.register("top_orders", top)
    assert eng.sql("SELECT count(*) AS n FROM top_orders").collect()[0].n == 5


def test_engine_pipe(eng):
    df = eng.table("region").select(F.col("r_name").alias("value"))
    out = eng.pipe(df).map(
        TextFile("/i"), TextFile("/o"), "busybox:1", "tr 'A-Z' 'a-z' < /i > /o"
    )
    vals = sorted(r.value for r in out.df.collect() if r.value)
    assert "africa" in vals


def test_engine_run_query(eng):
    df = eng.run_query("q1_pricing_summary")
    assert df.count() == 6
    assert "sum_qty" in df.columns


def test_jdbc_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError, match="requires lower_bound"):
        read_jdbc(spark, "jdbc:h2:mem:x", "t", partition_column="id")


def test_delta_stub_fails_actionably(spark):
    with pytest.raises(NotImplementedError, match="delta-spark"):
        read_delta(spark, "/tmp/nonexistent")


def test_delta_merge_stub_fails_actionably(spark):
    """merge_delta shares the readers' gate: without the Delta jar it must
    fail with the install hint before touching the table or the updates."""
    from mare_spark.sources.external import merge_delta

    df = spark.createDataFrame([(1, "a")], "id long, val string")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        merge_delta(spark, "/tmp/nonexistent", df, "id")
