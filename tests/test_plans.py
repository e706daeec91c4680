"""Physical-plan assertions: the 100 TB posture, checked in CI rather than
eyeballed. A plan regression (lost pushdown, broadcast flipping to shuffle,
global sort sneaking in) fails here before it costs anything at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from mare_spark import plans as P
from mare_spark.queries.relational import (
    q1_pricing_summary,
    q5_local_supplier_volume,
    q_orderby_limit,
)
from mare_spark.tables import read_table
from tests.conftest import SF_ORACLE


def test_q1_filter_pushed_to_scan(spark):
    df = q1_pricing_summary(spark, SF_ORACLE)
    assert P.has_pushed_filter(df, "l_shipdate"), P.formatted_plan(df)


def test_q1_column_pruning(spark):
    df = q1_pricing_summary(spark, SF_ORACLE)
    (cols,) = P.read_schema_columns(df)
    # 7 referenced columns, not all 11
    assert set(cols) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }, cols


def test_q5_broadcasts_fixed_dims(spark):
    df = q5_local_supplier_volume(spark, SF_ORACLE)
    # nation + region are broadcast (hinted); supplier is small enough that
    # Catalyst broadcasts it too — at minimum the two hinted ones are there.
    assert P.count_broadcast_joins(df) >= 2, P.formatted_plan(df)


def test_orderby_limit_is_take_ordered_not_global_sort(spark):
    df = q_orderby_limit(spark, SF_ORACLE)
    assert P.uses_take_ordered(df), P.formatted_plan(df)


def test_scan_side_filter_keeps_codegen(spark):
    li = read_table(spark, SF_ORACLE, "lineitem").filter(F.col("l_quantity") > 30)
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert P.has_whole_stage_codegen(agg)


def test_projection_prunes_scan(spark):
    li = read_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
    (cols,) = P.read_schema_columns(li)
    assert set(cols) == {"l_orderkey", "l_quantity"}
