"""Relational query corpus (SURVEY.md §2B, relational family).

Each query is a thin declaration over the DataFrame API — Catalyst owns the
physical strategy (pushdown, join selection, partial aggregation, AQE). The
DuckDB oracle string in each ``register(..., oracle=...)`` is the semantic
contract, not the implementation.

Reference parity note: mcapuccini/MaRe has **no** relational surface (see
/root/reference/src/main/scala/se/uu/it/mare/MaRe.scala — its only operators
are containerized partition map/reduce + repartition). This module is the
capability-equivalent relational surface required by the engine blueprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mare_spark.registry import register
from mare_spark.tables import table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary.
# scan → filter (pushed to parquet) → hash agg (partial+final) → sort.
# At 100 TB this plan is shuffle-minimal: one exchange on the 2 low-cardinality
# group keys, partial aggregation map-side, AQE coalesces the post-shuffle
# partitions.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    bench=True,
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                        AS sum_qty,
      round(sum(l_extendedprice), 2)                                   AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
      round(avg(l_quantity), 4)                                        AS avg_qty,
      round(avg(l_extendedprice), 4)                                   AS avg_price,
      round(avg(l_discount), 6)                                        AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
