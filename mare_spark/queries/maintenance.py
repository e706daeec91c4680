"""Round-6: driver-visible maintenance-family row — the TPC-H
refresh-stream (RF1/RF2) shape executed for real: write a base table,
MERGE a deterministic update/insert/delete batch through
``operators.scale.merge_parquet``, read the merged table back, and report
on it. The DuckDB oracle computes the expected post-merge state directly
with the MERGE algebra (base − (upd ∪ del) + upd), so the copy-on-write
implementation is hash-checked end-to-end — previously this family had
only differential pytest evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mare_spark.queries._decimal import dsum
from mare_spark.registry import register
from mare_spark.tables import read_table

# Deterministic batch, derived from the base table itself:
#   updates  : keys with o_orderkey % 10 == 3 → price + 100.00 (matched)
#   inserts  : keys with o_orderkey % 10 == 4 → NEW key -o_orderkey,
#              price + 50.00 (unmatched update rows insert)
#   deletes  : keys with o_orderkey % 10 == 7
# Report: per final-state bucket (-1 = inserted rows, else o_orderkey % 10):
# row count + decimal-summed total price.


@register(
    "maintenance_merge_report",
    category="relational",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ),
    merged AS (
      SELECT o_orderkey, o_totalprice FROM base
      WHERE o_orderkey % 10 NOT IN (3, 7)
      UNION ALL
      SELECT o_orderkey, o_totalprice + 100.00 FROM base
      WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT -o_orderkey, o_totalprice + 50.00 FROM base
      WHERE o_orderkey % 10 = 4
    )
    SELECT CAST(CASE WHEN o_orderkey < 0 THEN -1
                     ELSE o_orderkey % 10 END AS INT) AS bucket,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS total_price
    FROM merged
    GROUP BY 1
    """,
)
def maintenance_merge_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE executed for real and hash-checked: the orders
    table is materialized to a scratch parquet base, a deterministic
    update/insert/delete batch (derived from the keys, see module
    comment) is merged through ``scale.merge_parquet``, and the MERGED
    files are read back and aggregated per key bucket. The oracle never
    sees the scratch table — it computes the expected post-merge state
    straight from the MERGE algebra, so a wrong anti-join, a lost
    partition, or a half-applied swap all hash-fail.

    Money sums use the registry's DECIMAL(18,2) convention; the inserted
    rows land in bucket -1 so every batch class is visible in the
    report."""
    import shutil
    import tempfile

    from mare_spark.operators.scale import merge_parquet

    scratch = tempfile.mkdtemp(prefix="mare_merge_q_")
    try:
        path = f"{scratch}/orders"
        base = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        base.write.parquet(path)
        # derive updates/deletes from the WRITTEN scratch copy:
        # merge_parquet re-evaluates them ~5 times (validators + anti-
        # join + final write), and lazy plans over the original scan
        # would re-read the orders table each time
        base = spark.read.parquet(path)
        updates = (
            base.filter(F.col("o_orderkey") % 10 == 3)
            .withColumn("o_totalprice", F.col("o_totalprice") + 100.00)
            .unionAll(
                base.filter(F.col("o_orderkey") % 10 == 4).select(
                    (-F.col("o_orderkey")).alias("o_orderkey"),
                    "o_custkey",
                    (F.col("o_totalprice") + 50.00).alias("o_totalprice"),
                )
            )
        )
        deletes = base.filter(F.col("o_orderkey") % 10 == 7).select(
            "o_orderkey"
        )
        merge_parquet(spark, path, updates, "o_orderkey", delete_keys=deletes)
        merged = spark.read.parquet(path)
        bucket = (
            F.when(F.col("o_orderkey") < 0, F.lit(-1))
            .otherwise(F.col("o_orderkey") % 10)
            .cast("int")
        )
        out = (
            merged.groupBy(bucket.alias("bucket"))
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice").alias("total_price"),
            )
            .collect()  # materialize BEFORE the scratch dir is removed
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(
        out, "bucket int, n_orders long, total_price double"
    )
