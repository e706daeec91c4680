"""External-system connectors.

JDBC ships with Spark (wrapper below, parallel-read aware). Lakehouse
formats (Delta/Iceberg/Hudi) need their runtime jars on the classpath —
not present in this environment, so those connectors are import-gated
stubs that fail with an actionable message rather than a class-not-found
stack (per the engine's stub-or-gate policy for unavailable deps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """JDBC scan. Always pass the partition_column/bounds quartet for
    anything bigger than a dim table — without it the whole table streams
    through ONE task."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if None in (lower_bound, upper_bound, num_partitions):
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def _require_format(spark: SparkSession, fmt: str, package_hint: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            {
                "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
                "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
                "hudi": "org.apache.hudi.DefaultSource",
            }[fmt]
        )
    except Exception as ex:
        raise NotImplementedError(
            f"{fmt} support requires its runtime jar on the Spark classpath "
            f"(add {package_hint} via spark.jars.packages); not present in "
            "this environment"
        ) from ex


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _require_format(spark, "delta", "io.delta:delta-spark_2.13")
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    _require_format(spark, "iceberg", "org.apache.iceberg:iceberg-spark-runtime")
    return spark.read.format("iceberg").load(table)


def read_hudi(spark: SparkSession, path: str) -> DataFrame:
    _require_format(spark, "hudi", "org.apache.hudi:hudi-spark-bundle")
    return spark.read.format("hudi").load(path)
