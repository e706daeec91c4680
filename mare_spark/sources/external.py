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


def merge_delta(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    *,
    partition_col: str | None = None,
    delete_keys: DataFrame | None = None,
) -> None:
    """Lakehouse MERGE against a Delta table — the "graduate to a table
    format" path that :func:`mare_spark.operators.scale.merge_parquet`'s
    docstring points frequent fine-grained merges at, demonstrated rather
    than just asserted.

    Semantics are pinned to the copy-on-write twins: row identity is
    ``key`` (or the composite ``(key, partition_col)`` when
    ``partition_col`` is given, exactly like
    :func:`~mare_spark.operators.scale.merge_parquet_partitioned`);
    matched keys take the update row, unmatched update rows insert,
    ``delete_keys`` rows are removed — and a key in BOTH updates and
    delete_keys is a defined CONFLICT that aborts before any write,
    exactly as the parquet twins' ``_check_merge_inputs`` rules (the
    same validator runs here, so NULL identities and duplicate update
    keys abort with the same contract — messages prefixed
    ``merge_delta:`` — and the two tiers stay semantically pinned;
    Delta would also raise on multi-match natively, but only
    mid-commit).

    Scale: with ``partition_col`` in the merge condition Delta prunes the
    scan to the touched partitions and rewrites only the files containing
    matches — finer than the parquet twin's partition-granularity rewrite
    — with a real commit log underneath (snapshot isolation, no
    swap-visibility gap). Requires the delta-spark Python package AND the
    Delta jar on the session classpath with the Delta SQL extension
    configured; gated like the readers (tests/test_delta_merge.py runs
    the merge matrix when present, skips cleanly otherwise).
    """
    _require_format(spark, "delta", "io.delta:delta-spark_2.13")
    try:
        from delta.tables import DeltaTable
    except ImportError as ex:  # jar present but python bindings missing
        raise NotImplementedError(
            "delta MERGE requires the delta-spark python package "
            "(pip install delta-spark) in addition to the runtime jar"
        ) from ex
    from mare_spark.operators.scale import _check_merge_inputs

    ident = [key] + ([partition_col] if partition_col else [])
    _check_merge_inputs(updates, ident, delete_keys, op="merge_delta")
    on = " AND ".join(f"base.{c} = u.{c}" for c in ident)
    tbl = DeltaTable.forPath(spark, path)
    if delete_keys is not None:
        don = " AND ".join(f"base.{c} = d.{c}" for c in ident)
        tbl.alias("base").merge(
            delete_keys.alias("d"), don
        ).whenMatchedDelete().execute()
    tbl.alias("base").merge(
        updates.alias("u"), on
    ).whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    _require_format(spark, "iceberg", "org.apache.iceberg:iceberg-spark-runtime")
    return spark.read.format("iceberg").load(table)


def read_hudi(spark: SparkSession, path: str) -> DataFrame:
    _require_format(spark, "hudi", "org.apache.hudi:hudi-spark-bundle")
    return spark.read.format("hudi").load(path)
