"""Fixture-table loader + temp-view registry.

The driver's parquet tables (see TESTDATA.md / FIXTURES.md) are the engine's
relational test corpus. ``load_tables`` reads each table lazily (parquet scan
with full Catalyst pushdown) and registers a temp view so the SQL entry point
(`mare_spark.sql`) sees the same catalog as the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Note on fixed-size dims: region (5 rows) and nation (25 rows) never grow
# with SF, so joins against them should be broadcast-hash joins at any
# scale. That is enforced where it matters — explicit F.broadcast() hints
# at the query call sites, pinned by plan tests — not by a registry here.


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with schema normalization.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects. The session sets
    ``spark.sql.legacy.parquet.nanosAsLong=true`` so the column arrives as
    nanosecond longs; we convert to a microsecond TimestampType here with
    exact integer division (``ts div 1000`` — `/` would round-trip through
    double and lose precision on int64 nanos).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Defensive session configuration: every registered query funnels
    # through here, and the harness that invokes queries() may have built
    # its own SparkSession without mare_spark.session's settings. Both
    # confs are runtime-settable and correctness-critical:
    # * nanosAsLong — events.parquet is TIMESTAMP(NANOS); without it the
    #   scan throws PARQUET_TYPE_ILLEGAL.
    # * UTC session TZ — non-UTC sessions shift every timestamp column
    #   relative to the (naive-UTC) DuckDB oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # FLOOR division, not bare `div`: div truncates toward zero, so a
        # pre-epoch nano value like -1500 ns would land at -1 µs while the
        # true instant floors to -2 µs — the value a nanos-native oracle
        # reads (the pre-epoch parity class; r8 review). `/` is out
        # entirely (double round-trip loses int64 precision).
        micros = F.expr(
            "ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"
        )
        df = df.withColumn("ts", F.timestamp_micros(micros))
    return df


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = True) -> dict[str, DataFrame]:
    """Load every fixture table from ``sf_dir``; optionally register temp views."""
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = read_table(spark, sf_dir, name)
        tables[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return tables
