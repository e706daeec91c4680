"""Scale-hardening operators: skew-salted joins and bucketed co-located
joins — the two manual levers left when AQE's automatic skew handling and
broadcast selection aren't enough.

* :func:`salted_join` — explode a hot build-side key into ``salt`` copies
  and scatter the probe side across them: the classic fix when ONE key
  carries a double-digit share of the rows and even AQE's skew-split leaves
  a straggler task.
* :func:`bucketed_table` / :func:`join_bucketed` — persist both sides
  bucketed by the join key so repeated joins are exchange-free (the
  Spark-managed-table equivalent of co-partitioning; at 100 TB this converts
  every nightly fact-fact join from two full shuffles to zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with salting: the left (large, skewed) side gets
    a random salt in [0, salt); the right side is replicated ``salt`` times.
    Correct for inner/left joins on a many-to-one relationship (right side
    unique per key — replication cannot duplicate matches within a salt).

    Use when one key's row share makes a single reducer the critical path;
    the hot key's rows spread over ``salt`` tasks at the cost of replicating
    the (small) right side ``salt`` times.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right side must stay unique per key+salt)")
    l_salted = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, [key, "_salt"], how)
    return out.drop("_salt")


def bucketed_table(
    df: DataFrame,
    name: str,
    key: str,
    num_buckets: int = 8,
    sorted_by: str | None = None,
) -> DataFrame:
    """Persist ``df`` as a Spark-managed table bucketed (and optionally
    sorted) by ``key``; returns the re-read table. Joins/aggregations on
    ``key`` between tables bucketed the same way require NO exchange."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sorted_by:
        writer = writer.sortBy(sorted_by)
    writer.saveAsTable(name)
    return df.sparkSession.table(name)


def join_bucketed(spark: SparkSession, left_name: str, right_name: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (exchange-free)."""
    return spark.table(left_name).join(spark.table(right_name), key)
