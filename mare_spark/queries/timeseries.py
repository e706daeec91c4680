"""Round-6: time-series regularization family — time-bucket gap-fill
with LOCF over the events table (the hypertable-style op relational
surfaces can't express in one call)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mare_spark.registry import register
from mare_spark.tables import read_table

_BUCKET_S = 21600  # 6h grid: ~67 events/user over 30 days → real gaps
_STEP_US = _BUCKET_S * 1_000_000


@register(
    "events_gapfill_locf",
    category="relational",
    oracle=f"""
    WITH obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT user_id, (epoch_us(ts) - (((epoch_us(ts) % {_STEP_US}) + {_STEP_US}) % {_STEP_US})) // {_STEP_US} AS bucket, value,
               row_number() OVER (
                 PARTITION BY user_id, (epoch_us(ts) - (((epoch_us(ts) % {_STEP_US}) + {_STEP_US}) % {_STEP_US})) // {_STEP_US}
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    led AS (
      SELECT user_id, bucket, value,
             lead(bucket) OVER (PARTITION BY user_id ORDER BY bucket)
               AS nxt
      FROM obs
    ),
    grid AS (
      SELECT user_id, bucket, value,
             unnest(generate_series(bucket, coalesce(nxt - 1, bucket)))
               AS g
      FROM led
    )
    SELECT user_id, make_timestamp(g * {_STEP_US}) AS bucket_ts, value,
           (g = bucket) AS is_observed
    FROM grid
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize every user's event stream onto a 6-hour grid,
    carrying the last observed ``value`` across empty buckets
    (``is_observed`` marks fills). In-bucket ties break by
    (ts, event_id) — a total order, so both engines agree exactly.

    Scale (operators.timeseries docstring): no dense-grid join — a
    partial WindowGroupLimit prunes to ≤1 row per (key, bucket) per
    task BEFORE the first exchange, the second exchange carries only
    observed-bucket rows, and a scan-side
    ``explode(sequence(bucket, next-1))`` emits exactly the rows each
    observation covers. Output row count is the grid, but it is
    PRODUCED distributed, never an intermediate."""
    from mare_spark.operators.timeseries import gapfill_locf

    events = read_table(spark, sf_dir, "events")
    return gapfill_locf(
        events,
        ts_col="ts",
        key_col="user_id",
        value_col="value",
        bucket_seconds=_BUCKET_S,
        tiebreak_cols=("event_id",),
    )
