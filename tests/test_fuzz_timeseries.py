"""Seed-pinned adversarial differential fuzz of the time-series and
range operators' guard class vs DuckDB (VERDICT r8 item: the r8 guard
commits shipped without running their own tests — this file makes that
failure mode mechanical to catch).

Each seed draws a spec that MUTATES the events fixture with the exact
adversarial inputs the guards exist for — NULL timestamps, pre-epoch
shifts, NULL points/bounds, reversed intervals — with the identical
mutation expressed in both engines (single IEEE ops on parquet values,
so no rounding convention is needed). Differential runs pin the drop /
never-match contracts; separate cases pin that the far-future sentinel
and the over-wide interval RAISE with their documented messages instead
of exploding.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mare_spark.operators.ranges import binned_interval_join
from mare_spark.operators.timeseries import gapfill_locf
from mare_spark.tables import read_table
from tests.conftest import SF_SMOKE
from tests.oracle import compare

_US = "unix_micros(cast(ts as timestamp))"
# 100 years in micros — far enough pre-epoch to cross every floor edge
_PRE_SHIFT_US = 100 * 365 * 86_400 * 1_000_000
# the natural worst per-user gap at 60s buckets is ~4.6k, so the
# differential specs raise the guard ceiling explicitly; the DEFAULT
# ceiling is exercised by the sentinel raise test below
_NO_GUARD = 10_000_000


def _gap_spec(seed: int) -> dict:
    rng = random.Random(seed * 6271 + 29)
    return {
        "step_s": rng.choice([60, 3600, 21600]),
        "null_below": rng.choice([None, 5.0, 30.0]),
        "preepoch_mod": rng.choice([None, 7, 3]),
        "mode": rng.choice(["locf", "interpolate"]),
    }


def _mutated_events(spark, spec):
    e = read_table(spark, SF_SMOKE, "events")
    us = F.expr(_US)
    if spec["preepoch_mod"] is not None:
        us = F.when(
            F.col("user_id") % spec["preepoch_mod"] == 0,
            us - F.lit(_PRE_SHIFT_US),
        ).otherwise(us)
    ts = F.timestamp_micros(us)
    if spec["null_below"] is not None:
        ts = F.when(F.col("value") < spec["null_below"], F.lit(None)).otherwise(ts)
    return e.select("event_id", "user_id", "value", ts.alias("ts"))


def _mutated_tus_sql(spec) -> str:
    tus = "epoch_us(ts)"
    if spec["preepoch_mod"] is not None:
        tus = (
            f"CASE WHEN user_id % {spec['preepoch_mod']} = 0 "
            f"THEN epoch_us(ts) - {_PRE_SHIFT_US} ELSE epoch_us(ts) END"
        )
    if spec["null_below"] is not None:
        tus = f"CASE WHEN value < {spec['null_below']!r} THEN NULL ELSE {tus} END"
    return tus


def _gap_sql(spec) -> str:
    step = spec["step_s"] * 1_000_000
    floor_b = f"(tus - (((tus % {step}) + {step}) % {step})) // {step}"
    if spec["mode"] == "locf":
        val = "value"
    else:
        # identical IEEE op order as the operator's interpolate branch
        val = (
            "CASE WHEN nxt IS NULL OR g = bucket THEN value "
            "ELSE value + (nval - value) * "
            "(CAST(g - bucket AS DOUBLE) / CAST(nxt - bucket AS DOUBLE)) END"
        )
    return f"""
    WITH src AS (
      SELECT event_id, user_id, value, {_mutated_tus_sql(spec)} AS tus
      FROM events
    ),
    obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT user_id, {floor_b} AS bucket, value,
               row_number() OVER (PARTITION BY user_id, {floor_b}
                                  ORDER BY tus DESC, event_id DESC) AS rn
        FROM src WHERE tus IS NOT NULL
      ) WHERE rn = 1
    ),
    led AS (
      SELECT user_id, bucket, value,
             lead(bucket) OVER (PARTITION BY user_id ORDER BY bucket) AS nxt,
             lead(value) OVER (PARTITION BY user_id ORDER BY bucket) AS nval
      FROM obs
    ),
    grid AS (
      SELECT user_id, bucket, value, nxt, nval,
             unnest(generate_series(bucket, coalesce(nxt - 1, bucket))) AS g
      FROM led
    )
    SELECT user_id, make_timestamp(g * {step}) AS bucket_ts, {val} AS value,
           (g = bucket) AS is_observed
    FROM grid
    """


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_gapfill_vs_duckdb(spark, seed):
    spec = _gap_spec(seed)
    got = gapfill_locf(
        _mutated_events(spark, spec),
        ts_col="ts", key_col="user_id", value_col="value",
        bucket_seconds=spec["step_s"], tiebreak_cols=("event_id",),
        mode=spec["mode"], max_fill_buckets=_NO_GUARD,
    )
    compare(got, _gap_sql(spec), SF_SMOKE)


def test_fuzz_gapfill_specs_cover_dimensions():
    """The pinned seeds must actually cross the spec space."""
    specs = [_gap_spec(s) for s in range(10)]
    assert any(s["null_below"] is not None for s in specs)
    assert any(s["preepoch_mod"] is not None for s in specs)
    assert any(
        s["null_below"] is not None and s["preepoch_mod"] is not None
        for s in specs
    )
    assert {s["mode"] for s in specs} == {"locf", "interpolate"}
    assert len({s["step_s"] for s in specs}) >= 2


def test_gapfill_far_future_sentinel_raises_not_explodes(spark):
    """One corrupt far-future timestamp must be a loud ERROR under the
    default guard ceiling — never a silent multi-million-row explode —
    and the message must carry the offending gap width. NULL timestamps
    elsewhere in the frame must not change that (the r8 regression:
    NULL buckets took the raise branch with the misleading message)."""
    e = read_table(spark, SF_SMOKE, "events")
    ten_years_us = 10 * 365 * 86_400 * 1_000_000
    us = F.expr(_US)
    mutated = F.when(
        F.col("event_id") % 997 == 0, F.timestamp_micros(us + ten_years_us)
    ).when(F.col("value") < 5.0, F.lit(None)).otherwise(
        F.timestamp_micros(us)
    )
    df = e.select("event_id", "user_id", "value", mutated.alias("ts"))
    bad = gapfill_locf(
        df, ts_col="ts", key_col="user_id", value_col="value",
        bucket_seconds=60, tiebreak_cols=("event_id",),
    )
    with pytest.raises(Exception, match=r"gapfill_locf: a gap spans \d+"):
        bad.collect()


# --- binned interval join --------------------------------------------------


def _bin_spec(seed: int) -> dict:
    rng = random.Random(seed * 4099 + 71)
    return {
        "m": rng.choice([1, 4, 20]),
        "bin_width": rng.choice([1.0, 7.5, 50.0]),
        "width": rng.choice([5.0, 40.0]),
        "null_point_below": rng.choice([None, 20.0]),
        "null_lo_mod": rng.choice([None, 13]),
        "reversed_mod": rng.choice([None, 11]),
    }


def _bin_frames(spark, spec):
    e = read_table(spark, SF_SMOKE, "events")
    p = F.col("value")
    if spec["null_point_below"] is not None:
        p = F.when(
            F.col("value") < spec["null_point_below"], F.lit(None)
        ).otherwise(p)
    points = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("p_id"),
        (F.col("user_id") % spec["m"]).alias("k"),
        p.alias("p"),
    )
    lo = F.col("value") * F.lit(3.0)
    if spec["null_lo_mod"] is not None:
        lo = F.when(
            F.col("event_id") % spec["null_lo_mod"] == 0, F.lit(None)
        ).otherwise(lo)
    hi = F.col("value") * F.lit(3.0) + F.lit(spec["width"])
    if spec["reversed_mod"] is not None:
        hi = F.when(
            F.col("user_id") % spec["reversed_mod"] == 0,
            F.col("value") * F.lit(3.0) - F.lit(1.0),
        ).otherwise(hi)
    intervals = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("i_id"),
        (F.col("user_id") % spec["m"]).alias("k"),
        lo.alias("lo"),
        hi.alias("hi"),
    )
    return points, intervals


def _bin_sql(spec) -> str:
    p = "value"
    if spec["null_point_below"] is not None:
        p = f"CASE WHEN value < {spec['null_point_below']!r} THEN NULL ELSE value END"
    lo = "value * 3.0"
    if spec["null_lo_mod"] is not None:
        lo = (
            f"CASE WHEN event_id % {spec['null_lo_mod']} = 0 THEN NULL "
            f"ELSE value * 3.0 END"
        )
    hi = f"value * 3.0 + {spec['width']!r}"
    if spec["reversed_mod"] is not None:
        hi = (
            f"CASE WHEN user_id % {spec['reversed_mod']} = 0 "
            f"THEN value * 3.0 - 1.0 ELSE {hi} END"
        )
    return f"""
    WITH p AS (
      SELECT event_id AS p_id, user_id % {spec['m']} AS k, {p} AS p
      FROM events WHERE event_type = 'click'
    ),
    i AS (
      SELECT event_id AS i_id, user_id % {spec['m']} AS k,
             {lo} AS lo, {hi} AS hi
      FROM events WHERE event_type = 'view'
    )
    SELECT p.p_id, p.k, p.p, i.i_id, i.lo, i.hi
    FROM p JOIN i ON p.k = i.k AND i.lo <= p.p AND p.p < i.hi
    """


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_binned_interval_join_vs_duckdb(spark, seed):
    spec = _bin_spec(seed)
    points, intervals = _bin_frames(spark, spec)
    got = binned_interval_join(
        points, intervals, "p", "lo", "hi",
        bin_width=spec["bin_width"], by="k",
    ).select("p_id", "k", "p", "i_id", "lo", "hi")
    compare(got, _bin_sql(spec), SF_SMOKE)


def test_fuzz_binned_specs_cover_dimensions():
    specs = [_bin_spec(s) for s in range(10)]
    assert any(s["null_point_below"] is not None for s in specs)
    assert any(s["null_lo_mod"] is not None for s in specs)
    assert any(s["reversed_mod"] is not None for s in specs)
    assert len({s["bin_width"] for s in specs}) >= 2
    assert len({s["m"] for s in specs}) >= 2


def test_binned_interval_overwide_raises_reversed_does_not(spark):
    """An over-wide interval fails loudly under the guard; a REVERSED
    interval must NOT reach the guard's raise branch (it is filtered as
    matching-nothing first — a descending sequence would otherwise slip
    a negative span past the cap)."""
    points = spark.createDataFrame([(1, 5.0)], "p_id long, p double")
    wide = spark.createDataFrame(
        [(1, 0.0, 99999.0)], "i_id long, lo double, hi double"
    )
    with pytest.raises(Exception, match="spans more than"):
        binned_interval_join(
            points, wide, "p", "lo", "hi", bin_width=1.0,
            max_bins_per_interval=4096,
        ).collect()
    reversed_iv = spark.createDataFrame(
        [(1, 99999.0, 0.0)], "i_id long, lo double, hi double"
    )
    out = binned_interval_join(
        points, reversed_iv, "p", "lo", "hi", bin_width=1.0,
        max_bins_per_interval=4096,
    )
    assert out.count() == 0
