"""gapfill_locf unit tests: hand-built expected grids, tie-break
determinism, layout independence, argument contract. (The DuckDB
differential runs in test_queries_oracle via events_gapfill_locf.)"""

from __future__ import annotations

from datetime import datetime

import pytest

from mare_spark.operators.timeseries import gapfill_locf


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp_ntz, k string, v double, id long"
    )


def _call(df, bucket=60):
    return gapfill_locf(
        df, ts_col="ts", key_col="k", value_col="v",
        bucket_seconds=bucket, tiebreak_cols=("id",),
    )


def test_fills_gaps_with_last_value(spark):
    t = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t.replace(minute=0), "a", 1.0, 1),
        (t.replace(minute=1), "a", 5.0, 2),   # same 2-min bucket as id=1
        (t.replace(minute=10), "a", 9.0, 3),  # buckets 1..4 empty
    ]
    out = _call(_frame(spark, rows), bucket=120).orderBy("bucket_ts").collect()
    # bucket 0 holds two events → later ts (minute 1) wins
    assert [
        (r["bucket_ts"].minute, r["v"], r["is_observed"]) for r in out
    ] == [
        (0, 5.0, True), (2, 5.0, False), (4, 5.0, False), (6, 5.0, False),
        (8, 5.0, False), (10, 9.0, True),
    ]


def test_tiebreak_on_equal_ts(spark):
    t = datetime(2024, 1, 1)
    rows = [(t, "a", 1.0, 1), (t, "a", 2.0, 2)]  # identical ts
    out = _call(_frame(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["v"] == 2.0  # higher id wins


def test_keys_are_independent(spark):
    t = datetime(2024, 1, 1)
    rows = [
        (t.replace(minute=0), "a", 1.0, 1),
        (t.replace(minute=2), "a", 2.0, 2),
        (t.replace(minute=1), "b", 7.0, 3),  # b starts at ITS first bucket
    ]
    out = _call(_frame(spark, rows))
    a = out.filter("k = 'a'").count()
    b = out.filter("k = 'b'").count()
    assert (a, b) == (3, 1)
    # no cross-key leakage of values
    assert out.filter("k = 'b'").collect()[0]["v"] == 7.0


def test_single_observation_key(spark):
    rows = [(datetime(2024, 1, 1), "a", 3.0, 1)]
    out = _call(_frame(spark, rows)).collect()
    assert len(out) == 1 and out[0]["is_observed"]


def test_layout_independent(spark):
    t = datetime(2024, 1, 1)
    rows = [
        (t.replace(minute=m), k, float(m + i), m * 10 + i)
        for m in range(0, 30, 7)
        for i, k in enumerate(["a", "b", "c"])
    ]
    df = _frame(spark, rows)
    one = sorted(map(tuple, _call(df.coalesce(1)).collect()))
    many = sorted(map(tuple, _call(df.repartition(5)).collect()))
    assert one == many


def test_argument_contract(spark):
    df = _frame(spark, [(datetime(2024, 1, 1), "a", 1.0, 1)])
    with pytest.raises(ValueError, match="bucket_seconds"):
        _call(df, bucket=0)
    with pytest.raises(ValueError, match="clash"):
        gapfill_locf(
            df.withColumnRenamed("v", "bucket_ts"), ts_col="ts",
            key_col="k", value_col="bucket_ts", bucket_seconds=60,
        )


# -- interpolate mode -------------------------------------------------------


def test_interpolate_linear_gap(spark):
    t = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t.replace(minute=0), "a", 10.0, 1),
        (t.replace(minute=4), "a", 30.0, 2),  # buckets 1..3 interpolate
    ]
    out = (
        gapfill_locf(
            _frame(spark, rows), ts_col="ts", key_col="k", value_col="v",
            bucket_seconds=60, tiebreak_cols=("id",), mode="interpolate",
        )
        .orderBy("bucket_ts")
        .collect()
    )
    assert [(r["bucket_ts"].minute, r["v"], r["is_observed"]) for r in out] == [
        (0, 10.0, True), (1, 15.0, False), (2, 20.0, False),
        (3, 25.0, False), (4, 30.0, True),
    ]


def test_interpolate_matches_duckdb_differential(spark):
    """Full-engine differential on the events fixture: the identical
    interpolation expression evaluated by DuckDB must match bit-for-bit
    (same IEEE op order on both sides)."""
    from mare_spark.operators.timeseries import gapfill_locf as gl
    from mare_spark.tables import read_table
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    ev = read_table(spark, SF_SMOKE, "events")
    df = gl(
        ev, ts_col="ts", key_col="user_id", value_col="value",
        bucket_seconds=43200, tiebreak_cols=("event_id",),
        mode="interpolate",
    )
    step_us = 43200 * 1_000_000
    sql = f"""
    WITH obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT user_id, (epoch_us(ts) - (((epoch_us(ts) % {step_us}) + {step_us}) % {step_us})) // {step_us} AS bucket, value,
               row_number() OVER (
                 PARTITION BY user_id, (epoch_us(ts) - (((epoch_us(ts) % {step_us}) + {step_us}) % {step_us})) // {step_us}
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    led AS (
      SELECT user_id, bucket, value,
             lead(bucket) OVER (PARTITION BY user_id ORDER BY bucket)
               AS nxt,
             lead(value) OVER (PARTITION BY user_id ORDER BY bucket)
               AS nxt_val
      FROM obs
    ),
    grid AS (
      SELECT user_id, bucket, value, nxt, nxt_val,
             unnest(generate_series(bucket, coalesce(nxt - 1, bucket)))
               AS g
      FROM led
    )
    SELECT user_id, make_timestamp(g * {step_us}) AS bucket_ts,
           CASE WHEN nxt IS NULL OR g = bucket THEN value
                ELSE value + (nxt_val - value)
                     * (CAST(g - bucket AS DOUBLE)
                        / CAST(nxt - bucket AS DOUBLE))
           END AS value,
           (g = bucket) AS is_observed
    FROM grid
    """
    compare(df, sql, SF_SMOKE)


def test_mode_contract(spark):
    df = _frame(spark, [(datetime(2024, 1, 1), "a", 1.0, 1)])
    with pytest.raises(ValueError, match="mode"):
        gapfill_locf(
            df, ts_col="ts", key_col="k", value_col="v",
            bucket_seconds=60, mode="nearest",
        )


# -- property: engine ≡ pure-python reference -------------------------------


def _ref_gapfill(rows, step_s):
    """Pure-python gapfill_locf reference: rows = [(k, ts_us, v, id)]."""
    from collections import defaultdict

    step_us = step_s * 1_000_000
    by_key = defaultdict(dict)
    for k, ts, v, i in rows:
        b = ts // step_us
        cur = by_key[k].get(b)
        if cur is None or (ts, i) > (cur[0], cur[1]):
            by_key[k][b] = (ts, i, v)
    out = []
    for k, buckets in by_key.items():
        bs = sorted(buckets)
        for j, b in enumerate(bs):
            v = buckets[b][2]
            end = bs[j + 1] if j + 1 < len(bs) else b + 1
            for g in range(b, end):
                out.append((k, g * step_us, v, g == b))
    return sorted(out)


def test_property_matches_python_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    step_s = 60

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=0, max_value=40 * 60 * 1_000_000),
                st.floats(
                    min_value=-100, max_value=100,
                    allow_nan=False, allow_infinity=False,
                ),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(raw):
        rows = [(k, ts, v, i) for i, (k, ts, v) in enumerate(raw)]
        df = spark.createDataFrame(
            [
                (datetime(1970, 1, 1)
                 + __import__("datetime").timedelta(microseconds=ts),
                 k, v, i)
                for k, ts, v, i in rows
            ],
            "ts timestamp_ntz, k string, v double, id long",
        )
        got = sorted(
            (
                r["k"],
                int(
                    (r["bucket_ts"] - datetime(1970, 1, 1)).total_seconds()
                    * 1_000_000
                ),
                r["v"],
                r["is_observed"],
            )
            for r in gapfill_locf(
                df, ts_col="ts", key_col="k", value_col="v",
                bucket_seconds=step_s, tiebreak_cols=("id",),
            ).collect()
        )
        assert got == _ref_gapfill(rows, step_s)

    check()


def test_gapfill_pre_epoch_and_review_guards(spark):
    """Pre-epoch timestamps bucket by TRUE floor on both engines (the
    truncating `//` form would shift them one bucket); fractional
    bucket_seconds and non-numeric interpolate inputs raise; NULL
    timestamps drop (documented contract); backquoted column names
    reference the column, not an expression."""
    import datetime

    import duckdb
    import pytest

    from mare_spark.operators.timeseries import gapfill_locf

    rows = [
        (1, datetime.datetime(1969, 12, 31, 23, 59, 30), 1.0),  # pre-epoch
        (1, datetime.datetime(1970, 1, 1, 0, 1, 30), 4.0),
        (2, None, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp_ntz, v double"
    )
    got = {
        (r.k, r.bucket_ts): (r.v, r.is_observed)
        for r in gapfill_locf(
            df, ts_col="ts", key_col="k", value_col="v",
            bucket_seconds=60,
        ).collect()
    }
    # floor(-30s / 60s) = bucket -1 -> grid starts 23:59, NOT 00:00
    assert (1, datetime.datetime(1969, 12, 31, 23, 59)) in got
    assert all(k == 1 for k, _ts in got)  # the NULL-ts key dropped
    # the pre-epoch bucket matches DuckDB's pmod floor replay exactly
    (duck_bucket,) = duckdb.sql(
        "SELECT (epoch_us(TIMESTAMP '1969-12-31 23:59:30')"
        " - (((epoch_us(TIMESTAMP '1969-12-31 23:59:30') % 60000000)"
        " + 60000000) % 60000000)) // 60000000"
    ).fetchone()
    assert duck_bucket == -1

    with pytest.raises(ValueError, match="whole number"):
        gapfill_locf(df, ts_col="ts", key_col="k", value_col="v",
                     bucket_seconds=1.5)
    with pytest.raises(ValueError, match="numeric value_col"):
        gapfill_locf(
            df.withColumn("v", df.v.cast("string")),
            ts_col="ts", key_col="k", value_col="v",
            bucket_seconds=60, mode="interpolate",
        )

    # a dashed column name must reference the COLUMN (a-b would parse
    # as subtraction unquoted)
    dashed = df.withColumnRenamed("ts", "t-s").filter("k = 1")
    out = gapfill_locf(
        dashed, ts_col="t-s", key_col="k", value_col="v",
        bucket_seconds=60,
    )
    assert out.count() == len(got)
