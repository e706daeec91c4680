"""Randomized differential fuzz of the as-of join vs DuckDB's native
ASOF JOIN (the same seed-pinned spec discipline as test_fuzz_relational).

Each seed draws a spec — key cardinality, right-side tie density (bucket
width), direction, NULL injection on the left event time — and runs the
join TWICE over the events fixture: through ``operators.asof.asof_join``
(union + keyed window carry, no UDF) and as DuckDB ASOF SQL. Exact
canonical equality via ``tests.oracle.compare``.

Determinism notes:
* event times become int64 MICROSECONDS on both engines
  (``unix_micros(cast(ts as timestamp))`` / ``epoch_us(ts)`` — the
  gap-fill convention), so the as-of comparison is integer-exact;
* the right side aggregates to one row per (key, bucket) FIRST — as-of
  matches among equal-timestamp right rows are engine-arbitrary, so the
  fuzz keeps the right side tie-free while the bucketing itself still
  creates heavy left-side tie pressure;
* carried values are parquet doubles copied verbatim (no arithmetic),
  so no rounding convention is needed;
* NULL left event times: the engine's contract (and merge_asof's) is
  NEVER MATCH. DuckDB's KEYED ASOF diverges — measured: with an
  equality key it matches NULL left times against the key's rows (NULL
  sorts high in its sort-based matcher), though the keyless form does
  not — so the oracle models the sane contract explicitly (ASOF over
  the NOT-NULL rows, UNION ALL the NULL rows unmatched).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mare_spark.operators.asof import asof_join
from mare_spark.tables import read_table
from tests.conftest import SF_SMOKE
from tests.oracle import compare

_TYPES = ["view", "click", "purchase"]
_US = "unix_micros(cast(ts as timestamp))"


def _spec(seed: int) -> dict:
    rng = random.Random(seed * 7919 + 13)
    return {
        "m": rng.choice([3, 10, 50]),          # key cardinality
        "bucket_us": rng.choice([1, 60, 600]) * 1_000_000,  # tie density
        "direction": rng.choice(["backward", "forward"]),
        "lt": rng.choice(_TYPES),
        "rt": rng.choice(_TYPES),
        # left event-time NULL injection threshold (value is ~U[0,100))
        "null_below": rng.choice([None, 5.0, 30.0]),
    }


def _build_spark(spark, spec):
    e = read_table(spark, SF_SMOKE, "events")
    us = F.expr(_US)
    o_left = (
        F.when(F.col("value") < spec["null_below"], F.lit(None)).otherwise(us)
        if spec["null_below"] is not None
        else us
    )
    left = e.filter(F.col("event_type") == spec["lt"]).select(
        "event_id",
        (F.col("user_id") % spec["m"]).alias("k"),
        o_left.alias("o"),
        "value",
    )
    right = (
        e.filter(F.col("event_type") == spec["rt"])
        .select(
            (F.col("user_id") % spec["m"]).alias("k"),
            F.expr(f"({_US} div {spec['bucket_us']}) * {spec['bucket_us']}")
            .alias("o"),
            "value",
        )
        .groupBy("k", "o")
        .agg(
            F.max("value").alias("r_val"),
            F.count("*").cast("long").alias("r_n"),
        )
    )
    j = asof_join(
        left, right, on="o", by="k",
        right_cols=["o", "r_val", "r_n"], direction=spec["direction"],
    )
    # carried ints go out as double on BOTH engines: unmatched left rows
    # null them, and nullable-int pandas dtypes differ engine-to-engine
    return j.select(
        "event_id", "k", "o", "value",
        F.col("o_asof").cast("double").alias("r_o"),
        F.col("r_val_asof").alias("r_val"),
        F.col("r_n_asof").cast("double").alias("r_n"),
    )


def _build_sql(spec) -> str:
    null_case = (
        f"CASE WHEN value < {spec['null_below']!r} THEN NULL "
        f"ELSE epoch_us(ts) END"
        if spec["null_below"] is not None
        else "epoch_us(ts)"
    )
    cmp = ">=" if spec["direction"] == "backward" else "<="
    return f"""
    WITH l AS (
      SELECT event_id, user_id % {spec['m']} AS k,
             {null_case} AS o, value
      FROM events WHERE event_type = '{spec['lt']}'
    ),
    r AS (
      SELECT user_id % {spec['m']} AS k,
             (epoch_us(ts) // {spec['bucket_us']}) * {spec['bucket_us']} AS o,
             max(value) AS r_val, CAST(count(*) AS BIGINT) AS r_n
      FROM events WHERE event_type = '{spec['rt']}'
      GROUP BY 1, 2
    )
    SELECT l.event_id, l.k, l.o, l.value,
           CAST(r.o AS DOUBLE) AS r_o, r.r_val,
           CAST(r.r_n AS DOUBLE) AS r_n
    FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.o {cmp} r.o
    WHERE l.o IS NOT NULL
    UNION ALL
    SELECT event_id, k, o, value, NULL, NULL, NULL
    FROM l WHERE o IS NULL
    """


@pytest.mark.parametrize("seed", range(14))
def test_fuzz_asof_vs_duckdb(spark, seed):
    spec = _spec(seed)
    compare(_build_spark(spark, spec), _build_sql(spec), SF_SMOKE)


def test_fuzz_asof_specs_cover_both_directions_and_nulls():
    """The 14 pinned seeds must actually cross the spec space (a skew in
    random.choice could silently leave a dimension unfuzzed)."""
    specs = [_spec(s) for s in range(14)]
    assert {s["direction"] for s in specs} == {"backward", "forward"}
    assert any(s["null_below"] is not None for s in specs)
    assert any(s["null_below"] is None for s in specs)
    assert len({s["bucket_us"] for s in specs}) >= 2
    assert len({s["m"] for s in specs}) >= 2


@pytest.mark.parametrize("seed", [0, 3, 7, 11])
def test_fuzz_asof_pandas_tier_agrees(spark, seed):
    """The merge_asof tier must produce the identical result as the
    window-carry tier on the fuzzed specs (NULL left times dropped from
    the comparison frame on both sides — merge_asof forbids NaN keys, so
    the pandas tier's contract starts at non-NULL times)."""
    from mare_spark.operators.asof import asof_join_pandas

    spec = _spec(seed)
    e = read_table(spark, SF_SMOKE, "events")
    us = F.expr(_US)
    left = e.filter(
        (F.col("event_type") == spec["lt"])
        & (F.col("value") >= (spec["null_below"] or -1.0))
    ).select(
        "event_id",
        (F.col("user_id") % spec["m"]).alias("k"),
        us.alias("o"),
        "value",
    )
    right = (
        e.filter(F.col("event_type") == spec["rt"])
        .select(
            (F.col("user_id") % spec["m"]).alias("k"),
            F.expr(f"({_US} div {spec['bucket_us']}) * {spec['bucket_us']}")
            .alias("o"),
            "value",
        )
        .groupBy("k", "o")
        .agg(
            F.max("value").alias("r_val"),
            F.count("*").cast("long").alias("r_n"),
        )
    )
    kw = dict(on="o", by="k", right_cols=["o", "r_val", "r_n"],
              direction=spec["direction"])
    a = asof_join(left, right, **kw)
    b = asof_join_pandas(left, right, **kw)
    cols = ["event_id", "k", "o", "value", "o_asof", "r_val_asof", "r_n_asof"]
    assert a.select(*cols).exceptAll(b.select(*cols)).count() == 0
    assert b.select(*cols).exceptAll(a.select(*cols)).count() == 0


def test_asof_review_guards(spark):
    """Review-driven as-of contracts: NULL group keys never match in
    either tier (the keyed-SQL-equality rule, like NULL event times);
    reserved internal names are rejected; integer carried values above
    2^53 survive the pandas tier exactly (nullable Int64, never a
    float64 round-trip); bad directions fail eagerly in both tiers."""
    from mare_spark.operators.asof import asof_join, asof_join_pandas

    left = spark.createDataFrame(
        [(None, 10, 1), ("k", 10, 2)], "k string, o long, id long"
    )
    big = 9007199254740993  # 2^53 + 1: float64 would round it
    right = spark.createDataFrame(
        [(None, 5, big), ("k", 5, big)], "k string, o long, rv long"
    )
    for tier in (asof_join, asof_join_pandas):
        rows = {r.id: r.rv_asof
                for r in tier(left, right, on="o", by="k",
                              right_cols=["rv"]).collect()}
        assert rows[1] is None, tier.__name__   # NULL key never matches
        assert rows[2] == big, tier.__name__    # exact int carried

    import pytest

    with pytest.raises(ValueError, match="reserved"):
        asof_join(left.withColumnRenamed("id", "_carry"), right,
                  on="o", by="k")
    with pytest.raises(ValueError, match="direction"):
        asof_join_pandas(left, right, on="o", by="k",
                         direction="foward")


def test_asof_review_guards_r7(spark):
    """Round-7 review contracts: an integer EVENT-TIME column carried via
    right_cols survives the pandas tier exactly (the on-self-carry is
    created before the Int64 guard now); array carries no longer crash
    the pandas tier and both tiers exclude nested types from the tie key
    identically; {col}{suffix} collisions with existing left columns are
    refused eagerly in both tiers."""
    import pytest

    from mare_spark.operators.asof import asof_join, asof_join_pandas

    big = 9007199254740993  # 2^53 + 1: a float64 round-trip corrupts it
    left = spark.createDataFrame([("k", big + 10, 1)], "k string, o long, id long")
    right = spark.createDataFrame([("k", big, 7)], "k string, o long, rv long")
    for tier in (asof_join, asof_join_pandas):
        row = tier(left, right, on="o", by="k",
                   right_cols=["o", "rv"]).collect()[0]
        assert row.o_asof == big, tier.__name__
        assert row.rv_asof == 7, tier.__name__

    # array carries: tied right rows force the tie path; both tiers must
    # run (not crash) and agree on the carried scalar tie winner
    rt = spark.createDataFrame(
        [("k", 5, 1, ["a"]), ("k", 5, 2, ["b"])],
        "k string, o long, rv long, tags array<string>",
    )
    got = {}
    for tier in (asof_join, asof_join_pandas):
        r = tier(left.select("k", F.lit(6).cast("long").alias("o"), "id"),
                 rt, on="o", by="k", right_cols=["rv", "tags"]).collect()[0]
        got[tier.__name__] = (r.rv_asof, list(r.tags_asof))
    assert got["asof_join"] == got["asof_join_pandas"] == (2, ["b"])

    for tier in (asof_join, asof_join_pandas):
        with pytest.raises(ValueError, match="already exist on the left"):
            tier(left.withColumnRenamed("id", "rv_asof"), right,
                 on="o", by="k", right_cols=["rv"])


def test_binned_interval_join_reserved_bin_name(spark):
    import pytest

    from mare_spark.operators.ranges import binned_interval_join

    pts = spark.createDataFrame([(1.0, 9)], "p double, _bin long")
    iv = spark.createDataFrame([(0.0, 2.0)], "lo double, hi double")
    with pytest.raises(ValueError, match="_bin"):
        binned_interval_join(pts, iv, "p", "lo", "hi", bin_width=1.0)
