"""Time-series regularization: time-bucket gap-fill with
last-observation-carried-forward (LOCF).

The hypertable-family op (TimescaleDB's ``time_bucket_gapfill`` +
``locf``, InfluxDB's ``fill(previous)``) the relational surface can't
express in one call: put every key's event stream onto a fixed time
grid, carrying the last observed value across empty buckets — the input
shape every downstream window/as-of/feature pipeline wants.

Plan shape (the scale decision): NO dense-grid join. The naive plan
materializes key × full-grid rows and left-joins observations into it —
two shuffles and a row count that explodes with the time span. Instead:

1. one window per ``(key, bucket)`` picks the bucket's last observation
   (``row_number`` with a total-order tie-break);
2. ``lead(bucket)`` over the key finds each observation's next observed
   bucket;
3. a scan-side ``explode(sequence(bucket, next-1))`` emits exactly the
   grid rows each observation covers, already carrying its value.

Two exchanges, both SMALL (plan-pinned in tests/test_plans.py): Spark
rewrites step 1's rn=1 filter into a PARTIAL ``WindowGroupLimit``
executed before the shuffle, so the first exchange carries at most one
row per (key, bucket) per input task — the map-side-combine effect —
and the second (on the key, for the lead) carries only the observed
bucket rows, never the raw events. Step 3 is whole-stage-codegen
expression work. Longest-gap skew bounds a single row's explode width
(span/bucket in the worst case of a key observed once); keys are
independent, so task skew follows per-key observed-bucket counts, not
the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame,
    *,
    ts_col: str,
    key_col: str,
    value_col: str,
    bucket_seconds: int,
    tiebreak_cols: tuple[str, ...] = (),
    mode: str = "locf",
    max_fill_buckets: int = 4096,
) -> DataFrame:
    """Regularize ``df`` onto a ``bucket_seconds`` grid per ``key_col``,
    forward-filling ``value_col`` across empty buckets.

    Output: ``(key_col, bucket_ts, value_col, is_observed)`` — one row
    per grid bucket from each key's first observed bucket through its
    last (no leading nulls by construction: the grid starts where the
    data does). ``is_observed`` is False on carried-forward rows.

    Within a bucket the LAST observation wins, ordered by ``ts_col``
    then ``tiebreak_cols`` — pass a unique column (event id) to make the
    result deterministic under ties, the registry-wide convention.

    ``mode="locf"`` carries the last value flat; ``mode="interpolate"``
    fills each gap linearly between the surrounding observations'
    values (TimescaleDB's ``interpolate``) — trailing buckets past a
    key's final observation don't exist in either mode, so
    interpolation always has both endpoints (and emits DOUBLE — pass a
    floating/integral value_col; other types raise). Same plan either
    way: the interpolated value is scan-side arithmetic over columns the
    explode already carries.

    Rows with a NULL ``ts_col`` are dropped (their bucket is NULL, so
    they can't land on the grid) — gate or repair timestamps upstream
    if they must count.

    ``max_fill_buckets`` (default 4096, NEW in the guard's first
    release — earlier versions filled arbitrarily wide gaps silently)
    fail-louds any single gap wider than that many buckets: at scale
    one corrupt far-future timestamp is otherwise a single-row array
    explosion. The error message carries the offending gap's width so
    callers with legitimately sparse series can immediately pick a
    correct override.
    """
    if bucket_seconds != int(bucket_seconds):
        raise ValueError(
            f"bucket_seconds must be a whole number of seconds, got "
            f"{bucket_seconds!r}"
        )
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    if mode not in ("locf", "interpolate"):
        raise ValueError(f"mode must be 'locf' or 'interpolate', got {mode!r}")
    if max_fill_buckets < 1:
        raise ValueError(
            f"max_fill_buckets must be >= 1, got {max_fill_buckets}"
        )
    if mode == "interpolate":
        vt = dict(df.dtypes).get(value_col)
        if vt not in ("double", "float", "int", "bigint",
                      "smallint", "tinyint"):
            raise ValueError(
                f"mode='interpolate' needs a numeric value_col "
                f"(got {vt}); its output is DOUBLE"
            )
    reserved = {
        "bucket_ts", "is_observed", "_bucket", "_rn", "_next",
        "_next_val", "_obs_bucket", "_grid",
    }
    clash = reserved.intersection({ts_col, key_col, value_col, *tiebreak_cols})
    if clash:
        raise ValueError(
            f"column names clash with gapfill output columns: "
            f"{sorted(clash)} (reserved: {sorted(reserved)})"
        )

    step_us = int(bucket_seconds) * 1_000_000
    # integer-exact TRUE-FLOOR division on int64 micros (`div` truncates
    # toward zero; the negative-remainder correction makes pre-epoch
    # buckets floor like everything else — the oracle replays the same
    # floor with DuckDB's pmod form, pinned by a pre-epoch differential).
    # NTZ columns cast through the session TZ — pinned UTC engine-wide.
    # plain top-level column names only: the rest of the function goes
    # through F.col()/select(), where a dotted name parses as struct
    # access — a backtick-quoted SQL fragment here would advertise
    # support the window/select paths don't deliver (r8 review)
    if "." in ts_col:
        raise ValueError(
            f"ts_col {ts_col!r} contains '.' — rename the column first "
            "(dotted names parse as struct access in column references)"
        )
    ts_q = ts_col.replace("`", "``")  # backquote: names like `a-b` must
    # reference the COLUMN, not parse as an expression
    us = f"unix_micros(cast(`{ts_q}` as timestamp))"
    bucket = F.expr(
        f"({us} div {step_us}) "
        f"+ CASE WHEN {us} % {step_us} < 0 THEN -1 ELSE 0 END"
    ).cast("long")

    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w_last = Window.partitionBy(key_col, "_bucket").orderBy(*order)
    w_key = Window.partitionBy(key_col).orderBy("_bucket")

    observed = (
        df.select(key_col, ts_col, value_col, *tiebreak_cols)
        .withColumn("_bucket", bucket)
        # NULL ts_col → NULL _bucket: drop HERE, before the gap-width
        # guard — a NULL bucket makes span_ok NULL and the guard's
        # otherwise() branch would raise with a misleading "gap too
        # wide" error instead of honoring the documented drop contract
        .filter(F.col("_bucket").isNotNull())
        .withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select(key_col, "_bucket", value_col)
    )
    if mode == "locf":
        value = F.col(value_col)
    else:
        # linear interpolation toward the NEXT observation's value; the
        # expression is written identically in the DuckDB differential
        # (same IEEE op order → bit-identical doubles cross-engine)
        frac = (F.col("_grid") - F.col("_obs_bucket")).cast("double") / (
            F.col("_next") - F.col("_obs_bucket")
        ).cast("double")
        value = F.when(
            F.col("_next").isNull() | (F.col("_grid") == F.col("_obs_bucket")),
            F.col(value_col),
        ).otherwise(
            F.col(value_col)
            + (F.col("_next_val") - F.col(value_col)) * frac
        )

    # gap-width guard (ranges.py's max-bins doctrine: at 100 TB an
    # unnoticed multi-million-bucket gap — one corrupt far-future
    # timestamp — is a single-row array explosion and a job-killer, so
    # it is an ERROR, not a silent straggler; raise bucket_seconds or
    # repair the sentinel upstream, r8 review)
    span = F.coalesce(F.col("_next"), F.col("_bucket")) - F.col("_bucket")
    guard = F.when(span <= F.lit(max_fill_buckets), F.col("_bucket")).otherwise(
        F.raise_error(F.concat(
            F.lit("gapfill_locf: a gap spans "),
            span.cast("string"),
            F.lit(
                f" buckets (max_fill_buckets={max_fill_buckets}) — raise "
                "bucket_seconds/max_fill_buckets or repair the outlier "
                "timestamp"
            ),
        ))
    )
    filled = (
        observed.withColumn("_next", F.lead("_bucket").over(w_key))
        .withColumn("_next_val", F.lead(value_col).over(w_key))
        .withColumn("_bucket", guard)
        .select(
            key_col,
            value_col,
            "_next",
            "_next_val",
            F.col("_bucket").alias("_obs_bucket"),
            F.explode(
                F.sequence(
                    F.col("_bucket"),
                    F.coalesce(F.col("_next") - 1, F.col("_bucket")),
                )
            ).alias("_grid"),
        )
    )
    return filled.select(
        key_col,
        F.timestamp_micros(F.col("_grid") * step_us)
        .cast("timestamp_ntz")
        .alias("bucket_ts"),
        value.alias(value_col),
        (F.col("_grid") == F.col("_obs_bucket")).alias("is_observed"),
    )
