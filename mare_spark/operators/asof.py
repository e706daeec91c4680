"""As-of (time-travel) join — an operator Spark lacks natively.

Two implementations, per the engine's preference order (compose built-ins
first, Pandas only when built-ins can't express it):

* :func:`asof_join` — pure DataFrame composition: union both sides tagged,
  per-key window ``last(right_value, ignorenulls=True)`` over event time
  carries the most recent right row forward onto each left row. One shuffle
  on the key, one local sort — the same cost profile as a sort-merge join,
  no UDF, arbitrary input sizes.
* :func:`asof_join_pandas` — ``pd.merge_asof`` per key group via
  ``applyInPandas`` (cogroup). Simpler to extend with tolerances/nearest
  semantics, but moves rows through Arrow; the composition version is the
  default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _tie_eligible(dt) -> bool:
    """Whether a carried column may join the tie-break sort key: ATOMIC
    orderable types only. Arrays/structs CAN appear in a Spark ORDER BY,
    but the pandas tier cannot sort object columns holding ndarray/dict
    values (sort_values raises inside the UDF) — both tiers therefore
    restrict the tie key to atomic columns so they keep picking the same
    winner on tie-heavy data. Maps are not orderable anywhere."""
    from pyspark.sql import types as T

    return not isinstance(dt, (T.MapType, T.ArrayType, T.StructType))


def _check_suffix_clash(left: DataFrame, right_cols: list, suffix: str) -> None:
    """Output names are ``{col}{suffix}``: a left column already bearing
    one of those names would emit a duplicate (window tier: ambiguous
    downstream; pandas tier: an opaque executor KeyError after merge_asof
    re-suffixes the clash) — refuse eagerly instead."""
    clash = [
        f"{c}{suffix}" for c in right_cols if f"{c}{suffix}" in left.columns
    ]
    if clash:
        raise ValueError(
            f"output columns {clash} already exist on the left side — "
            "pick a different suffix or rename the left columns"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (backward as-of,
    the default), or — ``direction="forward"`` — the EARLIEST right row
    with ``right.on >= left.on`` (the "next quote/measurement after this
    event" join). Forward is the same carry plan over the reversed event
    order: one shuffle, one local sort, no UDF either way.

    Plan: tag and union the two inputs, hash-partition by ``by``, order by
    (event time, right-before-left at ties), then carry the latest right ROW
    forward atomically as a single struct with
    ``last(struct, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT
    (the struct is NULL on left rows, non-NULL on every right row — so the
    whole matched row is taken verbatim and legitimate NULLs in its fields
    survive, matching ``pd.merge_asof``/DuckDB ``ASOF JOIN``, which never
    substitute field values from older rows). Left rows then project the
    carried struct's fields. Ties (equal timestamps) match (>= semantics).

    Tie determinism: multiple right rows sharing one event time within a
    group would otherwise leave the carried row unspecified (window order
    on (time, _side) alone is not total), flipping across runs and
    partitionings. The window therefore adds the carried struct itself as
    the final sort key — backward carries the LEXICOGRAPHICALLY LARGEST
    tied right row, forward the SMALLEST (field order = ``right_cols``).
    :func:`asof_join_pandas` sorts its right frame by the same composite
    key, so the two tiers agree on tie-heavy data (for non-NULL tie
    fields; NULL-ordering inside the tie key is engine-defined).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    reserved = {"_side", "_r", "_carry"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} collide with asof_join's internal "
            f"names (reserved: {sorted(reserved)}) — rename them first"
        )
    _check_suffix_clash(left, right_cols, suffix)

    # NULL event times never match (SQL comparison semantics — DuckDB's
    # ASOF and pd.merge_asof agree): drop NULL-on right rows so they can
    # never be carried; NULL-on left rows are ordered BEFORE every right
    # row (nulls-first both directions) so their carry is NULL. NULL
    # GROUP keys never match either (NULL = NULL is not true in the SQL
    # oracle) — right NULL-by rows can't be carried; left NULL-by rows
    # share an otherwise-empty NULL partition, so their carry is NULL.
    right = right.filter(F.col(on).isNotNull() & F.col(by).isNotNull())
    rt = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_r"),
    )
    r_struct_type = rt.schema["_r"].dataType
    lt = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(r_struct_type)
    )
    # align schemas for the union — ONE projection, not a withColumn
    # per left column (each withColumn nests another Project node;
    # quadratic analysis time on wide frames)
    rt = rt.select(
        "*",
        *[
            F.lit(None).alias(c)
            for c in left.columns
            if c not in (by, on)
        ],
    )

    unioned = lt.select(lt.columns).unionByName(rt.select(lt.columns))
    # backward: ascending time, right rows before left at ties (>= match).
    # forward: DESCENDING time — the carry then holds the nearest LATER
    # right row; ties still match because right still sorts before left.
    time_order = (
        F.col(on).asc_nulls_first()
        if direction == "backward"
        else F.col(on).desc_nulls_first()
    )
    # Deterministic tie winner among same-timestamp right rows: the carry
    # takes the LAST row in window order, so ordering ties by the struct
    # ascending (backward) / descending (forward) pins the max / min tied
    # row — mirrored by asof_join_pandas' composite sort. Left rows have a
    # NULL struct; they are already separated from right rows by _side.
    # Tie key: only the ATOMIC orderable carried fields — the same
    # per-field filter asof_join_pandas applies to its tie_cols (pandas
    # cannot sort nested values), so the two tiers pick the same winner
    # even when some carried columns are maps/arrays/structs.
    from pyspark.sql import types as T

    field_types = {f.name: f.dataType for f in r_struct_type.fields}
    tie_fields = [c for c in right_cols if _tie_eligible(field_types[c])]
    order_keys = [time_order, F.col("_side").asc()]
    if tie_fields:
        tie_struct = F.struct(*[F.col("_r")[c].alias(c) for c in tie_fields])
        order_keys.append(
            tie_struct.asc() if direction == "backward" else tie_struct.desc()
        )
    w = (
        W.partitionBy(by)
        .orderBy(*order_keys)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_carry")
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col("_carry")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """``pd.merge_asof`` per key via cogrouped applyInPandas — the tier
    that carries the options the window composition doesn't:
    ``direction`` in backward/forward/NEAREST, and ``tolerance`` (maximum
    |left.on - right.on|, e.g. ``pd.Timedelta("10min")`` for timestamps
    or a number for numeric keys — beyond it, no match). Inclusive ties
    both directions, matching merge_asof defaults."""
    import pandas as pd

    from pyspark.sql import types as T

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest' "
            f"(got {direction!r})"
        )
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    _check_suffix_clash(left, right_cols, suffix)

    # NULL group keys never match (SQL semantics / the window tier's
    # contract): NULL-by right rows can never be carried; NULL-by left
    # rows cogroup against an empty right and carry NULL.
    right = right.filter(F.col(by).isNotNull())

    out_fields = (
        [f"{c}" for c in left.columns] + [f"{c}{suffix}" for c in right_cols]
    )
    # a real StructType, not a joined DDL string (a column named
    # `max value` or `order-id` would fail DDL parsing)
    left_types = {f.name: f.dataType for f in left.schema.fields}
    r_types = {f.name: f.dataType for f in right.schema.fields}
    schema = T.StructType(
        [T.StructField(c, left_types[c], True) for c in left.columns]
        + [T.StructField(f"{c}{suffix}", r_types[c], True)
           for c in right_cols]
    )
    # tie-break sort columns: the orderable carried columns (decided from
    # the Spark schema, so both tiers make the same call)
    tie_cols = [
        c for c in right_cols if c != on and _tie_eligible(r_types[c])
    ]
    int_carry = [
        c for c in right_cols
        if isinstance(r_types[c], (T.ByteType, T.ShortType,
                                   T.IntegerType, T.LongType))
    ]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        # NULL keys never match (merge_asof raises on them): merge the
        # non-NULL left rows, re-append NULL-key rows with a NULL carry.
        lnull = lpdf[lpdf[on].isna()]
        lpdf = lpdf[lpdf[on].notna()].sort_values(on, kind="mergesort")
        rpdf = rpdf[rpdf[on].notna()]
        # right_cols may include the event-time column itself (emit the
        # matched row's own timestamp, as q_asof_join does): duplicate it
        # under the suffixed name BEFORE selecting, instead of renaming a
        # doubled [on, on] selection (which renamed both copies and broke
        # merge_asof's join key)
        others = [c for c in right_cols if c != on]
        # Composite sort (on, then the carried columns): merge_asof takes
        # the LAST of a tied group (backward) / FIRST (forward) in frame
        # order, so ordering ties by the carried values makes the winner
        # the lexicographic max / min — the same deterministic choice the
        # window tier pins with its struct tiebreaker. Non-orderable
        # carried columns (maps/dicts) are excluded from the sort key,
        # matching the window tier's fallback.
        rpdf = rpdf.sort_values([on] + tie_cols, kind="mergesort")[
            [on] + others
        ].rename(
            columns={c: f"{c}{suffix}" for c in others}
        )
        # the on-column self-carry must exist BEFORE the Int64 loop:
        # created after it, an integer event-time carry would skip the
        # guard and round through float64 on unmatched rows
        if on in right_cols:
            rpdf[f"{on}{suffix}"] = rpdf[on]
        # nullable Int64 BEFORE the merge: merge_asof fills misses with
        # NaN, and an int64 column upcast to float64 silently rounds
        # carried values above 2^53 (the 60-bit hash convention's range)
        for c in int_carry:
            col = f"{c}{suffix}"
            if col in rpdf.columns:
                rpdf[col] = rpdf[col].astype("Int64")
        if rpdf.empty:
            out = pd.concat([lpdf, lnull])
            for c in right_cols:
                out[f"{c}{suffix}"] = None
            return out[out_fields]
        m = pd.merge_asof(
            lpdf, rpdf, on=on, direction=direction, tolerance=tolerance
        )
        if not lnull.empty:
            for c in right_cols:
                lnull = lnull.assign(**{f"{c}{suffix}": None})
            m = pd.concat([m, lnull])
        return m[out_fields]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), schema=schema)
    )
