"""Hash-stable money-aggregation convention (registry-wide).

``round(sum(double), 2)`` is order-dependent: Spark's partitioned partial
sums and DuckDB's sequential scan accumulate float error differently, so a
sum landing within a few ulp of a half-cent boundary can round to different
cents on the two engines (this flipped ``q10_returned_item_reporting`` by
one cent in round 2 — see VERDICT.md r2 "What's wrong" #2/#3).

The registry-wide fix (both the Spark builder AND its DuckDB oracle):

1. Recover the *exact* decimal value of the summand before aggregating.
   Fixture money columns are exact 2dp values (events.value is 4dp), so a
   product of k such factors has an exact decimal value of scale <= 2k.
   Casting the double product to ``DECIMAL(18, s)`` with s = the exact
   scale is deterministic and tie-free: the double sits within ~1e-10 of a
   scale-s grid point, and a grid point is never at a half of 10^-s.
2. Sum the decimals — exact integer arithmetic, order-independent.
3. ``round(sum, 2)`` — both engines round decimals half-away-from-zero
   (verified empirically: 2.0050 -> 2.01, -2.0050 -> -2.01 on both).
4. Cast the result to DOUBLE — both engines produce the nearest double.

For averages/ratios, divide the exact decimal sums *after* casting to
double: the quotient is then the same IEEE double on both engines, and
both engines round identical doubles identically (verified on the
2.675/0.125 hazard values).

The convention is enforced by ``tests/oracle.py::compare`` (zero float
tolerance, per-column dtype-kind assert — what the driver's value hash
requires), exercised for every oracle query by
``tests/test_queries_oracle.py::test_oracle_match``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact decimal type for a bare 2dp money column (price, balance, quantity)
MONEY = "decimal(18,2)"
#: exact decimal type for a 2dp x 2dp product (price * (1 +/- rate))
MONEY4 = "decimal(18,4)"
#: exact decimal type for a 2dp x 2dp x 2dp product (price * disc * tax)
MONEY6 = "decimal(18,6)"
#: exact decimal type for events.value (4dp fixture column)
VALUE4 = "decimal(18,4)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec(col: Column | str, dtype: str = MONEY) -> Column:
    """Exact-decimal view of a money column/expression (step 1 above)."""
    return _c(col).cast(dtype)


def dsum(col: Column | str, dtype: str = MONEY, scale: int = 2) -> Column:
    """Order-independent money sum -> rounded double (steps 1-4 above)."""
    return F.round(F.sum(dec(col, dtype)), scale).cast("double")


def dsum_raw(col: Column | str, dtype: str = MONEY) -> Column:
    """Exact decimal sum cast straight to double (no extra rounding) —
    building block for ratios/averages computed in double afterwards."""
    return F.sum(dec(col, dtype)).cast("double")


def davg(col: Column | str, dtype: str = MONEY, scale: int = 4) -> Column:
    """Order-independent average: exact decimal sum / non-null count,
    divided in double, grid-snapped with :func:`fround` (a rounded
    QUOTIENT is the half-boundary hazard — see the fround comment).
    NULL for all-NULL groups — under Spark 4's default ANSI mode an
    unguarded /count would raise DIVIDE_BY_ZERO (verified), where the old
    F.avg and the DuckDB mirror return NULL. Matches :func:`sql_davg`."""
    n = F.count(_c(col))
    return F.when(n > 0, fround(dsum_raw(col, dtype) / n, scale))


# --- SQL-side mirrors (used to build oracle f-strings) ---------------------

SQL_MONEY = "DECIMAL(18,2)"
SQL_MONEY4 = "DECIMAL(18,4)"
SQL_MONEY6 = "DECIMAL(18,6)"
SQL_VALUE4 = "DECIMAL(18,4)"


def sql_dsum(expr: str, dtype: str = SQL_MONEY, scale: int = 2) -> str:
    return f"CAST(round(sum(CAST({expr} AS {dtype})), {scale}) AS DOUBLE)"


def sql_dsum_raw(expr: str, dtype: str = SQL_MONEY) -> str:
    return f"CAST(sum(CAST({expr} AS {dtype})) AS DOUBLE)"


def sql_davg(expr: str, dtype: str = SQL_MONEY, scale: int = 4) -> str:
    inner = sql_fround(f"{sql_dsum_raw(expr, dtype)} / count({expr})", scale)
    return f"(CASE WHEN count({expr}) > 0 THEN {inner} END)"


# --- deterministic grid snap for engine-identical doubles -------------------
#
# round(double, s) is NOT engine-portable even on the SAME double: Spark
# rounds the exact decimal expansion of the double (BigDecimal HALF_UP),
# DuckDB scales-then-rounds in float — e.g. both hold 55.683749999999996
# (= 3118.29/56) and Spark says 55.6837 while DuckDB says 55.6838. Any
# rounded QUOTIENT (avg, share, ratio, jaccard) can flip a row hash when a
# regenerated fixture lands near a half boundary (r3 sf0.1 sweep caught
# three). The portable snap is pure IEEE arithmetic — identical inputs give
# identical outputs on every engine:
#
#     fround(x, s) = floor(x * 10^s + 0.5) / 10^s
#
# Use it for every OUTPUT rounding of an engine-identical double (exact
# int/int or decimal-sum/count quotients, sqrt/products of identical
# doubles). Keep decimal rounding (dsum) for order-dependent float sums —
# there the decimal SUM is what restores engine identity, and round() on a
# DECIMAL is exact half-away-from-zero on both engines (verified).


def fround(col: Column | str, scale: int) -> Column:
    """floor(x·10^s + 0.5)/10^s — the engine-portable grid snap (see module
    comment). Returns double. Rounding rule: HALF-UP TOWARD +INFINITY on
    exact halves (fround(-0.125, 2) = -0.12 where both engines' round()
    gives -0.13 half-away-from-zero) — a deliberate, deterministic
    convention, not a round() clone; away from half boundaries it agrees
    with round() except within one double ulp, where round() is
    engine-dependent and this is not. Parity holds because every oracle
    applies the IDENTICAL formula (:func:`sql_fround`), never round().

    Domain: |x·10^s| must stay below 2^63 — Spark's floor(double) returns
    BIGINT and silently SATURATES at Long.MaxValue past that, while
    DuckDB's floor stays double, so the engines would diverge without an
    error (r8 review). Money/ratio magnitudes in this engine sit many
    orders below the cliff; callers snapping astronomical values must
    rescale first."""
    m = float(10**scale)
    return (F.floor(_c(col) * m + F.lit(0.5)) / m).cast("double")


def sql_fround(expr: str, scale: int) -> str:
    """DuckDB mirror of :func:`fround`.

    Parity holds on the COLUMN evaluation path (what every oracle uses):
    DuckDB's constant-folder multiplies LITERAL doubles in extended
    precision (97.30614999999999 * 10000.0 folds to 973061.5 where the
    IEEE product is ...4999999999 — found by the adversarial parity fuzz
    in tests/test_queries_oracle.py), so never validate fround with
    constant-only SQL."""
    m = 10**scale
    return f"(floor(({expr}) * {m}.0 + 0.5) / {m}.0)"
