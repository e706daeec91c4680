"""Self-check harness mirroring the driver's DuckDB-oracle comparison:
row-count + schema-shape + order-insensitive value comparison.

Used by tests to catch mismatches *before* the driver's per-round
CORRECTNESS gate does.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from mare_spark.tables import TABLE_NAMES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif s.dtype == object:
            df[c] = s.map(_canon_cell)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def _canon_cell(v):
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    # np.floating too (r8 review): Spark's array<float> elements arrive
    # as np.float32, which is NOT a python-float subclass — skipping the
    # round made array-cell canonicalization asymmetric with the DuckDB
    # side's np.float64 elements
    if isinstance(v, (float, np.floating)):
        return round(float(v), 9)
    if isinstance(v, bytes):
        return v
    return v


def _cell_eq(a, b) -> bool:
    """Canonicalized-cell equality with NaN == NaN, recursively into
    array cells (r8 review: plain tuple == compared NaN elements as
    unequal — the scalar branch's isna-both-sides rule applies
    elementwise too). pd.isna of a tuple returns an elementwise ndarray
    whose bool() raises, so tuples branch first."""
    if isinstance(a, tuple) or isinstance(b, tuple):
        if not (isinstance(a, tuple) and isinstance(b, tuple)):
            return False
        return len(a) == len(b) and all(
            _cell_eq(x, y) for x, y in zip(a, b)
        )
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return bool(a == b)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark result matches the DuckDB oracle result.

    STRICT by design — the driver's hash gate compares canonicalized
    values exactly, so any value difference surviving the 9dp canon round
    is a red CORRECTNESS row (r2's q10 cent flip passed an old 1e-6
    tolerance locally, then hash-failed at the driver). Strict mode also
    asserts per-column dtype KIND parity (int vs float vs object...):
    r2's q_math_conditional was value-identical but hashed `6` (Spark
    bigint) against `6.0` (DuckDB double). The former ``float_tol``
    escape hatch was removed in r8: it was unused, and its pairing (each
    side independently sorted by its own jittered values, then zipped)
    could both falsely fail and falsely pass genuinely-agreeing results —
    approximate queries belong in rows-only checks with their own
    tolerance tests, not here."""
    got = _canon(spark_df.toPandas())
    con = duckdb_con(sf_dir)
    try:
        want = _canon(con.execute(oracle_sql).df())
    finally:
        con.close()

    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns: spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        assert g.dtype.kind == w.dtype.kind, (
            f"{c}: dtype drift spark={g.dtype} duckdb={w.dtype} — the "
            "driver hash stringifies values, so int-vs-float is a red row; "
            "align the oracle's type (CAST) with Spark's return type"
        )
        mism = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(g.tolist(), w.tolist()))
            if not _cell_eq(a, b)
        ]
        assert not mism, f"{c}: first mismatches {mism[:5]}"
