"""Self-check harness mirroring the driver's DuckDB-oracle comparison:
row-count + schema-shape + order-insensitive value comparison.

Used by tests to catch mismatches *before* the driver's per-round
CORRECTNESS gate does.
"""

from __future__ import annotations

import math

import duckdb
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
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, bytes):
        return v
    return v


def compare(
    spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0
) -> None:
    """Assert the Spark result matches the DuckDB oracle result.

    Default is STRICT — the driver's hash gate compares canonicalized
    values exactly, so any value difference surviving the 9dp canon round
    is a red CORRECTNESS row (r2's q10 cent flip passed the old 1e-6
    tolerance locally, then hash-failed at the driver). Strict mode also
    asserts per-column dtype KIND parity (int vs float vs object...):
    r2's q_math_conditional was value-identical but hashed `6` (Spark
    bigint) against `6.0` (DuckDB double). Pass ``float_tol`` > 0 only for
    queries whose contract is genuinely approximate."""
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
        if (
            float_tol > 0.0
            and pd.api.types.is_float_dtype(g)
            and pd.api.types.is_float_dtype(w)
        ):
            for i, (a, b) in enumerate(zip(g, w)):
                na, nb = pd.isna(a), pd.isna(b)
                assert na == nb, f"{c}[{i}]: spark={a} duckdb={b}"
                if not na:
                    assert math.isclose(a, b, rel_tol=float_tol, abs_tol=float_tol), (
                        f"{c}[{i}]: spark={a} duckdb={b}"
                    )
        else:
            ga, wa = g.tolist(), w.tolist()

            def _cell_eq(a, b):
                # pd.isna of a tuple returns an elementwise ndarray whose
                # bool() raises — canonicalized array cells must compare
                # by equality only, scalars also by NaN-vs-NaN
                if isinstance(a, tuple) or isinstance(b, tuple):
                    return a == b
                return bool(a == b) or (pd.isna(a) and pd.isna(b))

            mism = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(ga, wa))
                if not _cell_eq(a, b)
            ]
            assert not mism, f"{c}: first mismatches {mism[:5]}"
