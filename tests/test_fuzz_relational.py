"""Randomized differential fuzz of the relational family vs DuckDB.

Each seed deterministically generates a query spec — predicate tree,
grouping set, aggregate list, join shape, or window top-k — and builds it
TWICE: once through the PySpark DataFrame API (the engine under test) and
once as ANSI SQL for DuckDB (the oracle). ``tests.oracle.compare`` then
requires exact canonical equality (row count, column names, dtype kinds,
values) — the same gate the driver's CORRECTNESS harness applies to the
hand-written registry.

Why: the registry pins ~160 hand-chosen plans; this sweep crosses
predicates × groupings × aggregates far beyond what hand-writing covers,
so convention drift (decimal rounding, dtype kinds, null semantics,
join-type edge cases) surfaces here before a driver round does.

Determinism contract (mirrors registry.py's):
* seeds are pinned via pytest parametrize — a failure reproduces exactly;
* money sums go through ``CAST(x AS DECIMAL(18,2))`` on BOTH engines, so
  the sum is exact and summation order can't flip a rounding boundary
  (the stored doubles sit on the 2dp grid, so the decimal cast is
  tie-free); the result is cast back to double on both sides;
* ``l_quantity`` is integer-valued, so its double sum is exact as-is;
* order-sensitive results (window top-k) break ties with unique keys.
"""

from __future__ import annotations

import random
from datetime import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mare_spark.tables import read_table

from tests.conftest import SF_SMOKE
from tests.oracle import compare

# ---------------------------------------------------------------------------
# predicate pool: (builder(rng) -> (spark Column fn over df, sql string))
# ---------------------------------------------------------------------------


def _p_qty_between(rng):
    lo = rng.randint(1, 40)
    hi = lo + rng.randint(0, 15)
    return (
        lambda df: df["l_quantity"].between(float(lo), float(hi)),
        f"l_quantity BETWEEN {lo} AND {hi}",
    )


def _p_discount_ge(rng):
    d = rng.randint(0, 10) / 100.0  # exact 2dp literal, same double both sides
    return (lambda df: df["l_discount"] >= F.lit(d), f"l_discount >= {d!r}")


def _p_shipdate_range(rng):
    y = rng.randint(1992, 1998)
    m = rng.randint(1, 12)
    lit = f"{y}-{m:02d}-01"
    if rng.random() < 0.5:
        return (
            lambda df: df["l_shipdate"] >= F.lit(datetime(y, m, 1)),
            f"l_shipdate >= TIMESTAMP '{lit}'",
        )
    return (
        lambda df: df["l_shipdate"] < F.lit(datetime(y, m, 1)),
        f"l_shipdate < TIMESTAMP '{lit}'",
    )


def _p_returnflag_in(rng):
    flags = sorted(rng.sample(["A", "N", "R"], rng.randint(1, 2)))
    quoted = ", ".join(f"'{f_}'" for f_ in flags)
    return (
        lambda df: df["l_returnflag"].isin(flags),
        f"l_returnflag IN ({quoted})",
    )


def _p_linenumber_le(rng):
    k = rng.randint(1, 6)
    return (lambda df: df["l_linenumber"] <= k, f"l_linenumber <= {k}")


def _p_suppkey_mod(rng):
    m = rng.randint(2, 7)
    r = rng.randint(0, m - 1)
    return (
        lambda df: (df["l_suppkey"] % m) == r,
        f"(l_suppkey % {m}) = {r}",
    )


def _p_tax_lt(rng):
    t = rng.randint(1, 8) / 100.0
    return (lambda df: df["l_tax"] < F.lit(t), f"l_tax < {t!r}")


_PREDICATES = (
    _p_qty_between,
    _p_discount_ge,
    _p_shipdate_range,
    _p_returnflag_in,
    _p_linenumber_le,
    _p_suppkey_mod,
    _p_tax_lt,
)


def _random_predicate(rng):
    """1-3 leaf predicates combined with AND/OR (parenthesized in SQL)."""
    n = rng.randint(1, 3)
    leaves = [rng.choice(_PREDICATES)(rng) for _ in range(n)]
    ops = [rng.choice(["AND", "OR"]) for _ in range(n - 1)]

    def col(df):
        acc = leaves[0][0](df)
        for op, leaf in zip(ops, leaves[1:]):
            acc = (acc & leaf[0](df)) if op == "AND" else (acc | leaf[0](df))
        return acc

    sql = leaves[0][1]
    for op, leaf in zip(ops, leaves[1:]):
        sql = f"({sql}) {op} ({leaf[1]})"
    return col, sql


# ---------------------------------------------------------------------------
# aggregate pool: (spark Column, select-list sql, output name)
# ---------------------------------------------------------------------------

_AGGS = (
    lambda: (F.count(F.lit(1)).alias("cnt"), "COUNT(*) AS cnt"),
    # integer-valued double: plain sum is exact
    lambda: (
        F.sum("l_quantity").alias("sum_qty"),
        "SUM(l_quantity) AS sum_qty",
    ),
    # money: exact decimal sum, cast back to double on both sides
    lambda: (
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
        " AS sum_price",
    ),
    lambda: (F.min("l_discount").alias("min_disc"), "MIN(l_discount) AS min_disc"),
    lambda: (F.max("l_tax").alias("max_tax"), "MAX(l_tax) AS max_tax"),
    lambda: (
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        "ROUND(AVG(l_quantity), 6) AS avg_qty",
    ),
    lambda: (
        F.countDistinct("l_suppkey").alias("nd_supp"),
        "COUNT(DISTINCT l_suppkey) AS nd_supp",
    ),
)

_GROUP_COLS = ("l_returnflag", "l_linestatus")


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_filter_agg(spark, seed):
    rng = random.Random(1000 + seed)
    li = read_table(spark, SF_SMOKE, "lineitem")

    pred_col, pred_sql = _random_predicate(rng)
    group = sorted(rng.sample(_GROUP_COLS, rng.randint(0, 2)))
    # always include cnt (index 0) so HAVING has a stable target
    idx = [0] + rng.sample(range(1, len(_AGGS)), rng.randint(1, 3))
    aggs = [_AGGS[i]() for i in idx]
    having = rng.randint(1, 20) if rng.random() < 0.4 and group else None

    df = li.filter(pred_col(li))
    if group:
        df = df.groupBy(*group).agg(*[a[0] for a in aggs])
    else:
        df = df.agg(*[a[0] for a in aggs])
    if having is not None:
        df = df.filter(F.col("cnt") >= having)

    select = ", ".join(group + [a[1] for a in aggs])
    sql = f"SELECT {select} FROM lineitem WHERE {pred_sql}"
    if group:
        sql += f" GROUP BY {', '.join(group)}"
    if having is not None:
        sql += f" HAVING COUNT(*) >= {having}"

    compare(df, sql, SF_SMOKE)


# ---------------------------------------------------------------------------
# join family: customer ⋈ orders across join types
# ---------------------------------------------------------------------------

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_join_agg(spark, seed):
    rng = random.Random(2000 + seed)
    cust = read_table(spark, SF_SMOKE, "customer")
    orders = read_table(spark, SF_SMOKE, "orders")

    price_lo = rng.randint(1, 150) * 1000
    o_filtered = orders.filter(orders["o_totalprice"] > float(price_lo))
    o_sql = f"SELECT * FROM orders WHERE o_totalprice > {price_lo}"

    join_type = rng.choice(["inner", "left", "left_semi", "left_anti"])
    seg = rng.sample(_SEGMENTS, rng.randint(1, 3))
    seg_sql = ", ".join(f"'{s}'" for s in sorted(seg))

    c_filtered = cust.filter(cust["c_mktsegment"].isin(seg))
    c_sql = f"SELECT * FROM customer WHERE c_mktsegment IN ({seg_sql})"

    joined = c_filtered.join(
        o_filtered, c_filtered["c_custkey"] == o_filtered["o_custkey"], join_type
    )

    if join_type in ("left_semi", "left_anti"):
        df = joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
        )
        op = "IN" if join_type == "left_semi" else "NOT IN"
        sql = (
            "SELECT c_mktsegment, COUNT(*) AS cnt, "
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal "
            f"FROM ({c_sql}) c WHERE c.c_custkey {op} "
            f"(SELECT o_custkey FROM ({o_sql}) o) GROUP BY c_mktsegment"
        )
    else:
        # inner/left: count order rows per segment; in a LEFT join,
        # unmatched customers contribute a row with NULL o_orderkey, so
        # count the join-side key (NULL-skipping on both engines).
        df = joined.groupBy("c_mktsegment").agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        jt_sql = "JOIN" if join_type == "inner" else "LEFT JOIN"
        sql = (
            "SELECT c_mktsegment, COUNT(o_orderkey) AS n_orders, "
            f"COUNT(*) AS n_rows FROM ({c_sql}) c {jt_sql} ({o_sql}) o "
            "ON c.c_custkey = o.o_custkey GROUP BY c_mktsegment"
        )

    compare(df, sql, SF_SMOKE)


# ---------------------------------------------------------------------------
# window family: top-k per group with unique tie-break
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_window_topk(spark, seed):
    rng = random.Random(3000 + seed)
    li = read_table(spark, SF_SMOKE, "lineitem")

    k = rng.randint(1, 5)
    part = sorted(rng.sample(_GROUP_COLS, rng.randint(1, 2)))
    desc = rng.random() < 0.5
    order_col = rng.choice(["l_extendedprice", "l_quantity"])

    order = [
        F.col(order_col).desc() if desc else F.col(order_col).asc(),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    ]
    w = Window.partitionBy(*part).orderBy(*order)
    df = (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*part, "l_orderkey", "l_linenumber", order_col, "rk")
    )

    dir_sql = "DESC" if desc else "ASC"
    part_sql = ", ".join(part)
    sel = f"{part_sql}, l_orderkey, l_linenumber, {order_col}"
    sql = (
        f"SELECT {sel}, rk FROM ("
        f"SELECT {sel}, ROW_NUMBER() OVER (PARTITION BY {part_sql} "
        f"ORDER BY {order_col} {dir_sql}, l_orderkey, l_linenumber) AS rk "
        "FROM lineitem) WHERE rk <= "
        f"{k}"
    )

    compare(df, sql, SF_SMOKE)


# ---------------------------------------------------------------------------
# grouping-extension family: ROLLUP / CUBE over random aggregate sets
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_rollup_cube(spark, seed):
    rng = random.Random(4000 + seed)
    li = read_table(spark, SF_SMOKE, "lineitem")

    pred_col, pred_sql = _random_predicate(rng)
    idx = [0] + rng.sample(range(1, len(_AGGS)), rng.randint(1, 2))
    aggs = [_AGGS[i]() for i in idx]
    mode = rng.choice(["rollup", "cube"])

    filtered = li.filter(pred_col(li))
    grouped = (
        filtered.rollup(*_GROUP_COLS)
        if mode == "rollup"
        else filtered.cube(*_GROUP_COLS)
    )
    df = grouped.agg(*[a[0] for a in aggs])

    select = ", ".join(list(_GROUP_COLS) + [a[1] for a in aggs])
    sql = (
        f"SELECT {select} FROM lineitem WHERE {pred_sql} "
        f"GROUP BY {mode.upper()} ({', '.join(_GROUP_COLS)})"
    )
    compare(df, sql, SF_SMOKE)


# ---------------------------------------------------------------------------
# set-op family: UNION/INTERSECT/EXCEPT (+ALL) of two random projections
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_set_ops(spark, seed):
    rng = random.Random(5000 + seed)
    li = read_table(spark, SF_SMOKE, "lineitem")

    (pa, sa), (pb, sb) = _random_predicate(rng), _random_predicate(rng)
    cols = ["l_orderkey", "l_linenumber", "l_returnflag"]
    a = li.filter(pa(li)).select(*cols)
    b = li.filter(pb(li)).select(*cols)

    op = rng.choice(
        ["union_all", "union", "intersect", "intersect_all",
         "except", "except_all"]
    )
    spark_ops = {
        "union_all": a.unionAll,
        "union": lambda o: a.union(o).distinct(),
        "intersect": a.intersect,
        "intersect_all": a.intersectAll,
        "except": a.subtract,
        "except_all": a.exceptAll,
    }
    sql_ops = {
        "union_all": "UNION ALL",
        "union": "UNION",
        "intersect": "INTERSECT",
        "intersect_all": "INTERSECT ALL",
        "except": "EXCEPT",
        "except_all": "EXCEPT ALL",
    }
    combined = spark_ops[op](b)
    # reduce to a deterministic small result set for exact compare
    df = combined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_orderkey").alias("key_sum"),
    )
    sel = ", ".join(cols)
    sql = (
        "SELECT l_returnflag, COUNT(*) AS cnt, "
        "CAST(SUM(l_orderkey) AS BIGINT) AS key_sum "
        f"FROM (SELECT {sel} FROM lineitem WHERE {sa} {sql_ops[op]} "
        f"SELECT {sel} FROM lineitem WHERE {sb}) GROUP BY l_returnflag"
    )
    compare(df, sql, SF_SMOKE)


# ---------------------------------------------------------------------------
# scalar string-function family over documents (ASCII fixture — engine
# case/collation semantics agree; split() excluded: trailing-empty rules
# differ between Spark and DuckDB)
# ---------------------------------------------------------------------------


def _s_length(rng):
    return (F.length("text").alias("f_len"), "LENGTH(text) AS f_len")


def _s_upper_prefix(rng):
    k = rng.randint(3, 12)
    return (
        F.upper(F.substring("text", 1, k)).alias("f_up"),
        f"UPPER(SUBSTR(text, 1, {k})) AS f_up",
    )


def _s_lower_suffix(rng):
    k = rng.randint(2, 8)
    return (
        F.lower(F.substring("text", k, 2_000_000)).alias("f_low"),
        f"LOWER(SUBSTR(text, {k}, 2000000)) AS f_low",
    )


def _s_concat(rng):
    sep = rng.choice([":", "-", "|"])
    return (
        F.concat(F.col("lang"), F.lit(sep), F.col("source")).alias("f_cat"),
        f"lang || '{sep}' || source AS f_cat",
    )


def _s_replace(rng):
    ch = rng.choice(["e", "a", "t", " "])
    return (
        F.replace(F.col("text"), F.lit(ch), F.lit("_")).alias("f_rep"),
        f"REPLACE(text, '{ch}', '_') AS f_rep",
    )


def _s_trim_len(rng):
    return (
        F.length(F.trim(F.col("text"))).alias("f_trim"),
        "LENGTH(TRIM(text)) AS f_trim",
    )


_STRING_FNS = (
    _s_length, _s_upper_prefix, _s_lower_suffix,
    _s_concat, _s_replace, _s_trim_len,
)


def _string_predicate(rng):
    kind = rng.randrange(3)
    if kind == 0:
        pat = rng.choice(["%the%", "%and%", "%ing%", "%of %"])
        return (F.col("text").like(pat), f"text LIKE '{pat}'")
    if kind == 1:
        lo = rng.randint(50, 400)
        return (F.length("text") >= lo, f"LENGTH(text) >= {lo}")
    langs = sorted(rng.sample(["en", "de", "fr", "es", "it"], 2))
    q = ", ".join(f"'{x}'" for x in langs)
    return (F.col("lang").isin(langs), f"lang IN ({q})")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_string_funcs(spark, seed):
    rng = random.Random(6000 + seed)
    docs = read_table(spark, SF_SMOKE, "documents")

    fns = [f(rng) for f in rng.sample(_STRING_FNS, rng.randint(2, 4))]
    pred_col, pred_sql = _string_predicate(rng)

    df = docs.filter(pred_col).select(
        "doc_id", *[c for c, _ in fns]
    )
    sql = (
        f"SELECT doc_id, {', '.join(s for _, s in fns)} "
        f"FROM documents WHERE {pred_sql}"
    )
    compare(df, sql, SF_SMOKE)


# ---------------------------------------------------------------------------
# 3-table family: lineitem ⋈ orders ⋈ customer with filters + aggregation
# (the TPC-H join spine under randomized predicates)
# ---------------------------------------------------------------------------

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_three_table_join(spark, seed):
    rng = random.Random(7000 + seed)
    li = read_table(spark, SF_SMOKE, "lineitem")
    orders = read_table(spark, SF_SMOKE, "orders")
    cust = read_table(spark, SF_SMOKE, "customer")

    li_pred, li_sql = _random_predicate(rng)

    y = rng.randint(1992, 1997)
    o_pred = orders["o_orderdate"] >= F.lit(datetime(y, 1, 1))
    o_sql = f"o_orderdate >= TIMESTAMP '{y}-01-01'"

    segs = sorted(rng.sample(_SEGMENTS, rng.randint(2, 4)))
    seg_sql = ", ".join(f"'{s}'" for s in segs)

    group = rng.choice(
        [["c_mktsegment"], ["o_orderpriority"],
         ["c_mktsegment", "l_returnflag"]]
    )
    idx = [0] + rng.sample(range(1, len(_AGGS)), rng.randint(1, 2))
    aggs = [_AGGS[i]() for i in idx]

    df = (
        li.filter(li_pred(li))
        .join(orders.filter(o_pred), li["l_orderkey"] == orders["o_orderkey"])
        .join(
            cust.filter(cust["c_mktsegment"].isin(segs)),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .groupBy(*group)
        .agg(*[a[0] for a in aggs])
    )

    select = ", ".join(group + [a[1] for a in aggs])
    sql = (
        f"SELECT {select} FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        f"WHERE ({li_sql}) AND ({o_sql}) "
        f"AND c_mktsegment IN ({seg_sql}) "
        f"GROUP BY {', '.join(group)}"
    )
    compare(df, sql, SF_SMOKE)


# ---------------------------------------------------------------------------
# date/time-function family over orders (argument-order and return-type
# traps: Spark datediff(end, start) vs DuckDB datediff('day', start, end);
# date-returning functions are cast to DATE on both sides)
# ---------------------------------------------------------------------------


def _d_year(rng):
    return (F.year("o_orderdate").alias("f_y"),
            "CAST(year(o_orderdate) AS INT) AS f_y")


def _d_month(rng):
    return (F.month("o_orderdate").alias("f_m"),
            "CAST(month(o_orderdate) AS INT) AS f_m")


def _d_day(rng):
    return (F.dayofmonth("o_orderdate").alias("f_d"),
            "CAST(day(o_orderdate) AS INT) AS f_d")


def _d_trunc(rng):
    unit = rng.choice(["month", "quarter", "year"])
    return (
        F.date_trunc(unit, F.col("o_orderdate")).alias("f_tr"),
        f"date_trunc('{unit}', o_orderdate) AS f_tr",
    )


def _d_diff_epoch(rng):
    y = rng.randint(1992, 1998)
    return (
        F.datediff(F.col("o_orderdate"), F.lit(datetime(y, 1, 1))).alias(
            "f_dd"
        ),
        f"CAST(datediff('day', TIMESTAMP '{y}-01-01', o_orderdate) AS INT)"
        " AS f_dd",
    )


def _d_last_day(rng):
    # DATE-typed outputs land as Python-date objects from Spark but
    # datetime64 from DuckDB — normalize both sides to TIMESTAMP
    return (
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("f_ld"),
        "CAST(last_day(o_orderdate) AS TIMESTAMP) AS f_ld",
    )


_DATE_FNS = (_d_year, _d_month, _d_day, _d_trunc, _d_diff_epoch, _d_last_day)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_date_funcs(spark, seed):
    rng = random.Random(8000 + seed)
    orders = read_table(spark, SF_SMOKE, "orders")

    fns = [f(rng) for f in rng.sample(_DATE_FNS, rng.randint(2, 4))]
    y = rng.randint(1992, 1997)
    m = rng.randint(1, 12)
    pred = orders["o_orderdate"] >= F.lit(datetime(y, m, 1))
    pred_sql = f"o_orderdate >= TIMESTAMP '{y}-{m:02d}-01'"
    pris = sorted(rng.sample(_PRIORITIES, rng.randint(2, 4)))
    pri_sql = ", ".join(f"'{p}'" for p in pris)

    df = (
        orders.filter(pred & orders["o_orderpriority"].isin(pris))
        .select("o_orderkey", *[c for c, _ in fns])
    )
    sql = (
        f"SELECT o_orderkey, {', '.join(s for _, s in fns)} FROM orders "
        f"WHERE ({pred_sql}) AND o_orderpriority IN ({pri_sql})"
    )
    compare(df, sql, SF_SMOKE)


# ---------------------------------------------------------------------------
# window-frame fuzz: random ROWS/RANGE frames x aggregates vs DuckDB
# ---------------------------------------------------------------------------

def _frame_spec(seed: int) -> dict:
    rng = random.Random(seed * 6101 + 5)
    kind = rng.choice(["rows", "range"])
    # bounds: (preceding, following) with a few unbounded variants
    lo = rng.choice([None, 0, 1, 2, 5])          # None = UNBOUNDED PRECEDING
    hi = rng.choice([0, 1, 3])                   # k FOLLOWING (0 = CURRENT ROW)
    agg = rng.choice(["sum", "min", "max", "count", "avg"])
    return {"kind": kind, "lo": lo, "hi": hi, "agg": agg}


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_window_frames_vs_duckdb(spark, seed):
    """Random ROWS/RANGE frames over lineitem: partition by l_suppkey,
    ROWS frames order by the unique (l_orderkey, l_linenumber) composite
    (tie-free — frame contents identical on both engines), RANGE frames
    order by integer-valued l_quantity (value-offset windows; ties share
    one frame by ANSI semantics on both engines). Quantity sums/counts
    are integer-exact; avg goes through the decimal-mean convention."""
    spec = _frame_spec(seed)
    li = read_table(spark, SF_SMOKE, "lineitem").filter(
        F.col("l_suppkey") % 10 == 0
    )
    lo_s = "UNBOUNDED PRECEDING" if spec["lo"] is None else (
        "CURRENT ROW" if spec["lo"] == 0 else f"{spec['lo']} PRECEDING"
    )
    hi_s = "CURRENT ROW" if spec["hi"] == 0 else f"{spec['hi']} FOLLOWING"
    lo_b = Window.unboundedPreceding if spec["lo"] is None else -spec["lo"]

    if spec["kind"] == "rows":
        order_sql = "l_orderkey, l_linenumber"
        w = (
            Window.partitionBy("l_suppkey")
            .orderBy("l_orderkey", "l_linenumber")
            .rowsBetween(lo_b, spec["hi"])
        )
        frame_sql = f"ROWS BETWEEN {lo_s} AND {hi_s}"
    else:
        order_sql = "l_quantity"
        w = (
            Window.partitionBy("l_suppkey")
            .orderBy("l_quantity")
            .rangeBetween(lo_b, spec["hi"])
        )
        frame_sql = f"RANGE BETWEEN {lo_s} AND {hi_s}"

    if spec["agg"] == "count":
        expr = F.count(F.lit(1)).over(w).cast("long")
        agg_sql = "CAST(count(*) OVER w AS BIGINT)"
    elif spec["agg"] == "avg":
        # integer-valued quantities: exact decimal mean, 6dp grid
        expr = (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w)
            / F.count(F.lit(1)).over(w)
        ).cast("decimal(28,6)").cast("double")
        agg_sql = (
            "CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w"
            " / count(*) OVER w AS DECIMAL(28,6)) AS DOUBLE)"
        )
    else:
        fn = {"sum": F.sum, "min": F.min, "max": F.max}[spec["agg"]]
        expr = fn("l_quantity").over(w)
        agg_sql = f"{spec['agg']}(l_quantity) OVER w"

    got = li.select(
        "l_orderkey", "l_linenumber", "l_suppkey",
        expr.alias("win_val"),
    )
    sql = f"""
    SELECT l_orderkey, l_linenumber, l_suppkey,
           {agg_sql} AS win_val
    FROM lineitem
    WHERE l_suppkey % 10 = 0
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY {order_sql}
                 {frame_sql})
    """
    compare(got, sql, SF_SMOKE)


def test_fuzz_window_frame_specs_cover_the_space():
    specs = [_frame_spec(s) for s in range(10)]
    assert {s["kind"] for s in specs} == {"rows", "range"}
    assert len({s["agg"] for s in specs}) >= 3
    assert any(s["lo"] is None for s in specs)
    assert any(s["lo"] not in (None, 0) for s in specs)
