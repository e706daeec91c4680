"""Relational query corpus (SURVEY.md §2B, relational family).

Each query is a thin declaration over the DataFrame API — Catalyst owns the
physical strategy (pushdown, join selection, partial aggregation, AQE). The
DuckDB oracle string in each ``register(..., oracle=...)`` is the semantic
contract, not the implementation.

Reference parity note: mcapuccini/MaRe has **no** relational surface (see
/root/reference/src/main/scala/se/uu/it/mare/MaRe.scala — its only operators
are containerized partition map/reduce + repartition). This module is the
capability-equivalent relational surface required by the engine blueprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mare_spark.queries._decimal import (
    MONEY4,
    MONEY6,
    davg,
    dsum,
    fround,
)
from mare_spark.registry import register
from mare_spark.tables import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary.
# scan → filter (pushed to parquet) → hash agg (partial+final) → sort.
# At 100 TB this plan is shuffle-minimal: one exchange on the 2 low-cardinality
# group keys, partial aggregation map-side, AQE coalesces the post-shuffle
# partitions.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    bench=True,
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)       AS sum_qty,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)  AS sum_base_price,
      CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,4))), 2) AS DOUBLE)                  AS sum_disc_price,
      CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          AS DECIMAL(18,6))), 2) AS DOUBLE)                  AS sum_charge,
      (floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_quantity) * 10000.0 + 0.5) / 10000.0)                 AS avg_qty,
      (floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_extendedprice) * 10000.0 + 0.5) / 10000.0)            AS avg_price,
      (floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_discount) * 1000000.0 + 0.5) / 1000000.0)             AS avg_disc,
      count(*)                                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, MONEY4).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), MONEY6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ===========================================================================
# Joins (SURVEY §2B: inner/left/right/full equi, broadcast, cross, semi,
# anti, non-equi range). Catalyst picks broadcast-hash for the small side
# automatically; we hint F.broadcast on fixed-size dims (region/nation) so
# the choice is locked in at any scale factor.
# ===========================================================================

@register(
    "q3_shipping_priority",
    bench=True,
    oracle="""
    SELECT
      o.o_orderkey,
      CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join, filtered on both fact sides, top-10 by
    revenue. Deterministic limit via (revenue desc, orderkey) tiebreak."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), MONEY4).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    bench=True,
    oracle="""
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-way join; nation/region are fixed-size dims →
    explicitly broadcast so the plan never shuffles them at any SF."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), MONEY4).alias(
                "revenue"
            )
        )
    )


@register(
    "q_join_left_outer",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey)                        AS n_orders,
           CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0), 2) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (count = 0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)),
                2,
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "q_join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, round(o.o_totalprice, 2) AS price
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join with a join-side predicate (kept in ON, not WHERE)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return o.join(
        c,
        (o.o_custkey == c.c_custkey) & (o.o_totalprice > 400000),
        "right",
    ).select(
        "c_custkey", "c_name", "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )


@register(
    "q_join_full_outer",
    oracle="""
    WITH cn AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), sn AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(cn.n_customers, 0)          AS n_customers,
           coalesce(sn.n_suppliers, 0)          AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates on nationkey."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return c.join(s, "nationkey", "full").select(
        F.col("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "q_join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS: customers with a big order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)
def q_join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS: customers with no very large order
    (every fixture customer has SOME order, so plain never-ordered would be
    a hollow 0-row check)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, p.o_orderpriority
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (both sides tiny; BroadcastNestedLoop)."""
    r = _t(spark, sf_dir, "region").select("r_name")
    p = _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(p)


@register(
    "q_join_range_band",
    oracle="""
    SELECT b.band, count(*) AS n_parts,
           (floor(CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                  / count(p.p_retailprice) * 10000.0 + 0.5) / 10000.0) AS avg_price
    FROM part p
    JOIN (VALUES ('budget', 900.0, 935.0),
                 ('mid',    935.0, 970.0),
                 ('premium',970.0, 1000.0)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def q_join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) range join against a tiny in-line band table.
    Spark executes this as BroadcastNestedLoopJoin — correct choice since
    the band side is O(1) rows at any data scale."""
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 900.0, 935.0), ("mid", 935.0, 970.0), ("premium", 970.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            davg("p_retailprice").alias("avg_price"),
        )
    )


# ===========================================================================
# Aggregations (SURVEY §2B: sum/count/avg/min/max/stddev/var, distinct,
# approx_count_distinct, rollup/cube/grouping sets, having, pivot).
# All run as partial (map-side) + final HashAggregate — one shuffle on the
# group keys, which is the minimum possible at any scale.
# ===========================================================================

@register(
    "q_agg_stats",
    oracle="""
    WITH c AS (
      -- exact integer cents: the decimal cast fixes the 2dp value, the
      -- *100 is exact in decimal (a double *100 would NOT be)
      SELECT l_returnflag, l_extendedprice,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                  AS DECIMAL(18,0)) AS pc,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                  AS DECIMAL(18,0)) AS qc
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             round(min(l_extendedprice), 2) AS min_price,
             round(max(l_extendedprice), 2) AS max_price,
             -- HUGEINT -> DOUBLE is ONE correctly-rounded conversion of
             -- an exact integer, then /100.0 or /10000.0 is the same
             -- IEEE op Spark applies — identical doubles by
             -- construction. The old CAST(DECIMAL(38,4) AS DOUBLE) was
             -- a double-rounding (int128->double, then /10^4) that
             -- bit-diverged from Spark's BigDecimal conversion past
             -- 2^53 scaled units (r8 review, verified live at sf0.001)
             CAST(CAST(sum(pc) AS HUGEINT) AS DOUBLE) / 100.0 AS pv,
             CAST(CAST(sum(pc * pc) AS HUGEINT) AS DOUBLE) / 10000.0 AS pq,
             CAST(CAST(sum(qc) AS HUGEINT) AS DOUBLE) / 100.0 AS qv,
             CAST(CAST(sum(qc * qc) AS HUGEINT) AS DOUBLE) / 10000.0 AS qq,
             count(*) AS n
      FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, min_price, max_price,
           (CASE WHEN n > 1 THEN
             (floor(sqrt(greatest((pq - pv * pv / n) / (n - 1), 0.0))
                    * 10000.0 + 0.5) / 10000.0) END) AS std_price,
           (CASE WHEN n > 1 THEN
             (floor(greatest((qq - qv * qv / n) / (n - 1), 0.0)
                    * 10000.0 + 0.5) / 10000.0) END) AS var_qty,
           n
    FROM s
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group (sample stddev/variance).

    Hash-stable moments: the native stddev_samp/var_samp fold doubles in
    partition order — Spark and DuckDB accumulate different float error,
    so a rounded result can flip. Instead both engines compute the exact
    DECIMAL first and second moments (2dp fixture columns square exactly
    at 4dp), derive variance from identical doubles, and grid-snap with
    fround — the same convention as events_user_anomalies."""
    li = _t(spark, sf_dir, "lineitem")
    # exact integer cents (decimal *100 is exact; a double *100 is not),
    # summed exactly, converted to double ONCE, then divided by the same
    # IEEE constants the oracle divides by — identical doubles by
    # construction (r8 review: the old decimal(38,4)->double cast
    # bit-diverged from DuckDB's int128 double-rounding past 2^53)
    pc = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "decimal(18,0)"
    )
    qc = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast(
        "decimal(18,0)"
    )
    g = li.groupBy("l_returnflag").agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        (F.sum(pc).cast("decimal(38,0)").cast("double") / 100.0).alias("pv"),
        (F.sum(pc * pc).cast("decimal(38,0)").cast("double") / 10000.0)
        .alias("pq"),
        (F.sum(qc).cast("decimal(38,0)").cast("double") / 100.0).alias("qv"),
        (F.sum(qc * qc).cast("decimal(38,0)").cast("double") / 10000.0)
        .alias("qq"),
        F.count("*").alias("n"),
    )
    nn = F.col("n")
    return g.select(
        "l_returnflag",
        "min_price",
        "max_price",
        # greatest(.., 0): catastrophic cancellation in pq - pv²/n can
        # give a TINY negative variance for constant-valued groups (e.g.
        # five rows of 0.01 → -1e-19); sqrt of that NaNs on Spark and
        # hard-errors DuckDB. A constant group's true moment is 0.0 —
        # clamp identically on both sides.
        F.when(
            nn > 1,
            fround(
                F.sqrt(F.greatest(
                    (F.col("pq") - F.col("pv") * F.col("pv") / nn) / (nn - 1),
                    F.lit(0.0),
                )),
                4,
            ),
        ).alias("std_price"),
        F.when(
            nn > 1,
            fround(F.greatest(
                (F.col("qq") - F.col("qv") * F.col("qv") / nn) / (nn - 1),
                F.lit(0.0),
            ), 4),
        ).alias("var_qty"),
        "n",
    )


@register(
    "q_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple count-distincts in one aggregate (Catalyst expands to
    a single pass with grouping-id rewrite, not N scans)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_agg_approx_distinct",
    oracle=None,  # approximate: driver does the rows-only check; exactness
    # vs duckdb's HLL is not defined. Accuracy asserted in tests.
    category="relational",
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for distinct
    counts: no exact-distinct shuffle explosion, fixed-size sketches merge
    associatively map-side."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: (flag, status), (flag), ()."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two keys (all 4 grouping sets)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice").alias("sum_price")
    )


# ONE text for both the registered oracle and the spark.sql body — two
# hand-synced copies silently decouple the engine query from its oracle
_GROUPING_SETS_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


@register(
    "q_grouping_sets",
    oracle=_GROUPING_SETS_SQL,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL entry point."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "q_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15 AND sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1000000
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("spent"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_raw_spent"),
        )
        .filter((F.col("n_orders") >= 15) & (F.col("_raw_spent") > 1000000))
        .drop("_raw_spent")
    )


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(round(sum(CASE WHEN l_linestatus = 'O'
                          THEN CAST(l_quantity AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS qty_O,
           CAST(round(sum(CASE WHEN l_linestatus = 'F'
                          THEN CAST(l_quantity AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on linestatus with an explicit value list (explicit values keep
    the plan single-pass; without them Spark runs an extra distinct scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


# ===========================================================================
# Window functions (SURVEY §2B: ranking, lag/lead, running aggregates with
# rows/range frames, ntile, per-group top-k). Window partition keys become
# the shuffle keys; ordering inside a partition is a local sort. Ordering
# columns always include a unique tiebreaker where row-identity matters
# (row_number, ntile, lag/lead) so results are deterministic on both engines.
# ===========================================================================

@register(
    "q_window_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
    FROM customer
    QUALIFY rnk <= 5
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank per nation, keep top-5 ranks."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@register(
    "q_window_topk_per_group",
    bench=True,
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical top-k-per-group plan:
    one shuffle on the group key, local sort, early filter on row_number
    (Spark pushes a per-partition limit via WindowGroupLimit)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS price,
           round(lag(o_totalprice)  OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each customer's order history (unique tiebreak)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@register(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
           (floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / count(*) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                  * 10000.0 + 0.5) / 10000.0) AS moving_avg_3
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average (ROWS frames)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            2,
        )
        .cast("double")
        .alias("running_total"),
        fround(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(-2, W.currentRow))
            .cast("double")
            / F.count("*").over(w.rowsBetween(-2, W.currentRow)),
            4,
        ).alias("moving_avg_3"),
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT p_partkey, p_size,
           count(*) OVER (ORDER BY p_size
                          RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS n_similar_size
    FROM part
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering (peers counted by value distance).
    Global window (no partition) — fine for dimension-sized input; fact-sized
    input would need a partition key to avoid a single-task sort."""
    p = _t(spark, sf_dir, "part")
    w = W.orderBy("p_size").rangeBetween(-2, 2)
    return p.select("p_partkey", "p_size", F.count("*").over(w).alias("n_similar_size"))


@register(
    "q_window_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           round(first_value(c_acctbal) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
                          AS top_bal,
           round(last_value(c_acctbal) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
                          AS bottom_bal
    FROM customer
    """,
)
def q_window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles + first/last value over the full partition frame."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.first("c_acctbal").over(wf), 2).alias("top_bal"),
        F.round(F.last("c_acctbal").over(wf), 2).alias("bottom_bal"),
    )


# ===========================================================================
# Sort / limit / nulls ordering
# ===========================================================================

@register(
    "q_orderby_limit",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark executes as TakeOrderedAndProject (per-partition
    heap + merge of N), never a full global sort — the right plan at 100 TB."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("price"), "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@register(
    "q_sort_nulls_last",
    oracle="""
    SELECT c_custkey, nullif(round(c_acctbal, 2), 0) AS bal
    FROM customer
    ORDER BY bal DESC NULLS LAST, c_custkey
    LIMIT 25
    """,
)
def q_sort_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST and a deterministic limit."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.nullif(F.round("c_acctbal", 2), F.lit(0.0)).alias("bal"),
        )
        .orderBy(F.col("bal").desc_nulls_last(), F.col("c_custkey").asc())
        .limit(25)
    )


# ===========================================================================
# Set operations
# ===========================================================================

@register(
    "q_union_all",
    oracle="""
    SELECT 'high' AS tier, o_orderkey, round(o_totalprice, 2) AS price
    FROM orders WHERE o_totalprice > 450000
    UNION ALL
    SELECT 'low' AS tier, o_orderkey, round(o_totalprice, 2) AS price
    FROM orders WHERE o_totalprice < 1500
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two disjoint slices with a tag column."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 450000).select(
        F.lit("high").alias("tier"), "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    lo = o.filter(F.col("o_totalprice") < 1500).select(
        F.lit("low").alias("tier"), "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    return hi.unionAll(lo)


@register(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT DISTINCT c_mktsegment AS segment FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT DISTINCT c_mktsegment AS segment FROM customer WHERE c_acctbal < -900
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two segment sets."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 9000).select(F.col("c_mktsegment").alias("segment"))
    b = c.filter(F.col("c_acctbal") < -900).select(F.col("c_mktsegment").alias("segment"))
    return a.intersect(b)


@register(
    "q_except",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers whose orders are never status-F."""
    o = _t(spark, sf_dir, "orders")
    all_c = o.select(F.col("o_custkey").alias("custkey"))
    f_c = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_c.subtract(f_c)  # EXCEPT (distinct set semantics)


@register(
    "q_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the two sides),
    Spark's ``intersectAll``."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)


@register(
    "q_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity = left minus right),
    Spark's ``exceptAll``."""
    o = _t(spark, sf_dir, "orders")
    all_c = o.select(F.col("o_custkey").alias("custkey"))
    f_c = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_c.exceptAll(f_c)


# ===========================================================================
# Scalar function coverage (strings, dates, math/conditional, arrays, JSON).
# All JVM-side built-ins — whole-stage-codegen'd, no Python in the hot path.
# ===========================================================================

@register(
    "q_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, round(l_discount, 2) AS disc
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 12
      AND round(l_discount, 2) IN (0.02, 0.04, 0.06)
      AND l_returnflag LIKE 'A%'
      AND NOT (l_linestatus = 'O' AND l_tax > 0.05)
      AND l_shipdate IS NOT NULL
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate coverage: BETWEEN / IN / LIKE / NOT / IS NULL —
    all pushed into the parquet scan by Catalyst."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 12)
        & F.round("l_discount", 2).isin(0.02, 0.04, 0.06)
        & F.col("l_returnflag").like("A%")
        & ~((F.col("l_linestatus") == "O") & (F.col("l_tax") > 0.05))
        & F.col("l_shipdate").isNotNull()
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", F.round("l_discount", 2).alias("disc")
    )


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                              AS name_upper,
           lower(p_brand)                             AS brand_lower,
           length(p_name)                             AS name_len,
           substring(p_name, 1, 5)                    AS name_head,
           -- concat_ws, like the engine: a NULL side is SKIPPED
           -- (DuckDB concat would keep the ':' and treat NULL as '')
           concat_ws(':', p_brand, p_type)            AS brand_type,
           trim('  ' || p_name || ' ')                AS name_trim,
           regexp_extract(p_brand, '([0-9]+)', 1)     AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
           len(string_split(p_name, ' '))             AS n_words
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devowel"),
        F.size(F.split("p_name", " ", -1)).alias("n_words"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                               AS yr,
           month(o_orderdate)                              AS mo,
           day(o_orderdate)                                AS dom,
           date_trunc('month', o_orderdate)                AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           DATE '2000-01-01' - CAST(o_orderdate AS DATE)   AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT)              AS epoch_s
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery (year/month/day, trunc, date_add,
    datediff, unix epoch)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "q_math_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 50000), 2)  AS price_dev,
           CAST(ceil(l_quantity / 7) AS BIGINT)    AS qty_ceil,
           CAST(floor(l_quantity / 7) AS BIGINT)   AS qty_floor,
           (floor(pow(l_discount + 1, 2) * 1000000.0 + 0.5)
            / 1000000.0)                           AS disc_sq,
           (floor(ln(l_extendedprice) * 1000000.0 + 0.5)
            / 1000000.0)                           AS log_price,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 15 THEN 'mid'
                ELSE 'small' END                   AS qty_class,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def q_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + CASE/WHEN + coalesce/nullif battery."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("price_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("qty_floor"),
        fround(F.pow(F.col("l_discount") + 1, 2), 6).alias("disc_sq"),
        fround(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 15, "mid")
        .otherwise("small")
        .alias("qty_class"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


@register(
    "q_array_funcs",
    oracle="""
    WITH words AS (
      SELECT p_partkey,
             string_split(p_name, ' ')  AS name_words
      FROM part
    )
    SELECT p_partkey,
           len(name_words)                             AS n_words,
           list_contains(name_words, 'widget')         AS has_widget,
           array_to_string(list_transform(name_words, w -> upper(w)), ' ')
                                                       AS words_upper,
           name_words[1]                               AS first_word
    FROM words
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: size / contains / transform / element_at.

    The transformed array is re-joined to a string on both sides so the
    registered result stays scalar-only (harness canonicalizer contract)."""
    p = _t(spark, sf_dir, "part")
    words = F.split("p_name", " ", -1)
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_contains(words, "widget").alias("has_widget"),
        F.concat_ws(" ", F.transform(words, lambda w: F.upper(w))).alias(
            "words_upper"
        ),
        F.element_at(words, 1).alias("first_word"),
    )


@register(
    "q_explode_word_count",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
)
def q_explode_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (UNNEST) + aggregate — classic word count."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ", -1)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_json_funcs",
    oracle="""
    SELECT event_type,
           count(*)                                                  AS n,
           (floor(avg(CAST(json_extract_string(props, '$.k') AS INT))
                  * 10000.0 + 0.5) / 10000.0)                     AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INT))       AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column
    (get_json_object ≡ duckdb json_extract_string)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        fround(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q_from_json_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value
    FROM events
    WHERE event_id % 20 = 0
    """,
)
def q_from_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → MapType, then element_at — the typed-map path for
    semi-structured columns."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    m = F.from_json("props", "map<string,int>")
    return e.select("event_id", F.element_at(m, F.lit("k")).alias("k_value"))


# ===========================================================================
# SQL entry point (engine.sql over registered views)
# ===========================================================================

_RETURNED_ITEMS_SQL = """
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@register(
    "q_sql_returned_items",
    bench=True,
    oracle=_RETURNED_ITEMS_SQL,
)
def q_sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style via the raw SQL entry point — exercises the
    temp-view catalog + spark.sql lifecycle (same Catalyst plan as the
    DataFrame API)."""
    from mare_spark.tables import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_RETURNED_ITEMS_SQL)


_ABOVE_AVG_SQL = """
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                       / count(o_totalprice) FROM orders)
"""


@register(
    "q_subquery_above_avg",
    oracle=_ABOVE_AVG_SQL,
)
def q_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders above 1.5× the mean)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ABOVE_AVG_SQL)
