"""Fourth relational batch: the remaining adaptable TPC-H query shapes
(Q8, Q9, Q10, Q12, Q16, Q17, Q20, Q21) on the fixture schema. Columns the
fixtures lack are substituted shape-preservingly (no partsupp → lineitem
supplies the part-supplier relation; no l_shipmode → l_linestatus; no
ps_supplycost → p_retailprice), exactly as the earlier batches do. All
DuckDB-oracle-checked.

Scale notes: only fixed-cardinality dims (nation, and region in Q8) are
broadcast-hinted; part/supplier/customer grow with SF, so their joins are
left to AQE to pick broadcast vs shuffled by measured size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mare_spark.queries._decimal import MONEY4, dsum, dsum_raw, fround
from mare_spark.registry import register
from mare_spark.tables import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


@register(
    "q8_national_market_share",
    oracle="""
    WITH all_volumes AS (
      SELECT year(o.o_orderdate) AS yr,
             sn.n_name AS supp_nation,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    )
    SELECT yr,
           CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
             AS nation_volume,
           CAST(round(sum(volume), 2) AS DOUBLE) AS total_volume,
           (floor(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                  / CAST(sum(volume) AS DOUBLE) * 1000000.0 + 0.5)
            / 1000000.0) AS mkt_share
    FROM all_volumes
    GROUP BY yr
    """,
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's order volume for a
    part type, by year — the 8-way star join (nation twice, under customer
    and supplier roles). Share numerator/denominator are summed in one
    aggregate pass (conditional sum), not two scans."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY4)
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0).cast(MONEY4)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            dsum(nation_vol, MONEY4).alias("nation_volume"),
            dsum(volume, MONEY4).alias("total_volume"),
            fround(
                F.sum(nation_vol).cast("double") / F.sum(volume).cast("double"), 6
            ).alias("mkt_share"),
        )
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * l.l_quantity * 0.1 AS DECIMAL(18,5))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per nation per year over a part-name LIKE
    filter; 5-way join (ps_supplycost → p_retailprice*0.1 cost proxy)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("p_retailprice") * F.col("l_quantity") * 0.1,
                "decimal(18,5)",
            ).alias("profit")
        )
    )


@register(
    "q10_returned_item_reporting",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    half-year window. The LIMIT makes determinism part of the contract:
    ordering is on the ROUNDED revenue with a custkey tiebreak, so both
    engines select the same 20 rows regardless of float summation order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), MONEY4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of high/low order priorities per
    class (l_shipmode → l_linestatus substitution), one-year ship window."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) bucket
    with value exclusions and a NOT-IN sub-select (partsupp → the observed
    lineitem part-supplier relation; complaint suppliers → negative
    balance), expressed as an anti-join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        l.join(bad, "l_suppkey", "left_anti")
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / count(l_quantity)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT (floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                  / 7.0 * 100.0 + 0.5) / 100.0)
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa    ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < pa.qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity orders of one
    brand. The correlated scalar subquery becomes a grouped aggregate joined
    back on partkey (what Catalyst would rewrite it to anyway). The
    threshold compare is exact across engines: quantities accumulate as
    exact decimals (see queries/_decimal.py), so avg and 0.2*avg are
    bit-identical doubles on both sides."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    n_q = F.count("l_quantity")
    pa = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        # guarded like davg: an all-NULL-quantity group must yield a NULL
        # threshold (rows filtered, matching the oracle's NULL/0 -> NULL),
        # not an ANSI DIVIDE_BY_ZERO; the RAW quotient is kept
        F.when(n_q > 0, F.lit(0.2) * (dsum_raw("l_quantity") / n_q)).alias(
            "qty_threshold"
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(pa, l.l_partkey == pa.pa_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(fround(dsum_raw("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q21_sole_returning_supplier",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the correlated EXISTS + NOT-EXISTS pair (supplier
    who is the ONLY one with returned items on a multi-supplier finalized
    order; late-delivery dates → returnflag substitution). Instead of two
    correlated per-row probes, the order-level facts are aggregated once —
    distinct suppliers and distinct returning suppliers per order — and
    joined back: one extra shuffle on orderkey replaces two subquery scans,
    the rewrite Catalyst cannot do automatically for correlated NOT EXISTS."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    order_facts = l.groupBy(F.col("l_orderkey").alias("of_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    l1 = l.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(
            order_facts,
            (F.col("l_orderkey") == F.col("of_orderkey"))
            & (F.col("n_supp") >= 2)
            & (F.col("n_supp_r") == 1),
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "q20_promo_volume_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'PROMO'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 50
    )
    ORDER BY s.s_name
    """,
)
def q20_promo_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant volume of one part
    class in a year — an IN over a grouped-HAVING subquery, expressed as a
    semi-join onto the aggregated qualifying-supplier set."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    qualifying = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(qualifying, "s_suppkey", "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )
