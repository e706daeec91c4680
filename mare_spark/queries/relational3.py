"""Third relational batch: the remaining classic TPC-H query shapes adapted
to the fixture schema (no partsupp/phone/shipmode columns — shapes preserved,
columns substituted). All DuckDB-oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mare_spark.queries._decimal import MONEY4, dsum, dsum_raw
from mare_spark.registry import register
from mare_spark.tables import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


@register(
    "q2_cheapest_supplier_per_part",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             min((CAST(round(l_extendedprice * 100) AS BIGINT) * 10000)
                 -- round() before the cast: DuckDB CAST rounds a
                 -- non-integral double, Spark CAST truncates — pin
                 -- the same integer on both engines (no-op today)
                 // CAST(round(l_quantity) AS BIGINT)) AS unit_price
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    )
    SELECT u.l_partkey, min(u.l_suppkey) AS best_suppkey, u.unit_price AS best_price
    FROM unit u
    JOIN (SELECT l_partkey, min(unit_price) AS mn FROM unit GROUP BY l_partkey) m
      ON u.l_partkey = m.l_partkey AND u.unit_price = m.mn
    GROUP BY u.l_partkey, u.unit_price
    """,
)
def q2_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-within-group + join back (cheapest supplier per
    part by lowest unit price; min-suppkey tiebreak). Unit price is computed
    in integer micro-cents with integer division — a float quotient rounds
    differently across engines exactly at the .00005 boundaries this data
    is full of (prices have 2dp, quantities are integral)."""
    li = _t(spark, sf_dir, "lineitem")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT) * 10000"
                " div CAST(round(l_quantity) AS BIGINT)"
            )
        ).alias("unit_price")
    )
    mins = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("mn"))
    return (
        unit.join(mins, ["l_partkey"])
        .filter(F.col("unit_price") == F.col("mn"))
        .groupBy("l_partkey", "unit_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
        .select("l_partkey", "best_suppkey", F.col("unit_price").alias("best_price"))
    )


@register(
    "q7_volume_between_nations",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l.l_shipdate) AS yr,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS volume
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
    GROUP BY cn.n_name, sn.n_name, year(l.l_shipdate)
    """,
)
def q7_volume_between_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year
    (nation joined twice under different roles, both broadcast)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(
            ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
        )
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("yr"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), MONEY4).alias(
                "volume"
            )
        )
    )


# ONE text for both the registered oracle and the spark.sql body (the
# shared-constant convention from relational.py/relational2.py)
_Q11_SQL = """
    WITH sup AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS val
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, CAST(round(val, 2) AS DOUBLE) AS supplier_value
    FROM sup
    WHERE CAST(val AS DOUBLE) >
          (SELECT CAST(sum(val) AS DOUBLE) / count(*) * 1.05 FROM sup)
"""


@register(
    "q11_important_suppliers",
    oracle=_Q11_SQL,
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group value above a scalar-subquery threshold
    (1.05x the mean supplier value — scale-free so the result is non-empty
    at every SF of this near-uniform data; via SQL so Catalyst plans the
    scalar subquery natively)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q11_SQL)


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT n_orders, count(*) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation over a left join (order-count
    histogram including zero-order customers)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: max-of-aggregate scalar subquery identifying the top
    revenue supplier(s) in a quarter."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), MONEY4).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS price, sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN-subquery over a grouped HAVING (big-quantity orders)
    → left-semi join in the plan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("price"),
            "total_qty",
        )
    )


@register(
    "q19_disjunctive_brackets",
    oracle="""
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three OR'd predicate brackets spanning both join sides —
    exercises CNF conversion / partial pushdown through the join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(bracket).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), MONEY4).alias(
            "revenue"
        )
    )


@register(
    "q22_idle_wealthy_customers",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_custs,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                / count(c_acctbal)
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti join (wealthy
    customers with no large order, by segment — every fixture customer has
    SOME order, so plain never-ordered would be hollow)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n_bal = F.count("c_acctbal")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        # guarded like davg: an empty positive-balance set must yield a
        # NULL threshold (-> empty result, matching the oracle), not an
        # ANSI DIVIDE_BY_ZERO; the RAW quotient is kept (the oracle's)
        F.when(n_bal > 0, dsum_raw("c_acctbal") / n_bal).alias("threshold")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(
            o.filter(F.col("o_totalprice") > 400000),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )
