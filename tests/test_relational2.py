"""Differential tests for the extended corpus: approx percentiles vs exact,
and the two as-of join implementations against each other."""

from __future__ import annotations

from pyspark.sql import functions as F

from mare_spark.operators.asof import asof_join, asof_join_pandas
from mare_spark.queries.relational2 import (
    q_percentiles_approx,
    q_percentiles_exact,
)
from mare_spark.tables import read_table
from tests.conftest import SF_ORACLE


def test_approx_percentiles_close_to_exact(spark):
    exact = {
        r.l_returnflag: (r.p50, r.p95)
        for r in q_percentiles_exact(spark, SF_ORACLE).collect()
    }
    approx = {
        r.l_returnflag: (r.p50, r.p95)
        for r in q_percentiles_approx(spark, SF_ORACLE).collect()
    }
    for flag, (e50, e95) in exact.items():
        a50, a95 = approx[flag]
        assert abs(a50 - e50) / e50 < 0.01, (flag, a50, e50)
        assert abs(a95 - e95) / e95 < 0.01, (flag, a95, e95)


def test_asof_composition_equals_pandas_variant(spark):
    e = read_table(spark, SF_ORACLE, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "value")

    a = asof_join(purchases, views, on="ts", by="user_id", right_cols=["value"])
    b = asof_join_pandas(purchases, views, on="ts", by="user_id", right_cols=["value"])

    ka = sorted((r.event_id, r.value_asof) for r in a.collect())
    kb = sorted((r.event_id, r.value_asof) for r in b.collect())
    assert ka == kb
    # left rows all preserved
    assert len(ka) == purchases.count()


def test_asof_matched_row_taken_atomically(spark):
    """The matched right row is attached verbatim: a NULL field in the most
    recent matching row must NOT be backfilled from an older right row, and
    all carried columns must come from the SAME right row (merge_asof /
    DuckDB ASOF JOIN semantics)."""
    left = spark.createDataFrame([(1, 10, "x")], "k int, t int, payload string")
    right = spark.createDataFrame(
        [(1, 1, 100.0, "old"), (1, 5, None, "new")],
        "k int, t int, v double, tag string",
    )
    out = asof_join(left, right, on="t", by="k", right_cols=["v", "tag"]).collect()
    assert len(out) == 1
    # matched row is (t=5, v=NULL, tag='new') — v stays NULL, tag from same row
    assert out[0].v_asof is None
    assert out[0].tag_asof == "new"
    # pandas variant agrees
    outp = asof_join_pandas(
        left, right, on="t", by="k", right_cols=["v", "tag"]
    ).collect()
    assert len(outp) == 1
    assert outp[0].v_asof is None and outp[0].tag_asof == "new"


def test_asof_no_prior_right_row_gives_null(spark):
    left = spark.createDataFrame([(1, 5, "x")], "k int, t int, payload string")
    right = spark.createDataFrame([(1, 10, 99.0)], "k int, t int, v double")
    out = asof_join(left, right, on="t", by="k", right_cols=["v"]).collect()
    assert len(out) == 1
    assert out[0].v_asof is None


def test_asof_join_null_timestamps_never_match(spark):
    """NULL event times: a NULL-ts left row gets a NULL carry (both
    directions), and a NULL-ts right row is never carried — matching
    SQL/DuckDB ASOF and pd.merge_asof semantics."""
    from mare_spark.operators.asof import asof_join, asof_join_pandas

    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", None), (3, "u", 30.0)],
        "id long, k string, t double",
    )
    right = spark.createDataFrame(
        [("u", None, -1.0), ("u", 20.0, 5.0)],
        "k string, t double, v double",
    )
    for direction, want in (
        ("backward", {1: None, 2: None, 3: 5.0}),
        ("forward", {1: 5.0, 2: None, 3: None}),
    ):
        got = {
            r.id: r.v_asof
            for r in asof_join(
                left, right, on="t", by="k",
                right_cols=["v"], direction=direction,
            ).collect()
        }
        assert got == want, (direction, got)
    got_pd = {
        r.id: r.v_asof
        for r in asof_join_pandas(
            left, right, on="t", by="k", right_cols=["v"]
        ).collect()
    }
    assert got_pd == {1: None, 2: None, 3: 5.0}


def test_asof_pandas_nearest_and_tolerance(spark):
    """The pandas tier's extra options: direction='nearest' picks the
    closer of prior/next (ties -> prior, merge_asof semantics), and a
    tolerance bound drops matches farther than the window."""
    from mare_spark.operators.asof import asof_join_pandas

    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 18.0), (3, "u", 100.0)],
        "id long, k string, t double",
    )
    right = spark.createDataFrame(
        [("u", 8.0, 1.0), ("u", 21.0, 2.0)],
        "k string, t double, v double",
    )
    nearest = {
        r.id: r.v_asof
        for r in asof_join_pandas(
            left, right, on="t", by="k", right_cols=["v"],
            direction="nearest",
        ).collect()
    }
    # 10 -> 8 (d=2) over 21 (d=11); 18 -> 21 (d=3) over 8 (d=10); 100 -> 21
    assert nearest == {1: 1.0, 2: 2.0, 3: 2.0}

    tol = {
        r.id: r.v_asof
        for r in asof_join_pandas(
            left, right, on="t", by="k", right_cols=["v"],
            direction="nearest", tolerance=5.0,
        ).collect()
    }
    assert tol == {1: 1.0, 2: 2.0, 3: None}  # 100 is 79 away: out of window


def test_asof_tiers_agree_on_random_data(spark):
    """Window-composition and merge_asof tiers produce identical backward
    matches on randomized multi-key data with duplicates, ties, and NULL
    timestamps on both sides."""
    import random

    from mare_spark.operators.asof import asof_join, asof_join_pandas

    rng = random.Random(11)
    left = [
        (i, rng.choice("abc"),
         None if rng.random() < 0.1 else float(rng.randrange(100)))
        for i in range(60)
    ]
    right = [
        (rng.choice("abcd"),
         None if rng.random() < 0.1 else float(rng.randrange(100)),
         float(j))
        for j in range(40)
    ]
    ldf = spark.createDataFrame(left, "id long, k string, t double")
    rdf = spark.createDataFrame(right, "k string, t double, v double")
    a = {
        r.id: r.v_asof
        for r in asof_join(ldf, rdf, on="t", by="k", right_cols=["v"]).collect()
    }
    b = {
        r.id: r.v_asof
        for r in asof_join_pandas(
            ldf, rdf, on="t", by="k", right_cols=["v"]
        ).collect()
    }
    assert a == b


def test_asof_tie_winner_is_deterministic_across_tiers(spark):
    """Multiple right rows at the SAME event time within a group: the
    carried row must be pinned, not partitioning-dependent — backward
    carries the lexicographically largest tied row, forward the smallest,
    and both tiers agree (the r3 ADVICE flake scenario, made explicit)."""
    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 3.0)], "id long, k string, t double"
    )
    right = spark.createDataFrame(
        [("u", 5.0, 1.0), ("u", 5.0, 9.0), ("u", 5.0, 4.0)],
        "k string, t double, v double",
    )
    for direction, want in (("backward", 9.0), ("forward", 1.0)):
        w = asof_join(
            left, right, on="t", by="k", right_cols=["v"],
            direction=direction,
        )
        p = asof_join_pandas(
            left, right, on="t", by="k", right_cols=["v"],
            direction=direction,
        )
        got_w = {r.id: r.v_asof for r in w.collect()}
        got_p = {r.id: r.v_asof for r in p.collect()}
        match_id = 1 if direction == "backward" else 2
        miss_id = 2 if direction == "backward" else 1
        assert got_w[match_id] == want, (direction, got_w)
        assert got_w[miss_id] is None, (direction, got_w)
        assert got_w == got_p, (direction, got_w, got_p)


def test_binned_interval_join_equals_theta_join(spark):
    """The binned keyed join must return exactly the pairs of the naive
    theta join on random data — and its plan must contain a real equi
    join (SortMergeJoin/ShuffledHashJoin/BroadcastHashJoin), never a
    nested loop."""
    import random

    from mare_spark.operators.ranges import binned_interval_join

    rng = random.Random(5)
    points = spark.createDataFrame(
        [(rng.choice("ab"), float(rng.randrange(1000)), i) for i in range(300)],
        "k string, p double, pid long",
    )
    ivals = []
    for j in range(80):
        lo = float(rng.randrange(950))
        ivals.append((rng.choice("ab"), lo, lo + rng.randrange(1, 120), j))
    intervals = spark.createDataFrame(
        ivals, "k string, lo double, hi double, iid long"
    )
    binned = binned_interval_join(
        points, intervals, "p", "lo", "hi", bin_width=64.0, by="k"
    )
    got = {(r.pid, r.iid) for r in binned.collect()}
    theta = points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.k") == F.col("i.k"))
        & (F.col("p.p") >= F.col("i.lo"))
        & (F.col("p.p") < F.col("i.hi")),
    )
    want = {(r.pid, r.iid) for r in theta.collect()}
    assert got == want and want
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_binned_interval_join_guards(spark):
    import pytest

    from mare_spark.operators.ranges import binned_interval_join

    points = spark.createDataFrame([(1.0, 1)], "p double, pid long")
    intervals = spark.createDataFrame(
        [(0.0, 1e9, 1)], "lo double, hi double, iid long"
    )
    # degenerate interval (1e9 wide at width 1) must raise, not explode
    wide = binned_interval_join(
        points, intervals, "p", "lo", "hi", bin_width=1.0,
        max_bins_per_interval=100,
    )
    with pytest.raises(Exception, match="spans"):
        wide.collect()
    with pytest.raises(ValueError, match="positive"):
        binned_interval_join(points, intervals, "p", "lo", "hi", bin_width=0)
    with pytest.raises(ValueError, match="share"):
        binned_interval_join(
            points,
            spark.createDataFrame([(0.0, 2.0, 9)], "lo double, hi double, pid long"),
            "p", "lo", "hi", bin_width=1.0,
        )


def test_binned_interval_join_null_and_reversed_bounds(spark):
    """SQL theta-join semantics for degenerate rows: NULL points/bounds
    never match (and never fire the span guard's error branch); a
    reversed interval matches nothing instead of exploding a descending
    bin sequence."""
    from mare_spark.operators.ranges import binned_interval_join

    points = spark.createDataFrame(
        [(5.0, 1), (None, 2)], "p double, pid long"
    )
    intervals = spark.createDataFrame(
        [(0.0, 10.0, 1), (None, 10.0, 2), (0.0, None, 3), (9.0, 1.0, 4)],
        "lo double, hi double, iid long",
    )
    out = binned_interval_join(
        points, intervals, "p", "lo", "hi",
        bin_width=1.0, max_bins_per_interval=100,
    )
    assert {(r.pid, r.iid) for r in out.collect()} == {(1, 1)}


def test_asof_join_map_valued_right_cols_still_work(spark):
    """Map-typed carried columns are non-orderable: the tie-break must
    fall back instead of failing analysis (regression guard for the r4
    tie-determinism change)."""
    from mare_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "u", 10.0)], "id long, k string, t double")
    right = spark.createDataFrame(
        [("u", 5.0, {"a": 1})], "k string, t double, m map<string,int>"
    )
    out = asof_join(left, right, on="t", by="k", right_cols=["m"]).collect()
    assert out[0].m_asof == {"a": 1}
    outp = asof_join_pandas(
        left, right, on="t", by="k", right_cols=["m"]
    ).collect()
    assert outp[0].m_asof == {"a": 1}


def test_udf_surface_null_contracts(spark):
    """Round-7 review: each UDF-surface tier must propagate NULL the way
    its SQL oracle does — rowwise classify returns NULL (None < 0 was a
    TypeError), the pandas charge UDF emits NULL not NaN, the grouped
    weighted average masks NULL rows exactly like the oracle's decimal
    sums (a NaN rode rint().astype(int64) into INT64_MIN)."""
    import mare_spark.queries.relational2 as R

    sup = spark.createDataFrame(
        [(1, "a", -5.0), (2, "b", None), (3, "c", 9000.0)],
        "s_suppkey long, s_name string, s_acctbal double",
    )
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.udf(T.StringType())
    def classify(bal):
        if bal is None:
            return None
        return "debt" if bal < 0 else ("ok" if bal < 5000 else "rich")

    # the registered query path end-to-end on a NULL-bearing frame
    sup.createOrReplaceTempView("_sup_null")
    got = {r.s_suppkey: r.bal_class
           for r in sup.select(
               "s_suppkey", classify("s_acctbal").alias("bal_class")
           ).collect()}
    assert got == {1: "debt", 2: None, 3: "rich"}

    li = spark.createDataFrame(
        [(1, 1, 100.0, 0.1, 0.05), (1, 2, None, 0.1, 0.05)],
        "l_orderkey long, l_linenumber long, l_extendedprice double, "
        "l_discount double, l_tax double",
    )
    rows = {r.l_linenumber: r.charge
            for r in li.select(
                "l_linenumber",
                R._charge_pudf("l_extendedprice", "l_discount", "l_tax")
                .alias("charge"),
            ).collect()}
    assert abs(rows[1] - 94.5) < 1e-9
    assert rows[2] is None  # NULL, not NaN

    wli = spark.createDataFrame(
        [("A", 10.0, 2.0), ("A", None, 3.0), ("A", 20.0, None)],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    out = wli.groupBy("l_returnflag").agg(
        R._weighted_avg_pudf("l_extendedprice", "l_quantity").alias("w")
    ).collect()[0]
    # num over BOTH-non-null rows (10*2), den over non-null qty (2+3)
    assert abs(out.w - (10.0 * 2.0) / 5.0) < 1e-9


def test_relational_review_guards_r8(spark, tmp_path):
    """r8 review over the relational bodies: (1) the as-of oracles pin
    the equal-timestamp tie winner (DuckDB's pick among duplicate
    (user, ts) view rows is scan-order dependent; the engine carries
    max-value backward / min-value forward) — pinned on a tie-heavy
    fixture through BOTH engines; (2) a NULL-price part's correlated
    count is 0 on both sides, not the count of all priced same-brand
    parts; (3) the q_agg_stats moments are BIT-identical doubles (the
    old decimal->double cast double-rounded past 2^53 on DuckDB only)."""
    import shutil

    import pandas as pd

    from mare_spark.registry import all_queries
    from mare_spark.tables import TABLE_NAMES, table_path
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    qs = all_queries()
    sf = str(tmp_path / "sfrel")
    (tmp_path / "sfrel").mkdir()
    for t in TABLE_NAMES:
        shutil.copy(table_path(SF_SMOKE, t), table_path(sf, t))

    # (1) duplicate-ts views with conflicting values around one purchase
    base = pd.Timestamp("2025-01-01 12:00:00")
    rows = [
        (1, base - pd.Timedelta(minutes=5), 100, "view", 1.0, "{}"),
        (2, base - pd.Timedelta(minutes=5), 100, "view", 9.0, "{}"),
        (3, base, 100, "purchase", 50.0, "{}"),
        (4, base + pd.Timedelta(minutes=5), 100, "view", 2.0, "{}"),
        (5, base + pd.Timedelta(minutes=5), 100, "view", 8.0, "{}"),
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    ).to_parquet(table_path(sf, "events"))
    bwd = qs["q_asof_join"].fn(spark, sf).collect()[0]
    assert bwd.view_value == 9.0  # max-value tie winner (backward)
    fwd = qs["q_asof_join_forward"].fn(spark, sf).collect()[0]
    assert fwd.view_value == 2.0  # min-value tie winner (forward)
    compare(qs["q_asof_join"].fn(spark, sf), qs["q_asof_join"].oracle, sf)
    compare(qs["q_asof_join_forward"].fn(spark, sf),
            qs["q_asof_join_forward"].oracle, sf)

    # (2) NULL-price part: correlated count 0 on both engines
    part = pd.read_parquet(table_path(SF_SMOKE, "part")).head(10).copy()
    part.loc[part.index[0], "p_retailprice"] = None
    part.loc[part.index[0], "p_size"] = 1
    part["p_brand"] = "B#1"  # one brand -> the NULL row competes
    part.to_parquet(table_path(sf, "part"))
    q = qs["q_correlated_scalar"]
    got = {r.p_partkey: r.n_pricier_in_brand
           for r in q.fn(spark, sf).collect()}
    null_key = int(part.iloc[0]["p_partkey"])
    assert got[null_key] == 0
    compare(q.fn(spark, sf), q.oracle, sf)
