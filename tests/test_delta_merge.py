"""Delta-backed MERGE matrix — the lakehouse escalation of the
copy-on-write merge_parquet/merge_parquet_partitioned tests
(test_scale_ops.py). Runs only in an environment with delta-spark + the
Delta jar + the Delta SQL extension; skips cleanly otherwise (this repo's
CI environment has none of the three, so here the suite records skips —
the point is that the escalation path is demonstrated, not asserted, the
moment the dependency appears)."""

from __future__ import annotations

import pytest

pytest.importorskip("delta", reason="delta-spark python package not installed")


@pytest.fixture()
def delta_spark(spark):
    from mare_spark.sources.external import _require_format

    try:
        _require_format(spark, "delta")
    except NotImplementedError as ex:
        pytest.skip(str(ex))
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    if "DeltaSparkSessionExtension" not in ext:
        pytest.skip(
            "session lacks the Delta SQL extension "
            "(spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension)"
        )
    return spark


def test_delta_merge_upsert_insert_delete(delta_spark, tmp_path):
    """Mirror of test_merge_parquet_upsert_insert_delete: matched keys
    take the update row, unmatched updates insert, delete keys vanish —
    and a key in BOTH updates and deletes is the same pre-validated
    conflict the parquet twins reject, aborting BEFORE any write."""
    import pytest

    from mare_spark.sources.external import merge_delta

    spark = delta_spark
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, val string"
    ).write.format("delta").save(path)

    conflicted = spark.createDataFrame(
        [(3, "UPD3"), (11, "NEW11"), (5, "UPD5")], "id long, val string"
    )
    deletes = spark.createDataFrame([(7,), (5,)], "id long")
    with pytest.raises(ValueError, match="merge_delta: key appears in both"):
        merge_delta(spark, path, conflicted, "id", delete_keys=deletes)
    # the conflict aborted before any write: table untouched
    got = {
        r.id: r.val
        for r in spark.read.format("delta").load(path).collect()
    }
    assert got == {i: f"v{i}" for i in range(10)}

    updates = spark.createDataFrame(
        [(3, "UPD3"), (11, "NEW11")], "id long, val string"
    )
    merge_delta(spark, path, updates, "id", delete_keys=deletes)
    got = {
        r.id: r.val
        for r in spark.read.format("delta").load(path).collect()
    }
    assert got[3] == "UPD3" and got[11] == "NEW11"
    assert 7 not in got and 5 not in got
    assert got[0] == "v0" and len(got) == 9


def test_delta_merge_partitioned_identity_and_pruning(delta_spark, tmp_path):
    """Mirror of the merge_parquet_partitioned matrix: with partition_col
    the row identity is composite — the same id in another partition is a
    DIFFERENT row and must survive untouched — and untouched partitions'
    data files are not rewritten."""
    import glob
    import os

    from mare_spark.sources.external import merge_delta

    spark = delta_spark
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, pt, f"v{i}{pt}") for i in range(5) for pt in ("a", "b", "c")],
        "id long, pt string, val string",
    ).write.format("delta").partitionBy("pt").save(path)

    before = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/pt=c/*.parquet")
    }
    updates = spark.createDataFrame(
        [(2, "a", "UPD"), (9, "b", "NEW")], "id long, pt string, val string"
    )
    merge_delta(spark, path, updates, "id", partition_col="pt")

    rows = {
        (r.id, r.pt): r.val
        for r in spark.read.format("delta").load(path).collect()
    }
    assert rows[(2, "a")] == "UPD"
    assert rows[(2, "b")] == "v2b"  # composite identity: other partition kept
    assert rows[(9, "b")] == "NEW"
    assert len(rows) == 16
    after = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/pt=c/*.parquet")
    }
    assert before == after  # untouched partition not rewritten


def test_delta_merge_duplicate_update_keys_abort(delta_spark, tmp_path):
    """Parquet twins pre-validate duplicate update keys; Delta raises on
    multi-match natively — either way the merge must not half-apply."""
    from mare_spark.sources.external import merge_delta

    spark = delta_spark
    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "v1")], "id long, val string").write.format(
        "delta"
    ).save(path)
    dup = spark.createDataFrame(
        [(1, "A"), (1, "B")], "id long, val string"
    )
    with pytest.raises(Exception):
        merge_delta(spark, path, dup, "id")
    got = {r.id: r.val for r in spark.read.format("delta").load(path).collect()}
    assert got == {1: "v1"}
