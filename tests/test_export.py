"""export_training_shards / verify_export: layout determinism, manifest
integrity, budget sizing, and the corruption-detection contract."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from mare_spark.operators.export import (
    ExportIntegrityError,
    export_training_shards,
    verify_export,
)
from mare_spark.tables import read_table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return read_table(spark, SF_SMOKE, "documents")


def test_roundtrip_all_rows_one_file_per_shard(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    man = export_training_shards(
        docs, out, id_col="doc_id", token_col="n_chars",
        n_shards=8, keep_cols=("text", "lang"),
    )
    assert man["n_shards"] == 8
    assert man["total_rows"] == docs.count()
    assert man["total_tokens"] == docs.agg(F.sum("n_chars")).collect()[0][0]

    back = spark.read.option("basePath", out).parquet(out)
    assert back.count() == man["total_rows"]
    assert sorted(back.columns) == ["doc_id", "lang", "n_chars", "shard", "text"]
    # no doc lost or duplicated
    assert (
        back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0
    )
    assert (
        docs.select("doc_id").exceptAll(back.select("doc_id")).count() == 0
    )
    # one data file per shard directory
    for sd in glob.glob(os.path.join(out, "shard=*")):
        files = [f for f in os.listdir(sd) if f.endswith(".parquet")]
        assert len(files) == 1, sd


def test_manifest_layout_independent(spark, tmp_path):
    docs = _docs(spark)
    a = export_training_shards(
        docs.repartition(1), str(tmp_path / "a"),
        id_col="doc_id", token_col="n_chars", n_shards=6,
    )
    b = export_training_shards(
        docs.repartition(7), str(tmp_path / "b"),
        id_col="doc_id", token_col="n_chars", n_shards=6,
    )
    assert a == b  # shard membership + digests are layout-pure


def test_budget_sizes_shard_count(spark, tmp_path):
    docs = _docs(spark)
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    budget = total // 5
    man = export_training_shards(
        docs, str(tmp_path / "s"), id_col="doc_id",
        token_col="n_chars", shard_token_budget=budget,
    )
    assert man["n_shards"] == -(-total // budget)
    assert man["total_tokens"] == total
    # hash balance: every shard within 3x of the mean at fixture scale
    mean = total / man["n_shards"]
    for s in man["shards"]:
        assert s["tokens"] < 3 * mean


def test_verify_detects_lost_shard(spark, tmp_path):
    out = str(tmp_path / "s")
    export_training_shards(
        _docs(spark), out, id_col="doc_id", token_col="n_chars", n_shards=5,
    )
    assert verify_export(spark, out)["n_shards"] == 5

    # lose one shard's data file
    victim = glob.glob(os.path.join(out, "shard=2", "*.parquet"))[0]
    os.remove(victim)
    with pytest.raises(ExportIntegrityError, match=r"\[2\]"):
        verify_export(spark, out)


def test_verify_detects_manifest_tamper(spark, tmp_path):
    out = str(tmp_path / "s")
    export_training_shards(
        _docs(spark), out, id_col="doc_id", token_col="n_chars", n_shards=3,
    )
    mf = os.path.join(out, "_manifest.json")
    man = json.load(open(mf))
    man["shards"][0]["rows"] += 1
    json.dump(man, open(mf, "w"))
    with pytest.raises(ExportIntegrityError):
        verify_export(spark, out)


def test_verify_requires_manifest(spark, tmp_path):
    with pytest.raises(ExportIntegrityError, match="export incomplete"):
        verify_export(spark, str(tmp_path))


def test_jsonl_roundtrip(spark, tmp_path):
    docs = _docs(spark).select("doc_id", "n_chars", "lang")
    out = str(tmp_path / "j")
    man = export_training_shards(
        docs, out, id_col="doc_id", token_col="n_chars",
        n_shards=4, keep_cols=("lang",), fmt="json",
    )
    assert man["format"] == "json"
    assert verify_export(spark, out)["total_rows"] == docs.count()
    back = spark.read.option("basePath", out).json(out)
    assert back.count() == docs.count()


def test_argument_contract(spark, tmp_path):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="exactly one"):
        export_training_shards(
            docs, str(tmp_path / "x"), id_col="doc_id", token_col="n_chars",
        )
    with pytest.raises(ValueError, match="exactly one"):
        export_training_shards(
            docs, str(tmp_path / "x"), id_col="doc_id", token_col="n_chars",
            n_shards=2, shard_token_budget=10,
        )
    with pytest.raises(ValueError, match="clash"):
        export_training_shards(
            docs.withColumnRenamed("lang", "shard"), str(tmp_path / "x"),
            id_col="doc_id", token_col="n_chars", n_shards=2,
            keep_cols=("shard",),
        )
    with pytest.raises(ValueError, match="fmt"):
        export_training_shards(
            docs, str(tmp_path / "x"), id_col="doc_id", token_col="n_chars",
            n_shards=2, fmt="csv",
        )
    # remote schemes resolve through the Hadoop FileSystem API — in this
    # jar-less sandbox s3a:// fails FS RESOLUTION (clear, early, before
    # any write), not a blanket local-only refusal; on a cluster with
    # hadoop-aws on the classpath the same call proceeds
    with pytest.raises(ValueError, match="cannot resolve a Hadoop"):
        export_training_shards(
            docs, "s3a://bucket/x", id_col="doc_id", token_col="n_chars",
            n_shards=2,
        )


# -- incremental refresh ----------------------------------------------------


def _file_bytes(out):
    """{shard_dir_basename: concatenated file bytes} for change detection."""
    result = {}
    for sd in sorted(glob.glob(os.path.join(out, "shard=*"))):
        blobs = []
        for f in sorted(os.listdir(sd)):
            if not f.startswith(("_", ".")):
                blobs.append(open(os.path.join(sd, f), "rb").read())
        result[os.path.basename(sd)] = b"".join(blobs)
    return result


def test_refresh_rewrites_only_dirty_shards(spark, tmp_path):
    from mare_spark.operators.export import refresh_training_shards

    docs = _docs(spark)
    out = str(tmp_path / "s")
    export_training_shards(
        docs, out, id_col="doc_id", token_col="n_chars",
        n_shards=6, keep_cols=("lang",),
    )
    before = _file_bytes(out)

    # mutate exactly one document's token count → exactly one dirty shard
    victim = docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    updated = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == victim, F.col("n_chars") + 1).otherwise(
            F.col("n_chars")
        ),
    )
    man, changed = refresh_training_shards(updated, out, keep_cols=("lang",))
    assert len(changed) == 1

    after = _file_bytes(out)
    assert set(before) == set(after)
    for name, blob in after.items():
        if name == f"shard={changed[0]}":
            assert blob != before[name]
        else:
            assert blob == before[name], f"{name} rewritten but clean"

    # refreshed tree passes integrity + matches a from-scratch export
    verify_export(spark, out)
    fresh = export_training_shards(
        updated, str(tmp_path / "fresh"), id_col="doc_id",
        token_col="n_chars", n_shards=6, keep_cols=("lang",),
    )
    assert man == fresh


def test_refresh_noop_is_zero_write(spark, tmp_path):
    from mare_spark.operators.export import refresh_training_shards

    docs = _docs(spark)
    out = str(tmp_path / "s")
    export_training_shards(
        docs, out, id_col="doc_id", token_col="n_chars", n_shards=4,
    )
    before = _file_bytes(out)
    man, changed = refresh_training_shards(docs, out)
    assert changed == []
    assert _file_bytes(out) == before
    verify_export(spark, out)


def test_refresh_deletes_emptied_shard(spark, tmp_path):
    from mare_spark.operators.export import refresh_training_shards

    docs = _docs(spark)
    out = str(tmp_path / "s")
    man0 = export_training_shards(
        docs, out, id_col="doc_id", token_col="n_chars", n_shards=4,
    )
    # drop every doc of one shard: recompute membership exactly as the
    # exporter does, via a doc_id list from the manifest-era layout
    back = spark.read.option("basePath", out).parquet(out)
    gone = [r[0] for r in back.filter(F.col("shard") == 1).select("doc_id").collect()]
    remaining = docs.filter(~F.col("doc_id").isin(gone))
    man, changed = refresh_training_shards(remaining, out)
    assert 1 in changed
    assert not os.path.exists(os.path.join(out, "shard=1"))
    assert all(s["shard"] != 1 for s in man["shards"])
    verify_export(spark, out)
    assert man["total_rows"] == man0["total_rows"] - len(gone)


def test_refresh_requires_manifest(spark, tmp_path):
    from mare_spark.operators.export import refresh_training_shards

    with pytest.raises(ExportIntegrityError, match="refresh requires"):
        refresh_training_shards(_docs(spark), str(tmp_path))


# -- loader-side reader -----------------------------------------------------


def test_read_training_shards_verifies_and_prunes(spark, tmp_path):
    from mare_spark.operators.export import read_training_shards

    docs = _docs(spark)
    out = str(tmp_path / "s")
    man = export_training_shards(
        docs, out, id_col="doc_id", token_col="n_chars", n_shards=5,
    )
    back = read_training_shards(spark, out)
    assert back.count() == man["total_rows"]

    # shard restriction is partition-pruned: only the requested subset
    subset = read_training_shards(spark, out, shards=[1, 3])
    want = sum(s["rows"] for s in man["shards"] if s["shard"] in (1, 3))
    assert subset.count() == want
    assert subset.select("shard").distinct().count() == 2

    # a corrupted tree refuses to load by default, loads with verify=False
    victim = glob.glob(os.path.join(out, "shard=0", "*.parquet"))[0]
    os.remove(victim)
    with pytest.raises(ExportIntegrityError):
        read_training_shards(spark, out)
    assert read_training_shards(spark, out, verify=False).count() < man[
        "total_rows"
    ]


def test_manifest_format_parity(spark, tmp_path):
    """The manifest fingerprints CONTENT, not encoding: a parquet export
    and a jsonl export of the same data agree on every per-shard stat."""
    docs = _docs(spark).select("doc_id", "n_chars", "lang")
    a = export_training_shards(
        docs, str(tmp_path / "p"), id_col="doc_id", token_col="n_chars",
        n_shards=5, keep_cols=("lang",), fmt="parquet",
    )
    b = export_training_shards(
        docs, str(tmp_path / "j"), id_col="doc_id", token_col="n_chars",
        n_shards=5, keep_cols=("lang",), fmt="json",
    )
    assert {k: v for k, v in a.items() if k != "format"} == {
        k: v for k, v in b.items() if k != "format"
    }


def test_export_token_tapes_roundtrip_and_verify(spark, tmp_path):
    """Tape export: pre-assigned pack shards land as shard=K dirs, the
    manifest fingerprints the written sequences, verify passes, the
    loader reads back the exact tapes (arrays included), and tampering
    is caught."""
    import json
    import os

    import pytest
    from pyspark.sql import functions as F

    from mare_spark.operators.corpus import pack_token_tape
    from mare_spark.operators.export import (
        ExportIntegrityError,
        export_token_tapes,
        read_training_shards,
        verify_export,
    )

    rows = [(i, list(range(i * 10, i * 10 + 3 + i % 5))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, ids array<int>")
    tape = pack_token_tape(
        df, "ids", "doc_id", shards=3, max_len=16, boundaries=True
    )
    out = str(tmp_path / "tapes")
    man = export_token_tapes(tape, out)
    assert man["id_col"] == "tape_seq_id" and man["n_shards"] == 3
    assert man["total_tokens"] == sum(len(ids) for _i, ids in rows)
    verify_export(spark, out)

    back = read_training_shards(spark, out)
    want = {
        (r.pack_shard, r.seq_id): (list(r.token_ids), list(r.doc_starts))
        for r in tape.collect()
    }
    got = {
        (r.shard, r.seq_id): (list(r.token_ids), list(r.doc_starts))
        for r in back.collect()
    }
    assert got == want

    # shard-pruned loader read returns only that tape
    one = read_training_shards(spark, out, shards=[1])
    assert {r.shard for r in one.collect()} == {1}

    # tamper: drop a shard directory -> verify names it
    import shutil

    shutil.rmtree(os.path.join(out, "shard=2"))
    with pytest.raises(ExportIntegrityError, match="2"):
        verify_export(spark, out)


def test_export_token_tapes_validates_inputs(spark, tmp_path):
    import pytest

    from mare_spark.operators.export import export_token_tapes

    df = spark.createDataFrame([(0, 0, [1], 1)],
                               "pack_shard long, seq_id long, "
                               "token_ids array<int>, n_tokens int")
    with pytest.raises(ValueError, match="fmt"):
        export_token_tapes(df, str(tmp_path / "x"), fmt="csv")
    with pytest.raises(ValueError, match="not in"):
        export_token_tapes(
            df.drop("pack_shard"), str(tmp_path / "x")
        )


def test_refresh_token_tapes_rewrites_only_dirty_tapes(spark, tmp_path):
    """Edit one document -> only ITS tape's shard dir rewrites; clean
    shards stay inode-identical; the refreshed manifest equals a
    from-scratch export's; a no-op refresh writes nothing."""
    import os

    from pyspark.sql import functions as F

    from mare_spark.operators.corpus import pack_token_tape
    from mare_spark.operators.export import (
        export_token_tapes,
        refresh_token_tapes,
        verify_export,
    )

    def tape_of(df):
        return pack_token_tape(df, "ids", "doc_id", shards=3, max_len=16)

    rows = [(i, list(range(i * 10, i * 10 + 3 + i % 5))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, ids array<int>")
    out = str(tmp_path / "tapes")
    export_token_tapes(tape_of(df), out)

    inodes_before = {
        d: os.stat(os.path.join(out, d)).st_mtime_ns
        for d in os.listdir(out) if d.startswith("shard=")
    }
    files_before = {
        d: sorted(os.listdir(os.path.join(out, d)))
        for d in inodes_before
    }

    # no-op refresh: zero changed shards, dirs untouched
    _man, changed = refresh_token_tapes(tape_of(df), out)
    assert changed == []
    for d, ts in inodes_before.items():
        assert os.stat(os.path.join(out, d)).st_mtime_ns == ts

    # edit ONE doc's tokens -> exactly one tape shard changes
    victim = rows[0][0]
    edited = df.withColumn(
        "ids",
        F.when(F.col("doc_id") == victim,
               F.expr("array(999, 998)")).otherwise(F.col("ids")),
    )
    man2, changed = refresh_token_tapes(tape_of(edited), out)
    assert len(changed) == 1
    dirty = f"shard={changed[0]}"
    for d in files_before:
        if d != dirty:
            assert os.stat(os.path.join(out, d)).st_mtime_ns == \
                inodes_before[d], d
    verify_export(spark, out)

    # refreshed tree == a from-scratch export of the edited corpus
    out2 = str(tmp_path / "tapes_scratch")
    man_scratch = export_token_tapes(tape_of(edited), out2)
    assert man2["shards"] == man_scratch["shards"]


def test_refresh_token_tapes_requires_tape_export(spark, tmp_path):
    import pytest

    from mare_spark.operators.export import (
        ExportIntegrityError,
        export_training_shards,
        refresh_token_tapes,
    )

    df = spark.createDataFrame(
        [(1, 5, [1], 0, 1)],
        "doc_id long, n long, token_ids array<int>, "
        "pack_shard long, seq_id long",
    )
    out = str(tmp_path / "docs")
    export_training_shards(
        df.select("doc_id", "n"), out, id_col="doc_id",
        token_col="n", n_shards=1,
    )
    with pytest.raises(ExportIntegrityError, match="not a token-tape"):
        refresh_token_tapes(df, out)
    with pytest.raises(ExportIntegrityError, match="refresh requires"):
        refresh_token_tapes(df, str(tmp_path / "nowhere"))


def test_export_guards_from_review(spark, tmp_path):
    """Review-driven export guards: an empty frame refuses to overwrite
    (the old export survives), NULL ids/tokens refuse up front, a
    refresh with mismatched keep_cols is rejected BEFORE it writes a
    divergent schema, and subset verify checks only the named shards."""
    import pytest
    from pyspark.sql import functions as F

    from mare_spark.operators.export import (
        ExportIntegrityError,
        export_training_shards,
        read_training_shards,
        refresh_training_shards,
        verify_export,
    )

    df = spark.range(40).selectExpr(
        "id AS doc_id", "CAST(id % 7 + 1 AS LONG) AS n", "'x' AS text"
    )
    out = str(tmp_path / "exp")
    export_training_shards(
        df, out, id_col="doc_id", token_col="n",
        n_shards=4, keep_cols=("text",),
    )

    # empty input refuses BEFORE the destructive overwrite
    with pytest.raises(ValueError, match="EMPTY"):
        export_training_shards(
            df.filter("doc_id < 0"), out, id_col="doc_id",
            token_col="n", n_shards=4,
        )
    verify_export(spark, out)  # the original export survived

    # NULL ids / tokens refuse with a named error
    with pytest.raises(ValueError, match="NULL"):
        export_training_shards(
            df.withColumn("n", F.when(F.col("doc_id") > 5, F.col("n"))),
            str(tmp_path / "exp2"), id_col="doc_id", token_col="n",
            n_shards=2,
        )

    # refresh with forgotten keep_cols -> schema mismatch named, no write
    with pytest.raises(ExportIntegrityError, match="columns"):
        refresh_training_shards(df, out)  # keep_cols=() != ('text',)
    verify_export(spark, out)

    # subset verify: only the named shards are checked; asking for a
    # shard the manifest doesn't know is an error
    man = verify_export(spark, out, shards=[0])
    assert man["n_shards"] == 4
    with pytest.raises(ExportIntegrityError, match="not in the manifest"):
        verify_export(spark, out, shards=[99])
    # a tampered shard outside the subset goes unnoticed by the subset
    # check (by design) but is caught by the full verify
    import shutil

    victims = [d for d in __import__("os").listdir(out)
               if d.startswith("shard=") and d != "shard=0"]
    shutil.rmtree(f"{out}/{victims[0]}")
    verify_export(spark, out, shards=[0])
    with pytest.raises(ExportIntegrityError, match="diverge"):
        verify_export(spark, out)
    # pruned loader read over the intact shard still works
    assert read_training_shards(spark, out, shards=[0]).count() > 0


def test_tape_export_rejects_string_shard_and_reserved_names(spark, tmp_path):
    import pytest

    from mare_spark.operators.export import export_token_tapes

    df = spark.createDataFrame(
        [("0", 0, [1], 1)],
        "pack_shard string, seq_id long, token_ids array<int>, n_tokens int",
    )
    with pytest.raises(ValueError, match="integral"):
        export_token_tapes(df, str(tmp_path / "t"))
    df2 = spark.createDataFrame(
        [(0, 0, [1], 1, 9)],
        "pack_shard long, seq_id long, token_ids array<int>, "
        "n_tokens int, shard long",
    )
    with pytest.raises(ValueError, match="clash"):
        export_token_tapes(df2, str(tmp_path / "t2"))


def test_export_file_scheme_uri_end_to_end(spark, tmp_path):
    """The full export lifecycle against an explicit file:// URI — the
    sandbox proxy for hdfs://s3a:// — exercising manifest write/read/
    atomic-replace, shard-dir listing, and shard deletion entirely
    through the Hadoop FileSystem API (no os.*/shutil path exists any
    more)."""
    from mare_spark.operators.export import (
        read_training_shards,
        refresh_training_shards,
    )

    docs = _docs(spark)
    uri = "file://" + str(tmp_path / "remote")
    man = export_training_shards(
        docs, uri, id_col="doc_id", token_col="n_chars", n_shards=4,
    )
    assert man["total_rows"] == docs.count()
    assert verify_export(spark, uri)["n_shards"] == 4
    assert read_training_shards(spark, uri).count() == man["total_rows"]

    # refresh: drop the docs of one shard -> that shard dir is deleted
    # through the FS API and the manifest is atomically replaced
    keep = docs.withColumn(
        "_s",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16, 10,
            ).cast("long"),
            F.lit(4),
        ),
    ).filter(F.col("_s") != 2).drop("_s")
    man2, changed = refresh_training_shards(keep, uri)
    assert 2 in changed
    assert all(s["shard"] != 2 for s in man2["shards"])
    assert not os.path.exists(str(tmp_path / "remote" / "shard=2"))
    verify_export(spark, uri)


# -- second live Hadoop filesystem scheme (VERDICT r7 #2) --------------------
#
# viewfs:// is a REAL second scheme on the stock Hadoop classpath (the
# client-side mount-table filesystem): FsIO's FileSystem.get must resolve
# a DIFFERENT implementation class than file://'s LocalFileSystem from
# the scheme string + Hadoop conf alone, and every FsIO operation plus
# Spark's own readers/writers must work through it. file:// proved the
# default path; this proves the DISPATCH.


@pytest.fixture(scope="session")
def viewfs_root(spark, tmp_path_factory):
    """Mount viewfs://mare/t at a session-scoped local root (the mount
    table is read when FileSystem.get first caches the viewfs instance,
    so the link must be stable for the whole session — tests isolate
    under per-test subdirectories)."""
    root = tmp_path_factory.mktemp("viewfs_backing")
    hc = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    hc.set("fs.viewfs.mounttable.mare.link./t", "file://" + str(root))
    return "viewfs://mare/t", root


def test_fsio_viewfs_resolves_distinct_implementation(spark, viewfs_root):
    from mare_spark.fsio import FsIO

    uri, _root = viewfs_root
    vfs = FsIO(spark, uri)
    lfs = FsIO(spark, "file:///")
    vcls = vfs._fs.getClass().getName()  # noqa: SLF001
    lcls = lfs._fs.getClass().getName()  # noqa: SLF001
    assert vcls == "org.apache.hadoop.fs.viewfs.ViewFileSystem"
    assert vcls != lcls
    # an unmounted path under the same scheme fails at resolution with
    # the named-cause contract, like any unresolvable scheme
    with pytest.raises(Exception):
        FsIO(spark, "viewfs://nomount/x").exists("viewfs://nomount/x/y")


def test_export_viewfs_scheme_dispatch_end_to_end(spark, viewfs_root):
    """The full export lifecycle (export -> verify -> read -> refresh
    with a shard deletion and an atomic manifest replace) through
    viewfs:// — the same matrix test_export_file_scheme_uri_end_to_end
    runs against file://, now over dispatched (non-default) resolution."""
    from mare_spark.operators.export import (
        read_training_shards,
        refresh_training_shards,
    )

    prefix, root = viewfs_root
    docs = _docs(spark)
    uri = prefix + "/remote"
    man = export_training_shards(
        docs, uri, id_col="doc_id", token_col="n_chars", n_shards=4,
    )
    assert man["total_rows"] == docs.count()
    assert verify_export(spark, uri)["n_shards"] == 4
    assert read_training_shards(spark, uri).count() == man["total_rows"]
    # the bytes really landed on the mounted backing filesystem
    assert os.path.exists(str(root / "remote" / "_manifest.json"))

    keep = docs.withColumn(
        "_s",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16, 10,
            ).cast("long"),
            F.lit(4),
        ),
    ).filter(F.col("_s") != 2).drop("_s")
    man2, changed = refresh_training_shards(keep, uri)
    assert 2 in changed
    assert all(s["shard"] != 2 for s in man2["shards"])
    assert not os.path.exists(str(root / "remote" / "shard=2"))
    verify_export(spark, uri)


def test_maintenance_viewfs_scheme(spark, viewfs_root):
    """compact_small_files + merge_parquet through viewfs:// — the
    maintenance half of the FS matrix over dispatched resolution
    (directory swap renames, listings, crash-heal checks all through
    the mounted filesystem)."""
    from mare_spark.operators.scale import compact_small_files, merge_parquet

    prefix, root = viewfs_root
    uri = prefix + "/maint_tbl"
    spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(8).write.mode("overwrite").parquet(uri)

    before, after = compact_small_files(spark, uri, min_files=2)
    assert before == 8 and after == 2
    assert sorted(
        r.k for r in spark.read.parquet(uri).collect()
    ) == list(range(200))

    updates = spark.createDataFrame(
        [(5, 999), (1000, 1)], "k long, v long"
    )
    dels = spark.createDataFrame([(7,)], "k long")
    merge_parquet(spark, uri, updates, "k", delete_keys=dels)
    got = {r.k: r.v for r in spark.read.parquet(uri).collect()}
    assert got[5] == 999 and got[1000] == 1 and 7 not in got
    assert len(got) == 200  # +1 insert, -1 delete
    assert os.path.isdir(str(root / "maint_tbl"))


def test_fsio_review_guards_r8(spark, tmp_path):
    """r8 review over fsio.py: paths with URI-illegal characters (space)
    resolve through Hadoop's own Path parsing instead of URI.create;
    rename enforces the never-overwrite contract explicitly (POSIX
    rename(2) under file:// would silently replace)."""
    from mare_spark.fsio import FsIO

    weird = tmp_path / "my files"
    weird.mkdir()
    io = FsIO(spark, str(weird))
    io.write_text_atomic(str(weird / "m.json"), "{}")
    assert io.read_text(str(weird / "m.json")) == "{}"
    assert io.exists(str(weird / "m.json"))

    io.write_text_atomic(str(weird / "other.json"), "{1}".replace("1", ""))
    with pytest.raises(IOError, match="destination exists"):
        io.rename(str(weird / "m.json"), str(weird / "other.json"))
    # both files intact — nothing was silently replaced
    assert io.read_text(str(weird / "m.json")) == "{}"
