"""SURVEY §2 line-by-line parity sweep: charset handling, TMPDIR honoring,
image-name normalization, docker error paths, cache/num_partitions
plumbing, compressed text, whole-text source — the reference behaviors not
already covered by the differential suites."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from mare_spark import sources as src
from mare_spark.codecs import TextFile, WholeTextFiles
from mare_spark.dataset import MaRe
from mare_spark.runner import (
    ContainerRunError,
    docker_available,
    normalize_image_name,
    resolve_backend,
    run_container,
)


# -- codec charset (MountPoint.scala:63,103) --------------------------------

def test_textfile_charset_roundtrip(tmp_path):
    mp = TextFile("/t", charset="latin-1")
    p = str(tmp_path / "latin.txt")
    records = ["café", "über"]
    mp.write(records, p)
    raw = open(p, "rb").read()
    assert raw == "café\nüber\n".encode("latin-1")
    assert mp.read(p) == records


def test_wholetextfiles_charset(tmp_path):
    mp = WholeTextFiles("/w", charset="utf-16")
    d = str(tmp_path / "d")
    mp.write([("a.txt", "你好")], d)
    assert mp.read(d) == [("a.txt", "你好")]


# -- TMPDIR honored for pipe temp mounts (MaRe.scala:72, README.md:25) ------

def test_pipe_honors_tmpdir(spark, tmp_path):
    tmpdir = tmp_path / "mare_tmp"
    tmpdir.mkdir()
    df = spark.createDataFrame([("x",)], "value string").coalesce(1)
    # the subprocess backend substitutes the mount path with the host temp
    # path, so `echo` of the path itself reveals where the mount landed.
    # (The env-var default is read on the EXECUTOR — already-running local
    # workers keep their startup env, so the test uses the explicit knob.)
    out = (
        MaRe(df, tmp_dir=str(tmpdir))
        .map(
            TextFile("/in"),
            TextFile("/out"),
            "busybox:1",
            "echo /in > /out",
        )
        .df.collect()
    )
    assert len(out) == 1
    assert out[0].value.startswith(str(tmpdir)), out[0].value


# -- runner behaviors (DockerHelper.scala) ----------------------------------

def test_image_name_normalization():
    # DockerHelper.scala:51-64
    assert normalize_image_name("busybox") == "busybox:latest"
    assert normalize_image_name("busybox:1") == "busybox:1"
    assert normalize_image_name("repo.io/org/img") == "repo.io/org/img:latest"
    assert normalize_image_name("repo.io:5000/org/img") == "repo.io:5000/org/img:latest"
    assert normalize_image_name("repo.io:5000/org/img:2") == "repo.io:5000/org/img:2"


def test_backend_resolution(monkeypatch):
    assert resolve_backend(None) in ("subprocess", "docker")
    monkeypatch.setenv("MARE_SPARK_BACKEND", "subprocess")
    assert resolve_backend(None) == "subprocess"
    with pytest.raises(ValueError):
        resolve_backend("podman")


def test_subprocess_nonzero_exit_raises(tmp_path):
    i = tmp_path / "i"
    o = tmp_path / "o"
    i.write_text("x\n")
    o.write_text("")
    with pytest.raises(ContainerRunError, match="code 3"):
        run_container(
            "busybox:1", "exit 3", [(str(i), "/i"), (str(o), "/o")],
            backend="subprocess",
        )


@pytest.mark.skipif(docker_available(), reason="docker daemon present")
def test_docker_backend_fails_cleanly_without_daemon(tmp_path):
    i = tmp_path / "i"
    i.write_text("x\n")
    with pytest.raises(ContainerRunError):
        run_container("busybox:1", "cat /i", [(str(i), "/i")], backend="docker")


# -- RDD-plumbing parity (MaRe.scala:32-51) ---------------------------------

def test_num_partitions_and_cache(spark):
    df = spark.range(100).repartition(7)
    m = MaRe(df)
    assert m.num_partitions == 7
    cached = m.cache()
    assert cached.df.is_cached
    assert cached.repartition(3).num_partitions == 3
    cached.df.unpersist()


# -- compressed + whole-text sources (MaReTest.scala:38,71,104) -------------

def test_gzip_text_source(spark, tmp_path):
    p = tmp_path / "lines.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("a\nb\nc\n")
    df = src.read_text(spark, str(p))
    assert sorted(r.value for r in df.collect()) == ["a", "b", "c"]


def test_whole_text_source(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "one.txt").write_text("hello")
    (d / "two.txt").write_text("world")
    df = src.read_whole_text(spark, str(d))
    got = {os.path.basename(r.path): r.content for r in df.collect()}
    assert got == {"one.txt": "hello", "two.txt": "world"}
