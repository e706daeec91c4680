"""E2E domain-pipeline differential test, porting the reference's
virtual-screening methodology (VirtualScreeningTest.scala:28-92): run a
multi-stage containerized pipeline in PARALLEL over partitions, and compare
against the same pipeline run SERIALLY in one partition — the results must
agree on the parsed (id, score) set.

The "docking" stage is a deterministic awk scorer (the real tool is a
Docker image the reference also treats as a black box); the top-k reduce
mirrors the reference's sort|head tree-reduce, which is associative for
top-k selection.
"""

from __future__ import annotations

import random

import pytest

from mare_spark.codecs import TextFile
from mare_spark.dataset import MaRe

SDF_DELIM = "\n$$$$\n"
TOP_K = 30

# deterministic awk "docking": score = sum of char codes of the id line % 1000
DOCK = (
    "awk 'BEGIN{RS=\"\\n\\\\$\\\\$\\\\$\\\\$\\n\"} NF{split($0,l,\"\\n\");"
    ' n=0; for(i=1;i<=length(l[1]);i++) n+=index("abcdefghijklmnopqrstuvwxyz0123456789_", substr(l[1],i,1));'
    " printf \"%s:%d\\n\", l[1], n%1000}' /mols > /scores"
)
# top-k by score desc, id asc tiebreak (stable across partitionings)
TOPK = f"sort -t: -k2,2nr -k1,1 /scores | head -{TOP_K} > /top"


def _molecules(n=60, seed=11):
    rng = random.Random(seed)
    mols = []
    for i in range(n):
        lines = [f"mol_{i:03d}"] + [
            "".join(rng.choice("cnohs") for _ in range(20)) for _ in range(3)
        ]
        mols.append("\n".join(lines))
    return mols


def _run(spark, partitions):
    df = spark.createDataFrame(
        [(m,) for m in _molecules()], "value string"
    ).repartition(partitions)
    out = (
        MaRe(df)
        .map(
            input_mount=TextFile("/mols", record_delimiter=SDF_DELIM),
            output_mount=TextFile("/scores"),
            image="busybox:1",
            command=DOCK,
        )
        .reduce(
            input_mount=TextFile("/scores"),
            output_mount=TextFile("/top"),
            image="busybox:1",
            command=TOPK,
            depth=2,
        )
    )
    rows = [r.value for r in out.df.collect() if r.value]
    return sorted(tuple(v.split(":")) for v in rows)


@pytest.mark.parametrize("partitions", [3, 5])
def test_parallel_equals_serial_screening(spark, partitions):
    parallel = _run(spark, partitions)
    serial = _run(spark, 1)
    assert len(serial) == TOP_K
    assert parallel == serial
