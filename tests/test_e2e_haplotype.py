"""E2E variant-calling-shaped pipeline, porting the reference's haplotype
methodology (HaplotypeCallTest.scala:22-106): paired FASTQ files read as
4-line fixed records and interlaced, "aligned" per partition in a piped
container, REPARTITIONED BY CHROMOSOME with the reference's exact
callable-keyBy (digit strings → int, X→23, Y→24, MT→25 —
HaplotypeCallTest.scala:48-62), "called" per chromosome partition, and
tree-reduce-merged — differentially compared against the same pipeline run
as ONE serial container invocation over the raw input files (the
reference's serial DockerHelper.run oracle, :107-140).

The "aligner"/"caller" are deterministic awk stand-ins (bwa/gatk are Docker
images the reference also treats as opaque); correctness of the comparison
relies only on the stage contracts:
* align: record-local (any partitioning works),
* call: chromosome-local (VALID ONLY because repartition_by co-locates each
  chromosome — run with the repartition removed, partitions split a
  chromosome and the per-(chr,pos) counts fragment; pinned below),
* merge: sort, associative over line multisets (sort∘concat = sort).
"""

from __future__ import annotations

import random

import pytest

from mare_spark.codecs import TextFile
from mare_spark.dataset import MaRe
from mare_spark.runner import run_container
from mare_spark.sources import read_fixed_record_text

# stdin→stdout awk stages, shared verbatim by the parallel mounts and the
# serial one-container oracle ------------------------------------------------

# one alignment line per 8-line interlaced record: "qname 0 chr pos" —
# chr is whitespace field index 2, exactly where the reference keyBy reads
# it from real SAM (aln.split("\\s+")(2), HaplotypeCallTest.scala:49)
ALIGN_AWK = (
    "awk '{l[NR%8]=$0} NR%8==0{q=substr(l[1],2); sub(/\\/1$/,\"\",q);"
    ' s1=l[2]; s2=l[6];'
    ' n1=0; for(i=1;i<=length(s1);i++) n1+=i*index("ACGT",substr(s1,i,1));'
    ' n2=0; for(i=1;i<=length(s2);i++) n2+=i*index("ACGT",substr(s2,i,1));'
    ' c=n1%5; cs=(c==0)?"1":((c==1)?"2":((c==2)?"X":((c==3)?"Y":"MT")));'
    " print q, 0, cs, n2%25}'"
)
# per-(chr, pos) depth count — chromosome-local by the stage contract
CALL_AWK = "awk '{c[$3\" \"$4]++} END{for(k in c) print k, c[k]}'"

ALIGN_CMD = f"{ALIGN_AWK} < /chunk.fastq > /aln.sam"
CALL_CMD = f"{CALL_AWK} < /aln.sam > /calls"
MERGE_CMD = "sort /in > /out"

N_PAIRS = 96


def _make_chr_key():
    """The reference's keyBy, verbatim semantics
    (HaplotypeCallTest.scala:48-62). Built as a closure so cloudpickle
    ships it by value (a test-module top-level function would pickle by
    reference to a module the executors can't import)."""

    def chr_key(row: dict) -> int:
        chr_str = row["value"].split()[2]
        if chr_str.isdigit():
            return int(chr_str)
        return {"X": 23, "Y": 24, "MT": 25}.get(chr_str, hash(chr_str))

    return chr_key


@pytest.fixture(scope="module")
def fastq_dir(tmp_path_factory):
    """Paired 4-line-record FASTQ files (reads_1 / reads_2)."""
    d = tmp_path_factory.mktemp("fastq")
    rng = random.Random(7)
    for mate in (1, 2):
        lines = []
        for i in range(N_PAIRS):
            seq = "".join(rng.choice("ACGT") for _ in range(24))
            lines += [f"@read_{i:04d}/{mate}", seq, "+", "I" * 24]
        (d / f"reads_{mate}.fastq").write_text("\n".join(lines) + "\n")
    return d


def _interlaced(spark, fastq_dir):
    """fr.zip(rr) parity: pair the two files' records by ordinal and
    concatenate (the reference drops rr's trailing newline,
    HaplotypeCallTest.scala:37; our fixed-record codec never carries one)."""
    fr = read_fixed_record_text(
        spark, str(fastq_dir / "reads_1.fastq"), 4
    ).selectExpr("record_id", "value AS fr")
    rr = read_fixed_record_text(
        spark, str(fastq_dir / "reads_2.fastq"), 4
    ).selectExpr("record_id", "value AS rr")
    return fr.join(rr, "record_id").selectExpr(
        "concat(fr, '\\n', rr) AS value"
    )


def _run_parallel(spark, fastq_dir, partitions):
    out = (
        MaRe(_interlaced(spark, fastq_dir).repartition(partitions))
        .map(
            input_mount=TextFile("/chunk.fastq"),
            output_mount=TextFile("/aln.sam"),
            image="busybox:1",
            command=ALIGN_CMD,
        )
        .repartition_by(_make_chr_key(), 4)
        .map(
            input_mount=TextFile("/aln.sam"),
            output_mount=TextFile("/calls"),
            image="busybox:1",
            command=CALL_CMD,
        )
        .reduce(
            input_mount=TextFile("/in"),
            output_mount=TextFile("/out"),
            image="busybox:1",
            command=MERGE_CMD,
            depth=2,
        )
    )
    return sorted(r.value for r in out.df.collect() if r.value)


def _run_serial(fastq_dir, tmp_path):
    """The reference's serial oracle: ONE container invocation over the raw
    paired files (HaplotypeCallTest.scala:107-140) — interlace, align, call,
    sort, all inside a single sh -c."""
    results = tmp_path / "results"
    results.mkdir()
    interlace = (
        "awk 'FNR==NR{a[FNR]=$0;next}{b[FNR]=$0}"
        "END{n=FNR;for(i=1;i<=n;i+=4){"
        "for(j=0;j<4;j++)print a[i+j];for(j=0;j<4;j++)print b[i+j]}}' "
        "/input/reads_1.fastq /input/reads_2.fastq"
    )
    run_container(
        "busybox:1",
        f"{interlace} | {ALIGN_AWK} | {CALL_AWK} | sort > /results/calls.tsv",
        [(str(fastq_dir), "/input"), (str(results), "/results")],
    )
    text = (results / "calls.tsv").read_text()
    return sorted(line for line in text.split("\n") if line)


@pytest.mark.parametrize("partitions", [3, 5])
def test_parallel_equals_serial_haplotype(spark, fastq_dir, tmp_path, partitions):
    parallel = _run_parallel(spark, fastq_dir, partitions)
    serial = _run_serial(fastq_dir, tmp_path)
    assert len(serial) > 0
    assert parallel == serial
    # the fixture genuinely exercises per-(chr,pos) depth counting
    assert any(int(line.split()[2]) > 1 for line in serial)


def test_chromosome_colocation_is_load_bearing(spark, fastq_dir, tmp_path):
    """Drop the repartition_by and split the alignments across MORE
    partitions than chromosomes: per-(chr,pos) counts fragment and the
    merged output disagrees with the serial oracle — proving the E2E test
    actually depends on the co-location step (a pipeline where it didn't
    would be a hollow parity check)."""
    aligned = (
        MaRe(_interlaced(spark, fastq_dir).repartition(3))
        .map(
            input_mount=TextFile("/chunk.fastq"),
            output_mount=TextFile("/aln.sam"),
            image="busybox:1",
            command=ALIGN_CMD,
        )
        .repartition(16)  # NOT keyed: chromosomes straddle partitions
        .map(
            input_mount=TextFile("/aln.sam"),
            output_mount=TextFile("/calls"),
            image="busybox:1",
            command=CALL_CMD,
        )
        .reduce(
            input_mount=TextFile("/in"),
            output_mount=TextFile("/out"),
            image="busybox:1",
            command=MERGE_CMD,
            depth=2,
        )
    )
    fragmented = sorted(r.value for r in aligned.df.collect() if r.value)
    assert fragmented != _run_serial(fastq_dir, tmp_path)
