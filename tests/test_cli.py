"""CLI tests (in-process — subprocess would pay a fresh JVM per test)."""

from __future__ import annotations

import json

from mare_spark.__main__ import main
from tests.conftest import SF_SMOKE


def test_cli_list_filters_category(spark, capsys):
    assert main(["list", "--category", "llm"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all("\tllm\t" in line for line in out)
    assert any(line.startswith("dedup_exact\t") for line in out)


def test_cli_run_json(spark, capsys):
    assert (
        main(["run", "q1_pricing_summary", "--sf-dir", SF_SMOKE, "--json"]) == 0
    )
    cap = capsys.readouterr()
    rows = [json.loads(line) for line in cap.out.strip().splitlines()]
    assert len(rows) == 6
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(rows[0])
    assert "rows" in cap.err  # row count goes to stderr, not stdout


def test_cli_run_unknown_query(spark, capsys):
    assert main(["run", "no_such_query", "--sf-dir", SF_SMOKE]) == 2


def test_cli_sql_tsv_with_limit(spark, capsys):
    assert (
        main(
            [
                "sql",
                "SELECT l_orderkey FROM lineitem ORDER BY l_orderkey",
                "--sf-dir",
                SF_SMOKE,
                "--limit",
                "3",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "l_orderkey"
    assert len(out) == 4


def test_cli_explain_prints_plan(spark, capsys):
    assert main(["explain", "q1_pricing_summary", "--sf-dir", SF_SMOKE]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_cli_report(capsys):
    """The dataset-card command prints all four audit sections."""
    from mare_spark.__main__ import main

    from tests.conftest import SF_SMOKE

    assert main(["report", "--sf-dir", SF_SMOKE, "--limit", "5"]) == 0
    out = capsys.readouterr().out
    for section in ("corpus mix", "quality funnel", "duplicate clusters",
                    "length histogram"):
        assert section in out


def test_cli_report_json_is_pure_jsonl(spark, capsys):
    """r8 review: --json stdout must be machine-parseable JSONL — the
    section headers were interleaved into stdout, breaking the
    documented pipe contract; they now go to stderr and each row carries
    its section name."""
    import json as _json

    assert main(
        ["report", "--sf-dir", SF_SMOKE, "--limit", "3", "--json"]
    ) == 0
    out = capsys.readouterr()
    sections = set()
    for line in out.out.splitlines():
        if not line.strip():
            continue
        row = _json.loads(line)  # every stdout line parses
        sections.add(row["section"])
    assert "corpus_mix_report" in sections
    assert "== " in out.err  # headers landed on stderr


def test_cli_unknown_query_suggests(spark, capsys):
    assert main(["run", "q1_pricing_sumary", "--sf-dir", SF_SMOKE]) == 2
    err = capsys.readouterr().err
    assert "did you mean" in err and "q1_pricing_summary" in err
