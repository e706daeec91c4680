"""The driver parses bench.py's stdout as exactly ONE JSON line with a
fixed key set — a regression here silently loses the round's BENCH
artifact, so the contract is pinned in CI. The bench is run in-process
on a single cheap query (full-corpus runs belong to `make bench`)."""

from __future__ import annotations

import json


def test_bench_emits_single_json_line_with_contract_keys(
    spark, monkeypatch, capsys
):
    import bench
    from mare_spark import registry

    q6 = registry.all_queries()["q6_revenue_change"]
    monkeypatch.setattr(bench, "WARM_RUNS", 1)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(
        registry, "all_queries", lambda: {"q6_revenue_change": q6}
    )
    # bench stops its session on exit; the suite's session must survive
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    bench.main()

    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1, lines  # ONE line on stdout, narration on stderr
    payload = json.loads(lines[0])
    assert payload["metric"] == "headline_query_total"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert set(payload) == {
        "metric", "value", "value_normalized", "value_full_exec", "unit",
        "queries", "queries_full_exec", "sf", "calibration",
    }
    for probe in (payload["calibration"]["before"],
                  payload["calibration"]["after"]):
        assert probe["spark_fixed_sec"] > 0
        assert probe["python_fixed_sec"] > 0
    # normalization only DISCOUNTS external load, never inflates
    assert 0 < payload["value_normalized"] <= payload["value"]
    assert payload["calibration"]["load_factor"] >= 1.0
    assert payload["calibration"]["idle_floor_sec"] > 0
    assert payload["queries"] == {
        "q6_revenue_change": payload["queries"]["q6_revenue_change"]
    }
    assert payload["value"] >= 0
    # the full-exec companion series (r8: count() lets Catalyst prune
    # final projections/aggregate expressions, under-measuring
    # expression-heavy tails) covers the same query set
    assert set(payload["queries_full_exec"]) == set(payload["queries"])
    assert payload["value_full_exec"] > 0
    # sf-dir parsing tolerates variant suffixes (r8: float("0.1.") crash)
    import re as _re

    m = _re.search(r"sf([0-9]+(?:\.[0-9]+)?)", "/x/sf0.1.bak")
    assert m and float(m.group(1)) == 0.1
