#!/usr/bin/env python
"""Capture `.explain("formatted")` for every bench query into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [suffix]
  tag    — plans subdirectory, e.g. r09
  suffix — file suffix, "before" (default) or "after"

Plans are captured at the bench SF (default /root/testdata/sf0.1) so the
committed files match what the bench measures. NOTE: for driver-composed
queries (dedup_clusters' union-find tier, BPE merge loop) building the
DataFrame itself executes jobs; the explain then shows only the FINAL
fragment. Those are annotated with a header line.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    from mare_spark.registry import all_queries
    from mare_spark.session import get_spark

    spark = get_spark("capture_plans")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    for name, q in sorted(all_queries().items()):
        if not q.bench and only is None:
            continue
        if only is not None and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = q.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
