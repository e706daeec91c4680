#!/usr/bin/env python
"""Per-second host-weather log: CPU time-share deltas (user/sys/idle/iowait/
**steal**) from /proc/stat, plus loadavg and /proc/pressure/cpu avg10.

Motivation (r10 stall investigation): this sandbox is a VM on a shared
host, and bench blowups that looked like engine regressions were in fact
**CPU-steal storms** — the hypervisor descheduling the guest's vCPUs.
Evidence that ruled the engine out:

* identical code + conf, back-to-back full sweeps: 137 s, 371 s, 149 s
  total wall (runs 1-3 of the codegen-instrumented sweep);
* inside the 371 s run, pure-JVM relational queries with no Python UDFs,
  no operator caches and **zero** janino compilations slowed 10-45x
  (q_sql_returned_items count 35.7 s, q1_pricing_summary noop 24.8 s);
* this monitor records steal spikes up to 42% of a second with the guest
  near-idle — sustained storms explain the multi-second "JVM looks idle,
  no tasks launch" windows in the event logs.

Run it alongside any timing experiment and correlate slow samples against
`steal=` before attributing a regression to code (guide §1: measure first;
§7.4 failure-signature discipline). Usage:

    python tools/sysmon.py [outfile]   # default /tmp/sysmon.log, append
"""
from __future__ import annotations

import sys
import time


def cpu() -> list[int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal guest
    return [int(x) for x in parts[1:10]]


def psi() -> str:
    try:
        with open("/proc/pressure/cpu") as f:
            line = f.readline()  # "some avg10=0.00 avg60=..."
        return line.split()[1].split("=")[1]
    except OSError:
        return "?"


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sysmon.log"
    out = open(path, "a", buffering=1)
    prev = cpu()
    while True:
        time.sleep(1.0)
        cur = cpu()
        d = [c - p for c, p in zip(cur, prev)]
        prev = cur
        tot = sum(d) or 1
        with open("/proc/loadavg") as f:
            la = f.read().split()[0]
        out.write(
            f"{time.time():.0f} user={100 * d[0] // tot} "
            f"sys={100 * d[2] // tot} idle={100 * d[3] // tot} "
            f"iow={100 * d[4] // tot} steal={100 * d[7] // tot} "
            f"load={la} psi10={psi()}\n"
        )


if __name__ == "__main__":
    main()
