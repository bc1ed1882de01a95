#!/usr/bin/env python
"""bench.py wrapper that records environment noise around each run:
start loadavg, and CPU steal% measured over the run from /proc/stat.
Appends one JSON line per run to the file given as argv[1] (default
/tmp/bench_runs.jsonl).

Usage: python scripts/bench_quiet.py [out.jsonl] [n_runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_runs.jsonl"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    for _ in range(n_runs):
        load = open("/proc/loadavg").read().split()[0]
        s0, t0 = cpu_ticks()
        w0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            capture_output=True, text=True, cwd=HERE,
        )
        wall = time.time() - w0
        s1, t1 = cpu_ticks()
        steal_pct = 100.0 * (s1 - s0) / max(1, t1 - t0)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
        try:
            bench = json.loads(line)
        except json.JSONDecodeError:
            bench = {"error": line[:200]}
        rec = {
            "start_loadavg": float(load),
            "steal_pct": round(steal_pct, 2),
            "proc_wall_s": round(wall, 1),
            "value": bench.get("value"),
            "queries": bench.get("queries"),
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps({k: rec[k] for k in
                          ("start_loadavg", "steal_pct", "value")}))


if __name__ == "__main__":
    main()
