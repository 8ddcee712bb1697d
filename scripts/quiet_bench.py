#!/usr/bin/env python
"""Adjacent-runs quiet-host bench protocol: invoke bench.py N times
back-to-back (separate processes, like the driver does) and aggregate
per-entry medians per run + min/max across runs into the committed
BENCH_QUIET-style artifact. Run on an otherwise-idle host.

Usage: python scripts/quiet_bench.py OUT.json [n_runs]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_path = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    runs = []
    for i in range(n_runs):
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-2000:])
            raise SystemExit(f"bench run {i} failed rc={p.returncode}")
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][0]
        runs.append(json.loads(line))
        print(f"run {i}: total {runs[-1]['value']}s", file=sys.stderr)
    names = list(runs[0]["queries"])
    queries = {}
    for name in names:
        med = [r["queries"][name] for r in runs]
        mm = [r["queries_minmax"][name] for r in runs]
        queries[name] = {
            "median_per_run": med,
            "min_across_runs": min(m[0] for m in mm),
            "max_across_runs": max(m[1] for m in mm),
            "final_head_minmax": mm[-1],
        }
    artifact = {
        "metric": "headline_query_wall_time",
        "unit": "sec",
        "sf": runs[0]["sf"],
        "n": len(names),
        "totals_per_run": [r["value"] for r in runs],
        "headline_value": min(r["value"] for r in runs),
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"totals_per_run": artifact["totals_per_run"],
                      "headline_value": artifact["headline_value"]}))


if __name__ == "__main__":
    main()
