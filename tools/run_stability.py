#!/usr/bin/env python3
"""Run the full test suite N consecutive times and record the outcomes.

Produces the stability artifact the round-2 review asked for (a single green
run is not evidence of reliability): ``STABILITY_r03.json`` with per-run
pass/fail/skip counts, duration, and exit code, plus the git commit the runs
were taken at.

Usage: python tools/run_stability.py [N] [OUT.json]
"""

import json
import re
import subprocess
import sys
import time


def one_run(i: int) -> dict:
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"],
        capture_output=True, text=True, timeout=3600,
    )
    dur = round(time.time() - t0, 1)
    tail = (p.stdout.strip().splitlines() or [""])[-1]
    counts = {k: int(v) for v, k in re.findall(r"(\d+) (passed|failed|skipped|errors?)", tail)}
    rec = {
        "run": i,
        "exit_code": p.returncode,
        "duration_s": dur,
        "summary": tail,
        **counts,
    }
    if p.returncode != 0:
        rec["failures"] = [
            ln for ln in p.stdout.splitlines() if ln.startswith("FAILED")
        ][:20]
    return rec


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    out = sys.argv[2] if len(sys.argv) > 2 else "STABILITY_r03.json"
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    runs = []
    for i in range(1, n + 1):
        rec = one_run(i)
        runs.append(rec)
        print(f"run {i}/{n}: exit={rec['exit_code']} {rec['summary']}", flush=True)
    report = {
        "commit": commit,
        "runs_requested": n,
        "runs_green": sum(1 for r in runs if r["exit_code"] == 0),
        "runs": runs,
    }
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}: {report['runs_green']}/{n} green")
    return 0 if report["runs_green"] == n else 1


if __name__ == "__main__":
    sys.exit(main())
