#!/usr/bin/env python
"""CI microbench regression gate — the benchcmp analog.

The reference compares every branch's Go microbench numbers against
master with `benchcmp` and fails CI on regressions
(/root/reference/scripts/ci_run_benchmarks.sh:1-11,
/root/reference/.circleci/config.yml:30-45).  This is the same gate for
the CPU bench: run the headline bench (and optionally more metrics),
compare each metric against the committed baseline
(scripts/bench_baseline_cpu.json), and FAIL when a metric falls below
tolerance * baseline.

CI runners' absolute CPU speed varies run to run, so the gate uses a
generous default tolerance (0.45): it will not flap on runner noise,
but a kernel regression that halves throughput turns the job red.

Usage:
    python scripts/bench_gate.py            # run + compare (CI mode)
    python scripts/bench_gate.py --update   # refresh the baseline
Env:
    BENCH_GATE_TOLERANCE   fraction of baseline required (default 0.45)
    BENCH_GATE_ROWS        table size (default 200000)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(REPO, "scripts", "bench_baseline_cpu.json")


def run_bench(rows: int) -> dict:
    env = dict(os.environ, BENCH_PLATFORM="cpu", BENCH_ROWS=str(rows))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, check=True)
    metrics = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if "metric" in rec and "value" in rec:
            metrics[rec["metric"]] = rec["value"]
    if not metrics:
        print(out.stdout)
        print(out.stderr, file=sys.stderr)
        raise SystemExit("bench emitted no JSON metric lines")
    return metrics


def main() -> int:
    tol = float(os.environ.get("BENCH_GATE_TOLERANCE", "0.45"))
    rows = int(os.environ.get("BENCH_GATE_ROWS", "200000"))
    metrics = run_bench(rows)

    if "--update" in sys.argv:
        with open(BASELINE_PATH, "w") as f:
            json.dump({"rows": rows, "tolerance": tol,
                       "metrics": metrics}, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"baseline updated: {BASELINE_PATH} {metrics}")
        return 0

    try:
        with open(BASELINE_PATH) as f:
            base = json.load(f)
    except FileNotFoundError:
        print(f"no committed baseline at {BASELINE_PATH}; "
              "run with --update first", file=sys.stderr)
        return 2

    failed = False
    for name, bval in sorted(base["metrics"].items()):
        cur = metrics.get(name)
        if cur is None:
            print(f"FAIL {name}: metric missing from bench output")
            failed = True
            continue
        ratio = cur / bval if bval else float("inf")
        status = "ok" if ratio >= tol else "FAIL"
        print(f"{status} {name}: {cur:,} vs baseline {bval:,} "
              f"({ratio:.2f}x, gate {tol:.2f}x)")
        if ratio < tol:
            failed = True
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
