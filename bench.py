#!/usr/bin/env python
"""Headline benchmark: rows scanned+aggregated per second on the
basic-aggregation query (group by host, avg ping) over an uptime table —
the reference's `make fake-data` + basic_aggregation_test.sh workload
(BASELINE.md config 1), at 8M and 64M rows (the reference's own perf
harness sweeps 100k-20M rows, scripts/test_cache_results.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
64M-row headline; the 8M-row figure and a per-phase device/wall
breakdown go to stderr.

vs_baseline compares against BASELINE_ROWS_PER_S, the estimated
reference (Go sybil) single-machine scan rate on this workload.  The
repo ships no published numbers and no Go toolchain exists in this
image (BASELINE.md), so the estimate is derived from sybil's design: a
per-record interpreted scan loop at ~50-100ns/row/core over all cores.
Kept deliberately generous; revisit when a Go binary can be measured.
The baseline constant is independent of table size — the reference's
per-row cost is flat, while this engine's rows/s rises with table size
because each query pays a fixed ~30ms tunnel round trip (BASELINE.md
documents the floor); compare like-for-like sizes.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, ".bench", "db")
BASELINE_ROWS_PER_S = 20_000_000.0  # estimated Go sybil, one machine
RUNS = 5

HOSTS = ["www.facebook.com", "www.yahoo.com", "www.google.com",
         "www.reddit.com", "github.com"]
# status is a STRING column, matching the reference fake-data schema
# (scripts/fakedata/host_generator.py)
STATII = ["200", "403", "404", "500", "503"]


def build_dataset(n_rows: int):
    import numpy as np

    from sybil_tpu.config import Flags
    from sybil_tpu.table import Table

    name = f"uptime{n_rows // 1_000_000}m"
    flags = Flags(dir=BENCH_DIR, table=name, skip_compact=True,
                  device_batch=1024)
    t = Table(name, flags)
    existing = t.record_count() if (t.exists() and t.load_info()) else 0
    if existing >= n_rows:
        return t, flags

    print(f"building {n_rows}-row uptime table via bulk columnar ingest "
          f"(resuming from {existing}) ...", file=sys.stderr)
    rng = np.random.default_rng(1337 + existing)
    now = 1_755_000_000
    t0 = time.time()
    step = 1_000_000
    for start in range(existing, n_rows, step):
        n = min(step, n_rows - start)
        hosts_idx = rng.integers(0, 5, n)
        stat_idx = rng.integers(0, 5, n)
        t.ingest_columns(
            ints={
                "ping": np.abs(rng.normal(60, 20, n)).astype(np.int64),
                "weight": rng.choice([1, 10, 100], n).astype(np.int64),
                "time": now + rng.integers(-2419200, 2419200, n),
                "index_int": np.arange(start, start + n, dtype=np.int64),
            },
            strs={"host": [HOSTS[i] for i in hosts_idx],
                  "status": [STATII[i] for i in stat_idx]})
        if (start + n) % 8_000_000 == 0 or start + n == n_rows:
            print(f"  {start + n}/{n_rows}", file=sys.stderr)
    print(f"dataset built in {time.time() - t0:.1f}s", file=sys.stderr)
    return t, flags


def probe_link() -> float:
    """Measured host->device bandwidth right now (the tunneled link
    swings 1-70 MB/s; warm-up numbers are meaningless without this).
    block_until_ready can report early on the tunneled backend, so the
    probe forces a REAL round trip by fetching a slice of the uploaded
    buffer back."""
    import jax
    import numpy as np
    x = np.ones(8 << 20, dtype=np.uint8)
    np.asarray(jax.device_put(x[: 1 << 16])[:8])      # wake the link
    t0 = time.time()
    got = np.asarray(jax.device_put(x)[:: 1 << 20])   # real sync
    dt = time.time() - t0
    assert int(got.sum()) == len(got)
    return 8.0 / max(dt, 1e-9)


def bench_table(n_rows: int, debug_timing: bool = False):
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, QueryParams

    t, flags = build_dataset(n_rows)
    params = QueryParams(groups=("host",), aggs=(AggDef("ping", "avg"),))
    actual = t.record_count()

    # warm-up, attributed: the first query pays (a) column upload over
    # the link (the `load` phase — compare against the probed MB/s),
    # (b) jit trace + compile submit (`dispatch`; local XLA compiles are
    # persistent-cached under .bench/jaxcache), and (c) server-side
    # executable load + first execution (`drain` — on the tunneled axon
    # transport this is charged per process and no local cache avoids
    # it).  Steady-state numbers below never include any of this.
    mbps = probe_link()
    from sybil_tpu.profiler import PhaseTimer
    phases = {}
    orig_report = PhaseTimer.report

    def capture(self, label):
        phases.update(self.totals)
        return orig_report(self, label)

    PhaseTimer.report = capture
    t0 = time.time()
    try:
        qr = run_query(t, params, flags)
    finally:
        PhaseTimer.report = orig_report
    wall = time.time() - t0
    split = " ".join(f"{k} {phases[k]:.1f}s" for k in
                     ("load", "dispatch", "drain", "bind", "list_blocks")
                     if phases.get(k, 0) >= 0.05)
    print(f"[{n_rows//1_000_000}M] warm-up {wall:.1f}s "
          f"(link {mbps:.1f} MB/s; {split}; "
          f"load~=upload, dispatch~=local compile [persistent-cached], "
          f"drain~=server-side executable load + first run)",
          file=sys.stderr)
    total = sum(r.count for r in qr.results.values())
    assert total == actual, f"scan covered {total}/{actual} rows"

    if debug_timing:
        # one instrumented run: per-phase breakdown to stderr
        import sybil_tpu.debug as dbg
        old = dbg.DEBUG_FLAG
        dbg.DEBUG_FLAG = True
        try:
            run_query(t, params, flags)
        finally:
            dbg.DEBUG_FLAG = old

    walls = []
    for _ in range(RUNS):
        t0 = time.time()
        qr = run_query(t, params, flags)
        walls.append(time.time() - t0)
    walls.sort()
    median = walls[len(walls) // 2]
    rows_per_s = actual / median
    print(f"[{n_rows//1_000_000}M] n={RUNS} walls(ms)="
          f"{[round(w * 1e3, 1) for w in walls]} median={median*1e3:.1f}ms "
          f"-> {rows_per_s/1e6:.1f}M rows/s "
          f"({rows_per_s/BASELINE_ROWS_PER_S:.2f}x est. baseline)",
          file=sys.stderr)
    return rows_per_s


def main():
    # persistent compile cache: the driver re-runs this in a fresh
    # process; paying jit compile once, not per run, mirrors how a
    # resident serving process would behave
    import jax
    if os.environ.get("BENCH_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench", "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.environ.get("BENCH_ROWS"):
        rows_per_s = bench_table(int(os.environ["BENCH_ROWS"]),
                                 debug_timing=True)
    else:
        bench_table(8_000_000, debug_timing=True)
        rows_per_s = bench_table(64_000_000, debug_timing=True)

    print(json.dumps({
        "metric": "scan_agg_rows_per_sec",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / BASELINE_ROWS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
