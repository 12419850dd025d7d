#!/usr/bin/env python
"""Perf harness for BASELINE.md configs 2-5 (config 1 is bench.py).

Mirrors the reference's perf tooling: the user_sessions dataset from
/root/reference/scripts/fakedata/activity_generator.py +
make_user_sessions.sh, and the timed-query-sweep idea of
/root/reference/scripts/test_cache_results.py (n-run medians over a
fixed query set; the reference sweeps 100k-20M rows).

Configs (BASELINE.json):
  2. filtered scan + multi-column group-by + avg/stddev (user_sessions)
  3. histogram + percentiles p50/p95/p99 with filters (uptime)
  4. time-series rollup -time-bucket (user_sessions)
  5. high-cardinality skewed (Zipf) group-by, top-k limit, across TWO
     directory partitions via the encode-flags/encode-results/aggregate
     protocol (the reference's multi-node model,
     scripts/basic_aggregation_test.sh:13-21) — run in-process,
     sequentially; real deployments run the node scans concurrently on
     separate machines, so the per-node rate is also reported.

Prints one JSON line per config to stdout and a breakdown to stderr.
Query cache is OFF (uncached scans), matching bench.py.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

BENCH_DIR = os.path.join(REPO, ".bench", "db")
RUNS = 5


def build_user_sessions(n_rows: int):
    import numpy as np  # noqa: F401

    from fakedata.activity_generator import columns
    from sybil_tpu.config import Flags
    from sybil_tpu.table import Table

    name = f"user_sessions{n_rows // 1_000_000}m"
    flags = Flags(dir=BENCH_DIR, table=name, skip_compact=True,
                  device_batch=1024)
    t = Table(name, flags)
    existing = t.record_count() if (t.exists() and t.load_info()) else 0
    if existing >= n_rows:
        return t, flags
    print(f"building {n_rows}-row user_sessions table "
          f"(resuming from {existing}) ...", file=sys.stderr)
    t0 = time.time()
    step = 1_000_000
    for start in range(existing, n_rows, step):
        m = min(step, n_rows - start)
        ints, strs = columns(m, start_index=start)
        t.ingest_columns(ints=ints, strs=strs)
    print(f"user_sessions built in {time.time() - t0:.1f}s", file=sys.stderr)
    return t, flags


def build_zipf_partitions(n_rows: int, n_parts: int = 2,
                          cardinality: int = 200_000):
    """Two directory 'nodes', each with half the rows; userid ~ Zipf(1.2)
    over `cardinality` distinct users — the skewed top-k workload."""
    import numpy as np

    from sybil_tpu.config import Flags
    from sybil_tpu.table import Table

    per = n_rows // n_parts
    out = []
    for p in range(n_parts):
        d = os.path.join(REPO, ".bench", f"db-p{p + 1}")
        # 16-block batches: the reference's combine cadence
        # (CHUNKS_BEFORE_GC, table_io.go:17) — multi-batch scans engage
        # the device-side intermediate top-k prune (ScanConfig.prune_topk)
        flags = Flags(dir=d, table="sessions_zipf", skip_compact=True,
                      device_batch=64)
        t = Table("sessions_zipf", flags)
        existing = t.record_count() if (t.exists() and t.load_info()) else 0
        if existing < per:
            print(f"building zipf partition {p + 1} ({per} rows, "
                  f"resuming from {existing}) ...", file=sys.stderr)
            rng = np.random.default_rng(900 + p * 1000 + existing)
            step = 1_000_000
            for start in range(existing, per, step):
                m = min(step, per - start)
                uid = rng.zipf(1.2, size=m) % cardinality
                t.ingest_columns(
                    ints={"weight": rng.choice([1, 10, 100], m).astype("int64"),
                          "time": 1_755_000_000
                          + rng.integers(-2419200, 0, m)},
                    strs={"userid": [f"person{u}" for u in uid]})
        out.append((t, flags, d))
    return out


def timed(fn, label: str, n_rows: int):
    # warm-up (jit compile + cold HBM upload)
    t0 = time.time()
    fn()
    print(f"[{label}] warm-up {time.time() - t0:.1f}s", file=sys.stderr)
    walls = []
    for _ in range(RUNS):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    walls.sort()
    median = walls[len(walls) // 2]
    rps = n_rows / median
    print(f"[{label}] n={RUNS} walls(ms)="
          f"{[round(w * 1e3, 1) for w in walls]} median={median * 1e3:.1f}ms"
          f" -> {rps / 1e6:.1f}M rows/s", file=sys.stderr)
    return {"metric": label, "value": round(rps), "unit": "rows/s",
            "median_ms": round(median * 1e3, 1), "rows": n_rows}


def main():
    import jax
    if os.environ.get("BENCH_PLATFORM") == "cpu":
        # the ambient axon TPU plugin overrides JAX_PLATFORMS=cpu; the
        # config knob set before backend init is the reliable override
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench", "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, FilterDef, QueryParams

    sys.path.insert(0, REPO)
    import bench

    n = int(os.environ.get("BENCH_ROWS", 8_000_000))
    results = []

    # ---- config 2: filtered multi-group avg+stddev (user_sessions) ----
    us, us_flags = build_user_sessions(n)
    us_rows = us.record_count()
    p2 = QueryParams(
        filters=(FilterDef("action", "neq", "pageload", "str"),
                 FilterDef("weight", "gt", "5", "int")),
        groups=("action", "page"),
        aggs=(AggDef("weight", "hist"),))   # hist => avg+stddev+percentiles
    results.append(timed(lambda: run_query(us, p2, us_flags),
                         "c2_filtered_multigroup_stddev", us_rows))

    # ---- config 4: time rollup (user_sessions, 1h buckets) ----
    p4 = QueryParams(groups=("action",), aggs=(AggDef("weight", "avg"),),
                     time_bucket=3600, time_col="time")
    results.append(timed(lambda: run_query(us, p4, us_flags),
                         "c4_time_rollup", us_rows))

    # ---- config 3: hist + percentiles with filters (uptime) ----
    up, up_flags = bench.build_dataset(n)
    up_rows = up.record_count()
    p3 = QueryParams(filters=(FilterDef("status", "eq", "200", "str"),),
                     groups=("host",), aggs=(AggDef("ping", "hist"),))

    def c3():
        qr = run_query(up, p3, up_flags)
        for r in qr.results.values():
            h = r.hists.get("ping")
            if h is not None:
                h.get_percentiles()
    results.append(timed(c3, "c3_hist_percentiles", up_rows))

    # ---- config 5: skewed top-k across 2 dir partitions (protocol) ----
    parts = build_zipf_partitions(n)
    total = sum(t.record_count() for t, _, _ in parts)
    p5 = QueryParams(groups=("userid",), aggs=(AggDef("weight", "avg"),),
                     limit=100, prune_by="$COUNT")

    from sybil_tpu.parallel.aggregator import aggregate_specs
    from sybil_tpu.parallel.wire import results_to_wire

    node_walls = []

    def c5():
        node_results = {}
        for i, (t, fl, _) in enumerate(parts):
            t0 = time.time()
            qr = run_query(t, p5, fl)
            node_walls.append(time.time() - t0)
            # round-trip through the wire format, as a real node does
            node_results[f"n{i}"] = json.loads(
                json.dumps(results_to_wire(qr, p5)))
        aggregate_specs(node_results, p5)
    res5 = timed(c5, "c5_skewed_topk_2part", total)
    per_node = sorted(node_walls)[len(node_walls) // 2]
    res5["per_node_median_ms"] = round(per_node * 1e3, 1)
    # both nodes scan concurrently in a real deployment: total rows in
    # one per-node wall
    res5["concurrent_nodes_rows_per_s"] = round(total / per_node)
    print(f"[c5] per-node median {per_node * 1e3:.1f}ms (nodes run "
          f"concurrently on separate machines in deployment)",
          file=sys.stderr)
    results.append(res5)

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
