#!/usr/bin/env python
"""Per-shape DEVICE time for the BASELINE configs — the roofline tool.

For each benchmark shape (configs 1-5 + count-distinct) this runs the
query warm, captures one run under jax.profiler.trace, and reports:

  - wall_ms:        median in-process wall (3 runs, forced fetch)
  - device_ms:      sum of XLA-op durations on the device trace track
  - device_rows_per_s: rows / device_ms — the on-pod rate the shape
    would run at without the tunnel RTT/download (BASELINE.md's ">10x
    on-pod" claim, checkable per shape)
  - hbm_bytes_per_row: resident column bytes the scan reads per row
    (decoded int64 values + validity per needed column), and the
    implied achieved HBM bandwidth at device_ms
  - top device ops (name: ms) for kernel work

Run on the real TPU (default) or BENCH_PLATFORM=cpu for a smoke test.
Writes one JSON line per shape; stderr carries the op breakdown.
(Ref: the reference CI records ns/op per microbench,
/root/reference/src/lib/benchmarks_test.go:9-51.)
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

TRACE_DIR = os.path.join(REPO, ".bench", "devtrace")


def device_ms_from_trace(trace_dir: str):
    """Sum per-op durations on the device 'XLA Ops' track."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return 0.0, {}
    path = max(paths, key=os.path.getmtime)
    ev = json.load(gzip.open(path))["traceEvents"]
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pnames.items()
                if "TPU" in n or "/device" in n.lower()}
    per_thread = collections.defaultdict(float)
    per_op = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid, tid = e.get("pid"), e.get("tid")
        if dev_pids and pid not in dev_pids:
            continue
        tn = tnames.get((pid, tid), "")
        key = (pid, tid, tn)
        per_thread[key] += e["dur"]
    # prefer the "XLA Ops" thread; else the busiest device thread
    ops_threads = [k for k in per_thread if "XLA Ops" in k[2]]
    if ops_threads:
        chosen = set(ops_threads)
    elif per_thread:
        chosen = {max(per_thread, key=per_thread.get)}
    else:
        return 0.0, {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid, tid = e.get("pid"), e.get("tid")
        tn = tnames.get((pid, tid), "")
        if (pid, tid, tn) in chosen:
            total += e["dur"]
            per_op[e["name"]] += e["dur"]
    top = dict(sorted(per_op.items(), key=lambda kv: -kv[1])[:8])
    return total / 1e3, {k: round(v / 1e3, 2) for k, v in top.items()}


def measure(label, fn, rows, bytes_per_row=None):
    import jax
    fn()  # warm
    walls = []
    for _ in range(3):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    wall_ms = sorted(walls)[1] * 1e3
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        fn()
    dms, top = device_ms_from_trace(TRACE_DIR)
    rec = {"metric": f"device_time_{label}", "rows": rows,
           "wall_ms": round(wall_ms, 1), "device_ms": round(dms, 1),
           "device_rows_per_s": round(rows / (dms / 1e3)) if dms else 0}
    if bytes_per_row is not None:
        rec["hbm_bytes_per_row"] = round(bytes_per_row, 2)
        if dms:
            rec["achieved_hbm_gb_per_s"] = round(
                rows * bytes_per_row / (dms / 1e3) / 1e9, 1)
    print(f"[{label}] wall {wall_ms:.1f}ms device {dms:.1f}ms top: "
          f"{top}", file=sys.stderr)
    print(json.dumps(rec))
    sys.stdout.flush()
    return rec


def col_bytes_per_row(table, cols):
    """Decoded HBM residency per row for the named columns: int64
    values + uint8 validity per int/str column (ops/decode.py)."""
    return sum(9 for _ in cols)


def main():
    import jax
    if os.environ.get("BENCH_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench", "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, FilterDef, QueryParams

    import bench
    from bench_configs import build_user_sessions, build_zipf_partitions

    n = int(os.environ.get("BENCH_ROWS", 8_000_000))
    only = set(os.environ.get("BENCH_ONLY", "").split(",")) \
        if os.environ.get("BENCH_ONLY") else None

    def want(label):
        return only is None or label in only

    up, up_flags = bench.build_dataset(n)
    up_rows = up.record_count()
    us, us_flags = build_user_sessions(n)
    us_rows = us.record_count()

    if want("c1"):
        p1 = QueryParams(groups=("host",), aggs=(AggDef("ping", "avg"),))
        measure("c1", lambda: run_query(up, p1, up_flags), up_rows,
                col_bytes_per_row(up, ["host", "ping"]))
    if want("c2"):
        p2 = QueryParams(
            filters=(FilterDef("action", "neq", "pageload", "str"),
                     FilterDef("weight", "gt", "5", "int")),
            groups=("action", "page"),
            aggs=(AggDef("weight", "hist"),))
        measure("c2", lambda: run_query(us, p2, us_flags), us_rows,
                col_bytes_per_row(us, ["action", "page", "weight"]))
    if want("c3"):
        p3 = QueryParams(filters=(FilterDef("status", "eq", "200", "str"),),
                         groups=("host",), aggs=(AggDef("ping", "hist"),))

        def c3():
            qr = run_query(up, p3, up_flags)
            for r in qr.results.values():
                h = r.hists.get("ping")
                if h is not None:
                    h.get_percentiles()
        measure("c3", c3, up_rows,
                col_bytes_per_row(up, ["status", "host", "ping"]))
    if want("c4"):
        p4 = QueryParams(groups=("action",), aggs=(AggDef("weight", "avg"),),
                         time_bucket=3600, time_col="time")
        measure("c4", lambda: run_query(us, p4, us_flags), us_rows,
                col_bytes_per_row(us, ["action", "weight", "time"]))
    if want("c5"):
        parts = build_zipf_partitions(n)
        t5, fl5, _ = parts[0]
        rows5 = t5.record_count()
        p5 = QueryParams(groups=("userid",), aggs=(AggDef("weight", "avg"),),
                         limit=100, prune_by="$COUNT")
        measure("c5_per_node", lambda: run_query(t5, p5, fl5), rows5,
                col_bytes_per_row(t5, ["userid", "weight"]))
    if want("distinct"):
        pd = QueryParams(distincts=("host",))
        measure("distinct", lambda: run_query(up, pd, up_flags), up_rows,
                col_bytes_per_row(up, ["host"]))


if __name__ == "__main__":
    main()
