#!/usr/bin/env python
"""Multi-node scaling efficiency of the hash-partitioned shuffle.

One real TPU chip is available in this image, so inter-node scaling is
measured the honest way one box allows: N OS processes pinned to
DISJOINT core sets (taskset) join one jax.distributed CPU mesh (gloo),
each scanning its span of the shared table — the same code path a TPU
pod slice runs over ICI/DCN.  Baseline is one process pinned to the
same per-node core budget.  Ideal N-node time = T1/N; efficiency =
(T1 / TN) / N.  Each node times run_query internally (process startup
and jit compile excluded; one warm-up query dropped).

The reference has no analog (its nodes never share a query mid-flight;
scripts/basic_aggregation_test.sh ships gob blobs between independent
scans).  Prints one JSON line per point.
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, ".bench", "db")
TABLE = "scaling8m"
N_ROWS = 8_000_000
CARD = 64           # group cardinality: enough device work to measure
# 8M rows: round-3 kernel work made the scan ~11x faster, so a 2M-row
# query finished in ~300ms and the shuffle's fixed per-query costs
# (gloo collectives, global-batch assembly) dominated; scaling is
# measured at a workload large enough to be worth distributing
CORES_PER_NODE = 1  # this box has 2 cores: 1 core = 1 "node"
RUNS = 5


def build_dataset():
    import numpy as np

    from sybil_tpu.config import Flags
    from sybil_tpu.table import Table

    flags = Flags(dir=BENCH_DIR, table=TABLE, skip_compact=True)
    t = Table(TABLE, flags)
    if t.exists() and t.load_info() and t.record_count() >= N_ROWS:
        return
    print(f"building {N_ROWS}-row scaling table ...", file=sys.stderr)
    rng = np.random.default_rng(55)
    step = 1_000_000
    for start in range(0, N_ROWS, step):
        t.ingest_columns(ints={
            "grp": rng.integers(0, CARD, step).astype(np.int64),
            "val": rng.integers(0, 1000, step).astype(np.int64),
        })


def node_main(args: list[str]) -> None:
    """--node mode: run inside one pinned process; print median wall."""
    import jax
    jax.config.update("jax_platforms", "cpu")

    opts = dict(zip(args[::2], args[1::2]))
    from sybil_tpu.config import Flags
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, QueryParams
    from sybil_tpu.table import Table

    flags = Flags(dir=BENCH_DIR, table=TABLE, skip_compact=True,
                  device_batch=64,
                  data_shards=int(opts["--shards"]),
                  dist_coordinator=opts.get("--coord", ""),
                  dist_process_id=int(opts.get("--pid", -1)),
                  dist_num_processes=int(opts.get("--nproc", 0)))
    t = Table(TABLE, flags)
    t.load_info()
    params = QueryParams(groups=("grp",), aggs=(AggDef("val", "avg"),))

    run_query(t, params, flags)          # warm-up: compile + page cache
    walls = []
    for _ in range(RUNS):
        t0 = time.time()
        qr = run_query(t, params, flags)
        walls.append(time.time() - t0)
    assert sum(r.count for r in qr.results.values()) == N_ROWS
    walls.sort()
    print(json.dumps({"median_s": walls[len(walls) // 2]}))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={CORES_PER_NODE}"
    env["PYTHONPATH"] = REPO
    return env


def launch(nproc: int) -> float:
    """Start nproc pinned node processes; return the slowest median."""
    port = _free_port()
    procs = []
    for pid in range(nproc):
        lo = pid * CORES_PER_NODE
        argv = ["taskset", "-c", f"{lo}-{lo + CORES_PER_NODE - 1}",
                sys.executable, os.path.abspath(__file__), "--node",
                "--shards", str(nproc * CORES_PER_NODE)]
        if nproc > 1:
            argv += ["--coord", f"localhost:{port}",
                     "--pid", str(pid), "--nproc", str(nproc)]
        procs.append(subprocess.Popen(
            argv, env=_env(), cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    medians = []
    for p in procs:
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0, err[-2000:]
        for ln in out.splitlines():
            if ln.startswith("{"):
                medians.append(json.loads(ln)["median_s"])
    assert len(medians) == nproc
    return max(medians)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--node":
        node_main(sys.argv[2:])
        return

    ncores = os.cpu_count() or 1
    max_nodes = max(1, min(4, ncores // CORES_PER_NODE))
    build_dataset()

    t1 = launch(1)
    rate1 = N_ROWS / t1
    print(f"1 node ({CORES_PER_NODE} cores): median {t1 * 1e3:.0f}ms "
          f"= {rate1 / 1e6:.1f}M rows/s", file=sys.stderr)
    print(json.dumps({"metric": "scaling_1node_rows_per_s",
                      "value": round(rate1), "unit": "rows/s",
                      "median_ms": round(t1 * 1e3, 1)}))

    for n in range(2, max_nodes + 1):
        tn = launch(n)
        raten = N_ROWS / tn
        eff = (t1 / tn) / n
        print(f"{n} nodes: median {tn * 1e3:.0f}ms = "
              f"{raten / 1e6:.1f}M rows/s, efficiency {eff:.0%}",
              file=sys.stderr)
        print(json.dumps({
            "metric": f"scaling_{n}node_rows_per_s",
            "value": round(raten), "unit": "rows/s",
            "median_ms": round(tn * 1e3, 1),
            "efficiency_vs_1node": round(eff, 3)}))


if __name__ == "__main__":
    main()
