#!/usr/bin/env python
"""HBM-overflow scan: throughput when the decoded working set exceeds
the residency budget.

The MAX_MEM analog (/root/reference/src/lib/table_query.go:15,282-304).
Scans the bench uptime table twice per regime:

  resident   budget >> working set — warm queries touch no transfer
  overflow   budget < working set — every scan LRU-evicts and
             re-uploads part of the columns (streaming upload overlaps
             the per-batch pipeline), degrading to upload bandwidth
             instead of failing

Prints one JSON line per regime.  Env: OVERFLOW_BENCH_ROWS (default
8_000_000), OVERFLOW_BUDGET_FRACTION (default 0.4).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

N = int(os.environ.get("OVERFLOW_BENCH_ROWS", 8_000_000))
FRACTION = float(os.environ.get("OVERFLOW_BUDGET_FRACTION", 0.4))
RUNS = 3


def main():
    import jax
    if os.environ.get("BENCH_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench", "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from sybil_tpu.ops import residency
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, QueryParams

    t, flags = bench.build_dataset(N)
    rows = t.record_count()
    params = QueryParams(groups=("host",), aggs=(AggDef("ping", "avg"),))
    cache = residency.CACHE

    def series(label):
        walls = []
        for _ in range(RUNS):
            t0 = time.time()
            run_query(t, params, flags)
            walls.append(time.time() - t0)
        med = sorted(walls)[len(walls) // 2]
        print(json.dumps({
            "metric": f"overflow_{label}", "rows": rows,
            "budget_mb": round(cache.max_bytes / 1e6, 1),
            "resident_mb": round(cache.bytes / 1e6, 1),
            "hits": cache.hits, "misses": cache.misses,
            "median_ms": round(med * 1e3, 1),
            "rows_per_s": round(rows / med)}))
        sys.stdout.flush()

    # resident regime: everything fits
    cache.clear()
    run_query(t, params, flags)        # warm (compile + upload)
    ws = cache.bytes
    print(f"working set: {ws / 1e6:.1f} MB", file=sys.stderr)
    series("resident")

    # overflow regime: budget below the working set -> LRU churn
    cache.clear()
    cache.max_bytes = int(ws * FRACTION)
    run_query(t, params, flags)        # fill under the tight budget
    series("evicting")
    assert cache.bytes <= cache.max_bytes, "budget exceeded"
    cache.max_bytes = residency.MAX_BYTES


if __name__ == "__main__":
    main()
