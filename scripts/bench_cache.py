#!/usr/bin/env python
"""Query-cache perf sweep: uncached vs cache-write vs cache-hit.

Port of the reference's cache benchmark protocol
(/root/reference/scripts/test_cache_results.py:29-47,118-160): the same
15 query shapes, each timed three ways over the bench uptime table —
  uncached   cache off
  write      cache on, cold cache dir (scan + save group partials)
  hit        cache on, warm cache dir (merge cached partials, scan only
             the uncacheable trailing blocks)

Runs in-process with warm jit (median of RUNS), so the numbers isolate
engine+cache work from compile/tunnel noise.  Prints one row per query
shape and a final JSON line with the sweep medians.

A fourth axis, `cold`, re-runs the uncached query after evicting BOTH
the OS page cache for every block file (posix_fadvise DONTNEED — the
vmtouch analog in the reference's harness, test_cache_results.py:29-47)
AND the device HBM residency cache, so it prices a genuinely cold
storage walk: disk -> host decode -> device upload -> scan.
"""

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = 3
N_ROWS = int(os.environ.get("CACHE_BENCH_ROWS", 8_000_000))

# (params-builder name, label) — mirrors test_cache_results.py:29-47
QUERIES = [
    ("count", "COUNT(*)"),
    ("avg", "AVG(ping)"),
    ("hist", "HIST(ping)"),
    ("time_avg", "AVG(ping) BUCKET(time,21600)"),
    ("group", "GROUP BY host"),
    ("distinct", "COUNT DISTINCT(host)"),
    ("time_distinct", "DISTINCT(host) BUCKET(time,21600)"),
    ("group_avg", "AVG(ping) GROUP BY host"),
    ("group_avg_lim", "AVG(ping) GROUP BY host LIMIT 10"),
    ("group_hist", "HIST(ping) GROUP BY host"),
    ("re_filter", "AVG(ping) WHERE host ~= facebook|google"),
    ("group2", "GROUP BY host,status"),
    ("group2_avg", "AVG(ping) GROUP BY host,status"),
    ("time_group_10", "AVG(ping) GROUP host,BUCKET LIMIT 10"),
    ("time_group_100", "AVG(ping) GROUP host,BUCKET LIMIT 100"),
]


def build_params(kind):
    from sybil_tpu.query.spec import AggDef, FilterDef, QueryParams

    tb = dict(time_bucket=21600, time_col="time")
    return {
        "count": QueryParams(),
        "avg": QueryParams(aggs=(AggDef("ping", "avg"),)),
        "hist": QueryParams(aggs=(AggDef("ping", "hist"),)),
        "time_avg": QueryParams(aggs=(AggDef("ping", "avg"),), **tb),
        "group": QueryParams(groups=("host",)),
        "distinct": QueryParams(distincts=("host",)),
        "time_distinct": QueryParams(distincts=("host",), **tb),
        "group_avg": QueryParams(groups=("host",),
                                 aggs=(AggDef("ping", "avg"),)),
        "group_avg_lim": QueryParams(groups=("host",),
                                     aggs=(AggDef("ping", "avg"),),
                                     limit=10),
        "group_hist": QueryParams(groups=("host",),
                                  aggs=(AggDef("ping", "hist"),)),
        "re_filter": QueryParams(
            aggs=(AggDef("ping", "avg"),),
            filters=(FilterDef("host", "re", "facebook|google", "str"),)),
        "group2": QueryParams(groups=("host", "status")),
        "group2_avg": QueryParams(groups=("host", "status"),
                                  aggs=(AggDef("ping", "avg"),)),
        "time_group_10": QueryParams(groups=("host",),
                                     aggs=(AggDef("ping", "avg"),),
                                     limit=10, **tb),
        "time_group_100": QueryParams(groups=("host",),
                                      aggs=(AggDef("ping", "avg"),),
                                      limit=100, **tb),
    }[kind]


def median_ms(fn):
    walls = []
    for _ in range(RUNS):
        t0 = time.time()
        fn()
        walls.append((time.time() - t0) * 1e3)
    walls.sort()
    return walls[len(walls) // 2]


def evict_storage(table_dir: str) -> None:
    """Drop the OS page cache for every file under the table (the
    vmtouch -e analog) and the device-side HBM residency, so the next
    scan pays the full cold storage walk."""
    from sybil_tpu.ops import residency
    residency.CACHE.clear()
    for root, _dirs, files in os.walk(table_dir):
        for f in files:
            p = os.path.join(root, f)
            try:
                fd = os.open(p, os.O_RDONLY)
                try:
                    os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
                finally:
                    os.close(fd)
            except OSError:
                pass


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # the ambient axon TPU plugin overrides JAX_PLATFORMS at import
        # time; honor the env var (CPU smoke tests)
        try:
            jax.config.update("jax_platforms",
                              os.environ["JAX_PLATFORMS"])
        except Exception:  # noqa: BLE001
            pass
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench", "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench  # noqa: E402  (repo-root bench.py: dataset builder)
    sys.modules.setdefault("bench_ds", bench)
    from sybil_tpu.config import Flags
    from sybil_tpu.query.engine import run_query

    t, flags = bench.build_dataset(N_ROWS)
    cache_dir = os.path.join(t.dir, "cache")
    cflags = Flags(**{**vars(flags), "cache_queries": True})

    rows = []
    for kind, label in QUERIES:
        params = build_params(kind)
        run_query(t, params, flags)        # jit warm-up for this shape

        def drop_query_cache():
            # only q_* entries: deleting the whole dir would also nuke
            # the block-INFO cache (blocks_*.json.gz) and charge every
            # write run a ~25ms full block-info reload that a real
            # cold query cache never pays
            if os.path.isdir(cache_dir):
                for f in os.listdir(cache_dir):
                    if f.startswith("q_"):
                        try:
                            os.unlink(os.path.join(cache_dir, f))
                        except OSError:
                            pass

        drop_query_cache()
        uncached = median_ms(lambda: run_query(t, params, flags))

        def write_run():
            drop_query_cache()
            run_query(t, params, cflags)
        write = median_ms(write_run)

        run_query(t, params, cflags)       # ensure warm cache
        hit = median_ms(lambda: run_query(t, params, cflags))

        row = {"query": label, "uncached_ms": round(uncached, 1),
               "write_ms": round(write, 1), "hit_ms": round(hit, 1)}
        if os.environ.get("CACHE_BENCH_COLD", "1") != "0":
            # truly-cold storage (page cache + HBM residency evicted);
            # one run per shape — eviction costs more than the query.
            # CACHE_BENCH_COLD=0 skips it (each cold run re-uploads the
            # working set, which a degraded tunnel turns into minutes)
            evict_storage(t.dir)
            t0 = time.time()
            run_query(t, params, flags)
            row["cold_ms"] = round((time.time() - t0) * 1e3, 1)
        rows.append(row)
        print(f"{label:42s} uncached {uncached:8.1f}ms  "
              f"write {write:8.1f}ms  hit {hit:8.1f}ms  "
              f"cold {row.get('cold_ms', float('nan')):8.1f}ms",
              file=sys.stderr)

    med = sorted(r["hit_ms"] / max(r["uncached_ms"], 1e-9)
                 for r in rows)[len(rows) // 2]
    amps = sorted(r["write_ms"] / max(r["uncached_ms"], 1e-9)
                  for r in rows)
    print(json.dumps({"metric": "cache_sweep", "rows": N_ROWS,
                      "n_queries": len(rows),
                      "median_hit_over_uncached": round(med, 3),
                      "median_write_amp": round(amps[len(amps) // 2], 2),
                      "max_write_amp": round(amps[-1], 2),
                      "table": rows}))


if __name__ == "__main__":
    main()
