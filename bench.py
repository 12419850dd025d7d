#!/usr/bin/env python
"""Headline benchmark: rows scanned+aggregated per second on the
basic-aggregation query (group by host, avg ping) over a 1M-row uptime
table — the reference's `make fake-data` + basic_aggregation_test.sh
workload (BASELINE.md config 1/2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against BASELINE_ROWS_PER_S, the estimated reference
(Go sybil) single-machine scan rate on this workload.  The repo ships no
published numbers and no Go toolchain exists in this image (BASELINE.md),
so the estimate is derived from sybil's design: a per-record interpreted
scan loop at ~50-100ns/row/core over all cores.  Kept deliberately
generous; revisit when a Go binary can be measured.
"""

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, ".bench", "db")
N_ROWS = 1_000_000
BASELINE_ROWS_PER_S = 20_000_000.0  # estimated Go sybil, one machine

HOSTS = ["www.facebook.com", "www.yahoo.com", "www.google.com",
         "www.reddit.com", "github.com"]
STATII = [200, 403, 404, 500, 503]


def build_dataset():
    from sybil_tpu.config import Flags
    from sybil_tpu.digest import digest_records
    from sybil_tpu.ingest import flatten_record
    from sybil_tpu.table import Table

    flags = Flags(dir=BENCH_DIR, table="uptime", skip_compact=True)
    t = Table("uptime", flags)
    if t.exists() and t.load_info() and t.record_count() >= N_ROWS:
        return t, flags

    print(f"building {N_ROWS}-row uptime table ...", file=sys.stderr)
    rng = random.Random(1337)
    now = 1_755_000_000
    batch = []
    t0 = time.time()
    for i in range(N_ROWS):
        rec = {
            "status": str(rng.choice(STATII)),
            "host": rng.choice(HOSTS),
            "ping": abs(rng.gauss(60, 20)),
            "weight": rng.choice([1, 10, 100]),
            "time": now + rng.randint(-2419200, 2419200),
            "index_int": i,
        }
        batch.append(flatten_record(rec))
        if len(batch) >= 200_000:
            t.ingest_records(batch)
            batch = []
    if batch:
        t.ingest_records(batch)
    digest_records(t)
    print(f"dataset built in {time.time() - t0:.1f}s", file=sys.stderr)
    return t, flags


def main():
    t, flags = build_dataset()

    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, QueryParams

    params = QueryParams(groups=("host",), aggs=(AggDef("ping", "avg"),))
    n_rows = t.record_count()

    # warm-up: jit compile + page cache
    qr = run_query(t, params, flags)
    total = sum(r.count for r in qr.results.values())
    assert total == n_rows, f"scan covered {total}/{n_rows} rows"

    runs = 5
    t0 = time.time()
    for _ in range(runs):
        qr = run_query(t, params, flags)
    elapsed = time.time() - t0
    rows_per_s = n_rows * runs / elapsed

    print(json.dumps({
        "metric": "scan_agg_rows_per_sec",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / BASELINE_ROWS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
