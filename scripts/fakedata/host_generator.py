#!/usr/bin/env python
"""Uptime/hosts fake data, mirroring the reference generator
(/root/reference/scripts/fakedata/host_generator.py): status, host,
ping gauss(60,20), weight in {1,10,100}, time +/- 1 month, index_int,
index_str, and a `groups` set column built from mod2/mod3/mod5.

Vectorized with numpy.  Emits JSON lines on stdout (pipe into
`python -m sybil_tpu ingest`), or ingests directly with --bulk.

Usage:
  python scripts/fakedata/host_generator.py [N] > rows.json
  python scripts/fakedata/host_generator.py [N] --bulk -dir db -table uptime
"""

import json
import sys
import time

import numpy as np

HOSTS = ["www.facebook.com", "www.yahoo.com", "www.google.com",
         "www.reddit.com", "github.com"]
STATII = ["200", "403", "404", "500", "503"]


def columns(n: int, seed: int = 1337, start_index: int = 0):
    rng = np.random.default_rng(seed + start_index)
    now = int(time.time())
    idx = np.arange(start_index, start_index + n, dtype=np.int64)
    ints = {
        "ping": np.abs(rng.normal(60, 20, n)).astype(np.int64),
        "weight": rng.choice([1, 10, 100], n).astype(np.int64),
        "time": now + rng.integers(-2419200, 2419200, n),
        "index_int": idx,
    }
    strs = {
        "status": [STATII[i] for i in rng.integers(0, 5, n)],
        "host": [HOSTS[i] for i in rng.integers(0, 5, n)],
        "index_str": [str(i) for i in idx],
    }
    sets = {"groups": [
        [g for m, g in ((2, "mod2"), (3, "mod3"), (5, "mod5"))
         if i % m == 0] or ["none"] for i in idx.tolist()]}
    return ints, strs, sets


def main():
    args = [a for a in sys.argv[1:]]
    n = int(args[0]) if args and args[0].isdigit() else 1_000_000
    if "--bulk" in args:
        d = args[args.index("-dir") + 1]
        tname = args[args.index("-table") + 1]
        sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
        from sybil_tpu.config import Flags
        from sybil_tpu.table import Table
        t = Table(tname, Flags(dir=d, table=tname, skip_compact=True))
        step = 1_000_000
        for start in range(0, n, step):
            m = min(step, n - start)
            ints, strs, sets = columns(m, start_index=start)
            t.ingest_columns(ints=ints, strs=strs, sets=sets)
        print(f"bulk-ingested {n} rows into {tname}", file=sys.stderr)
        return
    for start in range(0, n, 100_000):
        m = min(100_000, n - start)
        ints, strs, sets = columns(m, start_index=start)
        for i in range(m):
            rec = {k: int(v[i]) for k, v in ints.items()}
            rec.update({k: v[i] for k, v in strs.items()})
            rec["groups"] = sets["groups"][i]
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
