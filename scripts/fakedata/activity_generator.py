#!/usr/bin/env python
"""user_sessions fake data, mirroring the reference generator
(/root/reference/scripts/fakedata/activity_generator.py): action, page,
userid "personN" with 5000 cardinality, weight in {1,10,100}, time
within the last month — the BASELINE.json user_sessions benchmark
dataset.

Usage:
  python scripts/fakedata/activity_generator.py [N] > rows.json
  python scripts/fakedata/activity_generator.py [N] --bulk -dir db -table user_sessions
"""

import json
import sys
import time

import numpy as np

ACTIONS = ["pageload", "pageunload", "click", "notif", "hover", "tooltip",
           "type", "chat", "comment"]
PAGES = ["login", "home", "friends", "settings", "feed", "groups",
         "explore", "404"]
USER_IDS = 5000


def columns(n: int, seed: int = 42, start_index: int = 0):
    rng = np.random.default_rng(seed + start_index)
    now = int(time.time())
    month = 60 * 60 * 24 * 7 * 4
    uids = rng.integers(1, USER_IDS + 1, n)
    ints = {
        "weight": rng.choice([1, 10, 100], n).astype(np.int64),
        "time": now - rng.integers(0, month, n),
    }
    strs = {
        "action": [ACTIONS[i] for i in rng.integers(0, len(ACTIONS), n)],
        "page": [PAGES[i] for i in rng.integers(0, len(PAGES), n)],
        "userid": [f"person{u}" for u in uids],
    }
    return ints, strs


def main():
    args = sys.argv[1:]
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
            ints, strs = columns(m, start_index=start)
            t.ingest_columns(ints=ints, strs=strs)
        print(f"bulk-ingested {n} rows into {tname}", file=sys.stderr)
        return
    for start in range(0, n, 100_000):
        m = min(100_000, n - start)
        ints, strs = columns(m, start_index=start)
        for i in range(m):
            rec = {k: int(v[i]) for k, v in ints.items()}
            rec.update({k: v[i] for k, v in strs.items()})
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
