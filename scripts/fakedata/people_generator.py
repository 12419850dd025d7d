#!/usr/bin/env python
"""Wide "people" fake table, mirroring the reference generator
(/root/reference/scripts/fakedata/people_generator.py): name/company/
city/state/country strings, session_id, canary str+int columns, time x3,
age gauss(35,15), f1/f2/f3.  The reference uses Faker; this uses
seeded word pools (no dependency) — the column shapes/cardinalities are
what matter for benchmarking wide tables.

Usage:
  python scripts/fakedata/people_generator.py [N] > rows.json
  python scripts/fakedata/people_generator.py [N] --bulk -dir db -table people
"""

import json
import sys
import time

import numpy as np

FIRST = ["Alex", "Sam", "Jordan", "Casey", "Riley", "Morgan", "Avery",
         "Quinn", "Hayden", "Rowan", "Parker", "Emerson", "Sage", "Reese"]
LAST = ["Smith", "Johnson", "Lee", "Brown", "Garcia", "Miller", "Davis",
        "Wilson", "Anderson", "Taylor", "Moore", "Jackson", "White"]
CITIES = ["Springfield", "Riverton", "Fairview", "Georgetown", "Arlington",
          "Ashland", "Dover", "Hudson", "Clinton", "Milton"]
STATES = ["CA", "NY", "TX", "WA", "OR", "MA", "IL", "CO", "GA", "FL"]
COUNTRIES = ["USA", "Canada", "Mexico", "Brazil", "Germany", "France",
             "Japan", "India", "Kenya", "Australia"]
SUFFIX = ["LLC", "Inc", "Corp", "Group", "Labs", "Partners"]


def columns(n: int, seed: int = 7, start_index: int = 0):
    rng = np.random.default_rng(seed + start_index)
    now = int(time.time())
    month = 60 * 60 * 24 * 7 * 4
    session = rng.integers(0, 5_000_000, n)
    canary = rng.integers(0, 1_000_000, n)
    t = now + rng.integers(-month, month, n)
    ints = {
        "time": t, "time2": t.copy(), "time3": t.copy(),
        "int_id": session.astype(np.int64),
        "int_canary": canary.astype(np.int64),
        "int_canary_2": canary.astype(np.int64),
        "int_canary_3": canary.astype(np.int64),
        "age": np.abs(rng.normal(35, 15, n)).astype(np.int64),
        "f1": rng.integers(0, 51, n),
        "f2": rng.integers(0, 501, n),
        "f3": rng.normal(1_000_000, 10_000, n).astype(np.int64),
    }
    fi = rng.integers(0, len(FIRST), n)
    la = rng.integers(0, len(LAST), n)
    strs = {
        "name": [f"{FIRST[a]} {LAST[b]}" for a, b in zip(fi, la)],
        "session_id": [str(s) for s in session],
        "company": [f"{LAST[b]} {SUFFIX[s]}" for b, s in
                    zip(la, rng.integers(0, len(SUFFIX), n))],
        "city": [CITIES[i] for i in rng.integers(0, len(CITIES), n)],
        "state": [STATES[i] for i in rng.integers(0, len(STATES), n)],
        "country": [COUNTRIES[i] for i in
                    rng.integers(0, len(COUNTRIES), n)],
        "str_canary": [str(c) for c in canary],
        "str_canary2": [str(c) for c in canary],
        "str_canary3": [str(c) for c in canary],
    }
    return ints, strs


def main():
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 50_000
    if "--bulk" in args:
        d = args[args.index("-dir") + 1]
        tname = args[args.index("-table") + 1]
        sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
        from sybil_tpu.config import Flags
        from sybil_tpu.table import Table
        t = Table(tname, Flags(dir=d, table=tname, skip_compact=True))
        ints, strs = columns(n)
        t.ingest_columns(ints=ints, strs=strs)
        print(f"bulk-ingested {n} rows into {tname}", file=sys.stderr)
        return
    ints, strs = columns(n)
    for i in range(n):
        rec = {k: int(v[i]) for k, v in ints.items()}
        rec.update({k: v[i] for k, v in strs.items()})
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
