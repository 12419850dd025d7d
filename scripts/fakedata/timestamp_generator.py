#!/usr/bin/env python
"""Timestamped record stream with a configurable spread, the analog of
the reference's plait template
(/root/reference/scripts/plait/timestamp_generator.yaml, driven by
scripts/test_timestamps.sh): N records whose `time` is uniform over the
last H hours.  Tighter spreads delta-encode smaller — test_timestamps.sh
uses this to chart the time-column file size vs H.

Usage:
  H=0.5 python scripts/fakedata/timestamp_generator.py 100000 > rows.json
"""

import json
import os
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    hours = float(os.environ.get("H", "1"))
    now = int(time.time())
    rng = np.random.default_rng(7)
    ts = now - rng.integers(0, max(int(hours * 3600), 1), n)
    vals = rng.integers(0, 1000, n)
    out = sys.stdout
    for i in range(n):
        out.write(json.dumps({"time": int(ts[i]), "v": int(vals[i])}) + "\n")


if __name__ == "__main__":
    main()
