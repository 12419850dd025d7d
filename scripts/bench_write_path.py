#!/usr/bin/env python
"""Write-path throughput: ingest and digestion rows/s.

The reference measures record-append ns/op on every CI run
(/root/reference/src/lib/benchmarks_test.go:9-51) but the repo's
BASELINE had no write-path numbers.  This measures:

  ingest_cli        JSON-lines through the real CLI pipe (process
                    start + parse + WAL write), rows/s
  ingest_api        Table.ingest_records in-process (flatten + WAL
                    write), rows/s
  ingest_columns    bulk columnar ingest (the fast production path)
  digest_native     WAL -> sorted column blocks via the C++ walcodec
  digest_python     same with SYBIL_NO_NATIVE=1 (pure-python parse)

Digestion runs in subprocesses so the native/python toggle (an
import-time env gate) is honest.  Runs on CPU — the write path never
touches the device.  Prints one JSON line per metric.

Env: WRITE_BENCH_ROWS (default 200000 ingest / 1000000 digest).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_INGEST = int(os.environ.get("WRITE_BENCH_ROWS", 200_000))
N_DIGEST = int(os.environ.get("WRITE_BENCH_DIGEST_ROWS", 1_000_000))


def emit(metric, rows, secs):
    print(json.dumps({"metric": metric, "rows": rows,
                      "wall_s": round(secs, 2),
                      "rows_per_s": round(rows / secs)}))
    sys.stdout.flush()


def gen_lines(n, path):
    import numpy as np
    rng = np.random.default_rng(1)
    hosts = [f"host{i}" for i in range(50)]
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "host": hosts[i % 50], "status": "200",
                "ping": int(rng.integers(1, 140)),
                "time": 1_755_000_000 + i}) + "\n")


def main():
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    with tempfile.TemporaryDirectory() as tmp:
        lines = os.path.join(tmp, "rows.jsonl")
        gen_lines(N_INGEST, lines)

        # 1. CLI ingest (the reference's stdin JSON-lines path)
        db = os.path.join(tmp, "db-cli")
        t0 = time.time()
        with open(lines) as f:
            subprocess.run(
                [sys.executable, "-m", "sybil_tpu", "ingest",
                 "-dir", db, "-table", "t"],
                stdin=f, env=env, cwd=REPO, check=True,
                capture_output=True)
        emit("ingest_cli", N_INGEST, time.time() - t0)

        # 2. in-process record ingest
        import jax
        jax.config.update("jax_platforms", "cpu")
        from sybil_tpu.config import Flags
        from sybil_tpu.ingest import flatten_record
        from sybil_tpu.table import Table

        recs = []
        with open(lines) as f:
            for line in f:
                recs.append(json.loads(line))
        db2 = os.path.join(tmp, "db-api")
        t = Table("t", Flags(dir=db2, table="t", skip_compact=True))
        t0 = time.time()
        t.ingest_records([flatten_record(r) for r in recs])
        emit("ingest_api", N_INGEST, time.time() - t0)

        # 3. bulk columnar ingest
        import numpy as np
        rng = np.random.default_rng(2)
        db3 = os.path.join(tmp, "db-cols")
        t3 = Table("t", Flags(dir=db3, table="t", skip_compact=True))
        ints = {"ping": rng.integers(1, 140, N_DIGEST).astype("int64"),
                "time": 1_755_000_000
                + np.arange(N_DIGEST, dtype="int64")}
        strs = {"host": [f"host{i % 50}" for i in range(N_DIGEST)]}
        t0 = time.time()
        t3.ingest_columns(ints=ints, strs=strs)
        emit("ingest_columns", N_DIGEST, time.time() - t0)

        # 4./5. digestion of a WAL-filled table, native vs python parse
        # (fresh subprocess per toggle: the gate is import-time)
        for label, extra in (("digest_native", {}),
                             ("digest_python", {"SYBIL_NO_NATIVE": "1"})):
            dbd = os.path.join(tmp, f"db-{label}")
            prep = subprocess.run(
                [sys.executable, "-c", f"""
import sys, json, time
sys.path.insert(0, {REPO!r})
import jax; jax.config.update('jax_platforms', 'cpu')
from sybil_tpu.config import Flags
from sybil_tpu.ingest import flatten_record
from sybil_tpu.table import Table
from sybil_tpu.digest import digest_records
import numpy as np
rng = np.random.default_rng(3)
t = Table('t', Flags(dir={dbd!r}, table='t', skip_compact=True))
N = {N_DIGEST}
step = 100000
for s in range(0, N, step):
    m = min(step, N - s)
    recs = [flatten_record({{'host': f'host{{i%50}}', 'status': '200',
                            'ping': int(p), 'time': 1755000000 + s + i}})
            for i, p in enumerate(rng.integers(1, 140, m))]
    t.ingest_records(recs)
t0 = time.time()
digest_records(t)
print(json.dumps({{'secs': time.time() - t0}}))
"""],
                env={**env, **extra}, cwd=REPO,
                capture_output=True, text=True)
            if prep.returncode != 0:
                print(prep.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"{label} failed")
            secs = json.loads(prep.stdout.strip().splitlines()[-1])["secs"]
            emit(label, N_DIGEST, secs)


if __name__ == "__main__":
    main()
