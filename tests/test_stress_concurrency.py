"""Cross-process ingest/digest stress, the reference's
scripts/stress_ingest_digest.sh in miniature: several concurrent
ingester processes race a digester loop on one table; afterwards every
ingested record must be accounted for exactly once (WAL + blocks), with
no deadlock or corruption.  Locks and atomic renames are the only
coordination, exactly as in the reference."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INGester = """
import sys
sys.path.insert(0, {repo!r})
from sybil_tpu.config import Flags
from sybil_tpu.ingest import flatten_record
from sybil_tpu.table import Table
flags = Flags(dir={db!r}, table="t", skip_compact=True)
t = Table("t", flags)
wid = int(sys.argv[1])
for batch in range(4):
    t.ingest_records([flatten_record({{"w": wid, "v": batch * 100 + i}})
                      for i in range(25)])
print("ingester", wid, "done")
"""

DIGESTER = """
import sys, time
sys.path.insert(0, {repo!r})
from sybil_tpu.config import Flags
from sybil_tpu.digest import digest_records
from sybil_tpu.table import Table
flags = Flags(dir={db!r}, table="t", skip_compact=True)
t = Table("t", flags)
for _ in range(6):
    digest_records(t)
    time.sleep(0.05)
print("digester done")
"""


def test_concurrent_ingest_digest(tmp_path):
    db = str(tmp_path / "db")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    procs = []
    for wid in range(4):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", INGester.format(repo=REPO, db=db), str(wid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for _ in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", DIGESTER.format(repo=REPO, db=db)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()

    # final digest sweeps whatever the racing digesters missed
    from sybil_tpu.config import Flags
    from sybil_tpu.digest import digest_records
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import QueryParams
    from sybil_tpu.table import Table
    flags = Flags(dir=db, table="t", skip_compact=True)
    t = Table("t", flags)
    digest_records(t)

    expected = 4 * 4 * 25
    assert t.record_count() == expected
    qr = run_query(t, QueryParams(groups=("w",)), flags)
    assert {k.strip(): r.count for k, r in qr.results.items()} == {
        str(w): 100 for w in range(4)}
