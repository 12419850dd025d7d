"""Lock manager: grab/contend/recover with fabricated dead-PID lock
files, modeled on the reference's table_lock_test.go:7-79."""

import os

import pytest

from sybil_tpu import constants
from sybil_tpu.locks import (BlockLock, CacheLock, DigestLock, InfoLock,
                             Lock, _pid_alive)

DEAD_PID = 999999999  # beyond pid_max, never alive


def _fake_lock(table_dir: str, name: str, pid) -> str:
    os.makedirs(table_dir, exist_ok=True)
    path = os.path.join(table_dir, name + ".lock")
    with open(path, "w") as f:
        f.write(str(pid))
    return path


def test_grab_and_release(tmp_path):
    lock = InfoLock(str(tmp_path))
    assert lock.grab()
    with open(lock.path) as f:
        assert int(f.read()) == os.getpid()
    lock.release()
    assert not os.path.exists(lock.path)


def test_contention_with_live_owner_times_out(tmp_path):
    _fake_lock(str(tmp_path), "info", os.getpid() + 0)  # our own live pid
    other = InfoLock(str(tmp_path))
    # owner (this process) is alive, so grab must fail after retries
    assert not other.grab()


def test_dead_owner_is_recovered_and_broken(tmp_path):
    d = str(tmp_path)
    info = os.path.join(d, "info.json")
    with open(info + ".bak", "w") as f:
        f.write('{"from": "backup"}')
    _fake_lock(d, "info", DEAD_PID)
    lock = InfoLock(d)
    assert lock.grab()
    assert lock.broken
    with open(info) as f:  # .bak restored (table_lock.go:51-76)
        assert "backup" in f.read()
    lock.release()


def test_garbage_pidfile_is_broken(tmp_path):
    d = str(tmp_path)
    path = _fake_lock(d, "info", "")
    with open(path, "w") as f:
        f.write("not-a-pid")
    assert InfoLock(d).grab()


def test_base_lock_refuses_to_recover(tmp_path):
    d = str(tmp_path)
    _fake_lock(d, "mystery", DEAD_PID)
    assert not Lock(d, "mystery").grab()


def test_digest_recovery_returns_stomache_to_ingest(tmp_path):
    d = str(tmp_path)
    stomache = os.path.join(d, constants.STOMACHE_DIR + "deadbeef")
    os.makedirs(stomache)
    with open(os.path.join(stomache, "x.wal.gz"), "wb") as f:
        f.write(b"data")
    _fake_lock(d, "digest", DEAD_PID)
    assert DigestLock(d).grab()
    assert os.path.exists(
        os.path.join(d, constants.INGEST_DIR, "x.wal.gz"))
    assert not os.path.exists(stomache)


def test_block_recovery_demotes_half_written_block(tmp_path):
    d = str(tmp_path)
    partial = os.path.join(d, "block123.partial")
    os.makedirs(partial)
    broken = os.path.join(d, "block123")  # live dir without info.json
    os.makedirs(broken)
    _fake_lock(d, "block123", DEAD_PID)
    assert BlockLock(d, "block123").grab()
    assert not os.path.exists(partial)
    assert os.path.exists(broken + ".broke")
    assert not os.path.exists(broken)


def test_cache_recovery_deletes_cache(tmp_path):
    d = str(tmp_path)
    cache = os.path.join(d, constants.CACHE_DIR)
    os.makedirs(cache)
    with open(os.path.join(cache, "c.json"), "w") as f:
        f.write("{}")
    _fake_lock(d, "cache", DEAD_PID)
    assert CacheLock(d).grab()
    assert not os.path.exists(cache)


def test_pid_alive():
    assert _pid_alive(os.getpid())
    assert not _pid_alive(DEAD_PID)
    assert not _pid_alive(0)
    assert not _pid_alive(-1)


def test_digest_survives_interrupted_digest_end_to_end(tmp_table):
    """A digester that died mid-move leaves stomache files; the next
    digest recovers them and no ingested record is lost
    (table_ingest.go:208-244)."""
    from sybil_tpu.digest import digest_records
    from sybil_tpu.ingest import flatten_record
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import QueryParams
    from sybil_tpu.table import Table

    t = Table("t", tmp_table)
    t.ingest_records([flatten_record({"k": "a", "v": i})
                      for i in range(50)])
    # simulate a dead digester: logs moved to stomache, lock left behind
    import sybil_tpu.rowstore as rowstore
    stomache = os.path.join(t.dir, constants.STOMACHE_DIR + "crashed")
    os.makedirs(stomache)
    for log in rowstore.list_logs(t.dir):
        os.rename(log, os.path.join(stomache,
                                    os.path.basename(log)))
    _fake_lock(t.dir, "digest", DEAD_PID)

    assert digest_records(t) == 50
    qr = run_query(t, QueryParams(groups=("k",)), tmp_table)
    assert sum(r.count for r in qr.results.values()) == 50
