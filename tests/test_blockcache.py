"""Batched block-info cache (table_io.go:242-368 analog)."""

import gzip
import os

from sybil_tpu import blockcache, constants
from sybil_tpu.digest import digest_records
from sybil_tpu.ingest import flatten_record
from sybil_tpu.table import Table


def _small_chunk(monkeypatch, n=100):
    """Shrink CHUNK_SIZE like the reference tests (helpers_test.go:25)."""
    monkeypatch.setattr(constants, "CHUNK_SIZE", n)
    import sybil_tpu.digest as digest_mod
    monkeypatch.setattr(digest_mod, "CHUNK_SIZE", n)


def _build(flags, rows=350):
    t = Table("t", flags)
    t.ingest_records([flatten_record({"k": f"k{i % 5}", "v": i})
                      for i in range(rows)])
    digest_records(t)
    return t


def test_cache_files_created_and_served(tmp_table, monkeypatch):
    _small_chunk(monkeypatch)
    t = _build(tmp_table)          # 350 rows -> 3 full + 1 partial block
    infos_uncached = {os.path.basename(d): i.num_records
                      for d, i in t.block_infos().items()}
    files = blockcache._cache_files(t.dir)
    assert files, "full blocks were not cached"
    cached = blockcache.load(t.dir)
    assert all(i.num_records == 100 for i in cached.values())
    assert len(cached) == 3        # the partial block is never cached

    # cached read agrees with direct reads
    infos_cached = {os.path.basename(d): i.num_records
                    for d, i in t.block_infos().items()}
    assert infos_cached == infos_uncached
    assert sum(infos_cached.values()) == 350


def test_corrupt_cache_file_is_deleted(tmp_table, monkeypatch):
    _small_chunk(monkeypatch)
    t = _build(tmp_table)
    t.block_infos()
    path = blockcache._cache_files(t.dir)[0]
    with gzip.open(path, "wt") as f:
        f.write("{broken")
    infos = t.block_infos()        # corrupt file dropped, blocks re-read
    assert sum(i.num_records for i in infos.values()) == 350
    assert path not in blockcache._cache_files(t.dir)


def test_partial_block_topup_stays_consistent(tmp_table, monkeypatch):
    _small_chunk(monkeypatch)
    t = _build(tmp_table, rows=150)    # 1 full + 1 partial(50)
    assert t.record_count() == 150
    t.ingest_records([flatten_record({"k": "x", "v": i})
                      for i in range(75)])
    digest_records(t)                  # tops up the partial to 100 + 25
    assert t.record_count() == 225
    cached = blockcache.load(t.dir)
    assert all(i.num_records == 100 for i in cached.values())


def test_clear(tmp_table, monkeypatch):
    _small_chunk(monkeypatch)
    t = _build(tmp_table)
    t.block_infos()
    assert blockcache._cache_files(t.dir)
    blockcache.clear(t.dir)
    assert not blockcache._cache_files(t.dir)
    assert t.record_count() == 350
