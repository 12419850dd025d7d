"""Bulk columnar ingest (the reference's ChunkAndSave direct-block path,
table_io.go:376): blocks written straight from columnar arrays must be
indistinguishable from WAL-digested ones."""

import numpy as np
import pytest

from sybil_tpu import constants
from sybil_tpu.digest import digest_records
from sybil_tpu.ingest import flatten_record
from sybil_tpu.query.engine import run_query
from sybil_tpu.query.spec import AggDef, QueryParams
from sybil_tpu.table import Table


def _small_chunk(monkeypatch, n=100):
    monkeypatch.setattr(constants, "CHUNK_SIZE", n)
    import sybil_tpu.digest as digest_mod
    monkeypatch.setattr(digest_mod, "CHUNK_SIZE", n)


def test_bulk_matches_wal_digest(tmp_table, monkeypatch):
    _small_chunk(monkeypatch)
    rng = np.random.default_rng(3)
    n = 450
    ks = [f"k{i}" for i in rng.integers(0, 4, n)]
    vs = rng.integers(0, 1000, n).astype(np.int64)
    miss = rng.random(n) > 0.1
    tags = [[f"t{i % 2}", f"t{i % 3}"] if i % 4 == 0 else []
            for i in range(n)]

    t_bulk = Table("t", tmp_table)
    written = t_bulk.ingest_columns(
        ints={"v": vs, "time": np.arange(n)},
        strs={"k": ks}, sets={"tags": tags}, valid={"v": miss})
    assert written == 5  # 450 rows / 100-record blocks

    from sybil_tpu.config import Flags
    flags2 = Flags(dir=tmp_table.dir + "2", table="t")
    t_wal = Table("t", flags2)
    recs = []
    for i in range(n):
        r = {"k": ks[i], "time": i}
        if miss[i]:
            r["v"] = int(vs[i])
        if tags[i]:
            r["tags"] = tags[i]
        recs.append(flatten_record(r))
    t_wal.ingest_records(recs)
    digest_records(t_wal)

    qp = QueryParams(groups=("k",), aggs=(AggDef("v", "avg"),))
    r_bulk = run_query(t_bulk, qp, tmp_table)
    r_wal = run_query(t_wal, qp, flags2)
    assert set(r_bulk.results) == set(r_wal.results)
    for key, res in r_wal.results.items():
        got = r_bulk.results[key]
        assert got.count == res.count
        assert got.hists["v"].mean() == pytest.approx(res.hists["v"].mean())

    # set filter agrees too
    qp2 = QueryParams(groups=("k",),
                      filters=(__import__("sybil_tpu.query.spec",
                                          fromlist=["FilterDef"])
                               .FilterDef("tags", "in", "t1", "set"),))
    b2 = run_query(t_bulk, qp2, tmp_table)
    w2 = run_query(t_wal, qp2, flags2)
    assert {k: r.count for k, r in b2.results.items()} == \
           {k: r.count for k, r in w2.results.items()}


def test_bulk_appends_to_partial(tmp_table, monkeypatch):
    _small_chunk(monkeypatch)
    t = Table("t", tmp_table)
    t.ingest_columns(ints={"v": np.arange(130)})
    assert t.record_count() == 130
    t.ingest_columns(ints={"v": np.arange(50)})
    assert t.record_count() == 180
    infos = sorted(i.num_records for i in t.block_infos().values())
    assert infos == [80, 100]  # partial topped up to a full block


def test_bulk_length_mismatch(tmp_table):
    t = Table("t", tmp_table)
    with pytest.raises(ValueError):
        t.ingest_columns(ints={"a": np.arange(3)}, strs={"b": ["x"] * 4})
