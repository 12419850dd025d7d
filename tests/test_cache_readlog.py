"""Query cache and -read-log row-store scanning."""

import os

import pytest

from sybil_tpu.config import Flags
from sybil_tpu.digest import digest_records
from sybil_tpu.ingest import flatten_record
from sybil_tpu.query.engine import run_query
from sybil_tpu.query.spec import AggDef, FilterDef, QueryParams
from sybil_tpu.table import Table


def make(tmp_path, n=300):
    flags = Flags(dir=str(tmp_path / "db"), table="t", skip_compact=True)
    t = Table("t", flags)
    t.ingest_records([flatten_record({"x": i % 7, "v": i}) for i in range(n)])
    return t, flags


def test_read_log_scans_undigested(tmp_path):
    t, flags = make(tmp_path)
    params = QueryParams(groups=("x",), aggs=(AggDef("v", "avg"),))
    # nothing digested yet: normal query sees nothing
    qr = run_query(t, params, flags)
    assert sum(r.count for r in qr.results.values()) == 0

    rl_flags = Flags(**{**vars(flags), "read_log": True})
    qr = run_query(t, params, rl_flags)
    assert sum(r.count for r in qr.results.values()) == 300
    assert len(qr.results) == 7

    # digest half-way: combined rowstore+blocks still covers everything
    digest_records(t)
    t.ingest_records([flatten_record({"x": 1, "v": 5}) for _ in range(10)])
    qr = run_query(t, params, rl_flags)
    assert sum(r.count for r in qr.results.values()) == 310


def test_read_log_with_filter(tmp_path):
    t, flags = make(tmp_path)
    rl_flags = Flags(**{**vars(flags), "read_log": True})
    params = QueryParams(groups=("x",),
                         filters=(FilterDef("v", "lt", "100", "int"),))
    qr = run_query(t, params, rl_flags)
    assert sum(r.count for r in qr.results.values()) == 100


def test_query_cache_roundtrip(tmp_path):
    t, flags = make(tmp_path)
    digest_records(t)
    cflags = Flags(**{**vars(flags), "cache_queries": True})
    params = QueryParams(groups=("x",), aggs=(AggDef("v", "avg"),))
    qr1 = run_query(t, params, cflags)
    cache_dir = os.path.join(t.dir, "cache")
    assert os.listdir(cache_dir)

    qr2 = run_query(t, params, cflags)  # cache hit
    assert {k: r.count for k, r in qr2.results.items()} == \
           {k: r.count for k, r in qr1.results.items()}
    for k in qr1.results:
        h1, h2 = qr1.results[k].hists["v"], qr2.results[k].hists["v"]
        assert abs(h1.mean() - h2.mean()) < 1e-12
    assert [r.group_key for r in qr2.sorted] == \
           [r.group_key for r in qr1.sorted]


def test_query_cache_invalidated_by_digest(tmp_path):
    t, flags = make(tmp_path)
    digest_records(t)
    cflags = Flags(**{**vars(flags), "cache_queries": True})
    params = QueryParams(groups=("x",))
    qr1 = run_query(t, params, cflags)
    assert sum(r.count for r in qr1.results.values()) == 300

    t.ingest_records([flatten_record({"x": 0, "v": 1}) for _ in range(50)])
    digest_records(t)
    qr2 = run_query(t, params, cflags)
    assert sum(r.count for r in qr2.results.values()) == 350
