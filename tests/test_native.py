"""Native WAL codec: parity between the C++ columnar replay and the
pure-Python row pivot, plus end-to-end digest equivalence."""

import json

import numpy as np
import pytest

from sybil_tpu import native, rowstore
from sybil_tpu.blocks import IntColumnData, SetColumnData, StrColumnData
from sybil_tpu.columnar import parse_log_columnar
from sybil_tpu.digest import digest_records, rows_to_columns
from sybil_tpu.ingest import flatten_record
from sybil_tpu.table import Table

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _records(n=500, seed=7):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(int(n)):
        rec = {"age": int(rng.integers(0, 90)),
               "name": f"user_{int(rng.integers(0, 40))}",
               "time": 1_700_000_000 + int(rng.integers(0, 10_000))}
        if i % 3 == 0:
            rec["groups"] = [f"g{i % 2}", f"g{i % 5}"]
        if i % 7 == 0:
            del rec["age"]                    # missing int
        if i % 11 == 0:
            rec["note"] = 'uni"code\né東'  # escapes survive
        recs.append(flatten_record(rec))
    return recs


def test_columnar_replay_matches_row_pivot(tmp_table):
    t = Table("t", tmp_table)
    recs = _records()
    t.ingest_records(recs)
    log = rowstore.list_logs(t.dir)[0]

    cols_n, n_native = parse_log_columnar(log, t)
    assert n_native == len(recs)
    cols_py = rows_to_columns(rowstore.read_log(log), t)

    assert set(cols_n) == set(cols_py)
    for name in cols_py:
        a, b = cols_n[name], cols_py[name]
        if isinstance(b, IntColumnData):
            np.testing.assert_array_equal(a.valid, b.valid)
            np.testing.assert_array_equal(a.values[a.valid],
                                          b.values[b.valid])
        elif isinstance(b, StrColumnData):
            np.testing.assert_array_equal(a.valid, b.valid)
            strs = t.dicts.get(name).strings
            assert [strs[i] for i in a.ids[a.valid]] == \
                   [strs[i] for i in b.ids[b.valid]]
        elif isinstance(b, SetColumnData):
            np.testing.assert_array_equal(a.offsets, b.offsets)
            strs = t.dicts.get(name).strings
            assert [strs[i] for i in a.values] == [strs[i] for i in b.values]


def test_native_digest_query_parity(tmp_table, monkeypatch):
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, QueryParams

    def ingest_digest(flags):
        t = Table("t", flags)
        t.ingest_records(_records(800))
        digest_records(t)
        return t

    t_native = ingest_digest(tmp_table)
    qp = QueryParams(groups=("name",), aggs=(AggDef("age", "avg"),))
    r_native = run_query(t_native, qp, tmp_table)

    from sybil_tpu.config import Flags
    flags_py = Flags(dir=tmp_table.dir + "_py", table="t")
    monkeypatch.setattr(native, "_mod", None)  # force Python fallback
    t_py = ingest_digest(flags_py)
    r_py = run_query(t_py, qp, flags_py)

    assert set(r_native.results) == set(r_py.results)
    for k, res in r_py.results.items():
        got = r_native.results[k]
        assert got.count == res.count
        assert got.hists["age"].mean() == pytest.approx(
            res.hists["age"].mean())


def test_malformed_wal_falls_back():
    assert native.parse_wal_bytes(b'{"i": {"a": 1.5}}\n') is None
    assert native.parse_wal_bytes(b'{"unknown": 1}\n') is None
    assert native.parse_wal_bytes(b"not json\n") is None


def test_escapes_and_big_ints():
    recs = [{"s": {"x": "a\tb\\c€\U0001F600"}},
            {"i": {"v": -(2**63), "w": 2**63 - 1}}]
    data = ("\n".join(json.dumps(r, separators=(",", ":"))
                      for r in recs) + "\n").encode()
    out = native.parse_wal_bytes(data)
    assert out is not None
    blob, offs = out["strs"]["x"][2]
    offs = np.frombuffer(offs, np.uint32)
    assert blob[offs[0]:offs[1]].decode() == "a\tb\\c€\U0001F600"
    vals = np.frombuffer(out["ints"]["v"][0], np.int64)
    assert vals[1] == -(2**63)
    assert np.frombuffer(out["ints"]["w"][0], np.int64)[1] == 2**63 - 1
    # 2**63 overflows int64 -> whole file falls back
    assert native.parse_wal_bytes(b'{"i": {"v": 9223372036854775808}}\n') is None
