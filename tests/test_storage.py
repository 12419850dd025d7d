"""Storage engine round-trip tests, modeled on the reference's full-stack
temp-filesystem pattern (src/lib/helpers_test.go, column_store_test.go)."""

import os

import numpy as np
import pytest

from sybil_tpu import blocks, codec, constants
from sybil_tpu.blocks import IntColumnData, SetColumnData, StrColumnData
from sybil_tpu.config import Flags
from sybil_tpu.digest import digest_records, rows_to_columns, save_record_list
from sybil_tpu.ingest import flatten_record, update_schema_stats
from sybil_tpu.schema import IntInfo, Schema
from sybil_tpu.table import Table


def test_container_roundtrip(tmp_path):
    path = str(tmp_path / "x.sy")
    a = np.arange(100, dtype=np.int64)
    b = np.random.default_rng(0).random(17).astype(np.float32)
    codec.write_container(path, {"hello": 1}, {"a": a, "b": b})
    c = codec.read_container(path)
    assert c.meta == {"hello": 1}
    np.testing.assert_array_equal(c.read("a"), a)
    np.testing.assert_array_equal(c.read("b"), b)


def test_container_gzip_fallback(tmp_path):
    path = str(tmp_path / "y.sy")
    codec.write_container(path, {}, {"a": np.arange(5)}, compress=True)
    assert os.path.exists(path + ".gz") and not os.path.exists(path)
    c = codec.read_container(path)
    np.testing.assert_array_equal(c.read("a"), np.arange(5))


def test_int_column_value_encoding_roundtrip():
    rng = np.random.default_rng(1)
    values = rng.integers(-(2**40), 2**40, size=10000)
    valid = rng.random(10000) > 0.1
    col = IntColumnData(values.copy(), valid.copy())
    meta, sections = blocks.encode_int_column(col)
    assert meta["encoding"] == "value"  # ~10k distinct > threshold
    c = _container_from(meta, sections)
    dec = blocks.decode_int_container(c)
    np.testing.assert_array_equal(dec.valid, valid)
    np.testing.assert_array_equal(dec.values[valid], values[valid])


def test_int_column_bucket_encoding_roundtrip():
    rng = np.random.default_rng(2)
    values = rng.integers(0, 50, size=5000)
    valid = rng.random(5000) > 0.2
    col = IntColumnData(values.copy(), valid.copy())
    meta, sections = blocks.encode_int_column(col)
    assert meta["encoding"] == "bucket"
    dec = blocks.decode_int_container(_container_from(meta, sections))
    np.testing.assert_array_equal(dec.valid, valid)
    np.testing.assert_array_equal(dec.values[valid], values[valid])


def test_values_beyond_32bits_survive():
    # reference: TestBigInts (column_store_test.go:143)
    big = np.array([2**42, 2**33 + 7, -(2**40), 5], dtype=np.int64)
    col = IntColumnData(big, np.ones(4, dtype=bool))
    meta, sections = blocks.encode_int_column(col)
    dec = blocks.decode_int_container(_container_from(meta, sections))
    np.testing.assert_array_equal(dec.values, big)


def _container_from(meta, sections):
    import io
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "c.sy")
        codec.write_container(p, meta, sections)
        with open(p, "rb") as f:
            return codec.Container(f.read())


def test_flatten_record_type_inference():
    rec = flatten_record({
        "name": "bob", "age": 35.7, "ok": True, "nested": {"x": 1, "y": "z"},
        "tags": ["a", "b", 3, 4.6], "skip": None,
    })
    assert rec["s"] == {"name": "bob", "nested_y": "z"}
    assert rec["i"] == {"age": 35, "ok": 1, "nested_x": 1}
    assert rec["e"] == {"tags": ["a", "b", "3", "5"]}  # %.0f rounds 4.6 -> 5


def test_int_info_update_matches_reference_semantics():
    # Hand-traced against update_int_info (table_column_info.go:75-131):
    # min/max do not move until Count > MIN_CUTOFF, so max stays at the
    # first value for this 5-element sequence; the position-4 value (50)
    # is excluded from avg/m2 (ignored && Count>=MIN_CUTOFF).
    info = IntInfo()
    for v in [10, 20, 30, 40, 50]:
        info.update(v)
    assert info.min == 10 and info.max == 10
    assert info.count == 6  # reference counts n+1 (first init + increment)
    assert abs(info.avg - 25.0) < 1e-9
    assert abs(info.m2 - 500.0) < 1e-9
    # past MIN_CUTOFF, new extrema are accepted
    info.update(60)
    assert info.max == 60


def test_int_info_update_many_matches_loop():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1000, size=5000)
    a, b = IntInfo(), IntInfo()
    for v in vals.tolist():
        a.update(v)
    b.update_many(vals)
    assert a.min == b.min and a.max == b.max and a.count == b.count
    assert abs(a.avg - b.avg) < 1e-6 * max(abs(a.avg), 1)


def test_ingest_digest_query_counts(tmp_table):
    t = Table(tmp_table.table, tmp_table)
    records = [flatten_record({"x": i, "s": f"v{i % 5}", "tags": ["a", f"t{i % 3}"]})
               for i in range(1000)]
    t.ingest_records(records)
    assert len(os.listdir(os.path.join(t.dir, constants.INGEST_DIR))) == 1

    digest_records(t)
    assert not os.listdir(os.path.join(t.dir, constants.INGEST_DIR))
    assert t.record_count() == 1000

    # reload from disk in a fresh Table
    t2 = Table(tmp_table.table, tmp_table)
    assert t2.load_info()
    assert t2.schema.col_type("x") == constants.INT_VAL
    assert t2.schema.col_type("s") == constants.STR_VAL
    assert t2.schema.col_type("tags") == constants.SET_VAL

    bdir = t2.list_block_dirs()[0]
    cols = blocks.load_block_columns(bdir, t2.schema, ["x", "s", "tags"])
    assert cols["x"].valid.sum() == 1000
    np.testing.assert_array_equal(np.sort(cols["x"].values), np.arange(1000))
    gd = t2.dicts.get("s")
    assert sorted(gd.strings) == [f"v{i}" for i in range(5)]
    assert cols["tags"].offsets[-1] == 2000


def test_partial_block_fill(tmp_table):
    # shrink CHUNK_SIZE like setupTestVars (helpers_test.go:25-32)
    import sybil_tpu.digest as dg
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 100
    try:
        t = Table(tmp_table.table, tmp_table)
        t.ingest_records([flatten_record({"x": i}) for i in range(130)])
        digest_records(t)
        infos = sorted(i.num_records for i in t.block_infos().values())
        assert infos == [30, 100]
        t.ingest_records([flatten_record({"x": i}) for i in range(50)])
        digest_records(t)
        infos = sorted(i.num_records for i in t.block_infos().values())
        assert sum(infos) == 180
        assert infos == [80, 100]  # partial topped up to 100, rest new
    finally:
        dg.CHUNK_SIZE = old


def test_multi_block_digest(tmp_table):
    import sybil_tpu.digest as dg
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 64
    try:
        t = Table(tmp_table.table, tmp_table)
        t.ingest_records([flatten_record({"x": i, "time": 1000 + i})
                          for i in range(300)])
        digest_records(t)
        assert t.record_count() == 300
        assert len(t.list_block_dirs()) == 5
    finally:
        dg.CHUNK_SIZE = old


def test_bucket_v1_layout_still_decodes(tmp_path):
    """Blocks written by the v1 bucket encoder (cross-segment id deltas +
    id_base meta, no seg_bases section) must keep decoding, host and
    device: the v2 narrow-delta layout only applies to new writes."""
    import numpy as np

    from sybil_tpu import blocks, codec
    from sybil_tpu.ops.decode import decode_column_batch

    rng = np.random.default_rng(0)
    n = 1000
    values = rng.integers(0, 7, n)
    valid = rng.random(n) > 0.1
    # v1 encode, as blocks.py wrote it before seg_bases existed
    rows = np.nonzero(valid)[0].astype(np.int64)
    present = values[rows]
    order = np.argsort(present, kind="stable")
    sorted_rows = rows[order]
    uniq, starts = np.unique(present[order], return_index=True)
    offsets = np.empty(len(uniq) + 1, dtype=np.int32)
    offsets[:-1] = starts
    offsets[-1] = len(sorted_rows)
    deltas = np.empty(len(sorted_rows), dtype=np.int64)
    deltas[0] = 0
    deltas[1:] = sorted_rows[1:] - sorted_rows[:-1]
    meta = {"type": "int", "encoding": "bucket", "num_records": n,
            "cardinality": len(uniq), "id_base": int(sorted_rows[0]),
            "version": 1}
    path = str(tmp_path / "int_v.sy")
    codec.write_container(path, meta,
                          {"uniq": uniq.astype(np.int64),
                           "offsets": offsets,
                           "id_deltas": deltas.astype(np.int32)})

    c = codec.read_container(path)
    got = blocks.decode_int_container(c)
    np.testing.assert_array_equal(got.valid, valid)
    np.testing.assert_array_equal(got.values[valid], values[valid])

    dv, dm, ncols = decode_column_batch([c], 1024)
    dv, dm = np.asarray(dv)[0][:n], np.asarray(dm)[0][:n]
    np.testing.assert_array_equal(dm, valid)
    np.testing.assert_array_equal(dv[valid], values[valid])


def test_torn_column_file_skips_block(tmp_path):
    """A truncated/corrupt column file must skip its block with a
    warning, never kill the query (reference demotes half-written
    blocks and tolerates concurrent rewrites; docs/TESTPLAN.md fault
    -injection gap closed in round 4)."""
    import glob

    import sybil_tpu.digest as dg
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, QueryParams

    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 256
    try:
        flags = Flags(dir=str(tmp_path), table="torn", skip_compact=True)
        t = Table("torn", flags)
        t.ingest_records([flatten_record(
            {"g": f"k{i % 3}", "v": i % 50, "time": i})
            for i in range(1024)])
        digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    blocks_dirs = t.list_block_dirs()
    assert len(blocks_dirs) == 4
    vf = glob.glob(os.path.join(blocks_dirs[1], "*int_v*"))
    with open(vf[0], "r+b") as f:
        f.truncate(10)

    qr = run_query(t, QueryParams(groups=("g",),
                                  aggs=(AggDef("v", "avg"),)), flags)
    assert sum(r.count for r in qr.results.values()) == 1024 - 256
