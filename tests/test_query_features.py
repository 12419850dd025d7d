"""Round-2 query features: intermediate top-k pruning (prune_by),
distinct-limit early exit, sample-cols restriction, the mid-query
"BLOCK SIZE CHANGED" consistency guard, and TSV export.

Reference behaviors: CombineAndPrune/PruneResults (aggregate.go:347,
469-525), distinct-limit (table_query.go:263-279), -sample-cols
(cmd_query.go:142-146), block consistency guards
(column_store_io.go:525; tests table_query_test.go:11-84),
ExportBlockData (table_block_io.go:356-398).
"""

import gzip
import os
import random

import numpy as np
import pytest

from sybil_tpu import blocks
from sybil_tpu.config import Flags
from sybil_tpu.digest import digest_records
from sybil_tpu.ingest import flatten_record
from sybil_tpu.query.engine import run_query
from sybil_tpu.query.oracle import run_oracle
from sybil_tpu.query.spec import AggDef, FilterDef, QueryParams
from sybil_tpu.table import Table


def make_skewed_table(flags, n_uids=400, chunk=512, seed=3):
    """Zipf-ish uid distribution spread over many blocks."""
    import sybil_tpu.digest as dg
    rng = random.Random(seed)
    rows = []
    # heavy hitters with unambiguous top-3 margins
    for uid, cnt in ((0, 1200), (1, 800), (2, 500)):
        rows += [uid] * cnt
    for uid in range(3, n_uids):
        rows += [uid] * rng.randint(3, 8)
    rng.shuffle(rows)
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = chunk
    try:
        t = Table(flags.table, flags)
        recs = [flatten_record({"uid": uid, "v": i % 97, "time": 0})
                for i, uid in enumerate(rows)]
        for start in range(0, len(recs), 2000):
            t.ingest_records(recs[start: start + 2000])
            digest_records(t)
        return t, len(rows)
    finally:
        dg.CHUNK_SIZE = old


def test_prune_intermediate_topk(tmp_table):
    tmp_table.device_batch = 2
    t, total = make_skewed_table(tmp_table)
    params = QueryParams(groups=("uid",), limit=3, prune_by="$COUNT")
    qr = run_query(t, params, tmp_table)
    oracle = run_oracle(t, QueryParams(groups=("uid",), prune_by=""),
                        tmp_table)

    # pruned to <= 10*limit (capped at 1000)
    assert len(qr.results) <= 30
    assert len(oracle.results) > 30

    def top(results, k):
        return [r.key_tuple for r in sorted(results.values(),
                                            key=lambda r: -r.count)[:k]]

    etop, otop = top(qr.results, 3), top(oracle.results, 3)
    assert etop == otop == [(0,), (1,), (2,)]
    for e, o in zip(etop, otop):
        ek = [r for r in qr.results.values() if r.key_tuple == e][0]
        ok = [r for r in oracle.results.values() if r.key_tuple == o][0]
        assert ek.count == ok.count  # surviving groups keep exact counts


def test_prune_disabled_exact(tmp_table):
    tmp_table.device_batch = 2
    t, total = make_skewed_table(tmp_table)
    params = QueryParams(groups=("uid",), prune_by="")
    qr = run_query(t, params, tmp_table)
    oracle = run_oracle(t, params, tmp_table)
    assert {r.key_tuple: r.count for r in qr.results.values()} == \
        {r.key_tuple: r.count for r in oracle.results.values()}
    assert sum(r.count for r in qr.results.values()) == total


def test_prune_by_agg_mean(tmp_table):
    """prune_by an int column ranks by its mean (SortResultsByCol)."""
    tmp_table.device_batch = 2
    import sybil_tpu.digest as dg
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 512
    try:
        t = Table(tmp_table.table, tmp_table)
        recs = []
        rng = random.Random(7)
        # 60 uids; uid k has v ~ k*10 => mean ranking is by uid desc
        rows = [(uid, uid * 10 + rng.randint(0, 3))
                for uid in range(60) for _ in range(40)]
        rng.shuffle(rows)
        recs = [flatten_record({"uid": u, "v": v, "time": 0})
                for u, v in rows]
        for start in range(0, len(recs), 1200):
            t.ingest_records(recs[start: start + 1200])
            digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    params = QueryParams(groups=("uid",), aggs=(AggDef("v", "avg"),),
                         limit=2, prune_by="v")
    qr = run_query(t, params, tmp_table)
    assert len(qr.results) <= 20
    kept = {r.key_tuple[0] for r in qr.results.values()}
    # the highest-mean uids must survive pruning
    assert {59, 58, 57, 56, 55} <= kept


def test_distinct_limit_early_exit(tmp_table):
    """Block-sorted uids: the engine must stop scanning once the group
    count reaches -distinct-limit instead of visiting every block."""
    import sybil_tpu.digest as dg
    tmp_table.device_batch = 1
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 512
    try:
        t = Table(tmp_table.table, tmp_table)
        n = 4096
        recs = [flatten_record({"uid": i // 512, "time": i}) for i in range(n)]
        for start in range(0, n, 2048):
            t.ingest_records(recs[start: start + 2048])
            digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    assert len(t.list_block_dirs()) == 8

    full = run_query(t, QueryParams(groups=("uid",)), tmp_table)
    assert len(full.results) == 8

    qr = run_query(t, QueryParams(groups=("uid",), num_distinct=2),
                   tmp_table)
    assert 2 <= len(qr.results) < 8


def test_sample_cols(tmp_table):
    t = Table(tmp_table.table, tmp_table)
    recs = [flatten_record({"host": f"h{i % 3}", "ping": i, "extra": i * 2,
                            "time": i}) for i in range(100)]
    t.ingest_records(recs)
    digest_records(t)

    qr = run_query(t, QueryParams(samples=True, limit=5), tmp_table)
    assert qr.samples and any("extra" in s for s in qr.samples)

    qr = run_query(t, QueryParams(samples=True, limit=5,
                                  sample_cols=("host", "ping")), tmp_table)
    assert qr.samples
    for s in qr.samples:
        assert set(s) <= {"host", "ping"}


def test_block_size_changed_guard(tmp_table, monkeypatch):
    """A block whose on-disk record count disagrees with the info
    snapshot taken at query start must be skipped, not mis-scanned —
    both on fresh column loads and on residency-cache hits."""
    t = Table(tmp_table.table, tmp_table)
    recs = [flatten_record({"uid": i % 5, "v": i, "time": i})
            for i in range(600)]
    t.ingest_records(recs)
    digest_records(t)

    params = QueryParams(groups=("uid",))
    qr = run_query(t, params, tmp_table)
    assert sum(r.count for r in qr.results.values()) == 600

    # simulate the race: the info snapshot is stale (block republished
    # with more records between info read and column load)
    real = t.block_infos()
    stale = {d: blocks.BlockInfo(i.num_records - 7, i.int_info, i.str_info)
             for d, i in real.items()}
    monkeypatch.setattr(Table, "block_infos", lambda self: stale)

    # cache-hit path (lanes resident from the first query)
    qr = run_query(t, params, tmp_table)
    assert sum(r.count for r in qr.results.values()) == 0

    # fresh-load path
    from sybil_tpu.ops.residency import CACHE
    CACHE.clear()
    qr = run_query(t, params, tmp_table)
    assert sum(r.count for r in qr.results.values()) == 0


def test_export_tsv(tmp_table):
    from sybil_tpu.export import export_table
    t = Table(tmp_table.table, tmp_table)
    recs = [flatten_record({"host": f"h{i % 3}", "ping": i, "time": i})
            for i in range(50)]
    t.ingest_records(recs)
    digest_records(t)
    t.load_info()

    paths = export_table(t)
    assert paths and all(p.endswith(".tsv.gz") for p in paths)
    with gzip.open(paths[0], "rt") as f:
        lines = f.read().splitlines()
    header = lines[0].split("\t")
    assert set(header) == {"ping", "time", "host"}
    assert len(lines) - 1 == 50
    row = dict(zip(header, lines[1].split("\t")))
    assert row["host"].startswith("h")
    assert int(row["ping"]) == int(row["time"])


def test_phase_timing_report(tmp_table, capfd):
    """-debug prints a per-phase wall-time breakdown (DEBUG_TIMING
    equivalent, table_query.go:155-161)."""
    import sybil_tpu.debug as dbg
    t = Table(tmp_table.table, tmp_table)
    t.ingest_records([flatten_record({"uid": i % 3, "time": i})
                      for i in range(100)])
    digest_records(t)
    old = dbg.DEBUG_FLAG
    dbg.DEBUG_FLAG = True
    try:
        run_query(t, QueryParams(groups=("uid",)), tmp_table)
    finally:
        dbg.DEBUG_FLAG = old
    err = capfd.readouterr().err
    assert "QUERY TIMING wall" in err
    for phase in ("bind", "load", "dispatch", "drain", "finish"):
        assert phase in err


def test_device_prune_keeps_cumulative_exact(tmp_table):
    """Pruned-away rows still count toward Cumulative/matched (the
    reference merges into Cumulative BEFORE PruneResults drops rows,
    aggregate.go:422-471); the device prune ships whole-table totals in
    the packed meta row to preserve that."""
    tmp_table.device_batch = 2
    t, total = make_skewed_table(tmp_table)
    params = QueryParams(groups=("uid",), limit=3, prune_by="$COUNT")
    qr = run_query(t, params, tmp_table)
    assert len(qr.results) <= 30          # pruning really happened
    assert qr.matched_count == total
    assert qr.cumulative.count == total


def test_packed_sort_high_cardinality_with_missing(tmp_table):
    """Str-only group keys pack into one mixed-radix sort key
    (ScanConfig.sort_pack); parity vs the oracle must hold for
    high-cardinality dicts (sorted strategy) including rows where a
    group column is missing entirely."""
    tmp_table.device_batch = 4
    t = Table(tmp_table.table, tmp_table)
    rng = np.random.default_rng(3)
    n = 30000
    uid = rng.zipf(1.3, n) % 9000
    t.ingest_columns(ints={"v": rng.integers(0, 50, n).astype(np.int64)},
                     strs={"u": [f"person{x}" for x in uid]})
    # second batch adds a second str col -> first batch's rows miss it
    t.ingest_columns(ints={"v": rng.integers(0, 50, n).astype(np.int64)},
                     strs={"u": [f"person{x}" for x in uid],
                           "u2": [f"g{x % 7}" for x in uid]})
    params = QueryParams(groups=("u", "u2"), aggs=(AggDef("v", "avg"),),
                         limit=10**9, prune_by="")
    from sybil_tpu.query.engine import BoundQuery
    assert BoundQuery(t, params, tmp_table).config.strategy == "sorted"
    qr = run_query(t, params, tmp_table)
    orc = run_oracle(t, params, tmp_table)
    eng = {r.group_key: (r.count, round(r.hists["v"].mean(), 9))
           for r in qr.results.values()}
    oro = {r.group_key: (r.count, round(r.hists["v"].mean(), 9))
           for r in orc.results.values()}
    assert eng == oro


def test_tdigest_hist_percentile_accuracy(tmp_path):
    """-tdigest (hist_tdigest.go:1-130, build tag `tdigest`): percentile
    accuracy vs an exact sort on skewed (lognormal-ish) data, fed from
    the device's sparse (group, value, Σw) hist pairs.  Also checks the
    reference's surface quirks: stddev 0, str buckets empty, Mean() is
    the median."""
    import numpy as np

    from sybil_tpu.config import Flags
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, QueryParams
    from sybil_tpu.table import Table

    flags = Flags(dir=str(tmp_path / "db"), table="td", skip_compact=True,
                  device_batch=4, tdigest=True)
    t = Table("td", flags)
    rng = np.random.default_rng(3)
    n = 200_000
    v = np.round(np.exp(rng.normal(5, 1.2, n))).astype(np.int64) + 1
    grp = rng.integers(0, 3, n).astype(np.int64)
    t.ingest_columns(ints={"v": v, "g": grp,
                           "time": np.arange(n, dtype=np.int64)})

    params = QueryParams(groups=("g",),
                         aggs=(AggDef("v", "hist", "tdigest"),))
    qr = run_query(t, params, flags)
    assert len(qr.results) == 3
    for k, res in qr.results.items():
        gval = int(k.rstrip("\t"))
        h = res.hists["v"]
        exact = np.sort(v[grp == gval])
        assert res.count == exact.size
        pct = h.get_percentiles()
        for p in (10, 25, 50, 75, 90, 95, 99):
            want = float(exact[int(p / 100 * exact.size)])
            got = float(pct[p])
            assert abs(got - want) <= max(0.02 * want, 2.0), (gval, p)
        # reference quirks, mirrored deliberately:
        assert h.get_stddev() == 0.0            # hist_tdigest.go:92-94
        assert h.get_str_buckets() == {}        # hist_tdigest.go:105-110
        med = float(exact[exact.size // 2])
        assert abs(h.mean() - med) <= max(0.02 * med, 2.0)  # :61-63


def test_tdigest_sharded_and_wire_roundtrip(tmp_path):
    """t-digests merge across the mesh shards and survive the node wire
    protocol (centroid marshalling, the analog of gob AsBytes)."""
    import numpy as np

    from sybil_tpu.config import Flags
    from sybil_tpu.parallel.wire import hist_from_wire, hist_to_wire
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, QueryParams
    from sybil_tpu.table import Table

    flags = Flags(dir=str(tmp_path / "db"), table="td", skip_compact=True,
                  device_batch=8, tdigest=True)
    t = Table("td", flags)
    rng = np.random.default_rng(7)
    n = 60_000
    v = np.round(np.exp(rng.normal(4, 1.0, n))).astype(np.int64) + 1
    grp = rng.integers(0, 4, n).astype(np.int64)
    t.ingest_columns(ints={"v": v, "g": grp,
                           "time": np.arange(n, dtype=np.int64)})
    params = QueryParams(groups=("g",),
                         aggs=(AggDef("v", "hist", "tdigest"),))
    single = run_query(t, params, flags)
    sharded = run_query(t, params,
                        Flags(**{**vars(flags), "data_shards": 8}))
    assert set(single.results) == set(sharded.results)
    for k in single.results:
        hs = single.results[k].hists["v"]
        hd = sharded.results[k].hists["v"]
        assert hs.total_count() == hd.total_count()
        ps, pd = hs.get_percentiles(), hd.get_percentiles()
        for p in (25, 50, 75, 95):
            assert abs(ps[p] - pd[p]) <= max(0.03 * ps[p], 3.0), (k, p)
        # wire roundtrip preserves the digest
        rt = hist_from_wire(hist_to_wire(hs))
        assert rt.total_count() == hs.total_count()
        assert rt.get_percentiles()[50] == ps[50]


def test_lane_limb_compression_engages_and_stays_exact(tmp_path):
    """Exact per-block bounds (BlockInfo.int_exact) shrink the device
    sum lanes: 0/1 lanes take one byte limb and bounded kwv lanes bias
    nonneg (ops/scan.py lane_limbs8).  Must engage on a bounded table
    (including NEGATIVE values via the bias) and match the oracle
    exactly, dense and sorted and sharded."""
    import numpy as np

    from sybil_tpu.config import Flags
    from sybil_tpu.query.engine import BoundQuery, run_query
    from sybil_tpu.query.oracle import run_oracle
    from sybil_tpu.query.spec import AggDef, QueryParams
    from sybil_tpu.table import Table

    flags = Flags(dir=str(tmp_path / "db"), table="lb", skip_compact=True,
                  device_batch=4)
    t = Table("lb", flags)
    rng = np.random.default_rng(9)
    n = 50_000
    g = rng.integers(0, 9, n).astype(np.int64)
    v = rng.integers(-500, 900, n).astype(np.int64)     # negative values
    w = rng.choice([1, 3, 10], n).astype(np.int64)
    t.ingest_columns(ints={"g": g, "v": v, "w": w,
                           "time": np.arange(n, dtype=np.int64)})

    params = QueryParams(groups=("g",), aggs=(AggDef("v", "avg"),),
                         weight_col="w")
    # the spec engages: bounded lanes, nonzero bias for the negative col
    t.load_info()
    b = BoundQuery(t, params, flags)
    b.apply_exact_bounds(t.block_infos(), list(t.block_infos()))
    assert b.config.lane_limbs8, "compression did not engage"
    assert b.config.lane_limbs8[1] == 1          # samples lane: one limb
    assert any(x < 8 for x in b.config.lane_limbs8)
    assert b.config.agg_vbias and b.config.agg_vbias[0] <= -500

    e = run_query(t, params, flags)
    o = run_oracle(t, params)
    assert set(e.results) == set(o.results)
    for k, orow in o.results.items():
        erow = e.results[k]
        assert erow.count == orow.count, k
        eh, oh = erow.hists["v"], orow.hists["v"]
        assert abs(eh.mean() - oh.mean()) < 1e-9 * max(1, abs(oh.mean())), k
        assert abs(eh.sum() - oh.sum()) < 1e-6, k

    sharded = run_query(t, params,
                        Flags(**{**vars(flags), "data_shards": 8}))
    for k in e.results:
        assert sharded.results[k].count == e.results[k].count
        assert abs(sharded.results[k].hists["v"].mean()
                   - e.results[k].hists["v"].mean()) < 1e-9


def test_prune_gate_small_tables_stay_exact(tmp_path):
    """Device-side intermediate pruning engages only above the
    reference's 16-block combine granularity (table_query.go:263-279):
    a <=16-block high-cardinality query returns EVERY group exactly;
    a >16-block one may prune to 10*limit but keeps the Cumulative
    totals exact (aggregate.go:422-471)."""
    import numpy as np

    from sybil_tpu.config import Flags
    from sybil_tpu.query.engine import run_query
    from sybil_tpu.query.spec import AggDef, QueryParams
    from sybil_tpu.table import Table
    import sybil_tpu.digest as dg

    def build(nblocks, chunk=256):
        d = str(tmp_path / f"db{nblocks}")
        flags = Flags(dir=d, table="t", skip_compact=True, device_batch=64)
        t = Table("t", flags)
        old = dg.CHUNK_SIZE
        dg.CHUNK_SIZE = chunk
        import sybil_tpu.query.cache as qc
        qc.CHUNK_SIZE = chunk
        try:
            n = nblocks * chunk
            t.ingest_columns(ints={
                "uid": (np.arange(n) % (n // 2)).astype(np.int64),
                "v": np.ones(n, dtype=np.int64)})
        finally:
            dg.CHUNK_SIZE = old
        return t, flags, n

    params = QueryParams(groups=("uid",), aggs=(AggDef("v", "avg"),),
                         limit=5)   # prune cap would be 50

    # 8 blocks: exact — every one of the 1024 groups present
    t8, fl8, n8 = build(8)
    qr = run_query(t8, params, fl8)
    assert len(qr.results) == n8 // 2
    assert qr.cumulative.count == n8

    # 20 blocks: pruning allowed — but totals stay exact
    t20, fl20, n20 = build(20)
    qr = run_query(t20, params, fl20)
    assert len(qr.results) <= n20 // 2
    assert qr.cumulative.count == n20
    assert qr.matched_count == n20


def test_set_column_residency(tmp_table, monkeypatch):
    """Set columns get the dense-column residency treatment: the second
    run of a set-filter query re-reads no set files and rebuilds no CSR
    (round-4; dense-lane analog is ops/residency.py)."""
    t = Table(tmp_table.table, tmp_table)
    recs = [flatten_record({"uid": i % 7, "groups": [f"g{i % 3}", "all"]})
            for i in range(600)]
    t.ingest_records(recs)
    digest_records(t)
    params = QueryParams(groups=("uid",),
                         filters=(FilterDef("groups", "in", "g1", "set"),))
    first = run_query(t, params, tmp_table)

    calls = []
    real = blocks.load_block_columns

    def spy(bdir, schema, cols):
        calls.append(tuple(cols))
        return real(bdir, schema, cols)

    monkeypatch.setattr(blocks, "load_block_columns", spy)
    second = run_query(t, params, tmp_table)
    set_reads = [c for c in calls if "groups" in c]
    assert set_reads == [], f"set column re-read from disk: {set_reads}"
    a = {k: r.count for k, r in first.results.items()}
    b = {k: r.count for k, r in second.results.items()}
    assert a == b and sum(a.values()) == 200


def test_enum_strategy_high_card_prune(tmp_table):
    """The enumerated strategy (sort + cumsum + searchsorted, round 4)
    must engage for device-pruned packed high-cardinality group-bys and
    return exactly what the host prune over the sorted strategy returns:
    same top groups, same counts/avgs, same Cumulative."""
    import dataclasses

    import sybil_tpu.digest as dg
    from sybil_tpu.ops import scan as scanops

    tmp_table.device_batch = 4
    rng = np.random.default_rng(7)
    # > DENSE_SLOT_CAP distinct uids so the dense strategy is out and
    # the packed sorted/enumerated path is the only device option
    heavy = rng.zipf(1.25, 12000) % 3000
    tail = np.arange(10000) + 100000
    uid = np.concatenate([heavy, tail])
    rng.shuffle(uid)
    n = len(uid)
    vals = rng.integers(0, 100, n).astype(np.int64)
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 1024   # >16 blocks so the device prune engages
    try:
        t = Table(tmp_table.table, tmp_table)
        t.ingest_columns(ints={"v": vals},
                         strs={"u": [f"person{x}" for x in uid]})
    finally:
        dg.CHUNK_SIZE = old

    params = QueryParams(groups=("u",), aggs=(AggDef("v", "avg"),),
                         limit=5, prune_by="$COUNT")

    seen = {}
    real_enum = scanops.enum_radix

    def spy(config):
        r = real_enum(config)
        if config.prune_topk > 0:
            seen["radix"] = r
        return r

    scanops.enum_radix = spy
    try:
        qr = run_query(t, params, tmp_table)
    finally:
        scanops.enum_radix = real_enum
    assert seen.get("radix", 0) > 0, "enumerated strategy did not engage"

    # ground truth: exact scan (no pruning anywhere)
    exact = run_query(t, QueryParams(groups=("u",),
                                     aggs=(AggDef("v", "avg"),)), tmp_table)
    top = sorted(exact.results.values(), key=lambda r: -r.count)[:5]
    got = sorted(qr.results.values(), key=lambda r: -r.count)[:5]
    assert [(r.group_key, r.count) for r in got] == \
        [(r.group_key, r.count) for r in top]
    for g, e in zip(got, top):
        assert abs(g.hists["v"].mean() - e.hists["v"].mean()) < 1e-9
    assert qr.matched_count == n
    assert qr.cumulative.count == n


def test_windowed_rollup_parity(tmp_table):
    """Windowed dense accumulation (round 4): digest time-sorts rows, so
    each block spans a narrow time band; the kernel one-hots only a
    [window, C] band per chunk.  The window must engage for a
    multi-block rollup and produce exactly the full-path results."""
    import dataclasses

    import sybil_tpu.digest as dg
    from sybil_tpu.query import engine as eng

    rng = np.random.default_rng(11)
    n = 8192
    times = rng.integers(0, 160_000, n).astype(np.int64)
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 512    # one digest -> 16 time-partitioned blocks
    try:
        t = Table(tmp_table.table, tmp_table)
        t.ingest_columns(
            ints={"time": times, "v": rng.integers(0, 50, n).astype(np.int64)},
            strs={"act": [f"a{i % 5}" for i in range(n)]})
    finally:
        dg.CHUNK_SIZE = old

    params = QueryParams(groups=("act",), aggs=(AggDef("v", "avg"),),
                         time_bucket=1000, time_col="time")

    seen = {}
    real = eng.BoundQuery.apply_exact_bounds

    def spy(self, infos, dirs):
        real(self, infos, dirs)
        seen["window"] = self.config.window
        seen["slots"] = self.config.dense_slots

    eng.BoundQuery.apply_exact_bounds = spy
    try:
        qr = run_query(t, params, tmp_table)
    finally:
        eng.BoundQuery.apply_exact_bounds = real
    assert 0 < seen["window"] < seen["slots"], seen

    oracle = run_oracle(t, params, tmp_table)
    got = {(tb, k): r.count for tb, rs in qr.time_results.items()
           for k, r in rs.items()}
    want = {(tb, k): r.count for tb, rs in oracle.time_results.items()
            for k, r in rs.items()}
    assert got == want and sum(got.values()) == n
    for tb, rs in oracle.time_results.items():
        for k, r in rs.items():
            assert abs(qr.time_results[tb][k].hists["v"].mean()
                       - r.hists["v"].mean()) < 1e-9


def test_enum_strategy_fallback_no_bounds(tmp_table, monkeypatch):
    """Without exact per-lane row bounds the enumerated strategy must
    fall back to the carry-idx + gather path and stay parity-exact."""
    import dataclasses

    from sybil_tpu.query import engine as eng

    real = eng.BoundQuery.apply_exact_bounds

    def strip(self, infos, dirs):
        real(self, infos, dirs)
        self.config = dataclasses.replace(self.config, lane_row_bounds=())

    monkeypatch.setattr(eng.BoundQuery, "apply_exact_bounds", strip)
    test_enum_strategy_high_card_prune(tmp_table)


def test_samples_with_set_filter(tmp_table):
    """-samples honors set filters (the reference's own TESTPLAN tracked
    'Work with samples' as an open gap; covered here): every returned
    sample row must satisfy the in/nin predicate."""
    t = Table(tmp_table.table, tmp_table)
    t.ingest_records([flatten_record(
        {"uid": i, "groups": [f"g{i % 3}", "all"], "v": i})
        for i in range(500)])
    digest_records(t)

    qr = run_query(t, QueryParams(
        samples=True, limit=5,
        filters=(FilterDef("groups", "in", "g2", "set"),)), tmp_table)
    assert qr.samples
    assert all("g2" in s["groups"] for s in qr.samples)
    assert all(s["uid"] % 3 == 2 for s in qr.samples)

    qr = run_query(t, QueryParams(
        samples=True, limit=5,
        filters=(FilterDef("groups", "nin", "g2", "set"),)), tmp_table)
    assert qr.samples
    assert all("g2" not in s["groups"] for s in qr.samples)
