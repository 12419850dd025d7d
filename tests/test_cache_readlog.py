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


def make_blocks(tmp_path, n_blocks=20, chunk=64, per=64):
    """A table whose rows land in n_blocks FULL blocks (cacheable)."""
    import sybil_tpu.digest as dg
    import sybil_tpu.query.cache as qc
    flags = Flags(dir=str(tmp_path / "db"), table="t", skip_compact=True,
                  device_batch=4)
    t = Table("t", flags)
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = chunk
    qc.CHUNK_SIZE = chunk
    try:
        n = n_blocks * per
        recs = [flatten_record({"x": i % 7, "v": i, "time": i})
                for i in range(n)]
        t.ingest_records(recs)
        digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    return t, flags, n


def test_query_cache_roundtrip(tmp_path):
    import sybil_tpu.query.cache as qc
    t, flags, n = make_blocks(tmp_path)
    cflags = Flags(**{**vars(flags), "cache_queries": True})
    params = QueryParams(groups=("x",), aggs=(AggDef("v", "avg"),))
    qr1 = run_query(t, params, cflags)
    cache_dir = os.path.join(t.dir, "cache")
    assert [f for f in os.listdir(cache_dir) if f.startswith("q_")]

    h0 = qc.HITS
    qr2 = run_query(t, params, cflags)  # cache hit
    assert qc.HITS > h0
    assert {k: r.count for k, r in qr2.results.items()} == \
           {k: r.count for k, r in qr1.results.items()}
    assert sum(r.count for r in qr2.results.values()) == n
    for k in qr1.results:
        h1, h2 = qr1.results[k].hists["v"], qr2.results[k].hists["v"]
        assert abs(h1.mean() - h2.mean()) < 1e-12
    assert [r.group_key for r in qr2.sorted] == \
           [r.group_key for r in qr1.sorted]

    # uncached result identical (cache path vs direct path parity)
    qr3 = run_query(t, params, flags)
    assert {k: r.count for k, r in qr3.results.items()} == \
           {k: r.count for k, r in qr1.results.items()}


def test_query_cache_survives_new_blocks(tmp_path):
    """Digesting MORE data must not invalidate old immutable block
    groups: the re-query serves them from cache (VERDICT r1 task 7;
    reference per-block rule query_cache.go:174-242)."""
    import sybil_tpu.digest as dg
    import sybil_tpu.query.cache as qc
    t, flags, n = make_blocks(tmp_path)
    cflags = Flags(**{**vars(flags), "cache_queries": True})
    params = QueryParams(groups=("x",))
    qr1 = run_query(t, params, cflags)
    assert sum(r.count for r in qr1.results.values()) == n

    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 64
    try:
        t.ingest_records([flatten_record({"x": 0, "v": 1, "time": 10**9})
                          for _ in range(200)])
        digest_records(t)
    finally:
        dg.CHUNK_SIZE = old

    h0, m0 = qc.HITS, qc.MISSES
    qr2 = run_query(t, params, cflags)
    assert sum(r.count for r in qr2.results.values()) == n + 200
    # old immutable groups hit; only the block topped up by the new
    # digest (and the new trailing blocks) re-scan
    assert qc.HITS - h0 >= 1
    assert qc.MISSES - m0 <= 1


def test_query_cache_time_sliding_filter(tmp_path):
    """A gt-time filter trivially true for interior groups is dropped
    from their keys, so sliding the filter still hits (the reference's
    GetCacheRelevantFilters trick, query_cache.go:69-131)."""
    import sybil_tpu.query.cache as qc
    t, flags, n = make_blocks(tmp_path)
    cflags = Flags(**{**vars(flags), "cache_queries": True})
    p1 = QueryParams(groups=("x",),
                     filters=(FilterDef("time", "gt", "-5", "int"),))
    run_query(t, p1, cflags)
    h0 = qc.HITS
    p2 = QueryParams(groups=("x",),
                     filters=(FilterDef("time", "gt", "-3", "int"),))
    qr = run_query(t, p2, cflags)
    assert qc.HITS > h0          # different literal, same trivial keys
    assert sum(r.count for r in qr.results.values()) == n


def test_query_cache_groups_survive_filter_constant_changes(tmp_path):
    """Group boundaries are formed over ALL full blocks, not the
    min/max-pruned list: changing an int filter constant (which prunes a
    different subset of blocks) must still hit the cache for groups
    whose blocks did not change (VERDICT r2 weakness #5; the reference
    keys per block and has no such coupling, query_cache.go:174-242)."""
    import sybil_tpu.query.cache as qc
    # 40 full blocks -> two 16-block groups + 8 rest; time = row index
    t, flags, n = make_blocks(tmp_path, n_blocks=40)
    cflags = Flags(**{**vars(flags), "cache_queries": True})

    def q(cut):
        return QueryParams(groups=("x",), aggs=(AggDef("v", "avg"),),
                           filters=(FilterDef("time", "gt", str(cut),
                                              "int"),))

    # warm with a cut INSIDE group 1 (rows 0..1023): group 2 (1024..2047)
    # is fully covered, so the filter is trivially true there and drops
    # out of group 2's cache key
    qr1 = run_query(t, q(300), cflags)
    # a different constant, still inside group 1: it prunes a different
    # subset of group 1's blocks, but group 2's key is unchanged -> HIT
    h0 = qc.HITS
    qr2 = run_query(t, q(500), cflags)
    assert qc.HITS > h0, "filter-constant change wiped the group cache"
    # correctness: matches the uncached engine exactly
    plain = run_query(t, q(500), flags)
    assert {k: r.count for k, r in qr2.results.items()} == \
           {k: r.count for k, r in plain.results.items()}
    assert sum(r.count for r in qr2.results.values()) == \
           sum(r.count for r in plain.results.values())


def test_cache_vgroup_batch_parity(tmp_path):
    """Multi-group cache writes via the synthetic group-index key
    (round 4, _scan_cache_vgroups): results, cached partials, and
    subsequent hits must all be exact vs the uncached scan."""
    import sybil_tpu.digest as dg
    from sybil_tpu.query import cache as qcache
    from sybil_tpu.query import engine as eng

    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 128
    old_qc = qcache.CHUNK_SIZE
    qcache.CHUNK_SIZE = 128
    try:
        flags = Flags(dir=str(tmp_path / "db"), table="vg",
                      skip_compact=True, device_batch=256)
        t = Table("vg", flags)
        t.ingest_records([flatten_record(
            {"g": f"k{i % 9}", "v": i % 50, "time": i})
            for i in range(128 * 40)])
        digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    assert len(t.list_block_dirs()) >= 32

    params = QueryParams(groups=("g",), aggs=(AggDef("v", "avg"),))
    base = run_query(t, params, flags)

    called = {}
    real = eng._scan_cache_vgroups

    def spy(ctx, groups, B, vg_cap):
        called["n"] = len(groups)
        return real(ctx, groups, B, vg_cap)

    eng._scan_cache_vgroups = spy
    cflags = Flags(**{**vars(flags), "cache_queries": True})
    try:
        qcache.HITS = qcache.MISSES = 0
        wrote = run_query(t, params, cflags)   # cold cache: writes
        assert called.get("n", 0) >= 2, "vgroup path did not engage"
        hit = run_query(t, params, cflags)     # warm cache: hits
    finally:
        eng._scan_cache_vgroups = real
        qcache.CHUNK_SIZE = old_qc
    assert qcache.HITS > 0

    def snap(qr):
        return {k: (r.count, r.samples, round(r.hists["v"].mean(), 9))
                for k, r in qr.results.items()}
    assert snap(wrote) == snap(base)
    assert snap(hit) == snap(base)
    assert wrote.matched_count == base.matched_count == 128 * 40


def test_read_log_values_outside_block_bounds(tmp_path):
    """WAL rows can carry values far outside the digested blocks' exact
    stats (which drive limb compression / value biasing / nrows-lane
    proofs); the rowstore pseudo-block must be scanned with those
    specializations stripped or sums silently corrupt (round-4 review
    fix)."""
    flags = Flags(dir=str(tmp_path / "db"), table="wb", skip_compact=True)
    t = Table("wb", flags)
    # digested rows: v in [0, 9] and fully populated
    t.ingest_records([flatten_record({"g": f"k{i % 3}", "v": i % 10,
                                      "time": i}) for i in range(300)])
    digest_records(t)
    # WAL rows: values above the blocks' EXACT max (but inside the
    # reference's Info.Max*10 discard window, so they must be counted),
    # plus a row MISSING the agg column (breaks the fully-populated
    # exists/kw proof)
    extra = [flatten_record({"g": "k0", "v": 89, "time": 1000}),
             flatten_record({"g": "k1", "v": 57, "time": 1001}),
             flatten_record({"g": "k2", "time": 1002})]
    t.ingest_records(extra)

    rl = Flags(**{**vars(flags), "read_log": True})
    params = QueryParams(groups=("g",), aggs=(AggDef("v", "avg"),))
    qr = run_query(t, params, rl)
    got = {r.group_key.rstrip("\t"): (r.count, r.hists["v"].mean())
           for r in qr.results.values()}
    # exact expectations
    import collections
    sums = collections.defaultdict(lambda: [0, 0])
    for i in range(300):
        k = f"k{i % 3}"
        sums[k][0] += i % 10
        sums[k][1] += 1
    sums["k0"][0] += 89
    sums["k0"][1] += 1
    sums["k1"][0] += 57
    sums["k1"][1] += 1
    # k2's extra row has no v: count stays, avg denominator unchanged
    assert got["k0"][0] == 101 and got["k1"][0] == 101
    assert got["k2"][0] == 101
    for k in ("k0", "k1", "k2"):
        want = sums[k][0] / sums[k][1]
        assert abs(got[k][1] - want) < 1e-9, (k, got[k][1], want)


def test_cache_vgroup_rollup_parity(tmp_path):
    """Round-5: time rollups now ride the vgroup cache path (the cg key
    is emitted MOST significant so the banded window still applies) —
    per-bucket results, cached partials, and hits must all be exact vs
    the uncached scan."""
    import sybil_tpu.digest as dg
    from sybil_tpu.query import cache as qcache

    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 128
    old_qc = qcache.CHUNK_SIZE
    qcache.CHUNK_SIZE = 128
    try:
        flags = Flags(dir=str(tmp_path / "db"), table="vgr",
                      skip_compact=True, device_batch=256)
        t = Table("vgr", flags)
        t.ingest_records([flatten_record(
            {"g": f"k{i % 4}", "v": i % 40, "time": i * 3})
            for i in range(128 * 40)])
        digest_records(t)

        params = QueryParams(groups=("g",), aggs=(AggDef("v", "avg"),),
                             time_bucket=100, time_col="time")
        base = run_query(t, params, flags)

        cflags = Flags(**{**vars(flags), "cache_queries": True})
        qcache.HITS = qcache.MISSES = 0
        wrote = run_query(t, params, cflags)   # cold: vgroup writes
        hit = run_query(t, params, cflags)     # warm: hits
        assert qcache.HITS > 0
    finally:
        dg.CHUNK_SIZE = old
        qcache.CHUNK_SIZE = old_qc

    def snap(qr):
        out = {}
        for tb, rows in qr.time_results.items():
            for gk, r in rows.items():
                h = r.hists.get("v")
                out[(tb, gk)] = (r.count, r.samples,
                                 round(h.mean(), 9) if h else None)
        return out

    assert snap(wrote) == snap(base)
    assert snap(hit) == snap(base)
    assert wrote.matched_count == base.matched_count == 128 * 40
