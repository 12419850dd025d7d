"""Device engine vs row-at-a-time oracle on every query shape.

The oracle is a direct transcription of the reference's scan loop, so
agreement here is the parity argument (SURVEY.md §7: exact row parity).
"""

import random

import numpy as np
import pytest

from sybil_tpu.config import Flags
from sybil_tpu.digest import digest_records
from sybil_tpu.ingest import flatten_record
from sybil_tpu.query.engine import run_query
from sybil_tpu.query.oracle import run_oracle
from sybil_tpu.query.spec import AggDef, FilterDef, QueryParams
from sybil_tpu.table import Table

HOSTS = ["www.facebook.com", "www.yahoo.com", "www.google.com",
         "www.reddit.com", "github.com"]
STATII = ["200", "403", "404", "500", "503"]


def make_table(tmp_table, n=2000, chunk=512, seed=0):
    import sybil_tpu.digest as dg
    rng = random.Random(seed)
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = chunk
    try:
        t = Table(tmp_table.table, tmp_table)
        records = []
        for i in range(n):
            rec = {
                "status": rng.choice(STATII),
                "host": rng.choice(HOSTS),
                "ping": abs(rng.gauss(60, 20)),
                "weight": rng.choice([1, 10, 100]),
                "time": 1700000000 + rng.randint(-2419200, 2419200),
                "index_int": i,
                "groups": [g for m, g in ((2, "mod2"), (3, "mod3"), (5, "mod5"))
                           if i % m == 0] or ["none"],
            }
            if i % 17 == 0:
                del rec["ping"]       # missing values
            if i % 23 == 0:
                del rec["host"]
            records.append(flatten_record(rec))
        t.ingest_records(records)
        digest_records(t)
        return t
    finally:
        dg.CHUNK_SIZE = old


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    flags = Flags(dir=str(tmp_path_factory.mktemp("db")), table="uptime",
                  device_batch=3)
    return make_table(flags)


def assert_matches(engine, oracle, check_hists=True, agg_cols=()):
    ekeys = set(engine.results)
    okeys = set(oracle.results)
    assert ekeys == okeys, f"group keys differ: {ekeys ^ okeys}"
    for k, o in oracle.results.items():
        e = engine.results[k]
        assert e.count == o.count, f"count mismatch for {k!r}"
        assert e.samples == o.samples, f"samples mismatch for {k!r}"
        if check_hists:
            for col in agg_cols:
                eh, oh = e.hists.get(col), o.hists.get(col)
                assert (eh is None) == (oh is None), f"hist presence {k!r}/{col}"
                if eh is None:
                    continue
                assert eh.total_count() == oh.total_count(), (k, col)
                assert abs(eh.mean() - oh.mean()) < 1e-6 * max(1, abs(oh.mean()))
                if eh.percentile_mode:
                    np.testing.assert_array_equal(eh.values, oh.values)
                    assert sorted(eh.outliers) == sorted(oh.outliers)
                    assert eh.get_percentiles() == oh.get_percentiles()
                    assert abs(eh.get_stddev() - oh.get_stddev()) < 1e-9


def run_both(table, params):
    return run_query(table, params), run_oracle(table, params)


def test_group_by_str_avg(table):
    params = QueryParams(groups=("host",), aggs=(AggDef("ping", "avg"),))
    e, o = run_both(table, params)
    assert_matches(e, o, agg_cols=["ping"])
    assert any(k.startswith("www.google.com") for k in e.results)
    # missing host rows appear under the empty group key
    assert "\t" in e.results


def test_group_by_int_count(table):
    params = QueryParams(groups=("status",))
    e, o = run_both(table, params)
    assert_matches(e, o)
    assert sum(r.count for r in e.results.values()) == 2000


def test_no_groups_total(table):
    params = QueryParams(aggs=(AggDef("ping", "avg"),))
    e, o = run_both(table, params)
    assert set(e.results) == {"total"}
    assert_matches(e, o, agg_cols=["ping"])


def test_int_filters(table):
    for op, val in [("gt", 60), ("lt", 40), ("eq", 55), ("neq", 55)]:
        params = QueryParams(groups=("host",),
                             filters=(FilterDef("ping", op, str(val), "int"),))
        e, o = run_both(table, params)
        assert_matches(e, o)


def test_str_filters(table):
    for op, val in [("eq", "www.google.com"), ("neq", "www.google.com"),
                    ("re", r"www\..*\.com"), ("nre", "git")]:
        params = QueryParams(groups=("status",),
                             filters=(FilterDef("host", op, val, "str"),))
        e, o = run_both(table, params)
        assert_matches(e, o)


def test_str_filter_unknown_value(table):
    params = QueryParams(groups=("status",),
                         filters=(FilterDef("host", "eq", "nosuch", "str"),))
    e, o = run_both(table, params)
    assert_matches(e, o)
    assert not e.results


def test_set_filters(table):
    for op in ("in", "nin"):
        params = QueryParams(groups=("host",),
                             filters=(FilterDef("groups", op, "mod3", "set"),))
        e, o = run_both(table, params)
        assert_matches(e, o)


def test_weight_col(table):
    params = QueryParams(groups=("host",), weight_col="weight",
                         aggs=(AggDef("ping", "avg"),))
    e, o = run_both(table, params)
    assert_matches(e, o, agg_cols=["ping"])
    # weighted counts far exceed row counts
    assert sum(r.count for r in e.results.values()) > 2000


def test_hist_op(table):
    params = QueryParams(groups=("host",), aggs=(AggDef("ping", "hist"),))
    e, o = run_both(table, params)
    assert_matches(e, o, agg_cols=["ping"])


def test_hist_with_filter_and_weight(table):
    params = QueryParams(groups=("status",), weight_col="weight",
                         filters=(FilterDef("ping", "gt", "30", "int"),),
                         aggs=(AggDef("ping", "hist"),))
    e, o = run_both(table, params)
    assert_matches(e, o, agg_cols=["ping"])


def test_loghist(table):
    params = QueryParams(groups=("host",),
                         aggs=(AggDef("ping", "hist", "multi"),))
    e, o = run_both(table, params)
    assert_matches(e, o, agg_cols=["ping"])


def test_time_rollup(table):
    params = QueryParams(groups=("host",), time_bucket=86400 * 7,
                         aggs=(AggDef("ping", "avg"),))
    e, o = run_both(table, params)
    assert set(e.time_results) == set(o.time_results)
    for tb in o.time_results:
        em, om = e.time_results[tb], o.time_results[tb]
        assert set(em) == set(om)
        for k in om:
            assert em[k].count == om[k].count
    # totals live in .results
    assert set(e.results) == set(o.results)
    for k in o.results:
        assert e.results[k].count == o.results[k].count


def test_multi_group(table):
    params = QueryParams(groups=("host", "status"),
                         aggs=(AggDef("ping", "avg"),))
    e, o = run_both(table, params)
    assert_matches(e, o, agg_cols=["ping"])
    assert len(e.results) > 5


def test_distinct(table):
    params = QueryParams(groups=("host",), distincts=("status",))
    e, o = run_both(table, params)
    assert set(e.results) == set(o.results)
    for k in o.results:
        ec = e.results[k].distinct.cardinality()
        oc = o.results[k].distinct.cardinality()
        assert ec == oc, f"distinct mismatch for {k!r}"
        assert 3 <= ec <= 7  # ~5 statii


def test_sort_order(table):
    params = QueryParams(groups=("host",))
    e, _ = run_both(table, params)
    counts = [r.count for r in e.sorted]
    assert counts == sorted(counts, reverse=True)


def test_cumulative(table):
    params = QueryParams(groups=("host",))
    e, o = run_both(table, params)
    assert e.cumulative.count == o.cumulative.count == 2000


def test_distinct_device_hll_int_col(table):
    """Int distinct columns hash in-kernel (FNV-1a over the 8 LE value
    bytes + splitmix, ops/scan.py _hash_int_col) — estimates must be
    bit-identical to the host HLL's int fast path."""
    from sybil_tpu.query.engine import BoundQuery
    params = QueryParams(groups=("status",), distincts=("index_int",))
    bound = BoundQuery(table._engine_table if hasattr(table, "_engine_table")
                       else table, params, table.flags)
    assert bound.config.hll and bound.config.hll_hash_idx == -1
    e, o = run_both(table, params)
    assert set(e.results) == set(o.results)
    for k in o.results:
        assert e.results[k].distinct.cardinality() == \
            o.results[k].distinct.cardinality(), k


def test_distinct_device_hll_multibatch_and_escalation(tmp_path):
    """Register planes merge by max across batches, and live groups
    beyond the shipped-plane cap (hll_ship) escalate to the full
    register array — both must stay estimate-identical to the host."""
    import sybil_tpu.digest as dg
    from sybil_tpu.query.oracle import run_oracle
    flags = Flags(dir=str(tmp_path), table="hllesc", device_batch=1)
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 256
    try:
        t = Table("hllesc", flags)
        # 20 groups (> hll_ship=8) x ~40 distinct users, over >=8 blocks
        recs = [flatten_record({"g": f"g{i % 20}", "u": f"user{i % 800}",
                                "time": i}) for i in range(2400)]
        for s in range(0, len(recs), 1200):
            t.ingest_records(recs[s: s + 1200])
            digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    t.load_info()
    params = QueryParams(groups=("g",), distincts=("u",))
    from sybil_tpu.query.engine import BoundQuery
    assert BoundQuery(t, params, flags).config.hll
    e = run_query(t, params, flags)
    o = run_oracle(t, params, flags)
    assert set(e.results) == set(o.results) and len(e.results) == 20
    for k in o.results:
        assert e.results[k].distinct.cardinality() == \
            o.results[k].distinct.cardinality(), k
