"""Deterministic randomized parity fuzz: many generated query shapes
(groups x filters x aggs x rollups x weights) run through the device
engine AND the pure-numpy oracle, asserting exact counts/samples and
aggregate sums.  The targeted parity tests each pin one shape; this
sweeps the combinatorial space the reference exercises through
aggregate_test.go/filter_test.go with fixed seeds."""

import random

import pytest

from sybil_tpu.config import Flags
from sybil_tpu.digest import digest_records
from sybil_tpu.ingest import flatten_record
from sybil_tpu.query.engine import run_query
from sybil_tpu.query.oracle import run_oracle
from sybil_tpu.query.spec import AggDef, FilterDef, QueryParams
from sybil_tpu.table import Table


@pytest.fixture(scope="module")
def fuzz_table(tmp_path_factory):
    import sybil_tpu.digest as dg
    rng = random.Random(20260821)
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 512
    try:
        flags = Flags(dir=str(tmp_path_factory.mktemp("db")), table="fz",
                      skip_compact=True, device_batch=3)
        t = Table("fz", flags)
        recs = []
        for i in range(4000):
            rec = {
                "host": f"h{rng.randint(0, 7)}",
                "status": str(rng.choice([200, 404, 500])),
                "ping": rng.randint(-50, 400),
                "weight": rng.choice([1, 2, 10]),
                "uid": rng.randint(0, 300),
                "time": 1_700_000_000 + rng.randint(0, 500_000),
                "tags": [f"t{rng.randint(0, 4)}" for _ in
                         range(rng.randint(0, 3))] or ["none"],
            }
            if rng.random() < 0.08:
                del rec["ping"]          # missing agg values
            if rng.random() < 0.05:
                del rec["host"]          # missing group values
            recs.append(flatten_record(rec))
        for s in range(0, len(recs), 1500):
            t.ingest_records(recs[s: s + 1500])
            digest_records(t)
        return t, flags
    finally:
        dg.CHUNK_SIZE = old


def _random_params(rng):
    groups = tuple(rng.sample(["host", "status", "uid"],
                              rng.randint(0, 2)))
    aggs = []
    if rng.random() < 0.8:
        aggs.append(AggDef("ping", rng.choice(["avg", "hist"])))
    filters = []
    if rng.random() < 0.6:
        kind = rng.choice(["int", "str", "set"])
        if kind == "int":
            filters.append(FilterDef(
                "ping", rng.choice(["gt", "lt", "neq"]),
                str(rng.randint(-20, 300)), "int"))
        elif kind == "str":
            filters.append(FilterDef(
                "status", rng.choice(["eq", "neq"]),
                rng.choice(["200", "404", "500", "418"]), "str"))
        else:
            filters.append(FilterDef(
                "tags", rng.choice(["in", "nin"]),
                rng.choice(["t0", "t3", "none"]), "set"))
    kw = {}
    if rng.random() < 0.3:
        kw["time_bucket"] = rng.choice([3600, 86400])
        kw["time_col"] = "time"
    if rng.random() < 0.3:
        kw["weight_col"] = "weight"
    return QueryParams(groups=groups, aggs=tuple(aggs),
                       filters=tuple(filters), **kw)


def _snap(qr, time_mode):
    if time_mode:
        out = {}
        for tb, rs in qr.time_results.items():
            for k, r in rs.items():
                h = r.hists.get("ping")
                out[(tb, k)] = (r.count, r.samples,
                                None if h is None else
                                (h.count, round(h.avg, 6)))
        return out
    out = {}
    for k, r in qr.results.items():
        h = r.hists.get("ping")
        out[k] = (r.count, r.samples,
                  None if h is None else (h.count, round(h.avg, 6)))
    return out


def test_fuzz_parity_sweep(fuzz_table):
    t, flags = fuzz_table
    rng = random.Random(7)
    for trial in range(25):
        params = _random_params(rng)
        e = run_query(t, params, flags)
        o = run_oracle(t, params, flags)
        es = _snap(e, params.time_bucket > 0)
        os_ = _snap(o, params.time_bucket > 0)
        assert es == os_, (
            f"trial {trial} diverged for {params}: "
            f"{set(es) ^ set(os_) or 'value mismatch'}")
        assert e.matched_count == o.matched_count, (trial, params)


def test_fuzz_parity_sharded(fuzz_table):
    """Same sweep through the 8-device mesh (shard_map scan + hash
    shuffle): results must match the single-device engine exactly."""
    import jax

    assert len(jax.devices()) >= 8
    t, flags = fuzz_table
    sflags = Flags(**{**vars(flags), "data_shards": 8, "device_batch": 8})
    rng = random.Random(11)
    for trial in range(8):
        params = _random_params(rng)
        single = run_query(t, params, flags)
        sharded = run_query(t, params, sflags)
        tm = params.time_bucket > 0
        assert _snap(single, tm) == _snap(sharded, tm), (trial, params)
        assert single.matched_count == sharded.matched_count, (trial,
                                                               params)
