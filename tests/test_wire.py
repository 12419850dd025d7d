"""Wire-format pinning tests, modeled on the reference's golden-file
suite (src/lib/decoding_test.go:20-84, testdata/TestDecodeGoldenFiles):
the node-protocol payloads (flags broadcast + partial-result gather)
must stay decodable across versions.  Golden fixtures live in
tests/testdata/; regenerate by deleting them and re-running with
SYBIL_UPDATE_GOLDEN=1."""

import json
import os

import numpy as np
import pytest

from sybil_tpu.config import Flags
from sybil_tpu.parallel import wire
from sybil_tpu.query.engine import QueryResults
from sybil_tpu.query.hist import BasicHist
from sybil_tpu.query.hll import HLL
from sybil_tpu.query.spec import QueryParams, Result

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")


def _sample_results() -> QueryResults:
    qr = QueryResults()
    for i, key in enumerate(["alpha\t", "beta\t"]):
        r = Result()
        r.group_key = key
        r.count = 100 * (i + 1)
        r.samples = 10 * (i + 1)
        h = BasicHist(0, 200, 0, percentile_mode=True)
        h.load_device_partial(r.count, 60 * r.count,
                              np.zeros(len(h.values), dtype=np.int64),
                              outlier_values=[500 + i], vmin=1, vmax=180)
        r.hists["v"] = h
        hll = HLL()
        hll.add(b"x1")
        hll.add(b"x2")
        r.distinct = hll
        qr.results[key] = r
    cum = Result()
    cum.group_key = "TOTAL"
    for r in qr.results.values():
        cum.combine(r)
    qr.cumulative = cum
    qr.matched_count = 300
    return qr


def _golden(name: str, payload: str) -> str:
    path = os.path.join(TESTDATA, name)
    if not os.path.exists(path) or os.environ.get("SYBIL_UPDATE_GOLDEN"):
        os.makedirs(TESTDATA, exist_ok=True)
        with open(path, "w") as f:
            f.write(payload)
    with open(path) as f:
        return f.read()


def test_flags_wire_roundtrip_and_golden():
    flags = Flags(dir="/data/db", table="uptime", read_log=True,
                  cache_queries=True)
    payload = flags.encode()
    assert Flags.decode(payload) == flags
    golden = _golden("flags.golden.json", payload)
    # decoding the pinned payload must keep working and agree field-wise
    assert Flags.decode(golden) == flags


def test_flags_merge_decoded_keeps_local_nonzero_flags():
    broadcast = Flags(dir="/data/db", table="t").encode()
    local = Flags(encode_results=True)
    merged = local.merge_decoded(broadcast)
    assert merged.table == "t" and merged.dir == "/data/db"
    assert merged.encode_results  # zero-valued sender field didn't clobber


def test_results_wire_roundtrip_and_golden():
    qr = _sample_results()
    d = wire.results_to_wire(qr, QueryParams(groups=("g",)))
    payload = json.dumps(d, sort_keys=True)
    golden = _golden("node_results.golden.json", payload)

    back = wire.results_from_wire(json.loads(golden))
    assert set(back.results) == set(qr.results)
    for k, r in qr.results.items():
        got = back.results[k]
        assert got.count == r.count
        assert got.samples == r.samples
        assert got.hists["v"].mean() == pytest.approx(r.hists["v"].mean())
        assert got.hists["v"].outliers == r.hists["v"].outliers
        assert got.distinct.cardinality() == r.distinct.cardinality()
    assert back.cumulative.count == qr.cumulative.count
    assert back.matched_count == qr.matched_count
