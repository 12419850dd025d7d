"""HBM residency cache: LRU eviction under an overflow working set.

The MAX_MEM analog (/root/reference/src/lib/table_query.go:15,282-304:
the reference forces an OS memory release above 1GB and keeps serving).
Here a table whose decoded columns exceed the residency budget must
keep answering queries exactly, evicting LRU entries instead of
failing, and the cache must never exceed its budget."""

import numpy as np

from sybil_tpu.config import Flags
from sybil_tpu.digest import digest_records
from sybil_tpu.ingest import flatten_record
from sybil_tpu.ops import residency
from sybil_tpu.query.engine import run_query
from sybil_tpu.query.spec import AggDef, QueryParams
from sybil_tpu.table import Table


def _build(tmp_path, n=4096):
    import sybil_tpu.digest as dg
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 256
    try:
        flags = Flags(dir=str(tmp_path / "db"), table="ov",
                      skip_compact=True)
        t = Table("ov", flags)
        rng = np.random.default_rng(5)
        t.ingest_records([flatten_record(
            {"g": f"k{i % 7}", "v": int(rng.integers(0, 100))})
            for i in range(n)])
        digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    return t, flags


def test_residency_overflow_evicts_and_stays_exact(tmp_path):
    t, flags = _build(tmp_path)
    params = QueryParams(groups=("g",), aggs=(AggDef("v", "avg"),))

    cache = residency.CACHE
    old_max, old_bytes = cache.max_bytes, cache.bytes
    cache.clear()
    try:
        # budget far below the table's decoded working set (each block
        # column decodes to [B, C] int64 + validity)
        cache.max_bytes = 64 << 10
        base = run_query(t, params, flags)
        assert cache.bytes <= cache.max_bytes, "budget exceeded"
        m0 = cache.misses

        again = run_query(t, params, flags)
        # overflow working set: later blocks evicted earlier ones, so
        # the second scan cannot be all-hit — it re-uploads evictees
        assert cache.misses > m0, "expected re-uploads after eviction"
        assert cache.bytes <= cache.max_bytes

        def snap(qr):
            return {k: (r.count, r.samples,
                        round(r.hists["v"].mean(), 9))
                    for k, r in qr.results.items()}
        assert snap(again) == snap(base)
        assert base.matched_count == 4096

        # sanity: with a real budget the same table becomes resident
        cache.clear()
        cache.max_bytes = 1 << 30
        run_query(t, params, flags)
        h0 = cache.hits
        run_query(t, params, flags)
        assert cache.hits > h0, "expected residency hits under budget"
    finally:
        cache.max_bytes = old_max
        cache.clear()
