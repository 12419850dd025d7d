"""Sharded scan over the virtual 8-device CPU mesh vs single-device."""

import numpy as np
import pytest

from sybil_tpu.config import Flags
from sybil_tpu.query.engine import run_query
from sybil_tpu.query.spec import AggDef, FilterDef, QueryParams
from sybil_tpu.table import Table

from test_query_engine import make_table


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    flags = Flags(dir=str(tmp_path_factory.mktemp("db")), table="uptime",
                  device_batch=8)
    return make_table(flags, n=3000, chunk=256)


def both(table, params):
    import jax
    assert len(jax.devices()) >= 8, "conftest must force 8 cpu devices"
    single = run_query(table, params, table.flags)
    sharded_flags = Flags(**{**vars(table.flags), "data_shards": 8})
    sharded = run_query(table, params, sharded_flags)
    return single, sharded


def assert_same(single, sharded, agg_cols=()):
    assert set(single.results) == set(sharded.results)
    for k, s in single.results.items():
        d = sharded.results[k]
        assert s.count == d.count, k
        assert s.samples == d.samples, k
        for col in agg_cols:
            sh, dh = s.hists.get(col), d.hists.get(col)
            assert (sh is None) == (dh is None)
            if sh is None:
                continue
            assert sh.total_count() == dh.total_count()
            assert abs(sh.mean() - dh.mean()) < 1e-9 * max(1, abs(sh.mean()))
            if sh.percentile_mode:
                np.testing.assert_array_equal(sh.values, dh.values)
                assert sorted(sh.outliers) == sorted(dh.outliers)


def test_sharded_group_avg(table):
    s, d = both(table, QueryParams(groups=("host",),
                                   aggs=(AggDef("ping", "avg"),)))
    assert_same(s, d, ["ping"])


def test_sharded_filters_weight(table):
    s, d = both(table, QueryParams(
        groups=("host", "status"), weight_col="weight",
        filters=(FilterDef("ping", "gt", "40", "int"),
                 FilterDef("host", "re", r"\.com", "str"))))
    assert_same(s, d)


def test_sharded_hist(table):
    s, d = both(table, QueryParams(groups=("status",),
                                   aggs=(AggDef("ping", "hist"),)))
    assert_same(s, d, ["ping"])


def test_sharded_time_rollup(table):
    s, d = both(table, QueryParams(groups=("host",), time_bucket=604800))
    assert set(s.time_results) == set(d.time_results)
    for tb in s.time_results:
        assert {k: r.count for k, r in s.time_results[tb].items()} == \
               {k: r.count for k, r in d.time_results[tb].items()}


def test_sharded_distinct(table):
    s, d = both(table, QueryParams(groups=("host",), distincts=("status",)))
    for k in s.results:
        assert s.results[k].distinct.cardinality() == \
            d.results[k].distinct.cardinality()
