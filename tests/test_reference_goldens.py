"""Parity pinned to the reference's OWN test expectations.

Every assertion below is a hand-port of a concrete expectation from
/root/reference/src/lib/aggregate_test.go or filter_test.go — the Go
binary's unit tests — applied to this engine through run_query, with NO
oracle in the loop.  The data protocol is the Go helpers_test.go one:
CHUNK_SIZE=100, blockCount=3 (300 records), age = rand(20)+10 in
[10, 29], age_str = str(age), age_set = [age_str]
(helpers_test.go:24-62).  Go's math/rand sequence is not reproducible
here, but none of the ported expectations depend on the sequence — they
are exact structural facts (group count 20, `neq 20` -> 19 groups,
`re ^2` -> 10 groups, mean(group "k") == k, percentile walks vs the
sorted sample array) that hold for any draw that covers all 20 ages,
which 300 uniform draws do.
"""

import random

import pytest

from sybil_tpu.config import Flags
from sybil_tpu.digest import digest_records
from sybil_tpu.ingest import flatten_record
from sybil_tpu.query.engine import run_query
from sybil_tpu.query.spec import AggDef, FilterDef, QueryParams
from sybil_tpu.table import Table


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    """addRecords + saveAndReloadTable (helpers_test.go:50-91):
    3 blocks x CHUNK_SIZE=100 of {id, age in [10,29], age_str,
    age_set=[age_str]}."""
    import sybil_tpu.digest as dg
    flags = Flags(dir=str(tmp_path_factory.mktemp("db")), table="golden",
                  skip_compact=True, device_batch=3)
    t = Table("golden", flags)
    rng = random.Random(1234)
    ages = []
    recs = []
    for i in range(300):
        age = rng.randrange(20) + 10
        ages.append(age)
        recs.append(flatten_record({
            "id": i, "age": age, "age_str": str(age),
            "age_set": [str(age)]}))
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 100
    try:
        t.ingest_records(recs)
        digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    t.ages = sorted(ages)
    t.avg_age = sum(ages) / len(ages)
    return t


def q(table, params):
    return run_query(table, params, table.flags)


def test_group_by_reassembles_keys(table):
    """aggregate_test.go:33-56 (TestTableLoadRecords): group by age_str,
    avg(age) -> exactly 20 groups and mean(group "k") == k."""
    qr = q(table, QueryParams(groups=("age_str",),
                              aggs=(AggDef("age", "avg"),)))
    assert len(qr.results) == 20
    for k, v in qr.results.items():
        kval = int(k.rstrip("\t"))
        assert abs(kval - v.hists["age"].mean()) <= 0.1, k


def test_averaging(table):
    """aggregate_test.go:59-98 (TestAveraging): ungrouped avg(age)
    equals the true mean of the inserted ages."""
    qr = q(table, QueryParams(aggs=(AggDef("age", "avg"),)))
    for _, v in qr.results.items():
        assert abs(table.avg_age - v.hists["age"].mean()) <= 0.1


def test_histograms_per_group_and_global(table):
    """aggregate_test.go:100-188 (TestHistograms): per group "k" the
    25th/50th/75th percentiles all equal k (single-valued hists look
    uniform); globally every percentile matches the sorted sample array
    within 1; results come back in descending Count order."""
    qr = q(table, QueryParams(groups=("age_str",),
                              aggs=(AggDef("age", "hist"),)))
    for k, v in qr.results.items():
        kval = int(k.rstrip("\t"))
        pct = v.hists["age"].get_percentiles()
        assert int(pct[25]) == kval, k      # :145-147
        assert int(pct[50]) == kval, k      # :148-150
        assert int(pct[75]) == kval, k      # :151-153

    qr = q(table, QueryParams(aggs=(AggDef("age", "hist"),)))
    ages = table.ages
    prev_count = float("inf")
    for v in qr.sorted:
        assert v.count <= prev_count        # :168-170 count order
        prev_count = v.count
        pct = v.hists["age"].get_percentiles()
        for p, got in enumerate(pct):       # :175-182 percentile walk
            want = ages[int(p / 100 * len(ages))]
            assert abs(got - want) <= 1, (p, got, want)


def test_time_series_buckets(table):
    """aggregate_test.go:211-280 (TestTimeSeries): hourly rollup over a
    seconds-valued time column returns non-empty buckets whose per-group
    hists keep percentiles[25/50/75] == group key."""
    import sybil_tpu.digest as dg
    flags = Flags(dir=table.flags.dir + "_ts", table="ts",
                  skip_compact=True, device_batch=3)
    t = Table("ts", flags)
    rng = random.Random(99)
    recs = []
    for i in range(300):
        age = rng.randrange(20) + 10
        td = rng.randrange(60)            # time.Now().Add(-rand h).Second()
        recs.append(flatten_record({
            "id": i, "time": td, "age": age, "age_str": str(age)}))
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 100
    try:
        t.ingest_records(recs)
        digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    qr = run_query(t, QueryParams(groups=("age_str",),
                                  aggs=(AggDef("age", "hist"),),
                                  time_bucket=3600), flags)
    assert len(qr.time_results) > 0         # :253-255
    for tb, groups in qr.time_results.items():
        assert len(groups) > 0              # :258-260
        for k, v in groups.items():
            kval = int(k.rstrip("\t"))
            pct = v.hists["age"].get_percentiles()
            assert int(pct[25]) == kval     # :267-269
            assert int(pct[50]) == kval
            assert int(pct[75]) == kval


def test_order_by_desc_then_asc(table):
    """aggregate_test.go:282-413 (TestOrderBy/TestOrderByDesc): sorting
    by the age agg yields monotone means over Sorted."""
    qr = q(table, QueryParams(groups=("age_str",),
                              aggs=(AggDef("age", "avg"),),
                              order_by="age", order_asc=False))
    assert len(qr.results) > 0
    prev = float("inf")
    for v in qr.sorted:                     # :341-352 non-increasing
        m = v.hists["age"].mean()
        assert m <= prev
        prev = m
    qr = q(table, QueryParams(groups=("age_str",),
                              aggs=(AggDef("age", "avg"),),
                              order_by="age", order_asc=True))
    prev = -float("inf")
    for v in qr.sorted:                     # :395-406 non-decreasing
        m = v.hists["age"].mean()
        assert m >= prev
        prev = m


# --------------------------------------------------------------------------
# filter_test.go:9-310 (TestFilters): the nine filter ops on the same
# {age, age_str, age_set} table.
# --------------------------------------------------------------------------

def test_int_eq(table):
    """filter_test.go:128-155 testIntEq: age == 20 -> mean exactly 20."""
    qr = q(table, QueryParams(aggs=(AggDef("age", "avg"),),
                              filters=(FilterDef("age", "eq", "20", "int"),)))
    assert len(qr.results) > 0
    for v in qr.results.values():
        assert abs(20 - v.hists["age"].mean()) <= 0.1


def test_int_neq(table):
    """filter_test.go:94-126 testIntNeq: age != 20 grouped by age ->
    exactly 19 groups, none with mean 20."""
    qr = q(table, QueryParams(groups=("age",),
                              aggs=(AggDef("age", "avg"),),
                              filters=(FilterDef("age", "neq", "20",
                                                 "int"),)))
    assert len(qr.results) == 19            # :108-110 rand(20) ages
    for v in qr.results.values():
        assert abs(20 - v.hists["age"].mean()) >= 0.1


def test_int_lt(table):
    """filter_test.go:42-66 testIntLt: age < 20 -> every mean <= 20."""
    qr = q(table, QueryParams(aggs=(AggDef("age", "avg"),),
                              filters=(FilterDef("age", "lt", "20",
                                                 "int"),)))
    assert len(qr.results) > 0
    for v in qr.results.values():
        assert abs(v.hists["age"].mean()) <= 20


def test_int_gt(table):
    """filter_test.go:68-92 testIntGt: age > 20 -> every mean >= 20."""
    qr = q(table, QueryParams(aggs=(AggDef("age", "avg"),),
                              filters=(FilterDef("age", "gt", "20",
                                                 "int"),)))
    assert len(qr.results) > 0
    for v in qr.results.values():
        assert abs(v.hists["age"].mean()) >= 20


def test_str_re_literal(table):
    """filter_test.go:157-183 testStrEq: age_str re "20" -> mean 20."""
    qr = q(table, QueryParams(aggs=(AggDef("age", "avg"),),
                              groups=("age",),
                              filters=(FilterDef("age_str", "re", "20",
                                                 "str"),)))
    assert len(qr.results) > 0
    for v in qr.results.values():
        assert abs(20 - v.hists["age"].mean()) <= 0.1


def test_str_nre(table):
    """filter_test.go:185-212 testStrNeq: age_str nre "20" -> no group
    has mean 20."""
    qr = q(table, QueryParams(aggs=(AggDef("age", "avg"),),
                              filters=(FilterDef("age_str", "nre", "20",
                                                 "str"),)))
    assert len(qr.results) > 0
    for v in qr.results.values():
        assert abs(20 - v.hists["age"].mean()) >= 0.1


def test_str_re_prefix(table):
    """filter_test.go:214-243 testStrRe: age_str re "^2" grouped by age
    -> exactly 10 groups (ages 20..29), every mean >= 20."""
    qr = q(table, QueryParams(aggs=(AggDef("age", "avg"),),
                              groups=("age",),
                              filters=(FilterDef("age_str", "re", "^2",
                                                 "str"),)))
    assert len(qr.results) == 10            # :232-234
    for v in qr.results.values():
        assert v.hists["age"].mean() - 20 >= 0


def test_set_in(table):
    """filter_test.go:245-283 testSetIn: age_set in "20" grouped by age
    -> exactly one group, mean >= 20."""
    qr = q(table, QueryParams(aggs=(AggDef("age", "avg"),),
                              groups=("age",),
                              filters=(FilterDef("age_set", "in", "20",
                                                 "set"),)))
    assert len(qr.results) == 1             # :264-266
    for v in qr.results.values():
        assert v.hists["age"].mean() - 20 >= 0


def test_set_nin(table):
    """filter_test.go:285-310 testSetNin: age_set nin "20" grouped by
    age -> exactly 19 groups."""
    qr = q(table, QueryParams(aggs=(AggDef("age", "avg"),),
                              groups=("age",),
                              filters=(FilterDef("age_set", "nin", "20",
                                                 "set"),)))
    assert len(qr.results) == 19            # :302-304


def test_big_int_columns(tmp_path):
    """column_store_test.go:143-208 (TestBigIntColumns): values above
    2^50 survive WAL ingest, -read-log scanning, digestion, and block
    decode without truncation."""
    import sybil_tpu.digest as dg
    from sybil_tpu.digest import digest_records

    flags = Flags(dir=str(tmp_path / "db"), table="big",
                  skip_compact=True, device_batch=3)
    t = Table("big", flags)
    rng = random.Random(5)
    min_val = 1 << 50
    recs = [flatten_record({"id": i, "time": min_val + rng.randrange(1 << 20)})
            for i in range(300)]
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 100
    try:
        t.ingest_records(recs)
        # row store reads back every record pre-digest (:168-170)
        rl_flags = Flags(**{**vars(flags), "read_log": True})
        qr = run_query(t, QueryParams(groups=("id",)), rl_flags)
        assert sum(r.count for r in qr.results.values()) == 300
        digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    # every decoded value still >= 2^50 (:189-199, via samples)
    qr = run_query(t, QueryParams(samples=True, limit=1000), flags)
    assert len(qr.samples) > 0
    for row in qr.samples:
        assert row["time"] >= min_val, row
    # and the aggregate path carries the magnitude exactly
    qr = run_query(t, QueryParams(aggs=(AggDef("time", "avg"),)), flags)
    for v in qr.results.values():
        assert v.hists["time"].mean() >= min_val


def test_sets_alignment(tmp_path):
    """record_fields_test.go:7-80 (TestSets): per-record alignment of
    int / str / set fields survives save + reload — for every sampled
    row, id_str == str(id_int) == id_set[0], and age_str stays distinct
    from id_str."""
    import sybil_tpu.digest as dg
    from sybil_tpu.digest import digest_records

    flags = Flags(dir=str(tmp_path / "db"), table="sets",
                  skip_compact=True, device_batch=3)
    t = Table("sets", flags)
    rng = random.Random(3)
    min_count = 300
    recs = []
    for i in range(300):
        age = rng.randrange(20) + min_count
        recs.append(flatten_record({
            "id_int": i, "id_set": [str(i), str(i)], "id_str": str(i),
            "age": age, "age_str": str(age)}))
    old = dg.CHUNK_SIZE
    dg.CHUNK_SIZE = 100
    try:
        t.ingest_records(recs)
        digest_records(t)
    finally:
        dg.CHUNK_SIZE = old
    qr = run_query(t, QueryParams(samples=True, limit=1000), flags)
    assert len(qr.samples) > 0
    for row in qr.samples:
        ival = row["id_int"]                      # :35-38
        sval = row["id_str"]                      # :43-46
        setval = row["id_set"]                    # :39-42
        assert sval == str(ival), row             # :55-57
        assert setval and setval[0] == sval, row  # :59-61
        assert row["age_str"] != sval, row        # :51-53
