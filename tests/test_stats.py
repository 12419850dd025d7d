"""ICC (analysis of variance) tests — reference src/lib/stats.go."""

import numpy as np

from sybil_tpu.config import Flags
from sybil_tpu.digest import digest_records
from sybil_tpu.ingest import flatten_record
from sybil_tpu.query.engine import run_query
from sybil_tpu.query.spec import AggDef, QueryParams
from sybil_tpu.query.stats import calculate_icc
from sybil_tpu.table import Table


def _build(tmp_path, rows):
    flags = Flags(dir=str(tmp_path / "db"), table="icc", skip_compact=True)
    t = Table("icc", flags)
    t.ingest_records([flatten_record(r) for r in rows])
    digest_records(t)
    return t, flags


def _icc(t, flags):
    params = QueryParams(groups=("g",), aggs=(AggDef("v", "hist"),))
    qr = run_query(t, params, flags)
    return calculate_icc(qr, params)["v"]


def test_icc_separated_groups(tmp_path):
    # group means far apart relative to within-group spread -> ICC near 1
    rng = np.random.default_rng(7)
    rows = []
    for g, mu in (("a", 100), ("b", 500), ("c", 900)):
        for _ in range(200):
            rows.append({"g": g, "v": int(rng.normal(mu, 5))})
    t, flags = _build(tmp_path, rows)
    icc = _icc(t, flags)
    assert 0.0 <= icc <= 1.0


def test_icc_single_group_is_one(tmp_path):
    rows = [{"g": "only", "v": i % 50} for i in range(100)]
    t, flags = _build(tmp_path, rows)
    assert _icc(t, flags) == 1.0


def test_icc_identical_groups_low(tmp_path):
    # identical distributions in every group -> between-variance ~0
    rows = []
    for g in ("a", "b", "c", "d"):
        rows.extend({"g": g, "v": i % 100} for i in range(250))
    t, flags = _build(tmp_path, rows)
    icc = _icc(t, flags)
    assert icc < 0.5
