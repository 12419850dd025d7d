"""Multi-host mesh: N processes, one query, one all-to-all shuffle.

The reference's multi-node test model is N directories + N binaries on
one box (scripts/basic_aggregation_test.sh).  Here the analog is
stronger: two OS processes join ONE jax.distributed mesh (4 virtual CPU
devices each, gloo TCP collectives), scan a shared table, and the
hash-partitioned shuffle (parallel/mesh.py) merges their partial group
tables — process 0 prints the merged result, process 1 prints nothing.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _build_table(d: str) -> None:
    import numpy as np

    from sybil_tpu.config import Flags
    from sybil_tpu.table import Table

    rng = np.random.default_rng(7)
    n = 3000
    hosts = ["a.com", "b.com", "c.com", "d.com", "e.com"]
    hi = rng.integers(0, 5, n)
    t = Table("mh", Flags(dir=d, table="mh", skip_compact=True))
    t.ingest_columns(
        ints={"ping": rng.integers(0, 100, n).astype(np.int64),
              "weight": rng.choice([1, 10], n).astype(np.int64)},
        strs={"host": [hosts[i] for i in hi]})


def _query_argv(d: str, extra: list[str]) -> list[str]:
    return [sys.executable, "-m", "sybil_tpu", "query", "-dir", d,
            "-table", "mh", "-group", "host", "-int", "ping", "-op", "avg",
            "-json"] + extra


def _json_payload(out: str) -> str:
    """Filter runtime chatter (gloo connection lines) and return the
    result payload: the LAST line that parses as JSON.  The CLI prints
    the -json result as one line; anything before it is noise."""
    lines = [ln for ln in out.splitlines()
             if ln.strip() and "[Gloo]" not in ln
             and "connected to" not in ln]
    for ln in reversed(lines):
        if ln.lstrip().startswith(("[", "{")):
            try:
                json.loads(ln)
                return ln
            except json.JSONDecodeError:
                continue
    return "\n".join(lines)


def _run_nodes(d: str, nproc: int, shards: int):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO
    procs = []
    for pid in range(nproc):
        argv = _query_argv(d, [
            "-data-shards", str(shards),
            "-dist-coordinator", f"localhost:{port}",
            "-dist-pid", str(pid), "-dist-nproc", str(nproc)])
        procs.append(subprocess.Popen(
            argv, env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"node failed:\n{err[-3000:]}"
        outs.append(_json_payload(out))
    return outs


def test_two_process_mesh_matches_single(tmp_path):
    d = str(tmp_path / "db")
    _build_table(d)

    # single-process reference (plain subprocess, no mesh)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    single = subprocess.run(
        _query_argv(d, []), env=env, cwd=REPO, capture_output=True,
        text=True, timeout=600)
    assert single.returncode == 0, single.stderr[-3000:]
    want = {r["host"]: r for r in json.loads(single.stdout)}

    out0, out1 = _run_nodes(d, nproc=2, shards=8)
    assert out1.strip() == "", "only process 0 may print"
    got = {r["host"]: r for r in json.loads(out0)}

    assert set(got) == set(want)
    for host, w in want.items():
        g = got[host]
        assert g["Count"] == w["Count"], host
        assert abs(g["ping"] - w["ping"]) < 1e-9, host


def test_two_process_mesh_hist_filter(tmp_path):
    """Histogram lanes + str-filter bitsets ride the shuffle payload."""
    d = str(tmp_path / "db")
    _build_table(d)

    extra = ["-op", "hist", "-str-filter", "host:neq:a.com"]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    single = subprocess.run(
        _query_argv(d, extra), env=env, cwd=REPO, capture_output=True,
        text=True, timeout=600)
    assert single.returncode == 0, single.stderr[-3000:]
    want = {r["host"]: r for r in json.loads(single.stdout)}
    assert "a.com" not in want and len(want) == 4

    port = _free_port()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = []
    for pid in range(2):
        argv = _query_argv(d, extra + [
            "-data-shards", "8",
            "-dist-coordinator", f"localhost:{port}",
            "-dist-pid", str(pid), "-dist-nproc", "2"])
        procs.append(subprocess.Popen(
            argv, env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    out0 = None
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"node failed:\n{err[-3000:]}"
        if pid == 0:
            out0 = _json_payload(out)
    got = {r["host"]: r for r in json.loads(out0)}
    assert set(got) == set(want)
    for host, w in want.items():
        g = got[host]
        assert g["Count"] == w["Count"]
        assert g["ping"]["percentiles"] == w["ping"]["percentiles"], host
        assert g["ping"]["buckets"] == w["ping"]["buckets"], host
        assert abs(g["ping"]["avg"] - w["ping"]["avg"]) < 1e-9
        assert abs(g["ping"]["stddev"] - w["ping"]["stddev"]) < 1e-9


def test_four_process_mesh_matches_single(tmp_path):
    """Four OS processes x 2 virtual devices = 8 shards, one query: the
    hash-partitioned shuffle must merge identically to single-process
    (wider than the 2-process case: more all-to-all lanes, smaller
    per-process spans)."""
    d = str(tmp_path / "db")
    _build_table(d)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    single = subprocess.run(
        _query_argv(d, []), env=env, cwd=REPO, capture_output=True,
        text=True, timeout=600)
    assert single.returncode == 0, single.stderr[-3000:]
    want = {r["host"]: r for r in json.loads(single.stdout)}

    port = _free_port()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = []
    for pid in range(4):
        argv = _query_argv(d, [
            "-data-shards", "8",
            "-dist-coordinator", f"localhost:{port}",
            "-dist-pid", str(pid), "-dist-nproc", "4"])
        procs.append(subprocess.Popen(
            argv, env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    out0 = None
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"node {pid} failed:\n{err[-3000:]}"
        if pid == 0:
            out0 = _json_payload(out)
    got = {r["host"]: r for r in json.loads(out0)}
    assert set(got) == set(want)
    for host, w in want.items():
        assert got[host]["Count"] == w["Count"], host
        assert abs(got[host]["ping"] - w["ping"]) < 1e-9, host
