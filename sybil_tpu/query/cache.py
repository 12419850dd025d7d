"""Per-block-group query result cache.

The reference caches per-block partial results keyed by
md5(params minus filters trivially true for the whole block), stored
inside each block dir, and only for FULL (immutable) blocks
(src/lib/query_cache.go:69-131,174-242, only-full-blocks rule :185) —
so a steady stream of ingested blocks never invalidates the cached work
of the old immutable ones, and time-sliding dashboard queries still hit
on interior blocks.

This engine scans batches of blocks per device dispatch, so the cache
unit is a STABLE GROUP of 16 consecutive full blocks in name order (16
is the reference's combine granularity, CHUNKS_BEFORE_GC table_io.go:17).
Block names are monotonic (creation-time-prefixed), so newly digested
blocks always append new groups and never disturb existing ones; partial
blocks and the trailing <16 remainder are scanned uncached per query.
Cached entries hold the accumulator's raw partial rows (counts, agg
sums, hist bucket arrays, HLL registers) as gzipped JSON under
db/T/cache/q_<md5>.json.gz.

The time-sliding trick is preserved per group: filters trivially true
over every block in the group are dropped from that group's key
(GetCacheRelevantFilters semantics, query_cache.go:69-131).
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import json
import os

import numpy as np

from .. import constants
from ..constants import CHUNK_SIZE
from ..debug import debug
from ..table import Table
from .spec import QueryParams

GROUP_SIZE = 16  # blocks per cache unit (table_io.go:17)

# per-process counters (observability + tests)
HITS = 0
MISSES = 0


def relevant_filters(params: QueryParams, table: Table,
                     block_infos: dict) -> list:
    """Filters that could exclude rows in the given blocks; int filters
    trivially true over every block's [min,max] are dropped from the key
    (query_cache.go:69-131)."""
    keep = []
    schema = table.schema
    for f in params.filters:
        if f.kind != "int" or f.op not in ("gt", "lt"):
            keep.append(f)
            continue
        v = int(f.value)
        trivial = True
        for info in block_infos.values():
            kid = schema.key_table.get(f.col)
            ii = info.int_info.get(kid) if kid is not None else None
            if ii is None:
                trivial = False
                break
            if f.op == "gt" and not (ii.min > v):
                trivial = False
                break
            if f.op == "lt" and not (ii.max < v):
                trivial = False
                break
        if not trivial:
            keep.append(f)
    return keep


def stable_groups(block_dirs: list[str], infos: dict):
    """-> (groups, rest): complete 16-block groups of FULL blocks in name
    order (cacheable), plus every other scanned dir (partial blocks and
    the trailing remainder — always re-scanned, query_cache.go:185)."""
    full = sorted(d for d in block_dirs
                  if d in infos and infos[d].num_records >= CHUNK_SIZE)
    fullset = set(full)
    groups = [full[i: i + GROUP_SIZE]
              for i in range(0, len(full) - GROUP_SIZE + 1, GROUP_SIZE)]
    grouped = {d for g in groups for d in g}
    rest = [d for d in block_dirs if d not in grouped]
    return groups, rest


def group_cache_key(params: QueryParams, table: Table, gdirs: list[str],
                    infos: dict) -> str:
    import dataclasses
    ginfos = {d: infos[d] for d in gdirs if d in infos}
    pruned = dataclasses.replace(
        params,
        filters=tuple(relevant_filters(params, table, ginfos)),
        # result-shaping params don't affect the partial rows
        order_by="", order_asc=False, prune_by="", limit=0,
        num_distinct=-1)
    sig = []
    for bdir in gdirs:
        try:
            mtime = os.stat(os.path.join(bdir, "info.json")).st_mtime_ns
        except FileNotFoundError:
            mtime = -1
        sig.append((os.path.basename(bdir), mtime))
    payload = pruned.cache_key() + json.dumps(sig)
    return hashlib.md5(payload.encode()).hexdigest()


def _cache_path(table: Table, key: str) -> str:
    return os.path.join(table.dir, constants.CACHE_DIR, f"q_{key}.json.gz")


def _rows_to_wire(acc) -> dict:
    if hasattr(acc, "_materialize"):
        acc._materialize()   # fold any parked columnar batches first
    rows = []
    for kt, row in acc.rows.items():
        aggs = []
        for cur in row["aggs"]:
            if cur is None:
                aggs.append(None)
                continue
            aggs.append({
                "c": cur["count"], "w": cur["wv"],
                "mn": cur["min"], "mx": cur["max"],
                "h": (None if cur["hist"] is None
                      else np.asarray(cur["hist"]).tolist()),
                "o": list(cur["outliers"]),
                **({"td": list(cur["td"].centroids())}
                   if cur.get("td") is not None else {}),
            })
        d = None
        if row["distinct"] is not None:
            d = base64.b64encode(
                row["distinct"].registers.tobytes()).decode()
        rows.append([list(kt), row["count"], row["samples"], aggs, d])
    return {"v": 1, "matched": acc.matched_count, "batches": acc.batches,
            "rows": rows}


def _rows_from_wire(data: dict, bound):
    from .engine import _Accumulator
    from .hll import HLL
    acc = _Accumulator(bound)
    acc.matched_count = int(data.get("matched", 0))
    acc.batches = int(data.get("batches", 1))
    for kt_l, count, samples, aggs_w, d64 in data["rows"]:
        aggs = []
        for cur in aggs_w:
            if cur is None:
                aggs.append(None)
                continue
            a = {
                "count": cur["c"], "wv": cur["w"],
                "min": cur["mn"], "max": cur["mx"],
                "hist": (None if cur["h"] is None
                         else np.asarray(cur["h"], dtype=np.int64)),
                "outliers": list(cur["o"]),
            }
            if cur.get("td") is not None:
                from .hist import TDigest
                td = TDigest()
                td.add_many(cur["td"][0], cur["td"][1])
                a["td"] = td
            aggs.append(a)
        distinct = None
        if d64 is not None:
            distinct = HLL()
            distinct.registers = np.frombuffer(
                base64.b64decode(d64), dtype=np.uint8).copy()
        acc.rows[tuple(kt_l)] = {"count": count, "samples": samples,
                                 "aggs": aggs, "distinct": distinct}
    return acc


def load_group_rows(table: Table, key: str, bound):
    global HITS, MISSES
    path = _cache_path(table, key)
    try:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        if data.get("v") != 1:
            MISSES += 1
            return None
        HITS += 1
        return _rows_from_wire(data, bound)
    except (OSError, ValueError, KeyError):
        MISSES += 1
        return None


def save_group_rows(table: Table, key: str, acc) -> None:
    os.makedirs(os.path.join(table.dir, constants.CACHE_DIR), exist_ok=True)
    path = _cache_path(table, key)
    tmp = path + f".tmp{os.getpid()}"
    try:
        # level 1: cache writes sit on the query's critical path; the
        # size difference vs default level is a few percent here
        with gzip.open(tmp, "wt", compresslevel=1) as f:
            json.dump(_rows_to_wire(acc), f)
        os.rename(tmp, path)
        debug("query cache write", key)
    except OSError as e:
        debug("query cache write failed", e)
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass
