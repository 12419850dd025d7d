"""Query result cache.

The reference caches per-block partial results keyed by
md5(params minus filters trivially true for the whole block)
(src/lib/query_cache.go:69-131), so time-sliding queries still hit on
interior blocks.  This engine scans batches of blocks in one device
dispatch, so the cache granularity is the whole immutable block set: the
key combines the params cache key with every scanned block's identity
(dir + mtime) — any digest/trim invalidates naturally.  The
time-sliding trick is preserved at the batch level by dropping filters
that are trivially true for ALL scanned blocks from the key
(GetCacheRelevantFilters semantics applied to the batch extent).

Entries are gzipped JSON wire results under db/T/cache/.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os

from .. import blocks as blockio, constants
from ..debug import debug
from ..table import Table
from .spec import QueryParams


def relevant_filters(params: QueryParams, table: Table,
                     block_infos: dict) -> list:
    """Filters that could exclude rows in the scanned blocks; int filters
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


def cache_key(params: QueryParams, table: Table, block_dirs: list[str],
              block_infos: dict) -> str:
    import dataclasses
    pruned = dataclasses.replace(
        params, filters=tuple(relevant_filters(params, table, block_infos)))
    blocks_sig = []
    for bdir in sorted(block_dirs):
        try:
            mtime = os.stat(os.path.join(bdir, "info.json")).st_mtime_ns
        except FileNotFoundError:
            mtime = -1
        blocks_sig.append((os.path.basename(bdir), mtime))
    payload = pruned.cache_key() + json.dumps(blocks_sig)
    return hashlib.md5(payload.encode()).hexdigest()


def _cache_path(table: Table, key: str) -> str:
    return os.path.join(table.dir, constants.CACHE_DIR, key + ".json.gz")


def load_cached_results(table: Table, key: str):
    from ..parallel import wire
    path = _cache_path(table, key)
    try:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        debug("query cache hit", key)
        return wire.results_from_wire(data)
    except (OSError, ValueError):
        return None


def save_cached_results(table: Table, key: str, qr, params: QueryParams):
    from ..parallel import wire
    os.makedirs(os.path.join(table.dir, constants.CACHE_DIR), exist_ok=True)
    path = _cache_path(table, key)
    tmp = path + ".tmp"
    try:
        with gzip.open(tmp, "wt") as f:
            json.dump(wire.results_to_wire(qr, params), f)
        os.rename(tmp, path)
        debug("query cache write", key)
    except OSError as e:
        debug("query cache write failed", e)
