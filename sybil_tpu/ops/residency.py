"""HBM-resident column cache.

The reference re-reads and re-decodes every block from disk per query
(table_query.go:133); its only reuse is the OS page cache and a per-block
result cache.  On TPU the equivalent working set belongs in HBM: decoded
column lanes are uploaded once per (block, column) and pinned until LRU
eviction, so repeated scans touch no host->device transfer at all.  This
matters doubly under the axon tunnel, where host->device bandwidth is
orders of magnitude below HBM bandwidth.

Cache keys include the column file's mtime: blocks are immutable and
republished by rename (column_store_io.go:472-486 equivalent), so an
mtime change invalidates naturally.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

# leave headroom in 16G HBM; SYBIL_HBM_BUDGET_BYTES overrides (the
# MAX_MEM analog, table_query.go:15 — tables whose decoded working set
# exceeds the budget degrade to LRU eviction + re-upload, never failure)
MAX_BYTES = int(os.environ.get("SYBIL_HBM_BUDGET_BYTES", 8 << 30))


class DeviceColumnCache:
    def __init__(self, max_bytes: int = MAX_BYTES):
        self.max_bytes = max_bytes
        self.bytes = 0
        self._lru: OrderedDict[tuple, tuple] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def _evict(self):
        while self.bytes > self.max_bytes and self._lru:
            _, (arrs, nbytes) = self._lru.popitem(last=False)
            self.bytes -= nbytes

    def get(self, key):
        ent = self._lru.get(key)
        if ent is None:
            self.misses += 1
            return None
        self._lru.move_to_end(key)
        self.hits += 1
        return ent[0]

    def put(self, key, arrays):
        import jax
        nbytes = sum(getattr(a, "nbytes", 0)
                     for a in jax.tree.leaves(arrays))
        if key in self._lru:
            self.bytes -= self._lru[key][1]
        self._lru[key] = (arrays, nbytes)
        self.bytes += nbytes
        self._evict()

    def clear(self):
        self._lru.clear()
        self.bytes = 0


CACHE = DeviceColumnCache()

# Small device-resident constants (filter literals, time-bucket scalars,
# per-batch record counts, regex bitsets).  Every host->device upload on
# the tunneled transport costs a full ~30ms round trip, so re-uploading
# a 16-byte array per query dominates warm-query latency; content-keyed
# caching makes repeat queries upload nothing at all.
_CONST_MAX_BYTES = 1 << 20
_CONST: "OrderedDict[tuple, object]" = OrderedDict()
_CONST_CAP = 4096


def device_const(arr) -> object:
    import jax.numpy as jnp
    import numpy as np
    a = np.asarray(arr)
    if a.nbytes > _CONST_MAX_BYTES:
        return jnp.asarray(a)
    key = (a.dtype.str, a.shape, a.tobytes())
    ent = _CONST.get(key)
    if ent is None:
        ent = jnp.asarray(a)
        _CONST[key] = ent
        if len(_CONST) > _CONST_CAP:
            _CONST.popitem(last=False)
    else:
        _CONST.move_to_end(key)
    return ent


def block_col_key(bdir: str, col_file: str, col: str, C: int) -> tuple:
    path = os.path.join(bdir, col_file)
    try:
        mtime = os.stat(path).st_mtime_ns
    except FileNotFoundError:
        try:
            mtime = os.stat(path + ".gz").st_mtime_ns
        except FileNotFoundError:
            mtime = -1
    return (bdir, col, C, mtime)
