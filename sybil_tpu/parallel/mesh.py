"""Multi-device execution: data-parallel scan + hash-partitioned
all-to-all group-by shuffle over a device mesh.

The reference's multi-node story is broadcast(query) + gather(partial
aggregates) + reduce (SURVEY.md §5).  Round 1 translated that literally:
every device all_gathered every other device's FULL partial group table
and re-reduced it replicated — O(D·S) memory and work per device.  This
is the TPU-native replacement:

  1. each device scans its shard of the block batch (ops/scan.py) and
     pre-aggregates locally — the "two-phase aggregation" that makes row
     skew irrelevant: a hot key is at most ONE row per source device by
     the time it reaches the wire;
  2. each device hash-partitions its (small) group table by key over the
     mesh axis and exchanges rows with ONE `all_to_all` over ICI, so
     every device receives only the keys it owns (O(S) traffic, not
     O(D·S));
  3. the owner re-reduces its received rows (sort + segment ops over
     ~2S small rows), compacts the live groups, and one `all_gather` of
     the compacted DISJOINT tables replicates the final result for the
     host download.

Key-level skew (many distinct groups hashing to one owner) is absorbed
by a 2x + slack per-destination capacity; residual overflow is counted,
psum'd, and surfaces as a loud error (raise max-groups or reshard) —
never a silent drop.  Histogram bucket rows ride the same payload,
aligned row-for-row with their group through partition, exchange, and
re-reduce, so the packed-download layout is identical to the
single-device path.  Row-level side outputs (outlier rows, distinct
pairs, matched masks) stay sharded along the batch axis; the host walks
them per shard, which is possible because they are keyed by group-key
value, never by local gid.

Replaces CombineResults/StitchResults (aggregate.go:414-467,
node_aggregator.go:179) semantics on-mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scan import ScanConfig, SENTINEL, scan_core

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# payload layout: one int64 matrix per device, [rows, WP]
#   [keys K | count, samples, (exists, acnt, awv)*A | hist lanes | amn*A | amx*A]
# sum-merged lanes are contiguous so the re-reduce is one segment_sum.
# ---------------------------------------------------------------------------

def _payload_spec(config: ScanConfig):
    K = config.n_key_cols
    A = len(config.aggs)
    # only the dense strategy's bounded bucket matrices ride the payload;
    # sorted-strategy hists travel as sharded sparse pair rows that never
    # enter the shuffle (they are keyed by group-key value, so the host
    # merges them like outlier rows)
    if config.strategy == "dense":
        hist_ais = [ai for ai, a in enumerate(config.aggs)
                    if a.num_values > 0]
    else:
        hist_ais = []
    nv_total = sum(config.aggs[ai].num_values for ai in hist_ais)
    n_sum = 2 + 3 * A + nv_total
    WP = K + n_sum + 2 * A
    return K, A, hist_ais, nv_total, n_sum, WP


def _build_payload(config: ScanConfig, out: dict, Seff: int):
    """Local scan outputs -> (payload [Seff, WP] int64, live [Seff])."""
    K, A, hist_ais, nv_total, n_sum, WP = _payload_spec(config)
    cols = [out["keys"][:Seff, k] for k in range(K)]
    cols += [out["count"][:Seff], out["samples"][:Seff]]
    for ai in range(A):
        cols += [out[f"agg{ai}_exists"][:Seff].astype(jnp.int64),
                 out[f"agg{ai}_count"][:Seff], out[f"agg{ai}_wv"][:Seff]]
    for ai in hist_ais:
        h = out[f"agg{ai}_hist"]  # [dense_slots, nv], aligned with table rows
        nv = config.aggs[ai].num_values
        hh = jnp.zeros((Seff, nv), jnp.int64)
        m = min(Seff, h.shape[0])
        hh = hh.at[:m].set(h[:m])
        cols += [hh[:, j] for j in range(nv)]
    for ai in range(A):
        cols.append(out[f"agg{ai}_min"][:Seff])
    for ai in range(A):
        cols.append(out[f"agg{ai}_max"][:Seff])
    payload = jnp.stack(cols, axis=1)
    live = (out["count"][:Seff] > 0) | (out["samples"][:Seff] > 0)
    return payload, live


def _mix_keys(keys) -> jnp.ndarray:
    """FNV-ish uint32 hash of the [rows, K] int64 key tuples."""
    h = jnp.full((keys.shape[0],), 2166136261, jnp.uint32)
    for k in range(keys.shape[1]):
        v = keys[:, k].astype(jnp.uint64)
        for part in ((v & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                     (v >> jnp.uint64(32)).astype(jnp.uint32)):
            h = (h ^ part) * jnp.uint32(16777619)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    return h ^ (h >> 13)


def _partition_rows(payload, live, keys, D: int, Sc: int):
    """Place rows into a [D, Sc, WP] send buffer by key owner.
    Returns (sendbuf, overflow_count)."""
    S, WP = payload.shape
    owner = jnp.where(live, (_mix_keys(keys) % D).astype(jnp.int32), D)
    order = jnp.argsort(owner)                    # dead rows sort last
    sowner = owner[order]
    # position within the destination segment
    idx = jnp.arange(S, dtype=jnp.int32)
    counts = jnp.zeros((D + 1,), jnp.int32).at[sowner].add(1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    pos = idx - starts[sowner]
    ok = (sowner < D) & (pos < Sc)
    slot = jnp.where(ok, sowner * Sc + pos, D * Sc)
    send = jnp.zeros((D * Sc + 1, WP), jnp.int64).at[slot].set(
        payload[order])[: D * Sc]
    overflow = jnp.sum(((sowner < D) & (pos >= Sc)).astype(jnp.int64))
    return send.reshape(D, Sc, WP), overflow


def _segment_reduce(config: ScanConfig, rows, row_live, cap: int):
    """Sort rows by key, merge equal keys: segment-sum the sum lanes,
    segment-min/max the min/max lanes.  rows: [N, WP] int64.
    Returns (merged [cap, WP], live [cap], n_groups)."""
    K, A, hist_ais, nv_total, n_sum, WP = _payload_spec(config)
    N = rows.shape[0]
    key_cols = [jnp.where(row_live, rows[:, k], SENTINEL) for k in range(K)]
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).reshape(N)
    sorted_ops = jax.lax.sort([*key_cols, idx], num_keys=K)
    skeys, sidx = sorted_ops[:-1], sorted_ops[-1]
    srows = rows[sidx]
    slive = row_live[sidx]

    differs = jnp.zeros((N,), bool).at[0].set(True)
    for k in skeys:
        differs = differs | jnp.concatenate(
            [jnp.ones((1,), bool), k[1:] != k[:-1]])
    gid = jnp.cumsum(differs.astype(jnp.int32)) - 1
    cgid = jnp.where(slive & (gid < cap), gid, cap)
    contrib = slive & (gid < cap)
    n_groups = jnp.sum((differs & slive).astype(jnp.int32))

    sums = jax.ops.segment_sum(
        jnp.where(contrib[:, None], srows[:, K: K + n_sum], 0),
        cgid, num_segments=cap + 1)[:cap]
    mns = jax.ops.segment_min(
        jnp.where(contrib[:, None], srows[:, K + n_sum: K + n_sum + A],
                  jnp.int64(2**62)), cgid, num_segments=cap + 1)[:cap]
    mxs = jax.ops.segment_max(
        jnp.where(contrib[:, None], srows[:, K + n_sum + A:],
                  jnp.int64(-2**62)), cgid, num_segments=cap + 1)[:cap]

    # keys: first row of each segment is the single writer (int32-pair
    # scatter-add, exact for arbitrary int64 bit patterns)
    kmat = jnp.stack(skeys, axis=1)
    bid = jnp.where(differs & contrib, cgid, cap)
    lo = (kmat.astype(jnp.uint64) & jnp.uint64(0xFFFFFFFF)).astype(
        jnp.uint32)
    hi = (kmat.astype(jnp.uint64) >> jnp.uint64(32)).astype(jnp.uint32)
    kpair = jnp.concatenate([lo, hi], axis=1).astype(jnp.int32)
    kacc = jnp.zeros((cap + 1, 2 * K), jnp.int32).at[bid].add(kpair)[:cap]
    keys_tbl = (kacc[:, :K].astype(jnp.uint32).astype(jnp.uint64) |
                (kacc[:, K:].astype(jnp.uint32).astype(jnp.uint64)
                 << jnp.uint64(32))).astype(jnp.int64)

    merged = jnp.concatenate([keys_tbl, sums, mns, mxs], axis=1)
    live = jnp.arange(cap) < jnp.minimum(n_groups, cap)
    # after the sort, live groups occupy gids [0, n_groups)
    return merged, live, n_groups


def _unpack_payload(config: ScanConfig, table, live, n_groups, spill,
                    overflow):
    """[S, WP] payload matrix -> the engine's output dict."""
    K, A, hist_ais, nv_total, n_sum, WP = _payload_spec(config)
    S = table.shape[0]
    out = {
        "num_groups": n_groups,
        "keys": table[:, :K],
        "count": jnp.where(live, table[:, K], 0),
        "samples": jnp.where(live, table[:, K + 1], 0),
        "spill": spill,
        "shuffle_overflow": overflow,
    }
    off = K + 2
    for ai in range(A):
        out[f"agg{ai}_exists"] = jnp.where(live, table[:, off] > 0, False)
        out[f"agg{ai}_count"] = jnp.where(live, table[:, off + 1], 0)
        out[f"agg{ai}_wv"] = jnp.where(live, table[:, off + 2], 0)
        off += 3
    for ai in hist_ais:      # dense only (_payload_spec)
        nv = config.aggs[ai].num_values
        h = jnp.where(live[:, None], table[:, off: off + nv], 0)
        Sh = config.dense_slots
        hh = jnp.zeros((Sh, nv), jnp.int64)
        m = min(Sh, S)
        out[f"agg{ai}_hist"] = hh.at[:m].set(h[:m])
        off += nv
    for ai in range(A):
        out[f"agg{ai}_min"] = table[:, off + ai]
        out[f"agg{ai}_max"] = table[:, off + A + ai]
    return out


def _row_names(config: ScanConfig) -> list[str]:
    names = []
    if config.track_outliers and any(a.num_values > 0 for a in config.aggs):
        names.append("sorted_gkeys")
        for ai, a in enumerate(config.aggs):
            if a.num_values > 0:
                names += [f"agg{ai}_out_mask", f"agg{ai}_out_val"]
    if config.strategy != "dense":
        # sparse hist pair rows stay sharded; keyed by group-key value
        for ai, a in enumerate(config.aggs):
            if a.num_values > 0:
                names += [f"agg{ai}_hp_mask", f"agg{ai}_hp_bv",
                          f"agg{ai}_hp_w", f"agg{ai}_hp_keys"]
    if config.distinct_cols:
        names += ["pair_mask", "sorted_keys"]
    if config.want_matched_mask:
        names.append("matched")
    return names


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _sharded_scan(config: ScanConfig, mesh: Mesh, axis: str,
                  cols, nrec, filter_vals, bitsets, time_bucket, set_aux):
    D = mesh.shape[axis]
    # groups live in the first Seff table rows; sparse hist pairs do not
    # ride the shuffle, so hist queries get the full group capacity
    Seff = config.table_slots
    Sc = min(Seff, 2 * _ceil_div(Seff, D) + 128)      # per-dest capacity
    Sc2 = min(Seff, 2 * _ceil_div(Seff, D) + 128)     # owned compaction
    S = config.table_slots
    row_names = _row_names(config)

    def local(cols, nrec, filter_vals, bitsets, time_bucket, set_aux):
        saux = {k: (r[0], v[0]) for k, (r, v) in set_aux.items()}
        out = scan_core(config, cols, nrec, filter_vals, bitsets,
                        time_bucket, saux)

        payload, live = _build_payload(config, out, Seff)
        keys = payload[:, :config.n_key_cols]
        send, overflow = _partition_rows(payload, live, keys, D, Sc)

        # the exchange: rows travel once, to their key's owner
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        recv = recv.reshape(D * Sc, payload.shape[1])
        recv_live = recv[:, config.n_key_cols] > 0
        recv_live = recv_live | (recv[:, config.n_key_cols + 1] > 0)

        merged, mlive, my_groups = _segment_reduce(config, recv, recv_live,
                                                   Sc2)

        # replicate the disjoint owned tables for the host download
        gathered = jax.lax.all_gather(merged, axis)      # [D, Sc2, WP]
        glive = jax.lax.all_gather(mlive, axis)
        flat = gathered.reshape(D * Sc2, merged.shape[1])
        flive = glive.reshape(D * Sc2)
        # compact live rows first, cap at the table slot count
        _, top = jax.lax.top_k(flive.astype(jnp.int32), min(S, D * Sc2))
        table = jnp.zeros((S, merged.shape[1]), jnp.int64)
        table = table.at[: top.shape[0]].set(flat[top])
        tlive = jnp.zeros((S,), bool).at[: top.shape[0]].set(flive[top])

        n_groups = jax.lax.psum(my_groups, axis)
        spill = jax.lax.psum(out["spill"], axis)
        total_overflow = jax.lax.psum(overflow, axis) + \
            jnp.maximum(n_groups - S, 0)
        final = _unpack_payload(config, table, tlive, n_groups, spill,
                                total_overflow)
        for ai, a in enumerate(config.aggs):
            if config.track_outliers and a.num_values > 0:
                final[f"agg{ai}_nout"] = jax.lax.psum(
                    out[f"agg{ai}_nout"], axis)
        rows = {k: out[k] for k in row_names}
        return final, rows

    col_specs = {k: (P(axis, None), P(axis, None)) for k in cols}
    saux_specs = {k: (P(axis), P(axis)) for k in set_aux}
    merged_specs = {"num_groups": P(), "keys": P(), "count": P(),
                    "samples": P(), "spill": P(), "shuffle_overflow": P()}
    for ai, a in enumerate(config.aggs):
        for suffix in ("exists", "count", "wv", "min", "max"):
            merged_specs[f"agg{ai}_{suffix}"] = P()
        if a.num_values > 0:
            if config.strategy == "dense":
                merged_specs[f"agg{ai}_hist"] = P()
            if config.track_outliers:
                merged_specs[f"agg{ai}_nout"] = P()
    row_specs = {}
    for k in row_names:
        row_specs[k] = P(axis) if k != "matched" else P(axis, None)

    merged, rows = shard_map(
        local, mesh=mesh,
        in_specs=(col_specs, P(axis), P(), tuple(P() for _ in bitsets),
                  P(), saux_specs),
        out_specs=(merged_specs, row_specs),
        check_vma=False,
    )(cols, nrec, filter_vals, bitsets, time_bucket, set_aux)
    merged.update(rows)
    return merged


def sharded_scan(config: ScanConfig, mesh: Mesh, cols, nrec, filter_vals,
                 bitsets, time_bucket, set_aux=None, axis: str = "d"):
    """Data-parallel scan + hash-partitioned shuffle.  The block batch is
    sharded across `axis`; the merged group table comes back replicated
    (disjoint owned ranges gathered); row-level side outputs stay
    sharded.  B must divide by the mesh size (the engine pads with
    empty blocks); set-filter CSR side inputs arrive pre-sharded as
    [D, M] arrays (engine builds per-shard row ids)."""
    return _sharded_scan(config, mesh, axis, cols, nrec, filter_vals,
                         bitsets, time_bucket, set_aux or {})
