"""Multi-device execution: data-parallel sharded scan over a device mesh.

The reference's multi-node story is broadcast(query) + gather(partial
aggregates) + reduce (SURVEY.md §5): an external orchestrator ships gobs
between machines.  On a TPU pod slice the same dataflow becomes a
shard_map over a 1-D mesh: each device scans its shard of the block batch
(ops/scan.py), partial group tables ride an all_gather over ICI, and every
device re-reduces the gathered partials with a second sort+segment pass,
so the final group table is replicated and ready for top-k.  Row-level
side outputs (outlier rows, distinct pair boundaries, matched masks) stay
sharded along the batch axis; the host walks them per shard, which is
possible because they are keyed by group-key value, never by local gid.

Requirement: max_groups == max_hist_groups when histograms are on (hist
rows follow group rows through the merge); the engine equalizes the caps
in sharded mode.  Set filters' ragged CSR side input is not sharded yet —
the engine falls back to the single-device path for those.
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


def _merged_names(config: ScanConfig) -> list[str]:
    names = ["keys", "count", "samples"]
    for ai in range(len(config.aggs)):
        for suffix in ("exists", "count", "wv", "min", "max"):
            names.append(f"agg{ai}_{suffix}")
        if config.aggs[ai].num_values > 0:
            names.append(f"agg{ai}_hist")
    return names


def _row_names(config: ScanConfig) -> list[str]:
    names = []
    if config.track_outliers and any(a.num_values > 0 for a in config.aggs):
        names.append("sorted_gkeys")
        for ai, a in enumerate(config.aggs):
            if a.num_values > 0:
                names += [f"agg{ai}_out_mask", f"agg{ai}_out_val"]
    if config.distinct_cols:
        names += ["pair_mask", "sorted_keys"]
    return names


def merge_partials(config: ScanConfig, gathered: dict) -> dict:
    """Re-reduce gathered per-device partial group tables [D, S, ...] into
    one [S, ...] table — the device-side replacement for the reference's
    CombineResults map merges (aggregate.go:414-467)."""
    D, S, K = gathered["keys"].shape

    keys = gathered["keys"].reshape(D * S, K)
    live = (gathered["samples"].reshape(D * S) > 0) | \
           (gathered["count"].reshape(D * S) > 0)
    key_cols = [jnp.where(live, keys[:, k], SENTINEL) for k in range(K)]

    idx = jax.lax.broadcasted_iota(jnp.int32, (D * S, 1), 0).reshape(D * S)
    sorted_ops = jax.lax.sort([*key_cols, idx], num_keys=K)
    skeys, sidx = sorted_ops[:-1], sorted_ops[-1]

    slive = live[sidx]
    differs = jnp.zeros((D * S,), bool).at[0].set(True)
    for k in skeys:
        differs = differs | jnp.concatenate(
            [jnp.ones((1,), bool), k[1:] != k[:-1]])
    gid = jnp.cumsum(differs.astype(jnp.int32)) - 1
    cgid = jnp.minimum(gid, S - 1)
    contrib = slive & (gid < S)

    def gather_rows(name):
        arr = gathered[name]
        return arr.reshape((D * S,) + arr.shape[2:])[sidx]

    def seg_sum(x):
        shaped = jnp.where(
            contrib.reshape((-1,) + (1,) * (x.ndim - 1)), x, 0)
        return jax.ops.segment_sum(shaped, cgid, num_segments=S)

    out = {
        "num_groups": jnp.sum((differs & slive).astype(jnp.int32)),
        "keys": jnp.stack(
            [jax.ops.segment_max(jnp.where(contrib, k, jnp.int64(-2**62)),
                                 cgid, num_segments=S) for k in skeys],
            axis=1),
        "count": seg_sum(gather_rows("count")),
        "samples": seg_sum(gather_rows("samples")),
    }
    for ai in range(len(config.aggs)):
        out[f"agg{ai}_exists"] = jax.ops.segment_max(
            jnp.where(contrib, gather_rows(f"agg{ai}_exists"), False),
            cgid, num_segments=S)
        out[f"agg{ai}_count"] = seg_sum(gather_rows(f"agg{ai}_count"))
        out[f"agg{ai}_wv"] = seg_sum(gather_rows(f"agg{ai}_wv"))
        out[f"agg{ai}_min"] = jax.ops.segment_min(
            jnp.where(contrib, gather_rows(f"agg{ai}_min"), jnp.int64(2**62)),
            cgid, num_segments=S)
        out[f"agg{ai}_max"] = jax.ops.segment_max(
            jnp.where(contrib, gather_rows(f"agg{ai}_max"),
                      jnp.int64(-2**62)), cgid, num_segments=S)
        if config.aggs[ai].num_values > 0:
            out[f"agg{ai}_hist"] = seg_sum(gather_rows(f"agg{ai}_hist"))
    return out


@partial(jax.jit, static_argnums=(0, 1, 2))
def _sharded_scan(config: ScanConfig, mesh: Mesh, axis: str,
                  cols, nrec, filter_vals, bitsets, time_bucket):
    merged_names = _merged_names(config)
    row_names = _row_names(config)

    def local(cols, nrec, filter_vals, bitsets, time_bucket):
        out = scan_core(config, cols, nrec, filter_vals, bitsets,
                        time_bucket, {})
        # gather partial aggregate tables over ICI, then every device
        # re-reduces — output replicated, host reads any shard
        gathered = {k: jax.lax.all_gather(out[k], axis)
                    for k in merged_names}
        merged = merge_partials(config, gathered)
        merged["spill"] = jax.lax.psum(out["spill"], axis)
        for ai, a in enumerate(config.aggs):
            if config.track_outliers and a.num_values > 0:
                merged[f"agg{ai}_nout"] = jax.lax.psum(
                    out[f"agg{ai}_nout"], axis)
        rows = {k: out[k] for k in row_names}
        return merged, rows

    col_specs = {k: (P(axis, None), P(axis, None)) for k in cols}
    merged_specs = {"num_groups": P(), "keys": P(), "count": P(),
                    "samples": P(), "spill": P()}
    for ai, a in enumerate(config.aggs):
        for suffix in ("exists", "count", "wv", "min", "max"):
            merged_specs[f"agg{ai}_{suffix}"] = P()
        if a.num_values > 0:
            merged_specs[f"agg{ai}_hist"] = P()
            if config.track_outliers:
                merged_specs[f"agg{ai}_nout"] = P()
    row_specs = {k: P(axis) for k in _row_names(config)}

    merged, rows = shard_map(
        local, mesh=mesh,
        in_specs=(col_specs, P(axis), P(), tuple(P() for _ in bitsets), P()),
        out_specs=(merged_specs, row_specs),
        check_vma=False,
    )(cols, nrec, filter_vals, bitsets, time_bucket)
    merged.update(rows)
    return merged


def sharded_scan(config: ScanConfig, mesh: Mesh, cols, nrec, filter_vals,
                 bitsets, time_bucket, axis: str = "d"):
    """Data-parallel scan: block batch sharded across `axis`, merged group
    table replicated, row-level side outputs sharded.  B must divide by
    the mesh size (the engine pads with empty blocks)."""
    if any(f.kind == "set" for f in config.filters):
        raise ValueError("sharded scan does not support set filters yet")
    if any(a.num_values > 0 for a in config.aggs) and \
            config.max_groups != config.max_hist_groups:
        raise ValueError("sharded hist scan requires max_groups == "
                         "max_hist_groups")
    cfg = config
    if config.want_matched_mask:
        cfg = dataclasses.replace(config, want_matched_mask=False)
    return _sharded_scan(cfg, mesh, axis, cols, nrec, filter_vals, bitsets,
                         time_bucket)
