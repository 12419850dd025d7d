"""The device scan kernel: filter + group-by + aggregate over a batch of
column blocks in one jitted XLA computation.

This replaces the reference's per-record interpreted hot loop
(FilterAndAggRecords, src/lib/aggregate.go:56-282) with a vectorized
pipeline over [B, CHUNK] columnar arrays:

  1. predicate masks (vectorized compares; regexes arrive as precomputed
     dictionary bitsets — the device only gathers, mirroring the RCache
     idea in filter.go:216-231)
  2. group keys as int64 lanes (int value / global str id / -1 missing —
     two's-complement -1 IS the reference's MaxUint64 MISSING_VALUE)
  3. one multi-key sort over the flattened batch; segment boundaries give
     group ids (sort-based grouping: deterministic, no dynamic shapes)
  4. segment reductions for count / Σw / Σw·v / min / max and weighted
     histogram bucket counts (bucket math mirrors hist_basic.go:132-150,
     outliers clamped into the last slot; raw outlier values are exposed
     for the host-side stddev/sparse-bucket fix-up)

Unmatched rows carry sentinel keys that sort last into one dead group.
Groups beyond the cap are dropped, mirroring INTERNAL_RESULT_LIMIT
(aggregate.go:15,192).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = np.iinfo(np.int64).max
MISSING = -1  # two's-complement of the reference's MaxUint64 MISSING_VALUE


@dataclasses.dataclass(frozen=True)
class FilterSpec:
    col: str
    op: str            # gt/lt/eq/neq (int,str eq/neq) ; re/nre ; in/nin
    kind: str          # int | str | set
    bitset_idx: int = -1   # index into regex bitset inputs (re/nre)


@dataclasses.dataclass(frozen=True)
class AggSpec:
    col: str
    # histogram layout (static per table: derived from table-level IntInfo)
    hist_min: int
    bucket_size: int
    num_values: int          # len(values); 0 => no bucket tracking (avg op)
    discard_min: int         # value < discard_min -> row ignored
    discard_max: int         # value > discard_max -> row ignored
    sub_edges: tuple = ()    # multihist: (min,max,bs,nv,offset) tuples


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    group_cols: tuple[str, ...]
    aggs: tuple[AggSpec, ...]
    filters: tuple[FilterSpec, ...]
    distinct_cols: tuple[str, ...] = ()
    time_col: str = ""           # non-empty => time-bucket rollup
    weight_col: str = ""
    max_groups: int = 100000
    max_hist_groups: int = 4096
    track_outliers: bool = False
    want_matched_mask: bool = False
    # packed-download shaping (host<->device sync is the expensive
    # resource: one buffer, no scalar reads)
    prefix_rows: int = 8192      # group rows downloaded eagerly
    hist_prefix: int = 128       # hist group rows downloaded eagerly
    max_out: int = 1024          # compacted outlier rows per agg
    max_pairs: int = 16384       # compacted distinct pairs

    @property
    def n_key_cols(self) -> int:
        return max(len(self.group_cols) + (1 if self.time_col else 0), 1)

    @property
    def n_all_keys(self) -> int:
        return self.n_key_cols + len(self.distinct_cols)


def _trunc_div(x, d):
    """Go integer division truncates toward zero."""
    q = jnp.abs(x) // d
    return jnp.where(x >= 0, q, -q)


def scan_core(config: ScanConfig, cols, nrec, filter_vals, bitsets,
              time_bucket, set_aux):
    """
    cols:        {name: (values int64[B,C], valid bool[B,C])}
    nrec:        int32[B] valid records per block
    filter_vals: int64[F] dynamic filter constants (str filters hold the
                 global dict id; -1 means "string never ingested")
    bitsets:     tuple of bool[dict_size_i] regex match bitsets
    time_bucket: int64 scalar (ignored unless config.time_col)
    set_aux:     {name: (row_ids int32[M], vals int64[M])} flattened CSR
                 for set columns, row_ids already offset into [0, R)
                 (padding rows point at R)
    """
    some = next(iter(cols.values()))[0]
    B, C = some.shape
    R = B * C

    def flat(x):
        return x.reshape(R)

    row_in_range = flat(
        jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
        < nrec[:, None])

    # ------------------------------------------------------------------
    # filters (all must match; missing column value always fails)
    # ------------------------------------------------------------------
    matched = row_in_range
    for i, f in enumerate(config.filters):
        fv = filter_vals[i]
        if f.kind == "set":
            row_ids, svals = set_aux[f.col]
            hit = jnp.zeros((R + 1,), jnp.int32).at[row_ids].add(
                (svals == fv).astype(jnp.int32))[:R] > 0
            has = jnp.zeros((R + 1,), jnp.int32).at[row_ids].add(1)[:R] > 0
            ok = (has & hit) if f.op == "in" else (has & ~hit)
        else:
            values, valid = cols[f.col]
            v, ok = flat(values), flat(valid)
            if f.op == "gt":
                ok = ok & (v > fv)
            elif f.op == "lt":
                ok = ok & (v < fv)
            elif f.op == "eq":
                ok = ok & (v == fv)
            elif f.op == "neq":
                ok = ok & (v != fv)
            elif f.op in ("re", "nre"):
                bits = bitsets[f.bitset_idx]
                hit = bits[jnp.clip(v, 0, bits.shape[0] - 1).astype(jnp.int32)]
                ok = ok & (hit if f.op == "re" else ~hit)
            else:  # unknown op never matches (filter.go default)
                ok = ok & False
        matched = matched & ok

    # time rollup: rows without the time column are skipped entirely
    # (aggregate.go:146-153)
    keys = []
    if config.time_col:
        tvals, tvalid = cols[config.time_col]
        matched = matched & flat(tvalid)
        tb = _trunc_div(flat(tvals), time_bucket) * time_bucket
        keys.append(tb)

    for g in config.group_cols:
        gvals, gvalid = cols[g]
        keys.append(jnp.where(flat(gvalid), flat(gvals), MISSING))

    if not keys:
        keys = [jnp.zeros((R,), jnp.int64)]  # single global group

    for d in config.distinct_cols:
        dvals, dvalid = cols[d]
        keys.append(jnp.where(flat(dvalid), flat(dvals), MISSING))

    keys = [jnp.where(matched, k, SENTINEL) for k in keys]

    # ------------------------------------------------------------------
    # weight lane (aggregate.go:100-102)
    # ------------------------------------------------------------------
    if config.weight_col:
        wv, wvalid = cols[config.weight_col]
        weight = jnp.where(flat(wvalid), flat(wv), 1)
    else:
        weight = jnp.ones((R,), jnp.int64)

    # ------------------------------------------------------------------
    # one sort to rule them all
    # ------------------------------------------------------------------
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape(R)
    n_group_keys = len(keys) - len(config.distinct_cols)
    sorted_ops = jax.lax.sort([*keys, idx], num_keys=len(keys))
    skeys, sidx = sorted_ops[:-1], sorted_ops[-1]

    def take(x):
        return flat(x)[sidx] if x.ndim > 1 else x[sidx]

    smatched = matched[sidx]
    sweight = weight[sidx]

    gkeys = skeys[:n_group_keys]
    prev_differs = jnp.zeros((R,), bool).at[0].set(True)
    for k in gkeys:
        prev_differs = prev_differs | jnp.concatenate(
            [jnp.ones((1,), bool), k[1:] != k[:-1]])
    gid = jnp.cumsum(prev_differs.astype(jnp.int32)) - 1
    num_groups = gid[-1] + 1

    S = config.max_groups
    in_cap = gid < S
    cgid = jnp.minimum(gid, S - 1)
    contrib = smatched & in_cap

    def seg_sum(x, n=None):
        return jax.ops.segment_sum(
            jnp.where(contrib, x, 0), cgid, num_segments=n or S)

    out = {
        "num_groups": num_groups,
        "keys": jnp.stack(
            [jax.ops.segment_max(jnp.where(contrib, k, jnp.int64(-2**62)),
                                 cgid, num_segments=S) for k in gkeys],
            axis=1),
        "count": seg_sum(sweight),
        "samples": seg_sum(jnp.ones((R,), jnp.int64)),
    }

    # distinct pairs: boundary over the full (group+distinct) key tuple
    if config.distinct_cols:
        pair_differs = jnp.zeros((R,), bool).at[0].set(True)
        for k in skeys:
            pair_differs = pair_differs | jnp.concatenate(
                [jnp.ones((1,), bool), k[1:] != k[:-1]])
        out["pair_mask"] = pair_differs & smatched
        out["sorted_keys"] = jnp.stack(skeys, axis=1)

    # ------------------------------------------------------------------
    # aggregations (aggregate.go:246-261 + hist_basic.go:101-151)
    # ------------------------------------------------------------------
    for ai, agg in enumerate(config.aggs):
        avals, avalid = cols[agg.col]
        v = take(avals)
        populated = take(avalid)
        keep = populated & ~((v > agg.discard_max) | (v < agg.discard_min))
        kw = jnp.where(keep, sweight, 0)

        out[f"agg{ai}_exists"] = seg_sum(populated.astype(jnp.int64)) > 0
        out[f"agg{ai}_count"] = seg_sum(kw)
        # Σw·v in int64: exact (the reference's running float64 mean loses
        # precision instead); overflows only past ~9e18 aggregate mass.
        out[f"agg{ai}_wv"] = seg_sum(kw * v)
        ccontrib = contrib & keep
        out[f"agg{ai}_min"] = jax.ops.segment_min(
            jnp.where(ccontrib, v, jnp.int64(2**62)), cgid, num_segments=S)
        out[f"agg{ai}_max"] = jax.ops.segment_max(
            jnp.where(ccontrib, v, jnp.int64(-2**62)), cgid, num_segments=S)

        if agg.num_values > 0:
            Sh = config.max_hist_groups
            hcontrib = ccontrib & (cgid < Sh)
            if agg.sub_edges:
                # multihist: first matching sub-range, top range first
                # (hist_multi.go:81-87); a value overflowing its sub's
                # bucket array is a sub-outlier (folded into the sub's last
                # slot AND recorded raw, hist_basic.go:133-137)
                bv = jnp.zeros((R,), jnp.int32)
                assigned = jnp.zeros((R,), bool)
                is_out = jnp.zeros((R,), bool)
                total_nv = agg.num_values
                for (smin, smax, sbs, snv, soff) in agg.sub_edges:
                    inrange = (v >= smin) & (v <= smax) & ~assigned
                    raw_bv = _trunc_div(v - smin, sbs)
                    is_out = is_out | (inrange & (raw_bv >= snv))
                    sub_bv = jnp.clip(raw_bv, 0, snv - 1)
                    bv = jnp.where(inrange, sub_bv.astype(jnp.int32) + soff, bv)
                    assigned = assigned | inrange
                hcontrib = hcontrib & assigned
                nv = total_nv
            else:
                nv = agg.num_values
                raw_bv = _trunc_div(v - agg.hist_min, agg.bucket_size)
                is_out = raw_bv >= nv
                bv = jnp.clip(raw_bv, 0, nv - 1).astype(jnp.int32)
            flat_id = jnp.minimum(cgid, Sh - 1) * nv + bv
            out[f"agg{ai}_hist"] = jax.ops.segment_sum(
                jnp.where(hcontrib, sweight, 0), flat_id,
                num_segments=Sh * nv).reshape(Sh, nv)
            if config.track_outliers:
                # outliers keyed by group-key tuple (not local gid) so the
                # host fix-up also works on sharded partials
                out_rows = hcontrib & is_out
                out[f"agg{ai}_nout"] = jnp.sum(out_rows.astype(jnp.int64))
                out[f"agg{ai}_out_mask"] = out_rows
                out[f"agg{ai}_out_val"] = jnp.where(out_rows, v, 0)
                out["sorted_gkeys"] = jnp.stack(gkeys, axis=1)

    if config.want_matched_mask:
        out["matched"] = matched.reshape(B, C)

    return out


scan_batch = partial(jax.jit, static_argnums=(0,))(scan_core)


# ---------------------------------------------------------------------------
# packed downloads
#
# The host<->device link (especially the tunneled axon transport) charges
# ~tens of ms per sync and is catastrophically slow on 0-d reads, so the
# engine downloads exactly ONE small int64 buffer per batch: a meta row,
# a prefix of the group table, compacted (top_k) outlier rows, and
# compacted distinct-pair rows.  Full-size arrays stay on device and are
# only pulled when the meta row says the prefix overflowed.
# ---------------------------------------------------------------------------

def main_width(config: ScanConfig) -> int:
    K, A, D = config.n_key_cols, len(config.aggs), len(config.distinct_cols)
    return max(K + 2 + 5 * A, K + D + 1, 4 + A)


def pack_outputs(config: ScanConfig, out: dict, R: int) -> dict:
    K = config.n_key_cols
    A = len(config.aggs)
    D = len(config.distinct_cols)
    S = config.max_groups
    P = min(config.prefix_rows, S)
    W = main_width(config)

    def pad_to(arr2d, width):
        pad = width - arr2d.shape[1]
        if pad <= 0:
            return arr2d
        return jnp.pad(arr2d, ((0, 0), (0, pad)))

    table_cols = [out["keys"][:, k] for k in range(K)]
    table_cols += [out["count"], out["samples"]]
    for ai in range(A):
        table_cols += [out[f"agg{ai}_exists"].astype(jnp.int64),
                       out[f"agg{ai}_count"], out[f"agg{ai}_wv"],
                       out[f"agg{ai}_min"], out[f"agg{ai}_max"]]
    table = jnp.stack(table_cols, axis=1)  # [S, K+2+5A]

    meta = [out["num_groups"].astype(jnp.int64)]
    sections = [pad_to(table[:P], W)]

    hist_ais = [ai for ai, a in enumerate(config.aggs) if a.num_values > 0]
    if config.track_outliers and hist_ais:
        kmax = min(config.max_out, R)
        for ai in hist_ais:
            mask = out[f"agg{ai}_out_mask"]
            _, idx = jax.lax.top_k(mask.astype(jnp.int32), kmax)
            block = jnp.concatenate(
                [out["sorted_gkeys"][idx],
                 out[f"agg{ai}_out_val"][idx][:, None],
                 mask[idx][:, None].astype(jnp.int64)], axis=1)
            sections.append(pad_to(block, W))
            meta.append(out[f"agg{ai}_nout"].astype(jnp.int64))
    else:
        for _ in hist_ais:
            meta.append(jnp.zeros((), jnp.int64))

    if D:
        kmax = min(config.max_pairs, R)
        pmask = out["pair_mask"]
        _, idx = jax.lax.top_k(pmask.astype(jnp.int32), kmax)
        block = jnp.concatenate(
            [out["sorted_keys"][idx],
             pmask[idx][:, None].astype(jnp.int64)], axis=1)
        sections.append(pad_to(block, W))
        meta.append(jnp.sum(pmask.astype(jnp.int64)))
    else:
        meta.append(jnp.zeros((), jnp.int64))

    meta_row = jnp.zeros((1, W), jnp.int64)
    for i, m in enumerate(meta):
        meta_row = meta_row.at[0, i].set(m)

    packed = {"main": jnp.concatenate([meta_row] + sections, axis=0),
              "table": table}
    if hist_ais:
        Ph = min(config.hist_prefix, config.max_hist_groups)
        packed["hists"] = jnp.stack(
            [out[f"agg{ai}_hist"][:Ph] for ai in hist_ais])
    return packed


def scan_packed(config: ScanConfig, cols, nrec, filter_vals, bitsets,
                time_bucket, set_aux):
    """-> (packed small buffers, raw device outputs for escalation)."""
    out = scan_core(config, cols, nrec, filter_vals, bitsets, time_bucket,
                    set_aux)
    some = next(iter(cols.values()))[0]
    R = some.shape[0] * some.shape[1]
    return pack_outputs(config, out, R), out


scan_packed_jit = partial(jax.jit, static_argnums=(0,))(scan_packed)

pack_jit = partial(jax.jit, static_argnums=(0, 2))(pack_outputs)
