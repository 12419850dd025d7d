"""Device-side block decode.

The reference's #1 hot loop is column decode: gob decode + delta
posting-id unencode + scatter into row structs
(src/lib/column_store_io.go:493-780 — posting deltas :566-577, value
prefix-sum :750-776).  Here decode runs ON the TPU over a whole batch of
blocks at once:

- value encoding:  delta decode is `jnp.cumsum` + base, validity is a
  bit-unpack — both ideal TPU ops.  The host uploads the RAW encoded
  sections (narrow-dtype deltas, packed validity bits), cutting the
  host->HBM transfer to as little as ~2.1 bytes/row vs 9 bytes/row for
  pre-decoded lanes.
- bucket encoding: posting-id cumsum + per-row searchsorted over the
  CSR offsets + one scatter for values and one for validity.

The host never runs decode math — it only mmaps the containers, pads
the ragged per-block sections into batch arrays, and hands them to one
jitted call per (column, encoding-group).  Blocks with exotic shapes
fall back to the host decoder per block (blocks.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pad_pow2(n: int, floor: int = 128) -> int:
    v = floor
    while v < n:
        v *= 2
    return v


@partial(jax.jit, static_argnums=(0,))
def _decode_value_jit(C: int, deltas, bits, bases):
    """deltas [B, C] (any int dtype), bits [B, C//8] uint8, bases [B]
    -> (values int64 [B, C], valid bool [B, C])."""
    values = jnp.cumsum(deltas.astype(jnp.int64), axis=1) + bases[:, None]
    sh = jnp.arange(8, dtype=jnp.uint8)
    unpacked = (bits[:, :, None] >> sh[None, None, :]) & jnp.uint8(1)
    valid = unpacked.reshape(bits.shape[0], -1)[:, :C] > 0
    return values, valid


@partial(jax.jit, static_argnums=(0,))
def _decode_ids_jit(C: int, ids, bits):
    """Dense str dict-id lanes: widen int32 -> int64, unpack validity."""
    values = ids.astype(jnp.int64)
    sh = jnp.arange(8, dtype=jnp.uint8)
    unpacked = (bits[:, :, None] >> sh[None, None, :]) & jnp.uint8(1)
    valid = unpacked.reshape(bits.shape[0], -1)[:, :C] > 0
    return values, valid


@partial(jax.jit, static_argnums=(0,))
def _decode_bucket_jit(C: int, deltas, counts, offsets, uniq, bases):
    """deltas [B, P] (any int dtype, cross-segment delta-encoded posting
    record-ids), counts [B] (true posting counts), offsets [B, K] (CSR
    offsets[1:], padded with n_postings), uniq [B, K] int64 (padded),
    bases [B] -> (values int64 [B, C], valid bool [B, C])."""
    B, P = deltas.shape
    K = uniq.shape[1]
    ids = jnp.cumsum(deltas.astype(jnp.int32), axis=1) + \
        bases[:, None].astype(jnp.int32)
    p = jnp.arange(P, dtype=jnp.int32)
    live = p[None, :] < counts[:, None]
    val_idx = jax.vmap(
        lambda off: jnp.searchsorted(off, p, side="right"))(offsets)
    vals = jnp.take_along_axis(uniq, jnp.clip(val_idx, 0, K - 1), axis=1)
    rowbase = (jnp.arange(B, dtype=jnp.int32) * C)[:, None]
    tgt = jnp.where(live & (ids >= 0) & (ids < C),
                    rowbase + ids, B * C).reshape(-1)
    values = jnp.zeros((B * C + 1,), jnp.int64).at[tgt].set(
        vals.reshape(-1))[: B * C].reshape(B, C)
    valid = jnp.zeros((B * C + 1,), bool).at[tgt].set(
        True)[: B * C].reshape(B, C)
    return values, valid


@partial(jax.jit, static_argnums=(0,))
def _decode_bucket2_jit(C: int, deltas, counts, offsets, uniq, seg_bases):
    """v2 bucket layout: WITHIN-segment posting deltas (narrow) +
    per-segment first-row bases.  ids = seg_base[s] + (cum - cum at the
    segment's first posting); everything else matches _decode_bucket_jit."""
    B, P = deltas.shape
    K = uniq.shape[1]
    cum = jnp.cumsum(deltas.astype(jnp.int32), axis=1)
    p = jnp.arange(P, dtype=jnp.int32)
    live = p[None, :] < counts[:, None]
    val_idx = jax.vmap(
        lambda off: jnp.searchsorted(off, p, side="right"))(offsets)
    start_pos = jnp.where(
        val_idx > 0,
        jnp.take_along_axis(offsets, jnp.clip(val_idx - 1, 0, K - 1),
                            axis=1),
        0).astype(jnp.int32)
    cum_at_start = jnp.take_along_axis(
        cum, jnp.clip(start_pos, 0, P - 1), axis=1)
    sb = jnp.take_along_axis(seg_bases,
                             jnp.clip(val_idx, 0, K - 1), axis=1)
    ids = sb.astype(jnp.int32) + cum - cum_at_start
    vals = jnp.take_along_axis(uniq, jnp.clip(val_idx, 0, K - 1), axis=1)
    rowbase = (jnp.arange(B, dtype=jnp.int32) * C)[:, None]
    tgt = jnp.where(live & (ids >= 0) & (ids < C),
                    rowbase + ids, B * C).reshape(-1)
    values = jnp.zeros((B * C + 1,), jnp.int64).at[tgt].set(
        vals.reshape(-1))[: B * C].reshape(B, C)
    valid = jnp.zeros((B * C + 1,), bool).at[tgt].set(
        True)[: B * C].reshape(B, C)
    return values, valid


def decode_column_batch(containers: list, C: int):
    """Decode one column across a batch of blocks on device.

    containers: list of codec.Container or None (block lacks the column),
    in block order.  Returns (values int64 [B, C], valid bool [B, C],
    ncols tuple) — ncols[i] is the block's num_records, -1 when missing.
    Raises ValueError when any container's shape is unsupported (caller
    falls back to the host decoder)."""
    B = len(containers)
    ncols = []
    kinds = []
    for c in containers:
        if c is None:
            kinds.append("missing")
            ncols.append(-1)
            continue
        enc = c.meta.get("encoding")
        typ = c.meta.get("type")
        ncols.append(int(c.meta["num_records"]))
        if enc == "value" and typ == "int":
            kinds.append("value")
        elif enc == "bucket" and typ in ("int", "str"):
            kinds.append("bucket2" if "seg_bases" in c else "bucket")
        elif enc == "value" and typ == "str":
            kinds.append("str_value")
        else:
            raise ValueError(f"unsupported encoding {typ}/{enc}")
        if ncols[-1] > C:
            raise ValueError("block larger than batch chunk")

    parts = []          # (indices, values [b, C], valid [b, C])
    idx_value = [i for i, k in enumerate(kinds) if k == "value"]
    idx_bucket = [i for i, k in enumerate(kinds) if k == "bucket"]
    idx_bucket2 = [i for i, k in enumerate(kinds) if k == "bucket2"]
    idx_strval = [i for i, k in enumerate(kinds) if k == "str_value"]
    idx_missing = [i for i, k in enumerate(kinds) if k == "missing"]

    if idx_value:
        b = len(idx_value)
        dts = [containers[i].read("deltas") for i in idx_value]
        wide = np.result_type(*[d.dtype for d in dts])
        deltas = np.zeros((b, C), dtype=wide)
        bits = np.zeros((b, C // 8 + (1 if C % 8 else 0)), dtype=np.uint8)
        bases = np.zeros(b, dtype=np.int64)
        for j, i in enumerate(idx_value):
            c = containers[i]
            d = c.read("deltas")
            deltas[j, : len(d)] = d
            vb = c.read("valid_bits")
            bits[j, : len(vb)] = vb
            bases[j] = c.meta.get("base", 0)
        v, m = _decode_value_jit(C, jnp.asarray(deltas), jnp.asarray(bits),
                                 jnp.asarray(bases))
        parts.append((idx_value, v, m))

    if idx_bucket:
        b = len(idx_bucket)
        dts = [containers[i].read("id_deltas") for i in idx_bucket]
        P = _pad_pow2(max((len(d) for d in dts), default=1))
        K = _pad_pow2(max((len(containers[i].read("uniq"))
                           for i in idx_bucket), default=1), floor=8)
        wide = np.result_type(*[d.dtype for d in dts])
        deltas = np.zeros((b, P), dtype=wide)
        counts = np.zeros(b, dtype=np.int32)
        offsets = np.full((b, K), 2**31 - 1, dtype=np.int32)
        uniq = np.zeros((b, K), dtype=np.int64)
        bases = np.zeros(b, dtype=np.int64)
        for j, i in enumerate(idx_bucket):
            c = containers[i]
            d = c.read("id_deltas")
            deltas[j, : len(d)] = d
            counts[j] = len(d)
            off = c.read("offsets")
            offsets[j, : len(off) - 1] = off[1:]
            u = c.read("uniq")
            uniq[j, : len(u)] = u
            bases[j] = c.meta.get("id_base", 0)
        v, m = _decode_bucket_jit(C, jnp.asarray(deltas),
                                  jnp.asarray(counts), jnp.asarray(offsets),
                                  jnp.asarray(uniq), jnp.asarray(bases))
        parts.append((idx_bucket, v, m))

    if idx_bucket2:
        b = len(idx_bucket2)
        dts = [containers[i].read("id_deltas") for i in idx_bucket2]
        P = _pad_pow2(max((len(d) for d in dts), default=1))
        K = _pad_pow2(max((len(containers[i].read("uniq"))
                           for i in idx_bucket2), default=1), floor=8)
        wide = np.result_type(*[d.dtype for d in dts])
        deltas = np.zeros((b, P), dtype=wide)
        counts = np.zeros(b, dtype=np.int32)
        offsets = np.full((b, K), 2**31 - 1, dtype=np.int32)
        uniq = np.zeros((b, K), dtype=np.int64)
        seg_bases = np.zeros((b, K), dtype=np.int32)
        for j, i in enumerate(idx_bucket2):
            c = containers[i]
            d = c.read("id_deltas")
            deltas[j, : len(d)] = d
            counts[j] = len(d)
            off = c.read("offsets")
            offsets[j, : len(off) - 1] = off[1:]
            u = c.read("uniq")
            uniq[j, : len(u)] = u
            sb = c.read("seg_bases")
            seg_bases[j, : len(sb)] = sb
        v, m = _decode_bucket2_jit(C, jnp.asarray(deltas),
                                   jnp.asarray(counts),
                                   jnp.asarray(offsets),
                                   jnp.asarray(uniq),
                                   jnp.asarray(seg_bases))
        parts.append((idx_bucket2, v, m))

    if idx_strval:
        b = len(idx_strval)
        ids = np.zeros((b, C), dtype=np.int32)
        bits = np.zeros((b, C // 8 + (1 if C % 8 else 0)), dtype=np.uint8)
        for j, i in enumerate(idx_strval):
            c = containers[i]
            d = c.read("ids")
            ids[j, : len(d)] = d
            vb = c.read("valid_bits")
            bits[j, : len(vb)] = vb
        v, m = _decode_ids_jit(C, jnp.asarray(ids), jnp.asarray(bits))
        parts.append((idx_strval, v, m))

    if idx_missing:
        z = jnp.zeros((len(idx_missing), C), jnp.int64)
        parts.append((idx_missing, z, z.astype(bool)))

    if len(parts) == 1 and len(parts[0][0]) == B:
        values, valid = parts[0][1], parts[0][2]
    else:
        # reassemble block order with one device gather
        order = np.concatenate([np.asarray(ix, dtype=np.int64)
                                for ix, _, _ in parts])
        inv = np.empty(B, dtype=np.int64)
        inv[order] = np.arange(B)
        allv = jnp.concatenate([p[1] for p in parts], axis=0)
        allm = jnp.concatenate([p[2] for p in parts], axis=0)
        ginv = jnp.asarray(inv)
        values, valid = allv[ginv], allm[ginv]
    return values, valid, tuple(ncols)
