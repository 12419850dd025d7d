"""The device scan kernel: filter + group-by + aggregate over a batch of
column blocks in one jitted XLA computation.

This replaces the reference's per-record interpreted hot loop
(FilterAndAggRecords, src/lib/aggregate.go:56-282) with a vectorized
pipeline over [B, CHUNK] columnar arrays.  Two strategies, chosen
statically at bind time:

dense   when every group key column has a known bounded cardinality
        (string columns: global dictionary size; int/time columns: the
        table-level IntInfo min/max range) and the product of
        cardinalities is small.  Group ids are computed arithmetically
        (mixed-radix digits, digit 0 = the reference's MISSING_VALUE)
        and the aggregation becomes ONE-HOT x LANES int8 matmuls on the
        MXU: each int64 lane is decomposed into 16 exact 4-bit nibbles,
        one-hot[rows, G] @ nibbles[rows, L*16] accumulates in int32 and
        recombines mod 2^64 — bit-exact int64 segment sums at MXU speed,
        no sort, no scatter, no gather.  Because IntInfo min/max are
        outlier-resistant (table_column_info.go:75-117) an int key can
        fall outside its declared range; such rows raise a `spill`
        counter in the meta row and the engine re-runs the query on the
        sorted strategy.

sorted  the general fallback: one multi-key sort over the flattened
        batch (cheap on TPU), segment boundaries give group ids, and all
        sums go through a single stacked nibble-int32 scatter-add (exact
        mod 2^64) instead of per-lane int64 scatters.

  1. predicate masks (vectorized compares; regexes arrive as precomputed
     dictionary bitsets — the device only gathers, mirroring the RCache
     idea in filter.go:216-231)
  2. group keys as int64 lanes (int value / global str id / -1 missing —
     two's-complement -1 IS the reference's MaxUint64 MISSING_VALUE)
  3. group ids: dense mixed-radix digits, or sort + boundary cumsum
  4. segment reductions for count / Σw / Σw·v / min / max and weighted
     histogram bucket counts (bucket math mirrors hist_basic.go:132-150,
     outliers clamped into the last slot; raw outlier values are exposed
     for the host-side stddev/sparse-bucket fix-up)

Unmatched rows land in a dead slot (dense) or sort last under sentinel
keys (sorted).  Groups beyond the cap are dropped, mirroring
INTERNAL_RESULT_LIMIT (aggregate.go:15,192).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = np.iinfo(np.int64).max
MISSING = -1  # two's-complement of the reference's MaxUint64 MISSING_VALUE

# dense strategy limits: slots after the mixed-radix expansion (+1 dead
# slot, padded to a lane multiple); bounded by download size (8 KB/lane/
# 1k slots) and one-hot matmul cost (R x G x L*16 int8 MACs)
DENSE_SLOT_CAP = 8192
# with a banded window the matmul cost no longer scales with slots;
# the [slots, T] int64 accumulator (+ compact download) is the bound
DENSE_WINDOW_SLOT_CAP = 65536
_LANE = 128                     # MXU/VPU lane width
NIBBLES = 16                    # 16 x 4-bit limbs = one exact int64


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


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
    track_outliers: bool = False
    want_matched_mask: bool = False
    # dense-strategy metadata, aligned with [time?, *group_cols]:
    #   key_bounds[i] = (min_value, cardinality); cardinality 0 = unbounded.
    # For the time key the bound is on the bucket quotient trunc_div(t, tb).
    key_bounds: tuple[tuple[int, int], ...] = ()
    force_sorted: bool = False   # spill fallback
    # packed-download shaping (host<->device sync is the expensive
    # resource: one buffer, no scalar reads)
    prefix_rows: int = 8192      # group rows downloaded eagerly
    hist_prefix: int = 128       # dense hist group rows downloaded eagerly
    max_out: int = 1024          # compacted outlier rows per agg
    max_pairs: int = 16384       # compacted distinct pairs
    max_hist_pairs: int = 8192   # compacted (group, bucket) hist rows
    # device-side intermediate top-k (PruneResults, aggregate.go:469-471,
    # run ON the chip): >0 = ship only the prune_topk best group rows per
    # batch instead of the full table.  Sorted strategy, no hist/distinct
    # lanes (engine enforces).  prune_agg: score = that agg's mean;
    # -1 = weighted count ($COUNT).
    prune_topk: int = 0
    prune_agg: int = -1
    # sorted-strategy key packing: when every group key is exactly
    # dictionary-bounded (str cols only — int bounds from IntInfo are
    # outlier-resistant and may be exceeded), the multi-key sort packs
    # all keys into ONE mixed-radix integer (int32 when it fits),
    # halving sort payload.  (min, card) per group key; () = off.
    sort_pack: tuple[tuple[int, int], ...] = ()
    # lane limb compression: per-sum-lane byte-limb counts in {1,2,4,8},
    # aligned with [count, samples, (exists, kw, kwv)*A].  Derived at
    # bind time from EXACT per-block column bounds (BlockInfo.int_exact):
    # a 0/1-valued lane needs ONE byte limb, not eight, shrinking the
    # MXU/scatter accumulation matrix up to 8x.  () = all lanes full
    # width (legacy blocks without exact stats).  agg_vbias biases each
    # agg's value nonneg (kwv' = kw*(v-bias)); the host reconstructs
    # Σkwv = Σkwv' + bias*Σkw.
    lane_limbs8: tuple[int, ...] = ()
    agg_vbias: tuple[int, ...] = ()
    # windowed dense accumulation for time-major rollups (>0 = band
    # size in slots, derived at bind time from exact per-block time
    # bounds): each chunk's one-hot covers only [window, ch] bands of
    # the gid space instead of [dense_slots, ch] — digestion
    # time-sorts rows, so a block spans few time buckets
    window: int = 0
    # band sub-chunking: rows WITHIN a block are time-sorted too, so a
    # fraction of a block spans a fraction of its bucket range — the
    # band loop chunks at window_chunk rows (not the full block) and
    # the window shrinks proportionally.  One-hot traffic is R*window
    # bytes regardless of chunk size, so an 8x narrower window per
    # 1/8-block chunk is ~8x less traffic.  0 = chunk at block size.
    window_chunk: int = 0
    # exact time bounds (engine bind) prove the time column and bucket
    # fit int32: the per-row bucket division then runs at int32 speed
    # (64-bit div/mul are emulated multi-pass ops on the VPU)
    time_i32: bool = False
    # device-side HyperLogLog (SURVEY §7): single distinct column with
    # dense-bounded group keys -> per-group 2^14 uint8 register planes
    # updated by scatter-max ON the chip, no sort and no pair download.
    # The (register, rank) law is bit-identical to the host HLL
    # (query/hll.py), so estimates match exactly.  hll_hash_idx: index
    # into the bitsets tuple holding precomputed per-dict-id uint64
    # hashes (str cols; entry dict_size = the missing-value hash);
    # -1 = int distinct col, FNV-1a+splitmix computed in-kernel.
    hll: bool = False
    hll_hash_idx: int = -1
    hll_ship: int = 8       # register planes shipped in the packed buffer
    # exact per-ROW value bounds for each sum lane (aligned with
    # lane_limbs8; 0 = unknown).  The enumerated strategy packs lanes
    # whose cumulative sums provably fit disjoint bit fields into one
    # int64 carried THROUGH the sort — replacing a 40-byte/row gather
    # with a sort operand and one cumsum (measured 67ms -> 5ms at 4M).
    lane_row_bounds: tuple[int, ...] = ()
    # lanes PROVEN equal to the per-group matched-row count (samples):
    # a fully-populated agg column makes its exists lane redundant, and
    # with discard-proof bounds and no weight column its kw lane too —
    # the enumerated strategy then derives them from the key ranges for
    # free instead of carrying them through the sort
    lane_nrows: tuple[bool, ...] = ()
    # mesh scans shuffle the table: rows are no longer slot-aligned, so
    # the compact (keyless) dense table download must stay off
    no_compact_table: bool = False
    # virtual cache-group key: when group_cols contains "__cg__" and
    # vg_span > 0, the kernel synthesizes that key as block_index //
    # vg_span via iota — no host column upload (the cache path scans
    # many 16-block groups per dispatch and splits results by it)
    vg_span: int = 0

    @property
    def n_key_cols(self) -> int:
        return max(len(self.group_cols) + (1 if self.time_col else 0), 1)

    @property
    def vg_first(self) -> bool:
        """Cache-group scans under a time rollup emit the synthesized
        __cg__ key MOST significant (before the time key): each block
        has one cg value, so a chunk's mixed-radix gids stay one narrow
        contiguous band and the windowed sweep still applies.  Key
        order (and key_bounds alignment) becomes [cg, time?, *groups]."""
        return (self.vg_span > 0 and bool(self.time_col)
                and "__cg__" in self.group_cols)

    @property
    def time_key_pos(self) -> int:
        """Index of the time key in the emitted key order; -1 if none."""
        if not self.time_col:
            return -1
        return 1 if self.vg_first else 0

    @property
    def n_all_keys(self) -> int:
        return self.n_key_cols + len(self.distinct_cols)

    @property
    def dense_slots(self) -> int:
        """Mixed-radix slot count (+1 per key for MISSING, +1 dead slot),
        lane-padded; 0 if any key is unbounded or the product too big.
        The banded window sweep decouples the one-hot matmul cost from
        the slot count, so a windowed rollup (and the vgrouped cache
        scans stacked on top of one) may use a much larger table — the
        remaining bound is the [slots, T] accumulator and the download."""
        if self.force_sorted or (self.distinct_cols and not self.hll):
            return 0
        nk = len(self.group_cols) + (1 if self.time_col else 0)
        if len(self.key_bounds) != nk:
            return 0
        cap = DENSE_WINDOW_SLOT_CAP if self.window > 0 else DENSE_SLOT_CAP
        g = 1
        for (_, card) in self.key_bounds:
            if card <= 0:
                return 0
            g *= card + 1           # digit 0 reserved for MISSING
            if g > cap:
                return 0
        slots = _round_up(g + 1, _LANE)   # +1 dead slot for unmatched rows
        if slots > cap or g > self.max_groups:
            return 0
        return slots

    @property
    def strategy(self) -> str:
        return "dense" if self.dense_slots else "sorted"

    @property
    def table_slots(self) -> int:
        """Rows in the on-device group table."""
        return self.dense_slots or self.max_groups


def _trunc_div(x, d):
    """Go integer division truncates toward zero."""
    q = jnp.abs(x) // d
    return jnp.where(x >= 0, q, -q)


def _nibbles(lanes):
    """int64 [R, L] -> exact 4-bit limbs as int8 [R, L*16] (two's
    complement: recombining mod 2^64 restores the signed value).
    Derived from the byte bitcast — uint8 shifts are VPU-native, while
    64-bit shifts are emulated multi-pass ops that dominate runtime."""
    R, L = lanes.shape
    b = jax.lax.bitcast_convert_type(lanes, jnp.uint8)   # [R, L, 8] LE
    lo = b & jnp.uint8(0xF)
    hi = b >> jnp.uint8(4)
    nib = jnp.stack([lo, hi], axis=-1)                   # [R, L, 8, 2]
    return nib.astype(jnp.int8).reshape(R, L * NIBBLES)


def _recombine(acc, L):
    """int64 nibble sums [S, L*16] -> exact int64 [S, L] mod 2^64."""
    S = acc.shape[0]
    u = acc.astype(jnp.uint64).reshape(S, L, NIBBLES)
    sh = (jnp.arange(NIBBLES, dtype=jnp.uint64) * 4)
    return jnp.sum(u << sh[None, None, :], axis=-1).astype(jnp.int64)


LIMBS8 = 8


def _limbs8(lanes):
    """int64 [R, L] -> exact byte limbs uint8 [R, L*8], a pure bitcast
    (little-endian).  Byte entries are exact in bf16, so one-hot x limb
    dots run on the MXU in its native bf16 x bf16 -> f32 mode; a chunk's
    partial sums stay exact as long as chunk_rows * 255 < 2^24."""
    R, L = lanes.shape
    return jax.lax.bitcast_convert_type(lanes, jnp.uint8).reshape(
        R, L * LIMBS8)


def _recombine8(acc, L):
    """int64 byte-limb sums [S, L*8] -> exact int64 [S, L] mod 2^64."""
    S = acc.shape[0]
    u = acc.astype(jnp.uint64).reshape(S, L, LIMBS8)
    sh = (jnp.arange(LIMBS8, dtype=jnp.uint64) * 8)
    return jnp.sum(u << sh[None, None, :], axis=-1).astype(jnp.int64)


def _lane_limbs(config: ScanConfig, L: int) -> tuple[int, ...]:
    """Per-lane byte-limb counts (ScanConfig.lane_limbs8, or all-8)."""
    if config.lane_limbs8 and len(config.lane_limbs8) == L:
        return config.lane_limbs8
    return (8,) * L


def _limbs8_ragged(lanes, limbs8):
    """int64 [R, L] -> uint8 [R, T] keeping only each lane's first
    limbs8[i] little-endian bytes (exact when the lane's addends are
    nonneg and < 2^(8*limbs8[i]) — guaranteed by the bind-time bounds)."""
    R, L = lanes.shape
    if all(k == 1 for k in limbs8):
        # every lane fits one byte: the limb matrix is just a cast —
        # no bitcast/slice/concatenate passes (profiled at ~20ms/64M)
        return lanes.astype(jnp.uint8)
    b = jax.lax.bitcast_convert_type(lanes, jnp.uint8)     # [R, L, 8] LE
    parts = [b[:, i, :k] for i, k in enumerate(limbs8)]
    return jnp.concatenate(parts, axis=1)

def _recombine8_ragged(acc, limbs8):
    """int64 byte-limb sums [S, T] -> int64 [S, L] under the ragged
    layout (full-width lanes recombine mod 2^64 as before)."""
    outs = []
    off = 0
    for k in limbs8:
        u = acc[:, off: off + k].astype(jnp.uint64)
        sh = (jnp.arange(k, dtype=jnp.uint64) * 8)
        outs.append(jnp.sum(u << sh[None, :], axis=-1).astype(jnp.int64))
        off += k
    return jnp.stack(outs, axis=1)


def _nibbles_ragged(lanes, limbs8):
    """int64 [R, L] -> int8 4-bit limbs [R, T2], keeping 2*limbs8[i]
    nibbles per lane (the sorted-path analog of _limbs8_ragged)."""
    R, L = lanes.shape
    b = jax.lax.bitcast_convert_type(lanes, jnp.uint8)     # [R, L, 8] LE
    lo = b & jnp.uint8(0xF)
    hi = b >> jnp.uint8(4)
    nib = jnp.stack([lo, hi], axis=-1).reshape(R, L, NIBBLES)
    parts = [nib[:, i, :2 * k] for i, k in enumerate(limbs8)]
    return jnp.concatenate(parts, axis=1).astype(jnp.int8)


def _recombine_nib_ragged(acc, limbs8):
    """int64 nibble sums [S, T2] -> int64 [S, L] under the ragged
    layout."""
    outs = []
    off = 0
    for k in limbs8:
        n = 2 * k
        u = acc[:, off: off + n].astype(jnp.uint64)
        sh = (jnp.arange(n, dtype=jnp.uint64) * 4)
        outs.append(jnp.sum(u << sh[None, :], axis=-1).astype(jnp.int64))
        off += n
    return jnp.stack(outs, axis=1)


# ---------------------------------------------------------------------------
# shared front end: filters, key lanes, weight, aggregation lanes
# ---------------------------------------------------------------------------

def _front_end(config: ScanConfig, cols, nrec, filter_vals, bitsets,
               time_bucket, set_aux):
    some = next(iter(cols.values()))[0]
    B, C = some.shape
    R = B * C

    def flat(x):
        return x.reshape(R)

    row_in_range = flat(
        jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
        < nrec[:, None])

    # filters (all must match; missing column value always fails)
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

    def cg_key():
        # synthesized cache-group index: block position // span
        bi = jax.lax.broadcasted_iota(jnp.int64, (B, C), 0)
        return flat(bi) // config.vg_span

    if config.vg_first:
        keys.append(cg_key())
    if config.time_col:
        tvals, tvalid = cols[config.time_col]
        matched = matched & flat(tvalid)
        tv = flat(tvals)
        if config.time_i32:
            tb32 = time_bucket.astype(jnp.int32)
            q = _trunc_div(tv.astype(jnp.int32), tb32)
            tb = (q * tb32).astype(jnp.int64)
        else:
            tb = _trunc_div(tv, time_bucket) * time_bucket
        keys.append(tb)

    for g in config.group_cols:
        if g == "__cg__" and config.vg_span > 0 and g not in cols:
            if not config.vg_first:
                keys.append(cg_key())
            continue
        gvals, gvalid = cols[g]
        keys.append(jnp.where(flat(gvalid), flat(gvals), MISSING))

    if not keys:
        keys = [jnp.zeros((R,), jnp.int64)]  # single global group

    dkeys = []
    for d in config.distinct_cols:
        dvals, dvalid = cols[d]
        dkeys.append(jnp.where(flat(dvalid), flat(dvals), MISSING))

    # weight lane (aggregate.go:100-102)
    if config.weight_col:
        wv, wvalid = cols[config.weight_col]
        weight = jnp.where(flat(wvalid), flat(wv), 1)
    else:
        weight = jnp.ones((R,), jnp.int64)

    return B, C, R, flat, matched, keys, dkeys, weight


def _agg_row_data(config: ScanConfig, cols, flat, matched, weight):
    """Per-agg (value, keep-mask) rows plus the stacked int64 sum lanes
    [R, L] with L = 2 + 3*A: [count=w, samples=1, (exists, kw, kwv)*A].
    With agg_vbias set, the kwv lane carries kw*(v-bias) — nonneg under
    the bind-time exact bounds — and the host adds bias*Σkw back."""
    R = matched.shape[0]
    lanes = [jnp.where(matched, weight, 0),
             jnp.where(matched, 1, 0).astype(jnp.int64)]
    per_agg = []
    vbias = config.agg_vbias or (0,) * len(config.aggs)
    for agg, bias in zip(config.aggs, vbias):
        avals, avalid = cols[agg.col]
        v, populated = flat(avals), flat(avalid)
        keep = matched & populated & ~((v > agg.discard_max) |
                                       (v < agg.discard_min))
        kw = jnp.where(keep, weight, 0)
        lanes += [jnp.where(matched & populated, 1, 0).astype(jnp.int64),
                  kw, kw * (v - bias) if bias else kw * v]
        per_agg.append((v, keep))
    return jnp.stack(lanes, axis=1), per_agg


def _hist_bucket(agg: AggSpec, v):
    """-> (bucket id int32 [R], in-any-range bool, is-outlier bool, nv)."""
    if agg.sub_edges:
        # multihist: first matching sub-range, top range first
        # (hist_multi.go:81-87); a value overflowing its sub's bucket
        # array is a sub-outlier (folded into the sub's last slot AND
        # recorded raw, hist_basic.go:133-137)
        bv = jnp.zeros(v.shape, jnp.int32)
        assigned = jnp.zeros(v.shape, bool)
        is_out = jnp.zeros(v.shape, bool)
        for (smin, smax, sbs, snv, soff) in agg.sub_edges:
            inrange = (v >= smin) & (v <= smax) & ~assigned
            raw_bv = _trunc_div(v - smin, sbs)
            is_out = is_out | (inrange & (raw_bv >= snv))
            sub_bv = jnp.clip(raw_bv, 0, snv - 1)
            bv = jnp.where(inrange, sub_bv.astype(jnp.int32) + soff, bv)
            assigned = assigned | inrange
        return bv, assigned, is_out, agg.num_values
    nv = agg.num_values
    raw_bv = _trunc_div(v - agg.hist_min, agg.bucket_size)
    is_out = raw_bv >= nv
    bv = jnp.clip(raw_bv, 0, nv - 1).astype(jnp.int32)
    return bv, jnp.ones(v.shape, bool), is_out, nv


def _hist_matmul(gid, hcontrib, weight, bv, nv, slots, weighted):
    """Dense-strategy histogram counts [slots, nv] as chunked one-hot x
    one-hot MXU matmuls: counts[g, b] = Σ rows 1[gid=g]·w·1[bv=b].
    Replaces the [R]-row scatter-add, which XLA lowers to a serial loop
    (profiled ~70ms per 8M-row hist scan vs ~8ms for this form).  Exact:
    one-hot entries are 0/1 (or byte-bounded weights, <=255, exact in
    bf16) and a chunk's f32 partial sums stay below 2^24."""
    R = gid.shape[0]
    ch = max(_LANE, min(R, 1 << 16))
    ch = 1 << (ch.bit_length() - 1)
    nchunk = -(-R // ch)
    iot = jnp.arange(slots, dtype=jnp.int32)[:, None]
    rix = jnp.arange(ch, dtype=jnp.int32)
    bvv = jnp.arange(nv, dtype=jnp.int32)[None, :]
    wrow = jnp.where(hcontrib, weight, 0) if weighted else \
        hcontrib.astype(jnp.int32)
    gid, bv, wrow = jax.lax.optimization_barrier(
        (gid, bv.astype(jnp.int32), wrow))

    def body(c, acc):
        start = jnp.minimum(c * ch, R - ch)
        gs = jax.lax.dynamic_slice(gid, (start,), (ch,))
        bs = jax.lax.dynamic_slice(bv, (start,), (ch,))
        ws = jax.lax.dynamic_slice(wrow, (start,), (ch,))
        fresh = (start + rix) >= c * ch
        oh_g = ((iot == gs[None, :]) & fresh[None, :]).astype(jnp.bfloat16)
        oh_b = jnp.where(bs[:, None] == bvv, ws[:, None], 0).astype(
            jnp.bfloat16)                                   # [ch, nv]
        d = jax.lax.dot_general(oh_g, oh_b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + d.astype(jnp.int64)

    return jax.lax.fori_loop(0, nchunk, body,
                             jnp.zeros((slots, nv), jnp.int64))


def _hist_scatter(gid, hcontrib, weight, bv, nv, Sh, weighted=True,
                  wlimbs8=8):
    """Weighted histogram counts [Sh, nv] via one exact stacked scatter.
    wlimbs8: byte-limb bound on the weight (ScanConfig.lane_limbs8[0])
    — a bounded nonneg weight needs 2*wlimbs8 nibbles, not 16."""
    flat_id = jnp.where(hcontrib, gid * nv + bv, Sh * nv)
    if not weighted:
        # unweighted counts fit int32 exactly (one lane, 16x less traffic)
        acc = jnp.zeros((Sh * nv + 1,), jnp.int32).at[flat_id].add(
            jnp.int32(1))
        return acc[:Sh * nv].astype(jnp.int64).reshape(Sh, nv)
    n = 2 * wlimbs8
    wl = _nibbles(jnp.where(hcontrib, weight, 0)[:, None])[:, :n]
    acc = jnp.zeros((Sh * nv + 1, n), jnp.int32).at[flat_id].add(
        wl.astype(jnp.int32))
    u = acc[:Sh * nv].astype(jnp.uint64)
    sh = (jnp.arange(n, dtype=jnp.uint64) * 4)
    return jnp.sum(u << sh[None, :], axis=-1).astype(
        jnp.int64).reshape(Sh, nv)


def _outlier_outputs(out, config, ai, hcontrib, is_out, v, key_rows):
    """Expose compactable outlier rows keyed by group-key tuple (never
    local gid) so the host fix-up also works on sharded partials."""
    out_rows = hcontrib & is_out
    out[f"agg{ai}_nout"] = jnp.sum(out_rows.astype(jnp.int64))
    out[f"agg{ai}_out_mask"] = out_rows
    out[f"agg{ai}_out_val"] = jnp.where(out_rows, v, 0)
    out["sorted_gkeys"] = key_rows


# ---------------------------------------------------------------------------
# dense strategy: mixed-radix gid + one-hot int8 MXU matmul
# ---------------------------------------------------------------------------

def _dense_gid(config: ScanConfig, keys, matched, time_bucket):
    """-> (gid int32 [R] in [0, slots), spill count, decode fn).

    Digits: digit_i = clamp(key_i - min_i, 0, card_i-1) + 1, 0 for
    MISSING; unmatched rows get the dead slot (slots-1).  Rows whose key
    falls outside the declared bound spill (IntInfo min/max are
    outlier-resistant so this CAN happen for int keys)."""
    slots = config.dense_slots
    R = keys[0].shape[0]
    # gid accumulates in int32 (slots <= 64Ki): int64 multiplies are
    # emulated multi-pass ops on the VPU and showed up as the largest
    # front-end fusion in rollup traces
    gid = jnp.zeros((R,), jnp.int32)
    spilled = jnp.zeros((R,), bool)
    tpos = config.time_key_pos
    if not config.key_bounds:      # no group cols: one global group
        gid = jnp.where(matched, 0, slots - 1).astype(jnp.int32)
        return gid, jnp.zeros((), jnp.int64)
    for i, k in enumerate(keys):
        mn, card = config.key_bounds[i]
        if i == tpos:
            # the time key lane is trunc_div(t,tb)*tb; bound is on the
            # quotient (matched rows always have time populated)
            if config.time_i32:
                q = _trunc_div(k.astype(jnp.int32),
                               time_bucket.astype(jnp.int32))
            else:
                q = _trunc_div(k, time_bucket)
            digit = q - mn + 1
            spilled = spilled | (q < mn) | (q >= mn + card)
        else:
            digit = jnp.where(k == MISSING, 0, k - mn + 1)
            spilled = spilled | ((k != MISSING) &
                                 ((k < mn) | (k >= mn + card)))
        gid = gid * (card + 1) + jnp.clip(digit, 0, card).astype(jnp.int32)
    gid = jnp.where(matched, gid, slots - 1)
    spill = jnp.sum((spilled & matched).astype(jnp.int64))
    return gid, spill


def _dense_decode_keys(config: ScanConfig, time_bucket):
    """Device-side gid -> key tuple decode for the [slots, K] table."""
    slots = config.dense_slots
    sid = jnp.arange(slots, dtype=jnp.int64)
    cols = []
    tpos = config.time_key_pos
    for i in reversed(range(len(config.key_bounds))):
        mn, card = config.key_bounds[i]
        digit = sid % (card + 1)
        sid = sid // (card + 1)
        if i == tpos:
            val = (digit - 1 + mn) * time_bucket
        else:
            val = jnp.where(digit == 0, MISSING, digit - 1 + mn)
        cols.append(val)
    cols.reverse()
    if not cols:
        cols = [jnp.zeros((slots,), jnp.int64)]
    return jnp.stack(cols, axis=1)     # [slots, K]


def _dense_reduce(gid, lanes64, minmax_vs, slots, limbs8=None,
                  window=0, matched=None, chunk=0):
    """One fused chunked pass over the rows computing
      - exact int64 segment sums of all nibble lanes on the MXU, and
      - per-slot min/max for every aggregation value lane.

    window > 0 (with matched + chunk set): the windowed form for
    time-major big-slot rollups.  Digestion sorts rows by time, so one
    chunk (= one block when chunk == C) spans only a narrow band of the
    mixed-radix gid space; the one-hot is built against a [window, ch]
    BANDS swept across the chunk's actual matched-gid span (an inner
    while_loop from min to max gid in window steps) and accumulated
    into the full [slots, T] table with dynamic-slice read-modify-
    writes — turning the [slots, ch] one-hot traffic (the whole cost
    of a 7k-slot rollup) into [window, ch] per band, with the band
    count proportional to the span the chunk REALLY covers.  A
    time-local block does one band; a wide straggler (a partial-block
    top-up spanning the whole time range) sweeps as many bands as it
    needs — so there is no window spill path and no separate
    wide-block engine pass (rounds 3-4 split wide blocks into a second
    dispatch on the plain kernel; ref aggregate.go:146-183).

    The dot runs bf16 x bf16 -> f32: that is the TPU MXU's native mode
    (int8 dots lower to slow vector loops).  It stays EXACT because
    one-hot entries are 0/1 and nibble entries are 0..15 — both exactly
    representable in bf16 — and a chunk's partial sums are bounded by
    ch*15 <= 2^19*15 < 2^24, inside f32's exact-integer range; chunk
    partials then accumulate in int64 and nibbles recombine mod 2^64.

    minmax_vs: list of (v int64[R], keep bool[R], f32_ok) — f32_ok is
    static (derived from the agg's discard bounds at bind time): when
    |v| < 2^24 the masked min/max reduce runs in f32 on the VPU, half
    the traffic of int64; otherwise it falls back to exact int64."""
    R, L = lanes64.shape
    A = len(minmax_vs)
    if limbs8 is None:
        limbs8 = (LIMBS8,) * L
    nib = _limbs8_ragged(lanes64, limbs8)        # [R, T] uint8, bitcast
    T = nib.shape[1]
    if window and (not chunk or R % chunk or matched is None):
        window = 0                               # shape precondition
    if window:
        ch = chunk
        nchunk = R // ch
    else:
        # chunk rows: the one-hot temp stays small AND ch*255 < 2^24 so
        # the f32 MXU accumulation of byte limbs is exact
        # (65536*255 < 2^24)
        ch = max(_LANE, min(R, (1 << 25) // max(slots, 1), 1 << 16))
        ch = 1 << (ch.bit_length() - 1)          # power of two
        nchunk = -(-R // ch)
    # one-hot built TRANSPOSED [slots, ch]: the dot becomes a standard
    # [M,K]@[K,N] that XLA lowers onto the MXU (contracting dim 0 of both
    # operands lowers to a slow VPU fusion instead), and the min/max
    # masked reduce runs along lanes (axis 1) — 4x faster end to end
    iot = jnp.arange(slots, dtype=jnp.int32)[:, None]
    rix = jnp.arange(ch, dtype=jnp.int32)

    if A:
        vmat = jnp.stack([v for v, _, _ in minmax_vs], axis=1)   # [R, A]
        kmat = jnp.stack([k for _, k, _ in minmax_vs], axis=1)   # [R, A]
    all_f32 = all(ok for _, _, ok in minmax_vs) if A else True

    # materialize the loop inputs: without the barrier XLA fuses their
    # producer chains into the loop body's dynamic_slices and recomputes
    # the ENTIRE front end once per chunk — a ~30x slowdown
    if A:
        gid, nib, vmat, kmat = jax.lax.optimization_barrier(
            (gid, nib, vmat, kmat))
    else:
        gid, nib = jax.lax.optimization_barrier((gid, nib))

    BIG = jnp.float32(3.0e38) if all_f32 else jnp.int64(2**62)
    mdt = jnp.float32 if all_f32 else jnp.int64

    if window:
        Wb = window
        iot_w = jnp.arange(Wb, dtype=jnp.int32)[:, None]
        # accumulators run TRANSPOSED [T, slots]: with T of ~2-30 lanes
        # a [slots, T] layout wastes ~96% of every (8, 128) tile, and
        # every band RMW would touch the padded tiles; [T, slots] keeps
        # the 128-lane dim dense.  The dot produces [T, Wb] directly
        # (contract ch of sl with ch of hit — no transposes appear).
        # matched is NOT a separate stream here: unmatched rows already
        # carry the dead slot (slots-1), which the band range check
        # excludes by construction (lo/hi scan ignores slots-1).

        def wbody(c, state):
            acc, mn, mx = state
            start = c * ch
            gs = jax.lax.dynamic_slice(gid, (start,), (ch,))
            sl = jax.lax.dynamic_slice(nib, (start, 0), (ch, T))
            # the chunk's REAL matched-gid span decides how many bands
            # to sweep; a chunk with no matched rows sweeps zero
            dead = jnp.int32(slots - 1)
            lo_c = jnp.min(jnp.where(gs == dead, jnp.int32(2**30), gs))
            hi_c = jnp.max(jnp.where(gs == dead, jnp.int32(-1), gs))
            nbands = jnp.maximum((hi_c - lo_c + Wb) // Wb, 0)
            if A:
                vs = jax.lax.dynamic_slice(
                    vmat, (start, 0), (ch, A)).astype(mdt)
                ks = jax.lax.dynamic_slice(kmat, (start, 0), (ch, A))

            def bband(st2):
                b, acc, mn, mx = st2
                anchor0 = lo_c + b * Wb
                # clip keeps the RMW slice in bounds; the hit mask uses
                # the UNclipped anchor so overlapping clipped bands
                # never double-count a row; the dead slot can only fall
                # inside the last band's clipped range when hi_c reaches
                # it, which the lo/hi scan above excludes
                anchor = jnp.clip(anchor0, 0, max(slots - Wb, 0))
                rel = gs - anchor
                hitm = (gs >= anchor0) & (gs < anchor0 + Wb) & (gs != dead)
                hit = (iot_w == rel[None, :]) & hitm[None, :]  # [Wb, ch]
                d = jax.lax.dot_general(
                    sl.astype(jnp.bfloat16), hit.astype(jnp.bfloat16),
                    (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [T, Wb]
                z = jnp.asarray(0, anchor.dtype)
                band = jax.lax.dynamic_slice(acc, (z, anchor), (T, Wb))
                acc = jax.lax.dynamic_update_slice(
                    acc, band + d.astype(jnp.int64), (z, anchor))
                if A:
                    bmn = jax.lax.dynamic_slice(mn, (z, anchor), (A, Wb))
                    bmx = jax.lax.dynamic_slice(mx, (z, anchor), (A, Wb))
                    for a in range(A):
                        h = hit & ks[:, a][None, :]
                        bmn = bmn.at[a, :].min(jnp.min(
                            jnp.where(h, vs[:, a][None, :], BIG), axis=1))
                        bmx = bmx.at[a, :].max(jnp.max(
                            jnp.where(h, vs[:, a][None, :], -BIG), axis=1))
                    mn = jax.lax.dynamic_update_slice(mn, bmn, (z, anchor))
                    mx = jax.lax.dynamic_update_slice(mx, bmx, (z, anchor))
                return b + 1, acc, mn, mx

            _, acc, mn, mx = jax.lax.while_loop(
                lambda st2: st2[0] < nbands, bband,
                (jnp.int32(0), acc, mn, mx))
            return acc, mn, mx

        acc, mn, mx = jax.lax.fori_loop(
            0, nchunk, wbody,
            (jnp.zeros((T, slots), jnp.int64),
             jnp.full((max(A, 1), slots), BIG, mdt),
             jnp.full((max(A, 1), slots), -BIG, mdt)))
        sums = _recombine8_ragged(acc.T, limbs8)   # [slots, L]
        mn, mx = mn.T, mx.T
        if A and all_f32:
            mn = jnp.where(mn >= BIG, jnp.float32(2.0**62),
                           mn).astype(jnp.int64)
            mx = jnp.where(mx <= -BIG, -jnp.float32(2.0**62),
                           mx).astype(jnp.int64)
        return sums, mn, mx, jnp.zeros((), jnp.int64)

    def body(c, state):
        acc, mn, mx = state
        start = jnp.minimum(c * ch, R - ch)
        gs = jax.lax.dynamic_slice(gid, (start,), (ch,))
        sl = jax.lax.dynamic_slice(nib, (start, 0), (ch, T))
        fresh = (start + rix) >= c * ch          # clamp-overlap mask
        hit = (iot == gs[None, :]) & fresh[None, :]          # [slots, ch]
        oh = hit.astype(jnp.bfloat16)
        d = jax.lax.dot_general(oh, sl.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = acc + d.astype(jnp.int64)
        if A:
            # scatter-min over [R] profiled ~10x WORSE than these masked
            # broadcast reduces (XLA lowers 64M-row scatters to serial
            # loops); keep min/max inside the chunk loop
            vs = jax.lax.dynamic_slice(vmat, (start, 0), (ch, A)).astype(mdt)
            ks = jax.lax.dynamic_slice(kmat, (start, 0), (ch, A))
            for a in range(A):
                h = hit & ks[:, a][None, :]
                mn = mn.at[:, a].min(jnp.min(
                    jnp.where(h, vs[:, a][None, :], BIG), axis=1))
                mx = mx.at[:, a].max(jnp.max(
                    jnp.where(h, vs[:, a][None, :], -BIG), axis=1))
        return acc, mn, mx

    acc, mn, mx = jax.lax.fori_loop(
        0, nchunk, body,
        (jnp.zeros((slots, T), jnp.int64),
         jnp.full((slots, max(A, 1)), BIG, mdt),
         jnp.full((slots, max(A, 1)), -BIG, mdt)))
    sums = _recombine8_ragged(acc, limbs8)       # [slots, L]
    if A and all_f32:
        # f32 path: values were exact integers, so the cast back is exact;
        # empty slots read +/-BIG which the caller masks via exists/count
        mn = jnp.where(mn >= BIG, jnp.float32(2.0**62), mn).astype(jnp.int64)
        mx = jnp.where(mx <= -BIG, -jnp.float32(2.0**62), mx).astype(jnp.int64)
    return sums, mn, mx, jnp.zeros((), jnp.int64)


HLL_P = 14
HLL_M = 1 << HLL_P


def _hash_int_col(v):
    """FNV-1a 64 over the 8 little-endian bytes of v, splitmix64
    finalizer — bit-identical to query/hll.py hash64 on the reference's
    int fast-path packing (aggregate.go:208-222)."""
    h = jnp.full(v.shape, 0xcbf29ce484222325, jnp.uint64)
    prime = jnp.uint64(0x100000001b3)
    u = v.astype(jnp.uint64)
    for i in range(8):
        b = (u >> jnp.uint64(8 * i)) & jnp.uint64(0xFF)
        h = (h ^ b) * prime
    h = h + jnp.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return h ^ (h >> jnp.uint64(31))


def _hll_idx_rank(h):
    """uint64 hash -> (register index int32, rank int32), matching
    query/hll.py HLL.add bit for bit."""
    idx = (h >> jnp.uint64(64 - HLL_P)).astype(jnp.int32)
    rest = h << jnp.uint64(HLL_P)
    bl = jnp.zeros(h.shape, jnp.int32)
    x = rest
    for shift in (32, 16, 8, 4, 2, 1):
        gt = x >= (jnp.uint64(1) << jnp.uint64(shift))
        bl = jnp.where(gt, bl + shift, bl)
        x = jnp.where(gt, x >> jnp.uint64(shift), x)
    bl = jnp.where(rest > 0, bl + 1, 0)
    rank = jnp.where(rest > 0, 64 - bl + 1, 64 - HLL_P + 1)
    return idx, rank.astype(jnp.int32)


def _key_counts(key, radix, R):
    """Row counts per int key value in [0, radix) via a chunked
    factored one-hot matmul (hi x lo decomposition).  Exact: one-hot
    entries are 0/1 in bf16 and per-chunk partial sums are bounded by
    the chunk size < 2^24.  radix*R MACs — ~1.5ms for a 16Ki radix at
    8M rows, where the equivalent [R]-row scatter is a serial loop."""
    Wf = min(_counts_wf(radix), radix)
    Shi = -(-(radix + 1) // Wf)      # bin `radix` holds the sentinel
    ch = 1 << (min(R, 1 << 16).bit_length() - 1)
    nchunk = -(-R // ch)
    iot = jnp.arange(Shi, dtype=jnp.int32)[:, None]
    lot = jnp.arange(Wf, dtype=jnp.int32)[None, :]
    rix = jnp.arange(ch, dtype=jnp.int32)
    pk = jax.lax.optimization_barrier(key.astype(jnp.int32))

    def body(c, acc):
        start = jnp.minimum(c * ch, R - ch)
        gs = jax.lax.dynamic_slice(pk, (start,), (ch,))
        fresh = (start + rix) >= c * ch
        hi_ = gs // Wf
        lo_ = gs % Wf
        oh = ((iot == hi_[None, :]) & fresh[None, :]).astype(jnp.bfloat16)
        rl = (lo_[:, None] == lot).astype(jnp.bfloat16)
        d = jax.lax.dot_general(oh, rl, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + d.astype(jnp.int32)

    acc = jax.lax.fori_loop(0, nchunk, body,
                            jnp.zeros((Shi, Wf), jnp.int32))
    return acc.reshape(-1)[:radix]               # int32 rows per key


def _hll_registers(config: ScanConfig, cols, flat, matched, gid, bitsets,
                   slots):
    """Per-group HLL register planes uint8 [slots, HLL_M]; registers
    for the dead slot absorb unmatched rows.

    Str columns with a small dict take the PAIR-EXISTENCE form: the
    register a value updates (and its rank) depends only on the dict
    id, so counts[g, v] from a factored one-hot matmul (~1.5ms) feed a
    scatter-max over slots*dict PAIRS instead of all R rows — the
    row-wise scatter-max lowers to a serial loop (profiled ~55ms at 8M
    rows).  Bit-identical registers either way."""
    dcol = config.distinct_cols[0]
    dvals, dvalid = cols[dcol]
    v, valid = flat(dvals), flat(dvalid)
    if config.hll_hash_idx >= 0:
        hashes = bitsets[config.hll_hash_idx]    # uint64 [dict+1]
        nd = hashes.shape[0]
        miss = nd - 1
        hidx = jnp.clip(jnp.where(valid, v, miss), 0, miss).astype(
            jnp.int32)
        # UNPADDED group space: real gids are mixed-radix values < g
        # plus the dead slot (slots-1) — the lane padding between g and
        # slots would inflate the pair space up to 128x (a plain COUNT
        # DISTINCT has ONE live group in a 128-slot padded table)
        g = 1
        for (_, card) in config.key_bounds:
            g *= card + 1
        gsmall = g + 1                           # +1 dead
        if gsmall * nd <= 32768:
            R = v.shape[0]
            gidc = jnp.where(matched & (gid < g), gid, gsmall - 1)
            cnt = _key_counts(gidc * nd + hidx, gsmall * nd, R)
            exists = cnt > 0
            idx_v, rank_v = _hll_idx_rank(hashes)        # [nd] each
            p = jnp.arange(gsmall * nd, dtype=jnp.int32)
            g_of, v_of = p // nd, p % nd
            slot_of = jnp.where(g_of == gsmall - 1, slots - 1, g_of)
            tslot = jnp.where(exists,
                              slot_of * HLL_M + idx_v[v_of],
                              slots * HLL_M)
            acc = jnp.zeros((slots * HLL_M + 1,), jnp.int32).at[
                tslot].max(jnp.where(exists, rank_v[v_of], 0))
            return acc[:slots * HLL_M].astype(jnp.uint8).reshape(
                slots, HLL_M)
        h = hashes[hidx]
    else:
        # int fast path packs the raw value; missing = MaxUint64 = -1
        h = _hash_int_col(jnp.where(valid, v, MISSING))
    idx, rank = _hll_idx_rank(h)
    slot = jnp.where(matched, gid, slots - 1) * HLL_M + idx
    acc = jnp.zeros((slots * HLL_M,), jnp.int32).at[slot].max(rank)
    return acc.astype(jnp.uint8).reshape(slots, HLL_M)


def _scan_dense(config: ScanConfig, cols, nrec, filter_vals, bitsets,
                time_bucket, set_aux):
    B, C, R, flat, matched, keys, _, weight = _front_end(
        config, cols, nrec, filter_vals, bitsets, time_bucket, set_aux)
    slots = config.dense_slots
    gid, spill = _dense_gid(config, keys, matched, time_bucket)
    lanes64, per_agg = _agg_row_data(config, cols, flat, matched, weight)
    # per-group min/max feed only the hist paths (host Range() for the
    # node aggregator's cross-node re-bucketing, fullMergeHist
    # query_spec.go:118-135); avg-op aggs never consult them, and the
    # masked min/max reduces are the single largest cost of the dense
    # loop — track hist aggs only, emit empty-slot sentinels otherwise
    track = [ai for ai, agg in enumerate(config.aggs)
             if agg.num_values > 0]
    minmax_vs = []
    for ai in track:
        agg, (v, keep) = config.aggs[ai], per_agg[ai]
        f32_ok = max(abs(agg.discard_min), abs(agg.discard_max)) < (1 << 24)
        minmax_vs.append((v, keep, f32_ok))
    win = config.window if 0 < config.window < slots else 0
    wc = C
    if win and config.window_chunk:
        # sub-chunk the band loop: rows within a block are time-sorted,
        # so window_chunk rows span ~window_chunk/C of the block's
        # bucket range and the (engine-shrunk) window still covers them
        wc = min(C, config.window_chunk)
    # COMPACT reduce space: real gids are mixed-radix values < g, but
    # slots is lane-padded to a 128 multiple — a small-cardinality
    # group-by would build its one-hot against up to 128 rows for a
    # handful of real groups.  Reduce over [g+1] rows (dead remapped to
    # index g) and expand back to the padded table afterwards; one-hot
    # traffic is rows x reduce-rows bytes, the whole cost of the dense
    # loop at 64M rows.
    Sc = slots
    gid_r = gid
    if not win and config.key_bounds:
        g = 1
        for (_, card) in config.key_bounds:
            g *= card + 1
        if g + 1 < slots:
            Sc = g + 1
            gid_r = jnp.where(gid == slots - 1, g, gid)
    sums_c, mns_tc, mxs_tc, wspill = _dense_reduce(
        gid_r, lanes64, minmax_vs, Sc,
        _lane_limbs(config, lanes64.shape[1]),
        window=win, matched=matched, chunk=wc)
    if Sc != slots:
        # rows [0, Sc-1) map 1:1; the dead row (whose sums are zeroed
        # and whose min/max are never read) stays at slots-1 with the
        # padded rows' zero/sentinel content
        L = sums_c.shape[1]
        sums = jnp.zeros((slots, L), sums_c.dtype).at[
            :Sc - 1].set(sums_c[:Sc - 1])
        mns_t = jnp.full((slots, mns_tc.shape[1]), 2**62,
                         jnp.int64).at[:Sc - 1].set(mns_tc[:Sc - 1])
        mxs_t = jnp.full((slots, mxs_tc.shape[1]), -2**62,
                         jnp.int64).at[:Sc - 1].set(mxs_tc[:Sc - 1])
    else:
        sums, mns_t, mxs_t = sums_c, mns_tc, mxs_tc
    spill = spill + wspill
    tpos = {ai: i for i, ai in enumerate(track)}
    A = len(config.aggs)
    mns = jnp.full((slots, max(A, 1)), 2**62, jnp.int64)
    mxs = jnp.full((slots, max(A, 1)), -2**62, jnp.int64)
    for ai, i in tpos.items():
        mns = mns.at[:, ai].set(mns_t[:, i])
        mxs = mxs.at[:, ai].set(mxs_t[:, i])
    # the dead slot must read as empty
    live_row = jnp.arange(slots) < slots - 1
    count = jnp.where(live_row, sums[:, 0], 0)
    samples = jnp.where(live_row, sums[:, 1], 0)

    out = {
        "num_groups": jnp.sum(((count > 0) | (samples > 0)).astype(jnp.int32)),
        "keys": _dense_decode_keys(config, time_bucket),
        "count": count,
        "samples": samples,
        "spill": spill,
    }
    if config.hll and config.distinct_cols:
        out["hll_regs"] = _hll_registers(config, cols, flat, matched, gid,
                                         bitsets, slots)

    any_hist = any(a.num_values > 0 for a in config.aggs)
    key_rows = None
    if config.track_outliers and any_hist:
        key_rows = jnp.stack(keys, axis=1)       # [R, K] row-order
    for ai, agg in enumerate(config.aggs):
        v, keep = per_agg[ai]
        out[f"agg{ai}_exists"] = sums[:, 2 + 3 * ai] > 0
        out[f"agg{ai}_count"] = sums[:, 3 + 3 * ai]
        out[f"agg{ai}_wv"] = sums[:, 4 + 3 * ai]
        out[f"agg{ai}_min"] = mns[:, ai]
        out[f"agg{ai}_max"] = mxs[:, ai]
        if agg.num_values > 0:
            bv, inrange, is_out, nv = _hist_bucket(agg, v)
            hcontrib = keep & inrange
            wl = config.lane_limbs8[0] if config.lane_limbs8 else 8
            if wl == 1:
                # unweighted or byte-bounded weights: MXU matmul form
                # (over the compact reduce space, expanded like sums)
                hh = _hist_matmul(
                    gid_r, hcontrib, weight, bv, nv, Sc,
                    weighted=bool(config.weight_col))
            else:
                hh = _hist_scatter(
                    gid_r, hcontrib, weight, bv, nv, Sc,
                    weighted=bool(config.weight_col), wlimbs8=wl)
            if Sc != slots:
                hh = jnp.zeros((slots, nv), hh.dtype).at[
                    :Sc - 1].set(hh[:Sc - 1])
            out[f"agg{ai}_hist"] = hh
            if config.track_outliers:
                _outlier_outputs(out, config, ai, hcontrib, is_out, v,
                                 key_rows)

    if config.want_matched_mask:
        out["matched"] = matched.reshape(B, C)
    return out


# ---------------------------------------------------------------------------
# sorted strategy: multi-key sort + boundary gid + stacked nibble scatter
# ---------------------------------------------------------------------------

def _scan_sorted(config: ScanConfig, cols, nrec, filter_vals, bitsets,
                 time_bucket, set_aux):
    B, C, R, flat, matched, keys, dkeys, weight = _front_end(
        config, cols, nrec, filter_vals, bitsets, time_bucket, set_aux)

    # the matched flag rides the idx payload's sign bit through the
    # sort: idx is a VALUE operand (never a key), so mangling its high
    # bit is free and saves a full [R] random gather of the matched
    # mask after the permutation (profiled ~110ms at 8M rows)
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape(R)
    idxm = jnp.where(matched, idx | jnp.int32(-2**31), idx)
    n_group_keys = len(keys)
    pack = config.sort_pack
    if pack and not dkeys and len(pack) == n_group_keys:
        # mixed-radix pack: ONE narrow sort key instead of K int64 keys.
        # digit 0 = MISSING (-1); sentinel (= radix product) sorts last.
        sent = 1
        for (_, card) in pack:
            sent *= card + 1
        dtype = jnp.int32 if sent < 2**31 - 1 else jnp.int64
        packed = jnp.zeros((R,), dtype)
        bad = jnp.zeros((R,), bool)
        for (mn, card), k in zip(pack, keys):
            # digit 0 reserved for MISSING (-1): matches the reference's
            # MaxUint64 packing, which likewise cannot distinguish a
            # real -1 value from missing (aggregate.go:125-143)
            digit = jnp.where(k == MISSING, 0, k - mn + 1)
            # a key outside its declared bound (stale dict/int bounds —
            # e.g. -read-log rows ingested after bind) would corrupt the
            # radix product: spill instead, the engine retries unpacked
            bad = bad | (digit < 0) | (digit > card)
            packed = packed * (card + 1) + digit.astype(dtype)
        pack_spill = jnp.sum((matched & bad).astype(jnp.int64))
        packed = jnp.where(matched & ~bad, packed, jnp.asarray(sent, dtype))
        sorted_ops = jax.lax.sort([packed, idxm], num_keys=1)
        spacked, sidxm = sorted_ops
        smatched = sidxm < 0
        sidx = sidxm & jnp.int32(0x7FFFFFFF)
        # original key values: one [R] gather per key (cheaper than
        # carrying them through the sort)
        gkeys = [jnp.where(smatched, k[sidx], SENTINEL) for k in keys]
        skeys = gkeys
        prev_differs = jnp.zeros((R,), bool).at[0].set(True)
        prev_differs = prev_differs | jnp.concatenate(
            [jnp.ones((1,), bool), spacked[1:] != spacked[:-1]])
    else:
        pack_spill = jnp.zeros((), jnp.int64)
        all_keys = [jnp.where(matched, k, SENTINEL) for k in keys + dkeys]
        sorted_ops = jax.lax.sort([*all_keys, idxm],
                                  num_keys=len(all_keys))
        skeys, sidxm = sorted_ops[:-1], sorted_ops[-1]
        smatched = sidxm < 0
        sidx = sidxm & jnp.int32(0x7FFFFFFF)

        gkeys = skeys[:n_group_keys]
        prev_differs = jnp.zeros((R,), bool).at[0].set(True)
        for k in gkeys:
            prev_differs = prev_differs | jnp.concatenate(
                [jnp.ones((1,), bool), k[1:] != k[:-1]])
    # weight is only consulted on weighted scans; skip the [R] gather
    # otherwise (sorted hist w falls back to the constant 1)
    sweight = weight[sidx] if config.weight_col else None
    gid = jnp.cumsum(prev_differs.astype(jnp.int32)) - 1
    num_groups = gid[-1] + 1

    S = config.max_groups
    in_cap = gid < S
    cgid = jnp.where(smatched & in_cap, gid, S)
    contrib = smatched & in_cap

    # segment-start positions per slot: gid is SORTED, so slot g's rows
    # are [pos[g], pos[g+1]) and one searchsorted maps the whole table —
    # this replaces the round-4 single-writer key scatter AND (on
    # trivial lanes) the count scatter, both of which XLA lowers to
    # [R]-row serial loops (~70-110ms each at 8M rows)
    gids_q = jnp.arange(S, dtype=gid.dtype)
    pos = jnp.searchsorted(gid, gids_q)
    posc = jnp.minimum(pos, R - 1)
    okq = (pos < R) & (jnp.take(gid, posc) == gids_q)

    if not config.aggs and not config.weight_col:
        # trivial lanes (count == samples == 1 per matched row): slot
        # sums are contrib-cumsum differences at the segment bounds
        per_agg_unsorted = []
        cumc = jnp.cumsum(contrib.astype(jnp.int32))
        pend = jnp.concatenate([pos[1:], jnp.full((1,), R, pos.dtype)])
        chi = jnp.where(pend > 0,
                        jnp.take(cumc, jnp.maximum(pend - 1, 0)), 0)
        clo = jnp.where(pos > 0,
                        jnp.take(cumc, jnp.maximum(pos - 1, 0)), 0)
        one = jnp.where(okq, chi - clo, 0).astype(jnp.int64)
        sums = jnp.stack([one, one], axis=1)
    else:
        lanes64, per_agg_unsorted = _agg_row_data(config, cols, flat,
                                                  matched, weight)
        L = lanes64.shape[1]
        limbs8 = _lane_limbs(config, L)
        # extract limbs BEFORE the sort gather: the row permutation then
        # moves T2 int8 limbs per row instead of 8L int64 bytes
        nib_u = _nibbles_ragged(lanes64, limbs8)    # [R, T2] row order
        nib = jnp.where(contrib[:, None], nib_u[sidx], jnp.int8(0))
        acc = jnp.zeros((S + 1, nib.shape[1]), jnp.int32).at[cgid].add(
            nib.astype(jnp.int32))
        sums = _recombine_nib_ragged(acc[:S].astype(jnp.int64), limbs8)

    # group keys: gather each slot's first row's key tuple (sentinel
    # segments carry SENTINEL keys with zero counts — inert downstream)
    kmat = jnp.stack(gkeys, axis=1)             # [R, K] int64 sorted
    K = kmat.shape[1]
    keys_tbl = jnp.where(okq[:, None],
                         jnp.take(kmat, posc, axis=0), 0)  # [S, K]

    out = {
        "num_groups": num_groups,
        "keys": keys_tbl,
        "count": sums[:, 0],
        "samples": sums[:, 1],
        "spill": pack_spill,
    }

    # distinct pairs: boundary over the full (group+distinct) key tuple
    if config.distinct_cols:
        pair_differs = jnp.zeros((R,), bool).at[0].set(True)
        for k in skeys:
            pair_differs = pair_differs | jnp.concatenate(
                [jnp.ones((1,), bool), k[1:] != k[:-1]])
        out["pair_mask"] = pair_differs & smatched
        out["sorted_keys"] = jnp.stack(skeys, axis=1)

    any_hist = any(a.num_values > 0 for a in config.aggs)
    minmax_vs = []
    for ai, agg in enumerate(config.aggs):
        v_un, keep_un = per_agg_unsorted[ai]
        v = v_un[sidx]
        keep = keep_un[sidx]
        out[f"agg{ai}_exists"] = sums[:, 2 + 3 * ai] > 0
        out[f"agg{ai}_count"] = sums[:, 3 + 3 * ai]
        out[f"agg{ai}_wv"] = sums[:, 4 + 3 * ai]
        minmax_vs.append((v, keep))

    # per-group min/max feed only the hist paths (host Range() for the
    # node aggregator's cross-node re-bucketing); avg-op aggs never
    # consult them — skip the scatter and emit empty-slot sentinels
    track = [ai for ai, agg in enumerate(config.aggs)
             if agg.num_values > 0]
    for ai in range(len(config.aggs)):
        if ai not in track:
            out[f"agg{ai}_min"] = jnp.full((S,), 2**62, jnp.int64)
            out[f"agg{ai}_max"] = jnp.full((S,), -2**62, jnp.int64)
    if track:
        # one stacked scatter-min and scatter-max across the hist lanes
        vm = jnp.stack([minmax_vs[ai][0] for ai in track], axis=1)
        km = jnp.stack([minmax_vs[ai][1] for ai in track], axis=1)
        anyk = contrib[:, None] & km
        rowgid = jnp.where(anyk.any(axis=1), cgid, S)
        mn = jnp.full((S + 1, vm.shape[1]), 2**62, jnp.int64).at[rowgid].min(
            jnp.where(anyk, vm, jnp.int64(2**62)))[:S]
        mx = jnp.full((S + 1, vm.shape[1]), -2**62, jnp.int64).at[rowgid].max(
            jnp.where(anyk, vm, jnp.int64(-2**62)))[:S]
        for i, ai in enumerate(track):
            out[f"agg{ai}_min"] = mn[:, i]
            out[f"agg{ai}_max"] = mx[:, i]

    if any_hist:
        # Sparse histograms: instead of a [groups, nv] bucket matrix
        # (whose size would cap hist queries far below max_groups =
        # INTERNAL_RESULT_LIMIT, aggregate.go:15), emit compacted
        # (group-key, bucket, Σweight) triples.  One extra [R] sort by
        # the combined (gid, bucket) key yields segment sums whose
        # unique count is bounded by the OCCUPIED buckets, not
        # groups x nv — a 100k-group percentile query ships only the
        # buckets its data actually touched.
        idx2 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape(R)
        for ai, agg in enumerate(config.aggs):
            if agg.num_values <= 0:
                continue
            v, keep = minmax_vs[ai]
            bv, inrange, is_out, nv = _hist_bucket(agg, v)
            hcontrib = contrib & keep & inrange
            sent_pk = jnp.int64(S + 1) * nv
            pairkey = jnp.where(hcontrib,
                                cgid.astype(jnp.int64) * nv + bv, sent_pk)
            w = jnp.where(hcontrib,
                          sweight if config.weight_col else 1,
                          0).astype(jnp.int64)
            spk, si2 = jax.lax.sort([pairkey, idx2], num_keys=1)
            sw = w[si2]
            pb = jnp.concatenate(
                [jnp.ones((1,), bool), spk[1:] != spk[:-1]])
            seg = jnp.cumsum(pb.astype(jnp.int32)) - 1
            wsum = jax.ops.segment_sum(sw, seg, num_segments=R)[seg]
            valid = pb & (spk < sent_pk)
            out[f"agg{ai}_hp_mask"] = valid
            out[f"agg{ai}_hp_bv"] = jnp.where(valid, spk % nv, 0)
            out[f"agg{ai}_hp_w"] = jnp.where(valid, wsum, 0)
            out[f"agg{ai}_hp_keys"] = kmat[si2]
            if config.track_outliers:
                # outliers keyed by group-key tuple (not local gid) so the
                # host fix-up also works on sharded partials
                _outlier_outputs(out, config, ai, hcontrib, is_out, v,
                                 kmat)

    if config.want_matched_mask:
        out["matched"] = matched.reshape(B, C)
    return out


# enumerated strategy: largest packed-key radix eligible (bounds the
# mixed-radix pack; the readout itself is radix-independent row-space)
ENUM_RADIX_CAP = 1 << 21


def enum_radix(config: ScanConfig) -> int:
    """Packed-key radix for the enumerated strategy; 0 = ineligible.

    Eligible when the scan is a device-pruned (prune_topk) group-by
    whose keys are all exactly bounded (sort_pack) with a modest radix
    product and no hist/distinct/outlier/sample lanes — the
    high-cardinality top-k shape (BASELINE config 5).  There the full
    multi-key sort + segment scatter is replaced by ONE narrow sort
    with bit-packed sum carriers + per-carrier cumsum + a row-space
    segment readout and a device top_k: every group's sums are
    available AT its last sorted row (cumsum minus the propagated
    segment-start cumsum), so the top-k winners are selected directly
    in row space — no scatter anywhere (large scatters lower to serial
    loops on TPU), no [radix]-sized table, and no per-key counts
    histogram (the round-4 form spent ~11ms on a factored one-hot
    counts matmul whose only product was the key->row-range map)."""
    if config.prune_topk <= 0 or config.dense_slots:
        return 0
    if config.no_compact_table:
        # mesh scans: the shuffle payload carries at most table_slots
        # rows, which would silently truncate a [radix] enum table
        return 0
    pack = config.sort_pack
    if not pack or config.distinct_cols or config.time_col:
        return 0
    if len(pack) != max(len(config.group_cols), 1) or not config.group_cols:
        return 0
    if any(a.num_values > 0 for a in config.aggs):
        return 0
    if config.track_outliers or config.want_matched_mask:
        return 0
    radix = 1
    for (_, card) in pack:
        radix *= card + 1
        if radix > ENUM_RADIX_CAP:
            return 0
    return radix


def _enum_carry_plan(config: ScanConfig, L: int, R: int):
    """Pack eligible sum lanes into disjoint int64 (or int32) bit
    fields carried through the sort.  Returns (plan, skip) where plan
    is a tuple of lane groups [(lane, offset, bits), ...] or None when
    any needed lane is unbounded, and skip is the set of lanes proven
    equal to the per-group matched-row count (derived from the segment
    row range for free)."""
    rb = (config.lane_row_bounds
          if len(config.lane_row_bounds) == L else None)
    skip = {1} | ({0} if not config.weight_col else set())
    if len(config.lane_nrows) == L:
        skip |= {i for i, eq in enumerate(config.lane_nrows) if eq}
    if rb is None:
        return None, skip
    # pack into 31-bit groups when lanes allow: an int32 carrier makes
    # BOTH the sort operand and the readout's cumsum/cummax run at
    # int32 speed (int64 scans profiled 5-6x slower on the v5e, and
    # int64 reduce-windows can even exceed scoped vmem); only a lane
    # that alone needs >31 bits gets an int64 carrier of its own
    plan, cur, used = [], [], 0
    for i in range(L):
        if i in skip:
            continue
        b = rb[i]
        bits = (b * R).bit_length() + 1 if b > 0 else 64
        if bits > 63:
            return None, skip
        if bits > 31:
            if cur:
                plan.append(tuple(cur))
                cur, used = [], 0
            plan.append(((i, 0, bits),))
            continue
        if used + bits > 31:
            plan.append(tuple(cur))
            cur, used = [], 0
        cur.append((i, used, bits))
        used += bits
    if cur:
        plan.append(tuple(cur))
    return tuple(plan), skip


_TOPK_TILE = 1024
_TOPK_M = 64


def _topk_rows(score, live, k):
    """Exact top-k indices over [R] rows via a two-phase tiled top_k.

    lax.top_k over millions of rows lowers to a full sort (measured
    6.5ms at 4.2M rows on the v5e); per-tile top-m followed by a global
    top-k over the nt*m candidates is ~1ms.  Exactness is verified IN
    kernel: a tile can hide a deserving winner only if it holds more
    than m live candidates AND its m-th best still ties or beats the
    global k-th best — in that case (never observed on real
    distributions; requires >m near-equal hot groups packed into one
    1024-row span of the key-sorted order) a lax.cond falls back to
    the full top_k, so the fast path is an optimization, never an
    approximation."""
    R = score.shape[0]
    T, m = _TOPK_TILE, _TOPK_M
    nt = R // T
    if R % T or nt * m < k or nt < 8:
        return jax.lax.top_k(score, k)[1]
    sc = score.reshape(nt, T)
    v, i = jax.lax.top_k(sc, m)                       # [nt, m]
    base = (jnp.arange(nt, dtype=jnp.int32) * T)[:, None]
    cand_v = v.reshape(-1)
    cand_i = (i.astype(jnp.int32) + base).reshape(-1)
    tv, ti = jax.lax.top_k(cand_v, k)
    widx = jnp.take(cand_i, ti)
    lc = jnp.sum(live.reshape(nt, T), axis=1)         # live ends / tile
    thresh = tv[k - 1]
    danger = jnp.any((lc > m) & (v[:, m - 1] >= thresh))
    return jax.lax.cond(danger,
                        lambda _: jax.lax.top_k(score, k)[1],
                        lambda _: widx, 0)


def _scan_enum(config: ScanConfig, cols, nrec, filter_vals, bitsets,
               time_bucket, set_aux):
    """Enumerated high-cardinality top-k group-by (see enum_radix).

    ONE narrow sort of the mixed-radix packed key with bit-packed sum
    CARRIERS riding along as extra operands (no row gather); then a
    pure row-space readout: each group's sums are its carrier cumsum
    at the segment's last row minus the segment-start cumsum
    (propagated forward with a cummax — carrier lanes are nonneg so
    the cumsum is monotone), its row count is `row - segment_start +
    1`, and the per-group prune score is formed AT the segment-end
    rows so one device top_k over [R] selects the winners directly.
    Ships exactly the top rows: no [radix] table, no counts histogram,
    no scatter (large scatters lower to serial loops on TPU).

    Sum lanes are built straight in the carrier dtype (int32 when the
    packed fields fit 31 bits) — the round-4 form staged all lanes as
    an int64 [R, L] stack first, ~11ms of traffic at 4M rows."""
    B, C, R, flat, matched, keys, _, weight = _front_end(
        config, cols, nrec, filter_vals, bitsets, time_bucket, set_aux)
    pack = config.sort_pack
    radix = enum_radix(config)
    A = len(config.aggs)
    L = 2 + 3 * A

    dtype = jnp.int32 if radix + 1 < 2**31 - 1 else jnp.int64
    packed = jnp.zeros((R,), dtype)
    bad = jnp.zeros((R,), bool)
    for (mn, card), k in zip(pack, keys):
        digit = jnp.where(k == MISSING, 0, k - mn + 1)
        bad = bad | (digit < 0) | (digit > card)   # stale bound: spill
        packed = packed * (card + 1) + digit.astype(dtype)
    pack_spill = jnp.sum((matched & bad).astype(jnp.int64))
    packed = jnp.where(matched & ~bad, packed, jnp.asarray(radix, dtype))

    carry_plan, _skip = _enum_carry_plan(config, L, R)
    vbias = config.agg_vbias or (0,) * A

    def lane_value(i, dt):
        """Sum-lane i's per-row value, computed directly in dtype dt —
        [count=w, samples=1, (exists, kw, kwv)*A], matching
        _agg_row_data's stacking order without the int64 staging."""
        if i == 0:
            return jnp.where(matched, weight, 0).astype(dt)
        if i == 1:
            return matched.astype(dt)
        ai, which = divmod(i - 2, 3)
        agg = config.aggs[ai]
        avals, avalid = cols[agg.col]
        v, populated = flat(avals), flat(avalid)
        if which == 0:
            return (matched & populated).astype(dt)
        keep = matched & populated & ~((v > agg.discard_max) |
                                       (v < agg.discard_min))
        kw = jnp.where(keep, weight, 0)
        if which == 1:
            return kw.astype(dt)
        bias = vbias[ai]
        vv = (v - bias) if bias else v
        # per-row product fits dt by the bind-time bound that built
        # the carry plan (kw*(v-bias) <= lane_row_bounds[i] < 2^bits)
        return kw.astype(dt) * vv.astype(dt)

    if carry_plan is not None:
        carriers = []
        for group in carry_plan:
            bits_total = group[-1][1] + group[-1][2]
            dt = jnp.int32 if bits_total <= 31 else jnp.int64
            c = None
            for (i, off, _) in group:
                lv = lane_value(i, dt)
                term = (lv << off) if off else lv  # nonneg, disjoint
                c = term if c is None else c | term
            carriers.append(c)
        sorted_ops = jax.lax.sort([packed, *carriers], num_keys=1)
        sidx = None
    else:
        # general fallback: carry row ids, gather + cumsum int64 lanes
        idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape(R)
        sorted_ops = jax.lax.sort([packed, idx], num_keys=1)
        sidx = sorted_ops[1]

    sp = sorted_ops[0]
    iota = jnp.arange(R, dtype=jnp.int32)
    diff = sp[1:] != sp[:-1]
    pb = jnp.concatenate([jnp.ones((1,), bool), diff])    # segment starts
    pe = jnp.concatenate([diff, jnp.ones((1,), bool)])    # segment ends
    st = jax.lax.cummax(jnp.where(pb, iota, 0))           # start row of
    live_end = pe & (sp < jnp.asarray(radix, sp.dtype))   # each row's seg
    nrows_seg = iota - st + 1                             # int32

    # all scans run in the CARRIER dtype: the carry plan packs 31-bit
    # groups precisely so cumsum/cummax stay int32 (int64 scans lower
    # to multi-pass reduce-windows, 5-6x slower per op).  Only carriers
    # the PRUNE SCORE reads need their segment sums at every end row
    # (cumsum minus a cummax-propagated base); the rest skip the base
    # scan entirely — their sums are two tiny gathers of the cumsum at
    # the winners' row ranges after top_k.
    if config.prune_agg >= 0:
        score_lanes = {3 + 3 * config.prune_agg, 4 + 3 * config.prune_agg}
    else:
        score_lanes = {0}
    lane_seg: dict[int, jnp.ndarray] = {}
    deferred: list[tuple] = []           # (group, cum) read post-top_k
    if carry_plan is not None:
        for gi, group in enumerate(carry_plan):
            c = sorted_ops[1 + gi]
            cum = jnp.cumsum(c)          # total fits the dtype by plan
            if not any(i in score_lanes for (i, _, _) in group):
                deferred.append((group, cum))
                continue
            z = jnp.zeros((1,), c.dtype)
            prev = jnp.concatenate([z, cum[:-1]])
            base = jax.lax.cummax(jnp.where(pb, prev, z[0]))
            segsum = cum - base          # at end rows: the group total
            for (i, off, bits) in group:
                v = (segsum >> off) & ((1 << bits) - 1)
                lane_seg[i] = v
    else:
        lanes64, _ = _agg_row_data(config, cols, flat, matched, weight)
        slanes = jnp.take(lanes64, sidx, axis=0)       # [R, L] sorted
        cum = jnp.cumsum(slanes, axis=0)               # int64, exact
        base = jnp.take(cum, jnp.maximum(st - 1, 0), axis=0)
        base = jnp.where((st > 0)[:, None], base, 0)
        seg = cum - base
        for i in range(L):
            lane_seg[i] = seg[:, i]

    def lane(i):
        return lane_seg.get(i, nrows_seg)

    # prune score at segment-end rows; top_k picks winners in row space
    Pfull = table_prefix(config)
    Pk = min(Pfull, R)
    if config.prune_agg >= 0:
        ai = config.prune_agg
        acnt = lane(3 + 3 * ai)
        score = jnp.where(
            live_end & (acnt > 0),
            lane(4 + 3 * ai).astype(jnp.float32)
            / jnp.maximum(acnt, 1).astype(jnp.float32),
            -jnp.inf)
    else:
        cnt = lane(0)
        score = jnp.where(live_end, cnt, jnp.asarray(-1, cnt.dtype))
    widx = _topk_rows(score, live_end, Pk)
    wlive = jnp.take(live_end, widx)
    st_w = jnp.take(st, widx)
    nr_w = widx - st_w + 1               # winners' row counts
    winner_seg: dict[int, jnp.ndarray] = {}
    for (group, cum) in deferred:
        cw = jnp.take(cum, widx)
        bw = jnp.where(st_w > 0,
                       jnp.take(cum, jnp.maximum(st_w - 1, 0)),
                       jnp.zeros((), cum.dtype))
        seg_w = cw - bw
        for (i, off, bits) in group:
            winner_seg[i] = (seg_w >> off) & ((1 << bits) - 1)

    def wl(i):
        if i in winner_seg:
            v = winner_seg[i]
        elif i in lane_seg:
            v = jnp.take(lane_seg[i], widx)
        else:
            v = nr_w
        v = jnp.where(wlive, v, 0).astype(jnp.int64)
        if Pk < Pfull:       # tiny batch: pad to the table prefix
            v = jnp.pad(v, (0, Pfull - Pk))
        return v

    # winner keys: mixed-radix decode of the packed values (digit 0 =
    # MISSING, mirroring _dense_decode_keys); dead rows -> SENTINEL
    gids = jnp.take(sp, widx).astype(jnp.int64)
    kcols = []
    for (mn, card) in reversed(pack):
        digit = gids % (card + 1)
        gids = gids // (card + 1)
        kcols.append(jnp.where(digit == 0, MISSING, digit - 1 + mn))
    kcols.reverse()
    keys_tbl = jnp.stack(kcols, axis=1)               # [Pk, K]
    keys_tbl = jnp.where(wlive[:, None], keys_tbl, SENTINEL)
    if Pk < Pfull:
        keys_tbl = jnp.pad(keys_tbl, ((0, Pfull - Pk), (0, 0)),
                           constant_values=SENTINEL)

    out = {
        "num_groups": jnp.sum(live_end.astype(jnp.int32)),
        "keys": keys_tbl,
        "count": wl(0),
        "samples": wl(1),
        "spill": pack_spill,
        # whole-scan totals for the Cumulative row (the host banks the
        # difference against the kept rows, aggregate.go:422-471)
        "total_count": jnp.sum(jnp.where(matched, weight, 0)),
        "total_samples": jnp.sum(matched.astype(jnp.int64)),
    }
    for ai in range(A):
        out[f"agg{ai}_exists"] = wl(2 + 3 * ai) > 0
        out[f"agg{ai}_count"] = wl(3 + 3 * ai)
        out[f"agg{ai}_wv"] = wl(4 + 3 * ai)
        # no hist lanes here (enum_radix forbids them): min/max are
        # never consulted downstream — emit empty-slot sentinels
        out[f"agg{ai}_min"] = jnp.full((Pfull,), 2**62, jnp.int64)
        out[f"agg{ai}_max"] = jnp.full((Pfull,), -2**62, jnp.int64)
    return out


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
    if config.strategy == "dense":
        return _scan_dense(config, cols, nrec, filter_vals, bitsets,
                           time_bucket, set_aux)
    if enum_radix(config):
        return _scan_enum(config, cols, nrec, filter_vals, bitsets,
                          time_bucket, set_aux)
    return _scan_sorted(config, cols, nrec, filter_vals, bitsets,
                        time_bucket, set_aux)


scan_batch = partial(jax.jit, static_argnums=(0,))(scan_core)


# ---------------------------------------------------------------------------
# packed downloads
#
# The host<->device link (especially the tunneled axon transport) charges
# ~tens of ms per sync and is catastrophically slow on 0-d reads, so the
# engine downloads exactly ONE small int64 buffer per batch: a meta row,
# a prefix of the group table, compacted (top_k) outlier rows, and
# compacted distinct-pair rows.  Full-size arrays stay on device and are
# only pulled when the meta row says the prefix overflowed.  The dense
# strategy's table is small enough to download whole.
# ---------------------------------------------------------------------------

def main_width(config: ScanConfig) -> int:
    K, A, D = config.n_key_cols, len(config.aggs), len(config.distinct_cols)
    # meta row: num_groups, spill, nout per hist agg, npairs, shuffle
    # overflow, pruned marker, total count/samples (device-prune path),
    # nhistpairs per hist agg (sorted strategy)
    return max(K + 2 + 5 * A, K + D + 1, 7 + 2 * A)


def table_prefix(config: ScanConfig) -> int:
    if config.strategy == "dense":
        return config.dense_slots
    p = min(config.prefix_rows, config.max_groups)
    if config.prune_topk > 0:
        # device prune ships exactly the top-k rows: the table section
        # (and with it the whole download) shrinks to match
        p = min(p, config.prune_topk)
    return p


def dense_table_plan(config: ScanConfig, R: int):
    """Column plan for the dense strategy's COMPACT table section; None
    when the strategy isn't dense.  Dense slot keys are arithmetic
    (mixed radix) so no key columns ship — the host re-derives them —
    and min/max ship only for hist aggs (avg-op rows carry sentinels
    anyway).  i32: every sum column's per-batch total provably fits
    int32 (lane_row_bounds x R), so pairs of columns pack into each
    int64 word — together a 2-4x smaller download, which on the
    tunneled link is the dense scan's main cost at thousands of
    slots."""
    if config.strategy != "dense" or config.no_compact_table:
        return None
    # lanes PROVEN equal to the samples lane (lane_nrows: fully
    # populated columns, discard-proof bounds, no weight column) don't
    # ship at all — the host reconstructs them from samples.  A plain
    # no-weight rollup then downloads [samples, wv] instead of five
    # columns: the dense download IS the remaining tunnel cost at
    # thousands of slots.
    ln = (config.lane_nrows
          if len(config.lane_nrows) == 2 + 3 * len(config.aggs) else ())
    skip = set()
    if ln:
        if not config.weight_col:
            skip.add(0)                       # count == samples
        for ai in range(len(config.aggs)):
            if ln[2 + 3 * ai]:
                skip.add(2 + 3 * ai)          # exists == samples>0
            if ln[3 + 3 * ai]:
                skip.add(3 + 3 * ai)          # kw == samples
    cols = [(n, li) for (n, li) in
            [("count", 0), ("samples", 1)] if li not in skip]
    i64_cols = []
    for ai, a in enumerate(config.aggs):
        cols += [(n, li) for (n, li) in
                 [(f"agg{ai}_exists", 2 + 3 * ai),
                  (f"agg{ai}_count", 3 + 3 * ai),
                  (f"agg{ai}_wv", 4 + 3 * ai)] if li not in skip]
        if a.num_values > 0:
            i64_cols += [f"agg{ai}_min", f"agg{ai}_max"]
    rb = config.lane_row_bounds
    i32 = bool(rb) and all(
        li < len(rb) and rb[li] > 0 and rb[li] * R < (1 << 31)
        for _, li in cols)
    names = [n for n, _ in cols]
    npack = -(-len(names) // 2) if i32 else len(names)
    return {"cols": names, "i64_cols": i64_cols, "i32": i32,
            "wpr": npack + len(i64_cols)}


def dense_keys_np(config: ScanConfig, time_bucket: int):
    """Host-side twin of _dense_decode_keys: slot index -> key tuple
    for the compact dense table (no key columns on the wire)."""
    slots = config.dense_slots
    sid = np.arange(slots, dtype=np.int64)
    cols = []
    tpos = config.time_key_pos
    for i in reversed(range(len(config.key_bounds))):
        mn, card = config.key_bounds[i]
        digit = sid % (card + 1)
        sid = sid // (card + 1)
        if i == tpos:
            val = (digit - 1 + mn) * time_bucket
        else:
            val = np.where(digit == 0, MISSING, digit - 1 + mn)
        cols.append(val)
    cols.reverse()
    if not cols:
        cols = [np.zeros(slots, dtype=np.int64)]
    return np.stack(cols, axis=1)          # [slots, K]


def packed_layout(config: ScanConfig, R: int) -> dict:
    """Row offsets of every section inside the ONE packed download
    buffer.  Shared by pack_outputs (writer) and the engine accumulator
    (reader) so the layout math lives in exactly one place.

    Order: meta | group-table prefix | per-hist-agg outlier rows |
    distinct-pair rows | dense hist gids | per-hist-agg bucket matrices
    (flattened row-major, padded to the buffer width)."""
    W = main_width(config)
    P = table_prefix(config)
    hist_ais = [ai for ai, a in enumerate(config.aggs) if a.num_values > 0]
    plan = dense_table_plan(config, R)
    if plan is None:
        layout = {"W": W, "meta": (0, 1), "table": (1, P)}
        off = 1 + P
    else:
        rows = -(-(P * plan["wpr"]) // W)
        layout = {"W": W, "meta": (0, 1), "table": (1, rows),
                  "table_wpr": plan["wpr"]}
        off = 1 + rows
    if config.track_outliers and hist_ais:
        kmax = min(config.max_out, R)
        layout["kmax_out"] = kmax
        for ai in hist_ais:
            layout[f"out{ai}"] = (off, kmax)
            off += kmax
    if config.distinct_cols and not (config.hll and
                                     config.strategy == "dense"):
        kmax = min(config.max_pairs, R)
        layout["kmax_pairs"] = kmax
        layout["pairs"] = (off, kmax)
        off += kmax
    elif config.distinct_cols:
        # device HLL: compacted live register planes ride the buffer
        # (gid row + HLL_M uint8 registers bitcast to int64 words each)
        Phll = min(config.hll_ship, config.dense_slots)
        layout["Phll"] = Phll
        rows = -(-Phll // W)
        layout["hll_gids"] = (off, rows)
        off += rows
        rows = -(-(Phll * (HLL_M // 8)) // W)
        layout["hll_regs"] = (off, rows)
        off += rows
    if hist_ais:
        if config.strategy == "dense":
            Ph = min(config.hist_prefix, config.dense_slots)
            layout["Ph"] = Ph
            rows = -(-Ph // W)
            layout["hist_gids"] = (off, rows)
            off += rows
            for ai in hist_ais:
                rows = -(-(Ph * config.aggs[ai].num_values) // W)
                layout[f"hist{ai}"] = (off, rows)
                off += rows
        else:
            Hcap = min(config.max_hist_pairs, R)
            layout["Hcap"] = Hcap
            for ai in hist_ais:
                layout[f"hpair{ai}"] = (off, Hcap)
                off += Hcap
    layout["rows"] = off
    return layout


def _mask_positions(mask, k):
    """-> (idx [k], live [k]): indices of the first k True rows of
    `mask` (live False marks padding entries) — the same selection as
    top_k(mask.astype(int32), k) with index tie-breaking, but via one
    int32 cumsum + k binary searches instead of a full [R] sort (which
    is how XLA lowers large-k top_k; profiled ~47ms at 8M rows)."""
    cm = jnp.cumsum(mask.astype(jnp.int32))
    q = jnp.arange(1, k + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(cm, q)
    live = pos < mask.shape[0]
    return jnp.minimum(pos, mask.shape[0] - 1), live


def _counts_wf(radix: int) -> int:
    """Factor width for _key_counts: the dominant cost is building the
    two one-hot operands, (Shi + Wf) * rows * 2B of traffic, minimized
    at Wf ~ sqrt(radix) (kept >= 128 for MXU lane occupancy)."""
    w = 128
    while w * w < radix and w < 512:
        w *= 2
    return w


def pack_outputs(config: ScanConfig, out: dict, R: int) -> dict:
    K = config.n_key_cols
    A = len(config.aggs)
    D = len(config.distinct_cols)
    layout = packed_layout(config, R)
    P = table_prefix(config)
    W = layout["W"]

    def pad_to(arr2d, width):
        pad = width - arr2d.shape[1]
        if pad <= 0:
            return arr2d
        return jnp.pad(arr2d, ((0, 0), (0, pad)))

    def flat_rows(arr, rows):
        """Flatten to [rows, W] row-major with zero padding."""
        flat = arr.reshape(-1).astype(jnp.int64)
        flat = jnp.pad(flat, (0, rows * W - flat.shape[0]))
        return flat.reshape(rows, W)

    plan = dense_table_plan(config, R)
    if plan is not None:
        # compact dense table: no key columns (arithmetic slots), hist
        # min/max only, int32 pair packing when bounds allow
        if plan["i32"]:
            names = plan["cols"]
            if len(names) % 2:
                names = names + [names[-1]]       # pad to even
            a32 = jnp.stack([out[n].astype(jnp.int32) for n in names],
                            axis=1)               # [S, nc_pad]
            w = jax.lax.bitcast_convert_type(
                a32.reshape(a32.shape[0], -1, 2), jnp.int64)
        else:
            w = jnp.stack([out[n].astype(jnp.int64)
                           for n in plan["cols"]], axis=1)
        if plan["i64_cols"]:
            w = jnp.concatenate(
                [w, jnp.stack([out[n] for n in plan["i64_cols"]],
                              axis=1)], axis=1)
        table = w                                  # [S, wpr]
    else:
        table_cols = [out["keys"][:, k] for k in range(K)]
        table_cols += [out["count"], out["samples"]]
        for ai in range(A):
            table_cols += [out[f"agg{ai}_exists"].astype(jnp.int64),
                           out[f"agg{ai}_count"], out[f"agg{ai}_wv"],
                           out[f"agg{ai}_min"], out[f"agg{ai}_max"]]
        table = jnp.stack(table_cols, axis=1)  # [S, K+2+5A]

    pruned = 0
    if config.prune_topk > 0 and config.strategy != "dense":
        if "total_count" in out:
            # enumerated strategy: the scan already selected the top
            # rows in row space — the table IS the pruned set
            pruned = min(int(table.shape[0]), P)
        else:
            # intermediate top-k ON the device (the TPU-native
            # PruneResults, aggregate.go:469-471): only the
            # best-scoring rows ever leave HBM — a high-cardinality
            # group-by downloads prune_topk rows, not the whole
            # 100k-slot table
            live = (out["count"] > 0) | (out["samples"] > 0)
            pruned = min(config.prune_topk, int(table.shape[0]), P)
            if config.prune_agg >= 0:
                ai = config.prune_agg
                acnt = out[f"agg{ai}_count"]
                score = jnp.where(
                    live & (acnt > 0),
                    out[f"agg{ai}_wv"].astype(jnp.float32)
                    / jnp.maximum(acnt, 1).astype(jnp.float32),
                    -jnp.inf)
                _, pidx = jax.lax.top_k(score, pruned)
            else:
                _, pidx = jax.lax.top_k(jnp.where(live, out["count"], -1),
                                        pruned)
            table = table[pidx]

    meta = [out["num_groups"].astype(jnp.int64),
            out.get("spill", jnp.zeros((), jnp.int64))]
    if plan is not None:
        sections = [flat_rows(table[:P], layout["table"][1])]
    else:
        sections = [pad_to(table[:P], W)]

    hist_ais = [ai for ai, a in enumerate(config.aggs) if a.num_values > 0]
    if config.track_outliers and hist_ais:
        kmax = layout["kmax_out"]
        for ai in hist_ais:
            mask = out[f"agg{ai}_out_mask"]
            idx, livem = _mask_positions(mask, kmax)
            block = jnp.concatenate(
                [out["sorted_gkeys"][idx],
                 out[f"agg{ai}_out_val"][idx][:, None],
                 livem[:, None].astype(jnp.int64)], axis=1)
            sections.append(pad_to(block, W))
            meta.append(out[f"agg{ai}_nout"].astype(jnp.int64))
    else:
        for _ in hist_ais:
            meta.append(jnp.zeros((), jnp.int64))

    if D and "pair_mask" in out:
        kmax = layout["kmax_pairs"]
        pmask = out["pair_mask"]
        idx, livem = _mask_positions(pmask, kmax)
        block = jnp.concatenate(
            [out["sorted_keys"][idx],
             livem[:, None].astype(jnp.int64)], axis=1)
        sections.append(pad_to(block, W))
        meta.append(jnp.sum(pmask.astype(jnp.int64)))
    elif "hll_regs" in out:
        # device HLL: ship the live groups' register planes (escalation
        # fetches the full [slots, HLL_M] array when live > Phll)
        Phll = layout["Phll"]
        live = (out["count"] > 0) | (out["samples"] > 0)
        _, hidx = jax.lax.top_k(live.astype(jnp.int32), Phll)
        sections.append(flat_rows(hidx, layout["hll_gids"][1]))
        regs = out["hll_regs"][hidx]                 # [Phll, HLL_M] u8
        w64 = jax.lax.bitcast_convert_type(
            regs.reshape(Phll, HLL_M // 8, 8), jnp.int64)
        sections.append(flat_rows(w64, layout["hll_regs"][1]))
        meta.append(jnp.zeros((), jnp.int64))        # npairs: none
    else:
        meta.append(jnp.zeros((), jnp.int64))
    # sharded shuffle capacity overflow (mesh path; 0 single-device)
    meta.append(out.get("shuffle_overflow",
                        jnp.zeros((), jnp.int64)).astype(jnp.int64))
    # device-prune marker: >0 = table holds the top `pruned` rows only,
    # followed by whole-table count/sample totals so the host can keep
    # the Cumulative row exact (the reference merges into Cumulative
    # BEFORE PruneResults drops rows, aggregate.go:422-471)
    meta.append(jnp.asarray(pruned, dtype=jnp.int64))
    if pruned and "total_count" in out:
        # enumerated strategy: out[] holds only the kept rows; the scan
        # computed whole-scan totals in row space before pruning
        meta.append(out["total_count"])
        meta.append(out["total_samples"])
    elif pruned:
        meta.append(jnp.sum(out["count"]))
        meta.append(jnp.sum(out["samples"]))
    else:
        meta += [jnp.zeros((), jnp.int64), jnp.zeros((), jnp.int64)]

    # histogram sections ride the same buffer: one download per batch
    if hist_ais and config.strategy == "dense":
        # dense gids are spread over [0, slots): compact the active
        # hist rows (count>0 or samples>0) and ship their gids along
        Ph = layout["Ph"]
        live = ((out["count"] > 0) | (out["samples"] > 0))
        _, gidx = jax.lax.top_k(live.astype(jnp.int32), Ph)
        sections.append(flat_rows(gidx, layout["hist_gids"][1]))
        for ai in hist_ais:
            sections.append(flat_rows(out[f"agg{ai}_hist"][gidx],
                                      layout[f"hist{ai}"][1]))
            meta.append(jnp.zeros((), jnp.int64))     # nhistpairs (dense: 0)
    elif hist_ais:
        # sorted strategy: compacted sparse (group-key, bucket, Σw) rows
        Hcap = layout["Hcap"]
        for ai in hist_ais:
            mask = out[f"agg{ai}_hp_mask"]
            idx, livem = _mask_positions(mask, Hcap)
            block = jnp.concatenate(
                [out[f"agg{ai}_hp_keys"][idx],
                 out[f"agg{ai}_hp_bv"][idx][:, None],
                 out[f"agg{ai}_hp_w"][idx][:, None],
                 livem[:, None].astype(jnp.int64)], axis=1)
            sections.append(pad_to(block, W))
            meta.append(jnp.sum(mask.astype(jnp.int64)))

    meta_row = jnp.zeros((1, W), jnp.int64)
    for i, m in enumerate(meta):
        meta_row = meta_row.at[0, i].set(m)

    return {"main": jnp.concatenate([meta_row] + sections, axis=0),
            "table": table}


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
