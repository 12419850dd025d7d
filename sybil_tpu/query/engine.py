"""Query engine orchestrator.

The reference's LoadAndQueryRecords (src/lib/table_query.go:18) fans a
goroutine per block through decode + per-record scan, then tree-merges Go
maps.  Here the plan is vectorized end-to-end:

  bind     resolve columns/types, build the static ScanConfig, evaluate
           regexes over the global dictionary into bitsets
  scan     batches of blocks -> [B, CHUNK] device arrays -> one jitted
           scan_batch call per batch (ops/scan.py)
  merge    device partial aggregates land in fixed-shape arrays; the host
           merges the (small) per-batch group tables and reconstitutes
           histogram objects (query/hist.py) with exact reference math
  finish   translate group keys to display strings (aggregate.go:284-324),
           sort/prune (aggregate.go:469-525), build the Cumulative row

Block skipping replicates ShouldLoadBlockFromDir's min/max pruning
(table_block_io.go:110-182).
"""

from __future__ import annotations

import os
import re

import numpy as np

from .. import blocks as blockio
from ..config import Flags
from ..constants import (CHUNK_SIZE, GROUP_DELIMITER, INT_VAL,
                         INTERNAL_RESULT_LIMIT, MISSING_VALUE, NO_VAL,
                         SET_VAL, SORT_COUNT, STR_VAL)
from ..debug import debug, error, warn
from ..table import Table
from .hist import BasicHist, MultiHist, basic_bucket_layout, multi_hist_layout
from .hll import HLL
from .spec import AggDef, FilterDef, QueryParams, Result

MISSING_I64 = -1  # == MaxUint64 in two's complement


class QueryResults:
    """Query output.  `time_results` materializes LAZILY: a rollup's
    per-bucket Result objects (thousands of rows — the reference builds
    them per record batch, aggregate.go:146-169) are only exploded from
    the columnar finish tables when a consumer (printer, wire format,
    aggregator) actually reads them; run_query itself stays columnar."""

    def __init__(self):
        self.results: dict[str, Result] = {}
        self._time_results: dict[int, dict[str, Result]] = {}
        self._time_pending = None   # set by the columnar finish
        self.cumulative: Result | None = None
        self.matched_count: int = 0
        self.sorted: list[Result] = []
        self.samples: list[dict] = []

    @property
    def time_results(self) -> dict[int, dict[str, Result]]:
        if self._time_pending is not None:
            pending, self._time_pending = self._time_pending, None
            _explode_time_rows(self._time_results, *pending)
        return self._time_results

    @time_results.setter
    def time_results(self, value) -> None:
        self._time_pending = None
        self._time_results = value


def _explode_time_rows(per_time, tbs, gks, key_tuples, counts, samples,
                       agg_rows):
    """Fold the columnar finish arrays into the {bucket: {gk: Result}}
    dict (combine-on-collision matches the eager path's semantics)."""
    SENT = 2**62
    for i in range(len(tbs)):
        res = Result()
        res.key_tuple = key_tuples[i]
        res.group_key = gks[i]
        res.count = counts[i]
        res.samples = samples[i]
        for col, info, ex, cnt, wv, mn, mx in agg_rows:
            if not ex[i]:
                continue
            c = cnt[i]
            res.hists[col] = BasicHist.from_sums(
                info.min, info.max, c, wv[i],
                mn[i] if c > 0 else SENT,
                mx[i] if c > 0 else -SENT)
        bucket = per_time.setdefault(tbs[i], {})
        prev = bucket.get(res.group_key)
        if prev is None:
            bucket[res.group_key] = res
        else:
            prev.combine(res)


class BoundQuery:
    """Params resolved against a table: column metadata, static scan
    config, dynamic filter constants and regex bitsets."""

    def __init__(self, table: Table, params: QueryParams, flags: Flags):
        from ..ops import scan as scanops
        self.table = table
        self.params = params
        self.flags = flags
        schema = table.schema

        self.col_types: dict[str, int] = {}

        def need(col: str, want: int, what: str):
            t = schema.col_type(col)
            if t == NO_VAL:
                error("query references unknown column", col, f"({what})")
            if want != NO_VAL and t != want:
                error("column", col, "has wrong type for", what)
            self.col_types[col] = t
            return t

        for g in params.groups:
            t = need(g, NO_VAL, "group")
            if t == SET_VAL:
                error("cannot group by set column", g)
        for d in params.distincts:
            t = need(d, NO_VAL, "distinct")
            if t == SET_VAL:
                error("cannot count distinct on set column", d)
        for a in params.aggs:
            need(a.col, INT_VAL, "aggregation")
        if params.time_bucket > 0:
            need(params.time_col, INT_VAL, "time column")
        if params.weight_col:
            need(params.weight_col, INT_VAL, "weight column")

        kinds = {"int": INT_VAL, "str": STR_VAL, "set": SET_VAL}
        filter_specs = []
        filter_vals = []
        bitsets = []
        self.display_strings: dict[str, list[str]] = {}
        for f in params.filters:
            need(f.col, kinds[f.kind], f"{f.kind} filter")
            bidx = -1
            if f.kind == "int":
                filter_vals.append(int(f.value))
            elif f.op in ("re", "nre"):
                strings = self._strings(f.col)
                rx = re.compile(f.value)
                bits = np.fromiter((rx.search(s) is not None for s in strings),
                                   dtype=bool, count=len(strings))
                if len(bits) == 0:
                    bits = np.zeros(1, dtype=bool)
                bidx = len(bitsets)
                bitsets.append(bits)
                filter_vals.append(0)
            else:
                # eq/neq/in/nin resolve the literal to its global id;
                # -1 => never-ingested string, matches nothing (eq) /
                # everything populated (neq)
                filter_vals.append(self.table.dicts.get(f.col).lookup(f.value))
            filter_specs.append(scanops.FilterSpec(f.col, f.op, f.kind, bidx))

        aggspecs = []
        self.agg_layouts = []
        for a in params.aggs:
            kid = schema.key_table[a.col]
            info = schema.int_info.get(kid)
            if info is None:
                error("no cached int info for aggregation column", a.col)
            want_hist = a.op == "hist"
            sub_edges = ()
            if want_hist and a.hist_type == "multi":
                subs = multi_hist_layout(info.min, info.max, params.hist_bucket)
                nv = sum(s[3] for s in subs)
                bs = 0
                sub_edges = tuple(subs)
            elif want_hist and a.hist_type == "tdigest":
                # -tdigest (hist_tdigest.go): value-identity buckets so
                # the sparse device hist pairs carry (near-)exact values
                # for the host t-digest; bucket only when the kept range
                # exceeds the pairkey budget
                span = max(info.max * 10 - info.min, 1)
                cap = 1 << 20
                bs = max(1, -(-span // cap))
                nv = span // bs + 2
            elif want_hist:
                bs, nv = basic_bucket_layout(info.min, info.max,
                                             params.hist_bucket)
            else:
                bs, nv = 0, 0
            self.agg_layouts.append((info, want_hist, a.hist_type))
            aggspecs.append(scanops.AggSpec(
                a.col, hist_min=info.min, bucket_size=bs, num_values=nv,
                discard_min=info.min, discard_max=info.max * 10,
                sub_edges=sub_edges))

        max_groups = flags.max_groups or INTERNAL_RESULT_LIMIT

        # dense-strategy key bounds ([time?, *groups]): str cols bound by
        # the global dictionary, int cols by table IntInfo min/max (which
        # is outlier-resistant — the scan spill-checks at runtime)
        key_bounds = []
        if params.time_bucket > 0:
            kid = schema.key_table[params.time_col]
            info = schema.int_info.get(kid)
            if info is not None and params.time_bucket:
                tb = params.time_bucket
                qmin = self._trunc_div(info.min, tb)
                qmax = self._trunc_div(info.max, tb)
                key_bounds.append((qmin, qmax - qmin + 1))
            else:
                key_bounds.append((0, 0))
        for g in params.groups:
            if self.col_types[g] == STR_VAL:
                key_bounds.append((0, max(len(table.dicts.get(g).strings), 1)))
            else:
                kid = schema.key_table[g]
                info = schema.int_info.get(kid)
                if info is None:
                    key_bounds.append((0, 0))
                else:
                    key_bounds.append((info.min, info.max - info.min + 1))

        # sorted-strategy key packing: exact only when every group key is
        # dictionary-bounded (str dict ids never exceed the dict); int
        # and time bounds come from outlier-resistant IntInfo and can be
        # exceeded at runtime, so they disqualify
        sort_pack = ()
        if (params.groups and not params.distincts
                and params.time_bucket <= 0
                and all(self.col_types[g] == STR_VAL
                        for g in params.groups)):
            sort_pack = tuple(key_bounds)

        self.config = scanops.ScanConfig(
            group_cols=params.groups,
            sort_pack=sort_pack,
            aggs=tuple(aggspecs),
            filters=tuple(filter_specs),
            distinct_cols=params.distincts,
            time_col=params.time_col if params.time_bucket > 0 else "",
            weight_col=params.weight_col,
            max_groups=max_groups,
            track_outliers=any(a.num_values > 0 for a in aggspecs),
            want_matched_mask=params.samples,
            key_bounds=tuple(key_bounds),
            # t-digest value-identity hists would blow up the dense
            # strategy's [slots, nv] bucket matrix; the sorted strategy's
            # sparse pairs carry them at no extra cost
            force_sorted=flags.force_sorted or any(
                a.op == "hist" and a.hist_type == "tdigest"
                for a in params.aggs),
        )
        self.filter_vals = np.asarray(filter_vals, dtype=np.int64)
        self.bitsets = tuple(bitsets)
        self._setup_hll()

        cols = set(params.groups) | set(params.distincts)
        cols |= {a.col for a in params.aggs}
        cols |= {f.col for f in params.filters}
        if self.config.time_col:
            cols.add(params.time_col)
        if params.weight_col:
            cols.add(params.weight_col)
        self.needed_cols = sorted(cols)

    def apply_exact_bounds(self, infos: dict, block_dirs: list[str]) -> None:
        """Derive the scan's lane limb-compression spec (ScanConfig.
        lane_limbs8 / agg_vbias) from EXACT per-block column bounds
        (BlockInfo.int_exact) over the blocks this query will scan.
        0/1-valued lanes always take one byte limb; kw/kwv lanes
        compress when the weight (and value) ranges are exactly bounded
        and nonneg-biasable.  Any block without exact stats for a column
        disables compression for the lanes that depend on it."""
        import dataclasses as _dc

        schema = self.table.schema

        def exact(col: str):
            kid = schema.key_table.get(col)
            if kid is None:
                return (0, 0)
            lo = hi = None
            for d in block_dirs:
                info = infos.get(d)
                if info is None:
                    return None
                e = getattr(info, "int_exact", {}).get(kid)
                if e is None:
                    if kid in info.int_info:
                        return None   # column present but unbounded
                    continue          # column absent: contributes nothing
                lo = e[0] if lo is None else min(lo, e[0])
                hi = e[1] if hi is None else max(hi, e[1])
            return (0, 0) if lo is None else (lo, hi)

        if self.config.weight_col:
            wb = exact(self.config.weight_col)
            if wb is not None and wb[0] >= 0:
                # rows without the weight column weigh 1
                wb = (0, max(wb[1], 1))
            else:
                wb = None
        else:
            wb = (0, 1)

        def limbs_for(maxval: int) -> int:
            if maxval < (1 << 8):
                return 1
            if maxval < (1 << 16):
                return 2
            if maxval < (1 << 32):
                return 4
            return 8

        # exact bounds also upgrade the KEY bounds: IntInfo min/max are
        # outlier-resistant and can be exceeded at runtime (dense spill
        # retry, sort_pack exclusion for int cols); int_exact bounds are
        # authoritative for the snapshot's rows, so dense int keys stop
        # spilling and int group keys become sort-packable
        p = self.params
        key_bounds = list(self.config.key_bounds)
        kb_exact = []
        ki = 0
        if self.config.time_col:
            tb = exact(self.config.time_col)
            if tb is not None and ki < len(key_bounds):
                qlo = self._trunc_div(tb[0], p.time_bucket)
                qhi = self._trunc_div(tb[1], p.time_bucket)
                key_bounds[ki] = (qlo, qhi - qlo + 1)
                kb_exact.append(True)
            else:
                kb_exact.append(False)
            ki += 1
        for g in p.groups:
            if self.col_types.get(g) == STR_VAL:
                kb_exact.append(True)      # dict-bounded, already exact
            else:
                gb = exact(g)
                if gb is not None and ki < len(key_bounds):
                    key_bounds[ki] = (gb[0], gb[1] - gb[0] + 1)
                    kb_exact.append(True)
                else:
                    kb_exact.append(False)
            ki += 1
        sort_pack = self.config.sort_pack
        if (p.groups and not p.distincts and p.time_bucket <= 0
                and all(kb_exact) and not sort_pack):
            prod = 1
            for (_, card) in key_bounds:
                prod *= card + 1
            if 0 < prod < (1 << 62):    # packed key must fit int64
                sort_pack = tuple(key_bounds)

        def fully_populated(col: str) -> bool:
            """Every scanned block has the column populated in ALL its
            rows (IntInfo.count is the per-block populated count)."""
            kid = schema.key_table.get(col)
            if kid is None:
                return False
            for d in block_dirs:
                info = infos.get(d)
                if info is None:
                    return False
                ii = info.int_info.get(kid)
                if ii is None or ii.count != info.num_records:
                    return False
            return bool(block_dirs)

        wmax = wb[1] if wb else 0
        wl = limbs_for(wmax) if wb else 8
        lanes = [wl, 1]
        row_bounds = [wmax if wb else 0, 1]   # 0 = unknown
        lane_nrows = [not p.weight_col, True]
        vbias = []
        for agg in self.config.aggs:
            lanes.append(1)          # exists
            lanes.append(wl)         # kw
            row_bounds += [1, wmax if wb else 0]
            full = fully_populated(agg.col)
            vb = exact(agg.col) if wb else None
            discard_ok = (vb is not None and vb[0] >= agg.discard_min
                          and vb[1] <= agg.discard_max)
            lane_nrows += [full,
                           full and discard_ok and not p.weight_col]
            done = False
            if vb is not None:
                vlo = max(vb[0], agg.discard_min)
                vhi = min(vb[1], agg.discard_max)
                if vhi < vlo:
                    vlo = vhi = 0
                bound = wmax * (vhi - vlo)
                if bound < (1 << 35):
                    lanes.append(limbs_for(bound))
                    row_bounds.append(bound)
                    vbias.append(int(vlo))
                    done = True
            if not done:
                lanes.append(8)
                row_bounds.append(0)
                vbias.append(0)
            lane_nrows.append(False)
        if all(x == 8 for x in lanes):
            lanes, vbias, row_bounds, lane_nrows = [], [], [], []

        # outlier machinery (masks + a top_k over all R rows per hist
        # agg) is only needed when a kept value CAN overflow the bucket
        # range; exact bounds prove the common case can't
        track_outliers = self.config.track_outliers
        if track_outliers:
            need = False
            for agg in self.config.aggs:
                if agg.num_values <= 0:
                    continue
                if agg.sub_edges:        # multihist sub-overflow: keep
                    need = True
                    break
                vbex = exact(agg.col)
                if vbex is None:
                    need = True
                    break
                top = agg.hist_min + agg.bucket_size * agg.num_values
                if min(vbex[1], agg.discard_max) >= top:
                    need = True
                    break
            track_outliers = need

        # windowed dense accumulation for rollups: digestion time-sorts
        # rows, so each block spans a narrow band of time buckets; the
        # scan kernel can then one-hot only [window, C] bands per chunk
        # (ops/scan.py _dense_reduce) instead of the full slot space
        window = 0
        window_chunk = 0
        time_i32 = False
        if self.config.time_col and kb_exact and kb_exact[0]:
            kid_t = schema.key_table.get(self.config.time_col)
            spans = {}
            tlo, thi = 2**62, -2**62
            ok = True
            for d in block_dirs:
                info = infos.get(d)
                e = (getattr(info, "int_exact", {}).get(kid_t)
                     if info else None)
                if e is None:
                    if info is not None and kid_t in info.int_info:
                        ok = False
                        break
                    continue  # block lacks the time column entirely
                qlo = self._trunc_div(e[0], p.time_bucket)
                qhi = self._trunc_div(e[1], p.time_bucket)
                spans[d] = qhi - qlo + 1
                tlo, thi = min(tlo, e[0]), max(thi, e[1])
            if ok and spans:
                # exact bounds prove the whole time column fits int32:
                # the per-row bucket division (and re-division in
                # _dense_gid) then runs at int32 speed — 64-bit div is
                # an emulated multi-pass op and was the largest rollup
                # front-end fusion in round-5 traces
                time_i32 = (-2**31 < tlo and thi < 2**31
                            and 0 < p.time_bucket < 2**31)
                # the banded kernel sweeps as many windows per chunk as
                # the chunk's real gid span needs (ops/scan.py
                # _dense_reduce), so wide straggler blocks
                # (partial-block top-ups, first digests) cost extra
                # bands, never a separate pass.  Rows within a block
                # are time-sorted, so the band loop sub-chunks at
                # window_chunk rows and the window need only cover the
                # MEDIAN block's span scaled to the sub-chunk (one-hot
                # traffic = R*window bytes — the window IS the cost)
                svals = sorted(spans.values())
                t_span = svals[len(svals) // 2]
                radix_rest = 1
                for (_, card) in key_bounds[1:]:
                    radix_rest *= card + 1
                window_chunk = 8192
                frac = max(CHUNK_SIZE // window_chunk, 1)
                t_sub = t_span // frac + 2
                window = -(-(t_sub * radix_rest) // 128) * 128

        self.config = _dc.replace(
            self.config,
            key_bounds=tuple(key_bounds), sort_pack=sort_pack,
            track_outliers=track_outliers, window=window,
            window_chunk=window_chunk, time_i32=time_i32,
            lane_limbs8=tuple(lanes), agg_vbias=tuple(vbias),
            lane_row_bounds=tuple(row_bounds),
            lane_nrows=tuple(lane_nrows))
        self._recheck_hll_cap()
        if self.params.distincts and not self.config.hll:
            # key bounds (esp. the time-bucket quotient) only exist now:
            # a time-bucketed count-distinct becomes dense-bounded here
            # and can still take the device-HLL register path
            self._setup_hll()

    def _recheck_hll_cap(self) -> None:
        """Key bounds can WIDEN after bind (exact stats, read-log dict
        growth); re-apply the device-HLL slot cap so the register array
        never balloons past the HBM budget the bind-time gate set."""
        if self.config.hll and not (0 < self.config.dense_slots <= 128):
            import dataclasses as _dc
            self.config = _dc.replace(self.config, hll=False,
                                      hll_hash_idx=-1)

    def _hll_hash_array(self, dcol: str) -> np.ndarray:
        """Per-dict-id uint64 hashes of (display string + delimiter);
        the appended last entry is the missing-value hash — bit-identical
        inputs to the host HLL slow path (_absorb_distinct)."""
        from .hll import hash64
        strings = self._strings(dcol)
        hs = np.fromiter(
            (hash64((s + GROUP_DELIMITER).encode()) for s in strings),
            dtype=np.uint64, count=len(strings))
        return np.append(hs, np.uint64(hash64(GROUP_DELIMITER.encode())))

    def _setup_hll(self) -> None:
        """Engage the device-side HLL (SURVEY §7: 2^p register array on
        device, merged by max) when the query is a single-column
        count-distinct whose group keys are dense-bounded: the scan then
        runs the DENSE strategy — no sort, no pair download — and ships
        a few 16KB register planes instead (ops/scan.py
        _hll_registers)."""
        import dataclasses as _dc
        p = self.params
        cfg = self.config
        if (len(p.distincts) != 1 or cfg.force_sorted
                or self.flags.data_shards > 1):
            return
        cand = _dc.replace(cfg, hll=True)
        # slots*HLL_M uint8 registers live in HBM; 128 groups = 2MB and
        # bounds the worst-case escalation download
        if not cand.dense_slots or cand.dense_slots > 128:
            return
        dcol = p.distincts[0]
        if self.col_types[dcol] == STR_VAL:
            if len(self.table.dicts.get(dcol).strings) > 65536:
                return
            self.bitsets = self.bitsets + (self._hll_hash_array(dcol),)
            cand = _dc.replace(cand, hll_hash_idx=len(self.bitsets) - 1)
        self.config = cand

    @staticmethod
    def _trunc_div(x: int, d: int) -> int:
        q = abs(x) // d
        return q if x >= 0 else -q

    def refresh_str_filters(self) -> None:
        """Re-resolve str/set filter literals and regex bitsets against the
        current dictionaries.  The -read-log path ingests rowstore strings
        into the in-memory dicts *after* bind time (rows_to_columns), so a
        literal that only exists in undigested WAL rows resolves to -1
        unless refreshed."""
        filter_vals = []
        bitsets = []
        self.display_strings.clear()
        for f in self.params.filters:
            if f.kind == "int":
                filter_vals.append(int(f.value))
            elif f.op in ("re", "nre"):
                strings = self._strings(f.col)
                rx = re.compile(f.value)
                bits = np.fromiter((rx.search(s) is not None for s in strings),
                                   dtype=bool, count=len(strings))
                if len(bits) == 0:
                    bits = np.zeros(1, dtype=bool)
                bitsets.append(bits)
                filter_vals.append(0)
            else:
                filter_vals.append(self.table.dicts.get(f.col).lookup(f.value))
        self.filter_vals = np.asarray(filter_vals, dtype=np.int64)
        self.bitsets = tuple(bitsets)
        if self.config.hll and self.config.hll_hash_idx >= 0:
            # the dict may have grown (read-log strings): rebuild the
            # per-id hash array at its new index
            import dataclasses as _dc
            self.bitsets = self.bitsets + (
                self._hll_hash_array(self.params.distincts[0]),)
            self.config = _dc.replace(self.config,
                                      hll_hash_idx=len(self.bitsets) - 1)

    def refresh_key_bounds(self) -> None:
        """Re-derive str group-key bounds from the CURRENT dictionaries.
        The -read-log path ingests WAL strings into the in-memory dicts
        after bind time; stale bounds would spill every pseudo-block to
        the unpacked fallback (dense digits and the packed sort key are
        runtime-guarded, so this is a fast-path refresh, not a
        correctness requirement)."""
        import dataclasses as _dc
        p = self.params
        kb = list(self.config.key_bounds)
        ki = 1 if self.config.time_col else 0
        changed = False
        for g in p.groups:
            if self.col_types.get(g) == STR_VAL and ki < len(kb):
                card = max(len(self.table.dicts.get(g).strings), 1)
                if kb[ki] != (0, card):
                    kb[ki] = (0, card)
                    changed = True
            ki += 1
        if not changed:
            return
        sort_pack = self.config.sort_pack
        if sort_pack and not self.config.time_col and \
                len(sort_pack) == len(kb):
            sort_pack = tuple(kb)
        self.config = _dc.replace(self.config, key_bounds=tuple(kb),
                                  sort_pack=sort_pack)
        self._recheck_hll_cap()

    def _strings(self, col: str) -> list[str]:
        """Global dict strings with -str-replace applied (the reference
        rewrites strings at decode, column_store_io.go:517-546, so both
        regex filters and display see replaced values)."""
        if col in self.display_strings:
            return self.display_strings[col]
        strings = list(self.table.dicts.get(col).strings)
        rep = self.params.str_replace.get(col)
        if rep:
            rx = re.compile(rep[0])
            strings = [rx.sub(rep[1], s) for s in strings]
        self.display_strings[col] = strings
        return strings

    # ------------------------------------------------------------------
    def should_scan_block(self, info: blockio.BlockInfo) -> bool:
        """Min/max block pruning (table_block_io.go:110-182): only int
        gt/lt/eq filters participate."""
        if not info.int_info:
            return True
        schema = self.table.schema
        for i, f in enumerate(self.params.filters):
            if f.kind != "int" or f.op not in ("gt", "lt", "eq"):
                continue
            kid = schema.key_table.get(f.col)
            ii = info.int_info.get(kid)
            v = int(f.value)
            if ii is None:
                return False  # filter requires a column this block lacks
            if f.op == "gt" and ii.max <= v:
                return False
            if f.op == "lt" and ii.min >= v:
                return False
            if f.op == "eq" and (ii.min > v or ii.max < v):
                return False
        return True


def _pad_pow2(n: int, floor: int = 128) -> int:
    v = floor
    while v < n:
        v *= 2
    return v


class BatchLoader:
    """Assembles [B, C] device arrays for a batch of blocks, reusing the
    HBM-resident column cache: each (block, column) lane uploads once and
    later scans only stack resident arrays (ops/residency.py)."""

    def __init__(self, bound: BoundQuery, block_dirs: list[str], C: int,
                 expected: dict[str, int] | None = None, shards: int = 0,
                 global_mesh=None):
        self.bound = bound
        self.block_dirs = block_dirs
        self.C = C
        self.shards = shards   # >0: set-filter CSR built per mesh shard
        # global_mesh: multi-host mode — block_dirs is this process's
        # local span of the global batch; decoded columns stay on their
        # local devices and are stitched into mesh-sharded global arrays
        # (parallel/multihost.py global_batch_device), cached per batch
        self.global_mesh = global_mesh
        # num_records per block as captured at query start; a column whose
        # decoded length disagrees means the block was republished between
        # the info read and the column load — skip it, mirroring the
        # reference's "BLOCK SIZE CHANGED DURING QUERY" guard
        # (column_store_io.go:525,572,592,734,751)
        self.expected = expected or {}
        self.changed: set[str] = set()

    def _resident_col(self, bdir: str, name: str, typ: int):
        """-> (values[C], valid[C], n_records) for one block column;
        n_records is -1 when the block lacks the column file."""
        import jax.numpy as jnp

        from ..ops.residency import CACHE, block_col_key

        C = self.C
        key = block_col_key(bdir, blockio.column_file(typ, name), name, C)
        ent = CACHE.get(key)
        if ent is not None:
            self._check_block(bdir, ent[2])
            return ent
        try:
            data = blockio.load_block_columns(
                bdir, self.bound.table.schema, [name]).get(name)
        except Exception as e:  # noqa: BLE001 - torn/corrupt block file
            warn("corrupt column file; skipping block", bdir, e)
            self.changed.add(bdir)
            data = None
        values = np.zeros(C, dtype=np.int64)
        valid = np.zeros(C, dtype=bool)
        ncol = -1
        if isinstance(data, blockio.IntColumnData):
            ncol = len(data.values)
            n = min(ncol, C)
            values[:n] = data.values[:n]
            valid[:n] = data.valid[:n]
        elif isinstance(data, blockio.StrColumnData):
            ncol = len(data.ids)
            n = min(ncol, C)
            values[:n] = data.ids[:n]
            valid[:n] = data.valid[:n]
        ent = (jnp.asarray(values), jnp.asarray(valid), ncol)
        CACHE.put(key, ent)
        return ent

    def _decode_batch_device(self, name: str, typ: int):
        """Batched DEVICE decode of one column (ops/decode.py): mmap the
        raw encoded sections, pad into batch arrays, decode on the TPU.
        Returns (values [B, C], valid [B, C], ncols) or None to fall
        back to the host decoder (exotic shapes, oversized blocks)."""
        from ..ops.decode import decode_column_batch
        containers = []
        for bdir in self.block_dirs:
            try:
                containers.append(blockio.open_column(bdir, typ, name))
            except Exception as e:  # noqa: BLE001 - torn/corrupt file:
                # skip the block (the reference demotes half-written
                # blocks and tolerates concurrent rewrites; a torn file
                # must never kill the whole query)
                warn("corrupt column file; skipping block", bdir, e)
                self.changed.add(bdir)
                containers.append(None)
        try:
            return decode_column_batch(containers, self.C)
        except ValueError as e:
            debug("device decode fallback for", name, ":", e)
            return None

    def _check_block(self, bdir: str, ncol: int) -> None:
        exp = self.expected.get(bdir)
        if ncol >= 0 and exp is not None and ncol != exp:
            if bdir not in self.changed:
                warn("BLOCK SIZE CHANGED DURING QUERY", bdir,
                     f"({exp} -> {ncol}); skipping block")
            self.changed.add(bdir)

    def load(self):
        import jax.numpy as jnp

        bound = self.bound
        B = len(self.block_dirs)
        C = self.C
        R = B * C
        schema = bound.table.schema
        nrec = np.zeros(B, dtype=np.int32)
        cols = {}
        set_cols: dict[str, list] = {}

        dense_names = [n for n in bound.needed_cols
                       if bound.col_types[n] != SET_VAL]
        for name in bound.needed_cols:
            if bound.col_types[name] == SET_VAL:
                set_cols[name] = []

        for bi, bdir in enumerate(self.block_dirs):
            exp = self.expected.get(bdir)
            if exp is None:
                # no snapshot (direct loader use): read the info now
                info = blockio.load_block_info(bdir)
                exp = info.num_records if info else 0
            # record counts come from the info snapshot taken at query
            # start — re-reading every block's info.json per batch costs
            # more than the whole device dispatch; staleness is caught by
            # the column-length checks below
            nrec[bi] = min(exp, C)

        from ..ops.residency import CACHE, block_col_key

        # set columns get the same residency treatment as dense lanes:
        # the per-block CSR caches host-side (no disk re-read per batch
        # per query) and the padded batch arrays pin in HBM keyed like
        # the dense batch entries, so warm set-filter queries upload
        # nothing
        set_batch_keys = {}
        set_dev: dict[str, tuple] = {}
        set_ncols: dict[str, list] = {}
        for name in set_cols:
            bkeys = tuple(
                block_col_key(bdir, blockio.column_file(SET_VAL, name),
                              name, C) for bdir in self.block_dirs)
            set_batch_keys[name] = ("set_batch", name, bkeys, self.shards)
            if self.global_mesh is None:
                ent = CACHE.get(set_batch_keys[name])
                if ent is not None:
                    set_dev[name] = ent
                    continue
            ncols = set_ncols[name] = [-1] * B
            for bi, bdir in enumerate(self.block_dirs):
                if not nrec[bi]:
                    continue
                ck = ("setcsr",) + bkeys[bi]
                cd = CACHE.get(ck)
                if cd is None:
                    try:
                        raw = blockio.load_block_columns(
                            bdir, schema, [name]).get(name)
                    except Exception as e:  # noqa: BLE001 - torn file
                        warn("corrupt set column; skipping block",
                             bdir, e)
                        self.changed.add(bdir)
                        continue
                    ncol = len(raw.offsets) - 1
                    rows = np.repeat(np.arange(ncol),
                                     np.diff(raw.offsets))
                    cd = (rows, raw.values, ncol)
                    CACHE.put(ck, cd)
                self._check_block(bdir, cd[2])
                ncols[bi] = cd[2]
                set_cols[name].append((cd[0] + bi * C, cd[1]))
        gmesh = self.global_mesh
        if gmesh is not None:
            from ..parallel.multihost import global_batch_device
        for name in dense_names:
            typ = bound.col_types[name]
            block_keys = tuple(
                block_col_key(bdir, blockio.column_file(typ, name), name, C)
                for bdir in self.block_dirs)
            batch_key = ("batch", name, block_keys)
            gkey = ("gbatch", name, block_keys, gmesh)
            if gmesh is not None:
                gent = CACHE.get(gkey)
                if gent is not None:
                    for bdir, ncol in zip(self.block_dirs, gent[2]):
                        self._check_block(bdir, ncol)
                    cols[name] = (gent[0], gent[1])
                    continue
            ent = CACHE.get(batch_key)
            if ent is None:
                ent = self._decode_batch_device(name, typ)
                if ent is None:
                    # host-decode fallback: stack per-block resident lanes
                    lanes = [self._resident_col(bdir, name, typ)
                             for bdir in self.block_dirs]
                    ent = (jnp.stack([e[0] for e in lanes]),
                           jnp.stack([e[1] for e in lanes]),
                           tuple(e[2] for e in lanes))
                import jax
                jax.block_until_ready(ent[:2])
                CACHE.put(batch_key, ent)
            for bdir, ncol in zip(self.block_dirs, ent[2]):
                self._check_block(bdir, ncol)
            if gmesh is not None:
                # stitch local device buffers into a mesh-sharded global
                # array (no host round trip) and pin the result: warm
                # multi-host queries re-upload nothing at all
                gent = (global_batch_device(gmesh, ent[0]),
                        global_batch_device(gmesh, ent[1]), ent[2])
                CACHE.put(gkey, gent)
                cols[name] = (gent[0], gent[1])
            else:
                cols[name] = (ent[0], ent[1])

        if not cols:
            # bare count(*) query: synthesize one lane so the kernel has a
            # shape to scan; row_in_range does the counting
            cnt = (jnp.zeros((B, C), dtype=jnp.int64),
                   jnp.ones((B, C), dtype=bool))
            if gmesh is not None:
                cnt = (global_batch_device(gmesh, cnt[0]),
                       global_batch_device(gmesh, cnt[1]))
            cols["__count__"] = cnt

        set_aux = {}
        for name, chunks in set_cols.items():
            if name in set_dev:
                prow_d, pval_d, ncols = set_dev[name]
                for bdir, ncol in zip(self.block_dirs, ncols):
                    self._check_block(bdir, ncol)
                set_aux[name] = (prow_d, pval_d)
                continue
            if chunks:
                rows = np.concatenate([c[0] for c in chunks])
                vals = np.concatenate([c[1] for c in chunks]).astype(np.int64)
            else:
                rows = np.zeros(0, dtype=np.int64)
                vals = np.zeros(0, dtype=np.int64)
            if self.shards > 1:
                # per-shard CSR: device d owns the contiguous block range
                # [d*B/D, (d+1)*B/D); row ids become shard-local and pad
                # rows point at the shard's R_local sentinel slot
                D = self.shards
                R_local = (B // D) * C
                dev = (rows // R_local).astype(np.int64) if len(rows) \
                    else rows
                local = rows - dev * R_local
                per = [np.nonzero(dev == d)[0] for d in range(D)]
                m = _pad_pow2(max([len(p) for p in per] + [1]))
                prow = np.full((D, m), R_local, dtype=np.int32)
                pval = np.full((D, m), -2, dtype=np.int64)
                for d, p in enumerate(per):
                    prow[d, : len(p)] = local[p]
                    pval[d, : len(p)] = vals[p]
            else:
                m = _pad_pow2(max(len(rows), 1))
                prow = np.full(m, R, dtype=np.int32)
                pval = np.full(m, -2, dtype=np.int64)
                prow[:len(rows)] = rows
                pval[:len(vals)] = vals
            if self.global_mesh is None:
                # pin the padded batch CSR in HBM like dense batches
                import jax
                dev = (jnp.asarray(prow), jnp.asarray(pval))
                jax.block_until_ready(dev)
                CACHE.put(set_batch_keys[name],
                          (dev[0], dev[1], tuple(set_ncols[name])))
                set_aux[name] = dev
            else:
                set_aux[name] = (prow, pval)
        if self.changed:
            # zero out changed blocks so the kernel scans nothing from
            # them — after EVERY staleness probe has run, including the
            # set-batch cache hits above (a set-only query's sole
            # _check_block sits in that loop)
            for bi, bdir in enumerate(self.block_dirs):
                if bdir in self.changed:
                    nrec[bi] = 0
        return cols, nrec, set_aux


def run_query(table: Table, params: QueryParams,
              flags: Flags | None = None) -> QueryResults:
    from ..profiler import PhaseTimer
    timer = PhaseTimer()

    # the reference disables Go GC for the duration of a query
    # (cmd_query.go:353, re-enabled above MAX_MEM table_query.go:286);
    # CPython's generational GC likewise costs 10s of ms per collection
    # once the process heap holds block arrays — pause it for the query
    import gc
    gc_was_enabled = gc.isenabled()
    if gc_was_enabled:
        gc.disable()
    try:
        return _run_query_inner(table, params, flags, timer)
    finally:
        if gc_was_enabled:
            gc.enable()


def _run_query_inner(table: Table, params: QueryParams,
                     flags: Flags | None, timer) -> QueryResults:
    flags = flags or table.flags
    with timer.phase("bind"):
        if not table.load_info() and not table.exists():
            error("table", table.name,
                  "can not be loaded or does not exist in", flags.dir)
        bound = BoundQuery(table, params, flags)

    with timer.phase("list_blocks"):
        infos = table.block_infos()
        block_dirs = [d for d, info in infos.items()
                      if bound.should_scan_block(info)]
        bound.apply_exact_bounds(infos, block_dirs)
    skipped = len(infos) - len(block_dirs)
    if skipped:
        debug("skipped", skipped, "blocks via min/max pruning")

    maxrec = max((infos[d].num_records for d in block_dirs), default=0)
    C = CHUNK_SIZE if maxrec > 8192 else _pad_pow2(max(maxrec, 1))
    B = max(1, min(flags.device_batch, max(len(block_dirs), 1)))

    mesh = None
    multihost = False
    from ..parallel import multihost as mh
    mh.init_distributed(flags)
    if mh.is_multiprocess():
        # N processes, one mesh: every process runs this same program;
        # the scan shards over ALL processes' devices (parallel/multihost.py)
        import jax
        multihost = True
        if flags.data_shards <= 1:
            flags.data_shards = jax.device_count()
    if flags.data_shards > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(flags.data_shards)
        D = flags.data_shards
        # round UP to a mesh multiple: rounding down would split (say) 31
        # blocks over 2 shards into TWO full-shape padded batches — the
        # padded tail costs a whole batch of compute and erases the
        # entire multi-device speedup
        B = -(-B // D) * D
        if multihost:
            import jax
            nproc = jax.process_count()
            if D % nproc or (B // D) * D % nproc:
                error("data-shards", D, "must divide evenly across",
                      nproc, "processes")

    if mesh is not None:
        import dataclasses as _dc
        # register planes don't ride the mesh shuffle payload (fall back
        # to the sorted pair path), and shuffled table rows are not
        # slot-aligned (keep the keyed table format on the wire)
        bound.config = _dc.replace(bound.config, no_compact_table=True,
                                   **({"hll": False, "hll_hash_idx": -1}
                                      if bound.config.hll else {}))

    ctx = _ScanCtx(bound, infos, flags, params, timer, mesh, C,
                   multihost=multihost)

    cache_mode = (flags.cache_queries and not params.samples
                  and not flags.read_log)
    if cache_mode:
        from . import cache as qcache
        acc = _Accumulator(bound)
        with timer.phase("cache_probe"):
            # form groups over ALL full blocks — never the min/max-pruned
            # list — so changing a filter constant cannot re-align group
            # boundaries and orphan cache entries for unchanged blocks
            # (the reference keys per block, query_cache.go:174-242, and
            # so has no such coupling); pruned blocks are skipped INSIDE
            # the group scan instead (they contribute zero matched rows
            # by construction, should_scan_block == table_block_io.go
            # min/max semantics)
            scanset = set(block_dirs)
            groups, rest = qcache.stable_groups(list(infos), infos)
            rest = [d for d in rest if d in scanset]
            missed: list[tuple[str, list[str]]] = []
            hits = 0
            for gdirs in groups:
                k = qcache.group_cache_key(params, table, gdirs, infos)
                cached = qcache.load_group_rows(table, k, bound)
                if cached is None:
                    missed.append((k, gdirs))
                else:
                    acc.merge_from(cached)
                    hits += 1
        if hits:
            debug("query cache:", hits, "group hits,", len(missed),
                  "misses,", len(rest), "uncacheable blocks")
        # scan ALL missed groups through one batch pipeline (each group's
        # partial rows land in its own accumulator) instead of one
        # blocking round trip per group: the reference amortizes cache
        # writes inside its scan goroutines (table_query.go:230-305), and
        # the sequential form cost up to 40x an uncached scan in
        # per-group device round trips alone
        missed_live = [(k, [d for d in gdirs if d in scanset])
                       for k, gdirs in missed]
        group_accs = {}
        if not acc.distinct_limit_hit():
            to_scan = [(k, live) for k, live in missed_live if live]
            # many groups per dispatch via a synthetic group-index key
            # (one download round trip per ~B/16 groups); only when the
            # augmented key space stays dense and the shapes are local.
            # The vgroup count ADAPTS: the largest power-of-two batch
            # whose augmented key space still fits the dense (banded-
            # window / HLL-plane) budget — time rollups and grouped
            # distincts ride smaller vgroup batches instead of falling
            # back to one blocking round trip per group
            use_vg = False
            vg_cap = 1
            if to_scan and mesh is None and not multihost \
                    and B >= qcache.GROUP_SIZE \
                    and all(len(g) <= qcache.GROUP_SIZE
                            for _, g in to_scan):
                import dataclasses as _dc
                ng_try = max(1, min(len(to_scan),
                                    max(1, B // qcache.GROUP_SIZE)))
                ngp = 1
                while ngp < ng_try:
                    ngp *= 2       # the scan pads group counts to pow2
                while ngp >= 1:
                    probe = _dc.replace(
                        bound.config,
                        group_cols=("__cg__",) + bound.config.group_cols,
                        key_bounds=((0, ngp),) + bound.config.key_bounds,
                        sort_pack=(), vg_span=qcache.GROUP_SIZE)
                    ok_dense = probe.dense_slots > 0 and (
                        not probe.hll or probe.dense_slots <= 1024) and (
                        # windowed rollups: the compact table download
                        # scales with slots x groups — keep it ~128KB
                        probe.window == 0 or probe.dense_slots <= 16384)
                    # the sorted strategy takes the cg key like any
                    # other sort key — no slot budget applies (distinct
                    # pairs and sparse hist rows stay keyed by value)
                    ok_sorted = (probe.dense_slots == 0
                                 and not probe.hll)
                    if ok_dense or ok_sorted:
                        use_vg = True
                        vg_cap = ngp
                        if ok_sorted and bound.config.distinct_cols:
                            # pair-compaction buffers scale with the
                            # group count; distinct pairs are the
                            # widest rows — keep the download bounded
                            vg_cap = min(ngp, 2)
                        break
                    ngp //= 2
            if to_scan and use_vg:
                # the uncacheable rest blocks ride the same dispatch as
                # extra (unsaved) virtual groups of <= GROUP_SIZE each
                vg_groups = list(to_scan)
                GS = qcache.GROUP_SIZE
                rest_keys = []
                for j in range(0, len(rest), GS):
                    rk = ("__REST__", j)
                    rest_keys.append(rk)
                    vg_groups.append((rk, rest[j: j + GS]))
                group_accs = _scan_cache_vgroups(ctx, vg_groups, B,
                                                 vg_cap)
                for rk in rest_keys:
                    ra = group_accs.pop(rk, None)
                    if ra is not None:
                        acc.merge_from(ra)
                rest = []
            elif to_scan:
                # one group per batch: groups are GROUP_SIZE blocks, so
                # a full-size device batch would pad 16 real blocks to
                # device_batch shapes of dead compute
                Bg = min(B, qcache.GROUP_SIZE)
                if flags.data_shards > 1:
                    Bg = -(-Bg // flags.data_shards) * flags.data_shards
                group_accs = _scan_dirs(ctx, [], Bg, allow_prune=False,
                                        groups=to_scan)
        for k, live in missed_live:
            if live:
                sub = group_accs.get(k)
                if sub is None:
                    continue  # distinct-limit stopped the scan early:
                              # never cache a group that wasn't scanned
            else:   # whole group pruned: cache the empty partial
                sub = _Accumulator(bound)
            if mh.is_printer():  # one writer per mesh; others share disk
                with timer.phase("cache_save"):
                    qcache.save_group_rows(table, k, sub)
            acc.merge_from(sub)
            acc.maybe_prune()
        if rest and not acc.distinct_limit_hit():
            Br = min(B, len(rest))
            if flags.data_shards > 1:
                # batch shapes must stay divisible by the mesh axis
                Br = -(-Br // flags.data_shards) * flags.data_shards
            sub = _scan_dirs(ctx, rest, Br, allow_prune=False)
            acc.merge_from(sub)
            acc.maybe_prune()
    else:
        _maybe_device_prune(bound, params, block_dirs, B)
        acc = _scan_dirs(ctx, block_dirs, B, allow_prune=True)

    if flags.read_log:
        with timer.phase("rowstore"):
            _scan_rowstore(acc, bound, table, params, flags)

    with timer.phase("finish"):
        qr = acc.finish()
    timer.report("query")
    return qr


def _maybe_device_prune(bound: BoundQuery, params: QueryParams,
                        block_dirs: list[str], B: int) -> None:
    """Run PruneResults ON the chip (ScanConfig.prune_topk): when a scan
    spans multiple batches, each batch ships only its top 10*limit
    (<=1000) group rows instead of the full (up to 100k-slot) table —
    same approximation as the reference's intermediate CombineAndPrune
    (aggregate.go:347,469-471), but the ranking, selection, and download
    shrink all happen on device.  Engaged only where it is exactly the
    host prune's semantics: plain-count/avg aggs (no hist bucket or HLL
    lanes to carry), no time rollup (host prune ranks whole groups
    across buckets), prune metric = $COUNT or an agg mean, and the scan
    covers more than CHUNKS_BEFORE_GC=16 blocks — the reference prunes
    intermediates at every 16-block combine (table_query.go:263-279),
    so any query it would have pruned, this one may too; smaller tables
    stay exact on both sides."""
    import dataclasses as _dc

    p = params
    if not p.prune_by or p.limit <= 0 or len(block_dirs) <= 16:
        return
    if p.distincts or p.time_bucket > 0:
        return
    if any(a.num_values > 0 for a in bound.config.aggs):
        return
    pagg = -1
    if p.prune_by != SORT_COUNT:
        cols = [a.col for a in p.aggs]
        if p.prune_by not in cols:
            return
        pagg = cols.index(p.prune_by)
    cap = min(p.limit * 10, 1000)
    bound.config = _dc.replace(bound.config, prune_topk=cap,
                               prune_agg=pagg)


def _scan_cache_vgroups(ctx: "_ScanCtx", groups, B: int, vg_cap: int):
    """Scan MANY 16-block cache groups in ONE device dispatch by
    prepending a synthetic per-block group-index key ("__cg__", value =
    block_position // GROUP_SIZE): the result table then carries
    (cache-group, *group-keys) rows that the host splits into per-group
    accumulators.  One download round trip per ~vg_cap groups instead
    of one per group — the last factor between cache-write cost and an
    uncached scan.  Under a time rollup the cg key is emitted MOST
    significant (ScanConfig.vg_first) so the banded window sweep still
    applies; HLL register-plane shipment is raised to cover every
    possible live vgroup.  Dispatches pipeline across group chunks
    (async D2H) like _scan_dirs.  Returns {key: acc} like
    _scan_dirs(groups=...)."""
    import dataclasses as _dc

    from ..ops.residency import device_const
    from . import cache as qcache

    bound, timer, C = ctx.bound, ctx.timer, ctx.C
    GS = qcache.GROUP_SIZE
    ngrp_max = max(1, min(B // GS, vg_cap))
    accs: dict = {}

    def dispatch_chunk(chunk, force_sorted: bool):
        ng = len(chunk)
        # pad the group count to a power of two: one kernel shape per
        # size class instead of one per missed-group count (server-side
        # compiles on the tunneled backend are tens of seconds each)
        ngp = 1
        while ngp < ng:
            ngp *= 2
        dirs = []
        pad_pos = []
        for _, gdirs in chunk:
            gg = list(gdirs)[:GS]
            while len(gg) < GS:      # partial (rest) group: pad + zero
                pad_pos.append(len(dirs) + len(gg))
                gg.append(gg[-1])
            dirs += gg
        real = len(dirs)
        if ngp > ng:
            dirs = dirs + [dirs[-1]] * ((ngp - ng) * GS)
        base = bound.config
        vcfg = _dc.replace(
            base,
            group_cols=("__cg__",) + base.group_cols,
            key_bounds=((0, ngp),) + base.key_bounds,
            sort_pack=(), vg_span=GS,
            hll_ship=max(base.hll_ship, 2 * ngp) if base.hll
            else base.hll_ship,
            # ngp groups share one batch: per-batch compaction caps
            # must scale or every vgroup dispatch escalates
            max_pairs=min(base.max_pairs * ngp, 1 << 20),
            max_hist_pairs=min(base.max_hist_pairs * ngp, 1 << 20),
            max_out=min(base.max_out * ngp, 1 << 18),
            force_sorted=force_sorted or base.force_sorted)
        with timer.phase("load"):
            loader = BatchLoader(bound, dirs, C,
                                 {d: ctx.infos[d].num_records
                                  for d in dirs if d in ctx.infos})
            cols, nrec, set_aux = loader.load()
            nrec[real:] = 0          # padding blocks contribute nothing
            for pp in pad_pos:       # in-group padding of partial groups
                nrec[pp] = 0
            Bc = len(dirs)
        with timer.phase("dispatch"):
            from ..ops.scan import scan_packed_jit
            packed, out = scan_packed_jit(
                vcfg, cols, device_const(nrec), ctx.jfv, ctx.jbits,
                ctx.jtb,
                {k: (device_const(r) if isinstance(r, np.ndarray)
                     else r,
                     device_const(v) if isinstance(v, np.ndarray)
                     else v) for k, (r, v) in set_aux.items()})
        _start_d2h(packed)
        return vcfg, packed, out, Bc

    def drain_chunk(chunk, vcfg, packed, out, Bc):
        tmp = _Accumulator(bound)
        tmp.prune_cap = 0
        with timer.phase("drain"):
            spill = tmp.absorb_packed(packed, out, Bc * C, vcfg)
        if spill > 0:
            # a key fell outside its declared bound: redo this chunk
            # alone, blocking, on the unpacked sorted strategy
            debug("vgroup scan spilled; retrying unpacked sorted")
            vcfg2, packed2, out2, Bc2 = dispatch_chunk(chunk, True)
            tmp = _Accumulator(bound)
            tmp.prune_cap = 0
            with timer.phase("drain"):
                tmp.absorb_packed(packed2, out2, Bc2 * C, vcfg2)
        ng = len(chunk)
        split_rows: list[dict] = [dict() for _ in range(ng)]
        split_matched = [0] * ng
        split_batches: list[list] = [[] for _ in range(ng)]
        if tmp.np_batches and not tmp.rows:
            # columnar split by the leading cache-group key: per-group
            # partials stay parked as numpy batches (the binary cache
            # writes them columnar, and hits merge them back columnar)
            for ak, counts, samples, aggs in tmp.np_batches:
                cg = ak[:, 0]
                for j in range(ng):
                    sel = np.nonzero(cg == j)[0]
                    if not len(sel):
                        continue
                    split_batches[j].append((
                        ak[sel][:, 1:], counts[sel], samples[sel],
                        [(ex[sel], cnt[sel], wv[sel], mn[sel], mx[sel])
                         for (ex, cnt, wv, mn, mx) in aggs]))
                    split_matched[j] += int(samples[sel].sum())
            tmp.np_batches = []
        else:
            # slow shapes (hist lanes, distinct registers): dict split
            tmp._materialize()
            for kt, row in tmp.rows.items():
                j = kt[0]
                if 0 <= j < ng:
                    split_rows[j][kt[1:]] = row
                    split_matched[j] += row["samples"]
        for j, (k, _) in enumerate(chunk):
            a = _Accumulator(bound)
            a.prune_cap = 0
            a.rows = split_rows[j]
            a.np_batches = split_batches[j]
            a.matched_count = split_matched[j]
            a.batches = 1
            accs[k] = a

    pending: list[tuple] = []
    for start in range(0, len(groups), ngrp_max):
        chunk = groups[start: start + ngrp_max]
        pending.append((chunk, *dispatch_chunk(chunk, False)))
        if len(pending) >= PIPELINE:
            drain_chunk(*pending.pop(0))
    while pending:
        drain_chunk(*pending.pop(0))
    return accs


class _ScanCtx:
    """Shared per-query scan state threaded through _scan_dirs calls."""

    def __init__(self, bound, infos, flags, params, timer, mesh, C,
                 multihost: bool = False):
        self.bound = bound
        self.infos = infos
        self.flags = flags
        self.params = params
        self.timer = timer
        self.mesh = mesh
        self.C = C
        self.multihost = multihost
        self.refresh_consts()

    def refresh_consts(self):
        from ..ops.residency import device_const
        if self.multihost:
            # raw numpy: identical on every process, JAX treats host
            # values under a replicated in_spec as one global constant
            self.jfv = np.asarray(self.bound.filter_vals)
            self.jbits = tuple(np.asarray(b) for b in self.bound.bitsets)
        else:
            self.jfv = device_const(self.bound.filter_vals)
            self.jbits = tuple(device_const(b) for b in self.bound.bitsets)
        self.jtb = (np.asarray(self.params.time_bucket or 1, dtype=np.int64)
                    if self.multihost else device_const(
                        np.asarray(self.params.time_bucket or 1,
                                   dtype=np.int64)))


PIPELINE = 4   # batches in flight before the oldest download blocks


def _start_d2h(packed) -> None:
    """Kick off the device->host copy of a batch's packed buffer as soon
    as it is dispatched: the drain loop's np.asarray then finds the
    bytes already in flight instead of paying one full round trip per
    batch serially — the difference between ~30ms and ~30ms*n_batches
    of pure link latency on multi-batch scans (the cache-write path
    dispatches one batch per 16-block group)."""
    try:
        packed["main"].copy_to_host_async()
    except Exception:  # noqa: BLE001 - sharded/multihost arrays fetch later
        pass


def _scan_dirs(ctx: _ScanCtx, block_dirs: list[str], B: int,
               allow_prune: bool, groups=None):
    """Scan a set of block dirs into a fresh accumulator, with the batch
    pipeline and dense-spill retry scoped to this call.

    groups: optional [(key, dirs), ...].  When given, every group's
    batches ride ONE shared pipeline but land in a per-group
    accumulator, and the return value is {key: acc} for the groups whose
    batches all completed — the cache path uses this so per-group cache
    writes cost one pipelined pass instead of one blocking device round
    trip per group (the reference amortizes cache writes inside its scan
    goroutines, table_query.go:230-305)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from ..ops.residency import device_const

    def _dev(x):
        # set_aux arrives as HBM-pinned jax arrays when the loader's
        # batch cache hit; only numpy falls through to device_const
        return x if not isinstance(x, np.ndarray) else device_const(x)

    bound, flags, params, timer = ctx.bound, ctx.flags, ctx.params, ctx.timer
    mesh, C = ctx.mesh, ctx.C
    infos = ctx.infos

    multihost = ctx.multihost
    if multihost:
        import functools

        import jax

        from ..parallel import multihost as mh
        nproc = jax.process_count()
        pid = jax.process_index()

    if groups is None:
        work = [(None, block_dirs[s: s + B], B)
                for s in range(0, len(block_dirs), B)]
        all_dirs = list(block_dirs)
    else:
        work = [(k, dirs[s: s + B], B)
                for k, dirs in groups
                for s in range(0, len(dirs), B)]
        all_dirs = [d for _, dirs in groups for d in dirs]
    n_batches = {}
    for k, *_ in work:
        n_batches[k] = n_batches.get(k, 0) + 1

    for attempt in range(2):
        accs: dict = {}
        drained: dict = {}

        def get_acc(k):
            a = accs.get(k)
            if a is None:
                a = accs[k] = _Accumulator(bound)
                if multihost:
                    # escalation downloads may hit sharded global arrays;
                    # fetch all-gathers them into replicated form first
                    a.fetch = functools.partial(mh.fetch, mesh=mesh)
                if not allow_prune:
                    a.prune_cap = 0
            return a

        acc = get_acc(None) if groups is None else None
        spilled = False
        pending: list[tuple] = []

        def drain_one() -> bool:
            gkey, cfg, packed, out, R, batch_dirs, nrec = pending.pop(0)
            a = get_acc(gkey)
            if a.absorb_packed(packed, out, R, cfg) > 0:
                return False
            drained[gkey] = drained.get(gkey, 0) + 1
            if allow_prune:
                a.maybe_prune()
            if params.samples and groups is None and \
                    len(a.sample_rows) < max(params.limit, 1) * 4:
                a.collect_samples(out, batch_dirs, nrec, C)
            return True

        def stop_early() -> bool:
            if params.num_distinct <= 0:
                return False
            if groups is None:
                return allow_prune and acc.distinct_limit_hit()
            # distinct groups over the UNION of per-group partials —
            # summing per-accumulator counts would double-count keys
            # shared between cache groups and stop the scan early
            seen = set()
            for a in accs.values():
                a._materialize()
                for kt in a.rows:
                    seen.add(a._group_part(kt))
            return len(seen) >= params.num_distinct

        expected = {d: infos[d].num_records for d in all_dirs
                    if d in infos}
        for gkey, batch, Bi in work:
            if stop_early():
                break
            cfg = bound.config
            batch_dirs = batch + [batch[-1]] * (Bi - len(batch))  # pad
            R = Bi * C
            if multihost:
                # each process loads/feeds only its local span of the
                # global batch; arrays are stitched into one global
                # array sharded over the mesh (parallel/multihost.py)
                D = flags.data_shards
                Bl = Bi // nproc
                lo = pid * Bl
                local_dirs = batch_dirs[lo: lo + Bl]
                with timer.phase("load"):
                    loader = BatchLoader(bound, local_dirs, C, expected,
                                         shards=D // nproc,
                                         global_mesh=mesh)
                    cols, nrec, set_aux = loader.load()
                # zero global-padding blocks falling in this span
                cut = max(0, min(len(batch) - lo, Bl))
                nrec[cut:] = 0
                # the host-side sample walk needs per-block counts for
                # the WHOLE batch; the info snapshot is shared state
                nrec_global = np.array(
                    [min(expected.get(d, 0), C) for d in batch_dirs],
                    dtype=np.int32)
                nrec_global[len(batch):] = 0
                with timer.phase("dispatch"):
                    from ..ops.scan import pack_jit
                    from ..parallel.mesh import sharded_scan
                    jcols = cols   # already mesh-sharded global arrays
                    jnrec = mh.global_batch(mesh, nrec)
                    gsa = {}
                    R_local = (Bi // D) * C
                    for k, (prow, pval) in set_aux.items():
                        # pad widths must agree across processes
                        m_t = mh.allgather_max(prow.shape[1])
                        if prow.shape[1] < m_t:
                            pr = np.full((prow.shape[0], m_t), R_local,
                                         dtype=prow.dtype)
                            pv = np.full((pval.shape[0], m_t), -2,
                                         dtype=pval.dtype)
                            pr[:, :prow.shape[1]] = prow
                            pv[:, :pval.shape[1]] = pval
                            prow, pval = pr, pv
                        gsa[k] = (mh.global_batch(mesh, prow),
                                  mh.global_batch(mesh, pval))
                    out = sharded_scan(cfg, mesh, jcols, jnrec,
                                       ctx.jfv, ctx.jbits, ctx.jtb, gsa)
                    packed = pack_jit(cfg, out, R)
                pending.append((gkey, cfg, packed, out, R, batch_dirs,
                                nrec_global))
                if len(pending) >= PIPELINE:
                    with timer.phase("drain"):
                        ok = drain_one()
                    if not ok:
                        spilled = True
                        break
                continue
            with timer.phase("load"):
                loader = BatchLoader(bound, batch_dirs, C, expected,
                                     shards=(flags.data_shards
                                             if mesh is not None else 0))
                cols, nrec, set_aux = loader.load()
            nrec[len(batch):] = 0  # padded repeats contribute nothing
            with timer.phase("dispatch"):
                jcols = {k: (jnp.asarray(v), jnp.asarray(m))
                         for k, (v, m) in cols.items()}
                jnrec = device_const(nrec)
                if mesh is not None:
                    from ..ops.scan import pack_jit
                    from ..parallel.mesh import sharded_scan
                    out = sharded_scan(
                        cfg, mesh, jcols, jnrec, ctx.jfv,
                        ctx.jbits, ctx.jtb,
                        {k: (_dev(r), _dev(v))
                         for k, (r, v) in set_aux.items()})
                    packed = pack_jit(cfg, out, R)
                else:
                    from ..ops.scan import scan_packed_jit
                    packed, out = scan_packed_jit(
                        cfg, jcols, jnrec, ctx.jfv, ctx.jbits,
                        ctx.jtb,
                        {k: (_dev(r), _dev(v))
                         for k, (r, v) in set_aux.items()})
            pending.append((gkey, cfg, packed, out, R, batch_dirs, nrec))
            _start_d2h(packed)
            if len(pending) >= PIPELINE:
                with timer.phase("drain"):
                    ok = drain_one()
                if not ok:
                    spilled = True
                    break
        while not spilled and pending:
            if stop_early():
                pending.clear()
                break
            with timer.phase("drain"):
                ok = drain_one()
            if not ok:
                spilled = True
        if not spilled:
            if groups is None:
                return acc
            return {k: a for k, a in accs.items()
                    if drained.get(k, 0) == n_batches.get(k)}
        # a group key fell outside its declared bound (outlier-resistant
        # IntInfo, or dicts/stats that grew after bind): redo the scan on
        # the unpacked sorted strategy, which has no static key bounds
        debug("key bound spilled; retrying on unpacked sorted strategy")
        bound.config = _dc.replace(bound.config, force_sorted=True,
                                   sort_pack=())
        pending.clear()
    return acc if groups is None else {
        k: a for k, a in accs.items()
        if drained.get(k, 0) == n_batches.get(k)}


def _scan_rowstore(acc: "_Accumulator", bound: BoundQuery, table: Table,
                   params: QueryParams, flags: Flags) -> None:
    """-read-log: scan undigested WAL records too (table_query.go:318-341).
    Rows pivot into an in-memory columnar pseudo-block that goes through
    the same device kernel."""
    import jax.numpy as jnp

    from .. import rowstore
    from ..digest import replay_logs_columnar
    from ..ops.scan import scan_packed_jit

    data, n = replay_logs_columnar(rowstore.list_logs(table.dir), table)
    if not n:
        return
    bound.refresh_str_filters()  # WAL-only strings got dict ids just now
    bound.refresh_key_bounds()
    # WAL rows are NOT covered by the digested blocks' exact stats:
    # strip every bound-derived kernel specialization (limb compression,
    # value biasing, nrows-lane proofs, windowing, compact tables) so
    # the pseudo-block kernel makes no assumption a fresh row can break
    import dataclasses as _dc
    wal_cfg = _dc.replace(bound.config, lane_limbs8=(), agg_vbias=(),
                          lane_row_bounds=(), lane_nrows=(), window=0,
                          time_i32=False, no_compact_table=True)
    C = _pad_pow2(min(n, CHUNK_SIZE))
    nblocks = (n + C - 1) // C
    for b in range(nblocks):
        lo, hi = b * C, min((b + 1) * C, n)
        cols = {}
        set_aux = {}
        for name in bound.needed_cols:
            typ = bound.col_types[name]
            cd = data.get(name)
            values = np.zeros((1, C), dtype=np.int64)
            valid = np.zeros((1, C), dtype=bool)
            if typ == SET_VAL:
                if isinstance(cd, blockio.SetColumnData):
                    offs = cd.offsets[lo: hi + 1] - cd.offsets[lo]
                    vals = cd.values[cd.offsets[lo]: cd.offsets[hi]]
                    rws = np.repeat(np.arange(hi - lo), np.diff(offs))
                else:
                    rws = np.zeros(0, dtype=np.int64)
                    vals = np.zeros(0, dtype=np.int64)
                m = _pad_pow2(max(len(rws), 1))
                prow = np.full(m, C, dtype=np.int32)
                pval = np.full(m, -2, dtype=np.int64)
                prow[:len(rws)] = rws
                pval[:len(vals)] = vals
                set_aux[name] = (jnp.asarray(prow), jnp.asarray(pval))
                continue
            if isinstance(cd, blockio.IntColumnData):
                values[0, : hi - lo] = cd.values[lo:hi]
                valid[0, : hi - lo] = cd.valid[lo:hi]
            elif isinstance(cd, blockio.StrColumnData):
                values[0, : hi - lo] = cd.ids[lo:hi]
                valid[0, : hi - lo] = cd.valid[lo:hi]
            cols[name] = (jnp.asarray(values), jnp.asarray(valid))
        if not cols:
            cols["__count__"] = (jnp.zeros((1, C), jnp.int64),
                                 jnp.ones((1, C), bool))
        nrec = jnp.asarray(np.array([hi - lo], dtype=np.int32))
        packed, out = scan_packed_jit(
            wal_cfg, cols, nrec, jnp.asarray(bound.filter_vals),
            tuple(jnp.asarray(x) for x in bound.bitsets),
            jnp.asarray(params.time_bucket or 1, dtype=jnp.int64), set_aux)
        if acc.absorb_packed(packed, out, C, wal_cfg) > 0:
            # WAL-only strings grew a dict past its bind-time bound:
            # redo this pseudo-block on the unpacked sorted strategy
            wal_cfg = _dc.replace(wal_cfg, force_sorted=True,
                                  sort_pack=())
            packed, out = scan_packed_jit(
                wal_cfg, cols, nrec, jnp.asarray(bound.filter_vals),
                tuple(jnp.asarray(x) for x in bound.bitsets),
                jnp.asarray(params.time_bucket or 1, dtype=jnp.int64),
                set_aux)
            acc.absorb_packed(packed, out, C, wal_cfg)


class _Accumulator:
    """Merges per-batch device partials into the reference result model."""

    def __init__(self, bound: BoundQuery):
        self.bound = bound
        self.params = bound.params
        # device->host download; multi-host swaps in a gathering fetch
        # (parallel/multihost.py) for arrays this process can't address
        self.fetch = np.asarray
        # key tuple -> accumulated plain sums
        self.rows: dict[tuple, dict] = {}
        # columnar fast lane: simple-shape batches (no hist/distinct/
        # outlier/prune state) park their active rows as numpy arrays
        # and only materialize into `rows` dicts when a slow-path
        # consumer (cache save, cross-accumulator merge, pruning) needs
        # them; `finish` consumes them vectorized otherwise
        self.np_batches: list[tuple] = []
        self.matched_count = 0
        # device-pruned rows' count/sample sums (kept for Cumulative)
        self.cum_extra_count = 0
        self.cum_extra_samples = 0
        self.sample_rows: list[dict] = []
        self.batches = 0
        # intermediate top-k pruning (CombineAndPrune/PruneResults,
        # aggregate.go:347,469-471): cap at 10x limit, max 1000.  Like the
        # reference — which only prunes when the merge fan-in is large
        # (MultiCombineResults' >=4-specs-per-proc path) — pruning only
        # engages once more than one batch contributed, so single-batch
        # scans return exact results.
        p = bound.params
        self.prune_cap = 0
        if p.prune_by and p.limit > 0:
            self.prune_cap = min(p.limit * 10, 1000)

    # ------------------------------------------------------------------
    def _group_part(self, kt: tuple) -> tuple:
        return kt[1:] if self.params.time_bucket > 0 else kt

    def num_group_rows(self) -> int:
        """Distinct group count (the reference's len(Results), used by the
        distinct-limit early exit, table_query.go:263-279)."""
        self._materialize()
        if self.params.time_bucket > 0:
            return len({self._group_part(k) for k in self.rows})
        return len(self.rows)

    def distinct_limit_hit(self) -> bool:
        """distinct-limit early exit (table_query.go:263-279)."""
        return (self.params.num_distinct > 0
                and self.num_group_rows() >= self.params.num_distinct)

    def _materialize(self) -> None:
        """Fold parked columnar batches into the `rows` dict (slow-path
        consumers: merges, pruning, cache serialization)."""
        if not self.np_batches:
            return
        batches, self.np_batches = self.np_batches, []
        rows_map = self.rows
        for ak, counts, samples, aggs in batches:
            keys_l = ak.tolist()
            counts_l = counts.tolist()
            samples_l = samples.tolist()
            agg_l = [(np.asarray(ex).tolist(), cnt.tolist(), wv.tolist(),
                      mn.tolist(), mx.tolist())
                     for ex, cnt, wv, mn, mx in aggs]
            n_aggs = len(aggs)
            for i in range(len(keys_l)):
                kt = tuple(keys_l[i])
                row = rows_map.get(kt)
                if row is None:
                    row = {"count": 0, "samples": 0,
                           "aggs": [None] * n_aggs, "distinct": None}
                    rows_map[kt] = row
                row["count"] += counts_l[i]
                row["samples"] += samples_l[i]
                for ai in range(n_aggs):
                    ex, cnt, wv, mn_l, mx_l = agg_l[ai]
                    if not ex[i]:
                        continue
                    cur = row["aggs"][ai]
                    if cur is None:
                        cur = {"count": 0, "wv": 0, "min": None,
                               "max": None, "hist": None, "outliers": []}
                        row["aggs"][ai] = cur
                    cur["count"] += cnt[i]
                    cur["wv"] += wv[i]
                    if cnt[i] > 0:
                        mn, mx = mn_l[i], mx_l[i]
                        cur["min"] = (mn if cur["min"] is None
                                      else min(cur["min"], mn))
                        cur["max"] = (mx if cur["max"] is None
                                      else max(cur["max"], mx))

    def merge_from(self, other: "_Accumulator") -> None:
        """Merge another accumulator's rows (cached group partials or a
        scoped sub-scan) into this one.  Parked columnar batches move
        over WITHOUT materializing — `finish` folds them vectorized, so
        merging N cache-group hits stays columnar end to end."""
        self.np_batches.extend(other.np_batches)
        other.np_batches = []
        self.matched_count += other.matched_count
        self.cum_extra_count += other.cum_extra_count
        self.cum_extra_samples += other.cum_extra_samples
        self.batches += other.batches
        for kt, row in other.rows.items():
            mine = self.rows.get(kt)
            if mine is None:
                self.rows[kt] = row
                continue
            mine["count"] += row["count"]
            mine["samples"] += row["samples"]
            for ai, cur in enumerate(row["aggs"]):
                if cur is None:
                    continue
                m = mine["aggs"][ai]
                if m is None:
                    mine["aggs"][ai] = cur
                    continue
                m["count"] += cur["count"]
                m["wv"] += cur["wv"]
                if cur["min"] is not None:
                    m["min"] = (cur["min"] if m["min"] is None
                                else min(m["min"], cur["min"]))
                if cur["max"] is not None:
                    m["max"] = (cur["max"] if m["max"] is None
                                else max(m["max"], cur["max"]))
                if cur["hist"] is not None:
                    m["hist"] = (cur["hist"] if m["hist"] is None
                                 else m["hist"] + cur["hist"])
                if cur.get("td") is not None:
                    if m.get("td") is None:
                        m["td"] = cur["td"]
                    else:
                        m["td"].merge(cur["td"])
                m["outliers"].extend(cur["outliers"])
            if row["distinct"] is not None:
                if mine["distinct"] is None:
                    mine["distinct"] = row["distinct"]
                else:
                    mine["distinct"].merge(row["distinct"])

    def _prune_score(self, rows_of_group: list[dict]):
        p = self.params
        if p.prune_by == SORT_COUNT or not p.prune_by:
            return sum(r["count"] for r in rows_of_group)
        # hist mean of the prune column (SortResultsByCol semantics)
        for ai, a in enumerate(p.aggs):
            if a.col == p.prune_by:
                cnt = sum(r["aggs"][ai]["count"] for r in rows_of_group
                          if r["aggs"][ai] is not None)
                wv = sum(r["aggs"][ai]["wv"] for r in rows_of_group
                         if r["aggs"][ai] is not None)
                return wv / cnt if cnt else 0.0
        return 0.0

    def maybe_prune(self) -> None:
        """Intermediate prune between batch merges: keep the top
        prune_cap groups by the prune metric, drop the rest.  Dropped
        rows' count/sample sums are banked for the Cumulative row — the
        reference merges into Cumulative BEFORE PruneResults drops rows
        (aggregate.go:422-471) — but their per-group identity is lost,
        the same approximation the reference makes."""
        if not self.prune_cap or self.batches < 2:
            return
        self._materialize()
        if self.num_group_rows() <= self.prune_cap:
            return
        by_group: dict[tuple, list] = {}
        for kt, row in self.rows.items():
            by_group.setdefault(self._group_part(kt), []).append(row)
        ranked = sorted(by_group, key=lambda g: self._prune_score(by_group[g]),
                        reverse=True)
        keep = set(ranked[: self.prune_cap])
        kept_rows = {}
        for kt, row in self.rows.items():
            if self._group_part(kt) in keep:
                kept_rows[kt] = row
            else:
                self.cum_extra_count += row["count"]
                self.cum_extra_samples += row["samples"]
        self.rows = kept_rows

    def absorb_packed(self, packed, out, R: int, config=None) -> int:
        """Parse the single packed download (ops/scan.py pack_outputs):
        row 0 meta [num_groups, spill, nout per hist agg..., npairs]; then
        the group-table prefix; then per-hist-agg compacted outlier rows;
        then compacted distinct-pair rows.  Full device arrays in `out`
        are touched only when the meta row reports prefix overflow.
        Returns the dense-strategy spill count (>0 => caller must retry
        on the sorted strategy; this batch's rows were NOT absorbed)."""
        from ..ops.scan import SENTINEL, packed_layout, table_prefix
        if config is None:
            config = self.bound.config
        dense = config.strategy == "dense"
        p = self.params
        main = self.fetch(packed["main"])  # the one download
        layout = packed_layout(config, R)
        W = layout["W"]
        K = config.n_key_cols
        A = len(p.aggs)
        S = config.table_slots
        P = table_prefix(config)

        def section_flat(name: str, count: int) -> np.ndarray:
            off, rows = layout[name]
            return main[off: off + rows].reshape(-1)[:count]

        hist_ais = [ai for ai, a in enumerate(config.aggs)
                    if a.num_values > 0]
        meta = main[0]
        num_groups = int(meta[0])
        spill = int(meta[1])
        if spill > 0:
            return spill
        nouts = {ai: int(meta[2 + i]) for i, ai in enumerate(hist_ais)}
        npairs = int(meta[2 + len(hist_ais)])
        overflow = int(meta[3 + len(hist_ais)])
        pi = 4 + len(hist_ais)
        pruned = int(meta[pi]) if pi < main.shape[1] else 0
        if pruned:
            total_count, total_samples = int(meta[pi + 1]), int(meta[pi + 2])
        nhps = {ai: int(meta[7 + len(hist_ais) + i])
                for i, ai in enumerate(hist_ais)}
        if overflow > 0:
            # shuffle capacity exceeded (extreme key-hash clustering or
            # more merged groups than table slots): refuse to return a
            # silently truncated result
            error("sharded shuffle overflowed by", overflow,
                  "group rows; raise -max-groups or use fewer data shards")

        if num_groups > config.max_groups and not pruned:
            warn("group cap", config.max_groups,
                 "exceeded; highest-keyed groups dropped")
        if dense:
            n = P                      # actives scattered over the slots
        elif pruned:
            # the device already top-k'd the table (PruneResults on-chip,
            # ScanConfig.prune_topk): only the best rows were shipped
            n = min(num_groups, pruned)
        else:
            n = min(num_groups, S)

        from ..ops.scan import dense_keys_np, dense_table_plan
        plan = dense_table_plan(config, R)
        if plan is not None:
            # compact dense table: no key columns (slots are arithmetic,
            # decoded host-side), int32 pair packing when bounds allow
            wpr = layout["table_wpr"]
            words = section_flat("table", P * wpr).reshape(P, wpr)
            nc = len(plan["cols"])
            npack = -(-nc // 2) if plan["i32"] else nc
            if plan["i32"]:
                a32 = np.ascontiguousarray(
                    words[:, :npack]).view("<i4").reshape(P, npack * 2)
                colmap = {nme: a32[:, j].astype(np.int64)
                          for j, nme in enumerate(plan["cols"])}
            else:
                colmap = {nme: words[:, j]
                          for j, nme in enumerate(plan["cols"])}
            for j, nme in enumerate(plan["i64_cols"]):
                colmap[nme] = words[:, npack + j]
            keys = dense_keys_np(config, p.time_bucket or 1)
            samples = colmap["samples"]
            # lanes proven equal to samples were elided from the wire
            # (dense_table_plan lane_nrows skip); rebuild them here
            counts = colmap.get("count", samples)
        else:
            if n > P:
                table = self.fetch(packed["table"][:n])  # escalation
            else:
                table = main[1: 1 + n]
            keys = table[:, :K]
            counts = table[:, K]
            samples = table[:, K + 1]
        active = np.nonzero((samples != 0) | (counts != 0))[0]
        if pruned:
            # kept rows undercount: use the device-side totals, and bank
            # the dropped rows' sums for the Cumulative row (the
            # reference's Cumulative keeps pruned rows' counts,
            # aggregate.go:422-471)
            self.matched_count += total_samples
            kept_c = int(counts[active].sum())
            kept_s = int(samples[active].sum())
            self.cum_extra_count += total_count - kept_c
            self.cum_extra_samples += total_samples - kept_s
        else:
            self.matched_count += int(samples[active].sum())

        hist_row_of = None
        if hist_ais and dense:
            Ph = min(config.hist_prefix, config.dense_slots)
            hists_small = {
                ai: section_flat(f"hist{ai}",
                                 Ph * config.aggs[ai].num_values)
                .reshape(Ph, config.aggs[ai].num_values)
                for ai in hist_ais}
            gids = section_flat("hist_gids", Ph)
            hist_row_of = {int(g): i for i, g in enumerate(gids)}

        aggdata = []
        vbias = config.agg_vbias or ()
        sent_mn = sent_mx = None
        for ai, (info, want_hist, hist_type) in enumerate(self.bound.agg_layouts):
            if plan is not None:
                acnt = colmap.get(f"agg{ai}_count", samples)
                wv = colmap[f"agg{ai}_wv"]
                if ai < len(vbias) and vbias[ai]:
                    # the device summed kw*(v-bias); add bias*Σkw back
                    wv = wv + vbias[ai] * acnt
                if f"agg{ai}_min" not in colmap:
                    # avg-op aggs never ship min/max (they were already
                    # empty-slot sentinels on the wire before round 4)
                    if sent_mn is None:
                        sent_mn = np.full(P, 2**62, dtype=np.int64)
                        sent_mx = np.full(P, -2**62, dtype=np.int64)
                d = {
                    "exists": colmap.get(f"agg{ai}_exists", samples) != 0,
                    "count": acnt,
                    "wv": wv,
                    "min": colmap.get(f"agg{ai}_min", sent_mn),
                    "max": colmap.get(f"agg{ai}_max", sent_mx),
                }
            else:
                base = K + 2 + 5 * ai
                wv = table[:, base + 2]
                if ai < len(vbias) and vbias[ai]:
                    # the device summed kw*(v-bias); add bias*Σkw back
                    wv = wv + vbias[ai] * table[:, base + 1]
                d = {
                    "exists": table[:, base] != 0,
                    "count": table[:, base + 1],
                    "wv": wv,
                    "min": table[:, base + 3],
                    "max": table[:, base + 4],
                }
            if ai in nouts and dense:  # dense hist agg: bucket matrix
                Ph = min(config.hist_prefix, config.dense_slots)
                if num_groups > Ph:   # actives overflow the compaction:
                    # gather ONLY the active slots' bucket rows on device
                    # (never the full [slots, nv] matrix) before fetching
                    hact = self.fetch(out[f"agg{ai}_hist"][active])
                    pos = {int(g): i for i, g in enumerate(active)}
                    d["hist_get"] = lambda gi, h=hact, m=pos: h[m[gi]]
                else:
                    hsmall = hists_small[ai]
                    d["hist_get"] = (
                        lambda gi, h=hsmall, m=hist_row_of:
                        h[m[gi]] if gi in m else None)
            if ai in nouts:  # hist agg: outlier fix-up rows
                if nouts[ai] > 0:
                    kmax = layout["kmax_out"]
                    off = layout[f"out{ai}"][0]
                    block = main[off: off + kmax]
                    if nouts[ai] > kmax:  # escalate to full arrays
                        mask = self.fetch(out[f"agg{ai}_out_mask"])
                        d["outlier_pairs"] = (
                            self.fetch(out["sorted_gkeys"])[mask],
                            self.fetch(out[f"agg{ai}_out_val"])[mask])
                    else:
                        flags_col = block[:, K + 1] != 0
                        d["outlier_pairs"] = (block[flags_col, :K],
                                              block[flags_col, K])
            aggdata.append(d)

        # columnar fast lane: simple shapes park the active rows as
        # numpy arrays; `finish` consumes them vectorized, skipping the
        # per-row dict churn entirely (the host hot path for many-group
        # rollups).  A prune_cap does NOT exclude parking: maybe_prune
        # materializes on demand, and it only ever acts from the second
        # batch on — single-batch scans stay columnar end to end.
        if (not p.distincts and not hist_ais and not pruned
                and p.num_distinct <= 0
                and not config.track_outliers):
            sel = active
            ak = keys[sel]
            if K and len(sel):
                m = ak[:, 0] != SENTINEL
                if not m.all():
                    sel = sel[m]
                    ak = ak[m]
            self.np_batches.append((
                ak, counts[sel], samples[sel],
                [(d["exists"][sel], d["count"][sel], d["wv"][sel],
                  d["min"][sel], d["max"][sel]) for d in aggdata]))
            self.batches += 1
            return 0

        # bulk-convert the active rows to plain Python once: per-element
        # `int(np_scalar)` in the loop below costs ~200ns a pop, which at
        # 10k time-rollup groups per batch dominated the whole query
        active_l = active.tolist()
        keys_l = keys[active].tolist()
        counts_l = counts[active].tolist()
        samples_l = samples[active].tolist()
        agg_l = []
        for d in aggdata:
            agg_l.append((d["exists"][active].tolist(),
                          d["count"][active].tolist(),
                          d["wv"][active].tolist(),
                          d["min"][active].tolist(),
                          d["max"][active].tolist()))

        rows_map = self.rows
        n_aggs = len(aggdata)
        if not rows_map and all("hist_get" not in d for d in aggdata):
            # first batch, plain aggs: build each row dict in one shot
            # (no .get probe, no incremental +=) — the absorb loop is
            # the host hot path for many-group rollups
            for i in range(len(active_l)):
                kt = tuple(keys_l[i])
                if kt and kt[0] == SENTINEL:
                    continue
                aggs = []
                for ai in range(n_aggs):
                    ex, cnt, wv, mn_l, mx_l = agg_l[ai]
                    if ex[i]:
                        c = cnt[i]
                        aggs.append({"count": c, "wv": wv[i],
                                     "min": mn_l[i] if c > 0 else None,
                                     "max": mx_l[i] if c > 0 else None,
                                     "hist": None, "outliers": []})
                    else:
                        aggs.append(None)
                rows_map[kt] = {"count": counts_l[i],
                                "samples": samples_l[i],
                                "aggs": aggs, "distinct": None}
            general_l = []        # handled; skip the general loop
        else:
            general_l = active_l
        for i, gi in enumerate(general_l):
            kt = tuple(keys_l[i])
            if kt and kt[0] == SENTINEL:
                continue
            row = rows_map.get(kt)
            if row is None:
                row = {"count": 0, "samples": 0, "aggs": [None] * n_aggs,
                       "distinct": None}
                rows_map[kt] = row
            row["count"] += counts_l[i]
            row["samples"] += samples_l[i]
            for ai, d in enumerate(aggdata):
                ex, cnt, wv, mn_l, mx_l = agg_l[ai]
                if not ex[i]:
                    continue
                cur = row["aggs"][ai]
                if cur is None:
                    cur = {"count": 0, "wv": 0, "min": None, "max": None,
                           "hist": None, "outliers": []}
                    row["aggs"][ai] = cur
                cur["count"] += cnt[i]
                cur["wv"] += wv[i]
                if cnt[i] > 0:
                    mn, mx = mn_l[i], mx_l[i]
                    cur["min"] = mn if cur["min"] is None else min(cur["min"], mn)
                    cur["max"] = mx if cur["max"] is None else max(cur["max"], mx)
                if "hist_get" in d:
                    h = d["hist_get"](gi)
                    if h is not None:
                        cur["hist"] = (h if cur["hist"] is None
                                       else cur["hist"] + h)

        for ai, d in enumerate(aggdata):
            if "outlier_pairs" not in d:
                continue
            gk, ov = d["outlier_pairs"]
            for krow, v in zip(gk, ov):
                row = self.rows.get(tuple(int(k) for k in krow))
                if row is not None and row["aggs"][ai] is not None:
                    row["aggs"][ai]["outliers"].append(int(v))

        if hist_ais and not dense:
            # sorted strategy ships sparse (group-key, bucket, Σw) rows
            # instead of bucket matrices (ops/scan.py sparse histograms)
            for ai in hist_ais:
                if nhps[ai] == 0:
                    continue
                if nhps[ai] > layout["Hcap"]:   # escalate to full arrays
                    hm = self.fetch(out[f"agg{ai}_hp_mask"])
                    hkeys = self.fetch(out[f"agg{ai}_hp_keys"])[hm]
                    hbv = self.fetch(out[f"agg{ai}_hp_bv"])[hm]
                    hw = self.fetch(out[f"agg{ai}_hp_w"])[hm]
                else:
                    off, rows = layout[f"hpair{ai}"]
                    block = main[off: off + rows]
                    hvalid = block[:, K + 2] != 0
                    hkeys = block[hvalid, :K]
                    hbv = block[hvalid, K]
                    hw = block[hvalid, K + 1]
                self._absorb_hist_pairs(ai, hkeys, hbv, hw,
                                        config.aggs[ai].num_values)

        if p.distincts and npairs > 0:
            kmax = layout["kmax_pairs"]
            pairs_off = layout["pairs"][0]
            if npairs > kmax:  # escalate
                mask = self.fetch(out["pair_mask"])
                skeys = self.fetch(out["sorted_keys"])[mask]
            else:
                block = main[pairs_off: pairs_off + kmax]
                nkall = config.n_all_keys
                skeys = block[block[:, nkall] != 0, :nkall]
            self._absorb_distinct(skeys, K)
        elif p.distincts and config.hll and dense and len(active):
            # device HLL: merge the shipped register planes by max
            from ..ops.scan import HLL_M
            Phll = layout["Phll"]
            gids_h = section_flat("hll_gids", Phll).astype(np.int64)
            words = section_flat("hll_regs", Phll * (HLL_M // 8))
            regs = np.ascontiguousarray(
                words.astype("<i8")).view(np.uint8).reshape(Phll, HLL_M)
            row_of = {int(g): i for i, g in enumerate(gids_h.tolist())}
            full = None
            if len(active) > Phll:   # live groups overflow the shipment
                full = np.asarray(self.fetch(out["hll_regs"]))
            for i, gi in enumerate(active_l):
                if full is not None:
                    plane = full[gi]
                else:
                    hr = row_of.get(gi)
                    if hr is None:
                        continue
                    plane = regs[hr]
                row = self.rows.get(tuple(keys_l[i]))
                if row is None:
                    continue
                if row["distinct"] is None:
                    row["distinct"] = HLL()
                np.maximum(row["distinct"].registers, plane,
                           out=row["distinct"].registers)
        self.batches += 1
        return 0

    def _absorb_hist_pairs(self, ai: int, hkeys: np.ndarray,
                           hbv: np.ndarray, hw: np.ndarray,
                           nv: int) -> None:
        """Merge sparse (group-key, bucket, Σw) hist rows into the group
        table.  One np.add.at scatter builds a [unique-groups, nv] delta
        which is then added per group — U*nv bounded work, no Python
        per-pair loop."""
        if hkeys.shape[0] == 0:
            return
        _, _, hist_type = self.bound.agg_layouts[ai]
        if hist_type == "tdigest":
            # feed exact (value, Σw) pairs into per-group t-digests —
            # no bucket arrays anywhere (hist.py TDigestHist)
            from .hist import TDigest
            spec = self.bound.config.aggs[ai]
            vals = spec.hist_min + np.asarray(hbv, dtype=np.int64) \
                * spec.bucket_size
            ukeys, inv = np.unique(hkeys, axis=0, return_inverse=True)
            order = np.argsort(inv.reshape(-1), kind="stable")
            sinv = inv.reshape(-1)[order]
            starts = np.searchsorted(sinv, np.arange(ukeys.shape[0]))
            ends = np.append(starts[1:], sinv.size)
            svals, sws = vals[order], np.asarray(hw)[order]
            for u, krow in enumerate(ukeys.tolist()):
                row = self.rows.get(tuple(krow))
                if row is None or row["aggs"][ai] is None:
                    continue
                cur = row["aggs"][ai]
                td = cur.get("td")
                if td is None:
                    td = cur["td"] = TDigest()
                td.add_many(svals[starts[u]:ends[u]],
                            sws[starts[u]:ends[u]])
            return
        ukeys, inv = np.unique(hkeys, axis=0, return_inverse=True)
        U = ukeys.shape[0]
        if U * nv <= 64_000_000:
            delta = np.zeros((U, nv), dtype=np.int64)
            np.add.at(delta, (inv.reshape(-1), hbv.astype(np.int64)), hw)
            for u, krow in enumerate(ukeys.tolist()):
                row = self.rows.get(tuple(krow))
                if row is None or row["aggs"][ai] is None:
                    continue
                cur = row["aggs"][ai]
                if cur["hist"] is None:
                    cur["hist"] = delta[u].copy()
                else:
                    cur["hist"] = cur["hist"] + delta[u]
        else:  # degenerate: huge group count x huge bucket count
            for krow, b, w in zip(hkeys.tolist(), hbv.tolist(),
                                  hw.tolist()):
                row = self.rows.get(tuple(krow))
                if row is None or row["aggs"][ai] is None:
                    continue
                cur = row["aggs"][ai]
                if cur["hist"] is None:
                    cur["hist"] = np.zeros(nv, dtype=np.int64)
                cur["hist"][int(b)] += int(w)

    def _absorb_distinct(self, skeys: np.ndarray, nkeys: int) -> None:
        from ..ops.scan import SENTINEL
        ng = nkeys
        p = self.params
        int_only = all(self.bound.col_types[d] == INT_VAL for d in p.distincts)
        for rowkeys in skeys:
            kt = tuple(int(k) for k in rowkeys[:ng])
            if kt and kt[0] == SENTINEL:
                continue
            row = self.rows.get(kt)
            if row is None:
                continue
            if row["distinct"] is None:
                row["distinct"] = HLL()
            dvals = rowkeys[ng:]
            if int_only:
                # fast path: 8-byte LE two's-complement packing
                # (aggregate.go:208-222; missing -1 == MaxUint64)
                buf = b"".join((int(v) & MISSING_VALUE).to_bytes(8, "little")
                               for v in dvals)
            else:
                parts = []
                for d, v in zip(p.distincts, dvals):
                    if int(v) == MISSING_I64:
                        parts.append("")
                    elif self.bound.col_types[d] == STR_VAL:
                        parts.append(self.bound._strings(d)[int(v)])
                    else:
                        parts.append(str(int(v)))
                buf = (GROUP_DELIMITER.join(parts) + GROUP_DELIMITER).encode()
            row["distinct"].add(buf)

    def collect_samples(self, out, batch_dirs, nrec, C) -> None:
        matched = self.fetch(out["matched"])
        limit = max(self.params.limit, 1)
        schema = self.bound.table.schema
        if self.params.sample_cols:
            # -sample-cols loads only the requested columns
            # (cmd_query.go:142-146,196)
            all_cols = [c for c in self.params.sample_cols
                        if c in schema.key_table]
        else:
            all_cols = sorted(schema.key_table)
        for bi, bdir in enumerate(batch_dirs):
            if len(self.sample_rows) >= limit * 4 or nrec[bi] == 0:
                continue
            rows = np.nonzero(matched[bi, :nrec[bi]])[0]
            if not len(rows):
                continue
            data = blockio.load_block_columns(bdir, schema, all_cols)
            for r in rows[: limit * 4 - len(self.sample_rows)]:
                sample = {}
                for name, cd in data.items():
                    if isinstance(cd, blockio.IntColumnData):
                        if cd.valid[r]:
                            sample[name] = int(cd.values[r])
                    elif isinstance(cd, blockio.StrColumnData):
                        if cd.valid[r]:
                            sample[name] = self.bound._strings(name)[int(cd.ids[r])]
                    else:
                        lo, hi = int(cd.offsets[r]), int(cd.offsets[r + 1])
                        if hi > lo:
                            strs = self.bound._strings(name)
                            sample[name] = [strs[int(v)] for v in cd.values[lo:hi]]
                self.sample_rows.append(sample)

    # ------------------------------------------------------------------
    def finish(self) -> QueryResults:
        p = self.params
        bound = self.bound
        qr = QueryResults()
        qr.matched_count = self.matched_count
        qr.samples = self.sample_rows

        if self.np_batches and not self.rows:
            self._finish_fast(qr)
            self._sort(qr)
            return qr
        self._materialize()

        time_mode = p.time_bucket > 0
        group_slice = slice(1, None) if time_mode else slice(None)

        per_time: dict[int, dict[str, Result]] = {}
        flat: dict[str, Result] = {}
        for kt, row in self.rows.items():
            res = self._make_result(kt[group_slice], row)
            if time_mode:
                tb = kt[0]
                bucket = per_time.setdefault(tb, {})
                prev = bucket.get(res.group_key)
                if prev is None:
                    bucket[res.group_key] = res
                else:
                    prev.combine(res)
                # per-group totals live in Results (aggregate.go:156-169)
                tot = flat.get(res.group_key)
                if tot is None:
                    tot = Result()
                    tot.group_key = res.group_key
                    tot.key_tuple = res.key_tuple
                    flat[res.group_key] = tot
                tot.count += res.count
                tot.samples += res.samples
            else:
                prev = flat.get(res.group_key)
                if prev is None:
                    flat[res.group_key] = res
                else:
                    # str-replace collisions overwrite in the reference's
                    # translate_group_by map; counts merge here instead
                    prev.combine(res)

        qr.results = flat
        qr.time_results = per_time

        # Cumulative row (aggregate.go:422-428,434-436)
        cumulative = Result()
        cumulative.group_key = "TOTAL"
        if len(p.groups) > 1:
            cumulative.group_key += GROUP_DELIMITER * (len(p.groups) - 1)
        for res in flat.values():
            cumulative.combine(res)
        # rows the device prune dropped still count toward the total
        cumulative.count += self.cum_extra_count
        cumulative.samples += self.cum_extra_samples
        qr.cumulative = cumulative

        self._sort(qr)
        return qr

    def _finish_fast(self, qr: QueryResults) -> None:
        """Vectorized finish over the parked columnar batches (simple
        shapes only — see the absorb fast gate).  Semantics identical to
        the dict path: same display keys, same combine-on-collision for
        -str-replace, same Cumulative math."""
        p = self.params
        bound = self.bound
        batches, self.np_batches = self.np_batches, []
        SENT = 2**62
        if len(batches) == 1:
            ak, counts, samples, aggs = batches[0]
        else:
            ak0 = np.concatenate([b[0] for b in batches])
            counts0 = np.concatenate([b[1] for b in batches])
            samples0 = np.concatenate([b[2] for b in batches])
            ak, inv = np.unique(ak0, axis=0, return_inverse=True)
            inv = inv.reshape(-1)
            U = ak.shape[0]
            counts = np.zeros(U, np.int64)
            np.add.at(counts, inv, counts0)
            samples = np.zeros(U, np.int64)
            np.add.at(samples, inv, samples0)
            aggs = []
            for ai in range(len(batches[0][3])):
                ex0 = np.concatenate(
                    [np.asarray(b[3][ai][0], dtype=np.int64)
                     for b in batches])
                cnt0 = np.concatenate([b[3][ai][1] for b in batches])
                wv0 = np.concatenate([b[3][ai][2] for b in batches])
                mn0 = np.concatenate([b[3][ai][3] for b in batches])
                mx0 = np.concatenate([b[3][ai][4] for b in batches])
                ex = np.zeros(U, np.int64)
                np.add.at(ex, inv, ex0)
                cnt = np.zeros(U, np.int64)
                np.add.at(cnt, inv, cnt0)
                wv = np.zeros(U, np.int64)
                np.add.at(wv, inv, wv0)
                mn = np.full(U, SENT, np.int64)
                np.minimum.at(mn, inv, np.where(cnt0 > 0, mn0, SENT))
                mx = np.full(U, -SENT, np.int64)
                np.maximum.at(mx, inv, np.where(cnt0 > 0, mx0, -SENT))
                aggs.append((ex, cnt, wv, mn, mx))

        time_mode = p.time_bucket > 0
        str_cols = [bound._strings(c)
                    if bound.col_types[c] == STR_VAL else None
                    for c in p.groups]
        infos = [(a.col, lay[0]) for a, lay in
                 zip(p.aggs, bound.agg_layouts)]
        G = GROUP_DELIMITER

        def gk_of(gkt: tuple) -> str:
            if not p.groups:
                return "total"
            parts = []
            for ci, v in enumerate(gkt):
                if v == MISSING_I64:
                    parts.append("")
                else:
                    ss = str_cols[ci]
                    if ss is None:
                        parts.append(str(v))
                    else:
                        parts.append(ss[v] if 0 <= v < len(ss) else "")
                parts.append(G)
            return "".join(parts)

        counts_l = counts.tolist()
        samples_l = samples.tolist()
        aggs_l = [(np.asarray(ex).tolist(), cnt.tolist(), wv.tolist(),
                   mn.tolist(), mx.tolist())
                  for (ex, cnt, wv, mn, mx) in aggs]

        if time_mode:
            # rollups produce thousands of (bucket, group) rows whose
            # Result objects the reference builds eagerly
            # (aggregate.go:146-169); here only the few per-GROUP
            # totals are built now — the per-bucket explosion parks on
            # qr and runs lazily on first time_results access
            gpart = ak[:, 1:]
            if gpart.shape[1]:
                uniq, inv = np.unique(gpart, axis=0, return_inverse=True)
            else:
                uniq = np.zeros((1, 0), np.int64)
                inv = np.zeros(len(ak), np.int64)
            inv = inv.reshape(-1)
            U = uniq.shape[0]
            key_tuples = [tuple(t) for t in uniq.tolist()]
            ugks = [gk_of(t) for t in key_tuples]
            csum = np.zeros(U, np.int64)
            np.add.at(csum, inv, counts)
            ssum = np.zeros(U, np.int64)
            np.add.at(ssum, inv, samples)
            flat: dict[str, Result] = {}
            for j in range(U):
                tot = flat.get(ugks[j])
                if tot is None:
                    tot = Result()
                    tot.group_key = ugks[j]
                    tot.key_tuple = key_tuples[j]
                    flat[ugks[j]] = tot
                tot.count += int(csum[j])
                tot.samples += int(ssum[j])
            inv_l = inv.tolist()
            gks = [ugks[j] for j in inv_l]
            row_kts = [key_tuples[j] for j in inv_l]
            agg_rows = [(col, info, *aggs_l[ai])
                        for ai, (col, info) in enumerate(infos)]
            qr.results = flat
            qr.time_results = {}
            qr._time_pending = (ak[:, 0].tolist(), gks, row_kts,
                                counts_l, samples_l, agg_rows)
        else:
            keys_l = ak.tolist()
            flat = {}
            gk_memo: dict[tuple, str] = {}
            for i in range(len(keys_l)):
                gkt = tuple(keys_l[i])
                gk = gk_memo.get(gkt)
                if gk is None:
                    gk = gk_memo[gkt] = gk_of(gkt)
                res = Result()
                res.key_tuple = gkt
                res.group_key = gk
                res.count = counts_l[i]
                res.samples = samples_l[i]
                for ai, (col, info) in enumerate(infos):
                    ex, cnt, wv, mn, mx = aggs_l[ai]
                    if not ex[i]:
                        continue
                    c = cnt[i]
                    res.hists[col] = BasicHist.from_sums(
                        info.min, info.max, c, wv[i],
                        mn[i] if c > 0 else SENT,
                        mx[i] if c > 0 else -SENT)
                prev = flat.get(gk)
                if prev is None:
                    flat[gk] = res
                else:
                    prev.combine(res)
            qr.results = flat
            qr.time_results = {}
        cumulative = Result()
        cumulative.group_key = "TOTAL"
        if len(p.groups) > 1:
            cumulative.group_key += GROUP_DELIMITER * (len(p.groups) - 1)
        for res in flat.values():
            cumulative.combine(res)
        cumulative.count += self.cum_extra_count
        cumulative.samples += self.cum_extra_samples
        qr.cumulative = cumulative

    def _make_result(self, key_tuple: tuple, row: dict) -> Result:
        p = self.params
        bound = self.bound
        res = Result()
        res.key_tuple = key_tuple
        res.count = row["count"]
        res.samples = row["samples"]
        res.distinct = row["distinct"]

        parts = []
        if not p.groups:
            parts.append("total")
        else:
            for col, v in zip(p.groups, key_tuple):
                if v == MISSING_I64:
                    parts.append("")
                elif bound.col_types[col] == STR_VAL:
                    strings = bound._strings(col)
                    parts.append(strings[v] if 0 <= v < len(strings) else "")
                else:
                    parts.append(str(v))
                parts.append(GROUP_DELIMITER)
        res.group_key = "".join(parts)

        for (adef, (info, want_hist, hist_type), cur) in zip(
                p.aggs, bound.agg_layouts, row["aggs"]):
            if cur is None:
                continue
            if want_hist and hist_type == "tdigest":
                from .hist import TDigestHist
                h = TDigestHist(info.min, info.max, p.hist_bucket)
                h.load_device_partial(
                    cur["count"], cur["wv"],
                    outlier_values=cur["outliers"])
                if cur.get("td") is not None:
                    h.td.merge(cur["td"])
                res.hists[adef.col] = h
                continue
            if not want_hist and not cur["outliers"] and \
                    cur.get("hist") is None and cur["min"] is not None:
                # plain-avg hot path: one hist per group row; skip the
                # bucket-layout init entirely (many-group rollups build
                # thousands of these per query)
                res.hists[adef.col] = BasicHist.from_sums(
                    info.min, info.max, cur["count"], cur["wv"],
                    cur["min"], cur["max"])
                continue
            cls = MultiHist if (want_hist and hist_type == "multi") else BasicHist
            h = cls(info.min, info.max, p.hist_bucket, percentile_mode=want_hist)
            h.load_device_partial(
                cur["count"], cur["wv"], cur.get("hist"),
                outlier_values=cur["outliers"],
                vmin=cur["min"], vmax=cur["max"])
            res.hists[adef.col] = h
        return res

    def _sort(self, qr: QueryResults) -> None:
        sort_results(qr, self.params)


def sort_results(qr: QueryResults, params: QueryParams) -> None:
    """SortResults port (aggregate.go:497-525): by Count or hist mean,
    descending by default."""
    if not params.order_by:
        return

    def sort_key(r: Result):
        if params.order_by == SORT_COUNT:
            return r.count
        h = r.hists.get(params.order_by)
        return h.mean() if h else 0.0

    qr.sorted = sorted(qr.results.values(), key=sort_key, reverse=True)
    if params.order_asc:
        qr.sorted.reverse()
