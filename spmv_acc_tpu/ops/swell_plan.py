"""Analyze pass for the `swell` (Sliced-Window ELL) SpMV kernel — the flagship plan.

TPU re-imagination of the reference's csr-adaptive-plus host analyze
(hip-csr-adaptive-plus/csr_adaptive_plus_analyze.cpp:12-98): one vectorized host scan
builds the block decomposition the Pallas kernel consumes.

Decomposition
-------------
* Each 128-row **row-block**'s nnz are greedily clustered by column into **window
  instances**: a sweep over the block's sorted columns opens a window at the first
  uncovered column c and claims every block nnz with col < 128*(c>>7) + 256 (width
  128 when c's aligned slot is the last in its chunk).  A window is realized in the
  kernel as TWO aligned 128-col x-table rows (w = c>>7 and w+1) with uint8 in-window
  indices in [0, 256) and a gather-on-each + select-on-bit-7.  Unaligned windows
  eliminate the aligned-grid row splits that capped fill at ~0.45 on banded/FEM
  matrices (a contiguous run of width <= 128 ALWAYS fits its window).
  lane = row-in-block, so the x fetch per element is a lane permutation — the one
  gather Mosaic lowers natively.
* Each window instance is sliced into **layers** whose depths follow the binary
  decomposition of the instance's max per-row count (e.g. max 5 → layers of depth
  4 and 1).  Power-of-two depths make the kernel's in-register fold exact and
  slice-shrinking; binary decomposition eliminates pow2-of-max padding (5 → 4+1
  slots instead of 8).  Instances whose max count exceeds 128 are split by slot
  half so every layer depth stays <= 128.
* A **slab** = one layer of one group: (depth × 128 lanes).
* Slabs are packed into 128-sublane **steps**, bucketed by depth D.  Sublane order is
  slot-major interleaved (sublane = slot*P + slab_position, P = 128/D) so the fold
  combines contiguous array halves.
* Constraint: within a step, at most ONE slab per row-block — the kernel's one-hot
  scatter matmul then has a single summand per output row, which makes the f32 MXU
  accumulation exact (required by the compensated f64 path).
* Steps are grouped by (out-window of 128 row-blocks, x-chunk of 128 windows) so the
  output tile stays VMEM-resident and the x chunk is DMA'd once per run of steps.

x is reshaped to (nchunks, 128, 128); columns are unbounded (no VMEM-resident-x cap).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Tuple

import numpy as np

__all__ = ["SwellBucket", "SwellPlan", "build_swell_plan"]

LANES = 128          # rows per row-block = lanes
CW = 128             # columns per window = gather table width
CHUNK_W = 128        # windows per x-chunk  (chunk = 16384 columns)

# below this nnz the default packing policy is SINGLE (no chunk merging): the
# merged default was tuned on the >=5.6M-nnz LARGE sweep and measurably hurts
# the reference's SMALL corpus (scripts/ab_small_merge.py, 2026-08-19).  The
# corpus gap is 2.3M (exdata_1) vs 5.6M (largebasis); 4M splits it.
SMALL_MERGE_NNZ = 4_000_000
ROUT = 128           # row-blocks per output window (out tile = 16384 rows)


@dataclasses.dataclass
class SwellBucket:
    """All steps of one slab depth D."""

    depth: int                 # D
    wide: bool                 # any in-window index >= 128 (B table row needed)
    classpos: bool             # positions pinned to outrow % P: mask scatter
    nsteps: int
    vh: np.ndarray             # (nsteps, nv*128, 128) f32 — value hi plane(s) (== value for
    #                            f32).  nv > 1 is the BSR micro-block path: plane p = r*r
    #                            values per node slot, p = (i*r + j) for block cell (i, j)
    vl: np.ndarray | None      # (nsteps, nv*128, 128) f32 — value lo plane(s) (f64 source only)
    lidx: np.ndarray           # (nsteps, 128, 128) uint8 — index within the 256-col window
    onehot: np.ndarray         # (nsteps, ohp, 128) int8 — dual window-in-chunk per position;
    #                            value 1 selects from chunk a, value 2 from chunk b
    rbvec: np.ndarray          # (nsteps, 128) int32 — row-block (mod ROUT) per slab pos, -1 pad
    occrow: np.ndarray         # (nsteps, 128) int32 — 1 at lane r iff out row r occupied
    chunksel: np.ndarray       # (nsteps,) int32 — primary x chunk id (a)
    chunkselb: np.ndarray      # (nsteps,) int32 — secondary x chunk id (b); sticky-filled on
    #                            single-chunk steps to minimize re-DMAs
    hasb: np.ndarray           # (nsteps,) int32 — 1 if the step has chunk-b slabs
    outsel: np.ndarray         # (nsteps,) int32 — output window id
    first: np.ndarray          # (nsteps,) int32 — 1 on first step of an outsel run
    touched: np.ndarray        # (nout,) bool — out windows this bucket writes
    nnz: int
    nv: int = 1                # value planes per slot (1 scalar; r*r for BSR blocks)

    @property
    def values(self) -> np.ndarray:
        """Source-precision values (reconstructed from the hi/lo planes: the
        Dekker split guarantees vh + vl == v exactly).  Test/interp helper; the
        device path consumes vh/vl directly."""
        if self.vl is None:
            return self.vh
        return self.vh.astype(np.float64) + self.vl.astype(np.float64)


@dataclasses.dataclass
class SwellPlan:
    buckets: Tuple[SwellBucket, ...]
    rows: int
    cols: int
    nnz: int
    nout: int                  # ceil(mrb / tile_rb)
    nchunks: int               # ceil(n / 16384)
    # COO tail: nnz of spilled low-fill instances, handled outside Pallas
    tail_rows: np.ndarray      # (tnnz,) int32
    tail_ci: np.ndarray        # (tnnz,) int32
    tail_v: np.ndarray         # (tnnz,) source dtype
    fill_efficiency: float     # kernel nnz / padded slots
    total_steps: int
    # Small matrices have fewer row-blocks than a step has slab positions, so the
    # <=1-slab-per-row-block constraint would leave steps mostly empty.  Each
    # row-block therefore gets `copies` rows in the output tile (slab j of a
    # row-block uses copy j%copies); the wrapper sums the copies in f64 — exact.
    copies: int = 1
    tile_rb: int = ROUT        # row-blocks per output tile = 128 // copies
    # global column phase shift: windows are built on col+delta (x is front-padded
    # with delta zeros), chosen so the dominant block phase lands on an aligned
    # window start — re-aligns diagonal structure that would otherwise straddle
    # three aligned windows and orphan its boundary lanes
    delta: int = 0


def _greedy_windows(cb, bb):
    """Greedy unaligned window clustering over block-sorted (bb, cb) nnz.

    Returns (w_sorted, inst_sorted, inst_rb, inst_w, n_inst): per-nnz window base
    and instance id (in the sorted order), plus per-instance row-block and base.
    """
    nnz = len(cb)
    blk_new = np.empty(nnz, dtype=bool)
    blk_new[0] = True
    np.not_equal(bb[1:], bb[:-1], out=blk_new[1:])
    blk_start = np.flatnonzero(blk_new)
    blk_end = np.concatenate([blk_start[1:], [nnz]])
    KB = np.int64(1) << 36  # > any column bound
    key_sorted = bb * KB + cb
    w_sorted = np.empty(nnz, dtype=np.int64)
    inst_sorted = np.empty(nnz, dtype=np.int64)
    inst_rb_parts: List[np.ndarray] = []
    inst_w_parts: List[np.ndarray] = []
    ptr = blk_start.copy()
    n_inst = 0
    while True:
        act = np.flatnonzero(ptr < blk_end)
        if len(act) == 0:
            break
        p0 = ptr[act]
        c0 = cb[p0]
        w = c0 >> 7
        width = np.where((w & 127) == 127, 128, 256)
        bound = (w << 7) + width
        new_ptr = np.searchsorted(key_sorted, bb[p0] * KB + bound)
        lens = new_ptr - p0
        total = int(lens.sum())
        pos = np.repeat(p0, lens) + (
            np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        w_sorted[pos] = np.repeat(w, lens)
        inst_sorted[pos] = n_inst + np.repeat(np.arange(len(act), dtype=np.int64), lens)
        inst_rb_parts.append(bb[p0])
        inst_w_parts.append(w)
        n_inst += len(act)
        ptr[act] = new_ptr
    return (w_sorted, inst_sorted, np.concatenate(inst_rb_parts),
            np.concatenate(inst_w_parts), n_inst)


def _cluster_score(cb, bb, rows_bc) -> int:
    """Padded-slot count (sum of per-instance max row counts) for a candidate
    clustering — the delta-selection objective, evaluated on a block sample."""
    _, inst, _, _, n_inst = _greedy_windows(cb, bb)
    key = inst * (np.int64(rows_bc.max()) + 2) + rows_bc
    ks = np.sort(key)
    new = np.empty(len(ks), dtype=bool)
    new[0] = True
    np.not_equal(ks[1:], ks[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.concatenate([starts, [len(ks)]]))
    inst_of_run = ks[starts] // (np.int64(rows_bc.max()) + 2)
    order = np.argsort(inst_of_run, kind="stable")
    iu, ifirst = np.unique(inst_of_run[order], return_index=True)
    return int(np.maximum.reduceat(cnt[order], ifirst).sum())


def _canonicalize(rp, ci, v, m):
    """Sort each row's columns and sum duplicates.  The slab encodings (uint8
    slot, gid2 half bit, <=256 nnz per (row, window)) require per-row sorted
    UNIQUE columns; CSR.from_numpy accepts arbitrary arrays, so malformed input
    is repaired here rather than silently corrupting the plan."""
    nnz = int(rp[-1])
    if nnz == 0:
        return rp, ci, v
    row_start = np.zeros(nnz, dtype=bool)
    row_start[rp[1:-1][rp[1:-1] < nnz]] = True
    bad = (ci[1:] <= ci[:-1]) & ~row_start[1:]
    if not bad.any():
        return rp, ci, v
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
    order = np.lexsort((ci, rows))
    rs, cs, vs = rows[order], ci[order], v[order]
    key_new = np.ones(nnz, dtype=bool)
    key_new[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
    starts = np.flatnonzero(key_new)
    uid = np.cumsum(key_new) - 1
    v2 = np.zeros((len(starts),) + v.shape[1:], dtype=np.float64)
    np.add.at(v2, uid, vs.astype(np.float64))
    r2, c2 = rs[starts], cs[starts]
    rp2 = np.zeros(m + 1, dtype=np.int64)
    np.add.at(rp2, r2 + 1, 1)
    np.cumsum(rp2, out=rp2)
    return rp2, c2, v2.astype(v.dtype)


def build_swell_plan(row_ptr, col_idx, values, shape) -> SwellPlan:
    rp = np.asarray(row_ptr, dtype=np.int64)
    ci = np.asarray(col_idx, dtype=np.int64)
    v = np.asarray(values)  # (nnz,) scalar, or (nnz, r*r) BSR cell planes
    m, n = int(shape[0]), int(shape[1])
    rp, ci, v = _canonicalize(rp, ci, v, m)
    nnz = int(rp[-1])
    mrb = max(1, -(-m // LANES))
    copies = 1
    while copies < 8 and mrb * copies < ROUT:
        copies *= 2
    tile_rb = ROUT // copies
    nout = max(1, -(-mrb // tile_rb))
    nchunks = max(1, -(-n // (CW * CHUNK_W)))
    _no_tail = (np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros((0,) + v.shape[1:], v.dtype))
    if nnz == 0:
        return SwellPlan((), m, n, 0, nout, nchunks, *_no_tail, 1.0, 0, copies, tile_rb)

    nw = max(1, -(-n // CW))
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
    rb = rows >> 7
    lane = (rows & 127).astype(np.int64)

    # Block boundaries come straight from rp (rows are CSR-ordered, so rb is
    # monotone) — no global sort needed until a path actually requires one.
    rp_blocks = rp[np.minimum(np.arange(0, m + 128, 128), m)]
    blk_start_all = rp_blocks[:-1]
    blk_end_all = rp_blocks[1:]
    nonempty = blk_start_all < blk_end_all

    # column phase shift: aligning the dominant block phase (mode of each block's
    # first column mod 128) to a window start lets diagonal structure span two
    # aligned windows instead of three.  The mode is only a candidate — both it
    # and 0 are scored on a block sample (padded slots = 128 * sum of per-instance
    # max counts) and the cheaper one wins, so the shift never hurts.  Only the
    # SAMPLE is block-col-sorted (the full lexsort at 28M+ nnz costs seconds and
    # the native analyze path never needs it).
    ne_start = blk_start_all[nonempty]
    ne_end = blk_end_all[nonempty]
    first_cols = ci[ne_start]  # min col per nonempty block (rows col-sorted ≠ block
    # col-sorted, but the first row's first col is a good phase proxy)
    phases = (first_cols & 127).astype(np.int64)
    cand = {0, int((128 - np.bincount(phases, minlength=128).argmax()) & 127)}
    delta = 0
    if len(cand) > 1:
        nblocks = len(ne_start)
        stride = max(1, nblocks // 384)
        sb = np.arange(0, nblocks, stride)
        lens_s = ne_end[sb] - ne_start[sb]
        idx_s = np.repeat(ne_start[sb], lens_s) + (
            np.arange(int(lens_s.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(lens_s) - lens_s, lens_s)
        )
        bb_s = rb[idx_s]
        order_s = np.lexsort((ci[idx_s], bb_s))
        cb_s = ci[idx_s][order_s]
        bb_s = bb_s[order_s]
        rows_s = rows[idx_s][order_s]
        best = None
        for d in sorted(cand):
            sc = _cluster_score(cb_s + d, bb_s, rows_s)
            if best is None or sc < best[0]:
                best = (sc, d)
        delta = best[1]
    nchunks = max(nchunks, -(-(n + delta) // (CW * CHUNK_W)))

    # --- economic COO-tail spill (VERDICT r3 #6) -------------------------------
    # Per-element kernel cost is ~0.04ns/slot — orders below the XLA tail's
    # ~140ns/element — so per-INSTANCE fill can never justify spilling.  What
    # CAN: an (out-window, x-chunk) cell visited for only a handful of nnz
    # still pays a ~500ns chunk (re)load + ~400ns out-tile writeback + a step
    # share in-kernel, i.e. ~(900/cell_nnz) ns/element.  Spilling whole cells
    # below SPMV_TPU_SPILL nnz (breakeven ~6) removes those loads.  Default
    # OFF (0): the bench corpus has no such cells worth the plan churn; the
    # scattered/power-law corpora opt in (dispatch may pass it, tests set it).
    tail_rows0, tail_ci0, tail_v0 = _no_tail
    spill_env = os.environ.get("SPMV_TPU_SPILL")
    spill_thr = -1 if spill_env is None else int(spill_env)  # -1 = AUTO
    if spill_thr != 0 and v.ndim == 1:
        out_of = (rb // tile_rb).astype(np.int64)
        chunk_of = (ci + delta) >> 14  # CW * CHUNK_W = 16384
        cell = out_of * np.int64(nchunks) + chunk_of
        _, inv_c, cnt_c = np.unique(cell, return_inverse=True, return_counts=True)
        if spill_thr < 0:
            # AUTO: engage only when the structure clearly pays — many sparse
            # cells carrying a tiny nnz fraction (banded-2M + 5000 scattered
            # outliers measured 3441.8 -> 1399.3us/iter, fill 0.270 -> 0.873,
            # bit-identical).  The entire bench corpus has ZERO sub-16 cells
            # (scanned 2026-08-20), so cached plans and headline numbers are
            # untouched; the decision is deterministic from the matrix content,
            # which the plan-cache key already hashes.
            sparse_c = cnt_c < 16
            nsc = int(sparse_c.sum())
            frac = float(cnt_c[sparse_c].sum()) / max(len(ci), 1)
            spill_thr = 16 if (nsc >= 64 and frac <= 0.02) else 0
        spill0 = cnt_c[inv_c] < spill_thr
        if spill_thr > 0 and spill0.any():
            tail_rows0 = rows[spill0].astype(np.int32)
            tail_ci0 = ci[spill0].astype(np.int32)
            tail_v0 = v[spill0]
            keep0 = ~spill0
            cnt_row = np.bincount(rows[keep0], minlength=m)
            rp = np.concatenate([[0], np.cumsum(cnt_row)]).astype(np.int64)
            ci = ci[keep0]
            v = v[keep0]
            rows = rows[keep0]
            rb = rows >> 7
            lane = (rows & 127).astype(np.int64)
            nnz = int(rp[-1])  # kept count (algorithm arrays); totals add the tail
            if nnz == 0:
                return SwellPlan((), m, n, int(len(tail_ci0)), nout, nchunks,
                                 tail_rows0, tail_ci0, tail_v0, 1.0, 0, copies,
                                 tile_rb)
    _no_tail = (tail_rows0, tail_ci0, tail_v0)
    nnz_total = nnz + int(len(tail_ci0))

    # Native (C++/OpenMP) analyze covers everything from here to slab enumeration
    # in one parallel pass over row-blocks (csr_adaptive_plus_analyze.cpp analog);
    # the numpy pipeline below is the portable fallback and equivalence reference.
    nat = None
    if not os.environ.get("SPMV_TPU_NO_NATIVE"):
        try:
            from ..io.native import swell_analyze_native

            nat = swell_analyze_native(rp, ci, m, delta)
        except Exception:
            nat = None
    if nat is not None:
        s32, lc, slot_u8, layer_k, srb, sw, sk8, slab_wide = nat
        slab_of_nnz = s32
        slot_in_slab = slot_u8.astype(np.int32)
        slab_rb = srb.astype(np.int64)
        slab_w = sw.astype(np.int64)
        slab_k = sk8.astype(np.int64)
        nslabs = len(slab_rb)
        vk = v
        nkept = nnz
        tail_rows, tail_ci, tail_v = _no_tail
        slab_out = (slab_rb // tile_rb).astype(np.int64)
        slab_chunk = (slab_w >> 7).astype(np.int64)
        return _finish_swell_plan(
            m, n, nnz_total, nout, nchunks, copies, tile_rb, delta, v.dtype,
            slab_of_nnz, lc, slot_in_slab, layer_k, lane, vk,
            slab_rb, slab_w, slab_k, slab_wide, slab_out, slab_chunk, nslabs,
            tail_rows, tail_ci, tail_v, nkept, mrb,
        )

    # numpy fallback: block-col-sort the full matrix, then greedy-cluster
    order_bc = np.lexsort((ci, rb))
    cb = ci[order_bc] + delta
    bb = rb[order_bc]
    w_sorted, inst_sorted, inst_rb, inst_w, n_inst = _greedy_windows(cb, bb)
    w_of = np.empty(nnz, dtype=np.int64)
    w_of[order_bc] = w_sorted
    inst_of = np.empty(nnz, dtype=np.int64)
    inst_of[order_bc] = inst_sorted
    lc = (ci + delta - (w_of << 7)).astype(np.uint8)  # in-window index, [0, 256)

    # slot within (row, instance): instances partition each row's sorted columns
    # into disjoint ascending ranges -> consecutive CSR runs
    key_rw = rows * np.int64(n_inst + 1) + inst_of
    new_rw = np.empty(nnz, dtype=bool)
    new_rw[0] = True
    np.not_equal(key_rw[1:], key_rw[:-1], out=new_rw[1:])
    rw_start = np.flatnonzero(new_rw)
    rw_id = np.cumsum(new_rw) - 1
    slot_rw = np.arange(nnz, dtype=np.int64) - rw_start[rw_id]

    # split instances at slot 128 so every layer depth stays <= 128 (a window can
    # hold up to 256 nnz of one row); final group id carries the half bit
    half = slot_rw >> 7
    gid = inst_of * 2 + half
    s = slot_rw & 127

    # per-group max count (group runs = sub-runs of (row, instance) runs)
    key_rw2 = key_rw * 2 + half
    new2 = np.empty(nnz, dtype=bool)
    new2[0] = True
    np.not_equal(key_rw2[1:], key_rw2[:-1], out=new2[1:])
    rw_start2 = np.flatnonzero(new2)
    rw_gid = gid[rw_start2]
    rw_sizes = np.diff(np.concatenate([rw_start2, [nnz]]))
    order_g = np.argsort(rw_gid, kind="stable")
    g_sorted = rw_gid[order_g]
    c_sorted = rw_sizes[order_g]
    gid_uniq, g_first = np.unique(g_sorted, return_index=True)
    maxc = np.maximum.reduceat(c_sorted, g_first)  # per unique gid, <= 128

    # Historical note: a per-INSTANCE fill spill was tried here and measured a
    # loss at ~140ns/element of XLA tail cost — kernel slots are ~0.04ns each,
    # so padding is 1000x cheaper than spilling.  The surviving criterion is
    # the per-(out, chunk) CELL economics applied upstream of both analyze
    # paths (chunk loads/writebacks, not fill).
    # (cell-level economic spill happens upstream, before the native-analyze
    # branch — see the COO-tail block; every instance reaching here is kept)
    tail_rows, tail_ci, tail_v = _no_tail
    vk = v
    g_of_nnz = np.searchsorted(gid_uniq, gid)
    M = maxc[g_of_nnz]
    nkept = nnz

    # per-nnz layer bit k: largest set bit k of maxc with (maxc >> k << k) > slot
    layer_k = np.full(nkept, -1, dtype=np.int8)
    for k in range(7, -1, -1):
        pref = (M >> (k + 1)) << (k + 1)  # sum of bits above k
        hit = (layer_k < 0) & (((M >> k) & 1) == 1) & (s >= pref) & (s < pref + (1 << k))
        layer_k[hit] = k
    assert (layer_k >= 0).all(), "layer assignment incomplete"
    slot_in_slab = s - ((M >> (layer_k.astype(np.int64) + 1)) << (layer_k.astype(np.int64) + 1))

    # slab enumeration: unique (gid, k)
    skey = gid * 8 + layer_k.astype(np.int64)
    slab_uniq, slab_of_nnz = np.unique(skey, return_inverse=True)
    slab_gid = slab_uniq // 8
    slab_k = (slab_uniq % 8).astype(np.int64)
    slab_rb = inst_rb[slab_gid >> 1]
    slab_w = inst_w[slab_gid >> 1]                    # window base (aligned row A)
    slab_out = (slab_rb // tile_rb).astype(np.int64)  # out window id
    slab_chunk = (slab_w >> 7).astype(np.int64)       # x chunk id
    nslabs = len(slab_uniq)

    slab_wide = np.bincount(
        slab_of_nnz, weights=(lc >= 128).astype(np.float64), minlength=nslabs
    ) > 0
    return _finish_swell_plan(
        m, n, nnz_total, nout, nchunks, copies, tile_rb, delta, v.dtype,
        slab_of_nnz, lc, slot_in_slab, layer_k, lane, vk,
        slab_rb, slab_w, slab_k, slab_wide, slab_out, slab_chunk, nslabs,
        tail_rows, tail_ci, tail_v, nkept, mrb,
    )


def _absorb_remainders(packs, merges, sb_var, sb_step, sb_pos, slab_copy,
                       slab_rb, slab_chunk, slab_out, slab_wide, tile_rb,
                       copies, nslabs):
    """Kill partial remainder steps by relocating their slabs into free positions
    of other steps of the same out window (same-depth holes first, then deeper
    buckets).

    A depth-d slab sits at a position of a depth-D>=d step with its trailing
    D-d slots zero — the kernel's fold adds exact zeros, so correctness is free;
    the wasted slots are bytes, but each killed step saves a whole ~1us grid
    step, which dominates.  Relocation preserves the step invariants: one out
    window, at most two distinct chunks, at most one slab per output row
    (the copy is re-chosen to dodge conflicts), and wide slabs only into wide
    buckets.  Mutates sb_var/sb_step/sb_pos/slab_copy in place.
    """
    if nslabs == 0 or not len(packs):
        return
    order = np.lexsort((sb_step, sb_var))
    sv = sb_var[order]
    st = sb_step[order]
    new = np.ones(len(order), dtype=bool)
    new[1:] = (sv[1:] != sv[:-1]) | (st[1:] != st[:-1])
    starts = np.flatnonzero(new)
    ends = np.concatenate([starts[1:], [len(order)]])
    reg = {}        # (vi, step) -> [free_pos list, chunk set, rbrow set, slab list]
    out_steps = {}  # (vi, out) -> ordered list of (vi, step) keys
    for a, b in zip(starts, ends):
        sl = order[a:b]
        vi = int(sv[a])
        step = int(st[a])
        P = 128 >> packs[vi][0]
        used_pos = set(int(p) for p in sb_pos[sl])
        free = [p for p in range(P - 1, -1, -1) if p not in used_pos]
        chunkset = set(int(c) for c in slab_chunk[sl])
        rbrows = set(int(r) for r in (slab_rb[sl] % tile_rb) * copies + slab_copy[sl])
        reg[(vi, step)] = [free, chunkset, rbrows, list(sl)]
        out_steps.setdefault((vi, int(slab_out[sl[0]])), []).append((vi, step))
    vorder = sorted(range(len(packs)), key=lambda v: (packs[v][0], packs[v][1]))
    kof = {v: packs[v][0] for v in range(len(packs))}
    wof = {v: packs[v][1] for v in range(len(packs))}
    cof = {v: (len(packs[v]) > 3 and packs[v][3]) for v in range(len(packs))}
    for vi in vorder:
        k_s = kof[vi]
        P_s = 128 >> k_s
        # targets: same depth (narrow source may use its own or the wide bucket's
        # holes — zero slot waste), then strictly deeper (ascending waste)
        tvars = [t for t in vorder if kof[t] > k_s or (kof[t] == k_s)]
        for (vo, out), keys in out_steps.items():
            if vo != vi:
                continue
            ki = len(keys) - 1
            while ki >= 0:
                key = keys[ki]
                free, chunkset, rbrows, slabs = reg[key]
                if len(slabs) > max(1, P_s // 2):
                    break
                placements = []
                backup = {}
                moved = set()

                def touch(tkey):
                    if tkey not in backup:
                        f, ch, rbs, sl = reg[tkey]
                        backup[tkey] = (list(f), set(ch), set(rbs), list(sl))

                def _copy_for(s, t, ent):
                    """A copy index whose output row (and, for position-class
                    buckets, class) is free in the target step, or None."""
                    rb = int(slab_rb[s] % tile_rb)
                    P_t = 128 >> kof[t]
                    for j in range(copies):
                        r = rb * copies + j
                        if r in ent[2]:
                            continue
                        if cof[t] and any(x % P_t == r % P_t for x in ent[2]):
                            continue
                        return j
                    return None

                def commit(s, t, tkey):
                    touch(tkey)
                    tfree, tchunks, trbrows, tslabs = reg[tkey]
                    c = int(slab_chunk[s])
                    rb = int(slab_rb[s] % tile_rb)
                    cc = _copy_for(s, t, reg[tkey])
                    r = rb * copies + cc
                    if cof[t]:
                        pos = r % (128 >> kof[t])
                        tfree.remove(pos)
                    else:
                        pos = tfree.pop()
                    tchunks.add(c)
                    trbrows.add(r)
                    tslabs.append(s)
                    moved.add(s)
                    placements.append((s, t, tkey, pos, cc))

                def fits(s, t, tkey, need_free=True):
                    ent = reg[tkey]
                    if need_free and not ent[0]:
                        return False
                    if bool(slab_wide[s]) and not wof[t]:
                        return False
                    c = int(slab_chunk[s])
                    if c not in ent[1]:
                        # single-packed buckets stay single-chunk (their whole
                        # bucket compiles to the zero-overhead legacy kernel);
                        # merged buckets accept a second chunk per step
                        if not merges[t] or len(ent[1]) >= 2:
                            return False
                    return _copy_for(s, t, ent) is not None

                ok = True
                for s in slabs:
                    placed = False
                    for t in tvars:
                        for tkey in out_steps.get((t, out), ()):
                            if tkey == key:
                                continue
                            if fits(s, t, tkey):
                                commit(s, t, tkey)
                                placed = True
                                break
                        if placed:
                            break
                    if placed:
                        continue
                    # one-level swap chain: a free-position step T rejects s only
                    # on an output-row conflict (typical for window-straddling
                    # row-blocks whose extra slabs pile into every trailing
                    # step); move some donor slab X from a full conflict-free
                    # step F into T, then place s into F's freed position.
                    for t in tvars:
                        for tkey in out_steps.get((t, out), ()):
                            if tkey == key or not reg[tkey][0]:
                                continue
                            for fkey in out_steps.get((t, out), ()):
                                if fkey in (key, tkey):
                                    continue
                                if not fits(s, t, fkey, need_free=False):
                                    continue
                                don = next((x for x in reg[fkey][3]
                                            if x not in moved and fits(x, t, tkey)), None)
                                if don is None:
                                    continue
                                commit(don, t, tkey)
                                touch(fkey)
                                ent_f = reg[fkey]
                                ent_f[3].remove(don)
                                drb = int(slab_rb[don] % tile_rb)
                                ent_f[2].discard(drb * copies + int(slab_copy[don]))
                                ent_f[0].append(int(sb_pos[don]))
                                ent_f[1].clear()
                                ent_f[1].update(int(slab_chunk[x]) for x in ent_f[3])
                                commit(s, t, fkey)
                                placed = True
                                break
                            if placed:
                                break
                        if placed:
                            break
                    if not placed:
                        ok = False
                        break
                if not ok:
                    for tkey, snap in backup.items():
                        reg[tkey][0][:] = snap[0]
                        reg[tkey][1].clear()
                        reg[tkey][1].update(snap[1])
                        reg[tkey][2].clear()
                        reg[tkey][2].update(snap[2])
                        reg[tkey][3][:] = snap[3]
                    break
                for s, t, tkey, pos, cc in placements:
                    sb_var[s] = t
                    sb_step[s] = tkey[1]
                    sb_pos[s] = pos
                    slab_copy[s] = cc
                del reg[key]
                keys.pop(ki)
                ki -= 1


def _finish_swell_plan(m, n, nnz, nout, nchunks, copies, tile_rb, delta, dtype,
                       slab_of_nnz, lc, slot_in_slab, layer_k, lane, vk,
                       slab_rb, slab_w, slab_k, slab_wide, slab_out, slab_chunk,
                       nslabs, tail_rows, tail_ci, tail_v, nkept, mrb):
    """Shared back half of the plan build: step packing (over candidate `copies`
    values) and bucket materialization.

    `copies` gives each row-block several rows in the output tile, so slabs of the
    same row-block can share a step — trading conflict-forced partial steps for a
    smaller out tile (more out windows, more output traffic).  The tradeoff is
    matrix-dependent, so candidates are PACKED (cheap, slab-level) and scored by
    total steps + output-window cost; only the winner is materialized.
    """
    # narrow slabs (every in-window index < 128) never touch the B table row —
    # their kernel variant skips half the table matmuls and half the gathers.
    # Splitting a depth class into narrow+wide buckets costs extra partial steps,
    # so split ONLY when narrow slabs dominate; otherwise run everything wide.
    slab_bucket_wide = np.empty(nslabs, dtype=bool)
    for k in range(8):
        in_k = slab_k == k
        n_k = int(in_k.sum())
        if n_k == 0:
            continue
        narrow_share = 1.0 - float(slab_wide[in_k].sum()) / n_k
        if narrow_share >= 0.7:
            slab_bucket_wide[in_k] = slab_wide[in_k]
        else:
            slab_bucket_wide[in_k] = bool(slab_wide[in_k].any())

    def occ_for(tile_rb_c, nout_c):
        # occurrence index j of each slab within its (bucket k, out, rb) group
        # (chunks MERGE into one q-group per out — steps carry a chunk PAIR);
        # copy = j % copies (its output-row copy) — slabs targeting the same
        # OUTPUT ROW (rb, copy) must land in different steps so the one-hot
        # scatter stays exact
        out_c = (slab_rb // tile_rb_c).astype(np.int64)
        pack_key = slab_k * nout_c + out_c
        rb_key = pack_key * np.int64(mrb + 1) + slab_rb
        order_r = np.argsort(rb_key, kind="stable")
        rk = rb_key[order_r]
        run_new = np.empty(nslabs, dtype=bool)
        run_new[0] = True
        np.not_equal(rk[1:], rk[:-1], out=run_new[1:])
        run_start = np.flatnonzero(run_new)
        run_id = np.cumsum(run_new) - 1
        occ_sorted = np.arange(nslabs, dtype=np.int64) - run_start[run_id]
        occ_c = np.empty(nslabs, dtype=np.int64)
        occ_c[order_r] = occ_sorted
        return occ_c, out_c

    def pack_variant(sel, P, occ_all, out_c, copies_c, merge, classpos):
        # merge=True: q-group = (bucket k, out) — chunks MERGE: a step may draw x
        # windows from up to TWO chunks (the kernel holds a chunk pair resident),
        # which removes the per-(out,chunk) final-partial-step waste that
        # dominated posfill loss on band/FEM matrices — at the price of the dual
        # kernel's overhead on mixed steps.  merge=False: q-group = (k, out,
        # chunk), single-chunk steps, zero-overhead legacy kernel.  The caller
        # packs BOTH and picks per bucket by a measured cost model.  Within q,
        # slabs are cut sequentially P per step in (chunk, occ)-major order, then
        # a cascade evicts output-row conflicts, overflow, and third-chunk slabs
        # to later steps.
        occ = occ_all[sel]
        if classpos:
            # position-class packing: slab position is PINNED to outrow % P, so
            # the kernel's scatter matmuls collapse to a broadcast + occupancy
            # mask.  The conflict key is the class (subsumes output-row
            # uniqueness: same row -> same class); distinct rows sharing a class
            # also conflict, which is the policy's packing tax.
            trb_l = ROUT // copies_c
            ck = ((slab_rb[sel] % trb_l) * copies_c + (occ % copies_c)) % np.int64(P)
        else:
            ck = slab_rb[sel] * copies_c + (occ % copies_c)  # step-conflict key
        chn = slab_chunk[sel]
        q_key = out_c[sel] if merge else out_c[sel] * np.int64(nchunks) + chn
        order_q = np.lexsort((ck, occ, chn, q_key))
        sq = sel[order_q]
        qk = q_key[order_q]
        ckq = ck[order_q]
        chq = chn[order_q]
        nb = len(sq)
        qnew = np.empty(nb, dtype=bool)
        qnew[0] = True
        np.not_equal(qk[1:], qk[:-1], out=qnew[1:])
        q_id = np.cumsum(qnew) - 1
        q_start = np.flatnonzero(qnew)
        idx_in_q = np.arange(nb, dtype=np.int64) - q_start[q_id]
        step_in_q = idx_in_q // P
        # rounds must cover the worst CONFLICT-KEY multiplicity within a q-group
        # (for classpos the class collapses many rows together — occ.max() alone
        # once left the cascade unsettled and the class-blind fallback emitted
        # same-class duplicates, silently corrupting the mask scatter)
        if nb:
            _, kcnt = np.unique(q_id * (np.int64(ckq.max()) + 2) + ckq,
                                return_counts=True)
            max_rounds = int(max(occ.max(), kcnt.max())) + 2
        else:
            max_rounds = 2
        # strict upper bound on any step_in_q the cascade can produce (initial cut
        # + one increment per round) so q-groups never collide in k2
        BIG = np.int64(nb // P + max_rounds + 260)
        seq = np.arange(nb, dtype=np.int64)
        for _ in range(max_rounds + 130):
            k2 = q_id * BIG + step_in_q
            o2 = np.lexsort((ckq, k2))
            k2s = k2[o2]
            cks = ckq[o2]
            grp_new = np.ones(nb, dtype=bool)
            np.not_equal(k2s[1:], k2s[:-1], out=grp_new[1:])
            dup = np.zeros(nb, dtype=bool)
            dup[1:] = (~grp_new[1:]) & (cks[1:] == cks[:-1])
            rank = seq - np.maximum.accumulate(np.where(grp_new, seq, 0))
            bad = dup | (rank >= P)
            # chunk legality: at most 2 distinct chunks per step — mark every slab
            # belonging to the 3rd+ distinct chunk of its step
            o2c = np.lexsort((chq, k2))
            k2c = k2[o2c]
            chc = chq[o2c]
            gc = np.ones(nb, dtype=bool)
            np.not_equal(k2c[1:], k2c[:-1], out=gc[1:])
            cnew = gc.copy()
            cnew[1:] |= chc[1:] != chc[:-1]
            cum = np.cumsum(cnew)
            base = np.maximum.accumulate(np.where(gc, cum - 1, 0))
            crank = cum - 1 - base  # distinct-chunk index within step, 0-based
            badc = np.zeros(nb, dtype=bool)
            badc[o2c] = crank >= 2
            bad2 = np.zeros(nb, dtype=bool)
            bad2[o2] = bad
            bad2 |= badc
            if not bad2.any():
                break
            step_in_q[bad2] += 1
        else:  # pragma: no cover — cascade failed to settle (pathological layout);
            # fall back to per-(out,chunk) quantized packing: conflict-free and
            # single-chunk by construction, at the cost of partial steps.  The
            # dense re-indexing below compacts the sparse step ids.
            if classpos:
                # step j of each (out, chunk) holds the j-th slab of EACH class:
                # <= P slabs per step, all classes distinct — the class-BLIND
                # occurrence quantization would stack same-class slabs and
                # corrupt the mask scatter
                kqo = (q_id * np.int64(nchunks) + chq) * np.int64(P) + ckq
                order_f = np.argsort(kqo, kind="stable")
                nqo = np.empty(nb, dtype=bool)
                nqo[0] = True
                kfs = kqo[order_f]
                np.not_equal(kfs[1:], kfs[:-1], out=nqo[1:])
                qo_start = np.flatnonzero(nqo)
                qo_id = np.cumsum(nqo) - 1
                rank = np.empty(nb, dtype=np.int64)
                rank[order_f] = np.arange(nb, dtype=np.int64) - qo_start[qo_id]
                step_in_q = chq * np.int64(nb + 1) + rank
            else:
                oq = occ[order_q]
                kqo = (q_id * np.int64(nchunks) + chq) * np.int64(nb + 2) + oq
                nqo = np.empty(nb, dtype=bool)
                nqo[0] = True
                np.not_equal(kqo[1:], kqo[:-1], out=nqo[1:])
                qo_start = np.flatnonzero(nqo)
                qo_id = np.cumsum(nqo) - 1
                idx_in_qo = np.arange(nb, dtype=np.int64) - qo_start[qo_id]
                step_in_q = (chq * np.int64(nb + 1) + oq) * np.int64(nb + 1) + idx_in_qo // P
        # compact step ids (eviction can leave empty steps) and make them global;
        # the q multiplier must exceed any step_in_q (the fallback path emits
        # sparse ids far above BIG)
        if nb:
            BIG = max(BIG, np.int64(step_in_q.max()) + 2)
        k2 = q_id * BIG + step_in_q
        uniq_steps, step_dense = np.unique(k2, return_inverse=True)
        step_of = step_dense  # dense AND globally ordered by (q, step)
        o3 = np.argsort(k2, kind="stable")
        r3 = np.empty(nb, dtype=np.int64)
        k3 = k2[o3]
        g3 = np.ones(nb, dtype=bool)
        np.not_equal(k3[1:], k3[:-1], out=g3[1:])
        r3[o3] = seq - np.maximum.accumulate(np.where(g3, seq, 0))
        return sq, step_of, r3, len(uniq_steps)

    variants = [(k, wide) for k in range(8) for wide in (False, True)
                if ((slab_k == k) & (slab_bucket_wide == wide)).any()]
    # Hardware-calibrated cost model (v5e slope timing, boneS10/banded A/B runs;
    # see PERF_NOTES.md).  Per-step base by depth for position-class buckets
    # (mask scatter); row-packed buckets pay the one-hot scatter matmuls on top.
    # The big non-base terms: each x-chunk (re)load ~500ns, each out-tile
    # writeback ~400ns, each mixed (chunk-pair) step one extra table build
    # ~350ns, dual buckets ~60ns/step for the extra operand machinery.
    nv = vk.shape[1] if vk.ndim == 2 else 1
    rblk = max(1, int(round(nv ** 0.5)))
    # BSR micro-block scaling: each step carries nv value planes (nv-1 extra
    # compensated products) and rblk x-slices (rblk-1 extra table+gather sets);
    # chunk blocks and out tiles are rblk x bigger.
    _BSR_STEP = (nv - 1) * 210.0 + (rblk - 1) * 470.0
    BASE_CP = tuple(b + _BSR_STEP
                    for b in (390.0, 456.0, 514.0, 524.0, 534.0, 544.0, 554.0, 564.0))
    LOAD_NS = 500.0 if rblk == 1 else 240.0 + 260.0 * rblk
    WB_NS = 400.0 if rblk == 1 else 150.0 + 250.0 * rblk
    # Recalibrated 2026-08-17/18 (forced single-vs-merged A/B on Bump_2911 /
    # Cube_Coup_dt6 / vas_stokes_2M, all non-BSR): single-chunk plans measured
    # +24..33% end-to-end (rf 0.129->0.160, 0.156->0.208, 0.154->0.204).  The
    # single-policy model tracked hardware within 1% (vas: 4902 modeled vs 4946
    # measured) while merged underestimated by ~1.9ms; solving the vas run for
    # the per-mixed-step cost gives ~1235ns (extra shallow-depth table builds +
    # dual decode + dual buckets forgoing the pipelined table builds).
    MIXED_NS = 1200.0 * rblk
    DUAL_NS = 60.0
    # dboth era (2026-08-18): buckets whose mixed fraction crosses DBOTH_FRAC
    # run the UNCONDITIONAL both-sides table build (no pl.when tax, piped), so
    # their mixed tax collapses to the extra side's matmuls on every step —
    # table passes scale with P.  Fit to merged+dboth bucket profiles
    # (vas/boneS10: D=1 853-896, D=2 632-635, D=8 753-778 ns/step).
    DBOTH_FRAC = 0.34
    DBOTH_NS = lambda P_k: 1.2 * P_k * rblk  # noqa: E731

    def step_base(k, cpos):
        # Per-depth extras, fit to ALL hardware runs: the row-pack scatter
        # matmuls contract over K=P so their cost shrinks with depth
        # (min(180, 6P)); the classpos mask path is latency-hidden while
        # P >= 16 (boneS10 D=2..8 classpos measured 584-653ns, clearly under
        # row-pack), but at P <= 8 the fold leaves no slack and the row scatter
        # is tiny anyway, so deep buckets must stay row-packed (TSOPF D>=16
        # classpos lost 10% end-to-end).
        P_k = 128 >> k
        if k == 0:
            return BASE_CP[k]
        if cpos:
            return BASE_CP[k] + (0.0 if P_k >= 16 else 1e9)
        return BASE_CP[k] + min(180.0, 6.0 * P_k)

    STEP_NS = tuple(step_base(k, False) + 250.0 for k in range(8))  # coarse, for
    # the copies-candidate pre-screen only (loads/wb dominate the real choice)
    base_copies = copies

    PERCALL_NS = 3000.0  # fixed dispatch/epilogue cost per bucket pallas_call

    def run_config(merge_all, collapse=False):
        """Pack (best `copies` candidate) + absorb for one chunk-merge policy;
        returns the post-absorption modeled cost (ns) and all placement state.
        Chunk merging and absorption interact (absorption's biggest kills need
        the chunk-pair freedom), so the policies are compared END-TO-END.

        ``collapse``: pack EVERY slab into one bucket at the max depth (shallow
        slabs zero-pad their trailing slots) — for tiny matrices the ~3us fixed
        cost per extra pallas call dwarfs the slot waste."""
        if collapse:
            vlist = [(int(slab_k.max()), bool(slab_wide.any()),
                      np.arange(nslabs, dtype=np.int64))]
        else:
            vlist = [(k, wide,
                      np.flatnonzero((slab_k == k) & (slab_bucket_wide == wide)))
                     for k, wide in variants]
        cands = sorted({base_copies} | ({base_copies * 2} if base_copies * 2 <= 8 else set()))
        bst = None
        for c in cands:
            trb = ROUT // c
            nout_c = max(1, -(-mrb // trb))
            occ_c, out_c = occ_for(trb, nout_c)
            packs = []
            eff = 0.0
            for k, wide, sel in vlist:
                P_k = 128 >> k
                if k == 0:
                    # depth-1: class == output row (P == ROUT) — the pinning is
                    # free (it subsumes row uniqueness exactly), always on
                    pk = pack_variant(sel, P_k, occ_c, out_c, c, merge_all, True)
                    packs.append((k, wide, pk, True))
                    eff += pk[3]
                    continue
                pk_r = pack_variant(sel, P_k, occ_c, out_c, c, merge_all, False)
                pk_c = pack_variant(sel, P_k, occ_c, out_c, c, merge_all, True)
                cost_r = pk_r[3] * step_base(k, False)
                cost_c = pk_c[3] * step_base(k, True)
                fc = os.environ.get("SPMV_TPU_FORCE_CPOS")  # A/B + test tooling
                if fc == "1" or (fc != "0" and cost_c < cost_r):
                    packs.append((k, wide, pk_c, True))
                    eff += cost_c / step_base(k, False)
                else:
                    packs.append((k, wide, pk_r, False))
                    eff += pk_r[3]
            # output tiles cost ~0.8 step-equivalents each (2*ROUT*128*4B writes
            # vs ~164KB slab reads per step)
            score = eff + 0.8 * nout_c
            if bst is None or score < bst[0]:
                bst = (score, c, trb, nout_c, occ_c, out_c, packs)
        _, c, trb, nout_c, occ_c, out_c, packs = bst
        scopy = (occ_c % c).astype(np.int64)
        sb_var = np.full(nslabs, -1, dtype=np.int64)
        sb_step = np.full(nslabs, -1, dtype=np.int64)
        sb_pos = np.full(nslabs, -1, dtype=np.int64)
        for vi, (k, wide, (sq, step_of, pos_of, nsteps), cpos) in enumerate(packs):
            sb_var[sq] = vi
            sb_step[sq] = step_of
            if cpos:
                # pin position to the class NOW (before absorption — its free
                # lists and swap chains must see the real position layout)
                sb_pos[sq] = ((slab_rb[sq] % trb) * c + scopy[sq]) % np.int64(128 >> k)
            else:
                sb_pos[sq] = pos_of
        if not os.environ.get("SPMV_TPU_NO_ABSORB"):
            _absorb_remainders(packs, [merge_all] * len(packs), sb_var, sb_step,
                               sb_pos, scopy, slab_rb, slab_chunk,
                               (slab_rb // trb).astype(np.int64), slab_wide,
                               trb, c, nslabs)
        cost = 0.0
        out_all = (slab_rb // trb).astype(np.int64)
        for vi, (k, wide, _pk, cpos) in enumerate(packs):
            mine = np.flatnonzero(sb_var == vi)
            if not len(mine):
                continue
            stp = sb_step[mine]
            ns = len(np.unique(stp))
            n_pairs = len(np.unique(stp * np.int64(nchunks) + slab_chunk[mine]))
            n_mixed = max(0, n_pairs - ns)
            # chunk loads ~ distinct (out, chunk) pairs of the bucket (Belady
            # reuse across adjacent outs makes this slightly pessimistic for
            # merged plans, slightly optimistic for repeat visits)
            loads = len(np.unique(out_all[mine] * np.int64(nchunks) + slab_chunk[mine]))
            wb = len(np.unique(out_all[mine]))
            if n_mixed >= DBOTH_FRAC * ns:
                # unconditional both-sides build: flat per-step tax, no
                # per-mixed charge (mirrors the kernel's dboth specialization)
                cost += (ns * (step_base(k, cpos) + DBOTH_NS(128 >> k))
                         + loads * LOAD_NS + wb * WB_NS + PERCALL_NS)
            else:
                cost += (ns * (step_base(k, cpos) + (DUAL_NS if n_mixed else 0.0))
                         + n_mixed * MIXED_NS + loads * LOAD_NS + wb * WB_NS
                         + PERCALL_NS)
        return cost, (c, trb, nout_c, occ_c, out_c, packs, scopy,
                      sb_var, sb_step, sb_pos)

    force = os.environ.get("SPMV_TPU_FORCE_MERGE")  # "1"/"0" pins the policy (A/B tooling)
    if os.environ.get("SPMV_TPU_FORCE_COLLAPSE"):  # A/B tooling
        _, state = run_config(False, collapse=True)
    elif force == "1":
        _, state = run_config(True)
    elif force == "0":
        _, state = run_config(False)
    elif nnz <= SMALL_MERGE_NNZ:
        # size-aware default (2026-08-19 hardware A/B, scripts/ab_small_merge.py):
        # on the reference's SMALL set SINGLE won 6/10 with 2 losses (geomean rf
        # 0.0847 vs 0.0795; bcsstk18 +36%, poli_large +40%) — merging costs fill
        # on small plans (bcsstk18 0.479 -> 0.178) where the LARGE sweep gained
        # it.  The merged default below was tuned on >=5.6M-nnz matrices only.
        # pure single — NOT the collapse candidate: the cost model prefers
        # collapse on e.g. bcsstk18 (fill 0.479 -> 0.178) but hardware says
        # single wins it by 36% (0.089 vs 0.065 rf); the model's per-call
        # constant overrates bucket-count savings on tiny plans.
        _, state = run_config(False)
    else:
        # MERGED is the default policy outright (2026-08-18 hardware sweep,
        # dboth kernels): forced-merged beat or tied forced-single on 6/7 large
        # matrices (dielFilter -33%, Cube -28%, Bump -8%, largebasis -6%,
        # Hardesty3/Ga41 tie; vas_stokes the lone -1.9% concession), while the
        # multi-term score got the order wrong on largebasis under every
        # DBOTH_NS tried.  One config also halves the plan-build time.  The
        # model still scores the collapse candidate below and the env pins
        # remain for A/B.
        cost_b, state = run_config(True)
        if os.environ.get("SPMV_TPU_PLAN_DEBUG"):
            print(f"[plan] cost merged={cost_b/1e3:.0f}us (default policy)",
                  flush=True)
        if nslabs <= 8192 and not os.environ.get("SPMV_TPU_NO_ABSORB"):
            # tiny plans: a single collapsed bucket can beat per-depth buckets
            # on fixed per-call costs alone (gated with the other plan
            # canonicalization passes for the analyze-equivalence tests)
            cost_c, state_c = run_config(False, collapse=True)
            if cost_c < cost_b:
                state = state_c
    (copies, tile_rb, nout, slab_occ, slab_out, packs, slab_copy,
     sb_var, sb_step, sb_pos) = state

    buckets_out: List[SwellBucket] = []
    padded_slots = 0
    total_steps = 0
    nnz_var = sb_var[slab_of_nnz]  # hoisted: one nnz-sized gather, not one per bucket
    for vi, (k, wide, _pk, cpos) in enumerate(packs):
        D = 1 << k
        P = 128 // D
        mine = np.flatnonzero(sb_var == vi)
        if len(mine) == 0:
            continue
        # dense step renumber (absorption kills steps) preserving (out, step) order
        uniq_st, dense = np.unique(sb_step[mine], return_inverse=True)
        nsteps = len(uniq_st)
        # (position-class buckets had sb_pos pinned to outrow % P inside
        # run_config, before absorption; absorbed slabs got theirs in commit)
        # per-slab (global index) step/pos for the nnz scatter
        slab_step = np.empty(nslabs, dtype=np.int64)
        slab_pos = np.empty(nslabs, dtype=np.int64)
        slab_step[mine] = dense
        slab_pos[mine] = sb_pos[mine]
        step_of = dense
        pos_of = sb_pos[mine]
        sq = mine

        # per-step metadata; a step's slabs span at most TWO distinct chunks
        # (cascade-enforced)
        chunks_s = slab_chunk[sq]
        outsel = np.zeros(nsteps, dtype=np.int32)
        outsel[step_of] = slab_out[sq].astype(np.int32)
        csa = np.full(nsteps, np.int64(1) << 40, dtype=np.int64)
        np.minimum.at(csa, step_of, chunks_s)
        csb = np.full(nsteps, -1, dtype=np.int64)
        np.maximum.at(csb, step_of, chunks_s)
        bad = (chunks_s != csa[step_of]) & (chunks_s != csb[step_of])
        assert not bad.any(), "step chunk-pair invariant violated (3+ distinct chunks)"
        # The kernel's two chunk operands form a 2-slot cache over the step
        # sequence; each x-chunk block re-DMA is ~196KB, so slot contents are
        # assigned by Belady's rule (evict the chunk whose next use is farthest).
        # For sliding pair patterns (c,c+1)->(c+1,c+2) this halves chunk loads
        # versus fixed a=min/b=max roles.  hasb is a 3-state side flag: 0 = all
        # slabs on slot a, 2 = all on slot b (both skip the side decode and run
        # one table-matmul set), 1 = mixed (both sides built + summed).
        need = [set() for _ in range(nsteps)]
        uq = np.unique(np.stack([step_of, chunks_s]), axis=1)
        for stp, c in uq.T:
            need[int(stp)].add(int(c))
        side_b = np.zeros(len(sq), dtype=bool)
        hasb = np.zeros(nsteps, dtype=np.int32)
        if all(len(s) <= 1 for s in need):
            # every step single-chunk: bypass the slot machinery entirely so the
            # bucket compiles to the zero-overhead legacy kernel (hasb all 0);
            # Belady would otherwise park chunks in slot b for cross-out reuse
            # and silently drag the whole bucket onto the dual kernel
            chunksel = csa.astype(np.int32)
            chunkselb = chunksel.copy()
        else:
            uses = {}
            for i in range(nsteps - 1, -1, -1):
                for c in need[i]:
                    uses.setdefault(c, []).append(i)  # descending step lists
            nxt = {c: list(l) for c, l in uses.items()}
            slot = [None, None]
            chunksel = np.zeros(nsteps, dtype=np.int32)
            chunkselb = np.zeros(nsteps, dtype=np.int32)

            def _next_use(c, i):
                l = nxt.get(c)
                if not l:
                    return 1 << 60
                while l and l[-1] <= i:
                    l.pop()
                return l[-1] if l else (1 << 60)

            for i in range(nsteps):
                S = need[i]
                for c in S:
                    if c in slot:
                        continue
                    # Belady: evict the candidate whose content has the farthest
                    # next use; ties (incl. the empty slot's +inf) break toward
                    # OCCUPIED slots, then slot 0 — so single-chunk runs keep
                    # recycling slot a and never fabricate pure-b steps (which
                    # would force the whole bucket onto the dual kernel)
                    cand = [j for j in (0, 1) if slot[j] not in S]
                    j = max(cand, key=lambda j: (
                        (1 << 60) if slot[j] is None else _next_use(slot[j], i),
                        slot[j] is not None,
                        j == 0,
                    ))
                    slot[j] = c
                chunksel[i] = slot[0] if slot[0] is not None else (slot[1] or 0)
                chunkselb[i] = slot[1] if slot[1] is not None else chunksel[i]
            in_a = chunks_s == chunksel[step_of]
            side_b[:] = ~in_a
            a_used = np.zeros(nsteps, dtype=bool)
            b_used = np.zeros(nsteps, dtype=bool)
            np.logical_or.at(a_used, step_of, in_a)
            np.logical_or.at(b_used, step_of, ~in_a)
            assert (chunks_s[~in_a] == chunkselb[step_of[~in_a]]).all()
            hasb = np.where(a_used & b_used, 1, np.where(b_used, 2, 0)).astype(np.int32)
        first = np.zeros(nsteps, dtype=np.int32)
        first[0] = 1
        first[1:] = (outsel[1:] != outsel[:-1]).astype(np.int32)

        rbrow_vals = ((slab_rb[sq] % tile_rb) * copies + slab_copy[sq]).astype(np.int32)
        # position uniqueness: a collision would silently overwrite rbvec and
        # double-book value slots (classpos once hit this via a class-blind
        # fallback packer)
        assert len(np.unique(step_of * np.int64(128) + pos_of)) == len(sq), \
            "slab position collision within a step"
        rbvec = np.full((nsteps, 128), -1, dtype=np.int32)
        rbvec[step_of, pos_of] = rbrow_vals
        # occupancy-by-output-row (for the position-class mask scatter): lane r
        # is 1 iff the step has a slab targeting out row r
        occrow = np.zeros((nsteps, 128), dtype=np.int32)
        occrow[step_of, rbrow_vals] = 1

        # dual one-hot per slab POSITION: rows [0,P) select the window's aligned
        # table row A (= slab_w); for wide buckets rows [BOFF, BOFF+P) select row
        # B (= slab_w + 1).  The chunk side rides in the VALUE (1 = chunk a,
        # 2 = chunk b — each position lives on exactly one side), so the packed
        # bytes stay the same as the single-chunk layout; the kernel splits sides
        # with `&1` / `>>1` and skips the b-side matmuls when the step has no b
        # slabs.
        boff = max(P, 8)
        ohl = 2 * boff if wide else max(4, -(-P // 4) * 4)
        ohv = np.where(side_b, 2, 1).astype(np.int8)
        onehot = np.zeros((nsteps, ohl, 128), dtype=np.int8)
        w_local = (slab_w[sq] & (CHUNK_W - 1)).astype(np.int64)
        onehot[step_of, pos_of, w_local] = ohv
        if wide:
            has_b = w_local <= CHUNK_W - 2
            onehot[step_of[has_b], boff + pos_of[has_b], w_local[has_b] + 1] = ohv[has_b]

        # scatter nnz of this bucket (+variant) — keyed on the slab's FINAL
        # bucket (absorption may have moved it from its layer's native depth).
        # Values scatter DIRECTLY into the device-layout f32 hi/lo planes via a
        # flat linear index: the f64 intermediate + post-hoc split used to cost
        # seconds at 40M nnz (hundreds of MB of extra traffic).
        esel = np.flatnonzero(nnz_var == vi)
        e_slab = slab_of_nnz[esel]
        flat = (slab_step[e_slab] * 128 + slot_in_slab[esel] * P
                + slab_pos[e_slab]) * 128 + lane[esel]
        is64 = np.dtype(dtype) == np.float64
        ve = vk[esel]
        if ve.ndim == 1:
            ve = ve[:, None]
        vhe = ve.astype(np.float32)
        # nv > 1 (BSR): plane p of a step occupies sublane rows [p*128, (p+1)*128);
        # every cell plane of a slot shares the slot's (step, srow, lane) address.
        step_e = flat // 16384
        win_e = flat % 16384
        base_e = step_e * (nv * 16384) + win_e
        vh = np.zeros(nsteps * nv * 16384, dtype=np.float32)
        for p in range(nv):
            vh[base_e + p * 16384] = vhe[:, p]
        vh = vh.reshape(nsteps, nv * 128, 128)
        if is64:
            vle = (ve - vhe.astype(np.float64)).astype(np.float32)
            vl = np.zeros(nsteps * nv * 16384, dtype=np.float32)
            for p in range(nv):
                vl[base_e + p * 16384] = vle[:, p]
            vl = vl.reshape(nsteps, nv * 128, 128)
        else:
            vl = None
        lidx = np.zeros(nsteps * 128 * 128, dtype=np.uint8)
        lidx[flat] = lc[esel]
        lidx = lidx.reshape(nsteps, 128, 128)

        touched = np.zeros(nout, dtype=bool)
        touched[outsel] = True

        buckets_out.append(
            SwellBucket(
                depth=D, wide=wide, classpos=bool(cpos), nsteps=nsteps,
                vh=vh, vl=vl, lidx=lidx, onehot=onehot, rbvec=rbvec,
                occrow=occrow, chunksel=chunksel,
                chunkselb=chunkselb, hasb=hasb, outsel=outsel,
                first=first, touched=touched, nnz=len(esel), nv=nv,
            )
        )
        padded_slots += nsteps * 128 * 128
        total_steps += nsteps

    return SwellPlan(
        buckets=tuple(buckets_out),
        rows=m, cols=n, nnz=nnz, nout=nout, nchunks=nchunks,
        tail_rows=tail_rows, tail_ci=tail_ci, tail_v=tail_v,
        fill_efficiency=nkept / max(padded_slots, 1), delta=delta,
        total_steps=total_steps,
        copies=copies, tile_rb=tile_rb,
    )
