"""Analyze pass for the `swell` (Sliced-Window ELL) SpMV kernel — the flagship plan.

TPU re-imagination of the reference's csr-adaptive-plus host analyze
(hip-csr-adaptive-plus/csr_adaptive_plus_analyze.cpp:12-98): one vectorized host scan
builds the block decomposition the Pallas kernel consumes.

Decomposition
-------------
* The matrix is cut into (128-row × 128-col) **windows**; lane = row-in-block, so the
  x fetch per element is a lane permutation — the one gather Mosaic lowers natively.
* Each (row-block, window) group is sliced into **layers** whose depths follow the
  binary decomposition of the group's max per-row count (e.g. max 5 → layers of depth
  4 and 1).  Power-of-two depths make the kernel's in-register fold exact and
  slice-shrinking; binary decomposition eliminates the old pow2-of-max padding
  (5 → 4+1 slots instead of 8).
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
from typing import List, Tuple

import numpy as np

__all__ = ["SwellBucket", "SwellPlan", "build_swell_plan"]

LANES = 128          # rows per row-block = lanes
CW = 128             # columns per window = gather table width
CHUNK_W = 128        # windows per x-chunk  (chunk = 16384 columns)
ROUT = 128           # row-blocks per output window (out tile = 16384 rows)


@dataclasses.dataclass
class SwellBucket:
    """All steps of one slab depth D."""

    depth: int                 # D
    nsteps: int
    values: np.ndarray         # (nsteps, 128, 128) source dtype
    lidx: np.ndarray           # (nsteps, 128, 128) int8 — column within window
    onehot: np.ndarray         # (nsteps, 128, 128) int8 — window-in-chunk per sublane
    rbvec: np.ndarray          # (nsteps, 128) int32 — row-block (mod ROUT) per slab pos, -1 pad
    chunksel: np.ndarray       # (nsteps,) int32 — x chunk id
    outsel: np.ndarray         # (nsteps,) int32 — output window id
    first: np.ndarray          # (nsteps,) int32 — 1 on first step of an outsel run
    touched: np.ndarray        # (nout,) bool — out windows this bucket writes
    nnz: int


@dataclasses.dataclass
class SwellPlan:
    buckets: Tuple[SwellBucket, ...]
    rows: int
    cols: int
    nnz: int
    nout: int                  # ceil(mrb / tile_rb)
    nchunks: int               # ceil(n / 16384)
    fill_efficiency: float     # nnz / padded slots
    total_steps: int
    # Small matrices have fewer row-blocks than a step has slab positions, so the
    # <=1-slab-per-row-block constraint would leave steps mostly empty.  Each
    # row-block therefore gets `copies` rows in the output tile (slab j of a
    # row-block uses copy j%copies); the wrapper sums the copies in f64 — exact.
    copies: int = 1
    tile_rb: int = ROUT        # row-blocks per output tile = 128 // copies


def build_swell_plan(row_ptr, col_idx, values, shape) -> SwellPlan:
    rp = np.asarray(row_ptr, dtype=np.int64)
    ci = np.asarray(col_idx, dtype=np.int64)
    v = np.asarray(values)
    m, n = int(shape[0]), int(shape[1])
    nnz = int(rp[-1])
    mrb = max(1, -(-m // LANES))
    copies = 1
    while copies < 8 and mrb * copies < ROUT:
        copies *= 2
    tile_rb = ROUT // copies
    nout = max(1, -(-mrb // tile_rb))
    nchunks = max(1, -(-n // (CW * CHUNK_W)))
    if nnz == 0:
        return SwellPlan((), m, n, 0, nout, nchunks, 1.0, 0, copies, tile_rb)

    nw = max(1, -(-n // CW))
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
    rb = rows >> 7
    lane = (rows & 127).astype(np.int64)
    w = ci >> 7
    lc = (ci & 127).astype(np.int8)
    gid = rb * nw + w

    # slot within (row, window): CSR is column-sorted per row -> consecutive runs
    key_rw = rows * nw + w
    new_rw = np.empty(nnz, dtype=bool)
    new_rw[0] = True
    np.not_equal(key_rw[1:], key_rw[:-1], out=new_rw[1:])
    rw_start = np.flatnonzero(new_rw)
    rw_id = np.cumsum(new_rw) - 1
    slot_rw = np.arange(nnz, dtype=np.int64) - rw_start[rw_id]

    # per-group max count
    rw_gid = gid[rw_start]
    rw_sizes = np.diff(np.concatenate([rw_start, [nnz]]))
    order_g = np.argsort(rw_gid, kind="stable")
    g_sorted = rw_gid[order_g]
    c_sorted = rw_sizes[order_g]
    gid_uniq, g_first = np.unique(g_sorted, return_index=True)
    maxc = np.maximum.reduceat(c_sorted, g_first)  # per unique gid, <= 128

    # per-nnz layer bit k: largest set bit k of maxc with (maxc >> k << k) > slot
    g_of_nnz = np.searchsorted(gid_uniq, gid)
    M = maxc[g_of_nnz]
    s = slot_rw
    layer_k = np.full(nnz, -1, dtype=np.int8)
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
    slab_rb = slab_gid // nw
    slab_w = slab_gid % nw
    slab_out = (slab_rb // tile_rb).astype(np.int64)  # out window id
    slab_chunk = (slab_w >> 7).astype(np.int64)       # x chunk id
    nslabs = len(slab_uniq)

    # occurrence index j of each slab within its (bucket k, out, chunk, rb) group;
    # copy = j % copies (its output-row copy), round = j // copies (its step round) —
    # so slabs targeting the same output row land in different steps
    pack_key = ((slab_k * nout + slab_out) * nchunks + slab_chunk)
    rb_key = pack_key * (nw + 1) + slab_rb  # unique per (bucket,out,chunk,rb)
    order_r = np.argsort(rb_key, kind="stable")
    rk = rb_key[order_r]
    run_new = np.empty(nslabs, dtype=bool)
    run_new[0] = True
    np.not_equal(rk[1:], rk[:-1], out=run_new[1:])
    run_start = np.flatnonzero(run_new)
    run_id = np.cumsum(run_new) - 1
    occ_sorted = np.arange(nslabs, dtype=np.int64) - run_start[run_id]
    slab_occ = np.empty(nslabs, dtype=np.int64)
    slab_occ[order_r] = occ_sorted
    slab_copy = slab_occ % copies
    slab_round = slab_occ // copies

    # q-group = (bucket k, out, chunk, round); within q, pack P slabs per step
    buckets_out: List[SwellBucket] = []
    padded_slots = 0
    total_steps = 0
    dtype = v.dtype
    for k in range(8):
        sel = np.flatnonzero(slab_k == k)
        if len(sel) == 0:
            continue
        D = 1 << k
        P = 128 // D
        q_key = (slab_out[sel] * nchunks + slab_chunk[sel]) * (nslabs + 1) + slab_round[sel]
        order_q = np.argsort(q_key, kind="stable")
        sq = sel[order_q]
        qk = q_key[order_q]
        nb = len(sq)
        qnew = np.empty(nb, dtype=bool)
        qnew[0] = True
        np.not_equal(qk[1:], qk[:-1], out=qnew[1:])
        q_start = np.flatnonzero(qnew)
        q_id = np.cumsum(qnew) - 1
        idx_in_q = np.arange(nb, dtype=np.int64) - q_start[q_id]
        q_len = np.diff(np.concatenate([q_start, [nb]]))
        q_steps = -(-q_len // P)
        q_step_off = np.concatenate([[0], np.cumsum(q_steps)[:-1]])
        step_of = q_step_off[q_id] + idx_in_q // P
        pos_of = idx_in_q % P
        nsteps = int(q_steps.sum())

        # per-slab (in bucket-sorted order sq) step/pos
        slab_step = np.empty(nslabs, dtype=np.int64)
        slab_pos = np.empty(nslabs, dtype=np.int64)
        slab_step[sq] = step_of
        slab_pos[sq] = pos_of

        # per-step metadata from the first slab of each step
        chunksel = np.zeros(nsteps, dtype=np.int32)
        outsel = np.zeros(nsteps, dtype=np.int32)
        chunksel[step_of] = slab_chunk[sq].astype(np.int32)
        outsel[step_of] = slab_out[sq].astype(np.int32)
        first = np.zeros(nsteps, dtype=np.int32)
        first[0] = 1
        first[1:] = (outsel[1:] != outsel[:-1]).astype(np.int32)

        rbvec = np.full((nsteps, 128), -1, dtype=np.int32)
        rbvec[step_of, pos_of] = (
            (slab_rb[sq] % tile_rb) * copies + slab_copy[sq]
        ).astype(np.int32)

        # one-hot per slab POSITION (the kernel builds a (P,128) table and
        # tile-expands it over sublanes; storing per-position rows instead of
        # per-sublane rows shrinks the array D-fold).  int8 min sublane tile = 32.
        ohp = max(P, 32)
        onehot = np.zeros((nsteps, ohp, 128), dtype=np.int8)
        w_local = (slab_w[sq] & (CHUNK_W - 1)).astype(np.int64)
        onehot[step_of, pos_of, w_local] = 1

        # scatter nnz of this bucket
        esel = np.flatnonzero(layer_k == k)
        e_slab = slab_of_nnz[esel]
        e_sub = slot_in_slab[esel] * P + slab_pos[e_slab]
        e_step = slab_step[e_slab]
        vals = np.zeros((nsteps, 128, 128), dtype=dtype)
        lidx = np.zeros((nsteps, 128, 128), dtype=np.int8)
        vals[e_step, e_sub, lane[esel]] = v[esel]
        lidx[e_step, e_sub, lane[esel]] = lc[esel]

        touched = np.zeros(nout, dtype=bool)
        touched[outsel] = True

        buckets_out.append(
            SwellBucket(
                depth=D, nsteps=nsteps, values=vals, lidx=lidx, onehot=onehot,
                rbvec=rbvec, chunksel=chunksel, outsel=outsel, first=first,
                touched=touched, nnz=len(esel),
            )
        )
        padded_slots += nsteps * 128 * 128
        total_steps += nsteps

    return SwellPlan(
        buckets=tuple(buckets_out),
        rows=m, cols=n, nnz=nnz, nout=nout, nchunks=nchunks,
        fill_efficiency=nnz / max(padded_slots, 1),
        total_steps=total_steps,
        copies=copies, tile_rb=tile_rb,
    )
