"""Aligned r x r micro-block (BSR) detection + condensation for the swell kernel.

FEM/structural matrices assemble from dense node blocks (r degrees of freedom per
mesh node): the r rows of a node share one column-block set.  Condensing to the
NODE pattern shrinks the plan by r^2 — every index byte, one-hot selector, table
matmul and gather in the swell kernel then serves r^2 values (the TPU answer to
the reference's x-access coalescing ladder, hip-thread-row/thread_row_x_remap.inl:38-60,
and to ACSR's row-structure exploitation, benchmark/acsr/ACSR.cpp:130-216).

Blocks are ALIGNED (node i = rows [i*r, (i+1)*r)); partially-filled blocks are
zero-filled, which is numerically free (0 * x == 0 exactly) but costs value-plane
bytes — detection therefore scores candidates by a measured per-slot cost model
against the zero-fill expansion and picks scalar (r=1) when no candidate wins.
"""

from __future__ import annotations

import numpy as np

__all__ = ["detect_block_size", "bsr_condense"]

# Per-step cost model (ns) on v5e, calibrated against the 2026-08-17 hardware
# A/B (boneS10/Bump_2911/Cube_Coup_dt6/RM07R, scalar vs SPMV_TPU_BSR=3):
# scalar step ~850ns per 16384 slots; a BSR step adds (r^2-1) compensated value
# products and (r-1) table+gather sets but carries 16384*r^2 cells.  Fitted
# per-cell costs: scalar ~52ps, BSR r=3 best-case ~33ps (RM07R measured).
#
# The decisive SECOND gate is slab depth: table-build matmuls scale with
# P = 128/D, so plans dominated by shallow slabs (D=1/2) pay 36-72 MXU passes
# per BSR step and LOSE 1.35-1.5x, while deep plans WIN.  The estimator below
# computes avg blocks per (node row, 256-scalar-col window) — a direct proxy
# for realized slab depth.  Measured calibration (r=3 unless noted):
#   boneS10 est-depth 1.5 -> LOST 1.51x | Bump_2911 1.0 -> LOST 1.20x
#   Cube_Coup_dt6 1.2 -> LOST 1.36x    | RM07R 4.0 -> WON 1.53x (rf 0.196->0.301)
#   TSOPF_RS_b2383 12.5-25 (in-class with RM07R's dense node rows)
_SCALAR_NS = 850.0
_PROD_NS = 385.0
_TG_NS = 470.0
_MAX_EXPANSION = 2.2   # hard cap: value-plane DMA (8B/cell f64) eventually binds
_MIN_WINDOW_DEPTH = 3.5  # est-depth gate (see calibration above)


def _per_cell_ns(r: int) -> float:
    if r == 1:
        return _SCALAR_NS / 16384.0
    step = _SCALAR_NS + (r * r - 1) * _PROD_NS + (r - 1) * _TG_NS
    return step / (16384.0 * r * r)


def _expansion_sample(rp, ci, m, n, r, sample=4096):
    """(zero-fill expansion r*r*nnzb/nnz, est slab depth: avg blocks per
    (node row, 256-scalar-col window)) over a node-row sample."""
    mb = -(-m // r)
    stride = max(1, mb // sample)
    nodes = np.arange(0, mb, stride, dtype=np.int64)
    r0 = nodes * r
    r1 = np.minimum(r0 + r, m)
    lens = (rp[r1] - rp[r0]).astype(np.int64)
    tot = int(lens.sum())
    if tot == 0:
        return np.inf, 0.0
    starts = rp[r0]
    idx = np.repeat(starts, lens) + (
        np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
    )
    bc = ci[idx] // r
    node_of = np.repeat(np.arange(len(nodes), dtype=np.int64), lens)
    nbb = n // r + 2
    ub = np.unique(node_of * nbb + bc)
    nblocks = len(ub)
    wb = max(1, 256 // r)  # block cols per 256-scalar-col window
    ninst = len(np.unique((ub // nbb) * (nbb // wb + 2) + (ub % nbb) // wb))
    return nblocks * r * r / tot, nblocks / max(1, ninst)


def detect_block_size(rp, ci, shape, cands=(4, 3, 2)) -> int:
    """Best aligned micro-block size for (rp, ci), or 1 for the scalar path."""
    m, n = int(shape[0]), int(shape[1])
    nnz = int(rp[-1])
    if nnz == 0 or m < 4 * max(cands) or nnz < 4096:
        return 1
    rp = np.asarray(rp, dtype=np.int64)
    ci = np.asarray(ci, dtype=np.int64)
    best_r, best_cost = 1, _per_cell_ns(1)
    for r in cands:
        e, est_depth = _expansion_sample(rp, ci, m, n, r)
        if e > _MAX_EXPANSION or est_depth < _MIN_WINDOW_DEPTH:
            continue
        cost = e * _per_cell_ns(r)
        if cost < best_cost:
            best_r, best_cost = r, cost
    return best_r


def bsr_condense(rp, ci, v, shape, r):
    """Condense CSR to the aligned r x r block pattern.

    Returns (rp_b int64 (mb+1,), ci_b int64 (nnzb,), vals2d (nnzb, r*r) of
    v.dtype) — vals2d[k, i*r + j] is cell (i, j) of block k, zero where absent.
    Requires canonical CSR (sorted unique columns per row).
    """
    m, n = int(shape[0]), int(shape[1])
    rp = np.asarray(rp, dtype=np.int64)
    ci = np.asarray(ci, dtype=np.int64)
    v = np.asarray(v)
    nnz = int(rp[-1])
    mb = -(-m // r)
    nbb = -(-n // r)
    try:
        from ..io.native import bsr_condense_native

        nat = bsr_condense_native(rp, ci, v, m, r, mb)
        if nat is not None:
            return nat
    except Exception:
        pass
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
    br = rows // r
    bc = ci // r
    key = br * nbb + bc
    uniq, inv = np.unique(key, return_inverse=True)
    nnzb = len(uniq)
    vals2d = np.zeros((nnzb, r * r), dtype=v.dtype)
    cell = (rows % r) * r + (ci % r)
    vals2d[inv, cell] = v[:nnz]
    rp_b = np.zeros(mb + 1, dtype=np.int64)
    np.add.at(rp_b, uniq // nbb + 1, 1)
    np.cumsum(rp_b, out=rp_b)
    ci_b = uniq % nbb
    return rp_b, ci_b, vals2d
