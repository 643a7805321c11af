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

# Per-step cost model (ns) on v5e, from the swell cost model (ops/swell_plan.py):
# scalar step ~850ns per 16384 slots; a BSR step adds (r^2-1) compensated value
# products (~210ns each) and (r-1) table+gather sets (~470ns) but carries
# 16384*r^2 cells.  Candidate r wins when expansion * per_cell(r) < per_cell(1).
_SCALAR_NS = 850.0
_PROD_NS = 210.0
_TG_NS = 470.0
_MAX_EXPANSION = 2.2  # hard cap: value-plane DMA (8B/cell f64) eventually binds


def _per_cell_ns(r: int) -> float:
    if r == 1:
        return _SCALAR_NS / 16384.0
    step = _SCALAR_NS + (r * r - 1) * _PROD_NS + (r - 1) * _TG_NS
    return step / (16384.0 * r * r)


def _expansion_sample(rp, ci, m, n, r, sample=4096):
    """Zero-fill expansion estimate (r*r*nnzb / nnz) over a node-row sample."""
    mb = -(-m // r)
    stride = max(1, mb // sample)
    nodes = np.arange(0, mb, stride, dtype=np.int64)
    r0 = nodes * r
    r1 = np.minimum(r0 + r, m)
    lens = (rp[r1] - rp[r0]).astype(np.int64)
    tot = int(lens.sum())
    if tot == 0:
        return np.inf
    starts = rp[r0]
    idx = np.repeat(starts, lens) + (
        np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
    )
    bc = ci[idx] // r
    node_of = np.repeat(np.arange(len(nodes), dtype=np.int64), lens)
    nbb = n // r + 2
    nblocks = len(np.unique(node_of * nbb + bc))
    return nblocks * r * r / tot


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
        e = _expansion_sample(rp, ci, m, n, r)
        if e > _MAX_EXPANSION:
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
