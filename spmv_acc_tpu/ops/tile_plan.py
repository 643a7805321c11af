"""Analyze pass for the tiled lane-gather SpMV kernel (`adaptive_plus` strategy).

TPU re-imagination of csr-adaptive-plus's host analyze
(hip-csr-adaptive-plus/csr_adaptive_plus_analyze.cpp:12-98): one host scan builds a
block decomposition that the Pallas kernel consumes via scalar prefetch.

Decomposition: the matrix is cut into (128-row × 128-column) windows.  Within a
block, **rows map to lanes and nnz-position maps to sublanes**, so
  * the x-gather is a lane-local permutation of the 128-wide x window — the only
    gather primitive Mosaic supports natively (measured ~26x faster than XLA's
    scalar gather),
  * the row reduction is a dense sublane sum,
  * y writes are contiguous (1,128) tiles.
Blocks are bucketed by their padded sublane depth W ∈ {8,16,32,64,128} (a row can
hold at most 128 nnz inside a 128-column window, so W=128 always suffices — the
bound that replaces the reference's long-row atomics, csr_adaptive_plus_spmv_imp.inl:54-118).
One Pallas call per non-empty bucket; blocks are sorted by row-block id so output
revisiting accumulates in VMEM scratch and flushes once per row-block.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["TileBucket", "TilePlan", "build_tile_plan", "BUCKETS"]

LANES = 128  # rows per block
COL_WINDOW = 128
# Padded sublane depths.  Depths below 8 are legal block shapes because the slab
# array's own sublane dim equals the block's (Mosaic's "equal to the respective
# dimension" rule) and they matter: scattered matrices have mostly depth-1..4
# windows, where a depth-8 floor would waste 2-8x HBM traffic.
BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


@dataclasses.dataclass(frozen=True)
class TileBucket:
    """All blocks of one sublane depth W, sorted by row-block id."""

    depth: int  # W (sublane count of each slab)
    num_blocks: int
    values: np.ndarray  # (num_blocks * W, 128)
    local_idx: np.ndarray  # (num_blocks * W, 128) int32, values in [0, 128)
    col_tile: np.ndarray  # (num_blocks,) int32 — x window id
    row_block: np.ndarray  # (num_blocks,) int32 — y tile id
    flush: np.ndarray  # (num_blocks,) int32 — 1 when last block of its row_block
    nnz: int  # real elements in this bucket


@dataclasses.dataclass(frozen=True)
class TilePlan:
    buckets: Tuple[TileBucket, ...]
    num_row_blocks: int
    num_col_tiles: int
    rows: int
    cols: int
    nnz: int
    # fraction of padded slots that are real nnz — the dispatch quality gate
    fill_efficiency: float
    # per row-block: whether any bucket touches it (for masking untouched tiles)
    touched: Dict[int, np.ndarray]  # depth -> (num_row_blocks,) bool


def _bucket_of(w: int) -> int:
    for b in BUCKETS:
        if w <= b:
            return b
    return BUCKETS[-1]


def build_tile_plan(row_ptr, col_idx, values, shape) -> TilePlan:
    rp = np.asarray(row_ptr).astype(np.int64)
    ci = np.asarray(col_idx).astype(np.int64)
    v = np.asarray(values)
    m, n = shape
    nnz = int(rp[-1])
    mrb = max(1, -(-m // LANES))
    nct = max(1, -(-n // COL_WINDOW))

    if nnz == 0:
        return TilePlan((), mrb, nct, m, n, 0, 1.0, {})

    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
    lane = (rows % LANES).astype(np.int64)
    lc = (ci % COL_WINDOW).astype(np.int32)

    from ..io.native import tile_analyze_native

    native = tile_analyze_native(rp, ci, m, nct)
    if native is not None:
        block_key, slot, blk_uniq, depth = native
        slot = slot.astype(np.int64)
    else:
        rb = rows // LANES
        ct = ci // COL_WINDOW
        # slot of each element within its (row, ct) group: CSR is col-sorted per
        # row, so elements of one (row, ct) are consecutive.
        key_rc = rows * nct + ct
        new_group = np.concatenate(([True], key_rc[1:] != key_rc[:-1]))
        group_id = np.cumsum(new_group) - 1
        group_start = np.flatnonzero(new_group)
        slot = np.arange(nnz, dtype=np.int64) - group_start[group_id]
        # per-block depth: max over lanes of per-(row, ct) counts
        block_key = rb * nct + ct
        group_sizes = np.diff(np.concatenate([group_start, [nnz]]))
        group_block = block_key[group_start]
        order = np.argsort(group_block, kind="stable")
        gb_sorted = group_block[order]
        gs_sorted = group_sizes[order]
        blk_uniq, blk_first = np.unique(gb_sorted, return_index=True)
        depth = np.maximum.reduceat(gs_sorted, blk_first)
    bucket = np.array([_bucket_of(int(w)) for w in depth], dtype=np.int64)

    # map each element to its block's bucket + per-bucket block index
    blk_of_elem = np.searchsorted(blk_uniq, block_key)
    elem_bucket = bucket[blk_of_elem]

    buckets: List[TileBucket] = []
    touched: Dict[int, np.ndarray] = {}
    padded_total = 0
    for b in BUCKETS:
        sel_blocks = np.flatnonzero(bucket == b)
        if len(sel_blocks) == 0:
            continue
        # order blocks by (row_block, col_tile) = by block key (already sorted)
        bkeys = blk_uniq[sel_blocks]
        rb_arr = (bkeys // nct).astype(np.int32)
        ct_arr = (bkeys % nct).astype(np.int32)
        nb = len(bkeys)
        vals_slab = np.zeros((nb * b, LANES), dtype=v.dtype)
        idx_slab = np.zeros((nb * b, LANES), dtype=np.int32)
        # elements in this bucket
        esel = np.flatnonzero(elem_bucket == b)
        # per-bucket block position of each element
        pos = np.searchsorted(bkeys, block_key[esel])
        srow = pos * b + slot[esel]
        vals_slab[srow, lane[esel]] = v[esel]
        idx_slab[srow, lane[esel]] = lc[esel]
        flush = np.concatenate([(rb_arr[1:] != rb_arr[:-1]), [True]]).astype(np.int32)
        tmask = np.zeros(mrb, dtype=bool)
        tmask[rb_arr] = True
        touched[b] = tmask
        buckets.append(
            TileBucket(
                depth=b,
                num_blocks=nb,
                values=vals_slab,
                local_idx=idx_slab,
                col_tile=ct_arr,
                row_block=rb_arr,
                flush=flush,
                nnz=len(esel),
            )
        )
        padded_total += nb * b * LANES

    return TilePlan(
        buckets=tuple(buckets),
        num_row_blocks=mrb,
        num_col_tiles=nct,
        rows=m,
        cols=n,
        nnz=nnz,
        fill_efficiency=nnz / max(padded_total, 1),
        touched=touched,
    )
