"""Tile-plan analyze pass: reconstruct the matrix from the block decomposition and
check it is lossless, plus SpMV-through-the-plan equivalence in pure numpy."""

import numpy as np
import pytest

from spmv_acc_tpu.formats import banded_csr, dense_row_outlier_csr, powerlaw_csr, random_csr
from spmv_acc_tpu.formats.convert import csr_to_dense
from spmv_acc_tpu.ops.tile_plan import LANES, COL_WINDOW, build_tile_plan

MATRICES = {
    "banded": lambda: banded_csr(300, bandwidth=7, seed=60),
    "random": lambda: random_csr(260, 300, 4000, seed=61),
    "powerlaw": lambda: powerlaw_csr(200, 200, avg_nnz=10, seed=62),
    "outlier": lambda: dense_row_outlier_csr(150, 150, avg_nnz=4, n_dense=2, seed=63),
    "tall": lambda: random_csr(500, 70, 2000, seed=64),
    "wide": lambda: random_csr(70, 500, 2000, seed=65),
}


def _numpy_spmv_via_plan(plan, x):
    """Execute the kernel's math in numpy: per block, lane-gather + sublane sum."""
    n_pad = plan.num_col_tiles * COL_WINDOW
    xp = np.zeros(n_pad)
    xp[: len(x)] = x
    xw = xp.reshape(plan.num_col_tiles, COL_WINDOW)
    y = np.zeros(plan.num_row_blocks * LANES)
    for bucket in plan.buckets:
        W = bucket.depth
        vals = bucket.values.reshape(bucket.num_blocks, W, LANES)
        idx = bucket.local_idx.reshape(bucket.num_blocks, W, LANES)
        for b in range(bucket.num_blocks):
            table = xw[bucket.col_tile[b]]  # (128,)
            g = table[idx[b]]  # (W, 128) lane-gather
            part = np.sum(vals[b] * g, axis=0)  # (128,)
            rb = bucket.row_block[b]
            y[rb * LANES : (rb + 1) * LANES] += part
    return y[: plan.rows]


@pytest.mark.parametrize("name", sorted(MATRICES))
def test_plan_spmv_matches_dense(name):
    csr = MATRICES[name]()
    rp, ci, v, shape = csr.to_numpy()
    plan = build_tile_plan(rp, ci, v, shape)
    assert plan.nnz == csr.nnz
    assert sum(b.nnz for b in plan.buckets) == csr.nnz
    rng = np.random.default_rng(7)
    x = rng.random(shape[1])
    got = _numpy_spmv_via_plan(plan, x)
    want = csr_to_dense(rp, ci, v, shape) @ x
    assert np.allclose(got, want), np.abs(got - want).max()


def test_plan_dense_window_row():
    """A row with 128 nnz inside one window must fit in the deepest bucket."""
    m = 130
    cols = np.arange(128)
    rp = np.zeros(m + 1, dtype=np.int64)
    rp[1:] = 128
    rp = np.cumsum(np.concatenate([[0], np.full(m, 0)]))  # rebuild: row0 has 128, rest 0
    rp = np.concatenate([[0], np.full(m, 128)])
    rp[1:] = 128
    row_ptr = np.zeros(m + 1, dtype=np.int64)
    row_ptr[1:] = 128  # only row 0 nonzero? construct properly:
    row_ptr = np.concatenate([[0, 128], np.full(m - 1, 128)])
    v = np.ones(128)
    plan = build_tile_plan(row_ptr, cols, v, (m, 200))
    assert max(b.depth for b in plan.buckets) == 128
    x = np.ones(200)
    got = _numpy_spmv_via_plan(plan, x)
    assert got[0] == 128 and np.all(got[1:] == 0)


def test_plan_flush_flags():
    csr = random_csr(300, 600, 5000, seed=66)
    rp, ci, v, shape = csr.to_numpy()
    plan = build_tile_plan(rp, ci, v, shape)
    for bucket in plan.buckets:
        rb = bucket.row_block
        # sorted by row block, flush set exactly at last block of each rb
        assert np.all(np.diff(rb) >= 0)
        expect_flush = np.concatenate([(rb[1:] != rb[:-1]), [True]])
        assert np.array_equal(bucket.flush.astype(bool), expect_flush)


def test_fill_efficiency_banded_high():
    csr = banded_csr(1000, bandwidth=5, seed=67)
    rp, ci, v, shape = csr.to_numpy()
    plan = build_tile_plan(rp, ci, v, shape)
    assert plan.fill_efficiency > 0.15
