"""BSR micro-block swell path: detection, condensation, and end-to-end SpMV
correctness against the host golden (cli/verification.cpp:56-66 analog).

The BSR path condenses aligned r x r node blocks (FEM structure) to a node
pattern whose plan machinery amortizes r^2-fold; zero-filled cells must be
numerically invisible and partial/edge blocks handled exactly.
"""

import numpy as np
import pytest

from spmv_acc_tpu.formats.generate import (dense_row_outlier_csr, fem_like_csr,
                                           random_csr, random_x_y)
from spmv_acc_tpu.ops.bsr_block import bsr_condense, detect_block_size
from spmv_acc_tpu.ops.golden import host_spmv
from spmv_acc_tpu.ops.swell import get_swell_plan, spmv_swell


def _golden(rp, ci, v, x):
    m = len(rp) - 1
    out = np.zeros(m, dtype=np.float64)
    for row in range(m):
        lo, hi = rp[row], rp[row + 1]
        out[row] = np.dot(v[lo:hi].astype(np.float64), x[ci[lo:hi]].astype(np.float64))
    return out


@pytest.mark.parametrize("blk,expect", [(3, 3), (16, 4), (6, 3)])
def test_detect_block_size(blk, expect):
    # dense enough that node rows exceed the measured depth gate
    # (>= _MIN_NODEROW_BLOCKS blocks per node row — see bsr_block.py)
    csr = fem_like_csr(4000, 4000, 700000, block=blk, seed=3, dtype=np.float64)
    rp, ci, _, shape = csr.to_numpy()
    assert detect_block_size(rp, ci, shape) == expect


def test_detect_rejects_scattered():
    csr = random_csr(4000, 4000, 60000, seed=1)
    rp, ci, _, shape = csr.to_numpy()
    assert detect_block_size(rp, ci, shape) == 1


def test_detect_rejects_shallow_node_rows():
    """Block structure with SHORT node rows must stay scalar: measured on v5e,
    shallow-slab BSR plans lose to scalar (boneS10/Bump/Cube class)."""
    csr = fem_like_csr(4000, 4000, 120000, block=3, seed=3, dtype=np.float64)
    rp, ci, _, shape = csr.to_numpy()  # ~30 nnz/row -> ~10 blocks/node-row
    assert detect_block_size(rp, ci, shape) == 1


def test_condense_roundtrip():
    """bsr_condense must preserve every value at its (node, cell) address."""
    csr = fem_like_csr(1000, 1000, 30000, block=3, seed=5, dtype=np.float64)
    rp, ci, v, shape = csr.to_numpy()
    r = 3
    rpb, cib, v2 = bsr_condense(rp, ci, v, shape, r)
    assert v2.shape == (len(cib), r * r)
    # expand back and compare as dicts
    got = {}
    for b in range(len(rpb) - 1):
        for k in range(rpb[b], rpb[b + 1]):
            bc = cib[k]
            for i in range(r):
                for j in range(r):
                    val = v2[k, i * r + j]
                    if val != 0.0:
                        got[(b * r + i, bc * r + j)] = val
    want = {}
    for row in range(shape[0]):
        for p in range(rp[row], rp[row + 1]):
            if v[p] != 0.0:
                want[(row, ci[p])] = v[p]
    assert got == want


def test_condense_numpy_native_equivalence():
    import spmv_acc_tpu.io.native as nat

    csr = fem_like_csr(2000, 2000, 60000, block=4, seed=9, dtype=np.float64)
    rp, ci, v, shape = csr.to_numpy()
    res_nat = nat.bsr_condense_native(np.asarray(rp, np.int64), np.asarray(ci, np.int64),
                                      v, shape[0], 4, -(-shape[0] // 4))
    if res_nat is None:
        pytest.skip("native library unavailable")
    # numpy path
    import os
    rpb_np = None
    rows = np.repeat(np.arange(shape[0], dtype=np.int64), np.diff(rp))
    nbb = -(-shape[1] // 4)
    key = (rows // 4) * nbb + np.asarray(ci, np.int64) // 4
    uniq = np.unique(key)
    assert len(uniq) == len(res_nat[1])
    assert np.array_equal(res_nat[1], uniq % nbb)
    rpb, cib, v2 = bsr_condense(rp, ci, v, shape, 4)
    assert np.array_equal(rpb, res_nat[0])
    assert np.array_equal(cib, res_nat[1])
    assert np.array_equal(v2, res_nat[2])


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
@pytest.mark.parametrize("blk,m,nnz", [(3, 5000, 150000), (16, 2000, 300000),
                                       (4, 3001, 50000)])
@pytest.mark.slow
def test_bsr_spmv_golden(dtype, blk, m, nnz):
    """End-to-end spmv through the BSR plan vs host golden at the reference
    tolerance (rel 1e-7, cli/verification.cpp:43-54).  m=3001 exercises the
    partial trailing node block."""
    import jax.numpy as jnp

    import os

    csr = fem_like_csr(m, m, nnz, block=blk, seed=7, dtype=dtype)
    # force the block path: these small fixtures fail the measured depth gate
    # (short node rows), but the test's job is covering the r>1 kernels
    os.environ["SPMV_TPU_BSR"] = str(min(blk, 4))
    try:
        dp = get_swell_plan(csr, dtype)
    finally:
        del os.environ["SPMV_TPU_BSR"]
    assert dp.r > 1, "BSR path must engage when forced"
    rp, ci, v, _ = csr.to_numpy()
    x, y = random_x_y(m, m, seed=11, dtype=dtype)
    out = np.asarray(spmv_swell(1.0, 0.0, csr, jnp.asarray(x), jnp.asarray(y)))
    gold = _golden(rp, ci, v, x.astype(np.float64))
    tol = 1e-7 if dtype == np.float64 else 2e-3
    rel = np.abs(out - gold) / np.maximum(np.abs(gold), 1e-30)
    ok = (rel < tol) | (np.abs(out - gold) < (1e-14 if dtype == np.float64 else 1e-6))
    assert ok.all(), f"max rel {rel.max()}"


@pytest.mark.slow
def test_bsr_matches_scalar_path():
    """Forced scalar and BSR plans must agree to f64 golden accuracy."""
    import os

    import jax.numpy as jnp

    csr = fem_like_csr(3000, 3000, 90000, block=3, seed=13, dtype=np.float64)
    x, y = random_x_y(3000, 3000, seed=17)
    os.environ["SPMV_TPU_BSR"] = "3"  # fixture fails the depth gate; force the block path
    try:
        out_bsr = np.asarray(spmv_swell(1.0, 0.0, csr, jnp.asarray(x), jnp.asarray(y)))
    finally:
        del os.environ["SPMV_TPU_BSR"]
    os.environ["SPMV_TPU_NO_BSR"] = "1"
    try:
        from spmv_acc_tpu.ops import swell as _sw

        _sw._SWELL_CACHE.clear()
        out_s = np.asarray(spmv_swell(1.0, 0.0, csr, jnp.asarray(x), jnp.asarray(y)))
    finally:
        del os.environ["SPMV_TPU_NO_BSR"]
        _sw._SWELL_CACHE.clear()
    assert np.abs(out_bsr - out_s).max() < 1e-9 * max(1.0, np.abs(out_s).max())


def test_bsr_alpha_beta():
    import os

    import jax.numpy as jnp

    csr = fem_like_csr(2000, 2000, 60000, block=3, seed=19, dtype=np.float64)
    rp, ci, v, _ = csr.to_numpy()
    x, y = random_x_y(2000, 2000, seed=23)
    os.environ["SPMV_TPU_BSR"] = "3"  # fixture fails the depth gate; force the block path
    try:
        out = np.asarray(spmv_swell(2.5, -0.5, csr, jnp.asarray(x), jnp.asarray(y)))
    finally:
        del os.environ["SPMV_TPU_BSR"]
    gold = 2.5 * _golden(rp, ci, v, x) - 0.5 * y
    assert np.abs(out - gold).max() < 1e-7 * max(1.0, np.abs(gold).max())


def test_bsr_rectangular_and_outlier_fallback():
    """Non-block matrices (outlier rows) must stay scalar; rectangular block
    matrices must still verify."""
    import jax.numpy as jnp

    csr = dense_row_outlier_csr(2000, 2000, avg_nnz=4, seed=29)
    rp, ci, _, shape = csr.to_numpy()
    assert detect_block_size(rp, ci, shape) == 1
    csr2 = fem_like_csr(3000, 1500, 60000, block=3, seed=31, dtype=np.float64)
    rp, ci, v, _ = csr2.to_numpy()
    x, y = random_x_y(1500, 3000, seed=37)
    out = np.asarray(spmv_swell(1.0, 0.0, csr2, jnp.asarray(x), jnp.asarray(y)))
    gold = _golden(rp, ci, v, x)
    assert np.abs(out - gold).max() < 1e-7 * max(1.0, np.abs(gold).max())
