import numpy as np
import pytest

from spmv_acc_tpu.formats import (
    CSR,
    banded_csr,
    coo_to_csr_arrays,
    csr_to_bsr,
    csr_to_coo,
    csr_to_dense,
    csr_to_ell_arrays,
    csr_transpose_arrays,
    dense_row_outlier_csr,
    example_like,
    powerlaw_csr,
    random_csr,
)


def test_coo_to_csr_roundtrip():
    rows = np.array([2, 0, 1, 2, 0])
    cols = np.array([1, 0, 2, 0, 2])
    vals = np.array([5.0, 1.0, 3.0, 4.0, 2.0])
    rp, ci, v = coo_to_csr_arrays(rows, cols, vals, (3, 3))
    assert rp.tolist() == [0, 2, 3, 5]
    assert ci.tolist() == [0, 2, 2, 0, 1]
    assert v.tolist() == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_coo_duplicates_summed():
    rows = np.array([0, 0, 0])
    cols = np.array([1, 1, 2])
    vals = np.array([1.0, 2.0, 7.0])
    rp, ci, v = coo_to_csr_arrays(rows, cols, vals, (2, 3))
    assert rp.tolist() == [0, 2, 2]
    assert ci.tolist() == [1, 2]
    assert v.tolist() == [3.0, 7.0]


def test_generators_shapes():
    csr = random_csr(100, 80, 500, seed=3)
    assert csr.shape == (100, 80)
    assert csr.nnz <= 500 and csr.nnz > 400
    b = banded_csr(64, bandwidth=5)
    assert b.shape == (64, 64)
    p = powerlaw_csr(200, 200, avg_nnz=6, seed=1)
    assert p.nnz > 0
    d = dense_row_outlier_csr(100, 100, avg_nnz=4, n_dense=2)
    lens = np.diff(np.asarray(d.row_ptr))
    assert lens.max() >= 40  # has a long row


def test_example_like_dimensions():
    csr = example_like("rajat03")
    assert csr.shape == (7602, 7602)
    assert csr.nnz == 32653


def test_csr_transpose_involution():
    csr = random_csr(50, 70, 300, seed=5)
    rp, ci, v, shape = csr.to_numpy()
    trp, tci, tv = csr_transpose_arrays(rp, ci, v, shape)
    rrp, rci, rv = csr_transpose_arrays(trp, tci, tv, (shape[1], shape[0]))
    assert np.array_equal(rp, rrp)
    assert np.array_equal(ci, rci)
    assert np.allclose(v, rv)


def test_ell_padding_roundtrip():
    csr = powerlaw_csr(64, 64, avg_nnz=4, seed=2)
    rp, ci, v, shape = csr.to_numpy()
    ec, ev, width, mp = csr_to_ell_arrays(rp, ci, v, shape)
    assert mp % 8 == 0 and width % 8 == 0
    dense = csr_to_dense(rp, ci, v, shape)
    rebuilt = np.zeros_like(dense)
    for i in range(shape[0]):
        np.add.at(rebuilt[i], ec[i], ev[i])
    assert np.allclose(rebuilt, dense)


def test_bsr_matches_dense():
    csr = random_csr(32, 48, 200, seed=9)
    bsr = csr_to_bsr(csr, blocksize=(8, 16))
    rp, ci, v, shape = csr.to_numpy()
    dense = csr_to_dense(rp, ci, v, shape)
    dense_pad = np.zeros(bsr.shape)
    dense_pad[: shape[0], : shape[1]] = dense
    # reconstruct from blocks
    rebuilt = np.zeros(bsr.shape)
    brp = np.asarray(bsr.row_ptr)
    bci = np.asarray(bsr.col_idx)
    bv = np.asarray(bsr.values)
    bh, bw = bsr.blocksize
    for br in range(len(brp) - 1):
        for p in range(brp[br], brp[br + 1]):
            bc = bci[p]
            rebuilt[br * bh : (br + 1) * bh, bc * bw : (bc + 1) * bw] = bv[p]
    assert np.allclose(rebuilt, dense_pad)


def test_csr_pytree_flatten():
    import jax

    csr = random_csr(10, 10, 30)
    leaves, treedef = jax.tree_util.tree_flatten(csr)
    assert len(leaves) == 3
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.shape == csr.shape
