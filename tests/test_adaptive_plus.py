"""Tile lane-gather kernel (adaptive_plus): exact kernel math via interpret mode on
CPU, f32 and df64 variants, against the CPU golden."""

import jax.numpy as jnp
import numpy as np
import pytest

from spmv_acc_tpu import spmv
from spmv_acc_tpu.formats import banded_csr, dense_row_outlier_csr, powerlaw_csr, random_csr
from spmv_acc_tpu.formats.generate import random_x_y
from spmv_acc_tpu.ops.golden import host_spmv
from spmv_acc_tpu.utils.verify import verify_y

MATRICES = {
    "banded": lambda: banded_csr(200, bandwidth=5, seed=70),
    "random": lambda: random_csr(150, 260, 1700, seed=71),
    "powerlaw": lambda: powerlaw_csr(180, 180, avg_nnz=6, seed=72),
    "outlier": lambda: dense_row_outlier_csr(140, 140, avg_nnz=3, n_dense=2, seed=73),
    "window_dense": lambda: random_csr(64, 100, 3000, seed=74),  # deep buckets
}


@pytest.mark.parametrize("name", sorted(MATRICES))
@pytest.mark.slow
def test_adaptive_plus_f64_matches_golden(name):
    csr = MATRICES[name]()
    m, n = csr.shape
    x, y = random_x_y(n, m, seed=75)
    alpha, beta = 1.25, -0.5
    golden = host_spmv(alpha, beta, *csr.to_numpy()[:3], x, y)
    out = spmv(csr, jnp.asarray(x), jnp.asarray(y), alpha=alpha, beta=beta,
               strategy="adaptive_plus")
    rep = verify_y(np.asarray(out), golden)
    assert rep.ok, f"{name}: {rep}"


def test_adaptive_plus_f32():
    csr = random_csr(120, 120, 900, seed=76).astype(jnp.float32)
    m, n = csr.shape
    x, y = random_x_y(n, m, seed=77, dtype=np.float32)
    golden = host_spmv(1.0, 1.0, *csr.to_numpy()[:3], x, y)
    out = spmv(csr, jnp.asarray(x), jnp.asarray(y), alpha=1.0, beta=1.0,
               strategy="adaptive_plus")
    rep = verify_y(np.asarray(out), golden, dtype=np.float32)
    assert rep.ok, rep


def test_adaptive_plus_df64_accuracy_beats_f32():
    """The df64 kernel must deliver ~f64 accuracy (<<1e-7 rel), not f32 (~1e-6)."""
    csr = random_csr(100, 100, 2000, seed=78)
    m, n = csr.shape
    x, _ = random_x_y(n, m, seed=79)
    golden = host_spmv(1.0, 0.0, *csr.to_numpy()[:3], x, np.zeros(m))
    out = spmv(csr, jnp.asarray(x), strategy="adaptive_plus")
    rel = np.abs(np.asarray(out) - golden) / np.maximum(np.abs(golden), 1e-300)
    assert np.max(rel) < 1e-12, np.max(rel)
