"""Deterministic synthetic matrix generators.

The reference ships 10 SuiteSparse example matrices as git-lfs stubs (``examples/data/``,
``.gitattributes:1-10``) — the actual data is absent, so we regenerate matrices matching
each example's published shape/nnz (``examples/batch.sh:24-50``) plus distribution-shaped
generators for property tests (banded, uniform-random, power-law row lengths, dense-row
outliers — the shapes the adaptive picker discriminates, hip-adaptive/adaptive.cpp:16-67).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .containers import CSR
from .convert import coo_to_csr_arrays

__all__ = [
    "random_csr",
    "banded_csr",
    "powerlaw_csr",
    "dense_row_outlier_csr",
    "example_like",
    "EXAMPLE_SHAPES",
    "random_x_y",
]

# Shapes of the reference's example corpus (rows, cols, nnz) from examples/batch.sh:24-50.
EXAMPLE_SHAPES = {
    "af23560": (23560, 23560, 484256),
    "bayer10": (13436, 13436, 94926),
    "bcsstk18": (11948, 11948, 149090),
    "coater2": (9540, 9540, 207308),
    "dw4096": (8192, 8192, 41746),
    "epb1": (14734, 14734, 95053),
    "exdata_1": (6001, 6001, 2269500),
    "nemeth03": (9506, 9506, 202157),
    "poli_large": (15575, 15575, 33074),
    "rajat03": (7602, 7602, 32653),
}


def _finish(rows, cols, vals, shape) -> CSR:
    rp, ci, v = coo_to_csr_arrays(rows, cols, vals, shape)
    return CSR.from_numpy(rp, ci, v, shape)


def random_x_y(n: int, m: int, seed: int = 42, dtype=np.float64):
    """Uniform(-1, 1) vectors, mirroring cli/utils.hpp:46-56 rand_double."""
    rng = np.random.default_rng(seed)
    x = (rng.random(n) * 2.0 - 1.0).astype(dtype)
    y = (rng.random(m) * 2.0 - 1.0).astype(dtype)
    return x, y


def random_csr(m: int, n: int, nnz: int, seed: int = 0, dtype=np.float64) -> CSR:
    """Uniformly random positions (deduplicated), values in (-1, 1)."""
    rng = np.random.default_rng(seed)
    # oversample to survive dedup
    k = int(nnz * 1.3) + 16
    rows = rng.integers(0, m, k)
    cols = rng.integers(0, n, k)
    key = rows.astype(np.int64) * n + cols
    _, idx = np.unique(key, return_index=True)
    idx = np.sort(idx)[:nnz]
    rows, cols = rows[idx], cols[idx]
    vals = (rng.random(len(rows)) * 2.0 - 1.0).astype(dtype)
    return _finish(rows, cols, vals, (m, n))


def banded_csr(m: int, bandwidth: int = 5, seed: int = 0, dtype=np.float64) -> CSR:
    """Regular banded matrix — the 'nice' case (short uniform rows)."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for off in range(-(bandwidth // 2), bandwidth // 2 + 1):
        r = np.arange(max(0, -off), min(m, m - off))
        rows.append(r)
        cols.append(r + off)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = (rng.random(len(rows)) * 2.0 - 1.0).astype(dtype)
    return _finish(rows, cols, vals, (m, m))


def powerlaw_csr(m: int, n: int, avg_nnz: int = 8, alpha: float = 1.8, seed: int = 0, dtype=np.float64) -> CSR:
    """Power-law row lengths — the irregular case the flat/adaptive strategies target."""
    rng = np.random.default_rng(seed)
    lens = np.minimum((rng.pareto(alpha, m) + 1.0) * avg_nnz * (alpha - 1) / alpha, n).astype(np.int64)
    lens = np.maximum(lens, 0)
    rows = np.repeat(np.arange(m), lens)
    cols = rng.integers(0, n, len(rows))
    # dedup within rows
    key = rows * n + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[np.sort(idx)], cols[np.sort(idx)]
    vals = (rng.random(len(rows)) * 2.0 - 1.0).astype(dtype)
    return _finish(rows, cols, vals, (m, n))


def dense_row_outlier_csr(m: int, n: int, avg_nnz: int = 4, n_dense: int = 2, seed: int = 0, dtype=np.float64) -> CSR:
    """Mostly-short rows plus a few near-dense rows — the long-row splitting stress case
    (csr_adaptive_plus_analyze.cpp:41-63)."""
    base = random_csr(m, n, m * avg_nnz, seed=seed, dtype=dtype)
    rp, ci, v, shape = base.to_numpy()
    rng = np.random.default_rng(seed + 1)
    rows = np.repeat(np.arange(m), np.diff(rp)).astype(np.int64)
    cols = ci.astype(np.int64)
    vals = v
    for r in rng.choice(m, size=n_dense, replace=False):
        c = np.arange(0, n, 2, dtype=np.int64)
        rows = np.concatenate([rows, np.full(len(c), r, dtype=np.int64)])
        cols = np.concatenate([cols, c])
        vals = np.concatenate([vals, (rng.random(len(c)) * 2 - 1).astype(dtype)])
    return _finish(rows, cols, vals, shape)


def example_like(name: str, seed: int = 7, dtype=np.float64) -> CSR:
    """A deterministic matrix with the same (rows, cols, nnz) as a reference example.

    The lfs stubs mean the true data is unavailable; this regenerates a matrix of
    identical published dimensions (examples/batch.sh:24-50).  Structure mimics the
    real matrices' character: SuiteSparse matrices (circuit/FEM/structural problems,
    e.g. rajat03, bcsstk18) are overwhelmingly *locality-friendly* — entries cluster
    near the diagonal with a heavy-tailed spread — so the stand-in draws column
    offsets from a Laplace-like distribution (scale ~1% of n) plus a small
    uniform-random tail, rather than uniformly at random.
    """
    m, n, nnz = EXAMPLE_SHAPES[name]
    rng = np.random.default_rng(seed)
    # diagonal band guarantees a full diagonal neighborhood
    band_nnz = min(nnz, 3 * m)
    rows_b = np.repeat(np.arange(m), 3)[:band_nnz]
    offs = np.tile(np.array([-1, 0, 1]), m)[:band_nnz]
    cols_b = np.clip(rows_b + offs, 0, n - 1)
    rest = nnz - band_nnz
    k = int(rest * 2.5) + 64
    rows_r = rng.integers(0, m, k)
    # ~95% near-diagonal (Laplace, scale 1% of n), 5% global scatter
    scale = max(n // 100, 4)
    lap = rng.laplace(0.0, scale, k).astype(np.int64)
    cols_near = np.clip(rows_r * n // max(m, 1) + lap, 0, n - 1)
    cols_far = rng.integers(0, n, k)
    far = rng.random(k) < 0.05
    cols_r = np.where(far, cols_far, cols_near)
    rows = np.concatenate([rows_b, rows_r]).astype(np.int64)
    cols = np.concatenate([cols_b, cols_r]).astype(np.int64)
    key = rows * n + cols
    _, idx = np.unique(key, return_index=True)
    idx = np.sort(idx)
    while len(idx) < nnz:  # clustering raises collision rate; top up uniformly
        extra_r = rng.integers(0, m, nnz)
        extra_c = rng.integers(0, n, nnz)
        rows = np.concatenate([rows[idx], extra_r])
        cols = np.concatenate([cols[idx], extra_c])
        key = rows * n + cols
        _, idx = np.unique(key, return_index=True)
        idx = np.sort(idx)
    idx = idx[:nnz]
    rows, cols = rows[idx], cols[idx]
    vals = (rng.random(len(rows)) * 2.0 - 1.0).astype(dtype)
    return _finish(rows, cols, vals, (m, n))
