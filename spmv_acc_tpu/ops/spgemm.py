"""SpGEMM: C = A @ B for CSR matrices — new scope per BASELINE.json.

Round-1 implementation: a numpy host path (Gustavson's algorithm, vectorised per-row
expansion) producing an exact CSR result, plus a device path for *structure-known*
repeated products: once C's sparsity pattern is computed on host, the numeric
multiply is a jittable gather/segment-sum — the usual two-phase (symbolic/numeric)
split that sparse libraries use, matching the analyze/execute economics of the
reference's csr-adaptive-plus (analyze once, run many).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.containers import CSR

__all__ = ["spgemm_host", "spgemm_symbolic", "spgemm_numeric", "spgemm"]


def spgemm_host(rp_a, ci_a, v_a, shape_a, rp_b, ci_b, v_b, shape_b):
    """Host Gustavson SpGEMM via COO expansion: for every a_ik, emit row i of B
    scaled by a_ik, then coalesce duplicates.  Returns (row_ptr, col_idx, values, shape)."""
    m, k = shape_a
    k2, n = shape_b
    assert k == k2, f"inner dims mismatch: {shape_a} @ {shape_b}"
    rp_a = np.asarray(rp_a).astype(np.int64)
    ci_a = np.asarray(ci_a).astype(np.int64)
    v_a = np.asarray(v_a)
    rp_b = np.asarray(rp_b).astype(np.int64)
    ci_b = np.asarray(ci_b).astype(np.int64)
    v_b = np.asarray(v_b)

    # expansion size: for each nnz (i,k) of A, len(B row k) products
    b_lens = np.diff(rp_b)
    exp_lens = b_lens[ci_a]  # per-A-nnz product count
    total = int(exp_lens.sum())
    if total == 0:
        return np.zeros(m + 1, np.int32), np.zeros(0, np.int32), np.zeros(0, v_a.dtype), (m, n)
    # out_row[i] for each product; offsets into B rows
    a_rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp_a))
    out_rows = np.repeat(a_rows, exp_lens)
    starts = rp_b[ci_a]  # start of B-row for each A nnz
    # index within each expansion group
    grp_off = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(exp_lens)[:-1])), exp_lens
    )
    b_pos = np.repeat(starts, exp_lens) + grp_off
    out_cols = ci_b[b_pos]
    out_vals = np.repeat(v_a, exp_lens) * v_b[b_pos]

    # coalesce (row, col) duplicates by sort + segment add
    key = out_rows * n + out_cols
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    vals_s = out_vals[order]
    uniq_mask = np.concatenate(([True], key_s[1:] != key_s[:-1]))
    group = np.cumsum(uniq_mask) - 1
    coalesced = np.bincount(group, weights=vals_s).astype(v_a.dtype, copy=False)
    ukey = key_s[uniq_mask]
    rows_c = (ukey // n).astype(np.int64)
    cols_c = (ukey % n).astype(np.int32)
    row_ptr = np.zeros(m + 1, dtype=np.int32)
    np.cumsum(np.bincount(rows_c, minlength=m), out=row_ptr[1:])
    return row_ptr, cols_c, coalesced, (m, n)


def spgemm_symbolic(a: CSR, b: CSR):
    """Symbolic phase: C's pattern + the product→output scatter map, all host-side.

    Returns (c_pattern: CSR-with-zero-values, a_pos, b_pos, out_pos) where the numeric
    phase computes ``c_values = segment_sum(a_values[a_pos] * b_values[b_pos], out_pos)``.
    """
    rp_a, ci_a, v_a, shape_a = a.to_numpy()
    rp_b, ci_b, v_b, shape_b = b.to_numpy()
    m, _ = shape_a
    _, n = shape_b
    rp_a64 = rp_a.astype(np.int64)
    rp_b64 = rp_b.astype(np.int64)
    b_lens = np.diff(rp_b64)
    exp_lens = b_lens[ci_a]
    total = int(exp_lens.sum())
    a_rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp_a64))
    a_pos = np.repeat(np.arange(len(ci_a), dtype=np.int64), exp_lens)
    grp_off = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(exp_lens)[:-1])), exp_lens
    )
    b_pos = np.repeat(rp_b64[ci_a], exp_lens) + grp_off
    out_rows = np.repeat(a_rows, exp_lens)
    out_cols = ci_b[b_pos].astype(np.int64)
    key = out_rows * n + out_cols
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq_mask = np.concatenate(([True], key_s[1:] != key_s[:-1])) if total else np.zeros(0, bool)
    group = (np.cumsum(uniq_mask) - 1) if total else np.zeros(0, np.int64)
    # permute the product map by the symbolic sort instead of inverting it:
    # out_pos is then SORTED, so the device numeric runs as a reduce-by-key
    # scan (indices_are_sorted=True) rather than a scatter-add — the scatter
    # half of the ~140ns/element XLA cost disappears; only the value gathers
    # remain (advisor/VERDICT r2 weak #6)
    a_pos = a_pos[order]
    b_pos = b_pos[order]
    out_pos = group
    ukey = key_s[uniq_mask]
    rows_c = (ukey // n).astype(np.int64)
    cols_c = (ukey % n).astype(np.int32)
    row_ptr = np.zeros(m + 1, dtype=np.int32)
    np.cumsum(np.bincount(rows_c, minlength=m), out=row_ptr[1:])
    c_nnz = len(ukey)
    pattern = CSR.from_numpy(row_ptr, cols_c, np.zeros(c_nnz, dtype=np.asarray(v_a).dtype), (m, n))
    return pattern, jnp.asarray(a_pos.astype(np.int32)), jnp.asarray(b_pos.astype(np.int32)), jnp.asarray(out_pos.astype(np.int32)), c_nnz


@functools.partial(jax.jit, static_argnames=("c_nnz",))
def spgemm_numeric(a_values, b_values, a_pos, b_pos, out_pos, c_nnz):
    """Numeric phase (device): products + sorted reduce-by-key onto C's
    pattern (the symbolic phase emits the product map pre-sorted by output
    position)."""
    prod = a_values[a_pos] * b_values[b_pos]
    return jax.ops.segment_sum(prod, out_pos, num_segments=c_nnz,
                               indices_are_sorted=True)


def spgemm(a: CSR, b: CSR) -> CSR:
    """C = A @ B.  Symbolic on host, numeric on device."""
    pattern, a_pos, b_pos, out_pos, c_nnz = spgemm_symbolic(a, b)
    c_values = spgemm_numeric(a.values, b.values, a_pos, b_pos, out_pos, c_nnz)
    return CSR(pattern.row_ptr, pattern.col_idx, c_values, pattern.shape)
