"""ILU(0) factorization + level-scheduled sparse triangular solve — new scope per
BASELINE.json ("ILU-style factorization path"), the preconditioner companion to the
CG driver in :mod:`spmv_acc_tpu.models.cg`.

Design: factorization is a host-side scalar pass (inherently sequential data flow);
the triangular solves are device-side and *level-scheduled*: rows are grouped into
dependency levels on host (an analyze pass, same economics as the reference's
csr-adaptive-plus analyze), and each level is one data-parallel gather + segment-sum
update.  All shapes static per (matrix, level structure) — XLA-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.containers import CSR

__all__ = ["ilu0_host", "TriSolvePlan", "analyze_trisolve", "trisolve", "ilu0"]


def ilu0_host(row_ptr, col_idx, values, shape):
    """In-pattern incomplete LU (no fill-in).  Returns combined LU values on the same
    CSR pattern: strictly-lower entries hold L (unit diagonal implicit), diagonal and
    upper hold U.  Classic IKJ formulation."""
    rp = np.asarray(row_ptr).astype(np.int64)
    ci = np.asarray(col_idx).astype(np.int64)
    lu = np.array(values, dtype=np.float64, copy=True)
    m = shape[0]
    # position of each (i,j) for fast membership: dict per row
    diag_pos = np.full(m, -1, dtype=np.int64)
    col_map: List[dict] = [dict() for _ in range(m)]
    for i in range(m):
        for p in range(rp[i], rp[i + 1]):
            col_map[i][int(ci[p])] = p
            if ci[p] == i:
                diag_pos[i] = p
    if (diag_pos < 0).any():
        missing = int(np.flatnonzero(diag_pos < 0)[0])
        raise ValueError(f"ILU(0) requires a full diagonal; row {missing} has none")
    for i in range(m):
        row_cols = ci[rp[i] : rp[i + 1]]
        for p in range(rp[i], rp[i + 1]):
            k = int(ci[p])
            if k >= i:
                break
            dk = lu[diag_pos[k]]
            lik = lu[p] / dk
            lu[p] = lik
            # subtract lik * U(k, j) for j in row i's pattern, j > k
            krow = col_map[k]
            for q in range(p + 1, rp[i + 1]):
                j = int(ci[q])
                pos = krow.get(j)
                if pos is not None and j > k:
                    lu[q] -= lik * lu[pos]
    return lu


@dataclasses.dataclass(frozen=True)
class TriSolvePlan:
    """Level schedule for one triangular factor.

    ``level_rows[l]`` lists the rows solved in parallel at level l (padded to a
    static max with row == m sentinel), and the off-diagonal dependencies are carried
    as (row, col, val) triplets per level.
    """

    num_levels: int
    level_of_row: np.ndarray  # host
    rows_by_level: jax.Array  # (num_levels, max_rows_per_level) int32, padded with m
    # per-level dependency triplet ranges handled via masked segment ops
    dep_cols: jax.Array  # (nnz_off,) int32
    dep_vals: jax.Array  # (nnz_off,)
    dep_rows: jax.Array  # (nnz_off,) int32
    dep_level: jax.Array  # (nnz_off,) int32 — level of the owning row
    diag: jax.Array  # (m,) diagonal values (ones for unit-lower)
    lower: bool


def analyze_trisolve(row_ptr, col_idx, values, shape, lower: bool, unit_diag: bool) -> TriSolvePlan:
    """Compute dependency levels: level(i) = 1 + max(level(j)) over off-diag deps j."""
    rp = np.asarray(row_ptr).astype(np.int64)
    ci = np.asarray(col_idx).astype(np.int64)
    v = np.asarray(values)
    m = shape[0]
    level = np.zeros(m, dtype=np.int64)
    diag = np.ones(m, dtype=v.dtype)
    dep_r, dep_c, dep_v = [], [], []
    rows_iter = range(m) if lower else range(m - 1, -1, -1)
    for i in rows_iter:
        lvl = 0
        for p in range(rp[i], rp[i + 1]):
            j = int(ci[p])
            if j == i:
                if not unit_diag:
                    diag[i] = v[p]
                continue
            if (lower and j < i) or (not lower and j > i):
                lvl = max(lvl, level[j] + 1)
                dep_r.append(i)
                dep_c.append(j)
                dep_v.append(v[p])
        level[i] = lvl
    num_levels = int(level.max()) + 1 if m else 1
    by_level: List[List[int]] = [[] for _ in range(num_levels)]
    for i in range(m):
        by_level[level[i]].append(i)
    max_per = max((len(b) for b in by_level), default=1)
    rows_arr = np.full((num_levels, max_per), m, dtype=np.int32)
    for l, b in enumerate(by_level):
        rows_arr[l, : len(b)] = b
    dep_r = np.asarray(dep_r, dtype=np.int32) if dep_r else np.zeros(0, np.int32)
    dep_c = np.asarray(dep_c, dtype=np.int32) if dep_c else np.zeros(0, np.int32)
    dep_v = np.asarray(dep_v, dtype=v.dtype) if len(dep_v) else np.zeros(0, v.dtype)
    return TriSolvePlan(
        num_levels=num_levels,
        level_of_row=level,
        rows_by_level=jnp.asarray(rows_arr),
        dep_cols=jnp.asarray(dep_c),
        dep_vals=jnp.asarray(dep_v),
        dep_rows=jnp.asarray(dep_r),
        dep_level=jnp.asarray(level[dep_r].astype(np.int32)) if len(dep_r) else jnp.zeros(0, jnp.int32),
        diag=jnp.asarray(diag),
        lower=lower,
    )


def trisolve(plan: TriSolvePlan, b):
    """Solve T y = b given a level plan.  One fori_loop iteration per level; each
    level does a masked gather/segment-sum of its dependency products."""
    m = b.shape[0]
    dtype = b.dtype
    dep_rows = plan.dep_rows
    dep_cols = plan.dep_cols
    dep_vals = plan.dep_vals.astype(dtype)
    dep_level = plan.dep_level
    rows_by_level = plan.rows_by_level
    diag = plan.diag.astype(dtype)
    y0 = jnp.zeros(m + 1, dtype)  # slot m is the pad sink

    def body(l, y):
        # contribution of deps whose owning row is on this level
        mask = dep_level == l
        contrib = jnp.where(mask, dep_vals * y[dep_cols], jnp.zeros_like(dep_vals))
        sums = jax.ops.segment_sum(contrib, dep_rows, num_segments=m + 1)
        rows = rows_by_level[l]  # padded with m
        rhs = b if m == 0 else jnp.concatenate([b, jnp.zeros((1,), dtype)])
        val = (rhs[rows] - sums[rows]) / jnp.concatenate([diag, jnp.ones((1,), dtype)])[rows]
        return y.at[rows].set(val)

    y = jax.lax.fori_loop(0, plan.num_levels, body, y0)
    return y[:m]


@dataclasses.dataclass(frozen=True)
class ILU0:
    """Factorization handle: apply M^{-1} r via two triangular solves."""

    l_plan: TriSolvePlan
    u_plan: TriSolvePlan

    def solve(self, r):
        z = trisolve(self.l_plan, r)  # L z = r (unit lower)
        return trisolve(self.u_plan, z)  # U y = z


def ilu0(csr: CSR) -> ILU0:
    rp, ci, v, shape = csr.to_numpy()
    lu = ilu0_host(rp, ci, v, shape)
    l_plan = analyze_trisolve(rp, ci, lu, shape, lower=True, unit_diag=True)
    u_plan = analyze_trisolve(rp, ci, lu, shape, lower=False, unit_diag=False)
    return ILU0(l_plan, u_plan)
