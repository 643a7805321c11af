"""ILU(0) factorization + sparse triangular solves — new scope per BASELINE.json
("ILU-style factorization path"), the preconditioner companion to the CG driver in
:mod:`spmv_acc_tpu.models.cg`.

Design (TPU-first):

* **Factorization** is a host-side pass (inherently sequential data flow); the hot
  loop is native C++ (`native/spmv_native.cpp: ilu0_factor`, a sorted two-pointer
  row merge — the reference keeps its analyze passes host-side in C++ too,
  csr_adaptive_plus_analyze.cpp:12-98).  ~1M-row/10M-nnz factors build in seconds.
* **Level analysis** (dependency level per row) is one sequential O(nnz) native
  pass (`trisolve_levels`); dep extraction and the execution schedule are
  vectorized numpy.
* **Exact solve** is *chunk-scheduled*: deps and rows are sorted by level on host,
  and the device runs a `fori_loop` whose every iteration consumes at most W
  dependency triplets (scatter-add into partial sums) and finalizes at most R rows
  — O(W + R) work per iteration with static shapes, instead of masking all nnz on
  every level (the round-1 implementation's O(levels x nnz) hazard).
* **Sweep solve**: factors with long dependency chains (banded structure gives
  level ~ row index) make ANY level schedule sequential; there the preconditioner
  uses S Jacobi sweeps of the triangular system — y_{t+1} = (b - N y_t) / D, each
  sweep one data-parallel gather + segment-sum.  Rows at level < t are exact after
  t sweeps, so `num_levels` sweeps reproduce the exact solve; a handful of sweeps
  is the standard approximate-triangular-solve preconditioner on wide-SIMD
  hardware and is what `ilu0()` picks automatically when chains are long.

All shapes static per (matrix, level structure) — XLA-friendly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.containers import CSR

__all__ = ["ilu0_host", "TriSolvePlan", "analyze_trisolve", "trisolve",
           "trisolve_sweeps", "ilu0"]

# chunk sizes of the exact schedule (deps / rows per fori_loop iteration)
_W = 4096
_R = 4096
# exact scheduling is worthwhile only when levels are few; beyond this the
# schedule degenerates toward one iteration per level and sweeps win
_EXACT_MAX_LEVELS = 4096


def ilu0_host(row_ptr, col_idx, values, shape):
    """In-pattern incomplete LU (no fill-in).  Returns combined LU values on the
    same CSR pattern: strictly-lower entries hold L (unit diagonal implicit),
    diagonal and upper hold U.  Native C++ fast path; pure-Python IKJ fallback."""
    rp = np.asarray(row_ptr).astype(np.int64)
    ci = np.asarray(col_idx).astype(np.int64)
    m = shape[0]
    from ..io.native import ilu0_factor_native

    lu = ilu0_factor_native(rp, ci, values, m)
    if lu is not None:
        return lu
    lu = np.array(values, dtype=np.float64, copy=True)
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
        for p in range(rp[i], rp[i + 1]):
            k = int(ci[p])
            if k >= i:
                break
            dk = lu[diag_pos[k]]
            lik = lu[p] / dk
            lu[p] = lik
            krow = col_map[k]
            for q in range(p + 1, rp[i + 1]):
                j = int(ci[q])
                pos = krow.get(j)
                if pos is not None and j > k:
                    lu[q] -= lik * lu[pos]
    return lu


def _levels(rp, ci, m, lower):
    """Dependency level per row (native O(nnz) pass; numpy fallback loop)."""
    from ..io.native import trisolve_levels_native

    res = trisolve_levels_native(rp, ci, m, lower)
    if res is not None:
        return res
    level = np.zeros(m, dtype=np.int32)
    rows_iter = range(m) if lower else range(m - 1, -1, -1)
    for i in rows_iter:
        lvl = 0
        for p in range(rp[i], rp[i + 1]):
            j = int(ci[p])
            if (lower and j < i) or (not lower and j > i):
                lvl = max(lvl, level[j] + 1)
        level[i] = lvl
    return level, int(level.max()) + 1 if m else 1


@dataclasses.dataclass(frozen=True)
class TriSolvePlan:
    """Chunked level schedule for one triangular factor.

    Deps (off-diagonal triplets) and rows are host-sorted by dependency level;
    the device schedule arrays give, per `fori_loop` iteration, the window of at
    most W deps to scatter-add and at most R rows to finalize.  Within one
    iteration deps land in the partial sums BEFORE rows read them, so the last
    dep chunk of a level may share an iteration with its first row chunk."""

    m: int
    lower: bool
    num_levels: int
    level_of_row: np.ndarray  # host (m,)
    # deps sorted by level, padded by W (pad rows point at the sink slot m)
    dep_rows: jax.Array
    dep_cols: jax.Array
    dep_vals: jax.Array
    diag: jax.Array  # (m,) diagonal values (ones for unit-lower)
    # exact schedule (None when num_levels > _EXACT_MAX_LEVELS: sweeps only)
    num_iters: int
    rows_sorted: Optional[jax.Array]  # rows by level, padded by R with m
    dep_off: Optional[jax.Array]  # (num_iters,) int32
    dep_cnt: Optional[jax.Array]
    row_off: Optional[jax.Array]
    row_cnt: Optional[jax.Array]


def analyze_trisolve(row_ptr, col_idx, values, shape, lower: bool,
                     unit_diag: bool) -> TriSolvePlan:
    """Level analysis + chunk schedule (vectorized numpy on top of the native
    level pass)."""
    rp = np.asarray(row_ptr).astype(np.int64)
    ci = np.asarray(col_idx).astype(np.int64)
    v = np.asarray(values)
    m = shape[0]
    rows_of = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
    off_mask = (ci < rows_of) if lower else (ci > rows_of)
    dep_r = rows_of[off_mask].astype(np.int32)
    dep_c = ci[off_mask].astype(np.int32)
    dep_v = v[off_mask]
    diag = np.ones(m, dtype=v.dtype)
    if not unit_diag:
        dmask = ci == rows_of
        diag[rows_of[dmask]] = v[dmask]
    level, num_levels = _levels(rp, ci, m, lower)

    # sort by level (stable keeps within-level row order)
    order_d = np.argsort(level[dep_r], kind="stable")
    dep_r, dep_c, dep_v = dep_r[order_d], dep_c[order_d], dep_v[order_d]
    dep_lvl_sorted = level[dep_r]

    # pad deps by W: pad rows scatter into the sink slot m with zero values
    def _pad(a, n, fill):
        return np.concatenate([a, np.full(n, fill, dtype=a.dtype)])

    dep_rows_p = jnp.asarray(_pad(dep_r, _W, m))
    dep_cols_p = jnp.asarray(_pad(dep_c, _W, 0))
    dep_vals_p = jnp.asarray(_pad(dep_v, _W, 0))

    if num_levels > _EXACT_MAX_LEVELS:
        # chain-structured factor: the exact schedule would run >= num_levels
        # sequential iterations — sweeps are the only sane device form
        return TriSolvePlan(
            m=m, lower=lower, num_levels=num_levels, level_of_row=level,
            dep_rows=dep_rows_p, dep_cols=dep_cols_p, dep_vals=dep_vals_p,
            diag=jnp.asarray(diag), num_iters=0, rows_sorted=None,
            dep_off=None, dep_cnt=None, row_off=None, row_cnt=None,
        )

    order_r = np.argsort(level, kind="stable").astype(np.int32)
    dl = np.bincount(dep_lvl_sorted, minlength=num_levels).astype(np.int64)
    rl = np.bincount(level, minlength=num_levels).astype(np.int64)
    dstart = np.concatenate([[0], np.cumsum(dl)])
    rstart = np.concatenate([[0], np.cumsum(rl)])

    d_off, d_cnt, r_off, r_cnt = [], [], [], []
    for lvl in range(num_levels):
        nd = int(-(-dl[lvl] // _W))  # dep chunks
        nr = int(-(-rl[lvl] // _R))  # row chunks (>= 1: every level owns rows)
        # rows may start on the iteration of the LAST dep chunk (deps are
        # scattered before rows finalize within one body)
        rows_at = max(nd - 1, 0)
        n_l = max(nd, rows_at + nr)
        for t in range(n_l):
            if t < nd:
                d_off.append(dstart[lvl] + t * _W)
                d_cnt.append(int(min(_W, dl[lvl] - t * _W)))
            else:
                d_off.append(0)
                d_cnt.append(0)
            rt = t - rows_at
            if 0 <= rt < nr:
                r_off.append(rstart[lvl] + rt * _R)
                r_cnt.append(int(min(_R, rl[lvl] - rt * _R)))
            else:
                r_off.append(0)
                r_cnt.append(0)

    return TriSolvePlan(
        m=m, lower=lower, num_levels=num_levels, level_of_row=level,
        dep_rows=dep_rows_p, dep_cols=dep_cols_p, dep_vals=dep_vals_p,
        diag=jnp.asarray(diag),
        num_iters=len(d_off),
        rows_sorted=jnp.asarray(_pad(order_r, _R, m)),
        dep_off=jnp.asarray(np.asarray(d_off, dtype=np.int32)),
        dep_cnt=jnp.asarray(np.asarray(d_cnt, dtype=np.int32)),
        row_off=jnp.asarray(np.asarray(r_off, dtype=np.int32)),
        row_cnt=jnp.asarray(np.asarray(r_cnt, dtype=np.int32)),
    )


def trisolve(plan: TriSolvePlan, b):
    """Solve T y = b exactly.  Chunk-scheduled `fori_loop` (O(W + R) per
    iteration); factors without an exact schedule (num_levels > threshold) run
    `num_levels` Jacobi sweeps, which is also exact (rows at level < t are exact
    after t sweeps)."""
    if plan.rows_sorted is None:
        return trisolve_sweeps(plan, b, plan.num_levels)
    m = plan.m
    dtype = b.dtype
    dep_vals = plan.dep_vals.astype(dtype)
    diag_p = jnp.concatenate([plan.diag.astype(dtype), jnp.ones((1,), dtype)])
    b_p = jnp.concatenate([b, jnp.zeros((1,), dtype)])
    iw = jnp.arange(_W)
    ir = jnp.arange(_R)

    def body(t, carry):
        y, sums = carry
        doff, dcnt = plan.dep_off[t], plan.dep_cnt[t]
        rw = jax.lax.dynamic_slice(plan.dep_rows, (doff,), (_W,))
        cw = jax.lax.dynamic_slice(plan.dep_cols, (doff,), (_W,))
        vw = jax.lax.dynamic_slice(dep_vals, (doff,), (_W,))
        valid = iw < dcnt
        rw = jnp.where(valid, rw, m)
        contrib = jnp.where(valid, vw * y[cw], jnp.zeros_like(vw))
        sums = sums.at[rw].add(contrib)
        roff, rcnt = plan.row_off[t], plan.row_cnt[t]
        rows_w = jax.lax.dynamic_slice(plan.rows_sorted, (roff,), (_R,))
        rvalid = ir < rcnt
        rows_w = jnp.where(rvalid, rows_w, m)
        val = (b_p[rows_w] - sums[rows_w]) / diag_p[rows_w]
        y = y.at[rows_w].set(jnp.where(rvalid, val, jnp.zeros_like(val)))
        return y, sums

    y0 = jnp.zeros(m + 1, dtype)  # slot m is the pad sink
    s0 = jnp.zeros(m + 1, dtype)
    y, _ = jax.lax.fori_loop(0, plan.num_iters, body, (y0, s0))
    return y[:m]


def trisolve_sweeps(plan: TriSolvePlan, b, sweeps: int):
    """Approximate triangular solve: `sweeps` Jacobi iterations
    y <- (b - N y) / D, each one data-parallel gather + segment-sum.  Rows at
    dependency level < t are exact after t sweeps, so sweeps >= num_levels is
    the exact solve; small fixed counts are the TPU-shaped preconditioner for
    chain-structured factors."""
    m = plan.m
    dtype = b.dtype
    n_dep = plan.dep_rows.shape[0] - _W
    dep_rows = plan.dep_rows[:n_dep]
    dep_cols = plan.dep_cols[:n_dep]
    dep_vals = plan.dep_vals[:n_dep].astype(dtype)
    diag = plan.diag.astype(dtype)
    y0 = b / diag

    def body(_, y):
        sums = jax.ops.segment_sum(dep_vals * y[dep_cols], dep_rows,
                                   num_segments=m)
        return (b - sums) / diag

    return jax.lax.fori_loop(0, sweeps, body, y0)


@dataclasses.dataclass(frozen=True)
class SweepSwell:
    """Swell-kernel backing for the Jacobi-sweep solves: each sweep's
    ``N @ y`` rides the flagship SpMV kernel instead of XLA gather+segment_sum
    (measured ~30-140 ns/element on TPU — at bench scale that makes one sweep
    cost ~1000x the swell SpMV it preconditions).  Built by :func:`ilu0` for
    factors above ``SPMV_TPU_ILU_SWELL_MIN`` off-diagonal nnz."""

    statics_l: tuple
    statics_u: tuple
    bargs_l: tuple
    tail_l: tuple
    bargs_u: tuple
    tail_u: tuple
    inv_diag: jax.Array  # (m,) 1/diag(U)

    def args(self):
        """Device-array pytree — pass through jit as ARGUMENTS (closing over
        it embeds hundreds of MB of slabs in the HLO; see models/cg.py)."""
        return (self.bargs_l, self.tail_l, self.bargs_u, self.tail_u,
                self.inv_diag)


def sweep_apply_swell(statics_l, statics_u, sweeps, m, args, r):
    """M^{-1} r via ``sweeps`` Jacobi sweeps per factor, N@y on the swell
    kernels.  Matches :func:`trisolve_sweeps` semantics: y0 = b/D,
    y <- (b - N y)/D."""
    from .swell import swell_ax

    bargs_l, tail_l, bargs_u, tail_u, inv_diag = args
    dtype = r.dtype
    inv = inv_diag.astype(dtype)

    def nl(v):
        return swell_ax(bargs_l, tail_l, v, statics_l)[:m].astype(dtype)

    def nu(v):
        return swell_ax(bargs_u, tail_u, v, statics_u)[:m].astype(dtype)

    z = jax.lax.fori_loop(0, sweeps, lambda _, y: r - nl(y), r)
    u0 = z * inv
    return jax.lax.fori_loop(0, sweeps, lambda _, y: (z - nu(y)) * inv, u0)


@dataclasses.dataclass(frozen=True)
class ILU0:
    """Factorization handle: apply M^{-1} r via two triangular solves.

    ``sweeps`` > 0 makes both solves approximate Jacobi-sweep applications (the
    right shape for long dependency chains); 0 means exact chunk-scheduled
    solves.  ``swell`` (set by :func:`ilu0` on large factors) makes each sweep
    ride the flagship swell kernel."""

    l_plan: TriSolvePlan
    u_plan: TriSolvePlan
    sweeps: int = 0
    swell: Optional[SweepSwell] = None

    def solve(self, r):
        if self.swell is not None and self.sweeps > 0:
            return sweep_apply_swell(self.swell.statics_l, self.swell.statics_u,
                                     self.sweeps, self.l_plan.m,
                                     self.swell.args(), r)
        if self.sweeps > 0:
            z = trisolve_sweeps(self.l_plan, r, self.sweeps)
            return trisolve_sweeps(self.u_plan, z, self.sweeps)
        z = trisolve(self.l_plan, r)  # L z = r (unit lower)
        return trisolve(self.u_plan, z)  # U y = z


def _strict_part_csr(rp, ci, lu, shape, lower: bool) -> CSR:
    """CSR container of the strict triangular part of the combined LU values."""
    m = shape[0]
    rows_of = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
    mask = (ci < rows_of) if lower else (ci > rows_of)
    counts = np.zeros(m, dtype=np.int64)
    np.add.at(counts, rows_of[mask], 1)
    nrp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return CSR(jnp.asarray(nrp), jnp.asarray(ci[mask].astype(np.int32)),
               jnp.asarray(lu[mask]), (m, shape[1]))


def ilu0(csr: CSR, sweeps: Optional[int] = None) -> ILU0:
    """Factor A ≈ L U in-pattern and return the preconditioner handle.

    ``sweeps=None`` auto-picks: exact solves when both factors have few levels
    (wide level parallelism), else ``SPMV_TPU_ILU_SWEEPS`` (default 6) Jacobi
    sweeps per solve — the standard approximate-triangular-solve preconditioner
    for chain-structured factors on wide-SIMD hardware.

    Sweep solves on factors with >= ``SPMV_TPU_ILU_SWELL_MIN`` (default 100k)
    off-diagonal nnz get a :class:`SweepSwell` backing: each sweep's N@y runs
    on the flagship swell kernels instead of XLA gather/segment_sum (the
    gather path costs ~30-140 ns/element on TPU — measured 2026-08-20 on the
    512^2 aniso system: 130k-nnz factors paid ~6.5ms/apply on the gather path
    vs ~0.2ms on swell, so the old 2M default left every mid-size solve on
    the slow path for the sake of ~1-2s of plan build)."""
    rp, ci, v, shape = csr.to_numpy()
    rp = np.asarray(rp)
    ci = np.asarray(ci)
    lu = ilu0_host(rp, ci, v, shape)
    l_plan = analyze_trisolve(rp, ci, lu, shape, lower=True, unit_diag=True)
    u_plan = analyze_trisolve(rp, ci, lu, shape, lower=False, unit_diag=False)
    if sweeps is None:
        exact_ok = (l_plan.rows_sorted is not None
                    and u_plan.rows_sorted is not None
                    and max(l_plan.num_iters, u_plan.num_iters) <= 512)
        sweeps = 0 if exact_ok else int(os.environ.get("SPMV_TPU_ILU_SWEEPS", "6"))
    swell = None
    n_off = int(l_plan.dep_rows.shape[0] - _W) + int(u_plan.dep_rows.shape[0] - _W)
    swell_min = int(os.environ.get("SPMV_TPU_ILU_SWELL_MIN", str(100_000)))
    if sweeps > 0 and n_off >= swell_min:
        from .swell import _bucket_args, _interpret, _statics, get_swell_plan

        interp = _interpret()
        csr_l = _strict_part_csr(rp, ci, lu, shape, lower=True)
        csr_u = _strict_part_csr(rp, ci, lu, shape, lower=False)
        # the two factor plans are independent: build/load them CONCURRENTLY
        # (measured on TPU: each costs ~11s — disk load + numpy bucket prep +
        # tunnel transfers, largely GIL-releasing — so the overlap roughly
        # halves the dominant term of ilu0's 21s setup; VERDICT r4 #5)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as ex:
            fl = ex.submit(get_swell_plan, csr_l, lu.dtype)
            fu = ex.submit(get_swell_plan, csr_u, lu.dtype)
            dp_l = fl.result()
            dp_u = fu.result()
        swell = SweepSwell(
            statics_l=_statics(dp_l, interp), statics_u=_statics(dp_u, interp),
            bargs_l=_bucket_args(dp_l, interp), tail_l=dp_l.tail,
            bargs_u=_bucket_args(dp_u, interp), tail_u=dp_u.tail,
            inv_diag=jnp.asarray(1.0 / np.asarray(u_plan.diag)),
        )
    return ILU0(l_plan, u_plan, sweeps=sweeps, swell=swell)
