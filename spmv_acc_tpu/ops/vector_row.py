"""Pallas vector-row strategy: row-tile × padded-width reduction kernel.

TPU re-imagination of hip-vector-row (vector_row_native.hpp:13-58): on GPU one
lane-vector strides one row and shuffle-reduces; on TPU one *sublane* holds one row
of the padded ELL slab and the VPU reduces along lanes.  The x-gather happens in XLA
(``x[ell_cols]`` — Mosaic has no arbitrary-gather primitive; XLA:TPU's native gather
is the fastest path), and the Pallas kernel fuses multiply + width-reduction +
alpha/beta combine in one VMEM pass, avoiding a products round-trip through HBM.

Grid: one step per (row-tile, width-tile); width is the reduction dimension carried
in a VMEM accumulator across sequential grid steps (TPU grids execute in order — the
analog of the reference's cross-iteration LDS accumulation, without atomics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .xla import axpby_finish

__all__ = ["spmv_vector_row", "ell_rowsum_pallas"]

TILE_M = 256  # rows per grid step
TILE_W = 512  # width elements per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rowsum_kernel(vals_ref, xg_ref, out_ref, acc_ref):
    """One (TILE_M, TILE_W) tile: acc += sum_w vals*xg; flush on the last width step."""
    w = pl.program_id(1)
    nw = pl.num_programs(1)

    @pl.when(w == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    prod = vals_ref[:] * xg_ref[:]
    acc_ref[:] += jnp.sum(prod, axis=1, keepdims=True)

    @pl.when(w == nw - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ell_rowsum(ell_vals, xg, interpret=False):
    mp, width = ell_vals.shape
    grid = (pl.cdiv(mp, TILE_M), pl.cdiv(width, TILE_W))
    return pl.pallas_call(
        _rowsum_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, TILE_W), lambda i, w: (i, w)),
            pl.BlockSpec((TILE_M, TILE_W), lambda i, w: (i, w)),
        ],
        out_specs=pl.BlockSpec((TILE_M, 1), lambda i, w: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, 1), ell_vals.dtype),
        scratch_shapes=[pltpu.VMEM((TILE_M, 1), ell_vals.dtype)],
        interpret=interpret,
    )(ell_vals, xg)


def ell_rowsum_pallas(ell_vals, xg):
    """(m_pad, width) → (m_pad,) row sums of vals*xg via the Pallas kernel."""
    return _ell_rowsum(ell_vals, xg, interpret=_interpret())[:, 0]


def _split(a):
    """Dekker split of f32 into two 12-bit-mantissa halves."""
    c = jnp.float32(4097.0) * a
    hi = c - (c - a)
    return hi, a - hi


def _rowsum_kernel64(vh_ref, vl_ref, xh_ref, xl_ref, out_ref, acch_ref, acce_ref):
    """Compensated two-f32 row sum (the f64-on-TPU form — Mosaic has no f64
    ALU; same df64-lite scheme as the swell kernel, ops/swell.py): Dekker
    two_prod per product, Knuth-2Sum contiguous-half folds along lanes, and a
    2Sum (hi, err) accumulator across width tiles."""
    w = pl.program_id(1)
    nw = pl.num_programs(1)

    @pl.when(w == 0)
    def _():
        acch_ref[:] = jnp.zeros_like(acch_ref)
        acce_ref[:] = jnp.zeros_like(acce_ref)

    vh, vl = vh_ref[:], vl_ref[:]
    xh, xl = xh_ref[:], xl_ref[:]
    p = vh * xh
    ah, al = _split(vh)
    bh, bl = _split(xh)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    e = e + (vh * xl + (vl * xh + vl * xl))
    while p.shape[1] > 1:
        half = p.shape[1] // 2
        a, b = p[:, :half], p[:, half:]
        s = a + b
        bb = s - a
        err = (a - (s - bb)) + (b - bb)
        e = e[:, :half] + e[:, half:] + err
        p = s
    cur = acch_ref[:]
    s = cur + p
    bb = s - cur
    err = (cur - (s - bb)) + (p - bb)
    acch_ref[:] = s
    acce_ref[:] = acce_ref[:] + e + err

    @pl.when(w == nw - 1)
    def _():
        out_ref[:, 0:1] = acch_ref[:]
        out_ref[:, 1:2] = acce_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ell_rowsum64(vh, vl, xh, xl, interpret=False):
    mp, width = vh.shape
    grid = (pl.cdiv(mp, TILE_M), pl.cdiv(width, TILE_W))
    spec = pl.BlockSpec((TILE_M, TILE_W), lambda i, w: (i, w))
    hi_err = pl.pallas_call(
        _rowsum_kernel64,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=pl.BlockSpec((TILE_M, 2), lambda i, w: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_M, 1), jnp.float32),
                        pltpu.VMEM((TILE_M, 1), jnp.float32)],
        interpret=interpret,
    )(vh, vl, xh, xl)
    return hi_err[:, 0].astype(jnp.float64) + hi_err[:, 1].astype(jnp.float64)


def ell_rowsum_pallas_f64(ell_vals64, xg64, interpret=None):
    """(m_pad, width) f64 row sums via the compensated two-f32 kernel."""
    vh = ell_vals64.astype(jnp.float32)
    vl = (ell_vals64 - vh.astype(jnp.float64)).astype(jnp.float32)
    xh = xg64.astype(jnp.float32)
    xl = (xg64 - xh.astype(jnp.float64)).astype(jnp.float32)
    if interpret is None:
        interpret = _interpret()
    return _ell_rowsum64(vh, vl, xh, xl, interpret=interpret)


def spmv_vector_row(alpha, beta, csr, x, y, plan):
    """Full strategy: ELL-ify (cached), XLA-gather x, Pallas row-tile reduce.
    f64 on TPU runs the compensated two-f32 kernel (accuracy ~1e-13 rel, same
    scheme the flagship swell kernel validates on hardware) — the zoo member
    stays a real TPU kernel in the bench dtype instead of rerouting to XLA."""
    from ..dispatch import _get_ell

    ell = _get_ell(csr, plan.tune)
    dtype = ell.values.dtype
    if dtype == jnp.float64 and jax.default_backend() == "tpu":
        xg = x.astype(jnp.float64)[ell.col_idx]
        ax = ell_rowsum_pallas_f64(ell.values, xg)[: csr.rows]
        return axpby_finish(alpha, beta, ax, y)
    xg = x.astype(dtype)[ell.col_idx]
    ax = ell_rowsum_pallas(ell.values, xg)[: csr.rows]
    return axpby_finish(alpha, beta, ax, y)
