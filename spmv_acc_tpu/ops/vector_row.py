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


def spmv_vector_row(alpha, beta, csr, x, y, plan):
    """Full strategy: ELL-ify (cached), XLA-gather x, Pallas row-tile reduce."""
    from ..dispatch import _get_ell

    ell = _get_ell(csr, plan.tune)
    dtype = ell.values.dtype
    if dtype == jnp.float64 and jax.default_backend() == "tpu":
        # Mosaic has no f64; use the XLA ELL path (same math, XLA-emulated f64).
        from .xla import spmv_ell

        return spmv_ell(alpha, beta, ell, x, y, csr.rows)
    xg = x.astype(dtype)[ell.col_idx]
    ax = ell_rowsum_pallas(ell.values, xg)[: csr.rows]
    return axpby_finish(alpha, beta, ax, y)
