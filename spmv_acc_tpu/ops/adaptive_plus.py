"""`adaptive_plus` strategy: tiled lane-gather Pallas SpMV — the flagship kernel.

Lineage: the reference's csr-adaptive-plus (hip-csr-adaptive-plus/) splits the matrix
into blocks of bounded nnz via a host analyze pass, then one GPU block processes each
(csr_adaptive_plus_spmv_imp.inl:121-206).  The TPU re-design keeps the analyze-pass
economics but maps the work to what the VPU does fast:

  * blocks are (128 rows × 128 columns) windows; **rows = lanes, nnz-slot = sublanes**
  * the x-gather is a lane-local permutation of the x window — the one gather Mosaic
    lowers natively (measured ~0.1 ns/elem vs 6.9 ns/elem for XLA's scalar gather)
  * row reduction = dense sublane sum; y writes are contiguous (1,128) tiles
  * cross-window accumulation uses the sequential TPU grid (blocks sorted by
    row-block; first flags from the plan) — no atomics, unlike the reference's
    atomicAdd fixups (flat_reduce.hpp:65-156)

v2 packing: window blocks are bucketed by padded sublane depth W ∈ {1..128} and
**P = 128/W blocks are packed per grid step** (all sharing one output y-tile), so the
fixed per-step cost (~300 ns) amortises over 128×128 slots regardless of depth.  The
x table lives fully VMEM-resident (one upload per call, no per-block DMA), which caps
supported columns at ``X_VMEM_LIMIT`` — larger matrices fall back to the XLA zoo
until the blocked-x variant lands.

Numerics: f32 native; float64 runs as double-float (two-f32 compensated arithmetic,
:mod:`.doubledouble`) since v5e has no f64 ALU and XLA's emulation is ~1000x slower.
Accuracy ~1e-14 relative — far inside the reference's 1e-7 gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .doubledouble import DF64, df64_add, fast_two_sum, two_prod
from .tile_plan import COL_WINDOW, LANES, TilePlan, build_tile_plan
from .xla import axpby_finish

__all__ = [
    "spmv_adaptive_plus",
    "tile_spmv_f32",
    "tile_spmv_df64",
    "get_tile_plan",
    "X_VMEM_LIMIT_F32",
    "X_VMEM_LIMIT_F64",
]

# Max columns with the x table(s) fully VMEM-resident (4 MB per table).
X_VMEM_LIMIT_F32 = 1 << 20
X_VMEM_LIMIT_F64 = 1 << 19

STEP_SUBLANES = 128  # P * W per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lane_gather(table, idx):
    """out[i, j] = table[i, idx[i, j]] — per-sublane lane permutation.

    Hand-built ``lax.gather`` equivalent of ``jnp.take_along_axis(table, idx, 1)``
    that keeps indices int32: under x64, take_along_axis promotes indices to int64,
    which Mosaic cannot lower.  Indices are guaranteed in [0, 128) by the plan.
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        table,
        idx[..., None].astype(jnp.int32),
        dnums,
        slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


# ------------------------------------------------------------------- kernels


def _make_f32_kernel(W: int, P: int):
    def kernel(cthi_r, ctlo_r, rbhis_r, rblo_r, first_r, vals_ref, idx_ref, x_ref, o_ref):
        s = pl.program_id(0)
        base = s * np.int32(P)
        for k in range(P):
            j = base + np.int32(k)
            xw = x_ref[pl.ds(cthi_r[j], 1), pl.ds(ctlo_r[j], 1), :]  # (1,1,128)
            table = jnp.broadcast_to(xw.reshape(1, LANES), (W, LANES))
            sl = slice(k * W, (k + 1) * W)
            g = _lane_gather(table, idx_ref[0, sl, :])
            part = jnp.sum(vals_ref[0, sl, :] * g, axis=0, keepdims=True)  # (1,128)
            rlo = rblo_r[j]
            first = first_r[j]

            @pl.when(first == 1)
            def _():
                o_ref[0, pl.ds(rlo, 1), :] = part

            @pl.when(first == 0)
            def _():
                o_ref[0, pl.ds(rlo, 1), :] = o_ref[0, pl.ds(rlo, 1), :] + part

    return kernel


def _make_df64_kernel(W: int, P: int):
    def kernel(
        cthi_r, ctlo_r, rbhis_r, rblo_r, first_r,
        vhi_ref, vlo_ref, idx_ref, xhi_ref, xlo_ref,
        ohi_ref, olo_ref,
    ):
        s = pl.program_id(0)
        base = s * np.int32(P)
        for k in range(P):
            j = base + np.int32(k)
            ch, cl = cthi_r[j], ctlo_r[j]
            thi = jnp.broadcast_to(
                xhi_ref[pl.ds(ch, 1), pl.ds(cl, 1), :].reshape(1, LANES), (W, LANES)
            )
            tlo = jnp.broadcast_to(
                xlo_ref[pl.ds(ch, 1), pl.ds(cl, 1), :].reshape(1, LANES), (W, LANES)
            )
            sl = slice(k * W, (k + 1) * W)
            idx = idx_ref[0, sl, :]
            ghi = _lane_gather(thi, idx)
            glo = _lane_gather(tlo, idx)
            vhi = vhi_ref[0, sl, :]
            vlo = vlo_ref[0, sl, :]
            # df64 product: exact two_prod on hi words + first-order cross terms
            p, e = two_prod(vhi, ghi)
            e = e + (vhi * glo + vlo * ghi)
            phi, plo = fast_two_sum(p, e)
            # pairwise compensated fold along sublanes: (W,128) -> (1,128)
            while phi.shape[0] > 1:
                half = phi.shape[0] // 2
                ss = df64_add(DF64(phi[:half], plo[:half]), DF64(phi[half:], plo[half:]))
                phi, plo = ss.hi, ss.lo
            rlo = rblo_r[j]
            first = first_r[j]

            @pl.when(first == 1)
            def _():
                ohi_ref[0, pl.ds(rlo, 1), :] = phi
                olo_ref[0, pl.ds(rlo, 1), :] = plo

            @pl.when(first == 0)
            def _():
                cur = DF64(ohi_ref[0, pl.ds(rlo, 1), :], olo_ref[0, pl.ds(rlo, 1), :])
                acc = df64_add(cur, DF64(phi, plo))
                ohi_ref[0, pl.ds(rlo, 1), :] = acc.hi
                olo_ref[0, pl.ds(rlo, 1), :] = acc.lo

    return kernel


# NB: index maps must stay int32 — python-int constants trace to i64 under x64,
# which Mosaic cannot legalize.
_Z = np.int32(0)


@functools.partial(jax.jit, static_argnames=("W", "P", "mrb8", "interpret"))
def _tile_call_f32(cthi, ctlo, rbhis, rblo, first, vals, idx, x3, W, P, mrb8, interpret):
    nsteps = vals.shape[0]
    sub = W * P
    spec3 = lambda s, *_: (s, _Z, _Z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, sub, LANES), spec3),
            pl.BlockSpec((1, sub, LANES), spec3),
            # x resident: full-array block with an explicit int32 index map (the
            # default map emits i64 zeros under x64, which Mosaic rejects)
            pl.BlockSpec(x3.shape, lambda s, *_: (_Z, _Z, _Z)),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, LANES), lambda s, cthi, ctlo, rbhis, *_: (rbhis[s], _Z, _Z)
        ),
    )
    return pl.pallas_call(
        _make_f32_kernel(W, P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mrb8, 8, LANES), jnp.float32),
        interpret=interpret,
    )(cthi, ctlo, rbhis, rblo, first, vals, idx, x3)


@functools.partial(jax.jit, static_argnames=("W", "P", "mrb8", "interpret"))
def _tile_call_df64(cthi, ctlo, rbhis, rblo, first, vhi, vlo, idx, xhi3, xlo3, W, P, mrb8, interpret):
    nsteps = vhi.shape[0]
    sub = W * P
    spec3 = lambda s, *_: (s, _Z, _Z)
    yspec = lambda s, cthi, ctlo, rbhis, *_: (rbhis[s], _Z, _Z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, sub, LANES), spec3),
            pl.BlockSpec((1, sub, LANES), spec3),
            pl.BlockSpec((1, sub, LANES), spec3),
            pl.BlockSpec(xhi3.shape, lambda s, *_: (_Z, _Z, _Z)),
            pl.BlockSpec(xlo3.shape, lambda s, *_: (_Z, _Z, _Z)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, LANES), yspec),
            pl.BlockSpec((1, 8, LANES), yspec),
        ],
    )
    return pl.pallas_call(
        _make_df64_kernel(W, P),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((mrb8, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((mrb8, 8, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(cthi, ctlo, rbhis, rblo, first, vhi, vlo, idx, xhi3, xlo3)


# ---------------------------------------------------------------- host glue


def _pack_bucket(bk, mrb8):
    """Pack a bucket's blocks into grid steps of P = 128/W blocks sharing one y-tile.

    Blocks arrive sorted by row_block.  Steps may not span an rbhi (= rb//8, the
    y-tile id) boundary, so each rbhi segment is padded to a multiple of P with
    dummy sub-blocks (zero values, first=0 → adds 0.0 to lane row 0 of the tile).
    """
    W = bk.depth
    # cap the unrolled sub-block loop at 16 (compile-size control); sublanes per
    # step = W*P stays >= 16, amortising the fixed per-step cost well enough.
    P = max(1, min(STEP_SUBLANES // W, 16))
    nb = bk.num_blocks
    rbhi = bk.row_block // 8
    # segment boundaries where rbhi changes
    seg_start = np.concatenate([[0], np.flatnonzero(np.diff(rbhi)) + 1])
    seg_len = np.diff(np.concatenate([seg_start, [nb]]))
    steps_per_seg = -(-seg_len // P)
    seg_step_off = np.concatenate([[0], np.cumsum(steps_per_seg)[:-1]])
    nsteps = int(steps_per_seg.sum())
    seg_id = np.repeat(np.arange(len(seg_start)), seg_len)
    pos_in_seg = np.arange(nb) - seg_start[seg_id]
    step_of_block = seg_step_off[seg_id] + pos_in_seg // P
    slot = pos_in_seg % P

    vals = bk.values.reshape(nb, W, LANES)
    idx = bk.local_idx.reshape(nb, W, LANES)
    vals_p = np.zeros((nsteps, P * W, LANES), dtype=vals.dtype)
    idx_p = np.zeros((nsteps, P * W, LANES), dtype=np.int32)
    sub_rows = (slot * W)[:, None] + np.arange(W)[None, :]  # (nb, W)
    vals_p[step_of_block[:, None], sub_rows, :] = vals
    idx_p[step_of_block[:, None], sub_rows, :] = idx

    def subarr(fill=0):
        return np.full(nsteps * P, fill, dtype=np.int32)

    cthi = subarr()
    ctlo = subarr()
    rblo = subarr()
    first = subarr(0)
    pos = step_of_block * P + slot
    cthi[pos] = bk.col_tile // 8
    ctlo[pos] = bk.col_tile % 8
    rblo[pos] = bk.row_block % 8
    first_blocks = np.concatenate([[1], (bk.row_block[1:] != bk.row_block[:-1])]).astype(np.int32)
    first[pos] = first_blocks
    rbhi_step = np.zeros(nsteps, dtype=np.int32)
    rbhi_step[step_of_block] = rbhi.astype(np.int32)
    return W, P, vals_p, idx_p, cthi, ctlo, rblo, first, rbhi_step


class _DeviceTilePlan:
    """Device-resident packed slabs + prefetch arrays for all buckets of one matrix."""

    def __init__(self, plan: TilePlan, dtype):
        self.plan = plan
        self.dtype = np.dtype(dtype)
        self.mrb8 = max(1, -(-plan.num_row_blocks // 8))
        self.nct8 = max(1, -(-plan.num_col_tiles // 8))
        self.buckets = []
        self.touch_masks = []
        self.padded_slots = 0
        for bk in plan.buckets:
            W, P, vals_p, idx_p, cthi, ctlo, rblo, first, rbhi_step = _pack_bucket(bk, self.mrb8)
            self.padded_slots += vals_p.size
            if self.dtype == np.float64:
                vhi = vals_p.astype(np.float32)
                vlo = (vals_p - vhi.astype(np.float64)).astype(np.float32)
                vals = (jnp.asarray(vhi), jnp.asarray(vlo))
            else:
                vals = (jnp.asarray(vals_p.astype(np.float32)),)
            self.buckets.append(
                dict(
                    W=W,
                    P=P,
                    cthi=jnp.asarray(cthi),
                    ctlo=jnp.asarray(ctlo),
                    rbhis=jnp.asarray(rbhi_step),
                    rblo=jnp.asarray(rblo),
                    first=jnp.asarray(first),
                    vals=vals,
                    idx=jnp.asarray(idx_p),
                )
            )
            mask = np.zeros((self.mrb8 * 8,), dtype=bool)
            mask[np.unique(bk.row_block)] = True
            self.touch_masks.append(jnp.asarray(mask.reshape(self.mrb8, 8, 1)))

    @property
    def x_fits_vmem(self) -> bool:
        limit = X_VMEM_LIMIT_F64 if self.dtype == np.float64 else X_VMEM_LIMIT_F32
        return self.plan.cols <= limit

    def prep_x(self, x):
        n_pad = self.nct8 * 8 * COL_WINDOW
        if self.dtype == np.float64:
            x64 = x.astype(jnp.float64)
            xhi = x64.astype(jnp.float32)
            xlo = (x64 - xhi.astype(jnp.float64)).astype(jnp.float32)
            xhi = jnp.zeros((n_pad,), jnp.float32).at[: x.shape[0]].set(xhi)
            xlo = jnp.zeros((n_pad,), jnp.float32).at[: x.shape[0]].set(xlo)
            return xhi.reshape(self.nct8, 8, COL_WINDOW), xlo.reshape(self.nct8, 8, COL_WINDOW)
        xp = jnp.zeros((n_pad,), jnp.float32).at[: x.shape[0]].set(x.astype(jnp.float32))
        return (xp.reshape(self.nct8, 8, COL_WINDOW),)


_TILE_CACHE: dict = {}


def get_tile_plan(csr, dtype) -> _DeviceTilePlan:
    key = (id(csr.row_ptr), csr.shape, csr.nnz, "tile", np.dtype(dtype).str)
    dp = _TILE_CACHE.get(key)
    if dp is None:
        rp, ci, v, shape = csr.to_numpy()
        dp = _DeviceTilePlan(build_tile_plan(rp, ci, v, shape), dtype)
        _TILE_CACHE[key] = dp
    return dp


def _masked(y, mask):
    return jnp.where(mask, y, jnp.zeros_like(y))


def _run_f32(dp: _DeviceTilePlan, x):
    xw = dp.prep_x(x)
    interp = _interpret()
    total = None
    for i, b in enumerate(dp.buckets):
        y = _tile_call_f32(
            b["cthi"], b["ctlo"], b["rbhis"], b["rblo"], b["first"],
            b["vals"][0], b["idx"], xw[0], b["W"], b["P"], dp.mrb8, interp,
        )
        y = _masked(y, dp.touch_masks[i])
        total = y if total is None else total + y
    if total is None:
        return jnp.zeros((dp.plan.rows,), jnp.float32)
    return total.reshape(-1)[: dp.plan.rows]


def _run_df64(dp: _DeviceTilePlan, x):
    xhi, xlo = dp.prep_x(x)
    interp = _interpret()
    thi = tlo = None
    for i, b in enumerate(dp.buckets):
        yhi, ylo = _tile_call_df64(
            b["cthi"], b["ctlo"], b["rbhis"], b["rblo"], b["first"],
            b["vals"][0], b["vals"][1], b["idx"], xhi, xlo,
            b["W"], b["P"], dp.mrb8, interp,
        )
        yhi = _masked(yhi, dp.touch_masks[i])
        ylo = _masked(ylo, dp.touch_masks[i])
        if thi is None:
            thi, tlo = yhi, ylo
        else:
            s = df64_add(DF64(thi, tlo), DF64(yhi, ylo))
            thi, tlo = s.hi, s.lo
    if thi is None:
        return jnp.zeros((dp.plan.rows,), jnp.float64)
    flat_hi = thi.reshape(-1)[: dp.plan.rows]
    flat_lo = tlo.reshape(-1)[: dp.plan.rows]
    return flat_hi.astype(jnp.float64) + flat_lo.astype(jnp.float64)


def spmv_adaptive_plus(alpha, beta, csr, x, y, plan=None):
    """Full strategy entry (dispatch contract): y = alpha*A@x + beta*y."""
    dtype = csr.values.dtype
    dp = get_tile_plan(csr, dtype)
    if not dp.x_fits_vmem:
        raise ValueError(
            f"adaptive_plus requires cols <= {X_VMEM_LIMIT_F64 if dtype == jnp.float64 else X_VMEM_LIMIT_F32}"
            f" (x must fit in VMEM); got {csr.cols}. Use another strategy."
        )
    m = csr.rows
    # f64 inputs run the df64 (compensated two-f32) kernel — on CPU tests this goes
    # through interpret mode so the exact kernel math is what gets verified.
    if dtype == jnp.float64:
        ax = _run_df64(dp, x)
    else:
        ax = _run_f32(dp, x)
    ax = ax[:m].astype(dtype)
    return axpby_finish(alpha, beta, ax, y)


def tile_spmv_f32(dp: _DeviceTilePlan, x):
    """A@x in f32 via the tile kernel; returns (m,) f32."""
    return _run_f32(dp, x)


def tile_spmv_df64(dp: _DeviceTilePlan, x):
    """A@x in df64 via the tile kernel; returns (m,) f64."""
    return _run_df64(dp, x)
