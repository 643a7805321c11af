"""Distributed SpMV with the FLAGSHIP swell kernel as the local compute.

Round-1 distribution computed each shard's rows with XLA gather + segment_sum
(~140 ns/element — unusable at scale); this module instead partitions the ONE
global swell plan by its out-windows and runs the real Pallas kernels inside
``shard_map``:

* The global plan (BSR-aware) is built once; shard d owns the K = ceil(nout/D)
  consecutive out-windows [d*K, (d+1)*K).  Out-windows cover uniform row counts
  (tile_rb * 128 * r rows), so every shard's y block has the SAME length and the
  sharded y IS the (padded) global vector — x for square systems shards
  identically, with no cross-device relayout between CG iterations.
* Each bucket's steps are already globally ordered by out-window, so a shard's
  steps are a contiguous slice; shards pad to the max count with all-zero no-op
  steps (zero values/one-hots contribute exact zeros; `touched` masking zeroes
  windows a shard never writes, so uninitialized tiles are dropped).
* Inside the shard, x is all-gathered over the mesh axis (ICI) and fed to the
  SAME ``swell_ax`` the single-chip path uses — TPU Pallas kernels on hardware,
  the native-dtype interpret path on the CPU test mesh.

Reference scope note: the reference is single-GPU (cli/main.cpp:89); this layer
is the new-scope distribution demanded by BASELINE.json config 5.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ._compat import shard_map

from ..formats.containers import CSR
from ..ops.swell import (CHUNK_W, CW, _bucket_args, _interpret, _statics,
                         get_swell_plan, swell_ax)

__all__ = ["DistSwellPlan", "build_dist_swell", "dist_swell_spmv_fn",
           "dist_swell_halo_spmv_fn", "dist_swell_serial_fn", "dist_swell_cg_solve",
           "pad_global"]

_CS = CHUNK_W * CW  # columns (node-granular for BSR plans) per x chunk


@dataclasses.dataclass
class DistSwellPlan:
    bucket_args: Tuple          # per bucket: stacked (D, ...) arrays, swell_ax layout
    statics: Tuple              # per-shard statics for swell_ax (nout=K, rows=rows_local)
    tail: Tuple                 # COO tail: empty, or per-shard (D, tmax) arrays
    #                             (rows localized; padding row == rows_local is
    #                             sorted AND dropped by the in-shard segment_sum)
    num_shards: int
    windows_per_shard: int      # K
    rows_local: int             # K * tile_rb * 128 * r  (uniform per shard)
    shape: Tuple[int, int]      # global (m, n)
    r: int
    dtype: np.dtype
    # halo support: per-shard first chunk (D,), uniform window width in chunks,
    # and whether the 1-hop exchange covers every shard's span (else all-gather)
    chunk_lo: "np.ndarray | None" = None
    win_chunks: int = 0
    halo_ok: bool = False

    @property
    def padded_len(self) -> int:
        return self.num_shards * self.rows_local


def _pad_steps(arrs, count, pad_to, osel_pad):
    """Pad per-step arrays (leading dim = steps) with no-op steps: zeros are safe
    by construction (zero one-hot -> zero tables, zero values -> zero products;
    rb=0 scatters a zero; first=0 accumulates zero onto an existing window)."""
    out = []
    pad = pad_to - count
    for name, a in arrs:
        a = np.asarray(a)
        if pad == 0:
            out.append(a)
            continue
        padded = np.zeros((pad_to,) + a.shape[1:], dtype=a.dtype)
        padded[:count] = a
        if name == "osel":
            padded[count:] = osel_pad
        if name == "first" and count == 0:
            padded[0] = 1  # initialize window 0 (zeros; masked by touched anyway)
        out.append(padded)
    return out


def build_dist_swell(csr: CSR, num_shards: int, dtype=None) -> DistSwellPlan:
    """Partition the global swell plan's out-windows over ``num_shards``."""
    dtype = np.dtype(dtype or csr.values.dtype)
    dp = get_swell_plan(csr, dtype)
    plan = dp.plan
    interp = _interpret()
    D = num_shards
    K = max(1, -(-plan.nout // D))
    r = dp.r
    rows_local = K * plan.tile_rb * 128 * r
    gargs = _bucket_args(dp, interp)
    st = _statics(dp, interp)
    # localize statics: nout -> K, rows -> rows_local, allout -> False (touched
    # masking drops windows a shard never initializes)
    log2ds = tuple((l2d, wide, dual, cpos, False) for (l2d, wide, dual, cpos, _a) in st[8])
    # pipe=False: the localized per-shard step slices do not carry the
    # own/hasbn/ohs pipelining arrays (the kernels fall back to in-step builds)
    # pipe/fusion both off: the localized per-shard step slices carry neither
    # the ohs pipelining arrays nor the pair-aligned fused selectors
    statics = (st[0], st[1], K, st[3], st[4], st[5], rows_local, st[7], log2ds, st[9],
               False, st[11], (False,) * len(log2ds))
    names_tpu = ("csel", "cselb", "hasb", "osel", "first", "packed", "touched")
    names_tpu11 = ("csel_p", "cselb_p", "hasb_p", "csel", "cselb", "hasb",
                   "osel", "first", "ohs", "packed", "touched")
    names_interp = ("csel", "cselb", "hasb", "osel", "first", "vals", "lidx",
                    "onehot", "rbvec", "touched")
    # emitted per-shard layout is ALWAYS the 7-field TPU tuple (or interp tuple):
    # the localized slices use the NONPIPE selector semantics
    names = names_interp if interp else names_tpu
    # pass 1: per-shard step slices + chunk spans (for the 1-hop halo window)
    all_fields = []
    all_slices = []
    c_lo = np.full(D, np.iinfo(np.int64).max, dtype=np.int64)
    c_hi = np.full(D, -1, dtype=np.int64)
    for bi, ba in enumerate(gargs):
        in_names = names if interp else (names_tpu11 if len(ba) == 11 else names_tpu)
        fields = {n: np.asarray(a) for n, a in zip(in_names, ba)}
        osel = fields["osel"]
        slices = []
        for d in range(D):
            lo, hi = np.searchsorted(osel, [d * K, (d + 1) * K])
            slices.append((int(lo), int(hi)))
            if hi > lo:
                cs = fields["csel"][lo:hi]
                c_lo[d] = min(c_lo[d], int(cs.min()))
                c_hi[d] = max(c_hi[d], int(cs.max()))
                if st[8][bi][2]:  # dual bucket: chunk-b selectors load real blocks
                    cb = fields["cselb"][lo:hi]
                    c_lo[d] = min(c_lo[d], int(cb.min()))
                    c_hi[d] = max(c_hi[d], int(cb.max()))
        all_fields.append(fields)
        all_slices.append(slices)
    delta = plan.delta
    L = rows_local
    # fold the COO tail's column spans into the per-shard chunk windows BEFORE
    # deciding halo feasibility: tail columns ride the same 1-hop window as the
    # kernel chunks (round-4 restricted tailed plans to all-gather — lifted;
    # only tails reaching beyond the neighbor blocks force all-gather now).
    # Element g of the padded-global x lives in chunk ((g // r) + delta) // _CS
    # (the inverse of ws = (c_lo*_CS - delta) * r below).
    tr_g = np.asarray(plan.tail_rows)
    tail_splits = None
    if len(tr_g):
        tail_splits = np.concatenate(
            [[0], np.searchsorted(tr_g, np.arange(1, D) * rows_local), [len(tr_g)]])
        tc_g = np.asarray(plan.tail_ci)
        for d in range(D):
            lo, hi = int(tail_splits[d]), int(tail_splits[d + 1])
            if hi > lo:
                tchunks = ((tc_g[lo:hi] // r) + delta) // _CS
                c_lo[d] = min(c_lo[d], int(tchunks.min()))
                c_hi[d] = max(c_hi[d], int(tchunks.max()))
    idle = c_hi < 0
    d_idx = np.arange(D)
    # idle shards (no steps anywhere) read only zero one-hots; park their window
    # on their own x block so the slice stays near the shard
    c_lo[idle] = np.maximum(0, (d_idx[idle] * (L // r) + delta) // _CS)
    c_hi[idle] = c_lo[idle]
    win_chunks = int((c_hi - c_lo).max()) + 1
    # 1-hop feasibility: every live shard's element window must sit inside its
    # own x block plus the two neighbor blocks (edge shards extend into the
    # zero padding, which matches the global zero regions exactly)
    ws = (c_lo * _CS - delta) * r
    we = ws + win_chunks * _CS * r
    live = ~idle
    halo_ok = bool(
        np.all((~live) | (d_idx == 0) | (ws >= (d_idx - 1) * L))
        and np.all((~live) | (d_idx == D - 1) | (we <= (d_idx + 2) * L))
    )
    stacked_buckets = []
    for fields, slices in zip(all_fields, all_slices):
        counts = [hi - lo for lo, hi in slices]
        smax = max(max(counts), 1)
        per_shard = []
        for d, (lo, hi) in enumerate(slices):
            count = hi - lo
            sub = []
            for n_ in names:
                if n_ == "touched":
                    continue
                a = fields[n_][lo:hi]
                if n_ == "osel":
                    a = a - d * K  # localize window ids
                elif halo_ok and n_ in ("csel", "cselb"):
                    # localize chunk ids into the shard's halo window; the clamp
                    # covers never-loaded selectors of single-chunk steps (their
                    # one-hot side is zero, so any in-range block is a no-op)
                    a = np.clip(a - c_lo[d], 0, win_chunks - 1).astype(a.dtype)
                sub.append((n_, a))
            osel_pad = int(sub[3][1][count - 1]) if count else 0
            padded = _pad_steps(sub, count, smax, osel_pad)
            touched = np.zeros(K, dtype=bool)
            seg = fields["touched"][d * K : (d + 1) * K]
            touched[: len(seg)] = seg
            per_shard.append(padded + [touched])
        stacked = tuple(jnp.asarray(np.stack([s[i] for s in per_shard]))
                        for i in range(len(per_shard[0])))
        stacked_buckets.append(stacked)
    # per-shard COO tail: split the row-sorted global tail at shard row bounds,
    # localize rows, pad with row == rows_local (sorted AND out-of-range, so
    # the in-shard segment_sum drops the padding).  halo plans also localize
    # the COLUMN ids into the shard's element window (tail x rides the same
    # 1-hop exchange as the kernel chunks; spans were folded into c_lo above)
    tdt = (jnp.float64 if (dtype == np.float64 and jax.config.jax_enable_x64)
           else jnp.float32)
    tr = np.asarray(plan.tail_rows)
    if len(tr):
        tc, tvv = np.asarray(plan.tail_ci), np.asarray(plan.tail_v)
        splits = tail_splits
        tmax = int(np.max(np.diff(splits)))
        trs = np.full((D, tmax), rows_local, np.int32)
        tcs = np.zeros((D, tmax), np.int32)
        tvs = np.zeros((D, tmax), np.float64)
        for d in range(D):
            lo, hi = int(splits[d]), int(splits[d + 1])
            tci_d = tc[lo:hi]
            if halo_ok:
                tci_d = tci_d - ws[d]
                assert len(tci_d) == 0 or (
                    tci_d.min() >= 0 and tci_d.max() < win_chunks * _CS * r), \
                    "tail column escaped its shard window despite span folding"
            trs[d, : hi - lo] = tr[lo:hi] - d * rows_local
            tcs[d, : hi - lo] = tci_d
            tvs[d, : hi - lo] = tvv[lo:hi]
        tail = (jnp.asarray(trs), jnp.asarray(tcs), jnp.asarray(tvs, dtype=tdt))
    else:
        tail = (jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32),
                jnp.zeros(0, tdt))
    return DistSwellPlan(
        bucket_args=tuple(stacked_buckets), statics=statics, tail=tail,
        num_shards=D, windows_per_shard=K, rows_local=rows_local,
        shape=(csr.rows, csr.shape[1]), r=r, dtype=dtype,
        chunk_lo=c_lo, win_chunks=win_chunks, halo_ok=halo_ok,
    )


def pad_global(dsp: DistSwellPlan, v) -> jnp.ndarray:
    """Pad a global (m,) vector to the uniform sharded length D * rows_local."""
    return jnp.zeros((dsp.padded_len,), v.dtype).at[: v.shape[0]].set(v)


def dist_swell_halo_spmv_fn(dsp: DistSwellPlan, mesh: Mesh, axis: str = "x"):
    """1-hop HALO variant: instead of all-gathering x (O(n) per device), each
    shard ``ppermute``s only its two neighbor x blocks over ICI and slices its
    chunk window out of the 3-block neighborhood — collective volume O(3n/D)
    per device, the same scaling form as ``dist_spmv_halo_fn`` but feeding the
    flagship swell kernels.  Requires ``dsp.halo_ok`` (chunk selectors were
    rebased into the per-shard window at build time)."""
    assert dsp.halo_ok, "plan was not built halo-feasible"
    D = dsp.num_shards
    L = dsp.rows_local
    Wc = dsp.win_chunks
    st = dsp.statics
    r = st[9]
    delta = st[7]
    win_elems = Wc * _CS * r
    off_raw = (dsp.chunk_lo.astype(np.int64) * _CS - delta) * r - (np.arange(D) - 1) * L
    PL = int(max(0, -int(off_raw.min())))
    PR = int(max(0, int((off_raw + win_elems).max()) - 3 * L))
    offs = jnp.asarray((off_raw + PL).astype(np.int32))
    # window statics: Wc chunks, delta already folded into the slice offset
    statics = (st[0], st[1], st[2], Wc, st[4], st[5], st[6], 0, st[8], st[9], False,
               st[11], (False,) * len(st[8]))
    flat, treedef = jax.tree_util.tree_flatten((dsp.bucket_args, dsp.tail))
    nb = len(flat)
    right = [(s, s + 1) for s in range(D - 1)]  # block s -> shard s+1 (left halo)
    left = [(s + 1, s) for s in range(D - 1)]   # block s+1 -> shard s (right halo)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple([P(axis)] * (nb + 2)),
        out_specs=P(axis),
    )
    def _shard_fn(*args):
        x_local = args[-2]
        off = args[-1][0]
        local = [a[0] for a in args[:nb]]
        bargs, tail = jax.tree_util.tree_unflatten(treedef, local)
        xl = jax.lax.ppermute(x_local, axis, right)  # zeros at shard 0
        xr = jax.lax.ppermute(x_local, axis, left)   # zeros at shard D-1
        xw = jnp.concatenate([
            jnp.zeros((PL,), x_local.dtype), xl, x_local, xr,
            jnp.zeros((PR,), x_local.dtype),
        ])
        xwin = jax.lax.dynamic_slice(xw, (off,), (win_elems,))
        return swell_ax(bargs, tail, xwin, statics)

    args_stacked = []
    for a in flat:
        if a.ndim >= 1 and a.shape[0] == D:
            args_stacked.append(a)
        else:
            args_stacked.append(jnp.broadcast_to(a[None], (D,) + a.shape))
    sh = NamedSharding(mesh, P(axis))
    offs = jax.device_put(offs, sh)

    @jax.jit
    def run(x_sharded):
        return _shard_fn(*args_stacked, x_sharded, offs)

    return run


def dist_swell_spmv_fn(dsp: DistSwellPlan, mesh: Mesh, axis: str = "x",
                       halo: "bool | None" = None):
    """Jitted distributed y = A @ x: x enters sharded (D * rows_local,) in the
    padded-global layout (pad_global); returns y sharded the same way.
    ``halo=None`` auto-selects the 1-hop halo exchange when the plan's chunk
    windows allow it (banded/FEM partitions), else the tiled all-gather."""
    if halo is None:
        halo = dsp.halo_ok
    if halo:
        return dist_swell_halo_spmv_fn(dsp, mesh, axis)
    if dsp.halo_ok:
        # chunk selectors were rebased into per-shard windows at build time;
        # the global-chunk gather path cannot run on this plan
        raise ValueError("plan built halo-feasible; use halo=True (or rebuild)")
    n = dsp.shape[1]
    flat, treedef = jax.tree_util.tree_flatten((dsp.bucket_args, dsp.tail))
    nb = len(flat)
    statics = dsp.statics

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple([P(axis)] * nb) + (P(axis),),
        out_specs=P(axis),
    )
    def _shard_fn(*args):
        x_local = args[-1]
        local = [a[0] for a in args[:nb]]  # strip the shard dim
        bargs, tail = jax.tree_util.tree_unflatten(treedef, local)
        x_full = jax.lax.all_gather(x_local, axis, tiled=True)[:n]
        return swell_ax(bargs, tail, x_full, statics)

    # the tail is shard-invariant (empty); broadcast it into shard layout
    args_stacked = []
    D = dsp.num_shards
    for a in flat:
        if a.ndim >= 1 and a.shape[0] == D:
            args_stacked.append(a)
        else:
            args_stacked.append(jnp.broadcast_to(a[None], (D,) + a.shape))

    @jax.jit
    def run(x_sharded):
        return _shard_fn(*args_stacked, x_sharded)

    return run


def dist_swell_serial_fn(dsp: DistSwellPlan):
    """Structure-for-structure single-device baseline for the weak-scaling gate:
    the SAME stacked per-shard plan (identical kernel shapes, step slices, and
    padding as the distributed program) executed shard-by-shard on ONE device,
    with local x windows sliced from the full padded vector instead of being
    exchanged over the mesh.  ``T_serial / T_dist`` then isolates exactly what
    distribution adds (collectives, sharding, rendezvous) — unlike a separately
    planned global run, whose bucket mix differs with matrix size (the broken
    SCALING_r03 baseline).  Returns a jitted ``x_padded -> y_padded`` function."""
    D = dsp.num_shards
    L = dsp.rows_local
    st = dsp.statics
    flat, treedef = jax.tree_util.tree_flatten((dsp.bucket_args, dsp.tail))
    nb = len(flat)
    args_stacked = []
    for a in flat:
        if a.ndim >= 1 and a.shape[0] == D:
            args_stacked.append(a)
        else:
            args_stacked.append(jnp.broadcast_to(a[None], (D,) + a.shape))

    if dsp.halo_ok:
        Wc = dsp.win_chunks
        r = st[9]
        delta = st[7]
        win_elems = Wc * _CS * r
        # global element offset of each shard's chunk window (can be negative at
        # shard 0 / overrun at shard D-1 — covered by the PL/PR zero margins the
        # halo path also fabricates)
        off_glob = (dsp.chunk_lo.astype(np.int64) * _CS - delta) * r
        PL = int(max(0, -int(off_glob.min())))
        PR = int(max(0, int((off_glob + win_elems).max()) - D * L))
        offs = jnp.asarray((off_glob + PL).astype(np.int32))
        statics = (st[0], st[1], st[2], Wc, st[4], st[5], st[6], 0, st[8], st[9],
                   False, st[11], (False,) * len(st[8]))

        @jax.jit
        def run(x_pad):
            xg = jnp.concatenate([
                jnp.zeros((PL,), x_pad.dtype), x_pad, jnp.zeros((PR,), x_pad.dtype),
            ])
            outs = []
            for d in range(D):
                local = [a[d] for a in args_stacked[:nb]]
                bargs, tail = jax.tree_util.tree_unflatten(treedef, local)
                xwin = jax.lax.dynamic_slice(xg, (offs[d],), (win_elems,))
                outs.append(swell_ax(bargs, tail, xwin, statics))
            return jnp.concatenate(outs)

        return run

    n = dsp.shape[1]

    @jax.jit
    def run(x_pad):
        x_full = x_pad[:n]
        outs = []
        for d in range(D):
            local = [a[d] for a in args_stacked[:nb]]
            bargs, tail = jax.tree_util.tree_unflatten(treedef, local)
            outs.append(swell_ax(bargs, tail, x_full, st))
        return jnp.concatenate(outs)

    return run


def dist_swell_cg_solve(csr: CSR, b, mesh: Mesh, tol: float = 1e-8,
                        max_iters: int = 200, axis: str = "x"):
    """Mesh-distributed CG with swell-kernel local compute (square SPD A).

    ``b`` is the GLOBAL (m,) right-hand side; returns (CGResult with padded x,
    dsp) — slice ``result.x[:m]`` for the global solution."""
    from ..models.cg import _cg_loop

    D = mesh.size
    dsp = build_dist_swell(csr, D)
    matvec_run = dist_swell_spmv_fn(dsp, mesh, axis)

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
                       out_specs=P())
    def dot_sm(a, c):
        from ..models.cg import _vdot

        return jax.lax.psum(_vdot(a, c), axis)

    sh = NamedSharding(mesh, P(axis))
    bp = jax.device_put(pad_global(dsp, b), sh)
    x0 = jax.device_put(jnp.zeros_like(bp), sh)

    @jax.jit
    def run(bb, xx):
        return _cg_loop(matvec_run, None, bb, xx,
                        jnp.asarray(tol, bb.dtype), max_iters, dot_sm)

    return run(bp, x0), dsp
