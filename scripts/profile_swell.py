"""Stage-cost breakdown of the swell df64 kernel on hardware.

Runs ablated kernel variants over one real bucket's slabs and reports ns/step:
  full       — the production kernel
  nogather   — tables used directly (ablates 2 lane-gathers)
  nomatmul   — x tables replaced by a chunk slice (ablates 2 one-hot MXU matmuls)
  nodekker   — product error terms dropped (ablates Dekker two_prod)
  nofold     — fold levels skipped (partial sums written unsummed; wrong math, timing only)
  noscatter  — T matmuls replaced by slicing (ablates 2 scatter matmuls)
  f32        — the f32 production kernel
  stream     — slabs read, single multiply, no reduction (BW ceiling)
"""
import functools
import sys
import time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_acc_tpu.formats.generate import banded_csr
from spmv_acc_tpu.ops.swell import _lane_gather, _dot, _build_T, _split, get_swell_plan
from spmv_acc_tpu.ops.swell_plan import CHUNK_W, CW, ROUT

_Z = np.int32(0)


def make_kernel(log2d, variant):
    P = 128 >> log2d

    def kernel(csel_r, osel_r, first_r, vh_ref, vl_ref, lidx_ref, oh_ref, rb_ref,
               ch_ref, cl_ref, ohi_ref, oerr_ref):
        s = pl.program_id(0)
        if variant == "stream":
            v = vh_ref[0] * 1.0001 + vl_ref[0] + lidx_ref[0].astype(jnp.float32)
            @pl.when(first_r[s] == 1)
            def _():
                ohi_ref[0] = v
                oerr_ref[0] = v
            @pl.when(first_r[s] == 0)
            def _():
                ohi_ref[0] = ohi_ref[0] + v
            return
        D = 1 << log2d

        def expand(ts):
            return ts if D == 1 else jnp.broadcast_to(ts[None], (D, P, 128)).reshape(128, 128)

        oh = oh_ref[0, :P].astype(jnp.float32)
        if variant == "nomatmul":
            th = ch_ref[0]
            tl = cl_ref[0]
        else:
            th = expand(_dot(oh, ch_ref[0]))
            tl = expand(_dot(oh, cl_ref[0]))
        idx = lidx_ref[0].astype(jnp.int32)
        if variant == "nogather":
            gh, gl = th, tl
        else:
            gh = _lane_gather(th, idx)
            gl = _lane_gather(tl, idx)
        vh = vh_ref[0]
        vl = vl_ref[0]
        p = vh * gh
        if variant == "nodekker":
            e = vh * gl + vl * gh
        else:
            ah, al = _split(vh)
            bh, bl = _split(gh)
            e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
            e = e + (vh * gl + vl * gh)
        if variant != "nofold":
            for _ in range(log2d):
                half = p.shape[0] // 2
                a, b = p[:half], p[half:]
                ssum = a + b
                bb = ssum - a
                err = (a - (ssum - bb)) + (b - bb)
                e = e[:half] + e[half:] + err
                p = ssum
        else:
            p = p[: 128 >> log2d]
            e = e[: 128 >> log2d]
        if variant == "noscatter":
            ph = jnp.zeros((ROUT, 128), jnp.float32).at[:P].set(p)
            pe = jnp.zeros((ROUT, 128), jnp.float32).at[:P].set(e)
        else:
            T = _build_T(rb_ref[0], P)
            ph = _dot(T, p)
            pe = _dot(T, e)
        first = first_r[s]

        @pl.when(first == 1)
        def _():
            ohi_ref[0] = ph
            oerr_ref[0] = pe

        @pl.when(first == 0)
        def _():
            cur = ohi_ref[0]
            ssum = cur + ph
            bb = ssum - cur
            err = (cur - (ssum - bb)) + (ph - bb)
            ohi_ref[0] = ssum
            oerr_ref[0] = oerr_ref[0] + pe + err

    return kernel


def call_variant(variant, b, ch, cl, nout):
    log2d = b["log2d"]
    nsteps = b["vals"][0].shape[0]
    spec3 = lambda s, *_: (s, _Z, _Z)
    cspec = lambda s, csel, *_: (csel[s], _Z, _Z)
    ospec = lambda s, csel, osel, *_: (osel[s], _Z, _Z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(nsteps,),
        in_specs=[pl.BlockSpec((1, 128, 128), spec3)] * 3
        + [pl.BlockSpec((1, b["oh"].shape[1], 128), spec3)]
        + [pl.BlockSpec((1, 1, 128), lambda s, *_: (s, _Z, _Z))]
        + [pl.BlockSpec((1, 128, 128), cspec)] * 2,
        out_specs=[pl.BlockSpec((1, ROUT, 128), ospec)] * 2,
    )
    return pl.pallas_call(
        make_kernel(log2d, variant), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nout, ROUT, 128), jnp.float32)] * 2,
    )(b["csel"], b["osel"], b["first"], b["vals"][0], b["vals"][1], b["lidx"],
      b["oh"], b["rbvec"], ch, cl)


def main():
    csr = banded_csr(500000, bandwidth=9, seed=3, dtype=np.float64)
    dp = get_swell_plan(csr, np.float64)
    # pick the bucket with the most steps
    b = max(dp.buckets, key=lambda bb: bb["vals"][0].shape[0])
    nsteps = b["vals"][0].shape[0]
    print(f"bucket depth=2^{b['log2d']} nsteps={nsteps} fill={dp.plan.fill_efficiency:.3f}", flush=True)
    x = np.random.default_rng(0).standard_normal(csr.cols)
    # full-f32 hi/lo chunk planes (the pre-bf16-plane kernel layout this profiler ablates)
    from spmv_acc_tpu.ops.swell_plan import CHUNK_W as _CWIN
    n_pad = dp.nchunks * _CWIN * CW
    x64 = np.zeros(n_pad); x64[: csr.cols] = x
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    ch = jnp.asarray(xh.reshape(dp.nchunks, _CWIN, CW))
    cl = jnp.asarray(xl.reshape(dp.nchunks, _CWIN, CW))

    LOG2D = b["log2d"]

    @functools.partial(jax.jit, static_argnames=("variant", "n"))
    def run(bargs, ch, cl, n, variant):
        def body(i, carry):
            hi, err = call_variant(variant, dict(zip(
                ["log2d", "csel", "osel", "first", "vals", "lidx", "oh", "rbvec"],
                [LOG2D, bargs[0], bargs[1], bargs[2], (bargs[3], bargs[4]), bargs[5], bargs[6], bargs[7]])),
                ch * (1.0 + carry * 1e-30), cl, dp.nout)
            return carry + hi[0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    bargs = (b["csel"], b["osel"], b["first"], b["vals"][0], b["vals"][1],
             b["lidx"], b["oh"], b["rbvec"])
    for variant in ["full", "nogather", "nomatmul", "nodekker", "nofold", "noscatter", "f32_skip", "stream"]:
        if variant == "f32_skip":
            continue
        def once(n):
            t = time.perf_counter()
            r = run(bargs, ch, cl, n, variant)
            np.asarray(jax.device_get(r))
            return time.perf_counter() - t
        try:
            once(1); once(9)
            lo = min(once(1) for _ in range(3))
            hi = min(once(9) for _ in range(3))
            per_call = (hi - lo) / 8
            print(f"{variant:10s}: {per_call*1e6:9.1f} us/call  {per_call/nsteps*1e9:7.1f} ns/step", flush=True)
        except Exception as e:
            print(f"{variant:10s}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
