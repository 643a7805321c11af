"""Microbench: one tall (256,128) lane gather vs two (128,128) gathers.

The f64 swell step issues gh = gather(tha, idx) and gl = gather(tla, idx)
with the SAME idx.  If the lane-permutation gather is latency-dominated
(~55-84 cycles per (128,128); PERF_NOTES calibration), a stacked
(256,128) gather pays that latency once.  This probe times both inside a
minimal Pallas kernel with a chained fori_loop (slope between two loop
lengths, the repo's standard anti-hoist protocol).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_acc_tpu.ops.swell import _lane_gather

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

NSTEP = 512
REP = 4  # gathers per grid step (the f64 kernel's 2 sets x optional wide 2)


def make_kernel(stacked: bool):
    def kernel(ta_ref, tl_ref, idx_ref, o_ref):
        ta = ta_ref[0]
        tl = tl_ref[0]
        idx = idx_ref[0]
        acc = None
        for r in range(REP):
            # perturb tables by r so repeats are not CSE'd
            ta_r = ta + np.float32(r)
            tl_r = tl + np.float32(r)
            if stacked:
                t2 = jnp.concatenate([ta_r, tl_r], 0)
                i2 = jnp.concatenate([idx, idx], 0)
                g2 = _lane_gather(t2, i2)
                gh, gl = g2[:128], g2[128:]
            else:
                gh = _lane_gather(ta_r, idx)
                gl = _lane_gather(tl_r, idx)
            v = gh + gl * np.float32(2.0)
            acc = v if acc is None else acc + v
        o_ref[0] = acc

    return kernel


def call(stacked, ta, tl, idx):
    n = ta.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 128, 128), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, 128, 128), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, 128, 128), lambda s: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 128, 128), lambda s: (0, 0, 0)),
    )
    return pl.pallas_call(
        make_kernel(stacked),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 128, 128), jnp.float32),
    )(ta, tl, idx)


def main():
    rng = np.random.default_rng(0)
    ta = jnp.asarray(rng.standard_normal((NSTEP, 128, 128)), jnp.float32)
    tl = jnp.asarray(rng.standard_normal((NSTEP, 128, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (NSTEP, 128, 128)), jnp.int32)

    o_a = np.asarray(call(False, ta, tl, idx))
    o_b = np.asarray(call(True, ta, tl, idx))
    print("bit-identical:", np.array_equal(o_a, o_b), flush=True)

    pert = ta[:1, :1]  # (1,1,128) loop-carried perturbation, size-invariant
    for tag, stacked in (("2x gathers", False), ("stacked    ", True)):
        @jax.jit
        def loop(ta, tl, idx, pert, n, stacked=stacked):
            def body(i, c):
                ta2 = jnp.concatenate(
                    [(pert * (1.0 + c * 1e-30)).astype(ta.dtype)
                     + ta[:1, :1], ta[:1, 1:]], axis=1)
                ta2 = jnp.concatenate([ta2, ta[1:]], axis=0)
                o = call(stacked, ta2, tl, idx)
                return c + o[0, 0, 0] * 1e-30

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def once(nn):
            t = time.perf_counter()
            r = loop(ta, tl, idx, pert, nn)
            np.asarray(jax.device_get(r))
            return time.perf_counter() - t

        once(9); once(33)
        lo = min(once(9) for _ in range(3))
        hi = min(once(33) for _ in range(3))
        per = (hi - lo) / 24
        print(f"{tag}: {per / NSTEP * 1e9:7.1f} ns/step "
              f"({REP} gather-pairs/step)", flush=True)


if __name__ == "__main__":
    main()
