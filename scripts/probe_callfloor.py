"""Measure the pallas per-call fixed cost and the x-prep cost structure on TPU.

Per-call floor: N chained trivial pallas_calls (tiny 1-step grid, aliased
(3,256,128) f32 accumulator like af23560's) inside one on-device fori_loop;
slope over N isolates the per-call cost the small-set geomean pays 3-5x per
SpMV (VERDICT r3 #3).

Prep: times the sub-stages of _prep_x_pure for a small f64 x (pad-scatter,
hi/lo split, plane-split pallas call).
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

from spmv_acc_tpu.ops.swell import _plane_split_call, _prep_x_pure


def timed(fn, x0, iters=512):
    @jax.jit
    def loop(xx, n):
        def body(i, cur):
            r = fn(cur)
            return r * jax.lax.rsqrt(jnp.mean(r * r) + 1e-30)

        return jax.lax.fori_loop(0, n, body, xx)

    def once(nn):
        t = time.perf_counter()
        r = loop(x0, nn)
        np.asarray(jax.device_get(r.ravel()[:1]))
        return time.perf_counter() - t

    n0, n1 = 1 + iters // 4, 1 + iters
    once(n0); once(n1)
    lo = min(once(n0) for _ in range(3))
    hi = min(once(n1) for _ in range(3))
    return max(hi - lo, 0.0) / (n1 - n0) * 1e6


def tiny_kernel(acc_in_ref, o_ref):
    o_ref[...] = acc_in_ref[...] * 1.0000001


def chain_calls(ncalls):
    """acc -> ncalls aliased pallas_calls -> acc (af23560-shaped accumulator)."""

    Z = np.int32(0)

    def fn(acc):
        for _ in range(ncalls):
            acc = pl.pallas_call(
                tiny_kernel,
                grid=(3,),
                in_specs=[pl.BlockSpec((1, 256, 128), lambda i: (i, Z, Z))],
                out_specs=pl.BlockSpec((1, 256, 128), lambda i: (i, Z, Z)),
                out_shape=jax.ShapeDtypeStruct((3, 256, 128), jnp.float32),
                input_output_aliases={0: 0},
            )(acc)
        return acc

    return fn


def main():
    acc0 = jnp.ones((3, 256, 128), jnp.float32)
    t1 = timed(chain_calls(1), acc0)
    t4 = timed(chain_calls(4), acc0)
    t8 = timed(chain_calls(8), acc0)
    print(f"chained tiny pallas calls: 1 -> {t1:.2f}us  4 -> {t4:.2f}us  "
          f"8 -> {t8:.2f}us   per-call slope {(t8 - t1) / 7:.2f}us")

    # prep structure for a small f64 x (af23560: n=23560, nchunks=2)
    n = 23560
    nchunks = 2
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, n))

    def full_prep(x):
        ch = _prep_x_pure(x, nchunks, True, native=False, delta=0, r=1)
        return x * (1.0 + ch[0, 0, 0].astype(jnp.float64) * 1e-30)

    def pad_split_only(x):
        x64 = x.astype(jnp.float64)
        xh = x64.astype(jnp.float32)
        xl = (x64 - xh.astype(jnp.float64)).astype(jnp.float32)
        n_pad = nchunks * 128 * 128
        xh = jnp.zeros((n_pad,), jnp.float32).at[: x.shape[0]].set(xh)
        xl = jnp.zeros((n_pad,), jnp.float32).at[: x.shape[0]].set(xl)
        return x * (1.0 + (xh[0] + xl[0]).astype(jnp.float64) * 1e-30)

    def split_call_only(x):
        # plane-split pallas call on pre-shaped inputs
        xh = jnp.zeros((nchunks, 128, 128), jnp.float32) + x[0].astype(jnp.float32)
        xl = jnp.zeros((nchunks, 128, 128), jnp.float32)
        ch = _plane_split_call([xh, xl])
        return x * (1.0 + ch[0, 0, 0].astype(jnp.float64) * 1e-30)

    print(f"full prep: {timed(full_prep, x0):.2f}us   "
          f"pad+hi/lo only: {timed(pad_split_only, x0):.2f}us   "
          f"plane-split call only: {timed(split_call_only, x0):.2f}us")


if __name__ == "__main__":
    main()
