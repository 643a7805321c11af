"""Measure the XLA epilogue (part masking/conversion/summation) share of swell_ax.

Compares chained-loop slope of (a) full swell_ax vs (b) kernels only (parts
consumed raw).  Real TPU; slope between two large n.
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

from spmv_acc_tpu.formats.generate import example_like, random_x_y
from spmv_acc_tpu.ops.swell import (_bucket_args, _call_f64, _prep_x_pure,
                                    _statics, get_swell_plan, swell_ax)

name = sys.argv[1] if len(sys.argv) > 1 else "Hardesty3"
csr = example_like(name, dtype=np.float64)
m, n = csr.shape
x, _ = random_x_y(n, m, seed=7, dtype=np.float64)
dp = get_swell_plan(csr, np.float64)
bargs = _bucket_args(dp, False)
st = _statics(dp, False)
log2ds = st[8]
nout, nchunks, delta = st[2], st[3], st[7]
dx = jnp.asarray(x)


@jax.jit
def loop_full(bargs, tail, xx, nn):
    def body(i, c):
        y = swell_ax(bargs, tail, xx, st)
        return c + y[0] * 1e-30

    return jax.lax.fori_loop(0, nn, body, jnp.float64(0.0))


@jax.jit
def loop_kernels(bargs, xx, nn):
    chunks = _prep_x_pure(xx, nchunks, True, native=False, delta=delta)

    def body(i, c):
        acc = c
        for ba, (log2d, wide, dual, classpos, allout) in zip(bargs, log2ds):
            ohs = None
            use_pipe = st[10] and len(ba) == 11
            if len(ba) == 11:
                (cp, cbp, hbp, cn, cbn, hbn, osel, first, ohs, packed, touched) = ba
                csel, cselb, hasb = (cp, cbp, hbp) if use_pipe else (cn, cbn, hbn)
            else:
                csel, cselb, hasb, osel, first, packed, touched = ba[:7]
            o = _call_f64(csel, cselb, hasb, osel, first, packed, chunks,
                          log2d, wide, nout, False, dual, classpos,
                          ohs=ohs, pipe=use_pipe)
            acc = acc + o[0, 0, 0].astype(jnp.float64) * 1e-30
        return acc

    return jax.lax.fori_loop(0, nn, body, jnp.float64(0.0))


def slope(fn, *args):
    def once(nn):
        t = time.perf_counter()
        r = fn(*args, jnp.int32(nn))
        np.asarray(jax.device_get(r))
        return time.perf_counter() - t

    once(jnp.int32(5)); once(jnp.int32(17))
    lo = min(once(jnp.int32(5)) for _ in range(3))
    hi = min(once(jnp.int32(17)) for _ in range(3))
    return (hi - lo) / 12 * 1e6


t_full = slope(loop_full, bargs, dp.tail, dx)
t_kern = slope(loop_kernels, bargs, dx)
print(f"{name}: full={t_full:.1f}us kernels_only={t_kern:.1f}us "
      f"epilogue={t_full - t_kern:.1f}us ({(t_full - t_kern) / t_full:.1%})", flush=True)
