"""Measure _prep_x_pure's share of the timed SpMV iteration.

Loop A: full production step (prep + kernels + epilogue) — the bench protocol.
Loop B: kernels + epilogue from pre-built chunks (perturbed in-loop so XLA
cannot hoist).  A - B ~= per-iteration x-prep cost.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
import jax.numpy as jnp
import numpy as np

from spmv_acc_tpu.formats.generate import example_like, random_x_y
from spmv_acc_tpu.ops.swell import (_bucket_args, _statics, get_swell_plan,
                                    make_swell_run, swell_ax)

name = sys.argv[1] if len(sys.argv) > 1 else "Hardesty3"
csr = example_like(name, dtype=np.float64)
m, n = csr.shape
x, _ = random_x_y(n, m, seed=7, dtype=np.float64)
dp = get_swell_plan(csr, np.float64)
bargs = _bucket_args(dp, False)
st = _statics(dp, False)
dx = jnp.asarray(x)
dy = jnp.zeros(m)


def slope(run, iters=None):
    iters = iters or int(min(2048, max(64, 0.04 / max(csr.nnz * 12 / 50e9, 2e-6))))
    def once(nn):
        t = time.perf_counter()
        r = run(nn)
        np.asarray(jax.device_get(r.ravel()[:1] if r.ndim else r))
        return time.perf_counter() - t
    n0, n1 = 1 + iters // 4, 1 + iters
    once(n0); once(n1)
    lo = min(once(n0) for _ in range(3))
    hi = min(once(n1) for _ in range(3))
    return max(hi - lo, 0.0) / (n1 - n0) * 1e6


runA = make_swell_run(csr, alpha=1.0, beta=1.0)
a_us = slope(lambda nn: runA(dx, dy, nn))
print(f"{name}: full step {a_us:.1f}us/iter", flush=True)

# Loop B: swell_ax from an x that is already on device but perturbed via a
# SCALAR multiply (one cheap pass) — isolates the plane-split/pad/concat work?
# No: scalar-multiplying x still reruns the full prep on the product.  Instead
# perturb the PREPPED chunks and call the bucket kernels directly.
from spmv_acc_tpu.ops.swell import _prep_x_pure  # noqa: E402

chunks = _prep_x_pure(dx, st[3], True, native=False, delta=st[7])
pert = chunks[:, :1].astype(jnp.float32)


@jax.jit
def runB(bargs, tail, chunks, pert, nn):
    def body(i, c):
        ch = jnp.concatenate(
            [(pert * (1.0 + c * 1e-30)).astype(jnp.bfloat16), chunks[:, 1:]], axis=1)
        y = _swell_from_chunks(bargs, tail, ch)
        return c + y[0].astype(jnp.float32) * 1e-30

    return jax.lax.fori_loop(0, nn, body, jnp.float32(0.0))


def _swell_from_chunks(bargs, tail, ch):
    # replicate swell_ax's TPU bucket chain with chunks already built
    from spmv_acc_tpu.ops import swell as S
    (is64, interp, nout, nchunks, copies, tile_rb, rows, delta, log2ds, r, pipe,
     dboths, _fuseds) = st
    order = sorted(range(len(bargs)), key=lambda i: not log2ds[i][4])
    acc = None
    if not log2ds[order[0]][4]:
        acc = jnp.zeros((nout, 2 * ROUT, 128), jnp.float32)
    for j, i in enumerate(order):
        ba = bargs[i]
        log2d, wide, dual, classpos, allout = log2ds[i]
        dboth = dboths[i]
        mode = 2 if j > 0 else (1 if acc is not None else 0)
        ohs = None
        pipe_b = pipe and (not dual or dboth) and ba[-2].shape[0] >= 9
        if len(ba) == 11:
            (cp, cbp, hbp, cn, cbn, hbn, osel, first, ohs, packed, touched) = ba
            csel, cselb, hasb = (cp, cbp, hbp) if pipe_b else (cn, cbn, hbn)
        else:
            csel, cselb, hasb, osel, first, packed, touched = ba
        acc = S._call_f64(csel, cselb, hasb, osel, first, packed, ch,
                          log2d, wide, nout, False, dual, classpos, 1,
                          ohs=ohs, pipe=pipe_b, acc=acc, acc_mode=mode,
                          dboth=dboth)
    o = acc.reshape(nout, 1, 2, ROUT, 128)
    y64 = o[:, :, 0].astype(jnp.float64) + o[:, :, 1].astype(jnp.float64)
    return y64.reshape(-1)[:rows]


from spmv_acc_tpu.ops.swell import ROUT  # noqa: E402

b_us = slope(lambda nn: runB(bargs, dp.tail, chunks, pert, nn))
print(f"{name}: kernels+epilogue {b_us:.1f}us/iter -> prep ~= {a_us - b_us:.1f}us "
      f"({(a_us - b_us) / a_us * 100:.0f}%)", flush=True)
