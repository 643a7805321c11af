"""Phase breakdown for a small matrix: prep / per-bucket / combine+tail.

Times, via chained on-device loops (slope of two lengths), these variants of
one SpMV iteration: full swell_ax; x-prep only; prefix sums of buckets
(prep + buckets[0..j]).  The deltas isolate each bucket call's cost including
its pallas fixed overhead — the per-call floor VERDICT r2 #3 targets.

Usage: python scripts/phase_small.py [matrix]
"""
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
from spmv_acc_tpu.ops import swell as S


def timed(fn, x0, iters=2048):
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


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "af23560"
    csr = example_like(name, dtype=np.float64)
    m, n = csr.shape
    dp = S.get_swell_plan(csr, np.float64)
    bargs = S._bucket_args(dp, False)
    st = S._statics(dp, False)
    tail = (jnp.asarray(dp.plan.tail_rows), jnp.asarray(dp.plan.tail_ci),
            jnp.asarray(dp.plan.tail_v))
    x, _ = random_x_y(n, m, seed=42, dtype=np.float64)
    dx = jnp.asarray(x)
    (is64, interp, nout, nchunks, copies, tile_rb, rows, delta, log2ds, r, pipe,
     dboths, fuseds) = st
    print(f"{name}: rows={m} nnz={csr.nnz} buckets={len(bargs)} "
          f"steps={dp.plan.total_steps} nout={nout} nchunks={nchunks} "
          f"tail={dp.plan.tail_rows.shape[0]}")
    for i, (ld, wide, dual, cpos, allout) in enumerate(log2ds):
        print(f"  bucket {i}: D={1 << ld} wide={int(wide)} dual={int(dual)} "
              f"cpos={int(cpos)} allout={int(allout)} steps={bargs[i][-2].shape[0]}")

    full = timed(lambda xx: S.swell_ax(bargs, tail, xx, st), dx)
    print(f"full swell_ax: {full:.1f} us/iter")

    def prep_only(xx):
        ch = S._prep_x_pure(xx, nchunks, is64, native=False, delta=delta, r=r)
        # consume: tiny slice back to (rows,) f64 so the loop can feed back
        return xx * (1.0 + ch[0, 0, 0].astype(jnp.float64) * 1e-30)

    print(f"prep only:     {timed(prep_only, dx):.1f} us/iter")

    for j in range(1, len(bargs) + 1):
        sub_bargs = bargs[:j]
        sub_l2 = log2ds[:j]
        sub_db = dboths[:j] if dboths else dboths
        sub_fu = fuseds[:j] if fuseds else fuseds
        st_j = (is64, interp, nout, nchunks, copies, tile_rb, rows, delta,
                sub_l2, r, pipe, sub_db, sub_fu)
        t = timed(lambda xx: S.swell_ax(sub_bargs, (tail[0][:0], tail[1][:0],
                                                    tail[2][:0]), xx, st_j), dx)
        print(f"prep+buckets[0:{j}]: {t:.1f} us/iter")


if __name__ == "__main__":
    main()
