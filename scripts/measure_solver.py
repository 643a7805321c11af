"""Solver-path timing at bench scale (VERDICT r2 #6).

Times, on real TPU hardware, for an SPD-ized bench-scale FEM matrix:
  * ILU(0) factor (host, native C++)
  * one preconditioner apply M^{-1} r — swell-backed sweeps vs the XLA
    gather/segment_sum path
  * one SpMV (the thing being preconditioned) for the cost ratio
  * CG iteration counts: unpreconditioned / Jacobi / ILU(0)+sweeps

Reference economics analog: the SpMVAccHanele phase split
(/root/reference/src/acc/api/handle.h:8-13) — analyze cost vs per-call cost.

Usage: python scripts/measure_solver.py [matrix] [--sweeps N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def spd_like(name):
    """SPD-ize the bench stand-in sparsely: 0.5(A + A^T) + diagonal dominance."""
    from spmv_acc_tpu.formats.containers import CSR
    from spmv_acc_tpu.formats.convert import coo_to_csr_arrays
    from spmv_acc_tpu.formats.generate import example_like

    csr = example_like(name, dtype=np.float64)
    rp, ci, v, (m, n) = csr.to_numpy()
    rp = np.asarray(rp); ci = np.asarray(ci); v = np.asarray(v)
    rr = np.repeat(np.arange(m, dtype=np.int64), np.diff(rp))
    off = ci != rr
    rr_s = np.concatenate([rr[off], ci[off], np.arange(m, dtype=np.int64)])
    cc_s = np.concatenate([ci[off], rr[off], np.arange(m, dtype=np.int64)])
    dom = np.zeros(m)
    np.add.at(dom, rr[off], 0.5 * np.abs(v[off]))
    np.add.at(dom, ci[off], 0.5 * np.abs(v[off]))
    v_s = np.concatenate([0.5 * v[off], 0.5 * v[off], dom + 1.0])
    rp2, ci2, v2 = coo_to_csr_arrays(rr_s, cc_s, v_s, (m, m))
    return CSR.from_numpy(rp2, ci2, v2, (m, m))


def time_loop(fn, init, iters=32):
    from spmv_acc_tpu.utils.timer import time_device_loop

    per_us, _ = time_device_loop(fn, init, iters=iters)
    return per_us


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "boneS10"
    sweeps = int(sys.argv[sys.argv.index("--sweeps") + 1]) if "--sweeps" in sys.argv else 3
    from spmv_acc_tpu.models.cg import cg_solve, jacobi_preconditioner
    from spmv_acc_tpu.ops.swell import _bucket_args, _statics, get_swell_plan, swell_ax
    from spmv_acc_tpu.ops.trisolve import ILU0, ilu0

    t0 = time.perf_counter()
    csr = spd_like(name)
    m = csr.rows
    print(f"{name}-SPD: m={m} nnz={csr.nnz} build {time.perf_counter()-t0:.0f}s",
          flush=True)

    t0 = time.perf_counter()
    fact = ilu0(csr, sweeps=sweeps)
    t_factor = time.perf_counter() - t0
    print(f"ilu0 factor+plans: {t_factor:.1f}s (sweeps={fact.sweeps}, "
          f"swell_backed={fact.swell is not None}, "
          f"L levels={fact.l_plan.num_levels})", flush=True)

    # SpMV reference cost
    dp = get_swell_plan(csr, np.float64)
    bargs, st = _bucket_args(dp, False), _statics(dp, False)
    x0 = jnp.ones((m,), jnp.float64)

    def spmv_step(v):
        y = swell_ax(bargs, dp.tail, v, st)[:m]
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

    us_spmv = time_loop(spmv_step, x0, iters=24)
    print(f"spmv: {us_spmv:.0f} us/iter", flush=True)

    # preconditioner apply: swell-backed
    if fact.swell is not None:
        from spmv_acc_tpu.ops.trisolve import sweep_apply_swell
        sw = fact.swell
        pargs = sw.args()

        @jax.jit
        def apply_loop(pargs, r, n):
            def body(i, cur):
                z = sweep_apply_swell(sw.statics_l, sw.statics_u, fact.sweeps,
                                      m, pargs, cur)
                return z * jax.lax.rsqrt(jnp.mean(z * z) + 1e-30)

            return jax.lax.fori_loop(0, n, body, r)

        def once(nn):
            t = time.perf_counter()
            out = apply_loop(pargs, x0, nn)
            np.asarray(jax.device_get(out.ravel()[:1]))
            return time.perf_counter() - t

        n0, n1 = 3, 9
        once(n0); once(n1)
        lo = min(once(n0) for _ in range(3))
        hi = min(once(n1) for _ in range(3))
        us_apply = (hi - lo) / (n1 - n0) * 1e6
        print(f"ILU apply (swell, {fact.sweeps} sweeps): {us_apply:.0f} us "
              f"= {us_apply/us_spmv:.2f}x SpMV", flush=True)

    # gather-path apply for contrast (few iters — expected much slower)
    ref = ILU0(fact.l_plan, fact.u_plan, sweeps=fact.sweeps, swell=None)

    @jax.jit
    def gather_loop(r, n):
        def body(i, cur):
            z = ref.solve(cur)
            return z * jax.lax.rsqrt(jnp.mean(z * z) + 1e-30)

        return jax.lax.fori_loop(0, n, body, r)

    def once_g(nn):
        t = time.perf_counter()
        out = gather_loop(x0, nn)
        np.asarray(jax.device_get(out.ravel()[:1]))
        return time.perf_counter() - t

    once_g(1); t1 = min(once_g(1) for _ in range(2)); t3 = min(once_g(3) for _ in range(2))
    us_gather = (t3 - t1) / 2 * 1e6
    print(f"ILU apply (gather path): {us_gather:.0f} us = "
          f"{us_gather/us_spmv:.1f}x SpMV", flush=True)

    # CG iteration counts at tol 1e-8
    rng = np.random.default_rng(5)
    x_true = rng.standard_normal(m)
    from spmv_acc_tpu.ops.golden import host_spmv
    rpn, cin, vn, _ = csr.to_numpy()
    b = jnp.asarray(host_spmv(1.0, 0.0, rpn, cin, vn, x_true, np.zeros(m)))
    for label, pre in (("none", None), ("jacobi", jacobi_preconditioner(csr)),
                       (f"ilu0x{fact.sweeps}", fact)):
        t0 = time.perf_counter()
        res = cg_solve(csr, b, tol=1e-8, max_iters=400, strategy="swell", precond=pre)
        dt = time.perf_counter() - t0
        err = float(np.linalg.norm(np.asarray(res.x) - x_true)
                    / np.linalg.norm(x_true))
        print(f"cg[{label}]: iters={int(res.iters)} rel_err={err:.2e} "
              f"wall={dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
