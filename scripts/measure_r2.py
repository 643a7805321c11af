"""Round-2 TPU measurement battery — run on real hardware the moment the tunnel
is up.  Covers the VERDICT round-1 measurement items in one pass:

  1. BSR micro-block A/B per FEM matrix (SPMV_TPU_NO_BSR=1 scalar vs auto BSR):
     us/iter, roofline, verify (VERDICT next-round #1).
  2. SpMM k=8 vs 8 chained SpMVs on TSOPF/boneS10 (#5, target >= 3x).
  3. acsr vs swell vs light on a power-law matrix (#10's A/B number).

Usage: python scripts/measure_r2.py [bsr|spmm|acsr] ...   (default: all)
Each section prints one line per measurement; record results in PERF_NOTES.md.

NOTE: BSR A/B flips SPMV_TPU_NO_BSR, which is part of the plan-cache key, so
both variants disk-cache independently (first run pays one plan build each).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from spmv_acc_tpu.formats.generate import example_like, powerlaw_csr, random_x_y
from spmv_acc_tpu.ops.golden import host_spmv
from spmv_acc_tpu.ops.swell import get_swell_plan, make_swell_run, spmv_swell
from spmv_acc_tpu.utils.stats import bytes_moved, chip_peak_gbs
from spmv_acc_tpu.utils.verify import verify_y

DT = np.float64
FEM = ["boneS10", "Bump_2911", "Cube_Coup_dt6", "RM07R", "dielFilterV3real"]
SPMM = ["TSOPF_RS_b2383", "boneS10"]
K = 8


def _clear():
    from spmv_acc_tpu.ops import swell as _s

    _s._SWELL_CACHE.clear()


def time_chained_swell(csr, dx, dy, iters):
    run = make_swell_run(csr, alpha=1.0, beta=1.0)

    def once(nn):
        t = time.perf_counter()
        r = run(dx, dy, nn)
        np.asarray(jax.device_get(r.ravel()[:1]))
        return time.perf_counter() - t

    n0, n1 = 1 + iters // 4, 1 + iters
    once(n0); once(n1)
    lo = min(once(n0) for _ in range(3))
    hi = min(once(n1) for _ in range(3))
    return max(hi - lo, 0.0) / (n1 - n0) * 1e6


def iters_for(nnz):
    per = max(nnz * 12 / 50e9, 2e-6)
    return int(min(8192, max(64, 0.04 / per)))


def sec_bsr(names):
    print("== BSR micro-block A/B (scalar vs auto) ==", flush=True)
    peak = chip_peak_gbs()
    for name in names:
        csr = example_like(name, dtype=DT)
        m, n = csr.shape
        x, y0 = random_x_y(n, m, seed=42, dtype=DT)
        dx, dy = jnp.asarray(x), jnp.asarray(y0)
        golden = host_spmv(1.0, 0.0, *csr.to_numpy()[:3], x, np.zeros(m))
        row = [name]
        for label, env in (("scalar", "1"), ("bsr", "")):
            os.environ.pop("SPMV_TPU_NO_BSR", None)
            if env:
                os.environ["SPMV_TPU_NO_BSR"] = env
            _clear()
            t0 = time.perf_counter()
            dp = get_swell_plan(csr, DT)
            t_plan = time.perf_counter() - t0
            out = np.asarray(spmv_swell(1.0, 0.0, csr, dx, jnp.zeros(m)))
            rep = verify_y(out, golden, dtype=DT)
            per = time_chained_swell(csr, dx, dy, iters_for(csr.nnz))
            gbs = bytes_moved(m, csr.nnz, 8) / (per * 1e-6) / 1e9 if per > 0 else 0
            row.append(f"{label}: r={dp.r} {per:.1f}us rf={gbs / peak:.3f} "
                       f"fill={dp.plan.fill_efficiency:.3f} plan={t_plan:.1f}s "
                       f"verify={'OK' if rep.ok else 'FAIL'}")
        os.environ.pop("SPMV_TPU_NO_BSR", None)
        print("  " + " | ".join(row), flush=True)
        _clear()


def sec_spmm(names):
    print("== SpMM k=8 vs chained SpMV ==", flush=True)
    from spmv_acc_tpu.ops.swell import make_swell_amx_run

    for name in names:
        csr = example_like(name, dtype=DT)
        m, n = csr.shape
        x, y0 = random_x_y(n, m, seed=42, dtype=DT)
        dx, dy = jnp.asarray(x), jnp.asarray(y0)
        per_v = time_chained_swell(csr, dx, dy, iters_for(csr.nnz))
        rng = np.random.default_rng(7)
        X = jnp.asarray(rng.uniform(-1, 1, size=(n, K)).astype(DT))
        run = make_swell_amx_run(csr, K)

        def once(nn):
            t = time.perf_counter()
            r = run(X, nn)
            np.asarray(jax.device_get(r.ravel()[:1]))
            return time.perf_counter() - t

        it = max(16, iters_for(csr.nnz) // K)
        n0, n1 = 1 + it // 4, 1 + it
        once(n0); once(n1)
        lo = min(once(n0) for _ in range(3))
        hi = min(once(n1) for _ in range(3))
        per_m = max(hi - lo, 0.0) / (n1 - n0) * 1e6
        # SpMM correctness vs golden
        from spmv_acc_tpu.ops.spmm import spmm_swell

        Xs = np.asarray(X)
        got = np.asarray(spmm_swell(1.0, 0.0, csr, X, jnp.zeros((m, K))))
        ok = all(
            verify_y(got[:, c],
                     host_spmv(1.0, 0.0, *csr.to_numpy()[:3], Xs[:, c], np.zeros(m)),
                     dtype=DT).ok
            for c in range(K)
        )
        sp = K * per_v / per_m if per_m > 0 else 0.0
        print(f"  {name}: spmv {per_v:.1f}us, spmm(k={K}) {per_m:.1f}us "
              f"-> {sp:.2f}x (target >=3x) verify={'OK' if ok else 'FAIL'}", flush=True)
        _clear()


def sec_acsr():
    print("== acsr vs swell vs light on power-law ==", flush=True)
    from spmv_acc_tpu.dispatch import make_spmv_fn
    from spmv_acc_tpu.utils.timer import time_device_loop

    csr = powerlaw_csr(200_000, 200_000, avg_nnz=12, seed=5, dtype=DT)
    m, n = csr.shape
    x, y0 = random_x_y(n, m, seed=42, dtype=DT)
    dx, dy = jnp.asarray(x), jnp.asarray(y0)
    golden = host_spmv(1.0, 0.0, *csr.to_numpy()[:3], x, np.zeros(m))
    for strat in ("acsr", "light", "vector_row", "swell"):
        try:
            from spmv_acc_tpu.dispatch import spmv

            out = np.asarray(spmv(csr, dx, jnp.zeros(m), strategy=strat))
            rep = verify_y(out, golden, dtype=DT)
            if strat == "swell":
                per = time_chained_swell(csr, dx, dy, iters_for(csr.nnz))
            else:
                fn, _ = make_spmv_fn(csr, alpha=1.0, beta=1.0, strategy=strat)

                def step(xx):
                    ax = fn(xx, dy)
                    return ax * jax.lax.rsqrt(jnp.mean(ax * ax) + 1e-30)

                per, _ = time_device_loop(step, dx, iters=iters_for(csr.nnz))
            print(f"  {strat}: {per:.1f}us verify={'OK' if rep.ok else 'FAIL'}", flush=True)
        except Exception as e:
            print(f"  {strat}: ERROR {type(e).__name__}: {e}", flush=True)
    _clear()


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"bsr", "spmm", "acsr"}
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind})", flush=True)
    if "bsr" in which:
        sec_bsr(FEM)
    if "spmm" in which:
        sec_spmm(SPMM)
    if "acsr" in which:
        sec_acsr()
