"""A/B the in-kernel aliased cross-bucket accumulator (SPMV_TPU_NO_ACC toggles).

Usage: python scripts/ab_acc.py [matrix ...]   (env SPMV_TPU_NO_ACC=1 for baseline)
Verifies the RAW kernel output against the CPU golden and times the chained loop.
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

from spmv_acc_tpu.formats.generate import example_like, random_x_y
from spmv_acc_tpu.ops.golden import host_spmv
from spmv_acc_tpu.ops.swell import get_swell_plan, make_swell_run, spmv_swell
from spmv_acc_tpu.utils.stats import bytes_moved, chip_peak_gbs
from spmv_acc_tpu.utils.verify import verify_y

DT = np.float64
DEFAULT = ["af23560", "Hardesty3", "boneS10", "Bump_2911", "vas_stokes_2M",
           "RM07R", "TSOPF_RS_b2383"]


def main():
    names = sys.argv[1:] or DEFAULT
    mode = "NO_ACC" if os.environ.get("SPMV_TPU_NO_ACC") else "acc"
    os.environ["SPMV_TPU_NO_REFINE"] = "1"
    print(f"mode={mode} device={jax.devices()[0].device_kind}", flush=True)
    peak = chip_peak_gbs()
    for name in names:
        t0 = time.perf_counter()
        csr = example_like(name, dtype=DT)
        m, n = csr.shape
        x, _ = random_x_y(n, m, seed=42, dtype=DT)
        dx = jnp.asarray(x)
        dp = get_swell_plan(csr, DT)
        nb = len(dp.buckets) if hasattr(dp, "buckets") else -1
        out = np.asarray(spmv_swell(1.0, 0.0, csr, dx, jnp.zeros(m)))
        golden = host_spmv(1.0, 0.0, *csr.to_numpy()[:3], x, np.zeros(m))
        rep = verify_y(out, golden, dtype=DT)
        run = make_swell_run(csr, alpha=1.0, beta=1.0)
        dy = jnp.zeros(m)

        def once(nn):
            t = time.perf_counter()
            r = run(dx, dy, nn)
            np.asarray(jax.device_get(r.ravel()[:1]))
            return time.perf_counter() - t

        iters = int(min(4096, max(64, 0.04 / max(csr.nnz * 12 / 50e9, 2e-6))))
        n0, n1 = 1 + iters // 4, 1 + iters
        once(n0); once(n1)
        lo = min(once(n0) for _ in range(3))
        hi = min(once(n1) for _ in range(3))
        per_us = max(hi - lo, 0.0) / (n1 - n0) * 1e6
        b = bytes_moved(m, csr.nnz, 8)
        gbs = b / (per_us * 1e-6) / 1e9 if per_us > 0 else 0.0
        print(f"{name}: buckets={nb} {per_us:.1f}us roofline={gbs/peak:.3f} "
              f"verify={'OK' if rep.ok else 'FAIL'} maxerr={rep.max_error:.2e} "
              f"wall={time.perf_counter()-t0:.0f}s", flush=True)
        from spmv_acc_tpu.ops import swell as _s
        _s._SWELL_CACHE.clear()


if __name__ == "__main__":
    main()
