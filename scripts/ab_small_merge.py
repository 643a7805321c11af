"""A/B the merge policy on the reference's SMALL set (examples/batch.sh:24-50).

PERF_NOTES session 4: af23560 regressed 0.255 -> 0.151 when the merged-fill
default (tuned on the 7-matrix LARGE sweep) was applied to small matrices.
This measures default (merged [+ tiny-collapse]) vs SPMV_TPU_FORCE_MERGE=0
(single) per small matrix on hardware, to decide a size-aware policy gate.

Usage: python scripts/ab_small_merge.py [names...]
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

from spmv_acc_tpu.formats.generate import example_like, random_x_y  # noqa: E402
from spmv_acc_tpu.ops import swell as S  # noqa: E402
from spmv_acc_tpu.utils.stats import bytes_moved, chip_peak_gbs  # noqa: E402

SMALL = ["rajat03", "poli_large", "dw4096", "bayer10", "epb1", "bcsstk18",
         "coater2", "nemeth03", "exdata_1", "af23560"]


def measure(csr, dx, dy):
    run = S.make_swell_run(csr, alpha=1.0, beta=1.0)
    per = max(csr.nnz * 12 / 50e9, 2e-6)
    iters = int(min(8192, max(64, 0.04 / per)))

    def once(nn):
        t = time.perf_counter()
        r = run(dx, dy, nn)
        np.asarray(jax.device_get(r.ravel()[:1]))
        return time.perf_counter() - t

    per_us = 0.0
    for _ in range(3):
        n0, n1 = 1 + iters // 4, 1 + iters
        once(n0); once(n1)
        lo = min(once(n0) for _ in range(3))
        hi = min(once(n1) for _ in range(3))
        per_us = max(hi - lo, 0.0) / (n1 - n0) * 1e6
        if per_us > 0 and per_us * (n1 - n0) > 20e3:
            break
        iters = min(iters * 4, 65536)
    return per_us


def main():
    names = sys.argv[1:] or SMALL
    peak = chip_peak_gbs()
    rows = []
    for name in names:
        csr = example_like(name, dtype=np.float64)
        m, n = csr.shape
        x, y0 = random_x_y(n, m, seed=42, dtype=np.float64)
        dx, dy = jnp.asarray(x), jnp.asarray(y0)
        res = {}
        for policy in ("default", "single"):
            if policy == "single":
                os.environ["SPMV_TPU_FORCE_MERGE"] = "0"
            else:
                os.environ.pop("SPMV_TPU_FORCE_MERGE", None)
            S._SWELL_CACHE.clear()
            dp = S.get_swell_plan(csr, np.float64)
            us = measure(csr, dx, dy)
            rf = bytes_moved(m, csr.nnz, 8) / (us * 1e-6) / 1e9 / peak if us > 0 else 0.0
            res[policy] = (us, rf, dp.plan.fill_efficiency, dp.plan.total_steps)
            print(f"  {name:12s} {policy:8s} {us:8.1f}us rf={rf:.3f} "
                  f"fill={dp.plan.fill_efficiency:.3f} steps={dp.plan.total_steps}",
                  flush=True)
        os.environ.pop("SPMV_TPU_FORCE_MERGE", None)
        S._SWELL_CACHE.clear()
        rows.append((name, res))
    print("\nname          default_rf single_rf  winner")
    wins = {"default": 0, "single": 0}
    import math
    gm = {"default": 0.0, "single": 0.0}
    for name, res in rows:
        d, s = res["default"][1], res["single"][1]
        w = "single" if s > d * 1.02 else ("default" if d > s * 1.02 else "tie")
        if w != "tie":
            wins[w] += 1
        gm["default"] += math.log(max(d, 1e-9))
        gm["single"] += math.log(max(s, 1e-9))
        print(f"{name:12s}  {d:.3f}      {s:.3f}     {w}")
    nr = len(rows)
    if nr:
        print(f"geomean rf: default {math.exp(gm['default']/nr):.4f} "
              f"single {math.exp(gm['single']/nr):.4f}  wins {wins}")


if __name__ == "__main__":
    main()
