"""A/B the pipelined fused kernel (SPMV_TPU_PIPE3) end-to-end on hardware.

fused3 (_call_fused3) splits the fused iteration into three independent
stages (tables s | gather/Dekker/fold s-1 | scatter/chain s-2) so Mosaic's
in-order issue overlaps MXU and VPU chains.  Per-bucket probe (boneS10):
fused 453/566/614 -> fused3 406/527/452 ns/step (rowpack D=8/D=4, cpos D=2).
Outputs are bit-identical; this measures the production end-to-end effect.

Usage: python scripts/ab_pipe3.py [names...]
"""
import math
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
from spmv_acc_tpu.ops.golden import host_spmv_plain  # noqa: E402
from spmv_acc_tpu.utils.stats import bytes_moved, chip_peak_gbs  # noqa: E402

DEFAULT = ["boneS10", "Hardesty3", "Bump_2911", "largebasis", "Ga41As41H72"]


def measure(csr, dx, dy):
    run = S.make_swell_run(csr, alpha=1.0, beta=0.0)
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
    names = sys.argv[1:] or DEFAULT
    peak = chip_peak_gbs()
    rows = []
    for name in names:
        csr = example_like(name, dtype=np.float64)
        m, n = csr.shape
        x, _ = random_x_y(n, m, seed=42, dtype=np.float64)
        golden = host_spmv_plain(csr.row_ptr, csr.col_idx, csr.values, x)
        gn = np.maximum(np.abs(golden), 1e-300)
        dx, dy = jnp.asarray(x), jnp.asarray(np.zeros(m))
        res = {}
        for policy in ("fused", "fused3"):
            os.environ["SPMV_TPU_PIPE3"] = "0" if policy == "fused" else "1"
            dp = S.get_swell_plan(csr, np.float64)
            y = np.asarray(S.swell_spmv_f64(dp, dx))[:m]
            err = float(np.max(np.abs(y - golden) / gn))
            assert err < 5e-7, f"{name}/{policy}: raw maxrel {err:.2e} >= 5e-7"
            us = measure(csr, dx, dy)
            rf = (bytes_moved(m, csr.nnz, 8) / (us * 1e-6) / 1e9 / peak
                  if us > 0 else 0.0)
            res[policy] = (us, rf)
            print(f"  {name:14s} {policy:6s} {us:8.1f}us rf={rf:.3f} "
                  f"maxrel={err:.2e}", flush=True)
        os.environ.pop("SPMV_TPU_PIPE3", None)
        rows.append((name, res))
    print("\nname            fused_rf fused3_rf  delta")
    gm = 0.0
    for name, res in rows:
        l, x2 = res["fused"][1], res["fused3"][1]
        gm += math.log(max(x2 / max(l, 1e-9), 1e-9))
        print(f"{name:14s}  {l:.3f}    {x2:.3f}   {100*(x2/l-1):+.1f}%")
    if rows:
        print(f"geomean fused3/fused: {math.exp(gm/len(rows)):.4f}")


if __name__ == "__main__":
    main()
