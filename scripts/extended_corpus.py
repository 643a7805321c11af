"""One-off verification + timing of the 5 reference large-set matrices not in
the driver bench (kept out of bench.py to bound its runtime).  Results recorded
in PERF_NOTES.md."""
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

names = sys.argv[1:] or ["dielFilterV3real", "RM07R", "vas_stokes_2M",
                         "Cube_Coup_dt6", "Bump_2911"]
for name in names:
    t0 = time.perf_counter()
    csr = example_like(name, dtype=np.float64)
    m, n = csr.shape
    x, y0 = random_x_y(n, m, seed=42, dtype=np.float64)
    out = np.asarray(spmv_swell(1.0, 0.0, csr, jnp.asarray(x), jnp.zeros(m)))
    golden = host_spmv(1.0, 0.0, *csr.to_numpy()[:3], x, np.zeros(m))
    rep = verify_y(out, golden, dtype=np.float64)
    ok = "OK" if rep.failed_count == 0 else f"FAIL({rep.failed_count})"
    run = make_swell_run(csr, alpha=1.0, beta=0.0)
    dx, dy = jnp.asarray(x), jnp.zeros(m)

    def once(nn):
        t = time.perf_counter()
        r = run(dx, dy, nn)
        np.asarray(jax.device_get(r.ravel()[:1]))
        return time.perf_counter() - t

    once(jnp.int32(5)); once(jnp.int32(17))
    lo = min(once(jnp.int32(5)) for _ in range(3))
    hi = min(once(jnp.int32(17)) for _ in range(3))
    per = (hi - lo) / 12
    gbs = bytes_moved(m, csr.nnz, 8, 4) / per / 1e9
    roof = gbs / chip_peak_gbs()
    dp = get_swell_plan(csr, np.float64)
    print(f"{name}: verify={ok} maxerr={rep.max_error:.2e} {per*1e6:.0f}us/iter "
          f"{gbs:.1f}GB/s roofline={roof:.3f} fill={dp.plan.fill_efficiency:.3f} "
          f"steps={dp.plan.total_steps} total={time.perf_counter()-t0:.0f}s", flush=True)
