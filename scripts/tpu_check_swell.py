"""On-device validation + timing of the swell kernel (real TPU path)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from spmv_acc_tpu.formats.generate import banded_csr, example_like, random_x_y
from spmv_acc_tpu.ops.golden import host_spmv
from spmv_acc_tpu.ops.swell import get_swell_plan, spmv_swell
from spmv_acc_tpu.utils.verify import verify_y

print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)

CASES = {
    "rajat03": lambda: example_like("rajat03", dtype=np.float64),
    "af23560": lambda: example_like("af23560", dtype=np.float64),
    "banded200k": lambda: banded_csr(200000, bandwidth=5, seed=3, dtype=np.float64),
    "banded2M": lambda: banded_csr(2000000, bandwidth=7, seed=4, dtype=np.float64),
}

for name, make in CASES.items():
    csr = make()
    m, n = csr.shape
    x, y = random_x_y(n, m, seed=42, dtype=np.float64)
    t0 = time.perf_counter()
    dp = get_swell_plan(csr, np.float64)
    t_plan = time.perf_counter() - t0
    out = np.asarray(spmv_swell(1.0, 0.0, csr, jnp.asarray(x), jnp.zeros(m)))
    golden = host_spmv(1.0, 0.0, *csr.to_numpy()[:3], x, np.zeros(m))
    rep = verify_y(out, golden, dtype=np.float64)

    from spmv_acc_tpu.ops.swell import make_swell_run
    import time as _t
    run = make_swell_run(csr, alpha=1.0, beta=0.0)
    dy = jnp.zeros(m)
    dx = jnp.asarray(x)

    def once(nn):
        t = _t.perf_counter()
        r = run(dx, dy, nn)
        np.asarray(jax.device_get(r.ravel()[:1]))
        return _t.perf_counter() - t

    # slope between two LARGE loop lengths (an n=1 baseline mixes fixed costs
    # nonlinearly; see PERF_NOTES.md)
    n0, n1 = 65, 257
    once(n0); once(n1)
    lo = min(once(n0) for _ in range(3))
    hi = min(once(n1) for _ in range(3))
    per_us = max(hi - lo, 0.0) / (n1 - n0) * 1e6
    bmodel = 8 * (2 * m + csr.nnz) + 4 * (m + 1 + csr.nnz)
    gbs = bmodel / (per_us * 1e-6) / 1e9 if per_us > 0 else 0
    print(
        f"{name}: m={m} nnz={csr.nnz} fill={dp.plan.fill_efficiency:.3f} steps={dp.plan.total_steps} "
        f"plan={t_plan*1e3:.0f}ms  verify={'OK' if rep.ok else 'FAIL'} maxerr={rep.max_error:.2e}  "
        f"{per_us:.1f}us/iter  {gbs:.1f} GB/s(model)  roofline={gbs/819:.3f}",
        flush=True,
    )
