"""Hardware A/B for the TPU dispatch gate (VERDICT r4 #7): swell vs flat on a
sub-0.02-fill matrix.

The round-4 instance-spill dead-end measured the swell kernel at 8.3 ns/nnz on
uniform-scatter power-law 200k (plan fill 0.003) vs ~118 ns/element for the
XLA segment paths — this script records the direct swell-vs-'flat'-strategy
comparison that justifies SWELL_MIN_FILL = 0.001 (the old 0.02 gate sent this
matrix to flat).

Usage: python scripts/ab_gate.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spmv_acc_tpu.formats.generate import powerlaw_csr, random_x_y  # noqa: E402
from spmv_acc_tpu.ops import swell as S  # noqa: E402
from spmv_acc_tpu.ops.golden import host_spmv_plain  # noqa: E402
from spmv_acc_tpu import dispatch  # noqa: E402
from spmv_acc_tpu.utils.timer import time_device_loop  # noqa: E402
from spmv_acc_tpu.utils.verify import verify_y  # noqa: E402


def main():
    m = 200_000
    csr = powerlaw_csr(m, m, avg_nnz=7, seed=13, dtype=np.float64)
    dp = S.get_swell_plan(csr, np.float64)
    print(f"power-law {m}: nnz={csr.nnz} plan fill={dp.plan.fill_efficiency:.4f}",
          flush=True)
    x, _ = random_x_y(m, m, seed=3, dtype=np.float64)
    golden = host_spmv_plain(csr.row_ptr, csr.col_idx, csr.values, x)
    dx, dy = jnp.asarray(x), jnp.asarray(np.zeros(m))
    for strat in ("swell", "flat"):
        out = np.asarray(dispatch.spmv(csr, dx, dy, alpha=1.0, beta=0.0,
                                       strategy=strat))
        rep = verify_y(out, golden)
        fn = dispatch.make_spmv_fn(csr, strategy=strat, alpha=1.0, beta=0.0)

        def step(v):
            y = fn(v, dy)
            return v * (1.0 + jnp.mean((y * y).astype(jnp.float32)).astype(v.dtype) * 1e-30)

        per_us, _ = time_device_loop(step, dx, iters=16)
        print(f"  {strat:6s}: {per_us:9.1f} us/iter ({per_us*1e3/csr.nnz:.1f} ns/nnz) "
              f"verify={'OK' if rep.ok else 'FAIL'} maxerr={rep.max_error:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
