"""Profile the ILU(0) setup split (VERDICT r4 #5: Ga41 factor+plans was 20.7s).

Phases timed separately: SPD construction (outside the bench's timer, for
context), native ilu0 factor, analyze_trisolve (level schedule) per factor,
strict-part CSR extraction, and the two swell plan builds/loads.

Usage: python scripts/profile_ilu.py [matrix]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("SPMV_FORCE_CPU"):
    # everything measured here is host-side; forcing cpu keeps the profile
    # runnable while the axon tunnel is down (backend init hangs otherwise)
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from spmv_acc_tpu.formats.containers import CSR
from spmv_acc_tpu.formats.convert import coo_to_csr_arrays
from spmv_acc_tpu.formats.generate import example_like
from spmv_acc_tpu.ops import trisolve as T
from spmv_acc_tpu.ops.swell import get_swell_plan


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "Ga41As41H72"
    t0 = time.perf_counter()
    csr0 = example_like(name, dtype=np.float64)
    rp, ci, v, (m, _) = csr0.to_numpy()
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
    csr = CSR.from_numpy(rp2, ci2, v2, (m, m))
    print(f"{name}-SPD m={m} nnz={len(ci2)}: construct {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    lu = T.ilu0_host(rp2, ci2, v2, (m, m))
    print(f"native ilu0 factor: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    l_plan = T.analyze_trisolve(rp2, ci2, lu, (m, m), lower=True, unit_diag=True)
    t1 = time.perf_counter()
    u_plan = T.analyze_trisolve(rp2, ci2, lu, (m, m), lower=False, unit_diag=False)
    t2 = time.perf_counter()
    print(f"analyze_trisolve: L {t1-t0:.1f}s U {t2-t1:.1f}s "
          f"(levels L={l_plan.num_levels} U={u_plan.num_levels})", flush=True)

    t0 = time.perf_counter()
    csr_l = T._strict_part_csr(rp2, ci2, lu, (m, m), lower=True)
    csr_u = T._strict_part_csr(rp2, ci2, lu, (m, m), lower=False)
    print(f"strict-part extraction: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    dp_l = get_swell_plan(csr_l, lu.dtype)
    t1 = time.perf_counter()
    dp_u = get_swell_plan(csr_u, lu.dtype)
    t2 = time.perf_counter()
    print(f"swell plans: L {t1-t0:.1f}s U {t2-t1:.1f}s "
          f"(fill L={dp_l.plan.fill_efficiency:.2f} U={dp_u.plan.fill_efficiency:.2f})",
          flush=True)


if __name__ == "__main__":
    main()
