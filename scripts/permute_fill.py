"""VERDICT r4 #2: GLOBAL count-grouped row permutation — fill measurement.

Round-3 measured that sorting rows (by length, or (dominant-window, length))
WITHIN groups of 2-4 row-blocks loses fill everywhere (PERF_NOTES dead ends:
boneS10 0.468 -> 0.30-0.38).  The round-4 verdict asks for the GLOBAL variant:
group all similar-count rows so every 128-lane slab sees uniform per-lane
counts (slabfill holes = within-instance count variance), accepting that the
inverse permutation would then need an in-kernel one-hot unpermute pass.

This script measures the FILL side of that trade on real plans: build the
swell plan for (a) the native order, (b) rows globally stable-sorted by
row count (count-grouped, order preserved within a count class), and
(c) rows sorted by (count, first-column) — the variant that tries to keep
column locality within count classes.  If fill does not improve, the lever is
closed before any unpermute kernel work: the permutation fragments the
window-sharing structure that the packing exploits (chunk-pair locality),
exactly as the grouped variants did.

Usage: SPMV_FORCE_CPU=1 python scripts/permute_fill.py [names...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("SPMV_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import numpy as np

os.environ.setdefault("SPMV_TPU_NO_PLAN_CACHE", "1")

from spmv_acc_tpu.formats.containers import CSR
from spmv_acc_tpu.formats.generate import example_like
from spmv_acc_tpu.ops.swell_plan import build_swell_plan


def permuted(csr, perm):
    rp, ci, v, shape = csr.to_numpy()
    rp = np.asarray(rp).astype(np.int64)
    lens = np.diff(rp)
    new_lens = lens[perm]
    new_rp = np.zeros(len(rp), rp.dtype)
    np.cumsum(new_lens, out=new_rp[1:])
    src = np.repeat(rp[perm], new_lens) + (
        np.arange(int(new_lens.sum())) - np.repeat(new_rp[:-1], new_lens))
    return CSR.from_numpy(new_rp.astype(np.int32), np.asarray(ci)[src],
                          np.asarray(v)[src], shape)


def fill_of(csr, tag):
    t0 = time.perf_counter()
    plan = build_swell_plan(*csr.to_numpy())
    print(f"  {tag:24s} fill={plan.fill_efficiency:.3f} steps={plan.total_steps} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    return plan.fill_efficiency


def main():
    names = sys.argv[1:] or ["boneS10", "largebasis", "Bump_2911"]
    for name in names:
        csr = example_like(name, dtype=np.float64)
        rp = np.asarray(csr.row_ptr).astype(np.int64)
        lens = np.diff(rp)
        ci0 = np.asarray(csr.col_idx)
        first_col = np.where(lens > 0, ci0[np.minimum(rp[:-1], len(ci0) - 1)], 0)
        m = csr.shape[0]
        print(f"{name}: m={m} nnz={csr.nnz} row-count classes="
              f"{len(np.unique(lens))}", flush=True)
        f0 = fill_of(csr, "native")
        perm_c = np.argsort(lens, kind="stable")
        fc = fill_of(permuted(csr, perm_c), "count-grouped")
        perm_cc = np.lexsort((first_col, lens))
        fcc = fill_of(permuted(csr, perm_cc), "count+firstcol")
        print(f"  => native {f0:.3f} | count {fc:.3f} ({fc-f0:+.3f}) | "
              f"count+col {fcc:.3f} ({fcc-f0:+.3f})", flush=True)


if __name__ == "__main__":
    main()
