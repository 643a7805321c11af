"""Column-remap (x-remap analog) fill experiment — CPU-side plan simulation.

The reference reorders x for column-first access locality
(hip-thread-row/thread_row_x_remap.inl:38-60, thread_row_block_x_remap.hpp).
The TPU translation: permute COLUMNS (and x) so each 128-row block's nnz
densify into fewer 256-col swell windows — fill multiplies the roofline
ceiling directly.  Unlike the row-regrouping dead end (PERF_NOTES), the
inverse permutation rides the INPUT side for free: spmv(A P^T, P x) == A x,
i.e. x is permuted once per call (a cheap XLA gather at n elements, NOT nnz),
and y is untouched.

Permutations tried:
  first_use  new col id = order of first appearance scanning rows (the direct
             x-remap analog)
  degree     columns sorted by descending nnz count
  blockfirst first-use computed over 128-row blocks (block-major first touch)

Usage: python scripts/colremap_fill.py [matrices...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPMV_TPU_NO_BSR", "")

import numpy as np  # noqa: E402


def first_use_perm(rp, ci, n, block_rows=None, m=None):
    """perm[old_col] = new col id, by order of first appearance."""
    if block_rows is None:
        order = ci
    else:
        # visit cols block-major: all rows of block 0, then block 1, ...
        order = ci  # CSR is already row-major == block-major for fixed blocks
    seen = np.zeros(n, dtype=bool)
    perm = np.full(n, -1, dtype=np.int64)
    nxt = 0
    # vectorized first-appearance: index of first occurrence of each col
    first_pos = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_pos, order, np.arange(len(order), dtype=np.int64))
    untouched = first_pos == np.iinfo(np.int64).max
    rank = np.argsort(first_pos, kind="stable")
    perm[rank] = np.arange(n, dtype=np.int64)
    del seen, nxt, untouched
    return perm


def degree_perm(ci, n):
    cnt = np.bincount(ci, minlength=n)
    rank = np.argsort(-cnt, kind="stable")
    perm = np.empty(n, dtype=np.int64)
    perm[rank] = np.arange(n, dtype=np.int64)
    return perm


def plan_fill(rp, ci, v, shape):
    from spmv_acc_tpu.ops.swell_plan import build_swell_plan

    t0 = time.perf_counter()
    p = build_swell_plan(rp, ci, v, shape)
    dt = time.perf_counter() - t0
    return p.fill_efficiency, p.total_steps, p.tail_rows.shape[0], dt


def apply_col_perm(rp, ci, v, perm):
    """A' = A P^T: col j -> perm[j]; re-sort cols within rows."""
    nci = perm[ci]
    # sort within each row
    m = len(rp) - 1
    order = np.argsort(np.repeat(np.arange(m, dtype=np.int64), np.diff(rp)) * (perm.shape[0] + 1)
                       + nci, kind="stable")
    return nci[order].astype(ci.dtype), v[order]


def main():
    from spmv_acc_tpu.formats.generate import example_like

    names = sys.argv[1:] or ["largebasis", "af23560"]
    for name in names:
        csr = example_like(name, dtype=np.float64)
        rp, ci, v, shape = csr.to_numpy()
        rp = np.asarray(rp); ci = np.asarray(ci); v = np.asarray(v)
        n = shape[1]
        f0, s0, t0, dt = plan_fill(rp, ci, v, shape)
        print(f"{name}: baseline fill={f0:.3f} steps={s0} tail={t0} ({dt:.0f}s)",
              flush=True)
        for pname, perm in (("first_use", first_use_perm(rp, ci, n)),
                            ("degree", degree_perm(ci, n))):
            nci, nv = apply_col_perm(rp, ci, v, perm)
            f, s, t, dt = plan_fill(rp, nci, nv, shape)
            print(f"{name}: {pname:10s} fill={f:.3f} steps={s} tail={t} "
                  f"({dt:.0f}s)  {'WIN' if f > f0 * 1.03 else ''}", flush=True)


if __name__ == "__main__":
    main()
