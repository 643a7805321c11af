"""Quantify fusion run structure + the cross-window pairing headroom.

For each fused-eligible bucket of a matrix's swell plan, reports:
  * run-length histogram (maximal same-(out, chunk-pair) runs, _scan_runs),
  * current modeled fused cost (per-run G, _fuse_partition arithmetic),
  * hypothetical cost if runs with the same resolved chunk pair in PAIRED
    out windows (2w, 2w+1) concatenated — the "multi-window output block"
    lever (PERF_NOTES round-3: D=1-classpos buckets sit at ~59% pair rates
    because runs average ~1.4 steps; neighboring out windows share chunks).

Usage: JAX_PLATFORMS=cpu python scripts/analyze_runs.py boneS10 [more...]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from spmv_acc_tpu.ops.swell import (  # noqa: E402
    _bucket_numpy, _fuse_ratios, _scan_runs, get_swell_plan)


def part_cost(lengths, ratios):
    """Modeled step-units after per-run G choice (mirrors _fuse_partition)."""
    tot = 0.0
    fused_steps = 0
    for L in lengths:
        best = 0.95 * L
        bg = 1
        for G, rr in ratios.items():
            c = -(-L // G) * rr
            if c < best:
                best, bg = c, G
        tot += min(best, float(L))
        if bg > 1:
            fused_steps += L
    return tot, fused_steps


def main(name):
    from spmv_acc_tpu.formats.generate import example_like

    csr = example_like(name, dtype=np.float64)
    dp = get_swell_plan(csr, np.float64)
    if dp.r != 1:
        print(f"{name}: BSR r={dp.r} — fusion not applicable")
        return
    nbs = _bucket_numpy(dp.plan, np.float64)
    print(f"== {name}: m={dp.plan.rows} nnz={dp.plan.nnz} nout={dp.plan.nout} "
          f"fill={dp.plan.fill_efficiency:.3f} steps={dp.plan.total_steps}")
    for nb in nbs:
        osel = np.asarray(nb["osel"])
        n = len(osel)
        if n < 16:
            continue
        csel = np.asarray(nb["csel"])
        cselb = np.asarray(nb["cselb"])
        hasb = np.asarray(nb["hasb"])
        first = np.asarray(nb["first"])
        dual = bool(nb["dual"])
        cpos = bool(nb["classpos"])
        runs, cf, cbf = _scan_runs(csel, cselb, hasb, osel, first, dual)
        ratios = _fuse_ratios(cpos)
        lens = [len(r) for r in runs]
        cur, fused = part_cost(lens, ratios)
        # resolved pair key per run (post-relaxation selectors)
        cs2 = csel.copy()
        cb2 = cselb.copy()
        for i, v in cf.items():
            cs2[i] = v
        for i, v in cbf.items():
            cb2[i] = v
        # cross-window concat: merge runs with same (osel//2, pairkey)
        merged = {}
        for r in runs:
            i = r[0]
            a, b = int(cs2[i]), int(cb2[i]) if dual else int(cs2[i])
            key = (int(osel[i]) // 2, min(a, b), max(a, b))
            merged[key] = merged.get(key, 0) + len(r)
        xcost, xfused = part_cost(list(merged.values()), ratios)
        # 4-window blocks
        merged4 = {}
        for r in runs:
            i = r[0]
            a, b = int(cs2[i]), int(cb2[i]) if dual else int(cs2[i])
            key = (int(osel[i]) // 4, min(a, b), max(a, b))
            merged4[key] = merged4.get(key, 0) + len(r)
        x4, _ = part_cost(list(merged4.values()), ratios)
        hist = np.bincount(np.minimum(lens, 9))
        print(f"  D={1 << nb['log2d']:<3d} cpos={int(cpos)} dual={int(dual)} "
              f"steps={n:<6d} runs={len(runs):<6d} meanL={np.mean(lens):.2f} "
              f"hist1-8+={list(hist[1:])} ")
        print(f"      cost/step: now={cur / n:.3f} (fused {fused / n:.0%})  "
              f"pair2w={xcost / n:.3f}  pair4w={x4 / n:.3f}  "
              f"-> x2 gain {(cur - xcost) / n:.3f}/step "
              f"({(cur - xcost) / max(cur, 1e-9):.1%})")


if __name__ == "__main__":
    for nm in (sys.argv[1:] or ["boneS10"]):
        main(nm)
