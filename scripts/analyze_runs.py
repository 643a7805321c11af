"""Quantify fusion run structure + the cross-window pairing headroom.

For each host bucket of a matrix's swell plan (reassembled from the device
sub-buckets, so disk-cached plans work), reports:
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
os.environ.setdefault("SPMV_TPU_PLAN_CACHE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from spmv_acc_tpu.ops.swell import (  # noqa: E402
    _decompose_run, _fuse_ratios, _scan_runs, get_swell_plan)


def mixg_cost(lengths, ratios):
    """Modeled step-units under the mixed-G DP decomposition (production
    default since the SPMV_TPU_FUSE_MIXG landing)."""
    tot = 0.0
    for L in lengths:
        for G, take in _decompose_run(L, ratios):
            tot += 0.95 if G == 1 else ratios[G]
    return tot


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


def host_buckets(dp):
    """Reassemble per-host-bucket original step arrays from dp.buckets."""
    groups = {}
    for b in dp.buckets:
        hb = b.get("hb_index")
        groups.setdefault(hb, []).append(b)
    out = []
    for hb, subs in sorted(groups.items()):
        segs = []
        for b in subs:
            orig = b.get("orig")
            if orig is None:  # r>1 / non-pipe bucket: arrays are already original
                orig = (b["csel"], b["cselb"], b["hasb"], b["osel"], b["first"])
            cs, cb, hbb, osl, fi = (np.asarray(a) for a in orig)
            src = b.get("src_steps")
            if src is None:
                src = np.arange(len(osl))
            segs.append((np.asarray(src), cs, cb, hbb, osl, fi))
        src = np.concatenate([s[0] for s in segs])
        order = np.argsort(src)
        cat = [np.concatenate([s[i] for s in segs])[order] for i in range(1, 6)]
        meta = subs[0]
        out.append(dict(log2d=meta["log2d"], wide=meta["wide"],
                        dual=any(bool(b["dual"]) for b in subs),
                        classpos=meta["classpos"],
                        csel=cat[0], cselb=cat[1], hasb=cat[2], osel=cat[3],
                        first=cat[4]))
    return out


def main(name):
    from spmv_acc_tpu.formats.generate import example_like

    csr = example_like(name, dtype=np.float64)
    dp = get_swell_plan(csr, np.float64)
    if dp.r != 1:
        print(f"{name}: BSR r={dp.r} — fusion not applicable")
        return
    nbs = host_buckets(dp)
    print(f"== {name}: m={dp.plan.rows} nnz={dp.plan.nnz} nout={dp.plan.nout} "
          f"fill={dp.plan.fill_efficiency:.3f} steps={dp.plan.total_steps} "
          f"buckets={len(nbs)}", flush=True)
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
        cs2 = csel.copy()
        cb2 = cselb.copy()
        for i, v in cf.items():
            cs2[i] = v
        for i, v in cbf.items():
            cb2[i] = v

        def merged_cost(wdiv):
            merged = {}
            for r in runs:
                i = r[0]
                a = int(cs2[i])
                b = int(cb2[i]) if dual else a
                key = (int(osel[i]) // wdiv, min(a, b), max(a, b))
                merged[key] = merged.get(key, 0) + len(r)
            return part_cost(list(merged.values()), ratios)

        xcost, xfused = merged_cost(2)
        x4, _ = merged_cost(4)
        hist = np.bincount(np.minimum(lens, 9), minlength=10)
        print(f"  D={1 << nb['log2d']:<3d} cpos={int(cpos)} dual={int(dual)} "
              f"steps={n:<6d} runs={len(runs):<6d} meanL={np.mean(lens):.2f} "
              f"hist1-8+={list(hist[1:])}", flush=True)
        mg = mixg_cost(lens, ratios)
        print(f"      cost/step: single-G={cur / n:.3f} (fused {fused / n:.0%})  "
              f"mixG={mg / n:.3f} ({(cur - mg) / max(cur, 1e-9):+.1%})  "
              f"pair2w={xcost / n:.3f}  pair4w={x4 / n:.3f}  "
              f"-> x2 gain {(cur - xcost) / n:.3f}/step "
              f"({(cur - xcost) / max(cur, 1e-9):.1%})", flush=True)


if __name__ == "__main__":
    for nm in (sys.argv[1:] or ["boneS10"]):
        main(nm)
