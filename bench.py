"""Benchmark driver — run on real TPU hardware; prints ONE JSON line.

Protocol (reference lineage: 10 warmups + timed reps, benchmark/csr_spmv.hpp:48-74 —
adapted to TPU measurement reality): per matrix, the SpMV is iterated inside ONE
on-device `lax.fori_loop` program with a power-iteration feedback (x normalizes
through the result) so XLA can neither hoist the loop-invariant SpMV nor overlap
iterations; per-iteration time is the slope between two loop lengths.  Host-side
loops would measure the ~100µs/dispatch axon-tunnel cost instead of the kernel.

Corpora mirror the reference's example sets (examples/batch.sh small set;
examples/large-data-set-batch.sh large set — structure-matched synthetic stand-ins,
see formats/generate.py).  Metrics use the reference's bytes/FLOP models
(statistics_logger.cpp:43-49) against the chip's HBM speed-of-light.

Headline: geometric-mean roofline fraction over the LARGE set (the reference's own
headline corpus), target >= 0.80 per chip (BASELINE.md); `vs_baseline = value/0.80`.
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spmv_acc_tpu.dispatch import Handle, spmv  # noqa: E402
from spmv_acc_tpu.formats.generate import example_like, random_x_y  # noqa: E402
from spmv_acc_tpu.ops.golden import host_spmv  # noqa: E402
from spmv_acc_tpu.ops.swell import get_swell_plan, make_swell_run  # noqa: E402
from spmv_acc_tpu.utils.stats import (  # noqa: E402
    BenchTimes,
    bytes_moved,
    chip_peak_gbs,
    flops,
    print_statistics,
)
from spmv_acc_tpu.utils.verify import verify_y  # noqa: E402

SMALL = ["rajat03", "poli_large", "dw4096", "bayer10", "epb1", "bcsstk18", "coater2", "nemeth03", "exdata_1", "af23560"]
# the reference's FULL 10-matrix large corpus (examples/large-data-set-batch.sh:24-51);
# feasible in the driver budget since the corpus/plan disk caches cut per-matrix
# host overhead from ~75s (generate + plan build) to seconds
LARGE = ["largebasis", "Ga41As41H72", "TSOPF_RS_b2383", "boneS10", "Hardesty3",
         "dielFilterV3real", "RM07R", "vas_stokes_2M", "Cube_Coup_dt6", "Bump_2911"]
DTYPE = np.float64
BASELINE_ROOFLINE = 0.80


def _iters_for(nnz: int) -> int:
    # aim for ~40ms of loop time at a conservative 50 GB/s estimate (tunnel
    # dispatch noise is ~100us; the loop must dwarf it or the slope reads 0)
    per = max(nnz * 12 / 50e9, 2e-6)
    return int(min(8192, max(64, 0.04 / per)))


def bench_matrix(name: str, log):
    t0 = time.perf_counter()
    csr = example_like(name, dtype=DTYPE)
    m, n = csr.shape
    x, y0 = random_x_y(n, m, seed=42, dtype=DTYPE)
    dx = jnp.asarray(x)
    dy = jnp.asarray(y0)
    t_gen = time.perf_counter() - t0

    # correctness: one adaptive-strategy call vs the CPU golden
    t0 = time.perf_counter()
    handle = Handle()
    out = spmv(csr, dx, dy, alpha=1.0, beta=1.0, strategy="adaptive", handle=handle)
    hy = np.asarray(out)
    golden = host_spmv(1.0, 1.0, *csr.to_numpy()[:3], x, y0)
    rep = verify_y(hy, golden, dtype=DTYPE)
    # the timed loop below runs the RAW kernel (no cancellation refinement);
    # verify that artifact against the same gate so the timing and the verdict
    # describe the same computation (advisor round-1 finding).  The refined
    # eager result above is the public-API contract; both are reported.
    rep_raw = rep
    if handle.strategy_used == "swell":
        import os as _os

        _os.environ["SPMV_TPU_NO_REFINE"] = "1"
        try:
            raw = np.asarray(spmv(csr, dx, dy, alpha=1.0, beta=1.0, strategy="swell"))
        finally:
            _os.environ.pop("SPMV_TPU_NO_REFINE", None)
        rep_raw = verify_y(raw, golden, dtype=DTYPE)
    t_first = time.perf_counter() - t0

    # timing: on-device loop (swell path when chosen; dominant on TPU)
    iters = _iters_for(csr.nnz)
    if handle.strategy_used == "swell":
        run = make_swell_run(csr, alpha=1.0, beta=1.0)

        def once(nn):
            t = time.perf_counter()
            r = run(dx, dy, nn)
            np.asarray(jax.device_get(r.ravel()[:1]))
            return time.perf_counter() - t

        per_us = 0.0
        for _ in range(3):  # grow the loop until it dwarfs dispatch noise
            # slope between two LARGE loop lengths — an n=1 baseline mixes
            # fixed costs nonlinearly and once reported a 2.6x-too-fast kernel
            n0 = 1 + iters // 4
            n1 = 1 + iters
            once(n0)
            once(n1)
            lo = min(once(n0) for _ in range(3))
            hi = min(once(n1) for _ in range(3))
            per_us = max(hi - lo, 0.0) / (n1 - n0) * 1e6
            if per_us > 0 and per_us * (n1 - n0) > 20e3:
                break
            iters = min(iters * 4, 65536)
    else:
        from spmv_acc_tpu.dispatch import make_spmv_fn
        from spmv_acc_tpu.utils.timer import time_device_loop

        fn, _ = make_spmv_fn(csr, alpha=1.0, beta=1.0, strategy=handle.strategy_used)

        def step(xx):
            ax = fn(xx, dy)
            return ax * jax.lax.rsqrt(jnp.mean(ax * ax) + 1e-30)

        per_us, _ = time_device_loop(step, dx, iters=iters)

    peak = chip_peak_gbs()
    b = bytes_moved(m, csr.nnz, np.dtype(DTYPE).itemsize)
    gbs = b / (per_us * 1e-6) / 1e9 if per_us > 0 else 0.0
    gflops = flops(csr.nnz) / (per_us * 1e-6) / 1e9 if per_us > 0 else 0.0
    frac = gbs / peak
    times = BenchTimes(pre=handle.analyze_time_us, calc=per_us)
    print_statistics(name, handle.strategy_used, m, n, csr.nnz, times, rep, file=log)
    fill = get_swell_plan(csr, DTYPE).plan.fill_efficiency if handle.strategy_used == "swell" else -1.0
    print(
        f"  {name}: {per_us:.1f}us  {gbs:.1f} GB/s  {gflops:.2f} GFLOP/s  "
        f"roofline={frac:.3f}  fill={fill:.3f}  gen={t_gen:.0f}s first={t_first:.0f}s  "
        f"verify={'OK' if rep.ok else 'FAIL'} raw={'OK' if rep_raw.ok else 'FAIL'}",
        file=log,
        flush=True,
    )
    return frac, gflops, rep.ok, rep_raw.ok, per_us


def geomean(vals):
    return float(np.exp(np.mean(np.log(np.maximum(vals, 1e-9))))) if vals else 0.0


SPMM_MATRICES = ["TSOPF_RS_b2383", "boneS10"]
SPMM_K = 8


def bench_spmm(name: str, spmv_per_us: float, log):
    """k-column SpMM vs k chained SpMVs (multi-RHS amortization of the
    values+index DMA; new scope — the reference is SpMV-only).  Returns the
    speedup of one SpMM iteration over k SpMV iterations."""
    from spmv_acc_tpu.ops.swell import make_swell_amx_run

    csr = example_like(name, dtype=DTYPE)
    m, n = csr.shape
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.uniform(-1, 1, size=(n, SPMM_K)).astype(DTYPE))
    run = make_swell_amx_run(csr, SPMM_K)
    iters = max(16, _iters_for(csr.nnz) // SPMM_K)

    def once(nn):
        t = time.perf_counter()
        r = run(X, nn)
        np.asarray(jax.device_get(r.ravel()[:1]))
        return time.perf_counter() - t

    n0, n1 = 1 + iters // 4, 1 + iters
    once(n0); once(n1)
    lo = min(once(n0) for _ in range(3))
    hi = min(once(n1) for _ in range(3))
    per_us = max(hi - lo, 0.0) / (n1 - n0) * 1e6
    speedup = SPMM_K * spmv_per_us / per_us if per_us > 0 else 0.0
    print(f"  spmm {name}: k={SPMM_K} {per_us:.1f}us/iter vs {SPMM_K}x{spmv_per_us:.1f}us "
          f"chained SpMV -> speedup {speedup:.2f}x", file=log, flush=True)
    return speedup


def main():
    log = sys.stderr
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind}), peak {chip_peak_gbs():.0f} GB/s", file=log, flush=True)
    results = {}
    all_ok = True
    raw_ok = True
    per_us_by_name = {}
    for name in SMALL + LARGE:
        try:
            frac, gf, ok, rok, per_us = bench_matrix(name, log)
            results[name] = (frac, gf)
            per_us_by_name[name] = per_us
            all_ok &= ok
            raw_ok &= rok
        except Exception as e:  # keep the harness robust (csr_spmv.hpp:52-62 analog)
            print(f"  {name}: ERROR {type(e).__name__}: {e}", file=log, flush=True)
            all_ok = False
        finally:
            # evict per-matrix device plans — the corpus exceeds HBM if cached
            from spmv_acc_tpu import dispatch as _d
            from spmv_acc_tpu import plan as _p
            from spmv_acc_tpu.ops import swell as _s

            _s._SWELL_CACHE.clear()
            _d._FN_CACHE.clear()
            _d._ELL_CACHE.clear()
            _p.clear_plan_cache()
    spmm_speedups = []
    for name in SPMM_MATRICES:
        if per_us_by_name.get(name, 0) > 0:
            try:
                spmm_speedups.append(bench_spmm(name, per_us_by_name[name], log))
            except Exception as e:
                print(f"  spmm {name}: ERROR {type(e).__name__}: {e}", file=log, flush=True)
            finally:
                from spmv_acc_tpu.ops import swell as _s2

                _s2._SWELL_CACHE.clear()
    large_fracs = [results[n][0] for n in LARGE if n in results]
    small_fracs = [results[n][0] for n in SMALL if n in results]
    if not large_fracs and not small_fracs:
        print(json.dumps({"metric": "spmv_roofline_fraction", "value": 0.0, "unit": "fraction", "vs_baseline": 0.0}))
        return 1
    # the metric name must describe what was actually computed: a silent
    # small-set fallback under the large-set name would mislead (advisor finding)
    if large_fracs:
        headline = geomean(large_fracs)
        metric = "spmv_roofline_fraction_f64_geomean_large_set"
    else:
        headline = geomean(small_fracs)
        metric = "spmv_roofline_fraction_f64_geomean_SMALL_SET_FALLBACK_large_set_failed"
    result = {
        "metric": metric,
        "value": round(headline, 4),
        "unit": "fraction_of_HBM_speed_of_light",
        "vs_baseline": round(headline / BASELINE_ROOFLINE, 4),
        "verify_all_pass": bool(all_ok),
        "verify_raw_kernel_all_pass": bool(raw_ok),
        "small_set_geomean": round(geomean(small_fracs), 4),
        "gflops_geomean_large": round(geomean([results[n][1] for n in LARGE if n in results]), 2),
        "corpus": len(results),
    }
    if spmm_speedups:
        result["spmm_k8_speedup_geomean"] = round(geomean(spmm_speedups), 2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
