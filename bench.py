"""Benchmark driver — run on real TPU hardware; prints ONE JSON line.

Protocol (mirrors the reference: 10 warmups, timed runs — benchmark/csr_spmv.hpp:48-74
— with TPU-appropriate measurement): per matrix, time the adaptive-strategy SpMV with
*chained-dependency slope timing* (``y ← alpha·A·x + beta·y`` iterated; a final host
readback forces completion — plain block_until_ready does not synchronize through the
axon tunnel).  Metrics use the reference's bytes/FLOP models
(statistics_logger.cpp:43-49) and the chip's HBM speed-of-light.

Headline metric: geometric-mean roofline fraction over the example corpus
(BASELINE.md target: >= 0.80 per chip), ``vs_baseline = value / 0.80``.
"""

from __future__ import annotations

import json
import sys

import jax

jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the tile kernel compiles one program per
# (bucket, matrix shape); caching makes repeated bench runs cheap.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spmv_acc_tpu.dispatch import Handle, make_spmv_fn, spmv  # noqa: E402
from spmv_acc_tpu.formats.generate import EXAMPLE_SHAPES, example_like, random_x_y  # noqa: E402
from spmv_acc_tpu.ops.golden import host_spmv  # noqa: E402
from spmv_acc_tpu.utils.stats import (  # noqa: E402
    BenchTimes,
    bytes_moved,
    chip_peak_gbs,
    flops,
    print_statistics,
)
from spmv_acc_tpu.utils.timer import time_device_loop  # noqa: E402
from spmv_acc_tpu.utils.verify import verify_y  # noqa: E402

CORPUS = ["rajat03", "poli_large", "dw4096", "bayer10", "epb1", "bcsstk18", "coater2", "nemeth03", "af23560"]
DTYPE = np.float64
ITERS = 100
BASELINE_ROOFLINE = 0.80


def bench_matrix(name: str, log):
    csr = example_like(name, dtype=DTYPE)
    m, n = csr.shape
    x, y0 = random_x_y(n, m, seed=42, dtype=DTYPE)
    dx = jnp.asarray(x)
    dy = jnp.asarray(y0)

    import time as _time

    t0 = _time.perf_counter()
    fn, chosen = make_spmv_fn(csr, alpha=1.0, beta=1.0, strategy="adaptive")
    analyze_us = (_time.perf_counter() - t0) * 1e6
    out = fn(dx, dy)
    hy = np.asarray(out)
    golden = host_spmv(1.0, 1.0, *csr.to_numpy()[:3], x, y0)
    rep = verify_y(hy, golden, dtype=DTYPE)
    handle = Handle(analyze_time_us=analyze_us, strategy_used=chosen)

    # power-iteration chain: x feeds back through a cheap normalize, so the SpMV
    # cannot be hoisted out of the on-device loop (the CG access pattern).
    def step(x):
        ax = fn(x, dy)
        return ax * jax.lax.rsqrt(jnp.mean(ax * ax) + 1e-30)

    per_us, _ = time_device_loop(step, dx, iters=ITERS)

    peak = chip_peak_gbs()
    b = bytes_moved(m, csr.nnz, np.dtype(DTYPE).itemsize)
    gbs = b / (per_us * 1e-6) / 1e9 if per_us > 0 else 0.0
    gflops = flops(csr.nnz) / (per_us * 1e-6) / 1e9 if per_us > 0 else 0.0
    frac = gbs / peak
    times = BenchTimes(pre=handle.analyze_time_us, calc=per_us)
    print_statistics(name, handle.strategy_used, m, n, csr.nnz, times, rep, file=log)
    print(
        f"  {name}: {per_us:.1f}us  {gbs:.1f} GB/s  {gflops:.2f} GFLOP/s  "
        f"roofline={frac:.3f}  verify={'OK' if rep.ok else 'FAIL'}",
        file=log,
    )
    return frac, gflops, rep.ok


def main():
    log = sys.stderr
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind}), peak {chip_peak_gbs():.0f} GB/s", file=log)
    fracs, gflops_list, all_ok = [], [], True
    for name in CORPUS:
        try:
            frac, gf, ok = bench_matrix(name, log)
            fracs.append(max(frac, 1e-9))
            gflops_list.append(gf)
            all_ok &= ok
        except Exception as e:  # keep the harness robust (csr_spmv.hpp:52-62 analog)
            print(f"  {name}: ERROR {type(e).__name__}: {e}", file=log)
            all_ok = False
    if not fracs:
        print(json.dumps({"metric": "spmv_roofline_fraction", "value": 0.0, "unit": "fraction", "vs_baseline": 0.0}))
        return 1
    geo = float(np.exp(np.mean(np.log(fracs))))
    result = {
        "metric": "spmv_roofline_fraction_f64_geomean",
        "value": round(geo, 4),
        "unit": "fraction_of_HBM_speed_of_light",
        "vs_baseline": round(geo / BASELINE_ROOFLINE, 4),
        "verify_all_pass": bool(all_ok),
        "gflops_geomean": round(float(np.exp(np.mean(np.log(np.maximum(gflops_list, 1e-9))))), 2),
        "corpus": len(fracs),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
