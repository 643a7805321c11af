"""Weak-scaling benchmark for distributed SpMV / CG (BASELINE.json config 5).

Weak scaling: per-device problem size is fixed; the matrix grows with the device
count.  Reports nnz/s per device count and parallel efficiency vs 1 device.  Runs on
whatever mesh is available: real multi-chip hardware when present, otherwise the
virtual CPU mesh (``--xla_force_host_platform_device_count``), which validates the
sharding/collective structure (compile + execute) even though CPU timings are not
TPU projections.

Usage: python -m spmv_acc_tpu.parallel.scaling_bench [--devices 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def run_weak_scaling(device_counts, rows_per_device=32768, avg_nnz=16, iters=20,
                     dtype=np.float64, engine="swell"):
    """``engine='swell'`` (default): the flagship kernels as local compute
    (parallel/dist_swell.py, auto 1-hop halo) — rows_per_device >= 32768 so
    shard blocks span whole x chunks and the halo window fits.
    ``engine='gather'``: XLA gather/segment-sum local compute (halo when
    feasible).

    Efficiency metrics: ``efficiency`` is true weak-scaling parallel efficiency
    (per-device rate vs D=1) — meaningful ONLY on real multi-chip hardware.  On
    a virtual CPU mesh every "device" shares one host, so compute serializes
    and this metric trends to 1/D by construction; there
    ``serialized_efficiency`` = D*T(1)/T(D) is the structural gate: it stays
    near 1.0 iff distribution adds no overhead beyond the serialized compute
    (halo exchange, collectives, resharding all land in the <1-eff slack)."""
    import jax
    import jax.numpy as jnp

    from ..formats.generate import banded_csr
    from ..formats.containers import CSR
    from ..formats.convert import coo_to_csr_arrays, csr_to_dense
    from ..parallel import make_mesh, partition_rows, shard_partitioned, pad_vector
    from ..models.cg import dist_cg_solve
    from ..utils.timer import time_chained
    from .dist_spmv import dist_spmv_fn, dist_spmv_halo_fn, halo_feasible
    from jax.sharding import NamedSharding, PartitionSpec as P

    results = []
    base_rate = None
    for d in device_counts:
        if d > len(jax.devices()):
            print(f"skip D={d}: only {len(jax.devices())} devices", file=sys.stderr)
            continue
        m = rows_per_device * d
        csr = banded_csr(m, bandwidth=min(avg_nnz | 1, m), seed=11, dtype=dtype)
        mesh = make_mesh(d)
        if engine == "swell":
            from .dist_swell import build_dist_swell, dist_swell_spmv_fn, pad_global

            dsp = build_dist_swell(csr, d)
            run_sw = dist_swell_spmv_fn(dsp, mesh)
            print(f"D={d}: swell engine halo={'on' if dsp.halo_ok else 'off'} "
                  f"win_chunks={dsp.win_chunks}", file=sys.stderr)
            x = jax.device_put(
                pad_global(dsp, jnp.ones((csr.cols,), dtype=csr.values.dtype)),
                NamedSharding(mesh, P("x")))

            def step(x):
                y = run_sw(x)
                return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))

        else:
            part = partition_rows(csr, d, balance=False)
            part = shard_partitioned(part, mesh)
            build = dist_spmv_halo_fn if halo_feasible(part) else dist_spmv_fn
            run, x_pad = build(mesh, part)
            x = jnp.zeros((d * x_pad,), dtype=csr.values.dtype)
            x = jax.device_put(x.at[: csr.cols].set(1.0), NamedSharding(mesh, P("x")))

            def step(x):
                y = run(part.values, part.col_idx, part.row_ids, x)
                # renormalised feedback keeps the chain honest without divergence
                flat = y.reshape(-1)[: d * x_pad]
                return flat * (1.0 / jnp.maximum(jnp.max(jnp.abs(flat)), 1e-30))

        per_us, _ = time_chained(step, x, iters=iters, baseline_iters=max(2, iters // 10))
        rate = csr.nnz / (per_us * 1e-6) if per_us > 0 else 0.0
        per_dev = rate / d
        if base_rate is None:
            base_rate = per_dev
            base_us = per_us
        eff = per_dev / base_rate if base_rate else 0.0
        ser_eff = (d * base_us / per_us) if per_us > 0 else 0.0
        results.append(
            dict(devices=d, rows=m, nnz=csr.nnz, us_per_spmv=round(per_us, 1),
                 nnz_per_s=round(rate), efficiency=round(eff, 4),
                 serialized_efficiency=round(ser_eff, 4))
        )
        print(
            f"D={d}: m={m} nnz={csr.nnz} {per_us:.0f}us/spmv "
            f"{rate/1e6:.1f}M nnz/s eff={eff:.2%} ser_eff={ser_eff:.2%}",
            file=sys.stderr,
        )
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="scaling-bench")
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--rows-per-device", type=int, default=32768)
    p.add_argument("--avg-nnz", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--engine", choices=("gather", "swell"), default="swell")
    p.add_argument("--out", default=None, help="also write the JSON artifact here")
    args = p.parse_args(argv)
    counts = [int(c) for c in args.devices.split(",")]
    results = run_weak_scaling(counts, args.rows_per_device, args.avg_nnz, args.iters,
                               engine=args.engine)
    import jax

    doc = {
        "weak_scaling": results,
        "engine": args.engine,
        "backend": jax.default_backend(),
        "structural_only": jax.default_backend() != "tpu",
        "note": ("virtual CPU mesh serializes device compute on one host: "
                 "'efficiency' trends to 1/D by construction there; "
                 "'serialized_efficiency' (D*T1/TD) is the structural gate"),
    }
    print(json.dumps(doc))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
    if len(results) >= 2:
        gate = ("efficiency" if jax.default_backend() == "tpu"
                else "serialized_efficiency")
        return 0 if results[-1][gate] >= (0.75 if gate == "efficiency" else 0.5) else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
