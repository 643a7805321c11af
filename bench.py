"""Benchmark driver — run on real TPU hardware; prints ONE JSON line (the last one).

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

Timeout robustness (round-2 postmortem: BENCH_r02 rc=124, no parsed JSON):
  * the LARGE set (the headline) runs FIRST;
  * after EVERY matrix a complete result JSON with ``"partial": true`` is printed,
    so a killed run still leaves a parseable last line;
  * SIGTERM/SIGINT emit the partial result before exiting;
  * a self-imposed wall budget ($SPMV_TPU_BENCH_BUDGET_S, default 2700s) finalizes
    early rather than being killed mid-matrix;
  * cache population (corpus bin2 + swell plans) is spawned as a background CPU
    process from here, walking the corpus in REVERSE so it meets the bench in the
    middle (the reference's analyze-phase economics: csr_adaptive_plus_spmv.cpp:92-129).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
try:
    from spmv_acc_tpu.config import cache_dir as _cdir

    jax.config.update("jax_compilation_cache_dir", _cdir("jax"))
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
# the reference's FULL 10-matrix large corpus (examples/large-data-set-batch.sh:24-51)
LARGE = ["largebasis", "Ga41As41H72", "TSOPF_RS_b2383", "boneS10", "Hardesty3",
         "dielFilterV3real", "RM07R", "vas_stokes_2M", "Cube_Coup_dt6", "Bump_2911"]
DTYPE = np.float64
BASELINE_ROOFLINE = 0.80
BUDGET_S = float(os.environ.get("SPMV_TPU_BENCH_BUDGET_S", "2700"))

_T_START = time.perf_counter()
# mutable run state read by emit() and the signal handler
_STATE = {"results": {}, "all_ok": True, "raw_ok": True, "spmm": [], "skipped": []}


def geomean(vals):
    return float(np.exp(np.mean(np.log(np.maximum(vals, 1e-9))))) if vals else 0.0


def emit(partial: bool):
    """Print a complete result JSON for everything measured so far.

    Printed after every matrix so that a timeout/kill still leaves a parseable
    final line; the driver takes the LAST JSON line.
    """
    results = _STATE["results"]
    large_fracs = [results[n][0] for n in LARGE if n in results]
    small_fracs = [results[n][0] for n in SMALL if n in results]
    if large_fracs:
        headline = geomean(large_fracs)
        metric = "spmv_roofline_fraction_f64_geomean_large_set"
    elif small_fracs:
        headline = geomean(small_fracs)
        metric = "spmv_roofline_fraction_f64_geomean_SMALL_SET_FALLBACK_large_set_failed"
    else:
        headline, metric = 0.0, "spmv_roofline_fraction"
    out = {
        "metric": metric,
        "value": round(headline, 4),
        "unit": "fraction_of_HBM_speed_of_light",
        "vs_baseline": round(headline / BASELINE_ROOFLINE, 4),
        "verify_all_pass": bool(_STATE["all_ok"]),
        "verify_raw_kernel_all_pass": bool(_STATE["raw_ok"]),
        "small_set_geomean": round(geomean(small_fracs), 4),
        "gflops_geomean_large": round(geomean([results[n][1] for n in LARGE if n in results]), 2),
        "corpus": len(results),
        "large_done": len(large_fracs),
        "elapsed_s": round(time.perf_counter() - _T_START, 1),
    }
    if partial:
        out["partial"] = True
    # per-matrix rooflines: the driver records only this last line, so the
    # full picture must ride in it (stderr CSV is a separate log)
    out["per_matrix_roofline"] = {n: round(v[0], 4) for n, v in results.items()}
    if _STATE["skipped"]:
        out["skipped"] = _STATE["skipped"]
    if _STATE["spmm"]:
        out["spmm_k8_speedup_geomean"] = round(geomean(_STATE["spmm"]), 2)
    if _STATE.get("spgemm"):
        out.update(_STATE["spgemm"])
    if _STATE.get("solver"):
        out.update(_STATE["solver"])
    print(json.dumps(out), flush=True)


def _on_signal(signum, frame):  # emit what we have, then die cleanly
    try:
        _STATE["skipped"].append(f"signal_{signum}")
        emit(partial=True)
    finally:
        os._exit(0)


def spawn_populate():
    """Background CPU-side cache population, reverse corpus order (meets the
    bench in the middle).  JAX_PLATFORMS=cpu passed EXPLICITLY — the environment
    pins axon and setdefault inside the script does not override it."""
    lock = "/tmp/spmv_populate.lock"
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        return None
    names = list(reversed(LARGE + SMALL))
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts", "populate_caches.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    logf = open("/tmp/populate_bench.log", "w")
    return subprocess.Popen([sys.executable, script, *names], env=env, stdout=logf, stderr=logf)


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
        os.environ["SPMV_TPU_NO_REFINE"] = "1"
        try:
            raw = np.asarray(spmv(csr, dx, dy, alpha=1.0, beta=1.0, strategy="swell"))
        finally:
            os.environ.pop("SPMV_TPU_NO_REFINE", None)
        rep_raw = verify_y(raw, golden, dtype=DTYPE)
    t_first = time.perf_counter() - t0

    # timing: on-device loop (swell path when chosen; dominant on TPU)
    if handle.strategy_used == "swell":
        run = make_swell_run(csr, alpha=1.0, beta=1.0)

        def once(nn):
            t = time.perf_counter()
            r = run(dx, dy, nn)
            np.asarray(jax.device_get(r.ravel()[:1]))
            return time.perf_counter() - t

        def _measure():
            iters = _iters_for(csr.nnz)
            per = 0.0
            for _ in range(3):  # grow the loop until it dwarfs dispatch noise
                # slope between two LARGE loop lengths — an n=1 baseline mixes
                # fixed costs nonlinearly and once reported a 2.6x-too-fast kernel
                n0 = 1 + iters // 4
                n1 = 1 + iters
                once(n0)
                once(n1)
                lo = min(once(n0) for _ in range(3))
                hi = min(once(n1) for _ in range(3))
                per = max(hi - lo, 0.0) / (n1 - n0) * 1e6
                if per > 0 and per * (n1 - n0) > 20e3:
                    break
                iters = min(iters * 4, 65536)
            return per
    else:
        from spmv_acc_tpu.dispatch import make_spmv_fn
        from spmv_acc_tpu.utils.timer import time_device_loop

        fn, _ = make_spmv_fn(csr, alpha=1.0, beta=1.0, strategy=handle.strategy_used)

        def step(xx):
            ax = fn(xx, dy)
            return ax * jax.lax.rsqrt(jnp.mean(ax * ax) + 1e-30)

        def _measure():
            per, _ = time_device_loop(step, dx, iters=_iters_for(csr.nnz))
            return per

    peak = chip_peak_gbs()
    b = bytes_moved(m, csr.nnz, np.dtype(DTYPE).itemsize)
    # tunnel-health guard (PERF_NOTES round-3: a degrading tunnel once read
    # roofline 1.176 — physically impossible — then 13477us for the other A/B
    # arm).  Discard any reading above the speed of light and re-measure; if it
    # persists, fail the matrix rather than pollute the geomean.
    per_us = _measure()
    for _ in range(2):
        if per_us <= 0 or b / (per_us * 1e-6) / 1e9 <= peak:
            break
        print(f"  {name}: impossible roofline "
              f"{b / (per_us * 1e-6) / 1e9 / peak:.3f} — tunnel glitch, "
              f"re-measuring", file=log, flush=True)
        per_us = _measure()
    if per_us > 0 and b / (per_us * 1e-6) / 1e9 > peak:
        raise RuntimeError(
            f"roofline > 1 persisted across re-measures ({per_us:.1f}us)")
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


SPMM_MATRICES = ["TSOPF_RS_b2383", "boneS10"]
SPMM_K = 8


def bench_spmm(name: str, spmv_per_us: float, log):
    """k-column SpMM vs k chained SpMVs (multi-RHS amortization of the
    values+index DMA; new scope — the reference is SpMV-only).  Returns the
    speedup of one SpMM iteration over k SpMV iterations.  Structurally capped
    near ~1.6x in f64 (only the DMA fraction amortizes; PERF_NOTES)."""
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


SPGEMM_MATRICES = ["af23560", "epb1", "dw4096"]


def bench_spgemm(log):
    """SpGEMM section (VERDICT r4 #6: the one BASELINE capability with zero
    recorded TPU evidence): C = A @ A on corpus matrices via the two-phase
    symbolic/numeric split (ops/spgemm.py) — symbolic host seconds, numeric
    device us/iter (chained slope), verified against the host Gustavson
    golden.  Matrices are the small-set members whose product expansion stays
    bounded (A^2 products ~ nnz * avg_row; the large FEM set would expand to
    10^8-10^9 products host-side)."""
    from spmv_acc_tpu.ops.spgemm import spgemm_host, spgemm_numeric, spgemm_symbolic
    from spmv_acc_tpu.utils.timer import time_device_loop

    out = {}
    all_ok = True
    for name in SPGEMM_MATRICES:
        csr = example_like(name, dtype=DTYPE)
        t0 = time.perf_counter()
        pattern, a_pos, b_pos, out_pos, c_nnz = spgemm_symbolic(csr, csr)
        t_sym = time.perf_counter() - t0
        av = jnp.asarray(csr.values)
        c_vals = np.asarray(spgemm_numeric(av, av, a_pos, b_pos, out_pos, c_nnz))
        rp, ci, v, shape = csr.to_numpy()
        g_rp, g_ci, g_v, _ = spgemm_host(rp, ci, v, shape, rp, ci, v, shape)
        ok = (c_nnz == len(g_ci)
              and np.allclose(c_vals, g_v, rtol=1e-7, atol=1e-12))
        all_ok &= bool(ok)

        def step(vals):
            c = spgemm_numeric(vals, av, a_pos, b_pos, out_pos, c_nnz)
            return vals * (1.0 + jnp.mean(c * c).astype(vals.dtype) * 1e-30)

        per_us, _ = time_device_loop(step, av, iters=32)
        print(f"  spgemm {name}: A@A nnz {csr.nnz} -> {c_nnz}, symbolic "
              f"{t_sym:.2f}s, numeric {per_us:.0f}us/iter, verify "
              f"{'OK' if ok else 'FAIL'}", file=log, flush=True)
        out[f"spgemm_{name}_symbolic_s"] = round(t_sym, 2)
        out[f"spgemm_{name}_numeric_us"] = round(per_us, 1)
        out[f"spgemm_{name}_c_nnz"] = int(c_nnz)
    out["spgemm_verify_all_pass"] = bool(all_ok)
    return out


SOLVER_MATRIX = os.environ.get("SPMV_TPU_BENCH_SOLVER_MATRIX", "Ga41As41H72")


def bench_solver(log):
    """Solver-path section (VERDICT r2 #6): ILU(0) economics on an SPD-ized
    bench matrix — factor+plan time (the analyze phase, SpMVAccHanele
    economics), per-apply cost as a multiple of one SpMV, and CG iteration
    counts ILU vs Jacobi.  The sweep apply rides the swell kernels
    (ops/trisolve.py SweepSwell).  Returns a dict merged into the result JSON."""
    import numpy as np

    from spmv_acc_tpu.formats.containers import CSR
    from spmv_acc_tpu.formats.convert import coo_to_csr_arrays
    from spmv_acc_tpu.models.cg import cg_solve, jacobi_preconditioner
    from spmv_acc_tpu.ops.swell import (_bucket_args, _interpret, _statics,
                                        get_swell_plan, swell_ax)
    from spmv_acc_tpu.ops.trisolve import ilu0, sweep_apply_swell
    from spmv_acc_tpu.utils.timer import time_device_loop

    csr0 = example_like(SOLVER_MATRIX, dtype=DTYPE)
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

    t0 = time.perf_counter()
    fact = ilu0(csr, sweeps=3)
    t_factor = time.perf_counter() - t0

    dp = get_swell_plan(csr, DTYPE)
    interp = _interpret()  # CPU testability; False on the real TPU
    bargs, st = _bucket_args(dp, interp), _statics(dp, interp)
    x0 = jnp.ones((m,), jnp.float64)

    def spmv_step(vv):
        y = swell_ax(bargs, dp.tail, vv, st)[:m]
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

    us_spmv, _ = time_device_loop(spmv_step, x0, iters=32)

    us_apply = -1.0
    if fact.swell is not None:
        sw = fact.swell

        def apply_step(vv):
            z = sweep_apply_swell(sw.statics_l, sw.statics_u, fact.sweeps, m,
                                  sw.args(), vv)
            return z * jax.lax.rsqrt(jnp.mean(z * z) + 1e-30)

        us_apply, _ = time_device_loop(apply_step, x0, iters=16)

    rng = np.random.default_rng(5)
    x_true = rng.standard_normal(m)
    b = jnp.asarray(host_spmv(1.0, 0.0, rp2, ci2, v2, x_true, np.zeros(m)))
    it_j = int(cg_solve(csr, b, tol=1e-8, max_iters=300, strategy="swell",
                        precond=jacobi_preconditioner(csr)).iters)
    it_i = int(cg_solve(csr, b, tol=1e-8, max_iters=300, strategy="swell",
                        precond=fact).iters)
    ratio = us_apply / us_spmv if us_spmv > 0 and us_apply > 0 else -1.0
    print(f"  solver {SOLVER_MATRIX}-SPD: factor+plans {t_factor:.0f}s, "
          f"spmv {us_spmv:.0f}us, ilu-apply({fact.sweeps} sweeps) {us_apply:.0f}us "
          f"({ratio:.2f}x spmv), cg iters jacobi={it_j} ilu={it_i}",
          file=log, flush=True)
    out = {
        "solver_spmv_us": round(us_spmv, 1),
        "solver_ilu_apply_us": round(us_apply, 1),
        "solver_ilu_apply_vs_spmv": round(ratio, 2),
        "solver_cg_iters_jacobi": it_j,
        "solver_cg_iters_ilu": it_i,
        "solver_factor_s": round(t_factor, 1),
    }
    try:
        out.update(bench_solver_aniso(log))
    except Exception as e:
        print(f"  solver aniso: ERROR {type(e).__name__}: {e}", file=log, flush=True)
    return out


def bench_solver_aniso(log):
    """End-to-end ILU-vs-Jacobi economics where the preconditioner PAYS
    (VERDICT r3 #7): 2D anisotropic diffusion (512^2, eps=1e-4) is SPD but
    only weakly diagonally dominant; ILU(0) captures the strong y-coupling.
    Per-iteration costs come from on-device fixed-trip CG loops (the tunnel's
    ~0.7-1.6s per-dispatch fixed cost drowns wall-clock differences), and
    ``solver_total_wall_win`` = (iters_j * per_j) / (iters_i * per_i).
    Honest arithmetic: the apply costs ~2*sweeps SpMV-equivalents while the
    iteration ratio is ~2.4-4.8x, so the win is real but thin (~1.1x); the
    diagonally-dominant stand-ins above lose outright (ratio recorded)."""
    from spmv_acc_tpu.formats.generate import aniso_laplacian_csr
    from spmv_acc_tpu.models.cg import _vdot, cg_solve, jacobi_preconditioner
    from spmv_acc_tpu.ops.swell import _bucket_args, _interpret, _statics, \
        get_swell_plan, swell_ax
    from spmv_acc_tpu.ops.trisolve import ilu0, sweep_apply_swell

    nx = ny = 512
    eps = 1e-4
    m = nx * ny
    csr = aniso_laplacian_csr(nx, ny, eps)
    rp, ci, v, _ = csr.to_numpy()
    rng = np.random.default_rng(5)
    x_true = rng.standard_normal(m)
    b = jnp.asarray(host_spmv(1.0, 0.0, rp, ci, v, x_true, np.zeros(m)))
    it_j = int(cg_solve(csr, b, tol=1e-8, max_iters=4000, strategy="swell",
                        precond=jacobi_preconditioner(csr)).iters)
    sweeps = 3
    fact = ilu0(csr, sweeps=sweeps)
    res_i = cg_solve(csr, b, tol=1e-8, max_iters=4000, strategy="swell",
                     precond=fact)
    it_i = int(res_i.iters)
    err_i = float(np.linalg.norm(np.asarray(res_i.x) - x_true)
                  / np.linalg.norm(x_true))

    dp = get_swell_plan(csr, np.float64)
    interp = _interpret()
    st = _statics(dp, interp)
    sw = fact.swell
    diag_inv = jnp.asarray(1.0 / (2.0 * eps + 2.0)) * jnp.ones(m)

    def timed_cg(Mfn, pargs):
        @jax.jit
        def run(bargs, tail, pa, bb, n):
            def matvec(vv):
                return swell_ax(bargs, tail, vv, st)[:m]

            x = jnp.zeros_like(bb)
            r = bb - matvec(x)
            z = Mfn(pa, r)
            p = z
            rz = _vdot(r, z)

            def body(i, s):
                x, r, z, p, rz = s
                ap = matvec(p)
                alpha = rz / _vdot(p, ap)
                x = x + alpha * p
                r = r - alpha * ap
                z = Mfn(pa, r)
                rzn = _vdot(r, z)
                return (x, r, z, z + (rzn / rz) * p, rzn)

            x, r, *_ = jax.lax.fori_loop(0, n, body, (x, r, z, p, rz))
            return _vdot(r, r)

        bargs = _bucket_args(dp, interp)

        def once(n):
            t0 = time.perf_counter()
            float(run(bargs, dp.tail, pargs, b, n))
            return time.perf_counter() - t0

        n0, n1 = 65, 513
        once(n0); once(n1)
        w1 = min(once(n0) for _ in range(3))
        w2 = min(once(n1) for _ in range(3))
        return max(w2 - w1, 0.0) / (n1 - n0) * 1e6

    per_j = timed_cg(lambda pa, r: pa * r, diag_inv)
    per_i = timed_cg(
        lambda pa, r: sweep_apply_swell(sw.statics_l, sw.statics_u, sweeps, m,
                                        pa, r), sw.args())
    win = (it_j * per_j) / (it_i * per_i) if it_i * per_i > 0 else 0.0
    print(f"  solver aniso-512^2 eps={eps}: cg iters jacobi={it_j} "
          f"ilu(s={sweeps})={it_i} (relerr {err_i:.1e}); per-iter "
          f"{per_j:.0f}us vs {per_i:.0f}us -> total_wall_win {win:.2f}x",
          file=log, flush=True)
    return {
        "solver_aniso_cg_iters_jacobi": it_j,
        "solver_aniso_cg_iters_ilu": it_i,
        "solver_aniso_per_iter_us_jacobi": round(per_j, 1),
        "solver_aniso_per_iter_us_ilu": round(per_i, 1),
        "solver_total_wall_win": round(win, 3),
    }


def _clear_device_caches():
    # evict per-matrix device plans — the corpus exceeds HBM if cached
    from spmv_acc_tpu import dispatch as _d
    from spmv_acc_tpu import plan as _p
    from spmv_acc_tpu.ops import swell as _s

    _s._SWELL_CACHE.clear()
    _d._FN_CACHE.clear()
    _d._ELL_CACHE.clear()
    _p.clear_plan_cache()


def _wait_backend(log, max_wait_s: float = 2700.0) -> bool:
    """Probe the TPU backend in a SUBPROCESS before touching it in-process.

    The axon tunnel wedges hard several times per session (observed outages
    of 25-70 minutes where even jnp.ones(4) hangs at backend init, 2026-08-21).
    An in-process hang is uninterruptible and would leave the round with NO
    bench artifact at all; a subprocess probe with a timeout converts the
    wedge into a bounded wait-and-retry."""
    t0 = time.perf_counter()
    attempt = 0
    while time.perf_counter() - t0 < max_wait_s:
        attempt += 1
        try:
            rc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=120, capture_output=True).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            if attempt > 1:
                print(f"backend probe recovered on attempt {attempt} "
                      f"({time.perf_counter()-t0:.0f}s)", file=log, flush=True)
            return True
        print(f"backend probe attempt {attempt} failed/hung; tunnel likely "
              f"wedged — waiting ({time.perf_counter()-t0:.0f}s elapsed)",
              file=log, flush=True)
        time.sleep(30)
    return False


def main():
    log = sys.stderr
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    if not _wait_backend(log):
        print(json.dumps({"metric": "spmv_roofline_fraction", "value": 0.0,
                          "unit": "fraction",
                          "vs_baseline": 0.0,
                          "error": "TPU backend unreachable (tunnel wedged) "
                                   "for the entire probe window"}))
        return 1
    spawn_populate()
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind}), peak {chip_peak_gbs():.0f} GB/s, "
          f"budget {BUDGET_S:.0f}s", file=log, flush=True)
    per_us_by_name = {}
    only = os.environ.get("SPMV_TPU_BENCH_ONLY")  # debug: comma-separated subset
    order = only.split(",") if only else LARGE + SMALL
    for name in order:  # LARGE first: the headline must land before any timeout
        if time.perf_counter() - _T_START > BUDGET_S:
            _STATE["skipped"].append(name)
            continue
        # one retry: the axon tunnel throws transient transport errors
        # (observed: "response body closed before all bytes were read") that
        # have nothing to do with the kernel under test
        for attempt in (0, 1):
            try:
                frac, gf, ok, rok, per_us = bench_matrix(name, log)
                _STATE["results"][name] = (frac, gf)
                per_us_by_name[name] = per_us
                _STATE["all_ok"] &= ok
                _STATE["raw_ok"] &= rok
                break
            except Exception as e:  # robust harness (csr_spmv.hpp:52-62 analog)
                print(f"  {name}: ERROR {type(e).__name__}: {e}"
                      + (" (retrying)" if attempt == 0 else ""), file=log, flush=True)
                if attempt == 1:
                    _STATE["all_ok"] = False
            finally:
                _clear_device_caches()
        emit(partial=True)
    for name in SPMM_MATRICES:
        if time.perf_counter() - _T_START > BUDGET_S:
            _STATE["skipped"].append(f"spmm_{name}")
            continue
        if per_us_by_name.get(name, 0) > 0:
            try:
                _STATE["spmm"].append(bench_spmm(name, per_us_by_name[name], log))
            except Exception as e:
                print(f"  spmm {name}: ERROR {type(e).__name__}: {e}", file=log, flush=True)
            finally:
                _clear_device_caches()
    if (time.perf_counter() - _T_START <= BUDGET_S
            and os.environ.get("SPMV_TPU_BENCH_SPGEMM", "1") != "0"):
        try:
            _STATE["spgemm"] = bench_spgemm(log)
        except Exception as e:
            print(f"  spgemm: ERROR {type(e).__name__}: {e}", file=log, flush=True)
        finally:
            _clear_device_caches()
    if (time.perf_counter() - _T_START <= BUDGET_S
            and os.environ.get("SPMV_TPU_BENCH_SOLVER", "1") != "0"):
        try:
            _STATE["solver"] = bench_solver(log)
        except Exception as e:
            print(f"  solver: ERROR {type(e).__name__}: {e}", file=log, flush=True)
        finally:
            _clear_device_caches()
    if not _STATE["results"]:
        print(json.dumps({"metric": "spmv_roofline_fraction", "value": 0.0, "unit": "fraction", "vs_baseline": 0.0}))
        return 1
    emit(partial=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
