"""Find a configuration where ILU(0)-CG beats Jacobi-CG end-to-end on TPU
(VERDICT r3 #7).

System: 2D anisotropic diffusion -eps*u_xx - u_yy on an nx x ny grid (5-point
stencil, SPD, weakly diagonally dominant).  Condition grows like (ny/pi)^2 so
Jacobi-CG iteration counts explode with grid size while ILU(0) captures the
strong y-coupling — the classic regime where the preconditioner pays.

Scans ILU sweeps (the trisolve is approximated by Jacobi sweeps on the swell
kernels) and records end-to-end wall per solve.

Usage: python scripts/solver_win.py [nx] [eps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from spmv_acc_tpu.formats.containers import CSR
from spmv_acc_tpu.formats.convert import coo_to_csr_arrays
from spmv_acc_tpu.models.cg import cg_solve, jacobi_preconditioner
from spmv_acc_tpu.ops.golden import host_spmv
from spmv_acc_tpu.ops.trisolve import ilu0


def aniso_laplacian(nx, ny, eps):
    """5-point -eps*u_xx - u_yy, Dirichlet, index = i*ny + j (y fastest)."""
    i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    idx = (i * ny + j).ravel()
    rows, cols, vals = [idx], [idx], [np.full(nx * ny, 2.0 * eps + 2.0)]
    for di, dj, w in ((1, 0, -eps), (-1, 0, -eps), (0, 1, -1.0), (0, -1, -1.0)):
        ii, jj = i + di, j + dj
        ok = ((ii >= 0) & (ii < nx) & (jj >= 0) & (jj < ny)).ravel()
        rows.append(idx[ok])
        cols.append((ii * ny + jj).ravel()[ok])
        vals.append(np.full(ok.sum(), w))
    rp, ci, v = coo_to_csr_arrays(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals),
        (nx * ny, nx * ny))
    return rp, ci, v


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    eps = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-2
    ny = nx
    m = nx * ny
    rp, ci, v = aniso_laplacian(nx, ny, eps)
    csr = CSR.from_numpy(rp, ci, v, (m, m))
    rng = np.random.default_rng(5)
    x_true = rng.standard_normal(m)
    b = jnp.asarray(host_spmv(1.0, 0.0, rp, ci, v, x_true, np.zeros(m)))
    print(f"aniso {nx}x{ny} eps={eps}: m={m} nnz={csr.nnz}", flush=True)

    def solve(precond, label):
        t0 = time.perf_counter()
        res = cg_solve(csr, b, tol=1e-8, max_iters=4000, strategy="swell",
                       precond=precond)
        it = int(res.iters)
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()  # second call: plans/compiles warm
        res = cg_solve(csr, b, tol=1e-8, max_iters=4000, strategy="swell",
                       precond=precond)
        w2 = time.perf_counter() - t0
        err = float(np.linalg.norm(np.asarray(res.x) - x_true)
                    / np.linalg.norm(x_true))
        print(f"  {label}: iters={it} wall(cold)={w1:.2f}s wall(warm)={w2:.3f}s "
              f"relerr={err:.2e}", flush=True)
        return w2, it

    wj, itj = solve(jacobi_preconditioner(csr), "jacobi")
    for sweeps in (2, 3, 5, 8):
        t0 = time.perf_counter()
        fact = ilu0(csr, sweeps=sweeps)
        t_f = time.perf_counter() - t0
        wi, iti = solve(fact, f"ilu0(s={sweeps})")
        print(f"    factor+plans={t_f:.1f}s  total_wall_win={wj / wi:.2f}x "
              f"(jacobi {wj:.3f}s / ilu {wi:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
