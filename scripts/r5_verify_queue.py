"""Round-5 consolidated hardware verification queue (run when the tunnel is up).

1. k>1 fused3 bit-identity: spmm(swell) with SPMV_TPU_PIPE3_SPMM on vs off on
   banded-200k (k=8) — must be bit-identical (golden-checked too).
2. boneS10 SpMM k=8 timing: fused vs fused3 (the bench spmm metric driver).
3. ilu0 wall with the concurrent L/U plan build (VERDICT r4 #5).

Usage: python scripts/r5_verify_queue.py [steps: 1,2,3]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spmv_acc_tpu.formats.generate import banded_csr, example_like  # noqa: E402
from spmv_acc_tpu.ops import swell as S  # noqa: E402
from spmv_acc_tpu.ops.golden import host_spmm  # noqa: E402
from spmv_acc_tpu.utils.verify import verify_y  # noqa: E402


def step1():
    from spmv_acc_tpu.ops.spmm import spmm

    csr = banded_csr(200_000, bandwidth=7, seed=3, dtype=np.float64)
    rng = np.random.default_rng(11)
    k = 8
    X = rng.uniform(-1, 1, size=(csr.shape[1], k))
    Y = rng.uniform(-1, 1, size=(csr.shape[0], k))
    golden = host_spmm(1.0, 1.0, *csr.to_numpy()[:3], X, Y)
    outs = {}
    for pin in ("0", "1"):
        os.environ["SPMV_TPU_PIPE3_SPMM"] = pin
        out = np.asarray(spmm(csr, jnp.asarray(X), jnp.asarray(Y),
                              alpha=1.0, beta=1.0, strategy="swell"))
        rep = verify_y(out.ravel(), golden.ravel())
        outs[pin] = out
        print(f"  spmm banded k=8 PIPE3_SPMM={pin}: ok={rep.ok} "
              f"max={rep.max_error:.2e}", flush=True)
    print(f"  bit-identical: {np.array_equal(outs['0'], outs['1'])}", flush=True)
    os.environ.pop("SPMV_TPU_PIPE3_SPMM", None)


def step2():
    from spmv_acc_tpu.ops.swell import make_swell_amx_run

    csr = example_like("boneS10", dtype=np.float64)
    k = 8
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.uniform(-1, 1, size=(csr.shape[1], k)))
    for pin in ("0", "1"):
        os.environ["SPMV_TPU_PIPE3_SPMM"] = pin
        S._SWELL_CACHE.clear()
        run = make_swell_amx_run(csr, k)

        def once(nn):
            t = time.perf_counter()
            r = run(X, nn)
            np.asarray(jax.device_get(r.ravel()[:1]))
            return time.perf_counter() - t

        n0, n1 = 5, 17
        once(n0); once(n1)
        lo = min(once(n0) for _ in range(3))
        hi = min(once(n1) for _ in range(3))
        per = (hi - lo) / (n1 - n0) * 1e6
        print(f"  boneS10 spmm k=8 PIPE3_SPMM={pin}: {per:.1f} us/iter", flush=True)
    os.environ.pop("SPMV_TPU_PIPE3_SPMM", None)


def step3():
    from spmv_acc_tpu.formats.containers import CSR
    from spmv_acc_tpu.formats.convert import coo_to_csr_arrays
    from spmv_acc_tpu.ops.trisolve import ilu0

    csr0 = example_like("Ga41As41H72", dtype=np.float64)
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
    print(f"  ilu0 (concurrent L/U plans): {time.perf_counter()-t0:.1f}s "
          f"(sweeps={fact.sweeps}, swell={'yes' if fact.swell else 'no'})",
          flush=True)


def main():
    steps = ([int(a) for a in sys.argv[1].split(",")] if len(sys.argv) > 1
             else [1, 2, 3])
    for st in steps:
        print(f"== step {st}", flush=True)
        {1: step1, 2: step2, 3: step3}[st]()


if __name__ == "__main__":
    main()
