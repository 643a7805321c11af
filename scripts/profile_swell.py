"""Per-bucket hardware timing of the production swell f64 kernel.

Reports ns/step for each depth bucket of a banded plan using the slope between
two LARGE chained loop lengths (see PERF_NOTES.md: an n=1 baseline is unreliable).
For stage-level ablations, see the git history of this file and PERF_NOTES.md —
the measured breakdown (scatter/tables/gathers/fold) is recorded there.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from spmv_acc_tpu.formats.generate import banded_csr, random_x_y
from spmv_acc_tpu.ops.swell import (_bucket_args, _call_f64, _prep_x_pure,
                                    _statics, get_swell_plan)


def main():
    import sys as _sys
    name = _sys.argv[1] if len(_sys.argv) > 1 else "banded2M"
    if name == "banded2M":
        m = 2_000_000
        csr = banded_csr(m, bandwidth=7, seed=3, dtype=np.float64)
    else:
        from spmv_acc_tpu.formats.generate import example_like
        csr = example_like(name, dtype=np.float64)
        m = csr.shape[0]
    x, _ = random_x_y(csr.shape[1], m, seed=7)
    dp = get_swell_plan(csr, np.float64)
    bargs = _bucket_args(dp, False)
    st = _statics(dp, False)
    log2ds = st[8]  # per-bucket (log2d, wide, dual, classpos, allout) flags
    nout, nchunks, delta = st[2], st[3], st[7]
    chunks = _prep_x_pure(jnp.asarray(x), nchunks, True, native=False, delta=delta)
    pert = chunks[:, :1].astype(jnp.float32)
    print(f"plan: fill={dp.plan.fill_efficiency:.3f} steps={dp.plan.total_steps}",
          flush=True)

    pipe = st[10]
    dboths = st[11]
    for bi, (ba, (l2d, wide, dual, cpos, allout)) in enumerate(zip(bargs, log2ds)):
        hasb = ba[2]
        nsteps = ba[-2].shape[0]
        ndual = int((np.asarray(hasb) != 0).sum())
        dboth = dboths[bi]

        @functools.partial(jax.jit, static_argnames=())
        def loop(ba, chunks, pert, n, l2d=l2d, wide=wide, dual=dual, cpos=cpos,
                 dboth=dboth):
            ohs = None
            # mirror swell_ax's production gate
            use_pipe = pipe and (not dual or dboth) and len(ba) == 11
            if len(ba) == 11:
                (cp, cbp, hbp, cn, cbn, hbn, osel, first, ohs, packed, touched) = ba
                csel, cselb, hasb = (cp, cbp, hbp) if use_pipe else (cn, cbn, hbn)
            else:
                csel, cselb, hasb, osel, first, packed, touched = ba[:7]

            def body(i, c):
                ch = jnp.concatenate(
                    [(pert * (1.0 + c * 1e-30)).astype(jnp.bfloat16), chunks[:, 1:]],
                    axis=1)
                o = _call_f64(csel, cselb, hasb, osel, first, packed, ch, l2d, wide,
                              nout, False, dual, cpos,
                              ohs=ohs, pipe=use_pipe, dboth=dboth)
                return c + o[0, 0, 0] * 1e-30

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def once(nn):
            t = time.perf_counter()
            r = loop(ba, chunks, pert, nn)
            np.asarray(jax.device_get(r))
            return time.perf_counter() - t

        once(33)
        once(129)
        lo = min(once(33) for _ in range(2))
        hi = min(once(129) for _ in range(2))
        per = (hi - lo) / 96
        print(f"bucket {bi}: D={1 << l2d:3d} wide={int(wide)} steps={nsteps:5d}  "
              f"{per*1e6:7.1f}us/iter  {per/nsteps*1e9:6.0f}ns/step  dual={ndual} "
              f"cpos={int(cpos)} dboth={int(dboth)}", flush=True)


if __name__ == "__main__":
    main()
