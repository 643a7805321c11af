"""Per-bucket TPU-vs-interp comparison for a failing matrix (debug tool)."""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from spmv_acc_tpu.formats.generate import example_like, random_x_y
from spmv_acc_tpu.ops.swell import (ROUT, _bucket_args, _call_f64,
                                    _call_native_interp_r, _prep_x_pure,
                                    _statics, get_swell_plan)

name = sys.argv[1] if len(sys.argv) > 1 else "TSOPF_RS_b2383"
if name == "banded150":
    from spmv_acc_tpu.formats.generate import banded_csr
    csr = banded_csr(2000, bandwidth=150, seed=5, dtype=np.float64)
elif name == "minitsopf":
    from spmv_acc_tpu.formats.generate import fem_like_csr
    csr = fem_like_csr(4000, 4000, 1700000, block=16, spread_frac=0.01, seed=7, dtype=np.float64)
else:
    csr = example_like(name, dtype=np.float64)
m, n = csr.shape
x, _ = random_x_y(n, m, seed=42, dtype=np.float64)
dp = get_swell_plan(csr, np.float64)
st = _statics(dp, False)
log2ds = st[8]
r = st[9]
nout, nchunks, delta = st[2], st[3], st[7]
chunks_tpu = _prep_x_pure(jnp.asarray(x), nchunks, True, native=False, delta=delta, r=r)
chunks_nat = _prep_x_pure(jnp.asarray(x), nchunks, True, native=True, delta=delta, r=r)[0]
bargs_tpu = _bucket_args(dp, False)
bargs_int = _bucket_args(dp, True)

for bi, (bt, bn, (l2d, wide, dual, cpos, allout)) in enumerate(zip(bargs_tpu, bargs_int, log2ds)):
    ohs = None
    use_pipe = st[10] and len(bt) == 11
    if len(bt) == 11:
        (cp, cbp, hbp, cn, cbn, hbn, osel, first, ohs, packed, touched) = bt
        csel, cselb, hasb = (cp, cbp, hbp) if use_pipe else (cn, cbn, hbn)
    else:
        csel, cselb, hasb, osel, first, packed, touched = bt
    o = np.asarray(_call_f64(csel, cselb, hasb, osel, first, packed, chunks_tpu,
                             l2d, wide, nout, False, dual, cpos, r,
                             ohs=ohs, pipe=use_pipe))
    o = o.reshape(nout, r, 2, ROUT, 128)
    got = o[:, :, 0].astype(np.float64) + o[:, :, 1].astype(np.float64)
    ci_, cib, hb, osel_i, first_i, vals, lidx, oh, rbvec, touched_i = bn
    ref = np.asarray(_call_native_interp_r(ci_, cib, hb, osel_i, first_i, vals, lidx,
                                           oh, rbvec, chunks_nat, l2d, wide, nout, r))
    ref = ref.reshape(nout, r, ROUT, 128)
    mask = np.asarray(touched)
    diff = np.abs(got[mask] - ref[mask])
    rel = diff / np.maximum(np.abs(ref[mask]), 1e-300)
    print(f"bucket {bi}: D={1 << l2d:3d} wide={int(wide)} dual={int(dual)} cpos={int(cpos)} "
          f"maxabs={diff.max():.3e} maxrel={np.minimum(rel, diff).max():.3e}", flush=True)
