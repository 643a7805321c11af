"""Decompose _prep_x_pure's cost: f64 split vs pad vs plane build (device loop)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
import jax.numpy as jnp
import numpy as np

from spmv_acc_tpu.formats.generate import example_like, random_x_y
from spmv_acc_tpu.ops.swell import CHUNK_W, CW, _plane_split_call, get_swell_plan

name = sys.argv[1] if len(sys.argv) > 1 else "Hardesty3"
csr = example_like(name, dtype=np.float64)
m, n = csr.shape
x, _ = random_x_y(n, m, seed=7, dtype=np.float64)
dp = get_swell_plan(csr, np.float64)
nchunks, delta = dp.nchunks, dp.plan.delta
n_pad = nchunks * CHUNK_W * CW
dx = jnp.asarray(x)
print(f"{name}: n={n} nchunks={nchunks} delta={delta}", flush=True)


def timeloop(fn, label):
    @jax.jit
    def run(x0, nn):
        def body(i, c):
            xx = x0 * (1.0 + c * 1e-30)
            out = fn(xx)
            # consume EVERY leaf fully — a single-element read lets XLA
            # slice-propagate the whole pipeline away
            s = sum(jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree_util.tree_leaves(out))
            return c + s.astype(jnp.float64) * 1e-30

        return jax.lax.fori_loop(0, nn, body, jnp.float64(0.0))

    def once(nn):
        t = time.perf_counter()
        r = run(dx, nn)
        np.asarray(jax.device_get(r))
        return time.perf_counter() - t

    once(5); once(65)
    lo = min(once(5) for _ in range(3))
    hi = min(once(65) for _ in range(3))
    per = max(hi - lo, 0.0) / 60 * 1e6
    print(f"  {label}: {per:.1f}us/iter", flush=True)
    return per


def split(xx):
    xh = xx.astype(jnp.float32)
    xl = (xx - xh.astype(jnp.float64)).astype(jnp.float32)
    return xh, xl


def split_pad(xx):
    xh, xl = split(xx)
    shape = (nchunks, CHUNK_W, CW)
    xh = jnp.zeros((n_pad,), jnp.float32).at[delta : delta + n].set(xh).reshape(shape)
    xl = jnp.zeros((n_pad,), jnp.float32).at[delta : delta + n].set(xl).reshape(shape)
    return xh, xl


def full(xx):
    xh, xl = split_pad(xx)
    return _plane_split_call([xh, xl])


timeloop(split, "f64 split (xh, xl)")
timeloop(split_pad, "split + pad/reshape")
timeloop(full, "split + pad + pallas planes")
