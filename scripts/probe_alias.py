"""Probe: input_output_aliases semantics under PrefetchScalarGridSpec on TPU.

Questions:
  1. Do alias indices count the scalar-prefetch operands? (try index with-scalars)
  2. Do output blocks NOT visited by the grid retain the aliased input's bytes?
  3. Can the kernel read the aliased input block (same index_map as out) to seed
     an accumulator on the first visit?
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 4  # out blocks
BLK = (1, 8, 128)


def kernel(osel_r, first_r, x_ref, acc_ref, o_ref):
    s = pl.program_id(0)
    contrib = x_ref[0] * jnp.float32(2.0)

    @pl.when(first_r[s] == 1)
    def _():
        o_ref[0] = acc_ref[0] + contrib

    @pl.when(first_r[s] == 0)
    def _():
        o_ref[0] = o_ref[0] + contrib


def run(alias_idx):
    # grid of 3 steps: steps 0,1 -> out block 0 (first=1 then 0), step 2 -> block 2
    osel = jnp.asarray([0, 0, 2], jnp.int32)
    first = jnp.asarray([1, 0, 1], jnp.int32)
    x = jnp.arange(3 * 8 * 128, dtype=jnp.float32).reshape(3, 8, 128)
    acc = (jnp.ones((NB, 8, 128), jnp.float32)
           * jnp.arange(NB, dtype=jnp.float32)[:, None, None] * 100.0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(3,),
        in_specs=[
            pl.BlockSpec(BLK, lambda s, osel, first: (s, 0, 0)),
            pl.BlockSpec(BLK, lambda s, osel, first: (osel[s], 0, 0)),
        ],
        out_specs=pl.BlockSpec(BLK, lambda s, osel, first: (osel[s], 0, 0)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, 8, 128), jnp.float32),
        input_output_aliases={alias_idx: 0},
    )
    return jax.jit(f)(osel, first, x, acc), x, acc


def main():
    print("device:", jax.devices()[0])
    for alias_idx in (3, 1):  # 3 = scalars counted (2 scalars + x + acc), 1 = tensor-only
        try:
            out, x, acc = run(alias_idx)
            out = np.asarray(out)
        except Exception as e:  # noqa: BLE001
            print(f"alias_idx={alias_idx}: FAILED to build/run: {type(e).__name__}: {e}")
            continue
        xn = np.asarray(x)
        expect0 = np.asarray(acc)[0] + 2.0 * (xn[0] + xn[1])
        expect2 = np.asarray(acc)[2] + 2.0 * xn[2]
        ok0 = np.array_equal(out[0], expect0)
        ok2 = np.array_equal(out[2], expect2)
        keep1 = np.array_equal(out[1], np.asarray(acc)[1])
        keep3 = np.array_equal(out[3], np.asarray(acc)[3])
        print(f"alias_idx={alias_idx}: seeded-acc block0={ok0} block2={ok2} "
              f"unwritten-keeps-acc block1={keep1} block3={keep3}")


if __name__ == "__main__":
    main()
