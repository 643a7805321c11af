"""Probe: manually software-pipelined swell f64 step (grid=1, explicit DMAs).

Tests whether computing step i+1's x-tables (MXU) while step i's gather/Dekker/
fold (VPU) runs beats the auto-pipelined grid kernel, which serializes the
tables->gather->product->fold->scatter chain per step (~900ns measured vs a
~400ns unit max).  Run on one bucket of a banded-2M plan; timing only compares
against the production kernel on the same bucket — correctness is checked against
the production kernel's output.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100000)
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_acc_tpu.formats.generate import banded_csr, random_x_y
from spmv_acc_tpu.ops.swell import (ROUT, _bucket_args, _call_f64, _gather_sel,
                                    _packed_rows, _prep_x_pure, _scatter_exact,
                                    _split, _statics, _tables, _unpack_bytes,
                                    get_swell_plan)

_Z = np.int32(0)

m = 2_000_000
csr = banded_csr(m, bandwidth=7, seed=3, dtype=np.float64)
x, _ = random_x_y(m, m, seed=7)
dp = get_swell_plan(csr, np.float64)
bargs = _bucket_args(dp, False)
st = _statics(dp, False)
log2ds = st[-1]
nout, nchunks, delta = st[2], st[3], st[7]
chunks = _prep_x_pure(jnp.asarray(x), nchunks, True, native=False, delta=delta)
BI = 2
ba = bargs[BI]
L2D, WIDE = log2ds[BI]
P, BOFF, OHW, NVAL, RPAD = _packed_rows(L2D, True, WIDE)
D = 1 << L2D
CH = chunks.shape[1]


def make_mono(nsteps):
    def tables_from(buf, chunk_ref):
        oh = _unpack_bytes(buf[288 : 288 + OHW], 4 * OHW)
        planes = [chunk_ref[i * 128 : (i + 1) * 128] for i in range(6)]
        tha, thb = _tables(oh, planes[:3], P, D, WIDE)
        tla, tlb = _tables(oh, planes[3:], P, D, WIDE)
        return tha, thb, tla, tlb

    def vpu_body(buf, tha, thb, tla, tlb):
        vh = jax.lax.bitcast_convert_type(buf[:128], jnp.float32)
        vl = jax.lax.bitcast_convert_type(buf[128:256], jnp.float32)
        idx = _unpack_bytes(buf[256:288], 128)
        rb = buf[288 + OHW : 289 + OHW]
        gh = _gather_sel(tha, thb, idx)
        gl = _gather_sel(tla, tlb, idx)
        p = vh * gh
        ah, al = _split(vh)
        bh, bl = _split(gh)
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        e = e + (vh * gl + (vl * gh + vl * gl))
        for _ in range(L2D):
            half = p.shape[0] // 2
            a, b = p[:half], p[half:]
            ssum = a + b
            bb = ssum - a
            err = (a - (ssum - bb)) + (b - bb)
            e = e[:half] + e[half:] + err
            p = ssum
        return _scatter_exact(rb, (p, e), P)

    def kernel(csel_r, osel_r, first_r, packed_hbm, chunks_hbm, out_hbm,
               pbuf, cbuf, obuf, tbuf, psem, csem, osem):
        def i32(v):
            return jnp.asarray(v, jnp.int32)

        def pdma(slot, i):
            return pltpu.make_async_copy(
                packed_hbm.at[i32(i)], pbuf.at[i32(slot)], psem.at[i32(slot)])

        def cdma(c):
            return pltpu.make_async_copy(chunks_hbm.at[i32(c)], cbuf, csem)

        def odma(ob, o):
            return pltpu.make_async_copy(obuf.at[i32(ob)], out_hbm.at[i32(o)], osem)

        # prologue: packed 0 + chunk csel[0] + tables(0)
        pdma(0, 0).start()
        cdma(csel_r[0]).start()
        pdma(0, 0).wait()
        cdma(csel_r[0]).wait()
        t0 = tables_from(pbuf[0], cbuf)
        tbuf[0, 0] = t0[0]
        tbuf[0, 1] = t0[1]
        tbuf[0, 2] = t0[2]
        tbuf[0, 3] = t0[3]

        @pl.when(nsteps > 1)
        def _():
            pdma(1, 1).start()

        def body(i, carry):
            ob, oflushed = carry
            slot = jax.lax.rem(i, jnp.int32(2))
            nslot = jnp.int32(1) - slot

            # --- stage A(i+1): tables for the NEXT step (MXU), overlapping B(i)
            @pl.when(i + 1 < nsteps)
            def _():
                pdma(nslot, i + 1).wait()

                @pl.when(i + 2 < nsteps)
                def _():
                    pdma(slot, i + 2).start()

                @pl.when(csel_r[i + 1] != csel_r[i])
                def _():
                    cdma(csel_r[i + 1]).start()
                    cdma(csel_r[i + 1]).wait()
                tn = tables_from(pbuf[nslot], cbuf)
                tbuf[nslot, 0] = tn[0]
                tbuf[nslot, 1] = tn[1]
                tbuf[nslot, 2] = tn[2]
                tbuf[nslot, 3] = tn[3]

            # --- stage B(i): the VPU chain for the CURRENT step
            ph, pe = vpu_body(pbuf[slot], tbuf[slot, 0], tbuf[slot, 1],
                              tbuf[slot, 2], tbuf[slot, 3])

            first = first_r[i]

            @pl.when(first == 1)
            def _():
                obuf[ob, :ROUT] = ph
                obuf[ob, ROUT:] = pe

            @pl.when(first == 0)
            def _():
                cur = obuf[ob, :ROUT]
                ssum = cur + ph
                bb = ssum - cur
                err = (cur - (ssum - bb)) + (ph - bb)
                obuf[ob, :ROUT] = ssum
                obuf[ob, ROUT:] = obuf[ob, ROUT:] + pe + err

            # flush the tile when the NEXT step starts a new out window (or at end)
            last = i + 1 >= nsteps
            fl = jnp.logical_or(last, first_r[jnp.minimum(i + 1, nsteps - 1)] == 1)

            @pl.when(jnp.logical_and(fl, oflushed == 1))
            def _():
                # both flush copies have identical shapes, so waiting through a
                # descriptor for the other buffer still pairs with the semaphore
                odma(1 - ob, osel_r[jnp.maximum(i - 1, 0)]).wait()

            @pl.when(fl)
            def _():
                odma(ob, osel_r[i]).start()

            ob2 = jnp.where(fl, 1 - ob, ob)
            ofl2 = jnp.where(fl, jnp.int32(1), oflushed)
            return (ob2, ofl2)

        ob, oflushed = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nsteps), body, (jnp.int32(0), jnp.int32(0))
        )

        @pl.when(oflushed == 1)
        def _():
            odma(1 - ob, osel_r[nsteps - 1]).wait()

    return kernel


def mono_call(ba, chunks):
    csel, osel, first, packed, touched = ba
    nsteps = packed.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, RPAD, 128), jnp.int32),
            pltpu.VMEM((CH, 128), jnp.bfloat16),
            pltpu.VMEM((2, 2 * ROUT, 128), jnp.float32),
            pltpu.VMEM((2, 4, 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        make_mono(nsteps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nout, 2 * ROUT, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(csel, osel, first, packed, chunks)


# correctness vs the production kernel
csel, osel, first, packed, touched = ba
ref = np.asarray(_call_f64(csel, osel, first, packed, chunks, L2D, WIDE, nout, False))
got = np.asarray(mono_call(ba, chunks))
mask = np.asarray(touched)
diff = np.abs(ref[mask] - got[mask]).max()
print(f"max |mono - grid| on touched tiles: {diff:.3e}", flush=True)

pert = chunks[:, :1].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("mono",))
def loop(ba, chunks, pert, n, mono):
    def body(i, c):
        ch = jnp.concatenate(
            [(pert * (1.0 + c * 1e-30)).astype(jnp.bfloat16), chunks[:, 1:]], axis=1)
        if mono:
            o = mono_call(ba, ch)
        else:
            o = _call_f64(ba[0], ba[1], ba[2], ba[3], ch, L2D, WIDE, nout, False)
        return c + o[0, 0, 0] * 1e-30
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


nsteps = packed.shape[0]
for mono in (False, True):
    def once(nn):
        t = time.perf_counter()
        r = loop(ba, chunks, pert, nn, mono)
        np.asarray(jax.device_get(r))
        return time.perf_counter() - t
    once(33)
    once(129)
    lo = min(once(33) for _ in range(2))
    hi = min(once(129) for _ in range(2))
    per = (hi - lo) / 96
    print(f"{'mono' if mono else 'grid'}: {per*1e6:7.1f}us/iter "
          f"{per/nsteps*1e9:6.0f}ns/step over {nsteps} steps", flush=True)
