"""Probe: build the 6 bf16 chunk planes IN-KERNEL from f32 (xh|xl) chunk blocks.

Motivation (PERF_NOTES): chunk (re)loads cost ~500ns each (~20% of FEM step
time) and the separate x-prep pass is ~11% of Hardesty3 end-to-end.  Shipping
raw (xh|xl) f32 chunks shrinks the chunk-block DMA from 196KB (6 bf16 planes,
lane-concat) to 131KB (-33%) AND would let the prep pass shrink to a plain
f64->2xf32 split (writes 131KB/chunk instead of 196KB).  The cost is a
predicated plane build (16 VPU ops + bf16 scratch stores) on every step whose
chunk selector CHANGED, plus a pl.when tax on stable steps.

Variants per bucket (unpiped, acc=0, f64 scalar):
  full   production-equivalent kernel, chunk = (128,768) bf16 planes
  kprep  chunk = (128,256) f32 [xh|xl], planes built into VMEM scratch on change

Outputs are compared bit-exactly before timing.
Usage: python scripts/probe_kprep.py [matrix] [bucket_index]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_acc_tpu.ops import swell as S
from spmv_acc_tpu.ops.swell import (ROUT, _bf16_rne, _bucket_args, _expand_tile,
                                    _gather_sel, _lane_gather, _mask_col,
                                    _packed_rows, _scatter_exact, _split, _statics,
                                    _tables_dual, _ts_rows, _unpack_bytes,
                                    get_swell_plan)

_Z = np.int32(0)
CW = 128

# single source of truth for the RNE bit trick — a silent divergence from the
# production rounding would void the probe's bit-exactness premise (advisor r2)
_rne = _bf16_rne


def _build_planes(dst_ref, xhl):
    """(128,256) f32 [xh|xl] -> 6 bf16 planes into dst_ref (128,768)."""
    for s in range(2):
        v = xhl[:, s * CW : (s + 1) * CW]
        c1 = _rne(v)
        r1 = v - c1
        c2 = _rne(r1)
        c3 = r1 - c2
        b = s * 3 * CW
        dst_ref[:, b : b + CW] = c1.astype(jnp.bfloat16)
        dst_ref[:, b + CW : b + 2 * CW] = c2.astype(jnp.bfloat16)
        dst_ref[:, b + 2 * CW : b + 3 * CW] = c3.astype(jnp.bfloat16)


def make_kernel(log2d, wide, dual, classpos, dboth, kprep):
    P, boff, ohw, nval, _ = _packed_rows(log2d, True, wide, 1)
    D = 1 << log2d

    def kernel(csel_r, cselb_r, hasb_r, osel_r, first_r, packed_ref, chunk_ref,
               *rest):
        rest = list(rest)
        chunkb_ref = rest.pop(0) if dual else None
        o_ref = rest.pop(0)
        if kprep:
            pa_ref = rest.pop(0)
            pb_ref = rest.pop(0) if dual else None
        ts_refs = rest if (dual and not dboth) else None
        s = pl.program_id(0)
        buf = packed_ref[0]
        vh = jax.lax.bitcast_convert_type(buf[:128], jnp.float32)
        vl = jax.lax.bitcast_convert_type(buf[128:256], jnp.float32)
        idx = _unpack_bytes(buf[nval : nval + 32], 128)
        oh = _unpack_bytes(buf[nval + 32 : nval + 32 + ohw], 4 * ohw)
        rb = buf[nval + 32 + ohw : nval + 33 + ohw]
        if kprep:
            sp = jnp.maximum(s - 1, 0)
            chg_a = jnp.logical_or(s == 0, csel_r[s] != csel_r[sp])

            @pl.when(chg_a)
            def _():
                _build_planes(pa_ref, chunk_ref[0])

            ca = pa_ref[...]
            if dual:
                # gate on hasb too: long hasb==0 runs with stale/repeated cselb
                # must not charge kprep for rebuilding an unused b-side block
                # (advisor r2); production would skip that DMA+rebuild entirely.
                # s == 0 must STILL build unconditionally: uninitialized VMEM
                # scratch can hold NaN bit patterns and 0 * NaN = NaN even
                # under the zero one-hot (same hazard as the piped ts_refs).
                chg_b = jnp.logical_or(
                    s == 0,
                    jnp.logical_and(hasb_r[s] != 0, cselb_r[s] != cselb_r[sp]))

                @pl.when(chg_b)
                def _():
                    _build_planes(pb_ref, chunkb_ref[0])

                cb = pb_ref[...]
            else:
                cb = None
        else:
            ca = chunk_ref[0]
            cb = chunkb_ref[0] if dual else None
        bases = [0, 3]
        pairs = _tables_dual(oh, ca, cb, hasb_r[s], ts_refs, P, D, wide, bases,
                             dboth)
        tha, thb = pairs[0]
        tla, tlb = pairs[1]
        if wide:
            gh = _gather_sel(tha, thb, idx)
            gl = _gather_sel(tla, tlb, idx)
        else:
            gh = _lane_gather(tha, idx)
            gl = _lane_gather(tla, idx)
        bh, bl = _split(gh)
        p = vh * gh
        ah, al = _split(vh)
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        e = e + (vh * gl + (vl * gh + vl * gl))
        for _lv in range(log2d):
            half = p.shape[0] // 2
            a, b = p[:half], p[half:]
            ssum = a + b
            bb = ssum - a
            err = (a - (ssum - bb)) + (b - bb)
            e = e[:half] + e[half:] + err
            p = ssum
        if classpos and log2d == 0:
            pass
        elif classpos:
            occ = buf[nval + 33 + ohw : nval + 34 + ohw]
            mk = _mask_col(occ)
            p = _expand_tile(p, D, P) * mk
            e = _expand_tile(e, D, P) * mk
        else:
            outs = _scatter_exact(rb, (p, e), P)
            p, e = outs[0], outs[1]
        first = first_r[s]

        @pl.when(first == 1)
        def _():
            o_ref[0, :ROUT] = p
            o_ref[0, ROUT:] = e

        @pl.when(first == 0)
        def _():
            cur = o_ref[0, :ROUT]
            ssum = cur + p
            bb = ssum - cur
            err = (cur - (ssum - bb)) + (p - bb)
            o_ref[0, :ROUT] = ssum
            o_ref[0, ROUT:] = o_ref[0, ROUT:] + e + err

    return kernel


def call_v(ba, chunks, log2d, wide, dual, classpos, dboth, nout, kprep):
    if len(ba) == 11:
        (_cp, _cbp, _hbp, csel, cselb, hasb, osel, first, _ohs, packed,
         _touched) = ba
    else:
        csel, cselb, hasb, osel, first, packed, _touched = ba[:7]
    nsteps = packed.shape[0]
    in_specs = [
        pl.BlockSpec((1, packed.shape[1], 128), lambda s, *_: (s, _Z, _Z)),
        pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                     lambda s, csel, *_: (csel[s], _Z, _Z)),
    ]
    if dual:
        in_specs.append(pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                                     lambda s, csel, cselb, *_: (cselb[s], _Z, _Z)))
    scratch = []
    if kprep:
        scratch.append(pltpu.VMEM((128, 768), jnp.bfloat16))
        if dual:
            scratch.append(pltpu.VMEM((128, 768), jnp.bfloat16))
    if dual and not dboth:
        scratch += [pltpu.VMEM((_ts_rows(log2d, wide), 128), jnp.float32)
                    for _ in range(2)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * ROUT, 128),
                               lambda s, csel, cselb, hasb, osel, *_:
                               (osel[s], _Z, _Z)),
        scratch_shapes=scratch,
    )
    args = (csel, cselb, hasb, osel, first, packed, chunks) + ((chunks,) if dual else ())
    return pl.pallas_call(
        make_kernel(log2d, wide, dual, classpos, dboth, kprep),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nout, 2 * ROUT, 128), jnp.float32),
    )(*args)


def _force_mat(chunks):
    """Trivial Pallas consumer of the (perturbed) chunks array.  Pallas inputs
    are always materialized, so this reproduces the timing loop's per-iteration
    XLA concat copy exactly, without the SpMV kernel — a pure-XLA consumer would
    let the concat fuse or DCE away and under-measure the copy."""
    def k(c_ref, o_ref):
        o_ref[...] = c_ref[0, :8, :128].astype(jnp.float32)

    return pl.pallas_call(
        k,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                               lambda s: (_Z, _Z, _Z))],
        out_specs=pl.BlockSpec((8, 128), lambda s: (_Z, _Z)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(chunks)


def _copy_baseline(chunks, pert):
    """Per-iteration cost (seconds) of the timing loop's chunks rebuild alone.

    The loop-carried perturbation copies the ENTIRE chunks array every
    iteration, and the copy size differs between variants (196KB/chunk full
    bf16 planes vs 131KB/chunk kprep f32), scaling with nchunks rather than
    chunk_loads — uncorrected it systematically biases the comparison toward
    kprep (advisor r2, medium).  Measured here per variant and subtracted."""

    @jax.jit
    def loop(chunks, pert, n):
        def body(i, c):
            ch = jnp.concatenate(
                [(pert * (1.0 + c * 1e-30)).astype(chunks.dtype),
                 chunks[:, 1:]], axis=1)
            o = _force_mat(ch)
            return c + o[0, 0] * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def once(nn):
        t = time.perf_counter()
        r = loop(chunks, pert, nn)
        np.asarray(jax.device_get(r))
        return time.perf_counter() - t

    n0, n1 = 17, 65
    once(n0); once(n1)
    lo = min(once(n0) for _ in range(3))
    hi = min(once(n1) for _ in range(3))
    return (hi - lo) / (n1 - n0)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "boneS10"
    from spmv_acc_tpu.formats.generate import example_like, random_x_y

    csr = example_like(name, dtype=np.float64)
    dp = get_swell_plan(csr, np.float64)
    if dp.r != 1:
        print(f"{name}: plan is BSR r={dp.r}; probe is scalar-only", flush=True)
        return
    bargs = _bucket_args(dp, False)
    st = _statics(dp, False)
    log2ds, dboths = st[8], st[11]
    nout, nchunks, delta = st[2], st[3], st[7]
    x, _ = random_x_y(csr.shape[1], csr.shape[0], seed=42, dtype=np.float64)
    n_pad = nchunks * 128 * 128
    x64 = np.zeros((n_pad,), np.float64)
    x64[delta : delta + x.shape[0]] = x
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    chunks_f = jnp.asarray(np.concatenate(
        [xh.reshape(nchunks, 128, 128), xl.reshape(nchunks, 128, 128)], axis=2))
    chunks_p = S._prep_x_pure(jnp.asarray(x), nchunks, True, native=False,
                              delta=delta)
    pert_p = chunks_p[:, :1].astype(jnp.float32)
    pert_f = chunks_f[:, :1]
    order = sorted(range(len(bargs)), key=lambda i: -bargs[i][-2].shape[0])
    pick = [order[int(sys.argv[2])]] if len(sys.argv) > 2 else order[:3]
    copy_per = {False: _copy_baseline(chunks_p, pert_p),
                True: _copy_baseline(chunks_f, pert_f)}
    print(f"copy baseline: full {copy_per[False] * 1e6:.1f} us/iter, "
          f"kprep {copy_per[True] * 1e6:.1f} us/iter", flush=True)
    for bi in pick:
        ba = bargs[bi]
        l2d, wide, dual, cpos, _allout = log2ds[bi]
        dboth = dboths[bi] if dboths else False
        nsteps = ba[-2].shape[0]
        csel = np.asarray(ba[3] if len(ba) == 11 else ba[0])
        loads = int((np.diff(csel) != 0).sum()) + 1
        print(f"bucket {bi}: D={1 << l2d} wide={int(wide)} dual={int(dual)} "
              f"cpos={int(cpos)} dboth={int(dboth)} steps={nsteps} "
              f"chunk_loads={loads}", flush=True)
        outs = {}
        for kprep in (False, True):
            cha = chunks_f if kprep else chunks_p
            pa = pert_f if kprep else pert_p
            tag = "kprep" if kprep else "full "

            o = call_v(ba, cha, l2d, wide, dual, cpos, dboth, nout, kprep)
            outs[kprep] = np.asarray(o)

            @jax.jit
            def loop(ba, chunks, pert, n, kprep=kprep, l2d=l2d, wide=wide,
                     dual=dual, cpos=cpos, dboth=dboth):
                def body(i, c):
                    ch = jnp.concatenate(
                        [(pert * (1.0 + c * 1e-30)).astype(chunks.dtype),
                         chunks[:, 1:]], axis=1)
                    o = call_v(ba, ch, l2d, wide, dual, cpos, dboth, nout, kprep)
                    return c + o[0, 0, 0] * 1e-30

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            def once(nn):
                t = time.perf_counter()
                r = loop(ba, cha, pa, nn)
                np.asarray(jax.device_get(r))
                return time.perf_counter() - t

            n0, n1 = 17, 65
            once(n0); once(n1)
            lo = min(once(n0) for _ in range(3))
            hi = min(once(n1) for _ in range(3))
            per = (hi - lo) / (n1 - n0)
            adj = max(per - copy_per[kprep], 0.0)
            print(f"  {tag} {adj / nsteps * 1e9:7.0f} ns/step "
                  f"({adj * 1e6:8.1f} us/iter; raw {per * 1e6:.1f} incl. "
                  f"{copy_per[kprep] * 1e6:.1f} copy)", flush=True)
        same = np.array_equal(outs[False], outs[True])
        print(f"  outputs bit-identical: {same}", flush=True)
        if not same:
            d = np.abs(outs[False] - outs[True])
            print(f"  MAX ABS DIFF {d.max():.3e}", flush=True)


if __name__ == "__main__":
    main()
