"""pipe3 probe: 3-stage software-pipelined swell kernel (VERDICT r4 #1).

The production step body is one serial chain per grid iteration:
tables(MXU) -> gather(VPU) -> Dekker(VPU) -> fold(VPU) -> scatter(MXU) -> acc,
measured ~600-900 ns vs a ~400 ns stripped floor — chain-LATENCY bound, and
Mosaic does not overlap compute across grid steps (only DMAs).  The landed
"pipe" variant decouples only the table build (-3..6%).

pipe3 restructures the body into THREE independent chains per iteration s:
  TB(s)   : build step s's tables into VMEM scratch        (MXU)
  GD(s-1) : gather + Dekker products of step s-1 from the
            tables built last iteration; stash (p, e, meta) (VPU)
  FS(s-2) : fold + scatter + output accumulate of step s-2
            from last iteration's stash                     (VPU+MXU)
No chain consumes another's result within the same iteration, so an in-order
issue scheduler can keep MXU and VPU busy concurrently; per-iter cost should
approach max(chain) rather than sum(chain).  Grid runs n+2 iterations with
clamped index maps (no array copies); the first two iterations write garbage
to the first out block which iteration 2 overwrites (first[0] == 1 always),
so results are bit-identical to the production kernel.

Reference analog: the register-prefetch double-buffer kernels of
/root/reference/src/acc/hip-vector-row/opt_double_buffer.hpp:104-291 — they
prefetch row data one iteration ahead; pipe3 retires row data one iteration
late as well, splitting the dependence chain three ways.

Usage: python scripts/probe_pipe3.py [matrix] [bucket_index ...]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_acc_tpu.ops import swell as S
from spmv_acc_tpu.ops.swell import (
    ROUT, _build_tables_refs, _bucket_args, _call_f64, _expand_tile,
    _gather_sel, _lane_gather, _mask_col, _packed_rows, _prep_x_pure,
    _read_pairs, _scatter_exact, _split, _statics, _ts_rows, _unpack_bytes,
    get_swell_plan)

_Z = np.int32(0)


def make_pipe3_kernel(log2d, wide, dual, classpos, dboth):
    """f64, r=1, k=1.  Stages: TB(s) | GD(s-1) | FS(s-2)."""
    P, boff, ohw, nval, _ = _packed_rows(log2d, True, wide, 1)
    D = 1 << log2d
    bases = [0, 3]
    nrows_t = boff + P if wide else P

    def kernel(cselT_r, cselbT_r, hasbT_r, oselF_r, firstF_r,
               packed_ref, chunk_ref, *rest):
        rest = list(rest)
        chunkb_ref = rest.pop(0) if dual else None
        ohn_ref = rest.pop(0)
        o_ref = rest.pop(0)
        tsa_ref, tsl_ref, stp_ref, ste_ref, stm_ref = rest
        ts_refs = [tsa_ref, tsl_ref]
        s = pl.program_id(0)

        # ---- FS reads (issue first: the stash is rewritten by GD below)
        p_prev = stp_ref[...]
        e_prev = ste_ref[...]
        meta = stm_ref[...]
        # ---- GD reads: tables from scratch (before TB's stores), packed buf
        pairs = _read_pairs(ts_refs, P, D, wide)
        buf = packed_ref[0]
        vh = jax.lax.bitcast_convert_type(buf[:128], jnp.float32)
        vl = jax.lax.bitcast_convert_type(buf[128:256], jnp.float32)
        idx = _unpack_bytes(buf[nval : nval + 32], 128)
        rb_cur = buf[nval + 32 + ohw : nval + 33 + ohw]
        occ_cur = buf[nval + 33 + ohw : nval + 34 + ohw]
        ca = chunk_ref[0]
        cb = chunkb_ref[0] if dual else None

        # ---- TB: build step s's tables (MXU; stores ordered after the pair
        # loads above, so they cannot clobber this iteration's GD tables)
        ohn = _unpack_bytes(ohn_ref[0], 4 * ohw)
        _build_tables_refs(ohn, ca, cb, hasbT_r[s], ts_refs, nrows_t, bases,
                           dboth)

        # ---- GD: gather + Dekker for step s-1
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

        # ---- FS: fold + scatter + accumulate for step s-2
        pf, ef = p_prev, e_prev
        for _ in range(log2d):
            half = pf.shape[0] // 2
            a, b = pf[:half], pf[half:]
            ssum = a + b
            bb = ssum - a
            err = (a - (ssum - bb)) + (b - bb)
            ef = ef[:half] + ef[half:] + err
            pf = ssum
        if classpos and log2d == 0:
            pass
        elif classpos:
            mk = _mask_col(meta[1:2])
            pf = _expand_tile(pf, D, P) * mk
            ef = _expand_tile(ef, D, P) * mk
        else:
            outs = _scatter_exact(meta[0:1], (pf, ef), P)
            pf, ef = outs[0], outs[1]
        first = firstF_r[s]

        @pl.when(first == 1)
        def _():
            o_ref[0, :ROUT] = pf
            o_ref[0, ROUT:] = ef

        @pl.when(first == 0)
        def _():
            cur = o_ref[0, :ROUT]
            ssum = cur + pf
            bb = ssum - cur
            err = (cur - (ssum - bb)) + (pf - bb)
            o_ref[0, :ROUT] = ssum
            o_ref[0, ROUT:] = o_ref[0, ROUT:] + ef + err

        # ---- GD stash writes (after FS consumed last iteration's)
        stp_ref[...] = p
        ste_ref[...] = e
        stm_ref[0:1] = rb_cur
        stm_ref[1:2] = occ_cur

    return kernel


def call_pipe3(plain, chunks, log2d, wide, dual, classpos, dboth, nout):
    """plain = (csel, cselb, hasb, osel, first, packed, touched) production
    arrays; grid = n + 2 with clamped index maps."""
    csel, cselb, hasb, osel, first, packed, _t = plain
    n = packed.shape[0]
    N = n + 2
    cs = np.asarray(csel)
    cbs = np.asarray(cselb)
    hb = np.asarray(hasb)
    osl = np.asarray(osel)
    fi = np.asarray(first)
    idxT = np.minimum(np.arange(N), n - 1)
    idxF = np.clip(np.arange(N) - 2, 0, n - 1)
    cselT = jnp.asarray(cs[idxT])
    cselbT = jnp.asarray(cbs[idxT])
    hasbT = jnp.asarray(hb[idxT])
    oselF = jnp.asarray(osl[idxF])
    firstF = jnp.asarray(fi[idxF])
    _, _, ohw, nval, _ = _packed_rows(log2d, True, wide, 1)
    ohs = packed[:, nval + 32 : nval + 32 + ohw]

    nm1 = np.int32(n - 1)
    in_specs = [
        pl.BlockSpec((1, packed.shape[1], 128),
                     lambda s, *_: (jnp.maximum(jnp.minimum(s - 1, nm1), _Z),
                                    _Z, _Z)),
        pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                     lambda s, cT, *_: (cT[s], _Z, _Z)),
    ]
    if dual:
        in_specs.append(pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                                     lambda s, cT, cbT, *_: (cbT[s], _Z, _Z)))
    in_specs.append(pl.BlockSpec((1, ohs.shape[1], 128),
                                 lambda s, *_: (jnp.minimum(s, nm1), _Z, _Z)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * ROUT, 128),
                               lambda s, cT, cbT, hT, oF, *_: (oF[s], _Z, _Z)),
        scratch_shapes=[pltpu.VMEM((_ts_rows(log2d, wide), 128), jnp.float32)
                        for _ in range(2)]
        + [pltpu.VMEM((128, 128), jnp.float32) for _ in range(2)]
        + [pltpu.VMEM((8, 128), jnp.int32)],
    )
    args = ((cselT, cselbT, hasbT, oselF, firstF, packed, chunks)
            + ((chunks,) if dual else ()) + (ohs,))
    return pl.pallas_call(
        make_pipe3_kernel(log2d, wide, dual, classpos, dboth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nout, 2 * ROUT, 128), jnp.float32),
    )(*args)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "boneS10"
    from spmv_acc_tpu.formats.generate import example_like, random_x_y

    csr = example_like(name, dtype=np.float64)
    dp = get_swell_plan(csr, np.float64)
    bargs = _bucket_args(dp, False)
    st = _statics(dp, False)
    log2ds, dboths, fuseds = st[8], st[11], st[12]
    nout, nchunks, delta = st[2], st[3], st[7]
    x, _ = random_x_y(csr.shape[1], csr.shape[0], seed=42, dtype=np.float64)
    chunks = _prep_x_pure(jnp.asarray(x), nchunks, True, native=False, delta=delta)
    chunks = jax.block_until_ready(chunks)
    pert = chunks[:, :1].astype(jnp.float32)

    def plain_of(ba):
        if len(ba) == 11:
            return (ba[3], ba[4], ba[5], ba[6], ba[7], ba[9], ba[10])
        return ba[:7]

    order = sorted(range(len(bargs)), key=lambda i: -plain_of(bargs[i])[5].shape[0])
    picks = ([int(a) for a in sys.argv[2:]] if len(sys.argv) > 2 else order[:3])
    for bi in picks:
        ba = bargs[bi]
        plain = plain_of(ba)
        l2d, wide, dual, cpos, allout = log2ds[bi]
        dboth = dboths[bi]
        G = fuseds[bi]
        nsteps = plain[5].shape[0]
        print(f"bucket {bi}: D={1 << l2d} wide={int(wide)} dual={int(dual)} "
              f"cpos={int(cpos)} dboth={int(dboth)} fuse={G} steps={nsteps}",
              flush=True)
        if dual and not dboth:
            print("  skip: dual non-dboth (pl.when build) not supported by probe")
            continue

        # ---- verification: bit-identical vs the production unfused kernel
        ref = _call_f64(*plain[:6], chunks, l2d, wide, nout, False, dual=dual,
                        classpos=cpos, dboth=dboth)
        got = call_pipe3(plain, chunks, l2d, wide, dual, cpos, dboth, nout)
        rn = np.asarray(jax.device_get(ref))
        gn = np.asarray(jax.device_get(got))
        # only compare windows this bucket touches (untouched windows hold
        # garbage from the s=0/1 warmup only if osel[0] maps there — it
        # doesn't; but the production call leaves untouched windows zero)
        touched = np.asarray(plain[6])
        same = np.array_equal(rn[touched], gn[touched])
        print(f"  verify bit-identical: {same}", flush=True)
        if not same:
            d = np.abs(rn[touched] - gn[touched])
            print(f"    maxdiff {d.max():.3e} at {np.unravel_index(np.argmax(d), d.shape)}")
            continue

        # ---- timing: prod (the bucket's production config) vs pipe3
        def timed(fn, ns_steps):
            @jax.jit
            def loop(chunks, pert, nn):
                def body(i, c):
                    ch = jnp.concatenate(
                        [(pert * (1.0 + c * 1e-30)).astype(jnp.bfloat16),
                         chunks[:, 1:]], axis=1)
                    o = fn(ch)
                    return c + o[0, 0, 0] * 1e-30

                return jax.lax.fori_loop(0, nn, body, jnp.float32(0.0))

            def once(nn):
                t = time.perf_counter()
                r = loop(chunks, pert, nn)
                np.asarray(jax.device_get(r))
                return time.perf_counter() - t

            n0, n1 = 17, 65
            once(n0); once(n1)
            lo = min(once(n0) for _ in range(3))
            hi = min(once(n1) for _ in range(3))
            per = (hi - lo) / (n1 - n0)
            return per / ns_steps * 1e9, per * 1e6

        arms = {}
        arms["prod_unfused"] = lambda ch: _call_f64(
            *plain[:6], ch, l2d, wide, nout, False, dual=dual, classpos=cpos,
            dboth=dboth)
        if len(ba) == 11:
            arms["prod_pipe"] = lambda ch: S._call_piped(
                ba[0], ba[1], ba[2], ba[6], ba[7], ba[9], ba[8], ch, l2d, wide,
                nout, False, dual, cpos, is64=True, dboth=dboth)
        if G > 1:
            arms["prod_fused"] = lambda ch: S._call_fused(
                ba[7], ba[8], ba[9], ba[10], ba[11], ba[5], ch, l2d, wide,
                nout, True, dual, cpos, dboth=dboth, G=G, k=1)
            arms["fused3"] = lambda ch: S._call_fused3(
                ba[7], ba[8], ba[9], ba[10], ba[11], ba[5], ch, l2d, wide,
                nout, True, dual, cpos, dboth=dboth, G=G)
            f3 = np.asarray(jax.device_get(arms["fused3"](chunks)))
            fr = np.asarray(jax.device_get(arms["prod_fused"](chunks)))
            print(f"  fused3 bit-identical vs fused: "
                  f"{np.array_equal(fr[touched], f3[touched])}", flush=True)
        arms["pipe3"] = lambda ch: call_pipe3(
            plain, ch, l2d, wide, dual, cpos, dboth, nout)
        for nm, fn in arms.items():
            ns, us = timed(fn, nsteps)
            print(f"  {nm:14s} {ns:7.0f} ns/step ({us:8.1f} us/iter)", flush=True)


if __name__ == "__main__":
    main()
