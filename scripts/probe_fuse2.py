"""Probe: VERTICAL STEP FUSION — two same-(out,chunk) steps per grid iteration.

Hypothesis (PERF_NOTES): the swell step is CHAIN-LATENCY bound (~900ns chain,
~400ns max unit; Mosaic neither overlaps compute across grid steps nor
interleaves independent chains).  Stacking two steps' operands along sublanes —
(256,128) VPU ops, ONE taller table matmul per side, (2,128,128) folds — pays
each stage's latency ONCE PER PAIR: if stage cost = latency + size/throughput,
the pair saves ~(chain - unit-floor)/2 per original step (~25%+).  This differs
from the measured G=2 dead end, which packed two INDEPENDENT (128,128) bodies
and hoped the scheduler would interleave them (it did not): here the tall ops
ARE single instructions unless Mosaic re-splits them.

Pairing: consecutive steps sharing (csel, cselb, osel) — abundant inside
(out, chunk) runs; unpaired steps get an all-zero dummy half (exact zeros
through products, tables, occupancy and scatter).  Outputs are compared
BIT-EXACTLY: the fused accumulation order reproduces two consecutive grid
steps' 2Sum chaining.  Both variants consume the SAME chunks array, so the
timing loop's perturbation copy cancels in the comparison (the kprep probe's
copy-bias lesson).

Scope: f64 scalar (r=1), unpiped, acc=0; dual buckets must be dboth (the
3-way pl.when build is skipped).  Usage:
  python scripts/probe_fuse2.py [matrix] [bucket_index]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
INTERP = bool(os.environ.get("PROBE_INTERP"))
import jax

if INTERP:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_spmv")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_acc_tpu.ops import swell as S
from spmv_acc_tpu.ops.swell import (ROUT, _assemble_sets, _bucket_args, _dot1,
                                    _expand_tile, _gather_sel, _lane_gather,
                                    _mask_col, _packed_rows, _scatter_exact,
                                    _split, _statics, _tables_dual, _ts_rows,
                                    _unpack_bytes, get_swell_plan)

_Z = np.int32(0)


# ---------------------------------------------------------------- production
def make_prod_kernel(log2d, wide, dual, classpos, dboth):
    P, boff, ohw, nval, _ = _packed_rows(log2d, True, wide, 1)
    D = 1 << log2d

    def kernel(csel_r, cselb_r, hasb_r, osel_r, first_r, packed_ref, chunk_ref,
               *rest):
        rest = list(rest)
        chunkb_ref = rest.pop(0) if dual else None
        o_ref = rest.pop(0)
        ts_refs = rest if (dual and not dboth) else None
        s = pl.program_id(0)
        buf = packed_ref[0]
        vh = jax.lax.bitcast_convert_type(buf[:128], jnp.float32)
        vl = jax.lax.bitcast_convert_type(buf[128:256], jnp.float32)
        idx = _unpack_bytes(buf[nval : nval + 32], 128)
        oh = _unpack_bytes(buf[nval + 32 : nval + 32 + ohw], 4 * ohw)
        rb = buf[nval + 32 + ohw : nval + 33 + ohw]
        ca = chunk_ref[0]
        cb = chunkb_ref[0] if dual else None
        pairs = _tables_dual(oh, ca, cb, hasb_r[s], ts_refs, P, D, wide,
                             [0, 3], dboth)
        tha, thb = pairs[0]
        tla, tlb = pairs[1]
        gh = _gather_sel(tha, thb, idx) if wide else _lane_gather(tha, idx)
        gl = _gather_sel(tla, tlb, idx) if wide else _lane_gather(tla, idx)
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


# --------------------------------------------------------------------- fused
def make_fused_kernel(log2d, wide, dual, classpos, dboth, W, G=2):
    P, boff, ohw, nval, _ = _packed_rows(log2d, True, wide, 1)
    D = 1 << log2d
    nrows_t = boff + P if wide else P

    def kernel(csel_r, cselb_r, hasb_r, osel_r, first_r, packed_ref, chunk_ref,
               *rest):
        rest = list(rest)
        chunkb_ref = rest.pop(0) if dual else None
        o_ref = rest.pop(0)
        s = pl.program_id(0)
        buf = packed_ref[0]  # (G*W, 128)
        bs = [buf[g * W : (g + 1) * W] for g in range(G)]
        f32 = lambda rows: jax.lax.bitcast_convert_type(rows, jnp.float32)
        vh = jnp.concatenate([f32(b[:128]) for b in bs], 0)  # (G*128,128)
        vl = jnp.concatenate([f32(b[128:256]) for b in bs], 0)
        idx = jnp.concatenate(
            [_unpack_bytes(b[nval : nval + 32], 128) for b in bs], 0)
        ohs = [_unpack_bytes(b[nval + 32 : nval + 32 + ohw], 4 * ohw)[:nrows_t]
               for b in bs]
        oh2 = jnp.concatenate(ohs, 0)  # (G*nrows_t, 128)
        ca = chunk_ref[0]
        cb = chunkb_ref[0] if dual else None
        if dual:  # dboth: unconditional both-sides build, ONE taller matmul/side
            sw = (_dot1((oh2 & 1).astype(jnp.bfloat16), ca)
                  + _dot1((oh2 >> 1).astype(jnp.bfloat16), cb))
        else:
            sw = _dot1(oh2.astype(jnp.bfloat16), ca)
        th, tl = _assemble_sets(sw, [0, 3])  # (G*nrows_t, 128) each

        def ex2(t):
            mains = [_expand_tile(t[g * nrows_t : g * nrows_t + P], D, P)
                     for g in range(G)]
            main = jnp.concatenate(mains, 0)
            if not wide:
                return main, None
            bsd = [_expand_tile(t[g * nrows_t + boff : g * nrows_t + boff + P], D, P)
                   for g in range(G)]
            return main, jnp.concatenate(bsd, 0)

        tha, thb = ex2(th)
        tla, tlb = ex2(tl)
        gh = _gather_sel(tha, thb, idx) if wide else _lane_gather(tha, idx)
        gl = _gather_sel(tla, tlb, idx) if wide else _lane_gather(tla, idx)
        bh, bl = _split(gh)
        p = vh * gh
        ah, al = _split(vh)
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        e = e + (vh * gl + (vl * gh + vl * gl))
        p3 = p.reshape(G, 128, 128)
        e3 = e.reshape(G, 128, 128)
        for _lv in range(log2d):
            half = p3.shape[1] // 2
            a, b = p3[:, :half], p3[:, half:]
            ssum = a + b
            bb = ssum - a
            err = (a - (ssum - bb)) + (b - bb)
            e3 = e3[:, :half] + e3[:, half:] + err
            p3 = ssum
        halves_p = [p3[g] for g in range(G)]
        halves_e = [e3[g] for g in range(G)]
        if classpos and log2d == 0:
            pass
        elif classpos:
            for g, b in enumerate(bs):
                occ = b[nval + 33 + ohw : nval + 34 + ohw]
                mk = _mask_col(occ)
                halves_p[g] = _expand_tile(halves_p[g], D, P) * mk
                halves_e[g] = _expand_tile(halves_e[g], D, P) * mk
        else:
            for g, b in enumerate(bs):
                rb = b[nval + 32 + ohw : nval + 33 + ohw]
                og = _scatter_exact(rb, (halves_p[g], halves_e[g]), P)
                halves_p[g], halves_e[g] = og[0], og[1]
        first = first_r[s]

        def chain(cur, cure, start):
            for g in range(start, G):
                s1 = cur + halves_p[g]
                b1 = s1 - cur
                e1 = (cur - (s1 - b1)) + (halves_p[g] - b1)
                cure = cure + halves_e[g] + e1
                cur = s1
            return cur, cure

        @pl.when(first == 1)
        def _():
            cur, cure = chain(halves_p[0], halves_e[0], 1)
            o_ref[0, :ROUT] = cur
            o_ref[0, ROUT:] = cure

        @pl.when(first == 0)
        def _():
            cur, cure = chain(o_ref[0, :ROUT], o_ref[0, ROUT:], 0)
            o_ref[0, :ROUT] = cur
            o_ref[0, ROUT:] = cure

    return kernel


# -------------------------------------------------------------------- calls
def call_prod(ba7, chunks, log2d, wide, dual, classpos, dboth, nout):
    csel, cselb, hasb, osel, first, packed, _t = ba7
    nsteps = packed.shape[0]
    in_specs = [
        pl.BlockSpec((1, packed.shape[1], 128), lambda s, *_: (s, _Z, _Z)),
        pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                     lambda s, csel, *_: (csel[s], _Z, _Z)),
    ]
    if dual:
        in_specs.append(pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                                     lambda s, csel, cselb, *_: (cselb[s], _Z, _Z)))
    scratch = ([pltpu.VMEM((_ts_rows(log2d, wide), 128), jnp.float32)
                for _ in range(2)] if (dual and not dboth) else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5, grid=(nsteps,), in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * ROUT, 128),
                               lambda s, csel, cselb, hasb, osel, *_:
                               (osel[s], _Z, _Z)),
        scratch_shapes=scratch,
    )
    args = (csel, cselb, hasb, osel, first, packed, chunks) + ((chunks,) if dual else ())
    return pl.pallas_call(
        make_prod_kernel(log2d, wide, dual, classpos, dboth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nout, 2 * ROUT, 128), jnp.float32),
        interpret=INTERP,
    )(*args)


def call_fused(fa, chunks, log2d, wide, dual, classpos, dboth, nout, W, G=2):
    csel, cselb, hasb, osel, first, packed2 = fa
    nsteps = packed2.shape[0]
    in_specs = [
        pl.BlockSpec((1, G * W, 128), lambda s, *_: (s, _Z, _Z)),
        pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                     lambda s, csel, *_: (csel[s], _Z, _Z)),
    ]
    if dual:
        in_specs.append(pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                                     lambda s, csel, cselb, *_: (cselb[s], _Z, _Z)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5, grid=(nsteps,), in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * ROUT, 128),
                               lambda s, csel, cselb, hasb, osel, *_:
                               (osel[s], _Z, _Z)),
    )
    args = (csel, cselb, hasb, osel, first, packed2, chunks) + ((chunks,) if dual else ())
    return pl.pallas_call(
        make_fused_kernel(log2d, wide, dual, classpos, dboth, W, G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nout, 2 * ROUT, 128), jnp.float32),
        interpret=INTERP,
    )(*args)


def pair_steps(csel, cselb, hasb, osel, first, packed, G=2):
    csel = np.asarray(csel); cselb = np.asarray(cselb); hasb = np.asarray(hasb)
    osel = np.asarray(osel); first = np.asarray(first)
    packed = np.asarray(packed)
    nsteps, W, _ = packed.shape
    groups = []
    i = 0
    while i < nsteps:
        grp = [i]
        j = i + 1
        while (len(grp) < G and j < nsteps and csel[j] == csel[i]
               and cselb[j] == cselb[i] and osel[j] == osel[i]
               and first[j] == 0):
            grp.append(j)
            j += 1
        groups.append(grp)
        i = j
    n2 = len(groups)
    packed2 = np.zeros((n2, G * W, 128), packed.dtype)
    c2 = np.zeros(n2, csel.dtype); cb2 = np.zeros(n2, cselb.dtype)
    h2 = np.zeros(n2, hasb.dtype); o2 = np.zeros(n2, osel.dtype)
    f2 = np.zeros(n2, first.dtype)
    n_dummy = 0
    for t, grp in enumerate(groups):
        for g, src_i in enumerate(grp):
            packed2[t, g * W : (g + 1) * W] = packed[src_i]
        n_dummy += G - len(grp)
        a = grp[0]
        c2[t], cb2[t], o2[t], f2[t] = csel[a], cselb[a], osel[a], first[a]
        h2[t] = max(hasb[g] for g in grp)
    return ((jnp.asarray(c2), jnp.asarray(cb2), jnp.asarray(h2),
             jnp.asarray(o2), jnp.asarray(f2), jnp.asarray(packed2)),
            n2, n_dummy)


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
    chunks = S._prep_x_pure(jnp.asarray(x), nchunks, True, native=False,
                            delta=delta)
    pert = chunks[:, :1].astype(jnp.float32)
    order = sorted(range(len(bargs)), key=lambda i: -bargs[i][-2].shape[0])
    pick = [order[int(sys.argv[2])]] if len(sys.argv) > 2 else order[:3]
    for bi in pick:
        ba = bargs[bi]
        l2d, wide, dual, cpos, _allout = log2ds[bi]
        dboth = dboths[bi] if dboths else False
        if dual and not dboth:
            print(f"bucket {bi}: dual non-dboth (3-way pl.when) — skipped", flush=True)
            continue
        if len(ba) == 11:
            ba7 = (ba[3], ba[4], ba[5], ba[6], ba[7], ba[9], ba[10])
        else:
            ba7 = ba[:7]
        nsteps = ba7[5].shape[0]
        W = ba7[5].shape[1]
        G = int(os.environ.get("FUSE_G", "2"))
        fa, n2, n_dummy = pair_steps(*ba7[:6], G=G)
        print(f"bucket {bi}: D={1 << l2d} wide={int(wide)} dual={int(dual)} "
              f"cpos={int(cpos)} dboth={int(dboth)} steps={nsteps} -> "
              f"G={G} fused={n2} (dummy halves {n_dummy}, "
              f"fill rate {nsteps / (n2 * G):.0%})", flush=True)

        o_prod = np.asarray(call_prod(ba7, chunks, l2d, wide, dual, cpos,
                                      dboth, nout))
        o_fuse = np.asarray(call_fused(fa, chunks, l2d, wide, dual, cpos,
                                       dboth, nout, W, G))
        same = np.array_equal(o_prod, o_fuse)
        print(f"  outputs bit-identical: {same}"
              + ("" if same else f"  MAX ABS DIFF {np.abs(o_prod - o_fuse).max():.3e}"),
              flush=True)

        for tag, args, fn in (
                ("prod ", ba7, lambda a, ch: call_prod(
                    a, ch, l2d, wide, dual, cpos, dboth, nout)),
                ("fused", fa, lambda a, ch: call_fused(
                    a, ch, l2d, wide, dual, cpos, dboth, nout, W, G))):
            @jax.jit
            def loop(args, chunks, pert, n, fn=fn):
                # args passed THROUGH the jit: closing over them embeds
                # hundreds of MB in the HLO (HTTP 413 at G=4 bucket sizes)
                def body(i, c):
                    ch = jnp.concatenate(
                        [(pert * (1.0 + c * 1e-30)).astype(chunks.dtype),
                         chunks[:, 1:]], axis=1)
                    o = fn(args, ch)
                    return c + o[0, 0, 0] * 1e-30

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            def once(nn):
                t = time.perf_counter()
                r = loop(args, chunks, pert, nn)
                np.asarray(jax.device_get(r))
                return time.perf_counter() - t

            n0, n1 = 17, 65
            once(n0); once(n1)
            lo = min(once(n0) for _ in range(3))
            hi = min(once(n1) for _ in range(3))
            per = (hi - lo) / (n1 - n0)
            print(f"  {tag} {per / nsteps * 1e9:7.0f} ns/orig-step "
                  f"({per * 1e6:8.1f} us/iter)", flush=True)


if __name__ == "__main__":
    main()
