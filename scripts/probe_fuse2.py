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
def make_fused_kernel(log2d, wide, dual, classpos, dboth, W):
    P, boff, ohw, nval, _ = _packed_rows(log2d, True, wide, 1)
    D = 1 << log2d
    nrows_t = boff + P if wide else P

    def kernel(csel_r, cselb_r, hasb_r, osel_r, first_r, packed_ref, chunk_ref,
               *rest):
        rest = list(rest)
        chunkb_ref = rest.pop(0) if dual else None
        o_ref = rest.pop(0)
        s = pl.program_id(0)
        buf = packed_ref[0]  # (2W, 128)
        bA = buf[:W]
        bB = buf[W:]
        f32 = lambda rows: jax.lax.bitcast_convert_type(rows, jnp.float32)
        vh = jnp.concatenate([f32(bA[:128]), f32(bB[:128])], 0)  # (256,128)
        vl = jnp.concatenate([f32(bA[128:256]), f32(bB[128:256])], 0)
        idx = jnp.concatenate(
            [_unpack_bytes(bA[nval : nval + 32], 128),
             _unpack_bytes(bB[nval : nval + 32], 128)], 0)
        ohA = _unpack_bytes(bA[nval + 32 : nval + 32 + ohw], 4 * ohw)[:nrows_t]
        ohB = _unpack_bytes(bB[nval + 32 : nval + 32 + ohw], 4 * ohw)[:nrows_t]
        oh2 = jnp.concatenate([ohA, ohB], 0)  # (2*nrows_t, 128)
        ca = chunk_ref[0]
        cb = chunkb_ref[0] if dual else None
        if dual:  # dboth: unconditional both-sides build, ONE taller matmul/side
            sw = (_dot1((oh2 & 1).astype(jnp.bfloat16), ca)
                  + _dot1((oh2 >> 1).astype(jnp.bfloat16), cb))
        else:
            sw = _dot1(oh2.astype(jnp.bfloat16), ca)
        th, tl = _assemble_sets(sw, [0, 3])  # (2*nrows_t, 128) each

        def ex2(t):
            a = _expand_tile(t[:P], D, P)
            b = _expand_tile(t[nrows_t : nrows_t + P], D, P)
            main = jnp.concatenate([a, b], 0)  # (256,128)
            if not wide:
                return main, None
            a2 = _expand_tile(t[boff : boff + P], D, P)
            b2 = _expand_tile(t[nrows_t + boff : nrows_t + boff + P], D, P)
            return main, jnp.concatenate([a2, b2], 0)

        tha, thb = ex2(th)
        tla, tlb = ex2(tl)
        gh = _gather_sel(tha, thb, idx) if wide else _lane_gather(tha, idx)
        gl = _gather_sel(tla, tlb, idx) if wide else _lane_gather(tla, idx)
        bh, bl = _split(gh)
        p = vh * gh
        ah, al = _split(vh)
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        e = e + (vh * gl + (vl * gh + vl * gl))
        p3 = p.reshape(2, 128, 128)
        e3 = e.reshape(2, 128, 128)
        for _lv in range(log2d):
            half = p3.shape[1] // 2
            a, b = p3[:, :half], p3[:, half:]
            ssum = a + b
            bb = ssum - a
            err = (a - (ssum - bb)) + (b - bb)
            e3 = e3[:, :half] + e3[:, half:] + err
            p3 = ssum
        if classpos and log2d == 0:
            pA, eA = p3[0], e3[0]
            pB, eB = p3[1], e3[1]
        elif classpos:
            occA = bA[nval + 33 + ohw : nval + 34 + ohw]
            occB = bB[nval + 33 + ohw : nval + 34 + ohw]
            pA = _expand_tile(p3[0], D, P) * _mask_col(occA)
            eA = _expand_tile(e3[0], D, P) * _mask_col(occA)
            pB = _expand_tile(p3[1], D, P) * _mask_col(occB)
            eB = _expand_tile(e3[1], D, P) * _mask_col(occB)
        else:
            rbA = bA[nval + 32 + ohw : nval + 33 + ohw]
            rbB = bB[nval + 32 + ohw : nval + 33 + ohw]
            oA = _scatter_exact(rbA, (p3[0], e3[0]), P)
            oB = _scatter_exact(rbB, (p3[1], e3[1]), P)
            pA, eA = oA[0], oA[1]
            pB, eB = oB[0], oB[1]
        first = first_r[s]

        @pl.when(first == 1)
        def _():
            # half A initializes; half B chains with 2Sum — identical rounding
            # to two consecutive production steps
            ssum = pA + pB
            bb = ssum - pA
            err = (pA - (ssum - bb)) + (pB - bb)
            o_ref[0, :ROUT] = ssum
            o_ref[0, ROUT:] = eA + eB + err

        @pl.when(first == 0)
        def _():
            cur = o_ref[0, :ROUT]
            s1 = cur + pA
            b1 = s1 - cur
            e1 = (cur - (s1 - b1)) + (pA - b1)
            s2 = s1 + pB
            b2 = s2 - s1
            e2 = (s1 - (s2 - b2)) + (pB - b2)
            o_ref[0, :ROUT] = s2
            o_ref[0, ROUT:] = ((o_ref[0, ROUT:] + eA + e1) + eB) + e2

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


def call_fused(fa, chunks, log2d, wide, dual, classpos, dboth, nout, W):
    csel, cselb, hasb, osel, first, packed2 = fa
    nsteps = packed2.shape[0]
    in_specs = [
        pl.BlockSpec((1, 2 * W, 128), lambda s, *_: (s, _Z, _Z)),
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
        make_fused_kernel(log2d, wide, dual, classpos, dboth, W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nout, 2 * ROUT, 128), jnp.float32),
        interpret=INTERP,
    )(*args)


def pair_steps(csel, cselb, hasb, osel, first, packed):
    csel = np.asarray(csel); cselb = np.asarray(cselb); hasb = np.asarray(hasb)
    osel = np.asarray(osel); first = np.asarray(first)
    packed = np.asarray(packed)
    nsteps, W, _ = packed.shape
    pairs = []
    i = 0
    while i < nsteps:
        j = i + 1
        if (j < nsteps and csel[j] == csel[i] and cselb[j] == cselb[i]
                and osel[j] == osel[i]):
            pairs.append((i, j))
            i += 2
        else:
            pairs.append((i, -1))
            i += 1
    n2 = len(pairs)
    packed2 = np.zeros((n2, 2 * W, 128), packed.dtype)
    c2 = np.zeros(n2, csel.dtype); cb2 = np.zeros(n2, cselb.dtype)
    h2 = np.zeros(n2, hasb.dtype); o2 = np.zeros(n2, osel.dtype)
    f2 = np.zeros(n2, first.dtype)
    n_dummy = 0
    for t, (a, b) in enumerate(pairs):
        packed2[t, :W] = packed[a]
        if b >= 0:
            packed2[t, W:] = packed[b]
        else:
            n_dummy += 1
        c2[t], cb2[t], o2[t], f2[t] = csel[a], cselb[a], osel[a], first[a]
        h2[t] = max(hasb[a], hasb[b] if b >= 0 else 0)
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
        fa, n2, n_dummy = pair_steps(*ba7[:6])
        print(f"bucket {bi}: D={1 << l2d} wide={int(wide)} dual={int(dual)} "
              f"cpos={int(cpos)} dboth={int(dboth)} steps={nsteps} -> "
              f"fused={n2} (dummy halves {n_dummy}, "
              f"pair rate {(nsteps - n_dummy) / nsteps:.0%})", flush=True)

        o_prod = np.asarray(call_prod(ba7, chunks, l2d, wide, dual, cpos,
                                      dboth, nout))
        o_fuse = np.asarray(call_fused(fa, chunks, l2d, wide, dual, cpos,
                                       dboth, nout, W))
        same = np.array_equal(o_prod, o_fuse)
        print(f"  outputs bit-identical: {same}"
              + ("" if same else f"  MAX ABS DIFF {np.abs(o_prod - o_fuse).max():.3e}"),
              flush=True)

        for tag, fn in (("prod ", lambda ch: call_prod(
                            ba7, ch, l2d, wide, dual, cpos, dboth, nout)),
                        ("fused", lambda ch: call_fused(
                            fa, ch, l2d, wide, dual, cpos, dboth, nout, W))):
            @jax.jit
            def loop(chunks, pert, n, fn=fn):
                def body(i, c):
                    ch = jnp.concatenate(
                        [(pert * (1.0 + c * 1e-30)).astype(chunks.dtype),
                         chunks[:, 1:]], axis=1)
                    o = fn(ch)
                    return c + o[0, 0, 0] * 1e-30

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
            per = (hi - lo) / (n1 - n0)
            print(f"  {tag} {per / nsteps * 1e9:7.0f} ns/orig-step "
                  f"({per * 1e6:8.1f} us/iter)", flush=True)


if __name__ == "__main__":
    main()
