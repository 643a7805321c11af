"""Stage ablation of the CURRENT production f64 swell kernel on real TPU.

For the largest bucket of a matrix's scalar plan, times kernel variants with one
stage stubbed out each (semantics intentionally broken — this is a cost probe):

  full        production kernel
  no_tables   table pairs replaced by raw chunk slices (skips the one-hot matmuls)
  no_gather   gather replaced by the table rows themselves
  no_dekker   plain f32 product, e=0 (skips splits + error capture + cross terms)
  no_fold2sum fold uses plain adds (skips 2Sum per level)
  no_acc2sum  output accumulate uses plain adds
  no_mask     classpos occupancy mask skipped (classpos buckets only)

Usage: python scripts/ablate_step.py [matrix] [bucket_index]
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
from spmv_acc_tpu.ops.swell import (ROUT, _bucket_args, _gather_sel, _lane_gather,
                                    _mask_col, _expand_tile, _packed_rows,
                                    _prep_x_pure, _split, _statics, _tables_dual,
                                    _unpack_bytes, get_swell_plan)

_Z = np.int32(0)


def make_kernel(log2d, wide, dual, classpos, ab):
    nv = 1
    P, boff, ohw, nval, _ = _packed_rows(log2d, True, wide, nv)
    D = 1 << log2d

    def kernel(csel_r, cselb_r, hasb_r, osel_r, first_r, packed_ref, chunk_ref,
               *rest):
        if dual:
            chunkb_ref, o_ref = rest[0], rest[1]
            ts_refs = rest[2:]
        else:
            o_ref = rest[0]
            ts_refs = None
        s = pl.program_id(0)
        buf = packed_ref[0]
        if ab == "dma_only":
            # floor probe: keep every DMA live (packed in, out tile), no compute
            o_ref[0, :8] = jax.lax.bitcast_convert_type(buf[:8], jnp.float32)
            return
        vhh = jax.lax.bitcast_convert_type(buf[:128], jnp.float32)
        vlo = jax.lax.bitcast_convert_type(buf[128:256], jnp.float32)
        if ab == "no_unpack":
            idx = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (4 * ohw, 128), 1)
                  < 64).astype(jnp.int32)
        else:
            idx = _unpack_bytes(buf[nval : nval + 32], 128)
            oh = _unpack_bytes(buf[nval + 32 : nval + 32 + ohw], 4 * ohw)
        rb = buf[nval + 32 + ohw : nval + 33 + ohw]
        if ab != "wtab":
            sets_hi = [[chunk_ref[0, i * 128 : (i + 1) * 128] for i in range(3)]]
            sets_lo = [[chunk_ref[0, (3 + i) * 128 : (4 + i) * 128] for i in range(3)]]
            if dual:
                sets_hi_b = [[chunkb_ref[0, i * 128 : (i + 1) * 128] for i in range(3)]]
                sets_lo_b = [[chunkb_ref[0, (3 + i) * 128 : (4 + i) * 128] for i in range(3)]]
        if ab == "wtab":
            # one WIDE matmul per side: chunk planes lane-concatenated (128, 768)
            # so the 6 per-side (.,128)@(128,128) matmuls collapse into a single
            # (.,128)@(128,768) — probes whether per-matmul MXU setup overhead
            # is the table-cost line item
            nrows = boff + P if wide else P
            ohr = oh[:nrows]

            def expand(t):
                if D == 1:
                    return t
                return jnp.broadcast_to(t[None], (D, P, 128)).reshape(128, 128)

            def widedot(o, rhs):
                return jax.lax.dot_general(
                    o, rhs, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)

            if dual:
                oha = (ohr & 1).astype(jnp.bfloat16)
                ohb = (ohr >> 1).astype(jnp.bfloat16)
                sw = widedot(oha, chunk_ref[0]) + widedot(ohb, chunkb_ref[0])
            else:
                sw = widedot(ohr.astype(jnp.bfloat16), chunk_ref[0])
            tsh = (sw[:, 256:384] + sw[:, 128:256]) + sw[:, :128]
            tsl = (sw[:, 640:768] + sw[:, 512:640]) + sw[:, 384:512]
            pairs = [
                (expand(tsh[:P]), expand(tsh[boff:boff + P]) if wide else None),
                (expand(tsl[:P]), expand(tsl[boff:boff + P]) if wide else None),
            ]
        elif ab == "pipe_tables":
            # SCHEDULING PROBE (semantics wrong: off-by-one tables): build this
            # step's tables into locals while the VPU chain consumes LAST step's
            # tables from scratch — measures whether Mosaic overlaps the MXU
            # table matmuls with the dependent VPU chain of the previous build.
            tsa_ref, tsb_ref = rest[-2], rest[-1]
            nrows = boff + P if wide else P
            ohr = oh[:nrows]
            ohx = ohr.astype(jnp.bfloat16)

            def build(planes):
                ts = jax.lax.dot_general(
                    ohx, planes[-1], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
                for cpl in reversed(planes[:-1]):
                    ts = ts + jax.lax.dot_general(
                        ohx, cpl, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
                return ts

            new_a = build(sets_hi[0])
            new_b = build(sets_lo[0])
            old_a = tsa_ref[:nrows]
            old_b = tsb_ref[:nrows]

            def expand(t):
                if D == 1:
                    return t
                return jnp.broadcast_to(t[None], (D, P, 128)).reshape(128, 128)

            pairs = [
                (expand(old_a[:P]), expand(old_a[boff:boff + P]) if wide else None),
                (expand(old_b[:P]), expand(old_b[boff:boff + P]) if wide else None),
            ]
            tsa_ref[:nrows] = new_a
            tsb_ref[:nrows] = new_b
        elif ab == "no_tables":
            t = chunk_ref[0, :128].astype(jnp.float32)
            te = _expand_tile(t[:P], D, P)
            pairs = [(te, te if wide else None), (te, te if wide else None)]
        else:
            pairs = _tables_dual(
                oh, sets_hi + sets_lo,
                (sets_hi_b + sets_lo_b) if dual else None,
                hasb_r[s], ts_refs, P, D, wide,
            )
        tha, thb = pairs[0]
        tla, tlb = pairs[1]
        if ab == "no_gather":
            gh, gl = tha, tla
        elif wide:
            gh = _gather_sel(tha, thb, idx)
            gl = _gather_sel(tla, tlb, idx)
        else:
            gh = _lane_gather(tha, idx)
            gl = _lane_gather(tla, idx)
        v_h, v_l = vhh, vlo
        if ab == "no_dekker":
            p = v_h * gh
            e = jnp.zeros_like(p)
        else:
            bh, bl = _split(gh)
            p = v_h * gh
            ah, al = _split(v_h)
            e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
            e = e + (v_h * gl + (v_l * gh + v_l * gl))
        if ab == "no_fold":
            p = p[: 128 >> log2d]
            e = e[: 128 >> log2d]
        for _ in range(0 if ab == "no_fold" else log2d):
            half = p.shape[0] // 2
            a, b = p[:half], p[half:]
            if ab == "no_fold2sum":
                p = a + b
                e = e[:half] + e[half:]
            else:
                ssum = a + b
                bb = ssum - a
                err = (a - (ssum - bb)) + (b - bb)
                e = e[:half] + e[half:] + err
                p = ssum
        if classpos and log2d == 0:
            pass
        elif classpos:
            if ab != "no_mask":
                occ = buf[nval + 33 + ohw : nval + 34 + ohw]
                mk = _mask_col(occ)
                p = _expand_tile(p, D, P) * mk
                e = _expand_tile(e, D, P) * mk
            else:
                p = _expand_tile(p, D, P)
                e = _expand_tile(e, D, P)
        else:
            outs = S._scatter_exact(rb, (p, e), P)
            p, e = outs[0], outs[1]
        first = first_r[s]
        if ab == "tiny_store":
            # keep the chain alive, skip the predicated 2Sum accumulate + full
            # tile stores (the out-block DMA writeback still happens — Pallas
            # writes whole blocks — so this isolates the STORE/ACC ops only)
            o_ref[0, :8] = p[:8] + e[:8]
            return
        if ab == "uncond_acc":
            # branch-free: gate the carried value by (first == 0) instead of
            # predicating two bodies — probes whether pl.when is the cliff
            m = (first == 0).astype(jnp.float32)
            cur = o_ref[0, :ROUT] * m
            cure = o_ref[0, ROUT:] * m
            ssum = cur + p
            bb = ssum - cur
            err = (cur - (ssum - bb)) + (p - bb)
            o_ref[0, :ROUT] = ssum
            o_ref[0, ROUT:] = cure + e + err
            return

        @pl.when(first == 1)
        def _():
            o_ref[0, :ROUT] = p
            o_ref[0, ROUT:] = e

        @pl.when(first == 0)
        def _():
            cur = o_ref[0, :ROUT]
            if ab == "no_acc2sum":
                o_ref[0, :ROUT] = cur + p
                o_ref[0, ROUT:] = o_ref[0, ROUT:] + e
            elif ab == "fast2sum_acc":
                # numerically WRONG (needs |cur|>=|p|) — cost probe only
                ssum = cur + p
                err = (cur - ssum) + p
                o_ref[0, :ROUT] = ssum
                o_ref[0, ROUT:] = o_ref[0, ROUT:] + e + err
            else:
                ssum = cur + p
                bb = ssum - cur
                err = (cur - (ssum - bb)) + (p - bb)
                o_ref[0, :ROUT] = ssum
                o_ref[0, ROUT:] = o_ref[0, ROUT:] + e + err

    return kernel


def call_ab(ba, chunks, log2d, wide, dual, classpos, nout, ab):
    if len(ba) == 11:
        (_cp, _cbp, _hbp, csel, cselb, hasb, osel, first, _ohs, packed,
         touched) = ba
    else:
        csel, cselb, hasb, osel, first, packed, touched = ba[:7]
    nsteps = packed.shape[0]
    in_specs = [
        pl.BlockSpec((1, packed.shape[1], 128),
                     (lambda s, *_: (_Z, _Z, _Z)) if ab == "fixed_packed"
                     else (lambda s, *_: (s, _Z, _Z))),
        pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                     (lambda s, csel, *_: (_Z, _Z, _Z)) if ab == "fixed_chunk"
                     else (lambda s, csel, *_: (csel[s], _Z, _Z))),
    ]
    if dual:
        in_specs.append(pl.BlockSpec((1, chunks.shape[1], chunks.shape[2]),
                                     lambda s, csel, cselb, *_: (cselb[s], _Z, _Z)))
    n_scratch = 2 if (dual or ab == "pipe_tables") else 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * ROUT, 128),
                               (lambda s, csel, cselb, hasb, osel, *_: (_Z, _Z, _Z))
                               if ab == "fixed_out"
                               else (lambda s, csel, cselb, hasb, osel, *_:
                                     (osel[s], _Z, _Z))),
        scratch_shapes=[pltpu.VMEM((S._ts_rows(log2d, wide), 128), jnp.float32)
                        for _ in range(n_scratch)],
    )
    args = (csel, cselb, hasb, osel, first, packed, chunks) + ((chunks,) if dual else ())
    return pl.pallas_call(
        make_kernel(log2d, wide, dual, classpos, ab),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nout, 2 * ROUT, 128), jnp.float32),
    )(*args)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "boneS10"  # default policy is scalar here (depth gate)
    from spmv_acc_tpu.formats.generate import example_like, random_x_y

    csr = example_like(name, dtype=np.float64)
    dp = get_swell_plan(csr, np.float64)
    bargs = _bucket_args(dp, False)
    st = _statics(dp, False)
    log2ds = st[8]
    nout, nchunks, delta = st[2], st[3], st[7]
    x, _ = random_x_y(csr.shape[1], csr.shape[0], seed=42, dtype=np.float64)
    chunks = _prep_x_pure(jnp.asarray(x), nchunks, True, native=False, delta=delta)
    pert = chunks[:, :1].astype(jnp.float32)
    # lane-concatenated plane layout for the wtab probe: (nchunks, 128, 6*128)
    cn = np.asarray(chunks)
    npl = cn.shape[1] // 128
    chunks_t = jnp.asarray(
        cn.reshape(cn.shape[0], npl, 128, 128).transpose(0, 2, 1, 3)
        .reshape(cn.shape[0], 128, npl * 128))
    pert_t = chunks_t[:, :1].astype(jnp.float32)
    order = sorted(range(len(bargs)), key=lambda i: -bargs[i][5].shape[0])
    pick = [order[int(sys.argv[2])]] if len(sys.argv) > 2 else order[:2]
    for bi in pick:
        ba = bargs[bi]
        l2d, wide, dual, cpos, allout = log2ds[bi]
        nsteps = ba[5].shape[0]
        print(f"bucket {bi}: D={1 << l2d} wide={int(wide)} dual={int(dual)} "
              f"cpos={int(cpos)} steps={nsteps}", flush=True)
        variants = (sys.argv[3].split(",") if len(sys.argv) > 3 else
                    ["full", "dma_only", "fixed_packed", "fixed_chunk", "fixed_out",
                     "no_unpack", "no_fold", "no_mask", "tiny_store", "no_gather",
                     "no_dekker", "no_tables"])
        for ab in variants:
            cha, pa = (chunks_t, pert_t) if ab == "wtab" else (chunks, pert)

            @jax.jit
            def loop(ba, chunks, pert, n, ab=ab, l2d=l2d, wide=wide, dual=dual,
                     cpos=cpos):
                def body(i, c):
                    ch = jnp.concatenate(
                        [(pert * (1.0 + c * 1e-30)).astype(jnp.bfloat16),
                         chunks[:, 1:]], axis=1)
                    o = call_ab(ba, ch, l2d, wide, dual, cpos, nout, ab)
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
            print(f"  {ab:12s} {per / nsteps * 1e9:7.0f} ns/step "
                  f"({per * 1e6:8.1f} us/iter)", flush=True)


if __name__ == "__main__":
    main()
