"""Swell (sliced-window-ELL) kernel: plan invariants + exact kernel math via
interpret mode on CPU, f32 and compensated-f64 variants, against the CPU golden."""

import jax.numpy as jnp
import numpy as np
import pytest

from spmv_acc_tpu.formats import banded_csr, dense_row_outlier_csr, powerlaw_csr, random_csr
from spmv_acc_tpu.formats.generate import random_x_y
from spmv_acc_tpu.ops.golden import host_spmv
from spmv_acc_tpu.ops.swell import get_swell_plan, spmv_swell
from spmv_acc_tpu.ops.swell_plan import build_swell_plan
from spmv_acc_tpu.utils.verify import verify_y

MATRICES = {
    "banded": lambda: banded_csr(300, bandwidth=5, seed=70),
    "random": lambda: random_csr(150, 260, 1700, seed=71),
    "powerlaw": lambda: powerlaw_csr(180, 180, avg_nnz=6, seed=72),
    "outlier": lambda: dense_row_outlier_csr(140, 140, avg_nnz=3, n_dense=2, seed=73),
    "window_dense": lambda: random_csr(64, 100, 3000, seed=74),  # deep buckets
    "tall": lambda: random_csr(40000, 300, 9000, seed=75),  # multiple out windows
    "wide": lambda: random_csr(300, 40000, 9000, seed=76),  # multiple x chunks
    "single_col": lambda: random_csr(200, 1, 180, seed=77),
}


def test_plan_invariants():
    csr = powerlaw_csr(500, 500, avg_nnz=7, seed=80)
    rp, ci, v, shape = csr.to_numpy()
    plan = build_swell_plan(rp, ci, v, shape)
    assert plan.nnz == csr.nnz
    total = 0
    for bk in plan.buckets:
        assert bk.values.shape == (bk.nsteps, 128, 128)
        # every real value slot has an in-range local index
        assert bk.lidx.min() >= 0 and int(bk.lidx.max()) < 256
        # one-hot rows have at most one set bit
        assert bk.onehot.sum(axis=2).max() <= 1
        # <=1 slab per row-block per step: rbvec entries unique per step (ignoring -1)
        for s in range(min(bk.nsteps, 4)):
            rbs = bk.rbvec[s][bk.rbvec[s] >= 0]
            assert len(rbs) == len(np.unique(rbs))
        # outsel non-decreasing (out-window locality)
        assert (np.diff(bk.outsel) >= 0).all()
        total += bk.nnz
    # buckets + COO tail partition the nnz exactly
    assert total + len(plan.tail_v) == plan.nnz
    vsum = sum(float(np.abs(bk.values).sum()) for bk in plan.buckets)
    vsum += float(np.abs(plan.tail_v).sum())
    assert np.isclose(vsum, float(np.abs(v).sum()), rtol=1e-12)


@pytest.mark.parametrize("name", sorted(MATRICES))
def test_swell_f64_matches_golden(name):
    csr = MATRICES[name]()
    m, n = csr.shape
    x, y = random_x_y(n, m, seed=75)
    alpha, beta = 1.25, -0.5
    golden = host_spmv(alpha, beta, *csr.to_numpy()[:3], x, y)
    out = spmv_swell(alpha, beta, csr, jnp.asarray(x), jnp.asarray(y))
    rep = verify_y(np.asarray(out), golden)
    assert rep.ok, f"{name}: {rep}"


def test_plan_canonicalizes_duplicate_columns():
    """CSR.from_numpy accepts arbitrary arrays; duplicate/unsorted columns in a
    row would overflow the uint8 slot / half-bit encodings (advisor round-1,
    native/spmv_native.cpp swell_analyze guard).  The plan must repair such
    input and still match the golden computed on the raw (duplicate-summing)
    arrays."""
    rng = np.random.default_rng(90)
    m = n = 96
    rows = np.repeat(np.arange(m), 5).astype(np.int64)
    cols = rng.integers(0, n, size=len(rows)).astype(np.int64)
    # force duplicates and disorder in a few rows
    cols[:5] = [7, 3, 7, 7, 3]
    vals = rng.standard_normal(len(rows))
    rp = np.arange(0, 5 * m + 1, 5, dtype=np.int64)
    from spmv_acc_tpu.formats.containers import CSR

    csr = CSR.from_numpy(rp, cols, vals, (m, n))
    x, y = random_x_y(n, m, seed=91)
    golden = host_spmv(1.0, 1.0, rp, cols, vals, x, y)
    out = spmv_swell(1.0, 1.0, csr, jnp.asarray(x), jnp.asarray(y))
    rep = verify_y(np.asarray(out), golden)
    assert rep.ok, rep


@pytest.mark.parametrize("name", ["banded", "random", "window_dense"])
def test_swell_f32(name):
    csr = MATRICES[name]().astype(jnp.float32)
    m, n = csr.shape
    x, y = random_x_y(n, m, seed=77, dtype=np.float32)
    golden = host_spmv(1.0, 1.0, *csr.to_numpy()[:3], x, y)
    out = spmv_swell(1.0, 1.0, csr, jnp.asarray(x), jnp.asarray(y))
    rep = verify_y(np.asarray(out), golden, dtype=np.float32)
    assert rep.ok, rep


def test_swell_df64_accuracy():
    """Compensated-f64 must deliver ~f64 accuracy (<<1e-7 rel), not f32 (~1e-6)."""
    csr = random_csr(100, 100, 2000, seed=78)
    m, n = csr.shape
    x, _ = random_x_y(n, m, seed=79)
    golden = host_spmv(1.0, 0.0, *csr.to_numpy()[:3], x, np.zeros(m))
    out = spmv_swell(1.0, 0.0, csr, jnp.asarray(x), jnp.zeros(m))
    rel = np.abs(np.asarray(out) - golden) / np.maximum(np.abs(golden), 1e-300)
    assert np.max(rel) < 1e-12, np.max(rel)


def test_swell_long_row():
    """A near-dense row exercises deep buckets + multi-slab rows across steps."""
    m = 260
    rows = np.concatenate([np.repeat(np.arange(m), 2), np.full(m, 7)])
    cols = np.concatenate([np.tile(np.array([0, 1]), m) + np.repeat(np.arange(m), 2) % 100,
                           np.arange(m)])
    vals = np.random.default_rng(3).standard_normal(len(rows))
    from spmv_acc_tpu.formats.convert import coo_to_csr_arrays
    from spmv_acc_tpu.formats.containers import CSR

    rp, ci, v = coo_to_csr_arrays(rows, cols, vals, (m, m))
    csr = CSR.from_numpy(rp, ci, v, (m, m))
    x, y = random_x_y(m, m, seed=4)
    golden = host_spmv(2.0, 1.0, rp, ci, v, x, y)
    out = spmv_swell(2.0, 1.0, csr, jnp.asarray(x), jnp.asarray(y))
    rep = verify_y(np.asarray(out), golden)
    assert rep.ok, rep


@pytest.mark.slow
def test_swell_fill_reporting():
    csr = banded_csr(300000, bandwidth=5, seed=81)
    dp = get_swell_plan(csr, np.float64)
    assert 0.0 < dp.plan.fill_efficiency <= 1.0
    # Unaligned dual-window instances + the scored column phase shift put a banded
    # matrix at fill ~0.77 (the residue: window-edge boundary lanes and packing
    # partials).  Gate below the current level so regressions are caught.
    assert dp.plan.fill_efficiency > 0.70, dp.plan.fill_efficiency


def test_native_analyze_matches_numpy():
    """The C++ analyze pass and the numpy fallback must agree nnz-by-nnz on the
    canonical decomposition (slab identity tuple, slot, in-window index)."""
    import os
    from spmv_acc_tpu.io.native import swell_analyze_native

    for make in (lambda: banded_csr(5000, bandwidth=7, seed=9),
                 lambda: powerlaw_csr(900, 900, avg_nnz=9, seed=10),
                 lambda: random_csr(700, 9000, 21000, seed=11)):
        csr = make()
        rp, ci, v, shape = csr.to_numpy()
        plan_np = None
        # absorption relocates slabs across depth buckets, which deliberately
        # breaks the bucket-depth==layer-k invariant this test keys on
        os.environ["SPMV_TPU_NO_NATIVE"] = "1"
        os.environ["SPMV_TPU_NO_ABSORB"] = "1"
        try:
            plan_np = build_swell_plan(rp, ci, v, shape)
        finally:
            del os.environ["SPMV_TPU_NO_NATIVE"]
            del os.environ["SPMV_TPU_NO_ABSORB"]
        nat = swell_analyze_native(rp, ci, shape[0], plan_np.delta)
        if nat is None:
            pytest.skip("native library unavailable")
        s32, lc, slot, layer_k, srb, sw, sk, swide = nat
        # canonical per-nnz key: (slab rb, slab window, k, slot, lidx) packed
        def pack(rb, w, k, sl, lx):
            return (((rb.astype(np.int64) * (2**32) + w) * 8 + k) * 256 + sl) * 256 + lx

        nat_key = np.sort(pack(srb[s32].astype(np.int64), sw[s32].astype(np.int64),
                                sk[s32].astype(np.int64), slot.astype(np.int64),
                                lc.astype(np.int64)))
        # the numpy plan's slab rb/w aren't kept on buckets; compare the invariant
        # parts (k, slot-within-slab = sub//P, lidx) as sorted multisets
        def pack2(k, sl, lx):
            return (k * 256 + sl) * 256 + lx

        got = []
        for bk in plan_np.buckets:
            P = 128 // bk.depth
            st, sub, lanes = np.nonzero(bk.values != 0.0)
            got.append(pack2(np.full(len(st), int(np.log2(bk.depth)), np.int64),
                             (sub // P).astype(np.int64),
                             bk.lidx[st, sub, lanes].astype(np.int64)))
        np_key = np.sort(np.concatenate(got))
        nat_key2 = np.sort(pack2(sk[s32].astype(np.int64), slot.astype(np.int64),
                                 lc.astype(np.int64)))
        nz = int((v != 0).sum())
        assert len(np_key) == nz and len(nat_key2) == csr.nnz
        # drop explicit-zero values from the native side for comparison
        if nz != csr.nnz:
            keep = v != 0
            nat_key2 = np.sort(pack2(sk[s32[keep]].astype(np.int64),
                                     slot[keep].astype(np.int64),
                                     lc[keep].astype(np.int64)))
        assert (nat_key2 == np_key).all()


@pytest.mark.parametrize("force", ["0", "1"])
@pytest.mark.slow
def test_packed_kernel_structure_interpret(force):
    """Run the PACKED TPU kernels in interpret mode against the native-dtype
    reference with a loose tolerance.  Interpret mode evaluates with excess
    precision (so compensated-f32 ACCURACY cannot be asserted here — that is
    hardware-validated), but any slab/position/mask placement corruption shows
    up as O(1) errors: the class-blind fallback packer bug produced maxabs ~30
    on TSOPF and was invisible to the native-path tests."""
    import os

    import jax.numpy as jnp

    from spmv_acc_tpu.formats.generate import fem_like_csr
    from spmv_acc_tpu.ops.swell import (ROUT, _bucket_args, _call_f64,
                                        _call_native_interp_r, _prep_x_pure,
                                        _statics, get_swell_plan)

    csr = fem_like_csr(2000, 2000, 300000, block=16, spread_frac=0.02, seed=11,
                       dtype=np.float64)
    os.environ["SPMV_TPU_FORCE_CPOS"] = force
    os.environ["SPMV_TPU_NO_BSR"] = "1"  # this guard covers the scalar kernels
    try:
        dp = get_swell_plan(csr, np.float64)
    finally:
        del os.environ["SPMV_TPU_FORCE_CPOS"]
        del os.environ["SPMV_TPU_NO_BSR"]
    st = _statics(dp, False)
    log2ds = st[8]
    nout, nchunks, delta = st[2], st[3], st[7]
    x, _ = random_x_y(csr.shape[1], csr.shape[0], seed=9, dtype=np.float64)
    chunks_tpu = _prep_x_pure(jnp.asarray(x), nchunks, True, native=False, delta=delta)
    chunks_nat = _prep_x_pure(jnp.asarray(x), nchunks, True, native=True, delta=delta)[0]
    bt_all = _bucket_args(dp, False)
    bn_all = _bucket_args(dp, True)
    assert bt_all, "plan must have buckets"
    for bt, bn, (l2d, wide, dual, cpos, allout) in zip(bt_all, bn_all, log2ds):
        # r == 1 buckets carry both selector sets: exercise the software-
        # PIPELINED kernel (the production TPU path) under interpret
        (csel_p, cselb_p, hasb_p, _cn, _cbn, _hbn, osel, first,
         ohs, packed, touched) = bt
        o = np.asarray(_call_f64(csel_p, cselb_p, hasb_p, osel, first, packed,
                                 chunks_tpu, l2d, wide, nout, True, dual, cpos,
                                 ohs=ohs, pipe=True))
        got = o[:, :ROUT].astype(np.float64) + o[:, ROUT:].astype(np.float64)
        ci_, cib, hb, osel_i, first_i, vals, lidx, oh, rbvec, touched_i = bn
        ref = np.asarray(_call_native_interp_r(ci_, cib, hb, osel_i, first_i, vals,
                                               lidx, oh, rbvec, chunks_nat, l2d,
                                               wide, nout, 1))
        scale = max(np.abs(ref).max(), 1.0)
        assert np.abs(got - ref).max() / scale < 1e-4, \
            f"structure mismatch in D={1 << l2d} cpos={cpos} bucket"


def test_plan_disk_cache_roundtrip(tmp_path, monkeypatch):
    """The plan disk cache reproduces the exact TPU-path arrays and statics
    (cache is only consulted on TPU backends; forced here via env)."""
    import os

    import numpy as np

    from spmv_acc_tpu.formats.generate import fem_like_csr
    from spmv_acc_tpu.ops import swell as sw

    monkeypatch.setenv("SPMV_TPU_PLAN_CACHE", "1")
    monkeypatch.setenv("SPMV_TPU_PLAN_CACHE_DIR", str(tmp_path))
    csr = fem_like_csr(4096, 4096, 6 * 4096, block=3, seed=77, dtype=np.float64)
    dp1 = sw.get_swell_plan(csr, np.float64)
    files = list(tmp_path.glob("plan_*.npz"))
    assert len(files) == 1, "plan not persisted"
    sw._SWELL_CACHE.clear()
    dp2 = sw.get_swell_plan(csr, np.float64)  # must hit the disk cache
    assert dp2.plan.buckets == ()  # loaded, not rebuilt
    assert (dp1.r, dp1.out_rows, dp1.nout, dp1.nchunks) == (
        dp2.r, dp2.out_rows, dp2.nout, dp2.nchunks
    )
    assert dp1.plan.delta == dp2.plan.delta
    assert abs(dp1.plan.fill_efficiency - dp2.plan.fill_efficiency) < 1e-12
    a1 = sw._bucket_args(dp1, False)
    a2 = sw._bucket_args(dp2, False)
    assert sw._statics(dp1, False) == sw._statics(dp2, False)
    assert len(a1) == len(a2)
    for b1, b2 in zip(a1, a2):
        for x1, x2 in zip(b1, b2):
            assert np.array_equal(np.asarray(x1), np.asarray(x2))


@pytest.mark.parametrize("r_env,k", [("1", 2), ("2", 2)])
@pytest.mark.slow
def test_packed_kernel_structure_interpret_multirhs(r_env, k):
    """Packed-kernel structure guard for the MULTI-RHS (k>1) kernels, scalar and
    BSR: the packed _call_f64 with a k axis vs the native-dtype reference.
    Same rationale as test_packed_kernel_structure_interpret — the packed
    SpMM kernels otherwise only execute on hardware."""
    import os

    import jax.numpy as jnp

    from spmv_acc_tpu.formats.generate import banded_csr
    from spmv_acc_tpu.ops.swell import (ROUT, _bucket_args, _call_f64,
                                        _call_native_interp_r, _prep_x_pure,
                                        _statics, get_swell_plan)

    csr = banded_csr(3000, bandwidth=5, seed=13, dtype=np.float64)
    os.environ["SPMV_TPU_BSR" if r_env != "1" else "SPMV_TPU_NO_BSR"] = r_env
    os.environ["SPMV_TPU_NO_PLAN_CACHE"] = "1"
    try:
        dp = get_swell_plan(csr, np.float64)
    finally:
        os.environ.pop("SPMV_TPU_BSR", None)
        os.environ.pop("SPMV_TPU_NO_BSR", None)
        os.environ.pop("SPMV_TPU_NO_PLAN_CACHE", None)
    r = dp.r
    assert r == int(r_env) if r_env != "1" else r == 1
    st = _statics(dp, False)
    log2ds = st[8]
    nout, nchunks, delta = st[2], st[3], st[7]
    rng = np.random.default_rng(14)
    X = jnp.asarray(rng.uniform(-1, 1, size=(csr.shape[1], k)))
    chunks_tpu = _prep_x_pure(X, nchunks, True, native=False, delta=delta, r=r, k=k)
    chunks_nat = _prep_x_pure(X, nchunks, True, native=True, delta=delta, r=r, k=k)[0]
    bt_all = _bucket_args(dp, False)
    bn_all = _bucket_args(dp, True)
    assert bt_all, "plan must have buckets"
    for bt, bn, (l2d, wide, dual, cpos, allout) in zip(bt_all, bn_all, log2ds):
        if len(bt) == 11:  # r == 1: the k>1 kernels use the NONPIPE set
            (_cp, _cbp, _hbp, csel, cselb, hasb, osel, first,
             _ohs, packed, touched) = bt
        else:
            csel, cselb, hasb, osel, first, packed, touched = bt
        o = np.asarray(_call_f64(csel, cselb, hasb, osel, first, packed,
                                 chunks_tpu, l2d, wide, nout, True, dual, cpos,
                                 r, k))
        o = o.reshape(nout, k, r, 2, ROUT, 128)
        got = o[:, :, :, 0].astype(np.float64) + o[:, :, :, 1].astype(np.float64)
        ci_, cib, hb, osel_i, first_i, vals, lidx, oh, rbvec, touched_i = bn
        ref = np.asarray(_call_native_interp_r(ci_, cib, hb, osel_i, first_i, vals,
                                               lidx, oh, rbvec, chunks_nat, l2d,
                                               wide, nout, r, k))
        ref = ref.reshape(nout, k, r, ROUT, 128)
        scale = max(np.abs(ref).max(), 1.0)
        assert np.abs(got - ref).max() / scale < 1e-4, \
            f"structure mismatch in D={1 << l2d} r={r} k={k} bucket"


def test_plan_disk_cache_detects_value_change(tmp_path, monkeypatch):
    """Full-coverage content hash: same-pattern matrices with different values
    must NOT share a cache entry (the strided-sample hash collided here and
    served stale packed values)."""
    import jax.numpy as jnp

    from spmv_acc_tpu.formats.containers import CSR
    from spmv_acc_tpu.formats.generate import banded_csr, random_x_y
    from spmv_acc_tpu.ops import swell as sw

    monkeypatch.setenv("SPMV_TPU_PLAN_CACHE", "1")
    monkeypatch.setenv("SPMV_TPU_PLAN_CACHE_DIR", str(tmp_path))
    csr1 = banded_csr(3000, bandwidth=5, seed=41, dtype=np.float64)
    rp, ci, v, shape = csr1.to_numpy()
    p1 = sw._plan_cache_path(rp, ci, v, shape, np.float64)
    v2 = v.copy()
    v2[::2] *= 1.5  # same pattern, half the values changed
    p2 = sw._plan_cache_path(rp, ci, v2, shape, np.float64)
    assert p1 != p2


def test_bsr_duplicate_columns_summed(monkeypatch):
    """bsr_condense must see canonicalized input: duplicate (row, col) entries
    sum (the CSR contract) instead of last-write-wins in the cell fill."""
    import jax.numpy as jnp

    from spmv_acc_tpu.formats.containers import CSR
    from spmv_acc_tpu.ops.swell import spmv_swell

    monkeypatch.setenv("SPMV_TPU_BSR", "2")
    monkeypatch.setenv("SPMV_TPU_NO_PLAN_CACHE", "1")
    m = 200
    rng = np.random.default_rng(43)
    # banded pattern with an injected duplicate column in several rows
    rows, cols, vals = [], [], []
    for i in range(m):
        for j in range(max(0, i - 2), min(m, i + 3)):
            rows.append(i); cols.append(j); vals.append(rng.uniform(-1, 1))
        if i % 7 == 0:  # duplicate the diagonal entry
            rows.append(i); cols.append(i); vals.append(2.0)
    order = np.lexsort((cols, rows))
    rr = np.asarray(rows)[order]; cc = np.asarray(cols)[order]
    vv = np.asarray(vals, dtype=np.float64)[order]
    rp = np.zeros(m + 1, dtype=np.int64)
    np.add.at(rp, rr + 1, 1)
    np.cumsum(rp, out=rp)
    csr = CSR.from_numpy(rp, cc.astype(np.int32), vv, (m, m))
    x = rng.uniform(-1, 1, size=m)
    golden = np.zeros(m)
    np.add.at(golden, rr, vv * x[cc])  # duplicates SUM
    out = np.asarray(spmv_swell(1.0, 0.0, csr, jnp.asarray(x), jnp.zeros(m)))
    assert verify_y(out, golden).ok


def test_refine_cancellation_f32_repairs_cancelled_rows():
    """VERDICT r3 #8: the f32 single-plane path carries rel error
    ~R*sqrt(L)*2^-24 on rows whose products cancel by R (af23560 measured
    1.7e-3).  The public spmv path now refines f32 results too (tau=1e-2):
    every row cancelled below 1e-2 of the output scale is host-recomputed
    exactly.  Unit-level check of the repair mechanics (the TPU kernel error
    itself is hardware-only; interpret computes natively)."""
    import jax.numpy as jnp

    from spmv_acc_tpu.formats.generate import random_csr
    from spmv_acc_tpu.ops.swell import _refine_cancellation, get_swell_plan

    m = 512
    csr = random_csr(m, m, 8 * m, seed=3, dtype=np.float32)
    dp = get_swell_plan(csr, np.float32)
    assert getattr(dp, "host_csr", None) is not None
    rp, ci, v = dp.host_csr
    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, size=m).astype(np.float32)
    # force a genuine heavy-cancellation row: tune x on row 0's last column so
    # the row dot collapses to ~0 while its products stay O(1)
    lo0, hi0 = int(rp[0]), int(rp[1])
    assert hi0 - lo0 >= 2
    c_last = int(ci[hi0 - 1])
    partial = np.dot(v[lo0 : hi0 - 1].astype(np.float64),
                     x[ci[lo0 : hi0 - 1]].astype(np.float64))
    x[c_last] = np.float32(-partial / np.float64(v[hi0 - 1]))
    golden = np.zeros(m)
    np.add.at(golden, np.repeat(np.arange(m), np.diff(rp)),
              v.astype(np.float64) * x[ci].astype(np.float64))
    scale = np.percentile(np.abs(golden), 90)
    assert abs(golden[0]) < 1e-2 * scale  # the cancelled row sits under tau
    # simulate the kernel's cancellation error on that row: off by a few f32
    # ulps of the PRODUCT scale (exactly the failure shape of VERDICT r3 #8)
    ax = golden.astype(np.float32)
    ax[0] += np.float32(1e-3)
    fixed = np.asarray(_refine_cancellation(dp, jnp.asarray(x),
                                            jnp.asarray(ax), tau=1e-2))
    # the corrupted row must be restored to the exact host value (f32-rounded)
    assert abs(fixed[0] - golden[0]) <= max(2e-7 * abs(golden[0]), 1e-9), (
        fixed[0], golden[0])


def _banded_plus_outliers(m, seed, n_out=60):
    """Banded matrix plus scattered far-off-band entries (1-3 nnz per distant
    (out, chunk) cell) — the structure the cell-economic spill targets."""
    from spmv_acc_tpu.formats.convert import coo_to_csr_arrays
    from spmv_acc_tpu.formats.containers import CSR
    from spmv_acc_tpu.formats.generate import banded_csr

    base = banded_csr(m, bandwidth=5, seed=seed, dtype=np.float64)
    rp, ci, v, _ = base.to_numpy()
    rng = np.random.default_rng(seed + 1)
    rows_b = np.repeat(np.arange(m), np.diff(rp))
    ro = rng.integers(0, m, size=n_out)
    co = (ro + m // 2) % m  # far off-band: lands in unvisited chunk cells
    vo = rng.uniform(-1, 1, size=n_out)
    rp2, ci2, v2 = coo_to_csr_arrays(
        np.concatenate([rows_b, ro]), np.concatenate([ci, co]),
        np.concatenate([v, vo]), (m, m))
    return CSR.from_numpy(rp2, ci2, v2, (m, m))


def test_spill_tail_scattered_golden(monkeypatch):
    """VERDICT r3 #6: SPMV_TPU_SPILL spills whole sparse (out, chunk) cells to
    a COO tail (sorted segment-sum path); a scattered power-law matrix must
    verify end-to-end with a nonzero tail."""
    import jax.numpy as jnp

    from spmv_acc_tpu.formats.generate import powerlaw_csr, random_x_y
    from spmv_acc_tpu.ops.swell import get_swell_plan, spmv_swell

    monkeypatch.setenv("SPMV_TPU_SPILL", "16")
    monkeypatch.setenv("SPMV_TPU_NO_PLAN_CACHE", "1")
    # banded core + scattered far-off-band outliers: the outliers land alone in
    # otherwise-unvisited (out-window, x-chunk) cells — the regime where a
    # handful of nnz would pay a whole chunk load + writeback in-kernel
    m = 40_000
    csr = _banded_plus_outliers(m, seed=11)
    dp = get_swell_plan(csr, np.float64)
    assert dp.plan.tail_rows.shape[0] > 0, "spill produced no tail"
    assert np.all(np.diff(dp.plan.tail_rows) >= 0), "tail not row-sorted"
    rp, ci, v, _ = csr.to_numpy()
    x, _ = random_x_y(m, m, seed=4, dtype=np.float64)
    golden = np.zeros(m)
    np.add.at(golden, np.repeat(np.arange(m), np.diff(rp)), v * x[ci])
    out = np.asarray(spmv_swell(1.0, 0.0, csr, jnp.asarray(x), jnp.zeros(m)))
    assert verify_y(out, golden).ok


def test_spill_tail_dist_swell_golden(monkeypatch):
    """A tailed plan must distribute: per-shard tail split + all-gather x
    (halo disabled), golden-matched on the virtual CPU mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spmv_acc_tpu.formats.generate import powerlaw_csr, random_x_y
    from spmv_acc_tpu.parallel.dist_swell import (
        build_dist_swell, dist_swell_serial_fn, dist_swell_spmv_fn, pad_global)

    monkeypatch.setenv("SPMV_TPU_SPILL", "16")
    monkeypatch.setenv("SPMV_TPU_NO_PLAN_CACHE", "1")
    D = 4
    m = 4 * 16384  # one out-window per shard
    csr = _banded_plus_outliers(m, seed=13)
    assert get_swell_plan(csr, np.float64).plan.tail_rows.shape[0] > 0
    dsp = build_dist_swell(csr, D)
    assert not dsp.halo_ok  # tailed plans must use the all-gather path
    assert dsp.tail[0].ndim == 2 and dsp.tail[0].shape[0] == D
    mesh = Mesh(np.array(jax.devices()[:D]), ("x",))
    run = dist_swell_spmv_fn(dsp, mesh)
    rp, ci, v, _ = csr.to_numpy()
    x, _ = random_x_y(m, m, seed=5, dtype=np.float64)
    golden = np.zeros(m)
    np.add.at(golden, np.repeat(np.arange(m), np.diff(rp)), v * x[ci])
    xp = jax.device_put(pad_global(dsp, jnp.asarray(x)), NamedSharding(mesh, P("x")))
    y = np.asarray(run(xp))[:m]
    assert verify_y(y, golden).ok
    # the weak-scaling serial baseline must agree on tailed plans too
    y_ser = np.asarray(dist_swell_serial_fn(dsp)(pad_global(dsp, jnp.asarray(x))))[:m]
    np.testing.assert_allclose(y_ser, y, rtol=1e-12, atol=1e-300)


@pytest.mark.slow
def test_spill_auto_engages_on_scattered_outliers(monkeypatch):
    """AUTO spill (no env): engages only when many sparse cells carry a tiny
    nnz fraction; a clean banded matrix must be untouched (the entire bench
    corpus has zero sub-16 cells, so auto never changes its plans)."""
    from spmv_acc_tpu.ops.swell import get_swell_plan

    monkeypatch.delenv("SPMV_TPU_SPILL", raising=False)
    monkeypatch.setenv("SPMV_TPU_NO_PLAN_CACHE", "1")
    m = 32 * 16384  # 32 out-windows x 32 chunks: room for >= 64 sparse cells
    csr = _banded_plus_outliers(m, seed=21, n_out=200)
    dp = get_swell_plan(csr, np.float64)
    assert dp.plan.tail_rows.shape[0] >= 150, "auto spill did not engage"
    clean = banded_csr(m, bandwidth=5, seed=21, dtype=np.float64)
    dp2 = get_swell_plan(clean, np.float64)
    assert dp2.plan.tail_rows.shape[0] == 0, "auto spill fired on a clean band"


def test_spill_tail_dist_swell_halo_golden(monkeypatch):
    """VERDICT r4 #4: a tailed plan whose tail columns stay within the 1-hop
    neighborhood must KEEP the halo path (round 4 dropped every tailed plan to
    all-gather).  Outliers land exactly one shard block ahead of their row, in
    otherwise-unvisited (out-window, chunk) cells, so they spill to the COO
    tail; the tail columns are folded into the per-shard chunk windows and
    localized, and the ppermute halo exchange golden-matches."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spmv_acc_tpu.formats.convert import coo_to_csr_arrays
    from spmv_acc_tpu.formats.containers import CSR
    from spmv_acc_tpu.formats.generate import banded_csr, random_x_y
    from spmv_acc_tpu.ops.swell import get_swell_plan
    from spmv_acc_tpu.parallel.dist_swell import (
        build_dist_swell, dist_swell_serial_fn, dist_swell_spmv_fn, pad_global)

    monkeypatch.setenv("SPMV_TPU_SPILL", "16")
    monkeypatch.setenv("SPMV_TPU_NO_PLAN_CACHE", "1")
    D = 4
    L = 16384  # one x chunk per shard block
    m = D * L
    base = banded_csr(m, bandwidth=5, seed=31, dtype=np.float64)
    rp, ci, v, _ = base.to_numpy()
    rng = np.random.default_rng(32)
    rows_b = np.repeat(np.arange(m), np.diff(rp))
    # ~12 outliers per shard (< 16: the whole cell spills), mid-chunk offsets
    # so the landing cell has no banded-boundary traffic, one block ahead
    ro = np.concatenate([d * L + rng.integers(4000, 8000, size=12)
                         for d in range(D - 1)])
    co = ro + L
    vo = rng.uniform(-1, 1, size=len(ro))
    rp2, ci2, v2 = coo_to_csr_arrays(
        np.concatenate([rows_b, ro]), np.concatenate([ci, co]),
        np.concatenate([v, vo]), (m, m))
    csr = CSR.from_numpy(rp2, ci2, v2, (m, m))
    assert get_swell_plan(csr, np.float64).plan.tail_rows.shape[0] > 0, \
        "fixture produced no tail"
    dsp = build_dist_swell(csr, D)
    assert dsp.halo_ok, "1-hop tail columns must keep the halo path"
    assert dsp.tail[0].ndim == 2 and dsp.tail[0].shape[0] == D
    mesh = Mesh(np.array(jax.devices()[:D]), ("x",))
    run = dist_swell_spmv_fn(dsp, mesh)  # auto-selects halo
    x, _ = random_x_y(m, m, seed=6, dtype=np.float64)
    golden = np.zeros(m)
    np.add.at(golden, np.repeat(np.arange(m), np.diff(rp2)), v2 * x[ci2])
    xp = jax.device_put(pad_global(dsp, jnp.asarray(x)), NamedSharding(mesh, P("x")))
    y = np.asarray(run(xp))[:m]
    assert verify_y(y, golden).ok
    # serial structural baseline must agree bit-for-bit on the halo-tail plan
    y_ser = np.asarray(dist_swell_serial_fn(dsp)(pad_global(dsp, jnp.asarray(x))))[:m]
    np.testing.assert_allclose(y_ser, y, rtol=1e-12, atol=1e-300)
