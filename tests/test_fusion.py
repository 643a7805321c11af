"""Host-side invariants of the vertical-step-fusion partition machinery.

The end-to-end interpret tests (test_swell.py) already execute the per-G
sub-bucket SPLIT (the interpret path consumes each sub-bucket's dummy-free
``orig`` arrays), but the pure host logic — the mixed-G DP decomposition and
the run partition — had no direct tests.  Reference analog for the grouping
idea: the double-buffered row batching of
/root/reference/src/acc/hip-vector-row/opt_double_buffer.hpp:104-291.
"""
import numpy as np
import pytest

from spmv_acc_tpu.ops.swell import (
    _decompose_run,
    _fuse_partition,
    _fuse_ratios,
    _scan_runs,
)


@pytest.mark.parametrize("classpos", [False, True])
@pytest.mark.parametrize("L", list(range(1, 40)) + [63, 64, 100, 257])
def test_decompose_run_covers_and_beats_single_g(L, classpos):
    ratios = _fuse_ratios(classpos)
    segs = _decompose_run(L, ratios)
    # full disjoint cover in order
    assert sum(take for _, take in segs) == L
    for G, take in segs:
        assert take >= 1
        assert take <= G
    # DP cost must not exceed the best single-G cost (incl. unfused)
    def cost(segs):
        return sum(0.95 if G == 1 else ratios[G] for G, _ in segs)

    best_single = min(
        [0.95 * L] + [-(-L // G) * r for G, r in ratios.items()])
    assert cost(segs) <= best_single + 1e-9


def test_scan_runs_partitions_all_steps():
    rng = np.random.default_rng(0)
    n = 200
    osel = np.sort(rng.integers(0, 12, n)).astype(np.int64)
    csel = rng.integers(0, 5, n).astype(np.int64)
    cselb = rng.integers(0, 5, n).astype(np.int64)
    hasb = rng.integers(0, 3, n).astype(np.int64)
    first = np.zeros(n, np.int64)
    first[0] = 1
    first[1:] = (osel[1:] != osel[:-1]).astype(np.int64)
    runs, cf, cbf = _scan_runs(csel, cselb, hasb, osel, first, dual=True)
    seen = np.concatenate([np.asarray(r) for r in runs])
    assert np.array_equal(np.sort(seen), np.arange(n))
    # runs are consecutive index ranges sharing one out window
    for r in runs:
        assert np.array_equal(np.asarray(r), np.arange(r[0], r[-1] + 1))
        assert len(set(int(osel[i]) for i in r)) == 1
    # selector rewrites only touch don't-care sides (hasb==2 -> a unused,
    # hasb==0 -> b unused)
    for i, v in cf.items():
        assert hasb[i] == 2
    for i, v in cbf.items():
        assert hasb[i] == 0


@pytest.mark.parametrize("classpos", [False, True])
def test_fuse_partition_exact_cover(classpos):
    rng = np.random.default_rng(1)
    n = 500
    osel = np.sort(rng.integers(0, 30, n)).astype(np.int64)
    csel = np.repeat(rng.integers(0, 3, 50), 10)[:n].astype(np.int64)
    cselb = csel.copy()
    hasb = np.zeros(n, np.int64)
    first = np.zeros(n, np.int64)
    first[0] = 1
    first[1:] = (osel[1:] != osel[:-1]).astype(np.int64)
    parts, cf, cbf = _fuse_partition(csel, cselb, hasb, osel, first,
                                     classpos, dual=False)
    if parts is None:
        pytest.skip("no segment fused on this layout")
    all_idx = np.concatenate(
        [np.concatenate([np.asarray(s) for s in segs])
         for segs in parts.values()])
    assert np.array_equal(np.sort(all_idx), np.arange(n))
    for G, segs in parts.items():
        for s in segs:
            # a segment never exceeds its arity and stays consecutive; demoted
            # G=1 segments carry whole unfused remainders and may be longer
            if G > 1:
                assert len(s) <= G
            assert np.array_equal(np.asarray(s),
                                  np.arange(s[0], s[-1] + 1))
        if G > 1:
            assert sum(len(s) for s in segs) >= 8  # demotion threshold


def test_fused_bucket_divisor_arity_invariants():
    """The multi-RHS VMEM cap re-derives stride-Ge selectors from the padded
    per-sub-step arrays (swell_amx): valid iff within every G-group the
    resolved selectors are constant and `first` is 1 only at group starts —
    then any divisor arity Ge re-groups the same buffer exactly."""
    import numpy as np

    from spmv_acc_tpu.formats.generate import banded_csr
    from spmv_acc_tpu.ops.swell import get_swell_plan

    csr = banded_csr(200_000, bandwidth=7, seed=3, dtype=np.float64)
    dp = get_swell_plan(csr, np.float64)
    fused = [b for b in dp.buckets if b.get("fuse", 0) > 1]
    assert fused, "plan produced no fused buckets"
    for b in fused:
        G = int(b["fuse"])
        cs = np.asarray(b["csel"]).reshape(-1, G)
        cb = np.asarray(b["cselb"]).reshape(-1, G)
        fi = np.asarray(b["first"]).reshape(-1, G)
        os_ = np.asarray(b["osel"]).reshape(-1, G)
        # group constants: selectors and osel identical within each group
        assert (cs == cs[:, :1]).all() and (cb == cb[:, :1]).all()
        assert (os_ == os_[:, :1]).all()
        # first is never set mid-group
        assert not fi[:, 1:].any()
        # divisor re-grouping: stride-Ge selectors equal the stride-G ones
        # expanded (sub-groups inherit their G-group's selectors)
        for Ge in (2, 4):
            if G % Ge:
                continue
            cs_e = np.asarray(b["csel"])[::Ge].reshape(-1, G // Ge)
            assert (cs_e == np.asarray(b["csel2"])[:, None]).all()
            fi_e = np.asarray(b["first"])[::Ge].reshape(-1, G // Ge)
            assert (fi_e[:, 0] == np.asarray(b["first2"])).all()
            assert not fi_e[:, 1:].any()


def test_fused_cap_arity_divides_g():
    """The multi-RHS VMEM cap must yield an arity that DIVIDES G for every k
    (ADVICE r4 high: k=3 gave Ge=5 and k=5 gave Ge=3 against G in {4,8} —
    trace-time reshape failure or silently wrong chunk selectors)."""
    from spmv_acc_tpu.ops.swell import _fused_cap_arity

    for G in (2, 4, 8):
        for k in range(1, 17):
            Ge = _fused_cap_arity(G, k)
            assert Ge >= 1
            assert G % Ge == 0, (G, k, Ge)
            assert Ge <= max(1, 16 // k), (G, k, Ge)
            # the cap engages exactly when the G-arity buffers blow VMEM
            if G > max(1, 16 // k):
                assert Ge < G


def test_fused3_arity_gates():
    """Pin the pipelined-fused (fused3) dispatch gates: the VMEM cap halves
    the arity until Ge*P <= 512 (G=8 D=1 measured 116KB over the 16MB scoped
    limit), and buckets with < 16 groups run the plain fused kernel (the two
    warm-up iterations cost more than the overlap gain there, measured
    43 -> 50us on af23560's 3-group bucket)."""
    from spmv_acc_tpu.ops.swell import _fused3_arity

    # VMEM cap: G=8 at D=1 (P=128) halves to 4; deeper layouts keep G
    assert _fused3_arity(8, 0, 1024) == 4
    assert _fused3_arity(8, 1, 1024) == 8   # P=64 -> 512 fits
    assert _fused3_arity(8, 3, 1024) == 8   # P=16
    assert _fused3_arity(4, 0, 1024) == 4   # 4*128 = 512 fits
    # group-count gate: few groups -> plain fused (arity 1)
    assert _fused3_arity(8, 3, 24) == 1     # 3 groups
    assert _fused3_arity(8, 3, 128) == 8    # 16 groups
    # VMEM reduction interacts with group count at the REDUCED arity
    assert _fused3_arity(8, 0, 8 * 16) == 4   # Ge=4 -> 32 groups
    assert _fused3_arity(2, 0, 16) == 1       # Ge=2 -> 8 groups < 16
