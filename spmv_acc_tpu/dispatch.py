"""Public SpMV API + runtime strategy picker.

The reference picks its one strategy at *compile* time (#ifdef fan-out,
src/acc/strategy_picker.cpp:19-65) plus a runtime meta-adaptive strategy
(hip-adaptive/adaptive.cpp:16-67).  TPU-natively both collapse into one runtime
dispatch: ``spmv(..., strategy=...)`` selects a jittable kernel family, and
``strategy='adaptive'`` walks the reference's decision tree over host row statistics.
Each (strategy, matrix-shape-bucket) pair JIT-specializes exactly once — the analog of
the reference's explicit template-instantiation tables
(hip-csr-adaptive-plus/csr_adaptive_plus_spmv.cpp:195-265).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_TUNE, FLAT_NNZ, IMBALANCE_RATIO, SHORT_ROW_AVG_NNZ, SMALL_NNZ, TuneConfig
from .formats.containers import CSR, ELL, sparse_operation
from .formats.convert import csr_to_ell_arrays, csr_transpose_arrays
from .plan import Plan, get_plan
from .ops import xla as _xla

__all__ = ["Handle", "spmv", "pick_strategy", "STRATEGIES", "sparse_csr_spmv"]


@dataclasses.dataclass
class Handle:
    """Profiling handle (SpMVAccHanele analog, src/acc/api/handle.h:8-13):
    carries analyze/kernel phase times in µs out of a call."""

    analyze_time_us: float = 0.0
    kernel_time_us: float = 0.0
    destroy_time_us: float = 0.0  # plan eviction; ~0 on TPU (GC'd), kept for parity
    strategy_used: str = ""


# ELL side-cache (host conversion is heavy; cache alongside the plan)
_ELL_CACHE: dict = {}

# Densifying to (m, max_row_len) is O(m * maxlen): one 4120-long row in a 200k-row
# power-law matrix made vector_row allocate 3.07GB temporaries and OOM the chip
# (measured).  The reference's analog gates on row stats and falls back
# (hip-thread-row/thread_row.cpp:17-49); strategies that need the dense ELL fall
# back to `flat` past this cell budget.
_ELL_MAX_CELLS = 1 << 27

# Swell-plan fill gate for the TPU path.  The per-slot kernel cost is ~0.04 ns,
# so ns/nnz ~ (slot cost)/fill; measured anchor: uniform-scatter power-law 200k
# at fill 0.003 ran 8.3 ns/nnz — 14x FASTER than the XLA segment paths
# (~30-118 ns/element; PERF_NOTES round-4 'instance-level spill').  Scaling the
# anchor to the ~30 ns/nnz XLA-flat crossover puts breakeven near fill ~0.001;
# the old 0.02 gate wrongly sent fill 0.003-0.02 matrices to 'flat'.
SWELL_MIN_FILL = 0.001


def ell_cells(csr: CSR, tune: TuneConfig) -> int:
    """Padded cell count the dense ELL of `csr` would allocate."""
    lens = np.diff(np.asarray(csr.row_ptr))
    maxlen = int(lens.max()) if len(lens) else 1
    wm = tune.ell_width_multiple
    width = max(wm, -(-maxlen // wm) * wm)
    return int(csr.rows) * width


def _get_ell(csr: CSR, tune: TuneConfig) -> ELL:
    key = (id(csr.row_ptr), csr.shape, csr.nnz, "ell", tune.ell_width_multiple)
    e = _ELL_CACHE.get(key)
    if e is None:
        from .utils.transfer import asarray_chunked

        rp, ci, v, shape = csr.to_numpy()
        ec, ev, _, _ = csr_to_ell_arrays(
            rp, ci, v, shape, width_multiple=tune.ell_width_multiple
        )
        e = ELL(asarray_chunked(ec), asarray_chunked(ev), csr.shape)
        _ELL_CACHE[key] = e
    return e


_T_CACHE: dict = {}


def _get_transposed(csr: CSR) -> CSR:
    key = (id(csr.row_ptr), csr.shape, csr.nnz, "T")
    t = _T_CACHE.get(key)
    if t is None:
        rp, ci, v, shape = csr.to_numpy()
        trp, tci, tv = csr_transpose_arrays(rp, ci, v, shape)
        t = CSR.from_numpy(trp, tci, tv, (shape[1], shape[0]))
        _T_CACHE[key] = t
    return t


def pick_strategy(plan: Plan, csr: Optional[CSR] = None) -> str:
    """Strategy selection.  WHAT EXECUTES ON TPU: the flagship swell kernel,
    for essentially every real matrix — the swell-plan fill gate below
    (SWELL_MIN_FILL) admits everything down to uniform-scatter power-law
    structure, where swell still measured 8.3 ns/nnz vs ~118 ns/element for
    the XLA gather paths (PERF_NOTES round-4 'instance-level spill'; every
    corpus matrix has fill >= 0.1).  The reference's adaptive decision tree
    (hip-adaptive/adaptive.cpp:16-67) is retained below as the CPU path and
    the fallback for degenerate inputs (empty, or fill below the gate):

    reference:                              TPU fallback mapping:
      ① half-nnz imbalance ≥ 4×   → weighted vector-row   → 'flat' (nnz splitting is
                                                            the stronger balancer here)
      ② avg nnz/row ≤ 4           → adaptive line          → 'line' (prefix-scan)
      ③ nnz ≤ 0xC00000 (12.6M)    → line-enhance           → 'ell' when rows are
                                                            near-uniform else 'flat'
      ④ nnz > 2^23                → flat                   → 'flat'
      ⑤ else                      → line-enhance           → 'flat'
    """
    s = plan.stats
    if s.rows == 0 or s.nnz == 0:
        return "default"
    if csr is not None:
        import jax

        if jax.default_backend() == "tpu":
            from .ops.swell import get_swell_plan

            dp = get_swell_plan(csr, csr.values.dtype)
            if dp.plan.fill_efficiency >= SWELL_MIN_FILL:
                return "swell"
    if s.half_imbalance >= IMBALANCE_RATIO:
        return "flat"
    if s.avg_nnz_per_row <= SHORT_ROW_AVG_NNZ:
        return "line"
    if s.nnz <= SMALL_NNZ:
        # near-uniform rows: padded dense reduce wins; irregular: nnz splitting
        if s.row_len_cv < 0.5 and s.max_nnz_per_row <= 4 * s.avg_nnz_per_row:
            return "ell"
        return "flat"
    if s.nnz > FLAT_NNZ:
        return "flat"
    return "flat"


def _run(strategy: str, alpha, beta, csr: CSR, x, y, plan: Plan):
    if strategy == "default":
        return _xla.spmv_default(alpha, beta, csr, x, y, plan)
    if strategy == "line":
        return _xla.spmv_line(alpha, beta, csr, x, y, plan)
    if strategy == "ell":
        if ell_cells(csr, plan.tune) > _ELL_MAX_CELLS:  # dense-ELL blowup guard
            from .ops import flat as _flat

            return _flat.spmv_flat(alpha, beta, csr, x, y, plan)
        ell = _get_ell(csr, plan.tune)
        return _xla.spmv_ell(alpha, beta, ell, x, y, csr.rows)
    if strategy == "flat":
        from .ops import flat as _flat

        return _flat.spmv_flat(alpha, beta, csr, x, y, plan)
    if strategy == "vector_row":
        if ell_cells(csr, plan.tune) > _ELL_MAX_CELLS:  # dense-ELL blowup guard
            from .ops import flat as _flat

            return _flat.spmv_flat(alpha, beta, csr, x, y, plan)
        from .ops import vector_row as _vr

        return _vr.spmv_vector_row(alpha, beta, csr, x, y, plan)
    if strategy == "adaptive_plus":
        from .ops import adaptive_plus as _ap

        return _ap.spmv_adaptive_plus(alpha, beta, csr, x, y, plan)
    if strategy == "swell":
        from .ops import swell as _swell

        return _swell.spmv_swell(alpha, beta, csr, x, y, plan)
    if strategy in _ZOO:
        from .ops import zoo as _zoo

        return getattr(_zoo, f"spmv_{strategy}")(alpha, beta, csr, x, y, plan)
    raise ValueError(f"unknown strategy {strategy!r} (one of {sorted(STRATEGIES)})")


# full parity with the reference's eleven-strategy zoo (src/acc/CMakeLists.txt:2-14):
# DEFAULT->default, THREAD_ROW->thread_row, WF_ROW->wf_row, BLOCK_ROW_ORDINARY->
# block_row, LIGHT->light, VECTOR_ROW->vector_row, LINE->line, LINE_ENHANCE->
# line_enhance, FLAT->flat, ADAPTIVE->adaptive, CSR_ADAPTIVE_PLUS->adaptive_plus
# (+ swell and ell as TPU-native additions; + acsr from the reference's
# benchmark tree, benchmark/acsr/ACSR.cpp:130-216 — log-scale row-length bins)
_ZOO = {"thread_row", "wf_row", "block_row", "light", "line_enhance", "acsr"}
STRATEGIES = {
    "adaptive", "default", "line", "ell", "flat", "vector_row",
    "adaptive_plus", "swell",
} | _ZOO


def spmv(
    csr: CSR,
    x,
    y=None,
    alpha=1.0,
    beta=0.0,
    trans: str = sparse_operation.SPARSE_OPERATION_NON_TRANSPOSE,
    strategy: str = "adaptive",
    tune: TuneConfig = DEFAULT_TUNE,
    handle: Optional[Handle] = None,
):
    """``y_out = alpha * op(A) @ x + beta * y`` — the public entry point
    (analog of ``sparse_csr_spmv``, src/acc/api/spmv.h:20-21).

    ``trans='T'`` computes A^T@x via a cached host transpose (the reference accepts
    the flag but only implements 'N'; we implement both).
    """
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r} (one of {sorted(STRATEGIES)})")
    if trans == sparse_operation.SPARSE_OPERATION_TRANSPOSE or trans == "T":
        csr = _get_transposed(csr)
    m = csr.rows
    if y is None:
        y = jnp.zeros((m,), dtype=csr.values.dtype)
        beta = 0.0
    t0 = time.perf_counter()
    plan = get_plan(csr, tune)
    t1 = time.perf_counter()
    chosen = pick_strategy(plan, csr) if strategy == "adaptive" else strategy
    out = _run(chosen, alpha, beta, csr, x, y, plan)
    if handle is not None:
        out.block_until_ready()
        t2 = time.perf_counter()
        handle.analyze_time_us = (t1 - t0) * 1e6
        handle.kernel_time_us = (t2 - t1) * 1e6
        handle.strategy_used = chosen
    return out


_FN_CACHE: dict = {}


def make_spmv_fn(
    csr: CSR,
    alpha=1.0,
    beta=1.0,
    strategy: str = "adaptive",
    tune: TuneConfig = DEFAULT_TUNE,
):
    """Build a fused, jitted ``step(x, y) -> y_out`` with the plan baked in.

    ``spmv()`` is convenient but performs Python-side dispatch per call (plan lookup,
    x preparation, one launch per bucket) — tens of device dispatches per iteration,
    which dominates on tunneled platforms.  Iterative callers (CG, benchmarks)
    should build this once: the entire strategy (including all Pallas bucket calls
    and the alpha/beta combine) compiles into ONE XLA program.

    Returns (jitted_fn, chosen_strategy_name).
    """
    plan = get_plan(csr, tune)
    chosen = pick_strategy(plan, csr) if strategy == "adaptive" else strategy
    key = (id(csr.row_ptr), csr.shape, csr.nnz, float(alpha), float(beta), chosen)
    hit = _FN_CACHE.get(key)
    if hit is not None:
        return hit

    import jax
    import jax.numpy as jnp

    if chosen == "swell":
        # the plan's slab arrays flow as jit ARGUMENTS: a closure-jit would
        # embed hundreds of MB as HLO constants (observed: HTTP 413 from the
        # tunneled compiler at 14M nnz — see ops/swell.py)
        from .ops.swell import _bucket_args, _interpret, _statics, get_swell_plan, swell_ax
        from .ops.xla import axpby_finish

        dp = get_swell_plan(csr, csr.values.dtype)
        interp = _interpret()
        bargs = _bucket_args(dp, interp)
        statics = _statics(dp, interp)
        m = csr.rows
        dt = csr.values.dtype
        a = dt.type(alpha)
        bcoef = dt.type(beta)

        @functools.partial(jax.jit, static_argnames=())
        def _inner(bargs, tail, x, y):
            ax = swell_ax(bargs, tail, x, statics)[:m].astype(dt)
            return axpby_finish(a, bcoef, ax, y)

        def fn(x, y):
            return _inner(bargs, dp.tail, x, y)

        _FN_CACHE[key] = (fn, chosen)
        return fn, chosen

    def step(x, y):
        return _run(chosen, alpha, beta, csr, x, y, plan)

    # Populate every strategy-side cache EAGERLY before tracing: several
    # strategies derive device-resident plan arrays (ELL indices, zoo layouts)
    # with jnp ops on first use and memoize them — if that first use happens
    # inside a jit trace, the caches capture tracers and the next trace dies
    # with UnexpectedTracerError.
    step(
        jnp.zeros((csr.shape[1],), csr.values.dtype),
        jnp.zeros((csr.shape[0],), csr.values.dtype),
    )
    # Closure-jit embeds the strategy's device arrays as HLO constants.  Fine at
    # small scale (one fused program per iteration); past ~128MB the tunneled
    # compiler rejects the request (HTTP 413, measured), so big matrices return
    # the EAGER step — its inner jitted cores already take the arrays as args.
    # Row-packing strategies DENSIFY to (m, padded width): estimate on that,
    # not raw nnz (a 200k x 512 light pack is 1.2GB at 2.4M nnz — measured 413).
    est_bytes = csr.nnz * (np.dtype(csr.values.dtype).itemsize + 4) * 2
    if chosen in ("thread_row", "wf_row", "block_row", "light", "vector_row"):
        rp = np.asarray(csr.row_ptr)
        maxlen = int(np.diff(rp).max()) if csr.rows else 1
        from .ops.zoo import _WIDTH_CAP

        width = min(max(maxlen, 1), _WIDTH_CAP)
        est_bytes = max(
            est_bytes,
            csr.rows * width * (np.dtype(csr.values.dtype).itemsize + 4),
        )
    fn = step if est_bytes > (128 << 20) else jax.jit(step)
    _FN_CACHE[key] = (fn, chosen)
    return fn, chosen


def sparse_csr_spmv(trans, alpha, beta, csr: CSR, x, y, strategy: str = "adaptive"):
    """Signature-compatible shim mirroring the reference's public API
    (src/acc/api/spmv.h:20-21): ``sparse_csr_spmv(trans, alpha, beta, desc, dx, dy)``."""
    return spmv(csr, x, y, alpha=alpha, beta=beta, trans=trans, strategy=strategy)
