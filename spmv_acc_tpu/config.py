"""Global configuration constants for spmv_acc_tpu.

The reference (hpcde/spmv-acc) carries its configuration in three tiers: CMake cache
variables compiled into ``building_config.h`` (reference ``config.cmake:1-51``), per-strategy
``*_config.h`` headers, and runtime CLI flags.  On TPU the compile-time tier becomes JIT
specialization keys; this module is the single home for the remaining constants.
"""

from __future__ import annotations

import dataclasses

# --- Numeric verification contract (reference cli/verification.cpp:15-54) ---
# A result element fails when relative error >= REL_TOL, except near zero
# (|golden| <= NEAR_ZERO) where the gate is absolute error >= ABS_TOL.
REL_TOL = 1e-7
ABS_TOL = 1e-14
NEAR_ZERO = 1e-12

# Looser gates used when the compute dtype is float32 (TPU fast path; the reference
# is double-only so these are new, scaled from f32's ~1e-7 ulp).
REL_TOL_F32 = 1e-3
ABS_TOL_F32 = 1e-5
NEAR_ZERO_F32 = 1e-4

# --- TPU hardware shape constants ---
LANES = 128          # VPU/MXU lane count; last-dim tile size for every dtype
SUBLANES_F32 = 8     # float32 sublane count (min tile (8, 128))

# --- Benchmark protocol (reference benchmark/csr_spmv.hpp:48-74, benchmark_time.h:10) ---
WARMUP_ITERS = 10
BENCHMARK_ARRAY_SIZE = 3  # median-of-3 timed repetitions

# --- bin2 on-disk format (reference cli/csr_binary_reader.hpp:37-56) ---
BIN2_MAGIC = 0x20211015
BIN2_VERSION = 2

# --- Strategy-picker thresholds (reference hip-adaptive/adaptive.cpp:16-67) ---
# Starting points carried over from the reference's decision tree; tuned for TPU in
# dispatch.py where noted.
IMBALANCE_RATIO = 4.0          # half-matrix nnz imbalance that triggers weighted split
SHORT_ROW_AVG_NNZ = 4.0        # avg nnz/row at or below which rows are "short"
SMALL_NNZ = 0x0C00000          # adaptive.cpp:52 boundary (12.58M)
FLAT_NNZ = 1 << 23             # adaptive.cpp:60 boundary (8.39M)


@dataclasses.dataclass(frozen=True)
class TuneConfig:
    """Tunable knobs for the Pallas kernel zoo (analog of the per-strategy *_config.h)."""

    # flat strategy: nnz handled per grid step (reference R*THREADS products per block,
    # hip-flat/flat_config.h:8-16). Must be a multiple of 8*128.
    flat_chunk_nnz: int = 8 * 1024
    # line strategy: rows per grid step (reference ROW_NUM, hip-line/line_strategy.cpp:14-28)
    line_rows_per_block: int = 256
    # vector-row: padded row width buckets (reference vector sizes 2..64,
    # hip-vector-row/vector_row.cpp:15-27); TPU uses lane-multiples.
    ell_width_multiple: int = 8
    # number of row-tiles resident per grid step in vector_row
    rows_per_tile: int = 8
    # SpMM RHS tile width (MXU-friendly)
    spmm_tile_n: int = 128


DEFAULT_TUNE = TuneConfig()


def cache_dir(kind: str) -> str:
    """Disk-cache directory for ``kind`` (corpus / plans / jax).

    Env override first (``SPMV_TPU_CORPUS_CACHE`` / ``SPMV_TPU_PLAN_CACHE_DIR``
    / ``SPMV_TPU_JAX_CACHE``); otherwise a gitignored ``.cache/<kind>`` beside
    the package.  The repo directory persists across driver rounds while /tmp
    is wiped with the host — corpus generation + plan builds cost ~1-4 min per
    large matrix cold, so repo-local caches cut the driver bench's cold-start
    by ~20 min/round."""
    import os

    env = {"corpus": "SPMV_TPU_CORPUS_CACHE", "plans": "SPMV_TPU_PLAN_CACHE_DIR",
           "jax": "SPMV_TPU_JAX_CACHE"}[kind]
    v = os.environ.get(env)
    if v:
        return v
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = os.path.join(root, ".cache", kind)
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:  # read-only installs fall back to /tmp
        return {"corpus": "/tmp/spmv_corpus", "plans": "/tmp/spmv_plans",
                "jax": "/tmp/jax_cache_spmv"}[kind]
