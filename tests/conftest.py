"""Test environment: force CPU with 8 virtual devices (multi-chip sharding tests run
on a simulated mesh, per SURVEY.md §4's rebuild plan) and enable x64 so the
double-precision verification contract (rel 1e-7 / abs 1e-14) is testable."""

import os

# XLA_FLAGS must be set before the CPU backend initializes (it is read lazily at
# first backend use, so setting it here works even though sitecustomize may already
# have imported jax).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Compensated (two-f32) arithmetic depends on every f32 add/mul rounding exactly
# once.  XLA CPU's excess-precision mode keeps intermediates in f64 across fused
# regions, which silently voids the captured error terms (the rounding the `err`
# computes never happens).  The TPU VPU has no wider register type, so real
# hardware is unaffected; disable it for the CPU test environment.
if "xla_allow_excess_precision" not in flags:
    flags = (flags + " --xla_allow_excess_precision=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (TPU tunnel); env vars alone are too late — force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_caches():
    yield
    # plan/ELL caches key on id(); free explicitly so tests stay independent
    from spmv_acc_tpu import plan as _plan
    from spmv_acc_tpu import dispatch as _dispatch

    _plan.clear_plan_cache()
    _dispatch._ELL_CACHE.clear()
    _dispatch._T_CACHE.clear()
    from spmv_acc_tpu.ops import adaptive_plus as _ap
    from spmv_acc_tpu.ops import swell as _swell

    _ap._TILE_CACHE.clear()
    _swell._SWELL_CACHE.clear()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
