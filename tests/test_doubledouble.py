"""df64 arithmetic correctness — including that XLA compilation preserves the
error-free transformations (a reassociating compiler would zero the error terms)."""

import jax
import jax.numpy as jnp
import numpy as np

from spmv_acc_tpu.ops.doubledouble import (
    DF64,
    df64_add,
    df64_from_f64,
    df64_mul,
    df64_mul_f32f32,
    df64_scale,
    df64_to_f64,
    two_prod,
    two_sum,
)


def test_two_sum_exact():
    a = jnp.float32(1.0)
    b = jnp.float32(1e-8)  # vanishes in plain f32 add
    s, e = jax.jit(two_sum)(a, b)
    assert float(s) == 1.0
    assert float(e) != 0.0
    assert float(np.float64(s) + np.float64(e)) == np.float64(1.0) + np.float64(
        np.float32(1e-8)
    )


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = rng.random(1000).astype(np.float32)
    b = rng.random(1000).astype(np.float32)
    p, e = jax.jit(two_prod)(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    got = np.asarray(p, dtype=np.float64) + np.asarray(e, dtype=np.float64)
    assert np.array_equal(got, exact), "two_prod must be exact for f32 inputs"


def test_df64_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.random(1000) * 2000 - 1000
    d = df64_from_f64(x)
    back = df64_to_f64(d)
    assert np.max(np.abs(back - x) / np.abs(x)) < 1e-14


def test_df64_add_accuracy():
    rng = np.random.default_rng(2)
    x = rng.random(500) * 100 - 50
    y = rng.random(500) * 100 - 50
    dz = jax.jit(df64_add)(df64_from_f64(x), df64_from_f64(y))
    err = np.abs(df64_to_f64(dz) - (x + y))
    # compensated addition error is bounded relative to input magnitudes (under
    # cancellation no method can bound it relative to the result)
    assert np.max(err / (np.abs(x) + np.abs(y))) < 1e-14


def test_df64_mul_accuracy():
    rng = np.random.default_rng(3)
    x = rng.random(500) + 0.5
    y = rng.random(500) + 0.5
    dz = jax.jit(df64_mul)(df64_from_f64(x), df64_from_f64(y))
    rel = np.abs(df64_to_f64(dz) - x * y) / np.abs(x * y)
    assert np.max(rel) < 1e-13


def test_df64_long_sum_accuracy():
    """Compensated sequential fold of 10^4 terms stays ~1e-13 relative — the exact
    pattern the SpMV width-fold uses; plain f32 would be ~1e-3."""
    rng = np.random.default_rng(4)
    terms = rng.random(10_000) * 2 - 1

    @jax.jit
    def fold(hi_terms, lo_terms):
        acc = DF64(jnp.float32(0.0), jnp.float32(0.0))

        def body(i, acc):
            acc = df64_add(DF64(*acc), DF64(hi_terms[i], lo_terms[i]))
            return tuple(acc)

        return jax.lax.fori_loop(0, hi_terms.shape[0], body, tuple(acc))

    d = df64_from_f64(terms)
    hi, lo = fold(d.hi, d.lo)
    got = np.float64(hi) + np.float64(lo)
    exact = np.sum(terms)
    assert abs(got - exact) / abs(exact) < 1e-10, (got, exact)


def test_df64_dot_vs_f64():
    """df64 dot product matches f64 to ~1e-13 where f32 fails 1e-7."""
    rng = np.random.default_rng(5)
    n = 4096
    a = rng.random(n) * 2 - 1
    b = rng.random(n) * 2 - 1
    da, db = df64_from_f64(a), df64_from_f64(b)

    @jax.jit
    def dd_dot(ah, al, bh, bl):
        prods = df64_mul(DF64(ah, al), DF64(bh, bl))
        # pairwise tree-fold of df64 pairs (log depth, each combine compensated)
        h, l = prods.hi, prods.lo
        while h.shape[0] > 1:
            half = h.shape[0] // 2
            s = df64_add(DF64(h[:half], l[:half]), DF64(h[half : 2 * half], l[half : 2 * half]))
            h, l = s.hi, s.lo
        return h[0], l[0]

    hi, lo = dd_dot(da.hi, da.lo, db.hi, db.lo)
    got = np.float64(hi) + np.float64(lo)
    exact = float(np.dot(a, b))
    f32_val = float(np.dot(a.astype(np.float32), b.astype(np.float32)))
    assert abs(got - exact) / abs(exact) < 1e-12
    assert abs(got - exact) < abs(f32_val - exact)
