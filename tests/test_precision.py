"""L1 precision layer: error-free transforms and double-word arithmetic."""

import numpy as np

import jax
import jax.numpy as jnp

from akbx.core import precision as pr


def test_two_sum_exact_f32():
    a = jnp.array([1e8, 1.0, -3.5e7], dtype=jnp.float32)
    b = jnp.array([1e-3, 1e-8, 7.25], dtype=jnp.float32)
    s = pr.two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.hi.astype(jnp.float64) + s.lo.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_two_prod_exact_f32():
    rng = np.random.default_rng(1)
    a = jnp.array(rng.normal(size=64).astype(np.float32))
    b = jnp.array(rng.normal(size=64).astype(np.float32))
    p = pr.two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.hi.astype(jnp.float64) + p.lo.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_two_prod_exact_all_modes():
    """Guard (VERDICT r1 #1): two_prod must be exact under EVERY evaluation
    mode — eager and jitted, f32 and f64 — not just when XLA happens to
    contract ``a*b - p`` into an FMA."""
    rng = np.random.default_rng(7)

    def check(a, b):
        exact = (np.asarray(a, dtype=np.float64)
                 * np.asarray(b, dtype=np.float64))

        def prod_parts(x, y):
            p = pr.two_prod(x, y)
            return p.hi, p.lo

        for mode, fn in (("eager", prod_parts), ("jit", jax.jit(prod_parts))):
            hi, lo = fn(a, b)
            got = (np.asarray(hi, dtype=np.float64)
                   + np.asarray(lo, dtype=np.float64))
            np.testing.assert_array_equal(got, exact, err_msg=mode)

    a32 = jnp.array(rng.normal(size=128).astype(np.float32))
    b32 = jnp.array(rng.normal(size=128).astype(np.float32))
    check(a32, b32)
    # f64: lo word is below f64 resolution of the np.float64 "exact" value,
    # so instead check hi == round(a*b) and lo == fma-style residual via mpmath
    a64 = jnp.array(rng.normal(size=16) * 146.0)
    b64 = jnp.array(rng.normal(size=16) * 0.28)
    from mpmath import mp, mpf

    mp.dps = 40
    for fn in (lambda x, y: pr.two_prod(x, y),
               jax.jit(lambda x, y: pr.two_prod(x, y))):
        p = fn(a64, b64)
        hi = np.asarray(p.hi)
        lo = np.asarray(p.lo)
        np.testing.assert_array_equal(hi, np.asarray(a64) * np.asarray(b64))
        for i in range(16):
            res = mpf(float(a64[i])) * mpf(float(b64[i])) - mpf(hi[i])
            assert abs(float(res) - lo[i]) == 0.0


def test_df32_norm_matches_f64():
    """f32-pair distance computation reaches ~1e-13 relative accuracy:
    enough for EUV phases over metre-scale geometry (needs ~1e-10)."""
    rng = np.random.default_rng(2)
    # AKB-scale: points ~146 m from origin, separations ~0.1 m
    base = np.array([146.0, 0.01, 0.03])
    t = (base[:, None] + rng.normal(size=(3, 256)) * 0.05).astype(np.float64)
    s = (base[:, None] + rng.normal(size=(3, 256)) * 0.05 + 1.0).astype(np.float64)

    dx64, dy64, dz64 = t - s
    r64 = np.sqrt(dx64**2 + dy64**2 + dz64**2)

    # f32 path with df arithmetic: difference in f32 loses bits if the
    # coordinates themselves are f32, so model the real kernel layout:
    # hi/lo decomposition of each coordinate.
    def split64_to_df32(x):
        hi = x.astype(np.float32)
        lo = (x - hi.astype(np.float64)).astype(np.float32)
        return jnp.array(hi), jnp.array(lo)

    tx, ty, tz = (split64_to_df32(v) for v in t)
    sx, sy, sz = (split64_to_df32(v) for v in s)

    dx = pr.df_sub(pr.DF(*tx), pr.DF(*sx))
    dy = pr.df_sub(pr.DF(*ty), pr.DF(*sy))
    dz = pr.df_sub(pr.DF(*tz), pr.DF(*sz))
    d2 = pr.df_add(pr.df_add(pr.df_sq(dx), pr.df_sq(dy)), pr.df_sq(dz))
    r = pr.df_sqrt(d2)
    got = np.asarray(r.hi, dtype=np.float64) + np.asarray(r.lo, dtype=np.float64)
    rel = np.abs(got - r64) / r64
    assert rel.max() < 1e-12


def test_sum_segments_compensated():
    # 5 segments of ~70 m with 1e-10 m perturbations: compensation keeps
    # the perturbation signal exactly.
    n = 1000
    rng = np.random.default_rng(3)
    eps = rng.normal(size=n) * 1e-10
    segs = [jnp.array(np.full(n, 70.0) + (eps if i == 0 else 0.0)) for i in range(5)]
    total = np.asarray(pr.sum_segments(segs))
    delta = total - 350.0
    # the final collapse to one f64 rounds at ulp(350) ~ 5.7e-14 — the
    # compensation guarantees <= 0.5 ulp of the *total*, which is 1000x
    # smaller than the 1e-10 m signal
    np.testing.assert_allclose(delta, eps, atol=6e-14)
    # and strictly better than a naive left-to-right sum would guarantee
    assert np.max(np.abs(delta - eps)) <= 6e-14


def test_stable_sqrt_diff():
    d2 = jnp.array([146.0**2 * (1 + 1e-13)])
    r_ref = jnp.array([146.0])
    out = np.asarray(pr.stable_sqrt_diff(d2, r_ref))
    expected = 146.0 * ((1 + 1e-13) ** 0.5 - 1)
    np.testing.assert_allclose(out, expected, rtol=1e-3)


def test_df_ops_jittable():
    @jax.jit
    def f(a, b):
        x = pr.df_from(a)
        y = pr.df_from(b)
        return pr.df_to_float(pr.df_mul(pr.df_add(x, y), x))

    out = f(jnp.float32(3.0), jnp.float32(4.0))
    np.testing.assert_allclose(float(out), 21.0)
