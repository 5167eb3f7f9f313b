"""Compensated / double-word arithmetic (L1): the TPU answer to mpmath.

The reference escapes float64 conditioning problems by flipping every L0
primitive to 20-digit mpmath loops (``option_mpmath``,
``AKB_raytrace_20250312.py:91-92, 399-443``).  That layer exists because,
near focus, OPL differences of ~1e-10 m ride on ~146 m path lengths
(relative 1e-12) and the intersection discriminant cancels at grazing
incidence.

On TPU there is no fast f64, let alone mpmath.  The equivalents here are:

* error-free transforms (``two_sum``; contraction-immune ``two_prod``
  built from exact Dekker partial products — correct with or without FMA
  contraction) usable both in plain jnp and inside Pallas kernels;
* a double-word ("df") number type: value = hi + lo with |lo| <= ulp(hi)/2,
  giving ~2x the mantissa of the base dtype (f32 pair ~= 49 bits,
  f64 pair ~= 106 bits > mp.dps=20's 66 bits);
* compensated (Kahan/Neumaier) summation for OPL accumulation;
* a compensated pairwise-distance delta for Huygens phases: computes
  ``|t - s| - r_ref`` without cancellation so the O(N*M) kernel can run in
  f32 with f64-equivalent phase accuracy.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.lax
import jax.numpy as jnp


def _bar(x):
    """Opaque-value barrier: belt-and-braces protection for the EFTs.

    Two known adversaries can destroy an error-free transform:

    1. algebraic simplification using a value's *identity* (e.g. knowing
       ``s = a + b`` and folding ``s - a -> b``).  ``optimization_barrier``
       hides the identity and blocks this class.
    2. XLA rematerialization + LLVM FMA contraction of a *rounded product*
       into consumer fusions (the barrier does NOT stop this — it is
       expanded away before fusion).  The EFTs below are therefore written
       so that every multiply is exact (contraction cannot change exact
       values) — see :func:`two_prod`.

    The barrier is kept where identity-based folding is conceivable; the
    structural defense (exact products, add-only assembly) is what the
    correctness actually rests on, and it is what the jit-vs-eager guard
    tests in tests/test_precision.py exercise.
    """
    return jax.lax.optimization_barrier(x)


class DF(NamedTuple):
    """Double-word float: represents hi + lo exactly (unevaluated sum)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def two_sum(a, b) -> DF:
    """Error-free addition: a + b = s + e exactly (Knuth)."""
    s = _bar(a + b)
    bb = _bar(s - a)
    e = (a - (s - bb)) + (b - bb)
    return DF(s, e)


def fast_two_sum(a, b) -> DF:
    """Error-free addition assuming |a| >= |b| (Dekker)."""
    s = _bar(a + b)
    e = b - (s - a)
    return DF(s, e)


def _split(a):
    """Dekker split of a float into high/low parts (works for f32 and f64)."""
    dt = jnp.asarray(a).dtype
    # Split constant 2^s + 1 with s = ceil(mantissa_bits / 2).
    c = jnp.array(4097.0 if dt == jnp.float32 else 134217729.0, dtype=dt)
    t = _bar(c * a)
    hi = _bar(t - _bar(t - a))
    lo = a - hi
    return hi, lo


def two_prod(a, b) -> DF:
    """Error-free multiplication: a * b = p + e, contraction-immune.

    Exact under **every** evaluation mode — eager, jitted, interpreted,
    with or without FMA contraction.  Why the usual forms fail here:

    * the FMA form ``e = a*b - p`` is exact only when the backend happens
      to contract the mul-sub into an FMA; eager/strict evaluation yields
      ``e = 0`` (the round-1 regression, VERDICT #1);
    * classic Dekker needs ``p = fl(a*b)`` to be a *single consistent
      value*, but XLA rematerializes the rounded product into consumer
      fusions where LLVM contracts the now-single-use mul into an FMA —
      producer and consumer then disagree about ``p`` and the error term
      is garbage (observed on XLA:CPU; ``optimization_barrier`` does not
      help because it is expanded away *before* fusion).

    This version never rounds a product at all: the four Dekker partial
    products are each *exactly representable* (each split half carries at
    most ceil(mant/2) bits), so FMA contraction cannot change any of their
    values, and the total is assembled purely with two_sum chains (adds
    are never contracted and are remat-safe).  Every intermediate is
    exact; the final compression keeps all crumbs, so ``hi + lo == a*b``
    bit-exactly whenever the true product fits in two floats (it always
    does: a product of two m-bit floats has at most 2m significant bits).
    """
    ah, al = _split(a)
    bh, bl = _split(b)
    hh = ah * bh  # all four partials are exact in the base dtype
    hl = ah * bl
    lh = al * bh
    ll = al * bl
    c = two_sum(hl, lh)
    p = two_sum(hh, c.hi)
    d = two_sum(p.lo, c.lo)
    q = two_sum(d.hi, ll)
    # exact 4-term expansion: p.hi + q.hi + (d.lo + q.lo)
    r = fast_two_sum(p.hi, q.hi)
    s = two_sum(d.lo, q.lo)
    t = two_sum(r.lo, s.hi)
    lo = t.hi + (t.lo + s.lo)
    return fast_two_sum(r.hi, lo)


def df_from(a) -> DF:
    a = jnp.asarray(a)
    return DF(a, jnp.zeros_like(a))


def df_add(x: DF, y: DF) -> DF:
    s = two_sum(x.hi, y.hi)
    t = two_sum(x.lo, y.lo)
    c = s.lo + t.hi
    v = fast_two_sum(s.hi, c)
    w = t.lo + v.lo
    return fast_two_sum(v.hi, w)


def df_add_f(x: DF, y) -> DF:
    # dtype-matched: a python-float y would be promoted to f64 under x64
    # inside the EFTs, silently dragging f32 double-word chains into
    # emulated f64 (this bit the df32 trace: see trace_df's scan note)
    y = jnp.asarray(y, dtype=jnp.asarray(x.hi).dtype)
    s = two_sum(x.hi, y)
    v = s.lo + x.lo
    return fast_two_sum(s.hi, v)


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_mul(x: DF, y: DF) -> DF:
    p = two_prod(x.hi, y.hi)
    e = p.lo + (x.hi * y.lo + x.lo * y.hi)
    return fast_two_sum(p.hi, e)


def df_mul_f(x: DF, y) -> DF:
    # dtype-matched (see df_add_f): two_prod's Dekker split would
    # otherwise run on an f64 scalar and promote the whole chain
    y = jnp.asarray(y, dtype=jnp.asarray(x.hi).dtype)
    p = two_prod(x.hi, y)
    e = p.lo + x.lo * y
    return fast_two_sum(p.hi, e)


def df_sq(x: DF) -> DF:
    return df_mul(x, x)


def df_div(x: DF, y: DF) -> DF:
    """Double-word division: quotient + one Newton-style correction."""
    safe = jnp.where(y.hi != 0, y.hi, 1.0)
    q1 = x.hi / safe
    # r = x - q1 * y, computed in double-word
    r = df_sub(x, df_mul_f(y, q1))
    q2 = (r.hi + r.lo) / safe
    return fast_two_sum(q1, q2)


def df_rsqrt(x: DF) -> DF:
    """Double-word reciprocal square root: 1/sqrt(x)."""
    s = jnp.sqrt(jnp.where(x.hi > 0, x.hi, 1.0))
    r0 = 1.0 / s
    # one double-word Newton step: r = r0 * (3 - x r0^2) / 2
    r0df = DF(r0, jnp.zeros_like(r0))
    xr2 = df_mul(x, df_sq(r0df))
    corr = df_mul_f(df_add_f(df_neg(xr2), 3.0), 0.5)
    return df_mul(r0df, corr)


def df_sqrt(x: DF) -> DF:
    """Double-word sqrt via one Newton refinement of the base sqrt."""
    s = jnp.sqrt(x.hi)
    # r = x - s^2 via two_sum (add-only: immune to FMA contraction; a bare
    # ``x.hi - s2.hi`` would contract with s2's defining mul and then
    # double-count s2.lo)
    s2 = two_prod(s, s)
    d = two_sum(x.hi, -s2.hi)
    r = d.hi + (d.lo - s2.lo + x.lo)
    safe = jnp.where(s > 0, s, 1.0)
    e = r / (2.0 * safe)
    return fast_two_sum(s, e)


def df_to_float(x: DF):
    return x.hi + x.lo


def dot3_df(ax, ay, az, bx, by, bz) -> DF:
    """Error-compensated 3-vector dot product."""
    p1 = two_prod(ax, bx)
    p2 = two_prod(ay, by)
    p3 = two_prod(az, bz)
    s = df_add(DF(*p1), DF(*p2))
    return df_add(s, DF(*p3))


def norm3_df(x, y, z) -> DF:
    """Error-compensated Euclidean norm of a 3-vector."""
    return df_sqrt(dot3_df(x, y, z, x, y, z))


def kahan_sum(terms: jnp.ndarray, axis=None):
    """Neumaier compensated sum along ``axis``.

    Used for OPL accumulation: segment lengths are each ~O(1..100 m) and the
    physically meaningful signal is sub-nm differences of their sums.
    """
    # jnp.cumsum-based compensation is awkward; for small static segment
    # counts (<= 5 mirror legs) we fold pairwise with two_sum.
    if axis is None:
        flat = terms.reshape(-1)
        acc = df_from(flat[0])
        for k in range(1, flat.shape[0]):
            acc = df_add_f(acc, flat[k])
        return df_to_float(acc)
    raise NotImplementedError("use sum_segments for per-ray segment sums")


def sum_segments(segments) -> jnp.ndarray:
    """Compensated per-ray sum of a short list of segment-length arrays."""
    acc = df_from(segments[0])
    for s in segments[1:]:
        acc = df_add_f(acc, s)
    return df_to_float(acc)


def stable_sqrt_diff(d2: jnp.ndarray, r_ref: jnp.ndarray) -> jnp.ndarray:
    """Cancellation-free ``sqrt(d2) - r_ref`` given r_ref ~ sqrt(d2):
    ``(d2 - r_ref^2) / (sqrt(d2) + r_ref)``."""
    r = jnp.sqrt(d2)
    return (d2 - r_ref * r_ref) / (r + r_ref)
