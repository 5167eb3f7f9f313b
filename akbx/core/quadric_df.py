"""Double-f64 quadric *placement* arithmetic (L1).

Why this exists: placing a mirror means evaluating congruence polynomials
in offsets of ~73-146 m on coefficients of ~1e4-1e8, plus a Wolter layout
angle chain whose ``a^2 + org^2 - 2 a org cos(theta)`` numerators cancel
~8 digits (``org - a ~ b^2/2a ~ 5e-4`` on 73 m conics).  Measured against
a 40-digit mpmath evaluation of the same chain
(tests/test_iii_i_parity.py::TestWolterIIIAnglesDF), the f64 chain leaves
1e-9..3e-8 rad of error in theta2..theta5 (hence in the in-plane rotation
omega_V); the DF chain is exact to ~1e-19 rad.  At the full-engine level
the f64 placement costs ~0.7 nm of wavefront vs the reference's 20-digit
mpmath trace (TestIIIIEngineParity — for comparison, the reference's own
shift_z bug costs it ~23 nm).  The *rounded-to-f64* placed coefficients
are perfectly adequate; it is the f64 *computation* of them that is not.

So the placement chain runs in double-word f64 (~32 digits, built on the
contraction-immune EFTs of :mod:`akbx.core.precision`) and rounds once at
the end.  This replaces the mpmath matrices the reference threads through
its placement (``mpmath_zeros``/``shift_x``/``rotate_general_axis`` on
``mpf`` entries, AKB_raytrace_III_I_20250710.py:1101-1300) with jittable,
differentiable JAX — placement stays inside ``jacfwd`` alignment solves.

The quadric is a DF 10-vector; transforms go through the homogeneous 4x4
congruence ``M' = P^T M P`` exactly like :mod:`akbx.core.geometry`, with
every product/sum a double-word op (vectorized over the 4x4 entries).
Small-angle double-word trig (Taylor, |x| < pi/4) and a Newton-corrected
``df_asin`` support the layout angle chain.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from akbx.core import geometry as geo
from akbx.core.precision import (DF, df_add, df_div, df_mul, df_mul_f,
                                 df_neg, df_sqrt, df_sub, df_to_float,
                                 fast_two_sum, two_prod)


class QDF(NamedTuple):
    """A quadric 10-vector in double-word f64: value = hi + lo (exact)."""

    hi: jnp.ndarray  # (10,)
    lo: jnp.ndarray  # (10,)

    def to_f64(self) -> jnp.ndarray:
        return self.hi + self.lo

    @staticmethod
    def from_f64(coeffs) -> "QDF":
        c = jnp.asarray(coeffs, dtype=jnp.float64)
        return QDF(c, jnp.zeros_like(c))


def is_qdf(x) -> bool:
    return isinstance(x, QDF)


def coeffs_f64(x) -> jnp.ndarray:
    """Plain-f64 view of either a QDF or an ordinary coeff array."""
    return x.to_f64() if isinstance(x, QDF) else x


def _df(x) -> DF:
    if isinstance(x, DF):
        return x
    x = jnp.asarray(x, dtype=jnp.float64)
    return DF(x, jnp.zeros_like(x))


# --- DF 4x4 symmetric homogeneous matrix <-> DF coeffs ------------------
# The matrix is a DF whose hi/lo are (4, 4) arrays; congruence is done with
# vectorized df ops (7 array ops per matmul instead of 112 scalar ones).

_IDX = jnp.array([[0, 3, 4, 6],
                  [3, 1, 5, 7],
                  [4, 5, 2, 8],
                  [6, 7, 8, 9]])
_HALF = jnp.array([[1.0, 0.5, 0.5, 0.5],
                   [0.5, 1.0, 0.5, 0.5],
                   [0.5, 0.5, 1.0, 0.5],
                   [0.5, 0.5, 0.5, 1.0]])


def _quadric_matrix_df(q: QDF) -> DF:
    # gather + exact *0.5 (both hi and lo scale exactly)
    return DF(q.hi[_IDX] * _HALF, q.lo[_IDX] * _HALF)


def _matrix_to_coeffs_df(M: DF) -> QDF:
    ii = (jnp.array([0, 1, 2, 0, 0, 1, 0, 1, 2, 3]),
          jnp.array([0, 1, 2, 1, 2, 2, 3, 3, 3, 3]))
    scale = jnp.array([1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 1.0])
    return QDF(M.hi[ii] * scale, M.lo[ii] * scale)  # exact *2


def _df_matmul(A: DF, B: DF) -> DF:
    """(4,4) DF matrix product with double-word dot products.

    One batched df_mul over the (k,i,j) partial-product cube plus a
    pairwise df_add tree over k — 3 DF ops instead of 7, which matters
    because the placement chain holds ~34 congruences and the unbatched
    form dominated jit compile time (62k-line HLO, VERDICT r2 #5)."""
    # partial[k, i, j] = A[i, k] * B[k, j]
    Ak = DF(jnp.moveaxis(A.hi, 1, 0)[:, :, None],
            jnp.moveaxis(A.lo, 1, 0)[:, :, None])        # (k, i, 1)
    Bk = DF(B.hi[:, None, :], B.lo[:, None, :])          # (k, 1, j)
    t = df_mul(Ak, Bk)                                   # (4, 4, 4)
    t = df_add(DF(t.hi[0::2], t.lo[0::2]), DF(t.hi[1::2], t.lo[1::2]))
    return df_add(DF(t.hi[0], t.lo[0]), DF(t.hi[1], t.lo[1]))


def _congruence_df(M: DF, P: DF) -> DF:
    Pt = DF(P.hi.T, P.lo.T)
    return _df_matmul(Pt, _df_matmul(M, P))


def _homogeneous_df(R3: jnp.ndarray, t_df) -> DF:
    """4x4 DF homogeneous matrix from an f64 3x3 block + DF translation."""
    hi = jnp.eye(4, dtype=jnp.float64)
    hi = hi.at[:3, :3].set(R3)
    hi = hi.at[:3, 3].set(jnp.stack([t.hi for t in t_df]))
    lo = jnp.zeros((4, 4), dtype=jnp.float64)
    lo = lo.at[:3, 3].set(jnp.stack([t.lo for t in t_df]))
    return DF(hi, lo)


def shift(q: QDF, t) -> QDF:
    """Translate the surface by ``t`` in double-word (geometry.shift)."""
    t = jnp.asarray(t, dtype=jnp.float64)
    M = _quadric_matrix_df(q)
    t_df = [_df(-t[i]) for i in range(3)]
    P = _homogeneous_df(jnp.eye(3, dtype=jnp.float64), t_df)
    return _matrix_to_coeffs_df(_congruence_df(M, P))


def shift_x(q: QDF, s) -> QDF:
    s = jnp.asarray(s, dtype=jnp.float64)
    z = jnp.zeros_like(s)
    return shift(q, jnp.stack([s, z, z]))


def transform(q: QDF, R: jnp.ndarray, center) -> QDF:
    """Rotate the surface by ``R`` about ``center`` (geometry.
    transform_quadric), translation column computed in double-word:
    t = c - R^T c (the ~theta*|c| cancellation at |c| ~ 146 m)."""
    c = jnp.asarray(center, dtype=jnp.float64)
    Rt = R.T
    t_df = []
    for i in range(3):
        acc = two_prod(-Rt[i, 0], c[0])
        acc = df_add(acc, two_prod(-Rt[i, 1], c[1]))
        acc = df_add(acc, two_prod(-Rt[i, 2], c[2]))
        acc = df_add(acc, _df(c[i]))
        t_df.append(acc)
    M = _quadric_matrix_df(q)
    P = _homogeneous_df(Rt, t_df)
    return _matrix_to_coeffs_df(_congruence_df(M, P))


def rotate_about_axis(q: QDF, axis, theta, center):
    """DF counterpart of geometry.rotate_about_axis: returns (QDF, R)."""
    R = geo.rodrigues(jnp.asarray(axis, dtype=jnp.float64), theta)
    return transform(q, R, center), R


# --- double-word trig for the layout angle chains ------------------------
# Inputs here are placement-time scalars with |x| < pi/4 (grazing optics:
# every layout angle is 0..0.35 rad), so Taylor series converge to the
# full ~32 digits in <= 13 terms.  These exist because f64 libm sin/cos
# carry ~1 ulp error that the angle chain amplifies to ~1e-8 rad in omega.

_N_TERMS = 13


def _df_horner_trig(x2: DF, denoms: jnp.ndarray) -> DF:
    """Shared Horner loop of the Taylor trig, rolled into a lax.scan so
    the 13 double-word iterations appear ONCE in the jitted graph (the
    unrolled form contributed ~17k HLO lines to every placement compile,
    VERDICT r2 #5).  scan (not fori_loop) keeps the chain reverse-mode
    differentiable for design-parameter gradients.  Returns acc with
    acc_k = (1 - acc_{k+1}) * x^2 / denom_k, folded from k = n..1."""
    import jax

    one = _df(jnp.float64(1.0))
    zero = DF(jnp.zeros_like(x2.hi), jnp.zeros_like(x2.lo))

    def body(acc, denom):
        return df_mul(df_sub(one, acc), DF(x2.hi / denom, x2.lo / denom)), None

    acc, _ = jax.lax.scan(body, zero, denoms)
    return acc


def df_sin_small(x: DF) -> DF:
    """sin(x) in double-word for |x| < ~0.8 (Taylor)."""
    x2 = df_mul(x, x)
    # Horner over odd terms: sin x = x (1 - x^2/6 (1 - x^2/20 (...)))
    denoms = jnp.array([(2 * k) * (2 * k + 1)
                        for k in range(_N_TERMS, 0, -1)], dtype=jnp.float64)
    acc = _df_horner_trig(x2, denoms)
    return df_mul(x, df_sub(_df(jnp.float64(1.0)), acc))


def df_cos_small(x: DF) -> DF:
    """cos(x) in double-word for |x| < ~0.8 (Taylor)."""
    x2 = df_mul(x, x)
    denoms = jnp.array([(2 * k - 1) * (2 * k)
                        for k in range(_N_TERMS, 0, -1)], dtype=jnp.float64)
    acc = _df_horner_trig(x2, denoms)
    return df_sub(_df(jnp.float64(1.0)), acc)


def df_asin(x: DF) -> DF:
    """arcsin(x) in double-word via one Newton step on df_sin_small.

    Valid for |x| <~ 0.7 (layout angles are all < 0.35 rad):
    y1 = y0 + (x - sin y0) / cos y0 with y0 the f64 arcsin.
    """
    y0 = jnp.arcsin(x.hi)
    y0df = _df(y0)
    r = df_sub(x, df_sin_small(y0df))
    c = df_cos_small(y0df)
    return df_add(y0df, df_div(r, c))


# --- reference shift_z-bug emulation (for oracle parity tests only) -----

def ref_shift_z_buggy(coeffs, s):
    """The reference's ``shift_z`` EXACTLY, including its bug: it computes
    ``h2 = h - f*s`` but returns the old ``h``
    (AKB_raytrace_20250312.py:119-127; AKB_raytrace_III_I_20250710.py:
    102-108).  Every reference rotation about a center with z != 0 runs
    through this, so the placed H mirrors inherit a wrong linear-y term
    (~2e-2 absolute on the hyp_H ``h`` after the 0.24 rad omega rotation,
    -> ~23 nm wavefront, measured in tests/test_iii_i_parity.py).  Our
    default placement is correct; this exists so
    parity tests can reproduce the reference bit-for-bit (bug and all)."""
    a, b, c, d, e, f, g, h, i, j = [coeffs[k] for k in range(10)]
    g = g - e * s
    # h = h - f * s  <-- the update the reference drops
    i2 = i - 2 * c * s
    j = j + c * s ** 2 - i * s
    return jnp.stack([a, b, c, d, e, f, g, h, i2, j])


def ref_shift_buggy(coeffs, t):
    """Sequential reference-style shift_x, shift_y, buggy shift_z."""
    t = jnp.asarray(t, dtype=jnp.float64)
    coeffs = geo.shift(coeffs, jnp.stack([t[0], t[0] * 0, t[0] * 0]))
    coeffs = geo.shift(coeffs, jnp.stack([t[1] * 0, t[1], t[1] * 0]))
    return ref_shift_z_buggy(coeffs, t[2])


def ref_rotate_about_axis_buggy(coeffs, axis, theta, center):
    """The reference's ``rotate_general_axis`` (AKB_raytrace_20250312.py:
    764-793): buggy-shift to origin, rotate about origin, buggy-shift back.
    Returns (coeffs, R) like geometry.rotate_about_axis."""
    c = jnp.asarray(center, dtype=jnp.float64)
    coeffs = ref_shift_buggy(coeffs, -c)
    R = geo.rodrigues(jnp.asarray(axis, dtype=jnp.float64), theta)
    coeffs = geo.transform_quadric(coeffs, R, None)
    coeffs = ref_shift_buggy(coeffs, c)
    return coeffs, R


def wolter_iii_angles_df(a_hyp, b_hyp, a_ell, b_ell, theta1):
    """The Wolter III layout angle chain in double-word f64.

    Same algebra as :func:`akbx.design.wolter_iii_angles`
    (reference ``print_optical_design``, AKB_raytrace_20250312.py:1996-2023;
    mpmath form AKB_raytrace_III_I_20250710.py:1116-1133), but immune to its
    f64 failure mode: the ``a^2 + org^2 - 2 a org cos(theta)`` numerators
    cancel down to ~(org-a)^2 ~ (b^2/2a)^2 — 8 lost digits on 73 m conics —
    which leaves ~3e-8 rad of error in theta5 and hence in the in-plane
    placement rotation omega_V (measured vs the mpmath engine).

    The conic origins are recomputed here in DF from (a, b) so the
    cancellation ``org - a = b^2/(org + a)`` keeps its digits.
    Returns (theta2, theta3, theta4, theta5) as DF.
    """
    a_h = _df(jnp.asarray(a_hyp, dtype=jnp.float64))
    b_h = _df(jnp.asarray(b_hyp, dtype=jnp.float64))
    a_e = _df(jnp.asarray(a_ell, dtype=jnp.float64))
    b_e = _df(jnp.asarray(b_ell, dtype=jnp.float64))
    th1 = _df(jnp.asarray(theta1, dtype=jnp.float64))

    a2_h = df_mul(a_h, a_h)
    o2_h = df_add(a2_h, df_mul(b_h, b_h))      # org_hyp^2 = a^2 + b^2
    org_h = df_sqrt(o2_h)
    a2_e = df_mul(a_e, a_e)
    o2_e = df_sub(a2_e, df_mul(b_e, b_e))      # org_ell^2 = a^2 - b^2
    org_e = df_sqrt(o2_e)

    c1 = df_cos_small(th1)
    s1 = df_sin_small(th1)

    # l2 = (4 a^2 + 4 org^2 - 8 a org cos th1) / (4 org - 4 a)
    num = df_sub(df_add(a2_h, o2_h),
                 df_mul_f(df_mul(df_mul(a_h, org_h), c1), jnp.float64(2.0)))
    den = df_sub(org_h, a_h)
    l2 = df_div(num, den)
    l1 = df_add(df_mul_f(a_h, jnp.float64(2.0)), l2)
    theta2 = df_mul_f(
        df_asin(df_div(df_mul(df_mul_f(org_h, jnp.float64(2.0)), s1), l2)),
        jnp.float64(0.5))
    theta3 = df_asin(df_div(df_mul(l1, s1), l2))

    c3 = df_cos_small(theta3)
    s3 = df_sin_small(theta3)
    # l4 = (org_e^2 - 2 org_e a_ell cos th3 + a_ell^2) / (a_ell - org_e cos th3)
    num4 = df_sub(df_add(o2_e, a2_e),
                  df_mul_f(df_mul(df_mul(org_e, a_e), c3), jnp.float64(2.0)))
    den4 = df_sub(a_e, df_mul(org_e, c3))
    l4 = df_div(num4, den4)
    theta5 = df_asin(df_div(
        df_mul(df_sub(df_mul_f(a_e, jnp.float64(2.0)), l4), s3), l4))
    theta4 = df_mul_f(
        df_asin(df_div(df_mul(df_mul_f(org_e, jnp.float64(2.0)), s3), l4)),
        jnp.float64(0.5))
    return theta2, theta3, theta4, theta5
