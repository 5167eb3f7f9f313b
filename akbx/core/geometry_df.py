"""Double-f32 quadric geometry: the TPU fast path of the trace.

On TPU (no f64 ALUs) XLA emulates every f64 op as a multi-op f32
sequence; the measured cost of the f64 AKB trace is ~150 ns/ray fwd+bwd
on v5e — 15-20x off the 1e8 rays/s target (BASELINE.md).  This module
re-expresses the per-bounce geometry in explicit double-word f32
arithmetic (``core.precision``) on *re-centered* coordinates, which is
both faster than blanket f64 emulation and numerically tighter than raw
f64 where it matters:

* every mirror is traced in a frame centered on its chief-ray center
  (``Mirror.center``), so coordinates span ~0.1 m instead of ~146 m —
  df32's ~48-bit mantissa then resolves ~4e-16 m locally;
* leg lengths accumulate as double-words; converted to f64 only at the
  trace boundary (OPL resolution ~5e-13 m over 146 m, vs the ~1e-10 m
  wavefront signal — headroom ~200x);
* the quadratic root uses the same stable q-form as the f64 path.

This replaces the reference's mpmath escape hatch (option_mpmath,
AKB_raytrace_20250312.py:91-92) on the throughput path; everything is
plain jnp on f32 pairs, so ``jax.grad`` flows through unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from akbx.core.precision import (DF, df_add, df_add_f, df_div, df_from,
                                 df_mul, df_mul_f, df_neg, df_rsqrt, df_sq,
                                 df_sqrt, df_sub, fast_two_sum, two_prod,
                                 two_sum)

F32 = jnp.float32


def split_f64(x, dtype=F32) -> DF:
    """Split an f64 array into a double-word of ``dtype`` (hi + lo)."""
    x = jnp.asarray(x)
    hi = x.astype(dtype)
    lo = (x - hi.astype(x.dtype)).astype(dtype)
    return DF(hi, lo)


def df_to_f64(x: DF) -> jnp.ndarray:
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def _dot3(ax: DF, ay: DF, az: DF, bx: DF, by: DF, bz: DF) -> DF:
    return df_add(df_add(df_mul(ax, bx), df_mul(ay, by)), df_mul(az, bz))


class Vec3DF(NamedTuple):
    """A 3-vector of double-words, component arrays shaped (N,)."""

    x: DF
    y: DF
    z: DF

    @staticmethod
    def from_f64(arr) -> "Vec3DF":
        return Vec3DF(split_f64(arr[0]), split_f64(arr[1]), split_f64(arr[2]))

    def to_f64(self) -> jnp.ndarray:
        return jnp.stack([df_to_f64(self.x), df_to_f64(self.y),
                          df_to_f64(self.z)])

    def dot(self, o: "Vec3DF") -> DF:
        return _dot3(self.x, self.y, self.z, o.x, o.y, o.z)

    def scale(self, s: DF) -> "Vec3DF":
        return Vec3DF(df_mul(self.x, s), df_mul(self.y, s), df_mul(self.z, s))

    def add(self, o: "Vec3DF") -> "Vec3DF":
        return Vec3DF(df_add(self.x, o.x), df_add(self.y, o.y),
                      df_add(self.z, o.z))

    def sub(self, o: "Vec3DF") -> "Vec3DF":
        return Vec3DF(df_sub(self.x, o.x), df_sub(self.y, o.y),
                      df_sub(self.z, o.z))

    def shift_const(self, d) -> "Vec3DF":
        """Add a per-component double-word constant (broadcasts)."""
        return Vec3DF(df_add(self.x, DF(d.x.hi, d.x.lo)),
                      df_add(self.y, DF(d.y.hi, d.y.lo)),
                      df_add(self.z, DF(d.z.hi, d.z.lo)))

    def normalize(self) -> "Vec3DF":
        r = df_rsqrt(self.dot(self))
        return self.scale(r)


def _coeff_df(coeffs):
    """Split a 10-vector of f64 quadric coefficients into df32 scalars."""
    return [split_f64(coeffs[i]) for i in range(10)]


# ---------------------------------------------------------------------------
# Small linear-algebra forms on deviations (used by the deviation trace).
# Constants enter as f64 and are split once; per-ray operands are Vec3DF.
# ---------------------------------------------------------------------------


def df_bcast(x: DF, shape) -> DF:
    return DF(jnp.broadcast_to(x.hi, shape), jnp.broadcast_to(x.lo, shape))


def vec3_const(v, shape=None) -> Vec3DF:
    """Split an f64 (3,) constant into a Vec3DF (optionally broadcast)."""
    comps = [split_f64(v[i]) for i in range(3)]
    if shape is not None:
        comps = [df_bcast(c, shape) for c in comps]
    return Vec3DF(*comps)


def linform(u: Vec3DF, v: Vec3DF) -> DF:
    """u . v for a (possibly constant) u and per-ray v."""
    return u.dot(v)


def matvec(M9, v: Vec3DF) -> Vec3DF:
    """M @ v with M given as a 3x3 of pre-split df scalars (tuple of
    tuples).  Returns a Vec3DF."""
    rows = []
    for r in range(3):
        m0, m1, m2 = M9[r]
        rows.append(df_add(df_add(df_mul(m0, v.x), df_mul(m1, v.y)),
                           df_mul(m2, v.z)))
    return Vec3DF(*rows)


def mat3_const(M) -> tuple:
    """Split an f64 (3,3) constant into a 3x3 of df scalars."""
    return tuple(tuple(split_f64(M[r, c]) for c in range(3))
                 for r in range(3))


def quadform(M9, v: Vec3DF) -> DF:
    """v^T M v (per-ray)."""
    return linform(matvec(M9, v), v)


def solve_quadratic_df(A: DF, B: DF, C: DF):
    """Stable q-form roots in double-word arithmetic.

    Mirrors ``geometry.solve_quadratic`` (q = -(B + sign(B) sqrt(D))/2;
    roots q/A and C/q) with D = B^2 - 4AC computed via error-free products.
    """
    B2 = df_sq(B)
    AC4 = df_mul_f(df_mul(A, C), F32(4.0))
    D = df_sub(B2, AC4)
    valid = D.hi > 0
    Dc = DF(jnp.where(valid, D.hi, F32(0.0)), jnp.where(valid, D.lo, F32(0.0)))
    sqrtD = df_sqrt(Dc)
    sgn = jnp.where(B.hi >= 0, F32(1.0), F32(-1.0))
    q = df_mul_f(df_add(B, df_mul_f(sqrtD, sgn)), F32(-0.5))
    safe_A = DF(jnp.where(A.hi != 0, A.hi, F32(1.0)), A.lo)
    safe_q = DF(jnp.where(q.hi != 0, q.hi, F32(1.0)), q.lo)
    t_q_over_A = df_div(q, safe_A)
    t_C_over_q = df_div(C, safe_q)
    t_plus = DF(jnp.where(B.hi >= 0, t_C_over_q.hi, t_q_over_A.hi),
                jnp.where(B.hi >= 0, t_C_over_q.lo, t_q_over_A.lo))
    t_minus = DF(jnp.where(B.hi >= 0, t_q_over_A.hi, t_C_over_q.hi),
                 jnp.where(B.hi >= 0, t_q_over_A.lo, t_C_over_q.lo))
    return t_plus, t_minus, valid


def intersect_df(coeffs, rays: Vec3DF, origins: Vec3DF, branch):
    """Ray-quadric intersection in df32 (mirror-local coordinates).

    ``coeffs``: f64 10-vector already shifted into the local frame.
    Returns (points Vec3DF, t DF, valid).  Semantics match
    ``geometry.intersect`` incl. the branch selection and the linear
    fallback for A == 0.
    """
    a, b, c, d, e, f, g, h, i, j = _coeff_df(coeffs)
    l, m, n = rays.x, rays.y, rays.z
    p, q_, r = origins.x, origins.y, origins.z

    A = df_add(df_add(df_add(df_mul(a, df_sq(l)), df_mul(b, df_sq(m))),
                      df_add(df_mul(c, df_sq(n)), df_mul(d, df_mul(m, l)))),
               df_add(df_mul(e, df_mul(n, l)), df_mul(f, df_mul(m, n))))
    B = df_add(
        df_add(
            df_mul_f(df_add(df_add(df_mul(a, df_mul(p, l)),
                                   df_mul(b, df_mul(q_, m))),
                            df_mul(c, df_mul(r, n))), F32(2.0)),
            df_add(df_mul(d, df_add(df_mul(p, m), df_mul(q_, l))),
                   df_mul(e, df_add(df_mul(p, n), df_mul(r, l))))),
        df_add(df_mul(f, df_add(df_mul(r, m), df_mul(q_, n))),
               df_add(df_add(df_mul(g, l), df_mul(h, m)), df_mul(i, n))))
    C = df_add(
        df_add(df_add(df_mul(a, df_sq(p)), df_mul(b, df_sq(q_))),
               df_add(df_mul(c, df_sq(r)), df_mul(d, df_mul(p, q_)))),
        df_add(df_add(df_mul(e, df_mul(p, r)), df_mul(f, df_mul(q_, r))),
               df_add(df_add(df_mul(g, p), df_mul(h, q_)),
                      df_add(df_mul(i, r), j))))

    t_plus, t_minus, valid = solve_quadratic_df(A, B, C)
    pick_plus = jnp.asarray(branch) >= 0
    t = DF(jnp.where(pick_plus, t_plus.hi, t_minus.hi),
           jnp.where(pick_plus, t_plus.lo, t_minus.lo))

    # linear fallback when A == 0 (ray along an asymptotic direction)
    safe_B = DF(jnp.where(B.hi != 0, B.hi, F32(1.0)), B.lo)
    t_lin = df_neg(df_div(C, safe_B))
    is_quad = A.hi != 0
    t = DF(jnp.where(is_quad, t.hi, t_lin.hi),
           jnp.where(is_quad, t.lo, t_lin.lo))
    valid = jnp.where(is_quad, valid, B.hi != 0)

    points = origins.add(rays.scale(t))
    return points, t, valid


def surface_normal_df(coeffs, points: Vec3DF) -> Vec3DF:
    """Unit gradient of the quadric at df32 points — same convention as
    ``geometry.surface_normal`` (normalized gradient, no sign flip;
    reflection is invariant under n -> -n)."""
    a, b, c, d, e, f, g, h, i, _ = _coeff_df(coeffs)
    x, y, z = points.x, points.y, points.z
    nx = df_add(df_add(df_mul_f(df_mul(a, x), F32(2.0)), df_mul(d, y)),
                df_add(df_mul(e, z), g))
    ny = df_add(df_add(df_mul_f(df_mul(b, y), F32(2.0)), df_mul(d, x)),
                df_add(df_mul(f, z), h))
    nz = df_add(df_add(df_mul_f(df_mul(c, z), F32(2.0)), df_mul(e, x)),
                df_add(df_mul(f, y), i))
    return Vec3DF(nx, ny, nz).normalize()


def reflect_df(rays: Vec3DF, normals: Vec3DF) -> Vec3DF:
    """r = d - 2 (d.n) n in double-words (no renormalization needed)."""
    dot2 = df_mul_f(rays.dot(normals), F32(-2.0))
    return rays.add(normals.scale(dot2))


def plane_x_intersect_df(x_plane_local: DF, rays: Vec3DF, origins: Vec3DF):
    """Intersect with the plane x = const (detector planes); returns
    (points Vec3DF, t DF)."""
    dx = df_sub(DF(jnp.broadcast_to(x_plane_local.hi, origins.x.hi.shape),
                   jnp.broadcast_to(x_plane_local.lo, origins.x.hi.shape)),
                origins.x)
    safe = DF(jnp.where(rays.x.hi != 0, rays.x.hi, F32(1.0)), rays.x.lo)
    t = df_div(dx, safe)
    return origins.add(rays.scale(t)), t
