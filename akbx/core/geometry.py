"""Quadric geometry core (L0): the kernel surface of the framework.

A mirror surface is the zero set of a 10-coefficient quadric

    S(x, y, z) = a x^2 + b y^2 + c z^2 + d xy + e xz + f yz + g x + h y + i z + j

stored as an array ``coeffs = [a..j]`` (same layout as the reference,
``EllipseRaytrace3D.py:18-157``).  Rays and points are batched as ``(3, N)``
arrays.  Everything here is pure jnp, differentiable, and jit/vmap friendly.

Deliberate departures from the reference:

* **Stable quadratic root.**  The reference computes
  ``t = (-B ± sqrt(B² - 4AC)) / (2A)`` directly
  (``AKB_raytrace_20250312.py:444-471``), which cancels catastrophically at
  grazing incidence where ``|B| ≈ sqrt(D)``.  We use the ``q``-form
  (``q = -(B + sign(B) sqrt(D))/2``; roots ``q/A`` and ``C/q``), which is
  exact to rounding in both branches.

* **Per-ray validity masks.**  The reference NaN-poisons the whole batch if
  any single discriminant is non-positive (``:456-459``).  We return a
  per-ray boolean ``valid`` and clamp the discriminant inside ``sqrt`` so
  gradients never see NaN.

* **Coefficient transport as homogeneous congruence.**  Translation/rotation
  of a quadric is ``M' = P^T M P`` on the symmetric 4x4 matrix — one einsum
  instead of the reference's 10 hand-expanded polynomials
  (``:645-871``); identical algebra, verified by property tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = 0, eps: float = 0.0) -> jnp.ndarray:
    """Normalize vectors along ``axis``; zero vectors pass through unchanged.

    Parity: ``normalize_vector`` (EllipseRaytrace3D.py:57-59) — except the
    reference skips normalization of the *whole batch* when any norm is 0;
    we handle it per-vector.
    """
    norm = jnp.linalg.norm(v, axis=axis, keepdims=True)
    safe = jnp.where(norm > eps, norm, 1.0)
    return v / safe


def quadric_eval(coeffs: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Evaluate S(x,y,z) at points (3, N) -> (N,)."""
    a, b, c, d, e, f, g, h, i, j = coeffs
    x, y, z = points
    return (
        a * x * x + b * y * y + c * z * z
        + d * x * y + e * x * z + f * y * z
        + g * x + h * y + i * z + j
    )


def quadric_matrix(coeffs: jnp.ndarray) -> jnp.ndarray:
    """10-vector -> symmetric homogeneous 4x4 matrix M with [x,1]^T M [x,1] = S."""
    a, b, c, d, e, f, g, h, i, j = coeffs
    return jnp.array(
        [
            [a, d / 2, e / 2, g / 2],
            [d / 2, b, f / 2, h / 2],
            [e / 2, f / 2, c, i / 2],
            [g / 2, h / 2, i / 2, j],
        ]
    )


def matrix_to_coeffs(M: jnp.ndarray) -> jnp.ndarray:
    """Symmetric 4x4 matrix -> 10-vector (inverse of :func:`quadric_matrix`)."""
    return jnp.stack(
        [
            M[0, 0],
            M[1, 1],
            M[2, 2],
            2 * M[0, 1],
            2 * M[0, 2],
            2 * M[1, 2],
            2 * M[0, 3],
            2 * M[1, 3],
            2 * M[2, 3],
            M[3, 3],
        ]
    )


def _transform_matrix(M: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """Congruence M' = P^T M P (P maps new-frame homogeneous coords to old)."""
    return P.T @ M @ P


def shift(coeffs: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Translate the surface by vector ``t`` (surface moves by +t).

    Parity: chained ``shift_x/shift_y/shift_z`` (EllipseRaytrace3D.py:73-95),
    whose algebra substitutes x -> x - s.
    """
    t = jnp.asarray(t)
    P = jnp.eye(4).at[:3, 3].set(-t)
    return matrix_to_coeffs(_transform_matrix(quadric_matrix(coeffs), P))


def shift_x(coeffs, s):
    return shift(coeffs, jnp.stack([jnp.asarray(s), jnp.zeros_like(jnp.asarray(s)), jnp.zeros_like(jnp.asarray(s))]))


def shift_y(coeffs, s):
    return shift(coeffs, jnp.stack([jnp.zeros_like(jnp.asarray(s)), jnp.asarray(s), jnp.zeros_like(jnp.asarray(s))]))


def shift_z(coeffs, s):
    return shift(coeffs, jnp.stack([jnp.zeros_like(jnp.asarray(s)), jnp.zeros_like(jnp.asarray(s)), jnp.asarray(s)]))


def rodrigues(axis: jnp.ndarray, theta) -> jnp.ndarray:
    """Rotation matrix about ``axis`` by ``theta`` (Rodrigues formula).

    Parity: ``rotation_matrix`` (EllipseRaytrace3D.py:97-112).
    """
    from akbx.core import trig as tg  # scalar-path-safe cos/sin (see trig.py)

    axis = jnp.asarray(axis, dtype=jnp.result_type(float))
    axis = axis / jnp.linalg.norm(axis)
    ux, uy, uz = axis
    K = jnp.array([[0.0, -uz, uy], [uz, 0.0, -ux], [-uy, ux, 0.0]])
    c, s = tg.cos(theta), tg.sin(theta)
    return c * jnp.eye(3) + (1.0 - c) * jnp.outer(axis, axis) + s * K


def transform_quadric(coeffs: jnp.ndarray, R: jnp.ndarray | None = None,
                      center: jnp.ndarray | None = None) -> jnp.ndarray:
    """Rotate the surface by ``R`` about ``center`` (active rotation).

    Points on the new surface satisfy x_new = R (x_old - c) + c.
    """
    M = quadric_matrix(coeffs)
    if R is None:
        return matrix_to_coeffs(M)
    c = jnp.zeros(3) if center is None else jnp.asarray(center)
    # Inverse map: x_old = R^T (x_new - c) + c, as a homogeneous matrix.
    P = jnp.eye(4)
    P = P.at[:3, :3].set(R.T)
    P = P.at[:3, 3].set(c - R.T @ c)
    return matrix_to_coeffs(_transform_matrix(M, P))


def rotate_about_axis(coeffs: jnp.ndarray, axis, theta, center):
    """Rotate surface about an arbitrary axis through ``center``.

    Returns ``(new_coeffs, R)``.
    Parity: ``rotate_general_axis`` (EllipseRaytrace3D.py:114-143,
    AKB_raytrace_20250312.py:764-793) — shift to center, congruence with
    the transposed Rodrigues matrix, shift back.
    """
    R = rodrigues(jnp.asarray(axis, dtype=jnp.result_type(float)), theta)
    return transform_quadric(coeffs, R, jnp.asarray(center)), R


def rotate_x(coeffs, theta, center):
    """Parity: ``rotate_x`` (AKB_raytrace_20250312.py:669-693)."""
    return rotate_about_axis(coeffs, jnp.array([1.0, 0.0, 0.0]), theta, center)[0]


def rotate_y(coeffs, theta, center):
    """Parity: ``rotate_y`` (AKB_raytrace_20250312.py:695-719)."""
    return rotate_about_axis(coeffs, jnp.array([0.0, 1.0, 0.0]), theta, center)[0]


def rotate_z(coeffs, theta, center):
    """Parity: ``rotate_z`` (AKB_raytrace_20250312.py:721-745)."""
    return rotate_about_axis(coeffs, jnp.array([0.0, 0.0, 1.0]), theta, center)[0]


def solve_quadratic(A, B, C):
    """Stable roots of ``A t^2 + B t + C = 0``.

    Returns ``(t_plus, t_minus, valid)`` where t_plus/t_minus correspond to
    the naive ``(-B ± sqrt(D)) / (2A)`` but computed via the q-form
    (``q = -(B + sign(B) sqrt(D))/2``; roots ``q/A`` and ``C/q``) so neither
    branch suffers catastrophic cancellation.  ``valid`` flags ``D > 0``.
    """
    D = B * B - 4 * A * C
    valid = D > 0
    sqrtD = jnp.sqrt(jnp.where(valid, D, 0.0))
    sgn = jnp.where(B >= 0, 1.0, -1.0)
    qq = -0.5 * (B + sgn * sqrtD)
    safe_A = jnp.where(A != 0, A, 1.0)
    safe_q = jnp.where(qq != 0, qq, 1.0)
    t_q_over_A = qq / safe_A
    t_C_over_q = C / safe_q
    t_plus = jnp.where(B >= 0, t_C_over_q, t_q_over_A)
    t_minus = jnp.where(B >= 0, t_q_over_A, t_C_over_q)
    return t_plus, t_minus, valid


def intersect(coeffs: jnp.ndarray, rays: jnp.ndarray, origins: jnp.ndarray,
              branch: int = +1):
    """Ray-quadric intersection.

    Solves ``A t^2 + B t + C = 0`` per ray and returns
    ``(points (3,N), t (N,), valid (N,))``.  ``branch=+1`` selects the
    ``(-B + sqrt(D))`` root, ``branch=-1`` the ``(-B - sqrt(D))`` root —
    same semantics as the reference's ``negative=`` flag
    (``mirr_ray_intersection``, EllipseRaytrace3D.py:18-45; the H-hyperbola
    needs the negative branch, AKB_raytrace_20250312.py:2820).

    Computed with the numerically stable q-form; invalid rays (D <= 0)
    are flagged instead of poisoning the batch.
    """
    a, b, c, d, e, f, g, h, i, j = coeffs
    l, m, n = rays
    p, q_, r = origins

    A = a * l * l + b * m * m + c * n * n + d * m * l + e * n * l + f * m * n
    B = (
        2 * a * p * l + 2 * b * q_ * m + 2 * c * r * n
        + d * (p * m + q_ * l) + e * (p * n + r * l) + f * (r * m + q_ * n)
        + g * l + h * m + i * n
    )
    C = (
        a * p * p + b * q_ * q_ + c * r * r
        + d * p * q_ + e * p * r + f * q_ * r
        + g * p + h * q_ + i * r + j
    )

    t_plus, t_minus, valid = solve_quadratic(A, B, C)
    # ``branch`` may be a traced scalar (mirror pytree field) -> where.
    t = jnp.where(jnp.asarray(branch) >= 0, t_plus, t_minus)

    # Degenerate A == 0 (ray parallel to quadric's asymptotic direction):
    # linear equation B t + C = 0.
    t_lin = -C / jnp.where(B != 0, B, 1.0)
    is_quad = A != 0
    t = jnp.where(is_quad, t, t_lin)
    valid = jnp.where(is_quad, valid, B != 0)

    points = origins + t * rays
    return points, t, valid


def surface_normal(coeffs: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Unit outward gradient of the quadric at ``points``.

    Parity: ``norm_vector`` (EllipseRaytrace3D.py:61-71).
    """
    a, b, c, d, e, f, g, h, i, _ = coeffs
    x, y, z = points
    N = jnp.stack(
        [
            2 * a * x + d * y + e * z + g,
            2 * b * y + d * x + f * z + h,
            2 * c * z + e * x + f * y + i,
        ]
    )
    return normalize(N)


def reflect(rays: jnp.ndarray, normals: jnp.ndarray,
            renormalize: bool = True) -> jnp.ndarray:
    """Specular reflection ``r = d - 2 (d.n) n``.

    Parity: ``reflect_ray`` (EllipseRaytrace3D.py:47-55).
    ``renormalize=False`` skips the closing normalization — exact for unit
    ``rays``/``normals`` up to one rounding (|r| = 1 + O(eps) per bounce),
    and saves an emulated-f64 rsqrt per bounce on TPU in the hot trace.
    """
    dot = jnp.sum(rays * normals, axis=0)
    r = rays - 2 * dot * normals
    return normalize(r) if renormalize else r


def plane_intersect(coeffs: jnp.ndarray, rays: jnp.ndarray,
                    origins: jnp.ndarray) -> jnp.ndarray:
    """Ray-plane intersection; the plane is ``g x + h y + i z + j = 0``
    taken from ``coeffs[6:10]``.

    Parity: ``plane_ray_intersection`` (EllipseRaytrace3D.py:145-157).
    """
    g, h, i, j = coeffs[6], coeffs[7], coeffs[8], coeffs[9]
    l, m, n = rays
    p, q, r = origins
    denom = g * l + h * m + i * n
    t = -(g * p + h * q + i * r + j) / jnp.where(denom != 0, denom, 1.0)
    return origins + t * rays


def detector_plane(x_position) -> jnp.ndarray:
    """Plane ``x = x_position`` as a 10-coeff quadric (reference pattern
    ``coeffs_det[6]=1; coeffs_det[9]=-pos``, AKB_raytrace_20250312.py:2842-2844)."""
    z = jnp.zeros(())
    return jnp.stack([z, z, z, z, z, z, jnp.ones(()), z, z, -jnp.asarray(x_position, dtype=jnp.result_type(float))])


def tangent(coeffs: jnp.ndarray, rays: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """In-surface tangent: ray minus its normal component.

    Parity: ``tang_vector`` (AKB_raytrace_20250312.py:639-643).
    """
    N = surface_normal(coeffs, points)
    dot = jnp.sum(rays * N, axis=0)
    return normalize(rays - dot * N)


def curvature(coeffs: jnp.ndarray, rays: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Quadratic form v^T H v of the quadric Hessian along the tangent.

    Parity: ``mirr_ray_RoC`` (AKB_raytrace_20250312.py:613-624).
    """
    a, b, c, d, e, f = coeffs[0], coeffs[1], coeffs[2], coeffs[3], coeffs[4], coeffs[5]
    H = jnp.array([[2 * a, d, e], [d, 2 * b, f], [e, f, 2 * c]])
    v = tangent(coeffs, rays, points)
    return jnp.einsum("iN,ij,jN->N", v, H, v)


def rotate_points(points: jnp.ndarray, R: jnp.ndarray,
                  center: jnp.ndarray | None = None) -> jnp.ndarray:
    """Rotate point batch (3, N) by R about ``center``."""
    if center is None:
        return R @ points
    c = jnp.asarray(center).reshape(3, 1)
    return R @ (points - c) + c


def point_rotate_x(points, theta, center):
    """Parity (including the reference's sign convention, which is a
    rotation by ``-theta`` about +x): ``point_rotate_x``
    (AKB_raytrace_20250312.py:887-895)."""
    return rotate_points(points, rodrigues(jnp.array([1.0, 0.0, 0.0]), -theta),
                         jnp.asarray(center))


def point_rotate_y(points, theta, center):
    """Parity (reference rotates by ``-theta`` about +y): ``point_rotate_y``
    (AKB_raytrace_20250312.py:897-905)."""
    return rotate_points(points, rodrigues(jnp.array([0.0, 1.0, 0.0]), -theta),
                         jnp.asarray(center))


def point_rotate_z(points, theta, center):
    """Parity (reference rotates by ``-theta`` about +z): ``point_rotate_z``
    (AKB_raytrace_20250312.py:907-915)."""
    return rotate_points(points, rodrigues(jnp.array([0.0, 0.0, 1.0]), -theta),
                         jnp.asarray(center))


def rotate_vectors_yz(vectors: jnp.ndarray, theta_y, theta_z) -> jnp.ndarray:
    """Apply R_y(theta_y) @ R_z(theta_z) (z first, then y).

    Parity: ``rotate_vectors`` (AKB_raytrace_20250312.py:917-931).
    """
    Ry = rodrigues(jnp.array([0.0, 1.0, 0.0]), theta_y)
    Rz = rodrigues(jnp.array([0.0, 0.0, 1.0]), theta_z)
    return Ry @ (Rz @ vectors)


def rotate_points_about(points: jnp.ndarray, pivot: jnp.ndarray,
                        theta_y, theta_z) -> jnp.ndarray:
    """Rotate points about ``pivot`` with :func:`rotate_vectors_yz`.

    Parity: ``rotate_points`` (AKB_raytrace_20250312.py:933-943).
    """
    c = jnp.asarray(pivot).reshape(3, 1)
    return rotate_vectors_yz(points - c, theta_y, theta_z) + c


def grid_on_mirror(coeffs: jnp.ndarray, corners: jnp.ndarray,
                   n_h: int, n_v: int) -> jnp.ndarray:
    """Bilinear grid between 4 corner points, re-projected onto the quadric
    along -x.

    Parity: ``generate_grid_on_mirror_with_normal``
    (AKB_raytrace_20250312.py:557-611) — but fully vectorized (the reference
    loops per grid point).
    """
    p1, p2, p3, p4 = corners.T
    u = jnp.linspace(0.0, 1.0, n_h)
    v = jnp.linspace(0.0, 1.0, n_v)
    uu, vv = jnp.meshgrid(u, v)  # (n_v, n_h)
    w = (
        (1 - uu) * (1 - vv) * p1[:, None, None]
        + uu * (1 - vv) * p2[:, None, None]
        + uu * vv * p3[:, None, None]
        + (1 - uu) * vv * p4[:, None, None]
    ).reshape(3, -1)
    ray = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0])[:, None], w.shape)
    pts, _, _ = intersect(coeffs, ray, w)
    return pts
