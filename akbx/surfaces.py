"""Mirror surfaces as pytrees: exact quadric + differentiable figure error.

A :class:`Mirror` carries the quadric 10-vector, the root branch for the
intersection, a chief-ray center, a local frame, and a 2D Legendre
coefficient field describing figure (polishing) error as a height map over
the mirror footprint.  The figure error stays in the gradient path — the
capability upgrade over the reference, where mirror figure only ever appears
*post hoc* as a Legendre decomposition of the wavefront
(legendre_fit.py:45-101) and alignment is derivative-free.

Canonical constructors follow the reference's quadric setups:
ellipse/hyperbola about x with the profile in the x-z (V) or x-y (H) plane
(AKB_raytrace_20250312.py:1902-1931, 1976-2398).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from akbx.core import geometry as geo


class Mirror(NamedTuple):
    """A conic mirror. All fields are arrays => Mirror is a pytree."""

    coeffs: jnp.ndarray  # (10,)
    branch: jnp.ndarray  # scalar +1.0 / -1.0 root selection
    center: jnp.ndarray  # (3,) chief-ray center on the surface
    axes: jnp.ndarray  # (3,3) rows = local x,y,z in global frame
    fig_coeffs: jnp.ndarray  # (n_u, n_v) Legendre height coefficients [m]
    uv_center: jnp.ndarray  # (2,) local (axial, transverse) footprint center
    uv_half: jnp.ndarray  # (2,) footprint half-extents

    @property
    def has_figure_error(self) -> bool:
        return self.fig_coeffs.size > 1 or self.fig_coeffs.shape != (1, 1)


def make_mirror(coeffs, branch=+1.0, center=None, axes=None,
                fig_coeffs=None, uv_center=None, uv_half=None) -> Mirror:
    f64 = jnp.float64
    if center is None:
        center = jnp.zeros(3, dtype=f64)
    if axes is None:
        axes = jnp.eye(3, dtype=f64)
    if fig_coeffs is None:
        fig_coeffs = jnp.zeros((1, 1), dtype=f64)
    if uv_center is None:
        uv_center = jnp.zeros(2, dtype=f64)
    if uv_half is None:
        uv_half = jnp.ones(2, dtype=f64)
    return Mirror(jnp.asarray(coeffs, dtype=f64), jnp.asarray(branch, dtype=f64),
                  jnp.asarray(center, dtype=f64), jnp.asarray(axes, dtype=f64),
                  jnp.asarray(fig_coeffs, dtype=f64),
                  jnp.asarray(uv_center, dtype=f64), jnp.asarray(uv_half, dtype=f64))


def ellipse_coeffs(a, b, plane: str) -> jnp.ndarray:
    """Canonical ellipse of revolution-free conic: x^2/a^2 + w^2/b^2 = 1,
    w = z for a V mirror ('xz'), w = y for an H mirror ('xy').

    Reference: c_v/c_h blocks, AKB_raytrace_20250312.py:1902-1931, 2276-2330.
    """
    z = jnp.zeros(())
    one = jnp.ones(())
    a2 = 1.0 / jnp.asarray(a) ** 2
    b2 = 1.0 / jnp.asarray(b) ** 2
    if plane == "xz":
        return jnp.stack([a2, z, b2, z, z, z, z, z, z, -one])
    elif plane == "xy":
        return jnp.stack([a2, b2, z, z, z, z, z, z, z, -one])
    raise ValueError(plane)


def hyperbola_coeffs(a, b, plane: str) -> jnp.ndarray:
    """Canonical hyperbola: x^2/a^2 - w^2/b^2 = 1.

    Reference: coeffs_hyp_v/coeffs_hyp_h (AKB_raytrace_20250312.py:1980-1984,
    2368-2372).
    """
    z = jnp.zeros(())
    one = jnp.ones(())
    a2 = 1.0 / jnp.asarray(a) ** 2
    b2 = -1.0 / jnp.asarray(b) ** 2
    if plane == "xz":
        return jnp.stack([a2, z, b2, z, z, z, z, z, z, -one])
    elif plane == "xy":
        return jnp.stack([a2, b2, z, z, z, z, z, z, z, -one])
    raise ValueError(plane)


def _legendre_basis_1d(x: jnp.ndarray, order: int) -> jnp.ndarray:
    """P_0..P_{order-1} at x via the recurrence; returns (order, N)."""
    outs = [jnp.ones_like(x)]
    if order > 1:
        outs.append(x)
    for n in range(1, order - 1):
        outs.append(((2 * n + 1) * x * outs[n] - n * outs[n - 1]) / (n + 1))
    return jnp.stack(outs)


def figure_height(mirror: Mirror, points: jnp.ndarray) -> jnp.ndarray:
    """Legendre figure-error height [m] at surface points (3, N)."""
    local = mirror.axes @ (points - mirror.center[:, None])
    u = (local[0] - mirror.uv_center[0]) / mirror.uv_half[0]
    v = (local[1] - mirror.uv_center[1]) / mirror.uv_half[1]
    n_u, n_v = mirror.fig_coeffs.shape
    Pu = _legendre_basis_1d(u, n_u)  # (n_u, N)
    Pv = _legendre_basis_1d(v, n_v)  # (n_v, N)
    return jnp.einsum("uv,un,vn->n", mirror.fig_coeffs, Pu, Pv)


def intersect_and_reflect(mirror: Mirror, rays: jnp.ndarray, origins: jnp.ndarray):
    """One bounce: exact quadric intersection + figure-error perturbation.

    Returns (points, reflected_dirs, normals, seg_len, valid).

    The figure error h(u,v) displaces the surface along the local normal and
    tilts it by the tangential height gradient; both effects are first-order
    exact for nm-scale h and fully differentiable wrt ``fig_coeffs``:

      p' = p + h n,   n' ~ normalize(n - grad_t h)

    The segment length is measured to the displaced point, so OPL picks up
    the h (cos i + cos r) signature automatically.
    """
    pts, t, valid = geo.intersect(mirror.coeffs, rays, origins,
                                  branch=mirror.branch)
    n = geo.surface_normal(mirror.coeffs, pts)

    def with_figure(pts, n):
        # height and its tangential gradient via jvp along the two local axes
        h = figure_height(mirror, pts)
        t1 = mirror.axes[0][:, None]  # local axial direction (approx tangent)
        t2_raw = jnp.cross(n, t1, axis=0)
        t2 = geo.normalize(t2_raw)
        t1s = geo.normalize(jnp.cross(t2, n, axis=0))  # in-surface axial
        eps = 1e-7

        def h_at(p):
            return figure_height(mirror, p)

        dh1 = (h_at(pts + eps * t1s) - h_at(pts - eps * t1s)) / (2 * eps)
        dh2 = (h_at(pts + eps * t2) - h_at(pts - eps * t2)) / (2 * eps)
        pts2 = pts + h * n
        n2 = geo.normalize(n - dh1 * t1s - dh2 * t2)
        return pts2, n2

    if mirror.fig_coeffs.shape != (1, 1):
        pts, n = with_figure(pts, n)
        seg = jnp.linalg.norm(pts - origins, axis=0)
    else:
        # (1,1) coeff still contributes a constant piston height if nonzero
        piston = mirror.fig_coeffs[0, 0]
        pts = pts + piston * n
        # rays are unit, so the undisplaced segment length is just |t|;
        # the piston displacement adds h cos(i) along the ray == piston
        # times (n . d); measure to the displaced point exactly:
        seg = jnp.abs(t + piston * jnp.sum(n * rays, axis=0))

    refl = geo.reflect(rays, n, renormalize=False)
    return pts, refl, n, seg, valid


def branch_sign(negative: bool):
    return jnp.asarray(-1.0 if negative else 1.0, dtype=jnp.float64)
