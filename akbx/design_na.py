"""NA-constrained KB design (L2): solve a single ellipse from the four
optical requirements (x_1, x_3, NA_in, NA_out).

Re-derivation of the reference script ``KB_design_NA.py``: two coupled
transcendental constraints in (theta_i1, theta_o2) —

* eq1: the two edge rays lie on the *same* ellipse
  (``l_i1 + l_o1 == l_i2 + l_o2``, KB_design_NA.py:57);
* eq2: the foci separation equals the axial span
  (``x_1 + x_2 + x_3 == 2 sqrt(a^2 - b^2)``, :60);

followed by a closed-form completion of all lengths/angles (:85-117).

TPU-first design changes vs the reference:

* the reference calls ``scipy.optimize.least_squares`` with numerical
  jacobians (:79); here the 2x2 system is solved by a damped Newton
  iteration under ``lax.while_loop`` with ``jax.jacfwd`` — differentiable
  end-to-end wrt (x_1, x_3, na_i, na_o), so NA targets can sit inside an
  outer gradient loop;
* the completion quadratics use the stable q-form root
  (``core.geometry.solve_quadratic``) instead of the reference's naive
  ``(-B + sqrt(B^2-4AC))/(2A)`` (:101, :113) which cancels at grazing
  incidence.

The residual "check" prints of the reference (:121-124) are returned as
fields so tests can assert them.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from akbx.core import geometry as geo
from akbx.core import trig as tg


def _residuals(theta, x_1, x_3, na_i, na_o):
    """The two ellipse-consistency constraints (KB_design_NA.py:28-65)."""
    theta_i1, theta_o2 = theta[0], theta[1]
    theta_i2 = theta_i1 - na_i
    theta_o1 = theta_o2 - na_o

    l_i1 = x_1 / tg.cos(theta_i1)
    l_o2 = x_3 / tg.cos(theta_o2)

    alpha = (l_o2 * tg.sin((theta_i2 + theta_o2) / 2) ** 2) / (
        l_i1 * tg.sin((theta_i1 + theta_o1) / 2) ** 2)
    l_i2 = (x_1 - x_3) / (tg.cos(theta_i2) - alpha * tg.cos(theta_o1))
    x_2 = l_i2 * tg.cos(theta_i2) - x_1
    l_o1 = (x_3 + x_2) / tg.cos(theta_o1)

    a = (l_i1 + l_o1) / 2
    b2 = l_i1 * l_o1 * tg.sin((theta_i1 + theta_o1) / 2) ** 2

    eq1 = (l_i1 + l_o1) - (l_i2 + l_o2)
    eq2 = (x_1 + x_2 + x_3) - 2 * jnp.sqrt(a**2 - b2)
    return jnp.stack([eq1, eq2])


@dataclasses.dataclass
class NADesign:
    """Solved NA-constrained ellipse (field names follow the reference)."""

    theta_i1: jnp.ndarray
    theta_i2: jnp.ndarray
    theta_o1: jnp.ndarray
    theta_o2: jnp.ndarray
    x_1: jnp.ndarray
    x_2: jnp.ndarray
    x_3: jnp.ndarray
    l_i1: jnp.ndarray
    l_i2: jnp.ndarray
    l_o1: jnp.ndarray
    l_o2: jnp.ndarray
    a: jnp.ndarray
    b2: jnp.ndarray
    f: jnp.ndarray
    na_i_result: jnp.ndarray
    na_o: jnp.ndarray
    # residual checks (the reference's "check" prints, :121-124)
    check_a_error: jnp.ndarray
    check_na_i_error: jnp.ndarray
    check_x_3_error: jnp.ndarray
    residuals: jnp.ndarray
    iterations: jnp.ndarray


def _solve_theta(x_1, x_3, na_i, na_o, tol, max_iter):
    """Damped Newton on the 2x2 system, jit-compatible."""

    def res(theta):
        return _residuals(theta, x_1, x_3, na_i, na_o)

    jac = jax.jacfwd(res)
    theta0 = jnp.stack([4.0 * na_i, 4.0 * na_o])  # reference's guess (:68)

    def cond(state):
        theta, it, r = state
        return (jnp.max(jnp.abs(r)) > tol) & (it < max_iter)

    def body(state):
        theta, it, r = state
        J = jac(theta)
        step = jnp.linalg.solve(J, r)
        # damp: never step past positivity of the angles
        scale = jnp.minimum(1.0, 0.5 * jnp.min(jnp.abs(theta) /
                                               (jnp.abs(step) + 1e-300)))
        theta_new = theta - scale * step
        return theta_new, it + 1, res(theta_new)

    theta, it, r = jax.lax.while_loop(cond, body, (theta0, 0, res(theta0)))
    return theta, it, r


def solve_na_constrained(x_1, x_3, na_i, na_o, tol: float = 1e-14,
                         max_iter: int = 100) -> NADesign:
    """Solve the NA-constrained ellipse design.

    Inputs mirror the reference's module globals (KB_design_NA.py:22-25):
    source-to-edge axial distance ``x_1``, working axial distance ``x_3``,
    input/output numerical apertures.
    """
    x_1 = jnp.asarray(x_1, dtype=jnp.float64)
    x_3 = jnp.asarray(x_3, dtype=jnp.float64)
    na_i = jnp.asarray(na_i, dtype=jnp.float64)
    na_o = jnp.asarray(na_o, dtype=jnp.float64)

    theta, it, r = _solve_theta(x_1, x_3, na_i, na_o, tol, max_iter)

    # Implicit-function-theorem gradients: the while_loop itself is not
    # reverse-differentiable, so cut it out of the graph and append one
    # Newton correction evaluated at the converged point.  Primal value is
    # unchanged (residual ~0); the correction term carries
    # d theta / d params = -J_theta^{-1} dF/d params.
    theta_star = jax.lax.stop_gradient(theta)
    F = _residuals(theta_star, x_1, x_3, na_i, na_o)
    J = jax.lax.stop_gradient(
        jax.jacfwd(lambda t: _residuals(t, x_1, x_3, na_i, na_o))(theta_star))
    theta = theta_star - jnp.linalg.solve(J, F)
    theta_i1, theta_o2 = theta[0], theta[1]

    # closed-form completion (:85-117), stable roots
    theta_o1 = theta_o2 - na_o
    t_sum = theta_i1 + theta_o1
    const1 = x_1 * tg.sin(t_sum / 2) ** 2 / (tg.cos(theta_i1) * tg.cos(theta_o1))

    A = 1.0 / tg.cos(theta_o1) ** 2 - 1.0
    B = 4.0 * (x_1 / (2 * tg.cos(theta_o1) * tg.cos(theta_i1)) - x_1 / 2 - const1)
    C = x_1**2 * (1.0 / tg.cos(theta_i1) ** 2 - 1.0)
    X, _, _ = geo.solve_quadratic(A, B, C)  # X = x_2 + x_3, '+' root (:101)

    b2 = X * const1
    f = (x_1 + X) / 2
    a = jnp.sqrt(f**2 + b2)

    l_i1 = x_1 / tg.cos(theta_i1)
    l_o1 = 2 * a - l_i1

    A2 = 1.0 / a**2 + tg.tan(theta_o2) ** 2 / b2
    B2 = -2.0 * f / a**2
    C2 = f**2 / a**2 - 1.0
    x_3_result, _, _ = geo.solve_quadratic(A2, B2, C2)  # '+' root (:113)
    x_2 = X - x_3_result
    theta_i2 = tg.arctan(x_3_result * tg.tan(theta_o2) / (x_1 + x_2))
    l_i2 = (x_1 + x_2) / tg.cos(theta_i2)
    l_o2 = x_3_result / tg.cos(theta_o2)
    na_i_result = theta_i1 - theta_i2

    return NADesign(
        theta_i1=theta_i1, theta_i2=theta_i2, theta_o1=theta_o1,
        theta_o2=theta_o2, x_1=x_1, x_2=x_2, x_3=x_3_result,
        l_i1=l_i1, l_i2=l_i2, l_o1=l_o1, l_o2=l_o2, a=a, b2=b2, f=f,
        na_i_result=na_i_result, na_o=na_o,
        check_a_error=a - (l_i2 + l_o2) / 2,
        check_na_i_error=na_i_result - na_i,
        check_x_3_error=x_3_result - x_3,
        residuals=r, iterations=it)


def design_kb_aperture(l_i1, na_o_sin_v, na_o_sin_h, target_gap, ast,
                       target_aperture_h,
                       bounds=((0.2, 0.4), (0.1, 0.26), (0.03, 0.05)),
                       focus_gap_max: float = 1e-3, m1_min: float = 1000.0,
                       theta_g_max: float = 0.28, seed: int | None = 0,
                       maxiter: int = 100, inner_de_maxiter: int = 200):
    """Aperture-targeted KB design sweep.

    Differential evolution over (l_o1, theta_g1, target_l_o2) minimizing the
    H-mirror aperture error under the reference's feasibility penalties:
    focus gap <= 1e-3, magnification >= 1000, grazing angles <= 0.28 rad
    (KB_design_NAbased.py:344-413).  Design-time host-side search; outputs
    are plain floats feeding the jitted trace.
    Returns (ell_v, ell_h, result_x, result_fun).
    """
    import numpy as np
    from scipy.optimize import differential_evolution

    from akbx import design as dsn

    def build(params):
        l_o1, theta_g1, target_l_o2 = params
        e1 = dsn.design_ell_v(l_i1, l_o1, theta_g1, na_o_sin_v)
        return dsn.design_ell_h(e1, target_l_o2, target_gap, ast,
                                na_o_sin_h, seed=seed,
                                de_maxiter=inner_de_maxiter)

    def objective(params):
        try:
            e1, e2 = build(params)
        except (FloatingPointError, ValueError):
            return np.inf
        if float(e1.f - e2.f) > focus_gap_max:
            return np.inf
        if float(e1.m1) < m1_min:
            return np.inf
        tg1 = max(float((e1.theta_i1 + e1.theta_o1) / 2),
                  float((e1.theta_i2 + e1.theta_o2) / 2))
        tg2 = max(float((e2.theta_i1 + e2.theta_o1) / 2),
                  float((e2.theta_i2 + e2.theta_o2) / 2))
        if tg1 > theta_g_max or tg2 > theta_g_max:
            return np.inf
        err = float(e2.mirr_length * e2.theta_centre) - target_aperture_h
        return abs(err) if np.isfinite(err) else np.inf

    result = differential_evolution(
        objective, list(bounds), strategy="best1bin", maxiter=maxiter,
        popsize=15, tol=1e-4, mutation=(0.5, 1), recombination=0.7,
        seed=seed, polish=True)
    e1, e2 = build(result.x)
    return e1, e2, result.x, result.fun


def mirror_profile(ell, n_points: int = 100):
    """Mirror height profile + quadratic fit (radius of curvature).

    Parity: ``Ell.calc_mirror`` (KB_design_NAbased.py:53-63) minus the
    plotting: returns (x, y, poly_coeffs, roc_m).
    """
    x = jnp.linspace(ell.x_1, ell.x_1 + ell.x_2, n_points)
    y = ell.b * jnp.sqrt(1 - ((x - ell.f) / ell.a) ** 2)
    coeffs = jnp.polyfit(x, y, 2)
    roc = 1.0 / (2.0 * coeffs[0])
    return x, y, coeffs, roc


def design_raytrace(ell, size, n_points: int = 100, n_planes: int = 5):
    """2D design-check trace of an :class:`akbx.design.EllipseNA`.

    Parity: ``Ell.raytrace`` (KB_design_NAbased.py:64-108) without the
    plotting: a finite source of half-extent ``size/2`` reflects off the
    analytic profile; spot y-offsets are evaluated on ``n_planes`` planes
    around the nominal focus (spacing ``1e-5/na_o``).
    Returns dict with x, y, incident/reflected unit vectors, and
    (n_planes, n_points) spot offsets.
    """
    source = jnp.hstack([jnp.linspace(-size / 2, size / 2, n_points // 2),
                         -jnp.linspace(-size / 2, size / 2, n_points // 2)])
    th = (ell.theta_i1 + ell.theta_i2) / 2
    s, c = tg.sin(th), tg.cos(th)
    x = jnp.linspace(ell.x_1, ell.x_1 + ell.x_2, n_points)
    y = ell.b * jnp.sqrt(1 - ((x - ell.f) / ell.a) ** 2)
    dydx = -ell.b * (x - ell.f) / (ell.a**2 * jnp.sqrt(
        1 - ((x - ell.f) / ell.a) ** 2))
    nvec = jnp.vstack([jnp.ones(n_points), -1.0 / dydx])
    nvec = nvec / jnp.linalg.norm(nvec, axis=0)
    ivec = jnp.vstack([x - source * s, y - source * c])
    dot_in = jnp.sum(ivec * nvec, axis=0)
    rvec = ivec - 2 * nvec * dot_in
    rvec = rvec / jnp.linalg.norm(rvec, axis=0)

    planes = 2 * ell.f + (jnp.arange(n_planes) - n_planes // 2) * (
        1e-5 / ell.na_o)
    spots = y[None, :] + (planes[:, None] - x[None, :]) / rvec[0] * rvec[1]
    return {"x": x, "y": y, "ivec": ivec, "rvec": rvec,
            "planes": planes, "spots": spots}
