"""Analytic optical design (L2): ellipse / hyperbola / KB / AKB parameters.

Pure-jnp re-derivations of the reference design layer:

* ``ell_define`` / ``kb_define``  — reference ``Ell_define``/``KB_define``
  (AKB_raytrace_20250312.py:272-336, EllipseRaytrace3D.py:5-16,167-206).
  The KB focal-coincidence fixed-point loop becomes ``lax.while_loop``.
* ``EllipseNA``                   — reference ``Ell`` class
  (KB_design_NAbased.py:6-166): closed-form ellipse from
  (l_i1, l_o1, theta_g1, NA_out).
* ``design_ell_v`` / ``design_ell_h`` / ``design_kb`` — reference
  ``ELL_V_design``/``ELL_H_design``/``KB_design`` (KB_design_NAbased.py:167-233).
  The H-mirror match uses scipy differential evolution at design time (design
  is tiny and host-side; the *outputs* are plain floats feeding jitted traces).
* ``wolter_iii_angles`` / ``wolter_i_angles`` — the reference's in-engine
  Wolter III / Wolter I layout solvers (``print_optical_design`` /
  ``print_optical_design_wolter1``, AKB_raytrace_20250312.py:1996-2043).

All functions are differentiable wrt their float arguments (except the DE
searches, which are derivative-free by nature).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from akbx.core import trig as tg


def ell_define(l1, inc, l2):
    """Ellipse from source distance l1, grazing angle inc, focus distance l2.

    Returns (a, b, theta1, theta3): semi-major, semi-minor, source-side and
    focus-side polar angles of the mirror center.
    Parity: ``Ell_define`` (AKB_raytrace_20250312.py:272-281).
    """
    theta1 = tg.arctan(l2 * tg.sin(2.0 * inc) / (l1 + l2 * tg.cos(2.0 * inc)))
    a = (l1 + l2) / 2.0
    b = jnp.sqrt(l1 * l2 * tg.sin(inc) ** 2)
    theta3 = tg.arcsin(l1 * tg.sin(theta1) / l2)
    return a, b, theta1, theta3


def ellipse_y(a, b, x):
    """y on the ellipse at axial position x (focus frame at source).

    Parity: ``calcEll_Yvalue`` (AKB_raytrace_20250312.py:283-284).
    """
    return jnp.sqrt(b**2 - (b * (x - jnp.sqrt(a**2 - b**2)) / a) ** 2)


def hyperbola_y(a, b, x):
    """Parity: ``calc_Y_hyp`` (AKB_raytrace_20250312.py:946-948)."""
    return jnp.sqrt(-(b**2) + (b * (x - jnp.sqrt(a**2 + b**2)) / a) ** 2)


def calc_na(a, b, theta1, l1, mirror_length):
    """NA subtended by a mirror of given length centered at polar angle theta1.

    Parity: ``calcNA`` (AKB_raytrace_20250312.py:286-295).
    """
    s2f = jnp.sqrt(a**2 - b**2) * 2.0
    xs = l1 * tg.cos(theta1) - mirror_length / 2.0
    xe = l1 * tg.cos(theta1) + mirror_length / 2.0
    ys = ellipse_y(a, b, xs)
    ye = ellipse_y(a, b, xe)
    return tg.sin(jnp.abs(tg.arctan(ye / (s2f - xe)) - tg.arctan(ys / (s2f - xs)))) / 2.0


@dataclasses.dataclass
class KBDesign:
    """Output of :func:`kb_define` (field names follow the reference tuple)."""

    a_h: jnp.ndarray
    b_h: jnp.ndarray
    a_v: jnp.ndarray
    b_v: jnp.ndarray
    l1v: jnp.ndarray
    l2v: jnp.ndarray
    xh_s: jnp.ndarray
    xh_e: jnp.ndarray
    yh_s: jnp.ndarray
    yh_e: jnp.ndarray
    theta1_h: jnp.ndarray
    theta3_h: jnp.ndarray
    accept_h: jnp.ndarray
    na_h: jnp.ndarray
    xv_s: jnp.ndarray
    xv_e: jnp.ndarray
    yv_s: jnp.ndarray
    yv_e: jnp.ndarray
    theta1_v: jnp.ndarray
    theta3_v: jnp.ndarray
    accept_v: jnp.ndarray
    na_v: jnp.ndarray
    s2f_h: jnp.ndarray
    gap: jnp.ndarray


def kb_define(l1h, l2h, inc_h, mlen_h, wd_v, inc_v, mlen_v, gapf=0.0,
              tol=1e-9, max_iter=200) -> KBDesign:
    """KB pair with the focal-coincidence fixed point as ``lax.while_loop``.

    The reference iterates ``l1v += 0.9 * (s2f_h - s2f_v - gapf)`` until the
    two source-focus distances coincide to 1e-9 m
    (``KB_define``, AKB_raytrace_20250312.py:297-336 and the ``gapf`` variant
    EllipseRaytrace3D.py:167-206).  Differentiable via implicit unrolling of
    the converged loop (while_loop grads are fine here since iteration count
    is small; for exact implicit grads see ``kb_define_implicit``).
    """
    a_h, b_h, t1h, t3h = ell_define(l1h, inc_h, l2h)
    s2f_h = jnp.sqrt(a_h**2 - b_h**2) * 2.0
    xh_s = l1h * tg.cos(t1h) - mlen_h / 2.0
    xh_e = l1h * tg.cos(t1h) + mlen_h / 2.0
    yh_s = ellipse_y(a_h, b_h, xh_s)
    yh_e = ellipse_y(a_h, b_h, xh_e)
    accept_h = jnp.abs(yh_e - yh_s)
    na_h = tg.sin(jnp.abs(tg.arctan(yh_e / (s2f_h - xh_e))
                           - tg.arctan(yh_s / (s2f_h - xh_s)))) / 2.0

    l2v = wd_v + mlen_v / 2.0
    l1v0 = l1h + (l2h - wd_v - mlen_v / 2.0) - gapf

    def s2f_v_of(l1v):
        a_v, b_v, _, _ = ell_define(l1v, inc_v, l2v)
        return jnp.sqrt(a_v**2 - b_v**2) * 2.0

    def cond(state):
        l1v, it = state
        return (jnp.abs(s2f_h - s2f_v_of(l1v) - gapf) >= tol) & (it < max_iter)

    def body(state):
        l1v, it = state
        return l1v + (s2f_h - s2f_v_of(l1v) - gapf) * 0.9, it + 1

    l1v, _ = jax.lax.while_loop(cond, body, (jnp.asarray(l1v0, dtype=jnp.float64), 0))

    a_v, b_v, t1v, t3v = ell_define(l1v, inc_v, l2v)
    s2f_v = jnp.sqrt(a_v**2 - b_v**2) * 2.0
    xv_s = l1v * tg.cos(t1v) - mlen_v / 2.0
    xv_e = l1v * tg.cos(t1v) + mlen_v / 2.0
    yv_s = ellipse_y(a_v, b_v, xv_s)
    yv_e = ellipse_y(a_v, b_v, xv_e)
    accept_v = jnp.abs(yv_e - yv_s)
    na_v = tg.sin(jnp.abs(tg.arctan(yv_e / (s2f_v - xv_e))
                           - tg.arctan(yv_s / (s2f_v - xv_s)))) / 2.0
    gap = xv_s - xh_e

    return KBDesign(a_h, b_h, a_v, b_v, l1v, l2v, xh_s, xh_e, yh_s, yh_e,
                    t1h, t3h, accept_h, na_h, xv_s, xv_e, yv_s, yv_e,
                    t1v, t3v, accept_v, na_v, s2f_h, gap)


class EllipseNA:
    """Closed-form ellipse from (l_i1, l_o1, theta_g1, NA_out).

    Parity: the ``Ell`` class of KB_design_NAbased.py:6-166, attribute for
    attribute (same names where sensible).  Solves the arccos-root quadratic
    for theta_i1, then walks the mirror edges/centers analytically.
    """

    def __init__(self, l_i1, l_o1, theta_g1, na_o, allcalc: bool = True):
        self.l_i1 = l_i1 = jnp.asarray(l_i1, dtype=jnp.float64)
        self.l_o1 = l_o1 = jnp.asarray(l_o1, dtype=jnp.float64)
        self.theta_g1 = theta_g1 = jnp.asarray(theta_g1, dtype=jnp.float64)
        self.na_o = na_o = jnp.asarray(na_o, dtype=jnp.float64)

        a = (l_i1 + l_o1) / 2.0
        b2 = l_i1 * l_o1 * tg.sin(theta_g1) ** 2
        f = jnp.sqrt(a**2 - b2)
        self.a, self.b2, self.f = a, b2, f

        # cos(theta_i1) from the ellipse membership of the input-side edge.
        # The reference computes (-B - sqrt(D))/(2A) naively
        # (KB_design_NAbased.py:114-118), losing ~8 digits at grazing
        # incidence; we use the stable q-form (geometry.solve_quadratic).
        from akbx.core import geometry as _geo

        A = l_i1**2 * (1.0 / a**2 - 1.0 / b2)
        B = -2.0 * l_i1 * f / a**2
        C = f**2 / a**2 + l_i1**2 / b2 - 1.0
        _, t, _ = _geo.solve_quadratic(A, B, C)
        self.theta_i1 = tg.arccos(t)
        self.x_1 = l_i1 * tg.cos(self.theta_i1)
        self.theta_o1 = 2 * theta_g1 - self.theta_i1
        self.theta_o2 = self.theta_o1 + na_o
        # Output-side edge radius from the polar-angle quadratic
        # (KB_design_NAbased.py:122-125), stable form.
        A2 = tg.cos(self.theta_o2) ** 2 / a**2 + tg.sin(self.theta_o2) ** 2 / b2
        B2 = -2.0 * f * tg.cos(self.theta_o2) / a**2
        C2 = f**2 / a**2 - 1.0
        self.l_o2, _, _ = _geo.solve_quadratic(A2, B2, C2)

        if allcalc:
            self.b = jnp.sqrt(b2)
            self.l_i2 = 2 * a - self.l_o2
            self.x_3 = self.l_o2 * tg.cos(self.theta_o2)
            self.x_2 = l_o1 * tg.cos(self.theta_o1) - self.x_3
            self.theta_i2 = tg.arccos((self.x_1 + self.x_2) / self.l_i2)
            self.m1 = tg.tan(self.theta_o1) / tg.tan(self.theta_i1)
            self.m2 = tg.tan(self.theta_o2) / tg.tan(self.theta_i2)
            self.y_1 = l_i1 * tg.sin(self.theta_i1)
            self.y_2 = self.l_o2 * tg.sin(self.theta_o2)
            self.edge = self.x_1 + self.x_2
            self.omega_default = (self.theta_i1 + self.theta_o1
                                  + self.theta_i2 + self.theta_o2) / 2
            # mirror center by width
            self.x_cnt_m_wid = self.x_1 + self.x_2 / 2
            self.y_cnt_m_wid = jnp.sqrt(b2 * (1 - ((self.x_cnt_m_wid - f) / a) ** 2))
            self.theta_i_cnt_m_wid = tg.arctan(self.y_cnt_m_wid / self.x_cnt_m_wid)
            self.theta_o_cnt_m_wid = tg.arctan(self.y_cnt_m_wid / (2 * f - self.x_cnt_m_wid))
            self.omega_cnt_m_wid = self.theta_i_cnt_m_wid + self.theta_o_cnt_m_wid
            # output-angle center
            self.theta_o_cnt_o_angle = (self.theta_o1 + self.theta_o2) / 2
            A3 = (tg.cos(self.theta_o_cnt_o_angle) ** 2 / a**2
                  + tg.sin(self.theta_o_cnt_o_angle) ** 2 / b2)
            B3 = -2 * f * tg.cos(self.theta_o_cnt_o_angle) / a**2
            C3 = f**2 / a**2 - 1.0
            self.l_o_cnt_o_angle, _, _ = _geo.solve_quadratic(A3, B3, C3)
            self.x_cent_o_angle = 2 * f - self.l_o_cnt_o_angle * tg.cos(self.theta_o_cnt_o_angle)
            self.y_cent_o_angle = self.l_o_cnt_o_angle * tg.sin(self.theta_o_cnt_o_angle)
            self.l_i_cnt_o_angle = 2 * a - self.l_o_cnt_o_angle
            self.theta_i_cnt_o_angle = tg.arccos(self.x_cent_o_angle / self.l_i_cnt_o_angle)
            self.omega_cnt_o_angle = self.theta_i_cnt_o_angle + self.theta_o_cnt_o_angle
            self.theta_i_cnt_angle = (self.theta_i1 + self.theta_i2) / 2
            # mirror-center aperture parameters
            self.x_centre = self.x_1 + self.x_2 / 2
            self.y_centre = jnp.sqrt(b2 * (1 - ((self.x_centre - f) / a) ** 2))
            self.p_centre = jnp.sqrt(self.x_centre**2 + self.y_centre**2)
            self.q_centre = 2 * a - self.p_centre
            self.theta_centre = tg.arcsin(jnp.sqrt(b2 / (self.p_centre * self.q_centre)))
            self.mirr_length = self.x_2

    @property
    def aperture(self):
        return self.mirr_length * self.theta_centre


def design_ell_v(l_i1, l_o1, theta_g1, na_o_sin) -> EllipseNA:
    """Parity: ``ELL_V_design`` (KB_design_NAbased.py:167-170)."""
    na_o = np.float64(np.arcsin(na_o_sin) * 2)
    return EllipseNA(l_i1, l_o1, theta_g1, na_o)


def _ell_quick_np(l_i1, l_o1, theta_g1, na_o):
    """(l_o2, x_1, f) of the NA-based ellipse in pure numpy with stable
    roots — the fast path for host-side DE objectives (a jnp ``EllipseNA``
    costs ~ms of dispatch per eval; DE makes 1e4-1e5 evals)."""
    a = (l_i1 + l_o1) / 2.0
    b2 = l_i1 * l_o1 * np.sin(theta_g1) ** 2
    f2 = a * a - b2
    if f2 <= 0:
        raise FloatingPointError("degenerate ellipse")
    f = np.sqrt(f2)

    def stable_roots(A, B, C):
        D = B * B - 4 * A * C
        if D <= 0 or A == 0:
            raise FloatingPointError("no real root")
        q = -0.5 * (B + np.copysign(np.sqrt(D), B))
        r1, r2 = q / A, C / q
        return (r2, r1) if B >= 0 else (r1, r2)  # (plus, minus)

    A = l_i1**2 * (1.0 / a**2 - 1.0 / b2)
    B = -2.0 * l_i1 * f / a**2
    C = f**2 / a**2 + l_i1**2 / b2 - 1.0
    _, t = stable_roots(A, B, C)
    if not -1.0 <= t <= 1.0:
        raise FloatingPointError("cos(theta_i1) out of range")
    theta_i1 = np.arccos(t)
    x_1 = l_i1 * t
    theta_o1 = 2 * theta_g1 - theta_i1
    theta_o2 = theta_o1 + na_o
    A2 = np.cos(theta_o2) ** 2 / a**2 + np.sin(theta_o2) ** 2 / b2
    B2 = -2.0 * f * np.cos(theta_o2) / a**2
    C2 = f**2 / a**2 - 1.0
    l_o2, _ = stable_roots(A2, B2, C2)
    return l_o2, x_1, f


def design_ell_h(ell1: EllipseNA, target_l_o2, target_gap, ast, na_o_sin_h,
                 seed: int | None = 0, de_maxiter: int = 10000):
    """H-mirror matched to the V mirror by differential evolution.

    Objective: match working distance (l_o2), gap-consistent x_1, and focus
    position.  Parity: ``ELL_H_design`` (KB_design_NAbased.py:171-225).
    """
    from scipy.optimize import differential_evolution

    target_x_1 = float(ell1.edge + target_gap)
    target_f = float(ell1.f + ast)
    l_i1 = float(ell1.l_i2 + target_gap)
    theta_g1 = float(ell1.theta_g1 / 3)
    na_o = np.float64(np.arcsin(na_o_sin_h) * 2)

    def objective(params):
        li, lo, tgz = params
        try:
            l_o2, x_1, f = _ell_quick_np(li, lo, tgz, na_o)
            err_l_o2 = l_o2 - float(target_l_o2)
            err_x_1 = x_1 - target_x_1
            err_f = f - target_f
        except (FloatingPointError, ValueError):
            return np.inf
        val = np.sqrt((err_l_o2 / float(target_l_o2)) ** 2
                      + (err_f / target_f) ** 2
                      + (err_x_1 / target_x_1) ** 2)
        return val if np.isfinite(val) else np.inf

    bounds = [(l_i1 - 1, l_i1 + 1), (0.001, 2), (1e-9, np.pi / 4)]
    result = differential_evolution(
        objective, bounds, strategy="best1bin", maxiter=de_maxiter, popsize=15,
        tol=1e-6, mutation=(0.5, 1), recombination=0.7, seed=seed, polish=True,
        init="sobol", x0=[l_i1, float(ell1.l_o2), theta_g1])
    _, opt_l_o1, opt_theta_g1 = result.x
    ell2 = EllipseNA(l_i1, opt_l_o1, opt_theta_g1, na_o)
    return ell1, ell2


def design_kb(l_i1, l_o1, theta_g1, na_o_sin_v, na_o_sin_h,
              target_l_o2, target_gap, ast, seed: int | None = 0):
    """Full KB design. Parity: ``KB_design`` (KB_design_NAbased.py:226-233)."""
    ell1 = design_ell_v(l_i1, l_o1, theta_g1, na_o_sin_v)
    return design_ell_h(ell1, target_l_o2, target_gap, ast, na_o_sin_h, seed=seed)


def wolter_iii_angles(a_hyp, b_hyp, org_hyp, a_ell, b_ell, org_ell, theta1):
    """Layout angles/lengths of a Wolter III (hyperbola-then-ellipse) pair.

    Parity: the in-engine ``print_optical_design``
    (AKB_raytrace_20250312.py:1996-2023).
    Returns (theta2, theta3, theta4, theta5, l1, l2, l3, l4).
    """
    l2 = (4 * a_hyp**2 + (org_hyp * 2) ** 2
          - 4 * a_hyp * (org_hyp * 2) * tg.cos(theta1)) / (4 * org_hyp - 4 * a_hyp)
    l1 = 2 * a_hyp + l2
    theta2 = tg.arcsin(org_hyp * 2 * tg.sin(theta1) / l2) / 2
    theta3 = tg.arcsin(l1 * tg.sin(theta1) / l2)
    l4 = ((org_ell**2 - 2 * org_ell * a_ell * tg.cos(theta3) + a_ell**2)
          / (a_ell - org_ell * tg.cos(theta3)))
    l3 = 2 * a_ell - l2 - l4
    theta5 = tg.arcsin((2 * a_ell - l4) * tg.sin(theta3) / l4)
    theta4 = tg.arcsin(2 * org_ell * tg.sin(theta3) / l4) / 2
    return theta2, theta3, theta4, theta5, l1, l2, l3, l4


def wolter_i_angles(a_hyp, b_hyp, org_hyp, a_ell, b_ell, org_ell, theta1):
    """Layout angles/lengths of a Wolter I (ellipse-then-hyperbola) pair.

    Parity: ``print_optical_design_wolter1``
    (AKB_raytrace_20250312.py:2026-2043).
    """
    l1 = b_ell**2 / (a_ell - org_ell * tg.cos(theta1))
    l2 = 2 * a_ell - l1
    theta2 = tg.arcsin(jnp.sqrt(b_ell**2 / (l1 * l2)))
    theta3 = 2 * theta2 - theta1
    l3 = b_hyp**2 / (org_hyp * tg.cos(theta3) - a_hyp)
    l4 = l3 - 2 * a_hyp
    theta4 = tg.arcsin(jnp.sqrt(b_hyp**2 / (l3 * l4)))
    theta5 = 2 * theta4 + theta3
    return theta2, theta3, theta4, theta5, l1, l2, l3, l4


class KBDesignManager:
    """Lazy, memoised KB design with a ``ParamsDesign.txt`` audit trail.

    Parity: ``KBDesignManager`` / module-level ``kb_manager`` singleton
    (AKB_raytrace_20250312.py:9695-9741): holds the 7 design inputs, runs
    the (expensive, DE-based) :func:`design_kb` at most once per input set,
    and writes the inputs to ``ParamsDesign.txt`` whenever a solve happens
    so every run directory records the design it traced.

    Unlike the reference's singleton, the cache is keyed on the inputs, so
    ``set_design`` with the same values never recomputes and changing any
    value invalidates cleanly (the reference silently kept the stale pair).
    """

    def __init__(self, params_path: str | None = "ParamsDesign.txt",
                 seed: int | None = 0):
        self.params_path = params_path
        self.seed = seed
        self._key = None
        self._pair: tuple[EllipseNA, EllipseNA] | None = None

    def set_design(self, l_i1, l_o1, theta_g1, na_o_sin, target_l_o2,
                   target_gap, ast, na_o_sin_h=None):
        key = tuple(float(v) for v in
                    (l_i1, l_o1, theta_g1, na_o_sin,
                     na_o_sin if na_o_sin_h is None else na_o_sin_h,
                     target_l_o2, target_gap, ast))
        if key != self._key:
            self._key = key
            self._pair = None

    def get_design(self) -> tuple[EllipseNA, EllipseNA]:
        if self._key is None:
            raise RuntimeError("set_design() before get_design()")
        if self._pair is None:
            (l_i1, l_o1, theta_g1, na_v, na_h,
             target_l_o2, target_gap, ast) = self._key
            if self.params_path:
                with open(self.params_path, "w") as f:
                    f.write(f"l_i1 = {l_i1}\n")
                    f.write(f"l_o1 = {l_o1}\n")
                    f.write(f"theta_g1 = {theta_g1}\n")
                    f.write(f"na_o_sin = {na_v}\n")
                    f.write(f"target_l_o2 = {target_l_o2}\n")
                    f.write(f"target_gap = {target_gap}\n")
                    f.write(f"ast = {ast}\n")
            self._pair = design_kb(l_i1, l_o1, theta_g1, na_v, na_h,
                                   target_l_o2, target_gap, ast,
                                   seed=self.seed)
        return self._pair


kb_manager = KBDesignManager()
