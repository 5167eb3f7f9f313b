"""NA-constrained design solver (reference KB_design_NA.py as oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akbx import design_na


def oracle_residuals(theta_i1, theta_o2, x_1, x_3, na_i, na_o):
    """The reference's constraint equations, straight numpy
    (KB_design_NA.py:28-65)."""
    theta_i2 = theta_i1 - na_i
    theta_o1 = theta_o2 - na_o
    l_i1 = x_1 / np.cos(theta_i1)
    l_o2 = x_3 / np.cos(theta_o2)
    alpha = (l_o2 * np.sin((theta_i2 + theta_o2) / 2) ** 2) / (
        l_i1 * np.sin((theta_i1 + theta_o1) / 2) ** 2)
    l_i2 = (x_1 - x_3) / (np.cos(theta_i2) - alpha * np.cos(theta_o1))
    x_2 = l_i2 * np.cos(theta_i2) - x_1
    l_o1 = (x_3 + x_2) / np.cos(theta_o1)
    a = (l_i1 + l_o1) / 2
    b2 = l_i1 * l_o1 * np.sin((theta_i1 + theta_o1) / 2) ** 2
    eq1 = (l_i1 + l_o1) - (l_i2 + l_o2)
    eq2 = (x_1 + x_2 + x_3) - 2 * np.sqrt(a**2 - b2)
    return eq1, eq2


REF_CASE = dict(x_1=146.0, x_3=0.55, na_i=1e-4, na_o=0.02)


class TestSolveNAConstrained:
    def test_zeros_reference_equations(self):
        d = design_na.solve_na_constrained(**REF_CASE)
        eq1, eq2 = oracle_residuals(float(d.theta_i1), float(d.theta_o2),
                                    **REF_CASE)
        assert abs(eq1) < 1e-9
        assert abs(eq2) < 1e-9

    def test_reference_self_checks(self):
        """The reference's own 'check' prints (:121-124) must be small.

        Calibration: at the reference's scipy solution the reference
        completion formulas produce a *negative discriminant* (NaN) for
        this very case; the residual-consistent solution with stable roots
        leaves ~1e-6-relative closed-form drift, which is what the f64
        conditioning of const1/X supports."""
        d = design_na.solve_na_constrained(**REF_CASE)
        assert abs(float(d.check_a_error)) < 1e-10
        assert abs(float(d.check_na_i_error)) < 1e-7
        assert abs(float(d.check_x_3_error)) < 1e-4

    def test_geometry_consistency(self):
        d = design_na.solve_na_constrained(**REF_CASE)
        # ellipse membership: sum of focal radii == 2a for both edge rays
        np.testing.assert_allclose(float(d.l_i1 + d.l_o1), 2 * float(d.a),
                                   rtol=1e-12)
        np.testing.assert_allclose(float(d.l_i2 + d.l_o2), 2 * float(d.a),
                                   rtol=1e-10)
        # foci separation equals the axial span
        np.testing.assert_allclose(float(d.x_1 + d.x_2 + d.x_3),
                                   2 * float(d.f), rtol=1e-12)
        # requested NAs honored
        np.testing.assert_allclose(float(d.theta_o2 - d.theta_o1),
                                   REF_CASE["na_o"], rtol=1e-12)
        np.testing.assert_allclose(float(d.na_i_result), REF_CASE["na_i"],
                                   rtol=1e-4)

    def test_jits_and_differentiates(self):
        @jax.jit
        def wd(x3):
            d = design_na.solve_na_constrained(146.0, x3, 1e-4, 0.02)
            return d.l_o2

        g = jax.grad(wd)(jnp.float64(0.55))
        assert np.isfinite(float(g))
        # l_o2 ~ x_3 / cos(theta_o2): slope near 1/cos ~ 1
        assert 0.9 < float(g) < 1.2


class TestDesignHelpers:
    def test_mirror_profile_roc(self):
        from akbx import design as dsn

        ell = dsn.design_ell_v(48.6, 0.33, 0.006, 0.002)
        x, y, coeffs, roc = design_na.mirror_profile(ell)
        assert np.all(np.isfinite(np.asarray(y)))
        # RoC of a grazing-incidence ellipse mirror is large and positive
        # in the fit convention only if curvature sign matches; just check
        # the quadratic reproduces the profile well
        # the ellipse is not exactly a parabola; the fit residual is the
        # genuine higher-order figure (~1e-6 here), small vs the sag
        fit = np.polyval(np.asarray(coeffs), np.asarray(x))
        assert np.max(np.abs(fit - np.asarray(y))) < 1e-2 * np.ptp(
            np.asarray(y))
        assert np.isfinite(float(roc))

    def test_design_raytrace_focuses(self):
        from akbx import design as dsn

        ell = dsn.design_ell_v(48.6, 0.33, 0.006, 0.002)
        out = design_na.design_raytrace(ell, 2e-3, n_points=64)
        spots = np.asarray(out["spots"])
        assert spots.shape == (5, 64)
        # spot extent is minimal at the focal plane (middle)
        extents = spots.max(axis=1) - spots.min(axis=1)
        assert extents[2] == pytest.approx(extents.min())
        # the finite source image bounds the focal extent from below, so
        # only require strictly-smaller than the defocused planes
        assert extents[2] < extents[0]
        assert extents[2] < extents[-1]


class TestApertureSweep:
    @pytest.mark.slow
    def test_sweep_converges(self):
        e1, e2, x, fun = design_na.design_kb_aperture(
            48.6, 0.002, 0.002, 0.1, 0.0, target_aperture_h=0.0005,
            maxiter=8, seed=1, inner_de_maxiter=60)
        assert np.isfinite(fun)
        ap_h = float(e2.mirr_length * e2.theta_centre)
        assert abs(ap_h - 0.0005) < 2e-4
