"""Parity vs the reference's mpmath-native Wolter III+I engine, and direct
unit tests of the double-f64 placement layer (:mod:`akbx.core.quadric_df`).

The oracle is ``AKB_raytrace_III_I_20250710.py`` — the reference's cleaned
III+I engine traced end-to-end in 20-digit mpmath (:15-16, Setting12/11
constants :952-1000) — the highest-precision trace the reference provides.
These are the measurements the ``quadric_df`` docstring cites (VERDICT r2
missing #3): the f64 angle-chain cancellation, the DF chain's recovery of
it, and full-engine detcenter/OPL parity in bit-compat mode.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from akbx import design, trace
from akbx.core import geometry as geo
from akbx.core import quadric_df as qdf
from akbx.core.precision import DF
from akbx.systems import AlignParams, WOLTER_3_1_DEFAULT, build_wolter_3_1

from conftest import reference_available

mpmath = pytest.importorskip("mpmath")
mp, mpf = mpmath.mp, mpmath.mpf

S = WOLTER_3_1_DEFAULT  # == the III_I engine's Setting12 + setting11


def _mp_wolter_iii_angles(a_hyp, b_hyp, a_ell, b_ell, theta1, dps=40):
    """The Wolter III angle chain (reference ``print_optical_design``,
    AKB_raytrace_III_I_20250710.py:1117-1139) evaluated at ``dps`` digits,
    with the conic origins recomputed from (a, b) exactly as
    ``wolter_iii_angles_df`` does."""
    old = mp.dps
    try:
        mp.dps = dps
        a_h, b_h = mpf(float(a_hyp)), mpf(float(b_hyp))
        a_e, b_e = mpf(float(a_ell)), mpf(float(b_ell))
        th1 = mpf(float(theta1))
        org_h = mpmath.sqrt(a_h**2 + b_h**2)
        org_e = mpmath.sqrt(a_e**2 - b_e**2)
        l2 = (a_h**2 + org_h**2 - 2 * a_h * org_h * mpmath.cos(th1)) / (org_h - a_h)
        l1 = 2 * a_h + l2
        theta2 = mpmath.asin(2 * org_h * mpmath.sin(th1) / l2) / 2
        theta3 = mpmath.asin(l1 * mpmath.sin(th1) / l2)
        l4 = ((org_e**2 - 2 * org_e * a_e * mpmath.cos(theta3) + a_e**2)
              / (a_e - org_e * mpmath.cos(theta3)))
        theta5 = mpmath.asin((2 * a_e - l4) * mpmath.sin(theta3) / l4)
        theta4 = mpmath.asin(2 * org_e * mpmath.sin(theta3) / l4) / 2
        return [float(x) for x in (theta2, theta3, theta4, theta5)], \
               (theta2, theta3, theta4, theta5)
    finally:
        mp.dps = old


def _df_float(x: DF) -> float:
    return float(x.hi) + float(x.lo)


class TestWolterIIIAnglesDF:
    """The ``a^2 + org^2 - 2 a org cos(theta)`` numerators cancel ~8
    digits on 73 m conics; this is the measured error budget behind
    ``build_wolter_3_1(precise=True)``."""

    def test_df_matches_mpmath_40_digits(self):
        _, mp_exact = _mp_wolter_iii_angles(
            S.a_hyp_v, S.b_hyp_v, S.a_ell_v, S.b_ell_v, S.theta1_v)
        th2, th3, th4, th5 = qdf.wolter_iii_angles_df(
            S.a_hyp_v, S.b_hyp_v, S.a_ell_v, S.b_ell_v, S.theta1_v)
        with mp.workdps(50):
            for got, want in zip((th2, th3, th4, th5), mp_exact):
                err = float(abs(mpf(float(got.hi)) + mpf(float(got.lo))
                                - want))
                # double-word keeps the chain to ~1e-20 rad
                assert err < 1e-18, f"DF angle error {err:.3e} rad"

    def test_f64_chain_loses_digits_df_recovers_them(self):
        """Measures the claim in quadric_df's docstring: the plain-f64
        chain (design.wolter_iii_angles) carries ~1e-9 rad of cancellation
        error in theta5 (-> omega_V); the DF chain beats it by >=1e4."""
        _, mp_exact = _mp_wolter_iii_angles(
            S.a_hyp_v, S.b_hyp_v, S.a_ell_v, S.b_ell_v, S.theta1_v)
        org_h = float(np.sqrt(S.a_hyp_v**2 + S.b_hyp_v**2))
        org_e = float(np.sqrt(S.a_ell_v**2 - S.b_ell_v**2))
        f64 = design.wolter_iii_angles(S.a_hyp_v, S.b_hyp_v, org_h,
                                       S.a_ell_v, S.b_ell_v, org_e,
                                       S.theta1_v)[:4]
        df = qdf.wolter_iii_angles_df(S.a_hyp_v, S.b_hyp_v,
                                      S.a_ell_v, S.b_ell_v, S.theta1_v)
        with mp.workdps(50):
            err_f64 = max(float(abs(mpf(float(g)) - w))
                          for g, w in zip(f64, mp_exact))
            err_df = max(float(abs(mpf(float(g.hi)) + mpf(float(g.lo)) - w))
                         for g, w in zip(df, mp_exact))
        assert err_f64 > 1e-11  # the f64 cancellation is real ...
        assert err_df < 1e-15   # ... and the DF chain removes it
        assert err_df < err_f64 / 1e4


def _mp_quadric_matrix(coeffs):
    a, b, c, d, e, f, g, h, i, j = [mpf((float(x))) for x in coeffs]
    return mpmath.matrix([[a, d / 2, e / 2, g / 2],
                          [d / 2, b, h / 2, f / 2],
                          [e / 2, f / 2, c, i / 2],
                          [g / 2, h / 2, i / 2, j]])


def _mp_matrix_to_coeffs(M):
    return [M[0, 0], M[1, 1], M[2, 2], 2 * M[0, 1], 2 * M[0, 2],
            2 * M[1, 2], 2 * M[0, 3], 2 * M[1, 3], 2 * M[2, 3], M[3, 3]]


def _mp_congruence(coeffs, P):
    M = _mp_quadric_matrix(coeffs)
    return _mp_matrix_to_coeffs(P.T * M * P)


class TestQuadricDFOps:
    """Direct unit tests of the DF congruence ops at reference scale:
    ~146 m offsets on 73 m conic coefficients (the regime where plain-f64
    congruences lose ~8 digits to cancellation)."""

    # the canonical hyp_V conic shifted to its org: the actual starting
    # point of every reference placement (AKB_raytrace_III_I_20250710.py:
    # 1101-1105)
    def _conic(self):
        from akbx.surfaces import hyperbola_coeffs

        org = float(np.sqrt(S.a_hyp_v**2 + S.b_hyp_v**2))
        return geo.shift_x(hyperbola_coeffs(S.a_hyp_v, S.b_hyp_v, "xz"), org), org

    def test_shift_vs_mpmath(self):
        old = mp.dps
        try:
            mp.dps = 40
            c0, org = self._conic()
            t = np.array([-146.19402782262, 0.0123, -0.0456])
            got = qdf.shift(qdf.QDF.from_f64(c0), t)
            P = mpmath.eye(4)
            for k in range(3):
                P[k, 3] = mpf((float(-t[k])))
            want = _mp_congruence(np.asarray(c0), P)
            got_hi, got_lo = np.asarray(got.hi), np.asarray(got.lo)
            scale = max(abs(float(w)) for w in want)
            for k in range(10):
                err = abs(mpf((float(got_hi[k]))) + mpf((float(got_lo[k]))) - want[k])
                assert float(err) / scale < 1e-28, \
                    f"coeff {k}: DF rel err {float(err)/scale:.2e}"
        finally:
            mp.dps = old

    def test_transform_vs_mpmath(self):
        old = mp.dps
        try:
            mp.dps = 40
            c0, org = self._conic()
            axis = np.array([0.0, 1.0, 0.0])
            theta = 0.23405559832412  # omega-scale placement angle
            center = np.array([146.19402782262, 0.0, 0.0])
            R = np.asarray(geo.rodrigues(jnp.asarray(axis), theta))
            got = qdf.transform(qdf.QDF.from_f64(c0), jnp.asarray(R), center)
            # exact congruence at 40 digits with the SAME f64 rotation
            # entries (isolates the congruence arithmetic from the trig)
            P = mpmath.eye(4)
            for a in range(3):
                for b in range(3):
                    P[a, b] = mpf((float(R.T[a, b])))
            cm = [mpf((float(x))) for x in center]
            for a in range(3):
                P[a, 3] = cm[a] - sum(P[a, b] * cm[b] for b in range(3))
            want = _mp_congruence(np.asarray(c0), P)
            got_hi, got_lo = np.asarray(got.hi), np.asarray(got.lo)
            f64_c = np.asarray(geo.transform_quadric(c0, jnp.asarray(R),
                                                     jnp.asarray(center)))
            scale = max(abs(float(w)) for w in want)
            err_df = max(abs(mpf((float(got_hi[k]))) + mpf((float(got_lo[k])))
                             - want[k]) for k in range(10))
            err_f64 = max(abs(mpf((float(f64_c[k]))) - want[k])
                          for k in range(10))
            assert float(err_df) / scale < 1e-25
            # the f64 congruence loses ~8 digits at this scale; DF must
            # beat it by a wide margin (this is its reason to exist)
            assert float(err_df) < float(err_f64) / 1e6
        finally:
            mp.dps = old

    def test_shift_z_bug_emulation_matches_reference(self):
        """``ref_shift_z_buggy`` reproduces the reference's shift_z
        bit-for-bit, dropped ``h`` update and all
        (AKB_raytrace_III_I_20250710.py:102-108)."""
        pytest.importorskip("mpmath")
        if not reference_available():
            pytest.skip("no reference")
        import sys
        sys.path.insert(0, "tests")
        from oracle import load_iii_i_engine

        mod = load_iii_i_engine()
        rng = np.random.default_rng(5)
        c = rng.standard_normal(10)
        s = 0.0321
        ref_in = mpmath.matrix([mpf((float(x))) for x in c])
        ref_out = np.array([float(x) for x in mod.shift_z(ref_in, mpf(s))])
        ours = np.asarray(qdf.ref_shift_z_buggy(jnp.asarray(c), s))
        np.testing.assert_allclose(ours, ref_out, rtol=1e-15)
        # and the bug is real: coeff h (index 7) keeps its OLD value
        assert ours[7] == c[7]
        correct = np.asarray(geo.shift(jnp.asarray(c),
                                       jnp.array([0.0, 0.0, s])))
        assert abs(correct[7] - ours[7]) > 1e-3 * abs(c[5])


@pytest.mark.skipif(not reference_available(), reason="no reference")
class TestIIIIEngineParity:
    """Full-engine golden parity vs the 20-digit mpmath III+I trace.

    The oracle runs its actual 'ray_wave' path (fan -> 4-mirror trace ->
    exit-pupil-uniform re-fan -> extreme-angle tilt removal -> OPL sums)
    and we capture (detcenter, detcenter2, DistError, DistError2) at its
    own conversion point (tests/oracle.py:run_iii_i_ray_wave).

    Engine knobs that exist precisely for this test: ``unit_coupled='h'``,
    ``fan_centering='mean'``, ``tilt_mode='extremes'``,
    ``ref_shift_z_bug=True`` (the oracle carries the reference's shift_z
    bug at 20 digits; bit-parity requires reproducing it).
    """

    N = 5
    PARAMS = [0.0] * 26

    @pytest.fixture(scope="class")
    def oracle_run(self):
        import sys
        sys.path.insert(0, "tests")
        from oracle import run_iii_i_ray_wave

        return run_iii_i_ray_wave(self.PARAMS, self.N)

    def _run(self, **kw):
        sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros(),
                                unit_coupled="h", fan_centering="mean", **kw)
        return trace.run(sys_, self.N, self.N, defocus=0.0, defocus_wave=1e-2,
                         tilt_mode="extremes")

    def test_bit_compat_detcenter_and_opl(self, oracle_run):
        det, det2, de, de2 = oracle_run
        res = self._run(ref_shift_z_bug=True)
        ours_de = np.asarray((res.total_dist
                              - res.total_dist.mean()) * 1e9)
        ours_de2 = np.asarray((res.total_dist2
                               - res.total_dist2.mean()) * 1e9)
        # f64 trace vs dps=20 trace, same (buggy) placement algebra:
        # detector parity to ~1e-7 m over a 146 m throw, wavefront OPL
        # parity to ~1 nm on a +/-66000 nm signal
        np.testing.assert_allclose(np.asarray(res.detcenter), det, atol=3e-7)
        np.testing.assert_allclose(np.asarray(res.detcenter2), det2, atol=3e-7)
        np.testing.assert_allclose(ours_de, de, atol=3.0)
        np.testing.assert_allclose(ours_de2, de2, atol=5.0)

    def test_fixed_placement_stays_close_and_differs_by_bug(self, oracle_run):
        """The default (bug-fixed, DF-precise) engine agrees with the
        buggy 20-digit oracle to the size of the bug itself (~23 nm
        wavefront, ~2e-6 m detcenter here) — quantifying what the
        reference's dropped ``h -= f*s`` update costs it."""
        det, det2, de, de2 = oracle_run
        res = self._run(precise=True)
        ours_de = np.asarray((res.total_dist - res.total_dist.mean()) * 1e9)
        bug_wavefront_nm = np.abs(ours_de - de).max()
        det_shift = np.abs(np.asarray(res.detcenter) - det).max()
        assert 1.0 < bug_wavefront_nm < 100.0
        assert 1e-7 < det_shift < 1e-5
