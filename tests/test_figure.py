"""Mirror figure-error layer: footprint calibration, differentiability,
observability — the machinery behind gradient-based figure retrieval
(scale_demos.py figopt; the capability upgrade over the reference's
derivative-free alignment searches, SURVEY.md §7)."""

import numpy as np

import jax
import jax.numpy as jnp

from akbx import trace
from akbx.surfaces import intersect_and_reflect
from akbx.systems import (AlignParams, WOLTER_3_1_DEFAULT, build_wolter_3_1,
                          calibrate_uv)


def make_base():
    return calibrate_uv(build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                         AlignParams.zeros()))


class TestCalibrateUV:
    def test_footprint_spans_unit_square(self):
        """After calibration the traced footprint fills u, v in [-1, 1] on
        every mirror (without it, uv_half=1 m leaves |u| <~ 0.02 and the
        Legendre modes all collapse toward piston)."""
        base = make_base()
        res = trace.run(base, 9, 9, defocus=0.0, exit_pupil_uniform=False,
                        tilt_correction=False)
        for m, pts in zip(base.mirrors, res.trace.points):
            local = np.asarray(m.axes @ (pts - m.center[:, None]))
            u = (local[0] - float(m.uv_center[0])) / float(m.uv_half[0])
            v = (local[1] - float(m.uv_center[1])) / float(m.uv_half[1])
            assert -1.001 < u.min() and u.max() < 1.001
            assert -1.001 < v.min() and v.max() < 1.001
            assert u.max() - u.min() > 1.9
            assert v.max() - v.min() > 1.9

    def test_h_mirror_transverse_axis_reoriented(self):
        """The builders' local frames put the H mirrors' row 1 along the
        surface normal; calibration must swap rows 1/2 so ``figure_height``
        reads a real transverse coordinate."""
        raw = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros())
        cal = make_base()
        res = trace.run(raw, 9, 9, defocus=0.0, exit_pupil_uniform=False,
                        tilt_correction=False)
        for m, pts in zip(cal.mirrors, res.trace.points):
            local = np.asarray(m.axes @ (pts - m.center[:, None]))
            ext = local.max(axis=1) - local.min(axis=1)
            # row 1 (the figure 'v' axis) must carry more footprint than
            # row 2 (the out-of-surface direction)
            assert ext[1] >= ext[2]


class TestFigureDifferentiability:
    def test_single_bounce_grad_matches_fd(self):
        """d(reflected dir)/d(fig coeff) by jvp == central finite
        difference (the tilt term: a figure gradient rotates the normal
        and deflects the ray)."""
        base = make_base()
        n = 5
        rays = trace.ray_fan(trace.fan_angles(base.fan_h, n),
                             trace.fan_angles(base.fan_v, n))
        src = base.source[:, None] * jnp.ones((1, rays.shape[1]))

        def refl_of(fig):
            m0 = base.mirrors[0]._replace(fig_coeffs=fig.reshape(3, 3))
            return intersect_and_reflect(m0, rays, src)[1]

        e = jnp.zeros(9).at[3].set(1.0)  # mode (1,0): axial tilt
        delta = 1e-6
        fd = (np.asarray(refl_of(e * delta))
              - np.asarray(refl_of(-e * delta))) / (2 * delta)
        ad = np.asarray(jax.jvp(refl_of, (jnp.zeros(9),), (e,))[1])
        np.testing.assert_allclose(ad, fd, atol=1e-5 * np.abs(fd).max()
                                   + 1e-12)
        assert np.abs(ad).max() > 0.1  # the tilt response is O(1), not 0

    def test_wavefront_jacobian_has_strong_modes(self):
        """The figure->wavefront Jacobian through the full 4-mirror trace
        (jacfwd) has at least 3 singular values within 1% of the largest —
        the strongly-observable modes that gradient-based retrieval
        recovers (scale_demos.py figopt; full observability analysis
        there)."""
        base = make_base()
        n = 7

        def w_of(fig9):
            m0 = base.mirrors[0]._replace(fig_coeffs=fig9.reshape(3, 3))
            s_ = base._replace(mirrors=(m0,) + base.mirrors[1:])
            res = trace.run(s_, n, n, defocus=0.0, exit_pupil_uniform=False)
            w = res.total_dist - trace.masked_mean(res.total_dist, res.valid)
            return jnp.where(res.valid, w, 0.0)

        J = np.asarray(jax.jacfwd(w_of)(jnp.zeros(9)))
        sv = np.linalg.svd(J, compute_uv=False)
        assert (sv > 1e-2 * sv[0]).sum() >= 3
        assert sv[0] > 1.0  # meters of OPL per meter of coefficient
