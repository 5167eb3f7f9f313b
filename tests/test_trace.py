"""L3 engine: physics invariants + golden parity vs the reference engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akbx import design, systems, trace
from akbx.core import geometry as geo
from akbx.surfaces import make_mirror, ellipse_coeffs
from akbx.systems import (AKBSpec, AlignParams, KBSpec, WOLTER_3_1_DEFAULT,
                          build_kb, build_wolter_3_1)

from conftest import reference_available

KB7 = (146.0, 0.21, 0.16742, 0.180, 0.030, 0.15525, 0.05)  # KBdesign_7params


def single_ellipsoid_system(l1=146.0, inc=0.01, l2=0.5):
    """One ellipsoidal mirror focusing a point source: BASELINE config 1."""
    a, b, t1, t3 = design.ell_define(l1, inc, l2)
    f = jnp.sqrt(a**2 - b**2)
    coeffs = geo.shift_x(ellipse_coeffs(a, b, "xz"), f)
    x_c = l1 * jnp.cos(t1)
    mirror = make_mirror(coeffs, +1.0, jnp.array([x_c, 0.0, l1 * jnp.sin(t1)]))
    mlen = 0.05
    x1, x2 = x_c - mlen / 2, x_c + mlen / 2
    y1 = design.ellipse_y(a, b, x1)
    y2 = design.ellipse_y(a, b, x2)
    fan_v = jnp.stack([jnp.arctan(y1 / x1), jnp.arctan(y2 / x2)])
    sys_ = systems.OpticalSystem(
        (mirror,), 2 * f, jnp.array([-1e-8, 1e-8]), fan_v,
        jnp.zeros(3), jnp.array(True))
    return sys_, float(f)


class TestSingleEllipsoid:
    def test_perfect_focus(self):
        """All rays from focus 1 pass through focus 2 in the focused (z)
        direction, and all OPLs equal 2a to sub-nm over ~146 m — the
        reference's own oracle ('totalDist std', AKB_raytrace_20250312.py:3647).
        The horizontal (y) direction is unfocused by a single V mirror, so
        sy equals the geometric fan spread."""
        sys_, f = single_ellipsoid_system()
        res = trace.run(sys_, 64, 64, defocus=0.0, exit_pupil_uniform=False,
                        tilt_correction=False)
        assert bool(jnp.all(res.valid))
        sy, sz = trace.spot_size(res.detcenter, res.valid)
        assert float(sz) < 1e-10  # focused direction
        assert 1e-7 < float(sy) < 2e-6  # unfocused: ~fan half-angle * 2f
        std = float(jnp.std(res.total_dist))
        assert std < 1e-10

    def test_defocus_grows_spot(self):
        sys_, f = single_ellipsoid_system()
        r0 = trace.run(sys_, 16, 16, defocus=0.0, exit_pupil_uniform=False,
                       tilt_correction=False)
        r1 = trace.run(sys_, 16, 16, defocus=1e-3, exit_pupil_uniform=False,
                       tilt_correction=False)
        _, sz0 = trace.spot_size(r0.detcenter, r0.valid)
        _, sz1 = trace.spot_size(r1.detcenter, r1.valid)
        assert float(sz1) > 10 * float(sz0)


class TestKB:
    def make_system(self, align=None):
        spec = KBSpec.from_kb_define(*KB7)
        return build_kb(spec, align or AlignParams.zeros())

    def test_traces_and_focuses(self):
        sys_ = self.make_system()
        assert bool(sys_.valid)
        res = trace.run(sys_, 33, 33, defocus=0.0)
        assert bool(jnp.all(res.valid))
        sy, sz = trace.spot_size(res.detcenter, res.valid)
        # this KB design has residual astigmatism at the nominal plane:
        # spot stds are ~1e-4 m (matches the reference engine exactly —
        # see TestReferenceParity) and shrink with refocus
        assert float(sy) < 2e-4 and float(sz) < 3e-4

    def test_misalignment_moves_beam(self):
        sys0 = self.make_system()
        p = AlignParams.zeros()._replace(
            hyp_v=jnp.array([1e-4, 0.0, 0.0, 0.0, 0.0, 0.0]))
        sys1 = self.make_system(p)
        r0 = trace.run(sys0, 17, 17, defocus=0.0, tilt_correction=False)
        r1 = trace.run(sys1, 17, 17, defocus=0.0, tilt_correction=False)
        # a 100 urad pitch of mirror 1 deflects the beam: centroid shifts
        c0 = trace.masked_mean(r0.detcenter, r0.valid[None, :], axis=1)
        c1 = trace.masked_mean(r1.detcenter, r1.valid[None, :], axis=1)
        shift = float(jnp.linalg.norm(c1 - c0))
        assert shift > 1e-7


class TestAKB:
    def make_system(self, align=None, **kw):
        return build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                align or AlignParams.zeros(), **kw)

    def test_geometry_valid(self):
        sys_ = self.make_system()
        assert bool(sys_.valid)
        xs = [float(m.center[0]) for m in sys_.mirrors]
        assert xs == sorted(xs)

    def test_aligned_focus_quality(self):
        """The zero-params system carries ~mm defocus/astigmatism (as in the
        reference, whose __main__ stores a nonzero 'best alignment' params
        vector, :14586-14592); after autofocus the foci coincide and each
        direction focuses to well under a micron."""
        from akbx import align

        build = lambda p: build_wolter_3_1(WOLTER_3_1_DEFAULT, p)
        p = align.auto_focus(build, AlignParams.zeros(), n=21, iters=4)
        sys_ = build(p)
        res = trace.run(sys_, 33, 33, defocus=p.defocus, defocus_wave=1e-2)
        assert bool(jnp.all(res.valid))
        x_h, x_v, std_h, std_v = align.best_focus(
            res.trace, sys_.s2f_middle + p.defocus)
        # after autofocus the two foci coincide on the detector plane
        assert abs(float(x_h - x_v)) < 1e-5
        assert float(std_h) < 1e-6
        assert float(std_v) < 1e-6

    def test_trace_jits_and_differentiates(self):
        spec = WOLTER_3_1_DEFAULT

        @jax.jit
        def loss(vec):
            sys_ = build_wolter_3_1(spec, AlignParams.from_vector(vec))
            res = trace.run(sys_, 9, 9, defocus=vec[0],
                            exit_pupil_uniform=False)
            sy, sz = trace.spot_size(res.detcenter, res.valid)
            return sy**2 + sz**2

        v0 = jnp.zeros(26)
        g = jax.grad(loss)(v0)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0

    def test_figure_error_changes_wavefront(self):
        sys_ = self.make_system()
        m0 = sys_.mirrors[0]
        fig = jnp.zeros((3, 3)).at[2, 0].set(1e-9)
        half = jnp.array([float(WOLTER_3_1_DEFAULT.length_hyp_v) / 2, 0.01])
        m0p = m0._replace(fig_coeffs=fig, uv_half=half)
        sys_p = sys_._replace(mirrors=(m0p,) + sys_.mirrors[1:])
        r0 = trace.run(sys_, 17, 17, defocus=0.0, exit_pupil_uniform=False)
        r1 = trace.run(sys_p, 17, 17, defocus=0.0, exit_pupil_uniform=False)
        # 1 nm P2(u) height error -> ~2 sin(graze) ~ 0.2-0.5 nm OPL signature
        d = np.asarray(r1.total_dist - r0.total_dist) * 1e9
        assert 0.05 < np.nanstd(d) < 5.0

    def test_exit_pupil_uniform_exit_angles(self):
        sys_ = self.make_system()
        res = trace.run(sys_, 21, 21, defocus=0.0, exit_pupil_uniform=True,
                        tilt_correction=False)
        ang = res.trace.exit_rays
        av = np.arctan(np.asarray(ang[2] / ang[0])).reshape(21, 21)
        col = av[:, 10]
        steps = np.diff(col)
        assert np.std(steps) / np.abs(np.mean(steps)) < 2e-2

    def test_uniform_stage_equal_split(self):
        """uniform_stage=1 (reference option_avrgsplt / reset_p0,
        :11010-11037): the mirror-1 exit angles become equally spaced
        instead of the final exit angles."""
        sys_ = self.make_system()
        res = trace.run(sys_, 21, 21, defocus=0.0, exit_pupil_uniform=True,
                        tilt_correction=False, uniform_stage=1)
        ang1 = res.trace.directions[1]
        av = np.arctan(np.asarray(ang1[2] / ang1[0])).reshape(21, 21)
        steps = np.diff(av[:, 10])
        assert np.std(steps) / np.abs(np.mean(steps)) < 2e-2
        # and the *final* exit angles are now NOT the uniformized set
        res_exit = trace.run(sys_, 21, 21, defocus=0.0,
                             exit_pupil_uniform=True, tilt_correction=False)
        a_exit = res_exit.trace.exit_rays
        a_this = res.trace.exit_rays
        assert not np.allclose(np.asarray(a_exit), np.asarray(a_this))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
class TestEdgeDenseFan:
    def test_matches_reference_formula(self):
        """fan_angles(mode='edge_dense') == the reference's
        create_non_uniform_distribution (AKB_raytrace_20250312.py:375-382)."""
        lo, hi, n = -0.011, 0.013, 33
        ours = np.asarray(trace.fan_angles(jnp.array([lo, hi]), n,
                                           mode="edge_dense"))
        lin = np.linspace(-6, 6, n)
        sig = 1 / (1 + np.exp(-lin))
        ref = lo + (hi - lo) * (sig - sig.min()) / (sig.max() - sig.min())
        np.testing.assert_allclose(ours, ref, rtol=1e-12)
        # edge-dense: spacing at the edges is much finer than at center
        d = np.diff(ours)
        assert d[0] < d[len(d) // 2] / 5

    def test_trace_runs_edge_dense(self):
        sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros())
        res = trace.run(sys_, 9, 9, defocus=0.0, exit_pupil_uniform=False,
                        fan_mode="edge_dense")
        assert bool(jnp.all(res.valid))


class TestReferenceParity:
    """Golden end-to-end parity: our engine vs the reference engine run as
    an oracle (numba/tifffile stubbed; see tests/oracle.py).

    Tolerances are set by the *reference's* numerical defects, which our
    engine fixes (verified quantitatively in the debugging that set these
    numbers):

    * naive quadratic root at grazing incidence: the reference's 4th-mirror
      intersections carry ~1e-6 m along-ray error (quadric residual 1000x
      ours);
    * the reference ``shift_z`` bug perturbs the h coefficient by ~2.4e-5
      when rotating about centers with z != 0.
    """

    def test_akb_wolter_3_1_parity(self):
        from oracle import load_akb_engine, in_scratch_dir

        mod = load_akb_engine()
        with in_scratch_dir():
            vm_h, hm_h, vm_e, hm_e, det, ang = mod.plot_result_debug(
                np.zeros(26), "test", option_tilt=False)

        sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros())
        res = trace.run(sys_, 53, 53, defocus=0.0, exit_pupil_uniform=False,
                        tilt_correction=False)
        pts = [np.asarray(p) for p in res.trace.points]
        np.testing.assert_allclose(pts[0], vm_h, atol=1e-12)
        np.testing.assert_allclose(pts[1], vm_e, atol=1e-9)
        np.testing.assert_allclose(pts[2], hm_e, atol=1e-9)
        # mirror 4: reference's naive negative-branch root is the limit
        np.testing.assert_allclose(pts[3], hm_h, atol=5e-6)
        np.testing.assert_allclose(np.asarray(res.detcenter), det, atol=1e-5)
        np.testing.assert_allclose(np.asarray(res.trace.exit_rays), ang,
                                   atol=1e-4)

    def test_akb_misaligned_parity(self):
        from oracle import load_akb_engine, in_scratch_dir

        mod = load_akb_engine()
        params = np.zeros(26)
        params[2] = 2e-5   # pitch_hyp_v
        params[16] = -1e-5  # yaw_ell_v
        params[7] = 1e-6   # decenterZ_hyp_v
        with in_scratch_dir():
            vm_h, hm_h, vm_e, hm_e, det, ang = mod.plot_result_debug(
                params, "test", option_tilt=False)
        sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                AlignParams.from_vector(params))
        res = trace.run(sys_, 53, 53, defocus=0.0, exit_pupil_uniform=False,
                        tilt_correction=False)
        pts = [np.asarray(p) for p in res.trace.points]
        np.testing.assert_allclose(pts[0], vm_h, atol=1e-9)
        np.testing.assert_allclose(pts[1], vm_e, atol=1e-8)
        np.testing.assert_allclose(np.asarray(res.detcenter), det, atol=2e-5)

    def test_kb_parity(self):
        from oracle import load_akb_engine, in_scratch_dir

        mod = load_akb_engine()
        with in_scratch_dir():
            vm, hm, det, ang = mod.KB_debug(np.zeros(26), 1, 1, "test")
        spec = KBSpec.from_kb_define(*KB7)
        sys_ = build_kb(spec, AlignParams.zeros())
        res = trace.run(sys_, 53, 53, defocus=0.0, exit_pupil_uniform=False,
                        tilt_correction=True)
        np.testing.assert_allclose(np.asarray(res.detcenter), det, atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.trace.exit_rays), ang,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.trace.points[1]), hm,
                                   atol=2e-5)
