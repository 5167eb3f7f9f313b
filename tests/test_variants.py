"""AKB engine variants: Wolter III+III tandem and alternating orderings."""

import numpy as np
import pytest

import jax.numpy as jnp

from akbx import align, trace
from akbx.systems import (AlignParams, WOLTER_3_3_ALT_DEFAULT,
                          WOLTER_3_3_TANDEM_DEFAULT,
                          build_wolter_3_3_alternating,
                          build_wolter_3_3_tandem)

from conftest import reference_available


class TestTandem:
    def make(self, p=None):
        return build_wolter_3_3_tandem(WOLTER_3_3_TANDEM_DEFAULT,
                                       p or AlignParams.zeros())

    def test_valid_and_ordered(self):
        sys_ = self.make()
        assert bool(sys_.valid)
        xs = [float(m.center[0]) for m in sys_.mirrors]
        assert xs == sorted(xs)

    def test_focuses_after_autofocus(self):
        build = lambda p: build_wolter_3_3_tandem(WOLTER_3_3_TANDEM_DEFAULT, p)
        p = align.auto_focus(build, AlignParams.zeros(), n=17, iters=5)
        sys_ = build(p)
        res = trace.run(sys_, 21, 21, defocus=p.defocus)
        assert bool(jnp.all(res.valid))
        x_h, x_v, std_h, std_v = align.best_focus(
            res.trace, sys_.s2f_middle + p.defocus)
        assert float(std_h) < 1e-6 and float(std_v) < 1e-6

    @pytest.mark.skipif(not reference_available(), reason="no reference")
    def test_oracle_parity(self):
        from oracle import load_akb_engine, in_scratch_dir

        mod = load_akb_engine("wolter_3_3_tandem")
        with in_scratch_dir():
            vm_h, hm_h, vm_e, hm_e, det, ang = mod.plot_result_debug(
                np.zeros(26), "test", option_tilt=False)
        sys_ = self.make()
        res = trace.run(sys_, 53, 53, defocus=0.0, exit_pupil_uniform=False,
                        tilt_correction=False)
        pts = [np.asarray(p) for p in res.trace.points]
        # tandem order: hyp_V, ell_V, hyp_H, ell_H; reference returns
        # (vmirr_hyp, hmirr_hyp0, vmirr_ell, hmirr_ell)
        np.testing.assert_allclose(pts[0], vm_h, atol=1e-10)
        np.testing.assert_allclose(pts[1], vm_e, atol=1e-8)
        np.testing.assert_allclose(pts[2], hm_h, atol=1e-6)
        np.testing.assert_allclose(pts[3], hm_e, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.detcenter), det, atol=1e-5)


class TestAlternating:
    def make(self, p=None, **kw):
        return build_wolter_3_3_alternating(WOLTER_3_3_ALT_DEFAULT,
                                            p or AlignParams.zeros(), **kw)

    def test_valid_and_ordered(self):
        sys_ = self.make()
        assert bool(sys_.valid)
        xs = [float(m.center[0]) for m in sys_.mirrors]
        assert xs == sorted(xs)

    def test_two_mirror_mode(self):
        sys_ = self.make(two_mirror_only=True)
        assert len(sys_.mirrors) == 2
        res = trace.run(sys_, 9, 9, defocus=0.0, exit_pupil_uniform=False)
        assert bool(jnp.all(res.valid))

    def test_focuses_after_autofocus(self):
        build = lambda p: build_wolter_3_3_alternating(WOLTER_3_3_ALT_DEFAULT, p)
        p = align.auto_focus(build, AlignParams.zeros(), n=17, iters=5)
        sys_ = build(p)
        res = trace.run(sys_, 21, 21, defocus=p.defocus)
        assert bool(jnp.all(res.valid))
        x_h, x_v, std_h, std_v = align.best_focus(
            res.trace, sys_.s2f_middle + p.defocus)
        # the alternating ordering carries larger residual aberration than
        # the III+I system; best-focus slice stds land in the 1e-5 range
        assert float(std_h) < 1e-4 and float(std_v) < 1e-4

    @pytest.mark.skipif(not reference_available(), reason="no reference")
    def test_oracle_parity(self):
        from oracle import load_akb_engine, in_scratch_dir

        mod = load_akb_engine("wolter_3_3_alternating")
        # this variant hardcodes tilt correction (reference :8265)
        with in_scratch_dir():
            vm_h, hm_h, vm_e, hm_e, det, ang = mod.plot_result_debug(
                np.zeros(26), "test")
        sys_ = self.make()
        res = trace.run(sys_, 53, 53, defocus=0.0, exit_pupil_uniform=False,
                        tilt_correction=True)
        pts = [np.asarray(p) for p in res.trace.points]
        # alternating order: hyp_V, hyp_H, ell_V, ell_H
        np.testing.assert_allclose(pts[0], vm_h, atol=1e-10)
        np.testing.assert_allclose(pts[1], hm_h, atol=1e-7)
        np.testing.assert_allclose(pts[2], vm_e, atol=1e-6)
        np.testing.assert_allclose(pts[3], hm_e, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.detcenter), det, atol=1e-5)
