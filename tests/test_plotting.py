"""Diagnostic plotting + GUI compute path (Agg backend, smoke + content)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from akbx import design, gui, plotting, trace
from akbx.systems import AlignParams, WOLTER_3_1_DEFAULT, build_wolter_3_1

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def engine_result():
    sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros())
    return sys_, trace.run(sys_, 9, 9, defocus=0.0, exit_pupil_uniform=False)


@pytest.fixture(scope="module")
def kb_pair():
    e1 = design.design_ell_v(48.6, 0.33, 0.006, 0.002)
    return e1, e1  # layout plots only need attribute access


class TestPlots:
    def test_spot_diagram(self, engine_result, tmp_path):
        _, res = engine_result
        p = str(tmp_path / "spot.png")
        fig = plotting.spot_diagram(res.detcenter, res.valid, path=p)
        assert os.path.getsize(p) > 0
        assert fig.axes[0].get_title() == "Focal spot"

    def test_ray_sideview(self, engine_result, tmp_path):
        sys_, res = engine_result
        p = str(tmp_path / "side.png")
        plotting.ray_sideview(res.trace.exit_rays, res.trace.exit_points,
                              float(sys_.s2f_middle), 1e-3, 9, 9, path=p)
        assert os.path.getsize(p) > 0

    def test_around_focus_montage(self, tmp_path):
        spots = RNG.normal(size=(5, 3, 40))
        p = str(tmp_path / "montage.png")
        fig = plotting.around_focus_montage(spots, np.linspace(-1, 1, 5) * 1e-3,
                                            path=p)
        assert len(fig.axes) == 5
        assert os.path.getsize(p) > 0

    def test_wavefront_and_psf(self, tmp_path):
        mat = RNG.normal(size=(17, 17))
        plotting.wavefront_map(mat, path=str(tmp_path / "w.png"))
        y = np.linspace(-1, 1, 32)
        img = np.exp(-np.add.outer(y**2, y**2) * 30)
        plotting.psf_image(img, y * 1e-6, y * 1e-6,
                           path=str(tmp_path / "psf.png"))
        plotting.psf_image(img, y * 1e-6, y * 1e-6, log=True,
                           path=str(tmp_path / "psf_log.png"))
        plotting.psf_cuts(img, y * 1e-6, y * 1e-6,
                          path=str(tmp_path / "cuts.png"))
        for f in ("w.png", "psf.png", "psf_log.png", "cuts.png"):
            assert os.path.getsize(tmp_path / f) > 0

    def test_interactive_around_focus(self, engine_result):
        from akbx import trace as tr

        sys_, res = engine_result
        x0 = float(sys_.s2f_middle)
        calls = []

        def spots_at(off):
            calls.append(off)
            return tr.detector_points(res.trace, x0 + off)

        fig, state = plotting.interactive_around_focus(spots_at, 1e-3,
                                                       n_planes=3,
                                                       valid=res.valid)
        first_offsets = state["offsets"].copy()
        assert len(first_offsets) == 3

        class FakeEvent:
            inaxes = fig.axes[0]

        state["on_click"](FakeEvent())  # click the leftmost plane
        # recentered on the clicked offset with halved span
        assert state["offsets"][1] == pytest.approx(first_offsets[0])
        assert (state["offsets"][-1] - state["offsets"][0]) == pytest.approx(
            (first_offsets[-1] - first_offsets[0]) / 2)
        assert len(calls) == 6  # re-traced all panes

    def test_legendre_modes(self, tmp_path):
        orders = [(0, 0), (1, 0), (0, 1), (1, 1)]
        p = str(tmp_path / "leg.png")
        plotting.legendre_modes([1.0, 0.5, -0.2, 0.1], orders, path=p)
        assert os.path.getsize(p) > 0

    def test_design_plots(self, kb_pair, tmp_path):
        e1, e2 = kb_pair
        plotting.ellipse_layout(e1, e2, path=str(tmp_path / "lay.png"))
        plotting.incident_angles(e1, e2, path=str(tmp_path / "ang.png"))
        txt = plotting.design_summary_text(e1, e2)
        assert "aperture" in txt and "demagnification" in txt

    def test_design_raytrace_plot(self, kb_pair, tmp_path):
        from akbx import design_na

        e1, _ = kb_pair
        rt = design_na.design_raytrace(e1, 2e-3, n_points=32)
        p = str(tmp_path / "rt.png")
        fig = plotting.design_raytrace_plot(rt, path=p)
        assert len(fig.axes) == 6  # profile + 5 focus planes
        assert os.path.getsize(p) > 0


class TestGUI:
    def test_compute_design_headless(self):
        values = {k: float(v) for k, v in gui.FIELDS}
        e1, e2, summary = gui.compute_design(values)
        # converged H design: working distance near the requested one
        assert abs(float(e2.l_o2) - values["target_l_o2"]) < 0.3 * values["target_l_o2"]
        assert "Focus distance" in summary

    def test_make_figures(self):
        values = {k: float(v) for k, v in gui.FIELDS}
        e1, e2, _ = gui.compute_design(values)
        figs = gui.make_figures(e1, e2)
        assert len(figs) == 2
