"""L7 fabrication + L8 sweep tooling."""

import os

import numpy as np
import pytest

from akbx import fab, tooling

from conftest import reference_available

RNG = np.random.default_rng(13)


class TestFab:
    def test_rotation_2d_parity(self):
        if reference_available():
            import AKB_calc_rotate as ref

            x = RNG.normal(size=10)
            y = RNG.normal(size=10)
            xr_r, yr_r = ref.rotation_2D(x, y, 0.3)
            xr, yr = fab.rotation_2d(x, y, 0.3)
            np.testing.assert_allclose(xr, xr_r)
            np.testing.assert_allclose(yr, yr_r)

    def test_interp_nan_parity(self):
        arr = np.array([np.nan, 1.0, np.nan, 3.0, 4.0, np.nan])
        out = fab.interp_nan(arr)
        np.testing.assert_allclose(out, [1, 1, 2, 3, 4, 4])
        if reference_available():
            import AKB_calc_rotate as ref

            np.testing.assert_allclose(out, ref.interp_nan(arr))

    def test_extrapolate_parabola_parity(self):
        if not reference_available():
            pytest.skip("no reference")
        import AKB_calc_rotate as ref

        xx = np.linspace(0.0, 1.0, 20)
        ours = fab.extrapolate_parabola(0.0, -0.5, 1.0, 2.0, 0.7, xx)
        theirs = ref.extrapolate_parabola(0.0, -0.5, 1.0, 2.0, 0.7, xx)
        np.testing.assert_allclose(np.asarray(ours), theirs)

    def test_merge_max_envelope(self):
        x = np.linspace(0, 1, 101)
        y1 = np.sin(np.pi * x)
        x2 = np.linspace(0.5, 1.5, 101)
        y2 = np.full(101, 0.25)
        xm, ym = fab.merge_max([(x, y1), (x2, y2)])
        # in the overlap the max wins
        i = np.argmin(np.abs(xm - 0.75))
        assert ym[i] == pytest.approx(np.sin(np.pi * 0.75), abs=0.02)
        i2 = np.argmin(np.abs(xm - 1.3))
        assert ym[i2] == pytest.approx(0.25, abs=1e-9)

    def test_machining_profile_pipeline(self):
        a, b = 72.9825, 0.263879113520857
        f = np.sqrt(a**2 + b**2)
        theta1 = 5.55983241203018e-05
        # the reference's hyp_v case (AKB_calc_rotate.py __main__)
        l1_sum = 2 * a
        l1_prod = -(b**2) / np.sin(0.117) ** 2
        l1 = (l1_sum + np.sqrt(l1_sum**2 - 4 * l1_prod)) / 2
        xc = l1 * np.cos(theta1)
        prof = fab.machining_profile(
            lambda x: fab.hyperbola_profile(a, b, f, x), xc, 0.043, num=5000)
        # chord is horizontal after rotation: endpoints at equal height
        assert abs(prof["y_raw"][0] - prof["y_raw"][-1]) < 1e-9
        # merged profile covers raw extent + approach ramp
        assert prof["x_merged"].min() < prof["x_raw"].min() - 0.010
        assert np.all(np.isfinite(prof["y_merged"]))

    def test_export_csv_round_trip(self, tmp_path):
        x = np.linspace(0, 0.05, 500)
        y = 1e-3 * x**2
        path = fab.export_profile_csv(str(tmp_path / "p.csv"), x, y,
                                      pitch_mm=0.1)
        d = np.loadtxt(path, delimiter=",", skiprows=1)
        assert abs((d[1, 0] - d[0, 0]) - 0.1) < 1e-9
        np.testing.assert_allclose(d[:, 1], 1e-3 * (d[:, 0] / 1e3) ** 2 * 1e3,
                                   atol=1e-5)

    def test_newell_normal_parity(self):
        quad = [(0, 0, 0), (1, 0, 0), (1, 1, 0.01), (0, 1, 0.01)]
        n = fab.newell_normal(*quad)
        assert abs(np.linalg.norm(n) - 1) < 1e-12
        if reference_available():
            from oracle import load_akb_engine

            load_akb_engine()  # stub numba/tifffile; cache the heavy import
            import surfacedetailAKB as ref

            np.testing.assert_allclose(n, ref.normal_from_quad(*quad))

    def test_rotation_between_parity(self):
        a = np.array([0.2, 0.9, -0.1])
        b = np.array([0.0, 0.0, 1.0])
        R = fab.rotation_between(a, b)
        np.testing.assert_allclose(R @ (a / np.linalg.norm(a)),
                                   b, atol=1e-12)
        if reference_available():
            from oracle import load_akb_engine

            load_akb_engine()
            import surfacedetailAKB as ref

            np.testing.assert_allclose(R, ref.rotation_matrix_from_vectors(a, b))
        # antiparallel case
        R2 = fab.rotation_between(b, -b)
        np.testing.assert_allclose(R2 @ b, -b, atol=1e-12)

    def test_compare_profiles_detects_figure_error(self):
        x = np.linspace(0, 50, 501)
        y1 = -1e-4 * (x - 25) ** 2
        bump = 5e-4 * np.exp(-((x - 25) / 5) ** 2)
        y2 = y1 + bump + 1e-3 * x  # figure error + linear misalignment
        xc, y1i, y2i, resid = fab.compare_profiles(x, y1, x, y2)
        # the linear term is detrended away; the bump survives
        assert np.abs(resid).max() > 2e-4
        assert abs(np.polyfit(xc, resid, 1)[0]) < 1e-9


class TestTooling:
    def make_sweep(self, tmp_path, n=6):
        for i in range(n):
            d = tmp_path / f"{i:02d}"
            os.makedirs(d, exist_ok=True)
            na = 0.02 + 0.01 * i
            with open(d / "kb_design.txt", "w") as f:
                f.write(f"l1h: 146.0\nNA_h: {na}\naccept_h: {na*2}\n")
            np.savetxt(d / "pvs.txt", np.arange(13) * 0.1 + 3 * na**4)
        return str(tmp_path)

    def test_collect_and_fit(self, tmp_path):
        base = self.make_sweep(tmp_path)
        data = tooling.collect_sweep(base)
        assert len(data["NA_h"]) == 6
        coeffs, r2 = tooling.fit_pv_vs_na(data["NA_h"], data["pv"])
        assert r2 > 0.99
        assert coeffs[0] == pytest.approx(3.0, rel=0.2)  # the x^4 term

    def test_power_law_fit(self):
        x = np.linspace(0.01, 0.1, 20)
        y = 2.5 * x**3.0
        A, p, r2 = tooling.fit_power_law(x, y)
        assert A == pytest.approx(2.5, rel=1e-6)
        assert p == pytest.approx(3.0, rel=1e-6)
        assert r2 > 0.999999

    def test_mode_sensitivities(self, tmp_path):
        orders = [(0, 0), (1, 0), (0, 1), (2, 0)]
        for i, p in enumerate(np.linspace(-1e-4, 1e-4, 5)):
            d = tmp_path / f"run{i}"
            os.makedirs(d, exist_ok=True)
            with open(d / "optical_params.txt", "w") as f:
                for j in range(4):
                    f.write(f"params[{j}]: {p if j == 2 else 0.0}\n")
            ips = np.array([0.1, 2.0 * p * 1e4, 0.0, -1.5 * p * 1e4])
            np.savetxt(d / "inner_products.csv", ips, delimiter=",")
            np.savetxt(d / "orders.csv", np.array(orders, dtype=float),
                       delimiter=",")
        out = tooling.collect_mode_sensitivities(str(tmp_path), 2)
        assert out["coeffs"].shape[0] == 3  # nx==0 modes: (0,0),(1,0),(2,0)
        slopes = dict(zip([tuple(orders[k]) for k in out["kept"]],
                          out["coeffs"][:, 0]))
        assert slopes[(1, 0)] == pytest.approx(2.0e4, rel=1e-6)
        assert slopes[(2, 0)] == pytest.approx(-1.5e4, rel=1e-6)

    def test_kb_design_sweep_small(self, tmp_path):
        out = tooling.kb_design_sweep(
            [146.0, 147.0], (0.21, 0.16742, 0.180, 0.030, 0.15525, 0.05),
            str(tmp_path), n_rays=17, assess_order=3)
        assert len(out["folders"]) == 2
        assert np.all(np.isfinite(out["pv"]))
        data = tooling.collect_sweep(str(tmp_path), pv_index=6)
        assert len(data["NA_h"]) == 2


class TestWolter1Combined:
    """Wolter-I H-pair combined machining profile (VERDICT r1 #7;
    reference AKB_calc_rotate.py:329-497, "1型 setting11" constants)."""

    SPEC = dict(a_ell=73.1076714403445, b_ell=0.517019631143022,
                a_hyp=0.0077, b_hyp=0.00432051448679384,
                theta1=0.000145746388538841, ell_length=0.030)

    @pytest.fixture(scope="class")
    def w1(self):
        return fab.wolter1_combined_profile(**self.SPEC, num=8000)

    def test_chain_points_on_conics(self, w1):
        """The theta3 chain lands every hyperbola sample on the actual
        hyperbola: center at 2*f_ell - f_hyp on the common-focus axis."""
        a_e, b_e = self.SPEC["a_ell"], self.SPEC["b_ell"]
        a_h, b_h = self.SPEC["a_hyp"], self.SPEC["b_hyp"]
        f_e = np.sqrt(a_e**2 - b_e**2)
        f_h = np.sqrt(a_h**2 + b_h**2)
        x, y = w1["x_hyp_raw"], w1["y_hyp_raw"]
        resid = ((2 * f_e - x - f_h) / a_h) ** 2 - (y / b_h) ** 2 - 1.0
        assert np.abs(resid).max() < 1e-9
        xe, ye = w1["x_ell_raw"], w1["y_ell_raw"]
        resid_e = ((xe - f_e) / a_e) ** 2 + (ye / b_e) ** 2 - 1.0
        assert np.abs(resid_e).max() < 1e-12

    def test_merged_is_max_envelope(self, w1):
        """Across the inter-mirror gap the merged profile equals the
        pointwise max of the two mirror profiles."""
        xm, ym = w1["x_merged"], w1["y_merged"]
        inside = (xm > w1["x_ell"].min()) & (xm < w1["x_hyp"].max())
        y_e = np.interp(xm, w1["x_ell"], w1["y_ell"],
                        left=-np.inf, right=-np.inf)
        xh = w1["x_hyp"][::-1]
        y_h = np.interp(xm, xh, w1["y_hyp"][::-1],
                        left=-np.inf, right=-np.inf)
        envelope = np.maximum(y_e, y_h)
        ok = inside & np.isfinite(envelope)
        assert np.abs(ym[ok] - envelope[ok]).max() < 2e-6

    @pytest.mark.skipif(not reference_available(),
                        reason="reference not mounted")
    def test_polar_roots_match_reference(self):
        import AKB_calc_rotate as ref

        a_h, b_h = self.SPEC["a_hyp"], self.SPEC["b_hyp"]
        f_h = np.sqrt(a_h**2 + b_h**2)
        theta3 = np.linspace(0.30, 0.38, 64)
        ours, _ = fab.conic_radius_at_angle(a_h, b_h, theta3, f_h,
                                            hyperbola=True)
        x1, _ = ref.calc_hyp_theta(a_h, b_h, theta3, f_h)
        np.testing.assert_allclose(ours, x1, rtol=1e-12)

    def test_cli_exports_full_set(self, capsys, tmp_path):
        """cmd_fab_profiles writes hyp_v, ell_v AND the Wolter-I combined
        CSV set (the reference's full export battery)."""
        from akbx import cli
        import json

        rc = cli.main(["fab-profiles", "--out", str(tmp_path),
                       "--num", "4000"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        for name in ("hyp_v", "ell_v", "wolter1"):
            assert name in out
        for f in ("hyp_v_rotated_before_offset.csv",
                  "hyp_v_rotated_0.1mmpitch.csv",
                  "ell_v_rotated_before_offset.csv",
                  "ell_v_rotated_0.1mmpitch.csv",
                  "wolter1_rotated_before_offset.csv",
                  "wolter1_rotated.csv",
                  "wolter1_rotated_0.1mmpitch.csv"):
            path = tmp_path / f
            assert path.exists(), f
            data = np.loadtxt(path, delimiter=",", skiprows=1)
            assert data.shape[0] > 10 and np.all(np.isfinite(data))


class TestTracedVsAnalyticLoop:
    """The reference's own cross-implementation loop
    (surfacedetailAKB.py:283-289): traced point cloud -> side profile ->
    compare against the analytic machining export."""

    def test_hyp_v_traced_cloud_matches_analytic(self):
        import jax.numpy as jnp

        from akbx import trace
        from akbx.systems import (AlignParams, WOLTER_3_1_DEFAULT,
                                  build_wolter_3_1)

        spec = WOLTER_3_1_DEFAULT
        sys_ = build_wolter_3_1(spec, AlignParams.zeros())
        # n_v is the along-mirror axis for the V mirrors: 129 stations
        # along hyp_v (~0.45 mm pitch), 5 transverse
        res = trace.run(sys_, 5, 129, defocus=0.0,
                        exit_pupil_uniform=False, tilt_correction=False)
        cloud = np.asarray(res.trace.points[0])  # hyp_v (placement-rotated)

        # recover the canonical frame from the PLACED quadric itself (the
        # reference needs engine-internal yaw/roll values for this)
        coeffs = np.asarray(sys_.mirrors[0].coeffs)
        x_c, r = fab.canonical_conic_profile(cloud, coeffs)
        y_ana = fab.hyperbola_profile(spec.a_hyp_v, spec.b_hyp_v, 0.0, x_c)
        assert np.abs(r - y_ana).max() < 1e-9  # cloud IS the conic

        # the reference's comparison loop: side profile of the cloud vs
        # the analytic machining export, common grid, linear detrend
        order = np.argsort(x_c)
        x_c, r = x_c[order], r[order]
        prof_traced = fab.sideview_profile(np.stack([x_c, 0 * x_c, r]))
        # interval midpoint, not mean: the ray stations are angle-uniform,
        # so mean(x) != (min+max)/2, and the hyperbola's sag is sensitive
        # to where the arc sits this close to the vertex
        ana = fab.machining_profile(
            lambda x: fab.hyperbola_profile(spec.a_hyp_v, spec.b_hyp_v,
                                            0.0, x),
            float(x_c.min() + x_c.max()) / 2,
            float(x_c.max() - x_c.min()), num=8000,
            pre_margin=(0.005, 0.02))
        x_a = ana["x_raw"] - np.min(ana["x_raw"])
        y_a = ana["y_raw"] - np.min(ana["y_raw"])

        # (a) tight: dense analytic interpolated AT the traced stations —
        # free of the sparse-side linear-interp floor
        x_t = prof_traced[0] * 1e3
        y_t = prof_traced[1] * 1e3
        y_at = np.interp(x_t, x_a * 1e3, y_a * 1e3)
        d = y_t - (y_at - y_at.max() + y_t.max())
        d -= np.polyval(np.polyfit(x_t, d, 1), x_t)
        assert np.abs(d).max() < 1e-6  # 1 nm in mm units

        # (b) the reference's own loop via compare_profiles: tolerance is
        # the linear-interp floor h^2*y''/8 of the 0.45 mm station pitch
        # (~50 nm), not profile disagreement — (a) pins that to <1 nm
        xc, y1i, y2i, resid = fab.compare_profiles(
            x_t, y_t, x_a * 1e3, y_a * 1e3, dx=0.05)
        assert np.abs(resid).max() < 2e-4  # mm
