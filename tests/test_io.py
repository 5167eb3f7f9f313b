"""I/O: reference-format export/import round-trips + stage caching."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from akbx import io, wave

from conftest import reference_available

RNG = np.random.default_rng(5)


def make_surface(n_v=5, n_h=6, x0=1.0):
    yy, zz = np.meshgrid(np.linspace(0, 1e-2, n_h), np.linspace(0, 2e-2, n_v))
    return np.stack([np.full_like(yy, x0), yy, zz]).reshape(3, -1)


class TestWaveData:
    def test_round_trip(self, tmp_path):
        d = str(tmp_path)
        m1 = make_surface(5, 6, 1.0)
        m2 = make_surface(5, 6, 2.0)
        grid = make_surface(4, 4, 3.0)
        io.save_wave_data(
            d, np.zeros(3),
            {"M1": (m1, 5, 6), "M2": (m2, 5, 6)},
            grid,
            conditions={"grid pix_y": 4, "grid pix_z": 4,
                        "grid pix_H1": 6, "grid pix_V1": 5,
                        "grid pix_H2": 6, "grid pix_V2": 5,
                        "option_AKB": True, "option_HighNA": True,
                        "defocusForWave": 1e-3})
        data = io.load_wave_data(d)
        np.testing.assert_allclose(data["M1"][:3], m1)
        assert data["M1"].shape[0] == 4  # dS row appended
        assert data["conditions"]["option_AKB"] is True
        assert data["conditions"]["grid pix_H1"] == 6
        np.testing.assert_allclose(data["gridImage"], grid)

    @pytest.mark.skipif(not reference_available(), reason="no reference")
    def test_reference_reader_can_parse_conditions(self, tmp_path):
        """The reference Wavecalc reader's exact parse logic succeeds on our
        conditions file (reader Wavecalc_raytrace_fromData_CPU0402.py:208-239)."""
        d = str(tmp_path)
        io.save_wave_data(d, np.zeros(3), {"M1": (make_surface(), 5, 6)},
                          make_surface(),
                          conditions={"grid pix_y": 65, "grid pix_z": 65,
                                      "grid pix_H1": 65, "grid pix_V1": 65,
                                      "grid pix_H2": 65, "grid pix_V2": 65,
                                      "option_AKB": True,
                                      "option_HighNA": False})
        # replicate the reference reader verbatim-in-behavior
        vals = {}
        with open(os.path.join(d, "calculation_conditions.txt")) as f:
            for line in f:
                if "grid pix_y:" in line:
                    vals["pix_y"] = int(line.split(":")[1].strip())
                elif "grid pix_H1:" in line:
                    vals["H1"] = int(line.split(":")[1].strip())
                elif "option_AKB:" in line:
                    vals["akb"] = line.split(":")[1].strip().lower() == "true"
        assert vals == {"pix_y": 65, "H1": 65, "akb": True}


class TestStageCache:
    def test_save_load_geometry_guard(self, tmp_path):
        cache = io.StageCache(str(tmp_path))
        pts = make_surface()
        f = wave.WaveField.from_complex(pts, RNG.normal(size=30) + 1j,
                                        np.full(30, 1e-6), 6, 5)
        cache.save("M1", f)
        loaded = cache.load("M1", pts)
        assert loaded is not None
        np.testing.assert_allclose(np.asarray(loaded.re), np.asarray(f.re))
        assert loaded.n_h == 6 and loaded.n_v == 5
        # different geometry -> cache miss (reference reloads blindly;
        # we hash the geometry)
        assert cache.load("M1", pts + 1e-3) is None
        assert cache.load("M2", pts) is None

    def test_pipeline_uses_cache(self, tmp_path):
        cache = io.StageCache(str(tmp_path))
        src = wave.point_source()
        m1 = make_surface(4, 4, 0.5)
        stages = [{"points": m1, "name": "M1", "n_h": 4, "n_v": 4}]
        f1 = wave.propagate_stages(src, stages, 13.5e-9, cache=cache,
                                   use_pallas=False)
        f2 = wave.propagate_stages(src, stages, 13.5e-9, cache=cache,
                                   use_pallas=False)
        np.testing.assert_allclose(np.asarray(f1[0].re), np.asarray(f2[0].re))


class TestParams:
    def test_optical_params_round_trip(self, tmp_path):
        v = RNG.normal(size=26)
        path = io.write_optical_params(str(tmp_path), v)
        back = io.read_optical_params(path)
        np.testing.assert_allclose(back, v)

    def test_manifest_round_trip(self, tmp_path):
        from akbx.config import TraceConfig

        io.write_manifest(str(tmp_path), TraceConfig(n_rays_h=65))
        m = io.read_manifest(str(tmp_path))
        assert m["n_rays_h"] == 65
