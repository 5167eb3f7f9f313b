"""L6 wave optics: Huygens sum parity, quadrature weights, stage pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akbx import wave

RNG = np.random.default_rng(7)
WAVELENGTH = 13.5e-9


def numpy_huygens(src_pts, src_u, src_ds, tgt_pts, lam):
    """The reference formula as a complex128 numpy oracle
    (Wavecalc_raytrace_fromData_CPU0402.py:71-85)."""
    k = 2 * np.pi / lam
    u = np.zeros(tgt_pts.shape[1], dtype=np.complex128)
    w = src_u * src_ds
    for i in range(tgt_pts.shape[1]):
        d = np.sqrt(((tgt_pts[:, i:i + 1] - src_pts) ** 2).sum(axis=0))
        u[i] = np.sum(w * np.exp(-1j * k * d) / d)
    return u


def make_cloud(n, center, scale=0.02):
    return center[:, None] + RNG.normal(size=(3, n)) * scale


class TestPropagate:
    def test_matches_numpy_oracle(self):
        src = make_cloud(300, np.array([146.0, 0.01, 0.02]))
        tgt = make_cloud(200, np.array([146.2, 0.0, -0.01]))
        u0 = np.exp(1j * RNG.uniform(0, 2 * np.pi, 300))
        ds = RNG.uniform(0.5, 1.5, 300) * 1e-9
        field = wave.WaveField.from_complex(src, u0, ds)
        re, im = wave.propagate(field, jnp.array(tgt), WAVELENGTH,
                                chunk=64, use_pallas=False)
        ref = numpy_huygens(src, u0, ds, tgt, WAVELENGTH)
        got = np.asarray(re) + 1j * np.asarray(im)
        # phases k*r ~ 6e7: f64 path with df reduction holds ~1e-8 relative
        np.testing.assert_allclose(got, ref, rtol=2e-7, atol=2e-7 * np.abs(ref).max())

    def test_point_source_spherical_wave(self):
        """Field from a point source is exp(-ikr)/r exactly."""
        srcf = wave.point_source((0.0, 0.0, 0.0))
        tgt = make_cloud(50, np.array([0.5, 0.0, 0.0]), scale=0.001)
        re, im = wave.propagate(srcf, jnp.array(tgt), WAVELENGTH,
                                chunk=32, use_pallas=False)
        r = np.linalg.norm(tgt, axis=0)
        k = 2 * np.pi / WAVELENGTH
        ref = np.exp(-1j * np.mod(k * r, 2 * np.pi)) / r
        got = np.asarray(re) + 1j * np.asarray(im)
        np.testing.assert_allclose(np.abs(got), 1 / r, rtol=1e-12)
        # phase accurate to ~1e-7 rad
        dphi = np.angle(got / ref)
        assert np.abs(dphi).max() < 1e-6

    def test_energy_scaling_with_ds(self):
        src = make_cloud(100, np.array([10.0, 0.0, 0.0]))
        tgt = make_cloud(20, np.array([10.5, 0.0, 0.0]))
        u0 = np.ones(100, dtype=complex)
        f1 = wave.WaveField.from_complex(src, u0, np.full(100, 1e-9))
        f2 = wave.WaveField.from_complex(src, u0, np.full(100, 2e-9))
        r1 = wave.propagate(f1, jnp.array(tgt), WAVELENGTH, use_pallas=False)
        r2 = wave.propagate(f2, jnp.array(tgt), WAVELENGTH, use_pallas=False)
        np.testing.assert_allclose(np.asarray(r2[0]), 2 * np.asarray(r1[0]),
                                   rtol=1e-12)


class TestCalcDs:
    def test_flat_grid_area(self):
        """On a uniform planar grid with pitch (hx, hv), the 4-triangle sum
        is 2*hx*hv (the reference's convention — twice the cell area)."""
        n_v, n_h = 9, 11
        hx, hv = 1e-3, 2e-3
        yy, zz = np.meshgrid(np.arange(n_h) * hx, np.arange(n_v) * hv)
        pts = np.stack([np.zeros_like(yy), yy, zz]).reshape(3, -1)
        ds = np.asarray(wave.calc_ds(jnp.array(pts), n_v, n_h))
        np.testing.assert_allclose(ds, 2 * hx * hv, rtol=1e-12)

    @pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                        reason="reference not mounted")
    def test_parity_with_reference(self):
        from oracle import load_akb_engine

        mod = load_akb_engine()
        n_v, n_h = 7, 8
        pts = RNG.normal(size=(3, n_v * n_h))
        # make it grid-like so areas are sane
        yy, zz = np.meshgrid(np.linspace(0, 1, n_h), np.linspace(0, 2, n_v))
        pts = np.stack([0.1 * RNG.normal(size=yy.shape), yy, zz]).reshape(3, -1)
        ref = mod.calc_dS(pts, n_v, n_h)
        ours = np.asarray(wave.calc_ds(jnp.array(pts), n_v, n_h)).reshape(n_v, n_h)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)


class TestPipeline:
    def test_two_stage_chain(self):
        """source -> M1 -> M2 equals manually chained propagations."""
        m1 = make_cloud(64, np.array([1.0, 0.0, 0.0]), 0.01)
        m2 = make_cloud(49, np.array([2.0, 0.0, 0.0]), 0.01)
        src = wave.point_source()
        ds1 = np.full(64, 1e-6)
        fields = wave.propagate_stages(
            src,
            [{"points": m1, "ds": ds1, "name": "M1", "n_h": 8, "n_v": 8},
             {"points": m2, "name": "M2"}],
            WAVELENGTH, use_pallas=False)
        f1 = wave.propagate_field(src, jnp.array(m1), WAVELENGTH,
                                  target_ds=ds1, use_pallas=False)
        f2 = wave.propagate_field(f1, jnp.array(m2), WAVELENGTH,
                                  use_pallas=False)
        np.testing.assert_allclose(np.asarray(fields[1].re),
                                   np.asarray(f2.re), rtol=1e-12)

    def test_differentiable_through_propagation(self):
        src_pts = jnp.array(make_cloud(32, np.array([1.0, 0, 0]), 0.005))
        tgt = jnp.array(make_cloud(16, np.array([1.5, 0, 0]), 0.001))

        def loss(shift):
            f = wave.WaveField.from_complex(src_pts + shift, np.ones(32),
                                            np.full(32, 1e-6))
            re, im = wave.propagate(f, tgt, WAVELENGTH, chunk=16,
                                    use_pallas=False)
            return jnp.sum(re**2 + im**2)

        g = jax.grad(loss)(jnp.zeros((3, 1)))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0
