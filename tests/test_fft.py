"""Sharded 2D FFT + sharded PSF on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akbx.analysis import psf
from akbx.parallel import fft as pfft
from akbx.parallel import sharding as sh

RNG = np.random.default_rng(7)


def cpu_mesh(n=8):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return sh.ray_mesh(n, devices=devs[:n])


class TestShardedFFT2:
    def test_matches_jnp(self):
        mesh = cpu_mesh(8)
        u = RNG.normal(size=(64, 48)) + 1j * RNG.normal(size=(64, 48))
        fft2 = pfft.make_fft2(mesh)
        got = np.asarray(fft2(jnp.asarray(u)))
        want = np.fft.fft2(u)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)

    def test_inverse_matches_jnp(self):
        mesh = cpu_mesh(8)
        u = RNG.normal(size=(32, 32)) + 1j * RNG.normal(size=(32, 32))
        ifft2 = pfft.make_fft2(mesh, inverse=True)
        np.testing.assert_allclose(np.asarray(ifft2(jnp.asarray(u))),
                                   np.fft.ifft2(u), rtol=1e-10, atol=1e-12)

    def test_roundtrip(self):
        mesh = cpu_mesh(8)
        u = jnp.asarray(RNG.normal(size=(40, 24)) + 0j)
        fft2 = pfft.make_fft2(mesh)
        ifft2 = pfft.make_fft2(mesh, inverse=True)
        np.testing.assert_allclose(np.asarray(ifft2(fft2(u))),
                                   np.asarray(u), atol=1e-10)

    def test_output_is_row_sharded(self):
        mesh = cpu_mesh(8)
        u = pfft.shard_rows(mesh, jnp.zeros((64, 32), dtype=jnp.complex128))
        out = pfft.make_fft2(mesh)(u)
        assert len({s.device for s in out.addressable_shards}) == 8

    def test_indivisible_raises(self):
        mesh = cpu_mesh(8)
        with pytest.raises(ValueError, match="divisible"):
            pfft.make_fft2(mesh)(jnp.zeros((30, 32), dtype=jnp.complex128))

    def test_custom_vjp_matches_native(self):
        """The sharded transform's gradients == jnp.fft.fft2's VJP."""
        mesh = cpu_mesh(8)
        fft2 = pfft.make_fft2(mesh)
        x = jnp.asarray(RNG.normal(size=(16, 16)))
        w = jnp.asarray(RNG.normal(size=(16, 16))
                        + 1j * RNG.normal(size=(16, 16)))

        def f_sharded(x):
            return jnp.abs(jnp.sum(w * fft2(x.astype(jnp.complex128)))) ** 2

        def f_native(x):
            return jnp.abs(jnp.sum(
                w * jnp.fft.fft2(x.astype(jnp.complex128)))) ** 2

        g_s = jax.grad(f_sharded)(x)
        g_n = jax.grad(f_native)(x)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_n),
                                   rtol=1e-9, atol=1e-9)


class TestShardedPSF:
    def make_pupil(self, n=48):
        y = np.linspace(-1, 1, n)
        opd = 5e-9 * np.add.outer(y**2, y**2)
        amp = np.ones((n, n))
        amp[0, :] = np.nan  # NaN handling must match
        return jnp.asarray(opd), jnp.asarray(amp)

    def test_matches_single_device(self):
        mesh = cpu_mesh(8)
        opd, amp = self.make_pupil()
        args = (opd, amp, 13.5e-9, 1e-4, 0.1)
        I1, x1, y1 = psf.compute_psf_fft(*args, pad_factor=2)
        I2, x2, y2 = pfft.psf_fft_sharded(*args, mesh=mesh, pad_factor=2)
        np.testing.assert_allclose(np.asarray(I2), np.asarray(I1),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x1))

    def test_gradients_match_single_device(self):
        """Pixel gradients through the sharded PSF == unsharded pipeline."""
        mesh = cpu_mesh(8)
        opd, amp = self.make_pupil(n=16)
        target = 10  # an arbitrary pixel of the padded PSF

        def peak_sharded(opd):
            I, _, _ = pfft.psf_fft_sharded(opd, amp, 13.5e-9, 1e-4, 0.1,
                                           mesh=mesh, pad_factor=2)
            return I[target, target]

        def peak_native(opd):
            I, _, _ = psf.compute_psf_fft(opd, amp, 13.5e-9, 1e-4, 0.1,
                                          pad_factor=2)
            return I[target, target]

        g_s = jax.grad(peak_sharded)(opd)
        g_n = jax.grad(peak_native)(opd)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_n),
                                   rtol=1e-7, atol=1e-12)
