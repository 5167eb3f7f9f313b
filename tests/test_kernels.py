"""Pallas Huygens kernel: interpret-mode correctness, differentiability,
and loud-fallback semantics (VERDICT r1 items #2/#3/#4).

The same df32 kernel that runs under Mosaic on TPU is exercised here
through the Pallas interpreter on CPU — numerically equivalent since the
error-free transforms are contraction-immune (see
akbx.core.precision.two_prod).  Reference for the physics: the CuPy hot
loop ``forward_propagation_cupy_batch``
(Wavecalc_raytrace_fromData_GPU0402.py:139-201).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akbx import wave
from akbx.kernels import huygens as hk

EUV = 13.5e-9


def _mk(n_src=600, n_tgt=500, seed=0):
    rng = np.random.default_rng(seed)
    src_pts = (np.array([145.0, 0.02, 0.0])[:, None]
               + rng.normal(size=(3, n_src)) * 0.05)
    tgt_pts = (np.array([146.0, 0.05, 0.01])[:, None]
               + rng.normal(size=(3, n_tgt)) * 0.02)
    u = rng.normal(size=n_src) + 1j * rng.normal(size=n_src)
    ds = np.abs(rng.normal(size=n_src)) * 1e-8
    src = wave.WaveField.from_complex(src_pts, u, ds)
    return src, jnp.asarray(tgt_pts)


class TestInterpretAccuracy:
    def test_field_matches_xla_f64(self):
        """df32 kernel vs exact-f64 XLA path at EUV: <= 1e-5 relative
        (the kernel's own claim is ~1e-6; observed 1.4e-6)."""
        src, tgt = _mk()
        re_x, im_x = wave.propagate(src, tgt, EUV, backend="xla")
        re_p, im_p = hk.propagate_pallas(src, tgt, EUV, interpret=True)
        ux = np.asarray(re_x) + 1j * np.asarray(im_x)
        up = np.asarray(re_p) + 1j * np.asarray(im_p)
        rel = np.abs(up - ux).max() / np.abs(ux).max()
        assert rel < 1e-5, rel

    def test_multi_tile_and_padding(self):
        """Grid accumulation + zero-weight padding: small tiles force
        several source/target tiles plus ragged remainders."""
        src, tgt = _mk(n_src=77, n_tgt=45, seed=3)
        re_x, im_x = wave.propagate(src, tgt, EUV, backend="xla")
        re_p, im_p = hk.propagate_pallas(src, tgt, EUV, target_tile=16,
                                         source_tile=32, interpret=True)
        ux = np.asarray(re_x) + 1j * np.asarray(im_x)
        up = np.asarray(re_p) + 1j * np.asarray(im_p)
        assert np.abs(up - ux).max() / np.abs(ux).max() < 1e-5

    def test_hard_xray_wavelength(self):
        """0.135 nm (option_energy='hardXray'): 100x larger phases still
        within the df32 budget thanks to the two-step mod-2pi reduction."""
        src, tgt = _mk(seed=5)
        lam = 0.135e-9
        re_x, im_x = wave.propagate(src, tgt, lam, backend="xla")
        re_p, im_p = hk.propagate_pallas(src, tgt, lam, interpret=True)
        ux = np.asarray(re_x) + 1j * np.asarray(im_x)
        up = np.asarray(re_p) + 1j * np.asarray(im_p)
        assert np.abs(up - ux).max() / np.abs(ux).max() < 2e-3


class TestPallasVjp:
    def test_grad_matches_xla(self):
        """jax.grad through backend='pallas' == backend='xla' grads
        (the backward IS the XLA core's VJP by construction, but this
        guards the plumbing: residuals, argument order, ds chain)."""
        src, tgt = _mk(n_src=48, n_tgt=40, seed=7)

        def loss(re, im, ds, pts, backend):
            s = wave.WaveField(pts, re, im, ds)
            r, i = wave.propagate(s, tgt, EUV, backend=backend)
            return jnp.sum(r**2 + i**2)

        args = (src.re, src.im, src.ds, src.points)
        g_p = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, "pallas")
        g_x = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, "xla")
        for gp, gx, name in zip(g_p, g_x, ("re", "im", "ds", "points")):
            gp, gx = np.asarray(gp), np.asarray(gx)
            assert np.all(np.isfinite(gp)), name
            scale = np.abs(gx).max()
            np.testing.assert_allclose(gp, gx, atol=2e-5 * scale,
                                       err_msg=name)

    def test_grad_wrt_targets(self):
        src, tgt = _mk(n_src=32, n_tgt=24, seed=9)

        def loss(tp, backend):
            r, i = wave.propagate(src, tp, EUV, backend=backend)
            return jnp.sum(r**2 + i**2)

        g_p = np.asarray(jax.grad(loss)(tgt, "pallas"))
        g_x = np.asarray(jax.grad(loss)(tgt, "xla"))
        np.testing.assert_allclose(g_p, g_x, atol=2e-5 * np.abs(g_x).max())


class TestBackendSelection:
    def test_xla_backend_never_calls_pallas(self, monkeypatch):
        import akbx.kernels.huygens as mod

        def boom(*a, **k):
            raise AssertionError("pallas called for backend='xla'")

        monkeypatch.setattr(mod, "propagate_pallas", boom)
        src, tgt = _mk(n_src=16, n_tgt=8)
        wave.propagate(src, tgt, EUV, backend="xla")

    def test_pallas_errors_propagate(self, monkeypatch):
        """A broken kernel must raise, not silently degrade (VERDICT #3)."""
        import akbx.kernels.huygens as mod

        def boom(*a, **k):
            raise RuntimeError("mosaic compile failure")

        monkeypatch.setattr(mod, "propagate_pallas", boom)
        src, tgt = _mk(n_src=16, n_tgt=8)
        with pytest.raises(RuntimeError, match="mosaic"):
            wave.propagate(src, tgt, EUV, backend="pallas")
