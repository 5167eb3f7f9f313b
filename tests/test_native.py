"""Native C++/OpenMP runtime: build, parity, performance sanity."""

import numpy as np
import pytest

from akbx import native, wave

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

RNG = np.random.default_rng(17)


def test_huygens_matches_numpy_oracle():
    lam = 13.5e-9
    k = 2 * np.pi / lam
    src = np.array([1.0, 0.0, 0.0])[:, None] + RNG.normal(size=(3, 200)) * 0.01
    tgt = np.array([1.5, 0.0, 0.0])[:, None] + RNG.normal(size=(3, 150)) * 0.01
    u0 = np.exp(1j * RNG.uniform(0, 2 * np.pi, 200))
    ds = RNG.uniform(0.5, 1.5, 200) * 1e-9
    w = u0 * ds
    re, im = native.huygens_propagate(tgt, src, w.real, w.imag, k)
    # numpy oracle
    ref = np.zeros(150, dtype=complex)
    for i in range(150):
        r = np.sqrt(((tgt[:, i:i+1] - src) ** 2).sum(axis=0))
        ref[i] = np.sum(w * np.exp(-1j * k * r) / r)
    got = re + 1j * im
    # FMA contraction under -march=native perturbs r by ~1 ulp; with
    # k*r ~ 5e8 that is ~1e-7 rad of phase — compare absolutely against the
    # field scale, not relatively near zero crossings
    np.testing.assert_allclose(got, ref, atol=3e-7 * np.abs(ref).max())


def test_calc_ds_matches_jax():
    import jax.numpy as jnp

    n_v, n_h = 7, 9
    yy, zz = np.meshgrid(np.linspace(0, 1, n_h), np.linspace(0, 2, n_v))
    pts = np.stack([0.05 * RNG.normal(size=yy.shape), yy, zz]).reshape(3, -1)
    ours = native.calc_ds(pts, n_v, n_h)
    ref = np.asarray(wave.calc_ds(jnp.array(pts), n_v, n_h))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_multithreaded():
    assert native.num_threads() >= 1


def test_throughput_beats_pure_python_scale():
    """Sanity: the native engine beats a vectorized-numpy implementation of
    the same sum (the reference's non-numba fallback shape) by a wide
    margin.  Relative, not absolute: an absolute pairs/s floor flaked
    whenever the host was loaded (round-2/3 snapshots both shipped it red
    while a TPU bench shared the machine)."""
    import time

    lam = 13.5e-9
    k = 2 * np.pi / lam
    M, N = 4096, 4096
    src = np.array([1.0, 0, 0])[:, None] + RNG.normal(size=(3, M)) * 0.01
    tgt = np.array([1.5, 0, 0])[:, None] + RNG.normal(size=(3, N)) * 0.01
    w = np.exp(1j * RNG.uniform(0, 2 * np.pi, M)) * 1e-9
    native.huygens_propagate(tgt[:, :16], src, w.real, w.imag, k)  # warm
    t0 = time.time()
    native.huygens_propagate(tgt, src, w.real, w.imag, k)
    dt = time.time() - t0

    n_py = 256  # numpy timing on a slice, same per-pair work
    t0 = time.time()
    r = np.sqrt(((tgt[:, :n_py, None] - src[:, None, :]) ** 2).sum(axis=0))
    (w[None, :] * np.exp(-1j * k * r) / r).sum(axis=1)
    dt_py = (time.time() - t0) * (N / n_py)
    assert dt_py / dt > 2.0, \
        f"native {N*M/dt:.2e} pairs/s vs numpy {N*M/dt_py:.2e}"
