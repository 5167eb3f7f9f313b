"""Deviation (double-f32) trace path: accuracy vs f64 and an mpmath oracle.

Measured on the Wolter III+I system (zero alignment):
  direct f64 trace   : wavefront (demeaned OPL) noise ~2.8e-10 m rms
  df32 deviation trace: ~7.8e-14 m rms  (~3600x tighter, from f32 pairs)
The deviation trace's absolute error is common-mode (inherited from the
f64 chief constants), so it cancels in every physical observable — this
is the replacement for the reference's mpmath layer (option_mpmath,
AKB_raytrace_20250312.py:91-92) on both the accuracy AND throughput axes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akbx import trace
from akbx.systems import AlignParams, WOLTER_3_1_DEFAULT, build_wolter_3_1


@pytest.fixture(scope="module")
def system():
    return build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros())


def fan(system, n=17):
    rand_p0h = trace.fan_angles(system.fan_h, n)
    rand_p0v = trace.fan_angles(system.fan_v, n)
    rays = trace.ray_fan(rand_p0h, rand_p0v)
    src = system.source[:, None] * jnp.ones((1, n * n))
    return rays, src


def mp_opl(d0, p0, mirrors, dps=50):
    """Arbitrary-precision OPL through the mirror chain (oracle)."""
    from mpmath import mp, mpf
    from mpmath import sqrt as msqrt

    mp.dps = dps
    d = [mpf(float(x)) for x in d0]
    p = [mpf(float(x)) for x in p0]
    nrm = msqrt(sum(x * x for x in d))
    d = [x / nrm for x in d]
    total = mpf(0)
    for m in mirrors:
        c = [mpf(float(x)) for x in np.asarray(m.coeffs)]
        a, b, cc, dd_, e, f, g, h, i_, j = c
        l, mm, nn = d
        px, py, pz = p
        A = a * l * l + b * mm * mm + cc * nn * nn + dd_ * mm * l \
            + e * nn * l + f * mm * nn
        B = (2 * a * px * l + 2 * b * py * mm + 2 * cc * pz * nn
             + dd_ * (px * mm + py * l) + e * (px * nn + pz * l)
             + f * (pz * mm + py * nn) + g * l + h * mm + i_ * nn)
        C = (a * px * px + b * py * py + cc * pz * pz + dd_ * px * py
             + e * px * pz + f * py * pz + g * px + h * py + i_ * pz + j)
        sq = msqrt(B * B - 4 * A * C)
        t = ((-B + sq) / (2 * A) if float(np.asarray(m.branch)) >= 0
             else (-B - sq) / (2 * A))
        total += t
        p = [px + t * l, py + t * mm, pz + t * nn]
        gx = 2 * a * p[0] + dd_ * p[1] + e * p[2] + g
        gy = 2 * b * p[1] + dd_ * p[0] + f * p[2] + h
        gz = 2 * cc * p[2] + e * p[0] + f * p[1] + i_
        gn = msqrt(gx * gx + gy * gy + gz * gz)
        nx, ny, nz = gx / gn, gy / gn, gz / gn
        dot = d[0] * nx + d[1] * ny + d[2] * nz
        d = [d[0] - 2 * dot * nx, d[1] - 2 * dot * ny, d[2] - 2 * dot * nz]
    return total


class TestTraceDF:
    def test_matches_f64_within_f64_noise(self, system):
        """Both paths approximate the exact trace; they must agree within
        the DIRECT f64 path's own grazing-amplified error (~1e-9)."""
        rays, src = fan(system)
        r64 = trace.trace(system, rays, src)
        rdf = trace.trace_df(system, rays, src)
        assert bool(jnp.all(rdf.valid))
        for p64, pdf in zip(r64.points, rdf.points):
            np.testing.assert_allclose(np.asarray(pdf), np.asarray(p64),
                                       atol=2e-9)
        for s64, sdf in zip(r64.segments, rdf.segments):
            np.testing.assert_allclose(np.asarray(sdf), np.asarray(s64),
                                       rtol=0, atol=2e-9)
        np.testing.assert_allclose(np.asarray(rdf.exit_rays),
                                   np.asarray(r64.exit_rays), atol=1e-10)

    def test_beats_f64_against_mpmath_oracle(self, system):
        """The headline property: demeaned-OPL (wavefront) noise of the
        df32 deviation trace is ~1e-13 m, >100x tighter than direct f64."""
        n = 9
        rays, src = fan(system, n)
        r64 = trace.trace(system, rays, src)
        rdf = trace.trace_df(system, rays, src)
        idx = list(range(0, n * n, 8))
        ref = np.array([float(mp_opl(np.asarray(rays[:, k]),
                                     np.asarray(src[:, k]), system.mirrors)
                              - 146) for k in idx])
        o64 = np.asarray(sum(r64.segments))[idx] - 146.0
        odf = np.asarray(sum(rdf.segments))[idx] - 146.0
        e64 = (o64 - ref) - (o64 - ref).mean()
        edf = (odf - ref) - (odf - ref).mean()
        assert np.abs(edf).max() < 1e-12
        assert np.abs(edf).max() < 0.05 * np.abs(e64).max()

    def test_run_precision_df32(self, system):
        res64 = trace.run(system, 17, 17, defocus=0.0, defocus_wave=1e-2)
        resdf = trace.run(system, 17, 17, defocus=0.0, defocus_wave=1e-2,
                          precision="df32")
        assert bool(jnp.all(resdf.valid))
        np.testing.assert_allclose(np.asarray(resdf.detcenter),
                                   np.asarray(res64.detcenter), atol=1e-8)
        # wavefront maps (nm) agree within the f64 path's own noise
        np.testing.assert_allclose(np.asarray(resdf.wave2),
                                   np.asarray(res64.wave2), atol=5e-1)

    def test_df32_differentiates(self, system):
        def loss(vec):
            sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                    AlignParams.from_vector(vec))
            res = trace.run(sys_, 9, 9, defocus=vec[0],
                            exit_pupil_uniform=False, precision="df32")
            sy, sz = trace.spot_size(res.detcenter, res.valid)
            return sy + sz

        g = jax.grad(loss)(jnp.zeros(26, dtype=jnp.float64))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.max(jnp.abs(g))) > 0

    def test_misaligned_system(self, system):
        """Misalignment moves the chief; the deviation form must follow."""
        p = AlignParams.zeros()._replace(defocus=jnp.float64(1e-4))
        vec = p.to_vector().at[2].set(1e-5).at[9].set(2e-5)
        sys_m = build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                 AlignParams.from_vector(vec))
        rays, src = fan(sys_m, 11)
        r64 = trace.trace(sys_m, rays, src)
        rdf = trace.trace_df(sys_m, rays, src)
        assert bool(jnp.all(rdf.valid))
        np.testing.assert_allclose(np.asarray(rdf.points[-1]),
                                   np.asarray(r64.points[-1]), atol=2e-9)

    def test_figure_error_falls_back(self, system):
        m0 = system.mirrors[0]
        fig = jnp.zeros((3, 3)).at[2, 0].set(1e-9)
        half = jnp.array([float(WOLTER_3_1_DEFAULT.length_hyp_v) / 2, 0.01])
        sys_p = system._replace(
            mirrors=(m0._replace(fig_coeffs=fig, uv_half=half),)
            + system.mirrors[1:])
        res = trace.run(sys_p, 9, 9, defocus=0.0, exit_pupil_uniform=False,
                        precision="df32")  # silently uses the f64 path
        assert bool(jnp.all(res.valid))
