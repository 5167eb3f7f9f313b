"""The Pallas deviation-trace fast path (akbx.kernels.trace_kernel).

Off-TPU these run the kernel's pure-jnp twin (``trace_deviation_reference``
— the exact ``bounce_chain`` arithmetic, same outputs contract), so CI
validates the kernel math; the Mosaic lowering itself is exercised on
hardware by the driver bench (BENCH artifacts).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akbx import trace
from akbx.systems import AlignParams, WOLTER_3_1_DEFAULT, build_wolter_3_1


def make_system():
    return build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros())


def _total(vec, fn):
    """Sum of per-ray OPL legs of a 5x5 fan under trace engine ``fn``."""
    sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.from_vector(vec))
    rays = trace.ray_fan(trace.fan_angles(sys_.fan_h, 5),
                         trace.fan_angles(sys_.fan_v, 5))
    src = sys_.source[:, None] * jnp.ones((1, 25))
    res = fn(sys_, rays, src)
    return sum(res.segments)


class TestForwardParity:
    def test_matches_f64_trace(self):
        """Points/segments/detector/wavefront of precision='pallas' match
        the f64 engine to deviation-trace quality (sub-nm)."""
        sys_ = make_system()
        r0 = trace.run(sys_, 9, 9, defocus=0.0, exit_pupil_uniform=False)
        r1 = trace.run(sys_, 9, 9, defocus=0.0, exit_pupil_uniform=False,
                       precision="pallas")
        assert bool(jnp.all(r1.valid))
        for i in range(4):
            np.testing.assert_allclose(np.asarray(r1.trace.points[i]),
                                       np.asarray(r0.trace.points[i]),
                                       atol=5e-9)
        np.testing.assert_allclose(np.asarray(r1.detcenter),
                                   np.asarray(r0.detcenter), atol=5e-9)
        w0 = r0.total_dist - r0.total_dist.mean()
        w1 = r1.total_dist - r1.total_dist.mean()
        # demeaned OPL (the wavefront signal): deviation-trace accuracy
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w0),
                                   atol=1e-9)
        for i in range(4):
            np.testing.assert_allclose(np.asarray(r1.trace.normals[i]),
                                       np.asarray(r0.trace.normals[i]),
                                       atol=1e-7)


class TestDevFields:
    def test_dev_fields_match_materialized(self):
        """The f32 deviation outputs (w32, ddet32) agree with the f64
        materialized fields — same physics, chief constant removed."""
        sys_ = make_system()
        r = trace.run(sys_, 9, 9, defocus=0.0, exit_pupil_uniform=False,
                      precision="pallas")
        w64 = r.total_dist - trace.masked_mean(r.total_dist, r.valid)
        np.testing.assert_allclose(np.asarray(r.w32), np.asarray(w64),
                                   atol=2e-9)
        # detcenter deviations: demeaned ddet32 == demeaned detcenter
        dd = np.asarray(r.detcenter)
        dd = dd - dd.mean(axis=1, keepdims=True)
        d32 = np.asarray(r.ddet32)
        d32 = d32 - d32.mean(axis=1, keepdims=True)
        np.testing.assert_allclose(d32, dd, atol=1e-8)

    def test_dev_loss_grad_matches(self):
        """grad of the deviation-form loss == grad of the f64-field loss
        (both flow through the same custom_vjp twin)."""

        def loss(vec, dev):
            sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                    AlignParams.from_vector(vec))
            res = trace.run(sys_, 9, 9, defocus=vec[0],
                            exit_pupil_uniform=False, precision="pallas")
            if dev:
                sy, sz = trace.spot_size(res.ddet32, res.valid)
                return (jnp.sum(jnp.where(res.valid, res.w32, 0.0) ** 2)
                        * 1e18 + sy + sz)
            w = res.total_dist - trace.masked_mean(res.total_dist,
                                                   res.valid)
            sy, sz = trace.spot_size(res.detcenter, res.valid)
            return (jnp.sum(jnp.where(res.valid, w, 0.0) ** 2) * 1e18
                    + sy + sz)

        v0 = jnp.zeros(26)
        g64 = np.asarray(jax.grad(lambda v: loss(v, False))(v0))
        g32 = np.asarray(jax.grad(lambda v: loss(v, True))(v0))
        scale = np.abs(g64).max()
        rel = np.abs(g32 - g64) / np.maximum(np.abs(g64), scale * 1e-6)
        assert rel.max() < 1e-3, rel.max()


class TestBackward:
    def test_grad_matches_f64_path(self):
        """jax.grad through precision='pallas' (custom_vjp: backward =
        plain-f32 deviation trace's VJP) agrees with the f64 engine's
        gradients to ~2e-4 relative — the EFT error terms' derivatives
        are ~0, so the f32 linearization shares the Jacobian (measured
        round 3; plenty for optimization loops)."""

        def loss(vec, precision):
            sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                    AlignParams.from_vector(vec))
            res = trace.run(sys_, 9, 9, defocus=vec[0],
                            exit_pupil_uniform=False, precision=precision)
            w = res.total_dist - trace.masked_mean(res.total_dist,
                                                   res.valid)
            sy, sz = trace.spot_size(res.detcenter, res.valid)
            return (jnp.sum(jnp.where(res.valid, w, 0.0) ** 2) * 1e18
                    + sy + sz)

        v0 = jnp.zeros(26)
        g64 = np.asarray(jax.grad(lambda v: loss(v, "f64"))(v0))
        gpl = np.asarray(jax.grad(lambda v: loss(v, "pallas"))(v0))
        scale = np.abs(g64).max()
        rel = np.abs(gpl - g64) / np.maximum(np.abs(g64), scale * 1e-6)
        assert rel.max() < 1e-3, rel.max()

    def test_dev32_jacobian_matches_f64(self):
        """The f32 deviation trace (the backward twin) linearizes like the
        f64 engine: jvp of total OPL wrt a pitch tangent agrees to f32
        precision.  (The f64 trace is the stronger oracle here — trace_df's
        Jacobian equals it far below these tolerances — and its forward-mode
        graph compiles in seconds, where jvp-through-trace_df's double-word
        scan needs >25 min of XLA:CPU compile; that variant is the
        slow-marked test below.)"""
        v0 = jnp.zeros(26)
        tangent = jnp.zeros(26).at[2].set(1.0)  # hyp_V pitch
        _, j_64 = jax.jvp(lambda v: _total(v, trace.trace), (v0,),
                          (tangent,))
        _, j_32 = jax.jvp(lambda v: _total(v, trace.trace_dev32), (v0,),
                          (tangent,))
        # the dev32 Jacobian carries plain-f32 rounding of O(1e-3)-scale
        # entries -> ~1e-6 absolute floor (measured 7.6e-7 max); rtol
        # alone would demand f64-grade agreement on the smallest entries
        np.testing.assert_allclose(np.asarray(j_32), np.asarray(j_64),
                                   rtol=1e-3, atol=3e-6)

    @pytest.mark.slow
    def test_dev32_jacobian_matches_df_slow(self):
        """Direct df32-scan comparison (jvp through trace_df's double-word
        ops; ~25-40 min of XLA:CPU compile on a 2-vCPU host — slow-marked)."""
        v0 = jnp.zeros(26)
        tangent = jnp.zeros(26).at[2].set(1.0)
        _, j_df = jax.jvp(lambda v: _total(v, trace.trace_df), (v0,),
                          (tangent,))
        _, j_32 = jax.jvp(lambda v: _total(v, trace.trace_dev32), (v0,),
                          (tangent,))
        np.testing.assert_allclose(np.asarray(j_32), np.asarray(j_df),
                                   rtol=2e-4, atol=1e-10)
