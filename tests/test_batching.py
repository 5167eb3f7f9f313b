"""Host-batched giant-fan streaming (BASELINE config 5 machinery)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from akbx import trace
from akbx.parallel import batching, sharding as sh
from akbx.systems import AlignParams, WOLTER_3_1_DEFAULT, build_wolter_3_1


def cpu_mesh(n=8):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return sh.ray_mesh(n, devices=devs[:n])


class TestTraceStreamed:
    def setup_method(self):
        self.sys = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros())

    def reference_stats(self, n_h, n_v):
        # jit the unstreamed reference: the streamed blocks run under jit,
        # and XLA fusion (FMA contraction) vs eager op-by-op dispatch
        # changes rounding at the ulp level, which the grazing 4-bounce
        # trace amplifies ~1e8x (same conditioning that forced the
        # reference onto mpmath).  jit-to-jit, per-ray results are
        # bit-identical across batch sizes.
        run = jax.jit(lambda s: trace.run(s, n_h, n_v, defocus=0.0,
                                          exit_pupil_uniform=False,
                                          tilt_correction=False))
        res = run(self.sys)
        det = np.asarray(res.detcenter)
        v = np.asarray(res.valid)
        return det[1:3, v], v.sum()

    def test_matches_unstreamed(self):
        n_h, n_v = 16, 24
        stats = batching.trace_streamed(self.sys, n_h, n_v, 0.0,
                                        block_rows=7)  # uneven tail block
        yz, n_valid = self.reference_stats(n_h, n_v)
        assert int(stats.n) == n_valid
        np.testing.assert_allclose(np.asarray(stats.centroid),
                                   yz.mean(axis=1), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(stats.spot_std),
                                   yz.std(axis=1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(stats.min_yz),
                                   yz.min(axis=1), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(stats.max_yz),
                                   yz.max(axis=1), rtol=1e-8)

    def test_opl_std_matches(self):
        n_h, n_v = 12, 12
        stats = batching.trace_streamed(self.sys, n_h, n_v, 0.0,
                                        block_rows=12)
        res = trace.run(self.sys, n_h, n_v, defocus=0.0,
                        exit_pupil_uniform=False, tilt_correction=False)
        np.testing.assert_allclose(float(stats.opl_std),
                                   float(jnp.std(res.total_dist)),
                                   rtol=1e-6)

    def test_sharded_blocks(self):
        mesh = cpu_mesh(8)
        stats = batching.trace_streamed(self.sys, 16, 16, 0.0,
                                        block_rows=8, mesh=mesh)
        yz, n_valid = self.reference_stats(16, 16)
        assert int(stats.n) == n_valid
        np.testing.assert_allclose(np.asarray(stats.centroid),
                                   yz.mean(axis=1), rtol=1e-8)

    def test_progress_called(self):
        calls = []
        batching.trace_streamed(self.sys, 8, 20, 0.0, block_rows=6,
                                progress=lambda b, n: calls.append((b, n)))
        assert calls[-1] == (4, 4)
