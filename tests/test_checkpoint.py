"""Orbax train-state + wavefield checkpoint/resume."""

import numpy as np

import jax.numpy as jnp
import optax

from akbx import checkpoint as ck
from akbx import wave


class TestTrainState:
    def make_state(self):
        params = {"align": jnp.arange(26, dtype=jnp.float64) * 1e-6,
                  "figures": [jnp.ones((2, 3), dtype=jnp.float64) * i
                              for i in range(4)]}
        opt = optax.adam(1e-3)
        return params, opt.init(params)

    def test_roundtrip(self, tmp_path):
        params, opt_state = self.make_state()
        d = str(tmp_path / "ckpt")
        ck.save_train_state(d, 7, params, opt_state,
                            extra={"loss": 1.25})
        state, step, extra = ck.restore_train_state(
            d, like={"params": params, "opt_state": opt_state})
        assert step == 7
        assert extra == {"loss": 1.25}
        np.testing.assert_array_equal(np.asarray(state["params"]["align"]),
                                      np.asarray(params["align"]))
        np.testing.assert_array_equal(
            np.asarray(state["params"]["figures"][3]),
            np.asarray(params["figures"][3]))

    def test_latest_step_resume(self, tmp_path):
        params, opt_state = self.make_state()
        d = str(tmp_path / "ckpt")
        for s in (1, 5, 3):
            ck.save_train_state(d, s, params, opt_state)
        assert ck.latest_step(d) == 5
        _, step, _ = ck.restore_train_state(d)
        assert step == 5

    def test_empty_dir(self, tmp_path):
        state, step, extra = ck.restore_train_state(str(tmp_path / "none"))
        assert state is None and step is None


class TestWaveField:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(3, 12))
        u = rng.normal(size=12) + 1j * rng.normal(size=12)
        f = wave.WaveField.from_complex(pts, u, np.full(12, 1e-6), 4, 3)
        ck.save_wavefield(str(tmp_path), "M1", f)
        g = ck.load_wavefield(str(tmp_path), "M1")
        np.testing.assert_allclose(np.asarray(g.re), np.asarray(f.re))
        np.testing.assert_allclose(np.asarray(g.points), pts)
        assert (g.n_h, g.n_v) == (4, 3)
        assert ck.load_wavefield(str(tmp_path), "missing") is None
