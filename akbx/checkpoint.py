"""Checkpoint / resume of optimization and propagation state (orbax).

The reference's only resume mechanisms are per-stage ``complex_data_M*.npz``
caches (Wavecalc_raytrace_fromData_CPU0402.py:261-347) and re-parsed
``optical_params.txt`` files (AKB_raytrace_20250312.py:14506-14576).  The
stage caches are reproduced in :class:`akbx.io.StageCache`; this module
adds the TPU-native training side (SURVEY.md §5): orbax checkpoints of
(alignment params, mirror figure-error coefficients, optimizer state,
step counter), sharding-aware so multi-chip runs restore onto the same
mesh layout.

Orbax is used through the modern ``StandardCheckpointer`` API; directories
are self-describing (one subdir per step).
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(directory: str, step: int, params, opt_state=None,
                     extra=None):
    """Save a training state pytree at ``directory/step_<N>``.

    ``params``: pytree (e.g. {"align": (26,), "figures": [...]}).
    ``opt_state``: optax state pytree (optional).
    ``extra``: small JSON-able dict (loss history tail, config digest).
    """
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckpt = _checkpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()
    if extra is not None:
        import json

        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f)
    return path


def latest_step(directory: str):
    """Highest step with a checkpoint under ``directory`` (None if empty)."""
    if not os.path.isdir(directory):
        return None
    steps = [int(m.group(1)) for name in os.listdir(directory)
             if (m := re.fullmatch(r"step_(\d+)", name))]
    return max(steps) if steps else None


def restore_train_state(directory: str, step: int | None = None,
                        like=None):
    """Restore (state, step, extra).  ``like``: matching abstract pytree
    (concrete arrays work) so dtypes/shardings restore exactly; without it
    orbax returns numpy arrays."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None, None, None
    path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
    ckpt = _checkpointer()
    if like is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                           sharding=getattr(x, "sharding", None))
            if hasattr(x, "dtype") else x, like)
        state = ckpt.restore(path, abstract)
    else:
        # No target tree: restore as plain numpy.  A bare restore() would
        # re-create the *saved* shardings, which fails whenever the device
        # set changed between save and restore (e.g. checkpoint written on
        # the CPU backend, restored in a process whose default backend is a
        # TPU — jax.local_devices() no longer contains TFRT_CPU_0).
        import orbax.checkpoint as ocp

        handler_ckpt = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        meta = handler_ckpt.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        state = handler_ckpt.restore(path, restore_args=restore_args)
    extra = None
    extra_path = os.path.join(path, "extra.json")
    if os.path.exists(extra_path):
        import json

        with open(extra_path) as f:
            extra = json.load(f)
    return state, step, extra


def save_wavefield(directory: str, name: str, field):
    """Checkpoint a :class:`akbx.wave.WaveField` (npz, reference-format
    compatible complex field + geometry)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"wavefield_{name}.npz")
    np.savez(path, points=np.asarray(field.points), re=np.asarray(field.re),
             im=np.asarray(field.im), ds=np.asarray(field.ds),
             n_h=field.n_h, n_v=field.n_v)
    return path


def load_wavefield(directory: str, name: str):
    from akbx.wave import WaveField

    path = os.path.join(directory, f"wavefield_{name}.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    import jax.numpy as jnp

    return WaveField(jnp.asarray(z["points"]), jnp.asarray(z["re"]),
                     jnp.asarray(z["im"]), jnp.asarray(z["ds"]),
                     int(z["n_h"]), int(z["n_v"]))
