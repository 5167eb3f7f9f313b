"""Engine-internal utilities (SURVEY.md §2.9) + observability helpers.

Parity targets in AKB_raytrace_20250312.py: ``crop`` (:154-161),
``sigmoid``/``create_non_uniform_distribution`` (:340-382),
``angle_between_2vector`` (:343-374, vectorized here),
``CalcDataPitch`` (:384-395), ``downsample_array_3_n`` /
``downsample_array_any_n`` (:13336-13416), plus the stdout tee
(``DualOutput``, Wavecalc_raytrace_fromData_GPU0402_multi.py:354-366) and
simple wall-clock stage timers replacing the reference's print-based
profiling (CPU0402.py:40-52) with ``jax.profiler``-compatible scopes.
"""

from __future__ import annotations

import contextlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def crop_indices(start: int, end: int, step: int):
    """Thinned index list (parity: ``crop``, reference :154-161)."""
    return list(range(end + 1))[start:end:step]


def sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def non_uniform_distribution(start, end, num_points: int):
    """Edge-dense sampling via a sigmoid ramp.

    Parity: ``create_non_uniform_distribution`` (reference :375-382).
    """
    lin = jnp.linspace(-6.0, 6.0, num_points)
    s = sigmoid(lin)
    scaled = (s - s.min()) / (s.max() - s.min())
    return start + (end - start) * scaled


def angle_between(ray1: jnp.ndarray, ray2: jnp.ndarray):
    """Angles between ray batches + per-ray y/x and z/x angles.

    Parity: ``angle_between_2vector`` (reference :343-374) — the reference
    loops per ray in Python; this is one fused batch computation.
    Returns (angle_between (N,), angle_yx (N,), angle_zx (N,)).
    """
    dot = jnp.sum(ray1 * ray2, axis=0)
    cx = ray1[1] * ray2[2] - ray1[2] * ray2[1]
    cy = ray1[2] * ray2[0] - ray1[0] * ray2[2]
    cz = ray1[0] * ray2[1] - ray1[1] * ray2[0]
    cross = jnp.sqrt(cx**2 + cy**2 + cz**2)
    between = jnp.arctan2(cross, dot)
    ok = ray1[0] != 0
    yx = jnp.where(ok, jnp.arctan2(ray1[1], ray1[0]), jnp.nan)
    zx = jnp.where(ok, jnp.arctan2(ray1[2], ray1[0]), jnp.nan)
    return between, yx, zx


def data_pitch(points: jnp.ndarray, n_v: int, n_h: int):
    """Mean grid pitches of a (3, N) surface grid in y and z.

    Parity: ``CalcDataPitch`` (reference :384-395) — returns the values
    instead of printing.
    """
    y = points[1].reshape(n_v, n_h)
    z = points[2].reshape(n_v, n_h)
    return {
        "dy_rows": float(jnp.mean(jnp.diff(y, axis=0))),
        "dy_cols": float(jnp.mean(jnp.diff(y, axis=1))),
        "dz_rows": float(jnp.mean(jnp.diff(z, axis=0))),
        "dz_cols": float(jnp.mean(jnp.diff(z, axis=1))),
    }


def downsample_grid(array, n_v: int, n_h: int, down_h: int = 0, down_v: int = 0):
    """Power-of-2 grid decimation of (m, n_v*n_h) data.

    ``down`` semantics follow the reference (0=keep, 2=half, 4=quarter,
    6=eighth — each step of 2 halves once): ``downsample_array_3_n`` /
    ``downsample_array_any_n`` (reference :13336-13416).
    Returns (decimated (m, n_v'*n_h'), n_v', n_h').
    """
    a = jnp.asarray(array)
    if a.ndim == 1:
        a = a[None, :]
    m = a.shape[0]
    g = a.reshape(m, n_v, n_h)
    for _ in range(down_h // 2):
        g = g[:, :, ::2]
    for _ in range(down_v // 2):
        g = g[:, ::2, :]
    out_v, out_h = g.shape[1], g.shape[2]
    return g.reshape(m, out_v * out_h), out_v, out_h


class TeeOutput:
    """Tee stdout to a log file (parity: ``DualOutput``,
    _GPU0402_multi.py:354-366)."""

    def __init__(self, path: str, stream=None):
        self.file = open(path, "a")
        self.stream = stream or sys.stdout

    def write(self, data):
        self.stream.write(data)
        self.file.write(data)

    def flush(self):
        self.stream.flush()
        self.file.flush()

    def close(self):
        self.file.close()


@contextlib.contextmanager
def stage_timer(name: str, log=print):
    """Wall-clock stage timing + jax.profiler trace annotation.

    Replaces the reference's per-stage prints (CPU0402.py:40-52).
    """
    with jax.profiler.TraceAnnotation(name):
        t0 = time.time()
        yield
        log(f"[{name}] {time.time() - t0:.3f} s")


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a full ``jax.profiler`` device trace into ``log_dir``
    (view with TensorBoard / xprof).  The TPU-native replacement for the
    reference's wall-clock prints and GPU memory telemetry
    (_GPU0402.py:166-170)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def progress_chunks(total: int, fraction: float = 0.01):
    """Chunk boundaries for coarse progress reporting (the reference's
    1%-increment loop, CPU0402.py:114-123)."""
    step = max(int(total * fraction), 1)
    return [(i, min(i + step, total)) for i in range(0, total, step)]
