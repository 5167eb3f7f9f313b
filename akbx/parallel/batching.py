"""Host-batched giant-fan tracing (BASELINE config 5: 1e9 rays).

A 1e9-ray fan does not fit in HBM as one batch (each per-ray f64 array is
8 GB).  The reference's answer to large N is target chunking sized to GPU
memory (Wavecalc_raytrace_fromData_GPU0402.py:147-165).  The TPU-native
equivalent: stream *row blocks* of the fan through one jitted
trace-and-reduce step — rays sharded over the mesh inside each step (ICI),
block streaming over steps (host/DCN level) — and merge sufficient
statistics on device, so the host never materializes per-ray data at all.

Statistics per block: valid count, spot centroid/second moments on the
focal plane, OPL mean/variance (Chan/Welford parallel merge), min/max
extents.  Adding a histogram is one more reduce.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from akbx import trace as tr


class SpotStats(NamedTuple):
    """Mergeable sufficient statistics of a ray batch."""

    n: jnp.ndarray          # valid-ray count
    sum_yz: jnp.ndarray     # (2,) detector y/z sums
    sumsq_yz: jnp.ndarray   # (2,) detector y/z squared sums
    sum_opl: jnp.ndarray    # OPL sums, pivot-shifted by det_x (a ~146 m
    sumsq_opl: jnp.ndarray  # path squared in f64 would drown the ~1e-4 std)
    min_yz: jnp.ndarray     # (2,)
    max_yz: jnp.ndarray     # (2,)

    @staticmethod
    def zero():
        return SpotStats(jnp.zeros(()), jnp.zeros(2), jnp.zeros(2),
                         jnp.zeros(()), jnp.zeros(()),
                         jnp.full(2, jnp.inf), jnp.full(2, -jnp.inf))

    def merge(self, other: "SpotStats") -> "SpotStats":
        return SpotStats(self.n + other.n,
                         self.sum_yz + other.sum_yz,
                         self.sumsq_yz + other.sumsq_yz,
                         self.sum_opl + other.sum_opl,
                         self.sumsq_opl + other.sumsq_opl,
                         jnp.minimum(self.min_yz, other.min_yz),
                         jnp.maximum(self.max_yz, other.max_yz))

    @property
    def centroid(self):
        return self.sum_yz / jnp.maximum(self.n, 1.0)

    @property
    def spot_std(self):
        m = self.centroid
        var = self.sumsq_yz / jnp.maximum(self.n, 1.0) - m**2
        return jnp.sqrt(jnp.maximum(var, 0.0))

    @property
    def opl_std(self):
        m = self.sum_opl / jnp.maximum(self.n, 1.0)
        var = self.sumsq_opl / jnp.maximum(self.n, 1.0) - m**2
        return jnp.sqrt(jnp.maximum(var, 0.0))


def _block_stats(system, angles_h, angles_v, det_x, ray_sharding):
    """Trace one (n_v_block x n_h) sub-fan and reduce to SpotStats."""
    rays = tr.ray_fan(angles_h, angles_v)
    src = system.source[:, None] * jnp.ones((1, rays.shape[1]))
    if ray_sharding is not None:
        rays = jax.lax.with_sharding_constraint(rays, ray_sharding)
        src = jax.lax.with_sharding_constraint(src, ray_sharding)
    result = tr.trace(system, rays, src)
    det = tr.detector_points(result, det_x)
    d_last = jnp.linalg.norm(det - result.exit_points, axis=0)
    opl = sum(result.segments) + d_last - det_x
    w = result.valid.astype(det.dtype)
    yz = det[1:3]
    yz_m = jnp.where(result.valid[None, :], yz, 0.0)
    opl_m = jnp.where(result.valid, opl, 0.0)
    big = jnp.where(result.valid[None, :], yz, jnp.inf)
    small = jnp.where(result.valid[None, :], yz, -jnp.inf)
    return SpotStats(jnp.sum(w),
                     jnp.sum(yz_m, axis=1),
                     jnp.sum(yz_m**2, axis=1),
                     jnp.sum(opl_m), jnp.sum(opl_m**2),
                     jnp.min(big, axis=1), jnp.max(small, axis=1))


def trace_streamed(system, n_h: int, n_v: int, defocus,
                   block_rows: int = 1024, mesh=None,
                   axis_name: str = "rays", progress=None) -> SpotStats:
    """Trace an ``n_h x n_v`` fan of arbitrary size in row blocks.

    ``block_rows`` rows of the fan (``block_rows * n_h`` rays) are traced
    per jitted step; statistics merge on device.  With ``mesh`` given, each
    block is internally sharded over the mesh (one SPMD program per block,
    XLA collectives on ICI; block streaming rides the host/DCN level).

    1e9 rays = e.g. n_h = 31623 = n_v at block_rows*n_h ~ 3e7 per step.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = (NamedSharding(mesh, P(None, axis_name))
                if mesh is not None else None)
    angles_h = tr.fan_angles(system.fan_h, n_h)
    det_x = system.s2f_middle + defocus

    step = jax.jit(functools.partial(_block_stats, ray_sharding=sharding))

    # Row angles must be BIT-identical to the unstreamed fan: the grazing
    # 4-bounce trace amplifies a 1-ulp angle difference by ~1e8 (the same
    # conditioning that forced the reference onto mpmath), so recomputing
    # linspace per block with a different op order shows up as ~1e-8
    # relative detector error.  Slice the one linspace instead.
    angles_v_full = tr.fan_angles(system.fan_v, n_v)
    stats = SpotStats.zero()
    n_blocks = -(n_v // -block_rows)
    for b in range(n_blocks):
        r0 = b * block_rows
        r1 = min(n_v, r0 + block_rows)
        angles_v = angles_v_full[r0:r1]
        if r1 - r0 < block_rows:  # pad the tail block to keep one jit cache
            pad = block_rows - (r1 - r0)
            angles_v = jnp.pad(angles_v, (0, pad), constant_values=jnp.nan)
        block = step(system, angles_h, angles_v, det_x)
        stats = stats.merge(block)
        if progress is not None:
            progress(b + 1, n_blocks)
    return stats
