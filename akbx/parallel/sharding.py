"""Multi-chip distribution (the reference's L6 "distributed backend",
TPU-native).

The reference's entire communication story is single-node scatter/gather:
``cp.array_split`` targets over GPUs with a replicated source field and a
thread per device (Wavecalc_raytrace_fromData_GPU0402_multi.py:64-229).

TPU-native equivalents:

* ``ray_mesh``          — 1D/2D ``jax.sharding.Mesh`` over the pod slice;
* ``shard_rays``        — ray batches sharded over the 'rays' axis (pure
  data parallelism over rays: the reference's only strategy, now over ICI);
* ``sharded_trace``     — jit with sharding annotations: XLA inserts the
  collectives (none needed in forward; gradient psum over mirror params is
  inserted automatically and overlapped by the latency-hiding scheduler);
* ``huygens_sharded``   — targets sharded, source replicated (small source
  fields) via ``shard_map``;
* ``huygens_ring``      — ring schedule for large source fields: each chip
  holds a source shard and target shard; source blocks rotate through ICI
  neighbors via ``jax.lax.ppermute`` (ring-attention-style over the
  distance matrix), so per-chip memory is O(N/P + M/P) with no replication;
* ``train_step``        — the flagship multi-chip step: sharded trace +
  wavefront loss, gradients psum'd across the mesh, optimizer update
  (BASELINE config 5).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ray_mesh(n_devices: int | None = None, devices=None,
             axis: str = "rays") -> Mesh:
    """1D device mesh over which ray/target batches shard."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_rays(mesh: Mesh, *arrays, axis_name: str = "rays"):
    """Place (3, N) or (N,) arrays with N sharded over the mesh axis."""
    out = []
    for a in arrays:
        spec = P(axis_name) if a.ndim == 1 else P(*([None] * (a.ndim - 1) + [axis_name]))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def sharded_trace(system, n_h: int, n_v: int, defocus, mesh: Mesh,
                  axis_name: str = "rays", **kw):
    """Run the trace engine with the ray batch sharded over the mesh.

    The fan is constrained to the ray sharding inside jit; XLA keeps every
    per-ray array sharded through the trace.  Mirror pytrees are
    replicated (tiny).
    """
    from akbx import trace as tr

    sharding = NamedSharding(mesh, P(None, axis_name))

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def run(system, n_h, n_v, defocus):
        return tr.run(system, n_h, n_v, defocus, ray_sharding=sharding, **kw)

    return run(system, n_h, n_v, defocus)


def huygens_sharded(source, target_points, wavelength, mesh: Mesh,
                    axis_name: str = "rays", chunk: int = 1024):
    """Huygens propagation with targets sharded, source replicated.

    The per-chip work is an independent slice of the target set — the
    TPU-native version of the reference's ``cp.array_split`` strategy, but
    compiled as one SPMD program (no host threads, no concat copies).
    """
    from akbx import wave

    n_dev = mesh.devices.size
    n = target_points.shape[1]
    pad = (-n) % (n_dev * 128)
    tp = jnp.pad(target_points, ((0, 0), (0, pad)))

    def local(tp_local):
        re, im = wave.propagate(source, tp_local, wavelength, chunk=chunk,
                                use_pallas=False)
        return re, im

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=(P(axis_name), P(axis_name)))
    re, im = jax.jit(mapped)(tp)
    return re[:n], im[:n]


def huygens_ring(source_points, source_re_w, source_im_w, target_points,
                 wavelength, mesh: Mesh, axis_name: str = "rays",
                 chunk: int = 1024):
    """Ring-scheduled Huygens: both sources and targets sharded.

    Each step every chip integrates its resident source block into its
    target accumulator, then rotates the source block to its ring neighbor
    with ``ppermute`` — the communication pattern of ring attention applied
    to the O(N*M) distance kernel.  Communication volume per chip is
    O(M) total, fully overlapped with compute by XLA's scheduler.

    ``source_re_w/im_w`` must already include the ds quadrature weights.
    """
    import math as _math

    from akbx import wave as _wave

    k = 2.0 * _math.pi / wavelength
    n_dev = mesh.devices.size
    axis = axis_name

    n = target_points.shape[1]
    m = source_points.shape[1]
    pad_n = (-n) % (n_dev * 8)
    pad_m = (-m) % (n_dev * 8)
    tp = jnp.pad(target_points, ((0, 0), (0, pad_n)))
    sp = jnp.pad(source_points, ((0, 0), (0, pad_m)))
    sre = jnp.pad(source_re_w, (0, pad_m))
    sim = jnp.pad(source_im_w, (0, pad_m))

    def local(tp_l, sp_l, sre_l, sim_l):
        def body(carry, _):
            sp_l, sre_l, sim_l, acc_re, acc_im = carry
            re, im = _wave._huygens_chunk(tp_l, sp_l, sre_l, sim_l, k)
            acc_re = acc_re + re
            acc_im = acc_im + im
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            sp_l = jax.lax.ppermute(sp_l, axis, perm)
            sre_l = jax.lax.ppermute(sre_l, axis, perm)
            sim_l = jax.lax.ppermute(sim_l, axis, perm)
            return (sp_l, sre_l, sim_l, acc_re, acc_im), None

        # the accumulator is per-shard data ("varying" over the mesh axis);
        # mark the all-zero init accordingly so scan's carry types match
        zero = jnp.zeros(tp_l.shape[1], dtype=jnp.float64)
        zero = jax.lax.pcast(zero, (axis,), to="varying")
        (sp_l, sre_l, sim_l, acc_re, acc_im), _ = jax.lax.scan(
            body, (sp_l, sre_l, sim_l, zero, zero), None, length=n_dev)
        return acc_re, acc_im

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)))
    re, im = jax.jit(mapped)(tp, sp, sre, sim)
    return re[:n], im[:n]


def make_train_step(spec, loss_fn, optimizer, n_h: int, n_v: int,
                    mesh: Mesh, axis_name: str = "rays",
                    unit_coupled: bool = False):
    """Build the flagship multi-chip training step (BASELINE config 5):

    gradient-based mirror figure-error + alignment optimization.  Rays are
    sharded over the mesh inside the jitted step; gradients of the
    (replicated) mirror parameters are reduced by XLA-inserted psums
    overlapped with the backward pass.

    ``loss_fn(system, engine_result) -> scalar``.
    Returns ``step(opt_state, params_pytree) -> (opt_state, params, loss)``
    where ``params_pytree = {"align": (26,), "figures": [per-mirror coeff
    arrays]}``.
    """
    from akbx import trace as tr
    from akbx.systems import AlignParams, build_wolter_3_1

    def build(params):
        align = AlignParams.from_vector(params["align"])
        sys_ = build_wolter_3_1(spec, align, unit_coupled=unit_coupled)
        mirrors = []
        for m, fig in zip(sys_.mirrors, params["figures"]):
            mirrors.append(m._replace(fig_coeffs=fig))
        return sys_._replace(mirrors=tuple(mirrors))

    def loss(params):
        sys_ = build(params)
        res = tr.run(sys_, n_h, n_v, defocus=params["align"][0],
                     exit_pupil_uniform=False)
        return loss_fn(sys_, res)

    @jax.jit
    def step(opt_state, params):
        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return opt_state, params, val

    return step, loss, build
