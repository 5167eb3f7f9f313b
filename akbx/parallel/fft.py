"""Sharded 2D FFT for large-pupil PSFs (BASELINE config 4).

The reference computes its PSF with a single-device ``np.fft.fft2`` on up
to 4096x4096 (pad_factor-inflated) pupils (psf_fft.py:29-125;
Wavecalc_raytrace_fromData_CPU0402.py:191 evidences the 4096^2 scale).  On
a TPU pod slice that transform must be distributed: a padded 4096^2
complex pupil times pad_factor^2 does not fit one chip's HBM, and the
transform itself is bandwidth-bound.

TPU-native design — the classic distributed-FFT decomposition, expressed
as a ``shard_map`` so XLA schedules the collectives over ICI:

1. rows of ``u`` are sharded over the mesh axis; each chip FFTs its
   resident rows along the contiguous (last) axis;
2. one ``all_to_all`` re-tiles the array from row-sharded to
   column-sharded (the distributed transpose — the only communication);
3. each chip FFTs along the first axis (it now holds full columns);
4. a second ``all_to_all`` restores row sharding so the output layout
   matches the input.

Both forward and inverse transforms carry a ``jax.custom_vjp``: the DFT
matrix is symmetric, so the transpose of the map *is the map itself* —
the backward pass reuses the identical sharded schedule instead of being
re-derived through the shard_map internals (and stays collective-optimal).
Gradient parity with ``jnp.fft.fft2``'s native VJP is covered by
tests/test_fft.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _check_divisible(n: int, m: int, p: int):
    if n % p or m % p:
        raise ValueError(
            f"sharded fft2 needs both sides divisible by the mesh size: "
            f"got {n}x{m} over {p} devices")


def _make_raw_fft2(mesh: Mesh, axis_name: str, inverse: bool):
    """The sharded transform without autodiff wrapping."""
    fft1 = jnp.fft.ifft if inverse else jnp.fft.fft

    def local(u):
        # u: (N/P, M) — full rows resident
        u = fft1(u, axis=1)
        # distributed transpose: row-sharded -> column-sharded, (N, M/P)
        u = jax.lax.all_to_all(u, axis_name, split_axis=1, concat_axis=0,
                               tiled=True)
        u = fft1(u, axis=0)
        # back to row sharding so output layout == input layout
        u = jax.lax.all_to_all(u, axis_name, split_axis=0, concat_axis=1,
                               tiled=True)
        return u

    mapped = jax.shard_map(local, mesh=mesh,
                           in_specs=P(axis_name, None),
                           out_specs=P(axis_name, None))

    @jax.jit
    def fft2(u):
        _check_divisible(u.shape[0], u.shape[1], mesh.devices.size)
        u = jnp.asarray(u)
        if not jnp.issubdtype(u.dtype, jnp.complexfloating):
            u = u.astype(jnp.complex128 if u.dtype == jnp.float64
                         else jnp.complex64)
        return mapped(u)

    return fft2


@functools.lru_cache(maxsize=None)
def _make_fft2_cached(mesh: Mesh, axis_name: str, inverse: bool):
    raw = _make_raw_fft2(mesh, axis_name, inverse)

    @jax.custom_vjp
    def fft2(u):
        return raw(u)

    def fwd(u):
        return raw(u), None

    def bwd(_, g):
        # DFT matrix is symmetric => linear transpose == the transform
        # itself (verified against jnp.fft.fft2's native VJP in tests).
        return (raw(g),)

    fft2.defvjp(fwd, bwd)
    return fft2


def make_fft2(mesh: Mesh, axis_name: str = "rays", inverse: bool = False):
    """Return a differentiable sharded ``fft2`` (or ``ifft2``) for ``mesh``.

    The returned function maps a row-sharded (or replicated) 2D array to
    its 2D DFT with identical sharding; both sides must be divisible by
    the mesh size.  Calls with the same mesh share one compiled program.
    """
    return _make_fft2_cached(mesh, axis_name, inverse)


def shard_rows(mesh: Mesh, u, axis_name: str = "rays"):
    """Place a 2D array with rows sharded over the mesh axis."""
    return jax.device_put(u, NamedSharding(mesh, P(axis_name, None)))


def psf_fft_sharded(opd_m, amp, wavelength_m, pupil_dx_m, focal_length_m,
                    mesh: Mesh, pad_factor: int = 2,
                    window: str | None = None, return_efield: bool = False,
                    pupil_dy_m=None, axis_name: str = "rays"):
    """``analysis.psf.compute_psf_fft`` with the transform sharded over
    ``mesh`` — identical numerics and signature (plus ``mesh``), for
    pupils too large for one chip.  The pre/post processing (mask, window,
    pad, fftshift, normalize) runs under the same jit with row sharding;
    only the fft2 itself needs explicit collectives.

    Pupils whose (even-padded) side is not divisible by the mesh size are
    zero-amplitude-padded up to the next multiple first — physically a
    no-op on the field, it only refines the image-plane sampling relative
    to the unsharded call."""
    from akbx.analysis import psf as _psf

    p = mesh.devices.size
    opd_m = jnp.atleast_2d(jnp.asarray(opd_m))
    amp = jnp.atleast_2d(jnp.asarray(amp))
    ny, nx = amp.shape
    # mirror compute_psf_fft's even-size pad, then round up to mesh multiple
    tgt_y = -((ny + ny % 2) // -p) * p
    tgt_x = -((nx + nx % 2) // -p) * p
    if (tgt_y, tgt_x) != (ny, nx):
        pad = ((0, tgt_y - ny), (0, tgt_x - nx))
        opd_m = jnp.pad(opd_m, pad)
        amp = jnp.pad(amp, pad)  # zero amplitude: field unchanged

    fft2 = make_fft2(mesh, axis_name)

    def fft2_shifted(U):
        U = shard_rows(mesh, U, axis_name)
        return jnp.fft.fftshift(fft2(jnp.fft.ifftshift(U)))

    return _psf.compute_psf_fft(
        opd_m, amp, wavelength_m, pupil_dx_m, focal_length_m,
        pad_factor=pad_factor, window=window, return_efield=return_efield,
        pupil_dy_m=pupil_dy_m, fft2_shifted_fn=fft2_shifted)
