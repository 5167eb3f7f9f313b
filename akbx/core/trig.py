"""Precision-safe transcendentals for TPU scalar paths.

Hardware finding (measured on TPU v5e via this repo's tests): XLA:TPU lowers
f64 transcendentals of *scalar-shaped* operands (rank-0 or single-element
arrays) through a path that is only f32-accurate — e.g.
``cos(5.667e-4)`` comes back with a 1.8e-8 absolute error — while the same
op on arrays of >= 2 elements is accurate to ~4e-15.  A 1.8e-8 error in a
mirror-placement rotation angle shifts 146 m lever arms by microns, which is
fatal for nm-scale wavefront work.

These wrappers force vector-path evaluation for small operands by stacking
the operand with a decoy value (a plain duplicate could legally be rewritten
back to a scalar op by the compiler).  Overhead: one extra lane on setup-
scale scalar math — irrelevant next to the ray-batch work.

Large batches pass through untouched.

Additional finding: f64 ``sin``/``cos`` of large arguments (~1e10, i.e.
optical phases k*r) return NaN on TPU — use :func:`sincos_reduced` which
range-reduces mod 2pi in double-word arithmetic first.
"""

from __future__ import annotations

import jax.numpy as jnp

from akbx.core import precision as pr


def _safe(fn):
    def wrapped(x):
        x = jnp.asarray(x)
        if x.size >= 2:
            return fn(x)
        flat = x.reshape(-1)
        v = flat[0] if flat.size else jnp.zeros((), x.dtype)
        # decoy lane with a different value so the compiler cannot
        # legally collapse the pair back to one scalar op
        pair = jnp.stack([v, 0.25 * v + 0.3])
        return fn(pair)[0].reshape(x.shape)

    wrapped.__name__ = fn.__name__
    return wrapped


sin = _safe(jnp.sin)
cos = _safe(jnp.cos)
tan = _safe(jnp.tan)
arcsin = _safe(jnp.arcsin)
arccos = _safe(jnp.arccos)
arctan = _safe(jnp.arctan)
exp = _safe(jnp.exp)
log = _safe(jnp.log)
sqrt = _safe(jnp.sqrt)


def arctan2(y, x):
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    if y.size >= 2 or x.size >= 2:
        return jnp.arctan2(y, x)
    yf = y.reshape(-1)[0]
    xf = x.reshape(-1)[0]
    pair_y = jnp.stack([yf, 0.25 * yf + 0.3])
    pair_x = jnp.stack([xf, jnp.ones_like(xf)])
    return jnp.arctan2(pair_y, pair_x)[0].reshape(jnp.broadcast_shapes(y.shape, x.shape))


TWO_PI_HI = 6.283185307179586
TWO_PI_LO = 2.4492935982947064e-16  # 2*pi = HI + LO to ~1e-32


def sincos_reduced(phase_hi, phase_lo=None):
    """sin/cos of a (possibly huge) phase, range-reduced mod 2pi.

    ``phase_hi (+ phase_lo)`` is a double-word phase in radians; the
    reduction ``phase - 2pi * round(phase / 2pi)`` is done in double-word
    arithmetic so phases up to ~1e16 rad keep ~1e-10 rad residual accuracy.
    Returns (sin, cos).
    """
    if phase_lo is None:
        phase_lo = jnp.zeros_like(phase_hi)
    n = jnp.round(phase_hi / TWO_PI_HI)
    # phase - n*2pi in double-word
    t1 = pr.two_prod(n, jnp.full_like(n, TWO_PI_HI))
    red = pr.df_add(pr.DF(phase_hi, phase_lo), pr.DF(-t1.hi, -t1.lo))
    red = pr.df_add_f(red, -n * TWO_PI_LO)
    r = red.hi + red.lo
    return jnp.sin(r), jnp.cos(r)
