"""2D Legendre aberration decomposition (L5).

jnp re-implementation of ``legendre_fit.py`` (reference :45-101): project a
wavefront map onto the outer products P_ny(y) x P_nx(x) over the triangular
order set {(nx, ny): nx + ny < order}, normalized by the root of the
discrete sum of squares, NaN-aware.

Fully differentiable: used both post hoc (parity with the reference) and
inside gradient-based alignment losses.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def legendre_1d(x: jnp.ndarray, order: int) -> jnp.ndarray:
    """P_0..P_{order-1}(x), shape (order,) + x.shape (recurrence)."""
    outs = [jnp.ones_like(x)]
    if order > 1:
        outs.append(x)
    for n in range(1, order - 1):
        outs.append(((2 * n + 1) * x * outs[n] - n * outs[n - 1]) / (n + 1))
    return jnp.stack(outs)


def component(shape, nx: int, ny: int) -> jnp.ndarray:
    """outer(P_ny(y), P_nx(x)) on the [-1,1]^2 grid of ``shape``.

    Parity: ``aberration_legendre_component`` (legendre_fit.py:45-57) —
    note the reference builds x over ``data.shape[0]`` (rows) and y over
    ``data.shape[1]`` then outer(Py, Px), so x runs along *columns* of the
    output only when the data is square; we reproduce the same convention.
    """
    x = jnp.linspace(-1.0, 1.0, shape[0])
    y = jnp.linspace(-1.0, 1.0, shape[1])
    Px = legendre_1d(x, nx + 1)[nx]
    Py = legendre_1d(y, ny + 1)[ny]
    return jnp.outer(Py, Px)


def match(data: jnp.ndarray, nx: int, ny: int):
    """Project data onto one normalized Legendre mode.

    Parity: ``match_legendre`` (legendre_fit.py:59-73).
    Returns (fit_map, inner_product).
    """
    Z = component(data.shape, nx, ny)
    Z = Z / jnp.sqrt(jnp.nansum(Z * Z))
    mask = jnp.isfinite(data)
    ip = jnp.nansum(jnp.where(mask, Z * data, 0.0))
    return ip * Z, ip


def triangular_orders(order: int):
    """[(ny, nx)] with nx + ny < order, reference iteration order
    (legendre_fit.py:84-93: i outer, j <= i, nx=j, ny=i-j)."""
    orders = []
    for i in range(order):
        for j in range(order):
            if j <= i:
                orders.append((i - j, j))
    return orders


def match_multi(data: jnp.ndarray, order: int):
    """All modes with nx+ny < order.

    Parity: ``match_legendre_multi`` (legendre_fit.py:75-94).
    Returns (fit_maps (n, H, W), inner_products (n,), orders list[(ny,nx)]).
    """
    orders = triangular_orders(order)
    maps, ips = [], []
    for ny, nx in orders:
        m, ip = match(data, nx, ny)
        maps.append(m)
        ips.append(ip)
    return jnp.stack(maps), jnp.stack(ips), orders


def mode_map(inner_product, order_ny_nx, size: int = 129) -> jnp.ndarray:
    """Reconstruct a single mode at given size.

    Parity: ``output_legendre_data`` (legendre_fit.py:95-101).
    """
    ny, nx = order_ny_nx
    Z = component((size, size), nx, ny)
    Z = Z / jnp.sqrt(jnp.nansum(Z * Z))
    return inner_product * Z


def mode_pvs(fit_maps: jnp.ndarray, inner_products: jnp.ndarray) -> jnp.ndarray:
    """Signed PV per mode (reference AKB_raytrace_20250312.py:3753)."""
    pv = jnp.nanmax(fit_maps, axis=(1, 2)) - jnp.nanmin(fit_maps, axis=(1, 2))
    return pv * jnp.sign(inner_products)


def fit_sum(fit_maps: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(fit_maps, axis=0)
