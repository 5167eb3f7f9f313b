"""Wavefront-map construction (L5 support): gridding + plane correction.

Differentiable replacements for the reference's scipy/cv2 steps:

* ``resample_quasigrid``  — replaces ``scipy.interpolate.griddata(...,
  method='cubic')`` (AKB_raytrace_20250312.py:3689).  The scattered points
  are not arbitrary: they are a (nV, nH) quasi-grid of detector
  intersections whose rows/columns are monotone (the engine re-fans so exit
  angles are uniform), so a separable two-pass 1D interpolation is accurate
  and fully differentiable.
* ``plane_correction``    — replaces
  ``plane_correction_with_nan_and_outlier_filter`` (:9630-9693):
  quadratic pre-fit, 3-sigma outlier mask, linear plane re-fit, subtract —
  with masked least squares via normal equations (no numpy.linalg.lstsq on
  ragged NaN data).
"""

from __future__ import annotations

import jax.numpy as jnp


def _interp_masked(x_new, x, y, valid):
    """1D linear interpolation of (x, y) onto x_new; points outside the
    valid span become invalid.  x may be increasing or decreasing."""
    sign = jnp.where(x[-1] >= x[0], 1.0, -1.0)
    xs = sign * x
    big = 1e300
    # push invalid samples out of the way so interp ignores them
    xs_v = jnp.where(valid, xs, big)
    ys_v = jnp.where(valid, y, 0.0)  # keep NaNs of masked samples out
    order = jnp.argsort(xs_v)
    xs_sorted = xs_v[order]
    ys_sorted = ys_v[order]
    n_valid = jnp.sum(valid)
    xq = sign * x_new
    yq = jnp.interp(xq, xs_sorted, ys_sorted)
    lo = jnp.min(jnp.where(valid, xs, big))
    hi = jnp.max(jnp.where(valid, xs, -big))
    ok = (xq >= lo) & (xq <= hi) & (n_valid >= 2)
    return yq, ok


def resample_quasigrid(y_pts, z_pts, values, valid, y_grid, z_grid):
    """Resample values sampled on a (nV, nH) quasi-grid onto a regular grid.

    Parameters: ``y_pts``/``z_pts``/``values``/``valid`` are (nV, nH)
    (horizontal coordinate, vertical coordinate, sample value, mask);
    ``y_grid`` (nH',), ``z_grid`` (nV',).  Returns (nV', nH') with NaN
    outside the pupil (parity with griddata's NaN fill).
    """
    import jax

    # pass 1: each row -> interpolate value and z onto y_grid
    def row_fn(yr, zr, vr, mr):
        val, ok1 = _interp_masked(y_grid, yr, vr, mr)
        zz, ok2 = _interp_masked(y_grid, yr, zr, mr)
        return val, zz, ok1 & ok2

    vals_r, z_r, ok_r = jax.vmap(row_fn)(y_pts, z_pts, values, valid)  # (nV, nH')

    # pass 2: each column -> interpolate onto z_grid
    def col_fn(zc, vc, mc):
        val, ok = _interp_masked(z_grid, zc, vc, mc)
        return val, ok

    vals_c, ok_c = jax.vmap(col_fn, in_axes=(1, 1, 1), out_axes=1)(z_r, vals_r, ok_r)
    return jnp.where(ok_c, vals_c, jnp.nan)


def _design_matrix(yy, xx, order: int):
    cols = [jnp.ones_like(yy)]
    if order >= 1:
        cols += [xx, yy]
    if order >= 2:
        cols += [xx * yy, xx**2, yy**2]
    return jnp.stack(cols, axis=-1)


def _masked_lstsq(A, b, w):
    """Weighted least squares via normal equations (mask as weights)."""
    Aw = A * w[:, None]
    AtA = Aw.T @ A
    Atb = Aw.T @ b
    return jnp.linalg.solve(AtA + 1e-30 * jnp.eye(A.shape[1]), Atb)


def plane_correction(img: jnp.ndarray, sigma: float = 3.0) -> jnp.ndarray:
    """Quadratic pre-fit -> sigma-clip -> linear plane re-fit -> subtract.

    NaN-preserving.  Parity: ``plane_correction_with_nan_and_outlier_filter``
    (AKB_raytrace_20250312.py:9630-9693).
    """
    ny, nx = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(ny, dtype=img.dtype),
                          jnp.arange(nx, dtype=img.dtype), indexing="ij")
    flat = img.ravel()
    m = jnp.isfinite(flat)
    w = m.astype(img.dtype)
    b = jnp.where(m, flat, 0.0)

    A2 = _design_matrix(yy.ravel(), xx.ravel(), 2)
    coef2 = _masked_lstsq(A2, b, w)
    resid = b - A2 @ coef2
    std = jnp.sqrt(jnp.sum(w * resid**2) / jnp.maximum(jnp.sum(w), 1.0))
    keep = m & (jnp.abs(resid) <= sigma * std)
    w2 = keep.astype(img.dtype)

    A1 = _design_matrix(yy.ravel(), xx.ravel(), 1)
    coef1 = _masked_lstsq(A1, b, w2)
    corrected = flat - A1 @ coef1
    return jnp.where(m, corrected, jnp.nan).reshape(ny, nx)


def wavefront_grid(engine_result, n_h: int, n_v: int):
    """Build the gridded, plane-corrected wavefront map [nm] on the
    defocused detector plane (reference :3653-3698).

    Returns (matrix_wave2_corrected (nV,nH), grid_y (nH,), grid_z (nV,)).
    """
    det2 = engine_result.detcenter2
    y = det2[1].reshape(n_v, n_h)
    z = det2[2].reshape(n_v, n_h)
    w = engine_result.wave2.reshape(n_v, n_h)
    valid = engine_result.valid.reshape(n_v, n_h)

    big = jnp.where(valid, y, jnp.nan)
    y_grid = jnp.linspace(jnp.nanmin(big), jnp.nanmax(big), n_h)
    bigz = jnp.where(valid, z, jnp.nan)
    z_grid = jnp.linspace(jnp.nanmin(bigz), jnp.nanmax(bigz), n_v)

    mat = resample_quasigrid(y, z, w, valid, y_grid, z_grid)
    mat = mat - jnp.nanmean(mat)
    mat = plane_correction(mat)
    return mat, y_grid, z_grid


def pv_6sigma(wave_map_lambda: jnp.ndarray) -> jnp.ndarray:
    """The reference's headline wavefront metric: 6 sigma of the map in
    wavelength units (:3913)."""
    return jnp.nanstd(wave_map_lambda) * 6.0
