"""Pupil rectification: NaN-bounded parallelogram -> unit square.

Replaces the reference's cv2 pipeline (``extract_affine_square_region``,
AKB_raytrace_20250312.py:1047-1119: findContours -> approxPolyDP ->
getAffineTransform -> warpAffine) with a cv2-free, differentiable method:

* corner detection on the valid mask uses the same ordering heuristic as
  the reference (min/max of row+col and row-col picks the three anchor
  corners of a parallelogram);
* the affine map is formed analytically from the three corners;
* sampling is bilinear gather (differentiable wrt the image values).

When the pupil corners are already known analytically (our engine traces
the 4 corner rays), pass them directly and skip detection entirely.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def detect_corners(valid_mask: np.ndarray) -> np.ndarray:
    """Three anchor corners (top-left, top-right, bottom-left) of the valid
    region, ordered like the reference's ``order_points_affine``
    (AKB_raytrace_20250312.py:1083-1091).  Host-side numpy (non-diff)."""
    rr, cc = np.nonzero(np.asarray(valid_mask))
    pts = np.stack([cc, rr], axis=1).astype(np.float64)  # (x=col, y=row)
    s = pts.sum(axis=1)
    d = np.diff(pts, axis=1).ravel()
    top_left = pts[np.argmin(s)]
    top_right = pts[np.argmin(d)]
    bottom_left = pts[np.argmax(d)]
    return np.stack([top_left, top_right, bottom_left])


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    fill=jnp.nan):
    """Differentiable bilinear sampling of img at (x=col, y=row) coords."""
    ny, nx = img.shape
    mask = jnp.isfinite(img)
    filled = jnp.where(mask, img, 0.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0
    wy = y - y0

    def at(yy, xx):
        ok = (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx)
        yy = jnp.clip(yy, 0, ny - 1)
        xx = jnp.clip(xx, 0, nx - 1)
        v = filled[yy, xx]
        m = mask[yy, xx] & ok
        return jnp.where(m, v, 0.0), m.astype(img.dtype)

    v00, m00 = at(y0, x0)
    v01, m01 = at(y0, x1)
    v10, m10 = at(y1, x0)
    v11, m11 = at(y1, x1)
    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    num = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    den = m00 * w00 + m01 * w01 + m10 * w10 + m11 * w11
    out = num / jnp.maximum(den, 1e-12)
    return jnp.where(den > 0.5, out, fill)


def affine_rectify(img: jnp.ndarray, corners, size: int) -> jnp.ndarray:
    """Map the parallelogram spanned by (top-left, top-right, bottom-left)
    onto a (size, size) square by bilinear sampling.

    Parity: ``extract_affine_square_region`` output convention — output
    pixel (0,0) is the top-left corner, (0, size-1) top-right,
    (size-1, 0) bottom-left.
    """
    c = jnp.asarray(corners, dtype=jnp.float64)  # rows: TL, TR, BL as (x, y)
    u = jnp.linspace(0.0, 1.0, size)
    uu, vv = jnp.meshgrid(u, u)  # uu along columns (TL->TR), vv rows (TL->BL)
    x = c[0, 0] + uu * (c[1, 0] - c[0, 0]) + vv * (c[2, 0] - c[0, 0])
    y = c[0, 1] + uu * (c[1, 1] - c[0, 1]) + vv * (c[2, 1] - c[0, 1])
    return bilinear_sample(img, x, y)


def extract_square_region(img, size: int | None = None) -> jnp.ndarray:
    """Detect corners from the NaN mask and rectify (reference-compatible
    one-call form)."""
    valid = np.isfinite(np.asarray(img))
    corners = detect_corners(valid)
    if size is None:
        w = np.linalg.norm(corners[0] - corners[1])
        h = np.linalg.norm(corners[0] - corners[2])
        size = int(max(w, h))
    return affine_rectify(jnp.asarray(img), corners, size)


def rotate_with_nan(data: jnp.ndarray, angle_rad, order: int = 1) -> jnp.ndarray:
    """Mask-normalized rotation about the image center.

    Parity: ``rotate_with_nan`` (AKB_raytrace_20250312.py:1138-1156), which
    rotates data and mask with scipy.ndimage.rotate and renormalizes.  Here
    implemented as inverse-map bilinear sampling (differentiable, no scipy).
    ``angle_rad`` rotates the image content counterclockwise (matching
    scipy.ndimage.rotate's angle-in-degrees CCW convention).
    """
    ny, nx = data.shape
    cy, cx = (ny - 1) / 2.0, (nx - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(ny, dtype=jnp.float64),
                          jnp.arange(nx, dtype=jnp.float64), indexing="ij")
    ca, sa = jnp.cos(angle_rad), jnp.sin(angle_rad)
    # inverse rotation of output coords into input coords; matches
    # scipy.ndimage.rotate's convention (verified: +90deg moves a blob at
    # (5,16) of a 33x33 image to (16,5))
    xs = cx - (yy - cy) * sa + (xx - cx) * ca
    ys = cy + (yy - cy) * ca + (xx - cx) * sa
    return bilinear_sample(data, xs, ys)


def estimate_grid_rotation(wave_map: jnp.ndarray):
    """Pupil-rotation estimate from the NaN envelope.

    Parity: psf_calc's min-index slope fit (AKB_raytrace_20250312.py:
    1122-1132): for each column find the first valid row; the slope between
    the 1/4 and 3/4 columns gives the rotation.
    """
    m = np.isfinite(np.asarray(wave_map))
    n_wid = m.shape[1]
    first = np.full(n_wid, np.nan)
    for i in range(n_wid):
        idx = np.nonzero(m[:, i])[0]
        if idx.size:
            first[i] = idx.min()
    i1, i2 = n_wid // 4, n_wid * 3 // 4
    return float(np.arctan((first[i1] - first[i2]) / (i1 - i2)))
