"""Fraunhofer / Fresnel PSF computation (L5).

jnp re-implementation of ``psf_fft.py`` (compute_psf_fft, psf_to_db) and of
the direct ``fresnel_integral`` (AKB_raytrace_20250312.py:986-1044), with:

* platform-aware complex dtype — TPU has no complex128, so the FFT runs in
  complex64 on TPU and complex128 on CPU (phases are always *built* in f64
  and wrapped mod 2pi before the cast, so c64 costs accuracy only in the
  transform's accumulation, ~1e-6 relative);
* the direct Fresnel sum vectorized as a single einsum-shaped contraction
  instead of the reference's per-sample Python loop;
* everything differentiable (used for PSF/Strehl-based alignment losses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _complex_dtype():
    """complex128 when the computation lands on CPU, complex64 on TPU.

    ``jax.default_backend()`` alone is wrong here: the dev/CI image
    force-registers a TPU platform while tests pin ``jax_default_device``
    to CPU, so inspect the default device first."""
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    if platform in ("tpu", "axon"):
        return jnp.complex64
    return jnp.complex128


def ensure_even_size(arr: jnp.ndarray):
    """Pad odd side lengths by one pixel (parity: psf_fft.py:6-18)."""
    ny, nx = arr.shape
    pad_y = ny % 2
    pad_x = nx % 2
    if pad_x or pad_y:
        arr = jnp.pad(arr, ((0, pad_y), (0, pad_x)))
    return arr


def hann2d(shape) -> jnp.ndarray:
    """Separable 2D Hann window, unit peak (parity: psf_fft.py:20-27)."""
    ny, nx = shape
    wx = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(nx) / nx)
    wy = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(ny) / ny)
    w = jnp.outer(wy, wx)
    return w / jnp.max(w)


def compute_psf_fft(opd_m, amp, wavelength_m, pupil_dx_m, focal_length_m,
                    pad_factor: int = 2, window: str | None = None,
                    return_efield: bool = False, pupil_dy_m=None,
                    fft2_shifted_fn=None):
    """Fraunhofer PSF from pupil OPD + amplitude via FFT.

    Parity: ``compute_psf_fft`` (psf_fft.py:29-125) — NaN masking, optional
    Hann window, even-size pad, centered zero-pad by ``pad_factor``,
    ``fftshift(fft2(ifftshift(U))) * dA``, image coordinates
    ``lambda * f * fftfreq``, peak normalization.
    ``fft2_shifted_fn`` overrides the ``fftshift(fft2(ifftshift(.)))``
    transform — used by ``parallel.fft.psf_fft_sharded`` to distribute the
    FFT over a device mesh for pupils too large for one chip.
    Returns (psf, x_im, y_im[, efield]).
    """
    opd = jnp.asarray(opd_m, dtype=jnp.float64)
    A = jnp.asarray(amp, dtype=jnp.float64)
    A = jnp.where(jnp.isfinite(A), A, 0.0)
    opd = jnp.where(jnp.isfinite(opd), opd, 0.0)

    phase = (2.0 * jnp.pi / wavelength_m) * opd
    # wrap before any downcast so c64 keeps full phase fidelity
    phase = jnp.mod(phase + jnp.pi, 2 * jnp.pi) - jnp.pi
    cdt = _complex_dtype()
    rdt = jnp.float32 if cdt == jnp.complex64 else jnp.float64
    U = (A.astype(rdt) * jnp.exp(1j * phase.astype(rdt))).astype(cdt)

    if window is not None:
        if str(window).lower() != "hann":
            raise ValueError(f"Unsupported window '{window}'")
        U = U * hann2d(U.shape).astype(rdt)

    U = ensure_even_size(U)
    ny, nx = U.shape
    py, px = ny * pad_factor, nx * pad_factor
    pad_y0 = (py - ny) // 2
    pad_x0 = (px - nx) // 2
    U = jnp.pad(U, ((pad_y0, py - ny - pad_y0), (pad_x0, px - nx - pad_x0)))

    dx = pupil_dx_m
    dy = dx if pupil_dy_m is None else pupil_dy_m
    dA = dx * dy
    if fft2_shifted_fn is None:
        U_im = jnp.fft.fftshift(jnp.fft.fft2(jnp.fft.ifftshift(U))) * dA
    else:
        U_im = fft2_shifted_fn(U) * dA

    fx = jnp.fft.fftshift(jnp.fft.fftfreq(px, d=dx))
    fy = jnp.fft.fftshift(jnp.fft.fftfreq(py, d=dy))
    x_im = wavelength_m * focal_length_m * fx
    y_im = wavelength_m * focal_length_m * fy

    I = jnp.abs(U_im) ** 2
    Imax = jnp.max(I)
    I = jnp.where(Imax > 0, I / Imax, I)
    if return_efield:
        scale = jnp.sqrt(jnp.where(Imax > 0, Imax, 1.0))
        return I, x_im, y_im, U_im / scale
    return I, x_im, y_im


def psf_to_db(psf, floor_db: float = -60.0):
    """Parity: ``psf_to_db`` (psf_fft.py:127-131)."""
    return 10.0 * jnp.log10(jnp.maximum(psf, 10.0 ** (floor_db / 10.0)))


def fresnel_integral(phi, grid_x, grid_y, lambda_, z, x_out, y_out,
                     chunk: int = 4096):
    """Direct (non-FFT) Fresnel propagation of a masked pupil.

    Parity: ``fresnel_integral`` (AKB_raytrace_20250312.py:986-1044), but
    vectorized: the reference loops over input samples accumulating full
    output frames; here the O(N_in * N_out) contraction is chunked over
    inputs and runs as fused XLA ops.  NaN pupil samples carry zero weight.
    Returns (psf normalized, x_out, y_out).
    """
    k = 2 * jnp.pi / lambda_
    mask = jnp.isfinite(phi).ravel()
    w = mask.astype(jnp.float64)
    phiv = jnp.where(mask, phi.ravel(), 0.0)
    xin = jnp.where(mask, grid_x.ravel(), 0.0)
    yin = jnp.where(mask, grid_y.ravel(), 0.0)

    u_in_phase = k * phiv - k / (2 * z) * (xin**2 + yin**2)

    X, Y = jnp.meshgrid(x_out, y_out)
    Xf, Yf = X.ravel(), Y.ravel()

    def body(carry, idx):
        re, im = carry
        xs = jax.lax.dynamic_slice_in_dim(xin, idx, chunk)
        ys = jax.lax.dynamic_slice_in_dim(yin, idx, chunk)
        ps = jax.lax.dynamic_slice_in_dim(u_in_phase, idx, chunk)
        ws = jax.lax.dynamic_slice_in_dim(w, idx, chunk)
        r = jnp.sqrt((Xf[:, None] - xs[None, :]) ** 2
                     + (Yf[:, None] - ys[None, :]) ** 2 + z**2)
        ph = ps[None, :] - k * r
        amp = ws[None, :] / r
        re = re + jnp.sum(amp * jnp.cos(ph), axis=1)
        im = im + jnp.sum(amp * jnp.sin(ph), axis=1)
        return (re, im), None

    n = xin.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        pad = lambda a: jnp.pad(a, (0, n_pad))
        xin, yin, u_in_phase, w = pad(xin), pad(yin), pad(u_in_phase), pad(w)
    starts = jnp.arange(0, n + n_pad, chunk)
    (re, im), _ = jax.lax.scan(body, (jnp.zeros_like(Xf), jnp.zeros_like(Xf)),
                               starts)
    psf = (re**2 + im**2).reshape(X.shape)
    return psf / jnp.max(psf), x_out, y_out


def fwhm(x, intensity_1d):
    """Half-max width by counting samples over half max
    (parity: compute_fwhm, AKB_raytrace_20250312.py:3854-3859)."""
    dx = jnp.abs(x[1] - x[0])
    n_over = jnp.sum(intensity_1d >= 0.5 * jnp.max(intensity_1d))
    return (n_over - 1) * dx


def strehl(psf_aberrated_peak_unnormalized, psf_ideal_peak_unnormalized):
    """Strehl ratio from unnormalized peak intensities."""
    return psf_aberrated_peak_unnormalized / psf_ideal_peak_unnormalized


def wavefront_error_v2(defocus_positions, path_lengths, angles,
                       focal_positions, wavelength):
    """OPD error + focal-plane position error + angle-error correction.

    Parity: ``calculate_wavefront_error_v2``
    (AKB_raytrace_20250312.py:116-153).
    Returns (wavefront_error (N,), rms).
    """
    opd_error = path_lengths - jnp.mean(path_lengths)
    focal_err = jnp.linalg.norm(
        focal_positions - jnp.mean(focal_positions, axis=1, keepdims=True),
        axis=0)
    norms = jnp.linalg.norm(defocus_positions, axis=0, keepdims=True)
    ideal_normals = -defocus_positions / norms
    dots = jnp.einsum("ij,ij->j", angles, ideal_normals)
    angle_corr = wavelength * (1.0 - dots) / (2 * jnp.pi)
    err = opd_error + focal_err + angle_corr
    return err, jnp.sqrt(jnp.mean(err**2))


def psf_from_wavefront(wave_map_nm, grid_y, grid_z, focal_length_m,
                       wavelength_m, pad_factor: int = 16,
                       derotate: bool = True):
    """PSF pipeline from a gridded wavefront map [nm].

    Parity: ``psf_calc`` (AKB_raytrace_20250312.py:1121-1278): estimate the
    pupil-grid rotation from the NaN envelope, mask-normalized derotation,
    amplitude = finite mask, padded Fraunhofer FFT — without the plotting
    and file side effects (callers save what they need).
    Returns dict with psf, x_im, y_im, rotation_rad, wave_map_used.
    """
    from akbx.analysis import rectify

    wave_map_nm = jnp.asarray(wave_map_nm)
    rot = 0.0
    if derotate:
        try:
            rot = rectify.estimate_grid_rotation(wave_map_nm)
        except (ValueError, IndexError):
            rot = 0.0
        if np.isfinite(rot) and abs(rot) > 0:
            wave_map_nm = rectify.rotate_with_nan(wave_map_nm, rot, order=1)

    amp = jnp.where(jnp.isfinite(wave_map_nm), 1.0, 0.0)
    opd = jnp.where(jnp.isfinite(wave_map_nm), wave_map_nm * 1e-9, 0.0)
    dy = float(jnp.abs(grid_y[1] - grid_y[0]))
    dz = float(jnp.abs(grid_z[1] - grid_z[0]))
    psf_img, x_im, y_im = compute_psf_fft(opd, amp, wavelength_m, dy,
                                          focal_length_m,
                                          pad_factor=pad_factor,
                                          pupil_dy_m=dz)
    return {"psf": psf_img, "x_im": x_im, "y_im": y_im,
            "rotation_rad": float(rot), "wave_map_used": wave_map_nm}


def trim_window(psf_img, x_im, y_im, half_width_m: float):
    """Trim the PSF to +-half_width (the reference's energy-dependent
    display windows, AKB_raytrace_20250312.py:1202-1223)."""
    x = np.asarray(x_im)
    y = np.asarray(y_im)
    ix = np.where((x >= -half_width_m) & (x <= half_width_m))[0]
    iy = np.where((y >= -half_width_m) & (y <= half_width_m))[0]
    return np.asarray(psf_img)[np.ix_(iy, ix)], x[ix], y[iy]
