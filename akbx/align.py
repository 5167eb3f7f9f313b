"""Focus & alignment optimization (L4).

The reference's layer of derivative-free shrink searches
(``find_defocus`` :9086-9172, ``optimize_min_index`` :9174-9217,
``auto_focus_NA`` :12746-12895, ``compare_sep`` :9267-9562,
``auto_focus_sep`` :12897-13320, ``Finetuning`` :13972-14042 in
AKB_raytrace_20250312.py) re-designed around two ideas:

1. **Closed-form best focus.**  The spot std along a detector scan is a
   quadratic in the plane position, so the minimizing plane is a weighted
   least-squares crossing point: ``x* = x0 - cov(y, s) / var(s)`` with
   ``s = dy/dx`` the transverse ray slope.  One trace replaces the
   reference's 10x50-sample shrink loops — and it is differentiable, so
   autofocus can sit inside gradient-based alignment.

2. **Gradient-based alignment.**  Because the whole trace is
   differentiable, misalignment recovery is optax gradient descent on a
   wavefront/spot loss, with the reference's sensitivity-matrix linear
   solve (``auto_focus_sep 'matrix'`` + ``M^-1`` application :14236-14266)
   available as ``sensitivity_matrix`` via ``jax.jacfwd`` instead of
   finite differences.

Search-based fallbacks (``shrink_search``) are kept for behavioral parity.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from akbx import trace as tr
from akbx.systems import AlignParams


def best_focus_axis(points, rays, valid, axis: int):
    """Closed-form least-squares focal plane along x for one transverse axis.

    Minimizes std of ``c + (x - x0) * s`` over x, where c is the transverse
    coordinate at the reference plane and s the ray slope.  Returns
    (x_offset_from_points_plane, spot_std_at_focus).
    """
    w = valid.astype(points.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    c = points[axis]
    s = rays[axis] / rays[0]
    cm = jnp.sum(w * c) / n
    sm = jnp.sum(w * s) / n
    cc = c - cm
    sc = s - sm
    cov = jnp.sum(w * cc * sc) / n
    var = jnp.maximum(jnp.sum(w * sc * sc) / n, 1e-300)
    dx = -cov / var
    resid = cc + dx * sc
    std = jnp.sqrt(jnp.sum(w * resid**2) / n)
    return dx, std


def best_focus(result: "tr.TraceResult", x_ref):
    """Best focal-plane positions (absolute x) for H (y) and V (z).

    Replaces ``find_defocus`` (reference :9086-9172) with one closed form.
    """
    det = tr.detector_points(result, x_ref)
    dx_h, std_h = best_focus_axis(det, result.exit_rays, result.valid, 1)
    dx_v, std_v = best_focus_axis(det, result.exit_rays, result.valid, 2)
    return x_ref + dx_h, x_ref + dx_v, std_h, std_v


def auto_focus(build_fn: Callable[[AlignParams], object], params: AlignParams,
               n: int = 21, iters: int = 3, astig_gain: float = 0.5):
    """Adjust (defocus, astigH) so the H and V foci coincide on the detector.

    The reference's ``auto_focus_NA`` (:12746-12895) alternates hundreds of
    full re-traces inside shrink searches; here each iteration is one trace
    plus the closed-form focus, and the astigmatism update moves the H
    mirror group by a damped split of the remaining focus gap.
    Returns updated AlignParams.
    """
    def measure(p):
        sys_ = build_fn(p)
        res = tr.run(sys_, n, n, defocus=p.defocus,
                     exit_pupil_uniform=False, tilt_correction=True)
        x_h, x_v, _, _ = best_focus(res.trace, sys_.s2f_middle + p.defocus)
        return x_h, x_v, sys_.s2f_middle

    # secant iteration on astig_h (the gain dx_h/d astig is design-dependent,
    # ~0.9 for the AKB); defocus follows the midpoint each step
    p = params
    x_h, x_v, s2f = measure(p)
    gap_prev = x_h - x_v
    astig_prev = p.astig_h
    p = p._replace(defocus=(x_h + x_v) / 2 - s2f,
                   astig_h=p.astig_h - astig_gain * gap_prev)
    for _ in range(iters - 1):
        x_h, x_v, s2f = measure(p)
        gap = x_h - x_v
        slope = (gap - gap_prev) / (p.astig_h - astig_prev)
        slope = jnp.where(jnp.abs(slope) > 1e-6, slope, -1.0)
        astig_prev, gap_prev = p.astig_h, gap
        p = p._replace(defocus=(x_h + x_v) / 2 - s2f,
                       astig_h=p.astig_h - gap / slope)
    return p


def shrink_search(func: Callable, x_min: float, x_max: float,
                  num_steps: int = 100, shrink_factor: float = 0.1,
                  max_attempts: int = 20, tolerance: float = 1e-13):
    """Generic scalar shrink search.

    Parity: ``optimize_min_index`` (reference :9174-9217).  Host-side
    (python loop over jit-able func evaluations).
    """
    best_x, min_y = None, None
    for _ in range(max_attempts):
        xs = jnp.linspace(x_min, x_max, num_steps)
        ys = jnp.stack([jnp.asarray(func(float(x))) for x in xs])
        i = int(jnp.argmin(ys))
        best_x, min_y = float(xs[i]), float(ys[i])
        delta = (x_max - x_min) * shrink_factor
        x_min, x_max = best_x - delta / 2, best_x + delta / 2
        if (x_max - x_min) < tolerance:
            break
    return best_x, min_y


class SepMetrics(NamedTuple):
    """Per-aperture-slice astigmatic focus signature.

    Parity with the reference ``compare_sep`` 12-tuple (:9267-9562):
    best-focus position and residual spot for the center column/row of the
    ray grid, the lower/upper edge columns/rows, and the two diagonals.
    """

    focus_v0: jnp.ndarray
    focus_h0: jnp.ndarray
    pos_v0: jnp.ndarray
    pos_h0: jnp.ndarray
    std_v0: jnp.ndarray
    std_h0: jnp.ndarray
    focus_v_l: jnp.ndarray
    focus_h_l: jnp.ndarray
    focus_v_u: jnp.ndarray
    focus_h_u: jnp.ndarray
    focus_std_obl1: jnp.ndarray
    focus_std_obl2: jnp.ndarray

    def to_vector(self):
        return jnp.stack(list(self))


def compare_sep(result: "tr.TraceResult", x_ref, n_h: int, n_v: int) -> SepMetrics:
    """Aberration signature from independent per-slice focus searches.

    The slices match the reference's thinned index sets (:9277-9308):
    columns (fixed H index) r/y/g = first/center/last; rows r/y/g; the two
    diagonals.  Each closed-form instead of a 10k-sample scan.
    """
    rays = result.exit_rays
    pts = result.exit_points
    valid = result.valid
    idx = jnp.arange(n_h * n_v)

    def slice_focus(sel_mask, axis):
        det = tr.detector_points(result, x_ref)
        v = valid & sel_mask
        dx, std = best_focus_axis(det, rays, v, axis)
        # mean transverse position of the slice at its own focus
        w = v.astype(det.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)
        c = det[axis] + dx * rays[axis] / rays[0]
        pos = jnp.sum(w * c) / n
        return x_ref + dx, pos, std

    col = lambda i: (idx % n_h) == i
    row = lambda j: (idx // n_h) == j
    diag1 = (idx % n_h) == (idx // n_h)
    diag2 = (idx % n_h) == (n_v - 1 - idx // n_h)

    f_v0, pos_v0, s_v0 = slice_focus(col((n_h - 1) // 2), 2)
    f_h0, pos_h0, s_h0 = slice_focus(row((n_v - 1) // 2), 1)
    f_v_l, _, _ = slice_focus(col(0), 2)
    f_v_u, _, _ = slice_focus(col(n_h - 1), 2)
    f_h_l, _, _ = slice_focus(row(0), 1)
    f_h_u, _, _ = slice_focus(row(n_v - 1), 1)
    f_o1_v, _, s_o1 = slice_focus(diag1, 2)
    f_o2_v, _, s_o2 = slice_focus(diag2, 2)

    return SepMetrics(f_v0, f_h0, pos_v0, pos_h0, s_v0, s_h0,
                      f_v_l, f_h_l, f_v_u, f_h_u, f_o1_v, f_o2_v)


def aberration_vector(metrics: SepMetrics, mode: str = "abrr") -> jnp.ndarray:
    """Aberration component vector used by the sensitivity solve.

    Reference: ``auto_focus_sep`` 'abrr' component subsets (:12951-12979).
    """
    m = metrics
    if mode == "KB":
        return jnp.stack([m.focus_v0 - m.focus_h0,
                          m.focus_v_u - m.focus_v_l,
                          m.focus_h_u - m.focus_h_l])
    return jnp.stack([
        m.focus_v0 - m.focus_h0,          # astigmatism
        m.focus_v_u - m.focus_v_l,        # V focal tilt across H aperture
        m.focus_h_u - m.focus_h_l,        # H focal tilt across V aperture
        m.focus_std_obl1 - m.focus_std_obl2,  # oblique astigmatism
        m.pos_v0,                         # pointing V
        m.pos_h0,                         # pointing H
    ])


def sensitivity_matrix(metric_fn: Callable[[jnp.ndarray], jnp.ndarray],
                       params_vec: jnp.ndarray,
                       param_indices) -> jnp.ndarray:
    """d(metrics)/d(params) via forward-mode autodiff.

    Replaces the reference's finite-difference sensitivity sweeps
    (``auto_focus_sep 'matrix'``, :13100-13320).  ``metric_fn`` maps the
    26-vector to an aberration vector; returns (n_metrics, n_params).
    """
    J = jax.jacfwd(metric_fn)(params_vec)
    return J[:, jnp.asarray(param_indices)]


def solve_alignment(metric_fn, params_vec, param_indices, iters: int = 1,
                    damping: float = 1.0):
    """Newton-style alignment: measure aberrations, invert the sensitivity
    matrix, apply the correction (reference __main__ :14236-14266)."""
    p = jnp.asarray(params_vec)
    idx = jnp.asarray(param_indices)
    for _ in range(iters):
        m = metric_fn(p)
        J = sensitivity_matrix(metric_fn, p, idx)
        # least-squares correction on the selected parameters
        delta, *_ = jnp.linalg.lstsq(J, -m, rcond=None)
        p = p.at[idx].add(damping * delta)
    return p


def gradient_align(loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
                   params_vec: jnp.ndarray, free_indices, steps: int = 100,
                   lr: float = 1e-6):
    """Gradient-descent alignment on a differentiable loss — the capability
    the reference could not have (numpy gave no gradients).  Uses optax
    adam on the selected parameter subset."""
    import optax

    idx = jnp.asarray(free_indices)
    x0 = params_vec[idx]

    def sub_loss(x):
        return loss_fn(params_vec.at[idx].set(x))

    opt = optax.adam(lr)
    state = opt.init(x0)
    val_grad = jax.jit(jax.value_and_grad(sub_loss))

    @jax.jit
    def step(x, state):
        v, g = val_grad(x)
        updates, state = opt.update(g, state)
        return optax.apply_updates(x, updates), state, v

    x = x0
    for _ in range(steps):
        x, state, v = step(x, state)
    return params_vec.at[idx].set(x), v


def legendre_alignment_sweep(build_fn, base_params: AlignParams,
                             param_index: int, values, n: int = 21,
                             assess_order: int = 5, wavelength_nm: float = 13.5,
                             autofocus: bool = True):
    """Sweep one alignment parameter; fit each Legendre mode's response.

    Parity: ``Legendrealignment`` (AKB_raytrace_20250312.py:13853-13969) —
    for each value of the swept parameter, (optionally) autofocus, trace,
    decompose the wavefront, then linear-fit inner products and PVs
    against the parameter.
    Returns dict with 'values', 'inner_products' (runs, modes),
    'pvs' (runs, modes+1), 'orders', 'ip_slopes', 'pv_slopes'.
    """
    import numpy as np

    from akbx import wavefront
    from akbx.analysis import legendre, rectify

    ips_runs, pvs_runs = [], []
    orders = None
    for value in values:
        vec = base_params.to_vector().at[param_index].set(float(value))
        p = AlignParams.from_vector(vec)
        if autofocus:
            p = auto_focus(build_fn, p, n=n, iters=3)
        sys_ = build_fn(p)
        res = tr.run(sys_, n, n, defocus=p.defocus)
        mat, _, _ = wavefront.wavefront_grid(res, n, n)
        rect = rectify.extract_square_region(mat / wavelength_nm, n)
        fits, ips, orders = legendre.match_multi(rect[1:-2, 1:-2],
                                                 assess_order)
        pv = np.append(np.asarray(legendre.mode_pvs(fits, ips)),
                       float(wavefront.pv_6sigma(mat / wavelength_nm)))
        ips_runs.append(np.asarray(ips))
        pvs_runs.append(pv)
    ips_runs = np.array(ips_runs)
    pvs_runs = np.array(pvs_runs)
    values = np.asarray(values, dtype=float)
    ip_slopes = np.array([np.polyfit(values, ips_runs[:, i], 1)
                          for i in range(ips_runs.shape[1])])
    pv_slopes = np.array([np.polyfit(values, pvs_runs[:, i], 1)
                          for i in range(pvs_runs.shape[1])])
    return {"values": values, "inner_products": ips_runs, "pvs": pvs_runs,
            "orders": orders, "ip_slopes": ip_slopes, "pv_slopes": pv_slopes}


def fine_tune(build_fn, params: AlignParams, n: int = 21,
              assess_order: int = 5, wavelength_nm: float = 13.5,
              span_defocus: float = 2e-5, span_astig: float = 2e-5,
              samples: int = 3):
    """Zero the astigmatism and defocus Legendre signatures by linear fit.

    Parity: ``Finetuning`` (AKB_raytrace_20250312.py:13972-14042): sweep
    params[0]/params[1] over a small span, linear-fit
    ``pv[(0,2)] - pv[(2,0)]`` (astigmatism signature) vs astigH and
    ``pv[(0,2)] + pv[(2,0)]`` (defocus signature) vs defocus, then move to
    the fitted zero crossings.  The reference runs this under
    ``option_mpmath``; our compensated f64 engine needs no precision
    escape hatch.
    Returns updated AlignParams.
    """
    import numpy as np

    from akbx import wavefront
    from akbx.analysis import legendre, rectify

    def signature(p):
        sys_ = build_fn(p)
        res = tr.run(sys_, n, n, defocus=p.defocus)
        mat, _, _ = wavefront.wavefront_grid(res, n, n)
        rect = rectify.extract_square_region(mat / wavelength_nm, n)
        fits, ips, orders = legendre.match_multi(rect[1:-2, 1:-2],
                                                 assess_order)
        pv = np.asarray(legendre.mode_pvs(fits, ips))
        i20 = orders.index((2, 0))
        i02 = orders.index((0, 2))
        return pv[i02] - pv[i20], pv[i02] + pv[i20]

    # astig channel
    astigs = np.asarray(params.astig_h) + np.linspace(-span_astig, span_astig,
                                                      samples)
    sig_a = [signature(params._replace(astig_h=jnp.asarray(a)))[0]
             for a in astigs]
    slope_a, icpt_a = np.polyfit(astigs, sig_a, 1)
    new_astig = -icpt_a / slope_a if abs(slope_a) > 1e-30 else params.astig_h
    params = params._replace(astig_h=jnp.asarray(new_astig))

    # defocus channel
    defs = np.asarray(params.defocus) + np.linspace(-span_defocus,
                                                    span_defocus, samples)
    sig_d = [signature(params._replace(defocus=jnp.asarray(d)))[1]
             for d in defs]
    slope_d, icpt_d = np.polyfit(defs, sig_d, 1)
    new_def = -icpt_d / slope_d if abs(slope_d) > 1e-30 else params.defocus
    return params._replace(defocus=jnp.asarray(new_def))


def field_of_curvature(build_fn, params: AlignParams, shifts_y, shifts_z,
                       n: int = 17):
    """Field-of-curvature map: autofocus for a grid of source shifts.

    Parity: ``calc_FoC`` (AKB_raytrace_20250312.py:13766-13851).
    Returns dict of (len(shifts_z), len(shifts_y)) arrays: focus_x_h/v,
    spot_h/v.
    """
    import numpy as np

    fx_h = np.zeros((len(shifts_z), len(shifts_y)))
    fx_v = np.zeros_like(fx_h)
    sp_h = np.zeros_like(fx_h)
    sp_v = np.zeros_like(fx_h)
    for iz, sz in enumerate(shifts_z):
        for iy, sy in enumerate(shifts_y):
            build_shifted = lambda p: build_fn(p, source_shift=(0.0, sy, sz))
            sys_ = build_shifted(params)
            res = tr.run(sys_, n, n, defocus=params.defocus,
                         exit_pupil_uniform=False)
            x_h, x_v, std_h, std_v = best_focus(
                res.trace, sys_.s2f_middle + params.defocus)
            fx_h[iz, iy] = float(x_h)
            fx_v[iz, iy] = float(x_v)
            sp_h[iz, iy] = float(std_h)
            sp_v[iz, iy] = float(std_v)
    return {"focus_x_h": fx_h, "focus_x_v": fx_v,
            "spot_h": sp_h, "spot_v": sp_v}
