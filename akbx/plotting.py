"""Diagnostic plotting (the reference's visual-inspection layer, SURVEY §4.6).

The reference saves hundreds of matplotlib figures per run — spot diagrams
(:2918-2977), ray side-views / virtual-source caustics
(``plot_ray_sideview``, AKB_raytrace_20250312.py:162-237), around-focus
montages (AKB_raytrace_III_I_20250710.py:2430-2533), wavefront maps, PSF
images (``psf_calc`` savefigs, :1121-1278), Legendre-mode bars
(legendre_fit.py:104-267), and design layouts
(``plot_ellipses``/``plot_mirrors``, KB_design_NAbased.py:234-341).

Design: every function here is *pure data -> Figure*: it takes arrays,
returns the matplotlib Figure (saving to ``path`` when given), never calls
``plt.show()``, and imports matplotlib lazily so headless / plot-free
pipelines pay nothing.  All device arrays are pulled to host once up front.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    if matplotlib.get_backend().lower() not in ("agg", "module://matplotlib_inline.backend_inline"):
        try:
            matplotlib.use("Agg", force=False)
        except Exception:
            pass
    import matplotlib.pyplot as plt

    return plt


def _save(fig, path):
    if path is not None:
        fig.savefig(path, dpi=300, bbox_inches="tight")
    return fig


def spot_diagram(detpoints, valid=None, path=None, title="Focal spot",
                 unit_scale=1e9, unit="nm"):
    """Scatter of focal-plane intersections (reference spot plots,
    AKB_raytrace_20250312.py:2918-2977 style)."""
    plt = _plt()
    d = np.asarray(detpoints)
    m = np.ones(d.shape[1], bool) if valid is None else np.asarray(valid)
    y = (d[1, m] - d[1, m].mean()) * unit_scale
    z = (d[2, m] - d[2, m].mean()) * unit_scale
    fig, ax = plt.subplots()
    ax.scatter(y, z, s=1)
    ax.set_xlabel(f"Horizontal ({unit})")
    ax.set_ylabel(f"Vertical ({unit})")
    ax.set_title(title)
    ax.set_aspect("equal")
    return _save(fig, path)


def ray_sideview(exit_rays, exit_points, place, defocus_size, n_h, n_v,
                 thin: int = 4, path=None):
    """Caustic / virtual-source side views: edge + center ray bundles
    projected onto two planes around ``place``.

    Parity: ``plot_ray_sideview`` (AKB_raytrace_20250312.py:162-237) —
    red/green/yellow = first/last/center row (H pane) and column (V pane).
    """
    from akbx.core import geometry as geo

    plt = _plt()
    import jax.numpy as jnp

    rays = jnp.asarray(exit_rays)
    pts = jnp.asarray(exit_points)
    d1 = np.asarray(geo.plane_intersect(geo.detector_plane(place - defocus_size), rays, pts))
    d2 = np.asarray(geo.plane_intersect(geo.detector_plane(place + defocus_size), rays, pts))

    rows = {"r": np.arange(0, n_h, thin),
            "y": ((n_v - 1) // 2) * n_h + np.arange(0, n_h, thin),
            "g": (n_v - 1) * n_h + np.arange(0, n_h, thin)}
    cols = {"r": np.arange(0, n_v, thin) * n_h,
            "y": np.arange(0, n_v, thin) * n_h + (n_h - 1) // 2,
            "g": np.arange(0, n_v, thin) * n_h + n_h - 1}

    fig, axs = plt.subplots(2, 1, sharex=True)
    for color, idx in rows.items():
        axs[0].plot([d1[0, idx], d2[0, idx]], [d1[1, idx], d2[1, idx]],
                    color, lw=0.3)
    for color, idx in cols.items():
        axs[1].plot([d1[0, idx], d2[0, idx]], [d1[2, idx], d2[2, idx]],
                    color, lw=0.3)
    axs[0].set_ylabel("Horizontal (m)")
    axs[1].set_ylabel("Vertical (m)")
    axs[1].set_xlabel("Axial (m)")
    axs[0].set_title("Ray side view")
    return _save(fig, path)


def around_focus_montage(spots, offsets, valid=None, path=None,
                         unit_scale=1e6, unit="um"):
    """Row of spot diagrams on planes around focus.

    Parity: the interactive montage of AKB_raytrace_III_I_20250710.py:
    2430-2533 (static form).  ``spots``: (n_planes, 3, N) detector points
    (e.g. from ``akbx.export.around_focus_spots``); ``offsets``: (n_planes,)
    axial offsets [m].
    """
    plt = _plt()
    spots = np.asarray(spots)
    n = spots.shape[0]
    m = (np.ones(spots.shape[2], bool) if valid is None
         else np.asarray(valid))
    fig, axs = plt.subplots(1, n, sharey=True, figsize=(2 * n, 2.4))
    if n == 1:
        axs = [axs]
    yc = spots[:, 1, :][:, m].mean()
    zc = spots[:, 2, :][:, m].mean()
    for i, ax in enumerate(axs):
        ax.scatter((spots[i, 1, m] - yc) * unit_scale,
                   (spots[i, 2, m] - zc) * unit_scale, s=0.5)
        ax.set_title(f"{offsets[i]:+.2e} m", fontsize=7)
        ax.set_aspect("equal")
    axs[0].set_ylabel(f"V ({unit})")
    fig.supxlabel(f"H ({unit})")
    return _save(fig, path)


def interactive_around_focus(spots_at, half_range, n_planes: int = 5,
                             valid=None, unit_scale=1e6, unit="um"):
    """Around-focus montage that re-traces when a pane is clicked.

    Parity: the III_I engine's interactive matplotlib montage — clicking a
    plane re-centers the sweep around it and re-traces
    (AKB_raytrace_III_I_20250710.py:2430-2533).

    ``spots_at(x_offset) -> (3, N)`` detector points at axial offset
    ``x_offset`` from nominal focus (host callback; typically a jitted
    trace + plane intersection).  Each click on pane *i* re-centers the
    montage at that pane's offset and halves the span — drill-down focus
    search by eye.  Returns (fig, state) where ``state['offsets']`` is
    mutated on every click (tests drive ``state['on_click']`` directly).
    """
    plt = _plt()

    state = {"center": 0.0, "half": float(half_range)}
    fig, axs = plt.subplots(1, n_planes, sharey=True,
                            figsize=(2 * n_planes, 2.4))
    axs = list(np.atleast_1d(axs))

    def draw():
        offsets = state["center"] + np.linspace(-state["half"], state["half"],
                                                n_planes)
        state["offsets"] = offsets
        for ax, off in zip(axs, offsets):
            ax.clear()
            d = np.asarray(spots_at(float(off)))
            m = np.ones(d.shape[1], bool) if valid is None else np.asarray(valid)
            ax.scatter((d[1, m] - d[1, m].mean()) * unit_scale,
                       (d[2, m] - d[2, m].mean()) * unit_scale, s=0.5)
            ax.set_title(f"{off:+.3e} m", fontsize=7)
            ax.set_aspect("equal")
        axs[0].set_ylabel(f"V ({unit})")
        fig.canvas.draw_idle()

    def on_click(event):
        if event.inaxes in axs:
            i = axs.index(event.inaxes)
            state["center"] = float(state["offsets"][i])
            state["half"] = state["half"] / 2.0
            draw()

    draw()
    state["on_click"] = on_click
    fig.canvas.mpl_connect("button_press_event", on_click)
    return fig, state


def wavefront_map(mat_nm, grid_y=None, grid_z=None, path=None,
                  title="Wavefront error (nm)"):
    """Pseudocolor wavefront map (matrixWave2 plots, :3689-3698 style)."""
    plt = _plt()
    mat = np.asarray(mat_nm)
    fig, ax = plt.subplots()
    if grid_y is not None and grid_z is not None:
        im = ax.pcolormesh(np.asarray(grid_y), np.asarray(grid_z), mat,
                           shading="auto")
    else:
        im = ax.imshow(mat, origin="lower")
    fig.colorbar(im, ax=ax, label="nm")
    ax.set_title(title)
    return _save(fig, path)


def psf_image(psf, x_im=None, y_im=None, log: bool = False, floor_db=-60.0,
              path=None, half_width=None):
    """PSF image, linear or dB (reference ``psf_calc`` PSF.png / PSF_log.png,
    AKB_raytrace_20250312.py:1202-1266)."""
    from akbx.analysis import psf as _psf

    plt = _plt()
    img = np.asarray(psf)
    x = np.asarray(x_im) if x_im is not None else np.arange(img.shape[1])
    y = np.asarray(y_im) if y_im is not None else np.arange(img.shape[0])
    if half_width is not None:
        img, x, y = _psf.trim_window(img, x, y, half_width)
    if log:
        img = np.asarray(_psf.psf_to_db(img, floor_db))
    fig, ax = plt.subplots()
    im = ax.pcolormesh(x, y, img, shading="auto")
    fig.colorbar(im, ax=ax, label="dB" if log else "normalized intensity")
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    ax.set_title("PSF" + (" (log)" if log else ""))
    return _save(fig, path)


def psf_cuts(psf, x_im, y_im, path=None):
    """Center-line PSF cuts with FWHM annotations (reference :1226-1257)."""
    from akbx.analysis import psf as _psf

    plt = _plt()
    img = np.asarray(psf)
    x = np.asarray(x_im)
    y = np.asarray(y_im)
    cy, cx = np.unravel_index(np.argmax(img), img.shape)
    fig, axs = plt.subplots(1, 2, figsize=(8, 3))
    axs[0].plot(x, img[cy, :])
    axs[1].plot(y, img[:, cx])
    fw_x = float(_psf.fwhm(x, img[cy, :]))
    fw_y = float(_psf.fwhm(y, img[:, cx]))
    axs[0].set_title(f"H cut, FWHM {fw_x:.3e} m")
    axs[1].set_title(f"V cut, FWHM {fw_y:.3e} m")
    for ax in axs:
        ax.set_xlabel("position (m)")
    return _save(fig, path)


def legendre_modes(inner_products, orders, path=None):
    """Bar chart of Legendre-mode inner products (legendre_fit.py:104-267
    driver style)."""
    plt = _plt()
    ips = np.asarray(inner_products)
    labels = [f"({nx},{ny})" for nx, ny in np.asarray(orders)]
    fig, ax = plt.subplots(figsize=(max(4, 0.4 * len(ips)), 3))
    ax.bar(np.arange(len(ips)), ips)
    ax.set_xticks(np.arange(len(ips)), labels, rotation=90, fontsize=6)
    ax.set_ylabel("inner product")
    ax.set_title("Legendre aberration decomposition")
    return _save(fig, path)


def ellipse_layout(ell1, ell2, path=None):
    """Two-mirror KB layout chords + foci.

    Parity: ``plot_ellipses`` (KB_design_NAbased.py:234-275).
    """
    plt = _plt()
    fig, ax = plt.subplots()
    for e, c in ((ell1, "r"), (ell2, "b")):
        ax.plot([float(e.x_1), float(e.x_1 + e.x_2)],
                [float(e.y_1), float(e.y_2)], c + "--")
        ax.plot(2 * float(e.f), 0, c + "o")
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    ax.set_title("Ellipses")
    return _save(fig, path)


def incident_angles(ell1, ell2, path=None):
    """Per-mirror incident-angle spans (KB_design_NAbased.py:249-258)."""
    plt = _plt()
    fig, axs = plt.subplots(1, 2, sharey=False)
    for ax, e, c, name in ((axs[0], ell1, "r", "Ell1"),
                           (axs[1], ell2, "b", "Ell2")):
        ax.plot([0, float(e.x_2)],
                [float((e.theta_i1 + e.theta_o1) / 2),
                 float((e.theta_i2 + e.theta_o2) / 2)], c + "--")
        ax.set_xlabel("distance (m)")
        ax.set_title(f"{name} incident angle")
    axs[0].set_ylabel("incident angle (rad)")
    fig.tight_layout()
    return _save(fig, path)


def design_summary_text(ell1, ell2) -> str:
    """The design metrics block printed by the reference GUI
    (AKB_design_NAbased.py:110-123) as a string."""
    f = float
    lines = [
        f"Ell1 diverge angle: {f(ell1.theta_i1 - ell1.theta_i2):.6e}",
        f"Ell1 mirror length: {f(ell1.mirr_length):.6f}",
        f"Ell1 mirror angle: [{f((ell1.theta_i1 + ell1.theta_o1) / 2):.6f}, "
        f"{f((ell1.theta_i2 + ell1.theta_o2) / 2):.6f}]",
        f"Ell1 demagnification: [{f(ell1.m1):.1f}, {f(ell1.m2):.1f}]",
        f"Ell2 diverge angle: {f(ell2.theta_i1 - ell2.theta_i2):.6e}",
        f"Ell2 mirror length: {f(ell2.mirr_length):.6f}",
        f"Ell2 mirror angle: [{f((ell2.theta_i1 + ell2.theta_o1) / 2):.6f}, "
        f"{f((ell2.theta_i2 + ell2.theta_o2) / 2):.6f}]",
        f"Ell2 demagnification: [{f(ell2.m1):.1f}, {f(ell2.m2):.1f}]",
        "===========================",
        f"Ell1 aperture: {f(ell1.mirr_length * ell1.theta_centre):.6e}",
        f"Ell2 aperture: {f(ell2.mirr_length * ell2.theta_centre):.6e}",
        f"Area aperture: {f(ell1.mirr_length * ell1.theta_centre) * f(ell2.mirr_length * ell2.theta_centre):.6e}",
        f"Focus distance: {f(ell1.f - ell2.f):.6e}",
    ]
    return "\n".join(lines)


def design_raytrace_plot(rt: dict, path=None):
    """Plot of :func:`akbx.design_na.design_raytrace` output — profile,
    reflected rays, and the around-focus spot columns
    (KB_design_NAbased.py:86-107)."""
    plt = _plt()
    x = np.asarray(rt["x"])
    y = np.asarray(rt["y"])
    rvec = np.asarray(rt["rvec"])
    spots = np.asarray(rt["spots"])
    planes = np.asarray(rt["planes"])

    fig, axs = plt.subplots(1, 1 + spots.shape[0],
                            figsize=(3 + 1.2 * spots.shape[0], 3))
    axs[0].plot(x, y, "b")
    for i in range(0, x.size, max(1, x.size // 32)):
        axs[0].plot([x[i], x[i] + rvec[0, i]], [y[i], y[i] + rvec[1, i]],
                    "k", lw=0.1)
    axs[0].set_title("mirror + reflected rays")
    mid = (spots.min() + spots.max()) / 2
    for i in range(spots.shape[0]):
        ax = axs[1 + i]
        ax.scatter(np.full(spots.shape[1], planes[i] - planes[spots.shape[0] // 2]),
                   spots[i] - mid, c="r", s=1)
        ax.set_title(f"{planes[i] - planes[spots.shape[0] // 2]:+.1e}",
                     fontsize=7)
    fig.tight_layout()
    return _save(fig, path)
