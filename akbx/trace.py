"""Batched sequential ray tracing through a mirror chain (L3).

The engine of the framework: a pure function from (system, alignment,
ray-fan shape) to surface points, exit rays, detector intersections, OPLs
and wavefront maps.  Replaces the reference's three ~2500-line
``plot_result_debug`` variants + ``KB_debug`` with one engine — the mirror
sequence is data (``OpticalSystem.mirrors``), not code.

Key TPU-first choices:

* rays are ``(3, N)`` arrays; the mirror loop is unrolled (2 or 4 bounces);
  everything jits into one fused XLA program, differentiable end-to-end;
* invalid rays carry a boolean mask (no batch-wide NaN poisoning);
* OPL sums use compensated (double-word) accumulation
  (:mod:`akbx.core.precision`) — the nm-scale wavefront signal rides on
  ~1e2 m path lengths;
* the reference's scipy ``interp1d`` exit-pupil re-fan (:2849-2905) becomes
  ``jnp.interp``; its scipy ``griddata`` wavefront gridding is replaced by
  a differentiable quasi-grid resample (:mod:`akbx.wavefront`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from akbx.core import geometry as geo
from akbx.core import precision as pr
from akbx.surfaces import intersect_and_reflect
from akbx.systems import OpticalSystem


def masked_mean(x, valid, axis=None):
    w = valid.astype(x.dtype)
    return jnp.sum(x * w, axis=axis) / jnp.maximum(jnp.sum(w, axis=axis), 1.0)


def ray_fan(angles_h: jnp.ndarray, angles_v: jnp.ndarray) -> jnp.ndarray:
    """Direction fan (3, nV*nH) from per-axis angle vectors.

    Index layout matches the reference (:2710-2715): row-major with the
    vertical angle varying slowly: ``idx = iV * nH + iH``.
    """
    th, tv = jnp.meshgrid(jnp.tan(angles_h), jnp.tan(angles_v))  # (nV, nH)
    d = jnp.stack([jnp.ones_like(th), th, tv]).reshape(3, -1)
    return geo.normalize(d)


def fan_angles(fan: jnp.ndarray, n: int, mode: str = "uniform") -> jnp.ndarray:
    """Source angles across a (lo, hi) fan range.

    ``mode="uniform"`` is equally spaced; ``mode="edge_dense"`` is the
    reference's sigmoid-ramped sampling (``create_non_uniform_distribution``,
    AKB_raytrace_20250312.py:375-382 — the commented-in alternative at its
    fan sites :2705-2706) which concentrates rays at the aperture edges
    where grazing-incidence aberrations are steepest.
    """
    if mode == "edge_dense":
        from akbx.utils import non_uniform_distribution

        return non_uniform_distribution(fan[0], fan[1], n)
    return jnp.linspace(fan[0], fan[1], n)


class TraceResult(NamedTuple):
    points: tuple  # per-mirror surface points (3, N)
    directions: tuple  # incoming dir + per-mirror reflected dirs (3, N)
    normals: tuple  # per-mirror unit normals (3, N)
    segments: tuple  # per-leg path lengths (N,)
    valid: jnp.ndarray  # (N,)

    @property
    def exit_rays(self):
        return self.directions[-1]

    @property
    def exit_points(self):
        return self.points[-1]


def trace(system: OpticalSystem, rays: jnp.ndarray,
          origins: jnp.ndarray) -> TraceResult:
    """Sequential intersect->reflect through all mirrors
    (reference :2770-2821, :2881-2897)."""
    points, dirs, normals, segs = [], [rays], [], []
    valid = jnp.ones(rays.shape[1], dtype=bool)
    p = origins
    d = rays
    for mirror in system.mirrors:
        pts, refl, n, seg, ok = intersect_and_reflect(mirror, d, p)
        valid = valid & ok
        points.append(pts)
        dirs.append(refl)
        normals.append(n)
        segs.append(seg)
        p, d = pts, refl
    return TraceResult(tuple(points), tuple(dirs), tuple(normals),
                       tuple(segs), valid)


def trace_df(system: OpticalSystem, rays: jnp.ndarray,
             origins: jnp.ndarray, chief_idx: int | None = None
             ) -> TraceResult:
    """The sequential trace as an exact *deviation* from an f64 chief ray,
    computed in double-f32 — the TPU fast path.

    Why not plain df32 on re-centered coordinates: the 146 m first leg
    limits a double-f32 ``t`` to ~3e-13 m, and grazing incidence amplifies
    that seed by 1/sin(theta_g) per bounce (~1e-9 m OPL error after four
    mirrors).  Instead, ONE chief ray is traced in f64 (a (3,1) batch —
    negligible) and every other ray is represented by its deviation
    (dp, dd) from the chief.  Quadrics are degree-2 polynomials, so the
    deviation update is EXACT algebra, not a linearization:

      C  = C_nom + gC.dp + dp^T M dp          gC = gradQ(p_nom)
      B  = B_nom + gC.dd + gA.dp + 2 dp^T M dd    gA = 2 M D
      A  = A_nom + gA.dd + dd^T M dd
      dt : A dt^2 + (2 A T + B) dt + (A T^2 + B T + C) = 0   (small root)

    with every *_nom / T / D / M a per-mirror f64 constant from the chief
    trace (their f64 rounding is common-mode across rays and cancels in
    wavefront differences), and every per-ray quantity small — so df32\'s
    ~49-bit mantissa yields ~1e-15 m leg-length deviations, *better* than
    the plain f64 path.  Branch selection is inherited from the chief:
    the small root stays on the chief\'s conic branch, matching the
    reference\'s ``negative=`` flag semantics
    (AKB_raytrace_20250312.py:2820).

    ``chief_idx``: fan index of the chief ray (default: batch center).
    Outputs are f64; same contract as :func:`trace`.
    """
    from akbx.core import geometry_df as gdf
    from akbx.core.precision import (DF, df_add, df_div, df_mul, df_mul_f,
                                     df_neg, df_sqrt, df_sub)

    f64 = jnp.float64
    F32 = jnp.float32
    N = rays.shape[1]
    shape = (N,)
    if chief_idx is None:
        chief_idx = N // 2

    # --- f64 chief trace (one ray) -> all per-mirror constants ---------
    chief_d0 = rays[:, chief_idx:chief_idx + 1]
    chief_p0 = origins[:, chief_idx:chief_idx + 1]
    chief = trace(system, chief_d0, chief_p0)
    P = [pts[:, 0] for pts in chief.points]        # chief hit points (3,)
    D = [d[:, 0] for d in chief.directions]        # D[0] in, D[i+1] out
    T = [seg[0] for seg in chief.segments]         # chief leg lengths

    # per-ray deviations: exact f64 subtraction, then split to f32 pairs
    dd = gdf.Vec3DF.from_f64(rays - chief_d0)
    dp = gdf.Vec3DF.from_f64(origins - chief_p0)

    # --- stacked per-mirror f64 constants (leading dim = n mirrors) ----
    # The per-bounce body is identical across mirrors, so it runs ONCE in
    # the jitted graph under lax.scan.  The unrolled form lowered the df32
    # fwd+bwd engine to 138k StableHLO lines — big enough to SIGKILL the
    # remote TPU compile helper (BENCH_DETAIL round 3); the scan form is
    # ~4x smaller and numerically identical (pure reordering of the same
    # program, verified by the trace_df parity suite).
    n_mirr = len(system.mirrors)
    Ps = jnp.stack(P)                               # (nm, 3)
    coeffs_l = jnp.stack([geo.shift(m.coeffs, -P[i])
                          for i, m in enumerate(system.mirrors)])
    Ms = jnp.stack([
        jnp.stack([coeffs_l[:, 0], coeffs_l[:, 3] / 2, coeffs_l[:, 4] / 2]),
        jnp.stack([coeffs_l[:, 3] / 2, coeffs_l[:, 1], coeffs_l[:, 5] / 2]),
        jnp.stack([coeffs_l[:, 4] / 2, coeffs_l[:, 5] / 2, coeffs_l[:, 2]]),
    ]).transpose(2, 0, 1)                           # (nm, 3, 3)
    bvecs = coeffs_l[:, 6:9]
    Ds = jnp.stack(D[:-1])                          # (nm, 3) incoming
    Dns = jnp.stack(D[1:])                          # (nm, 3) outgoing
    Ts = jnp.stack([jnp.asarray(t) for t in T])     # (nm,)
    prev_pts = jnp.concatenate([chief_p0[:, 0][None], Ps[:-1]], axis=0)
    p_noms = prev_pts - Ps                          # (nm, 3)

    A_noms = jnp.einsum("mi,mij,mj->m", Ds, Ms, Ds)
    B_noms = (2.0 * jnp.einsum("mi,mij,mj->m", p_noms, Ms, Ds)
              + jnp.einsum("mi,mi->m", bvecs, Ds))
    C_noms = (jnp.einsum("mi,mij,mj->m", p_noms, Ms, p_noms)
              + jnp.einsum("mi,mi->m", bvecs, p_noms) + coeffs_l[:, 9])
    gCs = 2.0 * jnp.einsum("mij,mj->mi", Ms, p_noms) + bvecs
    gAs = 2.0 * jnp.einsum("mij,mj->mi", Ms, Ds)
    rhos = (A_noms * Ts + B_noms) * Ts + C_noms     # chief residuals (~0)
    Bp_noms = 2.0 * A_noms * Ts + B_noms
    branches = jnp.stack([jnp.asarray(m.branch) for m in system.mirrors])

    consts = (Ms, bvecs, Ds, Dns, Ts, A_noms, Bp_noms, rhos, gCs, gAs,
              branches, Ps)

    def bounce(carry, const):
        dp, dd, valid = carry
        (M, bvec, Di, Dn, Ti, A_nom, Bp_nom, rho, gC, gA, branch,
         Pi) = const

        # split the constants once per bounce
        M9 = gdf.mat3_const(M)
        gC_c = gdf.vec3_const(gC, shape)
        gA_c = gdf.vec3_const(gA, shape)
        D_c = gdf.vec3_const(Di, shape)
        Dn_c = gdf.vec3_const(Dn, shape)
        nn_c = gdf.vec3_const(bvec, shape)          # gradQ(0) = bvec
        T_c = gdf.df_bcast(gdf.split_f64(Ti), shape)
        T2_c = gdf.df_bcast(gdf.split_f64(Ti * Ti), shape)
        A_c = gdf.df_bcast(gdf.split_f64(A_nom), shape)
        Bp_c = gdf.df_bcast(gdf.split_f64(Bp_nom), shape)
        rho_c = gdf.df_bcast(gdf.split_f64(rho), shape)

        # per-ray deviation forms (all operands small or O(1))
        Mdp = gdf.matvec(M9, dp)
        Mdd = gdf.matvec(M9, dd)
        dC = df_add(gC_c.dot(dp), Mdp.dot(dp))
        dA = df_add(gA_c.dot(dd), Mdd.dot(dd))
        dB = df_add(df_add(gC_c.dot(dd), gA_c.dot(dp)),
                    df_mul_f(Mdp.dot(dd), F32(2.0)))

        # R = A T^2 + B T + C - (chief part) = dA T^2 + dB T + dC + rho
        R = df_add(df_add(df_mul(dA, T2_c), df_mul(dB, T_c)),
                   df_add(dC, rho_c))
        A_full = df_add(dA, A_c)
        Bp = df_add(df_add(df_mul_f(df_mul(dA, T_c), F32(2.0)), dB), Bp_c)

        # roots of A dt^2 + B' dt + R = 0, stable q-form.  The shift
        # t = T + dt leaves the discriminant invariant, so the global
        # branch flag selects the same physical sheet here:
        # dt_branch = (-B' + branch * sqrt(D)) / (2A).
        disc = df_sub(df_mul(Bp, Bp),
                      df_mul_f(df_mul(A_full, R), F32(4.0)))
        ok = disc.hi > 0
        disc_c = DF(jnp.where(ok, disc.hi, F32(0.0)),
                    jnp.where(ok, disc.lo, F32(0.0)))
        sq = df_sqrt(disc_c)
        sgn = jnp.where(Bp.hi >= 0, F32(1.0), F32(-1.0))
        qq = df_mul_f(df_add(Bp, df_mul_f(sq, sgn)), F32(-0.5))
        safe_q = DF(jnp.where(qq.hi != 0, qq.hi, F32(1.0)), qq.lo)
        safe_A = DF(jnp.where(A_full.hi != 0, A_full.hi, F32(1.0)),
                    A_full.lo)
        t_q_over_A = df_div(qq, safe_A)
        t_R_over_q = df_div(R, safe_q)
        b_nonneg = Bp.hi >= 0
        t_plus = DF(jnp.where(b_nonneg, t_R_over_q.hi, t_q_over_A.hi),
                    jnp.where(b_nonneg, t_R_over_q.lo, t_q_over_A.lo))
        t_minus = DF(jnp.where(b_nonneg, t_q_over_A.hi, t_R_over_q.hi),
                     jnp.where(b_nonneg, t_q_over_A.lo, t_R_over_q.lo))
        pick_plus = branch >= 0
        dt = DF(jnp.where(pick_plus, t_plus.hi, t_minus.hi),
                jnp.where(pick_plus, t_plus.lo, t_minus.lo))
        valid = valid & ok

        # intersection deviation: dq = dp + T dd + dt (D + dd)
        d_full = gdf.Vec3DF(df_add(dd.x, D_c.x), df_add(dd.y, D_c.y),
                            df_add(dd.z, D_c.z))
        dq = dp.add(dd.scale(T_c)).add(d_full.scale(dt))

        # normal: gradQ(dq) = bvec + 2 M dq, normalized in df32
        Mdq = gdf.matvec(M9, dq)
        n_unit = gdf.Vec3DF(df_add(df_mul_f(Mdq.x, F32(2.0)), nn_c.x),
                            df_add(df_mul_f(Mdq.y, F32(2.0)), nn_c.y),
                            df_add(df_mul_f(Mdq.z, F32(2.0)), nn_c.z)
                            ).normalize()

        # reflect the full direction; deviation from the chief's reflected
        refl = gdf.reflect_df(d_full, n_unit)
        dd_new = gdf.Vec3DF(df_sub(refl.x, Dn_c.x), df_sub(refl.y, Dn_c.y),
                            df_sub(refl.z, Dn_c.z))

        pts64 = Pi[:, None].astype(f64) + dq.to_f64()
        dir64 = Dn[:, None].astype(f64) + dd_new.to_f64()
        seg64 = Ti.astype(f64) + gdf.df_to_f64(dt)
        # dp = dq: frames hop through the chief constants
        return (dq, dd_new, valid), (pts64, dir64, n_unit.to_f64(), seg64)

    valid0 = jnp.ones(N, dtype=bool)
    (_, _, valid), (pts_s, dirs_s, norms_s, segs_s) = jax.lax.scan(
        bounce, (dp, dd, valid0), consts)

    points = tuple(pts_s[i] for i in range(n_mirr))
    dirs = (rays,) + tuple(dirs_s[i] for i in range(n_mirr))
    normals = tuple(norms_s[i] for i in range(n_mirr))
    segs = tuple(segs_s[i] for i in range(n_mirr))
    return TraceResult(points, dirs, normals, segs, valid)


def exit_pupil_uniform_angles(result: TraceResult, rand_p0h, rand_p0v,
                              n_h: int, n_v: int, stage: int = -1):
    """Re-derive source angles so *exit* angles are equally spaced.

    The reference samples the exit angles of the center row/column, builds
    scipy ``interp1d`` maps exit->input angle, and re-fans
    (:2849-2879).  Same algorithm with ``jnp.interp`` (monotonicity-safe).

    ``stage`` selects which bounce's direction field to uniformize on:
    -1 (default) = final exit angles; 1 = after the first mirror — the
    reference's KB ``option_avrgsplt`` equal-split mode, whose ``reset_p0``
    re-fans on the mirror-1-to-mirror-2 angles (:11010-11037, 11642-11650).
    """
    angle = result.directions[stage]
    angle_h = jnp.arctan(angle[1] / angle[0])
    angle_v = jnp.arctan(angle[2] / angle[0])

    # center column: iH = (n_h-1)//2, iV varies  (reference :2851-2852)
    center_col = jnp.arange(n_v) * n_h + round((n_h - 1) / 2)
    # center row: iV = (n_v-1)//2, iH varies  (reference :2854-2856)
    center_row = round(n_v * (n_v - 1) / 2) + jnp.arange(n_h) if n_h == n_v \
        else ((n_v - 1) // 2) * n_h + jnp.arange(n_h)

    av = angle_v[center_col]
    ah = angle_h[center_row]

    def remap(a_exit, a_in, n):
        eq = jnp.linspace(a_exit[0], a_exit[-1], n)
        sign = jnp.where(a_exit[-1] >= a_exit[0], 1.0, -1.0)
        return jnp.interp(sign * eq, sign * a_exit, a_in)

    return remap(ah, rand_p0h, n_h), remap(av, rand_p0v, n_v)


def detector_points(result: TraceResult, x_plane) -> jnp.ndarray:
    """Intersect exit rays with the plane x = x_plane."""
    return geo.plane_intersect(geo.detector_plane(x_plane), result.exit_rays,
                               result.exit_points)


def tilt_correct(result: TraceResult, detcenter: jnp.ndarray,
                 mode: str = "mean"):
    """Remove the mean exit-beam tilt (reference :3564-3601).

    Rotates exit rays and exit points about the approximate focus so the
    beam axis is +x.  Returns (new_exit_rays, new_exit_points, theta_y,
    theta_z, focus_apprx).

    ``mode`` selects the beam-axis estimator: ``"mean"`` is the main
    engine's non-'ray' path (nanmean of arctan, AKB_raytrace_20250312.py:
    3584-3589); ``"extremes"`` is the midpoint of the extreme ray angles,
    which the III_I engine uses unconditionally
    (AKB_raytrace_III_I_20250710.py:1837-1840) — on a distorted exit fan
    the two differ by ~1e-3 rad, a first-order wavefront effect.
    """
    angle = result.exit_rays
    v = result.valid
    a_zx = jnp.arctan(angle[2] / angle[0])
    a_yx = jnp.arctan(angle[1] / angle[0])
    if mode == "extremes":
        big = jnp.float64(jnp.inf)
        theta_y = -0.5 * (jnp.min(jnp.where(v, a_zx, big))
                          + jnp.max(jnp.where(v, a_zx, -big)))
        theta_z = 0.5 * (jnp.min(jnp.where(v, a_yx, big))
                         + jnp.max(jnp.where(v, a_yx, -big)))
    else:
        theta_y = -masked_mean(a_zx, v)
        theta_z = masked_mean(a_yx, v)
    focus_apprx = masked_mean(detcenter, v[None, :], axis=1)
    rays2 = geo.rotate_vectors_yz(result.exit_rays, -theta_y, -theta_z)
    pts2 = geo.rotate_points_about(result.exit_points, focus_apprx,
                                   -theta_y, -theta_z)
    return rays2, pts2, theta_y, theta_z, focus_apprx


class EngineResult(NamedTuple):
    """Everything the analysis layers need from one full engine run."""

    trace: TraceResult
    detcenter: jnp.ndarray  # focal-plane intersections (3, N), tilt-corrected
    detcenter2: jnp.ndarray  # defocused-plane intersections (3, N)
    total_dist: jnp.ndarray  # OPL to focal plane (N,)
    total_dist2: jnp.ndarray  # OPL to defocused plane (N,)
    wave2: jnp.ndarray  # wavefront error on defocused plane [nm] (N,)
    valid: jnp.ndarray
    theta_y: jnp.ndarray
    theta_z: jnp.ndarray
    focus_apprx: jnp.ndarray
    rand_p0h: jnp.ndarray
    rand_p0v: jnp.ndarray


def run(system: OpticalSystem, n_h: int, n_v: int, defocus,
        defocus_wave=1e-3, exit_pupil_uniform: bool = True,
        tilt_correction: bool = True, ray_sharding=None,
        uniform_stage: int = -1, precision: str = "f64",
        tilt_mode: str = "mean", fan_mode: str = "uniform") -> EngineResult:
    """Full engine pass: fan -> trace (-> uniform re-fan -> re-trace)
    -> tilt removal -> detector planes -> OPL -> wavefront.

    Mirrors the reference 'ray_wave' path
    (AKB_raytrace_20250312.py:2688-2905, 3564-3633).

    ``ray_sharding``: optional ``jax.sharding.NamedSharding`` (ray axis
    last) applied to the generated fan via ``with_sharding_constraint`` so
    the whole per-ray pipeline shards over the mesh (multi-chip data
    parallelism over rays).
    """
    rand_p0h = fan_angles(system.fan_h, n_h, mode=fan_mode)
    rand_p0v = fan_angles(system.fan_v, n_v, mode=fan_mode)
    src = system.source[:, None] * jnp.ones((1, n_h * n_v))

    if precision == "df32":
        has_figure = any(m.fig_coeffs.shape != (1, 1) for m in system.mirrors)
        trace_fn = trace if has_figure else trace_df
    else:
        trace_fn = trace

    rays = ray_fan(rand_p0h, rand_p0v)
    if ray_sharding is not None:
        rays = jax.lax.with_sharding_constraint(rays, ray_sharding)
        src = jax.lax.with_sharding_constraint(src, ray_sharding)
    result = trace_fn(system, rays, src)

    if exit_pupil_uniform:
        new_h, new_v = exit_pupil_uniform_angles(result, rand_p0h, rand_p0v,
                                                 n_h, n_v,
                                                 stage=uniform_stage)
        rays = ray_fan(new_h, new_v)
        result = trace_fn(system, rays, src)
        rand_p0h, rand_p0v = new_h, new_v

    det_x = system.s2f_middle + defocus
    detcenter = detector_points(result, det_x)

    if tilt_correction:
        rays2, pts2, theta_y, theta_z, focus_apprx = tilt_correct(
            result, detcenter, mode=tilt_mode)
        result = result._replace(
            points=result.points[:-1] + (pts2,),
            directions=result.directions[:-1] + (rays2,),
        )
        detcenter = detector_points(result, det_x)
    else:
        theta_y = jnp.zeros(())
        theta_z = jnp.zeros(())
        focus_apprx = masked_mean(detcenter, result.valid[None, :], axis=1)

    detcenter2 = detector_points(result, det_x + defocus_wave)

    # OPL with compensated accumulation (reference :3623-3633)
    d_last = jnp.linalg.norm(detcenter - result.exit_points, axis=0)
    d_last2 = jnp.linalg.norm(detcenter2 - result.exit_points, axis=0)
    total = pr.sum_segments(list(result.segments) + [d_last])
    total2 = pr.sum_segments(list(result.segments) + [d_last2])

    # wavefront on the defocused plane: OPL error minus reference sphere
    # (reference :3626-3633, 3673-3677)
    v = result.valid
    mean_focus = masked_mean(detcenter, v[None, :], axis=1)
    dist_err2 = (total2 - masked_mean(total2, v)) * 1e9
    sph = jnp.linalg.norm(detcenter2 - mean_focus[:, None], axis=0) * 1e9
    wave2 = dist_err2 - sph

    return EngineResult(result, detcenter, detcenter2, total, total2, wave2,
                        v, theta_y, theta_z, focus_apprx, rand_p0h, rand_p0v)


def run_config(system: OpticalSystem, cfg, defocus) -> EngineResult:
    """Run the engine from a typed :class:`akbx.config.TraceConfig`.

    The reference mutates ~15 module globals (``option_*``,
    AKB_raytrace_20250312.py:48-114) to select this behavior; here the
    same choices arrive as one immutable config object.
    """
    return run(system, cfg.n_rays_h, cfg.n_rays_v, defocus,
               defocus_wave=cfg.defocus_for_wave,
               exit_pupil_uniform=cfg.exit_pupil_uniform,
               tilt_correction=cfg.tilt_correction,
               tilt_mode=cfg.tilt_mode, fan_mode=cfg.fan_mode,
               precision=cfg.precision)


def spot_size(detcenter: jnp.ndarray, valid: jnp.ndarray):
    """Masked std of the spot in (horizontal, vertical)."""
    w = valid.astype(detcenter.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu_y = jnp.sum(detcenter[1] * w) / n
    mu_z = jnp.sum(detcenter[2] * w) / n
    sy = jnp.sqrt(jnp.sum(w * (detcenter[1] - mu_y) ** 2) / n)
    sz = jnp.sqrt(jnp.sum(w * (detcenter[2] - mu_z) ** 2) / n)
    return sy, sz
