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

import functools
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


def _deviation_constants(system: OpticalSystem, P, D, T, chief_p0):
    """Stacked per-mirror f64 chief constants of the deviation trace.

    The per-bounce body is identical across mirrors, so the deviation
    engines run it ONCE in the jitted graph (lax.scan in
    :func:`trace_df` / :func:`trace_dev32`, an in-kernel loop in
    :mod:`akbx.kernels.trace_kernel`).  The unrolled form lowered the df32
    fwd+bwd engine to 138k StableHLO lines — big enough to SIGKILL the
    remote TPU compile helper (BENCH_DETAIL round 3); the stacked form is
    ~4x smaller and numerically identical (pure reordering of the same
    program, verified by the trace_df parity suite).

    Returns (Ms, bvecs, Ds, Dns, Ts, A_noms, Bp_noms, rhos, gCs, gAs,
    branches, Ps), each with leading dim n_mirrors.
    """
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
    return (Ms, bvecs, Ds, Dns, Ts, A_noms, Bp_noms, rhos, gCs, gAs,
            branches, Ps)


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

    n_mirr = len(system.mirrors)
    consts = _deviation_constants(system, P, D, T, chief_p0)
    (Ms, bvecs, Ds, Dns, Ts, A_noms, Bp_noms, rhos, gCs, gAs, branches,
     Ps) = consts

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


def trace_dev32(system: OpticalSystem, rays: jnp.ndarray,
                origins: jnp.ndarray, chief_idx: int | None = None
                ) -> TraceResult:
    """The deviation trace in PLAIN single f32 — the backward-pass twin.

    Same algebra as :func:`trace_df` with every double-word op replaced by
    one f32 op.  Its forward VALUES are only f32-grade, but its Jacobian
    equals the df32/f64 engines' to f32 rounding (EFT error terms have
    near-zero derivatives), which is exactly what the Pallas fast path's
    ``custom_vjp`` backward needs: barrier-free, fusable, ~15x fewer ops
    than the df32 VJP.  Also usable directly for derivative-free spot
    metrics where nm wavefront accuracy is irrelevant.
    """
    f64 = jnp.float64
    F32 = jnp.float32
    N = rays.shape[1]
    if chief_idx is None:
        chief_idx = N // 2

    chief_d0 = rays[:, chief_idx:chief_idx + 1]
    chief_p0 = origins[:, chief_idx:chief_idx + 1]
    chief = trace(system, chief_d0, chief_p0)
    P = [pts[:, 0] for pts in chief.points]
    D = [d[:, 0] for d in chief.directions]
    T = [seg[0] for seg in chief.segments]

    n_mirr = len(system.mirrors)
    consts64 = _deviation_constants(system, P, D, T, chief_p0)
    consts32 = tuple(c.astype(F32) for c in consts64)
    (Ms, bvecs, Ds, Dns, Ts, A_noms, Bp_noms, rhos, gCs, gAs, branches,
     Ps32) = consts32
    Ps = consts64[-1]

    dd0 = (rays - chief_d0).astype(F32)    # (3, N)
    dp0 = (origins - chief_p0).astype(F32)

    def bounce(carry, const):
        dp, dd, valid = carry
        (M, bvec, Di, Dn, Ti, A_nom, Bp_nom, rho, gC, gA, branch,
         Pi) = const
        Mdp = M @ dp
        Mdd = M @ dd
        dC = gC @ dp + jnp.sum(Mdp * dp, axis=0)
        dA = gA @ dd + jnp.sum(Mdd * dd, axis=0)
        dB = gC @ dd + gA @ dp + 2.0 * jnp.sum(Mdp * dd, axis=0)
        R = (dA * Ti + dB) * Ti + dC + rho
        A_full = dA + A_nom
        Bp = 2.0 * dA * Ti + dB + Bp_nom
        disc = Bp * Bp - 4.0 * A_full * R
        ok = disc > 0
        sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
        sgn = jnp.where(Bp >= 0, F32(1.0), F32(-1.0))
        qq = -0.5 * (Bp + sgn * sq)
        safe_q = jnp.where(qq != 0, qq, F32(1.0))
        safe_A = jnp.where(A_full != 0, A_full, F32(1.0))
        t_plus = jnp.where(Bp >= 0, R / safe_q, qq / safe_A)
        t_minus = jnp.where(Bp >= 0, qq / safe_A, R / safe_q)
        dt = jnp.where(branch >= 0, t_plus, t_minus)
        valid = valid & ok

        d_full = dd + Di[:, None]
        dq = dp + Ti * dd + dt * d_full
        nvec = bvec[:, None] + 2.0 * (M @ dq)
        n_unit = nvec / jnp.linalg.norm(nvec, axis=0, keepdims=True)
        refl = d_full - 2.0 * jnp.sum(d_full * n_unit, axis=0) * n_unit
        dd_new = refl - Dn[:, None]
        return (dq, dd_new, valid), (dq, dd_new, n_unit, dt)

    valid0 = jnp.ones(N, dtype=bool)
    (_, _, valid), (dq_s, dd_s, n_s, dt_s) = jax.lax.scan(
        bounce, (dp0, dd0, valid0), consts32)

    points = tuple(Ps[i][:, None] + dq_s[i].astype(f64)
                   for i in range(n_mirr))
    dirs = (rays,) + tuple(consts64[3][i][:, None] + dd_s[i].astype(f64)
                           for i in range(n_mirr))
    normals = tuple(n_s[i].astype(f64) for i in range(n_mirr))
    segs = tuple(consts64[4][i] + dt_s[i].astype(f64)
                 for i in range(n_mirr))
    return TraceResult(points, dirs, normals, segs, valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _trace_pallas_core(system, rays, origins, chief_idx: int,
                       interpret: bool):
    """Pallas df32 deviation-trace forward with a plain-f32 backward.

    Forward: the Mosaic kernel (:mod:`akbx.kernels.trace_kernel`) — the
    barrier-free df32 bounce chain.  Backward: the VJP of
    :func:`trace_dev32` (see its docstring for why the Jacobians agree).
    """
    from akbx.kernels import trace_kernel as tk

    f64 = jnp.float64
    N = rays.shape[1]
    chief_d0 = rays[:, chief_idx:chief_idx + 1]
    chief_p0 = origins[:, chief_idx:chief_idx + 1]
    chief = trace(system, chief_d0, chief_p0)
    P = [pts[:, 0] for pts in chief.points]
    D = [d[:, 0] for d in chief.directions]
    T = [seg[0] for seg in chief.segments]

    n_mirr = len(system.mirrors)
    (Ms, bvecs, Ds, Dns, Ts, A_noms, Bp_noms, rhos, gCs, gAs, branches,
     Ps) = _deviation_constants(system, P, D, T, chief_p0)
    consts = tk.pack_consts(Ms, gCs, gAs, Ds, Dns, Ts, A_noms, Bp_noms,
                            rhos, branches, bvecs)

    dp64 = origins - chief_p0
    dd64 = rays - chief_d0
    if interpret:
        # off-TPU: the pure-jnp twin of the kernel (same bounce_chain)
        outs = tk.trace_deviation_reference(consts, dp64, dd64, n_mirr)
    else:
        outs = tk.trace_deviation_pallas(consts, dp64, dd64, n_mirr)
    dq_hi, dq_lo, od_hi, od_lo, dt_hi, dt_lo, val = outs

    def f64_of(hi, lo):
        return hi.astype(f64) + lo.astype(f64)

    points, dirs, normals, segs = [], [rays], [], []
    for m in range(n_mirr):
        pts = Ps[m][:, None] + f64_of(dq_hi[3 * m:3 * m + 3],
                                      dq_lo[3 * m:3 * m + 3])
        points.append(pts)
        dirs.append(Dns[m][:, None] + f64_of(od_hi[3 * m:3 * m + 3],
                                             od_lo[3 * m:3 * m + 3]))
        # normals in f64 from the placed quadric (DCE'd when unused)
        normals.append(geo.surface_normal(system.mirrors[m].coeffs, pts))
        segs.append(Ts[m] + f64_of(dt_hi[m], dt_lo[m]))
    valid = val[0] > 0.5
    return TraceResult(tuple(points), tuple(dirs), tuple(normals),
                       tuple(segs), valid)


def _trace_pallas_fwd(system, rays, origins, chief_idx, interpret):
    out = _trace_pallas_core(system, rays, origins, chief_idx, interpret)
    return out, (system, rays, origins)


def _trace_pallas_bwd(chief_idx, interpret, residuals, cot):
    system, rays, origins = residuals
    _, vjp = jax.vjp(
        lambda s, r, o: trace_dev32(s, r, o, chief_idx=chief_idx),
        system, rays, origins)
    return vjp(cot)


_trace_pallas_core.defvjp(_trace_pallas_fwd, _trace_pallas_bwd)


def trace_pallas(system: OpticalSystem, rays: jnp.ndarray,
                 origins: jnp.ndarray, chief_idx: int | None = None,
                 interpret: bool | None = None) -> TraceResult:
    """The TPU-throughput trace: Mosaic df32 forward, f32-VJP backward.

    Same contract as :func:`trace` / :func:`trace_df`.  ``interpret``
    defaults to the Pallas interpreter off-TPU (CI-runnable).
    """
    if interpret is None:
        from akbx.wave import _tpu_is_default

        interpret = not _tpu_is_default()
    if chief_idx is None:
        chief_idx = rays.shape[1] // 2
    return _trace_pallas_core(system, rays, origins, int(chief_idx),
                              bool(interpret))


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

    if precision in ("df32", "pallas"):
        has_figure = any(m.fig_coeffs.shape != (1, 1) for m in system.mirrors)
        if has_figure:
            trace_fn = trace  # figure fields live on the f64 path
        else:
            trace_fn = trace_df if precision == "df32" else trace_pallas
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
    if precision == "pallas":
        # throughput path: a plain f64 sum of 5 terms rounds at
        # ~ulp(146)/2 per add (~1e-13 m rms on the demeaned wavefront) —
        # 1000x under the 1e-10 m signal and ~100x under the f64 trace's
        # own noise, while the compensated df64 sum costs ~75
        # barrier-laden f64 ops/ray (it stays on the f64/df32 paths,
        # whose 7.8e-14 m oracle-parity claims need it)
        total = sum(result.segments) + d_last
        total2 = sum(result.segments) + d_last2
    else:
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
