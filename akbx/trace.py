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


def _dev32_scan(consts32, dp0, dd0):
    """The plain-f32 deviation bounce chain (the scan body of
    :func:`trace_dev32`), shared with the fast-engine backward twin.
    Returns ((dq_s, dd_s, n_s, dt_s), valid) with leading dim n_mirr."""
    F32 = jnp.float32

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

    valid0 = jnp.ones(dp0.shape[1], dtype=bool)
    # unroll: the scan-form VJP stacks residuals per iteration and blocks
    # cross-bounce fusion; at 4 bounces the unrolled HLO is tiny and this
    # twin's VJP is the whole backward of the Pallas fast path (measured
    # round 5: fwd 26.8 ms vs fwd+bwd 112.5 ms at 2048^2 before this)
    (_, _, valid), ys = jax.lax.scan(bounce, (dp0, dd0, valid0), consts32,
                                     unroll=4)
    return ys, valid


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
    (dq_s, dd_s, n_s, dt_s), valid = _dev32_scan(consts32, dp0, dd0)

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
    dq_hi, dq_lo, od_hi, od_lo, dt_hi, dt_lo, _dsum_hi, _dsum_lo, val = outs

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


# ---------------------------------------------------------------------------
# Fast engine: the full run() per-ray pipeline (trace -> tilt removal ->
# detector planes -> OPL) on the Pallas deviation kernels.  The generic
# pallas path leaves ~100 f64-emulated ops/ray (arctan, plane intersects,
# norms) in the live XLA graph after the bounce kernel — on TPU that
# dominates the kernel itself.  Here every per-ray stage is deviation-form
# df32 (kernels) or f32 (reductions); f64 appears only in per-chief
# scalars and in materializations that XLA dead-code-eliminates when the
# caller consumes the f32 deviation outputs instead.
#
# custom_vjp boundary: at the RAW deviation level.  The forward returns
# f32 (hi, lo) deviation arrays plus f64 chief scalars; all f64
# reconstruction happens OUTSIDE the boundary in ordinary autodiff-land,
# so both the forward materializations and their backward cotangent
# chains vanish for unused outputs.  The backward twin recomputes the
# same deviations in plain f32 (lo words = 0): EFT error terms have
# near-zero derivatives, so the Jacobians agree to f32 rounding (same
# argument as trace_dev32; measured in tests/test_trace_pallas.py).
# ---------------------------------------------------------------------------


class FastDevOut(NamedTuple):
    """Raw deviation-level outputs of the fast engine core.

    Per-ray f32 arrays (hi/lo double-words) + f64 chief-ray scalars.
    ``ddet``/``dtot`` are deviations of the (tilt-corrected) detector
    intersection / total OPL from the chief's; ``det_c``/``total_chief``
    are the chief values to add back.
    """

    dq_hi: jnp.ndarray      # (3*nm, N) per-mirror intersection deviations
    dq_lo: jnp.ndarray
    od_hi: jnp.ndarray      # (3*nm, N) reflected-direction deviations
    od_lo: jnp.ndarray
    dt_hi: jnp.ndarray      # (nm, N) leg-length deviations
    dt_lo: jnp.ndarray
    ddet_hi: jnp.ndarray    # (3, N) focal-plane intersection deviations
    ddet_lo: jnp.ndarray
    ddet2_hi: jnp.ndarray   # (3, N) defocused-plane deviations
    ddet2_lo: jnp.ndarray
    dqr_hi: jnp.ndarray     # (3, N) tilt-rotated exit-point deviations
    dqr_lo: jnp.ndarray
    ddr_hi: jnp.ndarray     # (3, N) tilt-rotated exit-dir deviations
    ddr_lo: jnp.ndarray
    dtot_hi: jnp.ndarray    # (N,) OPL deviation to the focal plane
    dtot_lo: jnp.ndarray
    dtot2_hi: jnp.ndarray   # (N,) OPL deviation to the defocused plane
    dtot2_lo: jnp.ndarray
    valid: jnp.ndarray      # (N,) bool
    theta_y: jnp.ndarray    # tilt-removal angles (f64 scalars)
    theta_z: jnp.ndarray
    focus: jnp.ndarray      # (3,) pre-tilt mean focus (rotation pivot)
    P_chief: jnp.ndarray    # (nm, 3) chief hit points
    D_chief: jnp.ndarray    # (nm, 3) chief outgoing directions
    T_chief: jnp.ndarray    # (nm,) chief leg lengths
    P4r: jnp.ndarray        # (3,) tilt-rotated chief exit point
    D4r: jnp.ndarray        # (3,) tilt-rotated chief exit direction
    det_c: jnp.ndarray      # (3,) chief focal-plane intersection
    det_c2: jnp.ndarray     # (3,) chief defocused-plane intersection
    total_chief: jnp.ndarray   # chief OPL to the focal plane
    total2_chief: jnp.ndarray  # chief OPL to the defocused plane


def _tilt_stats(D4, dd4_32, valid, tilt: bool, tilt_mode: str):
    """Tilt-removal angles from exit-direction deviations.

    ``a = arctan(d_w / d_x)`` decomposes exactly into the chief angle
    (f64 scalar) plus ``arctan((u - v) / (1 + u v))`` with u the per-ray
    and v the chief slope — the difference term is small, so plain f32
    resolves it to ~1e-10 rad absolute, far below the 1e-3 rad angles.
    Semantics match :func:`tilt_correct` (reference :3564-3601 / the
    III_I extremes estimator).
    """
    from akbx.core import trig as tg

    f64 = jnp.float64
    if not tilt:
        z = jnp.zeros((), dtype=f64)
        return z, z
    D432 = D4.astype(jnp.float32)

    def dev_angle(comp):
        num = D432[0] * dd4_32[comp] - D432[comp] * dd4_32[0]
        den = D432[0] * (D432[0] + dd4_32[0])
        w = num / den
        u = (D432[comp] + dd4_32[comp]) / (D432[0] + dd4_32[0])
        v = D432[comp] / D432[0]
        return jnp.arctan(w / (1.0 + u * v))

    da_zx = dev_angle(2)
    da_yx = dev_angle(1)
    # chief angle in f64; the f32 rounding of the chief direction inside
    # dev_angle enters the reconstruction only at second order
    # (measured net bias ~2e-9 rad at 9x9 -> ~6e-10 m on the detector,
    # far under the 5e-9 m parity tolerance)
    a_zx_c = tg.arctan(D4[2] / D4[0])
    a_yx_c = tg.arctan(D4[1] / D4[0])
    if tilt_mode == "extremes":
        big = jnp.float32(jnp.inf)

        def mid(a):
            return 0.5 * (jnp.min(jnp.where(valid, a, big))
                          + jnp.max(jnp.where(valid, a, -big)))

        m_zx, m_yx = mid(da_zx), mid(da_yx)
    else:
        m_zx = masked_mean(da_zx, valid)
        m_yx = masked_mean(da_yx, valid)
    theta_y = -(a_zx_c + m_zx.astype(f64))
    theta_z = a_yx_c + m_yx.astype(f64)
    return theta_y, theta_z


def _pre_tilt_focus(P4, D4, det_x, dq4_32, dd4_32, valid):
    """Masked mean of the pre-tilt focal-plane intersections (the tilt
    rotation pivot, reference :3591), chief + f32 deviation mean."""
    f64 = jnp.float64
    t_c0 = (det_x - P4[0]) / D4[0]
    det_c0 = P4 + t_c0 * D4
    D432 = D4.astype(jnp.float32)
    tc032 = t_c0.astype(jnp.float32)
    den = D432[0] + dd4_32[0]
    dt0 = -(dq4_32[0] + tc032 * dd4_32[0]) / den
    ddet0 = dq4_32 + tc032 * dd4_32 + dt0 * (D432[:, None] + dd4_32)
    return det_c0 + masked_mean(ddet0, valid[None, :], axis=1).astype(f64)


def _tilt_rotation(theta_y, theta_z):
    """R = Ry(-theta_y) @ Rz(-theta_z) — the tilt-removal rotation
    (:func:`akbx.core.geometry.rotate_vectors_yz` with negated angles)."""
    Ry = geo.rodrigues(jnp.array([0.0, 1.0, 0.0]), -theta_y)
    Rz = geo.rodrigues(jnp.array([0.0, 0.0, 1.0]), -theta_z)
    return Ry @ Rz


def _det_plane_scalars(P4r, D4r, det_x):
    """Chief detector-plane constants: (t_c, det_c, L)."""
    from akbx.core import trig as tg

    t_c = (det_x - P4r[0]) / D4r[0]
    det_c = P4r + t_c * D4r
    L = jnp.abs(t_c) * tg.sqrt(jnp.sum(D4r * D4r))
    return t_c, det_c, L


def _det_stage_f32(R, D4r, t_c, L, dq32, dd32, dsum32):
    """Plain-f32 twin of the detector kernel's deviation algebra."""
    F32 = jnp.float32
    R32 = R.astype(F32)
    D432 = D4r.astype(F32)
    tc32 = t_c.astype(F32)
    L32 = L.astype(F32)
    dqr = R32 @ dq32
    ddr = R32 @ dd32
    den = D432[0] + ddr[0]
    dt = -(dqr[0] + tc32 * ddr[0]) / den
    d_full = D432[:, None] + ddr
    delta = tc32 * ddr + dt * d_full
    ddet = dqr + delta
    u = (2.0 * tc32 * jnp.sum(D432[:, None] * delta, axis=0)
         + jnp.sum(delta * delta, axis=0))
    dlast = u / (L32 + jnp.sqrt(jnp.maximum(L32 * L32 + u, 0.0)))
    dtot = dsum32 + dlast
    return ddet, dqr, ddr, dtot


def _fast_scalars(system, rays, origins, det_x, det_x2, chief_idx):
    """Chief trace + deviation constants shared by forward and twin."""
    chief_d0 = rays[:, chief_idx:chief_idx + 1]
    chief_p0 = origins[:, chief_idx:chief_idx + 1]
    chief = trace(system, chief_d0, chief_p0)
    P = [p[:, 0] for p in chief.points]
    D = [d[:, 0] for d in chief.directions]
    T = [s[0] for s in chief.segments]
    consts64 = _deviation_constants(system, P, D, T, chief_p0)
    return chief_d0, chief_p0, consts64


def _fast_post_scalars(consts64, det_x, det_x2, theta_y, theta_z, focus,
                       tilt: bool):
    """Rotation + per-plane chief constants of the detector stage."""
    f64 = jnp.float64
    Ts = consts64[4]
    P4 = consts64[-1][-1]
    D4 = consts64[3][-1]
    if tilt:
        R = _tilt_rotation(theta_y, theta_z)
        P4r = R @ (P4 - focus) + focus
        D4r = R @ D4
    else:
        R = jnp.eye(3, dtype=f64)
        P4r, D4r = P4, D4
    t_c, det_c, L = _det_plane_scalars(P4r, D4r, det_x)
    t_c2, det_c2, L2 = _det_plane_scalars(P4r, D4r, det_x2)
    T_sum = jnp.sum(Ts)
    return (R, P4r, D4r, t_c, det_c, L, t_c2, det_c2, L2,
            T_sum + L, T_sum + L2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fast_devs(system, rays, origins, det_x, det_x2, chief_idx: int,
               tilt: bool, tilt_mode: str, interpret: bool):
    """Deviation-level fast engine: Pallas bounce + detector kernels.

    Forward: Mosaic df32 kernels (jnp twins when ``interpret``).
    Backward: the VJP of :func:`_fast_devs_f32` (plain f32, lo words 0).
    """
    from akbx.kernels import trace_kernel as tk

    chief_d0, chief_p0, consts64 = _fast_scalars(
        system, rays, origins, det_x, det_x2, chief_idx)
    (Ms, bvecs, Ds, Dns, Ts, A_noms, Bp_noms, rhos, gCs, gAs, branches,
     Ps) = consts64
    n_mirr = Ps.shape[0]
    consts = tk.pack_consts(Ms, gCs, gAs, Ds, Dns, Ts, A_noms, Bp_noms,
                            rhos, branches, bvecs)
    dp64 = origins - chief_p0
    dd64 = rays - chief_d0
    if interpret:
        outs = tk.trace_deviation_reference(consts, dp64, dd64, n_mirr)
    else:
        outs = tk.trace_deviation_pallas(consts, dp64, dd64, n_mirr)
    (dq_hi, dq_lo, od_hi, od_lo, dt_hi, dt_lo, dsum_hi, dsum_lo,
     val) = outs
    valid = val[0] > 0.5
    s = slice(3 * (n_mirr - 1), 3 * n_mirr)
    q4_hi, q4_lo = dq_hi[s], dq_lo[s]
    d4_hi, d4_lo = od_hi[s], od_lo[s]
    P4, D4 = Ps[-1], Dns[-1]

    theta_y, theta_z = _tilt_stats(D4, d4_hi, valid, tilt, tilt_mode)
    focus = _pre_tilt_focus(P4, D4, det_x, q4_hi, d4_hi, valid)
    (R, P4r, D4r, t_c, det_c, L, t_c2, det_c2, L2, total_chief,
     total2_chief) = _fast_post_scalars(consts64, det_x, det_x2,
                                        theta_y, theta_z, focus, tilt)

    dfn = tk.detector_reference if interpret else tk.detector_pallas
    dcon = tk.pack_det_consts(R, D4r, t_c, L)
    dcon2 = tk.pack_det_consts(R, D4r, t_c2, L2)
    (ddet_hi, ddet_lo, dqr_hi, dqr_lo, ddr_hi, ddr_lo, dtot_hi,
     dtot_lo) = dfn(dcon, q4_hi, q4_lo, d4_hi, d4_lo, dsum_hi, dsum_lo)
    (ddet2_hi, ddet2_lo, _, _, _, _, dtot2_hi, dtot2_lo) = dfn(
        dcon2, q4_hi, q4_lo, d4_hi, d4_lo, dsum_hi, dsum_lo)

    return FastDevOut(dq_hi, dq_lo, od_hi, od_lo, dt_hi, dt_lo,
                      ddet_hi, ddet_lo, ddet2_hi, ddet2_lo,
                      dqr_hi, dqr_lo, ddr_hi, ddr_lo,
                      dtot_hi, dtot_lo, dtot2_hi, dtot2_lo, valid,
                      theta_y, theta_z, focus, Ps, Dns, Ts,
                      P4r, D4r, det_c, det_c2, total_chief, total2_chief)


def _fast_devs_f32(system, rays, origins, det_x, det_x2, chief_idx: int,
                   tilt: bool, tilt_mode: str):
    """Plain-f32 twin of :func:`_fast_devs` (backward pass)."""
    F32 = jnp.float32
    chief_d0, chief_p0, consts64 = _fast_scalars(
        system, rays, origins, det_x, det_x2, chief_idx)
    consts32 = tuple(c.astype(F32) for c in consts64)
    dp0 = (origins - chief_p0).astype(F32)
    dd0 = (rays - chief_d0).astype(F32)
    (dq_s, dd_s, _, dt_s), valid = _dev32_scan(consts32, dp0, dd0)
    dq4, dd4 = dq_s[-1], dd_s[-1]
    dsum32 = jnp.sum(dt_s, axis=0)
    Ps, Dns, Ts = consts64[-1], consts64[3], consts64[4]
    P4, D4 = Ps[-1], Dns[-1]

    theta_y, theta_z = _tilt_stats(D4, dd4, valid, tilt, tilt_mode)
    focus = _pre_tilt_focus(P4, D4, det_x, dq4, dd4, valid)
    (R, P4r, D4r, t_c, det_c, L, t_c2, det_c2, L2, total_chief,
     total2_chief) = _fast_post_scalars(consts64, det_x, det_x2,
                                        theta_y, theta_z, focus, tilt)

    ddet, dqr, ddr, dtot = _det_stage_f32(R, D4r, t_c, L, dq4, dd4, dsum32)
    ddet2, _, _, dtot2 = _det_stage_f32(R, D4r, t_c2, L2, dq4, dd4, dsum32)

    n_mirr = Ps.shape[0]
    z3 = jnp.zeros((3 * n_mirr, rays.shape[1]), dtype=F32)
    zN = jnp.zeros_like(dtot)
    dq_flat = dq_s.reshape(3 * n_mirr, -1)
    od_flat = dd_s.reshape(3 * n_mirr, -1)
    return FastDevOut(dq_flat, z3, od_flat, z3, dt_s, jnp.zeros_like(dt_s),
                      ddet, jnp.zeros_like(ddet), ddet2,
                      jnp.zeros_like(ddet2), dqr, jnp.zeros_like(dqr),
                      ddr, jnp.zeros_like(ddr), dtot, zN, dtot2, zN,
                      valid, theta_y, theta_z, focus, Ps, Dns, Ts,
                      P4r, D4r, det_c, det_c2, total_chief, total2_chief)


def _fast_devs_fwd(system, rays, origins, det_x, det_x2, chief_idx,
                   tilt, tilt_mode, interpret):
    out = _fast_devs(system, rays, origins, det_x, det_x2, chief_idx,
                     tilt, tilt_mode, interpret)
    return out, (system, rays, origins, det_x, det_x2)


def _fast_devs_bwd(chief_idx, tilt, tilt_mode, interpret, residuals, cot):
    system, rays, origins, det_x, det_x2 = residuals
    _, vjp = jax.vjp(
        lambda s, r, o, x1, x2: _fast_devs_f32(s, r, o, x1, x2, chief_idx,
                                               tilt, tilt_mode),
        system, rays, origins, det_x, det_x2)
    return vjp(cot)


_fast_devs.defvjp(_fast_devs_fwd, _fast_devs_bwd)


def _f64_of(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def run_fast(system: OpticalSystem, rays, origins, det_x, det_x2,
             chief_idx: int | None = None, tilt_correction: bool = True,
             tilt_mode: str = "mean", interpret: bool | None = None):
    """The precision='pallas' engine pass (trace through OPL) — returns
    the same physical quantities as the f64 path of :func:`run` plus f32
    deviation-form fields for throughput-critical losses.

    Returns a dict with keys: detcenter, detcenter2, total, total2,
    valid, theta_y, theta_z, focus, trace (TraceResult, lazily
    materialized f64 — DCE'd when unused), w32 (demeaned OPL deviation,
    f32), w32_2, ddet32 (f32 detcenter deviations).
    """
    if interpret is None:
        from akbx.wave import _tpu_is_default

        interpret = not _tpu_is_default()
    if chief_idx is None:
        chief_idx = rays.shape[1] // 2
    d = _fast_devs(system, rays, origins, det_x, det_x2, int(chief_idx),
                   bool(tilt_correction), str(tilt_mode), bool(interpret))

    detcenter = d.det_c[:, None] + _f64_of(d.ddet_hi, d.ddet_lo)
    detcenter2 = d.det_c2[:, None] + _f64_of(d.ddet2_hi, d.ddet2_lo)
    total = d.total_chief + _f64_of(d.dtot_hi, d.dtot_lo)
    total2 = d.total2_chief + _f64_of(d.dtot2_hi, d.dtot2_lo)

    # f32 deviation-form wavefront/spot fields (demeaned over valid rays)
    mh = masked_mean(d.dtot_hi, d.valid)
    ml = masked_mean(d.dtot_lo, d.valid)
    w32 = (d.dtot_hi - mh) + (d.dtot_lo - ml)
    mh2 = masked_mean(d.dtot2_hi, d.valid)
    ml2 = masked_mean(d.dtot2_lo, d.valid)
    w32_2 = (d.dtot2_hi - mh2) + (d.dtot2_lo - ml2)

    # full TraceResult, materialized in f64 (XLA drops unused pieces)
    n_mirr = d.P_chief.shape[0]
    points, dirs, normals, segs = [], [rays], [], []
    for m in range(n_mirr):
        pts = d.P_chief[m][:, None] + _f64_of(d.dq_hi[3 * m:3 * m + 3],
                                              d.dq_lo[3 * m:3 * m + 3])
        points.append(pts)
        dirs.append(d.D_chief[m][:, None] + _f64_of(d.od_hi[3 * m:3 * m + 3],
                                                    d.od_lo[3 * m:3 * m + 3]))
        normals.append(geo.surface_normal(system.mirrors[m].coeffs, pts))
        segs.append(d.T_chief[m] + _f64_of(d.dt_hi[m], d.dt_lo[m]))
    # tilt-corrected exit point/dir (replaces the last mirror's, same as
    # the f64 path's result._replace after tilt_correct)
    points[-1] = d.P4r[:, None] + _f64_of(d.dqr_hi, d.dqr_lo)
    dirs[-1] = d.D4r[:, None] + _f64_of(d.ddr_hi, d.ddr_lo)
    tr = TraceResult(tuple(points), tuple(dirs), tuple(normals),
                     tuple(segs), d.valid)
    return {
        "detcenter": detcenter, "detcenter2": detcenter2,
        "total": total, "total2": total2, "valid": d.valid,
        "theta_y": d.theta_y, "theta_z": d.theta_z, "focus": d.focus,
        "trace": tr, "w32": w32, "w32_2": w32_2, "ddet32": d.ddet_hi,
    }


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
    # deviation-form f32 fields (precision='pallas' only, else None):
    # demeaned OPL deviations [m] (focal / defocused plane) and detcenter
    # deviations from the chief — the throughput-loss inputs that keep
    # the whole fwd+bwd graph f32
    w32: jnp.ndarray | None = None
    ddet32: jnp.ndarray | None = None
    w32_2: jnp.ndarray | None = None


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

    has_figure = any(m.fig_coeffs.shape != (1, 1) for m in system.mirrors)
    if precision == "pallas" and not has_figure and ray_sharding is None:
        # full fast path: trace AND post-pipeline on the deviation kernels
        det_x = system.s2f_middle + defocus
        rays = ray_fan(rand_p0h, rand_p0v)
        if exit_pupil_uniform:
            pre = trace_pallas(system, rays, src)
            new_h, new_v = exit_pupil_uniform_angles(
                pre, rand_p0h, rand_p0v, n_h, n_v, stage=uniform_stage)
            rays = ray_fan(new_h, new_v)
            rand_p0h, rand_p0v = new_h, new_v
        out = run_fast(system, rays, src, det_x, det_x + defocus_wave,
                       tilt_correction=tilt_correction, tilt_mode=tilt_mode)
        v = out["valid"]
        mean_focus = masked_mean(out["detcenter"], v[None, :], axis=1)
        dist_err2 = (out["total2"] - masked_mean(out["total2"], v)) * 1e9
        sph = jnp.linalg.norm(out["detcenter2"] - mean_focus[:, None],
                              axis=0) * 1e9
        wave2 = dist_err2 - sph
        return EngineResult(out["trace"], out["detcenter"],
                            out["detcenter2"], out["total"], out["total2"],
                            wave2, v, out["theta_y"], out["theta_z"],
                            out["focus"], rand_p0h, rand_p0v,
                            out["w32"], out["ddet32"], out["w32_2"])

    if precision in ("df32", "pallas"):
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
