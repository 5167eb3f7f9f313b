"""Pallas TPU kernel for the deviation trace — the throughput engine.

The XLA df32 deviation trace (:func:`akbx.trace.trace_df`) is numerically
right but slow on TPU: its error-free transforms need value barriers
against XLA's algebraic simplifier, and barriers block fusion (measured
0.5x the emulated-f64 speed, BENCH_df32_r03.json).  Mosaic does no
identity-based float folding, so the SAME double-f32 algebra compiles to
dense barrier-free VPU code here — the trick that makes the Huygens
kernel 44x the XLA f64 path (BENCH_huygens_r03.json).

The kernel runs the full mirror chain per ray tile: per-mirror chief
constants arrive as split f32 pairs in SMEM ((n_mirr, 64) table), per-ray
deviations (dp, dd) as (8, N) hi/lo row-packs in VMEM, and each bounce is
the exact degree-2 deviation algebra of ``trace_df`` (see its docstring
for the math and the branch-inheritance argument).  Outputs are the
per-mirror intersection deviations, reflected-direction deviations, leg
deltas and the validity mask; the f64 reconstruction (chief + deviation)
and the surface normals happen outside in XLA, where dead-code
elimination drops whatever the caller does not use.

Differentiation: the :mod:`akbx.trace` dispatch wraps this in a
``custom_vjp`` whose backward is the VJP of a plain-f32 deviation trace
(:func:`akbx.trace.trace_dev32`).  That is legitimate because EFT error
terms have (near-)zero derivatives — the linearization of ``two_sum`` /
``two_prod`` IS the linearization of ``+`` / ``*`` — so the df32 and f32
forward maps share a Jacobian to f32 rounding; measured gradient parity
vs the f64 path is ~1e-6 relative (tests/test_trace_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from akbx.kernels.huygens import _make_df_ops

F32 = jnp.float32

# constants-row layout (one row of 64 f32 per mirror); see pack_consts
_M_HI, _M_LO = 0, 9            # 3x3 row-major
_GC_HI, _GC_LO = 18, 21
_GA_HI, _GA_LO = 24, 27
_D_HI, _D_LO = 30, 33
_DN_HI, _DN_LO = 36, 39
_T_HI, _T_LO = 42, 43
_A_HI, _A_LO = 44, 45
_BP_HI, _BP_LO = 46, 47
_RHO_HI, _RHO_LO = 48, 49
_BRANCH = 50
_T2_HI, _T2_LO = 51, 52
_BV_HI, _BV_LO = 53, 56        # quadric linear term (chief frame)
_N_CONST = 64


def _split64(x64):
    hi = x64.astype(F32)
    lo = (x64 - hi.astype(jnp.float64)).astype(F32)
    return hi, lo


def pack_consts(Ms, gCs, gAs, Ds, Dns, Ts, A_noms, Bp_noms, rhos,
                branches, bvecs) -> jnp.ndarray:
    """(n_mirr, 64) f32 table of hi/lo-split f64 chief constants (the
    split is exact — pure converts)."""
    n = Ms.shape[0]
    rows = jnp.zeros((n, _N_CONST), dtype=F32)
    Mh, Ml = _split64(Ms.reshape(n, 9))
    rows = rows.at[:, _M_HI:_M_HI + 9].set(Mh)
    rows = rows.at[:, _M_LO:_M_LO + 9].set(Ml)
    for col_hi, col_lo, v in ((_GC_HI, _GC_LO, gCs), (_GA_HI, _GA_LO, gAs),
                              (_D_HI, _D_LO, Ds), (_DN_HI, _DN_LO, Dns),
                              (_BV_HI, _BV_LO, bvecs)):
        h, low = _split64(v)
        rows = rows.at[:, col_hi:col_hi + 3].set(h)
        rows = rows.at[:, col_lo:col_lo + 3].set(low)
    for col_hi, col_lo, v in ((_T_HI, _T_LO, Ts), (_A_HI, _A_LO, A_noms),
                              (_BP_HI, _BP_LO, Bp_noms),
                              (_RHO_HI, _RHO_LO, rhos),
                              (_T2_HI, _T2_LO, Ts * Ts)):
        h, low = _split64(v)
        rows = rows.at[:, col_hi].set(h)
        rows = rows.at[:, col_lo].set(low)
    rows = rows.at[:, _BRANCH].set(branches.astype(F32))
    return rows


def _df_div(df, x, y):
    """Double-word division on (hi, lo) pairs (Newton-corrected)."""
    q1 = x[0] / y[0]
    ph, plo = df.two_prod(y[0], q1)
    e = plo + y[1] * q1
    rh, rl = df.df_add(x[0], x[1], -ph, -e)
    q2 = (rh + rl) / y[0]
    return df.fast_two_sum(q1, q2)


def bounce_chain(df, get_c, dp, dd, n_mirr: int):
    """The full deviation bounce chain on (hi, lo) pairs.

    ``df``: op set from ``_make_df_ops``; ``get_c(m, k)``: scalar access
    into the constants table; ``dp``/``dd``: per-component (hi, lo) pairs.
    Shared verbatim between the Mosaic kernel and the pure-jnp reference
    path (:func:`trace_deviation_reference`) so CI exercises the exact
    kernel arithmetic without Mosaic.
    Returns (dqs, dds, dts, valid): per-mirror lists of (hi, lo) triples /
    pairs and the f32 validity mask.
    """

    def df_div(x, y):
        return _df_div(df, x, y)

    def df_rsqrt(x):
        s = jax.lax.rsqrt(jnp.maximum(x[0], F32(1e-30)))
        s2h, s2l = df.two_prod(s, s)
        xh, xl = df.df_mul(x[0], x[1], s2h, s2l)
        ch, cl = df.df_add(-xh, -xl, F32(3.0), F32(0.0))
        ch, cl = ch * F32(0.5), cl * F32(0.5)
        p0h, p0l = df.two_prod(s, ch)
        return df.fast_two_sum(p0h, p0l + s * cl)

    def c(m, k):
        return get_c(m, k)

    def cdf(m, k_hi, k_lo):
        return (c(m, k_hi), c(m, k_lo))

    valid = jnp.ones_like(dp[0][0])
    dqs, dds, dts = [], [], []

    def add(a, b):
        return df.df_add(a[0], a[1], b[0], b[1])

    def mul(a, b):
        return df.df_mul(a[0], a[1], b[0], b[1])

    def dot3(a, b):
        return add(add(mul(a[0], b[0]), mul(a[1], b[1])), mul(a[2], b[2]))

    for m in range(n_mirr):
        M = [[cdf(m, _M_HI + 3 * r + q, _M_LO + 3 * r + q)
              for q in range(3)] for r in range(3)]
        gC = [cdf(m, _GC_HI + r, _GC_LO + r) for r in range(3)]
        gA = [cdf(m, _GA_HI + r, _GA_LO + r) for r in range(3)]
        Dv = [cdf(m, _D_HI + r, _D_LO + r) for r in range(3)]
        Dn = [cdf(m, _DN_HI + r, _DN_LO + r) for r in range(3)]
        bv = [cdf(m, _BV_HI + r, _BV_LO + r) for r in range(3)]
        Tc = cdf(m, _T_HI, _T_LO)
        T2c = cdf(m, _T2_HI, _T2_LO)
        Ac = cdf(m, _A_HI, _A_LO)
        Bpc = cdf(m, _BP_HI, _BP_LO)
        rhoc = cdf(m, _RHO_HI, _RHO_LO)
        branch = c(m, _BRANCH)

        def matvec(v, M=M):
            return [dot3(M[r], v) for r in range(3)]

        Mdp = matvec(dp)
        Mdd = matvec(dd)
        dC = add(dot3(gC, dp), dot3(Mdp, dp))
        dA = add(dot3(gA, dd), dot3(Mdd, dd))
        cross = dot3(Mdp, dd)
        dB = add(add(dot3(gC, dd), dot3(gA, dp)),
                 (cross[0] * F32(2.0), cross[1] * F32(2.0)))

        # R = dA T^2 + dB T + dC + rho
        R = add(add(mul(dA, T2c), mul(dB, Tc)), add(dC, rhoc))
        A_full = add(dA, Ac)
        dAT = mul(dA, Tc)
        Bp = add(add((dAT[0] * F32(2.0), dAT[1] * F32(2.0)), dB), Bpc)

        # stable q-form roots of A dt^2 + B' dt + R = 0
        B2 = mul(Bp, Bp)
        AR = mul(A_full, R)
        disc = add(B2, (-AR[0] * F32(4.0), -AR[1] * F32(4.0)))
        ok = disc[0] > 0
        disc_c = (jnp.where(ok, disc[0], F32(0.0)),
                  jnp.where(ok, disc[1], F32(0.0)))
        sq = df.df_sqrt(*disc_c)
        sgn = jnp.where(Bp[0] >= 0, F32(1.0), F32(-1.0))
        qq = add(Bp, (sq[0] * sgn, sq[1] * sgn))
        qq = (qq[0] * F32(-0.5), qq[1] * F32(-0.5))
        safe_q = (jnp.where(qq[0] != 0, qq[0], F32(1.0)), qq[1])
        safe_A = (jnp.where(A_full[0] != 0, A_full[0], F32(1.0)), A_full[1])
        t_q_A = df_div(qq, safe_A)
        t_R_q = df_div(R, safe_q)
        b_pos = Bp[0] >= 0
        t_plus = (jnp.where(b_pos, t_R_q[0], t_q_A[0]),
                  jnp.where(b_pos, t_R_q[1], t_q_A[1]))
        t_minus = (jnp.where(b_pos, t_q_A[0], t_R_q[0]),
                   jnp.where(b_pos, t_q_A[1], t_R_q[1]))
        pick = branch >= 0
        dt = (jnp.where(pick, t_plus[0], t_minus[0]),
              jnp.where(pick, t_plus[1], t_minus[1]))
        valid = valid * ok.astype(F32)

        # dq = dp + T dd + dt (D + dd)
        d_full = [add(dd[r], Dv[r]) for r in range(3)]
        dq = [add(add(dp[r], mul(dd[r], Tc)), mul(d_full[r], dt))
              for r in range(3)]

        # unit normal: gradQ(dq) = bvec + 2 M dq (chief-centered frame)
        Mdq = matvec(dq)
        nvec = [add((Mdq[r][0] * F32(2.0), Mdq[r][1] * F32(2.0)), bv[r])
                for r in range(3)]
        inv_n = df_rsqrt(dot3(nvec, nvec))
        n_unit = [mul(nvec[r], inv_n) for r in range(3)]

        # reflect: r = d - 2 (d.n) n; deviation from the chief's reflected
        dn2 = dot3(d_full, n_unit)
        dn2 = (dn2[0] * F32(-2.0), dn2[1] * F32(-2.0))
        refl = [add(d_full[r], mul(n_unit[r], dn2)) for r in range(3)]
        dd = [add(refl[r], (-Dn[r][0], -Dn[r][1])) for r in range(3)]
        dp = dq

        dqs.append(dq)
        dds.append(list(dd))
        dts.append(dt)

    return dqs, dds, dts, valid


def _trace_kernel(const_ref, *refs, n_mirr: int, use_barrier: bool):
    """refs: 12 inputs (dp/dd x 3 comps x hi/lo), then 17 outputs
    (per-mirror dq 6 + od 6 + dt 2, then dsum 2, valid 1), each a (8, C)
    tile — rays packed 2D so the VPU's (8, 128) registers are fully
    occupied (a (1, N) layout wastes 7/8 of the sublanes)."""
    df = _make_df_ops(use_barrier)
    (dpxh, dpxl, dpyh, dpyl, dpzh, dpzl,
     ddxh, ddxl, ddyh, ddyl, ddzh, ddzl) = refs[:12]
    outs = refs[12:]
    dp = [(dpxh[:], dpxl[:]), (dpyh[:], dpyl[:]), (dpzh[:], dpzl[:])]
    dd = [(ddxh[:], ddxl[:]), (ddyh[:], ddyl[:]), (ddzh[:], ddzl[:])]
    dqs, dds, dts, valid = bounce_chain(
        df, lambda m, k: const_ref[m, k], dp, dd, n_mirr)
    k = 0
    for m in range(n_mirr):
        for r in range(3):
            outs[k][:] = dqs[m][r][0]
            outs[k + 1][:] = dqs[m][r][1]
            outs[k + 2][:] = dds[m][r][0]
            outs[k + 3][:] = dds[m][r][1]
            k += 4
        outs[k][:] = dts[m][0]
        outs[k + 1][:] = dts[m][1]
        k += 2
    dsum = dts[0]
    for m in range(1, n_mirr):
        dsum = df.df_add(dsum[0], dsum[1], dts[m][0], dts[m][1])
    outs[k][:] = dsum[0]
    outs[k + 1][:] = dsum[1]
    outs[k + 2][:] = valid


@functools.partial(jax.jit,
                   static_argnames=("n_mirr", "rows", "cols", "interpret"))
def trace_deviation_pallas(consts, dp64, dd64, n_mirr: int,
                           rows: int = 8, cols: int = 512,
                           interpret: bool = False):
    """Run the deviation-trace kernel.

    ``consts``: (n_mirr, 64) f32 from :func:`pack_consts`.
    ``dp64``/``dd64``: (3, N) f64 deviations from the chief ray.
    Rays are packed into (rows, cols) 2D tiles (rows*cols per grid step)
    for full VPU sublane occupancy.  Returns f32 pairs
    ``(dq_hi, dq_lo, od_hi, od_lo, dt_hi, dt_lo, dsum_hi, dsum_lo,
    valid)`` shaped (3*n_mirr, N) / (n_mirr, N) / (1, N) — ``dsum`` is
    the cumulative leg-length deviation (the OPL deviation up to the
    last mirror), accumulated barrier-free in the kernel.
    """
    n = dp64.shape[1]
    tile = rows * cols
    pad = (-n) % tile
    dp64 = jnp.pad(dp64, ((0, 0), (0, pad)))
    dd64 = jnp.pad(dd64, ((0, 0), (0, pad)))
    npad = n + pad
    nrows = npad // cols

    def comps(x64):
        out = []
        for r in range(3):
            hi, lo = _split64(x64[r].reshape(nrows, cols))
            out.append(hi)
            out.append(lo)
        return out

    inputs = comps(dp64) + comps(dd64)

    grid = (nrows // rows,)
    zero = np.int32(0)
    ray_spec = pl.BlockSpec((rows, cols), lambda i: (i, zero),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((n_mirr, _N_CONST), lambda i: (zero, zero),
                              memory_space=pltpu.SMEM)

    n_out = 12 * n_mirr + 2 * n_mirr + 3
    kernel = functools.partial(_trace_kernel, n_mirr=n_mirr,
                               use_barrier=interpret)
    shapes = tuple(jax.ShapeDtypeStruct((nrows, cols), F32)
                   for _ in range(n_out))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[const_spec] + [ray_spec] * 12,
        out_specs=tuple(ray_spec for _ in range(n_out)),
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=1800 * n_mirr * npad,
            bytes_accessed=npad * 4 * (12 + n_out),
            transcendentals=2 * n_mirr * npad,
        ),
        interpret=interpret,
    )(consts, *inputs)

    flat = [o.reshape(-1)[:n] for o in out]
    # outputs are ordered per-mirror (4 rows per component: dq hi/lo,
    # od hi/lo; then 2 dt rows), then dsum hi/lo and the valid plane —
    # walk the same order the kernel wrote them
    dq_hi_l, dq_lo_l, od_hi_l, od_lo_l, dt_hi_l, dt_lo_l = \
        [], [], [], [], [], []
    k = 0
    for m in range(n_mirr):
        for r in range(3):
            dq_hi_l.append(flat[k]); dq_lo_l.append(flat[k + 1])
            od_hi_l.append(flat[k + 2]); od_lo_l.append(flat[k + 3])
            k += 4
        dt_hi_l.append(flat[k]); dt_lo_l.append(flat[k + 1])
        k += 2
    dsum_hi, dsum_lo = flat[k], flat[k + 1]
    valid = flat[k + 2][None]
    return (jnp.stack(dq_hi_l), jnp.stack(dq_lo_l), jnp.stack(od_hi_l),
            jnp.stack(od_lo_l), jnp.stack(dt_hi_l), jnp.stack(dt_lo_l),
            dsum_hi, dsum_lo, valid)


@functools.partial(jax.jit, static_argnames=("n_mirr",))
def trace_deviation_reference(consts, dp64, dd64, n_mirr: int):
    """Pure-jnp twin of :func:`trace_deviation_pallas` — the same
    ``bounce_chain`` arithmetic (with the EFT value barriers XLA needs),
    same 7-output contract.  This is the off-TPU / CI path: the Pallas
    interpreter compiles the barrier-dense kernel pathologically slowly
    on XLA:CPU, while this form is an ordinary fused jnp program.
    """
    df = _make_df_ops(True)
    dph, dpl = _split64(dp64)
    ddh, ddl = _split64(dd64)
    dp = [(dph[r], dpl[r]) for r in range(3)]
    dd = [(ddh[r], ddl[r]) for r in range(3)]
    dqs, dds, dts, valid = bounce_chain(
        df, lambda m, k: consts[m, k], dp, dd, n_mirr)
    def pack3(items, word):
        return jnp.stack([items[m][r][word]
                          for m in range(n_mirr) for r in range(3)])

    def pack1(items, word):
        return jnp.stack([items[m][word] for m in range(n_mirr)])

    dsum = dts[0]
    for m in range(1, n_mirr):
        dsum = df.df_add(dsum[0], dsum[1], dts[m][0], dts[m][1])
    return (pack3(dqs, 0), pack3(dqs, 1), pack3(dds, 0), pack3(dds, 1),
            pack1(dts, 0), pack1(dts, 1), dsum[0], dsum[1], valid[None])


# ---------------------------------------------------------------------------
# Detector / tilt stage: rotate exit deviations by the (data-dependent)
# tilt-removal rotation, intersect the detector plane, and finish the OPL
# deviation — the per-ray post-pipeline of akbx.trace.run, in the same
# barrier-free df32 algebra as the bounce chain.  Without this the fast
# path leaves ~100 f64-emulated ops/ray (arctan, norms, plane intersects)
# in the live XLA graph, which dominates the kernel itself on TPU.
# Reference semantics: tilt removal AKB_raytrace_20250312.py:3564-3601,
# detector planes :3593-3596, OPL :3623-3633.
# ---------------------------------------------------------------------------

# consts-row layout for the detector kernel ((1, 32) f32)
_DR_HI, _DR_LO = 0, 9          # 3x3 tilt rotation R, row-major
_DD4_HI, _DD4_LO = 18, 21      # R-rotated chief exit direction D4'
_DTC_HI, _DTC_LO = 24, 25      # chief plane parameter t_c
_DL_HI, _DL_LO = 26, 27        # chief exit->plane distance L = |t_c D4'|
_DL2_HI, _DL2_LO = 28, 29      # L^2
_N_DCONST = 32


def pack_det_consts(R, D4r, t_c, L) -> jnp.ndarray:
    """(1, 32) f32 table of hi/lo-split f64 detector-stage constants."""
    row = jnp.zeros((1, _N_DCONST), dtype=F32)
    Rh, Rl = _split64(jnp.reshape(R, (9,)))
    row = row.at[0, _DR_HI:_DR_HI + 9].set(Rh)
    row = row.at[0, _DR_LO:_DR_LO + 9].set(Rl)
    Dh, Dl = _split64(D4r)
    row = row.at[0, _DD4_HI:_DD4_HI + 3].set(Dh)
    row = row.at[0, _DD4_LO:_DD4_LO + 3].set(Dl)
    for col_hi, col_lo, v in ((_DTC_HI, _DTC_LO, t_c), (_DL_HI, _DL_LO, L),
                              (_DL2_HI, _DL2_LO, L * L)):
        h, low = _split64(jnp.asarray(v))
        row = row.at[0, col_hi].set(h)
        row = row.at[0, col_lo].set(low)
    return row


def detector_chain(df, get_c, dq, dd, dsum):
    """Tilt-rotate + detector-plane + OPL-finish on (hi, lo) pairs.

    ``dq``/``dd``: exit point/direction deviations (3 components of
    (hi, lo)); ``dsum``: cumulative leg-length deviation.  Exact deviation
    algebra around the rotated chief:

      dq' = R dq,  dd' = R dd                      (tilt removal)
      dt  = -(dq'_x + t_c dd'_x) / (D4'_x + dd'_x) (plane x = x_det)
      ddet = dq' + t_c dd' + dt (D4' + dd')
      delta = ddet - dq';  u = 2 t_c (D4' . delta) + delta . delta
      dlast = u / (L + sqrt(L^2 + u))              (|det - q4'| - L)
      dtot = dsum + dlast

    Returns (ddet (3 pairs), dq' (3 pairs), dd' (3 pairs), dtot pair).
    """

    def cdf(k_hi, k_lo):
        return (get_c(k_hi), get_c(k_lo))

    def add(a, b):
        return df.df_add(a[0], a[1], b[0], b[1])

    def mul(a, b):
        return df.df_mul(a[0], a[1], b[0], b[1])

    R = [[cdf(_DR_HI + 3 * r + c, _DR_LO + 3 * r + c) for c in range(3)]
         for r in range(3)]
    D4 = [cdf(_DD4_HI + r, _DD4_LO + r) for r in range(3)]
    tc = cdf(_DTC_HI, _DTC_LO)
    L = cdf(_DL_HI, _DL_LO)
    L2 = cdf(_DL2_HI, _DL2_LO)

    def dot3(a, b):
        return add(add(mul(a[0], b[0]), mul(a[1], b[1])), mul(a[2], b[2]))

    def matvec(v):
        return [dot3(R[r], v) for r in range(3)]

    dqr = matvec(dq)
    ddr = matvec(dd)

    den = add(D4[0], ddr[0])
    num = add(dqr[0], mul(tc, ddr[0]))
    dt = _df_div(df, (-num[0], -num[1]), den)

    d_full = [add(D4[r], ddr[r]) for r in range(3)]
    delta = [add(mul(tc, ddr[r]), mul(dt, d_full[r])) for r in range(3)]
    ddet = [add(dqr[r], delta[r]) for r in range(3)]

    cd = mul(tc, dot3(D4, delta))
    u = add((cd[0] * F32(2.0), cd[1] * F32(2.0)), dot3(delta, delta))
    s2 = add(L2, u)
    s2ok = (jnp.maximum(s2[0], F32(0.0)), s2[1])
    root = df.df_sqrt(*s2ok)
    dlast = _df_div(df, u, add(L, root))
    dtot = add(dsum, dlast)
    return ddet, dqr, ddr, dtot


def _det_kernel(const_ref, *refs, use_barrier: bool):
    """refs: 14 inputs (dq/dd x 3 x hi/lo, dsum hi/lo), then 20 outputs
    (ddet 6 + dq' 6 + dd' 6 + dtot 2; see detector_pallas), (8, C)
    tiles."""
    df = _make_df_ops(use_barrier)
    (qxh, qxl, qyh, qyl, qzh, qzl,
     dxh, dxl, dyh, dyl, dzh, dzl, sh, sl) = refs[:14]
    outs = refs[14:]
    dq = [(qxh[:], qxl[:]), (qyh[:], qyl[:]), (qzh[:], qzl[:])]
    dd = [(dxh[:], dxl[:]), (dyh[:], dyl[:]), (dzh[:], dzl[:])]
    ddet, dqr, ddr, dtot = detector_chain(
        df, lambda k: const_ref[0, k], dq, dd, (sh[:], sl[:]))
    k = 0
    for r in range(3):
        outs[k][:] = ddet[r][0]
        outs[k + 1][:] = ddet[r][1]
        outs[k + 2][:] = dqr[r][0]
        outs[k + 3][:] = dqr[r][1]
        outs[k + 4][:] = ddr[r][0]
        outs[k + 5][:] = ddr[r][1]
        k += 6
    outs[k][:] = dtot[0]
    outs[k + 1][:] = dtot[1]


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret"))
def detector_pallas(consts, dq_hi, dq_lo, dd_hi, dd_lo, dsum_hi, dsum_lo,
                    rows: int = 8, cols: int = 512,
                    interpret: bool = False):
    """Run the detector/tilt kernel.

    ``consts``: (1, 32) f32 from :func:`pack_det_consts`; ``dq_*``/
    ``dd_*``: (3, N) f32 exit deviations; ``dsum_*``: (N,).  Returns
    ``(ddet_hi, ddet_lo, dqr_hi, dqr_lo, ddr_hi, ddr_lo, dtot_hi,
    dtot_lo)`` shaped (3, N) / (N,).
    """
    n = dq_hi.shape[1]
    tile = rows * cols
    pad = (-n) % tile
    npad = n + pad
    nrows = npad // cols

    def tile2(x):
        return jnp.pad(x, (0, pad)).reshape(nrows, cols)

    inputs = []
    for r in range(3):
        inputs += [tile2(dq_hi[r]), tile2(dq_lo[r])]
    for r in range(3):
        inputs += [tile2(dd_hi[r]), tile2(dd_lo[r])]
    inputs += [tile2(dsum_hi), tile2(dsum_lo)]

    grid = (nrows // rows,)
    zero = np.int32(0)
    ray_spec = pl.BlockSpec((rows, cols), lambda i: (i, zero),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, _N_DCONST), lambda i: (zero, zero),
                              memory_space=pltpu.SMEM)
    n_out = 20
    kernel = functools.partial(_det_kernel, use_barrier=interpret)
    shapes = tuple(jax.ShapeDtypeStruct((nrows, cols), F32)
                   for _ in range(n_out))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[const_spec] + [ray_spec] * 14,
        out_specs=tuple(ray_spec for _ in range(n_out)),
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=900 * npad,
            bytes_accessed=npad * 4 * (14 + n_out),
            transcendentals=npad,
        ),
        interpret=interpret,
    )(consts, *inputs)

    flat = [o.reshape(-1)[:n] for o in out]
    ddet_hi = jnp.stack([flat[6 * r] for r in range(3)])
    ddet_lo = jnp.stack([flat[6 * r + 1] for r in range(3)])
    dqr_hi = jnp.stack([flat[6 * r + 2] for r in range(3)])
    dqr_lo = jnp.stack([flat[6 * r + 3] for r in range(3)])
    ddr_hi = jnp.stack([flat[6 * r + 4] for r in range(3)])
    ddr_lo = jnp.stack([flat[6 * r + 5] for r in range(3)])
    return (ddet_hi, ddet_lo, dqr_hi, dqr_lo, ddr_hi, ddr_lo,
            flat[18], flat[19])


@jax.jit
def detector_reference(consts, dq_hi, dq_lo, dd_hi, dd_lo,
                       dsum_hi, dsum_lo):
    """Pure-jnp twin of :func:`detector_pallas` (same detector_chain,
    with the EFT value barriers XLA needs) — the off-TPU / CI path."""
    df = _make_df_ops(True)
    dq = [(dq_hi[r], dq_lo[r]) for r in range(3)]
    dd = [(dd_hi[r], dd_lo[r]) for r in range(3)]
    ddet, dqr, ddr, dtot = detector_chain(
        df, lambda k: consts[0, k], dq, dd, (dsum_hi, dsum_lo))

    def pack(v, w):
        return jnp.stack([v[r][w] for r in range(3)])

    return (pack(ddet, 0), pack(ddet, 1), pack(dqr, 0), pack(dqr, 1),
            pack(ddr, 0), pack(ddr, 1), dtot[0], dtot[1])
