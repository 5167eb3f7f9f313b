"""Pallas TPU kernel for the Huygens O(N*M) contraction.

The hot loop of the whole framework (reference ``compute_u_parallel``,
Wavecalc_raytrace_fromData_CPU0402.py:71-85 / ``forward_propagation_cupy_batch``
_GPU0402.py:139-201): for every target point i accumulate

    u[i] += u_src[j] * ds[j] * exp(-i k r_ij) / r_ij .

TPU has no fast f64, but EUV phases need ~1e-10 relative distances over
metre-scale geometry (33+ mantissa bits).  The kernel therefore runs in
**double-float32** ("df32") arithmetic from :mod:`akbx.core.precision`:

* coordinates arrive as exact (hi, lo) f32 pairs of the f64 values,
  re-centered at the stage centroid so they are O(1);
* the squared distance, sqrt, and k*r product are df32 (~1e-12 relative,
  validated in tests/test_precision.py) -> phase error ~1e-4 rad at EUV;
* the phase is range-reduced mod 2pi in two df32 steps (f32 round can be
  off by a few counts at n ~ 1e8; the second step removes that) before the
  f32 sincos;
* accumulation is f32 per source tile into the VMEM output block, revisited
  across the source-tile grid dimension.

Grid: (target_tiles, source_tiles); the output block depends only on the
target tile, so Mosaic keeps it resident in VMEM across the source loop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 6.283185307179586
TWO_PI_HI32 = np.float32(6.2831855)
TWO_PI_LO32 = np.float32(TWO_PI - float(np.float32(6.2831855)))


def _make_df_ops(use_barrier: bool):
    """Build the df32 helper set with or without the EFT value barrier.

    Two different compilers consume this kernel body:

    * **XLA** (interpret mode, CPU CI): its algebraic simplifier folds
      ``(a+b)-a -> b`` when it can see a value's identity, collapsing every
      error-free transform to plain f32.  ``optimization_barrier`` hides
      the identity (see akbx.core.precision._bar) — required here.
    * **Mosaic** (real TPU lowering): has NO lowering rule for
      ``optimization_barrier`` (NotImplementedError, KernelType.TC), and
      also runs no identity-based float reassociation — MLIR arith does
      not fold ``(a+b)-a`` without fastmath.  So the barrier is both
      impossible and unnecessary there; use the identity.

    The structural defense against FMA contraction (exact Dekker partial
    products, add-only assembly — see akbx.core.precision.two_prod) is
    compiler-independent and present in both variants.
    """
    if use_barrier:
        bar = jax.lax.optimization_barrier
    else:
        bar = lambda x: x  # noqa: E731

    def two_sum(a, b):
        s = bar(a + b)
        bb = bar(s - a)
        e = (a - (s - bb)) + (b - bb)
        return s, e

    def fast_two_sum(a, b):
        s = bar(a + b)
        return s, b - (s - a)

    def split(a):
        # Dekker split; 4097 = 2^12 + 1 for f32 (this kernel is f32-only)
        c = jnp.float32(4097.0)
        t = bar(c * a)
        hi = bar(t - bar(t - a))
        return hi, a - hi

    def two_prod(a, b):
        # Contraction-immune two_prod: never rounds a product.  All four
        # Dekker partials are exactly representable (<= 12-bit halves in
        # f32), so FMA contraction cannot change their values, and the
        # total is assembled with two_sum chains only (adds are never
        # contracted and remat-safe).  See akbx.core.precision.two_prod
        # for the failure analysis of the Dekker and FMA forms under
        # XLA:CPU fusion + LLVM contraction.
        ah, al = split(a)
        bh, bl = split(b)
        hh = ah * bh
        hl = ah * bl
        lh = al * bh
        ll = al * bl
        ch, cl = two_sum(hl, lh)
        ph, pl_ = two_sum(hh, ch)
        dh, dl = two_sum(pl_, cl)
        qh, ql = two_sum(dh, ll)
        rh, rl = fast_two_sum(ph, qh)
        sh, sl = two_sum(dl, ql)
        th, tl = two_sum(rl, sh)
        lo = th + (tl + sl)
        return fast_two_sum(rh, lo)

    def df_add(xh, xl, yh, yl):
        sh, sl = two_sum(xh, yh)
        th, tl = two_sum(xl, yl)
        c = sl + th
        vh, vl = fast_two_sum(sh, c)
        return fast_two_sum(vh, tl + vl)

    def df_mul(xh, xl, yh, yl):
        ph, pl = two_prod(xh, yh)
        e = pl + (xh * yl + xl * yh)
        return fast_two_sum(ph, e)

    def df_sq(xh, xl):
        return df_mul(xh, xl, xh, xl)

    def df_sub(xh, xl, yh, yl):
        return df_add(xh, xl, -yh, -yl)

    def df_sqrt(xh, xl):
        s = jnp.sqrt(xh)
        s2h, s2l = two_prod(s, s)
        dh, dl = two_sum(xh, -s2h)   # add-only: no contraction hazard
        r = dh + (dl - s2l + xl)
        safe = jnp.where(s > 0, s, 1.0)
        e = r / (2.0 * safe)
        return fast_two_sum(s, e)

    class _Ops:
        pass

    ops = _Ops()
    ops.two_sum = two_sum
    ops.fast_two_sum = fast_two_sum
    ops.two_prod = two_prod
    ops.df_add = df_add
    ops.df_mul = df_mul
    ops.df_sq = df_sq
    ops.df_sub = df_sub
    ops.df_sqrt = df_sqrt
    return ops


def _huygens_kernel(txh_ref, txl_ref, tyh_ref, tyl_ref, tzh_ref, tzl_ref,
                    sxh_ref, sxl_ref, syh_ref, syl_ref, szh_ref, szl_ref,
                    sre_ref, sim_ref, kk_ref,
                    out_re_ref, out_im_ref, *, use_barrier: bool):
    df = _make_df_ops(use_barrier)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_re_ref[:] = jnp.zeros_like(out_re_ref)
        out_im_ref[:] = jnp.zeros_like(out_im_ref)

    # targets arrive as (Tt, 1) columns, sources as (1, Ts) rows; the df32
    # arithmetic below broadcasts them to (Tt, Ts) pair tiles
    txh = txh_ref[:]
    txl = txl_ref[:]
    tyh = tyh_ref[:]
    tyl = tyl_ref[:]
    tzh = tzh_ref[:]
    tzl = tzl_ref[:]
    sxh = sxh_ref[:]
    sxl = sxl_ref[:]
    syh = syh_ref[:]
    syl = syl_ref[:]
    szh = szh_ref[:]
    szl = szl_ref[:]

    dxh, dxl = df.df_sub(txh, txl, sxh, sxl)
    dyh, dyl = df.df_sub(tyh, tyl, syh, syl)
    dzh, dzl = df.df_sub(tzh, tzl, szh, szl)
    x2h, x2l = df.df_sq(dxh, dxl)
    y2h, y2l = df.df_sq(dyh, dyl)
    z2h, z2l = df.df_sq(dzh, dzl)
    d2h, d2l = df.df_add(x2h, x2l, y2h, y2l)
    d2h, d2l = df.df_add(d2h, d2l, z2h, z2l)
    rh, rl = df.df_sqrt(d2h, d2l)

    kh = kk_ref[0, 0]
    kl = kk_ref[0, 1]
    ph, plo = df.df_mul(rh, rl, kh, kl)  # phase magnitude k*r (sign below)

    # two-step mod-2pi reduction of -k*r
    ph, plo = -ph, -plo
    n1 = jnp.round(ph / TWO_PI_HI32)
    m1h, m1l = df.two_prod(n1, TWO_PI_HI32)
    ph, plo = df.df_add(ph, plo, -m1h, -m1l)
    ph, plo = df.df_add(ph, plo, -n1 * TWO_PI_LO32, jnp.zeros_like(n1))
    n2 = jnp.round(ph / TWO_PI_HI32)
    m2h, m2l = df.two_prod(n2, TWO_PI_HI32)
    ph, plo = df.df_add(ph, plo, -m2h, -m2l)
    ph, plo = df.df_add(ph, plo, -n2 * TWO_PI_LO32, jnp.zeros_like(n2))
    phase = ph + plo

    s = jnp.sin(phase)
    c = jnp.cos(phase)
    # guard r ~ 0 (padded lanes sit at the centroid; weight is 0 but
    # 0 * inf would poison the sum)
    inv_r = jnp.where(rh > 1e-12, 1.0 / rh, 0.0)

    sre = sre_ref[:]
    sim = sim_ref[:]
    cr = c * inv_r
    sr = s * inv_r
    out_re_ref[:] += jnp.sum(cr * sre - sr * sim, axis=1, keepdims=True)
    out_im_ref[:] += jnp.sum(sr * sre + cr * sim, axis=1, keepdims=True)


def _split64(x64: jnp.ndarray):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


@functools.partial(jax.jit,
                   static_argnames=("target_tile", "source_tile", "interpret"))
def _huygens_pallas(tgt_pts, src_pts, src_re_w, src_im_w, k_pair,
                    target_tile: int = 512, source_tile: int = 1024,
                    interpret: bool = False):
    n = tgt_pts.shape[1]
    m = src_pts.shape[1]
    n_pad = (-n) % target_tile
    m_pad = (-m) % source_tile

    def pad1(a, p):
        return jnp.pad(a, (0, p))

    txh, txl = _split64(pad1(tgt_pts[0], n_pad))
    tyh, tyl = _split64(pad1(tgt_pts[1], n_pad))
    tzh, tzl = _split64(pad1(tgt_pts[2], n_pad))
    # padded source points land at the centroid -> r ~ O(1), weight 0
    sxh, sxl = _split64(pad1(src_pts[0], m_pad))
    syh, syl = _split64(pad1(src_pts[1], m_pad))
    szh, szl = _split64(pad1(src_pts[2], m_pad))
    sre = pad1(src_re_w, m_pad).astype(jnp.float32)
    sim = pad1(src_im_w, m_pad).astype(jnp.float32)

    nt = (n + n_pad) // target_tile
    ns = (m + m_pad) // source_tile

    # targets as (N, 1) columns -> block (Tt, 1); sources as (1, M) rows ->
    # block (1, Ts); both satisfy Mosaic's (8,128) tiling rules
    # NB: with jax_enable_x64 a literal 0 in an index map becomes i64 while
    # the grid indices are i32; Mosaic rejects the mixed-type return, so pin
    # the constants to int32
    zero = np.int32(0)
    t_spec = pl.BlockSpec((target_tile, 1), lambda i, j: (i, zero),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, source_tile), lambda i, j: (zero, j),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, 2), lambda i, j: (zero, zero),
                          memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((target_tile, 1), lambda i, j: (i, zero),
                            memory_space=pltpu.VMEM)

    reshape_t = lambda a: a.reshape(-1, 1)
    reshape_s = lambda a: a.reshape(1, -1)

    # Barrier variant by compiler: XLA (interpret) needs the EFT value
    # barrier; Mosaic cannot lower it and does not need it (see
    # _make_df_ops).
    kernel = functools.partial(_huygens_kernel, use_barrier=interpret)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(nt, ns),
        in_specs=[t_spec] * 6 + [s_spec] * 6 + [s_spec, s_spec, k_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n + n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n + n_pad, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=260 * (n + n_pad) * (m + m_pad),
            bytes_accessed=(n + n_pad) * 4 * 8 + (m + m_pad) * 4 * 8 * nt,
            transcendentals=3 * (n + n_pad) * (m + m_pad),
        ),
        interpret=interpret,
    )(reshape_t(txh), reshape_t(txl), reshape_t(tyh), reshape_t(tyl),
      reshape_t(tzh), reshape_t(tzl),
      reshape_s(sxh), reshape_s(sxl), reshape_s(syh), reshape_s(syl),
      reshape_s(szh), reshape_s(szl), reshape_s(sre), reshape_s(sim),
      k_pair.reshape(1, 2))
    return out_re.reshape(-1)[:n], out_im.reshape(-1)[:n]


def propagate_pallas(source, target_points, wavelength: float,
                     target_tile: int = 512, source_tile: int = 1024,
                     interpret: bool = False):
    """df32 Pallas Huygens propagation.  Signature mirrors wave.propagate.

    ``interpret=True`` runs the kernel through the Pallas interpreter on
    any backend (used by CI on CPU; numerically identical modulo f32
    reassociation).
    """
    k = 2.0 * math.pi / wavelength
    # The axon/XLA:TPU f64 emulation silently degrades a *compile-time-
    # constant* operand of a subtract that is fused with a runtime-computed
    # value (measured: ~1.5e-9 absolute on 0.01-scale closure coordinates
    # under an outer jit -> 6e-3 field error, vs 7e-7 eager).  A value
    # barrier on the potentially-constant operands forces them to
    # materialize as runtime f64 buffers, which the emulation handles
    # exactly.  See BENCH_huygens_r03.json / round-3 hardware debugging.
    src_points = jax.lax.optimization_barrier(source.points)
    target_points = jax.lax.optimization_barrier(target_points)
    center = jnp.concatenate([src_points, target_points], axis=1).mean(
        axis=1, keepdims=True)
    src_pts = src_points - center
    tgt_pts = target_points - center
    src_re = (source.re * source.ds).astype(jnp.float64)
    src_im = (source.im * source.ds).astype(jnp.float64)
    k_hi = np.float32(k)
    k_lo = np.float32(k - float(k_hi))
    k_pair = jnp.array([k_hi, k_lo], dtype=jnp.float32)
    re, im = _huygens_pallas(tgt_pts, src_pts, src_re, src_im, k_pair,
                             target_tile=target_tile, source_tile=source_tile,
                             interpret=interpret)
    return re.astype(jnp.float64), im.astype(jnp.float64)
