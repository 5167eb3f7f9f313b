#!/usr/bin/env python
"""Trace-engine benchmark: the Pallas deviation-trace fast path on TPU.

Stages (each recorded incrementally to the artifact so a late crash
cannot discard earlier records):

1. hardware accuracy: ``trace.run(..., precision='pallas')`` on the TPU
   vs the SAME computation in f64 on the host CPU backend (golden) — at
   33x33: detcenter, demeaned OPL (the wavefront signal), loss and grad;
2. throughput: fwd+bwd steps/s of the driver-bench loss at 512^2 for
   precision='pallas' (and fwd-only, to split fwd vs bwd cost);
3. kernel-only: trace_deviation_pallas on raw deviation arrays at 512^2
   (locates whether time goes to the Mosaic kernel or the XLA wrapper).

Run with no args for the TPU attempt (sequential, in-script timeouts,
never kills the tunnel); JAX_PLATFORMS=cpu PYTHONPATH=<repo> degrades
every stage to the interpret/reference path.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
ARTIFACT = os.path.join(REPO, os.environ.get("TRACE_ARTIFACT",
                                             "BENCH_trace_r04.json"))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        cache_dir = os.path.expanduser("~/.cache/jax_akbx")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from akbx import trace
    from akbx.systems import AlignParams, WOLTER_3_1_DEFAULT, build_wolter_3_1

    backend = jax.default_backend()
    records = []
    # which stages to run (comma list; default all) — the full battery is
    # ~5 x ~600 s XLA:TPU compiles on this 2-vCPU box, so callers select
    stages = set(os.environ.get(
        "TRACE_STAGES", "accuracy,grad,throughput,kernel").split(","))

    def flush():
        with open(ARTIFACT, "w") as fh:
            json.dump({"records": records, "backend": backend}, fh, indent=1)

    def emit(rec):
        if "stage disabled" in str(rec.get("error", "")):
            return  # deselected via TRACE_STAGES, not a failure
        records.append(rec)
        print(json.dumps(rec))
        flush()

    def loss_fn(vec, n, precision, dev=False):
        system = build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                  AlignParams.from_vector(vec))
        res = trace.run(system, n, n, defocus=vec[0],
                        exit_pupil_uniform=False, tilt_correction=True,
                        precision=precision)
        if dev:
            sy, sz = trace.spot_size(res.ddet32, res.valid)
            return (jnp.sum(jnp.where(res.valid, res.w32, 0.0) ** 2) * 1e18
                    + sy + sz, (res.detcenter, res.w32, res.valid))
        w = res.total_dist - trace.masked_mean(res.total_dist, res.valid)
        sy, sz = trace.spot_size(res.detcenter, res.valid)
        return (jnp.sum(jnp.where(res.valid, w, 0.0) ** 2) * 1e18 + sy + sz,
                (res.detcenter, w, res.valid))

    v0 = jnp.zeros(26, dtype=jnp.float64)

    # ---- stage 1: hardware forward accuracy at 33x33 ------------------
    # golden = the f64 engine on the host CPU backend, FORWARD only (its
    # fwd+bwd XLA:CPU compile alone is >550 s); gradient hardware parity
    # is checked in stage 1b against the interpret-mode pallas path, whose
    # f64 grad parity is CI-tested (tests/test_trace_pallas.py).
    n_acc = int(os.environ.get("TRACE_BENCH_NACC", "33"))
    fwd = lambda v, p: loss_fn(v, n_acc, p)  # noqa: E731
    try:
        if "accuracy" not in stages:
            raise RuntimeError("stage disabled via TRACE_STAGES")
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            t0 = time.time()
            l_g, (det_g, w_g, v_g) = jax.jit(
                lambda v: fwd(v, "f64"), backend="cpu")(v0)
            jax.block_until_ready(w_g)
            golden_s = time.time() - t0
        t0 = time.time()
        l_p, (det_p, w_p, v_p) = jax.jit(lambda v: fwd(v, "pallas"))(v0)
        jax.block_until_ready(w_p)
        acc_compile_s = time.time() - t0
        det_err = float(np.abs(np.asarray(det_p) - np.asarray(det_g)).max())
        w_err = float(np.abs(np.asarray(w_p) - np.asarray(w_g)).max())
        emit({"stage": "accuracy_fwd", "device": backend, "n": n_acc,
              "golden": "host-cpu f64 fwd",
              "detcenter_max_abs_err_m": det_err,
              "wavefront_max_abs_err_m": w_err,
              "loss_rel_err": abs(float(l_p) - float(l_g))
              / max(abs(float(l_g)), 1e-30),
              "valid_agree": bool(np.array_equal(np.asarray(v_p),
                                                 np.asarray(v_g))),
              "golden_cpu_s": round(golden_s, 1),
              "pallas_compile_s": round(acc_compile_s, 1)})
    except Exception as exc:
        emit({"stage": "accuracy_fwd", "error":
              f"{type(exc).__name__}: {exc}"[:2000]})

    # ---- stage 1b: hardware grad parity vs interpret-mode pallas -------
    try:
        if "grad" not in stages:
            raise RuntimeError("stage disabled via TRACE_STAGES")
        gfn = jax.value_and_grad(lambda v, p: fwd(v, p)[0], argnums=0)
        t0 = time.time()
        _, grad_hw = jax.jit(lambda v: gfn(v, "pallas"))(v0)
        jax.block_until_ready(grad_hw)
        hw_s = time.time() - t0
        with jax.default_device(jax.devices("cpu")[0]):
            t0 = time.time()
            _, grad_ci = jax.jit(lambda v: gfn(v, "pallas"),
                                 backend="cpu")(v0)
            jax.block_until_ready(grad_ci)
            ci_s = time.time() - t0
        gg, gp = np.asarray(grad_ci), np.asarray(grad_hw)
        scale = max(np.abs(gg).max(), 1e-30)
        grad_rel = float((np.abs(gp - gg)
                          / np.maximum(np.abs(gg), scale * 1e-6)).max())
        # the 1e-6-of-scale floor makes f32 noise on near-zero components
        # read as O(1) "relative error"; record the full vectors + the
        # scale-relative error so the comparison is interpretable
        emit({"stage": "grad_parity_hw_vs_interpret", "device": backend,
              "n": n_acc, "grad_max_rel_err": grad_rel,
              "grad_max_err_rel_to_scale":
              float(np.abs(gp - gg).max() / scale),
              "grad_norm_rel_err":
              float(np.linalg.norm(gp - gg) / np.linalg.norm(gg)),
              "grad_hw": gp.tolist(), "grad_interpret": gg.tolist(),
              "hw_compile_s": round(hw_s, 1),
              "interpret_cpu_s": round(ci_s, 1)})
    except Exception as exc:
        emit({"stage": "grad_parity_hw_vs_interpret", "error":
              f"{type(exc).__name__}: {exc}"[:2000]})

    # ---- stage 2: throughput at 512^2, fwd+bwd then fwd-only ----------
    n = int(os.environ.get("TRACE_BENCH_N", "512"))
    n_rays = n * n
    for tag, make in (
        ("fwd_bwd_dev", lambda: jax.jit(
            lambda v: jax.value_and_grad(
                lambda u: loss_fn(u, n, "pallas", dev=True)[0])(v))),
        ("fwd_bwd_f64loss", lambda: jax.jit(
            lambda v: jax.value_and_grad(
                lambda u: loss_fn(u, n, "pallas")[0])(v))),
        ("fwd_dev", lambda: jax.jit(
            lambda v: loss_fn(v, n, "pallas", dev=True)[0])),
    ):
        try:
            if "throughput" not in stages:
                raise RuntimeError("stage disabled via TRACE_STAGES")
            only = os.environ.get("TRACE_THROUGHPUT_TAGS")
            if only and tag not in only.split(","):
                raise RuntimeError("stage disabled via TRACE_STAGES")
            fn = make()
            t0 = time.time()
            out = fn(v0)
            jax.block_until_ready(out)
            compile_s = time.time() - t0

            # input chaining with FIXED constants (see bench_common.
            # measure): fresh python constants per step force a ~1.5 s
            # remote compile of a trivial add on the axon backend, and
            # data-dependence defeats dispatch dedup/overlap
            def scalar_of(out):
                return out[0] if isinstance(out, tuple) else out

            v = v0
            for _ in range(3):
                out = fn(v)
                v = v0 + scalar_of(out) * 0.0
            float(scalar_of(out))
            n_iter = 0
            t0 = time.time()
            while True:
                for _ in range(25):
                    out = fn(v)
                    v = v0 + scalar_of(out) * 0.0
                float(scalar_of(out))  # hard host sync
                n_iter += 25
                if time.time() - t0 > 4.0 or n_iter >= 2000:
                    break
            dt = (time.time() - t0) / n_iter
            emit({"stage": f"throughput_{tag}_{n}", "device": backend,
                  "precision": "pallas", "n_rays": n_rays,
                  "compile_s": round(compile_s, 1), "step_s": dt,
                  "rays_per_s": n_rays / dt})
        except Exception as exc:
            emit({"stage": f"throughput_{tag}_{n}", "error":
                  f"{type(exc).__name__}: {exc}"[:2000]})

    # ---- stage 3: kernel-only (Mosaic compile is fast, ~11 s) ---------
    try:
        if "kernel" not in stages:
            raise RuntimeError("stage disabled via TRACE_STAGES")
        n = int(os.environ.get("TRACE_BENCH_NKERN", str(n)))
        n_rays = n * n
        from akbx.kernels import trace_kernel as tk

        system = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.zeros())
        rays = trace.ray_fan(trace.fan_angles(system.fan_h, n),
                             trace.fan_angles(system.fan_v, n))
        src = system.source[:, None] * jnp.ones((1, n_rays))
        chief_idx = n_rays // 2
        chief_d0 = rays[:, chief_idx:chief_idx + 1]
        chief_p0 = src[:, chief_idx:chief_idx + 1]
        chief = trace.trace(system, chief_d0, chief_p0)
        P = [p[:, 0] for p in chief.points]
        D = [d[:, 0] for d in chief.directions]
        T = [s[0] for s in chief.segments]
        consts64 = trace._deviation_constants(system, P, D, T, chief_p0)
        (Ms, bvecs, Ds, Dns, Ts, A_noms, Bp_noms, rhos, gCs, gAs,
         branches, Ps) = consts64
        consts = tk.pack_consts(Ms, gCs, gAs, Ds, Dns, Ts, A_noms,
                                Bp_noms, rhos, branches, bvecs)
        dp64 = src - chief_p0
        dd64 = rays - chief_d0
        interp = backend not in ("tpu", "axon")
        kfn = jax.jit(lambda c, a, b: (
            tk.trace_deviation_reference(c, a, b, 4) if interp
            else tk.trace_deviation_pallas(c, a, b, 4)))
        t0 = time.time()
        out = kfn(consts, dp64, dd64)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        # fixed-constant input chaining (see the throughput stage)
        dp_v = dp64
        n_iter = 0
        t0 = time.time()
        while True:
            for _ in range(25):
                out = kfn(consts, dp_v, dd64)
                dp_v = dp64 + (out[0].ravel()[0] * 0.0).astype(dp64.dtype)
            float(out[0].ravel()[0])  # hard host sync
            n_iter += 25
            if time.time() - t0 > 3.0 or n_iter >= 2000:
                break
        dt = (time.time() - t0) / n_iter
        emit({"stage": f"kernel_only_{n}", "device": backend,
              "interpret": interp, "n_rays": n_rays,
              "compile_s": round(compile_s, 1), "step_s": dt,
              "rays_per_s": n_rays / dt})
    except Exception as exc:
        emit({"stage": "kernel_only", "error":
              f"{type(exc).__name__}: {exc}"[:2000]})


if __name__ == "__main__":
    main()
