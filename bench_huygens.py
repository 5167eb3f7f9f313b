#!/usr/bin/env python
"""Secondary benchmark: the Huygens O(N*M) contraction — the reference's
single dominant cost (Wavecalc_raytrace_fromData_*, SURVEY.md §2.7/§3.3).

Measures source-target point-pairs per second for:
  * the Pallas df32 TPU kernel (production TPU path),
  * the pure-XLA chunked path (fallback),
  * the native C++/OpenMP engine (host oracle, exact f64),
cross-checks the accelerated *complex* fields against the native engine
(complex error catches phase regressions that a magnitude check hides),
and verifies jax.grad parity of the Pallas path vs the XLA path at small N.

Prints one JSON line per backend to stdout and, on a TPU backend, writes
all records to BENCH_huygens_r02.json.  Run with no arguments for the TPU
attempt; set JAX_PLATFORMS=cpu PYTHONPATH=<repo> for CPU-only.
"""

import json
import os
import sys
import time

import numpy as np

ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.environ.get("HUYGENS_ARTIFACT",
                                       "BENCH_huygens_r03.json"))


def make_problem(n_src: int, n_tgt: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    # mirror-like geometry: two metre-scale patches 0.5 m apart, EUV
    src = np.stack([1.0 + 0.001 * rng.standard_normal(n_src),
                    0.01 * rng.standard_normal(n_src),
                    0.01 * rng.standard_normal(n_src)])
    tgt = np.stack([1.5 + 0.001 * rng.standard_normal(n_tgt),
                    0.01 * rng.standard_normal(n_tgt),
                    0.01 * rng.standard_normal(n_tgt)])
    phase = rng.uniform(0, 2 * np.pi, n_src)
    u_re, u_im = np.cos(phase), np.sin(phase)
    ds = np.full(n_src, 1e-10)
    return src, tgt, u_re, u_im, ds


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

    from akbx import wave

    wavelength = 13.5e-9
    n_src = n_tgt = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    src, tgt, u_re, u_im, ds = make_problem(n_src, n_tgt)
    field = wave.WaveField(jnp.asarray(src), jnp.asarray(u_re),
                           jnp.asarray(u_im), jnp.asarray(ds), 0, 0)
    tgt_j = jnp.asarray(tgt)
    pairs = float(n_src) * float(n_tgt)
    backend = jax.default_backend()
    records = []

    # native f64 oracle on a small slice (full run is minutes on host)
    from akbx import native

    oracle_n = min(n_tgt, 2048)
    t0 = time.time()
    o_re, o_im = wave.propagate(field, tgt_j[:, :oracle_n], wavelength,
                                backend="native")
    native_dt = time.time() - t0
    o_u = np.asarray(o_re) + 1j * np.asarray(o_im)
    rec = {
        "metric": "huygens_pairs_per_s", "backend_impl": "native-cpp",
        "device": "host-cpu", "threads": native.num_threads(),
        "value": n_src * oracle_n / native_dt, "unit": "pairs/s",
    }
    records.append(rec)
    print(json.dumps(rec))

    def flush():
        if backend in ("tpu", "axon"):
            with open(ARTIFACT, "w") as fh:
                json.dump({"records": records, "n_src": n_src,
                           "n_tgt": n_tgt, "wavelength": wavelength},
                          fh, indent=1)

    # a stage failure (e.g. the XLA f64 path OOMing HBM at 65536^2, as in
    # the first round-3 run) is recorded and the remaining stages still run
    for name in (("pallas",) if backend in ("tpu", "axon") else ()) + ("xla",):
        # the XLA f64 path materializes (chunk x M) f32 temps under remat;
        # keep them ~64 MB so 65536 sources fit HBM next to the fields
        kw = {"chunk": 256} if name == "xla" else {}
        try:
            fn = jax.jit(lambda t, b=name: wave.propagate(
                field, t, wavelength, backend=b, **kw))
            t0 = time.time()
            re, im = fn(tgt_j)
            jax.block_until_ready(im)
            compile_s = time.time() - t0
            n_iter = 0
            t0 = time.time()
            while True:
                re, im = fn(tgt_j)
                jax.block_until_ready(im)
                n_iter += 1
                if time.time() - t0 > 3.0 or n_iter >= 50:
                    break
            dt = (time.time() - t0) / n_iter
            u = np.asarray(re[:oracle_n]) + 1j * np.asarray(im[:oracle_n])
            err = float(np.max(np.abs(u - o_u)) / np.max(np.abs(o_u)))
            rec = {
                "metric": "huygens_pairs_per_s", "backend_impl": name,
                "device": backend, "value": pairs / dt, "unit": "pairs/s",
                "compile_s": round(compile_s, 1), "step_s": dt,
                "field_err_vs_native_f64": err,
            }
        except Exception as exc:  # record the truth, keep benching
            rec = {"metric": "huygens_pairs_per_s", "backend_impl": name,
                   "device": backend, "value": None,
                   "error": f"{type(exc).__name__}: {exc}"[:2000]}
        records.append(rec)
        print(json.dumps(rec))
        flush()

    if backend in ("tpu", "axon"):
        # grad parity: Pallas custom_vjp (backward = XLA core's VJP) vs
        # straight XLA autodiff, small N (VERDICT r1 #3)
        try:
            gs, gt = make_problem(512, 384, seed=3)[:2]
            gfield = wave.WaveField(jnp.asarray(gs), jnp.asarray(u_re[:512]),
                                    jnp.asarray(u_im[:512]),
                                    jnp.asarray(ds[:512]), 0, 0)
            gt_j = jnp.asarray(gt)

            def loss(re_w, b):
                f = wave.WaveField(gfield.points, re_w, gfield.im,
                                   gfield.ds, 0, 0)
                r, i = wave.propagate(f, gt_j, wavelength, backend=b)
                return jnp.sum(r ** 2 + i ** 2)

            g_p = np.asarray(jax.grad(loss)(gfield.re, "pallas"))
            g_x = np.asarray(jax.grad(loss)(gfield.re, "xla"))
            gerr = float(np.abs(g_p - g_x).max() / np.abs(g_x).max())
            rec = {"metric": "huygens_grad_parity_pallas_vs_xla",
                   "value": gerr, "unit": "max_rel_err", "device": backend}
        except Exception as exc:
            rec = {"metric": "huygens_grad_parity_pallas_vs_xla",
                   "value": None, "device": backend,
                   "error": f"{type(exc).__name__}: {exc}"[:2000]}
        records.append(rec)
        print(json.dumps(rec))
        flush()


if __name__ == "__main__":
    main()
