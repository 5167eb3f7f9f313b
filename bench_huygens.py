#!/usr/bin/env python
"""Secondary benchmark: the Huygens O(N*M) contraction — the reference's
single dominant cost (Wavecalc_raytrace_fromData_*, SURVEY.md §2.7/§3.3).

Measures source-target point-pairs per second for:
  * the Pallas df32 TPU kernel (production TPU path),
  * the pure-XLA chunked path (fallback),
  * the native C++/OpenMP engine (host oracle, exact f64),
and cross-checks the accelerated fields against the native engine.

Prints one JSON line per backend to stdout.  Run with no arguments for
the TPU attempt; set JAX_PLATFORMS=cpu PYTHONPATH=<repo> for CPU-only.
"""

import json
import math
import sys
import time

import numpy as np


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

    # native f64 oracle on a small slice (full run is minutes on host)
    from akbx import native

    oracle_n = min(n_tgt, 2048)
    t0 = time.time()
    o_re, o_im = wave.propagate(field, tgt_j[:, :oracle_n], wavelength,
                                backend="native")
    native_dt = time.time() - t0
    o_mag = np.hypot(np.asarray(o_re), np.asarray(o_im))
    print(json.dumps({
        "metric": "huygens_pairs_per_s", "backend_impl": "native-cpp",
        "device": "host-cpu", "threads": native.num_threads(),
        "value": n_src * oracle_n / native_dt, "unit": "pairs/s",
    }))

    for name in (("pallas",) if backend in ("tpu", "axon") else ()) + ("xla",):
        fn = jax.jit(lambda t, b=name: wave.propagate(field, t, wavelength,
                                                      backend=b))
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
        mag = np.hypot(np.asarray(re[:oracle_n]), np.asarray(im[:oracle_n]))
        err = float(np.max(np.abs(mag - o_mag)) / np.max(o_mag))
        print(json.dumps({
            "metric": "huygens_pairs_per_s", "backend_impl": name,
            "device": backend, "value": pairs / dt, "unit": "pairs/s",
            "compile_s": round(compile_s, 1), "step_s": dt,
            "mag_err_vs_native_f64": err,
        }))


if __name__ == "__main__":
    main()
