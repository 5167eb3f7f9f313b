"""Shared benchmark workload definitions + AOT executable store.

The driver-facing ``bench.py`` measures rays/s/chip forward+backward
through the AKB 4-mirror system.  The XLA:TPU compile of those graphs is
expensive (~500-600 s of local CPU work for the f64/pallas variants) and
the persistent JAX compilation cache does NOT hit across processes on
the axon-tunneled TPU (measured round 5: identical worker, identical
code -> fresh ~600 s compile and a new cache key; the key appears to
include a volatile topology fingerprint).  A driver bench that recompiles
everything cannot fit its timeout (round 4 died at rc=124 with zero JSON
output).

The fix is ahead-of-time compilation: :func:`aot_build` compiles each
benchmark workload once, serializes the executable with
``jax.experimental.serialize_executable`` and stores it under
``~/.cache/akbx_aot/`` together with a manifest (git hash, shapes).
``bench.py`` workers then ``deserialize_and_load`` (~10-20 s, measured)
and go straight to measurement; cold-compile remains as a
deadline-guarded fallback.

Loss definitions are identical to rounds 3-4 (cross-round continuity):
the f64/df32 losses consume the engine's f64 OPL/detcenter fields, the
pallas loss consumes the f32 deviation fields (same physical objective,
keeps the fwd+bwd graph off the emulated-f64 path).
"""

from __future__ import annotations

import json
import os
import pickle
import subprocess
import time

AOT_DIR = os.path.expanduser("~/.cache/akbx_aot")
MANIFEST = os.path.join(AOT_DIR, "manifest.json")

# the workloads bench.py records; (tag, fan side n, precision)
WORKLOADS = (
    ("pallas-2048", 2048, "pallas"),
    ("pallas-512", 512, "pallas"),
    ("f64-512", 512, "f64"),
    ("df32-512", 512, "df32"),
)


def make_step(n_h: int, n_v: int, precision: str):
    """jit(value_and_grad(loss)) for one bench workload (same losses as
    rounds 3-4; see module docstring)."""
    import jax
    import jax.numpy as jnp

    from akbx import trace
    from akbx.systems import (AlignParams, WOLTER_3_1_DEFAULT,
                              build_wolter_3_1)

    def loss(vec):
        system = build_wolter_3_1(WOLTER_3_1_DEFAULT,
                                  AlignParams.from_vector(vec))
        res = trace.run(system, n_h, n_v, defocus=vec[0],
                        exit_pupil_uniform=False, tilt_correction=True,
                        precision=precision)
        if precision == "pallas" and res.w32 is not None:
            # production-loss form: the engine's f32 deviation outputs
            # (demeaned OPL deviation + detcenter deviations) — the same
            # physical objective as below, but consuming the deviation
            # fields keeps the whole fwd+bwd graph off the emulated-f64
            # path.  res.w32 is None iff the fast path was not taken
            # (figure errors / ray sharding) — then fall through to the
            # f64-field loss (ADVICE r4 #1).
            sy, sz = trace.spot_size(res.ddet32, res.valid)
            return (jnp.sum(jnp.where(res.valid, res.w32, 0.0) ** 2) * 1e18
                    + sy + sz)
        w = res.total_dist - trace.masked_mean(res.total_dist, res.valid)
        sy, sz = trace.spot_size(res.detcenter, res.valid)
        return jnp.sum(jnp.where(res.valid, w, 0.0) ** 2) * 1e18 + sy + sz

    return jax.jit(jax.value_and_grad(loss))


def example_arg():
    import jax.numpy as jnp

    return jnp.zeros(26, dtype=jnp.float64)


def measure(step, n_rays: int, compile_s: float, precision: str,
            min_wall_s: float = 4.0):
    """Warmup + time-targeted throughput loop (identical to rounds 3-4).

    Individual dispatches are asynchronous; batches of steps amortize the
    remote-tunnel latency, and the loop runs until >= ``min_wall_s`` of
    wall time so second-scale latency spikes cannot dominate.
    """
    import jax

    # Input chaining: v_{k+1} = v0 + 0 * grad_k.  Three properties matter
    # on the remote axon backend: (a) the eager mul/add use FIXED python
    # constants, so they compile ONCE and are cached — the old
    # ``v0 + k * 1e-15`` baked a fresh constant per step and forced a
    # ~1.5 s remote compile of a trivial add EVERY step (measured round
    # 5: all workloads "stepped" at ~1.52 s); (b) each step's input
    # depends on the previous step's output, so executions serialize by
    # dataflow and cannot be deduplicated or overlapped; (c) the values
    # are bit-identical to v0, so the measured graph is the production
    # one.
    v0 = example_arg()
    v = v0
    for _ in range(3):
        val, grad = step(v)
        v = v0 + grad * 0.0
    jax.block_until_ready(grad)
    float(val)

    n_iter = 0
    t0 = time.time()
    while True:
        for _ in range(25):
            val, grad = step(v)
            v = v0 + grad * 0.0
        float(val)  # hard host sync: block_until_ready has been seen
        # returning early on the axon runtime; fetching the LAST step's
        # value cannot complete before every prior FIFO execution has
        n_iter += 25
        if time.time() - t0 > min_wall_s or n_iter >= 2000:
            break
    dt = (time.time() - t0) / n_iter

    dev = jax.devices()[0]
    return {
        "backend": jax.default_backend(),
        "device": getattr(dev, "device_kind", str(dev)),
        "precision": precision,
        "n_rays": n_rays,
        "compile_s": compile_s,
        "step_s": dt,
        "rays_per_s": n_rays / dt,
        "loss": float(val),
    }


def graph_fingerprint() -> str:
    """Hash of everything that determines the traced bench graphs: the
    akbx package sources plus the make_step definition.  Doc/test/tooling
    commits leave it unchanged, so a prebuilt AOT store stays verifiably
    current; any engine/loss edit changes it and flags the store stale."""
    import hashlib
    import inspect

    h = hashlib.sha256()
    pkg = os.path.join(os.path.dirname(os.path.abspath(__file__)), "akbx")
    for root, dirs, files in sorted(os.walk(pkg)):
        dirs.sort()
        for fname in sorted(files):
            if fname.endswith(".py"):
                path = os.path.join(root, fname)
                h.update(os.path.relpath(path, pkg).encode())
                with open(path, "rb") as fh:
                    h.update(fh.read())
    h.update(inspect.getsource(make_step).encode())
    return h.hexdigest()


def git_head() -> str:
    try:
        return subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        return "unknown"


def aot_path(tag: str) -> str:
    return os.path.join(AOT_DIR, f"{tag}.bin")


def aot_build(tags=None, verbose: bool = True):
    """Compile + serialize the bench workloads (run on the real TPU).

    Writes ``<tag>.bin`` (pickled (payload, in_tree, out_tree)) and a
    manifest recording the git hash and device kind, so ``bench.py`` can
    detect staleness.  Sequential by construction — only one process may
    hold the TPU tunnel.
    """
    import jax

    from jax.experimental.serialize_executable import serialize

    os.makedirs(AOT_DIR, exist_ok=True)
    try:
        with open(MANIFEST) as fh:
            manifest = json.load(fh)
    except (OSError, ValueError):
        manifest = {}
    dev = jax.devices()[0]
    head = git_head()
    for tag, n, precision in WORKLOADS:
        if tags is not None and tag not in tags:
            continue
        t0 = time.time()
        step = make_step(n, n, precision)
        lowered = step.lower(example_arg())
        compiled = lowered.compile()
        compile_s = time.time() - t0
        payload, in_tree, out_tree = serialize(compiled)
        with open(aot_path(tag), "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        manifest[tag] = {
            "n": n, "precision": precision, "compile_s": compile_s,
            "bytes": len(payload), "git_head": head,
            "graph_fingerprint": graph_fingerprint(),
            "backend": jax.default_backend(),
            "device": getattr(dev, "device_kind", str(dev)),
            "built_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(MANIFEST, "w") as fh:
            json.dump(manifest, fh, indent=1)
        if verbose:
            print(f"[aot] {tag}: compiled {compile_s:.1f}s, "
                  f"{len(payload)/1e6:.1f} MB", flush=True)


def aot_load(tag: str):
    """Deserialize a prebuilt executable; returns (callable, manifest
    entry).  Raises on any mismatch/corruption — callers fall back."""
    from jax.experimental.serialize_executable import deserialize_and_load

    with open(MANIFEST) as fh:
        manifest = json.load(fh)
    entry = manifest[tag]
    with open(aot_path(tag), "rb") as fh:
        payload, in_tree, out_tree = pickle.load(fh)
    compiled = deserialize_and_load(payload, in_tree, out_tree)
    return compiled, entry


if __name__ == "__main__":
    import sys

    aot_build(tags=set(sys.argv[1:]) or None)
