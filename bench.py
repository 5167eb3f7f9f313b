#!/usr/bin/env python
"""Benchmark: rays/s/chip forward+backward through the AKB 4-mirror system.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline target (BASELINE.md): 1e8 rays/s/chip fwd+bwd.

Hardened for the single easily-wedged TPU tunnel (VERDICT r2 #1a):
* inherited XLA_FLAGS are stripped for the TPU attempts (round 2's crash
  carried conflicting --xla_tpu_use_enhanced_launch_barrier flags) and the
  inherited value is logged in the detail artifact;
* a small warm-up probe validates tunnel health and populates the
  persistent compile cache before the 512^2 runs;
* every attempt (cmd, env, rc, full stderr) is recorded in
  BENCH_DETAIL.json next to this script — a truthful failure record
  instead of a 200-char rich-rendered tail;
* both precisions are measured: f64 (primary metric, comparable with
  rounds 1-2) and df32 (the deviation-trace TPU fast path, README claim).

Runs each measurement in a subprocess with a watchdog so a wedged TPU
degrades to the CPU backend instead of hanging the driver.  TPU runs are
strictly sequential — only one process may hold the tunnel.
"""

import json
import os
import re
import subprocess
import sys

BASELINE_RAYS_PER_S = 1e8
REPO = os.path.dirname(os.path.abspath(__file__))
DETAIL_PATH = os.path.join(REPO, "BENCH_DETAIL.json")

WORKER = r"""
import json, os, sys, time
import jax
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the remote TPU compile of the fwd+bwd
# engine graph takes minutes and is latency-volatile; cache it across runs
try:
    cache_dir = os.path.expanduser("~/.cache/jax_akbx")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp

sys.path.insert(0, %(repo)r)
from akbx import trace
from akbx.systems import AlignParams, WOLTER_3_1_DEFAULT, build_wolter_3_1

n_h = n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 256
precision = sys.argv[2] if len(sys.argv) > 2 else "f64"
n_rays = n_h * n_v

def loss(vec):
    system = build_wolter_3_1(WOLTER_3_1_DEFAULT, AlignParams.from_vector(vec))
    res = trace.run(system, n_h, n_v, defocus=vec[0],
                    exit_pupil_uniform=False, tilt_correction=True,
                    precision=precision)
    if precision == "pallas":
        # production-loss form: the engine's f32 deviation outputs
        # (demeaned OPL deviation + detcenter deviations) — the same
        # physical objective as below, but consuming the deviation fields
        # keeps the whole fwd+bwd graph off the emulated-f64 path
        sy, sz = trace.spot_size(res.ddet32, res.valid)
        return (jnp.sum(jnp.where(res.valid, res.w32, 0.0) ** 2) * 1e18
                + sy + sz)
    w = res.total_dist - trace.masked_mean(res.total_dist, res.valid)
    sy, sz = trace.spot_size(res.detcenter, res.valid)
    return jnp.sum(jnp.where(res.valid, w, 0.0) ** 2) * 1e18 + sy + sz

step = jax.jit(jax.value_and_grad(loss))
v0 = jnp.zeros(26, dtype=jnp.float64)

t0 = time.time()
val, grad = step(v0)
jax.block_until_ready(grad)
compile_s = time.time() - t0

# warmup: flush one-time executable/dispatch setup and absorb a latency
# spike or two (the remote TPU tunnel has multi-second outliers)
for i in range(3):
    val, grad = step(v0 + i * 1e-15)
jax.block_until_ready(grad)

# steady state: time-targeted throughput loop.  Individual dispatches are
# asynchronous; batches of steps amortize tunnel latency, and we keep
# going until >=4s of wall time so second-scale spikes cannot dominate.
n_iter = 0
t0 = time.time()
while True:
    for j in range(25):
        val, grad = step(v0 + (n_iter + j) * 1e-15)
    jax.block_until_ready(grad)
    n_iter += 25
    if time.time() - t0 > 4.0 or n_iter >= 2000:
        break
dt = (time.time() - t0) / n_iter

dev = jax.devices()[0]
print(json.dumps({
    "backend": jax.default_backend(),
    "device": getattr(dev, "device_kind", str(dev)),
    "precision": precision,
    "n_rays": n_rays,
    "compile_s": compile_s,
    "step_s": dt,
    "rays_per_s": n_rays / dt,
    "loss": float(val),
}))
"""

_ANSI = re.compile(r"\x1b\[[0-9;]*m")

attempts = []  # full record of every subprocess attempt


def run_worker(tag, env_overrides, n, precision, timeout):
    env = dict(os.environ)
    env.update(env_overrides)
    cmd = [sys.executable, "-c", WORKER % {"repo": REPO}, str(n), precision]
    rec = {"tag": tag, "n": n, "precision": precision, "timeout_s": timeout,
           "env_overrides": env_overrides,
           "inherited_xla_flags": os.environ.get("XLA_FLAGS", "")}
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, env=env)
    except subprocess.TimeoutExpired as e:
        rec.update(rc="timeout",
                   stderr=_ANSI.sub("", (e.stderr or b"").decode("utf-8", "replace")
                                    if isinstance(e.stderr, bytes)
                                    else (e.stderr or "")))
        attempts.append(rec)
        return None, "timeout"
    rec["rc"] = proc.returncode
    rec["stderr"] = _ANSI.sub("", proc.stderr)[-20000:]
    if proc.returncode != 0:
        attempts.append(rec)
        return None, f"rc={proc.returncode}"
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            result = json.loads(line)
            rec["result"] = result
            attempts.append(rec)
            return result, None
        except json.JSONDecodeError:
            continue
    rec["stdout_tail"] = proc.stdout[-2000:]
    attempts.append(rec)
    return None, "no json in output"


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr)


def write_detail(summary):
    try:
        with open(DETAIL_PATH, "w") as fh:
            json.dump({"summary": summary, "attempts": attempts}, fh, indent=1)
    except OSError as e:
        log(f"could not write {DETAIL_PATH}: {e}")


def main():
    # TPU attempts run with inherited XLA_FLAGS STRIPPED: round 2's TPU
    # crash traced to conflicting inherited launch-barrier flags.  The
    # stripped value is preserved in BENCH_DETAIL.json.
    tpu_env = {"XLA_FLAGS": ""}
    cpu_env = {"PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
               "XLA_FLAGS": ""}
    probe_timeout = int(os.environ.get("BENCH_TPU_TIMEOUT", "600"))
    main_timeout = int(os.environ.get("BENCH_TPU_MAIN_TIMEOUT", "1500"))

    pallas = f64 = df32 = None
    tpu_ok = False
    # probe with the Pallas production path (fast compile); if the Mosaic
    # path itself is broken, fall back to an f64 probe so the bench can
    # still record the f64 engine on hardware
    for attempt, prec in ((1, "pallas"), (2, "pallas"), (3, "f64")):
        probe, err = run_worker(f"tpu-probe-{attempt}-{prec}", tpu_env, 128,
                                prec, probe_timeout)
        if probe is not None and probe.get("backend") in ("tpu", "axon"):
            tpu_ok = True
            log(f"probe ok: backend={probe['backend']} "
                f"device={probe['device']} precision={prec} "
                f"compile={probe['compile_s']:.1f}s "
                f"rays/s={probe['rays_per_s']:.3e}")
            break
        log(f"TPU probe attempt {attempt} ({prec}) failed: {err}")

    if tpu_ok:
        # production path first (fast compile -> a headline lands even if
        # the slow-compiling f64 attempt later times out)
        for attempt in (1, 2):
            pallas, err = run_worker(f"tpu-pallas-{attempt}", tpu_env, 512,
                                     "pallas", main_timeout)
            if pallas is not None:
                break
            log(f"TPU pallas 512^2 attempt {attempt} failed: {err}")
        for attempt in (1, 2):
            f64, err = run_worker(f"tpu-f64-{attempt}", tpu_env, 512, "f64",
                                  main_timeout)
            if f64 is not None:
                break
            log(f"TPU f64 512^2 attempt {attempt} failed: {err}")
        if f64 is not None or pallas is not None:
            df32, err = run_worker("tpu-df32", tpu_env, 512, "df32",
                                   main_timeout)
            if df32 is None:
                log(f"TPU df32 run failed: {err}")

    if f64 is None and pallas is None:
        log("falling back to CPU")
        pallas, err = run_worker("cpu-pallas", cpu_env, 128, "pallas", 1500)
        f64, err2 = run_worker("cpu-f64", cpu_env, 128, "f64", 1500)

    best = pallas or f64
    if best is None:
        log(f"CPU fallback also failed: {err}")
        out = {"metric": "akb_rays_per_s_fwd_bwd", "value": 0.0,
               "unit": "rays/s/chip", "vs_baseline": 0.0, "backend": "none"}
        write_detail(out)
        print(json.dumps(out))
        return 1

    for tag, rec in (("pallas", pallas), ("f64", f64), ("df32", df32)):
        if rec is not None:
            log(f"{tag}: backend={rec['backend']} n_rays={rec['n_rays']} "
                f"compile={rec['compile_s']:.1f}s "
                f"step={rec['step_s']*1e3:.2f}ms "
                f"rays/s={rec['rays_per_s']:.3e} loss={rec['loss']:.3e}")
    # headline: the production TPU path (Pallas df32 deviation-trace
    # kernel, BASELINE.md: "Pallas intersect/reflect kernels"); f64/df32
    # engine numbers are recorded alongside for cross-round continuity
    value = best["rays_per_s"]
    out = {
        "metric": "akb_rays_per_s_fwd_bwd",
        "value": value,
        "unit": "rays/s/chip",
        "vs_baseline": value / BASELINE_RAYS_PER_S,
        "backend": best["backend"],
        "device": best.get("device"),
        "n_rays": best["n_rays"],
        "precision": best["precision"],
        "compile_s": round(best["compile_s"], 1),
        "f64_rays_per_s": f64["rays_per_s"] if f64 else None,
        "f64_compile_s": round(f64["compile_s"], 1) if f64 else None,
        "df32_rays_per_s": df32["rays_per_s"] if df32 else None,
        "df32_compile_s": round(df32["compile_s"], 1) if df32 else None,
    }
    write_detail(out)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
