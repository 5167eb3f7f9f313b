#!/usr/bin/env python
"""Benchmark: rays/s/chip forward+backward through the AKB 4-mirror system.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline target (BASELINE.md): 1e8 rays/s/chip fwd+bwd.

Hardened for the single easily-wedged TPU tunnel and the driver's outer
timeout (rounds 2-4 post-mortems):

* **AOT-first**: the XLA:TPU compiles of these graphs cost ~500-600 s
  EACH of local CPU work and the persistent JAX compilation cache does
  not hit across processes on the axon tunnel (measured round 5) —
  round 4's bench died in compiles (rc=124, no JSON line).  The
  workloads are therefore compiled ahead of time by ``bench_common.
  aot_build`` (run at the end of each build round) and the workers here
  ``deserialize_and_load`` them in ~10-20 s.  Cold-compile remains as a
  deadline-guarded fallback.
* **Global deadline** (``BENCH_BUDGET`` s, default 2100): every worker
  gets ``min(its timeout, remaining - reserve)``; when the budget is
  spent the bench emits the best result so far instead of dying with
  nothing.  SIGTERM/SIGINT also dump the best-so-far JSON.
* every attempt (cmd, env, rc, full stderr) is recorded in
  ``BENCH_DETAIL.json`` — a truthful failure record;
* inherited XLA_FLAGS are stripped for TPU attempts (round 2's crash
  carried conflicting launch-barrier flags);
* TPU runs are strictly sequential — only one process may hold the
  tunnel; a wedged TPU degrades to the CPU backend.

Workloads (definitions in ``bench_common.py``, identical losses to
rounds 3-4): ``pallas-2048`` (the production Mosaic deviation-trace
path, the headline), ``f64-512`` and ``df32-512`` (cross-round
continuity records).
"""

import json
import os
import re
import signal
import subprocess
import sys
import time

BASELINE_RAYS_PER_S = 1e8
REPO = os.path.dirname(os.path.abspath(__file__))
DETAIL_PATH = os.path.join(REPO, "BENCH_DETAIL.json")

WORKER = r"""
import json, os, sys, time
import jax
jax.config.update("jax_enable_x64", True)
try:
    cache_dir = os.path.expanduser("~/.cache/jax_akbx")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, %(repo)r)
import bench_common as bc

tag, n, precision, mode = (sys.argv[1], int(sys.argv[2]), sys.argv[3],
                           sys.argv[4])
v0 = bc.example_arg()

if mode == "aot":
    t0 = time.time()
    step, entry = bc.aot_load(tag)
    load_s = time.time() - t0
    result = bc.measure(step, n * n, load_s, precision)
    result["aot"] = True
    result["aot_load_s"] = load_s
    result["aot_git_head"] = entry.get("git_head")
    result["aot_compile_s"] = entry.get("compile_s")
else:
    step = bc.make_step(n, n, precision)
    t0 = time.time()
    val, grad = step(v0)
    jax.block_until_ready(grad)
    result = bc.measure(step, n * n, time.time() - t0, precision)
    result["aot"] = False

print(json.dumps(result))
"""

_ANSI = re.compile(r"\x1b\[[0-9;]*m")

attempts = []  # full record of every subprocess attempt
results = {}   # tag -> parsed worker result
T_START = time.time()
BUDGET = float(os.environ.get("BENCH_BUDGET", "2100"))


def remaining():
    return BUDGET - (time.time() - T_START)


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr)


def run_worker(tag, env_overrides, n, precision, mode, timeout):
    """``tag`` is the workload/manifest key; records are tagged mode-tag."""
    rec_tag = f"{mode}-{tag}"
    timeout = min(timeout, max(remaining() - 30.0, 1.0))
    if timeout < 45:
        # never spawn (and then have to kill) a TPU-attaching worker that
        # cannot finish — killing a tunnel-holding process wedges the TPU
        attempts.append({"tag": rec_tag, "rc": "skipped-budget",
                         "timeout_s": timeout})
        return None, "skipped (budget)"
    env = dict(os.environ)
    env.update(env_overrides)
    cmd = [sys.executable, "-c", WORKER % {"repo": REPO},
           tag, str(n), precision, mode]
    rec = {"tag": rec_tag, "n": n, "precision": precision, "mode": mode,
           "timeout_s": timeout, "env_overrides": env_overrides,
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


def write_detail(summary):
    try:
        with open(DETAIL_PATH, "w") as fh:
            json.dump({"summary": summary, "attempts": attempts}, fh, indent=1)
    except OSError as e:
        log(f"could not write {DETAIL_PATH}: {e}")


def headline():
    """Best result so far -> the one-line JSON contract."""
    tpu = {t: r for t, r in results.items()
           if r.get("backend") in ("tpu", "axon")}
    pool = tpu or results
    best_tag = None
    for pref in ("pallas", "f64", "df32"):
        cands = {t: r for t, r in pool.items() if r["precision"] == pref}
        if cands:
            best_tag = max(cands, key=lambda t: cands[t]["rays_per_s"])
            break
    if best_tag is None:
        return {"metric": "akb_rays_per_s_fwd_bwd", "value": 0.0,
                "unit": "rays/s/chip", "vs_baseline": 0.0,
                "backend": "none"}
    best = pool[best_tag]

    def get(prec, key):
        cands = [r for r in pool.values() if r["precision"] == prec]
        if not cands:
            return None
        r = max(cands, key=lambda r: r["rays_per_s"])
        v = r.get(key)
        return round(v, 1) if key == "compile_s" and v is not None else v

    value = best["rays_per_s"]
    return {
        "metric": "akb_rays_per_s_fwd_bwd",
        "value": value,
        "unit": "rays/s/chip",
        "vs_baseline": value / BASELINE_RAYS_PER_S,
        "backend": best["backend"],
        "device": best.get("device"),
        "n_rays": best["n_rays"],
        "precision": best["precision"],
        "aot": best.get("aot", False),
        "compile_s": round(best["compile_s"], 1),
        "f64_rays_per_s": get("f64", "rays_per_s"),
        "f64_compile_s": get("f64", "compile_s"),
        "df32_rays_per_s": get("df32", "rays_per_s"),
        "df32_compile_s": get("df32", "compile_s"),
    }


def emit_and_exit(signum=None, frame=None):
    out = headline()
    write_detail(out)
    print(json.dumps(out))
    sys.stdout.flush()
    sys.exit(0 if out["value"] > 0 else 1)


def main():
    signal.signal(signal.SIGTERM, emit_and_exit)
    signal.signal(signal.SIGINT, emit_and_exit)

    tpu_env = {"XLA_FLAGS": ""}
    cpu_env = {"PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""}

    try:
        import bench_common as bc
        with open(bc.MANIFEST) as fh:
            manifest = json.load(fh)
        fp = bc.graph_fingerprint()
        head = bc.git_head()
        for tag, e in manifest.items():
            if e.get("graph_fingerprint") == fp:
                continue  # akbx + loss sources identical -> current build
            log(f"AOT {tag} was built at {e.get('git_head', '?')[:12]} "
                f"with a different graph fingerprint; HEAD is {head[:12]} "
                f"(STALE build — measured numbers may not reflect HEAD; "
                f"recorded in detail)")
            attempts.append({"tag": f"stale-{tag}",
                             "built_git_head": e.get("git_head"),
                             "head": head})
    except Exception as e:
        manifest = {}
        log(f"no AOT manifest ({e}); will cold-compile within budget")

    # --- AOT path: fast loads, fixed order: headline first ------------
    for tag, n, precision in (("pallas-2048", 2048, "pallas"),
                              ("f64-512", 512, "f64"),
                              ("df32-512", 512, "df32"),
                              ("pallas-512", 512, "pallas")):
        if tag not in manifest:
            continue
        if tag == "pallas-512" and "pallas-2048" in results:
            continue  # backup only needed if the 2048 load failed
        if remaining() < 120:
            log(f"budget exhausted before AOT {tag}")
            break
        res, err = run_worker(tag, tpu_env, n, precision, "aot",
                              timeout=420)
        if res is not None and res.get("backend") in ("tpu", "axon"):
            results[tag] = res
            log(f"aot {tag}: load={res['aot_load_s']:.1f}s "
                f"step={res['step_s']*1e3:.2f}ms "
                f"rays/s={res['rays_per_s']:.3e}")
        else:
            log(f"aot {tag} failed: {err}")

    # --- cold fallback: only what fits the remaining budget ------------
    have_tpu = any(r.get("backend") in ("tpu", "axon")
                   for r in results.values())
    if not have_tpu:
        probe, err = run_worker("probe-df32-128", tpu_env, 128, "df32",
                                "jit", timeout=min(420.0, remaining() - 60))
        tpu_alive = probe is not None and probe.get("backend") in ("tpu",
                                                                   "axon")
        if tpu_alive:
            log(f"probe ok: compile={probe['compile_s']:.1f}s")
            # pallas-512 cold needs ~650 s, f64-512 ~550 s, df32-512 ~100 s
            plan = [("pallas-512", 512, "pallas", 900),
                    ("f64-512", 512, "f64", 800),
                    ("df32-512", 512, "df32", 300)]
            for tag, n, precision, need in plan:
                if tag in results or remaining() < need:
                    continue
                res, err = run_worker(tag, tpu_env, n, precision,
                                      "jit", timeout=need)
                if res is not None:
                    results[tag] = res
                    log(f"jit {tag}: compile={res['compile_s']:.1f}s "
                        f"rays/s={res['rays_per_s']:.3e}")
                else:
                    log(f"jit {tag} failed: {err}")
        else:
            log(f"TPU probe failed ({err}); falling back to CPU")
            for tag, precision in (("cpu-pallas", "pallas"),
                                   ("cpu-f64", "f64"),
                                   ("cpu-df32", "df32")):
                if remaining() < 90:
                    break
                res, err = run_worker(tag, cpu_env, 128, precision, "jit",
                                      timeout=600)
                if res is not None:
                    results[tag] = res
                else:
                    log(f"{tag} failed: {err}")

    for tag, rec in sorted(results.items()):
        log(f"{tag}: backend={rec['backend']} n_rays={rec['n_rays']} "
            f"compile={rec['compile_s']:.1f}s "
            f"step={rec['step_s']*1e3:.2f}ms "
            f"rays/s={rec['rays_per_s']:.3e} loss={rec['loss']:.3e}")
    emit_and_exit()


if __name__ == "__main__":
    main()
