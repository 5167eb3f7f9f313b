"""Test configuration.

The CI/dev image force-registers a remote TPU ('axon') backend that ignores
JAX_PLATFORMS, and per-op dispatch to it is slow (remote compiles).  Tests
pin the default device to the host CPU backend — fast, deterministic f64 —
and use the 8-virtual-device CPU mesh for multi-chip sharding logic
(SURVEY.md §4).  TPU-specific behavior (scalar-transcendental precision,
Pallas kernels) is exercised by dedicated tests/benches on real hardware.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("MPLBACKEND", "Agg")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# persistent compile cache: the AKB engine graphs take 30-300 s each to
# compile on the 2-core CI host and identical HLO recurs across tests and
# sessions; the cache is keyed by HLO fingerprint (safe) and cuts a cold
# full-suite run by many minutes
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_akbx_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import sys  # noqa: E402

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


if reference_available() and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
