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
