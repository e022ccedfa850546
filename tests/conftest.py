"""Test harness config: force CPU with 8 fake devices (SURVEY.md §4.5).

Must run before any ``import jax`` — pytest imports conftest first, so the
env vars land in time. NOTE: under the axon TPU plugin, ``JAX_PLATFORMS``
alone is NOT honored (verified 2026-08-16: devices stayed TPU); the
combination below is. Real-TPU behavior is covered by bench.py, not tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
