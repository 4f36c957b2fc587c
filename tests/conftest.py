"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host CPU devices (the collectives are deterministic sums, so
results must match single-device runs bitwise — SURVEY.md §4e).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may pin a TPU tunnel platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", True)
