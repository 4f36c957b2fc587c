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

# The ambient axon sitecustomize registers a remote-TPU platform at
# interpreter start and programmatically sets jax_platforms="axon,cpu",
# overriding the env var — force CPU via the config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the planners' jitted MPC steps are large graphs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dlp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
