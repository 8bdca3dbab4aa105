"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set env vars before the first ``import jax`` anywhere in the test
session; pytest imports conftest.py first, so this is the right place.
"""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (the real
# TPU tunnel), which must not be used for unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the prover compiles many per-shape kernels;
# cache them across test sessions. Must be set via jax.config (env vars are
# not picked up for the CPU backend in this jax version).
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
