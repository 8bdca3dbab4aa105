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
# cache them across test sessions.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")
