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
