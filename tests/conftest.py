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
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's fusion pass miscompiles certain fused kernels on this host
# into infinite loops (one thread spins forever; reproduced 2026-08-16
# on a 1-vCPU VM with jaxlib 0.9). The TPU backend is unaffected. Tests
# run correctness, not perf, so disable the pass wholesale.
if "xla_disable_hlo_passes" not in flags:
    flags += " --xla_disable_hlo_passes=fusion"
os.environ["XLA_FLAGS"] = flags.strip()

# The ambient environment PRELOADS jax via a PYTHONPATH sitecustomize
# (the axon TPU plugin), which latches JAX_PLATFORMS at import — the env
# var above is then too late and tests silently run on the single real
# TPU (mesh fixtures degrade to 1 device). Force the backend through the
# config API, which works until first backend use.
import sys

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the prover compiles many per-shape kernels;
# cache them across test sessions. Must be set via jax.config (env vars are
# not picked up for the CPU backend in this jax version).
# NOTE: the persistent compilation cache is intentionally NOT enabled:
# cache read-back deadlocks/crawls on this host (machine-feature
# mismatch in the CPU AOT loader).


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running e2e tests")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if config.getoption("-m"):
        return
    skip_slow = _pytest.mark.skip(reason="slow; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
