"""Tracing/profiling layer (SURVEY §5.1): jax profiler traces, named
phase annotations, roofline accounting."""

import os

import numpy as np

from plonky2_tpu.utils import profiling as prof


def test_roofline_accounting():
    # 1 GB moved in 2 ms -> 500 GB/s, SoL(bw) = 1e9/819e9 s
    r = prof.roofline("x", seconds=2e-3, bytes_moved=1 << 30, u32_ops=1000)
    assert abs(r.achieved_gbs - (1 << 30) / 2e-3 / 1e9) < 1e-6
    assert r.bound == "bandwidth"
    assert 0 < r.pct_sol < 100
    d = r.as_dict()
    assert d["kernel"] == "x" and "pct_sol" in d
    # compute-bound case
    r2 = prof.roofline("y", seconds=1e-3, bytes_moved=8, u32_ops=10**12)
    assert r2.bound == "compute"


def test_annotate_and_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    log_dir = str(tmp_path / "trace")
    with prof.trace(log_dir):
        with prof.annotate("test/phase"):
            jax.block_until_ready(jnp.arange(8) * 2)
    # an XPlane/profile artifact must exist
    found = []
    for root, _dirs, files in os.walk(log_dir):
        found += files
    assert found, "profiler trace wrote no files"


def test_timed_device_returns_seconds():
    import jax.numpy as jnp

    t = prof.timed_device(lambda x: x + 1, jnp.arange(128), warmup=1, iters=2)
    assert 0 < t < 60
