"""Multi-chip six-step NTT + sharded Merkle cap on the 8-device CPU mesh
(SURVEY §5.7-5.8). Sizes are small: XLA:CPU compiles the 8-shard limb
graphs very slowly on this host; TPU compiles are fine."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.ops import gf, merkle, ntt
from plonky2_tpu.parallel.ntt import sharded_merkle_cap, six_step_fft, six_step_ifft


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:4])
    return Mesh(devices, ("x",))


def test_six_step_matches_single_chip(mesh):
    rng = np.random.default_rng(0)
    n = 1 << 6
    x = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    xg = gf.from_u64(x)
    want = np.asarray(gf.to_u64(ntt.fft((xg[0][None, :], xg[1][None, :]))))[0]
    got = np.asarray(gf.to_u64(six_step_fft(xg, mesh)))
    assert np.array_equal(got, want)


def test_six_step_ifft_roundtrip(mesh):
    rng = np.random.default_rng(1)
    n = 1 << 6
    x = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    xg = gf.from_u64(x)
    vals = six_step_fft(xg, mesh)
    back = np.asarray(gf.to_u64(six_step_ifft(vals, mesh)))
    assert np.array_equal(back, x)


def test_sharded_merkle_cap_matches_device_tree(mesh):
    rng = np.random.default_rng(2)
    leaves = rng.integers(0, gl.P, size=(1 << 7, 4), dtype=np.uint64)
    lg = gf.from_u64(leaves)
    cap_height = 3
    want = merkle.build_merkle_tree(lg, cap_height).cap_u64()
    got = np.asarray(gf.to_u64(sharded_merkle_cap(lg, mesh, cap_height)))
    assert np.array_equal(got.reshape(-1, 4), want)
