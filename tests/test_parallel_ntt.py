"""Multi-chip six-step NTT + sharded Merkle cap on the 8-device CPU mesh
(SURVEY §5.7-5.8). Sizes are small: XLA:CPU compiles the 8-shard limb
graphs very slowly on this host; TPU compiles are fine."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.ops import gf, merkle, ntt
from plonky2_tpu.parallel.ntt import (
    coset_ifft_tables,
    sharded_merkle_cap,
    six_step_coset_ifft_batch,
    six_step_fft,
    six_step_ifft,
)


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


def test_six_step_coset_ifft_batch_matches_single_chip(mesh):
    """The quotient pipeline's domain-sharded coset-IFFT (invoked inside a
    jitted program via shard_map) agrees bit-exactly with the single-chip
    coset_ifft, including the folded 1/N and shift^-k scales."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(7)
    m, n_log = 2, 8
    n = 1 << n_log
    q = rng.integers(0, gl.P, size=(m, n), dtype=np.uint64)
    qg = gf.from_u64(q)
    want = np.asarray(gf.to_u64(ntt.coset_ifft(qg)))

    tabs = coset_ifft_tables(n_log, gl.MULTIPLICATIVE_GROUP_GENERATOR)
    tw_sh = NamedSharding(mesh, P("x", None))
    tw = (
        jax.device_put(jnp.asarray(tabs[0]), tw_sh),
        jax.device_put(jnp.asarray(tabs[1]), tw_sh),
    )
    small = [jnp.asarray(t) for t in tabs[2:]]
    cols = NamedSharding(mesh, P(None, "x"))
    qs = (jax.device_put(qg[0], cols), jax.device_put(qg[1], cols))

    @jax.jit
    def f(qq, tables):
        return six_step_coset_ifft_batch(qq, tables, mesh, "x")

    got = np.asarray(gf.to_u64(f(qs, (tw[0], tw[1], *small))))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("cap_height", [0, 1, 2, 3])
def test_sharded_merkle_cap_matches_device_tree(mesh, cap_height):
    """Every (cap_height, d) combination — including cap < log2(d), which
    crosses shard boundaries and reduces over an all_gather."""
    rng = np.random.default_rng(2)
    leaves = rng.integers(0, gl.P, size=(1 << 7, 4), dtype=np.uint64)
    lg = gf.from_u64(leaves)
    want = merkle.build_merkle_tree(lg, cap_height).cap_u64()
    got = np.asarray(gf.to_u64(sharded_merkle_cap(lg, mesh, cap_height)))
    assert np.array_equal(got.reshape(-1, 4), want)


@pytest.mark.slow
def test_sharded_merkle_cap_large(mesh):
    """Sharding-is-load-bearing size: 2^16 leaves, multi-poly rows."""
    rng = np.random.default_rng(3)
    leaves = rng.integers(0, gl.P, size=(1 << 16, 8), dtype=np.uint64)
    lg = gf.from_u64(leaves)
    want = merkle.build_merkle_tree(lg, 4).cap_u64()
    got = np.asarray(gf.to_u64(sharded_merkle_cap(lg, mesh, 4)))
    assert np.array_equal(got.reshape(-1, 4), want)
