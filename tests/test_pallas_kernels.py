"""Pallas kernels vs the XLA reference path (interpret mode on CPU)."""

import numpy as np

from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.ops import gf, ntt
from plonky2_tpu.ops import pallas_kernels as pk


def test_pallas_mul_matches_gf():
    rng = np.random.default_rng(0)
    a = rng.integers(0, (1 << 64) - 1, size=(8, 128), dtype=np.uint64)
    b = rng.integers(0, (1 << 64) - 1, size=(8, 128), dtype=np.uint64)
    want = gl.np_mul(gl.np_canonicalize(a), gl.np_canonicalize(b))
    got = gf.to_u64(pk.mul(gf.from_u64(a), gf.from_u64(b), True))
    want2 = gf.to_u64(gf.mul(gf.from_u64(a), gf.from_u64(b)))
    assert np.array_equal(got, want2)
    assert np.array_equal(gl.np_canonicalize(got), want)


def test_pallas_fft_matches_ntt():
    rng = np.random.default_rng(1)
    coeffs = rng.integers(0, gl.P, size=(4, 1 << 8), dtype=np.uint64)
    cg = gf.from_u64(coeffs)
    want = np.asarray(gf.to_u64(ntt.fft(cg)))
    got = np.asarray(gf.to_u64(pk.fft(cg, interpret=True)))
    assert np.array_equal(got, want)


def test_pallas_ifft_roundtrip():
    rng = np.random.default_rng(2)
    coeffs = rng.integers(0, gl.P, size=(2, 1 << 7), dtype=np.uint64)
    cg = gf.from_u64(coeffs)
    vals = pk.fft(cg, interpret=True)
    back = np.asarray(gf.to_u64(pk.ifft(vals, interpret=True)))
    assert np.array_equal(back, coeffs)


def test_pallas_fft_large_rows_stage_split(monkeypatch):
    """Rows past MAX_FUSED_LOG take the stage-split hybrid (fused head
    within 2^b blocks + XLA cross-block tail) — previously unsupported."""
    import plonky2_tpu.ops.pallas_kernels as pk
    from plonky2_tpu.field import goldilocks as gl
    from plonky2_tpu.ops import gf, ntt

    monkeypatch.setattr(pk, "MAX_FUSED_LOG", 6)  # exercise the split cheaply
    rng = np.random.default_rng(7)
    c = rng.integers(0, gl.P, size=(3, 1 << 9), dtype=np.uint64)
    cg = gf.from_u64(c)
    got = np.asarray(gf.to_u64(pk.fft(cg, interpret=True)))
    want = np.asarray(gf.to_u64(ntt.fft_jit(cg)))
    assert np.array_equal(got, want)
    # inverse roundtrip through the hybrid too
    back = np.asarray(gf.to_u64(pk.ifft(pk.fft(cg, interpret=True), interpret=True)))
    assert np.array_equal(back, c)


def _rand_limbs(rng, shape):
    v = rng.integers(0, gl.P, size=shape, dtype=np.uint64)
    return v, gf.from_u64(v)


import pytest as _pytest


@_pytest.mark.slow
def test_pallas_poseidon_matches_xla_interpret():
    """Fused-VMEM Poseidon kernel == XLA permutation, bit-exact.

    Interpret mode on CPU with a tiny batch (slow: ~9 min of interpret
    overhead on a 1-vCPU host); TPU runs are cross-checked against the
    host reference vectors by the kernel bench suite."""
    import plonky2_tpu.ops.poseidon as pos
    from plonky2_tpu.ops import poseidon_pallas as pp

    rng = np.random.default_rng(11)
    v, st = _rand_limbs(rng, (12, 256))
    want = [np.asarray(p) for p in pos.permute_t(st)]  # XLA path (CPU: no pallas)
    got = [np.asarray(p) for p in pp.permute_t(st, interpret=True, block_rows=8)]
    assert np.array_equal(got[0], want[0]) and np.array_equal(got[1], want[1])


@_pytest.mark.slow
def test_pallas_poseidon_sponge_matches_xla_interpret():
    import plonky2_tpu.ops.poseidon as pos
    from plonky2_tpu.ops import poseidon_pallas as pp

    rng = np.random.default_rng(12)
    w = 13  # one full absorb + a 5-lane partial block
    v, t = _rand_limbs(rng, (w, 256))
    want = [np.asarray(p) for p in pos._sponge_t(t[0], t[1], w + 1)]
    got = [np.asarray(p) for p in pp.sponge_t(t[0], t[1], w + 1, interpret=True)]
    assert np.array_equal(got[0], want[0]) and np.array_equal(got[1], want[1])


def test_mesh_shardmap_pallas_hash_bit_identical(monkeypatch):
    """Under a prover mesh, Poseidon hashing routes through shard_map +
    shard-local pallas calls (ops/poseidon._mesh_pallas) and must match
    the XLA path bit for bit. Interpret mode exercises the wiring on the
    CPU mesh; the kernel itself is Mosaic-compiled on real TPU."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (see conftest)")
    import numpy as np

    from plonky2_tpu.ops import gf
    from plonky2_tpu.ops import poseidon as dp
    from plonky2_tpu.parallel import context as pctx

    rng = np.random.default_rng(11)
    b = 8 * 2048  # per-shard batch == _PALLAS_MIN_B: mesh branch fires
    rows = rng.integers(0, gl.P, size=(b, 7), dtype=np.uint64)
    leaves = gf.from_u64(rows)
    monkeypatch.setenv("PLONKY2_TPU_PALLAS", "0")
    want = np.asarray(gf.to_u64(dp.hash_leaf(leaves)))
    monkeypatch.setenv("PLONKY2_TPU_PALLAS", "interpret")
    mesh = pctx.make_prover_mesh(8)
    try:
        pctx.set_mesh(mesh)
        assert dp._mesh_pallas(b) is not None
        got = np.asarray(gf.to_u64(dp.hash_leaf(leaves)))
    finally:
        pctx.set_mesh(None)
    assert np.array_equal(got, want)
