"""NTT/LDE tests vs naive polynomial evaluation (mirrors field/src/fft.rs tests)."""

import jax
import numpy as np

from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.ops import gf, ntt

jfft = jax.jit(ntt.fft)
jifft = jax.jit(ntt.ifft)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, gl.P, size=shape, dtype=np.uint64)


def test_fft_matches_naive():
    coeffs = _rand((3, 32), seed=1)
    vals = gf.to_u64(jfft(gf.from_u64(coeffs)))
    points = gl.two_adic_subgroup(5)
    expected = ntt.naive_eval_np(coeffs, points)
    np.testing.assert_array_equal(vals, expected)


def test_ifft_inverts_fft():
    coeffs = _rand((4, 64), seed=2)
    d = gf.from_u64(coeffs)
    back = gf.to_u64(jifft(jfft(d)))
    np.testing.assert_array_equal(back, coeffs)


def test_coset_fft():
    coeffs = _rand((2, 16), seed=3)
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    vals = gf.to_u64(jax.jit(ntt.coset_fft)(gf.from_u64(coeffs)))
    points = gl.np_mul(np.uint64(shift), gl.two_adic_subgroup(4))
    np.testing.assert_array_equal(vals, ntt.naive_eval_np(coeffs, points))
    # round trip
    back = gf.to_u64(jax.jit(ntt.coset_ifft)(gf.from_u64(vals)))
    np.testing.assert_array_equal(back, coeffs)


def test_lde_onto_coset():
    coeffs = _rand((2, 8), seed=4)
    rate_bits = 3
    out = gf.to_u64(jax.jit(lambda c: ntt.lde_onto_coset(c, rate_bits))(gf.from_u64(coeffs)))
    points = gl.np_mul(
        np.uint64(gl.MULTIPLICATIVE_GROUP_GENERATOR), gl.two_adic_subgroup(6)
    )
    np.testing.assert_array_equal(out, ntt.naive_eval_np(coeffs, points))
