"""Device (u32-limb jnp) Goldilocks kernels vs the exact host implementation."""

import jax
import numpy as np

from plonky2_tpu.field import extension as ge
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.ops import gf

jadd = jax.jit(gf.add)
jsub = jax.jit(gf.sub)
jmul = jax.jit(gf.mul)
jneg = jax.jit(gf.neg)
jinv = jax.jit(gf.inv)
jbatch_inv = jax.jit(gf.batch_inverse)
jext2_mul = jax.jit(gf.ext2_mul)

EDGE = np.array(
    [
        0,
        1,
        2,
        gl.EPSILON - 1,
        gl.EPSILON,
        gl.EPSILON + 1,
        1 << 32,
        (1 << 32) + 1,
        (1 << 63),
        gl.P - 2,
        gl.P - 1,
    ],
    dtype=np.uint64,
)


def _pairs():
    a = np.array([x for x in EDGE for _ in EDGE], dtype=np.uint64)
    b = np.array([y for _ in EDGE for y in EDGE], dtype=np.uint64)
    rng = np.random.default_rng(7)
    ra = rng.integers(0, gl.P, size=2048, dtype=np.uint64)
    rb = rng.integers(0, gl.P, size=2048, dtype=np.uint64)
    return np.concatenate([a, ra]), np.concatenate([b, rb])


def test_roundtrip():
    a, _ = _pairs()
    np.testing.assert_array_equal(gf.to_u64(gf.from_u64(a)), a)


def test_add_sub_mul_neg():
    a, b = _pairs()
    da, db = gf.from_u64(a), gf.from_u64(b)
    np.testing.assert_array_equal(gf.to_u64(jadd(da, db)), gl.np_add(a, b))
    np.testing.assert_array_equal(gf.to_u64(jsub(da, db)), gl.np_sub(a, b))
    np.testing.assert_array_equal(gf.to_u64(jmul(da, db)), gl.np_mul(a, b))
    np.testing.assert_array_equal(gf.to_u64(jneg(da)), gl.np_neg(a))


def test_exp_inv():
    a, _ = _pairs()
    a = a[a != 0][:64]
    da = gf.from_u64(a)
    np.testing.assert_array_equal(gf.to_u64(jax.jit(lambda x: gf.exp_const(x, 7))(da)), gl.np_exp(a, 7))
    np.testing.assert_array_equal(gf.to_u64(jinv(da)), gl.np_inv(a))


def test_batch_inverse():
    rng = np.random.default_rng(11)
    a = rng.integers(1, gl.P, size=(16, 33), dtype=np.uint64)
    inv = gf.to_u64(jbatch_inv(gf.from_u64(a)))
    np.testing.assert_array_equal(gl.np_mul(a, inv), np.ones_like(a))


def test_mul_const():
    a, _ = _pairs()
    da = gf.from_u64(a)
    for c in [0, 1, 7, gl.P - 1, 123456789123456789]:
        np.testing.assert_array_equal(
            gf.to_u64(jax.jit(lambda x: gf.mul_const(x, c))(da)),
            gl.np_mul(a, np.uint64(c % gl.P)),
        )


def test_ext2_mul():
    rng = np.random.default_rng(13)
    a = rng.integers(0, gl.P, size=(100, 2), dtype=np.uint64)
    b = rng.integers(0, gl.P, size=(100, 2), dtype=np.uint64)
    got = gf.to_u64(jext2_mul(gf.from_u64(a), gf.from_u64(b)))
    for i in range(100):
        exp = ge.ext_mul(tuple(int(x) for x in a[i]), tuple(int(x) for x in b[i]))
        assert tuple(int(x) for x in got[i]) == exp


def test_sum_mod_p_long_axis():
    """Axes >= 2^16 reduce hierarchically (chunked 16-bit half-plane
    sums) — regression for the degree-2^16 openings evaluation."""
    rng = np.random.default_rng(11)
    n = (1 << 16) + 7
    x = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    want = int(np.sum(x.astype(object)) % gl.P)
    got = int(np.asarray(gf.to_u64(gf.sum_mod_p(gf.from_u64(x)))))
    assert got == want
