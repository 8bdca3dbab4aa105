"""Host Goldilocks field tests: edge cases around P/EPSILON, numpy-vs-exact
agreement, subgroup/root-of-unity structure, extension field laws.

Mirrors the reference's macro test suites (field/src/field_testing.rs,
prime_field_testing.rs)."""

import numpy as np
import pytest

from plonky2_tpu.field import extension as ge
from plonky2_tpu.field import goldilocks as gl

EDGE = [
    0,
    1,
    2,
    gl.EPSILON - 1,
    gl.EPSILON,
    gl.EPSILON + 1,
    1 << 32,
    (1 << 32) + 1,
    gl.P - 2,
    gl.P - 1,
]


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, gl.P, size=n, dtype=np.uint64)


def test_scalar_add_sub_mul_edges():
    for a in EDGE:
        for b in EDGE:
            assert gl.gadd(a, b) == (a + b) % gl.P
            assert gl.gsub(a, b) == (a - b) % gl.P
            assert gl.gmul(a, b) == (a * b) % gl.P


def test_np_matches_exact_on_edges():
    a = np.array([x for x in EDGE for _ in EDGE], dtype=np.uint64)
    b = np.array([y for _ in EDGE for y in EDGE], dtype=np.uint64)
    exp_mul = np.array(
        [(int(x) * int(y)) % gl.P for x, y in zip(a, b)], dtype=np.uint64
    )
    exp_add = np.array(
        [(int(x) + int(y)) % gl.P for x, y in zip(a, b)], dtype=np.uint64
    )
    exp_sub = np.array(
        [(int(x) - int(y)) % gl.P for x, y in zip(a, b)], dtype=np.uint64
    )
    np.testing.assert_array_equal(gl.np_mul(a, b), exp_mul)
    np.testing.assert_array_equal(gl.np_add(a, b), exp_add)
    np.testing.assert_array_equal(gl.np_sub(a, b), exp_sub)


def test_np_matches_exact_random():
    a, b = _rand(4096, 1), _rand(4096, 2)
    exp = np.array([(int(x) * int(y)) % gl.P for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(gl.np_mul(a, b), exp)


def test_inverse():
    for a in EDGE[1:]:
        assert gl.gmul(a, gl.ginv(a)) == 1
    a = _rand(257, 3)
    a[a == 0] = 1
    inv = gl.np_batch_inverse(a)
    np.testing.assert_array_equal(gl.np_mul(a, inv), np.ones_like(a))
    np.testing.assert_array_equal(inv, gl.np_inv(a))


def test_powers_and_exp():
    p = gl.np_powers(3, 100)
    assert int(p[0]) == 1
    for i in range(1, 100):
        assert int(p[i]) == pow(3, i, gl.P)
    np.testing.assert_array_equal(
        gl.np_exp(np.array([3, 5], dtype=np.uint64), 1234567),
        np.array([pow(3, 1234567, gl.P), pow(5, 1234567, gl.P)], dtype=np.uint64),
    )


def test_roots_of_unity():
    for n_log in [0, 1, 4, 10]:
        g = gl.primitive_root_of_unity(n_log)
        assert gl.gexp(g, 1 << n_log) == 1
        if n_log > 0:
            assert gl.gexp(g, 1 << (n_log - 1)) == gl.P - 1  # order exactly 2^n_log
    sub = gl.two_adic_subgroup(3)
    assert len(set(int(x) for x in sub)) == 8
    assert int(sub[0]) == 1


def test_multiplicative_generator_order():
    # g^((P-1)/2) must be -1 for a generator
    assert gl.gexp(gl.MULTIPLICATIVE_GROUP_GENERATOR, (gl.P - 1) // 2) == gl.P - 1
    # POWER_OF_TWO_GENERATOR = g^((P-1) >> 32)
    assert (
        gl.gexp(gl.MULTIPLICATIVE_GROUP_GENERATOR, (gl.P - 1) >> 32)
        == gl.POWER_OF_TWO_GENERATOR
    )


@pytest.mark.parametrize("d", [2, 4, 5])
def test_extension_field_laws(d):
    rng = np.random.default_rng(42 + d)

    def rand_ext():
        return tuple(int(x) for x in rng.integers(0, gl.P, size=d, dtype=np.uint64))

    for _ in range(10):
        a, b, c = rand_ext(), rand_ext(), rand_ext()
        # commutativity / associativity / distributivity
        assert ge.ext_mul(a, b) == ge.ext_mul(b, a)
        assert ge.ext_mul(ge.ext_mul(a, b), c) == ge.ext_mul(a, ge.ext_mul(b, c))
        assert ge.ext_mul(a, ge.ext_add(b, c)) == ge.ext_add(
            ge.ext_mul(a, b), ge.ext_mul(a, c)
        )
        # inverse
        assert ge.ext_mul(a, ge.ext_inv(a)) == ge.ext_one(d)
        # frobenius is the p-power map
        assert ge.frobenius(a) == ge.ext_exp(a, gl.P)


@pytest.mark.parametrize("d", [2, 4, 5])
def test_dth_root_consistency(d):
    assert ge.DTH_ROOT[d] == gl.gexp(ge.W[d], (gl.P - 1) // d)


def test_ext2_w_nonresidue():
    # x^2 - 7 irreducible <=> 7 is a quadratic nonresidue
    assert gl.gexp(7, (gl.P - 1) // 2) == gl.P - 1
