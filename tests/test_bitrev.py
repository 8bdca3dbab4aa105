"""ops/bitrev: factored bit-reversal must equal the direct gather on
every axis/size split, including the O(sqrt N) factored regime."""

import numpy as np
import pytest

from plonky2_tpu.ops.bitrev import bitrev_axis, _DIRECT_LOG
from plonky2_tpu.utils.bits import reverse_index_bits_perm


@pytest.mark.parametrize("k", [0, 1, 3, 8, _DIRECT_LOG + 1, _DIRECT_LOG + 2])
@pytest.mark.parametrize("axis", [0, -1])
def test_matches_direct_permutation(k, axis):
    n = 1 << k
    rng = np.random.default_rng(k)
    if axis == -1:
        x = rng.integers(0, 1 << 32, size=(3, n), dtype=np.uint32)
    else:
        x = rng.integers(0, 1 << 32, size=(n, 3), dtype=np.uint32)
    got = np.asarray(bitrev_axis(x, axis=axis))
    want = np.take(x, reverse_index_bits_perm(n), axis=axis)
    assert np.array_equal(got, want)


def test_involution():
    n = 1 << (_DIRECT_LOG + 1)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 32, size=(n,), dtype=np.uint32)
    assert np.array_equal(np.asarray(bitrev_axis(bitrev_axis(x))), x)
