"""Poseidon tests: reference test vectors (core/src/poseidon_goldilocks.rs
test_vectors), host<->device agreement, sponge semantics."""

import jax
import numpy as np

from plonky2_tpu.field.goldilocks import P
from plonky2_tpu.hash import poseidon as hp
from plonky2_tpu.ops import gf
from plonky2_tpu.ops import poseidon as dp

# (input, expected) pairs from the reference implementation's test suite
# (expected outputs generated with the hadeshash reference code).
VECTORS = [
    (
        [0] * 12,
        [
            0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4, 0xC71603F33A1144CA,
            0xD7709673896996DC, 0x46A84E87642F44ED, 0xD032648251EE0B3C, 0x1C687363B207DF62,
            0xDF8565563E8045FE, 0x40F5B37FF4254DAE, 0xD070F637B431067C, 0x1792B1C4342109D7,
        ],
    ),
    (
        list(range(12)),
        [
            0xD64E1E3EFC5B8E9E, 0x53666633020AAA47, 0xD40285597C6A8825, 0x613A4F81E81231D2,
            0x414754BFEBD051F0, 0xCB1F8980294A023F, 0x6EB2A9E4D54A9D0F, 0x1902BC3AF467E056,
            0xF045D5EAFDC6021F, 0xE4150F77CAAA3BE5, 0xC9BFD01D39B50CCE, 0x5C0A27FCB0E1459B,
        ],
    ),
    (
        [P - 1] * 12,
        [
            0xBE0085CFC57A8357, 0xD95AF71847D05C09, 0xCF55A13D33C1C953, 0x95803A74F4530E82,
            0xFCD99EB30A135DF1, 0xE095905E913A3029, 0xDE0392461B42919B, 0x7D3260E24E81D031,
            0x10D3D0465D9DEAA0, 0xA87571083DFC2A47, 0xE18263681E9958F8, 0xE28E96F1AE5E60D3,
        ],
    ),
    (
        [
            0x8CCBBBEA4FE5D2B7, 0xC2AF59EE9EC49970, 0x90F7E1A9E658446A, 0xDCC0630A3AB8B1B8,
            0x7FF8256BCA20588C, 0x5D99A7CA0C44ECFB, 0x48452B17A70FBEE3, 0xEB09D654690B6C88,
            0x4A55D3A39C676A88, 0xC0407A38D2285139, 0xA234BAC9356386D1, 0xE1633F2BAD98A52F,
        ],
        [
            0xA89280105650C4EC, 0xAB542D53860D12ED, 0x5704148E9CCAB94F, 0xD3A826D4B62DA9F5,
            0x8A7A6CA87892574F, 0xC7017E1CAD1A674E, 0x1F06668922318E34, 0xA3B203BC8102676F,
            0xFCC781B0CE382BF2, 0x934C69FF3ED14BA5, 0x504688A5996E8F13, 0x401F3F2ED524A2BA,
        ],
    ),
]


def test_host_permutation_vectors():
    for inp, expected in VECTORS:
        assert hp.permute(inp) == [x % P for x in expected]


def test_device_permutation_vectors():
    inp = np.array([v[0] for v in VECTORS], dtype=np.uint64)
    expected = np.array([v[1] for v in VECTORS], dtype=np.uint64)
    out = gf.to_u64(jax.jit(dp.permute)(gf.from_u64(inp)))
    np.testing.assert_array_equal(out, expected)


def test_device_vs_host_random():
    rng = np.random.default_rng(5)
    states = rng.integers(0, P, size=(17, 12), dtype=np.uint64)
    out = gf.to_u64(jax.jit(dp.permute)(gf.from_u64(states)))
    for i in range(17):
        assert list(out[i]) == hp.permute([int(x) for x in states[i]])


def test_sponge_host_vs_device():
    rng = np.random.default_rng(6)
    for w in [4, 8, 9, 16, 20]:
        leaves = rng.integers(0, P, size=(5, w), dtype=np.uint64)
        d = gf.to_u64(jax.jit(dp.hash_leaf)(gf.from_u64(leaves)))
        for i in range(5):
            assert tuple(int(x) for x in d[i]) == hp.hash_leaf(
                [int(x) for x in leaves[i]]
            )
        h = gf.to_u64(jax.jit(dp.hash_no_pad_batch)(gf.from_u64(leaves)))
        for i in range(5):
            assert tuple(int(x) for x in h[i]) == hp.hash_no_pad(
                [int(x) for x in leaves[i]]
            )


def test_two_to_one_host_vs_device():
    rng = np.random.default_rng(8)
    l = rng.integers(0, P, size=(7, 4), dtype=np.uint64)
    r = rng.integers(0, P, size=(7, 4), dtype=np.uint64)
    d = gf.to_u64(jax.jit(dp.two_to_one)(gf.from_u64(l), gf.from_u64(r)))
    for i in range(7):
        assert tuple(int(x) for x in d[i]) == hp.two_to_one(
            [int(x) for x in l[i]], [int(x) for x in r[i]]
        )


def test_hash_leaf_domain_separation():
    # hash_leaf([a..h]) != two_to_one([a..d],[e..h])
    vals = list(range(1, 9))
    assert hp.hash_leaf(vals) != hp.two_to_one(vals[:4], vals[4:])
    # and differs from plain hash_no_pad
    assert hp.hash_leaf(vals) != hp.hash_no_pad(vals)
