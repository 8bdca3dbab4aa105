"""Keccak + secp256k1 field + extension-field coverage (reference:
core/src/keccak.rs, field/src/secp256k1_*.rs, field/src/extension/)."""

from plonky2_tpu.field import extension as ge
from plonky2_tpu.field.goldilocks import P
from plonky2_tpu.field.secp256k1 import Secp256K1Base, Secp256K1Scalar
from plonky2_tpu.hash import keccak as kk


def test_keccak256_vectors():
    assert (
        kk.keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        kk.keccak256(b"The quick brown fox jumps over the lazy dog").hex()
        == "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15"
    )


def test_keccak_permutation_deterministic():
    s = list(range(12))
    out1 = kk.keccak_permutation(s)
    out2 = kk.keccak_permutation(s)
    assert out1 == out2
    assert all(0 <= x < P for x in out1)
    assert out1 != s


def test_secp256k1_fields():
    for F in (Secp256K1Base, Secp256K1Scalar):
        a = F(123456789)
        b = F(987654321)
        assert (a * b).v == (123456789 * 987654321) % F.ORDER
        assert (a * a.inverse()).v == 1
        g = F.two_adic_subgroup_generator()
        assert g.exp(1 << F.TWO_ADICITY).v == 1
        assert g.exp(1 << (F.TWO_ADICITY - 1)).v != 1


def test_quartic_quintic_extensions():
    import random

    rnd = random.Random(9)
    for d in (2, 4, 5):
        a = tuple(rnd.randrange(P) for _ in range(d))
        b = tuple(rnd.randrange(P) for _ in range(d))
        ab = ge.ext_mul(a, b)
        ba = ge.ext_mul(b, a)
        assert ab == ba
        inv = ge.ext_inv(a)
        assert ge.ext_mul(a, inv) == ge.ext_one(d)
        # frobenius is a field automorphism of order d
        f = a
        for _ in range(d):
            f = ge.frobenius(f)
        assert f == a
