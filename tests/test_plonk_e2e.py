"""End-to-end PLONK prove + verify (fibonacci, no public inputs yet —
the PI-hash path needs PoseidonGate, next milestone)."""

import numpy as np
import pytest

from plonky2_tpu.models.fibonacci import build_fibonacci, fib_value
from plonky2_tpu.plonk import verifier as pv


def test_fibonacci_prove_verify():
    data, pw = build_fibonacci(public_io=False)
    proof = data.prove(pw)
    data.verify(proof)


def test_fibonacci_tamper_detection():
    data, pw = build_fibonacci(public_io=False)
    proof = data.prove(pw)
    # corrupt a wire opening
    w0 = proof.proof.openings.wires[0]
    proof.proof.openings.wires[0] = (w0[0] ^ 1, w0[1])
    with pytest.raises(Exception):
        data.verify(proof)
