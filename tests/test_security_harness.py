"""Adversarial cases (reference: plonky2/tests/security_harness.rs):
malformed proofs and witnesses must be rejected, never accepted or
silently mangled."""

import copy

import numpy as np
import pytest

from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.models.fibonacci import build_fibonacci
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.verifier import VerificationError, verify


@pytest.fixture(scope="module")
def fib():
    data, pw = build_fibonacci(public_io=True)
    pwp = prove(data.prover_only, data.common, pw)
    verify(pwp, data.verifier_only, data.common)
    return data, pwp


def _reject(data, bad):
    with pytest.raises(Exception):
        verify(bad, data.verifier_only, data.common)


def test_tampered_public_input_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    bad.public_inputs[0] = (bad.public_inputs[0] + 1) % gl.P
    _reject(data, bad)


def test_tampered_wires_cap_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    bad.proof.wires_cap = bad.proof.wires_cap.copy()
    bad.proof.wires_cap[0, 0] ^= 1
    _reject(data, bad)


def test_tampered_opening_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    w = list(bad.proof.openings.wires)
    w[0] = ((w[0][0] + 1) % gl.P, w[0][1])
    bad.proof.openings.wires = w
    _reject(data, bad)


def test_tampered_quotient_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    q = list(bad.proof.openings.quotient_polys)
    q[0] = ((q[0][0] + 1) % gl.P, q[0][1])
    bad.proof.openings.quotient_polys = q
    _reject(data, bad)


def test_tampered_pow_witness_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    bad.proof.opening_proof.pow_witness = (
        bad.proof.opening_proof.pow_witness + 1
    ) % gl.P
    _reject(data, bad)


def test_tampered_final_poly_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    fp = list(bad.proof.opening_proof.final_poly)
    fp[0] = ((fp[0][0] + 1) % gl.P, fp[0][1])
    bad.proof.opening_proof.final_poly = fp
    _reject(data, bad)


def test_tampered_merkle_sibling_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    qr = bad.proof.opening_proof.query_round_proofs[0]
    sibs = qr.initial_trees_proof.evals_proofs[1][1].siblings
    sibs[0] = tuple((x + 1) % gl.P for x in sibs[0])
    _reject(data, bad)


def test_truncated_query_rounds_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    bad.proof.opening_proof.query_round_proofs = (
        bad.proof.opening_proof.query_round_proofs[:-1]
    )
    _reject(data, bad)


def test_wire_set_twice_conflicting_raises():
    """Conflicting witness values must error, not silently win
    (security_harness.rs wire-set-twice; CHANGELOG 1.0.0)."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.connect(x, y)
    b.register_public_input(x)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 1)
    with pytest.raises(Exception):
        pw.set_target(y, 2)
        prove(data.prover_only, data.common, pw)
