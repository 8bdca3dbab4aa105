"""Recursion tests (reference: plonky2/src/recursion/recursive_verifier.rs
tests; SURVEY.md §3.4).

The fast path builds the full recursive-verifier circuit around a REAL
inner proof, generates the outer witness, and checks every constraint +
copy constraint (plonk/witness_check.py) — this exercises the entire
in-circuit verifier (challenger, vanishing poly via CircuitAlgebra, FRI
Merkle/fold/PoW) without the cost of proving the outer circuit. The
full outer prove+verify e2e runs in `test_recursion_e2e` (marked slow).
"""

import pytest

from plonky2_tpu.hash import poseidon as hp
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.models.fibonacci import build_fibonacci, fib_value
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.proof_target import (
    add_virtual_proof_with_pis,
    set_proof_with_pis_target,
)
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.recursive_verifier import (
    add_virtual_verifier_data,
    set_verifier_data_target,
    verify_proof_circuit,
)
from plonky2_tpu.plonk.verifier import verify
from plonky2_tpu.plonk.witness_check import WitnessCheckError, check_witness


@pytest.fixture(scope="module")
def inner():
    data, pw = build_fibonacci(public_io=True)
    proof = prove(data.prover_only, data.common, pw)
    verify(proof, data.verifier_only, data.common)
    return data, proof


def _build_outer(inner_data, register_pis=False):
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_proof_with_pis(b, inner_data.common)
    vd_t = add_virtual_verifier_data(
        b, inner_data.common.fri_params.config.cap_height
    )
    verify_proof_circuit(b, pt, vd_t, inner_data.common)
    if register_pis:
        b.register_public_inputs(pt.public_inputs)
    return b, pt, vd_t


def test_recursive_verifier_constraints_on_real_proof(inner):
    inner_data, inner_proof = inner
    b, pt, vd_t = _build_outer(inner_data)
    outer = b.build(commit=False)
    assert outer.common.degree_bits <= 13, "recursion threshold regression"

    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vd_t, inner_data.verifier_only)
    witness = generate_partial_witness(pw, outer.prover_only, outer.common)
    check_witness(outer, witness.full_witness(), hp.hash_no_pad([]))


def test_recursive_verifier_rejects_tampered_proof(inner):
    import copy

    inner_data, inner_proof = inner
    b, pt, vd_t = _build_outer(inner_data)
    outer = b.build(commit=False)

    bad = copy.deepcopy(inner_proof)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % hp.P
    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, bad)
    set_verifier_data_target(pw, vd_t, inner_data.verifier_only)
    with pytest.raises((AssertionError, WitnessCheckError, Exception)):
        witness = generate_partial_witness(pw, outer.prover_only, outer.common)
        check_witness(outer, witness.full_witness(), hp.hash_no_pad([]))


@pytest.mark.slow
def test_recursion_e2e(inner):
    inner_data, inner_proof = inner
    b, pt, vd_t = _build_outer(inner_data, register_pis=True)
    outer = b.build()

    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vd_t, inner_data.verifier_only)
    outer_proof = prove(outer.prover_only, outer.common, pw)
    verify(outer_proof, outer.verifier_only, outer.common)
    assert outer_proof.public_inputs == inner_proof.public_inputs
    assert outer_proof.public_inputs[2] == fib_value()
