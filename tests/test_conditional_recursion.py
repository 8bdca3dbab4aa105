"""Conditional recursion + dummy circuits (reference:
recursion/conditional_recursive_verifier.rs, dummy_circuit.rs).
Validated by witness constraint checking against real proofs."""

import pytest

from plonky2_tpu.hash import poseidon as hp
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.models.fibonacci import build_fibonacci
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
)
from plonky2_tpu.plonk.verifier import verify
from plonky2_tpu.plonk.witness_check import check_witness
from plonky2_tpu.recursion.conditional import conditionally_verify_proof_or_dummy
from plonky2_tpu.recursion.dummy_circuit import dummy_circuit, dummy_proof


@pytest.fixture(scope="module")
def inner():
    # like build_fibonacci, but with a NoopGate in the gate set so the
    # common data is dummy-circuit-compatible (recursion commons always
    # include noop padding)
    from plonky2_tpu.gates.basic import NoopGate

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x0 = b.add_virtual_target()
    x1 = b.add_virtual_target()
    prev, cur = x0, x1
    for _ in range(99):
        prev, cur = cur, b.add(prev, cur)
    b.register_public_inputs([x0, x1, cur])
    b.add_gate(NoopGate(), [])
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x0, 0)
    pw.set_target(x1, 1)
    proof = prove(data.prover_only, data.common, pw)
    verify(proof, data.verifier_only, data.common)
    return data, proof


def test_dummy_circuit_matches_common(inner):
    data, _ = inner
    dd = dummy_circuit(data.common)
    pwp = dummy_proof(dd, {0: 7})
    assert pwp.public_inputs[0] == 7
    verify(pwp, dd.verifier_only, dd.common)


@pytest.mark.parametrize("condition", [1, 0])
def test_conditional_recursion_witness(inner, condition):
    data, proof = inner
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    cond = b.add_virtual_bool_target_safe()
    pt = add_virtual_proof_with_pis(b, data.common)
    vd_t = add_virtual_verifier_data(b, data.common.fri_params.config.cap_height)
    conditionally_verify_proof_or_dummy(b, cond, pt, vd_t, data.common)
    outer = b.build(commit=False)

    pw = PartialWitness()
    pw.set_target(cond.target, condition)
    set_proof_with_pis_target(pw, pt, proof)
    set_verifier_data_target(pw, vd_t, data.verifier_only)
    witness = generate_partial_witness(pw, outer.prover_only, outer.common)
    check_witness(outer, witness.full_witness(), hp.hash_no_pad([]))
