"""Batch-STARK e2e: two FibonacciStark tables of different degrees
committed in shared BatchMerkleTrees (one across traces, one across
quotients), proven with a single batched FRI argument, host-verified,
and rejected under tampering."""

import copy

import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.stark.batch_prover import batch_prove, batch_verify
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fixtures import FibonacciStark, fibonacci_res
from plonky2_tpu.fri.verifier import FriVerificationError
from plonky2_tpu.stark.verifier import StarkVerificationError

VERIFY_ERRORS = (StarkVerificationError, FriVerificationError)


def _config():
    return StarkConfig(
        security_bits=1,
        num_challenges=2,
        fri_config=FriConfig(
            rate_bits=1,
            cap_height=1,
            proof_of_work_bits=1,
            reduction_strategy=FriReductionStrategy.Fixed([2, 2]),
            num_query_rounds=8,
        ),
    )


@pytest.fixture(scope="module")
def system():
    degrees = [7, 5]
    starks = [FibonacciStark(1 << d) for d in degrees]
    traces = [s.generate_trace(0, 1) for s in starks]
    pis = [[0, 1, fibonacci_res(1 << d, 0, 1)] for d in degrees]
    config = _config()
    proof = batch_prove(starks, config, traces, pis)
    return starks, config, proof


def test_batch_stark_proves_and_verifies(system):
    starks, config, proof = system
    batch_verify(starks, config, proof)


def test_batch_stark_rejects_tampered_opening(system):
    starks, config, proof = system
    bad = copy.deepcopy(proof)
    lv = bad.openings[1].local_values[0]
    bad.openings[1].local_values[0] = (lv[0] ^ 1, lv[1])
    with pytest.raises(VERIFY_ERRORS):
        batch_verify(starks, config, bad)


def test_batch_stark_rejects_tampered_public_input(system):
    starks, config, proof = system
    bad = copy.deepcopy(proof)
    bad.public_inputs[0][2] ^= 1
    with pytest.raises(VERIFY_ERRORS):
        batch_verify(starks, config, bad)


def test_batch_stark_rejects_tampered_query_leaf(system):
    starks, config, proof = system
    bad = copy.deepcopy(proof)
    ep = bad.opening_proof.query_round_proofs[0].initial_trees_proof.evals_proofs
    vals, mp = ep[0]
    vals = list(vals)
    vals[0] ^= 1
    ep[0] = (vals, mp)
    with pytest.raises(VERIFY_ERRORS):
        batch_verify(starks, config, bad)


def _run_recursive(starks, config, proof, degree_bits):
    from plonky2_tpu.hash import poseidon as hp
    from plonky2_tpu.iop.generator import generate_partial_witness
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.witness_check import check_witness
    from plonky2_tpu.stark.batch_recursive_verifier import (
        add_virtual_batch_stark_proof,
        set_batch_stark_proof_target,
        verify_batch_stark_proof_circuit,
    )

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    proof_t = add_virtual_batch_stark_proof(b, starks, config, degree_bits)
    verify_batch_stark_proof_circuit(b, starks, proof_t, config, degree_bits)
    data = b.build(commit=False)
    pw = PartialWitness()
    set_batch_stark_proof_target(pw, proof_t, proof)
    witness = generate_partial_witness(pw, data.prover_only, data.common)
    check_witness(data, witness.full_witness(), hp.hash_no_pad([]))


def test_batch_stark_recursive_verifier(system):
    starks, config, proof = system
    _run_recursive(starks, config, proof, proof.degree_bits)


def test_batch_stark_recursive_verifier_rejects_tamper(system):
    starks, config, proof = system
    bad = copy.deepcopy(proof)
    ev = bad.opening_proof.query_round_proofs[0].steps[0].evals
    ev[0] = (ev[0][0] ^ 1, ev[0][1])
    with pytest.raises(Exception):
        _run_recursive(starks, config, bad, bad.degree_bits)
