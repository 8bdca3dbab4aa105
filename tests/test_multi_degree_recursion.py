"""Unified multi-degree FRI recursion: ONE verifier circuit accepts
STARK proofs of different degrees (reference:
plonky2/src/fri/recursive_verifier.rs:196-420
verify_fri_proof_with_multiple_degree_bits +
starky/src/recursive_verifier.rs:30-210 min_degree_bits_to_support)."""

import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.hash import poseidon as hp
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness_check import check_witness
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fixtures import FibonacciStark, fibonacci_res
from plonky2_tpu.stark.prover import prove as stark_prove
from plonky2_tpu.stark.recursive_verifier import (
    add_virtual_stark_proof_with_pis,
    set_stark_proof_with_pis_target,
    verify_stark_proof_circuit,
)
from plonky2_tpu.stark.verifier import verify_stark_proof

MAX_DEGREE_BITS = 5
MIN_DEGREE_BITS = 3


def _config() -> StarkConfig:
    # arity-2 folds with a small final poly so that degrees 3..5 need
    # 1..3 fold steps — exercising the step-skipping machinery
    return StarkConfig(
        security_bits=1,
        num_challenges=2,
        fri_config=FriConfig(
            rate_bits=1,
            cap_height=1,
            proof_of_work_bits=1,
            reduction_strategy=FriReductionStrategy.ConstantArityBits(1, 2),
            num_query_rounds=8,
        ),
    )


def _prove_at(config, degree_bits, verifier_params):
    num_rows = 1 << degree_bits
    stark = FibonacciStark(num_rows)
    trace = stark.generate_trace(0, 1)
    pis = [0, 1, fibonacci_res(num_rows, 0, 1)]
    pwp = stark_prove(
        stark, config, trace, pis, verifier_circuit_fri_params=verifier_params
    )
    # the host verifier replays the padded transcript
    verify_stark_proof(
        stark, pwp, config, degree_bits, verifier_circuit_fri_params=verifier_params
    )
    return stark, pwp


@pytest.fixture(scope="module")
def unified_circuit():
    config = _config()
    stark = FibonacciStark(1 << MAX_DEGREE_BITS)
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(
        b, stark, config, MAX_DEGREE_BITS, multi_degree=True
    )
    verify_stark_proof_circuit(
        b, stark, pt, config, MAX_DEGREE_BITS,
        min_degree_bits_to_support=MIN_DEGREE_BITS,
    )
    outer = b.build(commit=False)
    return config, pt, outer


def _check(config, pt, outer, degree_bits, tamper=False):
    verifier_params = config.fri_params(MAX_DEGREE_BITS)
    stark, pwp = _prove_at(config, degree_bits, verifier_params)
    if tamper:
        pwp.public_inputs[2] = (pwp.public_inputs[2] + 1) % (2**64 - 2**32 + 1)
    pw = PartialWitness()
    set_stark_proof_with_pis_target(pw, pt, pwp, degree_bits=degree_bits)
    witness = generate_partial_witness(pw, outer.prover_only, outer.common)
    check_witness(outer, witness.full_witness(), hp.hash_no_pad([]))


def test_max_degree_proof_verifies(unified_circuit):
    config, pt, outer = unified_circuit
    _check(config, pt, outer, MAX_DEGREE_BITS)


def test_smaller_degree_proof_same_circuit(unified_circuit):
    config, pt, outer = unified_circuit
    _check(config, pt, outer, MAX_DEGREE_BITS - 1)


def test_min_degree_proof_same_circuit(unified_circuit):
    config, pt, outer = unified_circuit
    _check(config, pt, outer, MIN_DEGREE_BITS)


def test_tampered_proof_fails(unified_circuit):
    config, pt, outer = unified_circuit
    with pytest.raises(Exception):
        _check(config, pt, outer, MAX_DEGREE_BITS - 1, tamper=True)
