"""Recursive STARK verification: a FibonacciStark proof checked inside a
plonky2 circuit, validated via witness constraint checking (reference:
starky/src/recursive_verifier.rs tests)."""

import pytest

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


def test_recursive_stark_verifier_constraints():
    num_rows = 1 << 5
    degree_bits = 5
    stark = FibonacciStark(num_rows)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(0, 1)
    pis = [0, 1, fibonacci_res(num_rows, 0, 1)]
    pwp = stark_prove(stark, config, trace, pis)
    verify_stark_proof(stark, pwp, config, degree_bits)

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(b, stark, config, degree_bits)
    verify_stark_proof_circuit(b, stark, pt, config, degree_bits)
    outer = b.build(commit=False)

    pw = PartialWitness()
    set_stark_proof_with_pis_target(pw, pt, pwp)
    witness = generate_partial_witness(pw, outer.prover_only, outer.common)
    check_witness(outer, witness.full_witness(), hp.hash_no_pad([]))


def test_recursive_stark_verifier_with_lookups():
    """A logUp lookup STARK (PermutationStark) verified in-circuit
    (reference: starky/src/permutation_stark.rs recursive test)."""
    from plonky2_tpu.stark.fixtures import PermutationStark

    num_rows = 1 << 5
    stark = PermutationStark(num_rows)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(3)
    pwp = stark_prove(stark, config, trace, [3])
    verify_stark_proof(stark, pwp, config, 5)

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(b, stark, config, 5)
    verify_stark_proof_circuit(b, stark, pt, config, 5)
    outer = b.build(commit=False)

    pw = PartialWitness()
    set_stark_proof_with_pis_target(pw, pt, pwp)
    witness = generate_partial_witness(pw, outer.prover_only, outer.common)
    check_witness(outer, witness.full_witness(), hp.hash_no_pad([]))
