"""Zero-knowledge STARK proofs: Z_H-masked split-commitment trace with
salted oracles, opened through split-mask FriOpeningExpressions
(capability target: core/src/fri_structure.rs:76-89 split_mask +
fri/oracle.rs:243-264 salted leaves; the fork ships the machinery,
starky-side zk wiring is this module's addition)."""

import numpy as np
import pytest

from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fixtures import FibonacciStark, fibonacci_res
from plonky2_tpu.stark.prover import prove as stark_prove
from plonky2_tpu.stark.verifier import verify_stark_proof

DEGREE_BITS = 5


def _config():
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


def _prove(config):
    num_rows = 1 << DEGREE_BITS
    stark = FibonacciStark(num_rows)
    trace = stark.generate_trace(0, 1)
    pis = [0, 1, fibonacci_res(num_rows, 0, 1)]
    pwp = stark_prove(stark, config, trace, pis, zero_knowledge=True)
    return stark, trace, pwp


def test_zk_stark_proves_and_verifies():
    config = _config()
    stark, _, pwp = _prove(config)
    verify_stark_proof(stark, pwp, config, DEGREE_BITS, zero_knowledge=True)


def test_zk_tampered_rejected():
    config = _config()
    stark, _, pwp = _prove(config)
    pwp.public_inputs[2] = (pwp.public_inputs[2] + 1) % gl.P
    with pytest.raises(Exception):
        verify_stark_proof(stark, pwp, config, DEGREE_BITS, zero_knowledge=True)


def test_zk_openings_are_masked():
    """The zeta-openings of the trace must NOT equal the true polynomial
    evaluations (they are T' = T + Z_H*R values), and two proofs of the
    same statement must open to different values — i.e. the openings
    carry mask randomness, not the witness."""
    config = _config()
    stark, trace, pwp1 = _prove(config)
    _, _, pwp2 = _prove(config)
    o1 = pwp1.proof.openings.local_values
    o2 = pwp2.proof.openings.local_values
    assert o1 != o2, "mask randomness missing: identical openings"

    # also: query-phase leaves differ run to run (salted + masked)
    q1 = pwp1.proof.opening_proof.query_round_proofs[0]
    q2 = pwp2.proof.opening_proof.query_round_proofs[0]
    l1 = q1.initial_trees_proof.evals_proofs[0][0]
    l2 = q2.initial_trees_proof.evals_proofs[0][0]
    assert l1 != l2


def test_zk_proof_shape_differs_from_plain():
    """zk trace oracle commits 2C split halves + 4 salt columns."""
    config = _config()
    stark, trace, pwp = _prove(config)
    C = stark.num_columns()
    leaf = pwp.proof.opening_proof.query_round_proofs[0].initial_trees_proof.evals_proofs[0][0]
    assert len(leaf) == 2 * C + 4
