"""Shape validation: structurally malformed proofs must be rejected with
typed errors (reference: plonky2/src/plonk/validate_shape.rs,
core/src/fri_validate_shape.rs incl. the #64696 hardening tests)."""

import copy

import pytest

from plonky2_tpu.fri.config import FriConfig, FriParams, FriReductionStrategy
from plonky2_tpu.fri.proof import FriInitialTreeProof, MerkleProof
from plonky2_tpu.fri.structure import (
    FriBatchInfo,
    FriInstanceInfo,
    FriOpeningExpression,
    FriOracleInfo,
    FriPolynomialInfo,
)
from plonky2_tpu.fri.validate_shape import (
    FriShapeError,
    validate_fri_initial_proof_shape,
)
from plonky2_tpu.models.fibonacci import build_fibonacci
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.validate_shape import (
    ProofShapeError,
    validate_proof_with_pis_shape,
)
from plonky2_tpu.plonk.verifier import VerificationError, verify


@pytest.fixture(scope="module")
def fib():
    data, pw = build_fibonacci(public_io=True)
    pwp = prove(data.prover_only, data.common, pw)
    verify(pwp, data.verifier_only, data.common)
    return data, pwp


def _reject_shape(data, bad):
    with pytest.raises(VerificationError, match="shape"):
        verify(bad, data.verifier_only, data.common)


def test_well_formed_passes(fib):
    data, pwp = fib
    validate_proof_with_pis_shape(pwp, data.common)


def test_missing_opening_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    bad.proof.openings.wires = bad.proof.openings.wires[:-1]
    with pytest.raises(ProofShapeError):
        validate_proof_with_pis_shape(bad, data.common)
    _reject_shape(data, bad)


def test_extra_public_input_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    bad.public_inputs = list(bad.public_inputs) + [0]
    _reject_shape(data, bad)


def test_truncated_cap_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    bad.proof.wires_cap = bad.proof.wires_cap[:-1]
    _reject_shape(data, bad)


def test_truncated_final_poly_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    bad.proof.opening_proof.final_poly = bad.proof.opening_proof.final_poly[:-1]
    with pytest.raises(Exception):
        verify(bad, data.verifier_only, data.common)


def test_short_merkle_path_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    rp = bad.proof.opening_proof.query_round_proofs[0]
    leaf, proof = rp.initial_trees_proof.evals_proofs[0]
    rp.initial_trees_proof.evals_proofs[0] = (
        leaf,
        MerkleProof(proof.siblings[:-1]),
    )
    with pytest.raises(Exception):
        verify(bad, data.verifier_only, data.common)


def test_extra_query_step_rejected(fib):
    data, pwp = fib
    bad = copy.deepcopy(pwp)
    rp = bad.proof.opening_proof.query_round_proofs[0]
    if rp.steps:
        rp.steps.append(copy.deepcopy(rp.steps[-1]))
        with pytest.raises(Exception):
            verify(bad, data.verifier_only, data.common)


# --- #64696 hardening: out-of-range opening metadata (mirrors the
# reference's fri_validate_shape.rs unit tests) ---


def _single_oracle_instance(num_polys, polynomial_index):
    return FriInstanceInfo(
        oracles=[FriOracleInfo(num_polys=num_polys, blinding=False)],
        batches=[
            FriBatchInfo(
                point=(0, 0),
                openings=[
                    FriOpeningExpression.single(
                        FriPolynomialInfo(0, polynomial_index)
                    )
                ],
            )
        ],
    )


def _single_oracle_proof(leaf_len):
    return FriInitialTreeProof(evals_proofs=[([0] * leaf_len, MerkleProof([]))])


def test_rejects_out_of_range_polynomial_index():
    inst = _single_oracle_instance(1, 5)
    proof = _single_oracle_proof(1)
    with pytest.raises(FriShapeError):
        validate_fri_initial_proof_shape(proof, [inst], False)


def test_rejects_short_leaf():
    inst = _single_oracle_instance(3, 2)
    proof = _single_oracle_proof(1)
    with pytest.raises(FriShapeError):
        validate_fri_initial_proof_shape(proof, [inst], False)


def test_accepts_consistent_shape():
    inst = _single_oracle_instance(3, 2)
    proof = _single_oracle_proof(3)
    validate_fri_initial_proof_shape(proof, [inst], False)
