"""Batch FRI: polynomials of three different degrees committed in one
BatchMerkleTree, opened with a single absorbing FRI argument
(reference: plonky2/src/batch_fri/prover.rs tests, hash/batch_merkle_tree.rs)."""

import numpy as np
import pytest

from plonky2_tpu.field import extension as ge
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.fri.batch_oracle import (
    BatchFriOracle,
    prove_batch_openings,
    verify_batch_fri_proof,
)
from plonky2_tpu.fri.config import FriConfig, FriParams, FriReductionStrategy
from plonky2_tpu.fri.structure import (
    FriBatchInfo,
    FriInstanceInfo,
    FriOpeningBatch,
    FriOpenings,
    FriOracleInfo,
    FriPolynomialInfo,
)
from plonky2_tpu.fri.verifier import fri_challenges
from plonky2_tpu.hash.challenger import Challenger
from plonky2_tpu.ops import gf, merkle


def test_batch_merkle_tree_prove_verify():
    rng = np.random.default_rng(0)
    m0 = rng.integers(0, gl.P, size=(64, 3), dtype=np.uint64)
    m1 = rng.integers(0, gl.P, size=(16, 2), dtype=np.uint64)
    m2 = rng.integers(0, gl.P, size=(4, 5), dtype=np.uint64)
    tree = merkle.BatchDeviceMerkleTree.build(
        [gf.from_u64(m) for m in (m0, m1, m2)], cap_height=1
    )
    cap = tree.cap_u64()
    for idx in (0, 5, 37, 63):
        rows = tree.values_batch(np.array([idx]))
        sibs = tree.prove_batch(np.array([idx]))[0]
        leaf_data = [[int(v) for v in r[0]] for r in rows]
        assert merkle.verify_batch_merkle_proof_to_cap(
            leaf_data, [6, 4, 2], idx, cap, [tuple(int(x) for x in s) for s in sibs]
        )
        bad = [list(leaf_data[0]), list(leaf_data[1]), list(leaf_data[2])]
        bad[1][0] ^= 1
        assert not merkle.verify_batch_merkle_proof_to_cap(
            bad, [6, 4, 2], idx, cap, [tuple(int(x) for x in s) for s in sibs]
        )


def _poly_eval_ext(coeffs_u64, zeta):
    acc = ge.ext_zero(2)
    for c in reversed([int(x) for x in coeffs_u64]):
        acc = ge.ext_add(ge.ext_mul(acc, zeta), ge.from_base(c, 2))
    return acc


def test_batch_fri_roundtrip():
    degree_bits = [8, 6, 4]
    group_sizes = [2, 2, 1]
    fri_params = FriParams(
        config=FriConfig(
            rate_bits=1,
            cap_height=2,
            proof_of_work_bits=2,
            reduction_strategy=FriReductionStrategy.Fixed([2, 2, 2]),
            num_query_rounds=10,
        ),
        leaf_hiding=False,
        degree_bits=8,
        reduction_arity_bits=(2, 2, 2),
    )

    rng = np.random.default_rng(1)
    value_groups = [
        gf.from_u64(rng.integers(0, gl.P, size=(m, 1 << d), dtype=np.uint64))
        for m, d in zip(group_sizes, degree_bits)
    ]
    oracle = BatchFriOracle.from_values(
        value_groups, fri_params.config.rate_bits, False, fri_params.config.cap_height
    )
    assert oracle.degree_bits == degree_bits

    ch = Challenger()
    ch.observe_cap(oracle.batch_merkle_tree.cap_u64())
    zeta = ch.get_extension_challenge(2)

    instances, openings_list = [], []
    for g, m in enumerate(group_sizes):
        coeffs = np.asarray(gf.to_u64(oracle.polynomials[g]))  # [m, n]
        evals = [_poly_eval_ext(coeffs[j], zeta) for j in range(m)]
        for e in evals:
            ch.observe_extension_element(e)
        instances.append(
            FriInstanceInfo(
                oracles=[FriOracleInfo(m, False)],
                batches=[
                    FriBatchInfo.from_polys(
                        tuple(zeta), FriPolynomialInfo.from_range(0, 0, m)
                    )
                ],
            )
        )
        openings_list.append(FriOpenings(batches=[FriOpeningBatch(values=evals)]))

    verifier_ch = Challenger()
    verifier_ch.observe_cap(oracle.batch_merkle_tree.cap_u64())
    assert verifier_ch.get_extension_challenge(2) == zeta
    for o in openings_list:
        for e in o.batches[0].values:
            verifier_ch.observe_extension_element(e)

    proof = prove_batch_openings(degree_bits, instances, oracle, ch, fri_params)

    challenges = fri_challenges(
        verifier_ch,
        proof.commit_phase_merkle_caps,
        proof.final_poly,
        proof.pow_witness,
        degree_bits[0],
        fri_params.config,
    )
    verify_batch_fri_proof(
        degree_bits,
        instances,
        openings_list,
        challenges,
        oracle.batch_merkle_tree.cap_u64(),
        [d + fri_params.config.rate_bits for d in degree_bits],
        proof,
        fri_params,
    )

    # tampering with a step eval must be caught
    import copy

    bad = copy.deepcopy(proof)
    ev = bad.query_round_proofs[0].steps[0].evals
    ev[0] = (ev[0][0] ^ 1, ev[0][1])
    with pytest.raises(Exception):
        verify_batch_fri_proof(
            degree_bits,
            instances,
            openings_list,
            challenges,
            oracle.batch_merkle_tree.cap_u64(),
            [d + fri_params.config.rate_bits for d in degree_bits],
            bad,
            fri_params,
        )
