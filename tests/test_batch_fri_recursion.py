"""In-circuit batch-FRI verification: the host batch-FRI roundtrip
replayed inside a plonky2 circuit (reference:
plonky2/src/batch_fri/recursive_verifier.rs:22-330)."""

import numpy as np
import pytest

from plonky2_tpu.field import extension as ge
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.fri.batch_oracle import BatchFriOracle, prove_batch_openings
from plonky2_tpu.fri.batch_recursive_verifier import verify_batch_fri_proof_circuit
from plonky2_tpu.fri.config import FriConfig, FriParams, FriReductionStrategy
from plonky2_tpu.fri.recursive_verifier import (
    FriInstanceInfoTarget,
    fri_challenges_circuit,
)
from plonky2_tpu.fri.structure import (
    FriBatchInfo,
    FriInstanceInfo,
    FriOracleInfo,
    FriPolynomialInfo,
)
from plonky2_tpu.hash import poseidon as hp
from plonky2_tpu.hash.challenger import Challenger
from plonky2_tpu.hash.recursive_challenger import RecursiveChallenger
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.ops import gf
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.proof_target import (
    add_virtual_cap,
    add_virtual_fri_proof,
    _set_cap,
    _set_ext,
    _set_exts,
)
from plonky2_tpu.plonk.witness_check import check_witness

DEGREE_BITS = [6, 4]
GROUP_SIZES = [2, 1]


def _fri_params():
    return FriParams(
        config=FriConfig(
            rate_bits=1,
            cap_height=1,
            proof_of_work_bits=1,
            reduction_strategy=FriReductionStrategy.Fixed([2, 2]),
            num_query_rounds=4,
        ),
        leaf_hiding=False,
        degree_bits=DEGREE_BITS[0],
        reduction_arity_bits=(2, 2),
    )


def _poly_eval_ext(coeffs_u64, zeta):
    acc = ge.ext_zero(2)
    for c in reversed([int(x) for x in coeffs_u64]):
        acc = ge.ext_add(ge.ext_mul(acc, zeta), ge.from_base(c, 2))
    return acc


def _make_proof(fri_params, tamper=False):
    rng = np.random.default_rng(7)
    value_groups = [
        gf.from_u64(rng.integers(0, gl.P, size=(m, 1 << d), dtype=np.uint64))
        for m, d in zip(GROUP_SIZES, DEGREE_BITS)
    ]
    oracle = BatchFriOracle.from_values(
        value_groups, fri_params.config.rate_bits, False, fri_params.config.cap_height
    )
    ch = Challenger()
    ch.observe_cap(oracle.batch_merkle_tree.cap_u64())
    zeta = ch.get_extension_challenge(2)

    instances, evals_list = [], []
    for g, m in enumerate(GROUP_SIZES):
        coeffs = np.asarray(gf.to_u64(oracle.polynomials[g]))
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
        evals_list.append(evals)
    proof = prove_batch_openings(DEGREE_BITS, instances, oracle, ch, fri_params)
    if tamper:
        ev = proof.query_round_proofs[0].steps[0].evals
        ev[0] = (ev[0][0] ^ 1, ev[0][1])
    return oracle, instances, evals_list, proof


def _run_circuit(fri_params, oracle, instances, evals_list, proof):
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())

    class _Shim:
        pass

    shim = _Shim()
    shim.fri_params = fri_params
    total_width = sum(GROUP_SIZES)
    cap_t = add_virtual_cap(b, fri_params.config.cap_height)
    proof_t = add_virtual_fri_proof(b, shim, widths=[total_width])
    evals_t = [b.add_virtual_extension_targets(m) for m in GROUP_SIZES]

    # transcript in-circuit: cap -> zeta -> opening evals -> FRI challenges
    ch = RecursiveChallenger(b)
    ch.observe_cap(cap_t)
    zeta_t = ch.get_extension_challenge()
    for ets in evals_t:
        ch.observe_extension_elements(ets)
    fri_ch = fri_challenges_circuit(
        b, ch, proof_t.commit_phase_merkle_caps, proof_t.final_poly,
        proof_t.pow_witness, fri_params.config,
    )

    instances_t = [
        FriInstanceInfoTarget(static_info=inst, batch_points=[zeta_t])
        for inst in instances
    ]
    opening_batches_list = [[list(ets)] for ets in evals_t]
    verify_batch_fri_proof_circuit(
        b, DEGREE_BITS, instances_t, opening_batches_list, fri_ch,
        [cap_t], proof_t, fri_params,
    )
    data = b.build(commit=False)

    pw = PartialWitness()
    _set_cap(pw, cap_t, oracle.batch_merkle_tree.cap_u64())
    for ets, evals in zip(evals_t, evals_list):
        _set_exts(pw, ets, evals)
    for cap_tt, cap in zip(proof_t.commit_phase_merkle_caps, proof.commit_phase_merkle_caps):
        _set_cap(pw, cap_tt, cap)
    for round_t, rnd in zip(proof_t.query_round_proofs, proof.query_round_proofs):
        (et, mt) = round_t.initial_trees_proof.evals_proofs[0]
        (ev, mp) = rnd.initial_trees_proof.evals_proofs[0]
        for t, v in zip(et, ev):
            pw.set_target(t, int(v))
        for sib_t, sib in zip(mt.siblings, mp.siblings):
            for t, v in zip(sib_t, sib):
                pw.set_target(t, int(v))
        for step_t, step in zip(round_t.steps, rnd.steps):
            _set_exts(pw, step_t.evals, step.evals)
            for sib_t, sib in zip(step_t.merkle_proof.siblings, step.merkle_proof.siblings):
                for t, v in zip(sib_t, sib):
                    pw.set_target(t, int(v))
    _set_exts(pw, proof_t.final_poly, proof.final_poly)
    pw.set_target(proof_t.pow_witness, int(proof.pow_witness))

    witness = generate_partial_witness(pw, data.prover_only, data.common)
    check_witness(data, witness.full_witness(), hp.hash_no_pad([]))


def test_batch_fri_in_circuit():
    fri_params = _fri_params()
    args = _make_proof(fri_params)
    _run_circuit(fri_params, *args)


def test_batch_fri_in_circuit_rejects_tamper():
    fri_params = _fri_params()
    args = _make_proof(fri_params, tamper=True)
    with pytest.raises(Exception):
        _run_circuit(fri_params, *args)
