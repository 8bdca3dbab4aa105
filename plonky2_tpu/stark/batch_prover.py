"""Batch-STARK proving: several tables of strictly decreasing degrees,
committed in TWO shared BatchMerkleTrees (one across all traces, one
across all quotients) and opened with a single batched FRI argument.

The reference ships the batch-FRI primitive with self-tests only
(plonky2/src/batch_fri/{oracle,prover,verifier}.rs); this module wires
it into starky end-to-end, so a zkVM-style multi-table system pays one
Merkle cap + one FRI proof instead of one per table. v1 scope: tables
without lookups/CTLs and without zk (assert-guarded).

Transcript (one shared challenger):
  observe(config); per table: observe(public_inputs);
  observe(trace batch cap);
  per table: alphas' = n challenges, alphas = binding step (stark
  structure + pis bound, stark/vanishing.py run_binding_step);
  observe(quotient batch cap); zeta; per table: observe(openings);
  then the batch-FRI subprotocol (alpha, per-fold caps+betas, PoW,
  query indices).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..fri.batch_oracle import (
    BatchFriOracle,
    prove_batch_openings,
    verify_batch_fri_proof,
)
from ..fri.oracle import _eval_all_jit, ext_powers_np
from ..fri.proof import FriProof
from ..fri.verifier import fri_challenges
from ..hash.challenger import Challenger
from ..ops import gf, ntt
from .config import StarkConfig
from .proof import StarkOpeningSet
from .prover import compute_quotient_chunks
from .stark import Stark
from .vanishing import eval_vanishing_at_point, run_binding_step
from .verifier import StarkVerificationError


@dataclass
class BatchStarkProof:
    degree_bits: List[int]
    trace_cap: np.ndarray  # [2^cap_height, 4]
    quotient_cap: np.ndarray
    openings: List[StarkOpeningSet]  # per table
    opening_proof: FriProof
    public_inputs: List[List[int]]


def _eval_group_at(coeffs: gf.Gf, num: int, zeta) -> List:
    """Evaluate every row polynomial of a coefficient matrix at an
    extension point (PolynomialBatch.eval_all_at_ext for a raw group)."""
    pw = ext_powers_np(zeta, coeffs[0].shape[-1])
    e0, e1 = _eval_all_jit(coeffs, gf.from_u64(pw[:, 0]), gf.from_u64(pw[:, 1]))
    u0 = gf.to_u64(e0)
    u1 = gf.to_u64(e1)
    return [(int(a), int(b)) for a, b in zip(u0, u1)][:num]


def _check_tables(starks, traces):
    degree_bits = []
    for stark, trace in zip(starks, traces):
        assert not stark.uses_lookups(), "batch-STARK with lookups lands later"
        num_cols, degree = trace.shape
        assert num_cols == stark.num_columns()
        db = degree.bit_length() - 1
        assert 1 << db == degree
        degree_bits.append(db)
    assert degree_bits == sorted(degree_bits, reverse=True) and len(
        set(degree_bits)
    ) == len(degree_bits), "tables must have strictly decreasing degrees"
    return degree_bits


def batch_prove(
    starks: Sequence[Stark],
    config: StarkConfig,
    traces: Sequence[np.ndarray],  # per table u64 [num_columns, degree]
    public_inputs_list: Sequence[List[int]],
) -> BatchStarkProof:
    degree_bits = _check_tables(starks, traces)
    fri_config = config.fri_config
    rate_bits, cap_height, nc = fri_config.rate_bits, fri_config.cap_height, config.num_challenges
    fri_params = config.fri_params(degree_bits[0])

    # 1. one batch commitment across every table's trace
    trace_values = [gf.from_u64(np.ascontiguousarray(t)) for t in traces]
    trace_oracle = BatchFriOracle.from_values(
        trace_values, rate_bits, False, cap_height
    )

    ch = Challenger()
    config.observe(ch)
    for pis in public_inputs_list:
        ch.observe_elements([p % gl.P for p in pis])
    ch.observe_cap(trace_oracle.batch_merkle_tree.cap_u64())

    # 2. per-table constraint challenges + quotient chunks
    all_alphas = []
    quotient_groups = []
    for g, (stark, trace) in enumerate(zip(starks, traces)):
        alphas_prime = ch.get_n_challenges(nc)
        alphas = run_binding_step(
            stark,
            ch,
            public_inputs_list[g],
            alphas_prime,
            degree_bits[g],
            num_aux=0,
        )
        all_alphas.append(alphas)
        qdf = stark.quotient_degree_factor()
        assert (qdf - 1).bit_length() <= rate_bits, "quotient degree exceeds rate"
        trace_nat = ntt.lde_onto_coset(trace_oracle.polynomials[g], rate_bits)
        chunks = compute_quotient_chunks(
            stark,
            nc,
            rate_bits,
            degree_bits[g],
            trace_nat,
            alphas,
            public_inputs_list[g],
            qdf,
        )
        quotient_groups.append(chunks)

    # 3. one batch commitment across every table's quotient chunks
    quotient_oracle = BatchFriOracle.from_coeffs(
        quotient_groups, rate_bits, False, cap_height
    )
    ch.observe_cap(quotient_oracle.batch_merkle_tree.cap_u64())

    # 4. one zeta; per-table openings at (zeta, g_table * zeta)
    zeta = ch.get_extension_challenge(2)
    assert ge.ext_exp(zeta, 1 << degree_bits[0]) != ge.ext_one(2), "zeta in subgroup"
    openings = []
    instances = []
    for g, stark in enumerate(starks):
        g_base = gl.primitive_root_of_unity(degree_bits[g])
        zeta_next = ge.ext_scalar_mul(zeta, g_base)
        o = StarkOpeningSet(
            local_values=_eval_group_at(
                trace_oracle.polynomials[g], stark.num_columns(), zeta
            ),
            next_values=_eval_group_at(
                trace_oracle.polynomials[g], stark.num_columns(), zeta_next
            ),
            auxiliary_polys=None,
            auxiliary_polys_next=None,
            ctl_zs_first=None,
            quotient_polys=_eval_group_at(
                quotient_groups[g], nc * stark.quotient_degree_factor(), zeta
            ),
        )
        openings.append(o)
        for batch in o.to_fri_openings().batches:
            ch.observe_extension_elements(batch.values)
        instances.append(stark.fri_instance(zeta, g_base, config))

    # 5. one batched FRI argument over both batch oracles
    opening_proof = prove_batch_openings(
        degree_bits, instances, [trace_oracle, quotient_oracle], ch, fri_params
    )

    return BatchStarkProof(
        degree_bits=degree_bits,
        trace_cap=trace_oracle.batch_merkle_tree.cap_u64(),
        quotient_cap=quotient_oracle.batch_merkle_tree.cap_u64(),
        openings=openings,
        opening_proof=opening_proof,
        public_inputs=[list(p) for p in public_inputs_list],
    )


def batch_verify(
    starks: Sequence[Stark],
    config: StarkConfig,
    proof: BatchStarkProof,
) -> None:
    """Replay the transcript, check each table's vanishing identity at
    zeta, then verify the batched FRI argument against both caps."""
    degree_bits = proof.degree_bits
    nc = config.num_challenges
    fri_params = config.fri_params(degree_bits[0])

    ch = Challenger()
    config.observe(ch)
    for pis in proof.public_inputs:
        ch.observe_elements([p % gl.P for p in pis])
    ch.observe_cap(proof.trace_cap)

    all_alphas = []
    for g, stark in enumerate(starks):
        alphas_prime = ch.get_n_challenges(nc)
        all_alphas.append(
            run_binding_step(
                stark,
                ch,
                proof.public_inputs[g],
                alphas_prime,
                degree_bits[g],
                num_aux=0,
            )
        )
    ch.observe_cap(proof.quotient_cap)
    zeta = ch.get_extension_challenge(2)

    instances = []
    openings_list = []
    for g, stark in enumerate(starks):
        o = proof.openings[g]
        if len(o.local_values) != stark.num_columns() or len(
            o.quotient_polys
        ) != nc * stark.quotient_degree_factor():
            raise StarkVerificationError("malformed opening set shape")
        g_base = gl.primitive_root_of_unity(degree_bits[g])
        # vanishing identity at zeta (verifier.rs:150-205)
        eval_vanishing_and_check(
            stark, config, o, zeta, all_alphas[g], degree_bits[g],
            proof.public_inputs[g],
        )
        for batch in o.to_fri_openings().batches:
            ch.observe_extension_elements(batch.values)
        instances.append(stark.fri_instance(zeta, g_base, config))
        openings_list.append(o.to_fri_openings())

    challenges = fri_challenges(
        ch,
        proof.opening_proof.commit_phase_merkle_caps,
        proof.opening_proof.final_poly,
        proof.opening_proof.pow_witness,
        degree_bits[0],
        fri_params.config,
    )
    lde_heights = [d + fri_params.config.rate_bits for d in degree_bits]
    verify_batch_fri_proof(
        degree_bits,
        instances,
        openings_list,
        challenges,
        [proof.trace_cap, proof.quotient_cap],
        [lde_heights, lde_heights],
        proof.opening_proof,
        fri_params,
    )


def eval_vanishing_and_check(
    stark, config, openings, zeta, alphas, degree_bits, public_inputs
) -> None:
    """sum_i alpha_i * C_i(zeta) must equal Z_H(zeta) * Q(zeta) with Q
    recombined from its degree-n chunks (verifier.rs:150-205)."""
    n = 1 << degree_bits
    zeta_pow_n = ge.ext_exp(zeta, n)
    zh_zeta = ge.ext_sub(zeta_pow_n, ge.ext_one(2))
    vanishing = eval_vanishing_at_point(
        stark,
        openings,
        public_inputs,
        alphas,
        zeta,
        degree_bits,
    )
    qdf = stark.quotient_degree_factor()
    for i in range(config.num_challenges):
        chunks = openings.quotient_polys[i * qdf : (i + 1) * qdf]
        acc = ge.ext_zero(2)
        for c in reversed(chunks):
            acc = ge.ext_add(ge.ext_mul(acc, zeta_pow_n), c)
        if ge.ext_mul(zh_zeta, acc) != tuple(vanishing[i]):
            raise StarkVerificationError(
                f"vanishing identity failed for challenge {i}"
            )
