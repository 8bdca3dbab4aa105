"""Compressed proofs: Merkle path dedup + FRI redundancy removal
(reference: plonk/proof.rs:130-250 CompressedProofWithPublicInputs)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from ..fri import verifier as fv
from ..fri.compress import (
    CompressedFriProof,
    compress_fri_proof,
    decompress_fri_proof,
)
from .proof import OpeningSet, Proof, ProofWithPublicInputs
from .verifier import get_challenges, verify


@dataclass
class CompressedProof:
    wires_cap: object
    plonk_zs_partial_products_cap: object
    quotient_polys_cap: object
    openings: OpeningSet
    opening_proof: CompressedFriProof


@dataclass
class CompressedProofWithPublicInputs:
    proof: CompressedProof
    public_inputs: List[int]


def compress_proof(
    pwp: ProofWithPublicInputs, verifier_data, common
) -> CompressedProofWithPublicInputs:
    pis_hash = pwp.get_public_inputs_hash()
    challenges = get_challenges(pwp, pis_hash, verifier_data.circuit_digest, common)
    indices = challenges.fri_challenges.fri_query_indices
    cfri = compress_fri_proof(pwp.proof.opening_proof, indices, common.fri_params)
    return CompressedProofWithPublicInputs(
        CompressedProof(
            wires_cap=pwp.proof.wires_cap,
            plonk_zs_partial_products_cap=pwp.proof.plonk_zs_partial_products_cap,
            quotient_polys_cap=pwp.proof.quotient_polys_cap,
            openings=pwp.proof.openings,
            opening_proof=cfri,
        ),
        list(pwp.public_inputs),
    )


def decompress_proof(
    cpwp: CompressedProofWithPublicInputs, verifier_data, common
) -> ProofWithPublicInputs:
    """Rebuild the full proof: recompute challenges from the compressed
    transcript (identical), infer the omitted evaluations, decompress."""
    # Challenges depend only on caps/openings/final poly/pow — identical
    # between compressed and full forms.
    proxy = ProofWithPublicInputs(
        Proof(
            wires_cap=cpwp.proof.wires_cap,
            plonk_zs_partial_products_cap=cpwp.proof.plonk_zs_partial_products_cap,
            quotient_polys_cap=cpwp.proof.quotient_polys_cap,
            openings=cpwp.proof.openings,
            opening_proof=_fri_proxy(cpwp.proof.opening_proof),
        ),
        list(cpwp.public_inputs),
    )
    pis_hash = proxy.get_public_inputs_hash()
    challenges = get_challenges(proxy, pis_hash, verifier_data.circuit_digest, common)
    indices = challenges.fri_challenges.fri_query_indices

    # first decompress without inferred elements is impossible; instead,
    # infer elements directly from the compressed data: the combine/fold
    # chain needs only initial evals + step evals, all present.
    instance = common.get_fri_instance(challenges.plonk_zeta)
    openings = cpwp.proof.openings.to_fri_openings()
    inferred = _inferred_from_compressed(
        instance, openings, challenges.fri_challenges, cpwp.proof.opening_proof,
        indices, common.fri_params,
    )
    full_fri = decompress_fri_proof(
        cpwp.proof.opening_proof, indices, inferred, common.fri_params
    )
    return ProofWithPublicInputs(
        Proof(
            wires_cap=cpwp.proof.wires_cap,
            plonk_zs_partial_products_cap=cpwp.proof.plonk_zs_partial_products_cap,
            quotient_polys_cap=cpwp.proof.quotient_polys_cap,
            openings=cpwp.proof.openings,
            opening_proof=full_fri,
        ),
        list(cpwp.public_inputs),
    )


class _FriProxy:
    """Duck-typed stand-in exposing the transcript-relevant FRI fields."""

    def __init__(self, c: CompressedFriProof):
        self.commit_phase_merkle_caps = c.commit_phase_merkle_caps
        self.final_poly = c.final_poly
        self.pow_witness = c.pow_witness


def _fri_proxy(c: CompressedFriProof):
    return _FriProxy(c)


def _inferred_from_compressed(
    instance, openings, fri_challenges, cfri, indices, params
) -> List:
    """Like fv.get_fri_inferred_elements but reading the deduped maps."""
    from ..field import goldilocks as gl
    from ..utils.bits import log2_strict, reverse_bits

    n = params.lde_size
    log_n = log2_strict(n)
    rab = params.reduction_arity_bits
    precomputed = fv.PrecomputedReducedOpenings(openings, fri_challenges.fri_alpha)
    out = []
    for x_index in indices:
        subgroup_x = gl.gmul(
            gl.MULTIPLICATIVE_GROUP_GENERATOR,
            gl.gexp(gl.primitive_root_of_unity(log_n), reverse_bits(x_index, log_n)),
        )
        initial = None
        initial = _lookup_initial(cfri, x_index)
        old_eval = fv.fri_combine_initial(
            instance, initial, fri_challenges.fri_alpha, subgroup_x,
            precomputed, params,
        )
        idx = x_index
        for i, arity_bits in enumerate(rab):
            out.append(tuple(old_eval))
            arity = 1 << arity_bits
            within = idx & (arity - 1)
            coset_index = idx >> arity_bits
            step = cfri.query_round_proofs.steps[i][coset_index]
            evals = list(step.evals)
            evals.insert(within, tuple(old_eval))
            old_eval = fv.compute_evaluation(
                subgroup_x, within, arity_bits, evals, fri_challenges.fri_betas[i]
            )
            subgroup_x = gl.exp_power_of_2(subgroup_x, arity_bits)
            idx = coset_index
    return out


def _lookup_initial(cfri, x_index):
    return cfri.query_round_proofs.initial_trees_proofs[x_index]


def verify_compressed_proof(cpwp, verifier_data, common) -> None:
    full = decompress_proof(cpwp, verifier_data, common)
    verify(full, verifier_data, common)
