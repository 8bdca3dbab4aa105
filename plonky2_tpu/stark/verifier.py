"""STARK verification (reference: starky/src/verifier.rs:30-280,
get_challenges.rs)."""

from __future__ import annotations

from typing import List

from ..field import extension as ge
from ..field import goldilocks as gl
from ..fri import verifier as fv
from ..hash.challenger import Challenger
from .config import StarkConfig
from .lookup import get_grand_product_challenge_set
from .proof import StarkProofChallenges, StarkProofWithPublicInputs
from .stark import Stark
from .vanishing import eval_vanishing_at_point, run_binding_step


class StarkVerificationError(Exception):
    pass


def _ensure(cond, msg):
    if not cond:
        raise StarkVerificationError(msg)


def get_challenges(
    stark: Stark,
    config: StarkConfig,
    proof_with_pis: StarkProofWithPublicInputs,
    degree_bits: int,
) -> StarkProofChallenges:
    proof = proof_with_pis.proof
    nc = config.num_challenges
    ch = Challenger()
    ch.observe_elements([p % gl.P for p in proof_with_pis.public_inputs])
    config.observe(ch)
    ch.observe_cap(proof.trace_cap)

    # lookup challenges are drawn before the aux cap is observed
    # (get_challenges.rs:66-81)
    lookup_challenges = None
    num_lookup_columns = stark.num_lookup_helper_columns(config)
    if stark.uses_lookups():
        challenge_set = get_grand_product_challenge_set(ch, nc)
        lookup_challenges = [c.beta for c in challenge_set.challenges]
    if proof.auxiliary_polys_cap is not None:
        ch.observe_cap(proof.auxiliary_polys_cap)

    alphas_prime = ch.get_n_challenges(nc)
    num_aux = (
        len(proof.openings.auxiliary_polys)
        if proof.openings.auxiliary_polys is not None
        else 0
    )
    alphas = run_binding_step(
        stark,
        ch,
        proof_with_pis.public_inputs,
        alphas_prime,
        degree_bits,
        num_aux=num_aux,
        lookup_challenges=lookup_challenges,
        num_lookup_columns=num_lookup_columns,
    )
    ch.observe_cap(proof.quotient_polys_cap)
    zeta = ch.get_extension_challenge(2)
    for batch in proof.openings.to_fri_openings().batches:
        ch.observe_extension_elements(batch.values)
    fri_challenges = fv.fri_challenges(
        ch,
        proof.opening_proof.commit_phase_merkle_caps,
        proof.opening_proof.final_poly,
        proof.opening_proof.pow_witness,
        degree_bits,
        config.fri_config,
    )
    return StarkProofChallenges(
        lookup_challenges=lookup_challenges,
        stark_alphas_prime=alphas_prime,
        simulating_zetas=[],
        stark_zeta_prime=(0, 0),
        stark_alphas=alphas,
        stark_zeta=zeta,
        fri_challenges=fri_challenges,
    )


def verify_stark_proof(
    stark: Stark,
    proof_with_pis: StarkProofWithPublicInputs,
    config: StarkConfig,
    degree_bits: int,
) -> None:
    proof = proof_with_pis.proof
    _ensure(
        len(proof_with_pis.public_inputs) == stark.num_public_inputs(),
        "wrong number of public inputs",
    )
    challenges = get_challenges(stark, config, proof_with_pis, degree_bits)

    o = proof.openings
    zeta = challenges.stark_zeta
    vanishing = eval_vanishing_at_point(
        stark,
        o,
        proof_with_pis.public_inputs,
        challenges.stark_alphas,
        zeta,
        degree_bits,
        lookup_challenges=challenges.lookup_challenges,
        num_lookup_columns=stark.num_lookup_helper_columns(config),
    )

    zeta_pow_deg = ge.ext_exp(zeta, 1 << degree_bits)
    z_h_zeta = ge.ext_sub(zeta_pow_deg, ge.ext_one(2))
    qdf = stark.quotient_degree_factor()
    for i in range(config.num_challenges):
        chunk = o.quotient_polys[i * qdf : (i + 1) * qdf]
        acc = ge.ext_zero(2)
        for c in reversed(chunk):
            acc = ge.ext_add(ge.ext_mul(acc, zeta_pow_deg), c)
        _ensure(
            vanishing[i] == ge.ext_mul(z_h_zeta, acc),
            f"quotient identity failed for challenge {i}",
        )

    g = gl.primitive_root_of_unity(degree_bits)
    instance = stark.fri_instance(zeta, g, config)
    merkle_caps = [proof.trace_cap]
    if proof.auxiliary_polys_cap is not None:
        merkle_caps.append(proof.auxiliary_polys_cap)
    merkle_caps.append(proof.quotient_polys_cap)
    fv.verify_fri_proof(
        instance,
        o.to_fri_openings(),
        challenges.fri_challenges,
        merkle_caps,
        proof.opening_proof,
        config.fri_params(degree_bits),
    )
