"""STARK prover (reference: starky/src/prover.rs:39-480).

Trace commit -> constraint binding -> device quotient over the LDE coset
-> quotient commit -> zeta openings -> FRI. Reuses the PLONK machinery:
PolynomialBatch oracles and fri prove_openings.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..fri import oracle as fo
from ..gates.algebra import DeviceBatchAlgebra
from ..hash.challenger import Challenger
from ..ops import gf, ntt
from ..utils.bits import reverse_index_bits_perm
from .config import StarkConfig
from .lookup import (
    LookupCheckVars,
    all_lookup_helper_columns,
    get_grand_product_challenge_set,
)
from .proof import StarkOpeningSet, StarkProof, StarkProofWithPublicInputs
from .stark import ConstraintConsumer, Stark, StarkFrame
from .vanishing import eval_vanishing_generic, run_binding_step

_QUOTIENT_CACHE: Dict = {}


from ..plonk.prover import _natural_order_values


def _quotient_fn(stark: Stark, nc: int, rate_bits: int, uses_lookups: bool):
    key = (id(stark), nc, rate_bits, uses_lookups)
    if key in _QUOTIENT_CACHE:
        return _QUOTIENT_CACHE[key]

    next_step = 1 << rate_bits

    def fn(trace_nat, aux_nat, lchals, z_last, l_first, l_last, zh_inv, alphas, pis):
        b = trace_nat[0].shape[1]
        A = DeviceBatchAlgebra(b)

        def rows(nat):
            local = [(nat[0][i], nat[1][i]) for i in range(nat[0].shape[0])]
            nxt = [
                (
                    jnp.roll(nat[0][i], -next_step, axis=-1),
                    jnp.roll(nat[1][i], -next_step, axis=-1),
                )
                for i in range(nat[0].shape[0])
            ]
            return local, nxt

        local, nxt = rows(trace_nat)
        pis_b = [
            (
                jnp.broadcast_to(pis[0][i], (b,)),
                jnp.broadcast_to(pis[1][i], (b,)),
            )
            for i in range(pis[0].shape[0])
        ]
        alpha_elems = [
            (
                jnp.broadcast_to(alphas[0][i], (b,)),
                jnp.broadcast_to(alphas[1][i], (b,)),
            )
            for i in range(nc)
        ]
        frame = StarkFrame(local, nxt, pis_b)
        consumer = ConstraintConsumer(
            A,
            alpha_elems,
            (z_last[0], z_last[1]),
            (l_first[0], l_first[1]),
            (l_last[0], l_last[1]),
        )
        lookup_vars = None
        if uses_lookups:
            aux_local, aux_next = rows(aux_nat)
            chal_elems = [
                (
                    jnp.broadcast_to(lchals[0][i], (b,)),
                    jnp.broadcast_to(lchals[1][i], (b,)),
                )
                for i in range(lchals[0].shape[0])
            ]
            lookup_vars = LookupCheckVars(aux_local, aux_next, chal_elems)
        eval_vanishing_generic(stark, frame, consumer, A, lookup_vars)
        accs = consumer.accumulators()
        out_lo, out_hi = [], []
        for acc in accs:
            q = gf.mul(acc, (zh_inv[0], zh_inv[1]))
            out_lo.append(q[0])
            out_hi.append(q[1])
        return jnp.stack(out_lo), jnp.stack(out_hi)

    jfn = jax.jit(fn)
    _QUOTIENT_CACHE[key] = jfn
    return jfn


def prove(
    stark: Stark,
    config: StarkConfig,
    trace: np.ndarray,  # u64 [num_columns, degree]
    public_inputs: List[int],
) -> StarkProofWithPublicInputs:
    fri_config = config.fri_config
    rate_bits = fri_config.rate_bits
    cap_height = fri_config.cap_height
    nc = config.num_challenges

    num_cols, degree = trace.shape
    assert num_cols == stark.num_columns()
    degree_bits = degree.bit_length() - 1
    assert 1 << degree_bits == degree
    fri_params = config.fri_params(degree_bits)
    qdb = (stark.quotient_degree_factor() - 1).bit_length()  # log2_ceil
    assert qdb <= rate_bits, "quotient degree exceeds rate"

    # 1. trace commitment
    trace_commitment = fo.PolynomialBatch.from_values(
        gf.from_u64(trace), rate_bits, False, cap_height
    )

    challenger = Challenger()
    challenger.observe_elements([p % gl.P for p in public_inputs])
    config.observe(challenger)
    challenger.observe_cap(trace_commitment.cap_u64())

    # logUp lookups: grand-product challenges, helper columns, aux oracle
    # (prover.rs:163-240)
    lookup_challenges = None
    aux_commitment = None
    num_lookup_columns = 0
    if stark.uses_lookups():
        challenge_set = get_grand_product_challenge_set(challenger, nc)
        lookup_challenges = [ch.beta for ch in challenge_set.challenges]
        aux_cols = all_lookup_helper_columns(stark, trace, lookup_challenges)
        num_lookup_columns = len(aux_cols)
        aux_commitment = fo.PolynomialBatch.from_values(
            gf.from_u64(np.stack(aux_cols)), rate_bits, False, cap_height
        )
        challenger.observe_cap(aux_commitment.cap_u64())

    alphas_prime = challenger.get_n_challenges(nc)
    alphas = run_binding_step(
        stark,
        challenger,
        public_inputs,
        alphas_prime,
        degree_bits,
        num_aux=num_lookup_columns,
        lookup_challenges=lookup_challenges,
        num_lookup_columns=num_lookup_columns,
    )

    # 2. quotient over the full-rate coset
    n = degree
    lde_n = n << rate_bits
    pts = gl.two_adic_subgroup(degree_bits + rate_bits)
    shift = np.uint64(gl.MULTIPLICATIVE_GROUP_GENERATOR)
    xs = gl.np_mul(shift, pts)
    g_pow_n = gl.gexp(gl.MULTIPLICATIVE_GROUP_GENERATOR, n)
    zh_period = gl.np_sub(
        gl.np_mul(np.uint64(g_pow_n), gl.two_adic_subgroup(rate_bits)), np.uint64(1)
    )
    zh = np.tile(zh_period, lde_n // (1 << rate_bits))
    zh_inv = gl.np_batch_inverse(zh)
    n_mod = np.uint64(n % gl.P)
    l_first = gl.np_mul(
        zh, gl.np_batch_inverse(gl.np_mul(n_mod, gl.np_sub(xs, np.uint64(1))))
    )
    g = gl.primitive_root_of_unity(degree_bits)
    l_last = gl.np_mul(
        zh,
        gl.np_batch_inverse(
            gl.np_mul(n_mod, gl.np_sub(gl.np_mul(np.uint64(g), xs), np.uint64(1)))
        ),
    )
    last = gl.gexp(g, n - 1)
    z_last = gl.np_sub(xs, np.uint64(last))

    trace_nat = _natural_order_values(trace_commitment)
    qfn = _quotient_fn(stark, nc, rate_bits, stark.uses_lookups())

    def pair(vals):
        return gf.from_u64(np.array(vals, dtype=np.uint64))

    aux_nat = (
        _natural_order_values(aux_commitment) if aux_commitment is not None else pair([])
    )
    q_lo, q_hi = qfn(
        trace_nat,
        aux_nat,
        pair(lookup_challenges or []),
        gf.from_u64(z_last),
        gf.from_u64(l_first),
        gf.from_u64(l_last),
        gf.from_u64(zh_inv),
        pair(alphas),
        pair([p % gl.P for p in public_inputs]),
    )
    coeffs = ntt.coset_ifft_jit((q_lo, q_hi))  # [nc, lde_n]
    qdf = stark.quotient_degree_factor()
    # keep the first qdf degree-n chunks per challenge
    chunks_lo = coeffs[0].reshape(nc, 1 << rate_bits, n)[:, :qdf].reshape(nc * qdf, n)
    chunks_hi = coeffs[1].reshape(nc, 1 << rate_bits, n)[:, :qdf].reshape(nc * qdf, n)
    quotient_commitment = fo.PolynomialBatch.from_coeffs(
        (chunks_lo, chunks_hi), rate_bits, False, cap_height
    )
    challenger.observe_cap(quotient_commitment.cap_u64())

    # 3. openings
    zeta = challenger.get_extension_challenge(2)
    assert ge.ext_exp(zeta, 1 << degree_bits) != ge.ext_one(2), "zeta in subgroup"
    g_base = gl.primitive_root_of_unity(degree_bits)
    zeta_next = ge.ext_scalar_mul(zeta, g_base)
    openings = StarkOpeningSet(
        local_values=trace_commitment.eval_all_at_ext(zeta),
        next_values=trace_commitment.eval_all_at_ext(zeta_next),
        auxiliary_polys=(
            aux_commitment.eval_all_at_ext(zeta) if aux_commitment else None
        ),
        auxiliary_polys_next=(
            aux_commitment.eval_all_at_ext(zeta_next) if aux_commitment else None
        ),
        ctl_zs_first=None,
        quotient_polys=quotient_commitment.eval_all_at_ext(zeta),
    )
    fri_openings = openings.to_fri_openings()
    for batch in fri_openings.batches:
        challenger.observe_extension_elements(batch.values)

    instance = stark.fri_instance(zeta, g_base, config)
    commitments = [trace_commitment]
    if aux_commitment is not None:
        commitments.append(aux_commitment)
    commitments.append(quotient_commitment)
    opening_proof = fo.prove_openings(instance, commitments, challenger, fri_params)

    proof = StarkProof(
        trace_cap=trace_commitment.cap_u64(),
        auxiliary_polys_cap=(
            aux_commitment.cap_u64() if aux_commitment is not None else None
        ),
        quotient_polys_cap=quotient_commitment.cap_u64(),
        openings=openings,
        opening_proof=opening_proof,
    )
    return StarkProofWithPublicInputs(proof, [p % gl.P for p in public_inputs])
