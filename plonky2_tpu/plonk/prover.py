"""The PLONK prover (reference: plonky2/src/plonk/prover.rs:144-392).

Host drives witness generation and the transcript; all O(N) math —
wire/Z/quotient polynomial construction, commitments, FRI — runs as
device kernels.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..fri import oracle as fo
from ..hash import poseidon as hp
from ..hash.challenger import Challenger
from ..iop.generator import generate_partial_witness
from ..iop.witness import PartialWitness
from ..ops import gf, ntt
from ..utils.bits import reverse_index_bits_perm
from .circuit_data import CommonCircuitData, ProverOnlyCircuitData
from .proof import OpeningSet, Proof, ProofWithPublicInputs
from .vanishing import quotient_values_fn

Ext = Tuple[int, int]


def prove(
    prover_data: ProverOnlyCircuitData,
    common: CommonCircuitData,
    inputs: PartialWitness,
) -> ProofWithPublicInputs:
    config = common.config
    nc = config.num_challenges
    fri_config = config.fri_config

    # 1. witness generation (host fixpoint)
    partition_witness = generate_partial_witness(inputs, prover_data, common)
    public_inputs = partition_witness.get_targets(prover_data.public_inputs)
    public_inputs_hash = hp.hash_no_pad(public_inputs)
    witness = partition_witness.full_witness()

    # 2. oracle 1 — wires
    wires_dev = gf.from_u64(witness.wire_values)  # [num_wires, n]
    wires_commitment = fo.PolynomialBatch.from_values(
        wires_dev, fri_config.rate_bits, False, fri_config.cap_height
    )

    # 3. Fiat-Shamir head (Appendix A order)
    challenger = Challenger()
    common.fri_params.observe(challenger)
    challenger.observe_hash(prover_data.circuit_digest)
    challenger.observe_hash(public_inputs_hash)
    challenger.observe_cap(wires_commitment.cap_u64())
    betas = challenger.get_n_challenges(nc)
    gammas = challenger.get_n_challenges(nc)

    # 4. permutation argument: Z + partial products (host numpy, vectorized)
    zs_pp_np = _zs_and_partial_products(witness, betas, gammas, prover_data, common)
    zs_pp_commitment = fo.PolynomialBatch.from_values(
        gf.from_u64(zs_pp_np), fri_config.rate_bits, False, fri_config.cap_height
    )
    challenger.observe_cap(zs_pp_commitment.cap_u64())
    alphas = challenger.get_n_challenges(nc)

    # 5. quotient (device kernel over the whole coset)
    quotient_chunks = _compute_quotient_polys(
        common,
        prover_data,
        public_inputs_hash,
        wires_commitment,
        zs_pp_commitment,
        betas,
        gammas,
        alphas,
    )
    quotient_commitment = fo.PolynomialBatch.from_coeffs(
        quotient_chunks, fri_config.rate_bits, False, fri_config.cap_height
    )
    challenger.observe_cap(quotient_commitment.cap_u64())

    # 6. zeta + openings
    zeta = challenger.get_extension_challenge(2)
    n_bits = common.degree_bits
    assert ge.ext_exp(zeta, 1 << n_bits) != ge.ext_one(2), "zeta in subgroup"

    oracles = [
        prover_data.constants_sigmas_commitment,
        wires_commitment,
        zs_pp_commitment,
        quotient_commitment,
    ]
    g = gl.primitive_root_of_unity(n_bits)
    zeta_next = ge.ext_scalar_mul(zeta, g)
    cs_evals = prover_data.constants_sigmas_commitment.eval_all_at_ext(zeta)
    zs_pp_evals = zs_pp_commitment.eval_all_at_ext(zeta)
    zs_pp_next_evals = zs_pp_commitment.eval_all_at_ext(zeta_next)
    openings = OpeningSet(
        constants=cs_evals[common.constants_range().start : common.constants_range().stop],
        plonk_sigmas=cs_evals[common.sigmas_range().start : common.sigmas_range().stop],
        wires=wires_commitment.eval_all_at_ext(zeta),
        plonk_zs=zs_pp_evals[: nc],
        plonk_zs_next=zs_pp_next_evals[: nc],
        partial_products=zs_pp_evals[nc : common.num_zs_partial_products_polys()],
        quotient_polys=quotient_commitment.eval_all_at_ext(zeta),
        lookup_zs=[],
        lookup_zs_next=[],
    )
    fri_openings = openings.to_fri_openings()
    for batch in fri_openings.batches:
        challenger.observe_extension_elements(batch.values)

    # 7. FRI opening proof
    instance = common.get_fri_instance(zeta)
    opening_proof = fo.prove_openings(
        instance, oracles, challenger, common.fri_params
    )

    proof = Proof(
        wires_cap=wires_commitment.cap_u64(),
        plonk_zs_partial_products_cap=zs_pp_commitment.cap_u64(),
        quotient_polys_cap=quotient_commitment.cap_u64(),
        openings=openings,
        opening_proof=opening_proof,
    )
    return ProofWithPublicInputs(proof, public_inputs)


# ---------------------------------------------------------------------------
# Permutation argument (prover.rs:396-480) — vectorized numpy on host.
# Sequential-looking prefix products become log-doubling scans; the row
# quotient computation is one batched inverse.
# ---------------------------------------------------------------------------


def _zs_and_partial_products(witness, betas, gammas, prover_data, common) -> np.ndarray:
    config = common.config
    nr = config.num_routed_wires
    n = common.degree
    chunk = common.permutation_partial_product_degree()
    num_prods = common.num_partial_products
    subgroup = prover_data.subgroup  # [n]
    k_is = np.array(common.k_is, dtype=np.uint64)
    wires = witness.wire_values[:nr].T  # [n, nr]
    sigmas = prover_data.sigmas  # [n, nr]

    z_cols = []
    pp_cols = []
    for beta, gamma in zip(betas, gammas):
        b = np.uint64(beta)
        gma = np.uint64(gamma)
        s_id = gl.np_mul(k_is[None, :], subgroup[:, None])  # [n, nr]
        numer = gl.np_add(gl.np_add(wires, gl.np_mul(b, s_id)), gma)
        denom = gl.np_add(gl.np_add(wires, gl.np_mul(b, sigmas)), gma)
        quot = gl.np_mul(numer, gl.np_batch_inverse(denom))  # [n, nr]
        # chunk products [n, nr/chunk]
        q = quot.reshape(n, nr // chunk, chunk)
        cp = q[:, :, 0]
        for j in range(1, chunk):
            cp = gl.np_mul(cp, q[:, :, j])
        # inclusive prefix products along the chunk axis
        cum = cp.copy()
        shift = 1
        while shift < cum.shape[1]:
            cum[:, shift:] = gl.np_mul(cum[:, shift:], cum[:, :-shift])
            shift <<= 1
        row_prod = cum[:, -1]  # [n]
        # exclusive prefix product over rows -> Z values
        z = np.ones(n, dtype=np.uint64)
        z[1:] = row_prod[:-1]
        shift = 1
        while shift < n:
            z[shift:] = gl.np_mul(z[shift:], z[:-shift])
            shift <<= 1
        # partial products: z[i] * cum[i, k] for k < num_prods
        pps = gl.np_mul(z[:, None], cum[:, :num_prods])  # [n, num_prods]
        z_cols.append(z)
        pp_cols.append(pps)

    polys = z_cols + [pp_cols[i][:, k] for i in range(len(betas)) for k in range(num_prods)]
    return np.stack(polys)  # [(1+num_prods)*nc, n]


# ---------------------------------------------------------------------------
# Quotient computation
# ---------------------------------------------------------------------------


def _natural_order_values(batch: fo.PolynomialBatch) -> gf.Gf:
    """Leaves are bit-reversed point-major [lde_n, M]; return poly-major
    natural order [M, lde_n]."""
    leaves = batch.merkle_tree.leaves
    perm = reverse_index_bits_perm(leaves[0].shape[0])
    lo = jnp.take(leaves[0], perm, axis=0).T
    hi = jnp.take(leaves[1], perm, axis=0).T
    return lo, hi


def _compute_quotient_polys(
    common,
    prover_data,
    public_inputs_hash,
    wires_commitment,
    zs_pp_commitment,
    betas,
    gammas,
    alphas,
):
    config = common.config
    qdb = common.quotient_degree_factor.bit_length() - 1
    assert (1 << qdb) == common.quotient_degree_factor
    assert qdb <= config.fri_config.rate_bits
    assert qdb == config.fri_config.rate_bits, (
        "strided sub-LDE sampling (rate > quotient degree) lands later"
    )
    n_bits = common.degree_bits
    lde_n = common.lde_size
    n = common.degree

    # host precomputations over the coset
    pts = gl.two_adic_subgroup(n_bits + qdb)  # [lde_n]
    shift = np.uint64(gl.MULTIPLICATIVE_GROUP_GENERATOR)
    shifted_xs = gl.np_mul(shift, pts)
    # Z_H(shift*w^i) = shift^n * (w^i)^n - 1, periodic with period 2^qdb
    g_pow_n = gl.gexp(gl.MULTIPLICATIVE_GROUP_GENERATOR, n)
    zh_period = gl.np_sub(
        gl.np_mul(np.uint64(g_pow_n), gl.two_adic_subgroup(qdb)), np.uint64(1)
    )
    zh = np.tile(zh_period, lde_n // (1 << qdb))
    # NOTE subtlety: evals indexed by i use subgroup(qdb) in *power* order of
    # w^(n*i) = v^i where v = primitive 2^qdb-th root; i % 2^qdb cycles ✓
    zh_inv = gl.np_batch_inverse(zh)
    l0 = gl.np_mul(
        zh,
        gl.np_batch_inverse(
            gl.np_mul(np.uint64(n % gl.P), gl.np_sub(shifted_xs, np.uint64(1)))
        ),
    )

    cs_nat = _natural_order_values(prover_data.constants_sigmas_commitment)
    wires_nat = _natural_order_values(wires_commitment)
    zs_pp_nat = _natural_order_values(zs_pp_commitment)

    def pair_arr(vals: List[int]):
        a = np.array(vals, dtype=np.uint64)
        return gf.from_u64(a)

    qfn = quotient_values_fn(common)
    q_lo, q_hi = qfn(
        cs_nat,
        wires_nat,
        zs_pp_nat,
        gf.from_u64(shifted_xs),
        gf.from_u64(l0),
        gf.from_u64(zh_inv),
        pair_arr(betas),
        pair_arr(gammas),
        pair_arr(alphas),
        pair_arr(list(public_inputs_hash)),
    )
    # coset-IFFT back to coefficients, split into degree-n chunks
    coeffs = jax.jit(ntt.coset_ifft)((q_lo, q_hi))  # [nc, lde_n]
    nc = config.num_challenges
    chunks_lo = coeffs[0].reshape(nc * common.quotient_degree_factor, n)
    chunks_hi = coeffs[1].reshape(nc * common.quotient_degree_factor, n)
    return chunks_lo, chunks_hi
