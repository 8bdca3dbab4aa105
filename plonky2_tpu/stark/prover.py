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
from .cross_table_lookup import build_ctl_check_vars
from .lookup import (
    GrandProductChallenge,
    LookupCheckVars,
    all_lookup_helper_columns,
    get_grand_product_challenge_set,
)
from .proof import StarkOpeningSet, StarkProof, StarkProofWithPublicInputs
from .stark import ConstraintConsumer, Stark, StarkFrame
from .vanishing import eval_vanishing_generic, run_binding_step

_QUOTIENT_CACHE: Dict = {}


from ..plonk.prover import _natural_order_values


def _ctl_entries_with_challenge_idx(ctl_data, ctl_challenges):
    """Static (helper_count, columns, filters, challenge_index) per
    zs_column, matching cross_table_lookup.ctl_zs_entries ordering."""
    entries = []
    for z in ctl_data.zs_columns:
        ci = next(
            i
            for i, c in enumerate(ctl_challenges.challenges)
            if c.beta == z.challenge.beta and c.gamma == z.challenge.gamma
        )
        entries.append((len(z.helper_columns), z.columns, z.filter, ci))
    return entries


from functools import lru_cache


@lru_cache(maxsize=None)
def _stark_coset_constants(degree_bits: int, rate_bits: int):
    """(xs, zh_inv, l_first, l_last, z_last) over the full-rate coset —
    witness-independent, so cached per shape: the three lde_n-sized host
    batch inverses cost ~18 s of interpreted numpy PER PROVE at 2^20
    (measured 80% of the warm prove)."""
    n = 1 << degree_bits
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
    return xs, zh_inv, l_first, l_last, z_last


def _quotient_fn(
    stark: Stark,
    nc: int,
    rate_bits: int,
    uses_lookups: bool,
    ctl_entries=None,
    num_lookup_cols_static: int = 0,
):
    key = (id(stark), nc, rate_bits, uses_lookups, repr(ctl_entries), num_lookup_cols_static)
    if key in _QUOTIENT_CACHE:
        return _QUOTIENT_CACHE[key]

    next_step = 1 << rate_bits

    def fn(trace_nat, aux_nat, lchals, cchals, z_last, l_first, l_last, zh_inv, alphas, pis):
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
        ctl_vars = None
        if uses_lookups or ctl_entries:
            aux_local, aux_next = rows(aux_nat)

            def bcast(arrs, i):
                return (
                    jnp.broadcast_to(arrs[0][i], (b,)),
                    jnp.broadcast_to(arrs[1][i], (b,)),
                )

            if uses_lookups:
                chal_elems = [bcast(lchals, i) for i in range(lchals[0].shape[0])]
                lookup_vars = LookupCheckVars(aux_local, aux_next, chal_elems)
            if ctl_entries:
                gp_elems = [
                    GrandProductChallenge(bcast(cchals, 2 * i), bcast(cchals, 2 * i + 1))
                    for i in range(cchals[0].shape[0] // 2)
                ]
                ctl_vars = build_ctl_check_vars(
                    ctl_entries, aux_local, aux_next, num_lookup_cols_static, gp_elems
                )
        eval_vanishing_generic(stark, frame, consumer, A, lookup_vars, ctl_vars)
        accs = consumer.accumulators()
        out_lo, out_hi = [], []
        for acc in accs:
            q = gf.mul(acc, (zh_inv[0], zh_inv[1]))
            out_lo.append(q[0])
            out_hi.append(q[1])
        return jnp.stack(out_lo), jnp.stack(out_hi)

    fn.__name__ = "stark_quotient"
    jfn = jax.jit(fn)
    _QUOTIENT_CACHE[key] = jfn
    return jfn


def verifier_circuit_padding(verifier_circuit_fri_params):
    """(final_poly_coeff_len, max_num_query_steps) so the FRI transcript
    is padded to the shape a unified multi-degree recursive verifier was
    built for (starky/src/prover.rs:61-76; plonky2/src/fri/prover.rs:78)."""
    if verifier_circuit_fri_params is None:
        return None, None
    db = verifier_circuit_fri_params.degree_bits
    for ab in verifier_circuit_fri_params.reduction_arity_bits:
        db -= ab
    return 1 << db, len(verifier_circuit_fri_params.reduction_arity_bits)


def zk_mask_degree(config: StarkConfig) -> int:
    """Degree bound for the Z_H-multiplied random mask R: every revealed
    evaluation of T' = T + Z_H*R off the subgroup (zeta, g*zeta, and one
    coset point per FRI query round) must stay simulatable, so
    deg(R) >= #revealed - 1 with slack."""
    return config.fri_config.num_query_rounds + 4


def prove(
    stark: Stark,
    config: StarkConfig,
    trace: np.ndarray,  # u64 [num_columns, degree]
    public_inputs: List[int],
    verifier_circuit_fri_params=None,
    zero_knowledge: bool = False,
) -> StarkProofWithPublicInputs:
    """Single-table proof (prover.rs:39-113): commit the trace, start the
    transcript, delegate to prove_with_commitment.

    verifier_circuit_fri_params: the (max-degree) FriParams of a unified
    recursive verifier circuit that will consume this proof; pads the
    FRI transcript with zero caps / zero final-poly coefficients so one
    circuit verifies proofs of any supported degree.

    zero_knowledge: mask every trace column with Z_H*R (R random,
    degree > num query rounds) committed as split low/high halves with
    salted leaves, and open via split-mask expressions
    (core/src/fri_structure.rs:76-89) — the openings and query leaves
    then leak nothing about the witness."""
    num_cols, degree = trace.shape
    degree_bits = degree.bit_length() - 1
    zk_split = None
    if zero_knowledge:
        assert not stark.uses_lookups(), "zk starky with lookups lands later"
        m = zk_mask_degree(config)
        assert m + 1 < degree, "trace too short to hide the query pattern"
        rng = np.random.default_rng()
        r = rng.integers(0, gl.P, size=(num_cols, m + 1), dtype=np.uint64)
        t_coeffs = ntt.ifft_jit(gf.from_u64(trace))  # [C, n]
        r_pad = np.zeros((num_cols, degree), dtype=np.uint64)
        r_pad[:, : m + 1] = r
        r_dev = gf.from_u64(r_pad)
        # T' = T - R + X^n R: lows = t - R, highs = R
        lows = gf.sub(t_coeffs, r_dev)
        coeffs = (
            jnp.concatenate([lows[0], r_dev[0]], axis=0),
            jnp.concatenate([lows[1], r_dev[1]], axis=0),
        )  # [2C, n]
        trace_commitment = fo.PolynomialBatch.from_coeffs(
            coeffs, config.fri_config.rate_bits, True,
            config.fri_config.cap_height,
        )
        zk_split = degree
    else:
        trace_commitment = fo.PolynomialBatch.from_values(
            gf.from_u64(trace), config.fri_config.rate_bits, False,
            config.fri_config.cap_height,
        )
    challenger = Challenger()
    challenger.observe_elements([p % gl.P for p in public_inputs])
    config.observe(challenger)
    challenger.observe_cap(trace_commitment.cap_u64())
    return prove_with_commitment(
        stark, config, trace, trace_commitment, None, None, challenger, public_inputs,
        verifier_circuit_fri_params=verifier_circuit_fri_params,
        zk_split=zk_split,
    )


def compute_quotient_chunks(
    stark: Stark,
    nc: int,
    rate_bits: int,
    degree_bits: int,
    trace_nat: gf.Gf,
    alphas: List[int],
    public_inputs: List[int],
    qdf: int,
    *,
    aux_nat=None,
    lookup_challenges=None,
    ctl_entries=None,
    cchal_flat=(),
    num_lookup_columns: int = 0,
) -> gf.Gf:
    """Evaluate the combined constraint quotient over the full-rate coset
    and split it into qdf degree-n coefficient chunks per challenge
    (prover.rs:290-350). trace_nat: natural-order coset LDE values
    [num_columns, n << rate_bits] (zk masking already applied). Shared by
    the single-table prover and the batch-STARK prover."""
    n = 1 << degree_bits
    xs, zh_inv, l_first, l_last, z_last = _stark_coset_constants(
        degree_bits, rate_bits
    )

    qfn = _quotient_fn(
        stark,
        nc,
        rate_bits,
        stark.uses_lookups(),
        ctl_entries=ctl_entries,
        num_lookup_cols_static=num_lookup_columns,
    )

    def pair(vals):
        return gf.from_u64(np.array(vals, dtype=np.uint64))

    q_lo, q_hi = qfn(
        trace_nat,
        aux_nat if aux_nat is not None else pair([]),
        pair(lookup_challenges or []),
        pair(list(cchal_flat)),
        gf.from_u64(z_last),
        gf.from_u64(l_first),
        gf.from_u64(l_last),
        gf.from_u64(zh_inv),
        pair(alphas),
        pair([p % gl.P for p in public_inputs]),
    )
    coeffs = ntt.coset_ifft_jit((q_lo, q_hi))  # [nc, lde_n]
    # keep the first qdf degree-n chunks per challenge (zk: one extra
    # chunk absorbs the mask-degree overflow d*m)
    chunks_lo = coeffs[0].reshape(nc, 1 << rate_bits, n)[:, :qdf].reshape(nc * qdf, n)
    chunks_hi = coeffs[1].reshape(nc, 1 << rate_bits, n)[:, :qdf].reshape(nc * qdf, n)
    return chunks_lo, chunks_hi


def prove_with_commitment(
    stark: Stark,
    config: StarkConfig,
    trace: np.ndarray,
    trace_commitment,
    ctl_data,  # Optional[CtlData]
    ctl_challenges,  # Optional[GrandProductChallengeSet]
    challenger: Challenger,
    public_inputs: List[int],
    verifier_circuit_fri_params=None,
    zk_split=None,
) -> StarkProofWithPublicInputs:
    """Proof body after the trace cap has been observed; supports lookups
    and cross-table lookups (prover.rs:124-460). The config must already
    have been observed by the caller.

    zk_split: when set (= degree n), the trace commitment holds split
    low/high halves of Z_H-masked columns and the proof opens them via
    split-mask expressions; all oracles are salted."""
    fri_config = config.fri_config
    rate_bits = fri_config.rate_bits
    cap_height = fri_config.cap_height
    nc = config.num_challenges

    num_cols, degree = trace.shape
    assert num_cols == stark.num_columns()
    degree_bits = degree.bit_length() - 1
    assert 1 << degree_bits == degree
    zk = zk_split is not None
    fri_params = config.fri_config.fri_params(degree_bits, leaf_hiding=zk)
    qdf_eff = stark.quotient_degree_factor() + (1 if zk else 0)
    qdb = (qdf_eff - 1).bit_length()  # log2_ceil
    assert qdb <= rate_bits, "quotient degree exceeds rate"

    # logUp lookups: grand-product challenges, helper columns (prover.rs:163-194)
    lookup_challenges = None
    num_lookup_columns = 0
    aux_cols: List[np.ndarray] = []
    if stark.uses_lookups():
        if ctl_challenges is not None:
            challenge_set = ctl_challenges
        else:
            challenge_set = get_grand_product_challenge_set(challenger, nc)
        lookup_challenges = [ch.beta for ch in challenge_set.challenges]
        aux_cols = all_lookup_helper_columns(stark, trace, lookup_challenges)
        num_lookup_columns = len(aux_cols)

    # CTL aux polys batch-committed together with lookup columns
    # (prover.rs:198-240)
    ctl_entries = None
    num_ctl_helpers = 0
    num_ctl_zs = 0
    if ctl_data is not None and ctl_data.zs_columns:
        helpers = ctl_data.ctl_helper_polys()
        zs = ctl_data.ctl_z_polys()
        num_ctl_helpers, num_ctl_zs = len(helpers), len(zs)
        aux_cols = aux_cols + helpers + zs
        ctl_entries = _ctl_entries_with_challenge_idx(ctl_data, ctl_challenges)

    aux_commitment = None
    if aux_cols:
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
        num_aux=len(aux_cols),
        lookup_challenges=lookup_challenges,
        num_lookup_columns=num_lookup_columns,
        ctl_entries=ctl_entries,
        ctl_challenges=ctl_challenges,
    )

    # 2. quotient over the full-rate coset
    trace_nat = _natural_order_values(trace_commitment)
    if zk:
        # combine committed halves into masked values on the coset:
        # T'(x) = low(x) + x^n * high(x); x^n = shift^n * v^i is periodic
        # with period 2^rate_bits over the natural-order lde domain
        xn_period = gl.np_mul(
            np.uint64(gl.gexp(gl.MULTIPLICATIVE_GROUP_GENERATOR, degree)),
            gl.two_adic_subgroup(rate_bits),
        )
        xn = gf.from_u64(np.tile(xn_period, degree))
        low_nat = (trace_nat[0][:num_cols], trace_nat[1][:num_cols])
        high_nat = (trace_nat[0][num_cols:], trace_nat[1][num_cols:])
        xn_b = (
            jnp.broadcast_to(xn[0], high_nat[0].shape),
            jnp.broadcast_to(xn[1], high_nat[1].shape),
        )
        trace_nat = gf.add(low_nat, gf.mul(high_nat, xn_b))
    aux_nat = (
        _natural_order_values(aux_commitment) if aux_commitment is not None else None
    )
    cchal_flat = []
    if ctl_challenges is not None and ctl_entries:
        for c in ctl_challenges.challenges:
            cchal_flat.extend([c.beta, c.gamma])
    chunks_lo, chunks_hi = compute_quotient_chunks(
        stark,
        nc,
        rate_bits,
        degree_bits,
        trace_nat,
        alphas,
        public_inputs,
        qdf_eff,
        aux_nat=aux_nat,
        lookup_challenges=lookup_challenges,
        ctl_entries=ctl_entries,
        cchal_flat=cchal_flat,
        num_lookup_columns=num_lookup_columns,
    )
    quotient_commitment = fo.PolynomialBatch.from_coeffs(
        (chunks_lo, chunks_hi), rate_bits, zk, cap_height
    )
    challenger.observe_cap(quotient_commitment.cap_u64())

    # 3. openings
    zeta = challenger.get_extension_challenge(2)
    assert ge.ext_exp(zeta, 1 << degree_bits) != ge.ext_one(2), "zeta in subgroup"
    g_base = gl.primitive_root_of_unity(degree_bits)
    zeta_next = ge.ext_scalar_mul(zeta, g_base)
    ctl_zs_first = None
    if ctl_entries:
        aux_at_one = aux_commitment.eval_all_at_ext((1, 0))
        ctl_zs_first = [
            v[0] for v in aux_at_one[num_lookup_columns + num_ctl_helpers :]
        ]
    def _trace_evals(point):
        evals = trace_commitment.eval_all_at_ext(point)
        if not zk:
            return evals
        zn = ge.ext_exp(tuple(point), degree)
        return [
            ge.ext_add(lo, ge.ext_mul(zn, hi))
            for lo, hi in zip(evals[:num_cols], evals[num_cols:])
        ]

    openings = StarkOpeningSet(
        local_values=_trace_evals(zeta),
        next_values=_trace_evals(zeta_next),
        auxiliary_polys=(
            aux_commitment.eval_all_at_ext(zeta) if aux_commitment else None
        ),
        auxiliary_polys_next=(
            aux_commitment.eval_all_at_ext(zeta_next) if aux_commitment else None
        ),
        ctl_zs_first=ctl_zs_first,
        quotient_polys=quotient_commitment.eval_all_at_ext(zeta),
    )
    fri_openings = openings.to_fri_openings()
    for batch in fri_openings.batches:
        challenger.observe_extension_elements(batch.values)

    instance = stark.fri_instance(
        zeta, g_base, config, num_ctl_helpers=num_ctl_helpers, num_ctl_zs=num_ctl_zs,
        zk_degree=degree if zk else 0,
    )
    commitments = [trace_commitment]
    if aux_commitment is not None:
        commitments.append(aux_commitment)
    commitments.append(quotient_commitment)
    if verifier_circuit_fri_params is not None:
        assert verifier_circuit_fri_params.config == fri_params.config, (
            "unified verifier circuit must share the FriConfig"
        )
    fpcl, mnqs = verifier_circuit_padding(verifier_circuit_fri_params)
    opening_proof = fo.prove_openings(
        instance, commitments, challenger, fri_params,
        final_poly_coeff_len=fpcl, max_num_query_steps=mnqs,
    )

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
