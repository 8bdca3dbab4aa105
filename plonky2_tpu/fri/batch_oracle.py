"""Batch FRI: polynomials of multiple degrees committed in one
BatchMerkleTree and opened with a single FRI argument that absorbs each
smaller degree group as the fold reaches its size (reference:
plonky2/src/batch_fri/{oracle.rs,prover.rs,verifier.rs}).

Each degree group g holds coeff arrays [m_g, n_g] (device); the batch
tree's matrix g is the bit-reversed point-major LDE of group g. Per
instance (one per degree), the opening reduction reuses the standard
composition/divide-by-linear kernels; the commit phase folds the largest
final polynomial and adds `beta * folded + next_group_final` when sizes
meet (prover.rs:88-140)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..hash.challenger import Challenger
from ..ops import fri_kernels as fk
from ..ops import gf, merkle, ntt
from ..utils.bits import log2_strict, reverse_bits
from .config import FriConfig, FriParams
from .oracle import reduce_openings_to_final_poly
from .proof import (
    FriInitialTreeProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
    MerkleProof,
)
from .structure import FriChallenges, FriInstanceInfo, FriOpenings
from .verifier import (
    FriVerificationError,
    PrecomputedReducedOpenings,
    _ensure,
    compute_evaluation,
    fri_combine_initial,
    fri_verify_proof_of_work,
    verify_merkle_proof_to_cap,
)


@dataclass
class BatchFriOracle:
    """Per-group device coeffs + one batch Merkle commitment."""

    polynomials: List[gf.Gf]  # per group [m_g, n_g]
    degree_bits: List[int]
    batch_merkle_tree: merkle.BatchDeviceMerkleTree
    rate_bits: int
    blinding: bool

    @staticmethod
    def from_values(
        value_groups: Sequence[gf.Gf],
        rate_bits: int,
        blinding: bool,
        cap_height: int,
    ) -> "BatchFriOracle":
        coeff_groups = [ntt.ifft_jit(v) for v in value_groups]
        return BatchFriOracle.from_coeffs(coeff_groups, rate_bits, blinding, cap_height)

    @staticmethod
    def from_coeffs(
        coeff_groups: Sequence[gf.Gf],
        rate_bits: int,
        blinding: bool,
        cap_height: int,
    ) -> "BatchFriOracle":
        assert not blinding, "batch oracle blinding not supported yet"
        matrices = [fk.lde_leaves(c, rate_bits) for c in coeff_groups]
        tree = merkle.BatchDeviceMerkleTree.build(list(matrices), cap_height)
        return BatchFriOracle(
            polynomials=list(coeff_groups),
            degree_bits=[log2_strict(c[0].shape[-1]) for c in coeff_groups],
            batch_merkle_tree=tree,
            rate_bits=rate_bits,
            blinding=blinding,
        )

    def group_view(self, g: int):
        """Oracle-like view exposing group g's polynomials (instances
        index polynomials locally within their degree group)."""

        class _View:
            pass

        v = _View()
        v.polynomials = self.polynomials[g]
        return v


def prove_batch_openings(
    degree_bits: List[int],
    instances: List[FriInstanceInfo],
    oracle,
    challenger: Challenger,
    fri_params: FriParams,
) -> FriProof:
    """BatchFriOracle::prove_openings (oracle.rs:163-230): one reduced
    final polynomial per instance, sharing one alpha (powers reset per
    instance via the shift), then the batch FRI argument.

    oracle: a BatchFriOracle, or a list of them (the reference's
    ``oracles: &[&Self]``) — instance oracle index t reads group g of
    oracles[t], so e.g. a batch-STARK commits traces in one batch tree
    and quotients in another."""
    oracles = [oracle] if isinstance(oracle, BatchFriOracle) else list(oracle)
    assert len(degree_bits) == len(instances)
    assert degree_bits == sorted(degree_bits, reverse=True)
    alpha = challenger.get_extension_challenge(2)

    final_coeffs = []
    final_values = []
    for g, instance in enumerate(instances):
        assert len(instance.oracles) == len(oracles), (
            "every instance must reference one FriOracleInfo per batch oracle"
        )
        views = [oracles[t].group_view(g) for t in range(len(oracles))]
        final = reduce_openings_to_final_poly(instance, views, alpha)
        lde_size = 1 << (degree_bits[g] + fri_params.config.rate_bits)
        n = final[0].shape[0]
        pad = [(0, lde_size - n), (0, 0)]
        lde_coeffs = (jnp.pad(final[0], pad), jnp.pad(final[1], pad))
        final_coeffs.append(lde_coeffs)
        final_values.append(fk.ext_coset_fft(lde_coeffs))

    return batch_fri_proof(
        [o.batch_merkle_tree for o in oracles],
        final_coeffs[0],
        final_values,
        challenger,
        fri_params,
    )


def _num_oracles(instance: FriInstanceInfo) -> int:
    return len(instance.oracles)


def batch_fri_proof(
    batch_trees,
    lde_polynomial_coeffs: gf.Gf,
    lde_polynomial_values: List[gf.Gf],
    challenger: Challenger,
    fri_params: FriParams,
) -> FriProof:
    """prover.rs:25-151. batch_trees: one BatchDeviceMerkleTree or a
    list (initial query openings prove against each)."""
    if isinstance(batch_trees, merkle.BatchDeviceMerkleTree):
        batch_trees = [batch_trees]
    n = lde_polynomial_coeffs[0].shape[0]
    assert lde_polynomial_values[0][0].shape[0] == n
    sizes = [v[0].shape[0] for v in lde_polynomial_values]
    assert sizes == sorted(sizes, reverse=True) and len(set(sizes)) == len(sizes)

    # arity schedule must visit every degree
    cur_n = log2_strict(n)
    cur_poly = 1
    for ab in fri_params.reduction_arity_bits:
        cur_n -= ab
        if cur_poly < len(sizes) and cur_n == log2_strict(sizes[cur_poly]):
            cur_poly += 1
    assert cur_poly == len(sizes), "reduction arities never reach some degree group"

    trees, final_poly = _batch_fri_committed_trees(
        lde_polynomial_coeffs, lde_polynomial_values, challenger, fri_params
    )
    for c in final_poly:
        challenger.observe_extension_element(c)

    from .prover import _fri_proof_of_work

    pow_witness = _fri_proof_of_work(challenger, fri_params.config)
    query_indices = [
        c % n for c in challenger.get_n_challenges(fri_params.config.num_query_rounds)
    ]
    rounds = _batch_query_rounds(batch_trees, trees, query_indices, fri_params)
    return FriProof(
        commit_phase_merkle_caps=[t.cap_u64() for t in trees],
        query_round_proofs=rounds,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )


def _batch_fri_committed_trees(
    coeffs: gf.Gf,
    values_list: List[gf.Gf],
    challenger: Challenger,
    fri_params: FriParams,
):
    from .prover import _refold_values

    trees = []
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    poly_index = 1
    values = values_list[0]
    arities = fri_params.reduction_arity_bits
    beta = None
    for step, arity_bits in enumerate(arities):
        arity = 1 << arity_bits
        tree = fk.commit_phase_tree(values, arity_bits, fri_params.config.cap_height)
        challenger.observe_cap(tree.cap_u64())
        trees.append(tree)

        beta = challenger.get_extension_challenge(2)
        beta_pows = [ge.ext_one(2)]
        for _ in range(arity - 1):
            beta_pows.append(ge.ext_mul(beta_pows[-1], beta))
        coeffs = fk.fold_coeffs(
            coeffs, gf.from_u64(np.array(beta_pows, dtype=np.uint64)), arity_bits
        )
        if step + 1 == len(arities):
            continue
        shift = gl.gexp(shift, arity)
        values = _refold_values((coeffs[0], coeffs[1]), shift)
        if (
            poly_index != len(values_list)
            and values[0].shape[0] == values_list[poly_index][0].shape[0]
        ):
            # absorb the next degree group: v' = beta * folded + next
            # (prover.rs:127-139)
            b = gf.ext2_const(beta)
            scaled = gf.ext2_mul(
                values,
                (
                    jnp.broadcast_to(b[0], values[0].shape),
                    jnp.broadcast_to(b[1], values[1].shape),
                ),
            )
            values = gf.add(scaled, values_list[poly_index])
            poly_index += 1
            # back to coefficient form on the shifted coset
            coeffs = _coset_ifft_ext(values, shift)
    assert poly_index == len(values_list)

    final_len = coeffs[0].shape[0] >> fri_params.config.rate_bits
    fc = gf.to_u64((coeffs[0][:final_len], coeffs[1][:final_len]))
    final_poly = [(int(a), int(b)) for a, b in fc]
    return trees, final_poly


def _coset_ifft_ext(values: gf.Gf, shift: int) -> gf.Gf:
    comp = (values[0].T, values[1].T)  # [2, N]
    coeffs = ntt.coset_ifft(comp, shift)
    return coeffs[0].T, coeffs[1].T


def _batch_query_rounds(
    batch_trees: List[merkle.BatchDeviceMerkleTree],
    trees,
    query_indices: List[int],
    fri_params: FriParams,
) -> List[FriQueryRound]:
    qi = np.array(query_indices, dtype=np.int64)
    # one initial opening per batch oracle (evals_proofs entry t = tree t)
    init = [(bt.values_batch(qi), bt.prove_batch(qi)) for bt in batch_trees]
    step_data = []
    xi = qi
    for i, arity_bits in enumerate(fri_params.reduction_arity_bits):
        coset = xi >> arity_bits
        t = trees[i]
        step_data.append((t.leaf_u64_batch(coset), t.prove_batch(coset)))
        xi = coset

    rounds = []
    for q in range(len(query_indices)):
        evals_proofs = [
            (
                [int(v) for rows in init_rows for v in rows[q]],
                MerkleProof([tuple(int(x) for x in s) for s in init_paths[q]]),
            )
            for init_rows, init_paths in init
        ]
        steps = []
        for leaves, sibs in step_data:
            flat = [int(v) for v in leaves[q]]
            evals = [tuple(flat[2 * k : 2 * k + 2]) for k in range(len(flat) // 2)]
            steps.append(
                FriQueryStep(
                    evals=evals,
                    merkle_proof=MerkleProof(
                        [tuple(int(x) for x in s) for s in sibs[q]]
                    ),
                )
            )
        rounds.append(
            FriQueryRound(
                initial_trees_proof=FriInitialTreeProof(evals_proofs=evals_proofs),
                steps=steps,
            )
        )
    return rounds


# ---------------------------------------------------------------------------
# Verifier (batch_fri/verifier.rs:24-250)
# ---------------------------------------------------------------------------


def verify_batch_fri_proof(
    degree_bits: List[int],
    instances: List[FriInstanceInfo],
    openings_list: List[FriOpenings],
    challenges: FriChallenges,
    initial_merkle_cap,
    leaf_heights,
    proof: FriProof,
    params: FriParams,
    hasher=None,
) -> None:
    """initial_merkle_cap / leaf_heights: one cap (np [2^h, 4]) and one
    height list per batch oracle; a bare cap / flat height list means a
    single shared oracle (the original API)."""
    if isinstance(initial_merkle_cap, np.ndarray):
        initial_merkle_caps = [initial_merkle_cap]
    else:
        initial_merkle_caps = list(initial_merkle_cap)
    if leaf_heights and not isinstance(leaf_heights[0], (list, tuple)):
        leaf_heights = [list(leaf_heights)]
    else:
        leaf_heights = [list(h) for h in leaf_heights]
    fri_verify_proof_of_work(challenges.fri_pow_response, params.config)
    _ensure(
        params.config.num_query_rounds == len(proof.query_round_proofs),
        "Number of query rounds does not match config",
    )
    precomputed = [
        PrecomputedReducedOpenings(o, challenges.fri_alpha) for o in openings_list
    ]
    lde_bits = [d + params.config.rate_bits for d in degree_bits]
    for x_index, round_proof in zip(
        challenges.fri_query_indices, proof.query_round_proofs
    ):
        _batch_verifier_query_round(
            lde_bits,
            instances,
            challenges,
            precomputed,
            initial_merkle_caps,
            leaf_heights,
            proof,
            x_index,
            round_proof,
            params,
            hasher,
        )


def _split_initial_rows(
    instances: List[FriInstanceInfo], evals_list: List[List[int]]
) -> List[List[int]]:
    """Per-oracle flat leaf values -> per-instance rows (verifier.rs:90-103):
    instance g's row is the concatenation, over batch oracles t, of the
    (t, g) slice — matching fri_combine_initial's contiguous-per-oracle
    eval layout."""
    T = len(evals_list)
    offsets = [0] * T
    out = []
    for inst in instances:
        _ensure(len(inst.oracles) == T, "instance/oracle-count mismatch")
        row: List[int] = []
        for t in range(T):
            num = inst.oracles[t].num_polys
            row.extend(evals_list[t][offsets[t] : offsets[t] + num])
            offsets[t] += num
        out.append(row)
    for t in range(T):
        _ensure(offsets[t] == len(evals_list[t]), "leaf width mismatch")
    return out


def _batch_verifier_query_round(
    lde_bits: List[int],
    instances: List[FriInstanceInfo],
    challenges: FriChallenges,
    precomputed: List[PrecomputedReducedOpenings],
    initial_merkle_caps: List[np.ndarray],
    leaf_heights: List[List[int]],
    proof: FriProof,
    x_index: int,
    round_proof: FriQueryRound,
    params: FriParams,
    hasher,
) -> None:
    _ensure(
        len(round_proof.initial_trees_proof.evals_proofs) == len(initial_merkle_caps),
        "initial proof count does not match batch oracle count",
    )
    for t, (evals, mproof) in enumerate(round_proof.initial_trees_proof.evals_proofs):
        # re-split tree t's flat leaf into its per-group matrices
        tree_rows = []
        pos = 0
        for g, inst in enumerate(instances):
            num = inst.oracles[t].num_polys
            tree_rows.append(evals[pos : pos + num])
            pos += num
        _ensure(pos == len(evals), "leaf width mismatch")
        _ensure(
            merkle.verify_batch_merkle_proof_to_cap(
                tree_rows,
                leaf_heights[t],
                x_index,
                initial_merkle_caps[t],
                mproof.siblings,
                hasher=hasher,
            ),
            f"batch Merkle proof {t} does not match cap",
        )
    rows = _split_initial_rows(
        instances, [ep[0] for ep in round_proof.initial_trees_proof.evals_proofs]
    )

    n = lde_bits[0]
    subgroup_x = gl.gmul(
        gl.MULTIPLICATIVE_GROUP_GENERATOR,
        gl.gexp(gl.primitive_root_of_unity(n), reverse_bits(x_index, n)),
    )
    batch_index = 0
    old_eval = _combine_instance(
        instances[0], rows[0], challenges.fri_alpha, subgroup_x, precomputed[0]
    )
    batch_index += 1

    for i, arity_bits in enumerate(params.reduction_arity_bits):
        arity = 1 << arity_bits
        step_evals = round_proof.steps[i].evals
        coset_index = x_index >> arity_bits
        x_in_coset = x_index & (arity - 1)
        _ensure(
            tuple(step_evals[x_in_coset]) == tuple(old_eval),
            "batch FRI fold consistency check failed",
        )
        old_eval = compute_evaluation(
            subgroup_x, x_in_coset, arity_bits, step_evals, challenges.fri_betas[i]
        )
        flat = [c for e in step_evals for c in e]
        verify_merkle_proof_to_cap(
            flat,
            coset_index,
            proof.commit_phase_merkle_caps[i],
            round_proof.steps[i].merkle_proof,
            hasher=hasher,
        )
        subgroup_x = gl.exp_power_of_2(subgroup_x, arity_bits)
        x_index = coset_index
        n -= arity_bits

        if batch_index < len(lde_bits) and n == lde_bits[batch_index]:
            subgroup_x_init = gl.gmul(
                gl.MULTIPLICATIVE_GROUP_GENERATOR,
                gl.gexp(gl.primitive_root_of_unity(n), reverse_bits(x_index, n)),
            )
            eval2 = _combine_instance(
                instances[batch_index],
                rows[batch_index],
                challenges.fri_alpha,
                subgroup_x_init,
                precomputed[batch_index],
            )
            old_eval = ge.ext_add(
                ge.ext_mul(old_eval, challenges.fri_betas[i]), eval2
            )
            batch_index += 1

    _ensure(batch_index == len(instances), "wrong number of folded instances")
    expected = _eval_final(proof.final_poly, ge.from_base(subgroup_x, 2))
    _ensure(
        tuple(expected) == tuple(old_eval),
        "batch FRI final polynomial evaluation is invalid",
    )


def _combine_instance(instance, row_evals, alpha, subgroup_x, precomputed):
    """fri_combine_initial against a single-row eval list."""
    proof_like = FriInitialTreeProof(
        evals_proofs=[(row_evals, None)] * len(instance.oracles)
    )
    # re-slice: oracle i's evals live contiguously inside row_evals
    pos = 0
    ep = []
    for o in instance.oracles:
        ep.append((row_evals[pos : pos + o.num_polys], None))
        pos += o.num_polys
    proof_like = FriInitialTreeProof(evals_proofs=ep)

    class _P:
        leaf_hiding = False

    params_like = _P()
    return fri_combine_initial(
        instance, proof_like, alpha, subgroup_x, precomputed, params_like
    )


def _eval_final(final_poly, x):
    acc = ge.ext_zero(2)
    for c in reversed(final_poly):
        acc = ge.ext_add(ge.ext_mul(acc, x), c)
    return acc
