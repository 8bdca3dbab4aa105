"""FRI proof generation: commit-phase folds, PoW grind, query rounds.

Host drives the transcript; all O(N) math is device kernels
(reference: plonky2/src/fri/prover.rs:24-268).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..hash.challenger import Challenger
from ..hash.poseidon import NUM_HASH_OUT_ELTS, SPONGE_RATE
from ..ops import fri_kernels as fk
from ..ops import gf, merkle
from .config import FriConfig, FriParams
from .proof import (
    FriInitialTreeProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
    MerkleProof,
)


def fused_fri_spmd_enabled() -> bool:
    """Whether the fused (single-program) FRI path also runs under a mesh.
    Default ON: the round-2 'fused gathers crash under SPMD' note was the
    XLA:CPU fusion/algsimp pass bug (worked around in tests/conftest.py),
    not an SPMD-semantics problem — gathers from row-sharded tree arrays
    are plain GSPMD gathers. PLONKY2_TPU_FUSED_FRI_SPMD=0 restores the
    per-phase (unfused) mesh path."""
    return os.environ.get("PLONKY2_TPU_FUSED_FRI_SPMD", "1") != "0"


def fri_proof(
    initial_merkle_trees: Sequence[merkle.DeviceMerkleTree],
    lde_polynomial_coeffs: gf.Gf,  # extension [lde_n, 2]
    lde_polynomial_values: gf.Gf,  # extension [lde_n, 2]
    challenger: Challenger,
    fri_params: FriParams,
    final_poly_coeff_len: Optional[int] = None,
    max_num_query_steps: Optional[int] = None,
    hasher=None,
) -> FriProof:
    n = lde_polynomial_values[0].shape[0]
    assert lde_polynomial_coeffs[0].shape[0] == n

    from ..parallel import context as pctx

    if (
        os.environ.get("PLONKY2_TPU_FUSED_FRI", "1") != "0"
        and max_num_query_steps is None
        and final_poly_coeff_len is None
        and (hasher is None or hasher.name == "poseidon")
        and (pctx.get_mesh() is None or fused_fri_spmd_enabled())
        and all(
            isinstance(t, merkle.DeviceMerkleTree) for t in initial_merkle_trees
        )
    ):
        return _fused_fri_proof(
            initial_merkle_trees,
            lde_polynomial_coeffs,
            lde_polynomial_values,
            challenger,
            fri_params,
        )

    # Commit phase
    trees, final_poly = _fri_committed_trees(
        lde_polynomial_coeffs,
        lde_polynomial_values,
        challenger,
        fri_params,
        max_num_query_steps,
        hasher=hasher,
    )

    # Observe final polynomial (+ zero padding for unified recursion)
    for c in final_poly:
        challenger.observe_extension_element(c)
    if final_poly_coeff_len is not None:
        for _ in range(len(final_poly), final_poly_coeff_len):
            challenger.observe_extension_element((0, 0))

    # PoW phase
    pow_witness = _fri_proof_of_work(challenger, fri_params.config, hasher=hasher)

    # Query phase
    query_indices = [
        c % n for c in challenger.get_n_challenges(fri_params.config.num_query_rounds)
    ]
    query_rounds = _query_rounds(initial_merkle_trees, trees, query_indices, fri_params)

    return FriProof(
        commit_phase_merkle_caps=[t.cap_u64() for t in trees],
        query_round_proofs=query_rounds,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )


from functools import partial as _partial
import jax as _jax


@_partial(_jax.jit, static_argnums=(1,))
def _refold_values(coeffs, shift: int):
    from ..ops import ntt

    comp = (coeffs[0].T, coeffs[1].T)
    vals = ntt.coset_fft(comp, shift)
    return (vals[0].T, vals[1].T)


def _fused_commit_fn(arities: tuple, cap_height: int, rate_bits: int, in_len: int):
    """One compiled program for the whole FRI commit phase: per round the
    tree levels, the cap observation + beta squeeze on a device-resident
    challenger, the coefficient fold and the re-evaluation — zero host
    round trips (the per-round host transcript costs ~2 device syncs per
    round over a remote TPU link). The caller observes the final
    polynomial afterwards on host, which also clears any buffered
    challenger outputs, so only the sponge state needs to round-trip."""
    from ..hash.device_challenger import DeviceChallenger
    from ..ops import ntt as _ntt

    def fn(coeffs, values, ch_state, ch_inbuf):
        dc = DeviceChallenger.from_arrays(ch_state, ch_inbuf, in_len)
        shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
        out_trees = []
        for step, arity_bits in enumerate(arities):
            arity = 1 << arity_bits
            leaves, levels = fk._commit_phase_leaves_and_levels(
                values, arity_bits, cap_height
            )
            out_trees.append((leaves, levels))
            dc.observe_cap_rows(levels[-1])
            b0, b1 = dc.get_extension_challenge()
            beta = (jnp.stack([b0[0], b1[0]]), jnp.stack([b0[1], b1[1]]))  # [2]
            pows_lo = [jnp.stack([jnp.uint32(1), jnp.uint32(0)])]
            pows_hi = [jnp.stack([jnp.uint32(0), jnp.uint32(0)])]
            for _ in range(arity - 1):
                nxt = gf.ext2_mul((pows_lo[-1], pows_hi[-1]), beta)
                pows_lo.append(nxt[0])
                pows_hi.append(nxt[1])
            beta_pows = (jnp.stack(pows_lo), jnp.stack(pows_hi))  # [arity, 2]
            coeffs = fk.fold_coeffs(coeffs, beta_pows, arity_bits)
            if step + 1 != len(arities):
                shift = gl.gexp(shift, arity)
                comp = (coeffs[0].T, coeffs[1].T)
                vals = _ntt.coset_fft(comp, shift)
                values = (vals[0].T, vals[1].T)
        final_len = coeffs[0].shape[0] >> rate_bits
        final = (coeffs[0][:final_len], coeffs[1][:final_len])
        # after a squeeze the input buffer is empty; outputs will be
        # cleared by the caller's final-poly observation
        st_lo = jnp.stack([x[0] for x in dc.state])
        st_hi = jnp.stack([x[1] for x in dc.state])
        assert not dc.input_buffer
        return out_trees, final, (st_lo, st_hi)

    return fn


def _fused_fri_fn(
    arities: tuple,
    cap_height: int,
    rate_bits: int,
    in_len: int,
    pow_bits: int,
    num_queries: int,
    num_initial_trees: int,
):
    """The ENTIRE FRI proof as one compiled program: commit-phase folds +
    device challenger transcript, final-poly observation, PoW grind
    (in-graph while_loop), query-index squeeze, and every query-phase
    gather. One host round trip for the whole opening proof."""
    import jax as _jax
    from jax import lax

    from ..hash.device_challenger import DeviceChallenger
    from ..ops import ntt as _ntt
    from ..ops import poseidon as _dp

    def fn(coeffs, values, ch_state, ch_inbuf, init_leaves, init_levels):
        n_lde = values[0].shape[0]
        dc = DeviceChallenger.from_arrays(ch_state, ch_inbuf, in_len)
        shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
        out_trees = []
        for step, arity_bits in enumerate(arities):
            arity = 1 << arity_bits
            leaves, levels = fk._commit_phase_leaves_and_levels(
                values, arity_bits, cap_height
            )
            out_trees.append((leaves, levels))
            dc.observe_cap_rows(levels[-1])
            b0, b1 = dc.get_extension_challenge()
            beta = (jnp.stack([b0[0], b1[0]]), jnp.stack([b0[1], b1[1]]))
            pows_lo = [jnp.stack([jnp.uint32(1), jnp.uint32(0)])]
            pows_hi = [jnp.stack([jnp.uint32(0), jnp.uint32(0)])]
            for _ in range(arity - 1):
                nxt = gf.ext2_mul((pows_lo[-1], pows_hi[-1]), beta)
                pows_lo.append(nxt[0])
                pows_hi.append(nxt[1])
            beta_pows = (jnp.stack(pows_lo), jnp.stack(pows_hi))
            coeffs = fk.fold_coeffs(coeffs, beta_pows, arity_bits)
            if step + 1 != len(arities):
                shift = gl.gexp(shift, arity)
                comp = (coeffs[0].T, coeffs[1].T)
                vals = _ntt.coset_fft(comp, shift)
                values = (vals[0].T, vals[1].T)
        final_len = coeffs[0].shape[0] >> rate_bits
        final = (coeffs[0][:final_len], coeffs[1][:final_len])

        # observe the final polynomial (fri.rs:398-404)
        for i in range(final_len):
            dc.observe_extension(
                ((final[0][i, 0], final[1][i, 0]), (final[0][i, 1], final[1][i, 1]))
            )

        # PoW grind (fri/prover.rs:159-208) as an in-graph while_loop over
        # candidate chunks, on the duplex state with pending inputs overlaid
        grind_lo = [x[0] for x in dc.state]
        grind_hi = [x[1] for x in dc.state]
        witness_pos = len(dc.input_buffer)
        for i, x in enumerate(dc.input_buffer):
            grind_lo[i] = x[0]
            grind_hi[i] = x[1]
        slo = jnp.stack(grind_lo)
        shi = jnp.stack(grind_hi)
        chunk = fk._pow_chunk_size(pow_bits)

        def try_chunk(start_lo, start_hi):
            clo = start_lo + jnp.arange(chunk, dtype=jnp.uint32)
            carry = (clo < start_lo).astype(jnp.uint32)
            chi = start_hi + carry
            st_lo = jnp.broadcast_to(slo, (chunk, 12)).at[:, witness_pos].set(clo)
            st_hi = jnp.broadcast_to(shi, (chunk, 12)).at[:, witness_pos].set(chi)
            olo, ohi = _dp.permute((st_lo, st_hi))
            resp_hi = ohi[:, SPONGE_RATE - 1]
            resp_lo = olo[:, SPONGE_RATE - 1]
            if pow_bits == 0:
                ok = jnp.ones_like(resp_hi, dtype=bool)
            elif pow_bits <= 32:
                ok = resp_hi < jnp.uint32(1 << (32 - pow_bits))
            else:
                ok = (resp_hi == 0) & (resp_lo < jnp.uint32(1 << (64 - pow_bits)))
            found = jnp.any(ok)
            first = jnp.argmax(ok).astype(jnp.uint32)
            wlo = start_lo + first
            whi = start_hi + (wlo < start_lo).astype(jnp.uint32)
            return found, wlo, whi

        def cond(c):
            return ~c[0]

        def body(c):
            _, _, _, cur_lo, cur_hi = c
            found, wlo, whi = try_chunk(cur_lo, cur_hi)
            nlo = cur_lo + jnp.uint32(chunk)
            nhi = cur_hi + (nlo < cur_lo).astype(jnp.uint32)
            return (found, wlo, whi, nlo, nhi)

        init = (
            jnp.bool_(False),
            jnp.uint32(0),
            jnp.uint32(0),
            jnp.uint32(0),
            jnp.uint32(0),
        )
        found, wlo, whi, _, _ = lax.while_loop(cond, body, init)
        witness = (wlo, whi)
        dc.observe_element(witness)
        dc.get_challenge()  # pow response (validated by the verifier)

        # query indices: challenge mod lde_size (power of two => low bits)
        mask = jnp.uint32(n_lde - 1)
        q_idx = []
        for _ in range(num_queries):
            c = dc.get_challenge()
            q_idx.append((c[0] & mask).astype(jnp.int32))
        qi = jnp.stack(q_idx)

        # gathers: every initial oracle + every commit tree
        gathered = []
        for t in range(num_initial_trees):
            leaves = init_leaves[t]
            levels = init_levels[t]
            gathered.append(_gather_tree(leaves, levels, qi))
        xi = qi
        for i, arity_bits in enumerate(arities):
            xi = xi >> arity_bits
            leaves, levels = out_trees[i]
            gathered.append(_gather_tree(leaves, levels, xi))

        caps = [levels[-1] for _, levels in out_trees]
        return out_trees, final, witness, caps, gathered

    def _gather_tree(leaves, levels, idx):
        rows = (jnp.take(leaves[0], idx, axis=0), jnp.take(leaves[1], idx, axis=0))
        if len(levels) == 1:
            z = jnp.zeros((idx.shape[0], 0, 4), dtype=jnp.uint32)
            return rows, (z, z)
        sib_lo, sib_hi = [], []
        cur = idx
        for lo, hi in zip(
            [l[0] for l in levels[:-1]], [l[1] for l in levels[:-1]]
        ):
            sib = cur ^ 1
            sib_lo.append(jnp.take(lo, sib, axis=0))
            sib_hi.append(jnp.take(hi, sib, axis=0))
            cur = cur >> 1
        return rows, (jnp.stack(sib_lo, axis=1), jnp.stack(sib_hi, axis=1))

    return fn


_FUSED_FRI_CACHE = {}


def _fused_fri_proof(
    initial_merkle_trees,
    lde_polynomial_coeffs,
    lde_polynomial_values,
    challenger,
    fri_params,
    extra_flat=None,
):
    """fri_proof with one device round trip (see _fused_fri_fn).
    challenger: a host Challenger, or a DeviceChallengerState whose
    state never left the device (device-transcript prover).
    extra_flat: optional 1-D limb pair appended to the flat transfer —
    callers piggyback their own device data (caps/openings) onto the
    single round trip; returns (proof, extra_np) when set."""
    import jax as _jax

    from ..hash.device_challenger import DeviceChallengerState

    arities = tuple(fri_params.reduction_arity_bits)
    device_state = isinstance(challenger, DeviceChallengerState)
    in_len = (
        challenger.in_len if device_state else len(challenger.input_buffer)
    )
    key = (
        arities,
        fri_params.config.cap_height,
        fri_params.config.rate_bits,
        in_len,
        fri_params.config.proof_of_work_bits,
        fri_params.config.num_query_rounds,
        len(initial_merkle_trees),
    )
    if key not in _FUSED_FRI_CACHE:
        _fn = _fused_fri_fn(*key)
        _fn.__name__ = "fused_fri"
        _FUSED_FRI_CACHE[key] = _jax.jit(_fn)
    jfn = _FUSED_FRI_CACHE[key]

    if device_state:
        state_pair = challenger.state
        inbuf_pair = challenger.input_buffer
    else:
        state_u64 = np.array(challenger.sponge_state, dtype=np.uint64)
        inbuf_u64 = np.zeros(8, dtype=np.uint64)
        if in_len:
            inbuf_u64[:in_len] = np.array(challenger.input_buffer, dtype=np.uint64)
        state_pair = gf.from_u64(state_u64)
        inbuf_pair = gf.from_u64(inbuf_u64)
    init_leaves = tuple(t.leaves for t in initial_merkle_trees)
    init_levels = tuple(tuple(l for l in t.levels) for t in initial_merkle_trees)

    out_trees, final, witness, caps, gathered = jfn(
        lde_polynomial_coeffs,
        lde_polynomial_values,
        state_pair,
        inbuf_pair,
        init_leaves,
        init_levels,
    )

    # ONE flat transfer: caps ‖ final ‖ pow ‖ all gathered rows/paths
    parts_lo = [c[0].reshape(-1) for c in caps] + [final[0].reshape(-1)]
    parts_hi = [c[1].reshape(-1) for c in caps] + [final[1].reshape(-1)]
    parts_lo.append(witness[0].reshape(1))
    parts_hi.append(witness[1].reshape(1))
    meta = []
    for rows, paths in gathered:
        parts_lo += [rows[0].reshape(-1), paths[0].reshape(-1)]
        parts_hi += [rows[1].reshape(-1), paths[1].reshape(-1)]
        meta.append((rows[0].shape, paths[0].shape))
    if extra_flat is not None:
        parts_lo.append(extra_flat[0])
        parts_hi.append(extra_flat[1])
    flat = np.asarray(
        gf.to_u64((jnp.concatenate(parts_lo), jnp.concatenate(parts_hi)))
    )

    pos = 0
    caps_np = []
    for c in caps:
        m = c[0].shape[0] * 4
        caps_np.append(flat[pos : pos + m].reshape(-1, 4))
        pos += m
    final_len = final[0].shape[0]
    final_poly = [
        (int(a), int(b)) for a, b in flat[pos : pos + 2 * final_len].reshape(-1, 2)
    ]
    pos += 2 * final_len
    pow_witness = int(flat[pos])
    pos += 1
    gathered_np = []
    for rshape, pshape in meta:
        rn = int(np.prod(rshape))
        pn = int(np.prod(pshape))
        rows = flat[pos : pos + rn].reshape(rshape)
        pos += rn
        paths = flat[pos : pos + pn].reshape(pshape)
        pos += pn
        gathered_np.append((rows, paths))

    # NOTE: the host challenger is left at its pre-FRI state — the
    # transcript completed on device and nothing reads the challenger
    # after fri_proof (verification derives its own); prove() ends here.

    num_init = len(initial_merkle_trees)
    init_data = gathered_np[:num_init]
    step_data = gathered_np[num_init:]
    rounds = []
    num_queries = fri_params.config.num_query_rounds
    for q in range(num_queries):
        evals_proofs = [
            (
                [int(v) for v in rows[q]],
                MerkleProof([tuple(int(x) for x in s) for s in paths[q]]),
            )
            for rows, paths in init_data
        ]
        steps = []
        for rows, paths in step_data:
            flat_vals = [int(v) for v in rows[q]]
            evals = [
                tuple(flat_vals[2 * k : 2 * k + 2])
                for k in range(len(flat_vals) // 2)
            ]
            steps.append(
                FriQueryStep(
                    evals=evals,
                    merkle_proof=MerkleProof(
                        [tuple(int(x) for x in s) for s in paths[q]]
                    ),
                )
            )
        rounds.append(
            FriQueryRound(
                initial_trees_proof=FriInitialTreeProof(evals_proofs=evals_proofs),
                steps=steps,
            )
        )
    proof = FriProof(
        commit_phase_merkle_caps=caps_np,
        query_round_proofs=rounds,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )
    if extra_flat is not None:
        # the piggybacked caller data is the transfer's tail
        extra_len = extra_flat[0].shape[0]
        return proof, flat[len(flat) - extra_len :]
    return proof


_FUSED_COMMIT_CACHE = {}


def _fri_committed_trees_fused(
    coeffs: gf.Gf,
    values: gf.Gf,
    challenger: Challenger,
    fri_params: FriParams,
):
    import jax as _jax

    arities = tuple(fri_params.reduction_arity_bits)
    cap_height = fri_params.config.cap_height
    rate_bits = fri_params.config.rate_bits
    in_len = len(challenger.input_buffer)
    key = (arities, cap_height, rate_bits, in_len)
    if key not in _FUSED_COMMIT_CACHE:
        _fcfn = _fused_commit_fn(arities, cap_height, rate_bits, in_len)
        _fcfn.__name__ = "fused_fri_commit"
        _FUSED_COMMIT_CACHE[key] = _jax.jit(_fcfn)
    jfn = _FUSED_COMMIT_CACHE[key]

    state_u64 = np.array(challenger.sponge_state, dtype=np.uint64)
    inbuf_u64 = np.zeros(8, dtype=np.uint64)
    if in_len:
        inbuf_u64[:in_len] = np.array(challenger.input_buffer, dtype=np.uint64)
    out_trees, final, (st_lo, st_hi) = jfn(
        coeffs, values, gf.from_u64(state_u64), gf.from_u64(inbuf_u64)
    )

    trees = [
        merkle.DeviceMerkleTree(leaves=leaves, levels=list(levels), cap_height=cap_height)
        for leaves, levels in out_trees
    ]
    # one transfer: state ‖ final poly; host resumes the transcript
    flat_lo = jnp.concatenate([st_lo, final[0].reshape(-1)])
    flat_hi = jnp.concatenate([st_hi, final[1].reshape(-1)])
    flat = np.asarray(gf.to_u64((flat_lo, flat_hi)))
    challenger.sponge_state = [int(x) for x in flat[:12]]
    challenger.input_buffer = []
    challenger.output_buffer = []
    final_poly = [(int(a), int(b)) for a, b in flat[12:].reshape(-1, 2)]
    return trees, final_poly


def _fri_committed_trees(
    coeffs: gf.Gf,
    values: gf.Gf,
    challenger: Challenger,
    fri_params: FriParams,
    max_num_query_steps: Optional[int],
    hasher=None,
):
    if (
        os.environ.get("PLONKY2_TPU_FUSED_FRI", "1") != "0"
        and max_num_query_steps is None
        and (hasher is None or hasher.name == "poseidon")
    ):
        return _fri_committed_trees_fused(coeffs, values, challenger, fri_params)
    return _fri_committed_trees_unfused(
        coeffs, values, challenger, fri_params, max_num_query_steps, hasher
    )


def _fri_committed_trees_unfused(
    coeffs: gf.Gf,
    values: gf.Gf,
    challenger: Challenger,
    fri_params: FriParams,
    max_num_query_steps: Optional[int],
    hasher=None,
):
    trees: List[merkle.DeviceMerkleTree] = []
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    arities = fri_params.reduction_arity_bits
    for step, arity_bits in enumerate(arities):
        arity = 1 << arity_bits
        tree = fk.commit_phase_tree(
            values, arity_bits, fri_params.config.cap_height, hasher=hasher
        )
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
        # re-evaluate on the reduced coset (single fused dispatch)
        from ..ops import ntt

        values = _refold_values((coeffs[0], coeffs[1]), shift)

    # Zero-cap padding rounds for unified recursion
    if max_num_query_steps is not None:
        zero_cap = [[0] * NUM_HASH_OUT_ELTS] * (1 << fri_params.config.cap_height)
        for _ in range(len(arities), max_num_query_steps):
            challenger.observe_cap(zero_cap)
            challenger.get_extension_challenge(2)

    # Drop the (all-zero) LDE padding coefficients
    final_len = coeffs[0].shape[0] >> fri_params.config.rate_bits
    fc = gf.to_u64((coeffs[0][:final_len], coeffs[1][:final_len]))
    final_poly = [(int(a), int(b)) for a, b in fc]
    return trees, final_poly


def _fri_proof_of_work(challenger: Challenger, config: FriConfig, hasher=None) -> int:
    """Deterministic grind: the smallest witness w with >= pow_bits leading
    zeros in the duplex response (prover.rs:159-208; find_any replaced by a
    batched device scan that returns the first hit). Non-Poseidon
    challenger permutations grind on host."""
    state = list(challenger.sponge_state)
    witness_pos = len(challenger.input_buffer)
    for i, x in enumerate(challenger.input_buffer):
        state[i] = x
    if hasher is not None and hasher.name != "poseidon":
        witness = _host_pow_grind(
            state, witness_pos, config.proof_of_work_bits, hasher.permutation
        )
    else:
        witness = fk.pow_grind(state, witness_pos, config.proof_of_work_bits)
    # Confirm via the real transcript (also advances it)
    challenger.observe_element(witness)
    response = challenger.get_challenge()
    assert _leading_zeros64(response) >= config.proof_of_work_bits
    return witness


def _leading_zeros64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _gather_all_trees(gathers):
    """[(tree, indices)] -> [(leaf_rows [Q, w], sib_paths [Q, L, 4])] with a
    single fused device dispatch and one flat transfer."""
    import jax
    import jax.numpy as jnp

    from ..ops import gf

    device_parts = []
    meta = []
    for tree, idx in gathers:
        leaves_d = tree.leaf_rows_device(idx)   # (lo [Q, w], hi)
        paths_d = tree.sibling_paths_device(idx)  # (lo [Q, L, 4], hi)
        q, w = leaves_d[0].shape
        L = paths_d[0].shape[1]
        meta.append((q, w, L))
        device_parts.append((leaves_d, paths_d))

    flat_lo = jnp.concatenate(
        [p[0][0].reshape(-1) for p in device_parts]
        + [p[1][0].reshape(-1) for p in device_parts]
    )
    flat_hi = jnp.concatenate(
        [p[0][1].reshape(-1) for p in device_parts]
        + [p[1][1].reshape(-1) for p in device_parts]
    )
    flat = np.asarray(gf.to_u64((flat_lo, flat_hi)))
    out = []
    pos = 0
    leaf_sizes = [(q * w) for q, w, _ in meta]
    path_sizes = [(q * L * 4) for q, _, L in meta]
    leaf_arrays = []
    for (q, w, L), sz in zip(meta, leaf_sizes):
        leaf_arrays.append(flat[pos : pos + sz].reshape(q, w))
        pos += sz
    path_arrays = []
    for (q, w, L), sz in zip(meta, path_sizes):
        path_arrays.append(flat[pos : pos + sz].reshape(q, L, 4))
        pos += sz
    return list(zip(leaf_arrays, path_arrays))


def _host_pow_grind(state, witness_pos: int, pow_bits: int, permutation) -> int:
    w = 0
    while True:
        trial = list(state)
        trial[witness_pos] = w
        out = permutation(trial)
        if _leading_zeros64(out[SPONGE_RATE - 1]) >= pow_bits:
            return w
        w += 1


def _query_rounds(
    initial_trees: Sequence[merkle.DeviceMerkleTree],
    trees: Sequence[merkle.DeviceMerkleTree],
    query_indices: Sequence[int],
    fri_params: FriParams,
) -> List[FriQueryRound]:
    """All query rounds extracted with batched gathers: one leaf-gather and
    one path-gather per tree (instead of per query x per sibling), keeping
    the host<->device round trips independent of the query count
    (prover.rs:210-268 redesigned for a high-latency device link)."""
    qi = np.array(query_indices, dtype=np.int64)
    # one device->host transfer for ALL trees' leaf rows and sibling paths
    # (each individual transfer is a full round trip over the TPU tunnel)
    gathers = []
    for t in initial_trees:
        gathers.append((t, qi))
    xi = qi
    step_cosets = []
    for i, arity_bits in enumerate(fri_params.reduction_arity_bits):
        coset = xi >> arity_bits
        step_cosets.append(coset)
        gathers.append((trees[i], coset))
        xi = coset
    all_rows = _gather_all_trees(gathers)
    init_data = all_rows[: len(initial_trees)]
    step_data = all_rows[len(initial_trees) :]

    rounds = []
    for q in range(len(query_indices)):
        evals_proofs = [
            (
                [int(v) for v in leaves[q]],
                MerkleProof([tuple(int(x) for x in s) for s in sibs[q]]),
            )
            for leaves, sibs in init_data
        ]
        steps = []
        for (leaves, sibs) in step_data:
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
