"""Device-transcript prover: the entire post-witness prove() with ZERO
host round trips until final proof assembly.

The host path syncs at every Fiat-Shamir boundary (3 commitment caps +
zeta + openings ≈ 6 device round trips — dominant over a remote TPU
link). Here the challenger state never leaves the device: each phase is
an async jit dispatch chained through DeviceChallengerState, the
permutation argument runs on device (_zs_and_partial_products_device),
openings are evaluated at a traced zeta (gf.ext2_powers_scan), the
openings reduction weights are computed with device extension scalars,
and the round-1 fused FRI program consumes the device state directly.
Two host reads total: the FRI flat transfer and one caps+openings
transfer for proof assembly.

Eligibility (falls back to the host path otherwise): Poseidon hasher,
fused-FRI-eligible params. Zero-knowledge circuits are supported
(salt-blinded oracles per ORACLE_BLINDING; plonk opening expressions
stay single-polynomial under zk, so the device reduction is unchanged)
and so are lookup circuits (deltas drawn at boundary 1, RE/partial-SLDC
columns via the device kernel _lookup_polys_device, LUT-poly evals at
traced deltas). Proofs are bit-identical to the host path (the device
challenger is bit-exact with the host duplex) — pinned by
tests/test_device_transcript.py (zk equality under a fixed
PLONKY2_TPU_SALT_SEED; zk salts are otherwise random, as in the
reference).

Reference dual: there is none — the reference's prover is
CPU-resident so its transcript has no device boundary
(plonk/prover.rs:144-392); this is the TPU-native restructuring of the
same protocol.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..fri import oracle as fo
from ..fri.prover import _fused_fri_proof
from ..hash.challenger import Challenger
from ..hash.device_challenger import DeviceChallenger, DeviceChallengerState
from ..ops import fri_kernels as fk
from ..ops import gf, ntt


def eligible(common, gc, has_lookup: bool) -> bool:
    mode = os.environ.get("PLONKY2_TPU_DEVICE_TRANSCRIPT", "auto")
    if mode == "0":
        return False
    if mode == "auto":
        # default ON for real accelerators only: XLA:CPU on some hosts
        # segfaults compiling these programs (same fragility as the
        # fusion-pass miscompile worked around in tests/conftest.py);
        # the CPU test suite covers this path via the explicit =1 tests
        try:
            if jax.default_backend() == "cpu":
                return False
        except Exception:
            return False
    if os.environ.get("PLONKY2_TPU_FUSED_FRI", "1") == "0":
        return False
    if gc.hasher.name != "poseidon":
        return False
    from ..parallel import context as pctx

    if pctx.get_mesh() is not None:
        # mesh + device transcript compose through the same fused FRI
        # program (the commitments/quotient inside this prover are
        # already mesh-sharded); requires the SPMD fused-FRI path
        from ..fri.prover import fused_fri_spmd_enabled

        return fused_fri_spmd_enabled()
    return True


@lru_cache(maxsize=None)
def _observe_cap_draw_fn(in_len: int, cap_size: int, num_challenges: int):
    """(state, inbuf, cap rows) -> (challenges [nc] pair, state') — one
    Fiat-Shamir boundary as a single program."""

    @jax.jit
    def observe_cap_draw(state, inbuf, cap):
        dch = DeviceChallenger.from_arrays(state, inbuf, in_len)
        dch.observe_cap_rows(cap)
        outs = [dch.get_challenge() for _ in range(num_challenges)]
        (slo, shi), _n_out, n_in = dch.export()
        assert n_in == 0
        lo = jnp.stack([o[0] for o in outs])
        hi = jnp.stack([o[1] for o in outs])
        return (lo, hi), (slo, shi)

    return observe_cap_draw


def _ext2_pow_static(x: gf.Gf, e: int) -> gf.Gf:
    """x^e for a shape-(2,) extension scalar, static exponent."""
    result = gf.ext2_const((1, 0))
    base = x
    while e:
        if e & 1:
            result = gf.ext2_mul(result, base)
        e >>= 1
        if e:
            base = gf.ext2_mul(base, base)
    return result


def _reduce_openings_device(instance, oracles, alpha: gf.Gf, points: List[gf.Gf]) -> gf.Gf:
    """reduce_openings_to_final_poly with alpha/points as device scalars
    (fri/oracle.py host dual). Plonk-only: every opening expression is
    a single raw polynomial (true with or without zk — salts never join
    the algebraic openings), so batch weights are pure alpha powers."""
    final = None
    for b, batch in enumerate(instance.batches):
        openings = batch.openings
        m = len(openings)
        apows = gf.ext2_powers_scan(alpha, m)  # [m, 2]
        by_oracle = {}
        for k, expr in enumerate(openings):
            assert expr.is_single, "device transcript requires non-masked openings"
            t = expr.terms[0]
            by_oracle.setdefault(t.polynomial.oracle_index, []).append(
                (t.polynomial.polynomial_index, k)
            )
        comp = None
        for oi, items in sorted(by_oracle.items()):
            items.sort()
            sel = np.array([pi for pi, _ in items], dtype=np.int32)
            widx = np.array([k for _, k in items], dtype=np.int32)
            polys = (
                jnp.take(oracles[oi].polynomials[0], sel, axis=0),
                jnp.take(oracles[oi].polynomials[1], sel, axis=0),
            )
            w = (jnp.take(apows[0], widx, axis=0), jnp.take(apows[1], widx, axis=0))
            w0 = (w[0][:, 0], w[1][:, 0])
            w1 = (w[0][:, 1], w[1][:, 1])
            part = fk._composition_poly_jit(polys, w0, w1)
            comp = part if comp is None else gf.add(comp, part)
        quotient = fk._divide_by_linear_ext_jit(comp, points[b])
        if final is None:
            final = quotient
        else:
            shift = _ext2_pow_static(alpha, len(openings))
            final = fo._shift_accumulate_jit(final, quotient, shift)
    return final


_OPEN_REDUCE_CACHE = {}


def _open_reduce(common, prover_data, layout: tuple):
    """One compiled program per circuit for the whole openings phase:
    observe quotient cap, squeeze zeta, evaluate every oracle at
    (zeta, g*zeta), observe the opening set, squeeze the FRI alpha,
    reduce the openings to the final polynomial and LDE it."""
    key = (tuple(prover_data.circuit_digest), layout)
    fn = _OPEN_REDUCE_CACHE.get(key)
    if fn is not None:
        return fn

    instance = common.get_fri_instance(ge.ext_one(2))  # structure only
    g = gl.primitive_root_of_unity(common.degree_bits)
    n = common.degree
    lde_size = common.fri_params.lde_size

    class _View:
        def __init__(self, polys):
            self.polynomials = polys

    @jax.jit
    def openings_at_zeta(state, inbuf, q_cap, poly_groups):
        dch = DeviceChallenger.from_arrays(state, inbuf, 0)
        dch.observe_cap_rows(q_cap)
        z0, z1 = dch.get_extension_challenge()
        zeta = (jnp.stack([z0[0], z1[0]]), jnp.stack([z0[1], z1[1]]))
        zeta_next = gf.mul(zeta, gf.full((2,), g))
        pz = gf.ext2_powers_scan(zeta, n)
        pn = gf.ext2_powers_scan(zeta_next, n)
        evals = fo._eval_many_jit(
            poly_groups,
            (pz[0][:, 0], pz[1][:, 0]),
            (pz[0][:, 1], pz[1][:, 1]),
            (pn[0][:, 0], pn[1][:, 0]),
            (pn[0][:, 1], pn[1][:, 1]),
        )
        elo, ehi = evals
        for off, cnt in layout:
            for i in range(off, off + cnt):
                dch.observe_extension(
                    ((elo[i, 0], ehi[i, 0]), (elo[i, 1], ehi[i, 1]))
                )
        a0, a1 = dch.get_extension_challenge()
        alpha = (jnp.stack([a0[0], a1[0]]), jnp.stack([a0[1], a1[1]]))
        views = [_View(pg) for pg in poly_groups]
        final_poly = _reduce_openings_device(
            instance, views, alpha, [zeta, zeta_next]
        )
        pad = [(0, lde_size - final_poly[0].shape[0]), (0, 0)]
        lde_coeffs = (jnp.pad(final_poly[0], pad), jnp.pad(final_poly[1], pad))
        lde_values = fk.ext_coset_fft(lde_coeffs)
        (slo, shi), _n_out, n_in = dch.export()
        assert n_in == 0
        return evals, lde_coeffs, lde_values, (slo, shi)

    _OPEN_REDUCE_CACHE[key] = openings_at_zeta
    return openings_at_zeta


def prove_device_transcript(
    prover_data, common, partition_witness, public_inputs, public_inputs_hash, gc
):
    """Phases 2-7 of prove() with the transcript resident on device.
    Returns a ProofWithPublicInputs bit-identical to the host path."""
    from .proof import OpeningSet, Proof, ProofWithPublicInputs
    from .prover import (
        _compute_quotient_polys,
        _zs_and_partial_products_device,
    )

    config = common.config
    nc = config.num_challenges
    fri_config = config.fri_config
    hasher = gc.hasher
    n = common.degree

    from .circuit_data import (
        ORACLE_BLINDING,
        ORACLE_QUOTIENT,
        ORACLE_WIRES,
        ORACLE_ZS_PARTIAL_PRODUCTS,
    )

    zk = config.zero_knowledge
    witness = partition_witness.full_witness()
    wires_dev = gf.from_u64(witness.wire_values)
    wires_commitment = fo.PolynomialBatch.from_values(
        wires_dev,
        fri_config.rate_bits,
        zk and ORACLE_BLINDING[ORACLE_WIRES],
        fri_config.cap_height,
        hasher=hasher,
    )

    # transcript preamble on the host duplex (static/config values only)
    host_ch = Challenger(permutation=hasher.permutation)
    common.fri_params.observe(host_ch)
    host_ch.observe_hash(prover_data.circuit_digest)
    host_ch.observe_hash(public_inputs_hash)
    st = DeviceChallengerState.from_host(host_ch)
    cap_size = 1 << fri_config.cap_height

    # boundary 1: wires cap -> betas ++ gammas (++ the extra lookup coins:
    # deltas = betas ++ gammas ++ additional, prover.rs:232-245 order)
    has_lookup = common.num_lookup_polys != 0
    from .vanishing import NUM_COINS_LOOKUP

    n_draw = (NUM_COINS_LOOKUP * nc) if has_lookup else (2 * nc)
    bg, state1 = _observe_cap_draw_fn(st.in_len, cap_size, n_draw)(
        st.state, st.input_buffer, wires_commitment.merkle_tree.cap
    )
    betas = (bg[0][:nc], bg[1][:nc])
    gammas = (bg[0][nc : 2 * nc], bg[1][nc : 2 * nc])
    deltas = (bg[0], bg[1]) if has_lookup else None

    zs_pp = _zs_and_partial_products_device(
        wires_dev, betas, gammas, prover_data, common
    )
    if has_lookup:
        from .prover import _lookup_polys_device

        lookup_polys = _lookup_polys_device(wires_dev, deltas, prover_data, common)
        zs_pp = (
            jnp.concatenate([zs_pp[0], lookup_polys[0]], axis=0),
            jnp.concatenate([zs_pp[1], lookup_polys[1]], axis=0),
        )
    zs_pp_commitment = fo.PolynomialBatch.from_values(
        zs_pp,
        fri_config.rate_bits,
        zk and ORACLE_BLINDING[ORACLE_ZS_PARTIAL_PRODUCTS],
        fri_config.cap_height,
        hasher=hasher,
    )

    # boundary 2: zs cap -> alphas
    zero_buf = gf.from_u64(np.zeros(8, dtype=np.uint64))
    al, state2 = _observe_cap_draw_fn(0, cap_size, nc)(
        state1, zero_buf, zs_pp_commitment.merkle_tree.cap
    )
    alphas = (al[0], al[1])

    quotient_chunks = _compute_quotient_polys(
        common,
        prover_data,
        public_inputs_hash,
        wires_commitment,
        zs_pp_commitment,
        betas,
        gammas,
        alphas,
        deltas=deltas,
        device_challenges=True,
    )
    quotient_commitment = fo.PolynomialBatch.from_coeffs(
        quotient_chunks,
        fri_config.rate_bits,
        zk and ORACLE_BLINDING[ORACLE_QUOTIENT],
        fri_config.cap_height,
        hasher=hasher,
    )

    # boundaries 3+4 fused: quotient cap -> zeta -> openings eval ->
    # observe -> alpha -> reduction -> final-poly LDE, all ONE program
    # (running these as eager ops costs dozens of tunnel dispatches —
    # measured 7x slower than the host path before fusing)
    oracles = [
        prover_data.constants_sigmas_commitment,
        wires_commitment,
        zs_pp_commitment,
        quotient_commitment,
    ]
    poly_groups = tuple(tuple(o.polynomials) for o in oracles)
    offsets = []
    pos = 0
    for o in oracles:
        offsets.append(pos)
        pos += o.padded_num_polys
    zeta_next_base = pos
    nzs = common.num_zs_partial_products_polys()
    nlk = common.num_lookup_polys * nc  # lookup rows in the zs_pp oracle
    # observation order = OpeningSet.to_fri_openings (proof.py:28-39):
    # zeta batch: constants+sigmas | wires | zs+pps | quotient | lookup_zs;
    # g*zeta batch: zs_next | lookup_zs_next
    layout = [
        (offsets[0], oracles[0].num_polys),
        (offsets[1], oracles[1].num_polys),
        (offsets[2], nzs),
        (offsets[3], oracles[3].num_polys),
    ]
    if nlk:
        layout.append((offsets[2] + nzs, nlk))
    layout.append((zeta_next_base + offsets[2], nc))
    if nlk:
        layout.append((zeta_next_base + offsets[2] + nzs, nlk))

    evals, lde_coeffs, lde_values, state4 = _open_reduce(
        common, prover_data, tuple(layout)
    )(state2, zero_buf, quotient_commitment.merkle_tree.cap, poly_groups)

    # assembly data (3 caps + opening evals) piggybacks on the fused
    # FRI program's single flat transfer — ONE host round trip total
    parts_lo = [
        wires_commitment.merkle_tree.cap[0].reshape(-1),
        zs_pp_commitment.merkle_tree.cap[0].reshape(-1),
        quotient_commitment.merkle_tree.cap[0].reshape(-1),
        evals[0].reshape(-1),
    ]
    parts_hi = [
        wires_commitment.merkle_tree.cap[1].reshape(-1),
        zs_pp_commitment.merkle_tree.cap[1].reshape(-1),
        quotient_commitment.merkle_tree.cap[1].reshape(-1),
        evals[1].reshape(-1),
    ]
    extra_flat = (jnp.concatenate(parts_lo), jnp.concatenate(parts_hi))

    opening_proof, flat = _fused_fri_proof(
        [o.merkle_tree for o in oracles],
        lde_coeffs,
        lde_values,
        DeviceChallengerState(state4, zero_buf, 0),
        common.fri_params,
        extra_flat=extra_flat,
    )
    cap_elems = cap_size * 4
    caps_np = [
        flat[i * cap_elems : (i + 1) * cap_elems].reshape(-1, 4) for i in range(3)
    ]
    evals_np = flat[3 * cap_elems :].reshape(-1, 2)

    def block(oracle_idx: int, start: int, count: int, next_block=False):
        base = (zeta_next_base if next_block else 0) + offsets[oracle_idx] + start
        return [(int(a), int(b)) for a, b in evals_np[base : base + count]]

    ncon = common.num_constants
    nr = config.num_routed_wires
    openings = OpeningSet(
        constants=block(0, 0, ncon),
        plonk_sigmas=block(0, ncon, nr),
        wires=block(1, 0, config.num_wires),
        plonk_zs=block(2, 0, nc),
        plonk_zs_next=block(2, 0, nc, next_block=True),
        partial_products=block(2, nc, nzs - nc),
        quotient_polys=block(3, 0, common.num_quotient_polys()),
        lookup_zs=block(2, nzs, nlk) if nlk else [],
        lookup_zs_next=block(2, nzs, nlk, next_block=True) if nlk else [],
    )
    proof = Proof(
        wires_cap=caps_np[0],
        plonk_zs_partial_products_cap=caps_np[1],
        quotient_polys_cap=caps_np[2],
        openings=openings,
        opening_proof=opening_proof,
    )
    return ProofWithPublicInputs(proof, public_inputs)
