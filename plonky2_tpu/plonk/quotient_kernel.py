"""Device quotient-evaluation kernels (split from plonk/vanishing.py so
that the host verifier path stays jax-free; reference hot loop:
plonky2/src/plonk/prover.rs:640-864 compute_quotient_polys +
vanishing_poly.rs:166 eval_vanishing_poly_base_batch)."""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..gates.algebra import DeviceBatchAlgebra, EvalVars
from ..gates.gate import compute_filter
from ..ops import gf
from .vanishing import _lookup_terms

_QUOTIENT_FN_CACHE = {}
_GATE_BLOCK_CACHE = {}


def _gate_block_fn(gate, sel, group, many, consts_offset, key_extra):
    """Jitted filtered-constraint block for ONE gate type:
    (cs_nat, wires_nat, pis) -> [num_constraints, B].

    Splitting per gate keeps each XLA/LLVM module small (whole-program
    quotient compiles were pathological) and lets identical gate programs
    be reused across circuits in-process."""
    key = (gate.id(), sel, group, many, consts_offset, key_extra)
    if key in _GATE_BLOCK_CACHE:
        return _GATE_BLOCK_CACHE[key]

    def fn(cs_nat, wires_nat, pis_hash):
        b = cs_nat[0].shape[1]
        A = DeviceBatchAlgebra(b)

        def rows(vals):
            return [(vals[0][i], vals[1][i]) for i in range(vals[0].shape[0])]

        consts_all = rows(cs_nat)
        gate_consts = consts_all[consts_offset:]
        local_wires = rows(wires_nat)
        pis = [
            (
                jnp.broadcast_to(pis_hash[0][i], (b,)),
                jnp.broadcast_to(pis_hash[1][i], (b,)),
            )
            for i in range(4)
        ]
        vars = EvalVars(gate_consts, local_wires, pis)
        filt = compute_filter(A, sel[0], group, consts_all[sel[1]], many)
        evals = gate.eval_unfiltered_device(vars, A)
        flo = jnp.stack([gf.mul(filt, c)[0] for c in evals])
        fhi = jnp.stack([gf.mul(filt, c)[1] for c in evals])
        return flo, fhi

    fn.__name__ = "gate_block_" + "".join(
        ch if ch.isalnum() else "_" for ch in gate.id()[:40]
    )
    jfn = jax.jit(fn)
    _GATE_BLOCK_CACHE[key] = jfn
    return jfn


def quotient_values_fn(common):
    """Build (and cache) the jitted full-domain quotient evaluator for a
    circuit shape. Returns fn(constants_sigmas_nat, wires_nat, zs_pp_nat,
    shifted_xs, l0, zh_inv, challenge_arrays, pis_hash) -> [nc, lde_n]."""
    key = id(common)
    if key in _QUOTIENT_FN_CACHE:
        return _QUOTIENT_FN_CACHE[key]

    nc = common.config.num_challenges
    next_step = 1 << (common.quotient_degree_factor.bit_length() - 1)
    # quotient_degree_factor is a power of two in practice; next_step = qdf
    assert next_step == common.quotient_degree_factor

    nr = common.config.num_routed_wires
    num_prods = common.num_partial_products
    chunk = common.permutation_partial_product_degree()
    k_arr = np.array(common.k_is, dtype=np.uint64)

    si = common.selectors_info
    many = si.num_selectors > 1
    consts_offset = si.num_selectors + common.num_lookup_selectors
    has_lookup = common.num_lookup_polys != 0
    nzs = common.num_zs_partial_products_polys()
    nlp = common.num_lookup_polys

    def lookup_fn(cs_nat, wires_nat, zs_pp_nat, deltas, lut_evals):
        b = cs_nat[0].shape[1]
        A = DeviceBatchAlgebra(b)

        def rows(vals, rng):
            return [(vals[0][i], vals[1][i]) for i in rng]

        local_constants = rows(cs_nat, range(consts_offset))
        local_wires = rows(wires_nat, range(wires_nat[0].shape[0]))
        lookup_selectors = local_constants[si.num_selectors : consts_offset]
        lzs = rows(zs_pp_nat, range(nzs, nzs + nc * nlp))
        nxt = [
            (
                jnp.roll(zs_pp_nat[0][i], -next_step, axis=-1),
                jnp.roll(zs_pp_nat[1][i], -next_step, axis=-1),
            )
            for i in range(nzs, nzs + nc * nlp)
        ]

        def bc(lo, hi):
            return (jnp.broadcast_to(lo, (b,)), jnp.broadcast_to(hi, (b,)))

        terms = []
        for i in range(nc):
            d4 = [bc(deltas[0][4 * i + k], deltas[1][4 * i + k]) for k in range(4)]
            evals_i = [
                bc(lut_evals[0][i, li], lut_evals[1][i, li])
                for li in range(len(common.luts))
            ]
            terms.extend(
                _lookup_terms(
                    common, A, local_wires,
                    lzs[nlp * i : nlp * (i + 1)],
                    nxt[nlp * i : nlp * (i + 1)],
                    lookup_selectors, d4, evals_i,
                )
            )
        return jnp.stack([t[0] for t in terms]), jnp.stack([t[1] for t in terms])

    lookup_jit = jax.jit(lookup_fn) if has_lookup else None

    def gate_terms_fn(cs_nat, wires_nat, pis_hash):
        """Filtered constraint blocks per gate type (separate jits), padded
        and summed into [num_gate_constraints, B]."""
        blocks = []
        for gate_idx, gate in enumerate(common.gates):
            if gate.num_constraints() == 0:
                continue  # NoopGate
            sel = si.selector_indices[gate_idx]
            jfn = _gate_block_fn(
                gate,
                (gate_idx, sel),
                si.groups[sel],
                many,
                consts_offset,
                common.num_constants,
            )
            blocks.append(jfn(cs_nat, wires_nat, pis_hash))
        return _combine_blocks(blocks, common.num_gate_constraints)

    def fn(cs_nat, zs_pp_nat, wires_nat, gate_terms, lookup_terms, shifted_xs, l0, zh_inv, betas, gammas, alphas):
        # all *_nat are (lo,hi) pairs with shape [num_polys, lde_n]
        b = cs_nat[0].shape[1]
        constraint_terms = [
            (gate_terms[0][i], gate_terms[1][i])
            for i in range(gate_terms[0].shape[0])
        ]

        # --- permutation-argument terms, lane-stacked ---------------------
        x = (shifted_xs[0], shifted_xs[1])  # [B]
        l_0_x = (l0[0], l0[1])
        one = gf.ones((b,))
        wires80 = (wires_nat[0][:nr], wires_nat[1][:nr])  # [nr,B]
        sigmas80 = (
            cs_nat[0][common.num_constants :],
            cs_nat[1][common.num_constants :],
        )
        k_c = gf.from_u64(k_arr)  # [nr]
        s_id = gf.mul(
            (k_c[0][:, None], k_c[1][:, None]), (x[0][None], x[1][None])
        )  # [nr,B]

        z1_terms = []
        pp_term_blocks = []
        for i in range(nc):
            beta = (betas[0][i], betas[1][i])
            gamma = (gammas[0][i], gammas[1][i])
            beta_b = (
                jnp.broadcast_to(beta[0], s_id[0].shape),
                jnp.broadcast_to(beta[1], s_id[1].shape),
            )
            gamma_b = (
                jnp.broadcast_to(gamma[0], s_id[0].shape),
                jnp.broadcast_to(gamma[1], s_id[1].shape),
            )
            nums = gf.add(wires80, gf.add(gf.mul(beta_b, s_id), gamma_b))
            dens = gf.add(wires80, gf.add(gf.mul(beta_b, sigmas80), gamma_b))
            nums_c = gf.prod_mod_p(
                (nums[0].reshape(nr // chunk, chunk, b), nums[1].reshape(nr // chunk, chunk, b)),
                axis=1,
            )  # [nr/chunk, B]
            dens_c = gf.prod_mod_p(
                (dens[0].reshape(nr // chunk, chunk, b), dens[1].reshape(nr // chunk, chunk, b)),
                axis=1,
            )
            z_x = (zs_pp_nat[0][i], zs_pp_nat[1][i])
            z_gx = (
                jnp.roll(zs_pp_nat[0][i], -next_step, axis=-1),
                jnp.roll(zs_pp_nat[1][i], -next_step, axis=-1),
            )
            pstart = nc + i * num_prods
            accs = (
                jnp.concatenate(
                    [z_x[0][None], zs_pp_nat[0][pstart : pstart + num_prods], z_gx[0][None]]
                ),
                jnp.concatenate(
                    [z_x[1][None], zs_pp_nat[1][pstart : pstart + num_prods], z_gx[1][None]]
                ),
            )  # [num_prods+2, B]
            pp_cons = gf.sub(
                gf.mul((accs[0][:-1], accs[1][:-1]), nums_c),
                gf.mul((accs[0][1:], accs[1][1:]), dens_c),
            )  # [nr/chunk, B]
            z1_terms.append(gf.mul(l_0_x, gf.sub(z_x, one)))
            pp_term_blocks.append(pp_cons)

        t_lo = jnp.concatenate(
            [jnp.stack([t[0] for t in z1_terms])]
            + [blk[0] for blk in pp_term_blocks]
            + [lookup_terms[0]]
            + [jnp.stack([t[0] for t in constraint_terms])]
        )  # [T, B]
        t_hi = jnp.concatenate(
            [jnp.stack([t[1] for t in z1_terms])]
            + [blk[1] for blk in pp_term_blocks]
            + [lookup_terms[1]]
            + [jnp.stack([t[1] for t in constraint_terms])]
        )
        num_terms = t_lo.shape[0]

        out_lo, out_hi = [], []
        for i in range(nc):
            alpha = (alphas[0][i], alphas[1][i])
            w = gf.powers_scan(alpha, num_terms)
            red = gf.weighted_sum((t_lo, t_hi), w)  # [B]
            q = gf.mul(red, (zh_inv[0], zh_inv[1]))
            out_lo.append(q[0])
            out_hi.append(q[1])
        return jnp.stack(out_lo), jnp.stack(out_hi)

    jfn = jax.jit(fn)

    def qfn(cs_nat, wires_nat, zs_pp_nat, shifted_xs, l0, zh_inv, betas, gammas, alphas, pis_hash,
            deltas=None, lut_evals=None):
        gate_terms = gate_terms_fn(cs_nat, wires_nat, pis_hash)
        if has_lookup:
            lookup_terms = lookup_jit(cs_nat, wires_nat, zs_pp_nat, deltas, lut_evals)
        else:
            b = cs_nat[0].shape[1]
            lookup_terms = (
                jnp.zeros((0, b), dtype=gf.U32),
                jnp.zeros((0, b), dtype=gf.U32),
            )
        return jfn(
            cs_nat, zs_pp_nat, wires_nat, gate_terms, lookup_terms,
            shifted_xs, l0, zh_inv, betas, gammas, alphas,
        )

    _QUOTIENT_FN_CACHE[key] = qfn
    return qfn


@partial(jax.jit, static_argnums=(1,))
def _combine_blocks(blocks, num_constraints: int):
    """Pad per-gate blocks to a common length and sum exactly mod p."""
    padded_lo = [
        jnp.pad(lo, ((0, num_constraints - lo.shape[0]), (0, 0))) for lo, _ in blocks
    ]
    padded_hi = [
        jnp.pad(hi, ((0, num_constraints - hi.shape[0]), (0, 0))) for _, hi in blocks
    ]
    return gf.sum_mod_p((jnp.stack(padded_lo), jnp.stack(padded_hi)), axis=0)
