"""Vanishing-polynomial evaluation.

Two instantiations of the same constraint algebra (single-source gates):
  * eval_vanishing_poly_host — exact extension arithmetic at one point
    (the verifier's check at zeta; reference plonk/vanishing_poly.rs:57).
  * build_quotient_fn — the flop-dominant batched device kernel
    evaluating ALL constraints over the whole 2^(n+rate) coset at once
    (reference plonk/prover.rs:640-864 + vanishing_poly.rs:166-340,
    re-designed from a 32-point rayon batch loop into one fused
    jit program over the full domain).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..gates.algebra import DeviceBatchAlgebra, EvalVars, HostExtAlgebra
from ..gates.gate import compute_filter
from ..ops import gf

Ext = Tuple[int, ...]


# ---------------------------------------------------------------------------
# Shared constraint-term construction, parameterized by algebra
# ---------------------------------------------------------------------------


def _gate_constraint_terms(common, A, local_constants, local_wires, pis_hash):
    """Filtered, combined gate constraints (vanishing_poly.rs
    evaluate_gate_constraints*)."""
    si = common.selectors_info
    num_sel = si.num_selectors
    many = num_sel > 1
    gate_consts = local_constants[num_sel + common.num_lookup_selectors :]
    vars = EvalVars(gate_consts, local_wires, pis_hash)
    combined = [A.zero() for _ in range(common.num_gate_constraints)]
    device = isinstance(A, DeviceBatchAlgebra)
    for gate_idx, gate in enumerate(common.gates):
        sel = si.selector_indices[gate_idx]
        filt = compute_filter(A, gate_idx, si.groups[sel], local_constants[sel], many)
        evals = (
            gate.eval_unfiltered_device(vars, A)
            if device
            else gate.eval_unfiltered(vars, A)
        )
        for k, c in enumerate(evals):
            combined[k] = A.add(combined[k], A.mul(filt, c))
    return combined


def _chunked_products(A, values: List, chunk: int) -> List:
    out = []
    for start in range(0, len(values), chunk):
        acc = None
        for v in values[start : start + chunk]:
            acc = v if acc is None else A.mul(acc, v)
        out.append(acc)
    return out


def _partial_product_checks(A, numerators, denominators, partials, z_x, z_gx, max_degree):
    """prev_acc * prod(num chunk) - next_acc * prod(den chunk)
    (util/partial_products.rs:52-93)."""
    accs = [z_x] + list(partials) + [z_gx]
    nums = _chunked_products(A, numerators, max_degree)
    dens = _chunked_products(A, denominators, max_degree)
    assert len(nums) == len(dens) == len(accs) - 1
    return [
        A.sub(A.mul(accs[i], nums[i]), A.mul(accs[i + 1], dens[i]))
        for i in range(len(nums))
    ]


def _vanishing_terms(
    common,
    A,
    x,  # evaluation point (algebra element)
    l_0_x,
    local_constants,
    local_wires,
    pis_hash,
    local_zs,
    next_zs,
    partial_products,
    s_sigmas,
    betas,  # algebra elements (per challenge)
    gammas,
    one_const,
):
    """Ordered term list: z1 terms | partial-product terms | gate terms
    (vanishing_poly.rs:216-320)."""
    nc = common.config.num_challenges
    num_prods = common.num_partial_products
    nr = common.config.num_routed_wires

    constraint_terms = _gate_constraint_terms(
        common, A, local_constants, local_wires, pis_hash
    )

    z1_terms = []
    pp_terms = []
    for i in range(nc):
        z_x = local_zs[i]
        z_gx = next_zs[i]
        z1_terms.append(A.mul(l_0_x, A.sub(z_x, one_const)))
        numerators = []
        denominators = []
        for j in range(nr):
            wire = local_wires[j]
            s_id = A.mul_const(x, common.k_is[j])
            numerators.append(A.add(wire, A.add(A.mul(betas[i], s_id), gammas[i])))
            denominators.append(
                A.add(wire, A.add(A.mul(betas[i], s_sigmas[j]), gammas[i]))
            )
        cur_pps = partial_products[i * num_prods : (i + 1) * num_prods]
        pp_terms.extend(
            _partial_product_checks(
                A, numerators, denominators, cur_pps, z_x, z_gx,
                common.permutation_partial_product_degree(),
            )
        )
    return z1_terms + pp_terms + constraint_terms


# ---------------------------------------------------------------------------
# Host (verifier) instantiation
# ---------------------------------------------------------------------------


def eval_vanishing_poly_host(
    common,
    zeta: Ext,
    local_constants: Sequence[Ext],
    local_wires: Sequence[Ext],
    pis_hash: Sequence[int],
    local_zs: Sequence[Ext],
    next_zs: Sequence[Ext],
    partial_products: Sequence[Ext],
    s_sigmas: Sequence[Ext],
    betas: Sequence[int],
    gammas: Sequence[int],
    alphas: Sequence[int],
) -> List[Ext]:
    A = HostExtAlgebra()
    n = common.degree
    # L_0(zeta) = (zeta^n - 1) / (n * (zeta - 1))
    zeta_pow_n = ge.ext_exp(zeta, n)
    z_h = ge.ext_sub(zeta_pow_n, ge.ext_one(2))
    l_0 = ge.ext_mul(
        z_h,
        ge.ext_inv(
            ge.ext_scalar_mul(ge.ext_sub(zeta, ge.ext_one(2)), n % gl.P)
        ),
    )
    terms = _vanishing_terms(
        common,
        A,
        zeta,
        l_0,
        list(local_constants),
        list(local_wires),
        [A.const(h) for h in pis_hash],
        list(local_zs),
        list(next_zs),
        list(partial_products),
        list(s_sigmas),
        [A.const(b) for b in betas],
        [A.const(g) for g in gammas],
        A.one(),
    )
    out = []
    for a in alphas:
        acc = ge.ext_zero(2)
        alpha = ge.from_base(a, 2)
        for t in reversed(terms):
            acc = ge.ext_add(ge.ext_mul(acc, alpha), t)
        out.append(acc)
    return out


# ---------------------------------------------------------------------------
# Device (prover quotient) instantiation
# ---------------------------------------------------------------------------


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

    def fn(cs_nat, zs_pp_nat, wires_nat, gate_terms, shifted_xs, l0, zh_inv, betas, gammas, alphas):
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
            + [jnp.stack([t[0] for t in constraint_terms])]
        )  # [T, B]
        t_hi = jnp.concatenate(
            [jnp.stack([t[1] for t in z1_terms])]
            + [blk[1] for blk in pp_term_blocks]
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

    def qfn(cs_nat, wires_nat, zs_pp_nat, shifted_xs, l0, zh_inv, betas, gammas, alphas, pis_hash):
        gate_terms = gate_terms_fn(cs_nat, wires_nat, pis_hash)
        return jfn(
            cs_nat, zs_pp_nat, wires_nat, gate_terms,
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
