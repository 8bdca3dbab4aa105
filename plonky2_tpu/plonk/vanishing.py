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
    for gate_idx, gate in enumerate(common.gates):
        sel = si.selector_indices[gate_idx]
        filt = compute_filter(A, gate_idx, si.groups[sel], local_constants[sel], many)
        for k, c in enumerate(gate.eval_unfiltered(vars, A)):
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

    def fn(cs_nat, wires_nat, zs_pp_nat, shifted_xs, l0, zh_inv, betas, gammas, alphas, pis_hash):
        # all *_nat are (lo,hi) pairs with shape [num_polys, lde_n]
        b = cs_nat[0].shape[1]
        A = DeviceBatchAlgebra(b)

        def rows(vals):
            return [(vals[0][i], vals[1][i]) for i in range(vals[0].shape[0])]

        consts_all = rows(cs_nat)
        local_constants = consts_all[: common.num_constants]
        s_sigmas = consts_all[common.num_constants :]
        local_wires = rows(wires_nat)
        zs_pp = rows(zs_pp_nat)
        local_zs = zs_pp[: nc]
        partial_products = zs_pp[nc : nc * (1 + common.num_partial_products)]
        # next-row Zs: roll the value arrays by next_step along the domain
        next_zs = [
            (
                jnp.roll(zs_pp_nat[0][i], -next_step, axis=-1),
                jnp.roll(zs_pp_nat[1][i], -next_step, axis=-1),
            )
            for i in range(nc)
        ]
        x = (shifted_xs[0], shifted_xs[1])
        l_0_x = (l0[0], l0[1])
        beta_elems = [(betas[0][i], betas[1][i]) for i in range(nc)]
        beta_elems = [
            (jnp.broadcast_to(lo, (b,)), jnp.broadcast_to(hi, (b,)))
            for lo, hi in beta_elems
        ]
        gamma_elems = [
            (
                jnp.broadcast_to(gammas[0][i], (b,)),
                jnp.broadcast_to(gammas[1][i], (b,)),
            )
            for i in range(nc)
        ]
        pis = [
            (
                jnp.broadcast_to(pis_hash[0][i], (b,)),
                jnp.broadcast_to(pis_hash[1][i], (b,)),
            )
            for i in range(4)
        ]

        terms = _vanishing_terms(
            common, A, x, l_0_x, local_constants, local_wires, pis,
            local_zs, next_zs, partial_products, s_sigmas,
            beta_elems, gamma_elems, A.one(),
        )
        t_lo = jnp.stack([t[0] for t in terms])  # [T, B]
        t_hi = jnp.stack([t[1] for t in terms])
        num_terms = len(terms)

        out_lo, out_hi = [], []
        for i in range(nc):
            alpha = (alphas[0][i], alphas[1][i])
            # alpha powers [T]
            pows_lo, pows_hi = [jnp.ones((), gf.U32)], [jnp.zeros((), gf.U32)]
            for _ in range(num_terms - 1):
                nxt = gf.mul((pows_lo[-1], pows_hi[-1]), alpha)
                pows_lo.append(nxt[0])
                pows_hi.append(nxt[1])
            w = (jnp.stack(pows_lo), jnp.stack(pows_hi))
            red = gf.weighted_sum((t_lo, t_hi), w)  # [B]
            q = gf.mul(red, (zh_inv[0], zh_inv[1]))
            out_lo.append(q[0])
            out_hi.append(q[1])
        return jnp.stack(out_lo), jnp.stack(out_hi)

    jfn = jax.jit(fn)
    _QUOTIENT_FN_CACHE[key] = jfn
    return jfn
