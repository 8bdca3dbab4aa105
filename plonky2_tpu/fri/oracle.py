"""PolynomialBatch — the FRI oracle: a batch of polynomials committed via
coset-LDE + Merkle tree, plus batch opening-proof production.

TPU redesign of plonky2/src/fri/oracle.rs:33-360: the polynomial batch
is a device-resident [num_polys, N] limb pair; IFFT/LDE/transpose/
bit-reverse/Merkle are fused device work (ops.fri_kernels); the opening
reduction (final-poly construction) runs as extension-weighted sums and
a log-depth synthetic-division scan on device. Host code only drives the
transcript and the query-phase gathers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..hash.challenger import Challenger
from ..ops import fri_kernels as fk
from ..ops import gf, merkle, ntt
from ..parallel import context as pctx
from ..utils.bits import log2_strict, reverse_bits
from .config import FriParams
from .proof import FriProof
from .structure import FriInstanceInfo

SALT_SIZE = 4


def _pad_rows_for_mesh(x: gf.Gf) -> gf.Gf:
    """Pad the poly axis with zero rows to a multiple of the mesh size
    (sharding requires even splits; zero polys LDE to zero and are
    sliced off before leaf hashing, so commitments are unchanged)."""
    key = pctx.mesh_key()
    if key is None:
        return x
    d = pctx.axis_size(key)
    pad = (-x[0].shape[0]) % d
    if pad:
        x = (
            jnp.pad(x[0], ((0, pad), (0, 0))),
            jnp.pad(x[1], ((0, pad), (0, 0))),
        )
    return x


@dataclass
class PolynomialBatch:
    """polynomials: device coeffs [num_polys, N] (possibly zero-row padded
    to the mesh size — n_polys is the true count); merkle_tree leaves are
    point-major bit-reversed LDE rows [lde_n, n_polys]."""

    polynomials: gf.Gf
    merkle_tree: merkle.DeviceMerkleTree
    degree_log: int
    rate_bits: int
    blinding: bool
    n_polys: int

    @property
    def num_polys(self) -> int:
        return self.n_polys

    @property
    def padded_num_polys(self) -> int:
        return self.polynomials[0].shape[0]

    @staticmethod
    def from_values(
        values: gf.Gf, rate_bits: int, blinding: bool, cap_height: int, hasher=None
    ) -> "PolynomialBatch":
        # Under a mesh, shard the batch over the poly axis first: the IFFT
        # is then comm-free per shard (oracle.rs:168's per-poly par_iter).
        num_polys = values[0].shape[0]
        values = pctx.put(_pad_rows_for_mesh(values), pctx.polys_sharding(pctx.mesh_key()))
        coeffs = ntt.ifft_jit(values)
        return PolynomialBatch.from_coeffs(
            coeffs, rate_bits, blinding, cap_height, hasher=hasher,
            num_polys=num_polys,
        )

    @staticmethod
    def from_coeffs(
        coeffs: gf.Gf, rate_bits: int, blinding: bool, cap_height: int, hasher=None,
        num_polys: Optional[int] = None,
    ) -> "PolynomialBatch":
        if num_polys is None:
            num_polys = coeffs[0].shape[0]
        coeffs = pctx.put(_pad_rows_for_mesh(coeffs), pctx.polys_sharding(pctx.mesh_key()))
        degree = coeffs[0].shape[-1]
        salt = None
        if blinding:
            # SALT_SIZE random leaf columns hide the committed rows
            # (oracle.rs:243-264); salts never join the algebraic openings.
            # PLONKY2_TPU_SALT_SEED pins the salt stream for drift tests
            # (host path vs device transcript) — unset in production.
            import os as _os

            _seed = _os.environ.get("PLONKY2_TPU_SALT_SEED")
            rng = np.random.default_rng(int(_seed) if _seed else None)
            salt_u64 = rng.integers(
                0, gl.P, size=(degree << rate_bits, SALT_SIZE), dtype=np.uint64
            )
            salt = gf.from_u64(salt_u64)
        tree = fk.commit(
            coeffs, rate_bits, cap_height, salt=salt, hasher=hasher,
            num_polys=num_polys,
        )
        return PolynomialBatch(
            polynomials=coeffs,
            merkle_tree=tree,
            degree_log=log2_strict(degree),
            rate_bits=rate_bits,
            blinding=blinding,
            n_polys=num_polys,
        )

    @property
    def salt_size(self) -> int:
        return SALT_SIZE if self.blinding else 0

    def get_lde_values(self, index: int, step: int = 1) -> List[int]:
        """LDE row at point index*step (leaf order is bit-reversed,
        oracle.rs:286-292)."""
        idx = reverse_bits(index * step, self.degree_log + self.rate_bits)
        row = self.merkle_tree.leaf_u64(idx)
        return [int(x) for x in row]

    def cap_u64(self) -> np.ndarray:
        return self.merkle_tree.cap_u64()

    def eval_all_at_ext(self, zeta: Tuple[int, ...]) -> List[Tuple[int, ...]]:
        """Evaluate every polynomial at an extension point (for OpeningSet).

        Device: Horner over coefficients is sequential, so evaluate via the
        power basis: p(z) = sum_i c_i z^i = two weighted sums of coefficient
        columns with host-precomputed z-powers."""
        pw = ext_powers_np(zeta, self.polynomials[0].shape[-1])
        e0, e1 = _eval_all_jit(
            self.polynomials, gf.from_u64(pw[:, 0]), gf.from_u64(pw[:, 1])
        )
        u0 = gf.to_u64(e0)
        u1 = gf.to_u64(e1)
        return [(int(a), int(b)) for a, b in zip(u0, u1)][: self.n_polys]


@jax.jit
def _eval_all_jit(polynomials, w0, w1):
    coeffs_t = (polynomials[0].T, polynomials[1].T)  # [N, M]
    return gf.weighted_sum(coeffs_t, w0), gf.weighted_sum(coeffs_t, w1)


def ext_powers_np(zeta: Tuple[int, ...], n: int) -> np.ndarray:
    """[n, 2] u64 powers 1, z, ..., z^(n-1) by vectorized doubling:
    log2(n) numpy steps instead of n Python extension multiplies."""
    a = np.array([1], dtype=np.uint64)
    b = np.array([0], dtype=np.uint64)
    za, zb = int(zeta[0]), int(zeta[1])  # current z^len
    W = 7  # quadratic extension x^2 - 7
    while a.shape[0] < n:
        # (a + b x) * (za + zb x) = (a*za + 7 b*zb) + (a*zb + b*za) x
        na = gl.np_add(
            gl.np_mul(a, np.uint64(za)),
            gl.np_mul(np.uint64(W), gl.np_mul(b, np.uint64(zb))),
        )
        nb = gl.np_add(gl.np_mul(a, np.uint64(zb)), gl.np_mul(b, np.uint64(za)))
        a = np.concatenate([a, na])
        b = np.concatenate([b, nb])
        za, zb = ge.ext_mul((za, zb), (za, zb))
    out = np.stack([a[:n], b[:n]], axis=1)
    return out


def eval_commitments_at(
    oracles: Sequence["PolynomialBatch"], zeta, zeta_next
) -> List[List[Tuple[int, ...]]]:
    """All oracles at zeta plus all oracles at g*zeta in ONE device
    dispatch + ONE transfer (the per-oracle variant costs a sync each —
    measurable over a high-latency TPU link)."""
    n = oracles[0].polynomials[0].shape[-1]
    for o in oracles:
        assert o.polynomials[0].shape[-1] == n
    pz = ext_powers_np(zeta, n)
    pn = ext_powers_np(zeta_next, n)
    args = []
    for o in oracles:
        args.append(o.polynomials)
    e = _eval_many_jit(
        tuple(tuple(a) for a in args),
        gf.from_u64(pz[:, 0]),
        gf.from_u64(pz[:, 1]),
        gf.from_u64(pn[:, 0]),
        gf.from_u64(pn[:, 1]),
    )
    flat = np.asarray(gf.to_u64((e[0], e[1])))  # [2*sum_m_padded, 2] stacked
    out: List[List[Tuple[int, ...]]] = []
    pos = 0
    for _ in range(2):  # zeta block, then g*zeta block
        for o in oracles:
            m = o.padded_num_polys
            out.append(
                [(int(r[0]), int(r[1])) for r in flat[pos : pos + o.num_polys]]
            )
            pos += m
    return out


@jax.jit
def _eval_many_jit(poly_groups, z0, z1, n0, n1):
    outs0, outs1 = [], []
    for polys in poly_groups:
        ct = (polys[0].T, polys[1].T)
        a = gf.weighted_sum(ct, z0)
        b = gf.weighted_sum(ct, z1)
        outs0.append(jnp.stack([a[0], b[0]], axis=-1))
        outs1.append(jnp.stack([a[1], b[1]], axis=-1))
    for polys in poly_groups:
        ct = (polys[0].T, polys[1].T)
        a = gf.weighted_sum(ct, n0)
        b = gf.weighted_sum(ct, n1)
        outs0.append(jnp.stack([a[0], b[0]], axis=-1))
        outs1.append(jnp.stack([a[1], b[1]], axis=-1))
    return jnp.concatenate(outs0, axis=0), jnp.concatenate(outs1, axis=0)


@jax.jit
def _shift_accumulate_jit(final, quotient, shift_pair):
    part = gf.ext2_mul(
        final,
        (
            jnp.broadcast_to(shift_pair[0], final[0].shape),
            jnp.broadcast_to(shift_pair[1], final[1].shape),
        ),
    )
    return gf.add(part, quotient)


def _expression_weights(
    instance: FriInstanceInfo,
    alpha: Tuple[int, ...],
) -> Tuple[List[Dict[Tuple[int, int], Tuple[int, ...]]], List[int]]:
    """Per batch: accumulated extension weight for each (oracle, poly),
    mirroring ReducingFactor bookkeeping (alpha^k per opening expression,
    expression coefficients folded in). Returns (per-batch weight maps,
    per-batch opening counts)."""
    weight_maps = []
    counts = []
    for batch in instance.batches:
        wmap: Dict[Tuple[int, int], Tuple[int, ...]] = {}
        apow = ge.ext_one(2)
        for k, expr in enumerate(batch.openings):
            for term in expr.terms:
                c = term.coefficient
                if c.kind == "one":
                    coeff = apow
                elif c.kind == "point_power":
                    coeff = ge.ext_mul(apow, ge.ext_exp(batch.point, c.power))
                else:
                    coeff = ge.ext_mul(apow, c.constant)
                key = (term.polynomial.oracle_index, term.polynomial.polynomial_index)
                wmap[key] = ge.ext_add(wmap.get(key, ge.ext_zero(2)), coeff)
            apow = ge.ext_mul(apow, alpha)
        weight_maps.append(wmap)
        counts.append(len(batch.openings))
    return weight_maps, counts


def reduce_openings_to_final_poly(
    instance: FriInstanceInfo,
    oracles: Sequence[PolynomialBatch],
    alpha: Tuple[int, ...],
) -> gf.Gf:
    """final_poly = sum over batches of alpha-shifted linear-combination
    quotients (oracle.rs:129-165 reduce_openings_to_unmasked_final_poly).
    Returns extension coeffs [N, 2] on device."""
    n = oracles[0].polynomials[0].shape[-1]
    for o in oracles:
        assert o.polynomials[0].shape[-1] == n
    weight_maps, counts = _expression_weights(instance, alpha)

    final: Optional[gf.Gf] = None
    for b, (wmap, cnt) in enumerate(zip(weight_maps, counts)):
        point = instance.batches[b].point
        # composition poly = sum of weighted base polys, per oracle
        comp: Optional[gf.Gf] = None
        by_oracle: Dict[int, List[Tuple[int, Tuple[int, ...]]]] = {}
        for (oi, pi), w in wmap.items():
            by_oracle.setdefault(oi, []).append((pi, w))
        for oi, items in sorted(by_oracle.items()):
            items.sort()
            sel = np.array([pi for pi, _ in items], dtype=np.int32)
            weights = np.array([w for _, w in items], dtype=np.uint64)  # [k, 2]
            polys = (
                jnp.take(oracles[oi].polynomials[0], sel, axis=0),
                jnp.take(oracles[oi].polynomials[1], sel, axis=0),
            )
            part = fk.composition_poly(polys, weights)  # [N, 2]
            comp = part if comp is None else gf.add(comp, part)
        quotient = fk.divide_by_linear_ext(comp, point)  # [N, 2]
        if final is None:
            final = quotient
        else:
            shift = ge.ext_exp(alpha, cnt)
            final = _shift_accumulate_jit(final, quotient, gf.ext2_const(shift))
    return final


def prove_openings(
    instance: FriInstanceInfo,
    oracles: Sequence[PolynomialBatch],
    challenger: Challenger,
    fri_params: FriParams,
    final_poly_coeff_len: Optional[int] = None,
    max_num_query_steps: Optional[int] = None,
    hasher=None,
) -> FriProof:
    """Batch opening proof (oracle.rs:320-358 prove_openings)."""
    from .prover import fri_proof  # local import to avoid cycle

    alpha = challenger.get_extension_challenge(2)
    final_poly = reduce_openings_to_final_poly(instance, oracles, alpha)

    # pad to LDE size and evaluate on the shifted coset
    lde_size = fri_params.lde_size
    n = final_poly[0].shape[0]
    assert n <= lde_size
    pad = [(0, lde_size - n), (0, 0)]
    lde_coeffs = (jnp.pad(final_poly[0], pad), jnp.pad(final_poly[1], pad))
    lde_values = fk.ext_coset_fft(lde_coeffs)

    return fri_proof(
        [o.merkle_tree for o in oracles],
        lde_coeffs,
        lde_values,
        challenger,
        fri_params,
        final_poly_coeff_len,
        max_num_query_steps,
        hasher=hasher,
    )
