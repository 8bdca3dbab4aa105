"""Batched Poseidon permutation and sponge hashing on device.

State layout: ``[B, 12]`` as (lo, hi) u32 limb planes — each round is
pure elementwise VPU work:

  * constant layer: vector add of a [12] constant row;
  * S-box x^7: 4 field muls (all 12 lanes in full rounds, lane 0 only
    in partial rounds — selected by a static mask, the wasted lanes are
    negligible next to the MDS);
  * MDS: the circulant+diagonal 12x12 matrix has entries < 2^6, so the
    matrix-vector product is ONE broadcast u32 multiply over
    ``[B, 12, 12]`` (per-entry 64x6-bit products as 3 u32 limbs) followed
    by a carry-safe tree-sum: limbs split into 16-bit half-planes so a
    plain ``jnp.sum`` over the 12-axis cannot overflow, then a single
    carry-propagation + Goldilocks reduce128.

This is a redesign of the reference's scalar/SIMD MDS tricks
(core/src/poseidon.rs:178-520 mds_row_shf / fast partial rounds) for a
vector machine: the "fast partial round" sparse-matrix factorization
optimizes a *serial* dependent chain and is pointless when all 144
products are one fused multiply; the output is bit-identical to the
reference permutation (tested against core/src/poseidon_goldilocks.rs
test vectors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..hash.poseidon import MDS_FULL, NUM_HASH_OUT_ELTS
from ..hash.poseidon_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_RATE,
    SPONGE_WIDTH,
)
from . import gf
from .gf import U32, _addc, _mul32

_M16 = U32(0xFFFF)

# [12, 12] u32 MDS matrix (entries < 2^6)
_MDS_NP = np.array(MDS_FULL, dtype=np.uint32)

# Round constants as [30, 12] limb planes
_RC = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, SPONGE_WIDTH)
_RC_LO = (_RC & np.uint64(0xFFFF_FFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)


def _sbox7(x: gf.Gf) -> gf.Gf:
    x2 = gf.mul(x, x)
    x4 = gf.mul(x2, x2)
    x3 = gf.mul(x, x2)
    return gf.mul(x3, x4)


def _mds_layer(state: gf.Gf) -> gf.Gf:
    """out[., r] = sum_j MDS[r, j] * state[., j], exactly mod p."""
    lo, hi = state  # [B, 12]
    m = _MDS_NP  # [12(r), 12(j)]
    # per-entry products: x * c with x = lo + hi*2^32, c < 2^6
    # -> 3 u32 limbs (t0, t1, t2), t2 < 2^6
    bl = lo[..., None, :]  # [B, 1, 12] broadcast against [12, 12]
    bh = hi[..., None, :]
    l0, l1 = _mul32(bl, m)  # lo*c: l1 < 2^6
    h0, h1 = _mul32(bh, m)  # hi*c
    t1, c0 = _addc(l1, h0)
    t2 = h1 + c0
    # Sum 12 products without overflow: split each limb into 16-bit
    # half-planes (sum of 12 halves < 2^20, safe in u32).
    def _sum_halves(t):
        return (
            jnp.sum(t & _M16, axis=-1, dtype=U32),
            jnp.sum(t >> U32(16), axis=-1, dtype=U32),
        )

    s0l, s0h = _sum_halves(l0)
    s1l, s1h = _sum_halves(t1)
    s2l, s2h = _sum_halves(t2)
    # Recombine the six half-plane sums into four u32 limbs
    w0, c = _addc(s0l, (s0h & _M16) << U32(16))
    carry0 = c + (s0h >> U32(16))
    w1a, c1 = _addc(s1l, (s1h & _M16) << U32(16))
    w1, c2 = _addc(w1a, carry0)
    carry1 = c1 + c2 + (s1h >> U32(16))
    w2a, c3 = _addc(s2l, (s2h & _M16) << U32(16))
    w2, c4 = _addc(w2a, carry1)
    w3 = c3 + c4 + (s2h >> U32(16))
    return gf.reduce128(w0, w1, w2, w3)


_IS_FULL = np.array(
    [
        r < HALF_N_FULL_ROUNDS or r >= HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS
        for r in range(N_ROUNDS)
    ]
)
_LANE0 = np.arange(SPONGE_WIDTH) == 0


def permute(state: gf.Gf) -> gf.Gf:
    """Batched Poseidon permutation; state is [..., 12] limb planes.

    One round is traced once inside a ``fori_loop`` (keeps the XLA graph
    ~30x smaller than unrolling; each round is elementwise so no fusion
    is lost). Partial rounds use a lane mask: the S-box is evaluated on
    all lanes and discarded outside lane 0 — 4 extra vector muls against
    the 144-product MDS, cheaper than a scatter."""
    lo, hi = state
    assert lo.shape[-1] == SPONGE_WIDTH
    rc_lo = jnp.asarray(_RC_LO)
    rc_hi = jnp.asarray(_RC_HI)
    is_full = jnp.asarray(_IS_FULL)
    lane0 = jnp.asarray(_LANE0)

    def body(r, s):
        s = gf.add(s, (rc_lo[r], rc_hi[r]))
        sb = _sbox7(s)
        m = is_full[r] | lane0
        s = (jnp.where(m, sb[0], s[0]), jnp.where(m, sb[1], s[1]))
        return _mds_layer(s)

    return jax.lax.fori_loop(0, N_ROUNDS, body, (lo, hi))


# ---------------------------------------------------------------------------
# Batched sponge hashing
# ---------------------------------------------------------------------------


def hash_leaf(leaves: gf.Gf) -> gf.Gf:
    """Domain-separated Merkle leaf hash of a [B, W] batch -> [B, 4] digests.

    Capacity lane RATE is set to W+1 (this fork's hashing.rs hash_leaf);
    rows are absorbed in overwrite mode, RATE lanes per permutation.
    """
    lo, hi = leaves
    b, w = lo.shape
    state = gf.zeros((b, SPONGE_WIDTH))
    cap_val = w + 1  # < 2^32 in practice
    state = (
        state[0].at[:, SPONGE_RATE].set(U32(cap_val & 0xFFFF_FFFF)),
        state[1].at[:, SPONGE_RATE].set(U32(cap_val >> 32)),
    )
    for start in range(0, w, SPONGE_RATE):
        k = min(SPONGE_RATE, w - start)
        state = (
            state[0].at[:, :k].set(lo[:, start : start + k]),
            state[1].at[:, :k].set(hi[:, start : start + k]),
        )
        state = permute(state)
    return state[0][:, :NUM_HASH_OUT_ELTS], state[1][:, :NUM_HASH_OUT_ELTS]


def two_to_one(left: gf.Gf, right: gf.Gf) -> gf.Gf:
    """Compress [B, 4] + [B, 4] -> [B, 4] with zero capacity."""
    lo = jnp.concatenate(
        [left[0], right[0], jnp.zeros_like(left[0])], axis=-1
    )
    hi = jnp.concatenate(
        [left[1], right[1], jnp.zeros_like(left[1])], axis=-1
    )
    out = permute((lo, hi))
    return out[0][:, :NUM_HASH_OUT_ELTS], out[1][:, :NUM_HASH_OUT_ELTS]


def hash_no_pad_batch(inputs: gf.Gf) -> gf.Gf:
    """Overwrite-mode sponge over [B, W] rows, zero capacity -> [B, 4]."""
    lo, hi = inputs
    b, w = lo.shape
    state = gf.zeros((b, SPONGE_WIDTH))
    for start in range(0, w, SPONGE_RATE):
        k = min(SPONGE_RATE, w - start)
        state = (
            state[0].at[:, :k].set(lo[:, start : start + k]),
            state[1].at[:, :k].set(hi[:, start : start + k]),
        )
        state = permute(state)
    return state[0][:, :NUM_HASH_OUT_ELTS], state[1][:, :NUM_HASH_OUT_ELTS]
