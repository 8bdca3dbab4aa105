"""Poseidon permutation / sponge as Pallas TPU kernels.

Why: the XLA formulation of the Poseidon round (ops/poseidon.py) is
~1.2k elementwise u32 ops per round that XLA:TPU does NOT fuse — each
op becomes its own HBM round trip, measured at ~2% of compute
speed-of-light (3.9 Mperms/s, benches/kernels.py, 2026-08-19). These
kernels hold the 24 lane vectors in VMEM across all 30 rounds (and,
for the sponge, across ALL absorb iterations of a Merkle leaf row), so
HBM traffic drops to one read of the input block and one write of the
output block — the permutation becomes VPU compute bound.

Layout: lane-major [12, B] limb planes (matching ops/poseidon.permute_t)
reshaped to [12, B/128, 128] so each lane j is a [S, 128] VMEM tile —
full 8x128 vregs, no 12-wide minor-axis padding.

The round math (MDS multiply-accumulate, S-box, constant layer) is the
SAME traced code as the XLA path — mds_lanes/_sbox7 imported from
ops/poseidon — so there is one source of truth for the arithmetic;
these kernels only change where the intermediates live. Bit-identical
to the reference permutation via ops/poseidon's test vectors
(core/src/poseidon_goldilocks.rs) run through the pallas path.

Reference parallelism this replaces: core/src/poseidon.rs:178-520
(scalar/SIMD MDS + fast partial rounds) under rayon par_iter
(core/src/merkle_tree.rs:112-144).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hash.poseidon import NUM_HASH_OUT_ELTS
from ..hash.poseidon_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_RATE,
    SPONGE_WIDTH,
)
from . import gf
from .poseidon import _sbox7, mds_lanes

W = SPONGE_WIDTH
LANES = 128

_RC = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, W)
_RC_LO = (_RC & np.uint64(0xFFFF_FFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)


def _permute_lanes(ll, lh, rcl_ref, rch_ref):
    """30-round permutation over 12 (lo, hi) lane tiles held in VMEM.

    Three fori_loops (full / partial / full) so partial rounds trace a
    1-S-box body instead of masking 12; round constants are scalar
    reads from the SMEM tables."""

    def _advance(r, carry, sbox_all: bool):
        cll, clh = carry
        lanes = []
        for j in range(W):
            x = gf.add((cll[j], clh[j]), (rcl_ref[r, j], rch_ref[r, j]))
            if sbox_all or j == 0:
                x = _sbox7(x)
            lanes.append(x)
        out = mds_lanes(lanes)
        return tuple(o[0] for o in out), tuple(o[1] for o in out)

    carry = (tuple(ll), tuple(lh))
    carry = jax.lax.fori_loop(
        0, HALF_N_FULL_ROUNDS, partial(_advance, sbox_all=True), carry
    )
    carry = jax.lax.fori_loop(
        HALF_N_FULL_ROUNDS,
        HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS,
        partial(_advance, sbox_all=False),
        carry,
    )
    carry = jax.lax.fori_loop(
        HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS,
        N_ROUNDS,
        partial(_advance, sbox_all=True),
        carry,
    )
    return list(carry[0]), list(carry[1])


def _permute_body(rcl_ref, rch_ref, xlo_ref, xhi_ref, olo_ref, ohi_ref):
    # NOTE a stacked-[12, S, L] body with a circulant-roll MDS was tried
    # here (2026-08-21): it traced ~20x fewer ops but Mosaic compiled the
    # roll-in-scan kernel ~50x SLOWER (a single tree-level program went
    # 10 s -> ~480 s of compile) and ran 1.8x slower — reverted.
    ll = [xlo_ref[j] for j in range(W)]
    lh = [xhi_ref[j] for j in range(W)]
    ll, lh = _permute_lanes(ll, lh, rcl_ref, rch_ref)
    for j in range(W):
        olo_ref[j] = ll[j]
        ohi_ref[j] = lh[j]


def _sponge_body(
    w_in: int, cap_val: int, rcl_ref, rch_ref, xlo_ref, xhi_ref, olo_ref, ohi_ref
):
    """Overwrite-mode sponge over a [w_in, S, 128] input block: the state
    never leaves VMEM between the ceil(w_in/8) absorb permutations."""
    s, l = xlo_ref.shape[1], xlo_ref.shape[2]
    z = jnp.zeros((s, l), jnp.uint32)
    ll = [z] * W
    lh = [z] * W
    if cap_val:
        ll[SPONGE_RATE] = jnp.full((s, l), np.uint32(cap_val & 0xFFFF_FFFF))
        lh[SPONGE_RATE] = jnp.full((s, l), np.uint32(cap_val >> 32))

    n_full = w_in // SPONGE_RATE
    carry = (tuple(ll), tuple(lh))

    def absorb(c, carry):
        nl = list(carry[0])
        nh = list(carry[1])
        base = c * SPONGE_RATE
        for i in range(SPONGE_RATE):
            nl[i] = xlo_ref[base + i]
            nh[i] = xhi_ref[base + i]
        nl, nh = _permute_lanes(nl, nh, rcl_ref, rch_ref)
        return tuple(nl), tuple(nh)

    if n_full:
        carry = jax.lax.fori_loop(0, n_full, absorb, carry)
    k = w_in - n_full * SPONGE_RATE
    if k:
        nl = list(carry[0])
        nh = list(carry[1])
        for i in range(k):
            nl[i] = xlo_ref[n_full * SPONGE_RATE + i]
            nh[i] = xhi_ref[n_full * SPONGE_RATE + i]
        nl, nh = _permute_lanes(nl, nh, rcl_ref, rch_ref)
        carry = (tuple(nl), tuple(nh))
    for j in range(NUM_HASH_OUT_ELTS):
        olo_ref[j] = carry[0][j]
        ohi_ref[j] = carry[1][j]


def _pad_rows(x, rows_pad):
    """[w, B] -> [w, rows, 128] with the row axis padded to rows_pad."""
    w, b = x.shape
    flat_pad = rows_pad * LANES - b
    if flat_pad:
        x = jnp.pad(x, ((0, 0), (0, flat_pad)))
    return x.reshape(w, rows_pad, LANES)


def _grid_rows(b: int, block_rows: int):
    rows = -(-b // LANES)
    rows_pad = -(-rows // block_rows) * block_rows
    return rows_pad, rows_pad // block_rows


_SMEM_RC = pl.BlockSpec(
    (N_ROUNDS, W), lambda i: (0, 0), memory_space=pltpu.SMEM
)


@partial(jax.jit, static_argnames=("interpret", "block_rows"))
def permute_t(state: gf.Gf, interpret: bool = False, block_rows: int = 64) -> gf.Gf:
    """[12, B] lane-major Poseidon permutation, fused in VMEM.

    jit-wrapped so the trace-heavy kernel body (unrolled MDS) is traced
    once per shape per process and spliced into every enclosing program
    from pjit's jaxpr cache — a [2^15]-leaf tree program re-traced it
    5x per tree, ~100 s of the cold prove."""
    lo, hi = state
    b = lo.shape[1]
    rows_pad, grid = _grid_rows(b, block_rows)
    spec = pl.BlockSpec((W, block_rows, LANES), lambda i: (0, i, 0))
    out_shape = jax.ShapeDtypeStruct((W, rows_pad, LANES), jnp.uint32)
    olo, ohi = pl.pallas_call(
        _permute_body,
        out_shape=(out_shape, out_shape),
        grid=(grid,),
        in_specs=[_SMEM_RC, _SMEM_RC, spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(
        jnp.asarray(_RC_LO),
        jnp.asarray(_RC_HI),
        _pad_rows(lo, rows_pad),
        _pad_rows(hi, rows_pad),
    )
    return (
        olo.reshape(W, -1)[:, :b],
        ohi.reshape(W, -1)[:, :b],
    )


@lru_cache(maxsize=None)
def _sponge_block_rows(w_in: int) -> int:
    """Input block (2 planes) capped near 2 MB; power-of-two rows ≥ 8."""
    budget = (2 << 20) // max(w_in * LANES * 4 * 2, 1)
    rows = 8
    while rows * 2 <= min(budget, 64):
        rows *= 2
    return rows


@partial(jax.jit, static_argnames=("cap_val", "interpret"))
def sponge_t(
    tlo, thi, cap_val: int, interpret: bool = False
) -> gf.Gf:
    """Overwrite-mode sponge over lane-major [w, B] inputs; returns
    ([B, 4] lo, hi) digests like ops/poseidon._sponge_t. jit-wrapped for
    the same per-shape trace caching as permute_t."""
    w, b = tlo.shape
    block_rows = _sponge_block_rows(w)
    rows_pad, grid = _grid_rows(b, block_rows)
    in_spec = pl.BlockSpec((w, block_rows, LANES), lambda i: (0, i, 0))
    out_spec = pl.BlockSpec(
        (NUM_HASH_OUT_ELTS, block_rows, LANES), lambda i: (0, i, 0)
    )
    out_shape = jax.ShapeDtypeStruct(
        (NUM_HASH_OUT_ELTS, rows_pad, LANES), jnp.uint32
    )
    olo, ohi = pl.pallas_call(
        partial(_sponge_body, w, cap_val),
        out_shape=(out_shape, out_shape),
        grid=(grid,),
        in_specs=[_SMEM_RC, _SMEM_RC, in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(
        jnp.asarray(_RC_LO),
        jnp.asarray(_RC_HI),
        _pad_rows(tlo, rows_pad),
        _pad_rows(thi, rows_pad),
    )
    return (
        olo.reshape(NUM_HASH_OUT_ELTS, -1)[:, :b].T,
        ohi.reshape(NUM_HASH_OUT_ELTS, -1)[:, :b].T,
    )
