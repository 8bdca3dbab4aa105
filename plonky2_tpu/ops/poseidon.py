"""Batched Poseidon permutation and sponge hashing on device.

Layout: the public API takes ``[B, 12]`` (lo, hi) u32 limb planes, but
internally the permutation runs STRUCTURE-OF-ARRAYS — 12 separate [B]
lane vectors. On TPU the minor axis tiles to 128 lanes, so a [B, 12]
array physically pads 12 -> 128 (10.7x wasted bandwidth) and the naive
[B, 12, 12] MDS broadcast pads to [B, 16, 128] (~100x inflated
temporaries — measured 2% of compute speed-of-light in round 2's kernel
suite). In SoA form every op is a full-width [B] vector op:

  * constant layer: per-lane add of a [12, 1] constant column;
  * S-box x^7: 4 field muls, evaluated on all lanes and kept only on
    lane 0 in partial rounds (mask select — 4 wasted muls beat a
    scatter);
  * MDS: out_r = sum_j MDS[r, j] * s_j with static entries < 2^6 —
    per output lane, 12 (64x6-bit -> 4-plane) products accumulated in
    16-bit half-planes (sums of 12 halves stay < 2^26, carry-safe in
    u32), one carry-recombination + Goldilocks reduce128 per lane.

One round is traced once inside a ``fori_loop``; on TPU the whole
permutation is dispatched to a Pallas kernel that keeps the 24 lane
vectors in VMEM across all 30 rounds (see ``pallas_kernels``).
This is a redesign of the reference's scalar/SIMD MDS
tricks (core/src/poseidon.rs:178-520 mds_row_shf / fast partial
rounds) for a vector machine: the "fast partial round" sparse-matrix
factorization optimizes a *serial* dependent chain and is pointless
when the batch axis fills the vector unit; the output is bit-identical
to the reference permutation (tested against
core/src/poseidon_goldilocks.rs test vectors).
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

_M16 = np.uint32(0xFFFF)  # np scalars: stay literals inside Pallas kernels
_S16 = np.uint32(16)

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


def mds_lanes(lanes: list) -> list:
    """MDS over 12 independent lanes: lanes[j] is a (lo, hi) limb pair of
    any (shared) shape; returns out[r] = sum_j MDS[r, j] * lanes[j],
    exactly mod p, as a fully unrolled static-constant multiply-
    accumulate. The broadcast formulation ([B, 12, 12] / [12, 12, B]
    product tensor + axis-reduce) materializes ~1.2 GB of temporaries
    per round at B = 2^20 (measured 2% of SoL); here every op is an
    elementwise vector op.

    Shape-agnostic on purpose: this is the single source of the MDS
    math, consumed both by the XLA path below and by the Pallas kernel
    (ops/poseidon_pallas.py) that runs it out of VMEM.

    Entries c < 2^6, so x*c splits into four 16-bit-aligned planes
    p_k = half_k(x) * c < 2^22; twelve-term sums stay < 2^26 in u32.
    The planes recombine into three u32 limbs, then one reduce128."""
    half = [
        (
            lo & _M16,
            lo >> _S16,
            hi & _M16,
            hi >> _S16,
        )
        for lo, hi in lanes
    ]
    out = []
    for r in range(SPONGE_WIDTH):
        acc = [None, None, None, None]  # 16-bit-aligned planes, < 2^26
        for j in range(SPONGE_WIDTH):
            c = np.uint32(_MDS_NP[r, j])
            for k in range(4):
                p = half[j][k] * c
                acc[k] = p if acc[k] is None else acc[k] + p
        # recombine planes (acc[k] at bit 16k, each < 2^26) into limbs
        c0 = acc[0] & _M16
        u1 = (acc[0] >> _S16) + (acc[1] & _M16)
        u2 = (acc[1] >> _S16) + (acc[2] & _M16) + (u1 >> _S16)
        u3 = (acc[2] >> _S16) + (acc[3] & _M16) + (u2 >> _S16)
        u4 = (acc[3] >> _S16) + (u3 >> _S16)
        w0 = c0 | ((u1 & _M16) << _S16)
        w1 = (u2 & _M16) | ((u3 & _M16) << _S16)
        w2 = u4
        out.append(gf.reduce128(w0, w1, w2, jnp.zeros_like(w2)))
    return out


def _mds_layer_t(state: gf.Gf) -> gf.Gf:
    """Lane-major MDS over a [12, B] stacked state (XLA path).

    Same 16-bit-half-plane algebra as ``mds_lanes``, expressed as four
    exact u32 matmuls ([12,12] x [12,B]; products < 2^22, 12-term sums
    < 2^26 — no wraparound) instead of 576 Python-unrolled
    multiply-adds: ~10 traced ops instead of ~2300, which is what makes
    the permute body cheap to re-trace in every program that embeds it.
    The Pallas kernels keep the unrolled ``mds_lanes`` form (Mosaic has
    no integer dot)."""
    lo, hi = state  # [12, B]
    halves = (lo & _M16, lo >> _S16, hi & _M16, hi >> _S16)
    mds = jnp.asarray(_MDS_NP)  # [12(out), 12(in)] u32, entries < 2^6
    dot = lambda h: jax.lax.dot_general(
        mds, h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.uint32
    )
    acc = [dot(h) for h in halves]  # 16-bit-aligned planes, < 2^26
    c0 = acc[0] & _M16
    u1 = (acc[0] >> _S16) + (acc[1] & _M16)
    u2 = (acc[1] >> _S16) + (acc[2] & _M16) + (u1 >> _S16)
    u3 = (acc[2] >> _S16) + (acc[3] & _M16) + (u2 >> _S16)
    u4 = (acc[3] >> _S16) + (u3 >> _S16)
    w0 = c0 | ((u1 & _M16) << _S16)
    w1 = (u2 & _M16) | ((u3 & _M16) << _S16)
    w2 = u4
    return gf.reduce128(w0, w1, w2, jnp.zeros_like(w2))


_IS_FULL = np.array(
    [
        r < HALF_N_FULL_ROUNDS or r >= HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS
        for r in range(N_ROUNDS)
    ]
)
_LANE0 = np.arange(SPONGE_WIDTH) == 0

# Minimum batch for the Pallas kernels: below this the launch + row
# padding overhead beats the fusion win (duplex challenger, tiny tree
# tops); at/above it the kernel holds the state in VMEM for all rounds.
_PALLAS_MIN_B = 2048


def _interp() -> bool:
    from . import pallas_kernels as _pk

    return _pk.interpret_mode()


def _use_pallas(b: int) -> bool:
    if b < _PALLAS_MIN_B:
        return False
    from ..parallel import context as _pctx
    from . import pallas_kernels as _pk

    # Under a GSPMD mesh the hashing arrays are globally sharded;
    # pallas_call has no partitioning rule, so the mesh path instead
    # routes through _mesh_pallas (shard_map with shard-local pallas
    # calls) — this gate only covers the meshless case.
    return _pctx.get_mesh() is None and _pk.use_pallas()


def _mesh_pallas(b: int):
    """If a prover mesh is active and the per-shard batch is still
    Pallas-sized, return ((mesh, axis), interpret) so callers can run the
    Pallas kernel shard-locally under shard_map (rows are independent, so
    sharding the batch axis is exact). None -> caller falls back to XLA.

    This is the multi-chip analogue of the reference's SIMD hashing under
    rayon tree parallelism (core/src/poseidon_goldilocks.rs NEON dispatch
    x core/src/merkle_tree.rs:112-144 subtree fill)."""
    from ..parallel import context as _pctx
    from . import pallas_kernels as _pk

    key = _pctx.mesh_key()
    if key is None or not _pk.use_pallas():
        return None
    n = _pctx.axis_size(key)
    if b % n or (b // n) < _PALLAS_MIN_B:
        return None
    return key, _pk.interpret_mode()


def permute_t(state: gf.Gf) -> gf.Gf:
    """Lane-major Poseidon permutation; state is [12, B] limb planes —
    the internal layout every sponge below uses (one transpose at the
    batch boundary instead of 10.7x padding waste per round).

    One round is traced once inside a ``fori_loop`` (keeps the XLA graph
    ~30x smaller than unrolling; each round is elementwise so no fusion
    is lost). Partial rounds use a lane mask: the S-box is evaluated on
    all lanes and discarded outside lane 0 — 4 extra vector muls against
    the 144-product MDS, cheaper than a scatter."""
    lo, hi = state
    assert lo.shape[0] == SPONGE_WIDTH
    mp = _mesh_pallas(lo.shape[1])
    if mp is not None:
        from jax.sharding import PartitionSpec as _P

        from . import poseidon_pallas

        (mesh, axis), interp = mp
        spec = _P(None, axis)
        f = jax.shard_map(
            lambda l, h: poseidon_pallas.permute_t((l, h), interpret=interp),
            mesh=mesh,
            in_specs=(spec, spec),
            out_specs=(spec, spec),
            check_vma=False,  # pallas_call outputs carry no vma annotations
        )
        return f(lo, hi)
    if _use_pallas(lo.shape[1]):
        from . import poseidon_pallas

        return poseidon_pallas.permute_t(state, interpret=_interp())
    rc_lo = jnp.asarray(_RC_LO)  # [30, 12]
    rc_hi = jnp.asarray(_RC_HI)
    is_full = jnp.asarray(_IS_FULL)
    lane0 = jnp.asarray(_LANE0)[:, None]  # [12, 1]

    def body(r, s):
        s = gf.add(s, (rc_lo[r][:, None], rc_hi[r][:, None]))
        sb = _sbox7(s)
        m = is_full[r] | lane0
        s = (jnp.where(m, sb[0], s[0]), jnp.where(m, sb[1], s[1]))
        return _mds_layer_t(s)

    return jax.lax.fori_loop(0, N_ROUNDS, body, (lo, hi))


def permute(state: gf.Gf) -> gf.Gf:
    """Batched Poseidon permutation; state is [..., 12] limb planes
    (compatibility wrapper: transposes to the lane-major layout once on
    each side of permute_t)."""
    lo, hi = state
    assert lo.shape[-1] == SPONGE_WIDTH
    lead = lo.shape[:-1]
    tl = jnp.moveaxis(lo.reshape(-1, SPONGE_WIDTH), -1, 0)
    th = jnp.moveaxis(hi.reshape(-1, SPONGE_WIDTH), -1, 0)
    ol, oh = permute_t((tl, th))
    return (
        jnp.moveaxis(ol, 0, -1).reshape(lead + (SPONGE_WIDTH,)),
        jnp.moveaxis(oh, 0, -1).reshape(lead + (SPONGE_WIDTH,)),
    )


# ---------------------------------------------------------------------------
# Batched sponge hashing
# ---------------------------------------------------------------------------


def _sponge_t(tlo, thi, cap_val: int) -> gf.Gf:
    """Overwrite-mode sponge over lane-major inputs [W, B]; capacity lane
    RATE preset to cap_val. Returns [B, 4] digests (one transpose out).

    Multi-chunk absorbs run as ONE ``lax.scan`` over RATE-lane chunks so
    the permutation body is traced and compiled once, not ceil(w/8)
    times — an 88-wide Merkle leaf hash used to instantiate 11 permute
    bodies, the dominant term in the prover's trace+compile time."""
    w, b = tlo.shape
    mp = _mesh_pallas(b)
    if mp is not None:
        from jax.sharding import PartitionSpec as _P

        from . import poseidon_pallas

        (mesh, axis), interp = mp
        f = jax.shard_map(
            lambda l, h: poseidon_pallas.sponge_t(l, h, cap_val, interpret=interp),
            mesh=mesh,
            in_specs=(_P(None, axis), _P(None, axis)),
            out_specs=(_P(axis, None), _P(axis, None)),
            check_vma=False,  # pallas_call outputs carry no vma annotations
        )
        return f(tlo, thi)
    if _use_pallas(b):
        from . import poseidon_pallas

        return poseidon_pallas.sponge_t(tlo, thi, cap_val, interpret=_interp())
    slo = jnp.zeros((SPONGE_WIDTH, b), U32)
    shi = jnp.zeros((SPONGE_WIDTH, b), U32)
    if cap_val:
        slo = slo.at[SPONGE_RATE].set(U32(cap_val & 0xFFFF_FFFF))
        shi = shi.at[SPONGE_RATE].set(U32(cap_val >> 32))
    if w <= SPONGE_RATE:
        # single absorb (challenger-adjacent small hashes): loop-free
        slo = jnp.concatenate([tlo, slo[w:]], axis=0)
        shi = jnp.concatenate([thi, shi[w:]], axis=0)
        slo, shi = permute_t((slo, shi))
        return slo[:NUM_HASH_OUT_ELTS].T, shi[:NUM_HASH_OUT_ELTS].T
    nc = -(-w // SPONGE_RATE)
    pad = nc * SPONGE_RATE - w
    if pad:
        tlo = jnp.concatenate([tlo, jnp.zeros((pad, b), U32)], axis=0)
        thi = jnp.concatenate([thi, jnp.zeros((pad, b), U32)], axis=0)
    chunks_lo = tlo.reshape(nc, SPONGE_RATE, b)
    chunks_hi = thi.reshape(nc, SPONGE_RATE, b)
    # overwrite lane i of chunk c iff c*RATE+i < w (pad lanes keep state,
    # matching the unrolled path's partial final overwrite)
    mask = jnp.asarray(
        (np.arange(nc * SPONGE_RATE) < w).reshape(nc, SPONGE_RATE, 1)
    )

    def body(state, xs):
        slo, shi = state
        clo, chi, m = xs
        top_lo = jnp.where(m, clo, slo[:SPONGE_RATE])
        top_hi = jnp.where(m, chi, shi[:SPONGE_RATE])
        slo = jnp.concatenate([top_lo, slo[SPONGE_RATE:]], axis=0)
        shi = jnp.concatenate([top_hi, shi[SPONGE_RATE:]], axis=0)
        return permute_t((slo, shi)), None

    (slo, shi), _ = jax.lax.scan(body, (slo, shi), (chunks_lo, chunks_hi, mask))
    return slo[:NUM_HASH_OUT_ELTS].T, shi[:NUM_HASH_OUT_ELTS].T


def hash_leaf(leaves: gf.Gf) -> gf.Gf:
    """Domain-separated Merkle leaf hash of a [B, W] batch -> [B, 4]
    digests. Capacity lane RATE is set to W+1 (this fork's hashing.rs
    hash_leaf); rows are absorbed in overwrite mode, RATE lanes per
    permutation. One transpose in/out; the sponge runs lane-major."""
    lo, hi = leaves
    b, w = lo.shape
    return _sponge_t(lo.T, hi.T, w + 1)


def two_to_one(left: gf.Gf, right: gf.Gf) -> gf.Gf:
    """Compress [B, 4] + [B, 4] -> [B, 4] with zero capacity."""
    tlo = jnp.concatenate([left[0].T, right[0].T], axis=0)  # [8, B]
    thi = jnp.concatenate([left[1].T, right[1].T], axis=0)
    b = tlo.shape[1]
    slo = jnp.concatenate([tlo, jnp.zeros((SPONGE_WIDTH - 8, b), U32)], axis=0)
    shi = jnp.concatenate([thi, jnp.zeros((SPONGE_WIDTH - 8, b), U32)], axis=0)
    olo, ohi = permute_t((slo, shi))
    return olo[:NUM_HASH_OUT_ELTS].T, ohi[:NUM_HASH_OUT_ELTS].T


def hash_no_pad_batch(inputs: gf.Gf) -> gf.Gf:
    """Overwrite-mode sponge over [B, W] rows, zero capacity -> [B, 4]."""
    lo, hi = inputs
    return _sponge_t(lo.T, hi.T, 0)
