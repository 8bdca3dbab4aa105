"""Batched NTT / LDE over Goldilocks on device.

Layout: a polynomial batch is ``[num_polys, N]`` as a (lo, hi) u32 limb
pair. The transform is an iterative radix-2 DIT (bit-reverse, then
log2(N) butterfly passes), vmapped over the batch dimension by
construction — every pass is pure elementwise VPU work plus one
reshape, which XLA fuses aggressively.

Reference capability: field/src/fft.rs (fft/ifft, per-stage root
tables, coset fft, LDE). The reference's `zero_factor` trick (skipping
the first `rate_bits` stages of a zero-padded LDE input) is implemented
here by *seeding* the DIT at a coarser stage: the first r stages of a
DIT on input whose nonzero coefficients all sit in the low N slots act
on blocks whose butterflies only copy/scale, so we replicate the
bit-reversed base array across the 2^r sub-lattices with the
appropriate coset scaling instead of running those stages
(see lde_onto_coset below).

Fiat–Shamir contract: ``fft(coeffs)[i] = poly(g^i)`` with g the
canonical 2^k-th root (POWER_OF_TWO_GENERATOR lineage), matching the
reference's evaluation order.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..utils.bits import log2_strict, reverse_index_bits_perm
from . import gf

# ---------------------------------------------------------------------------
# Host-side twiddle precomputation (cached per size)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _stage_roots_np(n_log: int, inverse: bool) -> tuple:
    """Per-stage twiddle tables for DIT butterflies.

    Stage s (s = 0..n_log-1) pairs lanes j and j+2^s within blocks of
    2^(s+1); twiddle for offset j is w_s^j where w_s is the primitive
    2^(s+1)-th root (or its inverse).
    """
    tables = []
    for s in range(n_log):
        w = gl.primitive_root_of_unity(s + 1)
        if inverse:
            w = gl.ginv(w)
        tables.append(gl.np_powers(w, 1 << s))
    return tuple(tables)


@lru_cache(maxsize=None)
def stage_roots(n_log: int, inverse: bool) -> tuple:
    """Twiddles as numpy (lo, hi) limb pairs per stage.

    Kept as numpy so traces treat them as fresh constants (caching jnp
    arrays created inside a trace would leak tracers across jits)."""
    return tuple(_split_np(t) for t in _stage_roots_np(n_log, inverse))


def _split_np(x_u64: np.ndarray):
    x = np.asarray(x_u64, dtype=np.uint64)
    return (
        (x & np.uint64(0xFFFF_FFFF)).astype(np.uint32),
        (x >> np.uint64(32)).astype(np.uint32),
    )


def _bitrev_idx(n: int):
    return reverse_index_bits_perm(n)


# ---------------------------------------------------------------------------
# Core transforms
# ---------------------------------------------------------------------------


def bit_reverse(x: gf.Gf) -> gf.Gf:
    idx = _bitrev_idx(x[0].shape[-1])
    return jnp.take(x[0], idx, axis=-1), jnp.take(x[1], idx, axis=-1)


def _butterflies(x: gf.Gf, tables, first_stage: int = 0) -> gf.Gf:
    """DIT stages first_stage..log2(N), input already bit-reversed (or
    seeded past the first ``first_stage`` stages — see lde_onto_coset).
    x: [..., N]; tables is indexed by absolute stage number."""
    lo, hi = x
    lead = lo.shape[:-1]
    n = lo.shape[-1]
    n_log = log2_strict(n)
    for s in range(first_stage, n_log):
        half = 1 << s
        nblocks = n >> (s + 1)
        rlo = lo.reshape(lead + (nblocks, 2, half))
        rhi = hi.reshape(lead + (nblocks, 2, half))
        u = (rlo[..., 0, :], rhi[..., 0, :])
        v = (rlo[..., 1, :], rhi[..., 1, :])
        wlo, whi = tables[s]
        t = gf.mul(v, (jnp.broadcast_to(wlo, v[0].shape), jnp.broadcast_to(whi, v[1].shape)))
        a = gf.add(u, t)
        b = gf.sub(u, t)
        lo = jnp.stack([a[0], b[0]], axis=-2).reshape(lead + (n,))
        hi = jnp.stack([a[1], b[1]], axis=-2).reshape(lead + (n,))
    return lo, hi


def fft(coeffs: gf.Gf) -> gf.Gf:
    """Coefficients -> values on the 2^k subgroup, natural (power) order."""
    n_log = log2_strict(coeffs[0].shape[-1])
    return _butterflies(bit_reverse(coeffs), stage_roots(n_log, False))


def ifft(values: gf.Gf) -> gf.Gf:
    """Values on subgroup -> coefficients."""
    n = values[0].shape[-1]
    n_log = log2_strict(n)
    out = _butterflies(bit_reverse(values), stage_roots(n_log, True))
    n_inv = gl.ginv(n % gl.P)
    return gf.mul_const(out, n_inv)


@lru_cache(maxsize=None)
def _shift_powers(shift: int, n: int):
    return _split_np(gl.np_powers(shift, n))


def coset_fft(coeffs: gf.Gf, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gf.Gf:
    """Values of the polynomial on the coset shift*H."""
    n = coeffs[0].shape[-1]
    sp = _shift_powers(shift, n)
    scaled = gf.mul(coeffs, (jnp.broadcast_to(sp[0], coeffs[0].shape), jnp.broadcast_to(sp[1], coeffs[1].shape)))
    return fft(scaled)


def coset_ifft(values: gf.Gf, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gf.Gf:
    """Inverse of coset_fft."""
    coeffs = ifft(values)
    sp = _shift_powers(gl.ginv(shift), values[0].shape[-1])
    return gf.mul(coeffs, (jnp.broadcast_to(sp[0], coeffs[0].shape), jnp.broadcast_to(sp[1], coeffs[1].shape)))


def lde(coeffs: gf.Gf, rate_bits: int) -> gf.Gf:
    """Zero-pad coefficients by 2^rate_bits (reference: PolynomialCoeffs::lde)."""
    lo, hi = coeffs
    n = lo.shape[-1]
    pad = [(0, 0)] * (lo.ndim - 1) + [(0, n * ((1 << rate_bits) - 1))]
    return jnp.pad(lo, pad), jnp.pad(hi, pad)


def lde_onto_coset(coeffs: gf.Gf, rate_bits: int,
                   shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gf.Gf:
    """LDE evaluated on the shifted coset — the FRI oracle's commitment values
    (reference: fri/oracle.rs:193-223 from_coeffs).

    Implements the reference's ``zero_factor`` optimization
    (field/src/fft.rs:159-192): the first ``rate_bits`` DIT stages of a
    zero-padded input only copy — after bit-reversal the nonzero entries
    sit at stride 2^rate_bits and every butterfly partner is zero — so
    the transform is *seeded* at stage ``rate_bits`` by replicating the
    bit-reversed n-point array across each 2^rate_bits block
    (state[i] = scaled_coeffs[rev_n(i >> rate_bits)]), skipping
    rate_bits/log2(lde_n) of the butterfly work."""
    if rate_bits == 0:
        return coset_fft(coeffs, shift)
    n = coeffs[0].shape[-1]
    n_log = log2_strict(n)
    # coset scaling acts on the unpadded coefficients (zeros stay zero)
    sp = _shift_powers(shift, n)
    scaled = gf.mul(
        coeffs,
        (jnp.broadcast_to(sp[0], coeffs[0].shape),
         jnp.broadcast_to(sp[1], coeffs[1].shape)),
    )
    z = bit_reverse(scaled)  # [..., n], n-bit reversal
    seed = (
        jnp.repeat(z[0], 1 << rate_bits, axis=-1),
        jnp.repeat(z[1], 1 << rate_bits, axis=-1),
    )
    return _butterflies(
        seed, stage_roots(n_log + rate_bits, False), first_stage=rate_bits
    )


# ---------------------------------------------------------------------------
# Host-side naive evaluation (test oracle)
# ---------------------------------------------------------------------------


def naive_eval_np(coeffs_u64: np.ndarray, points_u64: np.ndarray) -> np.ndarray:
    """Horner evaluation of each row of coeffs at each point. O(N^2); tests only."""
    out = np.zeros(coeffs_u64.shape[:-1] + points_u64.shape, dtype=np.uint64)
    for j, x in enumerate(points_u64):
        acc = np.zeros(coeffs_u64.shape[:-1], dtype=np.uint64)
        for c in coeffs_u64[..., ::-1].transpose(-1, *range(coeffs_u64.ndim - 1)):
            acc = gl.np_add(gl.np_mul(acc, x), c)
        out[..., j] = acc
    return out


# Module-level jitted entry points: a fresh ``jax.jit(fn)`` per call has its
# own cache and would retrace+recompile every invocation.
fft_jit = jax.jit(fft)
ifft_jit = jax.jit(ifft)
coset_fft_jit = jax.jit(coset_fft, static_argnums=(1,))
coset_ifft_jit = jax.jit(coset_ifft, static_argnums=(1,))
