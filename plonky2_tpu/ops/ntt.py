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

import os
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
    from .bitrev import bitrev_gf

    return bitrev_gf(x, axis=-1)


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


def _butterflies_rows(x: gf.Gf, tables, first_stage: int = 0) -> gf.Gf:
    """DIT butterflies along axis -2 (the sublane/row axis); the minor
    axis rides along as vector lanes and is never reshaped or permuted,
    so every stage is pure full-lane elementwise VPU work — the
    TPU-friendly orientation (the last-axis variant above reshapes the
    minor dim every stage, forcing a relayout per HBM pass). Measured on
    v5e: radix-4 stage-pairing and where-select assembly both LOSE to
    this radix-2 + concatenate form (XLA materializes their extra
    intermediates); stage fusion beyond radix-2 belongs to the Pallas
    column kernel, not XLA.

    x: [..., N, L], input bit-reversed along axis -2 (or seeded past
    first_stage); tables indexed by absolute stage ([2^s] twiddles).
    """
    lo, hi = x
    lead = lo.shape[:-2]
    n, lanes = lo.shape[-2], lo.shape[-1]
    n_log = log2_strict(n)

    for s in range(first_stage, n_log):
        half = 1 << s
        nblocks = n >> (s + 1)
        rlo = lo.reshape(lead + (nblocks, 2, half, lanes))
        rhi = hi.reshape(lead + (nblocks, 2, half, lanes))
        u = (rlo[..., 0, :, :], rhi[..., 0, :, :])
        v = (rlo[..., 1, :, :], rhi[..., 1, :, :])
        wlo, whi = tables[s]
        wv = (
            jnp.broadcast_to(jnp.asarray(wlo)[:, None], v[0].shape),
            jnp.broadcast_to(jnp.asarray(whi)[:, None], v[1].shape),
        )
        t = gf.mul(v, wv)
        a = gf.add(u, t)
        b = gf.sub(u, t)
        lo = jnp.concatenate([a[0], b[0]], axis=-2).reshape(lead + (n, lanes))
        hi = jnp.concatenate([a[1], b[1]], axis=-2).reshape(lead + (n, lanes))
    return lo, hi


# ---------------------------------------------------------------------------
# Four-step (Bailey) transform for large N
#
# The flat radix-2 pipeline above embeds its per-stage root tables as XLA
# constants (O(N) data baked into the executable — 817 MB at 2^24) and its
# late stages stride across the whole array (measured ~1% of the blocked
# 2-pass speed-of-light at 2^24). Past _FOUR_STEP_LOG the transform runs
# as DFT_N = transpose . DFT_N1 . twiddle . DFT_N2 . transpose over the
# [N2, N1] row-major matrix view: every butterfly acts on a contiguous
# 2^~12-wide row, the only full-array data movements are matrix
# transposes (XLA's tiled relayout), and the N-sized twiddle matrix is
# built ON DEVICE once per (size, direction) and cached — executables
# stay O(sqrt N). This is the single-chip sibling of the mesh six-step
# NTT (parallel/ntt.py); reference capability: field/src/fft.rs +
# projects/cache-friendly-fft (the reference's own planned blocked FFT).
# ---------------------------------------------------------------------------

_FOUR_STEP_LOG = int(os.environ.get("PLONKY2_TPU_FOUR_STEP_LOG", "16"))

def _build_twiddles_np(a: np.ndarray, n2_log: int) -> np.ndarray:
    """T[i, j] = a[i]^j for j in [2^n2_log], by column-doubling: log2(N2)
    vectorized numpy passes (exact u64 Goldilocks mul)."""
    n1 = a.shape[0]
    n2 = 1 << n2_log
    t = np.zeros((n1, n2), dtype=np.uint64)
    t[:, 0] = 1
    step = a.copy()  # a^filled
    filled = 1
    while filled < n2:
        k = min(filled, n2 - filled)
        t[:, filled : filled + k] = gl.np_mul(t[:, :k], step[:, None])
        step = gl.np_mul(step, step)
        filled += k
    return t


def _split_logs(n_log: int):
    n1_log = n_log // 2
    return n1_log, n_log - n1_log


@lru_cache(maxsize=None)
def _twiddle_factors(n_log: int, inverse: bool):
    """The four-step twiddle T[n1, k2] = w^(n1*k2) in FACTORED form:
    with k2 = k2b*2^ha + k2a, T = A[n1, k2a] * B[n1, k2b] where
    A[n1, j] = w^(n1*j) and B[n1, j] = (w^(2^ha))^(n1*j). The factors
    are O(N1*sqrt(N2)) numpy constants (~1.6 MB at 2^22) — embedding
    the full O(N) matrix (32 MB at 2^22) as an XLA constant is what
    made the flat path's executables gigabytes, and this jax version
    embeds even closed-over device arrays as MLIR literals."""
    n1_log, n2_log = _split_logs(n_log)
    ha = n2_log // 2
    hb = n2_log - ha
    w = gl.primitive_root_of_unity(n_log)
    if inverse:
        w = gl.ginv(w)
    base = gl.np_powers(w, 1 << n1_log)  # w^(n1)
    a = _split_np(_build_twiddles_np(base, ha))  # [N1, 2^ha]
    base_b = gl.np_powers(gl.gexp(w, 1 << ha), 1 << n1_log)  # (w^(2^ha))^(n1)
    b = _split_np(_build_twiddles_np(base_b, hb))  # [N1, 2^hb]
    return a, b, ha, hb


def _apply_twiddle(y: gf.Gf, n_log: int, inverse: bool) -> gf.Gf:
    """y[..., n1, k2] *= w^(n1*k2) via the factored tables (two
    broadcast multiplies; no O(N) constant)."""
    a, b, ha, hb = _twiddle_factors(n_log, inverse)
    lead = y[0].shape[:-2]
    n1 = y[0].shape[-2]
    lo = y[0].reshape(lead + (n1, 1 << hb, 1 << ha))
    hi = y[1].reshape(lead + (n1, 1 << hb, 1 << ha))
    av = (
        jnp.broadcast_to(jnp.asarray(a[0])[:, None, :], lo.shape),
        jnp.broadcast_to(jnp.asarray(a[1])[:, None, :], hi.shape),
    )
    bv = (
        jnp.broadcast_to(jnp.asarray(b[0])[:, :, None], lo.shape),
        jnp.broadcast_to(jnp.asarray(b[1])[:, :, None], hi.shape),
    )
    out = gf.mul(gf.mul((lo, hi), av), bv)
    return (
        out[0].reshape(y[0].shape),
        out[1].reshape(y[1].shape),
    )


def _fft_last_axis(x: gf.Gf, k_log: int, inverse: bool,
                   first_stage: int = 0) -> gf.Gf:
    """Butterflies over the last axis (input already bit-reversed or
    seeded). The lane-axis Pallas hybrid that used to hang off this
    function measured SLOWER than XLA at the four-step's inner widths
    (96 ms vs 6.9 ms for a 2^22 transform, v5e 2026-08-20) because its
    mask+roll ran along LANES; the fused kernel now lives on the
    sublane-oriented path instead (_fft_rows -> pallas_kernels.col_fft)."""
    return _butterflies(x, stage_roots(k_log, inverse), first_stage=first_stage)


@lru_cache(maxsize=None)
def _twiddle_factors_rows(n_log: int, inverse: bool):
    """The factored four-step twiddles transposed for the row-oriented
    layout [k2, i1]: A_T[k2a, i1] = w^(i1*k2a), B_T[k2b, i1] =
    (w^(2^ha))^(i1*k2b). Same O(sqrt-ish) footprint as _twiddle_factors."""
    a, b, ha, hb = _twiddle_factors(n_log, inverse)
    at = (np.ascontiguousarray(a[0].T), np.ascontiguousarray(a[1].T))
    bt = (np.ascontiguousarray(b[0].T), np.ascontiguousarray(b[1].T))
    return at, bt, ha, hb


def _apply_twiddle_rows(y: gf.Gf, n_log: int, inverse: bool) -> gf.Gf:
    """y[..., k2, i1] *= w^(i1*k2) via the factored tables; rows split
    as k2 = k2b*2^ha + k2a, both factors broadcast along lanes."""
    at, bt, ha, hb = _twiddle_factors_rows(n_log, inverse)
    lead = y[0].shape[:-2]
    n1 = y[0].shape[-1]
    lo = y[0].reshape(lead + (1 << hb, 1 << ha, n1))
    hi = y[1].reshape(lead + (1 << hb, 1 << ha, n1))
    av = (
        jnp.broadcast_to(jnp.asarray(at[0])[None, :, :], lo.shape),
        jnp.broadcast_to(jnp.asarray(at[1])[None, :, :], hi.shape),
    )
    bv = (
        jnp.broadcast_to(jnp.asarray(bt[0])[:, None, :], lo.shape),
        jnp.broadcast_to(jnp.asarray(bt[1])[:, None, :], hi.shape),
    )
    out = gf.mul(gf.mul((lo, hi), av), bv)
    return out[0].reshape(y[0].shape), out[1].reshape(y[1].shape)


def _bitrev_rows(x: gf.Gf) -> gf.Gf:
    from .bitrev import bitrev_gf

    return bitrev_gf(x, axis=-2)


def _fft_rows(x: gf.Gf, k_log: int, inverse: bool,
              first_stage: int = 0) -> gf.Gf:
    """DFT along axis -2 (input bit-reversed along that axis).

    On TPU the first min(k_log, COL_FFT_MAX_LOG) stages run as ONE
    fused-VMEM Pallas pass: DIT stages s < b only ever pair rows within
    contiguous 2^b-row blocks and their twiddles depend only on
    row mod 2^s, so the [N, L] view reshapes to [N/2^b, 2^b, L] and the
    column kernel runs batched over the blocks. Any remaining
    cross-block stages run as XLA radix-2 row passes."""
    from . import pallas_kernels as pk

    b = min(k_log, pk.COL_FFT_MAX_LOG)
    if first_stage < b and pk.col_fft_enabled(b, x[0].shape):
        lead = x[0].shape[:-2]
        n, lanes = x[0].shape[-2:]
        blocks = n >> b
        xb = (
            x[0].reshape(lead + (blocks, 1 << b, lanes)),
            x[1].reshape(lead + (blocks, 1 << b, lanes)),
        )
        out = pk.col_fft(xb, b, inverse, first_stage)
        x = (
            out[0].reshape(lead + (n, lanes)),
            out[1].reshape(lead + (n, lanes)),
        )
        first_stage = b
    if first_stage >= k_log:
        return x
    return _butterflies_rows(x, stage_roots(k_log, inverse), first_stage)


def _fft_four_step(x: gf.Gf, n_log: int, inverse: bool,
                   seeded_rate_bits: int = 0) -> gf.Gf:
    """DFT over the last axis via the [N2, N1] matrix decomposition,
    row-oriented: with the flat index split i = i2*N1 + i1, the array IS
    the [N2, N1] matrix, the column transform (over i2) runs along the
    sublane axis with i1 as untouched vector lanes, and only ONE
    transpose sits between the two transforms (the output [k1, k2]
    flattens directly to k = k1*N2 + k2). Butterflies never reshape the
    minor axis, so every stage is a relayout-free full-lane pass.

    With seeded_rate_bits = r > 0 (forward only), the input is the
    UNPADDED coefficient array of length N >> r: its row-major reshape
    occupies the first N2>>r rows of the [N2, N1] view, so the column
    transform applies the zero_factor seeding (bit-reverse + replicate
    + skip the first r stages) instead of transforming explicit zero
    padding."""
    n1_log, n2_log = _split_logs(n_log)
    n1, n2 = 1 << n1_log, 1 << n2_log
    lo, hi = x
    lead = lo.shape[:-1]
    if seeded_rate_bits:
        assert not inverse
        m = n2 >> seeded_rate_bits
        assert lo.shape[-1] == m * n1
        mview = (lo.reshape(lead + (m, n1)), hi.reshape(lead + (m, n1)))
        z = _bitrev_rows(mview)  # m-point reversal along the row axis
        seed = (
            jnp.repeat(z[0], 1 << seeded_rate_bits, axis=-2),
            jnp.repeat(z[1], 1 << seeded_rate_bits, axis=-2),
        )
        y = _fft_rows(seed, n2_log, False, first_stage=seeded_rate_bits)
    else:
        mview = (lo.reshape(lead + (n2, n1)), hi.reshape(lead + (n2, n1)))
        y = _fft_rows(_bitrev_rows(mview), n2_log, inverse)
    y = _apply_twiddle_rows(y, n_log, inverse)  # [k2, i1]
    z2 = (jnp.swapaxes(y[0], -1, -2), jnp.swapaxes(y[1], -1, -2))  # [i1, k2]
    w = _fft_rows(_bitrev_rows(z2), n1_log, inverse)  # [k1, k2]
    return (
        w[0].reshape(lead + (n1 * n2,)),
        w[1].reshape(lead + (n1 * n2,)),
    )


def _scale_rank1(x: gf.Gf, shift: int) -> gf.Gf:
    """x[..., i] * shift^i without an O(N) constant: shift^i factors as
    (shift^N1)^(i2) * shift^(i1) over the row-major [N2, N1] view."""
    n = x[0].shape[-1]
    n_log = log2_strict(n)
    n1_log, n2_log = _split_logs(n_log)
    n1, n2 = 1 << n1_log, 1 << n2_log
    row = _split_np(gl.np_powers(shift, n1))
    col = _split_np(gl.np_powers(gl.gexp(shift, n1), n2))
    lead = x[0].shape[:-1]
    lo = x[0].reshape(lead + (n2, n1))
    hi = x[1].reshape(lead + (n2, n1))
    y = gf.mul(
        (lo, hi),
        (
            jnp.broadcast_to(jnp.asarray(row[0]), lo.shape),
            jnp.broadcast_to(jnp.asarray(row[1]), hi.shape),
        ),
    )
    y = gf.mul(
        y,
        (
            jnp.broadcast_to(jnp.asarray(col[0])[:, None], lo.shape),
            jnp.broadcast_to(jnp.asarray(col[1])[:, None], hi.shape),
        ),
    )
    return y[0].reshape(x[0].shape), y[1].reshape(x[1].shape)


def fft(coeffs: gf.Gf) -> gf.Gf:
    """Coefficients -> values on the 2^k subgroup, natural (power) order."""
    n_log = log2_strict(coeffs[0].shape[-1])
    if n_log >= _FOUR_STEP_LOG:
        return _fft_four_step(coeffs, n_log, False)
    return _butterflies(bit_reverse(coeffs), stage_roots(n_log, False))


def ifft(values: gf.Gf) -> gf.Gf:
    """Values on subgroup -> coefficients."""
    n = values[0].shape[-1]
    n_log = log2_strict(n)
    if n_log >= _FOUR_STEP_LOG:
        out = _fft_four_step(values, n_log, True)
    else:
        out = _butterflies(bit_reverse(values), stage_roots(n_log, True))
    n_inv = gl.ginv(n % gl.P)
    return gf.mul_const(out, n_inv)


@lru_cache(maxsize=None)
def _shift_powers(shift: int, n: int):
    return _split_np(gl.np_powers(shift, n))


def coset_fft(coeffs: gf.Gf, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gf.Gf:
    """Values of the polynomial on the coset shift*H."""
    n = coeffs[0].shape[-1]
    if log2_strict(n) >= _FOUR_STEP_LOG:
        return fft(_scale_rank1(coeffs, shift))
    sp = _shift_powers(shift, n)
    scaled = gf.mul(coeffs, (jnp.broadcast_to(sp[0], coeffs[0].shape), jnp.broadcast_to(sp[1], coeffs[1].shape)))
    return fft(scaled)


def coset_ifft(values: gf.Gf, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> gf.Gf:
    """Inverse of coset_fft."""
    coeffs = ifft(values)
    n = values[0].shape[-1]
    if log2_strict(n) >= _FOUR_STEP_LOG:
        return _scale_rank1(coeffs, gl.ginv(shift))
    sp = _shift_powers(gl.ginv(shift), n)
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
    lde_log = n_log + rate_bits
    if lde_log >= _FOUR_STEP_LOG:
        # four-step with the zero_factor seeding folded into the inner
        # column transform; coset scaling stays rank-1 (no O(N) constant).
        # Requires the nonzero prefix to cover whole rows of the
        # [N2, N1] view (n >= N1), true for any rate_bits <= n_log/2.
        n1_log, n2_log = _split_logs(lde_log)
        if n_log >= n1_log:
            scaled = _scale_rank1(coeffs, shift)
            return _fft_four_step(
                scaled, lde_log, False, seeded_rate_bits=rate_bits
            )
        return fft(lde(_scale_rank1(coeffs, shift), rate_bits))
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
