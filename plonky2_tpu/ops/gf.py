"""Device-side Goldilocks field arithmetic on u32 limb planes.

A field element batch is a pair ``(lo, hi)`` of equally-shaped
``jnp.uint32`` arrays (the low/high 32-bit limbs). This layout is chosen
for TPU: every op below is elementwise VPU work over (8,128)-tileable
planes, and the same code path runs under Pallas. All values are kept
canonical (< p).

The algorithms mirror the reference's two-step reduction
(reference: field/src/goldilocks_field.rs:249-310,340-438) but are
re-derived for 32-bit lanes: 32x32->64 partial products via 16-bit
splits, explicit carry/borrow chains, and a final conditional subtract
of p. Bit-exactness against the host numpy implementation
(plonky2_tpu.field.goldilocks) is enforced by tests/test_gf_device.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field.goldilocks import P

U32 = jnp.uint32
# numpy scalars (not jnp): they stay literals inside Pallas kernels
# instead of becoming captured constants, and behave identically under XLA
_M16 = np.uint32(0xFFFF)
_M32 = np.uint32(0xFFFF_FFFF)
_P_LO = np.uint32(1)  # p = (hi=0xFFFFFFFF, lo=0x00000001)
_P_HI = np.uint32(0xFFFF_FFFF)

Gf = tuple  # (lo: u32 array, hi: u32 array)


# ---------------------------------------------------------------------------
# Conversions (host <-> device layout)
# ---------------------------------------------------------------------------


def from_u64(x) -> Gf:
    """numpy/jnp u64 (or python ints) -> (lo, hi) u32 device pair."""
    x = np.asarray(x, dtype=np.uint64)
    lo = jnp.asarray((x & np.uint64(0xFFFF_FFFF)).astype(np.uint32))
    hi = jnp.asarray((x >> np.uint64(32)).astype(np.uint32))
    return lo, hi


def to_u64(a: Gf) -> np.ndarray:
    lo, hi = a
    lo = np.asarray(jax.device_get(lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape) -> Gf:
    return jnp.zeros(shape, U32), jnp.zeros(shape, U32)


def ones(shape) -> Gf:
    return jnp.ones(shape, U32), jnp.zeros(shape, U32)


def full(shape, value: int) -> Gf:
    value %= P
    return (
        jnp.full(shape, value & 0xFFFF_FFFF, U32),
        jnp.full(shape, value >> 32, U32),
    )


# ---------------------------------------------------------------------------
# Carry/borrow primitives
# ---------------------------------------------------------------------------


def _addc(a, b):
    s = a + b
    return s, (s < a).astype(U32)


def _subb(a, b):
    d = a - b
    return d, (a < b).astype(U32)


def _mul32(a, b):
    """32x32 -> 64 as (lo32, hi32), via 16-bit partial products."""
    al = a & _M16
    ah = a >> np.uint32(16)
    bl = b & _M16
    bh = b >> np.uint32(16)
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    t = (ll >> np.uint32(16)) + (lh & _M16) + (hl & _M16)  # < 2^18, no overflow
    lo = (ll & _M16) | ((t & _M16) << np.uint32(16))
    hi = hh + (lh >> np.uint32(16)) + (hl >> np.uint32(16)) + (t >> np.uint32(16))
    return lo, hi


# ---------------------------------------------------------------------------
# Field ops
# ---------------------------------------------------------------------------


def canonicalize(a: Gf) -> Gf:
    lo, hi = a
    ge = ((hi == _P_HI) & (lo >= _P_LO)).astype(U32)
    return lo - ge, hi - ge * _P_HI


def add(a: Gf, b: Gf) -> Gf:
    (alo, ahi), (blo, bhi) = a, b
    lo, c0 = _addc(alo, blo)
    hi1, c1 = _addc(ahi, bhi)
    hi2, c2 = _addc(hi1, c0)
    carry = c1 | c2
    # s += EPSILON * carry; EPSILON = (lo=0xFFFFFFFF, hi=0)
    lo2, c3 = _addc(lo, carry * _M32)
    hi3 = hi2 + c3
    return canonicalize((lo2, hi3))


def sub(a: Gf, b: Gf) -> Gf:
    (alo, ahi), (blo, bhi) = a, b
    lo, b0 = _subb(alo, blo)
    hi1, b1 = _subb(ahi, bhi)
    hi2, b2 = _subb(hi1, b0)
    borrow = b1 | b2
    lo2, b3 = _subb(lo, borrow * _M32)
    hi3 = hi2 - b3
    return canonicalize((lo2, hi3))


def neg(a: Gf) -> Gf:
    lo, hi = a
    is_zero = (lo == 0) & (hi == 0)
    nlo, b0 = _subb(_P_LO, lo)
    nhi = _P_HI - hi - b0
    return jnp.where(is_zero, lo, nlo), jnp.where(is_zero, hi, nhi)


def _mul_wide(a: Gf, b: Gf):
    """64x64 -> 128 as four u32 limbs (w0..w3, little-endian)."""
    (a0, a1), (b0, b1) = a, b
    p00l, p00h = _mul32(a0, b0)
    p01l, p01h = _mul32(a0, b1)
    p10l, p10h = _mul32(a1, b0)
    p11l, p11h = _mul32(a1, b1)
    w0 = p00l
    w1a, c1 = _addc(p00h, p01l)
    w1, c2 = _addc(w1a, p10l)
    cw1 = c1 + c2
    w2a, c3 = _addc(p01h, p10h)
    w2b, c4 = _addc(w2a, p11l)
    w2, c5 = _addc(w2b, cw1)
    w3 = p11h + c3 + c4 + c5
    return w0, w1, w2, w3


def reduce128(w0, w1, w2, w3) -> Gf:
    """Goldilocks reduction of a 128-bit limb vector
    (mirrors goldilocks_field.rs:380-400 reduce128, re-derived for u32 lanes)."""
    # t0 = lo64 - x_hi_hi (wrapping u64)
    t0l, b0 = _subb(w0, w3)
    t0h1, b1 = _subb(w1, b0)
    borrow = b1  # w3 < 2^32 so only this path borrows
    t0l2, b2 = _subb(t0l, borrow * _M32)
    t0h = t0h1 - b2
    # t1 = x_hi_lo * EPSILON = (w2 << 32) - w2
    t1l = np.uint32(0) - w2
    t1h = w2 - (w2 != 0).astype(U32)
    # res = t0 + t1, folding the carry back in as +EPSILON
    rl, c0 = _addc(t0l2, t1l)
    rh1, c1 = _addc(t0h, t1h)
    rh2, c2 = _addc(rh1, c0)
    carry = c1 | c2
    rl2, c3 = _addc(rl, carry * _M32)
    rh3 = rh2 + c3
    return canonicalize((rl2, rh3))


def mul(a: Gf, b: Gf) -> Gf:
    return reduce128(*_mul_wide(a, b))


def sqr(a: Gf) -> Gf:
    return mul(a, a)


def mul_const(a: Gf, c: int) -> Gf:
    """Multiply by a compile-time constant (broadcast)."""
    c %= P
    shape = ()
    b = (jnp.full(shape, c & 0xFFFF_FFFF, U32), jnp.full(shape, c >> 32, U32))
    return mul(a, b)


def exp_const(a: Gf, e: int) -> Gf:
    """a^e for a static exponent e >= 0.

    Small exponents unroll inline (fused by XLA); large exponents use a
    ``fori_loop`` over the exponent bits to keep the traced graph small
    (compile time matters more than the ~2x runtime of the select).
    """
    if e.bit_length() <= 8:
        lo, hi = a
        result = ones(lo.shape)
        base = a
        while e:
            if e & 1:
                result = mul(result, base)
            base = mul(base, base)
            e >>= 1
        return result

    nbits = e.bit_length()
    bits = jnp.array([(e >> i) & 1 for i in range(nbits)], dtype=U32)

    def body(i, carry):
        (rlo, rhi), (blo, bhi) = carry
        mlo, mhi = mul((rlo, rhi), (blo, bhi))
        bit = bits[i]
        rlo = jnp.where(bit == 1, mlo, rlo)
        rhi = jnp.where(bit == 1, mhi, rhi)
        return (rlo, rhi), mul((blo, bhi), (blo, bhi))

    result, _ = jax.lax.fori_loop(0, nbits, body, (ones(a[0].shape), a))
    return result


def inv(a: Gf) -> Gf:
    """Elementwise Fermat inverse a^(p-2); 0 maps to 0."""
    return exp_const(a, P - 2)


def batch_inverse(a: Gf) -> Gf:
    """Montgomery-trick batch inversion over the flattened array.

    prefix/suffix products via ``jax.lax.associative_scan`` (log-depth,
    the TPU-native replacement for the reference's sequential pass,
    field/src/types.rs batch_multiplicative_inverse). All entries must be
    nonzero.
    """
    lo, hi = a
    shape = lo.shape
    flo, fhi = lo.reshape(-1), hi.reshape(-1)
    n = flo.shape[0]
    if n == 0:
        return a

    def combine(x, y):
        return mul(x, y)

    pre_lo, pre_hi = jax.lax.associative_scan(combine, (flo, fhi))
    suf_lo, suf_hi = jax.lax.associative_scan(combine, (flo, fhi), reverse=True)
    total_inv = inv((pre_lo[-1], pre_hi[-1]))
    # inv[i] = prefix[i-1] * suffix[i+1] * total_inv
    t_lo = jnp.broadcast_to(total_inv[0], (n,))
    t_hi = jnp.broadcast_to(total_inv[1], (n,))
    out = (t_lo, t_hi)
    left = (
        jnp.concatenate([jnp.ones(1, U32), pre_lo[:-1]]),
        jnp.concatenate([jnp.zeros(1, U32), pre_hi[:-1]]),
    )
    right = (
        jnp.concatenate([suf_lo[1:], jnp.ones(1, U32)]),
        jnp.concatenate([suf_hi[1:], jnp.zeros(1, U32)]),
    )
    out = mul(out, left)
    out = mul(out, right)
    return out[0].reshape(shape), out[1].reshape(shape)


# ---------------------------------------------------------------------------
# Quadratic extension (D=2, x^2 = 7) — trailing-dim-2 layout
# ---------------------------------------------------------------------------
# An extension batch is a Gf pair whose arrays have a trailing dimension 2:
# [..., 0] = c0, [..., 1] = c1. (reference: field/src/extension/quadratic.rs)

_W2 = 7


def ext2_mul(a: Gf, b: Gf) -> Gf:
    a0 = (a[0][..., 0], a[1][..., 0])
    a1 = (a[0][..., 1], a[1][..., 1])
    b0 = (b[0][..., 0], b[1][..., 0])
    b1 = (b[0][..., 1], b[1][..., 1])
    c0 = add(mul(a0, b0), mul_const(mul(a1, b1), _W2))
    c1 = add(mul(a0, b1), mul(a1, b0))
    return (
        jnp.stack([c0[0], c1[0]], axis=-1),
        jnp.stack([c0[1], c1[1]], axis=-1),
    )


def ext2_add(a: Gf, b: Gf) -> Gf:
    return add(a, b)  # componentwise


def ext2_sub(a: Gf, b: Gf) -> Gf:
    return sub(a, b)


def ext2_scalar_mul(a: Gf, s: Gf) -> Gf:
    """Multiply extension batch by base-field batch (broadcast over last dim)."""
    slo = s[0][..., None]
    shi = s[1][..., None]
    return mul(a, (jnp.broadcast_to(slo, a[0].shape), jnp.broadcast_to(shi, a[1].shape)))


def ext2_const(c) -> Gf:
    """Host extension tuple -> (lo, hi) pair of shape-(2,) constants."""
    x = np.asarray(c, dtype=np.uint64)
    return (
        jnp.asarray((x & np.uint64(0xFFFF_FFFF)).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )


_M16_ = np.uint32(0xFFFF)


def sum_mod_p(a: Gf, axis: int = 0) -> Gf:
    """Sum canonical field elements along an axis, exactly mod p.

    Uses 16-bit half-plane partial sums so a plain jnp.sum cannot
    overflow (requires the summed axis length < 2^16), then a single
    carry-recombination + Goldilocks reduction. This is the TPU
    replacement for the reference's sequential accumulate+reduce160
    pattern (core/src/poseidon.rs:37-52)."""
    lo, hi = a
    n = lo.shape[axis]
    if n >= (1 << 16):
        # hierarchical: split the axis into < 2^16 chunks, reduce each
        # exactly, then reduce the (canonical) chunk sums — unbounded
        # lengths in log_{2^15}(n) levels
        chunk = 1 << 15
        pad = (-n) % chunk
        lo = jnp.moveaxis(lo, axis, 0)
        hi = jnp.moveaxis(hi, axis, 0)
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (lo.ndim - 1)
            lo = jnp.pad(lo, widths)
            hi = jnp.pad(hi, widths)
        rest = lo.shape[1:]
        lo = lo.reshape((-1, chunk) + rest)
        hi = hi.reshape((-1, chunk) + rest)
        partial = sum_mod_p((lo, hi), axis=1)  # [n/chunk, ...]
        return sum_mod_p(partial, axis=0)
    s0l = jnp.sum(lo & _M16_, axis=axis, dtype=U32)
    s0h = jnp.sum(lo >> np.uint32(16), axis=axis, dtype=U32)
    s1l = jnp.sum(hi & _M16_, axis=axis, dtype=U32)
    s1h = jnp.sum(hi >> np.uint32(16), axis=axis, dtype=U32)
    w0, c = _addc(s0l, (s0h & _M16_) << np.uint32(16))
    carry0 = c + (s0h >> np.uint32(16))
    w1a, c1 = _addc(s1l, (s1h & _M16_) << np.uint32(16))
    w1, c2 = _addc(w1a, carry0)
    w2 = c1 + c2 + (s1h >> np.uint32(16))
    return reduce128(w0, w1, w2, jnp.zeros_like(w2))


def weighted_sum(polys: Gf, weights: Gf) -> Gf:
    """sum_i weights[i] * polys[i] over the leading axis, exactly mod p.

    polys: [M, ...]; weights: [M]. The per-row scaling is one fused
    vector multiply; the reduction uses sum_mod_p."""
    wlo = weights[0].reshape((-1,) + (1,) * (polys[0].ndim - 1))
    whi = weights[1].reshape((-1,) + (1,) * (polys[1].ndim - 1))
    prod = mul(polys, (jnp.broadcast_to(wlo, polys[0].shape), jnp.broadcast_to(whi, polys[1].shape)))
    return sum_mod_p(prod, axis=0)


def ext2_affine_suffix_scan(coeffs: Gf, z) -> Gf:
    """Synthetic division helper: given extension coefficients [N, 2] and an
    extension point z, return the Horner prefix values over the reversed
    coefficients, i.e. s_k = z*s_{k-1} + c_{N-1-k} as [N, 2].

    Log-depth via associative_scan over affine maps (x -> z*x + c), the
    TPU replacement for the reference's sequential scan
    (field/src/polynomial/division.rs:75-88 divide_by_linear)."""
    return ext2_affine_suffix_scan_z(coeffs, ext2_const(z))


def ext2_affine_suffix_scan_z(coeffs: Gf, zc: Gf) -> Gf:
    """Same, with the point already as a device limb pair (jit-friendly)."""
    n = coeffs[0].shape[0]
    rlo = coeffs[0][::-1]
    rhi = coeffs[1][::-1]
    mlo = jnp.broadcast_to(zc[0], (n, 2))
    mhi = jnp.broadcast_to(zc[1], (n, 2))

    def combine(c1, c2):
        (m1l, m1h, a1l, a1h), (m2l, m2h, a2l, a2h) = c1, c2
        m = ext2_mul((m1l, m1h), (m2l, m2h))
        t = ext2_mul((a1l, a1h), (m2l, m2h))
        a = add(t, (a2l, a2h))
        return (m[0], m[1], a[0], a[1])

    _, _, slo, shi = jax.lax.associative_scan(
        combine, (mlo, mhi, rlo, rhi), axis=0
    )
    return slo, shi


def powers_scan(x: Gf, n: int) -> Gf:
    """[1, x, x^2, ..., x^{n-1}] as a log-depth associative scan.

    x: scalar Gf (shape ()). Replaces sequentially traced power chains
    (compile-time killer) with one scan (~log2 n fused muls)."""
    lo = jnp.concatenate([jnp.ones(1, U32), jnp.broadcast_to(x[0], (n - 1,))])
    hi = jnp.concatenate([jnp.zeros(1, U32), jnp.broadcast_to(x[1], (n - 1,))])
    return jax.lax.associative_scan(lambda a, b: mul(a, b), (lo, hi))


def ext2_powers_scan(z: Gf, n: int) -> Gf:
    """[1, z, z^2, ..., z^{n-1}] over the D=2 extension as a log-depth
    associative scan; z: shape-(2,) limb pair. Device replacement for the
    host ext_powers_np table (fri/oracle.py) so openings can be evaluated
    at a traced zeta with no host sync."""
    one = ext2_const((1, 0))
    lo = jnp.concatenate([one[0][None, :], jnp.broadcast_to(z[0], (n - 1, 2))], axis=0)
    hi = jnp.concatenate([one[1][None, :], jnp.broadcast_to(z[1], (n - 1, 2))], axis=0)
    return jax.lax.associative_scan(lambda a, b: ext2_mul(a, b), (lo, hi), axis=0)


def prod_mod_p(a: Gf, axis: int = 0) -> Gf:
    """Product along an axis via log-depth pairwise folding (exact)."""
    lo, hi = a
    n = lo.shape[axis]
    lo = jnp.moveaxis(lo, axis, 0)
    hi = jnp.moveaxis(hi, axis, 0)
    while n > 1:
        half = n // 2
        a2 = mul((lo[:half], hi[:half]), (lo[half : 2 * half], hi[half : 2 * half]))
        if n % 2:
            lo = jnp.concatenate([a2[0], lo[-1:]])
            hi = jnp.concatenate([a2[1], hi[-1:]])
            n = half + 1
        else:
            lo, hi = a2
            n = half
    return lo[0], hi[0]
