"""Device-side bit-reversal permutation with O(sqrt N) index constants.

A direct ``jnp.take(x, reverse_index_bits_perm(n))`` embeds an n-entry
i32 gather index into the XLA executable — 128 MB of constant data at
n = 2^25, which is what made the commit-path executables (and their
persistent-cache entries) ~100 MB each and their compiles slow.

Bit reversal factorizes: writing i = i1*B + i2 with n = A*B,
``rev_n(i) = rev_B(i2)*A + rev_A(i1)``. So permuting an axis by rev_n
is two small gathers (A- and B-entry index constants) plus one
transpose of the [B, A] view — the transpose is XLA's tiled relayout,
and the executable stays O(sqrt N).

Reference capability: util/src/lib.rs reverse_index_bits_in_place (the
cache-friendly in-place variant of the same factorization).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.bits import log2_strict, reverse_index_bits_perm

# Below this size a single gather constant is cheap (<=32 KB) and avoids
# the transpose round-trip.
_DIRECT_LOG = 13


def bitrev_axis(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Permute ``axis`` of x by the bit-reversal permutation (an
    involution, so the same call converts natural->bitrev and back)."""
    n = x.shape[axis]
    k = log2_strict(n)
    if k <= _DIRECT_LOG:
        return jnp.take(x, reverse_index_bits_perm(n), axis=axis)
    ka = k // 2
    kb = k - ka
    a, b = 1 << ka, 1 << kb
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    y = x.reshape(lead + (b, a))
    # out.reshape(A, B)[i1, i2] = x[rev_B(i2)*A + rev_A(i1)]
    y = jnp.take(y, reverse_index_bits_perm(b), axis=-2)
    y = jnp.take(y, reverse_index_bits_perm(a), axis=-1)
    y = jnp.swapaxes(y, -1, -2).reshape(lead + (n,))
    return jnp.moveaxis(y, -1, axis)


def bitrev_gf(x, axis: int = -1):
    """Apply bitrev_axis to both limb planes of a (lo, hi) Gf pair."""
    return bitrev_axis(x[0], axis), bitrev_axis(x[1], axis)
