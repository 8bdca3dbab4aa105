"""Multi-chip NTT: the six-step (Bailey) factorization over a device mesh
(SURVEY §5.7-5.8; replaces the reference's single-node rayon FFT,
field/src/fft.rs, for domains that exceed one chip).

N = N1·N2 viewed as an [N1, N2] matrix with n = n1·N2 + n2, rows sharded
across the mesh axis:

  1. local N2-point row FFTs                (no comms)
  2. twiddle by w_N^(n1·k2)                 (no comms; twiddles sharded)
  3. transpose                              (all_to_all over ICI)
  4. local N1-point row FFTs                (no comms)
  5. transpose back to natural order        (all_to_all)

The butterflies reuse the single-chip kernels (ops/ntt.py) on the local
row batch; only the transposes cross chips. Inverse = same shape with
inverse stage roots, inverse twiddles and a 1/N scale.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import goldilocks as gl
from ..ops import gf, ntt
from ..utils.bits import log2_strict


@lru_cache(maxsize=None)
def _twiddles(n1_log: int, n2_log: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """w_N^(±n1·k2) as an [N1, N2] u32-limb pair (host precompute)."""
    n1, n2 = 1 << n1_log, 1 << n2_log
    w = gl.primitive_root_of_unity(n1_log + n2_log)
    if inverse:
        w = gl.ginv(w)
    rows = gl.np_powers(w, n1)  # w^n1
    out = np.empty((n1, n2), dtype=np.uint64)
    for i in range(n1):
        out[i] = gl.np_powers(int(rows[i]), n2)
    lo = (out & 0xFFFFFFFF).astype(np.uint32)
    hi = (out >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def _dist_transpose(y: gf.Gf, axis_name: str, num: int) -> gf.Gf:
    """[R/d, C] per device -> [C/d, R]: tiled all_to_all + local transpose."""

    def t(a):
        z = jax.lax.all_to_all(a, axis_name, split_axis=1, concat_axis=0, tiled=True)
        return z.T

    return t(y[0]), t(y[1])


def six_step_fft(
    x: gf.Gf,
    mesh: Mesh,
    axis_name: str = "x",
    inverse: bool = False,
) -> gf.Gf:
    """Distributed NTT of a length-N limb pair; natural order in and out.

    Derivation with n = n1 + N1·n2, k = k1·N2 + k2:
      X[k1·N2+k2] = Σ_{n1} g1^{n1·k1} · w_N^{n1·k2} · Σ_{n2} x[n1+N1·n2] g2^{n2·k2}
    so: load x as [N2, N1] (rows n2), transpose to rows n1, row-FFT over
    n2, twiddle w_N^{n1·k2}, transpose, row-FFT over n1, transpose back.
    Three all_to_alls over the mesh axis; everything else is local.
    (A production pipeline fuses the first/last transpose into the
    producing/consuming layout.)"""
    n = x[0].shape[0]
    n_log = log2_strict(n)
    n1_log = n_log // 2
    n2_log = n_log - n1_log
    n1, n2 = 1 << n1_log, 1 << n2_log
    d = mesh.shape[axis_name]
    assert n1 % d == 0 and n2 % d == 0, "mesh size must divide both factors"

    tw = _twiddles(n1_log, n2_log, inverse)  # [N1, N2]: w_N^(±n1·k2)
    roots2 = ntt.stage_roots(n2_log, inverse)
    roots1 = ntt.stage_roots(n1_log, inverse)
    n_inv = gl.ginv(n % gl.P)

    def local(xlo, xhi, twlo, twhi):
        y = (xlo, xhi)  # [N2/d, N1] rows n2
        y = _dist_transpose(y, axis_name, d)  # [N1/d, N2] rows n1
        y = ntt._butterflies(ntt.bit_reverse(y), roots2)  # FFT over n2
        y = gf.mul(y, (twlo, twhi))  # w_N^(n1·k2)
        y = _dist_transpose(y, axis_name, d)  # [N2/d, N1] rows k2
        y = ntt._butterflies(ntt.bit_reverse(y), roots1)  # FFT over n1
        y = _dist_transpose(y, axis_name, d)  # [N1/d, N2] rows k1
        if inverse:
            y = gf.mul_const(y, n_inv)
        return y

    spec = P(axis_name, None)
    # jit the whole shard_map program: eager shard_map executes each inner
    # primitive as its own per-op SPMD compile, which is pathologically slow
    shard_fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec),
        )
    )

    sharding = NamedSharding(mesh, spec)
    xm = (
        jax.device_put(x[0].reshape(n2, n1), sharding),
        jax.device_put(x[1].reshape(n2, n1), sharding),
    )
    twm = (
        jax.device_put(jnp.asarray(tw[0]), sharding),
        jax.device_put(jnp.asarray(tw[1]), sharding),
    )
    out = shard_fn(xm[0], xm[1], twm[0], twm[1])
    return out[0].reshape(n), out[1].reshape(n)


def six_step_ifft(x: gf.Gf, mesh: Mesh, axis_name: str = "x") -> gf.Gf:
    return six_step_fft(x, mesh, axis_name, inverse=True)


# ---------------------------------------------------------------------------
# Batched six-step coset-IFFT, composable inside a jitted prover program.
# Used by the quotient pipeline (plonk/prover.py _quotient_chunks_fn): the
# quotient values arrive domain-sharded from the constraint kernel, and the
# coset-IFFT back to coefficients runs WITHOUT replicating the domain — the
# butterflies stay shard-local, only the three transposes cross chips
# (SURVEY §5.7: the reference's single-node coset_ifft, field/src/fft.rs,
# re-expressed so per-chip memory is N/d, not N).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def coset_ifft_tables(n_log: int, shift: int) -> Tuple[np.ndarray, ...]:
    """Host-precomputed tables for six_step_coset_ifft at size 2^n_log:
    (tw_lo, tw_hi) [N1, N2] inverse six-step twiddles, plus the separable
    coset/scale factors s1 [N1] (carrying 1/N and shift^-(k2? no — k1*N2))
    and s2 [N2]: coeff k = k1*N2 + k2 is scaled by shift^-k / N
    = (shift^-N2)^k1 / N * shift^-k2 — an outer product of two small
    vectors, so the full [N] scale never materializes."""
    n = 1 << n_log
    n1_log = n_log // 2
    n2_log = n_log - n1_log
    n1, n2 = 1 << n1_log, 1 << n2_log
    tw_lo, tw_hi = _twiddles(n1_log, n2_log, inverse=True)
    sinv = gl.ginv(shift % gl.P)
    n_inv = gl.ginv(n % gl.P)
    s1 = gl.np_mul(gl.np_powers(gl.gexp(sinv, n2), n1), np.uint64(n_inv))  # [N1]
    s2 = gl.np_powers(sinv, n2)  # [N2]
    return (tw_lo, tw_hi, *_split(s1), *_split(s2))


def _split(x_u64: np.ndarray):
    x = np.asarray(x_u64, dtype=np.uint64)
    return (
        (x & np.uint64(0xFFFF_FFFF)).astype(np.uint32),
        (x >> np.uint64(32)).astype(np.uint32),
    )


def six_step_coset_ifft_batch(q: gf.Gf, tables, mesh: Mesh, axis_name):
    """Coset-IFFT of a batch [M, N] (values on shift*H, natural order ->
    coefficients), domain-sharded: call INSIDE a jitted program. ``tables``
    are the device arrays from coset_ifft_tables (twiddles sharded like the
    data, scale vectors replicated). The 1/N and shift^-k scales are folded
    into the separable s1/s2 factors. axis_name: a mesh axis name or tuple
    of names (multi-host meshes flatten over both)."""
    tw_lo, tw_hi, s1_lo, s1_hi, s2_lo, s2_hi = tables
    m, n = q[0].shape
    n_log = log2_strict(n)
    n1_log = n_log // 2
    n2_log = n_log - n1_log
    n1, n2 = 1 << n1_log, 1 << n2_log
    roots2 = ntt.stage_roots(n2_log, True)
    roots1 = ntt.stage_roots(n1_log, True)
    ax = axis_name if isinstance(axis_name, tuple) else (axis_name,)
    d = 1
    for a in ax:
        d *= mesh.shape[a]
    assert n1 % d == 0 and n2 % d == 0, "mesh must divide both factors"

    def local(xlo, xhi, twlo, twhi, s1lo, s1hi, s2lo, s2hi):
        # x: [M, N2/d, N1] rows n2 (n = n1 + N1*n2); same dance as
        # six_step_fft with a leading batch axis and inverse roots
        def tr(a):
            z = jax.lax.all_to_all(a, ax, split_axis=2, concat_axis=1, tiled=True)
            return jnp.swapaxes(z, 1, 2)

        def transpose(y):
            return tr(y[0]), tr(y[1])

        y = (xlo, xhi)
        y = transpose(y)  # [M, N1/d, N2] rows n1
        y = ntt._butterflies(ntt.bit_reverse(y), roots2)  # FFT over n2
        y = gf.mul(y, (twlo[None], twhi[None]))  # w_N^(-n1*k2)
        y = transpose(y)  # [M, N2/d, N1] rows k2
        y = ntt._butterflies(ntt.bit_reverse(y), roots1)  # FFT over n1
        y = transpose(y)  # [M, N1/d, N2] rows k1
        # coeff k = k1*N2 + k2: scale by s1[k1] * s2[k2] (outer product)
        shard = jnp.int32(0)
        for a in ax:
            shard = shard * mesh.shape[a] + jax.lax.axis_index(a)
        k1 = shard * (n1 // d) + jnp.arange(n1 // d)
        s1l = jnp.take(s1lo, k1)
        s1h = jnp.take(s1hi, k1)
        scale = gf.mul(
            (s1l[:, None], s1h[:, None]), (s2lo[None, :], s2hi[None, :])
        )  # [N1/d, N2]
        y = gf.mul(y, (scale[0][None], scale[1][None]))
        return y

    spec = P(None, ax, None)
    tw_spec = P(ax, None)
    rep = P(None)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, tw_spec, tw_spec, rep, rep, rep, rep),
        out_specs=(spec, spec),
    )
    xm = (q[0].reshape(m, n2, n1), q[1].reshape(m, n2, n1))
    out = fn(xm[0], xm[1], tw_lo, tw_hi, s1_lo, s1_hi, s2_lo, s2_hi)
    return out[0].reshape(m, n), out[1].reshape(m, n)


# ---------------------------------------------------------------------------
# Sharded Merkle commitment: per-shard subtrees + cross-shard cap reduction
# (SURVEY §2.8 tree parallelism; merkle_tree.rs:112-144's subtree split
# becomes the mesh axis)
# ---------------------------------------------------------------------------


def sharded_merkle_cap(
    leaves: gf.Gf, mesh: Mesh, cap_height: int, axis_name: str = "x"
) -> gf.Gf:
    """[n, w] leaves row-sharded; per-device subtree hash, then — when the
    cap is smaller than the shard count — the top log2(d) - cap_height
    levels reduce over an all_gather of the shard roots (replicated on
    every device). Bit-identical to the single-device tree's cap for
    every (cap_height, d) combination (tests/test_parallel_ntt.py)."""
    from ..ops import poseidon as dp

    n = leaves[0].shape[0]
    d = mesh.shape[axis_name]
    cap_size = 1 << cap_height
    assert cap_size <= n, "cap taller than the tree"
    assert n % d == 0 and (n // d) & (n // d - 1) == 0, "shards must be pow-2"

    def compress(cur):
        left = (cur[0][0::2], cur[1][0::2])
        right = (cur[0][1::2], cur[1][1::2])
        return dp.two_to_one(left, right)

    if cap_size >= d:
        # every shard owns cap_size/d cap entries — no cross-shard hashing
        def local(llo, lhi):
            cur = dp.hash_leaf((llo, lhi))
            while cur[0].shape[0] > cap_size // d:
                cur = compress(cur)
            return cur

        out_specs = (P(axis_name, None), P(axis_name, None))
    else:
        # reduce each shard to one root, all_gather the d roots, and
        # hash the top log2(d) - cap_height levels replicated
        def local(llo, lhi):
            cur = dp.hash_leaf((llo, lhi))
            while cur[0].shape[0] > 1:
                cur = compress(cur)
            g = (
                jax.lax.all_gather(cur[0], axis_name, axis=0, tiled=True),
                jax.lax.all_gather(cur[1], axis_name, axis=0, tiled=True),
            )  # [d, 4] replicated
            while g[0].shape[0] > cap_size:
                g = compress(g)
            return g

        out_specs = (P(None, None), P(None, None))

    spec = P(axis_name, None)
    # check_vma=False: the replicated-ness of the post-all_gather cap
    # reduction is real but jax's static varying-axis checker cannot
    # infer it through the hash kernels (jax 0.9 rejects the out_specs
    # otherwise; values are bit-identical either way, see test).
    shard_fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(spec, spec), out_specs=out_specs,
            check_vma=False,
        )
    )
    sharding = NamedSharding(mesh, spec)
    lm = (
        jax.device_put(leaves[0], sharding),
        jax.device_put(leaves[1], sharding),
    )
    return shard_fn(lm[0], lm[1])
