"""Poseidon2 width-12 hash (reference: plonky2/src/hash/poseidon2.rs,
core/src/hashing.rs:97-199 for the pad10 additive sponge, permutation
structure per plonky2/src/gates/poseidon2.rs:633-749).

Permutation: light-MDS preamble, 4 initial external rounds (+RC, x^7 on
all lanes, light MDS), 22 internal rounds (+RC on lane 0, x^7 on lane 0,
internal mix y_i = d_i·x_i + Σx), 4 terminal external rounds.

The constraint-side layers are expressed once over the abstract algebra A
so they serve the gate (host/device/circuit); `permute` is the plain host
path and `permute_batch` the vectorized device kernel.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..field.goldilocks import P, gadd, gmul
from .poseidon2_constants import (
    INITIAL_EXTERNAL_CONSTANTS,
    INTERNAL_CONSTANTS,
    INTERNAL_ROUNDS,
    MATRIX_DIAG,
    SPONGE_RATE,
    SPONGE_WIDTH,
    TERMINAL_EXTERNAL_CONSTANTS,
)

NUM_HASH_OUT_ELTS = 4


# ---------------------------------------------------------------------------
# Algebra-generic layers (single source for host eval + gate constraints)
# ---------------------------------------------------------------------------


def sbox7(A, x):
    x2 = A.mul(x, x)
    x4 = A.mul(x2, x2)
    x3 = A.mul(x, x2)
    return A.mul(x3, x4)


def apply_mat4(A, a, b, c, d):
    """[[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]] (poseidon2.rs:231-240)."""
    t = A.add(A.add(a, b), A.add(c, d))
    y0 = A.add(t, A.add(a, A.add(b, b)))
    y1 = A.add(t, A.add(b, A.add(c, c)))
    y2 = A.add(t, A.add(c, A.add(d, d)))
    y3 = A.add(t, A.add(a, A.add(a, d)))
    return y0, y1, y2, y3


def mds_light(A, state: List) -> List:
    ys = []
    for k in range(0, SPONGE_WIDTH, 4):
        ys.extend(apply_mat4(A, state[k], state[k + 1], state[k + 2], state[k + 3]))
    sums = [A.add(A.add(ys[i], ys[4 + i]), ys[8 + i]) for i in range(4)]
    return [A.add(ys[i], sums[i % 4]) for i in range(SPONGE_WIDTH)]


def internal_mix(A, state: List) -> List:
    s = state[0]
    for i in range(1, SPONGE_WIDTH):
        s = A.add(s, state[i])
    return [
        A.add(A.mul_const(state[i], MATRIX_DIAG[i] % P), s)
        for i in range(SPONGE_WIDTH)
    ]


def permute_generic(A, state: List) -> List:
    """Full permutation over any algebra (used by the host path below and
    the witness generator; the gate interleaves checkpoint wires)."""
    state = mds_light(A, state)
    for r in range(4):
        state = [
            A.add_const(x, INITIAL_EXTERNAL_CONSTANTS[r][i] % P)
            for i, x in enumerate(state)
        ]
        state = [sbox7(A, x) for x in state]
        state = mds_light(A, state)
    for r in range(INTERNAL_ROUNDS):
        state = list(state)
        state[0] = sbox7(A, A.add_const(state[0], INTERNAL_CONSTANTS[r] % P))
        state = internal_mix(A, state)
    for r in range(4):
        state = [
            A.add_const(x, TERMINAL_EXTERNAL_CONSTANTS[r][i] % P)
            for i, x in enumerate(state)
        ]
        state = [sbox7(A, x) for x in state]
        state = mds_light(A, state)
    return state


class _HostAlgebra:
    def add(self, a, b):
        return gadd(a, b)

    def mul(self, a, b):
        return gmul(a, b)

    def add_const(self, a, c):
        return gadd(a, c)

    def mul_const(self, a, c):
        return gmul(a, c)


_HOST = _HostAlgebra()


def permute(state: Sequence[int]) -> List[int]:
    return permute_generic(_HOST, [x % P for x in state])


# ---------------------------------------------------------------------------
# pad10 additive sponge (hashing.rs:97-199)
# ---------------------------------------------------------------------------


def _pad10(inputs: Sequence[int]) -> List[int]:
    padded_len = ((len(inputs) + 1 + SPONGE_RATE - 1) // SPONGE_RATE) * SPONGE_RATE
    msg = [x % P for x in inputs] + [1] + [0] * (padded_len - len(inputs) - 1)
    return msg


def _absorb_squeeze(state: List[int], msg: List[int]) -> Tuple[int, int, int, int]:
    for off in range(0, len(msg), SPONGE_RATE):
        for i, x in enumerate(msg[off : off + SPONGE_RATE]):
            state[i] = gadd(state[i], x)
        state = permute(state)
    return tuple(state[:NUM_HASH_OUT_ELTS])


def hash_no_pad(inputs: Sequence[int]) -> Tuple[int, int, int, int]:
    """pad10 + additive absorption from the zero state, squeeze without a
    trailing permute (hash_n_to_hash_no_pad_p2, hashing.rs:171-180)."""
    return _absorb_squeeze([0] * SPONGE_WIDTH, _pad10(inputs))


def hash_leaf(inputs: Sequence[int]) -> Tuple[int, int, int, int]:
    """Domain separator 1 in the capacity region (hash_leaf_p2,
    hashing.rs:182-199)."""
    state = [0] * SPONGE_WIDTH
    state[SPONGE_RATE] = 1
    return _absorb_squeeze(state, _pad10(inputs))


def two_to_one(left: Sequence[int], right: Sequence[int]) -> Tuple[int, int, int, int]:
    return hash_no_pad(list(left) + list(right))


# ---------------------------------------------------------------------------
# Batched device permutation: [B, 12] lanes (mirrors hash/poseidon.py's
# device kernel; light MDS is adds only, internal mix one const multiply)
# ---------------------------------------------------------------------------


def _permute_batch_impl(lanes):
    """[B, 12] batched permutation. Rounds run under lax.fori_loop with the
    round-constant tables as device arrays, keeping the compiled graph
    small; layers are vectorized across lanes (VPU-friendly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops import gf

    def sbox_v(s):
        s2 = gf.sqr(s)
        s4 = gf.sqr(s2)
        s3 = gf.mul(s, s2)
        return gf.mul(s3, s4)

    def mds_light_v(s):
        # [B,12] -> blocks [B,3,4]
        blk = (s[0].reshape(-1, 3, 4), s[1].reshape(-1, 3, 4))
        a = (blk[0][:, :, 0], blk[1][:, :, 0])
        b = (blk[0][:, :, 1], blk[1][:, :, 1])
        c = (blk[0][:, :, 2], blk[1][:, :, 2])
        d = (blk[0][:, :, 3], blk[1][:, :, 3])
        t = gf.add(gf.add(a, b), gf.add(c, d))
        y0 = gf.add(t, gf.add(a, gf.add(b, b)))
        y1 = gf.add(t, gf.add(b, gf.add(c, c)))
        y2 = gf.add(t, gf.add(c, gf.add(d, d)))
        y3 = gf.add(t, gf.add(a, gf.add(a, d)))
        y = (
            jnp.stack([y0[0], y1[0], y2[0], y3[0]], axis=2),
            jnp.stack([y0[1], y1[1], y2[1], y3[1]], axis=2),
        )  # [B,3,4]
        sums = gf.sum_mod_p(y, axis=1)  # [B,4]
        out = gf.add(y, (sums[0][:, None, :], sums[1][:, None, :]))
        return out[0].reshape(-1, SPONGE_WIDTH), out[1].reshape(-1, SPONGE_WIDTH)

    diag = gf.from_u64(np.array([d % P for d in MATRIX_DIAG], dtype=np.uint64))
    rc_init = gf.from_u64(
        np.array(INITIAL_EXTERNAL_CONSTANTS, dtype=np.uint64)
    )  # [4,12]
    rc_term = gf.from_u64(np.array(TERMINAL_EXTERNAL_CONSTANTS, dtype=np.uint64))
    rc_int = gf.from_u64(np.array(INTERNAL_CONSTANTS, dtype=np.uint64))  # [22]

    def ext_round(r, s, rc):
        rcr = (rc[0][r][None, :], rc[1][r][None, :])
        s = gf.add(s, (jnp.broadcast_to(rcr[0], s[0].shape), jnp.broadcast_to(rcr[1], s[1].shape)))
        s = sbox_v(s)
        return mds_light_v(s)

    def int_round(r, s):
        rc0 = (rc_int[0][r], rc_int[1][r])
        lane0 = (s[0][:, 0], s[1][:, 0])
        lane0 = gf.add(lane0, (jnp.broadcast_to(rc0[0], lane0[0].shape), jnp.broadcast_to(rc0[1], lane0[1].shape)))
        lane0 = sbox_v(lane0)
        s = (s[0].at[:, 0].set(lane0[0]), s[1].at[:, 0].set(lane0[1]))
        total = gf.sum_mod_p(s, axis=1)  # [B]
        prod = gf.mul(s, (jnp.broadcast_to(diag[0][None, :], s[0].shape), jnp.broadcast_to(diag[1][None, :], s[1].shape)))
        return gf.add(prod, (total[0][:, None], total[1][:, None]))

    state = mds_light_v(lanes)
    state = jax.lax.fori_loop(0, 4, lambda r, s: ext_round(r, s, rc_init), state)
    state = jax.lax.fori_loop(0, INTERNAL_ROUNDS, int_round, state)
    state = jax.lax.fori_loop(0, 4, lambda r, s: ext_round(r, s, rc_term), state)
    return state


_permute_batch_jit = None


def permute_batch(state):
    """Vectorized device permutation; jax imported lazily so the
    standalone (no-jax) verifier can import the Poseidon2 host hasher."""
    global _permute_batch_jit
    if _permute_batch_jit is None:
        import jax

        _permute_batch_jit = jax.jit(_permute_batch_impl)
    return _permute_batch_jit(state)
