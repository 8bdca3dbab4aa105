"""Device-resident Merkle trees with caps (TPU redesign).

The reference builds 2^cap_height independent subtrees with a recursive
task-parallel fill into one flat digest buffer
(core/src/merkle_tree.rs:85-144). On TPU the natural layout is
*level-major*: ``levels[k]`` is a ``[n >> (k+1), 4]`` digest batch, built
bottom-up with one batched two-to-one compression per level. Subtree
parallelism falls out for free (every row of a level is independent);
under a mesh the leaf axis is sharded and the last ``log2(shards)``
levels ride an all-gather (see plonky2_tpu.parallel).

Proof extraction (merkle_tree_prove, core/src/merkle_tree.rs:187) becomes
a tiny gather per level at host-chosen indices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import log2_strict
from . import gf
from . import poseidon as dp


# Levels with at least this many digests are built as individual
# (Pallas-eligible, compute-dominant) compressions; smaller levels build
# in ONE lax.scan over a fixed-size buffer. The scan trades <=B0*steps
# wasted tiny-batch hashes (B0 < 2048 rows — microseconds) for a
# permutation body that traces and compiles ONCE instead of once per
# level: a 2^13-leaf tree program went from ~55 s to seconds of cold
# XLA compile over the TPU tunnel.
_SCAN_MAX_B = 2048


def _scan_pyramid(top: gf.Gf, num_steps: int):
    """num_steps halvings of a [B0, 4] digest batch as one lax.scan. The
    body always computes on the full fixed-size buffer; the active prefix
    halves each step (tail rows hold garbage) and each level is the
    prefix slice of that step's output."""
    lo, hi = top
    b0 = lo.shape[0]
    assert num_steps <= b0.bit_length() - 1

    def body(state, _):
        slo, shi = state
        dlo, dhi = dp.two_to_one((slo[0::2], shi[0::2]), (slo[1::2], shi[1::2]))
        # pad the halved result back to the fixed buffer size
        slo = jnp.concatenate([dlo, dlo], axis=0)
        shi = jnp.concatenate([dhi, dhi], axis=0)
        return (slo, shi), (dlo, dhi)

    _, (ys_lo, ys_hi) = jax.lax.scan(body, (lo, hi), None, length=num_steps)
    return [
        (ys_lo[k, : b0 >> (k + 1)], ys_hi[k, : b0 >> (k + 1)])
        for k in range(num_steps)
    ]


def _tree_levels(leaves: gf.Gf, num_levels: int):
    """Traced body: leaf digests + level-by-level compressions (big
    levels unrolled, small levels via _scan_pyramid)."""
    digests = dp.hash_leaf(leaves)  # [n, 4]
    levels = [digests]
    remaining = num_levels
    while remaining and levels[-1][0].shape[0] >= _SCAN_MAX_B:
        cur = levels[-1]
        left = (cur[0][0::2], cur[1][0::2])
        right = (cur[0][1::2], cur[1][1::2])
        levels.append(dp.two_to_one(left, right))
        remaining -= 1
    if remaining:
        levels += _scan_pyramid(levels[-1], remaining)
    return tuple(levels)


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(1,))
def _tree_levels_jit(leaves: gf.Gf, num_levels: int):
    return _tree_levels(leaves, num_levels)


def build_merkle_tree(leaves: gf.Gf, cap_height: int, hasher=None):
    """Hash a [n, w] leaf batch into a tree. Default (Poseidon) is the
    device-resident path — the whole level pyramid is ONE dispatch
    (dispatch latency dominates over a remote TPU link). Non-default
    hashers (Keccak, Poseidon2) build on host."""
    n = leaves[0].shape[0]
    height = log2_strict(n)
    assert cap_height <= height
    if hasher is None or (hasher.name == "poseidon" and hasher.device_merkle):
        levels = list(_tree_levels_jit(leaves, height - cap_height))
        return DeviceMerkleTree(leaves=leaves, levels=levels, cap_height=cap_height)
    return HostMerkleTree.build(leaves, cap_height, hasher)


@jax.jit
def _gather_row(lo, hi, idx):
    return lo[idx], hi[idx]


@jax.jit
def _gather_leaves_batch(lo, hi, idx):
    return lo[idx], hi[idx]


@jax.jit
def _gather_paths_batch(levels_lo, levels_hi, idx):
    """All sibling digests for a batch of leaf indices, one fused gather:
    levels_*: tuple of [m_k, 4] arrays; idx: [Q]. Returns ([Q, L, 4] lo, hi).
    One device->host transfer instead of Q*L tiny ones — the difference
    between 91s and ~1s of FRI query extraction over a TPU tunnel."""
    rows_lo, rows_hi = [], []
    cur = idx
    for lo, hi in zip(levels_lo, levels_hi):
        sib = cur ^ 1
        rows_lo.append(lo[sib])
        rows_hi.append(hi[sib])
        cur = cur >> 1
    return jnp.stack(rows_lo, axis=1), jnp.stack(rows_hi, axis=1)


@dataclass
class DeviceMerkleTree:
    """levels[0] = leaf digests [n, 4]; levels[k+1] = compress(levels[k]);
    levels[-1] = cap."""

    leaves: gf.Gf
    levels: List[gf.Gf]
    cap_height: int

    @property
    def num_leaves(self) -> int:
        return self.levels[0][0].shape[0]

    @property
    def cap(self) -> gf.Gf:
        return self.levels[-1]

    def cap_u64(self) -> np.ndarray:
        return np.asarray(gf.to_u64(self.cap)).reshape(-1, 4)

    def leaf_u64(self, index: int) -> np.ndarray:
        lo, hi = _gather_row(self.leaves[0], self.leaves[1], index)
        return gf.to_u64((lo, hi))

    def prove(self, leaf_index: int) -> List[Tuple[int, int, int, int]]:
        """Sibling digests from leaf level up to (excluding) the cap."""
        sibs = self.prove_batch(np.array([leaf_index]))[0]
        return [tuple(int(x) for x in row) for row in sibs]

    def leaf_u64_batch(self, leaf_indices: np.ndarray) -> np.ndarray:
        """[Q, w] leaf rows in one transfer."""
        idx = jnp.asarray(np.asarray(leaf_indices, dtype=np.int32))
        lo, hi = _gather_leaves_batch(self.leaves[0], self.leaves[1], idx)
        return np.asarray(gf.to_u64((lo, hi)))

    def prove_batch(self, leaf_indices: np.ndarray) -> np.ndarray:
        """[Q, num_path_levels, 4] sibling digests in one transfer."""
        lo, hi = self.sibling_paths_device(leaf_indices)
        return np.asarray(gf.to_u64((lo, hi)))

    def leaf_rows_device(self, leaf_indices: np.ndarray) -> gf.Gf:
        idx = jnp.asarray(np.asarray(leaf_indices, dtype=np.int32))
        return _gather_leaves_batch(self.leaves[0], self.leaves[1], idx)

    def sibling_paths_device(self, leaf_indices: np.ndarray) -> gf.Gf:
        if len(self.levels) == 1:
            z = jnp.zeros((len(leaf_indices), 0, 4), dtype=jnp.uint32)
            return z, z
        idx = jnp.asarray(np.asarray(leaf_indices, dtype=np.int32))
        return _gather_paths_batch(
            tuple(l[0] for l in self.levels[:-1]),
            tuple(l[1] for l in self.levels[:-1]),
            idx,
        )


@dataclass
class HostMerkleTree:
    """Same interface as DeviceMerkleTree, built on host with an arbitrary
    HasherSpec (Keccak / Poseidon2 oracles). Digests are 4-felts rows."""

    leaves: gf.Gf
    levels: List[np.ndarray]  # each [m, 4] u64
    cap_height: int
    _leaves_u64: np.ndarray = None

    @staticmethod
    def build(leaves: gf.Gf, cap_height: int, hasher) -> "HostMerkleTree":
        rows = np.asarray(gf.to_u64(leaves))  # [n, w]
        n = rows.shape[0]
        height = log2_strict(n)
        digests = np.array(
            [hasher.hash_leaf([int(v) for v in row]) for row in rows],
            dtype=np.uint64,
        ).reshape(n, 4)
        levels = [digests]
        for _ in range(height - cap_height):
            cur = levels[-1]
            nxt = np.array(
                [
                    hasher.two_to_one(
                        tuple(int(x) for x in cur[2 * i]),
                        tuple(int(x) for x in cur[2 * i + 1]),
                    )
                    for i in range(cur.shape[0] // 2)
                ],
                dtype=np.uint64,
            ).reshape(-1, 4)
            levels.append(nxt)
        return HostMerkleTree(
            leaves=leaves, levels=levels, cap_height=cap_height, _leaves_u64=rows
        )

    @property
    def num_leaves(self) -> int:
        return self.levels[0].shape[0]

    def cap_u64(self) -> np.ndarray:
        return self.levels[-1]

    def leaf_u64(self, index: int) -> np.ndarray:
        return self._leaves_u64[index]

    def leaf_u64_batch(self, leaf_indices: np.ndarray) -> np.ndarray:
        return self._leaves_u64[np.asarray(leaf_indices, dtype=np.int64)]

    def prove(self, leaf_index: int) -> List[Tuple[int, int, int, int]]:
        sibs = self.prove_batch(np.array([leaf_index]))[0]
        return [tuple(int(x) for x in row) for row in sibs]

    def prove_batch(self, leaf_indices: np.ndarray) -> np.ndarray:
        if len(self.levels) == 1:
            return np.zeros((len(leaf_indices), 0, 4), dtype=np.uint64)
        out = []
        for idx in np.asarray(leaf_indices, dtype=np.int64):
            path = []
            cur = int(idx)
            for level in self.levels[:-1]:
                path.append(level[cur ^ 1])
                cur >>= 1
            out.append(path)
        return np.array(out, dtype=np.uint64)

    def leaf_rows_device(self, leaf_indices: np.ndarray) -> gf.Gf:
        rows = self.leaf_u64_batch(leaf_indices)
        return gf.from_u64(rows)

    def sibling_paths_device(self, leaf_indices: np.ndarray) -> gf.Gf:
        return gf.from_u64(self.prove_batch(leaf_indices))


# ---------------------------------------------------------------------------
# Batch Merkle tree: matrices of decreasing power-of-two heights in one tree
# (reference: plonky2/src/hash/batch_merkle_tree.rs:25-165). Level-major
# device build: compress the tallest matrix down to the next height, then
# re-hash [digest ‖ next-matrix row] as the new leaf layer.
# ---------------------------------------------------------------------------


def _compress(cur: gf.Gf) -> gf.Gf:
    return dp.two_to_one(
        (cur[0][0::2], cur[1][0::2]), (cur[0][1::2], cur[1][1::2])
    )


def _batch_tree_levels(matrices, cap_height: int):
    """Runs of join-free compressions use the same big-unrolled /
    small-scanned policy as _tree_levels; matrix joins interrupt a run
    (the digest row is concatenated with the next matrix and re-hashed,
    batch_merkle_tree.rs:25-60)."""
    heights = [log2_strict(m[0].shape[0]) for m in matrices]
    cur = dp.hash_leaf(matrices[0])  # [n0, 4]
    levels = [cur]
    mi = 1
    h = heights[0]
    while h > cap_height:
        # compress-only levels strictly above the next join (the level AT
        # a join height is handled below); with no joins left, all the
        # way to the cap
        if mi < len(matrices):
            plain = h - heights[mi] - 1
        else:
            plain = h - cap_height
        while plain and cur[0].shape[0] >= _SCAN_MAX_B:
            cur = _compress(cur)
            h -= 1
            plain -= 1
            levels.append(cur)
        if plain:
            segs = _scan_pyramid(cur, plain)
            levels += segs
            cur = segs[-1]
            h -= plain
        if mi < len(matrices):
            cur = _compress(cur)
            h -= 1
            joined = (
                jnp.concatenate([cur[0], matrices[mi][0]], axis=1),
                jnp.concatenate([cur[1], matrices[mi][1]], axis=1),
            )
            cur = dp.hash_leaf(joined)
            mi += 1
            levels.append(cur)
    assert mi == len(matrices), "arity schedule does not visit every matrix"
    return tuple(levels)


@_partial(jax.jit, static_argnums=(1,))
def _batch_tree_levels_jit(matrices, cap_height: int):
    return _batch_tree_levels(matrices, cap_height)


@dataclass
class BatchDeviceMerkleTree:
    """leaves: per-matrix [n_i, w_i] (tallest first); levels[k] is the
    digest row at height h0-k AFTER any matrix join at that height."""

    leaves: List[gf.Gf]
    leaf_heights: List[int]
    levels: List[gf.Gf]
    cap_height: int

    @staticmethod
    def build(matrices: List[gf.Gf], cap_height: int) -> "BatchDeviceMerkleTree":
        heights = [log2_strict(m[0].shape[0]) for m in matrices]
        assert all(heights[i] > heights[i + 1] for i in range(len(heights) - 1))
        assert cap_height <= heights[-1]
        levels = list(_batch_tree_levels_jit(tuple(matrices), cap_height))
        return BatchDeviceMerkleTree(
            leaves=list(matrices),
            leaf_heights=heights,
            levels=levels,
            cap_height=cap_height,
        )

    @property
    def cap(self) -> gf.Gf:
        return self.levels[-1]

    def cap_u64(self) -> np.ndarray:
        return np.asarray(gf.to_u64(self.cap)).reshape(-1, 4)

    def values_batch(self, leaf_indices: np.ndarray) -> List[np.ndarray]:
        """Per matrix: [Q, w_i] rows at index >> (h0 - h_i)."""
        h0 = self.leaf_heights[0]
        out = []
        for m, h in zip(self.leaves, self.leaf_heights):
            idx = jnp.asarray(
                np.asarray(leaf_indices, dtype=np.int64) >> (h0 - h), dtype=jnp.int32
            )
            lo, hi = _gather_leaves_batch(m[0], m[1], idx)
            out.append(np.asarray(gf.to_u64((lo, hi))))
        return out

    def prove_batch(self, leaf_indices: np.ndarray) -> np.ndarray:
        """[Q, h0-cap_height, 4] sibling digests."""
        if len(self.levels) == 1:
            return np.zeros((len(leaf_indices), 0, 4), dtype=np.uint64)
        idx = jnp.asarray(np.asarray(leaf_indices, dtype=np.int32))
        lo, hi = _gather_paths_batch(
            tuple(l[0] for l in self.levels[:-1]),
            tuple(l[1] for l in self.levels[:-1]),
            idx,
        )
        return np.asarray(gf.to_u64((lo, hi)))


def verify_batch_merkle_proof_to_cap(
    leaf_data: List[List[int]],
    leaf_heights: List[int],
    leaf_index: int,
    cap: np.ndarray,
    siblings,
    hasher=None,
) -> bool:
    """core/src/merkle_proofs.rs:59-97."""
    if hasher is None:
        from ..hash import poseidon as hp

        hasher = hp
    assert len(leaf_data) == len(leaf_heights)
    digest = hasher.hash_leaf(list(leaf_data[0]))
    height = leaf_heights[0]
    data_index = 1
    idx = leaf_index
    for sib in siblings:
        if idx & 1:
            digest = hasher.two_to_one(sib, digest)
        else:
            digest = hasher.two_to_one(digest, sib)
        idx >>= 1
        height -= 1
        if data_index < len(leaf_heights) and height == leaf_heights[data_index]:
            digest = hasher.hash_leaf(list(digest) + list(leaf_data[data_index]))
            data_index += 1
    assert data_index == len(leaf_data)
    return tuple(int(x) for x in cap[idx]) == digest


# ---------------------------------------------------------------------------
# Host-side verification (reference: core/src/merkle_proofs.rs)
# ---------------------------------------------------------------------------


def verify_merkle_proof(
    leaf_data: Sequence[int],
    leaf_index: int,
    cap: np.ndarray,
    siblings: Sequence[Tuple[int, int, int, int]],
    hasher=None,
) -> bool:
    if hasher is None:
        from ..hash import poseidon as hp

        hasher = hp
    digest = hasher.hash_leaf(list(leaf_data))
    idx = leaf_index
    for sib in siblings:
        if idx & 1:
            digest = hasher.two_to_one(sib, digest)
        else:
            digest = hasher.two_to_one(digest, sib)
        idx >>= 1
    return tuple(int(x) for x in cap[idx]) == digest
