"""Global prover mesh context — threads multi-chip sharding through prove().

The reference parallelizes its prover with 32 rayon call sites
(plonky2/src/fri/oracle.rs:168-223, plonk/prover.rs:640-864,
core/src/merkle_tree.rs:112-144). The TPU equivalent is a device mesh:
polynomial batches ``[num_polys, N]`` shard over the *poly* axis for
IFFT/LDE (embarrassingly parallel, like rayon's per-poly par_iter),
Merkle leaves ``[lde_n, width]`` shard over the *row* axis (the
reference's 2^cap_height independent subtrees), and quotient evaluation
shards over domain points (par_chunks over LDE points). The layout
change between poly-major and point-major is a single all-to-all that
XLA inserts at a sharding constraint.

Because all arithmetic is exact (integer mod p), the sharded program is
bit-identical to the single-chip program by construction — asserted by
tests/test_mesh_prove.py.

Usage::

    with prover_mesh(jax.make_mesh((8,), ("x",))):
        proof = prove(prover_data, common, pw)

Multi-host: pass a 2-D mesh and a tuple of axis names —
``prover_mesh(Mesh(devs.reshape(hosts, chips), ("host", "chip")),
axis=("host", "chip"))`` — and every sharded dimension is flattened over
both axes (PartitionSpec accepts the tuple). Layout guidance for real
pods: put the *outer* (slower, DCN) axis first; the poly-axis LDE phase
is collective-free so it scales across DCN slices, and the single
poly-major→point-major all-to-all is the only cross-slice transfer —
XLA decomposes it hierarchically (ICI within a slice, DCN once across).
For DCN-free operation shard over the ICI axis alone and run one
independent proof per slice (data-parallel proving).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_STATE = {"mesh": None, "axis": "x"}


def make_prover_mesh(num_devices: int = None, axis: str = "x") -> Mesh:
    """1-D mesh over the first num_devices devices with AUTO axis types —
    the prover relies on GSPMD propagation (jax.make_mesh's default
    Explicit axes would instead type-check every sharded-dim op)."""
    import numpy as np

    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def set_mesh(mesh: Optional[Mesh], axis: str = "x") -> None:
    _STATE["mesh"] = mesh
    _STATE["axis"] = axis


def get_mesh() -> Optional[Mesh]:
    return _STATE["mesh"]


def axis_name() -> str:
    return _STATE["axis"]


def mesh_key() -> Optional[Tuple[Mesh, str]]:
    """Hashable cache key for per-mesh jitted kernels (None = single chip)."""
    m = _STATE["mesh"]
    return None if m is None else (m, _STATE["axis"])


def axis_size(key) -> int:
    """Total device count along the sharding axis (a name or a tuple of
    names for multi-host meshes)."""
    mesh, axis = key
    if isinstance(axis, tuple):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]


@contextmanager
def prover_mesh(mesh: Mesh, axis: str = "x"):
    prev = (_STATE["mesh"], _STATE["axis"])
    set_mesh(mesh, axis)
    try:
        yield
    finally:
        set_mesh(*prev)


# ---------------------------------------------------------------------------
# Sharding helpers. All are no-ops when no mesh is active, so call sites
# stay single-chip clean. ``constrain_*`` variants are for use inside a
# traced function (with_sharding_constraint); ``put_*`` move committed
# host/device arrays onto the mesh.
# ---------------------------------------------------------------------------


def _sharding(key, spec) -> Optional[NamedSharding]:
    if key is None:
        return None
    mesh, axis = key
    return NamedSharding(mesh, spec(axis))


def rows_sharding(key):
    """[rows, ...] split over rows (Merkle leaves/digests, LDE points)."""
    return _sharding(key, lambda ax: P(ax))


def polys_sharding(key):
    """[num_polys, N] split over the poly axis."""
    return _sharding(key, lambda ax: P(ax, None))


def cols_sharding(key):
    """[M, N] split over the trailing (domain) axis."""
    return _sharding(key, lambda ax: P(None, ax))


def replicated_sharding(key):
    return _sharding(key, lambda ax: P())


def put(x, sharding):
    """device_put a Gf limb pair (or single array) onto a sharding."""
    if sharding is None:
        return x
    if isinstance(x, tuple):
        return tuple(jax.device_put(v, sharding) for v in x)
    return jax.device_put(x, sharding)


def constrain(x, sharding):
    """with_sharding_constraint for a Gf limb pair inside a traced fn."""
    if sharding is None:
        return x
    if isinstance(x, tuple):
        return tuple(jax.lax.with_sharding_constraint(v, sharding) for v in x)
    return jax.lax.with_sharding_constraint(x, sharding)
