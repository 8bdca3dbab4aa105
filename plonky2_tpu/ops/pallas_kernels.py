"""Pallas TPU kernels for the Goldilocks hot path.

The XLA path (ops/gf.py, ops/ntt.py) already runs on TPU; these kernels
fuse the u32-limb field arithmetic so a whole chain of elementwise ops —
or every butterfly stage of a VMEM-resident row NTT — happens in one
VMEM residency instead of bouncing each intermediate через HBM
(HBM bandwidth is the bottleneck per the TPU programming model; see
/opt/skills/guides/pallas_guide.md).

The field math itself is the same jnp-traceable limb code as ops/gf.py,
called inside the kernels, so there is a single source of truth for the
arithmetic. Everything is gated: callers opt in via use_pallas() and the
wrappers fall back to the XLA path off-TPU (the Pallas TPU backend does
not exist on CPU; tests run with interpret=True).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..field import goldilocks as gl
from ..utils.bits import log2_strict
from . import gf

LANES = 128
SUBLANES = 8


def use_pallas() -> bool:
    if os.environ.get("PLONKY2_TPU_PALLAS", "") == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Fused elementwise Goldilocks multiply
# ---------------------------------------------------------------------------


def _mul_body(alo_ref, ahi_ref, blo_ref, bhi_ref, olo_ref, ohi_ref):
    a = (alo_ref[:], ahi_ref[:])
    b = (blo_ref[:], bhi_ref[:])
    olo, ohi = gf.mul(a, b)
    olo_ref[:] = olo
    ohi_ref[:] = ohi


@partial(jax.jit, static_argnums=(2,))
def mul(a: gf.Gf, b: gf.Gf, interpret: bool = False) -> gf.Gf:
    """Elementwise Goldilocks multiply as one fused VMEM kernel."""
    shape = a[0].shape
    out_shape = (
        jax.ShapeDtypeStruct(shape, jnp.uint32),
        jax.ShapeDtypeStruct(shape, jnp.uint32),
    )
    return pl.pallas_call(
        _mul_body,
        out_shape=out_shape,
        interpret=interpret,
    )(a[0], a[1], b[0], b[1])


# ---------------------------------------------------------------------------
# VMEM-resident row NTT: every butterfly stage of an N-point FFT on a
# block of rows in one kernel (the six-step local stage / oracle-commit
# row transform). Input rows must already be bit-reversed.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _stacked_tables(n_log: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Per-stage twiddle rows padded to N/2: [n_log, N/2] u32 limb pair."""
    from . import ntt

    tables = ntt._stage_roots_np(n_log, inverse)  # u64 arrays per stage
    half = 1 << (n_log - 1)
    lo = np.zeros((n_log, half), dtype=np.uint32)
    hi = np.zeros((n_log, half), dtype=np.uint32)
    for s, t in enumerate(tables):
        t = np.asarray(t, dtype=np.uint64)
        tiled = np.tile(t, half // t.shape[0])
        lo[s] = (tiled & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi[s] = (tiled >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def _fft_body(n_log: int, xlo_ref, xhi_ref, tlo_ref, thi_ref, olo_ref, ohi_ref):
    lo = xlo_ref[:]
    hi = xhi_ref[:]
    rows = lo.shape[0]
    n = lo.shape[1]
    for s in range(n_log):
        half = 1 << s
        nblocks = n >> (s + 1)
        rlo = lo.reshape(rows, nblocks, 2, half)
        rhi = hi.reshape(rows, nblocks, 2, half)
        u = (rlo[:, :, 0, :], rhi[:, :, 0, :])
        v = (rlo[:, :, 1, :], rhi[:, :, 1, :])
        # stage table: first `half` entries repeat per block
        wlo = tlo_ref[s, :].reshape(nblocks, half)[0:1]
        whi = thi_ref[s, :].reshape(nblocks, half)[0:1]
        w = (
            jnp.broadcast_to(wlo[None, :, :], v[0].shape),
            jnp.broadcast_to(whi[None, :, :], v[1].shape),
        )
        t = gf.mul(v, w)
        add = gf.add(u, t)
        sub = gf.sub(u, t)
        lo = jnp.stack([add[0], sub[0]], axis=2).reshape(rows, n)
        hi = jnp.stack([add[1], sub[1]], axis=2).reshape(rows, n)
    olo_ref[:] = lo
    ohi_ref[:] = hi


@partial(jax.jit, static_argnums=(1, 2, 3))
def row_fft_bitrev(
    x: gf.Gf, n_log: int, inverse: bool = False, interpret: bool = False
) -> gf.Gf:
    """[M, N] rows (already bit-reversed) -> natural-order FFT values,
    all stages fused in VMEM. N must fit VMEM alongside the row block."""
    m, n = x[0].shape
    assert n == 1 << n_log
    tlo, thi = _stacked_tables(n_log, inverse)
    out_shape = (
        jax.ShapeDtypeStruct((m, n), jnp.uint32),
        jax.ShapeDtypeStruct((m, n), jnp.uint32),
    )
    out = pl.pallas_call(
        partial(_fft_body, n_log),
        out_shape=out_shape,
        interpret=interpret,
    )(x[0], x[1], jnp.asarray(tlo), jnp.asarray(thi))
    if inverse:
        out = gf.mul_const(out, gl.ginv(n % gl.P))
    return out


def fft(coeffs: gf.Gf, interpret: bool = False) -> gf.Gf:
    """Drop-in for ops.ntt.fft over [M, N] batches via the fused kernel."""
    from . import ntt

    n_log = log2_strict(coeffs[0].shape[-1])
    return row_fft_bitrev(ntt.bit_reverse(coeffs), n_log, False, interpret)


def ifft(values: gf.Gf, interpret: bool = False) -> gf.Gf:
    from . import ntt

    n_log = log2_strict(values[0].shape[-1])
    return row_fft_bitrev(ntt.bit_reverse(values), n_log, True, interpret)
