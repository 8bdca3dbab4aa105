"""Pallas TPU kernels for the Goldilocks hot path.

The XLA path (ops/gf.py, ops/ntt.py) already runs on TPU; these kernels
fuse the u32-limb field arithmetic so a whole chain of elementwise ops —
or every butterfly stage of a VMEM-resident row NTT — happens in one
VMEM residency instead of bouncing each intermediate through HBM
(HBM bandwidth is the bottleneck per the TPU programming model; see
/opt/skills/guides/pallas_guide.md).

The field math itself is the same jnp-traceable limb code as ops/gf.py,
called inside the kernels, so there is a single source of truth for the
arithmetic. Everything is gated: callers opt in via use_pallas() and the
wrappers fall back to the XLA path off-TPU (the Pallas TPU backend does
not exist on CPU; tests run with interpret=True).

Measured on TPU v5e (2026-08-17): fused mul 1.41 Gmul/s vs 1.32 XLA at
1M elements; row FFT 2.07ms vs 2.74ms XLA at 64x2^10 (the six-step local
row size), parity at 2^12. Rows ≥ 2^13 run the stage-split hybrid in
row_fft_bitrev: the first MAX_FUSED_LOG post-bit-reversal stages fuse
into one VMEM kernel (they act within contiguous blocks), the remaining
cross-block stages run as XLA passes — log(N)+1 HBM passes drop to
log(N)-MAX_FUSED_LOG+1.

Crossover measured on the v5e (2026-08-17, loaded host — relative
numbers): 64x2^12 pallas 33 vs XLA 35 ms (parity), 8x2^16 46 vs 34,
1x2^20 234 vs 63 — the hybrid's fused head does not amortize its extra
reshape/copy traffic at large rows, so the XLA path stays the default
everywhere and these kernels remain opt-in (PLONKY2_TPU_PALLAS) for the
≤2^12-row regime (six-step local work) where they win.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import goldilocks as gl
from ..utils.bits import log2_strict
from . import gf

LANES = 128
SUBLANES = 8


def use_pallas() -> bool:
    v = os.environ.get("PLONKY2_TPU_PALLAS", "")
    if v == "0":
        return False
    if v == "interpret":
        # CPU tests exercise the pallas call sites (incl. the shard_map
        # mesh wiring) through the interpreter
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def interpret_mode() -> bool:
    return os.environ.get("PLONKY2_TPU_PALLAS", "") == "interpret"


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
    """Elementwise Goldilocks multiply as a fused VMEM kernel, blocked
    over a row grid so the working set (6 planes + limb temporaries)
    stays inside the ~16MB VMEM budget."""
    shape = a[0].shape
    total = int(np.prod(shape))
    width = LANES * SUBLANES  # 1024-lane rows
    pad = (-total) % width
    rows_all = (total + pad) // width

    def norm(x):
        flat = x.reshape(-1)
        if pad:
            flat = jnp.pad(flat, (0, pad))
        return flat.reshape(rows_all, width)

    block_rows = min(rows_all, 64)
    # grid must tile evenly; shrink to a divisor
    while rows_all % block_rows:
        block_rows -= 1
    grid = (rows_all // block_rows,)
    spec = pl.BlockSpec((block_rows, width), lambda i: (i, 0))
    out_shape = (
        jax.ShapeDtypeStruct((rows_all, width), jnp.uint32),
        jax.ShapeDtypeStruct((rows_all, width), jnp.uint32),
    )
    olo, ohi = pl.pallas_call(
        _mul_body,
        out_shape=out_shape,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(norm(a[0]), norm(a[1]), norm(b[0]), norm(b[1]))

    def denorm(x):
        flat = x.reshape(-1)
        if pad:
            flat = flat[:total]
        return flat.reshape(shape)

    return denorm(olo), denorm(ohi)


# ---------------------------------------------------------------------------
# VMEM-resident row NTT: every butterfly stage of an N-point FFT on a
# block of rows in one kernel (the six-step local stage / oracle-commit
# row transform). Input rows must already be bit-reversed.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _stacked_tables(n_log: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Full-width per-stage twiddles tw[s][lane] = w_s^(lane & (2^s - 1)):
    [n_log, N] u32 limb pair (the same twiddle at both lanes of a pair,
    so the kernel stays mask+roll based — no reshapes)."""
    from . import ntt

    tables = ntt._stage_roots_np(n_log, inverse)  # u64 arrays per stage
    n = 1 << n_log
    lo = np.zeros((n_log, n), dtype=np.uint32)
    hi = np.zeros((n_log, n), dtype=np.uint32)
    for s, t in enumerate(tables):
        t = np.asarray(t, dtype=np.uint64)  # length 2^s
        tiled = np.tile(t, n // t.shape[0])
        lo[s] = (tiled & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi[s] = (tiled >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def _fft_body(n_log: int, first_stage: int, xlo_ref, xhi_ref, tlo_ref, thi_ref, olo_ref, ohi_ref):
    """Mask+roll DIT butterflies: 2-D [rows, N] tensors only (Mosaic has
    no cheap interior reshapes). For stage s with half = 2^s, lane i pairs
    with lane i^half; the same twiddle applies at both lanes:
      lo lane: u + w*v   (v arrives by roll(-half))
      hi lane: u - w*v   (u arrives by roll(+half), v = self)
    """
    lo = xlo_ref[:]
    hi = xhi_ref[:]
    rows = lo.shape[0]
    n = lo.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, n), dimension=1)
    for s in range(first_stage, n_log):
        half = 1 << s
        is_hi = (lane & half) != 0
        w = (
            jnp.broadcast_to(tlo_ref[s, :], (rows, n)),
            jnp.broadcast_to(thi_ref[s, :], (rows, n)),
        )
        # pltpu.roll is circular with non-negative shift:
        # roll(x, s)[i] = x[(i-s) mod n]
        from_hi = (pltpu.roll(lo, n - half, 1), pltpu.roll(hi, n - half, 1))
        from_lo = (pltpu.roll(lo, half, 1), pltpu.roll(hi, half, 1))
        x = (lo, hi)
        t_at_lo = gf.mul(from_hi, w)   # w*v, valid at lo lanes
        t_at_hi = gf.mul(x, w)         # w*v, valid at hi lanes (v = self)
        a = gf.add(x, t_at_lo)         # u + w*v at lo lanes
        b = gf.sub(from_lo, t_at_hi)   # u - w*v at hi lanes
        lo = jnp.where(is_hi, b[0], a[0])
        hi = jnp.where(is_hi, b[1], a[1])
    olo_ref[:] = lo
    ohi_ref[:] = hi


def _row_fft_core(x: gf.Gf, n_log: int, inverse: bool, interpret: bool,
                  first_stage: int = 0) -> gf.Gf:
    """Stages first_stage..n_log fused in VMEM over [M, 2^n_log] rows
    (first_stage > 0 = zero_factor-seeded input, ops/ntt.lde_onto_coset);
    NO final 1/N scaling (callers handle it, so the hybrid path can
    defer it)."""
    m, n = x[0].shape
    assert n == 1 << n_log
    tlo, thi = _stacked_tables(n_log, inverse)

    # ~8 live [rows, N] u32 planes per block; target ≤ 4MB of VMEM
    block_rows = max(SUBLANES, min(m, (4 << 20) // (8 * 4 * n)))
    pad = (-m) % block_rows
    xlo = jnp.pad(x[0], ((0, pad), (0, 0))) if pad else x[0]
    xhi = jnp.pad(x[1], ((0, pad), (0, 0))) if pad else x[1]
    rows_all = m + pad

    grid = (rows_all // block_rows,)
    spec = pl.BlockSpec((block_rows, n), lambda i: (i, 0))
    tspec = pl.BlockSpec((n_log, n), lambda i: (0, 0))
    out_shape = (
        jax.ShapeDtypeStruct((rows_all, n), jnp.uint32),
        jax.ShapeDtypeStruct((rows_all, n), jnp.uint32),
    )
    out = pl.pallas_call(
        partial(_fft_body, n_log, first_stage),
        out_shape=out_shape,
        grid=grid,
        in_specs=[spec, spec, tspec, tspec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(xlo, xhi, jnp.asarray(tlo), jnp.asarray(thi))
    if pad:
        out = (out[0][:m], out[1][:m])
    return out


# All stages of one row must fit a VMEM block alongside the [n_log, N]
# twiddle planes; past this the hybrid path splits stages instead.
MAX_FUSED_LOG = 12


@partial(jax.jit, static_argnums=(1, 2, 3))
def row_fft_bitrev(
    x: gf.Gf, n_log: int, inverse: bool = False, interpret: bool = False
) -> gf.Gf:
    """[M, N] rows (already bit-reversed) -> natural-order FFT values,
    fused in VMEM. Rows ≤ 2^MAX_FUSED_LOG run all stages in one kernel;
    larger rows run the stage-split hybrid: after a global bit-reversal
    the first b stages of a DIT act entirely within contiguous 2^b
    blocks with block-independent twiddles, so [M, N] reshapes to
    [M*N/2^b, 2^b] for the fused kernel (one HBM round trip for b
    stages) and the remaining log(N)-b cross-block stages run as XLA
    passes — log(N)+1 HBM passes drop to log(N)-b+1."""
    m, n = x[0].shape
    assert n == 1 << n_log
    if n_log <= MAX_FUSED_LOG:
        out = _row_fft_core(x, n_log, inverse, interpret)
    else:
        from . import ntt

        b = MAX_FUSED_LOG
        xr = (x[0].reshape(-1, 1 << b), x[1].reshape(-1, 1 << b))
        head = _row_fft_core(xr, b, inverse, interpret)
        x2 = (head[0].reshape(m, n), head[1].reshape(m, n))
        out = ntt._butterflies(x2, ntt.stage_roots(n_log, inverse), first_stage=b)
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


# ---------------------------------------------------------------------------
# Column FFT: all butterfly stages along the SUBLANE axis of an [N, L]
# tile, fused in one VMEM residency. This is the four-step NTT's inner
# transform (ops/ntt._fft_four_step): rows are the transform axis, the
# lane axis rides along untouched, so the butterflies need no lane
# shuffles at all — partners sit a fixed number of SUBLANES apart and
# arrive via pltpu.roll on dimension 0. One kernel pass replaces
# k_log XLA HBM passes.
# ---------------------------------------------------------------------------

# Per-block VMEM budget: the unrolled stage chain keeps ~12-16 live
# [N, 128] u32 planes (measured: N=2^10 blocks hit Mosaic's 16 MB scoped
# limit at 18.2 MB with a two-mul mask+roll body). N=2^10 with the
# sliced single-mul body fits; transforms with more rows split:
# ntt._fft_rows runs the first COL_FFT_MAX_LOG stages here (batched over
# contiguous row blocks) and the cross-block tail in XLA.
COL_FFT_MAX_LOG = 10
_COL_LB = 128


# Measured v5e crossover (2026-08-20): the XLA radix-2 row pipeline wins
# up to 2^11 rows (47%/42% per-stage SoL at 2^20/2^22); the fused kernel
# wins from 2^12 rows where XLA's per-stage passes degrade (37.5 -> 31.6
# ms at 2^24). Tests force the kernel via PLONKY2_TPU_PALLAS=interpret.
COL_FFT_MIN_ROWS_LOG = 12


def col_fft_enabled(k_log: int, shape) -> bool:
    """Gate for ops.ntt._fft_rows: fused column kernel when on TPU (or
    interpret mode for tests), the stage count fits VMEM, and the lane
    axis is at least one native lane group."""
    if not (3 <= k_log <= COL_FFT_MAX_LOG):
        return False
    if shape[-1] % _COL_LB:
        return False
    rows_log = log2_strict(shape[-2])
    if rows_log < COL_FFT_MIN_ROWS_LOG and not interpret_mode():
        return False
    from ..parallel import context as _pctx

    if _pctx.get_mesh() is not None:
        return False
    if os.environ.get("PLONKY2_TPU_PALLAS_NTT", "1") == "0":
        return False
    return use_pallas()


@lru_cache(maxsize=None)
def _col_tables(k_log: int, inverse: bool):
    """T[s, r, 0] = w_s^(r mod 2^s) — the stage-s twiddle for the row-pair
    butterfly at row r (same value at both partners, so the kernel stays
    mask+roll based)."""
    from . import ntt

    tables = ntt._stage_roots_np(k_log, inverse)
    n = 1 << k_log
    lo = np.zeros((k_log, n, 1), dtype=np.uint32)
    hi = np.zeros((k_log, n, 1), dtype=np.uint32)
    for s, t in enumerate(tables):
        t = np.asarray(t, dtype=np.uint64)  # length 2^s
        tiled = np.tile(t, n // t.shape[0])
        lo[s, :, 0] = (tiled & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi[s, :, 0] = (tiled >> np.uint64(32)).astype(np.uint32)
    return lo, hi


_SLICED_MIN_STAGE = 3  # half >= 8 keeps the (half, L) view sublane-tiled


def _col_fft_body(k_log: int, first_stage: int,
                  xlo_ref, xhi_ref, tlo_ref, thi_ref, olo_ref, ohi_ref):
    """All stages in one VMEM residency. Early stages (half < 8 sublanes)
    run mask+roll; from half = 8 up the [N, L] view reshapes freely to
    [nb, 2, half, L] (the minor (half, L) tile stays aligned) and each
    butterfly is one true mul per pair — no redundant twiddle work, no
    lane shuffles, N/2 muls per stage like the host formulation."""
    lo = xlo_ref[0]
    hi = xhi_ref[0]
    n, lanes = lo.shape
    if first_stage < _SLICED_MIN_STAGE:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, lanes), dimension=0)
    for s in range(first_stage, min(_SLICED_MIN_STAGE, k_log)):
        half = 1 << s
        is_hi = (row & half) != 0
        w = (
            jnp.broadcast_to(tlo_ref[s], (n, lanes)),
            jnp.broadcast_to(thi_ref[s], (n, lanes)),
        )
        # roll along SUBLANES: roll(x, k, 0)[r] = x[(r-k) mod n]
        v = (
            jnp.where(is_hi, lo, pltpu.roll(lo, n - half, 0)),
            jnp.where(is_hi, hi, pltpu.roll(hi, n - half, 0)),
        )
        u = (
            jnp.where(is_hi, pltpu.roll(lo, half, 0), lo),
            jnp.where(is_hi, pltpu.roll(hi, half, 0), hi),
        )
        t = gf.mul(v, w)
        a = gf.add(u, t)
        b = gf.sub(u, t)
        lo = jnp.where(is_hi, b[0], a[0])
        hi = jnp.where(is_hi, b[1], a[1])
    for s in range(max(first_stage, _SLICED_MIN_STAGE), k_log):
        half = 1 << s
        nb = n >> (s + 1)
        rlo = lo.reshape(nb, 2, half, lanes)
        rhi = hi.reshape(nb, 2, half, lanes)
        u = (rlo[:, 0], rhi[:, 0])
        v = (rlo[:, 1], rhi[:, 1])
        w = (
            jnp.broadcast_to(tlo_ref[s, :half].reshape(1, half, 1), v[0].shape),
            jnp.broadcast_to(thi_ref[s, :half].reshape(1, half, 1), v[1].shape),
        )
        t = gf.mul(v, w)
        a = gf.add(u, t)
        b = gf.sub(u, t)
        lo = jnp.concatenate([a[0], b[0]], axis=1).reshape(n, lanes)
        hi = jnp.concatenate([a[1], b[1]], axis=1).reshape(n, lanes)
    olo_ref[0] = lo
    ohi_ref[0] = hi


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _col_fft_call(x: gf.Gf, k_log: int, inverse: bool, first_stage: int,
                  interpret: bool) -> gf.Gf:
    lead = x[0].shape[:-2]
    n, lanes = x[0].shape[-2:]
    b = int(np.prod(lead)) if lead else 1
    xlo = x[0].reshape(b, n, lanes)
    xhi = x[1].reshape(b, n, lanes)
    tlo, thi = _col_tables(k_log, inverse)
    grid = (b, lanes // _COL_LB)
    spec = pl.BlockSpec((1, n, _COL_LB), lambda i, j: (i, 0, j))
    tspec = pl.BlockSpec((k_log, n, 1), lambda i, j: (0, 0, 0))
    out_shape = (
        jax.ShapeDtypeStruct((b, n, lanes), jnp.uint32),
        jax.ShapeDtypeStruct((b, n, lanes), jnp.uint32),
    )
    olo, ohi = pl.pallas_call(
        partial(_col_fft_body, k_log, first_stage),
        out_shape=out_shape,
        grid=grid,
        in_specs=[spec, spec, tspec, tspec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(xlo, xhi, jnp.asarray(tlo), jnp.asarray(thi))
    return olo.reshape(x[0].shape), ohi.reshape(x[1].shape)


def col_fft(x: gf.Gf, k_log: int, inverse: bool,
            first_stage: int = 0) -> gf.Gf:
    """DFT along axis -2 of [..., N, L] (input bit-reversed along that
    axis), all stages fused in VMEM. No 1/N scaling (callers handle)."""
    return _col_fft_call(x, k_log, inverse, first_stage, interpret_mode())
