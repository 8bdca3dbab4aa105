"""Kernel benchmark suite with speed-of-light accounting.

Reference bench coverage: plonky2/benches/{ffts,merkle,field_arithmetic,
hashing}.rs, plus the BASELINE.json north-star configs (NTT 2^16-2^24
per chip, Poseidon perms/s/chip, FRI fold, Merkle 2^20 leaves).

Speed-of-light models (documented per kernel, derived from the chip
spec, not vibes):

* Chip spec (TPU v5e, one chip): HBM bandwidth 819 GB/s; TensorCore
  clock ~1.5 GHz (from 1.97e14 bf16 FLOP/s / (4 MXUs * 128*128*2));
  VPU lanes 8*128 with 4 ALUs -> ~6.1e12 u32 ops/s peak.
* A Goldilocks element is a (lo, hi) u32 limb pair = 8 bytes.
* NTT (bandwidth-bound): a VMEM-blocked four-step transform reads and
  writes the whole array twice: SoL bytes = 2 passes * 2 (rd+wr) * 8B
  * N. The naive per-stage bound (what un-fused XLA does) is
  log2(N) * 2 * 8B * N; both are reported.
* FRI fold (bandwidth-bound): one read of the [N, 2] extension array +
  one write of [N/arity, 2]: SoL bytes = (1 + 1/arity) * 16B * N.
* Poseidon (compute-bound): per permutation, counted from the kernel
  (ops/poseidon.py): 8 full rounds * (12 sboxes * 3 gmul + MDS
  shift-accumulate) + 22 partial rounds * (1 sbox + sparse matrix).
  A 32x32->64 gmul costs ~10 u32 mul/add VPU ops (4 partial products
  + carries) plus ~14 reduction ops; we charge GMUL_OPS=24 u32 ops
  and GADD_OPS=6. Totals below; perms/s SoL = VPU_OPS / ops_per_perm.
"""

from __future__ import annotations

import json
import time
from typing import Dict, List

import numpy as np

from plonky2_tpu.utils.profiling import ELT, HBM_BW, VPU_OPS

# Poseidon op-count model, counted from the ACTUAL u32-limb kernel
# (ops/gf.py + ops/poseidon.py), not an idealized scalar cost:
#   gf.mul = 4x _mul32 (16-bit split, ~10 u32 ops each) + 128-bit carry
#   chain (~12) + reduce128 (~20) ≈ 72 vector ops
#   sbox7  = 4 gf.mul ≈ 290
#   MDS    = 4 16-bit planes x 144 tiny-const mul-adds + recombine +
#            12 reduce128 ≈ 1450   (tiny constants: plane muls, no gmul)
#   full round ≈ 12 sbox + MDS + consts ≈ 4.9k; partial ≈ 1 sbox + MDS
#   ≈ 1.8k.  (The round-3 model charged GMUL_OPS=24 — a scalar-CPU
#   fantasy that made the kernel look 5x off its roofline; the kernel
#   actually runs at ~80% of this formulation's ceiling. The remaining
#   structural lever is a cheaper multiplication formulation, not kernel
#   scheduling.)
GMUL_OPS = 72
SBOX_OPS = 4 * GMUL_OPS
MDS_OPS = 4 * 144 + 60 + 12 * 20
POSEIDON_OPS_PER_PERM = (
    8 * (12 * SBOX_OPS + MDS_OPS + 12 * 4)
    + 22 * (SBOX_OPS + MDS_OPS + 4)
)  # ~ 79k u32 vector ops


def _force(out):
    """Fetch one element to the host — block_until_ready alone is not
    trustworthy on the remote (axon) TPU platform, where it was observed
    to return before execution (2^24 NTT "finishing" in 0.04 ms)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def _time_fn(fn, *args, warmup: int = 2, reps: int = 16) -> float:
    """Per-call seconds of fn(*args), RTT-amortized: the remote (axon)
    tunnel adds a ~33 ms floor to any host-observed completion, so time
    k queued async dispatches ending in one forced fetch and use the
    slope (t_k - t_1) / (k - 1) — the device-throughput cost per call."""
    for _ in range(warmup):
        _force(fn(*args))

    def run(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        _force(out)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    tk = min(run(1 + reps) for _ in range(3))
    return max((tk - t1) / reps, 1e-9)


def bench_ntt(log_sizes=(16, 20, 24), batch: int = 1) -> List[Dict]:
    """fft over [batch, 2^k] (reference: plonky2/benches/ffts.rs:9-45)."""
    from plonky2_tpu.ops import gf, ntt

    out = []
    rng = np.random.default_rng(0)
    for k in log_sizes:
        n = 1 << k
        x = gf.from_u64(rng.integers(0, (1 << 63), size=(batch, n), dtype=np.uint64))
        t = _time_fn(ntt.fft_jit, x)
        total = batch * n
        sol_blocked = 2 * 2 * ELT * total / HBM_BW
        sol_staged = k * 2 * ELT * total / HBM_BW
        out.append(
            {
                "metric": f"ntt_2^{k}" + (f"_x{batch}" if batch > 1 else ""),
                "value": t * 1e3,
                "unit": "ms",
                "elems_per_s": total / t,
                "achieved_gbs": k * 2 * ELT * total / t / 1e9,
                "sol_ms_blocked_2pass": sol_blocked * 1e3,
                "sol_ms_per_stage": sol_staged * 1e3,
                "pct_sol_blocked": 100 * sol_blocked / t,
                "pct_sol_per_stage": 100 * sol_staged / t,
            }
        )
    return out


def bench_poseidon(log_batch: int = 20) -> List[Dict]:
    """Batched width-12 permutations (reference: benches/hashing.rs)."""
    from plonky2_tpu.ops import gf
    from plonky2_tpu.ops import poseidon as dp
    import jax

    b = 1 << log_batch
    rng = np.random.default_rng(1)
    st = gf.from_u64(rng.integers(0, (1 << 63), size=(b, 12), dtype=np.uint64))
    permute = jax.jit(dp.permute)
    t = _time_fn(permute, st)
    perms_per_s = b / t
    sol_perms = VPU_OPS / POSEIDON_OPS_PER_PERM
    # bandwidth bound: read+write 12 elts
    bw_bound = HBM_BW / (2 * 12 * ELT)
    return [
        {
            "metric": f"poseidon_perms_2^{log_batch}",
            "value": perms_per_s / 1e6,
            "unit": "Mperms/s",
            "time_ms": t * 1e3,
            "sol_mperms_compute": sol_perms / 1e6,
            "sol_mperms_bandwidth": bw_bound / 1e6,
            "pct_sol_compute": 100 * perms_per_s / sol_perms,
        }
    ]


def bench_merkle(log_leaves: int = 20, leaf_width: int = 135) -> List[Dict]:
    """Full tree build over [2^k, w] leaves (reference: benches/merkle.rs,
    scaled to 2^20 per BASELINE)."""
    from plonky2_tpu.ops import gf, merkle

    n = 1 << log_leaves
    rng = np.random.default_rng(2)
    leaves = gf.from_u64(
        rng.integers(0, (1 << 63), size=(n, leaf_width), dtype=np.uint64)
    )
    t = _time_fn(lambda lv: merkle.build_merkle_tree(lv, 4).cap, leaves)
    # perm count: leaf sponge ceil(w/8) per leaf + ~n internal two_to_one
    perms = n * (-(-leaf_width // 8)) + n
    perms_per_s = perms / t
    sol_perms = VPU_OPS / POSEIDON_OPS_PER_PERM
    return [
        {
            "metric": f"merkle_2^{log_leaves}x{leaf_width}",
            "value": t * 1e3,
            "unit": "ms",
            "leaves_per_s": n / t,
            "perms_per_s": perms_per_s,
            "pct_sol_compute": 100 * perms_per_s / sol_perms,
        }
    ]


def bench_fri_fold(log_n: int = 22, arity_bits: int = 4) -> List[Dict]:
    """Arity-16 coefficient fold on a [2^k, 2] extension poly
    (fri/prover.rs:110-121 equivalent)."""
    from plonky2_tpu.ops import fri_kernels as fk
    from plonky2_tpu.ops import gf

    n = 1 << log_n
    rng = np.random.default_rng(3)
    coeffs = gf.from_u64(rng.integers(0, (1 << 63), size=(n, 2), dtype=np.uint64))
    beta_pows = gf.from_u64(
        rng.integers(0, (1 << 63), size=(1 << arity_bits, 2), dtype=np.uint64)
    )
    t = _time_fn(fk.fold_coeffs, coeffs, beta_pows, arity_bits)
    bytes_moved = (1 + 1 / (1 << arity_bits)) * 2 * ELT * n
    sol = bytes_moved / HBM_BW
    return [
        {
            "metric": f"fri_fold_2^{log_n}_arity{1 << arity_bits}",
            "value": t * 1e3,
            "unit": "ms",
            "achieved_gbs": bytes_moved / t / 1e9,
            "sol_ms": sol * 1e3,
            "pct_sol": 100 * sol / t,
        }
    ]


def bench_lde_commit(log_n: int = 16, num_polys: int = 143, rate_bits: int = 3) -> List[Dict]:
    """The whole oracle commit: [M, 2^k] coeffs -> LDE + transpose +
    Merkle (fri/oracle.rs:193-223) — the prover's dominant phase."""
    from plonky2_tpu.ops import fri_kernels as fk
    from plonky2_tpu.ops import gf

    n = 1 << log_n
    rng = np.random.default_rng(4)
    coeffs = gf.from_u64(
        rng.integers(0, (1 << 63), size=(num_polys, n), dtype=np.uint64)
    )
    t = _time_fn(lambda c: fk.commit(c, rate_bits, 4).cap, coeffs)
    lde_n = n << rate_bits
    perms = lde_n * (-(-num_polys // 8)) + lde_n
    return [
        {
            "metric": f"oracle_commit_{num_polys}x2^{log_n}_rate{1 << rate_bits}",
            "value": t * 1e3,
            "unit": "ms",
            "perms_per_s": perms / t,
            "elems_per_s": num_polys * lde_n / t,
        }
    ]


def run_kernel_suite() -> List[Dict]:
    results = []
    results += bench_ntt((16, 20), batch=1)
    results += bench_ntt((16,), batch=64)
    results += bench_poseidon(20)
    results += bench_merkle(20, 135)
    results += bench_fri_fold(22, 4)
    results += bench_lde_commit(16, 143, 3)
    results += bench_ntt((24,), batch=1)  # slowest compile LAST so a
    # timeout salvages every other record (BENCH_r04 lost merkle/fold)
    return results


if __name__ == "__main__":
    import jax

    print("backend:", jax.devices())
    res = run_kernel_suite()
    for r in res:
        print(json.dumps(r))
