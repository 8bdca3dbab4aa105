"""Tracing/profiling: the TPU equivalent of the reference's TimingTree +
PGO pipeline (SURVEY §5.1; reference plonky2/src/util/timing.rs:8-154).

Three layers:

* ``trace(dir)`` — capture a jax profiler trace (XPlane/TensorBoard
  format) around any region: every XLA kernel, its device time and HBM
  stats land in the trace. ``bench.py`` honours ``BENCH_PROFILE=dir``.
* ``annotate(label)`` — a named host scope that shows up inside traces
  (jax.profiler.TraceAnnotation), used to mark prover phases so kernel
  time attributes to wires-commit/quotient/FRI/etc.
* ``roofline(...)`` — per-kernel speed-of-light accounting: given the
  bytes a kernel must move and the u32 ops it must execute, report
  achieved GB/s, ops/s and %-of-SoL against the chip model. The chip
  constants live here; benches/kernels.py builds its SoL models on
  them.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Optional

# TPU v5e, one chip (public spec; override per platform if needed)
HBM_BW = 819e9  # bytes/s
VPU_OPS = 6.1e12  # u32 ops/s (8*128 lanes * 4 ALUs * ~1.5 GHz)
ELT = 8  # bytes per Goldilocks element (u32 lo+hi planes)


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a jax profiler trace of the enclosed region into log_dir
    (viewable in TensorBoard / Perfetto)."""
    import jax

    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield


def annotate(label: str):
    """Named scope visible in profiler traces; nests like TimingTree."""
    import jax

    return jax.profiler.TraceAnnotation(label)


@dataclass
class Roofline:
    name: str
    seconds: float
    bytes_moved: int
    u32_ops: int

    @property
    def achieved_gbs(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    @property
    def achieved_gops(self) -> float:
        return self.u32_ops / self.seconds / 1e9

    @property
    def sol_seconds(self) -> float:
        """Max of the bandwidth and compute lower bounds."""
        return max(self.bytes_moved / HBM_BW, self.u32_ops / VPU_OPS)

    @property
    def pct_sol(self) -> float:
        return 100.0 * self.sol_seconds / self.seconds

    @property
    def bound(self) -> str:
        return (
            "bandwidth"
            if self.bytes_moved / HBM_BW >= self.u32_ops / VPU_OPS
            else "compute"
        )

    def as_dict(self) -> dict:
        return {
            "kernel": self.name,
            "time_ms": self.seconds * 1e3,
            "achieved_gbs": self.achieved_gbs,
            "achieved_gops_u32": self.achieved_gops,
            "sol_ms": self.sol_seconds * 1e3,
            "pct_sol": self.pct_sol,
            "bound": self.bound,
        }


def roofline(
    name: str, seconds: float, bytes_moved: int, u32_ops: int = 0
) -> Roofline:
    return Roofline(name, seconds, bytes_moved, u32_ops)


def timed_device(fn, *args, warmup: int = 2, iters: int = 5) -> float:
    """Median wall seconds of fn(*args), synchronized on device completion
    (block_until_ready) — the measurement half of a roofline entry."""
    import time

    import jax
    import numpy as np

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
