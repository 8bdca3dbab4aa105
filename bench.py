"""Driver benchmark orchestrator.

Prints ONE JSON line: metric/value/unit/vs_baseline (headline = e2e
fibonacci proof wall time vs the reference whitepaper's ~300 ms
recursive-proof yardstick, BASELINE.md), with the full benchmark suite
attached under "extra".

Robustness contract (the round-2 bench was killed by the driver timeout
with NOTHING emitted — that must never happen again):

* This process does NO jax work itself. Every workload runs in a
  subprocess (benches/driver_workloads.py) with its own timeout, so a
  hung XLA compile can't block the orchestrator's signal handling.
* SIGTERM/SIGALRM/SIGINT/SIGHUP all print the best-so-far JSON line and
  exit 0. A workload killed by its timeout still contributes whatever
  JSON lines it printed before dying (cold-run numbers print early).
* An internal alarm (BENCH_BUDGET_S, default 1000 s) fires just under
  the observed driver kill (~1050 s SIGTERM in round 3); the SIGTERM
  handler is the second safety net — best-so-far JSON always prints.
* Workload order = value under a tight budget: fib_host (reliable
  number) -> recursive (round-5 gate) -> fib_device (headline, ~3 min
  with warm caches) -> kernels -> stark ladder -> large. Round 3's
  lesson (a cold fib_device burning 700 s) no longer applies: its
  programs are pre-warmed by tools/warm_bench_caches.sh.
* The persistent XLA compilation cache (tools/xla_cache, machine-local,
  gitignored) is shared by all workload subprocesses.

Workloads (see driver_workloads.py): fibonacci host-transcript prove
(headline; the min over host/device-transcript paths), the
device-transcript prove, recursive proof over a 2^12-gate inner
(whitepaper's 300 ms workload), the kernels SoL suite, a 2^22-row
STARK, a 2^16-gate circuit. BENCH_FAST=1 runs only the headline.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
# The persistent XLA compilation cache ships IN-REPO (tools/xla_cache),
# prewarmed on the same TPU-v5e-tunnel machine class the driver bench
# runs on. Keys are content hashes of the optimized program + compile
# options + jaxlib version + device kind, so a mismatch is a silent
# cache miss (cold compile), never a wrong executable. Each workload
# reports xla_programs/xla_compile_s (cache MISSES only), making the
# hit rate auditable in BENCH extras. Rationale: cold XLA compiles of
# the big fused prover programs exceed any plausible bench slot
# (BENCH_r02/r03 rc 124); shipping AOT artifacts is the same move as
# shipping compiled wheels.
CACHE = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, "tools", "xla_cache")
)
BASELINE_S = 0.300  # whitepaper: recursive proof on a 2021 laptop

RESULT = {
    "metric": "fibonacci_prove_wall_time",
    "value": -1.0,
    "unit": "ms",
    "vs_baseline": 0.0,
    "extra": {},
}
_printed = False


def _emit_and_exit(rc: int = 0) -> None:
    global _printed
    if not _printed:
        _printed = True
        print(json.dumps(RESULT), flush=True)
    os._exit(rc)  # skip atexit — children are already reaped or orphaned


def _on_signal(signum, _frame):
    RESULT["extra"]["terminated_by"] = signal.Signals(signum).name
    _emit_and_exit(0)


def _set_headline(ms: float) -> None:
    if ms > 0 and (RESULT["value"] < 0 or ms < RESULT["value"]):
        RESULT["value"] = round(ms, 3)
        RESULT["vs_baseline"] = round(BASELINE_S / (ms / 1e3), 4)


def run_workload(name: str, args=(), timeout_s: float = 600.0, env=None):
    """Run one workload subprocess; return the last JSON line it printed
    (or an error record). Partial output survives timeouts."""
    cmd = [sys.executable, "-m", "benches.driver_workloads", name, *map(str, args)]
    full_env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=CACHE)
    if env:
        full_env.update(env)
    stdout, timed_out = "", False
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s, cwd=REPO,
            env=full_env,
        )
        stdout = proc.stdout
        stderr_tail = proc.stderr.strip().splitlines()[-3:]
    except subprocess.TimeoutExpired as e:
        timed_out = True
        stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        stderr_tail = []
    last = None
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith(("{", "[")):
            try:
                last = json.loads(line)
            except ValueError:
                pass
    if last is None:
        last = {"error": f"workload {name} produced no JSON"}
        if timed_out:
            last["error"] = f"workload {name} timed out after {timeout_s:.0f}s"
        elif stderr_tail:
            last["stderr"] = stderr_tail
    elif timed_out:
        if isinstance(last, dict):
            last["partial"] = f"killed at {timeout_s:.0f}s; last completed shown"
    return last


def main() -> None:
    for sig in (signal.SIGTERM, signal.SIGALRM, signal.SIGINT, signal.SIGHUP):
        signal.signal(sig, _on_signal)
    budget = float(os.environ.get("BENCH_BUDGET_S", "1000"))
    signal.alarm(int(budget))
    t0 = time.monotonic()

    def left() -> float:
        return budget - (time.monotonic() - t0)

    def tmo(want: float) -> float:
        return max(min(want, left() - 20.0), 5.0)

    extra = RESULT["extra"]

    # 1. headline: host-transcript fibonacci (always completes — r01/r03
    # did, cold cache included: r03 measured 342 s cold-everything)
    r = run_workload("fib_host", timeout_s=tmo(240))
    extra["fib_host"] = r
    if isinstance(r, dict) and isinstance(r.get("ms"), (int, float)):
        _set_headline(r["ms"])

    if not os.environ.get("BENCH_FAST"):
        # every workload prints partial lines so a timeout still
        # contributes its completed numbers. recursive gets the biggest
        # slot: its cold prove is trace-bound (~350 s for the 53-program
        # outer pipeline even with every XLA cache hit) and its warm
        # number is the round-5 acceptance gate. fib_device (the
        # headline: 122 ms warm measured 2026-08-21) runs right after —
        # its programs are cached by tools/warm_bench_caches.sh, making
        # it a ~3 min item instead of round 3's 700 s black hole.
        for name, args, want in (
            ("recursive", (os.environ.get("BENCH_RECURSIVE_LOG2", "12"),), 480),
            ("fib_device", (), 220),
            ("kernels", (), 140),
            ("stark", (os.environ.get("BENCH_STARK_LOG2", "22"),), 300),
            ("large", (os.environ.get("BENCH_LARGE_LOG2", "16"),), 80),
        ):
            if left() < 60:
                extra[name] = {"skipped": f"bench budget {budget:.0f}s exhausted"}
                continue
            r = run_workload(name, args, timeout_s=tmo(want))
            extra[name if name != "fib_device" else "fib_device_transcript"] = r
            if name == "fib_device" and isinstance(r, dict) and isinstance(
                r.get("ms"), (int, float)
            ):
                _set_headline(r["ms"])

    _emit_and_exit(0)


if __name__ == "__main__":
    main()
