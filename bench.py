"""Driver benchmark.

Prints ONE JSON line: metric/value/unit/vs_baseline (headline = e2e
fibonacci proof wall time vs the reference whitepaper's ~300 ms
recursive-proof yardstick, BASELINE.md), with the full benchmark suite
attached under "extra":

* large_circuit_2^16: prove a 2^16-gate circuit (the size class where
  TPU throughput, not dispatch latency, dominates)
* stark_2^22: FibonacciStark over a 2^22-row trace (BASELINE north-star
  size class)
* kernels: the benches/kernels.py suite — NTT 2^16/2^20/2^24, Poseidon
  perms/s, Merkle 2^20x135, FRI fold 2^22, oracle commit — each with a
  speed-of-light model and %SoL (reference plonky2/benches/*.rs).

BENCH_FAST=1 runs only the headline metric.
"""

import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_tpu")


def _bench_fibonacci():
    from plonky2_tpu.models.fibonacci import build_fibonacci

    data, pw = build_fibonacci(public_io=False)
    proof = data.prove(pw)  # warmup (compiles cached)
    data.verify(proof)
    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        proof = data.prove(pw)
    return (time.perf_counter() - t0) / runs


def _bench_large_circuit(log2_size: int = 16):
    from plonky2_tpu.gates.basic import NoopGate
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.prover import prove

    config = CircuitConfig.standard_recursion_config()
    t_build0 = time.perf_counter()
    b = CircuitBuilder(config)
    for _ in range((1 << (log2_size - 1)) + 1):
        b.add_gate(NoopGate(), [])
    data = b.build()
    build_s = time.perf_counter() - t_build0
    data.verify(prove(data.prover_only, data.common, PartialWitness()))  # warmup
    t0 = time.perf_counter()
    pwp = prove(data.prover_only, data.common, PartialWitness())
    dt = time.perf_counter() - t0
    return {
        "metric": f"plonk_prove_2^{log2_size}_gates",
        "value": round(dt * 1e3, 1),
        "unit": "ms",
        "build_s": round(build_s, 1),
        "degree_bits": data.common.degree_bits,
    }


def _bench_recursive_proof(inner_log2: int = 12):
    """The whitepaper's headline: '~300 ms to generate a recursive proof
    on a 2021 MacBook Air' (BASELINE.md). Times the prove() of a circuit
    that verifies an inner 2^inner_log2-gate proof; also reports the
    compressed-proof size vs the ~43 KB yardstick."""
    from plonky2_tpu.models.bench_recursion import dummy_proof, recursive_proof
    from plonky2_tpu.plonk.compressed_proof import compress_proof
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.prover import prove
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.proof_target import (
        add_virtual_proof_with_pis,
        set_proof_with_pis_target,
    )
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.recursive_verifier import (
        add_virtual_verifier_data,
        set_verifier_data_target,
        verify_proof_circuit,
    )

    config = CircuitConfig.standard_recursion_config()
    inner = dummy_proof(config, inner_log2)
    inner_proof, inner_vd, inner_cd = inner
    b = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(b, inner_cd)
    vd_t = add_virtual_verifier_data(b, inner_cd.fri_params.config.cap_height)
    verify_proof_circuit(b, pt, vd_t, inner_cd)
    data = b.build()
    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vd_t, inner_vd)
    pwp = data.prove(pw)  # warmup (compiles cached)
    data.verify(pwp)
    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        pwp = data.prove(pw)
    dt = (time.perf_counter() - t0) / runs
    compressed = compress_proof(pwp, data.verifier_only, data.common)
    from plonky2_tpu.utils.serialization import compressed_proof_to_bytes

    size = len(compressed_proof_to_bytes(compressed, data.common))
    return {
        "metric": f"recursive_proof_over_2^{inner_log2}_inner",
        "value": round(dt * 1e3, 1),
        "unit": "ms",
        "vs_whitepaper_300ms": round(0.300 / dt, 2),
        "outer_degree_bits": data.common.degree_bits,
        "compressed_proof_bytes": size,
        "vs_whitepaper_43KB": round(43_000 / size, 2),
    }


def _bench_stark(log2_rows: int = 22):
    from plonky2_tpu.stark.config import StarkConfig
    from plonky2_tpu.stark.fixtures import FibonacciStark, fibonacci_res
    from plonky2_tpu.stark.prover import prove as sprove
    from plonky2_tpu.stark.verifier import verify_stark_proof

    n = 1 << log2_rows
    stark = FibonacciStark(n)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(0, 1)
    pis = [0, 1, fibonacci_res(n, 0, 1)]
    proof = sprove(stark, config, trace, pis)  # warmup
    t0 = time.perf_counter()
    proof = sprove(stark, config, trace, pis)
    dt = time.perf_counter() - t0
    verify_stark_proof(stark, proof, config, log2_rows)
    return {
        "metric": f"fibonacci_stark_2^{log2_rows}_rows",
        "value": round(dt * 1e3, 1),
        "unit": "ms",
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    profile_dir = os.environ.get("BENCH_PROFILE")
    try:
        if profile_dir:
            from plonky2_tpu.utils.profiling import trace

            with trace(profile_dir):
                dt = _bench_fibonacci()
            print(f"profiler trace written to {profile_dir}", file=sys.stderr)
        else:
            dt = _bench_fibonacci()
    except Exception:
        traceback.print_exc(file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "fibonacci_prove_wall_time",
                    "value": -1,
                    "unit": "ms",
                    "vs_baseline": 0,
                    "extra": {"error": traceback.format_exc(limit=2).splitlines()[-1]},
                }
            )
        )
        return
    baseline_s = 0.300  # whitepaper: recursive proof on 2021 laptop

    extra = {}
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2700"))
    if not os.environ.get("BENCH_FAST"):
        large_log2 = int(os.environ.get("BENCH_LARGE_LOG2", "16"))
        stark_log2 = int(os.environ.get("BENCH_STARK_LOG2", "22"))

        def _kernels():
            from benches.kernels import run_kernel_suite

            return run_kernel_suite()

        for name, fn in (
            ("recursive_proof", _bench_recursive_proof),
            ("kernels", _kernels),
            ("stark", lambda: _bench_stark(stark_log2)),
            ("large_circuit", lambda: _bench_large_circuit(large_log2)),
        ):
            if time.perf_counter() - t_start > budget_s:
                extra[name] = {"skipped": f"bench budget {budget_s}s exhausted"}
                continue
            try:
                extra[name] = fn()
            except Exception:
                extra[name] = {"error": traceback.format_exc(limit=3).splitlines()[-1]}
                traceback.print_exc(file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "fibonacci_prove_wall_time",
                "value": round(dt * 1000.0, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_s / dt, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
