"""Driver benchmark: end-to-end fibonacci proof generation on one chip.

Prints one JSON line: metric/value/unit/vs_baseline. Baseline: the
reference whitepaper's ~300 ms recursive-proof generation on a 2021
laptop (BASELINE.md); we report the e2e fibonacci prove wall time
against the same 300 ms yardstick. The remaining gap is transcript
round-trip latency over the remote TPU tunnel (each Fiat-Shamir
cap-observe/challenge pair is a device sync); a fully device-resident
challenger that fuses the FRI commit phase into one program is the
next step (round-3 backlog).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_tpu")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from plonky2_tpu.models.fibonacci import build_fibonacci

    data, pw = build_fibonacci(public_io=False)

    # warmup (compiles cached)
    proof = data.prove(pw)
    data.verify(proof)

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        proof = data.prove(pw)
    dt = (time.perf_counter() - t0) / runs

    baseline_s = 0.300  # whitepaper: recursive proof on 2021 laptop
    print(
        json.dumps(
            {
                "metric": "fibonacci_prove_wall_time",
                "value": round(dt * 1000.0, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_s / dt, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
