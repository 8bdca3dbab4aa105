"""Benchmark workloads, one per subprocess (invoked by bench.py).

Each workload prints one or more JSON lines to stdout; the LAST line is
the result the orchestrator records. Printing intermediate lines (e.g.
after the cold warmup) means a workload killed by its timeout still
reports whatever it finished — the orchestrator salvages partial stdout.

Run directly: ``python -m benches.driver_workloads <name> [args...]``.

Reference workloads these mirror: plonky2/examples/fibonacci.rs (e2e),
examples/bench_recursion.rs (recursive proof), starky 2^22 north star
(BASELINE.md), plonky2/benches/*.rs (kernels.py suite).
"""

from __future__ import annotations

import faulthandler
import json
import os
import signal
import sys
import time

# SIGUSR1 dumps every thread's Python stack to stderr — lets an operator
# see where a long cold prove is spending its time without killing it.
faulthandler.register(signal.SIGUSR1, all_threads=True)


_COMPILES = {"programs": 0, "compile_s": 0.0}


def _say(obj) -> None:
    if isinstance(obj, dict) and _COMPILES["programs"]:
        obj = {
            **obj,
            "xla_programs": _COMPILES["programs"],
            "xla_compile_s": round(_COMPILES["compile_s"], 1),
        }
    print(json.dumps(obj), flush=True)


def _init_jax():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "xla_cache",
        ),
    )
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # Program-count accounting: every record reports how many XLA
    # programs this workload compiled and the seconds spent compiling
    # (persistent-cache hits don't count — so this doubles as a cache
    # hit-rate probe in the driver environment).
    try:
        from jax._src import monitoring as _mon

        def _listen(event: str, dur: float, **_kw) -> None:
            if event.endswith("backend_compile_duration"):
                _COMPILES["programs"] += 1
                _COMPILES["compile_s"] += dur

        _mon.register_event_duration_secs_listener(_listen)
    except Exception:
        pass
    return jax


def _fib_circuit_cached():
    """Memoized build_fibonacci(public_io=False): the circuit is shared
    by the host- and device-transcript workloads, so the interpreted
    build (~40-90 s) is paid once ever and the slim pickle (committed,
    tools/bench_cache) restores it in ~1 s on a fresh checkout. Same
    slim/rehydrate mechanism as the recursive outer memo."""
    import gzip
    import pickle

    from plonky2_tpu.models.fibonacci import build_fibonacci
    from plonky2_tpu.plonk.generic_config import poseidon_goldilocks_config

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "bench_cache",
        "fib.pkl",
    )
    if os.path.exists(path):
        try:
            with gzip.open(path, "rb") as f:
                data, pw = pickle.load(f)
            _rehydrate_commitment(data, poseidon_goldilocks_config().hasher)
            return data, pw, "loaded from cache"
        except Exception as e:
            _say({"note": f"fib cache unusable ({type(e).__name__}); rebuilding"})
    data, pw = build_fibonacci(public_io=False)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        live_pb = _slim_commitment(data)
        try:
            with gzip.open(path, "wb", compresslevel=6) as f:
                pickle.dump((data, pw), f)
        finally:
            data.prover_only.constants_sigmas_commitment = live_pb
    except Exception:
        pass  # caching is best-effort
    return data, pw, "built (cache saved)"


def fib(device_transcript: bool) -> None:
    """End-to-end fibonacci prove (examples/fibonacci.rs). Headline."""
    os.environ["PLONKY2_TPU_DEVICE_TRANSCRIPT"] = "1" if device_transcript else "0"
    _init_jax()

    _say({"note": "building circuit"})
    t0 = time.perf_counter()
    data, pw, how = _fib_circuit_cached()
    build_s = time.perf_counter() - t0
    _say({"note": f"fib circuit {how}"})
    _say({"note": "built; cold prove starting", "build_s": round(build_s, 1)})
    t0 = time.perf_counter()
    proof = data.prove(pw)
    cold_s = time.perf_counter() - t0
    data.verify(proof)
    _say({"ms": cold_s * 1e3, "cold_s": round(cold_s, 1), "note": "cold only"})
    runs = 5
    t0 = time.perf_counter()
    for _ in range(runs):
        proof = data.prove(pw)
    warm_s = (time.perf_counter() - t0) / runs
    _say(
        {
            "ms": round(warm_s * 1e3, 3),
            "cold_s": round(cold_s, 1),
            "build_s": round(build_s, 1),
        }
    )


def recursive(inner_log2: int = 12) -> None:
    """The whitepaper headline workload: prove a circuit that verifies an
    inner 2^inner_log2-gate proof (~300 ms / 2021 MacBook Air yardstick,
    BASELINE.md); also reports compressed-proof size vs ~43 KB."""
    _init_jax()
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.models.bench_recursion import dummy_proof
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.compressed_proof import compress_proof
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.proof_target import (
        add_virtual_proof_with_pis,
        set_proof_with_pis_target,
    )
    from plonky2_tpu.plonk.recursive_verifier import (
        add_virtual_verifier_data,
        set_verifier_data_target,
        verify_proof_circuit,
    )
    from plonky2_tpu.utils.serialization import compressed_proof_to_bytes

    config = CircuitConfig.standard_recursion_config()
    _say({"note": "loading/proving inner", "phase": "inner"})
    t0 = time.perf_counter()
    inner_proof, inner_vd, inner_cd, how = _inner_proof_cached(config, inner_log2)
    _say(
        {
            "note": f"inner proof {how}",
            "inner_s": round(time.perf_counter() - t0, 1),
        }
    )
    t0 = time.perf_counter()
    data, pt, vd_t, how = _outer_circuit_cached(config, inner_cd, inner_log2)
    _say({"note": f"outer {how}; cold prove starting",
          "outer_build_s": round(time.perf_counter() - t0, 1)})
    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vd_t, inner_vd)
    t0 = time.perf_counter()
    pwp = data.prove(pw)
    cold_s = time.perf_counter() - t0
    data.verify(pwp)
    base = {
        "metric": f"recursive_proof_over_2^{inner_log2}_inner",
        "unit": "ms",
        "outer_degree_bits": data.common.degree_bits,
        "cold_s": round(cold_s, 1),
    }
    _say({**base, "value": round(cold_s * 1e3, 1), "note": "cold only"})
    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        pwp = data.prove(pw)
    dt = (time.perf_counter() - t0) / runs
    compressed = compress_proof(pwp, data.verifier_only, data.common)
    size = len(compressed_proof_to_bytes(compressed, data.common))
    _say(
        {
            **base,
            "value": round(dt * 1e3, 1),
            "vs_whitepaper_300ms": round(0.300 / dt, 2),
            "compressed_proof_bytes": size,
            "vs_whitepaper_43KB": round(43_000 / size, 2),
        }
    )


def _inner_proof_cached(config, inner_log2: int):
    """The recursive workload measures the OUTER prove (the whitepaper's
    ~300 ms number); the inner proof is setup. It is fully deterministic
    (exact arithmetic, smallest-witness PoW grind), so its bytes are
    pinned in-repo (tests/golden/) and loaded — and host-verified —
    instead of re-proving a 2^12-gate circuit inside the bench slot.
    Absent or stale golden bytes regenerate and save transparently."""
    import hashlib

    from plonky2_tpu.models.bench_recursion import dummy_proof
    from plonky2_tpu.plonk.verifier import verify
    from plonky2_tpu.utils.serialization import (
        common_data_to_bytes,
        common_data_from_bytes,
        proof_to_bytes,
        proof_from_bytes,
        verifier_data_to_bytes,
        verifier_data_from_bytes,
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden",
        f"bench_inner_2^{inner_log2}.bin",
    )
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                blob = f.read()
            parts = []
            pos = 0
            for _ in range(3):
                ln = int.from_bytes(blob[pos : pos + 8], "little")
                pos += 8
                parts.append(blob[pos : pos + ln])
                pos += ln
            cd = common_data_from_bytes(parts[0])
            vd, _cd2 = verifier_data_from_bytes(parts[1])
            pwp = proof_from_bytes(parts[2], cd)
            verify(pwp, vd, cd)  # integrity gate before trusting the blob
            return pwp, vd, cd, "loaded from golden"
        except Exception as e:  # stale/corrupt golden: regenerate below
            _say({"note": f"golden inner unusable ({type(e).__name__}); reproving"})
    pwp, vd, cd = dummy_proof(config, inner_log2)
    try:
        parts = [
            common_data_to_bytes(cd),
            verifier_data_to_bytes(vd, cd),
            proof_to_bytes(pwp, cd),
        ]
        with open(path, "wb") as f:
            for p in parts:
                f.write(len(p).to_bytes(8, "little"))
                f.write(p)
    except Exception:
        pass  # saving the golden is best-effort
    return pwp, vd, cd, "proved (golden saved)"


_SLIM_PB_TAG = "slim_pb_v1"


def _slim_commitment(data):
    """Swap the constants/sigmas PolynomialBatch for a host-only stub
    carrying just the coefficient planes. The LDE + Merkle tree are ~90%
    of the pickle's bytes and are a pure device recomputation from the
    coefficients (the same jitted programs the prover uses, so a warm
    XLA cache makes rehydration a ~1 s dispatch). Returns the original
    batch so the caller can restore the live object after pickling."""
    import numpy as np

    pb = data.prover_only.constants_sigmas_commitment
    lo, hi = pb.polynomials
    data.prover_only.constants_sigmas_commitment = (
        _SLIM_PB_TAG,
        np.asarray(lo),
        np.asarray(hi),
        pb.rate_bits,
        pb.blinding,
        pb.n_polys,
        pb.merkle_tree.cap_height,
    )
    return pb


def _rehydrate_commitment(data, hasher) -> None:
    """Inverse of _slim_commitment: rebuild the PolynomialBatch from the
    pickled coefficient planes (no-op on old-format fat pickles)."""
    stub = data.prover_only.constants_sigmas_commitment
    if not (isinstance(stub, tuple) and stub and stub[0] == _SLIM_PB_TAG):
        return
    import jax.numpy as jnp

    from plonky2_tpu.fri.oracle import PolynomialBatch

    _, lo, hi, rate_bits, blinding, n_polys, cap_height = stub
    data.prover_only.constants_sigmas_commitment = PolynomialBatch.from_coeffs(
        (jnp.asarray(lo), jnp.asarray(hi)),
        rate_bits,
        blinding,
        cap_height,
        hasher=hasher,
        num_polys=n_polys,
    )


def _outer_circuit_cached(config, inner_cd, inner_log2: int):
    """The outer (recursive-verifier) circuit is a pure function of the
    inner common data, but its Python gadget construction costs minutes
    (~245 s of interpreted CircuitBuilder calls for a 2^12 inner) — far
    over any bench slot. The built CircuitData is pickled to an in-repo
    cache (tools/bench_cache, committed: the slim gzip form is ~6 MB vs
    the 70 MB fat pickle; pickle loads in ~1 s while the reference wire
    format's Python decoder costs ~137 s — the wire format stays the
    *interchange* format, tested separately; this cache is a memo).
    Rebuilt transparently when absent or stale. The witness targets
    (proof + verifier-data) are reconstructed by replaying the virtual-
    target allocations on a throwaway builder — allocation order is
    deterministic and independent of the gadget graph."""
    import gzip
    import pickle

    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.generic_config import poseidon_goldilocks_config
    from plonky2_tpu.plonk.proof_target import add_virtual_proof_with_pis
    from plonky2_tpu.plonk.recursive_verifier import (
        add_virtual_verifier_data,
        verify_proof_circuit,
    )

    cap_height = inner_cd.fri_params.config.cap_height
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "bench_cache",
        f"outer_2^{inner_log2}.pkl",
    )

    def alloc_targets():
        tb = CircuitBuilder(config)
        pt = add_virtual_proof_with_pis(tb, inner_cd)
        vd_t = add_virtual_verifier_data(tb, cap_height)
        return pt, vd_t

    def _open_maybe_gzip(p):
        with open(p, "rb") as f:
            magic = f.read(2)
        return gzip.open(p, "rb") if magic == b"\x1f\x8b" else open(p, "rb")

    if os.path.exists(path):
        try:
            with _open_maybe_gzip(path) as f:
                data = pickle.load(f)
            _rehydrate_commitment(data, poseidon_goldilocks_config().hasher)
            pt, vd_t = alloc_targets()
            return data, pt, vd_t, "loaded from cache"
        except Exception as e:
            _say({"note": f"outer cache unusable ({type(e).__name__}); rebuilding"})
    b = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(b, inner_cd)
    vd_t = add_virtual_verifier_data(b, cap_height)
    verify_proof_circuit(b, pt, vd_t, inner_cd)
    data = b.build()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        live_pb = _slim_commitment(data)
        try:
            with gzip.open(path, "wb", compresslevel=6) as f:
                pickle.dump(data, f)
        finally:
            data.prover_only.constants_sigmas_commitment = live_pb
    except Exception:
        pass  # caching is best-effort
    return data, pt, vd_t, "built (cache saved)"


def stark(log2_rows: int = 22) -> None:
    """FibonacciStark ladder up to 2^log2_rows rows (BASELINE north
    star). Smaller sizes prove first so the slot ALWAYS records a
    complete number (measured v5e: 2^22 cold 799 s / warm 261 s — far
    over any driver slot; r4 recorded nothing for this workload)."""
    _init_jax()
    from plonky2_tpu.stark.config import StarkConfig
    from plonky2_tpu.stark.fixtures import FibonacciStark, fibonacci_res
    from plonky2_tpu.stark.prover import prove as sprove
    from plonky2_tpu.stark.verifier import verify_stark_proof

    config = StarkConfig.standard_fast_config()
    sizes = [k for k in (log2_rows - 2, log2_rows) if k > 6]
    for k in sizes:
        n = 1 << k
        st = FibonacciStark(n)
        t0 = time.perf_counter()
        trace = st.generate_trace(0, 1)
        trace_s = time.perf_counter() - t0
        pis = [0, 1, fibonacci_res(n, 0, 1)]
        base = {"metric": f"fibonacci_stark_2^{k}_rows", "unit": "ms"}
        _say({**base, "note": "trace generated; cold prove starting",
              "trace_gen_s": round(trace_s, 1)})
        t0 = time.perf_counter()
        proof = sprove(st, config, trace, pis)
        cold_s = time.perf_counter() - t0
        _say({**base, "value": round(cold_s * 1e3, 1), "note": "cold only"})
        t0 = time.perf_counter()
        proof = sprove(st, config, trace, pis)
        dt = time.perf_counter() - t0
        verify_stark_proof(st, proof, config, k)
        _say(
            {
                **base,
                "value": round(dt * 1e3, 1),
                "cold_s": round(cold_s, 1),
                "trace_gen_s": round(trace_s, 1),
                **_device_memory(),
            }
        )


def _device_memory() -> dict:
    """Per-device peak HBM use (BASELINE north star asks the 2^22 STARK
    to report the memory the domain-sharded path relieves)."""
    try:
        import jax

        stats = [d.memory_stats() or {} for d in jax.devices()]
        return {
            "peak_hbm_bytes_per_device": [
                int(s.get("peak_bytes_in_use", 0)) for s in stats
            ]
        }
    except Exception:
        return {}


def large(log2_size: int = 16) -> None:
    """Prove a 2^log2_size-gate circuit — the size class where device
    throughput, not dispatch latency, dominates."""
    _init_jax()
    from plonky2_tpu.gates.basic import NoopGate
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.prover import prove

    config = CircuitConfig.standard_recursion_config()
    _say({"note": f"building 2^{log2_size}-gate circuit"})
    t0 = time.perf_counter()
    b = CircuitBuilder(config)
    for _ in range((1 << (log2_size - 1)) + 1):
        b.add_gate(NoopGate(), [])
    data = b.build()
    build_s = time.perf_counter() - t0
    base = {
        "metric": f"plonk_prove_2^{log2_size}_gates",
        "unit": "ms",
        "build_s": round(build_s, 1),
        "degree_bits": data.common.degree_bits,
    }
    _say({**base, "note": "built"})
    t0 = time.perf_counter()
    pwp = prove(data.prover_only, data.common, PartialWitness())
    cold_s = time.perf_counter() - t0
    data.verify(pwp)
    _say({**base, "value": round(cold_s * 1e3, 1), "note": "cold only"})
    t0 = time.perf_counter()
    prove(data.prover_only, data.common, PartialWitness())
    dt = time.perf_counter() - t0
    _say({**base, "value": round(dt * 1e3, 1), "cold_s": round(cold_s, 1)})


def kernels() -> None:
    """The benches/kernels.py SoL suite; prints each kernel's record as it
    completes (partial results survive a timeout), then the full list."""
    _init_jax()
    from benches.kernels import (
        bench_fri_fold,
        bench_lde_commit,
        bench_merkle,
        bench_ntt,
        bench_poseidon,
    )

    results = []
    for part in (
        lambda: bench_ntt((16, 20), batch=1),
        lambda: bench_ntt((16,), batch=64),
        lambda: bench_poseidon(20),
        lambda: bench_merkle(20, 135),
        lambda: bench_fri_fold(22, 4),
        lambda: bench_lde_commit(16, 143, 3),
        # slowest compile LAST so a slot timeout salvages everything
        # above (BENCH_r04 lost the merkle/fold/commit records to it)
        lambda: bench_ntt((24,), batch=1),
    ):
        results += part()
        _say(results)


WORKLOADS = {
    "fib_host": lambda args: fib(False),
    "fib_device": lambda args: fib(True),
    "recursive": lambda args: recursive(int(args[0]) if args else 12),
    "stark": lambda args: stark(int(args[0]) if args else 22),
    "large": lambda args: large(int(args[0]) if args else 16),
    "kernels": lambda args: kernels(),
}


if __name__ == "__main__":
    name = sys.argv[1]
    WORKLOADS[name](sys.argv[2:])
