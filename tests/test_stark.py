"""STARK e2e tests (reference: starky/src/fibonacci_stark.rs tests,
stark_testing.rs)."""

import pytest

from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fixtures import FibonacciStark, fibonacci_res
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.verifier import StarkVerificationError, verify_stark_proof


def test_fibonacci_stark_e2e():
    num_rows = 1 << 5
    stark = FibonacciStark(num_rows)
    config = StarkConfig.standard_fast_config()
    x0, x1 = 0, 1
    trace = stark.generate_trace(x0, x1)
    pis = [x0, x1, fibonacci_res(num_rows, x0, x1)]
    pwp = prove(stark, config, trace, pis)
    verify_stark_proof(stark, pwp, config, degree_bits=5)


def _normalize(x):
    """Recursively convert a proof dataclass to nested plain tuples so two
    proofs can be compared exactly (numpy arrays -> int tuples)."""
    import dataclasses

    import numpy as np

    if dataclasses.is_dataclass(x):
        return tuple(
            _normalize(getattr(x, f.name)) for f in dataclasses.fields(x)
        )
    if isinstance(x, np.ndarray):
        return tuple(int(v) for v in x.reshape(-1))
    if isinstance(x, (list, tuple)):
        return tuple(_normalize(v) for v in x)
    return x


def test_fibonacci_stark_mesh_prove_bit_identical():
    """starky under the mesh: the STARK prover inherits the mesh-aware
    oracles (the reference rayon-parallelizes starky/src/prover.rs:371-460
    the same way it does plonk); the sharded proof must equal the
    single-chip proof exactly."""
    import jax

    from plonky2_tpu.parallel import context as pctx

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (see conftest)")
    num_rows = 1 << 6
    stark = FibonacciStark(num_rows)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(0, 1)
    pis = [0, 1, fibonacci_res(num_rows, 0, 1)]
    want = prove(stark, config, trace, pis)
    with pctx.prover_mesh(pctx.make_prover_mesh(8)):
        got = prove(stark, config, trace, pis)
    verify_stark_proof(stark, got, config, degree_bits=6)
    assert _normalize(got) == _normalize(want)


def test_fibonacci_stark_rejects_wrong_result():
    num_rows = 1 << 5
    stark = FibonacciStark(num_rows)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(0, 1)
    pis = [0, 1, fibonacci_res(num_rows, 0, 1)]
    pwp = prove(stark, config, trace, pis)
    pwp.public_inputs[2] = (pwp.public_inputs[2] + 1) % (2**64 - 2**32 + 1)
    with pytest.raises(StarkVerificationError):
        verify_stark_proof(stark, pwp, config, degree_bits=5)


@pytest.mark.slow
def test_fibonacci_stark_2_22_mesh_prove():
    """BASELINE north star at test scale: a 2^22-row FibonacciStark
    proven under the 8-device mesh — the domain-sharded trace commit /
    quotient path at a size where sharding is load-bearing — then
    verified, with per-device peak memory recorded (on the CPU backend
    memory_stats may be unavailable; the TPU counterpart is the
    driver bench's `stark` workload, benches/driver_workloads.py)."""
    import jax

    from plonky2_tpu.parallel import context as pctx

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (see conftest)")
    log2_rows = 22
    num_rows = 1 << log2_rows
    stark = FibonacciStark(num_rows)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(0, 1)
    pis = [0, 1, fibonacci_res(num_rows, 0, 1)]
    with pctx.prover_mesh(pctx.make_prover_mesh(8)):
        pwp = prove(stark, config, trace, pis)
    verify_stark_proof(stark, pwp, config, degree_bits=log2_rows)
    peaks = [
        (d.memory_stats() or {}).get("peak_bytes_in_use") for d in jax.devices()
    ]
    print(f"per-device peak bytes: {peaks}")
