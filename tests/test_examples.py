"""Example-circuit e2e tests (reference: plonky2/examples/*)."""

import pytest
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.models.examples import (
    build_factorial,
    build_range_check,
    build_square_root,
)
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.verifier import verify


def test_factorial():
    data, pw = build_factorial(100)
    pwp = prove(data.prover_only, data.common, pw)
    expect = 1
    for i in range(2, 101):
        expect = gl.gmul(expect, i)
    assert pwp.public_inputs[1] == expect
    verify(pwp, data.verifier_only, data.common)


def test_range_check():
    data, pw = build_range_check(42, 6)
    pwp = prove(data.prover_only, data.common, pw)
    assert pwp.public_inputs[0] == 42
    verify(pwp, data.verifier_only, data.common)


def test_square_root():
    data, pw, x_squared = build_square_root()
    pwp = prove(data.prover_only, data.common, pw)
    assert pwp.public_inputs[0] == x_squared
    verify(pwp, data.verifier_only, data.common)


@pytest.mark.slow
def test_bench_recursion_chain():
    """dummy inner -> two shrinking recursions -> serialization/compression
    (reference: examples/bench_recursion.rs)."""
    from plonky2_tpu.models.bench_recursion import benchmark
    from plonky2_tpu.plonk.config import CircuitConfig

    outer, info = benchmark(
        CircuitConfig.standard_recursion_config(), 4, verbose=False
    )
    assert info["proof_bytes"] > 0 and info["common_data_bytes"] > 0


def test_fibonacci_serialization(tmp_path):
    """Persist proof + circuit artifacts to disk, reload, verify
    (reference: examples/fibonacci_serialization.rs)."""
    from plonky2_tpu.models.examples import fibonacci_serialization

    paths = fibonacci_serialization(str(tmp_path))
    import os

    for p in paths.values():
        assert os.path.getsize(p) > 0
