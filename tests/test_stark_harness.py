"""STARK testing harness over the fixtures (reference:
starky/src/stark_testing.rs + per-fixture tests)."""

import pytest

from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fixtures import (
    FibonacciStark,
    PermutationStark,
    UnconstrainedStark,
)
from plonky2_tpu.stark.stark_testing import (
    test_stark_algebra_consistency as check_algebra,
    test_stark_low_degree as check_low_degree,
)

STARKS = [FibonacciStark(1 << 5), PermutationStark(1 << 5), UnconstrainedStark(1 << 5)]


@pytest.mark.parametrize("stark", STARKS, ids=lambda s: type(s).__name__)
def test_low_degree(stark):
    check_low_degree(stark)


@pytest.mark.parametrize("stark", STARKS, ids=lambda s: type(s).__name__)
def test_algebra_consistency(stark):
    check_algebra(stark)


def test_unconstrained_stark_proves():
    from plonky2_tpu.stark.prover import prove
    from plonky2_tpu.stark.verifier import verify_stark_proof

    stark = UnconstrainedStark(1 << 5)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(7)
    pwp = prove(stark, config, trace, [])
    verify_stark_proof(stark, pwp, config, 5)
