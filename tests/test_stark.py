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
