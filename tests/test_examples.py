"""Example-circuit e2e tests (reference: plonky2/examples/*)."""

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
