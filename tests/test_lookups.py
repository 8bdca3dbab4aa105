"""Lookup argument e2e (reference: plonky2/src/lookup_test.rs)."""

import pytest

from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.verifier import VerificationError, verify

SMALLER_TABLE = [2, 24, 56, 100, 128, 16, 20, 49]


def _build(inputs):
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    inps = list(range(len(SMALLER_TABLE)))
    lut_index = b.add_lookup_table_from_table(inps, SMALLER_TABLE)
    in_ts = []
    out_ts = []
    for _ in inputs:
        t = b.add_virtual_target()
        in_ts.append(t)
        out_ts.append(b.add_lookup_from_index(t, lut_index))
    b.register_public_inputs(in_ts)
    b.register_public_inputs(out_ts)
    data = b.build()
    pw = PartialWitness()
    for t, v in zip(in_ts, inputs):
        pw.set_target(t, v)
    return data, pw


def test_lookup_e2e():
    inputs = [0, 3, 3, 7, 1]
    data, pw = _build(inputs)
    pwp = prove(data.prover_only, data.common, pw)
    assert pwp.public_inputs[len(inputs):] == [SMALLER_TABLE[i] for i in inputs]
    verify(pwp, data.verifier_only, data.common)


def test_lookup_rejects_tampered_output():
    inputs = [0, 3]
    data, pw = _build(inputs)
    pwp = prove(data.prover_only, data.common, pw)
    import copy

    bad = copy.deepcopy(pwp)
    bad.public_inputs[-1] = (bad.public_inputs[-1] + 1) % gl.P
    with pytest.raises(Exception):
        verify(bad, data.verifier_only, data.common)
