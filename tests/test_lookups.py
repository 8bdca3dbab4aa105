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


def test_lookup_circuit_recursive_verification():
    """A lookup circuit's proof verified in-circuit (reference:
    plonky2/src/lookup_test.rs recursion cases): lookup selectors, RE/SLDC
    openings and the in-circuit LUT polynomial evaluation all engage."""
    from plonky2_tpu.hash import poseidon as hp
    from plonky2_tpu.iop.generator import generate_partial_witness
    from plonky2_tpu.plonk.proof_target import (
        add_virtual_proof_with_pis,
        set_proof_with_pis_target,
    )
    from plonky2_tpu.plonk.recursive_verifier import (
        add_virtual_verifier_data,
        set_verifier_data_target,
        verify_proof_circuit,
    )
    from plonky2_tpu.plonk.witness_check import check_witness

    inputs = [0, 3, 5]
    data, pw_inner = _build(inputs)
    pwp = prove(data.prover_only, data.common, pw_inner)
    verify(pwp, data.verifier_only, data.common)

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_proof_with_pis(b, data.common)
    vd_t = add_virtual_verifier_data(b, data.common.fri_params.config.cap_height)
    verify_proof_circuit(b, pt, vd_t, data.common)
    outer = b.build(commit=False)

    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, pwp)
    set_verifier_data_target(pw, vd_t, data.verifier_only)
    witness = generate_partial_witness(pw, outer.prover_only, outer.common)
    check_witness(outer, witness.full_witness(), hp.hash_no_pad([]))


def test_partition_witness_bulk_ops():
    """set_wires_bulk/get_wires_bulk match the scalar set/get semantics
    (used by the vectorized set_lookup_wires)."""
    import numpy as np

    from plonky2_tpu.iop.target import Target
    from plonky2_tpu.iop.witness import PartitionWitness

    num_wires, degree = 4, 8
    # identity representative map (no copy constraints) + 2 virtual slots
    rep = list(range(num_wires * degree + 2))
    pw = PartitionWitness(rep, num_wires, degree)
    rows = np.array([0, 1, 2, 3])
    cols = np.array([1, 1, 2, 3])
    vals = [5, gl.P + 7, 0, 123]  # one value above P: must canonicalize
    pw.set_wires_bulk(rows, cols, vals)
    assert pw.get_target(Target.wire(1, 1)) == 7
    flat = rows * num_wires + cols
    got = pw.get_wires_bulk(flat)
    assert got.tolist() == [5, 7, 0, 123]
    # re-setting the same value is fine; a different value asserts
    pw.set_wires_bulk(rows[:1], cols[:1], [5])
    with pytest.raises(AssertionError):
        pw.set_wires_bulk(rows[:1], cols[:1], [6])
    # unset target rejected by the bulk getter
    with pytest.raises(AssertionError):
        pw.get_wires_bulk(np.array([0]))
