"""Native witness-generation engine: bit-equality against the pure-Python
fixpoint (the reference semantics, plonky2/src/iop/generator.rs:26-104).

The native engine (iop/witgen_native.py + native/witgen.c) traces each
generator's run_once into field-op bytecode and runs the worklist
fixpoint in C. These tests pin the full witness bit-equal across a
corpus that exercises every hand encoder and the pooled tracer."""

import os

import numpy as np
import pytest

from plonky2_tpu.iop import witgen_native as wn
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

pytestmark = pytest.mark.skipif(
    not wn._load(), reason="no C compiler / witgen.so unavailable"
)


def _both_witnesses(data, pw):
    """(python witness, native witness) for the same inputs."""
    old = os.environ.get("PLONKY2_TPU_NATIVE_WITGEN")
    os.environ["PLONKY2_TPU_NATIVE_WITGEN"] = "0"
    try:
        w_py = generate_partial_witness(pw, data.prover_only, data.common)
    finally:
        os.environ["PLONKY2_TPU_NATIVE_WITGEN"] = "1"
    try:
        w_nat = wn.generate_partial_witness_native(pw, data.prover_only, data.common)
    finally:
        if old is None:
            os.environ.pop("PLONKY2_TPU_NATIVE_WITGEN", None)
        else:
            os.environ["PLONKY2_TPU_NATIVE_WITGEN"] = old
    assert w_nat is not None
    return w_py, w_nat


def _assert_bit_equal(w_py, w_nat):
    py_vals = w_py.values_snapshot()
    nat_vals = w_nat.values_snapshot()
    assert np.array_equal(py_vals, nat_vals)
    py_set = np.fromiter(
        (v is not None for v in w_py.values), bool, count=len(w_py.values)
    )
    assert np.array_equal(py_set, w_nat.flags.astype(bool))
    assert np.array_equal(
        w_py.full_witness().wire_values, w_nat.full_witness().wire_values
    )


def test_fibonacci_bit_equal():
    from plonky2_tpu.models.fibonacci import build_fibonacci

    data, pw = build_fibonacci(public_io=True)
    w_py, w_nat = _both_witnesses(data, pw)
    _assert_bit_equal(w_py, w_nat)
    stats = data.prover_only._witgen_enc.stats
    # fibonacci is arithmetic + poseidon (public-input hash): fully native
    assert stats["python_gens"] == 0, stats["fallback_types"]


def test_gadget_soup_bit_equal():
    """One circuit through every interesting generator: arithmetic,
    extension mul/inverse, exponentiation (witness exponent), random
    access (PICK), base splits, is_equal (InvOrZero), select, hashing
    (PoseidonGenerator), coset interpolation."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.register_public_input(b.mul(b.add(x, y), b.sub(x, y)))
    b.register_public_input(b.inverse(x))
    eq = b.is_equal(x, y)
    b.register_public_input(eq.target)
    bits = b.split_le(x, 40)
    lst = [b.add_virtual_target() for _ in range(8)]
    idx = b.add_virtual_target()
    b.register_public_input(b.random_access(idx, lst))
    b.register_public_input(b.exp(x, idx, 3))
    b.register_public_input(b.exp_u64(y, 0x12345))
    sel = b.select(eq, x, y)
    b.register_public_input(sel)
    h = b.hash_n_to_hash_no_pad([x, y, sel, lst[0], lst[7]])
    for t in h:
        b.register_public_input(t)
    # extension algebra: inverse_extension adds ExtInverseGenerator
    from plonky2_tpu.iop.target import ExtensionTarget

    ex = ExtensionTarget((x, y))
    einv = b.inverse_extension(ex)
    for t in einv.parts:
        b.register_public_input(t)
    # coset interpolation (InterpolationGenerator)
    from plonky2_tpu.gates.interpolation import CosetInterpolationGate

    gate = CosetInterpolationGate(2, 6)
    vals = [ExtensionTarget((lst[2 * i], lst[2 * i + 1])) for i in range(4)]
    ev = b.interpolate_coset(gate, b.one(), vals, ex)
    for t in ev.parts:
        b.register_public_input(t)
    data = b.build()

    pw = PartialWitness()
    pw.set_target(x, 123456789)
    pw.set_target(y, 987654321)
    pw.set_target(idx, 5)
    for i, t in enumerate(lst):
        pw.set_target(t, 1000 + i)
    w_py, w_nat = _both_witnesses(data, pw)
    _assert_bit_equal(w_py, w_nat)
    stats = data.prover_only._witgen_enc.stats
    assert stats["python_gens"] == 0, stats["fallback_types"]


def test_lookup_circuit_bit_equal():
    table = [2, 24, 56, 100, 128, 16, 20, 49]
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    lut_index = b.add_lookup_table_from_table(list(range(len(table))), table)
    in_ts = [b.add_virtual_target() for _ in range(5)]
    for t in in_ts:
        b.register_public_input(b.add_lookup_from_index(t, lut_index))
    data = b.build()
    pw = PartialWitness()
    for t, v in zip(in_ts, [0, 3, 3, 7, 1]):
        pw.set_target(t, v)
    w_py, w_nat = _both_witnesses(data, pw)
    _assert_bit_equal(w_py, w_nat)
    stats = data.prover_only._witgen_enc.stats
    assert stats["python_gens"] == 0, stats["fallback_types"]


def test_prove_bit_equal_proof():
    """Same proof bytes with witness generation in C vs Python (the
    prover is deterministic without zk)."""
    from plonky2_tpu.models.fibonacci import build_fibonacci
    from plonky2_tpu.plonk.prover import prove
    from plonky2_tpu.utils.serialization import proof_to_bytes

    data, pw = build_fibonacci(public_io=False)
    old = os.environ.get("PLONKY2_TPU_NATIVE_WITGEN")
    try:
        os.environ["PLONKY2_TPU_NATIVE_WITGEN"] = "0"
        p_py = prove(data.prover_only, data.common, pw)
        os.environ["PLONKY2_TPU_NATIVE_WITGEN"] = "1"
        p_nat = prove(data.prover_only, data.common, pw)
    finally:
        if old is None:
            os.environ.pop("PLONKY2_TPU_NATIVE_WITGEN", None)
        else:
            os.environ["PLONKY2_TPU_NATIVE_WITGEN"] = old
    data.verify(p_nat)
    assert proof_to_bytes(p_py, data.common) == proof_to_bytes(p_nat, data.common)


def test_conflict_detection():
    """A contradictory input assignment raises, as in the Python path."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.connect(x, y)
    b.register_public_input(x)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 1)
    pw.set_target(y, 2)
    old = os.environ.get("PLONKY2_TPU_NATIVE_WITGEN")
    os.environ["PLONKY2_TPU_NATIVE_WITGEN"] = "1"
    try:
        with pytest.raises(AssertionError):
            wn.generate_partial_witness_native(pw, data.prover_only, data.common)
    finally:
        if old is None:
            os.environ.pop("PLONKY2_TPU_NATIVE_WITGEN", None)
        else:
            os.environ["PLONKY2_TPU_NATIVE_WITGEN"] = old
