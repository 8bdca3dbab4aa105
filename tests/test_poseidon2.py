"""Poseidon2 e2e: hash/permutation self-consistency and a proven circuit
containing a Poseidon2Gate whose outputs match the host permutation
(reference: plonky2/src/hash/poseidon2.rs, gates/poseidon2.rs)."""

import numpy as np

from plonky2_tpu.gates.poseidon2 import Poseidon2Gate
from plonky2_tpu.hash import poseidon2 as p2
from plonky2_tpu.iop.target import Target
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.ops import gf
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.verifier import verify


def test_permutation_device_matches_host():
    batch = np.arange(24, dtype=np.uint64).reshape(2, 12)
    lo, hi = p2.permute_batch(gf.from_u64(batch))
    dev = gf.to_u64((lo, hi))
    for row_in, row_dev in zip(batch, dev):
        assert list(map(int, row_dev)) == p2.permute(list(map(int, row_in)))


def test_sponge_properties():
    assert p2.hash_no_pad([1, 2, 3]) != p2.hash_no_pad([1, 2, 3, 0])
    assert p2.hash_leaf([5]) != p2.hash_no_pad([5])
    h1, h2 = p2.hash_no_pad([1]), p2.hash_no_pad([2])
    assert p2.two_to_one(h1, h2) == p2.hash_no_pad(list(h1) + list(h2))


def test_poseidon2_gate_in_circuit_proves():
    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    inputs = [b.add_virtual_target() for _ in range(12)]
    row = b.add_gate(Poseidon2Gate(), [])
    for i, t in enumerate(inputs):
        b.connect(t, Target.wire(row, Poseidon2Gate.wire_input(i)))
    outputs = [Target.wire(row, Poseidon2Gate.wire_output(i)) for i in range(12)]
    for t in outputs[:4]:
        b.register_public_input(t)
    data = b.build()

    pw = PartialWitness()
    input_vals = [3 * i + 1 for i in range(12)]
    for t, v in zip(inputs, input_vals):
        pw.set_target(t, v)
    pwp = prove(data.prover_only, data.common, pw)
    verify(pwp, data.verifier_only, data.common)
    expected = p2.permute(input_vals)
    assert pwp.public_inputs[-4:] == expected[:4]
