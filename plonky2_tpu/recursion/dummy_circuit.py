"""Dummy circuits/proofs matching a given CommonCircuitData (reference:
plonky2/src/recursion/dummy_circuit.rs:39-160). Used as the base-case
branch of conditional/cyclic recursion."""

from __future__ import annotations

from typing import Dict, Optional

from ..iop.witness import PartialWitness
from ..plonk.circuit_builder import CircuitBuilder
from ..plonk.prover import prove


def dummy_circuit(common):
    """Generate a circuit whose CommonCircuitData matches `common`
    (dummy_circuit.rs:89-116)."""
    from ..gates.basic import NoopGate

    degree = common.degree
    num_noop = degree - -(-common.num_public_inputs // 8) - 2

    builder = CircuitBuilder(common.config)
    for _ in range(num_noop):
        builder.add_gate(NoopGate(), [])
    for gate in common.gates:
        builder.add_gate_to_gate_set(gate)
    for _ in range(common.num_public_inputs):
        builder.add_virtual_public_input()
    data = builder.build()
    assert common_shape_eq(data.common, common), "dummy circuit shape mismatch"
    return data


def dummy_proof(circuit, nonzero_public_inputs: Optional[Dict[int, int]] = None):
    """Prove the dummy circuit with (mostly zero) public inputs."""
    nonzero_public_inputs = nonzero_public_inputs or {}
    pw = PartialWitness()
    for i in range(circuit.common.num_public_inputs):
        pw.set_target(
            circuit.prover_only.public_inputs[i], nonzero_public_inputs.get(i, 0)
        )
    return prove(circuit.prover_only, circuit.common, pw)


def common_shape_eq(a, b) -> bool:
    return (
        a.trace_degree_bits == b.trace_degree_bits
        and [g.id() for g in a.gates] == [g.id() for g in b.gates]
        and a.selectors_info.selector_indices == b.selectors_info.selector_indices
        and a.selectors_info.groups == b.selectors_info.groups
        and a.num_constants == b.num_constants
        and a.num_public_inputs == b.num_public_inputs
        and a.k_is == b.k_is
        and a.num_partial_products == b.num_partial_products
        and a.num_lookup_polys == b.num_lookup_polys
    )
