"""In-circuit constraint eval (CircuitAlgebra) agrees with the host exact
algebra — the analogue of the reference's test_eval_fns consistency check
(gates/gate_testing.rs:93), done via witness generation instead of a full
prove (cheap, still exercises every gadget the circuit eval uses)."""

import random

import pytest

from plonky2_tpu.field.goldilocks import P
from plonky2_tpu.gates.algebra import CircuitAlgebra, EvalVars, HostExtAlgebra
from plonky2_tpu.gates.basic import ArithmeticGate
from plonky2_tpu.gates.extension import ReducingExtensionGate
from plonky2_tpu.gates.gate_testing import generate_gate_row
from plonky2_tpu.gates.interpolation import CosetInterpolationGate
from plonky2_tpu.gates.misc import BaseSumGate, ExponentiationGate, RandomAccessGate
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

GATES = [
    ArithmeticGate(num_ops=20),
    BaseSumGate(num_limbs=11, base=2),
    RandomAccessGate(bits=2, num_copies=2, num_extra_constants=1),
    ReducingExtensionGate(num_coeffs=8),
    ExponentiationGate(num_power_bits=5),
    CosetInterpolationGate(subgroup_bits=2, max_degree=8),
]


def _preset(gate, rnd):
    if isinstance(gate, BaseSumGate):
        return {gate.WIRE_SUM: rnd.randrange(2**gate.num_limbs)}
    if isinstance(gate, ExponentiationGate):
        return {gate.wire_power_bit(i): rnd.randrange(2) for i in range(gate.num_power_bits)}
    if isinstance(gate, RandomAccessGate):
        preset = {
            gate.wire_access_index(c): rnd.randrange(gate.vec_size())
            for c in range(gate.num_copies)
        }
        return preset
    return None


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:22])
def test_circuit_eval_matches_host(gate):
    rnd = random.Random(5)
    row, constants = generate_gate_row(gate, seed=3, preset=_preset(gate, rnd))
    pis_hash = [rnd.randrange(P) for _ in range(4)]

    # host values
    Ah = HostExtAlgebra()
    host_vals = gate.eval_unfiltered(
        EvalVars([Ah.const(c) for c in constants], [Ah.const(w) for w in row],
                 [Ah.const(h) for h in pis_hash]),
        Ah,
    )

    # in-circuit eval over constants as circuit constants
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    A = CircuitAlgebra(builder)
    wire_inputs = builder.add_virtual_targets(len(row))
    vars = EvalVars(
        [A.const(c) for c in constants],
        [builder.convert_to_ext(t) for t in wire_inputs],
        [A.const(h) for h in pis_hash],
    )
    outs = gate.eval_unfiltered(vars, A)
    out_targets = [t for o in outs for t in o.parts]
    # keep the outputs routable: route through public-input-free wires by
    # registering virtual targets in the witness directly
    data = builder.build()
    pw = PartialWitness()
    for t, v in zip(wire_inputs, row):
        pw.set_target(t, v)
    witness = generate_partial_witness(pw, data.prover_only, data.common)
    got = [
        tuple(witness.get_target(t) for t in o.parts) for o in outs
    ]
    assert got == [tuple(h) for h in host_vals], f"{gate.id()} circuit eval mismatch"
