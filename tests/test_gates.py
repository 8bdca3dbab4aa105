"""Per-gate harness tests (reference: each gate module's #[test] low_degree
and eval_fns; plonky2/src/gates/gate_testing.rs)."""

import pytest

from plonky2_tpu.gates.basic import ArithmeticGate, ConstantGate, NoopGate, PublicInputGate
from plonky2_tpu.gates.gate_testing import (
    check_algebra_agreement,
    check_generated_witness,
    check_low_degree,
)
from plonky2_tpu.gates.extension import (
    ArithmeticExtensionGate,
    MulExtensionGate,
    ReducingExtensionGate,
    ReducingGate,
)
from plonky2_tpu.gates.interpolation import CosetInterpolationGate, PoseidonMdsGate
from plonky2_tpu.gates.misc import BaseSumGate, ExponentiationGate, RandomAccessGate
from plonky2_tpu.gates.poseidon import PoseidonGate
from plonky2_tpu.gates.poseidon2 import (
    Poseidon2Gate,
    Poseidon2IntMixGate,
    Poseidon2MdsGate,
)

GATES = [
    ArithmeticGate(num_ops=20),
    ConstantGate(num_consts=2),
    PublicInputGate(),
    PoseidonGate(),
    ArithmeticExtensionGate(num_ops=10),
    MulExtensionGate(num_ops=13),
    ReducingGate(num_coeffs=33),
    ReducingExtensionGate(num_coeffs=32),
    BaseSumGate(num_limbs=63, base=2),
    BaseSumGate(num_limbs=16, base=4),
    ExponentiationGate(num_power_bits=17),
    RandomAccessGate(bits=4, num_copies=4, num_extra_constants=2),
    CosetInterpolationGate(subgroup_bits=4, max_degree=8),
    CosetInterpolationGate(subgroup_bits=2, max_degree=8),
    PoseidonMdsGate(),
    Poseidon2Gate(),
    Poseidon2MdsGate(),
    Poseidon2IntMixGate(),
]


def _preset_for(gate, seed=0):
    import random

    rnd = random.Random(1000 + seed)
    if isinstance(gate, PoseidonGate):
        return {PoseidonGate.WIRE_SWAP: 1}
    if isinstance(gate, ExponentiationGate):
        return {
            gate.wire_power_bit(i): rnd.randrange(2)
            for i in range(gate.num_power_bits)
        }
    if isinstance(gate, BaseSumGate):
        return {gate.WIRE_SUM: rnd.randrange(min(gate.base**gate.num_limbs, 2**63))}
    if isinstance(gate, RandomAccessGate):
        preset = {
            gate.wire_access_index(c): rnd.randrange(gate.vec_size())
            for c in range(gate.num_copies)
        }
        # extra-constant wires are filled by the builder's ConstantGenerators,
        # not the gate's own generators: pin them to the sampled constants
        from plonky2_tpu.field.goldilocks import P

        consts = [rnd.randrange(P) for _ in range(gate.num_extra_constants)]
        for i, c in enumerate(consts):
            preset[gate.wire_extra_constant(i)] = c
        return consts, preset
    return None


def _split(pc):
    if isinstance(pc, tuple):
        return pc[0], pc[1]
    return None, pc


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:24])
def test_low_degree(gate):
    check_low_degree(gate)


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:24])
def test_generated_witness_satisfies_constraints(gate):
    if not gate.generators(0, [0] * gate.num_constants()):
        pytest.skip("gate has no generators")
    constants, preset = _split(_preset_for(gate))
    check_generated_witness(gate, constants=constants, preset=preset)


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:24])
def test_device_algebra_agrees_with_host(gate):
    check_algebra_agreement(gate)


def test_poseidon_fast_representation_matches_naive():
    import random

    from plonky2_tpu.hash import poseidon as hp
    from plonky2_tpu.hash import poseidon_fast as pf

    rnd = random.Random(7)
    for _ in range(3):
        s = [rnd.randrange(hp.P) for _ in range(12)]
        assert pf.permute_fast(s) == hp.permute(s)


def test_poseidon_gate_output_is_permutation():
    import random

    from plonky2_tpu.gates.gate_testing import generate_gate_row
    from plonky2_tpu.hash import poseidon as hp

    gate = PoseidonGate()
    for swap in (0, 1):
        row, _ = generate_gate_row(gate, seed=swap, preset={PoseidonGate.WIRE_SWAP: swap})
        inputs = [row[PoseidonGate.wire_input(i)] for i in range(12)]
        if swap:
            inputs = inputs[4:8] + inputs[:4] + inputs[8:]
        outputs = [row[PoseidonGate.wire_output(i)] for i in range(12)]
        assert outputs == hp.permute(inputs)
