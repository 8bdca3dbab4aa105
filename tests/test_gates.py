"""Per-gate harness tests (reference: each gate module's #[test] low_degree
and eval_fns; plonky2/src/gates/gate_testing.rs)."""

import pytest

from plonky2_tpu.gates.basic import ArithmeticGate, ConstantGate, NoopGate, PublicInputGate
from plonky2_tpu.gates.gate_testing import (
    check_algebra_agreement,
    check_generated_witness,
    check_low_degree,
)
from plonky2_tpu.gates.poseidon import PoseidonGate

GATES = [
    ArithmeticGate(num_ops=20),
    ConstantGate(num_consts=2),
    PublicInputGate(),
    PoseidonGate(),
]


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:24])
def test_low_degree(gate):
    check_low_degree(gate)


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:24])
def test_generated_witness_satisfies_constraints(gate):
    if not gate.generators(0, [0] * gate.num_constants()):
        pytest.skip("gate has no generators")
    preset = None
    if isinstance(gate, PoseidonGate):
        preset = {PoseidonGate.WIRE_SWAP: 1}
    check_generated_witness(gate, preset=preset)


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
