"""Cyclic recursion plumbing: verifier-data public inputs + host cycle
check (reference: recursion/cyclic_recursion.rs:40-240). The full IVC
fixpoint e2e lands with round 2."""

import pytest

from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.recursion.cyclic_recursion import (
    check_cyclic_proof_verifier_data,
    register_verifier_data_public_inputs,
)


def test_register_verifier_data_public_inputs():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    cap_height = b.config.fri_config.cap_height
    vd = register_verifier_data_public_inputs(b, cap_height)
    assert len(vd.constants_sigmas_cap.hashes) == 1 << cap_height
    assert len(b.public_inputs) == (1 << cap_height) * 4 + 4


def test_check_cyclic_proof_verifier_data():
    import numpy as np

    class FakeCommon:
        class fri_params:
            class config:
                cap_height = 1

    class FakeVD:
        constants_sigmas_cap = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=np.uint64)
        circuit_digest = (9, 10, 11, 12)

    class FakeProof:
        public_inputs = [99, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]

    check_cyclic_proof_verifier_data(FakeProof, FakeVD, FakeCommon)

    class BadProof:
        public_inputs = [99, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13]

    with pytest.raises(ValueError):
        check_cyclic_proof_verifier_data(BadProof, FakeVD, FakeCommon)


def _build_cyclic_chain():
    """Mirror of the reference hash-chain IVC test
    (cyclic_recursion.rs:295-395)."""
    from plonky2_tpu.hash import poseidon as hp
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.proof_target import (
        add_virtual_proof_with_pis,
        set_proof_with_pis_target,
    )
    from plonky2_tpu.plonk.recursive_verifier import set_verifier_data_target
    from plonky2_tpu.recursion.cyclic_recursion import (
        common_data_for_recursion,
        conditionally_verify_cyclic_proof_or_dummy,
        cyclic_base_proof,
        verify_cyclic,
    )
    from plonky2_tpu.plonk.prover import prove

    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    one = b.constant(1)

    initial_hash = [b.add_virtual_target() for _ in range(4)]
    b.register_public_inputs(initial_hash)
    current_hash_in = [b.add_virtual_target() for _ in range(4)]
    current_hash_out = b.hash_n_to_hash_no_pad(list(current_hash_in))
    b.register_public_inputs(current_hash_out)
    counter = b.add_virtual_public_input()

    common_data = common_data_for_recursion(config)
    vd_t = register_verifier_data_public_inputs(
        b, common_data.fri_params.config.cap_height
    )
    import dataclasses

    common_data = dataclasses.replace(
        common_data, num_public_inputs=len(b.public_inputs)
    )

    condition = b.add_virtual_bool_target_safe()
    inner = add_virtual_proof_with_pis(b, common_data)
    inner_pis = inner.public_inputs
    inner_initial = inner_pis[0:4]
    inner_latest = inner_pis[4:8]
    inner_counter = inner_pis[8]

    for a_t, b_t in zip(initial_hash, inner_initial):
        b.connect(a_t, b_t)
    actual_in = [
        b.select(condition, x, y) for x, y in zip(inner_latest, initial_hash)
    ]
    for a_t, b_t in zip(current_hash_in, actual_in):
        b.connect(a_t, b_t)
    new_counter = b.mul_add(condition.target, inner_counter, one)
    b.connect(counter, new_counter)

    conditionally_verify_cyclic_proof_or_dummy(b, condition, inner, common_data)
    data = b.build()
    return data, common_data, condition, inner, vd_t


@pytest.mark.slow
def test_cyclic_recursion_ivc_chain():
    from plonky2_tpu.hash import poseidon as hp
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.proof_target import set_proof_with_pis_target
    from plonky2_tpu.plonk.recursive_verifier import set_verifier_data_target
    from plonky2_tpu.plonk.prover import prove
    from plonky2_tpu.recursion.cyclic_recursion import (
        cyclic_base_proof,
        verify_cyclic,
    )
    from plonky2_tpu.recursion.dummy_circuit import common_shape_eq

    data, common_data, condition, inner, vd_t = _build_cyclic_chain()
    assert common_shape_eq(data.common, common_data), (
        "cyclic fixpoint mismatch: "
        f"{data.common.trace_degree_bits} vs {common_data.trace_degree_bits}; "
        f"gates {[g.id() for g in data.common.gates]} vs "
        f"{[g.id() for g in common_data.gates]}"
    )

    initial_hash = [0, 1, 2, 3]
    # base case
    pw = PartialWitness()
    pw.set_target(condition.target, 0)
    set_proof_with_pis_target(
        pw,
        inner,
        cyclic_base_proof(
            common_data, data.verifier_only, dict(enumerate(initial_hash))
        ),
    )
    set_verifier_data_target(pw, vd_t, data.verifier_only)
    proof = prove(data.prover_only, data.common, pw)
    verify_cyclic(proof, data.verifier_only, data.common)

    # two recursive layers
    for _ in range(2):
        pw = PartialWitness()
        pw.set_target(condition.target, 1)
        set_proof_with_pis_target(pw, inner, proof)
        set_verifier_data_target(pw, vd_t, data.verifier_only)
        proof = prove(data.prover_only, data.common, pw)
        verify_cyclic(proof, data.verifier_only, data.common)

    # the chain computed counter iterations of the hash
    assert proof.public_inputs[8] == 2 + 1
    cur = initial_hash
    for _ in range(3):
        cur = list(hp.hash_no_pad(cur))
    assert proof.public_inputs[4:8] == cur
