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
