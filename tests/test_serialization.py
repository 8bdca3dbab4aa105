"""Serialization roundtrips in the reference wire format
(plonky2/src/util/serialization/mod.rs): proofs, common circuit data with
the default gate serializer, verifier-only data."""

import numpy as np
import pytest

from plonky2_tpu.models.fibonacci import build_fibonacci, fib_value
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.verifier import verify
from plonky2_tpu.utils.serialization import (
    Buffer,
    SerializationError,
    common_data_from_bytes,
    common_data_to_bytes,
    proof_from_bytes,
    proof_to_bytes,
    verifier_data_from_bytes,
    verifier_data_to_bytes,
)


@pytest.fixture(scope="module")
def fib():
    data, pw = build_fibonacci(public_io=True)
    pwp = prove(data.prover_only, data.common, pw)
    return data, pwp


def test_proof_roundtrip(fib):
    data, pwp = fib
    raw = proof_to_bytes(pwp, data.common)
    back = proof_from_bytes(raw, data.common)
    assert back.public_inputs == pwp.public_inputs
    assert np.array_equal(back.proof.wires_cap, pwp.proof.wires_cap)
    assert back.proof.openings.wires == pwp.proof.openings.wires
    assert back.proof.opening_proof.final_poly == pwp.proof.opening_proof.final_poly
    assert back.proof.opening_proof.pow_witness == pwp.proof.opening_proof.pow_witness
    # decoded proof verifies
    verify(back, data.verifier_only, data.common)
    # byte stability: re-encoding gives identical bytes
    assert proof_to_bytes(back, data.common) == raw


def test_common_data_roundtrip(fib):
    data, pwp = fib
    raw = common_data_to_bytes(data.common)
    common2 = common_data_from_bytes(raw)
    assert common2.trace_degree_bits == data.common.trace_degree_bits
    assert common2.k_is == list(data.common.k_is)
    assert [g.id() for g in common2.gates] == [g.id() for g in data.common.gates]
    assert common_data_to_bytes(common2) == raw
    # a verifier driven by the decoded common data still accepts the proof
    verify(pwp, data.verifier_only, common2)


def test_verifier_data_roundtrip(fib):
    data, pwp = fib
    raw = verifier_data_to_bytes(data.verifier_only, data.common)
    vo2, common2 = verifier_data_from_bytes(raw)
    assert np.array_equal(vo2.constants_sigmas_cap, data.verifier_only.constants_sigmas_cap)
    assert tuple(vo2.circuit_digest) == tuple(data.verifier_only.circuit_digest)
    verify(pwp, vo2, common2)


def test_truncated_rejected(fib):
    data, pwp = fib
    raw = proof_to_bytes(pwp, data.common)
    with pytest.raises(SerializationError):
        proof_from_bytes(raw[:-1], data.common)
    with pytest.raises(SerializationError):
        proof_from_bytes(raw + b"\0", data.common)


def test_generator_and_circuit_data_roundtrip(fib):
    """Full CircuitData checkpoint: generators, prover data, verifier
    data (reference: circuit_data.rs to_bytes/from_bytes,
    generator_serialization.rs)."""
    from plonky2_tpu.models.fibonacci import build_fibonacci
    from plonky2_tpu.utils.serialization import (
        circuit_data_from_bytes,
        circuit_data_to_bytes,
    )

    data, pw = build_fibonacci(public_io=True)
    raw = circuit_data_to_bytes(data)
    data2 = circuit_data_from_bytes(raw)
    assert [type(g).__name__ for g in data2.prover_only.generators] == [
        type(g).__name__ for g in data.prover_only.generators
    ]
    # the restored circuit data proves and verifies
    pwp = prove(data2.prover_only, data2.common, pw)
    verify(pwp, data2.verifier_only, data2.common)


def test_compressed_proof_roundtrip(fib):
    from plonky2_tpu.plonk.compressed_proof import (
        compress_proof,
        decompress_proof,
    )
    from plonky2_tpu.utils.serialization import (
        compressed_proof_from_bytes,
        compressed_proof_to_bytes,
    )

    data, pwp = fib
    compressed = compress_proof(pwp, data.verifier_only, data.common)
    raw = compressed_proof_to_bytes(compressed, data.common)
    back = compressed_proof_from_bytes(raw, data.common)
    assert back.public_inputs == compressed.public_inputs
    assert back.proof.opening_proof.query_round_proofs.indices == (
        compressed.proof.opening_proof.query_round_proofs.indices
    )
    full = decompress_proof(back, data.verifier_only, data.common)
    verify(full, data.verifier_only, data.common)
    assert len(raw) < len(
        __import__("plonky2_tpu.utils.serialization", fromlist=["proof_to_bytes"]).proof_to_bytes(pwp, data.common)
    ), "compressed proof should be smaller"
