"""Standalone verify-only import surface.

The reference ships a separate no_std ``verifier`` crate
(verifier/src/lib.rs:1-20) so proofs can be checked in environments
where the prover's dependencies are unavailable. The TPU build's
equivalent guarantee: importing ``plonky2_tpu.verifier`` NEVER imports
jax — the whole verify path (shape validation, Fiat-Shamir replay,
gate-constraint evaluation via HostExtAlgebra, FRI query checks,
serialization) is pure numpy + Python ints. Enforced by
tests/test_standalone_verifier.py, which verifies a real proof in a
subprocess with jax imports hard-blocked.

Where the reference *duplicates* every gate's eval code into the
verifier crate and pins the copies with cross_crate_gate_tests
(plonky2/src/cross_crate_gate_tests.rs:1-15), this build instantiates
the single-source constraint algebra (gates/algebra.py) with a host
backend — the drift test (test_standalone_verifier.py) checks host vs
device evaluation equality per gate instead of copy vs copy.
"""

from ..fri.validate_shape import FriShapeError, validate_fri_proof_shape
from ..plonk.compressed_proof import (
    compress_proof,
    decompress_proof,
    verify_compressed_proof,
)
from ..fri.verifier import FriVerificationError, verify_fri_proof
from ..plonk.validate_shape import ProofShapeError, validate_proof_with_pis_shape
from ..plonk.verifier import VerificationError, get_challenges, verify
from ..utils.serialization import (
    SerializationError,
    common_data_from_bytes,
    proof_from_bytes,
    proof_to_bytes,
    verifier_data_from_bytes,
)

__all__ = [
    "FriShapeError",
    "FriVerificationError",
    "ProofShapeError",
    "SerializationError",
    "VerificationError",
    "common_data_from_bytes",
    "compress_proof",
    "decompress_proof",
    "get_challenges",
    "proof_from_bytes",
    "proof_to_bytes",
    "validate_fri_proof_shape",
    "validate_proof_with_pis_shape",
    "verifier_data_from_bytes",
    "verify",
    "verify_compressed_proof",
    "verify_fri_proof",
]
