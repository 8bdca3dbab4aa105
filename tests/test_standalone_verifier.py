"""Standalone verifier artifact: the full verify path runs with jax
imports HARD-BLOCKED (reference: the no_std verifier crate,
verifier/src/lib.rs:1-20).

The prover (this process, jax) serializes proof + verifier data +
common data; a subprocess with a meta-path jax blocker deserializes and
verifies them — including the compressed-proof path and a tamper
rejection. Gate-eval drift between the prover's device algebra and the
verifier's host algebra is pinned separately by
tests/test_gates.py::test_device_algebra_agrees_with_host and
tests/test_circuit_algebra.py (the single-source analogue of
plonky2/src/cross_crate_gate_tests.rs:1-15).
"""

import subprocess
import sys

import pytest

_SUBPROCESS = r"""
import sys

class _JaxBlocker:
    def find_spec(self, name, path=None, target=None):
        if name == "jax" or name.startswith(("jax.", "jaxlib")):
            raise ImportError(f"jax import blocked in standalone verifier: {name}")

sys.meta_path.insert(0, _JaxBlocker())
sys.path.insert(0, __REPO__)

import plonky2_tpu.verifier as sv

assert "jax" not in sys.modules, "importing plonky2_tpu.verifier pulled jax"

with open(__PATH__, "rb") as f:
    blobs = f.read().split(b"\x00SPLIT\x00")
proof_b, vd_b, common_b = blobs

common = sv.common_data_from_bytes(common_b)
# verifier_data_from_bytes mirrors the reference's VerifierCircuitData
# wire layout (verifier_only || common); the embedded common must agree
# with the standalone blob
vd, common_embedded = sv.verifier_data_from_bytes(vd_b)
assert common_embedded.degree_bits == common.degree_bits
pwp = sv.proof_from_bytes(proof_b, common)

sv.verify(pwp, vd, common)

cpwp = sv.compress_proof(pwp, vd, common)
sv.verify_compressed_proof(cpwp, vd, common)
pwp2 = sv.decompress_proof(cpwp, vd, common)
assert sv.proof_to_bytes(pwp2, common) == proof_b, "decompress drift"

pwp.public_inputs[0] ^= 1
try:
    sv.verify(pwp, vd, common)
except sv.VerificationError:
    pass
else:
    raise AssertionError("tampered proof accepted by standalone verifier")

assert "jax" not in sys.modules, "verification pulled jax"
print("STANDALONE_OK")
"""


@pytest.fixture(scope="module")
def proof_blobs(tmp_path_factory):
    from plonky2_tpu.models.fibonacci import build_fibonacci
    from plonky2_tpu.utils.serialization import (
        common_data_to_bytes,
        proof_to_bytes,
        verifier_data_to_bytes,
    )

    data, pw = build_fibonacci(public_io=True)
    pwp = data.prove(pw)
    path = tmp_path_factory.mktemp("sv") / "proof.bin"
    path.write_bytes(
        b"\x00SPLIT\x00".join(
            [
                proof_to_bytes(pwp, data.common),
                verifier_data_to_bytes(data.verifier_only, data.common),
                common_data_to_bytes(data.common),
            ]
        )
    )
    return str(path)


def test_verify_without_jax(proof_blobs):
    import plonky2_tpu

    repo = str(__import__("pathlib").Path(plonky2_tpu.__file__).parent.parent)
    code = _SUBPROCESS.replace("__REPO__", repr(repo)).replace(
        "__PATH__", repr(proof_blobs)
    )
    # -I (isolated): the ambient environment preloads jax into every
    # interpreter via PYTHONPATH sitecustomize; isolated mode starts
    # jax-free so the blocker actually guards the verifier's imports
    out = subprocess.run(
        [sys.executable, "-I", "-c", code], capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, f"stdout={out.stdout}\nstderr={out.stderr}"
    assert "STANDALONE_OK" in out.stdout
