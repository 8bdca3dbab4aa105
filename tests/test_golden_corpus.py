"""Full-proof golden corpus: pinned proof + common-data bytes for the
example circuits (generated once by tools/gen_goldens.py, committed).

What each case pins, at full-proof granularity (VERDICT r4 #9; the
hand-derived stub in test_golden_serialization.py only covers a toy
shape):

* wire format: the pinned bytes parse with today's deserializer and
  re-serialize to the identical byte string (any length-prefix,
  ordering or encoding drift fails);
* transcript/prover: re-proving the same circuit reproduces the exact
  pinned bytes — the whole pipeline (witness gen, commitments,
  Fiat-Shamir challenges, PoW grind, FRI) is deterministic, so any
  unintended change to any of it is caught here.

Reference dual: plonky2 util/serialization/mod.rs + the bundled
fibonacci example (examples/fibonacci.rs).
"""

import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = ["fibonacci", "range_check", "square_root"]


def _load(name):
    with open(os.path.join(GOLDEN_DIR, f"{name}_proof.bin"), "rb") as f:
        proof_bytes = f.read()
    with open(os.path.join(GOLDEN_DIR, f"{name}_common.bin"), "rb") as f:
        common_bytes = f.read()
    return proof_bytes, common_bytes


@pytest.mark.parametrize("name", CASES)
def test_pinned_bytes_parse_verify_and_roundtrip(name):
    from plonky2_tpu.utils.serialization import (
        common_data_from_bytes,
        proof_from_bytes,
        proof_to_bytes,
    )

    proof_bytes, common_bytes = _load(name)
    common = common_data_from_bytes(common_bytes)
    pwp = proof_from_bytes(proof_bytes, common)
    assert proof_to_bytes(pwp, common) == proof_bytes


@pytest.mark.parametrize("name", CASES)
def test_reprove_reproduces_pinned_bytes(name):
    from plonky2_tpu.models.examples import (
        build_range_check,
        build_square_root,
    )
    from plonky2_tpu.models.fibonacci import build_fibonacci
    from plonky2_tpu.utils.serialization import (
        common_data_to_bytes,
        proof_to_bytes,
    )

    build = {
        "fibonacci": lambda: build_fibonacci(public_io=True),
        "range_check": build_range_check,
        "square_root": lambda: build_square_root()[:2],
    }[name]
    proof_bytes, common_bytes = _load(name)
    data, pw = build()
    assert common_data_to_bytes(data.common) == common_bytes
    pwp = data.prove(pw)
    data.verify(pwp)
    assert proof_to_bytes(pwp, data.common) == proof_bytes
