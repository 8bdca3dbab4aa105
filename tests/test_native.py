"""Native host hashing engine vs the pure-Python reference paths."""

import numpy as np
import pytest

from plonky2_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable (no C compiler)"
)


def test_native_poseidon_matches_python():
    import importlib

    from plonky2_tpu.hash import poseidon as hp

    s = [3 * i + 1 for i in range(12)]
    native_out = native.poseidon_permute(s)
    # force the pure-python path for the reference value
    import os

    os.environ["PLONKY2_TPU_NATIVE"] = "0"
    try:
        py_out = hp.permute(s)
    finally:
        os.environ.pop("PLONKY2_TPU_NATIVE")
    assert native_out == py_out


def test_native_poseidon_batch():
    from plonky2_tpu.hash import poseidon as hp

    rng = np.random.default_rng(0)
    states = rng.integers(0, (1 << 63), size=(5, 12), dtype=np.uint64)
    out = native.poseidon_permute_batch(states.copy())
    for row_in, row_out in zip(states, out):
        assert list(map(int, row_out)) == hp.permute(list(map(int, row_in)))


def test_native_keccak_matches_python():
    import os

    from plonky2_tpu.hash import keccak as hk

    for data in (b"", b"a", b"x" * 135, b"y" * 136, b"z" * 999):
        native_out = native.keccak256(data)
        os.environ["PLONKY2_TPU_NATIVE"] = "0"
        try:
            py_out = hk.keccak256(data)
        finally:
            os.environ.pop("PLONKY2_TPU_NATIVE")
        assert native_out == py_out, f"mismatch for len {len(data)}"
