"""Device-transcript prover: bit-identical to the host-transcript path
(the whole post-witness transcript runs on device; proofs must agree
byte for byte since the device challenger is bit-exact)."""

import pytest

from plonky2_tpu.utils.serialization import proof_to_bytes


def _prove_both(build):
    data, pw = build()
    import plonky2_tpu.plonk.device_transcript as dt
    import os

    os.environ["PLONKY2_TPU_DEVICE_TRANSCRIPT"] = "1"
    try:
        assert dt.eligible(data.common, _gc(), False)
        dev = data.prove(pw)
        data.verify(dev)
        os.environ["PLONKY2_TPU_DEVICE_TRANSCRIPT"] = "0"
        host = data.prove(pw)
        data.verify(host)
    finally:
        os.environ.pop("PLONKY2_TPU_DEVICE_TRANSCRIPT", None)
    assert proof_to_bytes(dev, data.common) == proof_to_bytes(host, data.common)


def _gc():
    from plonky2_tpu.plonk.generic_config import poseidon_goldilocks_config

    return poseidon_goldilocks_config()


def test_fibonacci_device_transcript_bit_identical():
    from plonky2_tpu.models.fibonacci import build_fibonacci

    _prove_both(lambda: build_fibonacci(public_io=True))


def test_factorial_device_transcript_bit_identical():
    from plonky2_tpu.models.examples import build_factorial

    _prove_both(lambda: build_factorial(30))


def test_zk_config_falls_back():
    """zk circuits must take the host path (random salts, masked rows)."""
    import plonky2_tpu.plonk.device_transcript as dt
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.models.fibonacci import build_fibonacci

    data, pw = build_fibonacci(
        config=CircuitConfig.standard_recursion_zk_config(), public_io=False
    )
    assert not dt.eligible(data.common, _gc(), False)
    proof = data.prove(pw)
    data.verify(proof)
