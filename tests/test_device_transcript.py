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


def test_lookup_device_transcript_bit_identical():
    """Lookup circuits run the device transcript too: deltas drawn at
    boundary 1, RE/partial-SLDC columns via the device kernel, LUT-poly
    evals at traced deltas — byte-equal to the host path."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig

    SMALLER_TABLE = [2, 24, 56, 100, 128, 16, 20, 49]

    def build():
        b = CircuitBuilder(CircuitConfig.standard_recursion_config())
        inputs = [0, 3, 3, 7, 1]
        lut_index = b.add_lookup_table_from_table(
            list(range(len(SMALLER_TABLE))), SMALLER_TABLE
        )
        in_ts = [b.add_virtual_target() for _ in inputs]
        out_ts = [b.add_lookup_from_index(t, lut_index) for t in in_ts]
        b.register_public_inputs(in_ts)
        b.register_public_inputs(out_ts)
        data = b.build()
        pw = PartialWitness()
        for t, v in zip(in_ts, inputs):
            pw.set_target(t, v)
        return data, pw

    _prove_both(build)


def test_zk_device_transcript_bit_identical():
    """zk circuits run the device transcript too (salt-blinded oracles);
    with the salt stream pinned by PLONKY2_TPU_SALT_SEED the proof is
    byte-equal to the host path."""
    import os

    from plonky2_tpu.models.fibonacci import build_fibonacci
    from plonky2_tpu.plonk.config import CircuitConfig

    os.environ["PLONKY2_TPU_SALT_SEED"] = "12345"
    try:
        _prove_both(
            lambda: build_fibonacci(
                config=CircuitConfig.standard_recursion_zk_config(), public_io=False
            )
        )
    finally:
        os.environ.pop("PLONKY2_TPU_SALT_SEED", None)
