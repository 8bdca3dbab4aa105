"""End-to-end PLONK prove + verify (fibonacci, no public inputs yet —
the PI-hash path needs PoseidonGate, next milestone)."""

import numpy as np
import pytest

from plonky2_tpu.models.fibonacci import build_fibonacci, fib_value
from plonky2_tpu.plonk import verifier as pv


def test_fibonacci_prove_verify():
    data, pw = build_fibonacci(public_io=False)
    proof = data.prove(pw)
    data.verify(proof)


def test_fibonacci_tamper_detection():
    data, pw = build_fibonacci(public_io=False)
    proof = data.prove(pw)
    # corrupt a wire opening
    w0 = proof.proof.openings.wires[0]
    proof.proof.openings.wires[0] = (w0[0] ^ 1, w0[1])
    with pytest.raises(Exception):
        data.verify(proof)


def test_high_rate_config_strided_lde():
    """rate_bits > quotient_degree_bits: the quotient kernel samples the
    committed high-rate LDE at a stride instead of recomputing
    (fri/oracle.rs:286-292 get_lde_values(index, step))."""
    from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
    from plonky2_tpu.plonk.config import CircuitConfig

    config = CircuitConfig(
        fri_config=FriConfig(
            rate_bits=4,
            cap_height=4,
            proof_of_work_bits=16,
            reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
            num_query_rounds=21,
        )
    )
    data, pw = build_fibonacci(config=config, public_io=False)
    assert data.common.quotient_degree_factor < (1 << 4)
    proof = data.prove(pw)
    data.verify(proof)


def test_device_zs_matches_host():
    """The device permutation-argument kernel (log-doubling prefix
    products + scan batch inverse) is bit-equal to the host numpy path."""
    import numpy as np

    from plonky2_tpu.iop.generator import generate_partial_witness
    from plonky2_tpu.ops import gf
    from plonky2_tpu.plonk import prover as pp

    data, pw = build_fibonacci(public_io=False)
    witness = generate_partial_witness(
        pw, data.prover_only, data.common
    ).full_witness()
    betas = [123456789, 987654321]
    gammas = [111111111, 222222222]
    want = pp._zs_and_partial_products(
        witness, betas, gammas, data.prover_only, data.common
    )
    wires_dev = gf.from_u64(witness.wire_values)
    got = np.asarray(
        gf.to_u64(
            pp._zs_and_partial_products_device(
                wires_dev,
                gf.from_u64(np.array(betas, dtype=np.uint64)),
                gf.from_u64(np.array(gammas, dtype=np.uint64)),
                data.prover_only,
                data.common,
            )
        )
    )
    assert np.array_equal(got, want)
