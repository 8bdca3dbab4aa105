"""Hasher configs (the reference's `C` type parameter): proofs with
KeccakGoldilocksConfig and Poseidon2GoldilocksConfig prove + verify, and
configs are not interchangeable (core/src/config.rs, keccak.rs)."""

import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.generic_config import (
    keccak_felts_to_digest,
    keccak_digest_to_felts,
    keccak_goldilocks_config,
    poseidon2_goldilocks_config,
    poseidon_goldilocks_config,
)
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.verifier import verify


def _small_config():
    return CircuitConfig(
        security_bits=25,
        fri_config=FriConfig(
            rate_bits=3,
            cap_height=1,
            proof_of_work_bits=2,
            reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
            num_query_rounds=8,
        ),
    )


def _build(gc):
    b = CircuitBuilder(_small_config())
    x0 = b.add_virtual_target()
    x1 = b.add_virtual_target()
    b.register_public_input(x0)
    b.register_public_input(x1)
    cur, nxt = x0, x1
    for _ in range(10):
        cur, nxt = nxt, b.add(cur, nxt)
    b.register_public_input(nxt)
    data = b.build(gc=gc)
    pw = PartialWitness()
    pw.set_target(x0, 0)
    pw.set_target(x1, 1)
    return data, pw


def test_keccak_digest_felts_bijection():
    b = bytes(range(25))
    assert keccak_felts_to_digest(keccak_digest_to_felts(b)) == b


@pytest.mark.parametrize(
    "make_gc", [keccak_goldilocks_config, poseidon2_goldilocks_config]
)
def test_alt_hasher_config_proves_and_verifies(make_gc):
    gc = make_gc()
    data, pw = _build(gc)
    pwp = prove(data.prover_only, data.common, pw, gc=gc)
    assert pwp.public_inputs[2] == 89  # fib(11)
    verify(pwp, data.verifier_only, data.common, gc=gc)
    # wrong config rejected: the transcript diverges
    with pytest.raises(Exception):
        verify(pwp, data.verifier_only, data.common, gc=poseidon_goldilocks_config())
