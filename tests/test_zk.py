"""Zero-knowledge blinding: random blinding rows (circuit_builder.rs
blind) + salted oracles (oracle.rs lde_blinded_values, SALT_SIZE=4); the
proof still verifies, and re-proving the same witness yields different
commitments."""

import numpy as np

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.verifier import verify


def _zk_config():
    return CircuitConfig(
        zero_knowledge=True,
        security_bits=25,
        fri_config=FriConfig(
            rate_bits=3,
            cap_height=2,
            proof_of_work_bits=1,
            reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
            num_query_rounds=8,
        ),
    )


def _build():
    config = _zk_config()
    b = CircuitBuilder(config)
    x0 = b.add_virtual_target()
    x1 = b.add_virtual_target()
    b.register_public_input(x0)
    b.register_public_input(x1)
    cur, nxt = x0, x1
    for _ in range(20):
        cur, nxt = nxt, b.add(cur, nxt)
    b.register_public_input(nxt)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x0, 0)
    pw.set_target(x1, 1)
    return data, pw


def test_zk_proof_verifies_and_hides():
    data, pw = _build()
    assert data.common.fri_params.leaf_hiding
    pwp1 = prove(data.prover_only, data.common, pw)
    verify(pwp1, data.verifier_only, data.common)

    pwp2 = prove(data.prover_only, data.common, pw)
    verify(pwp2, data.verifier_only, data.common)
    # same witness, different proofs: salts + blinding rows re-randomize
    assert not np.array_equal(pwp1.proof.wires_cap, pwp2.proof.wires_cap)


def test_min_size_reduction_strategy():
    """MinSize searches monotone arity sequences minimizing estimated
    proof size (core/src/fri.rs:92-156)."""
    from plonky2_tpu.fri.config import FriReductionStrategy, _relative_proof_size

    s = FriReductionStrategy.MinSize(None)
    arities = s.reduction_arity_bits(12, 3, 4, 28)
    assert arities, "should reduce at least once"
    assert all(arities[i] >= arities[i + 1] for i in range(len(arities) - 1))
    best = _relative_proof_size(12, 3, 28, arities)
    # beats naive constant-arity-4 sequence or ties it
    alt = FriReductionStrategy.ConstantArityBits(4, 5).reduction_arity_bits(12, 3, 4, 28)
    assert best <= _relative_proof_size(12, 3, 28, alt)
    assert s.serialize() == [2, 0]
