"""End-to-end FRI round trip: commit -> batch-open -> verify
(mirrors the reference's fri/oracle.rs:471-501 unit e2e)."""

import numpy as np
import pytest

from plonky2_tpu.field import extension as ge
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.fri import oracle as fo
from plonky2_tpu.fri import verifier as fv
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.fri.structure import (
    FriBatchInfo,
    FriInstanceInfo,
    FriOpeningBatch,
    FriOpenings,
    FriOracleInfo,
    FriPolynomialInfo,
)
from plonky2_tpu.hash.challenger import Challenger
from plonky2_tpu.ops import gf


def _mk_config():
    return FriConfig(
        rate_bits=3,
        cap_height=2,
        proof_of_work_bits=5,
        reduction_strategy=FriReductionStrategy.ConstantArityBits(2, 3),
        num_query_rounds=12,
    )


def test_fri_e2e():
    rng = np.random.default_rng(42)
    degree_bits = 6
    n = 1 << degree_bits
    k0, k1 = 5, 3
    cfg = _mk_config()
    params = cfg.fri_params(degree_bits)

    coeffs0 = rng.integers(0, gl.P, size=(k0, n), dtype=np.uint64)
    coeffs1 = rng.integers(0, gl.P, size=(k1, n), dtype=np.uint64)
    o0 = fo.PolynomialBatch.from_coeffs(gf.from_u64(coeffs0), cfg.rate_bits, False, cfg.cap_height)
    o1 = fo.PolynomialBatch.from_coeffs(gf.from_u64(coeffs1), cfg.rate_bits, False, cfg.cap_height)
    oracles = [o0, o1]

    # instance: open all polys of both oracles at zeta; oracle1's polys also at eta
    zr = rng.integers(0, gl.P, size=4, dtype=np.uint64)
    zeta = (int(zr[0]), int(zr[1]))
    eta = (int(zr[2]), int(zr[3]))
    all_polys = FriPolynomialInfo.from_range(0, 0, k0) + FriPolynomialInfo.from_range(1, 0, k1)
    instance = FriInstanceInfo(
        oracles=[FriOracleInfo(k0, False), FriOracleInfo(k1, False)],
        batches=[
            FriBatchInfo.from_polys(zeta, all_polys),
            FriBatchInfo.from_polys(eta, FriPolynomialInfo.from_range(1, 0, k1)),
        ],
    )

    # openings (prover side evaluations)
    evals_zeta = o0.eval_all_at_ext(zeta) + o1.eval_all_at_ext(zeta)
    evals_eta = o1.eval_all_at_ext(eta)
    openings = FriOpenings(
        batches=[FriOpeningBatch(evals_zeta), FriOpeningBatch(evals_eta)]
    )

    # sanity: device evaluation matches host naive evaluation
    exp0 = _eval_host(coeffs0[0], zeta)
    assert evals_zeta[0] == exp0

    # --- prove
    prover_ch = Challenger()
    prover_ch.observe_element(12345)  # arbitrary pre-transcript
    for b in openings.batches:
        prover_ch.observe_extension_elements(b.values)
    proof = fo.prove_openings(instance, oracles, prover_ch, params)

    # --- verify
    verifier_ch = Challenger()
    verifier_ch.observe_element(12345)
    for b in openings.batches:
        verifier_ch.observe_extension_elements(b.values)
    challenges = fv.fri_challenges(
        verifier_ch,
        proof.commit_phase_merkle_caps,
        proof.final_poly,
        proof.pow_witness,
        degree_bits,
        cfg,
    )
    caps = [o.cap_u64() for o in oracles]
    fv.verify_fri_proof(instance, openings, challenges, caps, proof, params)

    # --- tamper detection: corrupt an opening
    bad = FriOpenings(
        batches=[
            FriOpeningBatch([(evals_zeta[0][0] ^ 1, evals_zeta[0][1])] + evals_zeta[1:]),
            FriOpeningBatch(evals_eta),
        ]
    )
    with pytest.raises(fv.FriVerificationError):
        fv.verify_fri_proof(instance, bad, challenges, caps, proof, params)


def _eval_host(coeffs_row, zeta):
    acc = ge.ext_zero(2)
    for c in reversed([int(x) for x in coeffs_row]):
        acc = ge.ext_add(ge.ext_mul(acc, zeta), ge.from_base(c, 2))
    return acc


def test_fused_unfused_fri_bit_equality(monkeypatch):
    """The fused single-dispatch FRI program and the host-challenger
    unfused path must produce byte-identical proofs (pins the traced
    transcript bookkeeping to the host duplex, VERDICT r1 weak #7)."""
    from plonky2_tpu.models.fibonacci import build_fibonacci
    from plonky2_tpu.utils.serialization import proof_to_bytes

    data, pw = build_fibonacci(public_io=False)
    monkeypatch.setenv("PLONKY2_TPU_FUSED_FRI", "1")
    fused = data.prove(pw)
    monkeypatch.setenv("PLONKY2_TPU_FUSED_FRI", "0")
    unfused = data.prove(pw)
    data.verify(unfused)
    assert proof_to_bytes(fused, data.common) == proof_to_bytes(unfused, data.common)
