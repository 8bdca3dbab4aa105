"""Compressed proof roundtrip (reference: plonk/proof.rs:130,
fibonacci_serialization example, bench_recursion compression check)."""

from plonky2_tpu.models.fibonacci import build_fibonacci
from plonky2_tpu.plonk.compressed_proof import (
    compress_proof,
    decompress_proof,
    verify_compressed_proof,
)
from plonky2_tpu.plonk.prover import prove
from plonky2_tpu.plonk.verifier import verify


def test_compressed_proof_roundtrip():
    data, pw = build_fibonacci(public_io=True)
    pwp = prove(data.prover_only, data.common, pw)
    c = compress_proof(pwp, data.verifier_only, data.common)
    # compression drops a significant share of the sibling hashes
    full_sibs = sum(
        len(mp.siblings)
        for r in pwp.proof.opening_proof.query_round_proofs
        for _, mp in r.initial_trees_proof.evals_proofs
    )
    comp_sibs = sum(
        len(p.evals_proofs[0][1].siblings)
        + len(p.evals_proofs[1][1].siblings)
        + len(p.evals_proofs[2][1].siblings)
        + len(p.evals_proofs[3][1].siblings)
        for p in c.proof.opening_proof.query_round_proofs.initial_trees_proofs.values()
    )
    assert comp_sibs < full_sibs

    full = decompress_proof(c, data.verifier_only, data.common)
    # decompressed proof must verify
    verify(full, data.verifier_only, data.common)
    verify_compressed_proof(c, data.verifier_only, data.common)
    # and must exactly reproduce the original query rounds
    for a, b in zip(
        pwp.proof.opening_proof.query_round_proofs,
        full.proof.opening_proof.query_round_proofs,
    ):
        assert a.initial_trees_proof.evals_proofs[0][0] == b.initial_trees_proof.evals_proofs[0][0]
        for sa, sb in zip(a.steps, b.steps):
            assert [tuple(e) for e in sa.evals] == [tuple(e) for e in sb.evals]
            assert [tuple(s) for s in sa.merkle_proof.siblings] == [
                tuple(s) for s in sb.merkle_proof.siblings
            ]
