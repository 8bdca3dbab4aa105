"""bench_recursion: a dummy inner proof of 2^size gates, a chain of
shrinking recursive proofs, then serialization + compression checks
(reference: plonky2/examples/bench_recursion.rs:91-366).

Run:  PYTHONPATH=/root/repo python -m plonky2_tpu.models.bench_recursion --size 12
"""

from __future__ import annotations

import argparse
import time
from typing import Tuple

from ..gates.basic import NoopGate
from ..iop.witness import PartialWitness
from ..plonk.circuit_builder import CircuitBuilder
from ..plonk.config import CircuitConfig
from ..plonk.proof_target import add_virtual_proof_with_pis, set_proof_with_pis_target
from ..plonk.prover import prove
from ..plonk.recursive_verifier import (
    add_virtual_verifier_data,
    set_verifier_data_target,
    verify_proof_circuit,
)
from ..plonk.verifier import verify
from ..utils.timing import TimingTree

ProofTuple = Tuple[object, object, object]  # (pwp, verifier_only, common)


def dummy_proof(config: CircuitConfig, log2_size: int, timing=None) -> ProofTuple:
    """(bench_recursion.rs:91-122)."""
    assert log2_size >= 1
    num_dummy_gates = {1: 0, 2: 1}.get(log2_size, (1 << (log2_size - 1)) + 1)
    b = CircuitBuilder(config)
    for _ in range(num_dummy_gates):
        b.add_gate(NoopGate(), [])
    data = b.build()
    pwp = prove(data.prover_only, data.common, PartialWitness())
    verify(pwp, data.verifier_only, data.common)
    return pwp, data.verifier_only, data.common


def recursive_proof(
    inner: ProofTuple, config: CircuitConfig, min_degree_bits=None
) -> ProofTuple:
    """(bench_recursion.rs:223-272)."""
    inner_proof, inner_vd, inner_cd = inner
    b = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(b, inner_cd)
    vd_t = add_virtual_verifier_data(b, inner_cd.fri_params.config.cap_height)
    verify_proof_circuit(b, pt, vd_t, inner_cd)
    if min_degree_bits is not None:
        min_gates = (1 << (min_degree_bits - 1)) + 1
        while b.num_gates() < min_gates:
            b.add_gate(NoopGate(), [])
    data = b.build()
    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vd_t, inner_vd)
    pwp = prove(data.prover_only, data.common, pw)
    verify(pwp, data.verifier_only, data.common)
    return pwp, data.verifier_only, data.common


def test_serialization(pwp, vd, common) -> dict:
    """Roundtrip the proof, compressed proof and common data through the
    wire format; returns size info (bench_recursion.rs:274-330)."""
    from ..plonk.compressed_proof import compress_proof, decompress_proof
    from ..utils.serialization import (
        common_data_from_bytes,
        common_data_to_bytes,
        proof_from_bytes,
        proof_to_bytes,
    )

    raw = proof_to_bytes(pwp, common)
    back = proof_from_bytes(raw, common)
    assert back.public_inputs == pwp.public_inputs

    t0 = time.perf_counter()
    compressed = compress_proof(pwp, vd, common)
    decompressed = decompress_proof(compressed, vd, common)
    compress_s = time.perf_counter() - t0
    assert decompressed.public_inputs == pwp.public_inputs

    cd_bytes = common_data_to_bytes(common)
    common2 = common_data_from_bytes(cd_bytes)
    assert common2.trace_degree_bits == common.trace_degree_bits

    return {
        "proof_bytes": len(raw),
        "compress_seconds": compress_s,
        "common_data_bytes": len(cd_bytes),
    }


def benchmark(config: CircuitConfig, log2_inner_size: int, verbose: bool = True):
    timing = TimingTree("bench_recursion")
    with timing.scope("inner dummy proof"):
        inner = dummy_proof(config, log2_inner_size)
    if verbose:
        print(f"inner degree: 2^{inner[2].degree_bits}")

    with timing.scope("recursive shrink 1"):
        middle = recursive_proof(inner, config)
    if verbose:
        print(f"single recursion degree: 2^{middle[2].degree_bits}")

    with timing.scope("recursive shrink 2"):
        outer = recursive_proof(middle, config)
    if verbose:
        print(f"double recursion degree: 2^{outer[2].degree_bits}")

    with timing.scope("serialization + compression"):
        info = test_serialization(*outer)
    if verbose:
        print(info)
        timing.print()
    return outer, info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=12, help="log2 inner circuit size")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args()
    benchmark(
        CircuitConfig.standard_recursion_config(), args.size, verbose=not args.quiet
    )


if __name__ == "__main__":
    main()
