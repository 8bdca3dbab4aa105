"""plonky2_tpu — a TPU-native recursive SNARK/STARK proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
qp-plonky2 (Quantus-Network fork of plonky2): Goldilocks field
arithmetic, NTT/LDE, Poseidon hashing, Merkle commitments, FRI
low-degree testing, a TurboPLONK-style prover with custom gates,
recursion, and STARKs.

Architecture (TPU-first, not a port):
  - Data plane: batched u32-limb Goldilocks arrays on device
    (``plonky2_tpu.ops``), jit/shard_map kernels, Pallas for hot ops.
  - Control plane: circuit builder, witness generation and the
    Fiat-Shamir transcript run on host (``plonky2_tpu.field`` scalar
    math mirrors the device kernels bit-exactly).
  - Multi-chip: polynomial batches shard over a ``jax.sharding.Mesh``;
    Merkle subtrees per-chip with an all-gather cap reduction
    (``plonky2_tpu.parallel``).

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
