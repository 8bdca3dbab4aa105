"""Regenerate the pinned single-chip fibonacci proof that
__graft_entry__.dryrun_multichip compares the mesh proof against.

The proof is fully deterministic: exact integer arithmetic (backend-
independent), a deterministic builder, and a smallest-witness PoW grind
(ops/fri_kernels.py pow_grind). Run on the CPU backend so the bytes
match what the dryrun environment produces:

    JAX_PLATFORMS=cpu python tools/regen_golden_dryrun.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_disable_hlo_passes" not in flags:
    # same workaround set as __graft_entry__.py: XLA:CPU fusion
    # miscompiles, and the algebraic simplifier loops for 50 pass runs
    # on the big prover programs (reproduced 2026-08-19 in this script)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_disable_hlo_passes=fusion,algsimp"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from plonky2_tpu.models.fibonacci import build_fibonacci  # noqa: E402
from plonky2_tpu.plonk.prover import prove  # noqa: E402
from plonky2_tpu.plonk.verifier import verify  # noqa: E402
from plonky2_tpu.utils.serialization import proof_to_bytes  # noqa: E402

data, pw = build_fibonacci(public_io=True)
pwp = prove(data.prover_only, data.common, pw)
verify(pwp, data.verifier_only, data.common)
out = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "tests", "golden", "fibonacci_dryrun_proof.bin",
)
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "wb") as f:
    f.write(proof_to_bytes(pwp, data.common))
print(f"wrote {os.path.normpath(out)} ({os.path.getsize(out)} bytes)")
