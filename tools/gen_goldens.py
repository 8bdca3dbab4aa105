"""Generate the golden full-proof byte corpus (tests/golden/*.bin).

Each example circuit is deterministic end to end (exact field
arithmetic, smallest-witness PoW grind, fixed Fiat-Shamir transcript),
so its proof bytes + common-data bytes are stable across machines and
backends. tests/test_golden_corpus.py pins these bytes: any drift in
the wire format (util/serialization/mod.rs dual), the transcript, or
the prover pipeline fails that test at full-proof granularity.

Run from the repo root after an INTENDED format/transcript change:
    JAX_PLATFORMS=cpu python tools/gen_goldens.py
and commit the updated .bin files with the change that caused them.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# XLA:CPU's fusion pass miscompiles certain fused kernels on 1-vCPU
# hosts into infinite loops (see tests/conftest.py) — always disable.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_disable_hlo_passes" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_disable_hlo_passes=fusion").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)


def _cases():
    from plonky2_tpu.models.examples import build_range_check, build_square_root
    from plonky2_tpu.models.fibonacci import build_fibonacci

    return {
        "fibonacci": lambda: build_fibonacci(public_io=True),
        "range_check": lambda: build_range_check(),
        "square_root": lambda: build_square_root()[:2],
    }


def main() -> None:
    from plonky2_tpu.utils.serialization import (
        common_data_to_bytes,
        proof_to_bytes,
    )

    for name, build in _cases().items():
        data, pw = build()
        pwp = data.prove(pw)
        data.verify(pwp)
        proof_path = os.path.join(GOLDEN_DIR, f"{name}_proof.bin")
        common_path = os.path.join(GOLDEN_DIR, f"{name}_common.bin")
        with open(proof_path, "wb") as f:
            f.write(proof_to_bytes(pwp, data.common))
        with open(common_path, "wb") as f:
            f.write(common_data_to_bytes(data.common))
        print(
            f"{name}: proof {os.path.getsize(proof_path)} B, "
            f"common {os.path.getsize(common_path)} B"
        )


if __name__ == "__main__":
    main()
