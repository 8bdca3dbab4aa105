"""Constraint exporter: symbolic extraction of gate constraints from the
live gate code, rendered to Lean + JSON (reference constraint-exporter
crate + formal/ Lean bridge).

    python -m plonky2_tpu.constraint_export   # writes formal/Plonky2Spec/Generated/
"""

from .extract import Extracted, default_gate_set, extract, extract_all
from .symbolic import SymbolicAlgebra, eval_all, reset

__all__ = [
    "Extracted",
    "SymbolicAlgebra",
    "default_gate_set",
    "eval_all",
    "extract",
    "extract_all",
    "reset",
]
