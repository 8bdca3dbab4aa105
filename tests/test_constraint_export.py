"""Constraint exporter: differential test (the reference's
constraint-exporter ships the same check — symbolic DAG evaluated on
random inputs must equal the real gate eval, render.rs eval_all).

The oracle here is HostExtAlgebra at inputs embedded in the base field
component: ext ops on (x, 0) tuples close over (y, 0), so the first
component must equal the symbolic base-field evaluation and the second
must stay 0 — pinning both the exporter and the extension embedding.
"""

import numpy as np
import pytest

from plonky2_tpu.constraint_export import extract, default_gate_set, eval_all
from plonky2_tpu.constraint_export.render import emit_lets, lean_def, to_json
from plonky2_tpu.field.goldilocks import P
from plonky2_tpu.gates.algebra import EvalVars, HostExtAlgebra

GATES = default_gate_set()


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:24])
def test_symbolic_matches_host_eval(gate):
    ex = extract(gate)
    rng = np.random.default_rng(hash(gate.id()) & 0xFFFF)
    wires = [int(x) for x in rng.integers(0, P, size=max(ex.num_wires, 1), dtype=np.uint64)]
    consts = [
        int(x) for x in rng.integers(0, P, size=max(ex.num_constants, 1), dtype=np.uint64)
    ]
    pis = [int(x) for x in rng.integers(0, P, size=4, dtype=np.uint64)]

    got = eval_all(ex.constraints, wires, consts, pis)

    A = HostExtAlgebra()
    vars = EvalVars(
        local_constants=[(c, 0) for c in consts[: gate.num_constants()]],
        local_wires=[(w, 0) for w in wires[: gate.num_wires()]],
        public_inputs_hash=[(p, 0) for p in pis],
    )
    want = gate.eval_unfiltered(vars, A)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert w[1] == 0, f"constraint {i}: base-embedded eval left the base field"
        assert g == w[0], f"constraint {i}: symbolic {g} != host {w[0]}"


def test_render_lean_and_json():
    from plonky2_tpu.gates.basic import ArithmeticGate

    ex = extract(ArithmeticGate(num_ops=2))
    text = lean_def(ex)
    assert f"def {ex.name}_constraints" in text
    assert "(w 0)" in text and "let n" in text
    js = to_json([ex])
    assert ex.gate_id in js


def test_poseidon_dag_is_shared_not_exponential():
    """Hash-consing keeps Poseidon's DAG linear (the reference needs the
    let-renderer for the same reason — ~13^22 nodes if inlined)."""
    from plonky2_tpu.gates.poseidon import PoseidonGate

    ex = extract(PoseidonGate())
    assert len(ex.arena) < 200_000
    # and the let-program renders without recursion blowup, one binding
    # per reachable arithmetic node
    body = emit_lets(ex)
    assert 0 < body.count("let n") <= len(ex.arena)
