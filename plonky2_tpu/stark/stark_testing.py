"""STARK testing harness (reference: starky/src/stark_testing.rs).

`test_stark_low_degree` evaluates a Stark's constraints over the LDE of a
random low-degree trace and asserts the resulting degree bound.
`test_stark_algebra_consistency` replaces the reference's
`test_stark_circuit_constraints`: with single-source constraints the
host-extension, device-batch and in-circuit algebras must agree on the
same inputs (the drift the reference harness guards against is ruled out
by construction, and this checks it end-to-end anyway).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..field import goldilocks as gl
from ..gates.algebra import HostExtAlgebra
from ..utils.bits import log2_ceil, log2_strict
from .stark import ConstraintConsumer, Stark, StarkFrame

WITNESS_SIZE = 1 << 5


def _lde_matrix(rng, num_columns: int, rate_bits: int) -> np.ndarray:
    """[columns, WITNESS_SIZE << rate_bits] LDE of random degree-<WITNESS_SIZE
    columns, evaluated over the larger subgroup (no coset shift —
    stark_testing.rs random_low_degree_matrix)."""
    n = WITNESS_SIZE
    size = n << rate_bits
    coeffs = rng.integers(0, gl.P, size=(num_columns, n), dtype=np.uint64)
    out = np.zeros((num_columns, size), dtype=np.uint64)
    g = gl.primitive_root_of_unity(log2_strict(size))
    xs = np.array([gl.gexp(g, i) for i in range(size)], dtype=np.uint64)
    for c in range(num_columns):
        acc = np.zeros(size, dtype=np.uint64)
        for coeff in coeffs[c][::-1]:
            acc = gl.np_add(gl.np_mul(acc, xs), np.uint64(int(coeff)))
        out[c] = acc
    return out


def _poly_degree(values: np.ndarray) -> int:
    """Degree of the polynomial interpolating `values` on the subgroup."""
    n = len(values)
    g_inv = gl.ginv(gl.primitive_root_of_unity(log2_strict(n)))
    # coefficients via O(n^2) inverse DFT (test sizes only)
    n_inv = gl.ginv(n % gl.P)
    deg = 0
    for k in range(n - 1, -1, -1):
        acc = 0
        wk = gl.gexp(g_inv, k)
        x = 1
        for v in values:
            acc = gl.gadd(acc, gl.gmul(int(v), x))
            x = gl.gmul(x, wk)
        if gl.gmul(acc, n_inv) != 0:
            deg = k
            break
    return deg


def test_stark_low_degree(stark: Stark, public_inputs: List[int] = None, seed=0) -> None:
    """stark_testing.rs:25-74."""
    rng = np.random.default_rng(seed)
    rate_bits = log2_ceil(stark.constraint_degree() + 1)
    trace_ldes = _lde_matrix(rng, stark.num_columns(), rate_bits)
    size = trace_ldes.shape[1]
    if public_inputs is None:
        public_inputs = [
            int(x)
            for x in rng.integers(
                0, gl.P, size=stark.num_public_inputs(), dtype=np.uint64,
                endpoint=False,
            )
        ]

    n = WITNESS_SIZE
    # selector polynomials LDEs (first/last row indicators)
    g_small = gl.primitive_root_of_unity(log2_strict(n))
    g_size = gl.primitive_root_of_unity(log2_strict(size))
    xs = np.array([gl.gexp(g_size, i) for i in range(size)], dtype=np.uint64)
    zh = gl.np_sub(gl.np_exp(xs, n), np.uint64(1))
    n_mod = np.uint64(n % gl.P)
    l_first = gl.np_mul(
        zh, gl.np_batch_inverse(gl.np_mul(n_mod, gl.np_sub(xs, np.uint64(1))))
    )
    l_last = gl.np_mul(
        zh,
        gl.np_batch_inverse(
            gl.np_mul(n_mod, gl.np_sub(gl.np_mul(np.uint64(g_small), xs), np.uint64(1)))
        ),
    )
    last = gl.ginv(g_small)
    z_last = gl.np_sub(xs, np.uint64(last))

    alpha = int(rng.integers(1, 1 << 63)) % gl.P

    class _IntAlgebra:
        def const(self, c):
            return c % gl.P

        def zero(self):
            return 0

        def one(self):
            return 1

        def add(self, a, b):
            return gl.gadd(a, b)

        def sub(self, a, b):
            return gl.gsub(a, b)

        def mul(self, a, b):
            return gl.gmul(a, b)

        def neg(self, a):
            return gl.gneg(a)

        def mul_const(self, a, c):
            return gl.gmul(a, c % gl.P)

        def add_const(self, a, c):
            return gl.gadd(a, c % gl.P)

        def sub_from_const(self, c, a):
            return gl.gsub(c % gl.P, a)

        def exp_const(self, a, e):
            return gl.gexp(a, e)

    A = _IntAlgebra()
    evals = []
    step = 1 << rate_bits
    for i in range(size):
        frame = StarkFrame(
            local_values=[int(trace_ldes[c, i]) for c in range(trace_ldes.shape[0])],
            next_values=[
                int(trace_ldes[c, (i + step) % size])
                for c in range(trace_ldes.shape[0])
            ],
            public_inputs=[p % gl.P for p in public_inputs],
        )
        consumer = ConstraintConsumer(
            A, [alpha], int(z_last[i]), int(l_first[i]), int(l_last[i])
        )
        stark.eval(frame, consumer, A)
        evals.append(consumer.accumulators()[0])

    degree = _poly_degree(np.array(evals, dtype=np.uint64))
    maximum = max(WITNESS_SIZE * stark.constraint_degree() - 1, 0)
    assert degree <= maximum, (
        f"constraint degree {degree} exceeds {WITNESS_SIZE}*"
        f"{stark.constraint_degree()}-1 = {maximum}"
    )


def test_stark_algebra_consistency(stark: Stark, seed=0) -> None:
    """Host-extension vs in-circuit constraint agreement on random frames
    (the single-source analogue of test_stark_circuit_constraints,
    stark_testing.rs:77-160)."""
    from ..field import extension as ge
    from ..gates.algebra import CircuitAlgebra
    from ..iop.generator import generate_partial_witness
    from ..iop.witness import PartialWitness
    from ..plonk.circuit_builder import CircuitBuilder
    from ..plonk.config import CircuitConfig

    rng = np.random.default_rng(seed)

    def rand_ext():
        return (
            int(rng.integers(0, gl.P, dtype=np.uint64)),
            int(rng.integers(0, gl.P, dtype=np.uint64)),
        )

    C = stark.num_columns()
    local = [rand_ext() for _ in range(C)]
    nxt = [rand_ext() for _ in range(C)]
    pis = [
        int(rng.integers(0, gl.P, dtype=np.uint64))
        for _ in range(stark.num_public_inputs())
    ]
    alphas = [rand_ext(), rand_ext()]
    z_last, l_first, l_last = rand_ext(), rand_ext(), rand_ext()

    # host
    HA = HostExtAlgebra()
    frame = StarkFrame(local, nxt, [HA.const(p) for p in pis])
    consumer = ConstraintConsumer(HA, alphas, z_last, l_first, l_last)
    stark.eval(frame, consumer, HA)
    host_accs = consumer.accumulators()

    # circuit
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    CA = CircuitAlgebra(b)

    def const_ext(e):
        return b.constant_extension(tuple(e))

    frame_t = StarkFrame(
        [const_ext(e) for e in local],
        [const_ext(e) for e in nxt],
        [CA.const(p) for p in pis],
    )
    consumer_t = ConstraintConsumer(
        CA,
        [const_ext(a) for a in alphas],
        const_ext(z_last),
        const_ext(l_first),
        const_ext(l_last),
    )
    stark.eval(frame_t, consumer_t, CA)
    acc_targets = consumer_t.accumulators()
    out_targets = [b.add_virtual_extension_target() for _ in acc_targets]
    for o, a in zip(out_targets, acc_targets):
        b.connect_extension(o, a)
    data = b.build(commit=False)
    witness = generate_partial_witness(PartialWitness(), data.prover_only, data.common)
    full = witness.full_witness()
    for o, expected in zip(out_targets, host_accs):
        got = tuple(witness.get_target(t) for t in o.parts)
        assert got == tuple(expected), f"circuit {got} != host {expected}"
