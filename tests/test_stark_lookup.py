"""logUp lookup argument e2e: PermutationStark proves and verifies, and a
broken permutation is rejected (reference: starky/src/permutation_stark.rs
tests, lookup.rs)."""

import numpy as np
import pytest

from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fixtures import PermutationStark
from plonky2_tpu.stark.lookup import Column, lookup_helper_columns
from plonky2_tpu.stark.prover import prove as stark_prove
from plonky2_tpu.stark.verifier import verify_stark_proof
from plonky2_tpu.field import goldilocks as gl


def test_helper_columns_sum_to_zero():
    """Σ_rows (Σ h_k − m·g) must vanish for a true permutation
    (the logUp identity; lookup.rs:636-648)."""
    stark = PermutationStark(1 << 4)
    trace = stark.generate_trace(7)
    lookup = stark.lookups()[0]
    challenge = 0x1234567
    cols = lookup_helper_columns(lookup, trace, challenge, stark.constraint_degree())
    assert len(cols) == lookup.num_helper_columns(stark.constraint_degree())
    z = cols[-1]
    # wrap-around step: z[0] + last x == 0 mod P
    table = gl.np_add(
        lookup.table_column.eval_all_rows(trace), np.uint64(challenge)
    )
    tinv = gl.np_batch_inverse(table)
    x = gl.np_sub(cols[0], gl.np_mul(trace[2], tinv))
    total = 0
    for v in x:
        total = gl.gadd(total, int(v))
    assert total == 0


def test_permutation_stark_lookup_e2e():
    num_rows = 1 << 5
    stark = PermutationStark(num_rows)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(3)
    pwp = stark_prove(stark, config, trace, [3])
    verify_stark_proof(stark, pwp, config, 5)


def test_permutation_stark_broken_rejected():
    num_rows = 1 << 5
    stark = PermutationStark(num_rows)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(3)
    trace[1, 4] = gl.gadd(int(trace[1, 4]), 1)  # no longer a permutation
    with pytest.raises(Exception):
        pwp = stark_prove(stark, config, trace, [3])
        verify_stark_proof(stark, pwp, config, 5)


def test_helper_constraint_general_chunk_size_3():
    """The m>2 branch of eval_helper_columns (degree-4 configs):
    h = Σ f_i/(x+f_i-combination) must satisfy the cleared-denominator
    constraint h·Π combin_i = Σ_j f_j·Π_{i≠j} combin_i, and a corrupted
    h must not. Generalizes the reference's m=2-only batching
    (starky/src/lookup.rs:614)."""
    from plonky2_tpu.field import goldilocks as gl
    from plonky2_tpu.stark.lookup import (
        Column,
        Filter,
        GrandProductChallenge,
        eval_helper_columns,
    )

    class IntAlgebra:
        def zero(self):
            return 0

        def one(self):
            return 1

        def add(self, a, b):
            return (a + b) % gl.P

        def sub(self, a, b):
            return (a - b) % gl.P

        def mul(self, a, b):
            return (a * b) % gl.P

        def const(self, c):
            return c % gl.P

        def mul_const(self, a, c):
            return (a * c) % gl.P

        def add_const(self, a, c):
            return (a + c) % gl.P

    class Consumer:
        def __init__(self):
            self.constraints = []

        def constraint(self, c):
            self.constraints.append(c)

    A = IntAlgebra()
    local = [5, 11, 23, 1, 1, 1]  # three looked columns + three filters=1
    nxt = list(local)
    chal = GrandProductChallenge(beta=7, gamma=13)
    cols = [[Column.single(i).eval_with_next(local, nxt, A)] for i in range(3)]
    filters = [Filter.new_simple(Column.single(3 + i)) for i in range(3)]
    combins = [chal.combine(c, A) for c in cols]
    h = sum(pow(c, gl.P - 2, gl.P) for c in combins) % gl.P

    consumer = Consumer()
    # constraint_degree=4 -> chunk size 3 -> one helper column
    eval_helper_columns(
        filters, cols, local, nxt, [h], 4, chal, consumer, A
    )
    assert consumer.constraints == [0]

    consumer2 = Consumer()
    eval_helper_columns(
        filters, cols, local, nxt, [(h + 1) % gl.P], 4, chal, consumer2, A
    )
    assert consumer2.constraints[0] != 0
