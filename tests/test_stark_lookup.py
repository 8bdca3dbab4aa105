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
