"""Cross-table lookups e2e: a two-table multi-STARK system where both
value columns of table 0 look into the flagged rows of table 1
(reference machinery: starky/src/cross_table_lookup.rs)."""

import numpy as np
import pytest

from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.cross_table_lookup import (
    CrossTableLookup,
    CtlVerificationError,
    TableWithColumns,
    check_ctls,
)
from plonky2_tpu.stark.fixtures import CtlLookedStark, CtlLookingStark
from plonky2_tpu.stark.lookup import Column, Filter
from plonky2_tpu.stark.multi import prove_all_tables, verify_all_tables


def _system(num_a=1 << 5, num_b=1 << 7, x0=100):
    stark_a = CtlLookingStark(num_a)
    stark_b = CtlLookedStark(num_b)
    trace_a = stark_a.generate_trace(x0)
    # looked values: both columns of A, shuffled deterministically
    values = [int(v) for v in trace_a[0]] + [int(v) for v in trace_a[1]]
    rng = np.random.default_rng(0)
    values = [values[i] for i in rng.permutation(len(values))]
    trace_b = stark_b.generate_trace(values)
    ctls = [
        CrossTableLookup(
            looking_tables=[
                TableWithColumns(0, [Column.single(0)], Filter.default()),
                TableWithColumns(0, [Column.single(1)], Filter.default()),
            ],
            looked_table=TableWithColumns(
                1, [Column.single(0)], Filter.new_simple(Column.single(1))
            ),
        )
    ]
    return [stark_a, stark_b], [trace_a, trace_b], ctls


def test_check_ctls_debug():
    starks, traces, ctls = _system()
    check_ctls(traces, ctls)
    bad = [traces[0].copy(), traces[1]]
    bad[0][0, 3] = gl.gadd(int(bad[0][0, 3]), 1)
    with pytest.raises(CtlVerificationError):
        check_ctls(bad, ctls)


def test_ctl_two_table_e2e():
    starks, traces, ctls = _system()
    config = StarkConfig.standard_fast_config()
    proofs = prove_all_tables(starks, config, traces, [[], []], ctls)
    verify_all_tables(starks, config, proofs, ctls, [5, 7])


def test_ctl_broken_rejected():
    starks, traces, ctls = _system()
    config = StarkConfig.standard_fast_config()
    traces[1][0, 2] = gl.gadd(int(traces[1][0, 2]), 1)  # corrupt looked table
    with pytest.raises(Exception):
        proofs = prove_all_tables(starks, config, traces, [[], []], ctls)
        verify_all_tables(starks, config, proofs, ctls, [5, 7])
