"""PoseidonGate — one full width-12 Poseidon permutation per row, with a
swap flag for Merkle-sibling ordering (reference:
plonky2/src/gates/poseidon.rs:30-553).

Wire layout (135 wires): 12 inputs | 12 outputs | swap | 4 deltas |
36 sbox inputs for full rounds 1-3 | 22 partial-round sbox inputs |
48 sbox inputs for the final 4 full rounds. Constraints are expressed
once over the abstract algebra; the witness generator replays the same
fast-partial-round schedule on host ints.
"""

from __future__ import annotations

import numpy as _np

from dataclasses import dataclass
from typing import List, Sequence

from ..field.goldilocks import P
from ..hash import poseidon_fast as pf
from ..hash.poseidon_constants import (
    HALF_N_FULL_ROUNDS,
    N_PARTIAL_ROUNDS,
    SPONGE_WIDTH,
)
from ..iop.generator import SimpleGenerator
from ..iop.target import Target
from .algebra import EvalVars
from .gate import Gate

W = SPONGE_WIDTH


@dataclass(frozen=True)
class PoseidonGate(Gate):
    WIRE_SWAP = 2 * W
    START_DELTA = 2 * W + 1
    START_FULL_0 = START_DELTA + 4
    START_PARTIAL = START_FULL_0 + W * (HALF_N_FULL_ROUNDS - 1)
    START_FULL_1 = START_PARTIAL + N_PARTIAL_ROUNDS

    def id(self) -> str:
        return f"PoseidonGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH={W}>"

    @staticmethod
    def wire_input(i: int) -> int:
        return i

    @staticmethod
    def wire_output(i: int) -> int:
        return W + i

    @classmethod
    def wire_delta(cls, i: int) -> int:
        return cls.START_DELTA + i

    @classmethod
    def wire_full_sbox_0(cls, round: int, i: int) -> int:
        assert 0 < round < HALF_N_FULL_ROUNDS
        return cls.START_FULL_0 + W * (round - 1) + i

    @classmethod
    def wire_partial_sbox(cls, round: int) -> int:
        return cls.START_PARTIAL + round

    @classmethod
    def wire_full_sbox_1(cls, round: int, i: int) -> int:
        return cls.START_FULL_1 + W * round + i

    def num_wires(self) -> int:
        return self.START_FULL_1 + W * HALF_N_FULL_ROUNDS  # 135

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 7

    def num_constraints(self) -> int:
        return (
            1 + 4 + W * (HALF_N_FULL_ROUNDS - 1) + N_PARTIAL_ROUNDS
            + W * HALF_N_FULL_ROUNDS + W
        )

    def eval_unfiltered(self, vars: EvalVars, A) -> List:
        w = vars.local_wires
        constraints = []

        swap = w[self.WIRE_SWAP]
        constraints.append(A.mul(swap, A.add_const(swap, P - 1)))

        for i in range(4):
            delta = w[self.wire_delta(i)]
            diff = A.sub(w[self.wire_input(i + 4)], w[self.wire_input(i)])
            constraints.append(A.sub(A.mul(swap, diff), delta))

        state = [None] * W
        for i in range(4):
            delta = w[self.wire_delta(i)]
            state[i] = A.add(w[self.wire_input(i)], delta)
            state[i + 4] = A.sub(w[self.wire_input(i + 4)], delta)
        for i in range(8, W):
            state[i] = w[self.wire_input(i)]

        round_ctr = 0
        for r in range(HALF_N_FULL_ROUNDS):
            state = pf.constant_layer(A, state, round_ctr)
            if r != 0:
                for i in range(W):
                    sbox_in = w[self.wire_full_sbox_0(r, i)]
                    constraints.append(A.sub(state[i], sbox_in))
                    state[i] = sbox_in
            state = [pf.sbox_monomial(A, x) for x in state]
            state = pf.mds_layer(A, state)
            round_ctr += 1

        state = pf.partial_first_constant_layer(A, state)
        state = pf.mds_partial_layer_init(A, state)
        for r in range(N_PARTIAL_ROUNDS):
            sbox_in = w[self.wire_partial_sbox(r)]
            constraints.append(A.sub(state[0], sbox_in))
            state[0] = pf.sbox_monomial(A, sbox_in)
            if r < N_PARTIAL_ROUNDS - 1:
                state[0] = A.add_const(state[0], pf.FAST_PARTIAL_ROUND_CONSTANTS[r])
            state = pf.mds_partial_layer_fast(A, state, r)
        round_ctr += N_PARTIAL_ROUNDS

        for r in range(HALF_N_FULL_ROUNDS):
            state = pf.constant_layer(A, state, round_ctr)
            for i in range(W):
                sbox_in = w[self.wire_full_sbox_1(r, i)]
                constraints.append(A.sub(state[i], sbox_in))
                state[i] = sbox_in
            state = [pf.sbox_monomial(A, x) for x in state]
            state = pf.mds_layer(A, state)
            round_ctr += 1

        for i in range(W):
            constraints.append(A.sub(state[i], w[self.wire_output(i)]))
        return constraints

    def generators(self, row: int, local_constants: Sequence[int]) -> List:
        return [PoseidonGenerator(row)]

    # -- device batch eval ----------------------------------------------------
    # Lane-stacked + lax.scan'd version of eval_unfiltered: the generic
    # scalar-per-wire trace emits ~10^5 XLA primitives (hours of compile);
    # this one emits ~10^3. Same constraints, same order; agreement with
    # eval_unfiltered is pinned by gates/gate_testing.check_algebra_agreement.

    def eval_unfiltered_device(self, vars: EvalVars, A) -> List:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..hash.poseidon_constants import ALL_ROUND_CONSTANTS
        from ..ops import gf

        w = vars.local_wires
        batch = w[0][0].shape

        def cgf(arr):  # int nest/array -> device constant limbs (exact!)
            # NB: np.array(list-of-big-python-ints) silently becomes float64
            # and corrupts low bits; go through object dtype.
            a = (np.asarray(arr, dtype=object) % P).astype(np.uint64)
            return (
                jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
            )

        def stack(cols):  # wire columns -> ([k,B],[k,B])
            return (
                jnp.stack([w[c][0] for c in cols]),
                jnp.stack([w[c][1] for c in cols]),
            )

        def unstack(a):
            return [(a[0][i], a[1][i]) for i in range(a[0].shape[0])]

        def sbox(x):
            x2 = gf.sqr(x)
            x3 = gf.mul(x, x2)
            return gf.mul(x, gf.sqr(x3))

        mds_c = cgf(pf.MDS_FULL)  # [12,12]

        def mds(state):  # [12,B] -> [12,B]
            prod = gf.mul(
                (state[0][None], state[1][None]),
                (mds_c[0][:, :, None], mds_c[1][:, :, None]),
            )  # [12,12,B]
            return gf.sum_mod_p(prod, axis=1)

        constraints: List = []
        swap = w[self.WIRE_SWAP]
        constraints.append(gf.mul(swap, gf.sub(swap, gf.ones(batch))))

        in_l = stack([self.wire_input(i) for i in range(4)])
        in_r = stack([self.wire_input(i + 4) for i in range(4)])
        deltas = stack([self.wire_delta(i) for i in range(4)])
        swap_b = (
            jnp.broadcast_to(swap[0], in_l[0].shape),
            jnp.broadcast_to(swap[1], in_l[1].shape),
        )
        dcon = gf.sub(gf.mul(swap_b, gf.sub(in_r, in_l)), deltas)
        constraints.extend(unstack(dcon))

        top = gf.add(in_l, deltas)
        bot = gf.sub(in_r, deltas)
        tail = stack([self.wire_input(i) for i in range(8, W)])
        state = (
            jnp.concatenate([top[0], bot[0], tail[0]]),
            jnp.concatenate([top[1], bot[1], tail[1]]),
        )

        rc = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(-1, W)

        # round 0 of the first full set (no sbox-input wires)
        state = mds(sbox(gf.add(state, cgf(rc[0][:, None]))))

        # full rounds with wire substitution, as a scan
        def full_scan(state, rounds, wires_cols):
            rc_c = cgf(rc[rounds][:, :, None])  # [steps,12,1]
            wires = (
                jnp.stack([stack(cols)[0] for cols in wires_cols]),
                jnp.stack([stack(cols)[1] for cols in wires_cols]),
            )  # [steps,12,B]

            def body(carry, x):
                st = carry
                rcl, rch, wl, wh = x
                st = gf.add(st, (rcl, rch))
                con = gf.sub(st, (wl, wh))
                st = mds(sbox((wl, wh)))
                return st, con

            state, cons = jax.lax.scan(
                body, state, (rc_c[0], rc_c[1], wires[0], wires[1])
            )
            out = []
            for r in range(len(rounds)):
                out.extend(unstack((cons[0][r], cons[1][r])))
            return state, out

        state, cons = full_scan(
            state,
            list(range(1, HALF_N_FULL_ROUNDS)),
            [
                [self.wire_full_sbox_0(r, i) for i in range(W)]
                for r in range(1, HALF_N_FULL_ROUNDS)
            ],
        )
        constraints.extend(cons)

        # partial rounds
        state = gf.add(
            state, cgf([[c] for c in pf.FAST_PARTIAL_FIRST_ROUND_CONSTANT])
        )
        init_c = cgf(pf.FAST_PARTIAL_ROUND_INITIAL_MATRIX)  # [11,11]
        s0 = (state[0][0], state[1][0])
        rest = (state[0][1:], state[1][1:])  # [11,B]
        prod = gf.mul(
            (rest[0][:, None], rest[1][:, None]),
            (init_c[0][:, :, None], init_c[1][:, :, None]),
        )  # [11(r),11(c),B]
        rest = gf.sum_mod_p(prod, axis=0)

        p_wires = stack([self.wire_partial_sbox(r) for r in range(N_PARTIAL_ROUNDS)])
        p_rc = cgf(pf.FAST_PARTIAL_ROUND_CONSTANTS)  # [22]
        wh_c = cgf(pf.FAST_PARTIAL_ROUND_W_HATS)  # [22,11]
        vs_c = cgf(pf.FAST_PARTIAL_ROUND_VS)  # [22,11]
        m00 = cgf([pf.MDS_0_0])

        def p_body(carry, x):
            s0l, s0h, rl, rh = carry
            wl, wh_, rcl, rch, whl, whh, vsl, vsh = x
            con = gf.sub((s0l, s0h), (wl, wh_))
            s0n = gf.add(sbox((wl, wh_)), (rcl, rch))
            terms = gf.mul((rl, rh), (whl[:, None], whh[:, None]))
            d = gf.add(
                gf.mul(s0n, (m00[0][0], m00[1][0])), gf.sum_mod_p(terms, axis=0)
            )
            s0b = (
                jnp.broadcast_to(s0n[0], rl.shape),
                jnp.broadcast_to(s0n[1], rh.shape),
            )
            rest_n = gf.add((rl, rh), gf.mul(s0b, (vsl[:, None], vsh[:, None])))
            return (d[0], d[1], rest_n[0], rest_n[1]), con

        carry, p_cons = jax.lax.scan(
            p_body,
            (s0[0], s0[1], rest[0], rest[1]),
            (
                p_wires[0], p_wires[1], p_rc[0], p_rc[1],
                wh_c[0], wh_c[1], vs_c[0], vs_c[1],
            ),
        )
        constraints.extend(unstack(p_cons))
        state = (
            jnp.concatenate([carry[0][None], carry[2]]),
            jnp.concatenate([carry[1][None], carry[3]]),
        )

        # second full set
        base = HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS
        state, cons = full_scan(
            state,
            list(range(base, base + HALF_N_FULL_ROUNDS)),
            [
                [self.wire_full_sbox_1(r, i) for i in range(W)]
                for r in range(HALF_N_FULL_ROUNDS)
            ],
        )
        constraints.extend(cons)

        outs = stack([self.wire_output(i) for i in range(W)])
        constraints.extend(unstack(gf.sub(state, outs)))
        assert len(constraints) == self.num_constraints()
        return constraints


@dataclass
class PoseidonGenerator(SimpleGenerator):
    row: int

    def id(self) -> str:
        return "PoseidonGenerator"

    def dependencies(self) -> List[Target]:
        deps = [Target.wire(self.row, PoseidonGate.wire_input(i)) for i in range(W)]
        deps.append(Target.wire(self.row, PoseidonGate.WIRE_SWAP))
        return deps

    def run_once(self, witness, out) -> None:
        g = PoseidonGate
        get = lambda col: witness.get_target(Target.wire(self.row, col))
        A = pf._IntAlgebra()

        inputs = [get(g.wire_input(i)) for i in range(W)]
        swap = get(g.WIRE_SWAP)
        # data check skipped under the witgen tracer (symbolic swap); the
        # gate constraint s(s-1)=0 enforces it in the proof either way
        assert not isinstance(swap, (int, _np.integer)) or swap in (0, 1), "swap wire must be binary"

        state = list(inputs)
        for i in range(4):
            delta = (swap * ((inputs[i + 4] - inputs[i]) % P)) % P
            out.set_wire(self.row, g.wire_delta(i), delta)
            state[i] = (inputs[i] + delta) % P
            state[i + 4] = (inputs[i + 4] - delta) % P

        round_ctr = 0
        for r in range(HALF_N_FULL_ROUNDS):
            state = pf.constant_layer(A, state, round_ctr)
            if r != 0:
                for i in range(W):
                    out.set_wire(self.row, g.wire_full_sbox_0(r, i), state[i])
            state = [pf.sbox_monomial(A, x) for x in state]
            state = pf.mds_layer(A, state)
            round_ctr += 1

        state = pf.partial_first_constant_layer(A, state)
        state = pf.mds_partial_layer_init(A, state)
        for r in range(N_PARTIAL_ROUNDS):
            out.set_wire(self.row, g.wire_partial_sbox(r), state[0])
            state[0] = pf.sbox_monomial(A, state[0])
            if r < N_PARTIAL_ROUNDS - 1:
                state[0] = (state[0] + pf.FAST_PARTIAL_ROUND_CONSTANTS[r]) % P
            state = pf.mds_partial_layer_fast(A, state, r)
        round_ctr += N_PARTIAL_ROUNDS

        for r in range(HALF_N_FULL_ROUNDS):
            state = pf.constant_layer(A, state, round_ctr)
            for i in range(W):
                out.set_wire(self.row, g.wire_full_sbox_1(r, i), state[i])
            state = [pf.sbox_monomial(A, x) for x in state]
            state = pf.mds_layer(A, state)
            round_ctr += 1

        for i in range(W):
            out.set_wire(self.row, g.wire_output(i), state[i])
