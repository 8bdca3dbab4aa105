"""Device-resident Fiat-Shamir challenger: the same overwrite-mode duplex
as hash/challenger.py (core/src/challenger.rs semantics), but with the
sponge state and all observed elements living on device as traced values.

Because the transcript SEQUENCE of a fixed circuit is static (how many
elements are observed, when challenges are squeezed), all buffer
bookkeeping is host-side Python over traced scalars — only the permute
is device work. This lets a whole FRI commit phase (caps → betas →
folds) run as ONE compiled program with no host round trips
(fri/prover.py fused path).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from ..ops import gf
from .poseidon import SPONGE_RATE, SPONGE_WIDTH

Scalar = Tuple  # (lo, hi) scalar u32 pair


class DeviceChallenger:
    def __init__(self, state: List[Scalar], input_buffer: List[Scalar]):
        assert len(state) == SPONGE_WIDTH
        self.state = list(state)
        self.input_buffer = list(input_buffer)
        self.output_buffer: List[Scalar] = []

    @staticmethod
    def from_host(challenger) -> "DeviceChallenger":
        """Seed from a host challenger; outputs are NOT carried over (the
        fused phase must start with a deterministic buffer: callers flush
        by only fusing at observe-boundary points, where any buffered
        outputs would be cleared by the first observe anyway)."""

        def pair(x):
            return (
                jnp.uint32(int(x) & 0xFFFFFFFF),
                jnp.uint32(int(x) >> 32),
            )

        # state/in-buffer arrive as traced device args in the fused jit;
        # this helper is for eager use/testing
        return DeviceChallenger(
            [pair(x) for x in challenger.sponge_state],
            [pair(x) for x in challenger.input_buffer],
        )

    @staticmethod
    def from_arrays(state: gf.Gf, input_buffer: gf.Gf, in_len: int) -> "DeviceChallenger":
        """state: [12] limb pair; input_buffer: [8] limb pair with the
        first `in_len` entries meaningful (static)."""
        st = [(state[0][i], state[1][i]) for i in range(SPONGE_WIDTH)]
        ib = [(input_buffer[0][i], input_buffer[1][i]) for i in range(in_len)]
        return DeviceChallenger(st, ib)

    # -- duplex ----------------------------------------------------------------

    def _duplex(self) -> None:
        from ..ops import poseidon as dp

        assert len(self.input_buffer) <= SPONGE_RATE
        for i, x in enumerate(self.input_buffer):
            self.state[i] = x
        self.input_buffer.clear()
        lo = jnp.stack([s[0] for s in self.state])[None, :]
        hi = jnp.stack([s[1] for s in self.state])[None, :]
        olo, ohi = dp.permute((lo, hi))
        self.state = [(olo[0, i], ohi[0, i]) for i in range(SPONGE_WIDTH)]
        self.output_buffer = list(self.state[:SPONGE_RATE])

    def observe_element(self, x: Scalar) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(x)
        if len(self.input_buffer) == SPONGE_RATE:
            self._duplex()

    def observe_elements(self, xs) -> None:
        for x in xs:
            self.observe_element(x)

    def observe_cap_rows(self, cap: gf.Gf) -> None:
        """cap: [m, 4] limb pair."""
        m = cap[0].shape[0]
        for i in range(m):
            for j in range(4):
                self.observe_element((cap[0][i, j], cap[1][i, j]))

    def observe_extension(self, e) -> None:
        self.observe_element(e[0])
        self.observe_element(e[1])

    def get_challenge(self) -> Scalar:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_extension_challenge(self) -> Tuple[Scalar, Scalar]:
        return (self.get_challenge(), self.get_challenge())

    # -- handoff back to the host challenger ----------------------------------

    def export(self):
        """(state [12] limb pair, num buffered outputs) — the host
        challenger resumes from these after the fused program returns."""
        lo = jnp.stack([s[0] for s in self.state])
        hi = jnp.stack([s[1] for s in self.state])
        return (lo, hi), len(self.output_buffer), len(self.input_buffer)

    def export_full(self):
        """(state [12] pair, input buffer padded to [RATE] pair, in_len):
        everything a later jit needs to resume this transcript mid-absorb
        (the cross-phase handoff of the device-transcript prover)."""
        lo = jnp.stack([s[0] for s in self.state])
        hi = jnp.stack([s[1] for s in self.state])
        n_in = len(self.input_buffer)
        zero = jnp.zeros((), jnp.uint32)
        buf = self.input_buffer + [(zero, zero)] * (SPONGE_RATE - n_in)
        blo = jnp.stack([b[0] for b in buf])
        bhi = jnp.stack([b[1] for b in buf])
        return (lo, hi), (blo, bhi), n_in


class DeviceChallengerState:
    """A challenger whose state lives on device between jit dispatches —
    chaining token of the device-transcript prover (no host syncs)."""

    def __init__(self, state, input_buffer, in_len: int):
        self.state = state  # [12] limb pair (device)
        self.input_buffer = input_buffer  # [RATE] limb pair (device)
        self.in_len = in_len  # static

    @staticmethod
    def from_host(challenger) -> "DeviceChallengerState":
        import numpy as np

        state_u64 = np.array(challenger.sponge_state, dtype=np.uint64)
        inbuf_u64 = np.zeros(SPONGE_RATE, dtype=np.uint64)
        in_len = len(challenger.input_buffer)
        if in_len:
            inbuf_u64[:in_len] = np.array(challenger.input_buffer, dtype=np.uint64)
        return DeviceChallengerState(
            gf.from_u64(state_u64), gf.from_u64(inbuf_u64), in_len
        )
