/-
  Bridge theorems: from auto-extracted gate constraints to builder-level
  semantics.

  The per-gate files (Plonky2Spec/*.lean) prove each generated constraint
  list equivalent to an op-shaped spec. This file composes those specs the
  way CircuitBuilder composes gate rows through copy constraints: a routed
  wire carrying a value from one op's output to another op's input chains
  the specs. The capstone shows a two-op arithmetic chain computes
  x*y + z*w end to end — the minimal instance of the wiring argument the
  prover's permutation argument enforces globally.

  Counterpart of the reference's formal/Plonky2Bridge.lean (different
  package, same role: pin the generated artifacts to human-readable
  semantics so drift is a compile error).
-/
import Plonky2Spec.Basic
import Plonky2Spec.Arithmetic
import Plonky2Spec.BaseSum
import Plonky2Spec.MulExtension

namespace Plonky2TpuSpec

variable {F : Type} [Field F]

/-- Wiring composition: if op A's output wire is copy-constrained to op
    B's addend wire (the copy constraint makes them the SAME field value),
    a `mul` op feeding a `mul_add` op computes x*y + z*w. This is the
    builder chain `mul_add(z, w, mul(x, y))`
    (plonk/circuit_builder.py:311-323). -/
theorem arithmetic_chain_sound {x y z w m out : F}
    (hA : arithOp 1 0 x y x m = 0)      -- m = mul(x, y)
    (hB : arithOp 1 1 z w m out = 0) :  -- out = mul_add(z, w, m)
    out = x * y + z * w := by
  have hm : m = x * y := mul_spec hA
  have ho : out = z * w + m := mulAdd_spec hB
  rw [ho, hm]; ring

/-- A vanishing ArithmeticGate row whose constants are the builder's
    `mul` constants (c0 = 1, c1 = 0) forces EVERY packed op's output to
    the product of its multiplicands — the row-level reading of
    `arithmeticGate_constraints_eq`. Shown for the first op; the list
    equality exposes the other nineteen identically. -/
theorem arithmeticGate_mul_row_sound
    {w : Fin 80 → F} {pi : Fin 4 → F}
    (h : Vanishing (Plonky2Spec.Generated.arithmeticGate_constraints w
      (fun i => if i = 0 then 1 else 0) pi)) :
    w 3 = w 0 * w 1 := by
  have h0 := arithmeticGate_op0_sound h
  simp only [reduceIte] at h0
  rw [h0]; ring

/-- Capstone: binary decomposition feeding an arithmetic op. If a
    BaseSumGate row vanishes (so wire 0 is the bit-recombination) and an
    arithmetic `mul` op consumes that sum, the product is the product of
    the recombined value — the two generated artifacts compose through
    one routed wire. -/
theorem decompose_then_multiply_sound
    (hneg : (18446744069414584320 : F) = -1)
    {wb : Fin 64 → F} {c : Fin 1 → F} {pi : Fin 4 → F} {y out : F}
    (hb : Vanishing (Plonky2Spec.Generated.baseSumGate_constraints wb c pi))
    (hm : arithOp 1 0 (wb 0) y (wb 0) out = 0) :
    out = horner2 wb * y ∧ ∀ i : Fin 63, wb i.succ = 0 ∨ wb i.succ = 1 := by
  obtain ⟨hsum, hbits⟩ := baseSumGate_sound hneg hb
  refine ⟨?_, hbits⟩
  have := mul_spec hm
  rw [this, hsum]

end Plonky2TpuSpec
