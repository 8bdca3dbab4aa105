/-
  Soundness + completeness of the ArithmeticGate constraint list.

  `ArithmeticGate { num_ops: 20 }` packs 20 multiply-add ops per row
  (gates/basic.py ArithmeticGate, reference gates/arithmetic_base.rs:77-93);
  op k occupies wires 4k..4k+3 as (m0, m1, addend, output) and the extracted
  constraint is `output - (m0*m1*c0 + addend*c1)`.

  The proof strategy is drift-proof by construction: `constraints_eq` pins
  the auto-generated straight-line definition to the op-shaped spec by
  `rfl` (pure definitional unfolding — if the exporter or the live gate
  algebra changes shape, this theorem stops compiling), and everything else
  is proved about the spec.
-/
import Plonky2Spec.Basic
import Plonky2Spec.Generated.Gates

namespace Plonky2TpuSpec

variable {F : Type} [Field F]

/-- One packed multiply-add op's constraint, in the exact association the
    exporter emits: `out - (m0*m1*c0 + addend*c1)`. -/
def arithOp (c0 c1 m0 m1 addend out : F) : F :=
  out - (m0 * m1 * c0 + addend * c1)

/-- The generated constraint list IS twenty `arithOp`s over consecutive
    wire quads. Proof is definitional. -/
theorem arithmeticGate_constraints_eq
    (w : Fin 80 → F) (c : Fin 2 → F) (pi : Fin 4 → F) :
    Plonky2Spec.Generated.arithmeticGate_constraints w c pi =
      [arithOp (c 0) (c 1) (w 0) (w 1) (w 2) (w 3),
       arithOp (c 0) (c 1) (w 4) (w 5) (w 6) (w 7),
       arithOp (c 0) (c 1) (w 8) (w 9) (w 10) (w 11),
       arithOp (c 0) (c 1) (w 12) (w 13) (w 14) (w 15),
       arithOp (c 0) (c 1) (w 16) (w 17) (w 18) (w 19),
       arithOp (c 0) (c 1) (w 20) (w 21) (w 22) (w 23),
       arithOp (c 0) (c 1) (w 24) (w 25) (w 26) (w 27),
       arithOp (c 0) (c 1) (w 28) (w 29) (w 30) (w 31),
       arithOp (c 0) (c 1) (w 32) (w 33) (w 34) (w 35),
       arithOp (c 0) (c 1) (w 36) (w 37) (w 38) (w 39),
       arithOp (c 0) (c 1) (w 40) (w 41) (w 42) (w 43),
       arithOp (c 0) (c 1) (w 44) (w 45) (w 46) (w 47),
       arithOp (c 0) (c 1) (w 48) (w 49) (w 50) (w 51),
       arithOp (c 0) (c 1) (w 52) (w 53) (w 54) (w 55),
       arithOp (c 0) (c 1) (w 56) (w 57) (w 58) (w 59),
       arithOp (c 0) (c 1) (w 60) (w 61) (w 62) (w 63),
       arithOp (c 0) (c 1) (w 64) (w 65) (w 66) (w 67),
       arithOp (c 0) (c 1) (w 68) (w 69) (w 70) (w 71),
       arithOp (c 0) (c 1) (w 72) (w 73) (w 74) (w 75),
       arithOp (c 0) (c 1) (w 76) (w 77) (w 78) (w 79)] := rfl

/-- Soundness of one op: the constraint vanishing forces the output wire
    to the weighted multiply-add. -/
theorem arithOp_sound {c0 c1 m0 m1 addend out : F}
    (h : arithOp c0 c1 m0 m1 addend out = 0) :
    out = c0 * m0 * m1 + c1 * addend := by
  have h' := sub_eq_zero.mp h
  rw [h']; ring

/-- Completeness: the intended output satisfies the constraint. -/
theorem arithOp_complete (c0 c1 m0 m1 addend : F) :
    arithOp c0 c1 m0 m1 addend (c0 * m0 * m1 + c1 * addend) = 0 := by
  unfold arithOp; ring

/-- The iff form: one op's constraint vanishes exactly on the graph of the
    multiply-add function. -/
theorem arithOp_iff {c0 c1 m0 m1 addend out : F} :
    arithOp c0 c1 m0 m1 addend out = 0 ↔
      out = c0 * m0 * m1 + c1 * addend := by
  constructor
  · exact arithOp_sound
  · intro h; rw [h]; exact arithOp_complete c0 c1 m0 m1 addend

/-- Gate-level soundness for the first packed op (the others are the same
    statement shifted by 4k; `arithmeticGate_constraints_eq` exposes all
    twenty). -/
theorem arithmeticGate_op0_sound
    {w : Fin 80 → F} {c : Fin 2 → F} {pi : Fin 4 → F}
    (h : Vanishing (Plonky2Spec.Generated.arithmeticGate_constraints w c pi)) :
    w 3 = c 0 * w 0 * w 1 + c 1 * w 2 := by
  rw [arithmeticGate_constraints_eq] at h
  exact arithOp_sound ((vanishing_cons.mp h).1)

/-
  Builder-primitive specs. Each CircuitBuilder arithmetic primitive
  (plonk/circuit_builder.py:293-334, reference gadgets/arithmetic.rs)
  is one `arithOp` with fixed constants:
    mul x y      = arithmetic(1, 0, x, y, x)
    add x y      = arithmetic(1, 1, x, 1, y)
    sub x y      = arithmetic(1, -1, x, 1, y)
    mul_add x y z = arithmetic(1, 1, x, y, z)
-/

theorem mul_spec {x y out : F} (h : arithOp 1 0 x y x out = 0) :
    out = x * y := by
  have := arithOp_sound h; rw [this]; ring

theorem add_spec {x y out : F} (h : arithOp 1 1 x 1 y out = 0) :
    out = x + y := by
  have := arithOp_sound h; rw [this]; ring

theorem sub_spec {x y out : F} (h : arithOp 1 (-1) x 1 y out = 0) :
    out = x - y := by
  have := arithOp_sound h; rw [this]; ring

theorem mulAdd_spec {x y z out : F} (h : arithOp 1 1 x y z out = 0) :
    out = x * y + z := by
  have := arithOp_sound h; rw [this]; ring

/-- The builder encodes `sub`'s -1 as the Goldilocks numeral P-1
    (circuit_builder.py:318-320 `gl.P - 1`); over ZMod P that is the same
    constraint as `arithOp 1 (-1)`. -/
theorem sub_spec_goldilocks [Fact (Nat.Prime goldilocksP)]
    {x y out : ZMod goldilocksP}
    (h : arithOp 1 (18446744069414584320 : ZMod goldilocksP) x 1 y out = 0) :
    out = x - y := by
  rw [goldilocks_neg_one] at h
  exact sub_spec h

end Plonky2TpuSpec
