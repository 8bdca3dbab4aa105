/-
  Soundness + completeness of the MulExtensionGate constraint list.

  `MulExtensionGate { num_ops: 13 }` (gates/arithmetic_ext.py, reference
  gates/multiplication_extension.rs) packs 13 scaled quadratic-extension
  multiplies per row. The D=2 extension is F[φ]/(φ² = 7)
  (field/extension.py, reference field/src/extension/quadratic.rs); op k
  occupies wires 6k..6k+5 as (a0, a1, b0, b1, out0, out1) and constrains
  out = c0 · (a · b) componentwise:

      out0 = (a0·b0 + a1·b1·7) · c0
      out1 = (a0·b1 + a1·b0) · c0
-/
import Plonky2Spec.Basic
import Plonky2Spec.Generated.Gates

namespace Plonky2TpuSpec

variable {F : Type} [Field F]

/-- Component-0 constraint of one op, in the extracted association. -/
def mulExtOp0 (c0 a0 a1 b0 b1 out0 : F) : F :=
  out0 - (a0 * b0 + a1 * b1 * 7) * c0

/-- Component-1 constraint of one op. -/
def mulExtOp1 (c0 a0 a1 b0 b1 out1 : F) : F :=
  out1 - (a0 * b1 + a1 * b0) * c0

/-- Multiplication in F[φ]/(φ² = 7) on coefficient pairs. -/
def extMul (a b : F × F) : F × F :=
  (a.1 * b.1 + 7 * a.2 * b.2, a.1 * b.2 + a.2 * b.1)

/-- The first packed op of the generated list, pinned by `rfl`: the two
    leading constraints are exactly `mulExtOp0/1` on wires 0..5. Ops
    1..12 are the same shape shifted by 6 wires. -/
theorem mulExtensionGate_head_eq
    (w : Fin 78 → F) (c : Fin 1 → F) (pi : Fin 4 → F) :
    (Plonky2Spec.Generated.mulExtensionGate_constraints w c pi).take 2 =
      [mulExtOp0 (c 0) (w 0) (w 1) (w 2) (w 3) (w 4),
       mulExtOp1 (c 0) (w 0) (w 1) (w 2) (w 3) (w 5)] := rfl

/-- Soundness of one op: both component constraints vanishing force the
    output pair to the scaled extension product. -/
theorem mulExtOp_sound {c0 a0 a1 b0 b1 out0 out1 : F}
    (h0 : mulExtOp0 c0 a0 a1 b0 b1 out0 = 0)
    (h1 : mulExtOp1 c0 a0 a1 b0 b1 out1 = 0) :
    (out0, out1) = (c0 * (extMul (a0, a1) (b0, b1)).1,
                    c0 * (extMul (a0, a1) (b0, b1)).2) := by
  have e0 := sub_eq_zero.mp h0
  have e1 := sub_eq_zero.mp h1
  unfold extMul
  simp only [Prod.mk.injEq]
  exact ⟨by rw [e0]; ring, by rw [e1]; ring⟩

/-- Completeness: the scaled extension product satisfies both constraints. -/
theorem mulExtOp_complete (c0 a0 a1 b0 b1 : F) :
    mulExtOp0 c0 a0 a1 b0 b1 (c0 * (extMul (a0, a1) (b0, b1)).1) = 0 ∧
    mulExtOp1 c0 a0 a1 b0 b1 (c0 * (extMul (a0, a1) (b0, b1)).2) = 0 := by
  unfold mulExtOp0 mulExtOp1 extMul
  exact ⟨by ring, by ring⟩

/- The pair-level product is the ring structure the in-circuit extension
   algebra assumes (gates/ext_algebra.py): commutative, associative,
   distributive, with (1, 0) as identity. All are polynomial identities. -/

theorem extMul_comm (a b : F × F) : extMul a b = extMul b a := by
  unfold extMul
  simp only [Prod.mk.injEq]
  exact ⟨by ring, by ring⟩

theorem extMul_assoc (a b c : F × F) :
    extMul (extMul a b) c = extMul a (extMul b c) := by
  unfold extMul
  simp only [Prod.mk.injEq]
  exact ⟨by ring, by ring⟩

theorem extMul_one (a : F × F) : extMul a (1, 0) = a := by
  unfold extMul
  simp only [Prod.mk.injEq]
  exact ⟨by ring, by ring⟩

theorem extMul_left_distrib (a b c : F × F) :
    extMul a (b.1 + c.1, b.2 + c.2) =
      ((extMul a b).1 + (extMul a c).1, (extMul a b).2 + (extMul a c).2) := by
  unfold extMul
  simp only [Prod.mk.injEq]
  exact ⟨by ring, by ring⟩

end Plonky2TpuSpec
