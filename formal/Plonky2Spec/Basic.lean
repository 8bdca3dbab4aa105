/-
  Shared machinery for the gate-constraint proofs.

  The generated definitions (Plonky2Spec/Generated/Gates.lean, emitted by
  `python -m plonky2_tpu.constraint_export` from the live single-source gate
  algebra, gates/algebra.py) return a `List F` of constraint polynomials; a
  witness row satisfies a gate iff every entry vanishes. This file defines
  that satisfaction predicate and the field lemmas the per-gate proofs lean
  on (difference-vanishing, the bit dichotomy, and the Goldilocks numeral
  for -1 that the exporter emits for subtraction-by-constant).
-/
import Mathlib.Data.ZMod.Basic
import Mathlib.Tactic.Ring
import Mathlib.Tactic.NormNum

namespace Plonky2TpuSpec

/-- The Goldilocks modulus 2^64 - 2^32 + 1 (field/goldilocks.py:P,
    reference field/src/goldilocks_field.rs). -/
def goldilocksP : ℕ := 18446744069414584321

/-- A gate row is satisfied when every extracted constraint vanishes. -/
def Vanishing {F : Type} [Zero F] (l : List F) : Prop := ∀ x ∈ l, x = 0

variable {F : Type}

theorem vanishing_nil [Zero F] : Vanishing ([] : List F) := by
  intro x hx
  cases hx

theorem vanishing_cons [Zero F] {x : F} {l : List F} :
    Vanishing (x :: l) ↔ x = 0 ∧ Vanishing l := by
  constructor
  · intro h
    exact ⟨h x (List.mem_cons_self ..), fun y hy => h y (List.mem_cons_of_mem x hy)⟩
  · rintro ⟨hx, hl⟩ y hy
    rcases List.mem_cons.mp hy with h | h
    · rw [h]; exact hx
    · exact hl y h

theorem vanishing_nil_iff [Zero F] : Vanishing ([] : List F) ↔ True :=
  iff_true_intro vanishing_nil

/-- The bit dichotomy: in an integral domain, x * (x - 1) = 0 forces
    x ∈ {0, 1}. This is the soundness core of every binary-decomposition
    gate (BaseSumGate base 2, ExponentiationGate power bits). -/
theorem bit_of_mul_sub_one [Field F] {x : F} (h : x * (x - 1) = 0) :
    x = 0 ∨ x = 1 := by
  rcases mul_eq_zero.mp h with h0 | h1
  · exact Or.inl h0
  · exact Or.inr (sub_eq_zero.mp h1)

theorem mul_sub_one_of_bit [Field F] {x : F} (h : x = 0 ∨ x = 1) :
    x * (x - 1) = 0 := by
  rcases h with h | h <;> rw [h] <;> ring

/-- The exporter prints subtraction of 1 as addition of the numeral
    P - 1; over the Goldilocks field that numeral IS -1. (Needs only the
    ZMod ring structure, not primality.) -/
theorem goldilocks_neg_one :
    (18446744069414584320 : ZMod goldilocksP) = -1 := by
  have hp : ((18446744069414584321 : ℕ) : ZMod goldilocksP) = 0 :=
    ZMod.natCast_self goldilocksP
  rw [Nat.cast_ofNat] at hp
  have h : (18446744069414584320 : ZMod goldilocksP) + 1 = 0 := by
    rw [← hp]; norm_num
  exact eq_neg_of_add_eq_zero_left h

end Plonky2TpuSpec
