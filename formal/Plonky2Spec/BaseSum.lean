/-
  Soundness of the BaseSumGate (base 2, 63 limbs) constraint list.

  `BaseSumGate` (gates/base_sum.py, reference gates/base_sum.rs) constrains
  wire 0 to equal the base-2 Horner recombination of limb wires 1..63 and
  each limb to be a bit. The exporter emits the Horner chain from the most
  significant limb down and prints `x - 1` as `x + (P-1)`; `constraints_eq`
  pins that exact shape by `rfl`, so any drift in the live gate algebra
  breaks this file at compile time.
-/
import Plonky2Spec.Basic
import Plonky2Spec.Generated.Gates

namespace Plonky2TpuSpec

variable {F : Type} [Field F]

/-- A bit constraint as the exporter prints it: `x * (x + (P-1))`. -/
def bitCon (x : F) : F := x * (x + 18446744069414584320)

/-- The base-2 Horner recombination of limbs w 1 .. w 63 (most
    significant first), exactly as extracted. -/
def horner2 (w : Fin 64 → F) : F :=
  (((((((((((((((((((((((((((((((((((((((((((((((((((((((((((((w 63 * 2 + w 62) * 2 + w 61) * 2 + w 60) * 2 + w 59) * 2 + w 58) * 2 + w 57) * 2 + w 56) * 2 + w 55) * 2 + w 54) * 2 + w 53) * 2 + w 52) * 2 + w 51) * 2 + w 50) * 2 + w 49) * 2 + w 48) * 2 + w 47) * 2 + w 46) * 2 + w 45) * 2 + w 44) * 2 + w 43) * 2 + w 42) * 2 + w 41) * 2 + w 40) * 2 + w 39) * 2 + w 38) * 2 + w 37) * 2 + w 36) * 2 + w 35) * 2 + w 34) * 2 + w 33) * 2 + w 32) * 2 + w 31) * 2 + w 30) * 2 + w 29) * 2 + w 28) * 2 + w 27) * 2 + w 26) * 2 + w 25) * 2 + w 24) * 2 + w 23) * 2 + w 22) * 2 + w 21) * 2 + w 20) * 2 + w 19) * 2 + w 18) * 2 + w 17) * 2 + w 16) * 2 + w 15) * 2 + w 14) * 2 + w 13) * 2 + w 12) * 2 + w 11) * 2 + w 10) * 2 + w 9) * 2 + w 8) * 2 + w 7) * 2 + w 6) * 2 + w 5) * 2 + w 4) * 2 + w 3) * 2 + w 2) * 2 + w 1

theorem baseSumGate_constraints_eq
    (w : Fin 64 → F) (c : Fin 1 → F) (pi : Fin 4 → F) :
    Plonky2Spec.Generated.baseSumGate_constraints w c pi =
      (horner2 w - w 0) ::
      [bitCon (w 1), bitCon (w 2), bitCon (w 3), bitCon (w 4), bitCon (w 5), bitCon (w 6), bitCon (w 7), bitCon (w 8), bitCon (w 9), bitCon (w 10), bitCon (w 11), bitCon (w 12), bitCon (w 13), bitCon (w 14), bitCon (w 15), bitCon (w 16), bitCon (w 17), bitCon (w 18), bitCon (w 19), bitCon (w 20), bitCon (w 21), bitCon (w 22), bitCon (w 23), bitCon (w 24), bitCon (w 25), bitCon (w 26), bitCon (w 27), bitCon (w 28), bitCon (w 29), bitCon (w 30), bitCon (w 31), bitCon (w 32), bitCon (w 33), bitCon (w 34), bitCon (w 35), bitCon (w 36), bitCon (w 37), bitCon (w 38), bitCon (w 39), bitCon (w 40), bitCon (w 41), bitCon (w 42), bitCon (w 43), bitCon (w 44), bitCon (w 45), bitCon (w 46), bitCon (w 47), bitCon (w 48), bitCon (w 49), bitCon (w 50), bitCon (w 51), bitCon (w 52), bitCon (w 53), bitCon (w 54), bitCon (w 55), bitCon (w 56), bitCon (w 57), bitCon (w 58), bitCon (w 59), bitCon (w 60), bitCon (w 61), bitCon (w 62), bitCon (w 63)] := rfl

/-- Bit soundness, generic over any field that interprets the exporter's
    P-1 numeral as -1 (true in ZMod goldilocksP: `goldilocks_neg_one`). -/
theorem bitCon_sound (hneg : (18446744069414584320 : F) = -1) {x : F}
    (h : bitCon x = 0) : x = 0 ∨ x = 1 := by
  unfold bitCon at h
  rw [hneg, ← sub_eq_add_neg] at h
  exact bit_of_mul_sub_one h

theorem bitCon_complete (hneg : (18446744069414584320 : F) = -1) {x : F}
    (h : x = 0 ∨ x = 1) : bitCon x = 0 := by
  unfold bitCon
  rw [hneg, ← sub_eq_add_neg]
  exact mul_sub_one_of_bit h

/-- Gate soundness: a vanishing row forces wire 0 to the Horner value of
    the limbs and every limb to a bit. -/
theorem baseSumGate_sound (hneg : (18446744069414584320 : F) = -1)
    {w : Fin 64 → F} {c : Fin 1 → F} {pi : Fin 4 → F}
    (h : Vanishing (Plonky2Spec.Generated.baseSumGate_constraints w c pi)) :
    w 0 = horner2 w ∧ ∀ i : Fin 63, w i.succ = 0 ∨ w i.succ = 1 := by
  rw [baseSumGate_constraints_eq] at h
  simp only [vanishing_cons, vanishing_nil_iff, and_true] at h
  obtain ⟨h0, h1, h2, h3, h4, h5, h6, h7, h8, h9, h10, h11, h12, h13, h14, h15, h16, h17, h18, h19, h20, h21, h22, h23, h24, h25, h26, h27, h28, h29, h30, h31, h32, h33, h34, h35, h36, h37, h38, h39, h40, h41, h42, h43, h44, h45, h46, h47, h48, h49, h50, h51, h52, h53, h54, h55, h56, h57, h58, h59, h60, h61, h62, h63⟩ := h
  refine ⟨(sub_eq_zero.mp h0).symm, ?_⟩
  intro i
  fin_cases i
  exacts [bitCon_sound hneg h1, bitCon_sound hneg h2, bitCon_sound hneg h3, bitCon_sound hneg h4, bitCon_sound hneg h5, bitCon_sound hneg h6, bitCon_sound hneg h7, bitCon_sound hneg h8, bitCon_sound hneg h9, bitCon_sound hneg h10, bitCon_sound hneg h11, bitCon_sound hneg h12, bitCon_sound hneg h13, bitCon_sound hneg h14, bitCon_sound hneg h15, bitCon_sound hneg h16, bitCon_sound hneg h17, bitCon_sound hneg h18, bitCon_sound hneg h19, bitCon_sound hneg h20, bitCon_sound hneg h21, bitCon_sound hneg h22, bitCon_sound hneg h23, bitCon_sound hneg h24, bitCon_sound hneg h25, bitCon_sound hneg h26, bitCon_sound hneg h27, bitCon_sound hneg h28, bitCon_sound hneg h29, bitCon_sound hneg h30, bitCon_sound hneg h31, bitCon_sound hneg h32, bitCon_sound hneg h33, bitCon_sound hneg h34, bitCon_sound hneg h35, bitCon_sound hneg h36, bitCon_sound hneg h37, bitCon_sound hneg h38, bitCon_sound hneg h39, bitCon_sound hneg h40, bitCon_sound hneg h41, bitCon_sound hneg h42, bitCon_sound hneg h43, bitCon_sound hneg h44, bitCon_sound hneg h45, bitCon_sound hneg h46, bitCon_sound hneg h47, bitCon_sound hneg h48, bitCon_sound hneg h49, bitCon_sound hneg h50, bitCon_sound hneg h51, bitCon_sound hneg h52, bitCon_sound hneg h53, bitCon_sound hneg h54, bitCon_sound hneg h55, bitCon_sound hneg h56, bitCon_sound hneg h57, bitCon_sound hneg h58, bitCon_sound hneg h59, bitCon_sound hneg h60, bitCon_sound hneg h61, bitCon_sound hneg h62, bitCon_sound hneg h63]

/-- Gate completeness: bits recombine to a satisfying row. -/
theorem baseSumGate_complete (hneg : (18446744069414584320 : F) = -1)
    {w : Fin 64 → F} {c : Fin 1 → F} {pi : Fin 4 → F}
    (hsum : w 0 = horner2 w)
    (hbits : ∀ i : Fin 63, w i.succ = 0 ∨ w i.succ = 1) :
    Vanishing (Plonky2Spec.Generated.baseSumGate_constraints w c pi) := by
  rw [baseSumGate_constraints_eq]
  simp only [vanishing_cons, vanishing_nil_iff, and_true]
  refine ⟨by rw [hsum]; ring, bitCon_complete hneg (hbits 0), bitCon_complete hneg (hbits 1), bitCon_complete hneg (hbits 2), bitCon_complete hneg (hbits 3), bitCon_complete hneg (hbits 4), bitCon_complete hneg (hbits 5), bitCon_complete hneg (hbits 6), bitCon_complete hneg (hbits 7), bitCon_complete hneg (hbits 8), bitCon_complete hneg (hbits 9), bitCon_complete hneg (hbits 10), bitCon_complete hneg (hbits 11), bitCon_complete hneg (hbits 12), bitCon_complete hneg (hbits 13), bitCon_complete hneg (hbits 14), bitCon_complete hneg (hbits 15), bitCon_complete hneg (hbits 16), bitCon_complete hneg (hbits 17), bitCon_complete hneg (hbits 18), bitCon_complete hneg (hbits 19), bitCon_complete hneg (hbits 20), bitCon_complete hneg (hbits 21), bitCon_complete hneg (hbits 22), bitCon_complete hneg (hbits 23), bitCon_complete hneg (hbits 24), bitCon_complete hneg (hbits 25), bitCon_complete hneg (hbits 26), bitCon_complete hneg (hbits 27), bitCon_complete hneg (hbits 28), bitCon_complete hneg (hbits 29), bitCon_complete hneg (hbits 30), bitCon_complete hneg (hbits 31), bitCon_complete hneg (hbits 32), bitCon_complete hneg (hbits 33), bitCon_complete hneg (hbits 34), bitCon_complete hneg (hbits 35), bitCon_complete hneg (hbits 36), bitCon_complete hneg (hbits 37), bitCon_complete hneg (hbits 38), bitCon_complete hneg (hbits 39), bitCon_complete hneg (hbits 40), bitCon_complete hneg (hbits 41), bitCon_complete hneg (hbits 42), bitCon_complete hneg (hbits 43), bitCon_complete hneg (hbits 44), bitCon_complete hneg (hbits 45), bitCon_complete hneg (hbits 46), bitCon_complete hneg (hbits 47), bitCon_complete hneg (hbits 48), bitCon_complete hneg (hbits 49), bitCon_complete hneg (hbits 50), bitCon_complete hneg (hbits 51), bitCon_complete hneg (hbits 52), bitCon_complete hneg (hbits 53), bitCon_complete hneg (hbits 54), bitCon_complete hneg (hbits 55), bitCon_complete hneg (hbits 56), bitCon_complete hneg (hbits 57), bitCon_complete hneg (hbits 58), bitCon_complete hneg (hbits 59), bitCon_complete hneg (hbits 60), bitCon_complete hneg (hbits 61), bitCon_complete hneg (hbits 62)⟩

/-- Instantiation over the concrete Goldilocks field. -/
theorem baseSumGate_sound_goldilocks [Fact (Nat.Prime goldilocksP)]
    {w : Fin 64 → ZMod goldilocksP} {c : Fin 1 → ZMod goldilocksP}
    {pi : Fin 4 → ZMod goldilocksP}
    (h : Vanishing (Plonky2Spec.Generated.baseSumGate_constraints w c pi)) :
    w 0 = horner2 w ∧ ∀ i : Fin 63, w i.succ = 0 ∨ w i.succ = 1 :=
  baseSumGate_sound goldilocks_neg_one h

end Plonky2TpuSpec
