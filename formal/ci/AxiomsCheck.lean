/-
  Axiom-footprint gate: the CI shell step runs this file and asserts the
  printed axiom set is within the classical allow-list
  {propext, Classical.choice, Quot.sound} — i.e. no `sorry`, no ad-hoc
  axioms, anywhere under the capstone theorems.
-/
import Plonky2Bridge

#print axioms Plonky2TpuSpec.arithmetic_chain_sound
#print axioms Plonky2TpuSpec.decompose_then_multiply_sound
#print axioms Plonky2TpuSpec.baseSumGate_sound_goldilocks
