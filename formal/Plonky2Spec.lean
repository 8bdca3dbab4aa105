/- Library root: the generated constraint artifacts plus the proof layer. -/
import Plonky2Spec.Basic
import Plonky2Spec.Generated.Gates
import Plonky2Spec.Arithmetic
import Plonky2Spec.BaseSum
import Plonky2Spec.MulExtension
