package graft.functions

/** Bit-interleaving kernels for space-filling-curve clustering (Z-order /
  * Morton codes). Static methods so the codegen'd [[ZOrder2]] expression
  * compiles to a direct call inside WholeStageCodegen.
  */
object SpatialKernels {

  /** Spread the low 31 bits of x so bit i lands at position 2i (the
    * "magic bits" dilation). Inputs are masked to 31 bits so the
    * interleaved result never reaches the sign bit — identical two's-
    * complement semantics on any engine. */
  def spread31(x0: Long): Long = {
    var x = x0 & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Morton code of (a, b): a's bits at even positions, b's at odd.
    * Sorting by this value interleaves locality in BOTH dimensions —
    * the clustering key behind multi-column data skipping. */
  def zOrder2(a: Long, b: Long): Long =
    spread31(a) | (spread31(b) << 1)
}
