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

  /** Nearest-centroid argmax over a centroid MATRIX — the loop form of
    * the k-literal `array_max(array(struct(dot, -cid)))` projection it
    * replaces, bit-identical by construction: each dot is
    * [[TextKernels.dotFloat]]'s sequential double fold (same ascending
    * accumulation order), and the comparison is
    * `java.lang.Double.compare`, which IS Spark's total ordering on
    * doubles (-0.0 < 0.0, NaN greatest) — ties keep the LOWEST cid,
    * exactly the struct form's max-negcid tie-break. One tight two-level
    * loop in one JIT-compiled method, instead of k inlined expression
    * terms: the plan carries the matrix as one reference object, so
    * task-binary size is the model's (4 bytes/cell), not O(k) codegen. */
  def nearestCentroid(v: org.apache.spark.sql.catalyst.util.ArrayData,
                      cents: Array[Array[Float]]): Int = {
    val dim = cents(0).length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector length ${v.numElements()} vs centroid dim $dim")
    var best = Double.NegativeInfinity
    var bestC = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += v.getFloat(i).toDouble * cent(i).toDouble
        i += 1
      }
      if (java.lang.Double.compare(s, best) > 0) { best = s; bestC = c }
      c += 1
    }
    bestC
  }

  /** Product-quantization encoder: per subspace i, the code is the
    * L2-nearest codeword via the argmax(x·c − ||c||²/2) identity —
    * the loop form of M×K inlined `struct(vecDot(slice(...)) − half,
    * −k)` terms (see [[nearestCentroid]] for why the loop form wins:
    * O(1) plan, one JIT kernel, reference-object codebooks).
    * Bit-identical: the subspace dot folds ascending in double
    * (dotFloat's order over the slice), `− halves(i)(k)` subtracts
    * AFTER the fold exactly like the expression form's
    * `vecDot(...) − lit(half)`, and `Double.compare` + keep-first
    * reproduces the struct-max lowest-code tie-break. */
  def pqEncode(v: org.apache.spark.sql.catalyst.util.ArrayData,
               books: Array[Array[Array[Float]]],
               halves: Array[Array[Double]]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = books.length
    val sub = books(0)(0).length
    if (v.numElements() != m * sub)
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${v.numElements()} vs M*sub = ${m * sub}")
    val codes = new Array[Int](m)
    var i = 0
    while (i < m) {
      val cb = books(i)
      val hv = halves(i)
      val off = i * sub
      var best = Double.NegativeInfinity
      var bestK = 0
      var k = 0
      while (k < cb.length) {
        val cent = cb(k)
        var s = 0.0
        var j = 0
        while (j < sub) {
          s += v.getFloat(off + j).toDouble * cent(j).toDouble
          j += 1
        }
        s -= hv(k)
        if (java.lang.Double.compare(s, best) > 0) { best = s; bestK = k }
        k += 1
      }
      codes(i) = bestK
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
}
