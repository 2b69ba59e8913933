package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the custom Catalyst expressions ([[MinHashSignature]],
  * [[SimHash64]]). Called from generated code as static methods (Scala
  * object ⇒ static forwarders), so the hot loop is a tight compiled loop —
  * no per-element Catalyst lambda dispatch, no boxing.
  *
  * Hashing: one XXH64 pass over each element's UTF-8 bytes (seed 42, same
  * primitive Spark's `xxhash64` uses — org.apache.spark.sql.catalyst
  * .expressions.XXH64), then k derived hashes via an avalanche mix of
  * (h ^ seed_i). Deterministic across JVMs, partitions, and runs.
  */
object TextKernels {

  /** splitmix64 finalizer — full-avalanche bit mixer. */
  @inline private def mix(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /** k-permutation MinHash signature of a string array (set semantics —
    * duplicates can't change a min). One bytes-pass per element. Null
    * elements are skipped, matching how Spark's own hash-based aggregates
    * treat null as "no contribution" — the SQL-registered form doesn't
    * constrain its input's containsNull. */
  def minhash(elements: ArrayData, numHashes: Int): ArrayData = {
    val n = elements.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!elements.isNullAt(i)) {
        val h = hashUtf8(elements.getUTF8String(i), 42L)
        var j = 0
        while (j < numHashes) {
          val hj = mix(h ^ (j * 0x9e3779b97f4a7c15L))
          if (hj < sig(j)) sig(j) = hj
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Hashes of a string array's non-null elements (null elements are
    * skipped — the SQL-registered kernels accept unconstrained arrays). */
  private def hashNonNull(tokens: ArrayData): Array[Long] = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var w = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) { th(w) = hashUtf8(tokens.getUTF8String(i), 42L); w += 1 }
      i += 1
    }
    if (w == n) th else java.util.Arrays.copyOf(th, w)
  }

  /** 64-bit SimHash of a token array with term-frequency weighting
    * (duplicate tokens accumulate — the array IS the token stream).
    * Null tokens are skipped. */
  def simhash(tokens: ArrayData): Long = {
    val th = hashNonNull(tokens)
    val n = th.length
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = th(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  private val NonLetter = java.util.regex.Pattern.compile("[^a-z]+")

  /** Tokenizer kernel: lowercase → split on non-letters → drop empties.
    * Exactly `filter(split(lower(text), '[^a-z]+'), x -> x != '')` (same
    * java regex engine Spark's split uses, and `UTF8String.toLowerCase` —
    * the exact lowering Spark's `lower()` performs, so the RewriteTokenize
    * rule is semantics-preserving on all inputs, not just ASCII, and is
    * immune to the JVM default locale), but codegen-friendly: the HOF
    * form is interpreted AND evicts its whole projection from
    * whole-stage codegen. */
  def tokenizeLower(s: UTF8String): ArrayData = {
    val parts = NonLetter.split(s.toLowerCase.toString, -1)
    val out = new Array[AnyRef](parts.length)
    var w = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) { out(w) = UTF8String.fromString(parts(i)); w += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, w))
  }

  /** k-permutation MinHash directly over token 3-grams: combines the three
    * token hashes instead of materializing shingle strings (no concat, no
    * UTF-8 re-encode, one hash pass per token). */
  def minhash3gram(tokens: ArrayData, numHashes: Int): ArrayData = {
    val th = hashNonNull(tokens)
    val n = th.length
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (n >= 3) {
      var i = 0
      while (i <= n - 3) {
        val h = mix(mix(th(i) ^ mix(th(i + 1))) ^ mix(th(i + 2)))
        var j = 0
        while (j < numHashes) {
          val hj = mix(h ^ (j * 0x9e3779b97f4a7c15L))
          if (hj < sig(j)) sig(j) = hj
          j += 1
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Distinct sorted 64-bit hashes of a string array — set representation
    * for fast pairwise intersection. Null elements are skipped. */
  def hashSetSorted(elements: ArrayData): ArrayData = {
    val h = hashNonNull(elements)
    sortDedup(h, h.length)
  }

  /** Distinct sorted hashes of the token 3-gram set — one token-hash pass,
    * triples mixed arithmetically (never materializes shingle strings; the
    * 3-gram → hash map matches string-shingle set cardinalities modulo
    * 2^-64 collisions). */
  def gram3SetSorted(tokens: ArrayData): ArrayData = {
    val th = hashNonNull(tokens)
    val n = th.length
    if (n < 3) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val g = new Array[Long](n - 2)
    var i = 0
    while (i <= n - 3) {
      g(i) = mix(mix(th(i) ^ mix(th(i + 1))) ^ mix(th(i + 2)))
      i += 1
    }
    sortDedup(g, n - 2)
  }

  /** Distinct sorted hashes of the token n-gram set (generalized
    * [[gram3SetSorted]] — contamination checks use 8–13-gram windows). */
  def gramNSetSorted(tokens: ArrayData, n: Int): ArrayData = {
    val th = hashNonNull(tokens)
    val len = th.length
    if (len < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val g = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) { h = mix(h ^ mix(th(i + j))); j += 1 }
      g(i) = h
      i += 1
    }
    sortDedup(g, len - n + 1)
  }

  private def sortDedup(h: Array[Long], n: Int): ArrayData = {
    java.util.Arrays.sort(h, 0, n)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || h(i) != h(w - 1)) { h(w) = h(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(h, w))
  }

  /** |A ∩ B| of two sorted long arrays (one linear merge pass). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Sequential-fold dot product of two float arrays in double — identical
    * summation order to the `aggregate(zip_with(...))` SQL form (oracle
    * parity) at compiled-loop speed. */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"float_vec_dot: mismatched vector lengths $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}
