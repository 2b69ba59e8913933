package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate: keeps only the k best (score desc, id asc)
  * pairs per group, merged associatively.
  *
  * Why it exists: the window formulation of "top-N per group"
  * (`row_number().over(partitionBy(g).orderBy(s))` + filter) must
  * shuffle and fully sort EVERY row of every group before discarding all
  * but k. This aggregate keeps a k-element buffer per group on the map
  * side — shuffle volume drops from O(rows) to O(groups × k), the same
  * map-side-combine argument the reference makes for reduceByKey
  * (chapter_04/README.md:83-100), applied to ranking. At 100 TB this is
  * the difference between shuffling the table and shuffling kilobytes.
  *
  * Registered through `udaf()` → Spark plans it as a
  * TypedImperativeAggregate (partial + final HashAggregate).
  * Buffer = parallel (scores, ids) arrays, kept sorted; merge is a
  * bounded sorted-merge: associative + commutative, partition-invariant.
  */
class TopKByScore(k: Int) extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Seq[(Double, Long)]] {

  def zero: (Array[Double], Array[Long]) = (Array.empty, Array.empty)

  /** (a,b) better than (c,d) ⇔ higher score, ties to lower id. */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def reduce(buf: (Array[Double], Array[Long]), in: (Double, Long)): (Array[Double], Array[Long]) =
    insert(buf, in._1, in._2)

  private def insert(buf: (Array[Double], Array[Long]), s: Double, id: Long): (Array[Double], Array[Long]) = {
    val (scores, ids) = buf
    val n = scores.length
    if (n == k && !better(s, id, scores(n - 1), ids(n - 1))) return buf
    // find insertion point in the sorted (desc) buffer
    var pos = 0
    while (pos < n && better(scores(pos), ids(pos), s, id)) pos += 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m); val ni = new Array[Long](m)
    System.arraycopy(scores, 0, ns, 0, pos)
    System.arraycopy(ids, 0, ni, 0, pos)
    if (pos < m) { ns(pos) = s; ni(pos) = id }
    var i = pos
    while (i + 1 < m) { ns(i + 1) = scores(i); ni(i + 1) = ids(i); i += 1 }
    (ns, ni)
  }

  def merge(a: (Array[Double], Array[Long]), b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    var out = a
    var i = 0
    while (i < b._1.length) { out = insert(out, b._1(i), b._2(i)); i += 1 }
    out
  }

  def finish(buf: (Array[Double], Array[Long])): Seq[(Double, Long)] =
    buf._1.toSeq.zip(buf._2.toSeq)

  def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder[(Array[Double], Array[Long])]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
