package graft

import graft.functions.exprs
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Pins [[Similarity.assignClusters]]'s loop-form
  * [[graft.functions.NearestCentroid]] expression to the k-literal
  * struct-argmax projection it replaced (r13): same dots, same total
  * ordering, same tie-break — so swapping the mechanism could not move
  * a single assignment anywhere in the engine (k-means training, IVF
  * index, IVF-PQ ingest, semantic dedup all route through it). */
class AssignmentSpec extends SparkSpec {

  /** The OLD assignment shape, verbatim: k inlined vecDot terms,
    * argmax = max over array<struct<dot, -cid>>. Kept here as the
    * reference implementation the production loop must match. */
  private def assignStructForm(emb: org.apache.spark.sql.DataFrame,
                               cents: Array[Array[Float]]) = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(exprs.vecDot(col("embedding"), typedlit(c.toSeq)).as("dot"),
             lit(-i).as("negcid"))
    }
    emb.withColumn("cluster",
      (-array_max(array(scored: _*)).getField("negcid")).cast("int"))
  }

  test("nearestCentroid expression == the struct-argmax form, " +
       "row-for-row, on real embeddings at several k") {
    val emb = Tables.embeddings(spark, sf)
    for (k <- Seq(1, 16, 33)) {
      val cents = Similarity.trainCentroids(emb, k)
      val got = Similarity.assignClusters(emb, cents)
        .select("vec_id", "cluster").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val ref = assignStructForm(emb, cents)
        .select("vec_id", "cluster").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(got == ref, s"assignment diverged from the struct form at k=$k")
    }
  }

  test("ties break toward the lowest cid (the struct form's max-negcid " +
       "rule) and the ordering is Spark-total (-0.0 < 0.0)") {
    val spark0 = spark
    import spark0.implicits._
    // duplicate centroids: vectors tie exactly on both copies, and the
    // winner must be the FIRST (lowest cid) — on both paths
    val emb = (0L until 100L)
      .map(i => (i, Array.tabulate(4)(d => ((i + d) % 7).toFloat - 3f)))
      .toDF("vec_id", "embedding")
    val c0 = Array(1f, 0f, 0f, 0f)
    val cents = Array(c0, c0.clone(), Array(0f, 1f, 0f, 0f))
    val got = Similarity.assignClusters(emb, cents)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val ref = assignStructForm(emb, cents)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(got == ref)
    assert(got.forall(_._2 != 1), "a tied duplicate centroid can never win")
    // zero-vector dots: every product is ±0.0 but the fold starts at
    // +0.0 and +0.0 + -0.0 = +0.0 in IEEE, so dotFloat can never emit
    // -0.0 — all-zero dots tie at +0.0 on both paths and the lowest
    // cid wins. (The kernel still compares via Double.compare, which
    // IS Spark's total ordering, so the equivalence does not depend on
    // this unreachability.)
    val z = Seq((0L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val signed = Array(Array(-1f, -1f, -1f, -1f), Array(1f, 1f, 1f, 1f))
    val gotZ = Similarity.assignClusters(z, signed).select("cluster").collect()
    val refZ = assignStructForm(z, signed).select("cluster").collect()
    assert(gotZ.head.getInt(0) == 0 && refZ.head.getInt(0) == 0,
      "all-zero dots tie at +0.0 on both paths; lowest cid wins")
  }

  /** The OLD PQ-encode shape, verbatim: per subspace, K inlined
    * `struct(vecDot(slice) − half, −k)` terms under array_max. */
  private def encodeStructForm(emb: org.apache.spark.sql.DataFrame,
                               books: graft.similarity.Pq.Codebooks) = {
    val m = books.length
    val sub = books.head.head.length
    val codes = (0 until m).map { i =>
      val sl = slice(col("embedding"), i * sub + 1, sub)
      val scored = books(i).zipWithIndex.map { case (c, k) =>
        val half = c.map(x => x.toDouble * x).sum / 2.0
        struct((exprs.vecDot(sl, typedlit(c.toSeq)) - lit(half)).as("s"),
               lit(-k).as("negk"))
      }
      (-array_max(array(scored: _*)).getField("negk")).cast("int")
    }
    emb.withColumn("codes", array(codes: _*))
  }

  test("pqEncodeCodes expression == the per-subspace struct-argmin " +
       "form, row-for-row, including the tie-break") {
    val emb = Tables.embeddings(spark, sf)
    val books = graft.similarity.Pq.trainCodebooks(emb, m = 8, k = 16)
    val got = graft.similarity.Pq.encode(emb, books)
      .select("vec_id", "codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).mkString(","))).sorted.toSeq
    val ref = encodeStructForm(emb, books)
      .select("vec_id", "codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).mkString(","))).sorted.toSeq
    assert(got == ref, "PQ codes diverged from the struct form")
    // tie-break: duplicate codewords in one subspace — the duplicate
    // (higher code) can never be emitted, on either path
    val spark0 = spark
    import spark0.implicits._
    val small = (0L until 50L)
      .map(i => (i, Array.tabulate(8)(d => ((i * 7 + d) % 5).toFloat - 2f)))
      .toDF("vec_id", "embedding")
    val c0 = Array(1f, 0f)
    val tied: graft.similarity.Pq.Codebooks = Array(
      Array(c0, c0.clone(), Array(0f, 1f)),
      Array(Array(0f, -1f), Array(0f, -1f), Array(-1f, 0f)),
      Array(c0, Array(0f, 1f), Array(-1f, -1f)),
      Array(c0, Array(0f, 1f), Array(1f, 1f)))
    val gotT = graft.similarity.Pq.encode(small, tied)
      .select("vec_id", "codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).mkString(","))).sorted.toSeq
    val refT = encodeStructForm(small, tied)
      .select("vec_id", "codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).mkString(","))).sorted.toSeq
    assert(gotT == refT)
    assert(gotT.forall { case (_, cs) => { val a = cs.split(","); a(0) != "1" && a(1) != "1" } },
      "a tied duplicate codeword can never win over the lower code")
  }

  test("the plan carries ONE projection expression regardless of k " +
       "(the codegen/task-binary fix the loop form exists for)") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.trainCentroids(emb, 16)
    val plan = Similarity.assignClusters(emb, cents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("nearest_centroid"),
      "assignment must be the single nearest_centroid expression")
    assert(!plan.contains("float_vec_dot"),
      "no inlined per-centroid dot terms may remain in the plan")
  }
}
