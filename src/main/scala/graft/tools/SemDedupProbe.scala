package graft.tools

import graft.{Sessions, Tables}
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Scale probe for [[Similarity.semDeDup]]'s one tunable cost: the
  * signature PLANE COUNT. At fixed planes the per-bucket self-join grows
  * quadratically with corpus size (expected bucket occupancy n/2^planes,
  * pair rows ~ n²/2^planes); the scaladoc's dial is "grow planes with
  * log₂(corpus) to hold buckets flat" — each added plane halves expected
  * occupancy, so pairs/n stays constant when planes tracks log₂ n. This
  * rig measures that claim: candidate-pair count (deterministic — the
  * real work unit), dup-edge count, component count, and wall per
  * (sfDir, planes) cell. Edge/keeper SEMANTICS change with planes only
  * in that buckets must agree — a clustered-corpus recall check is the
  * spec's job; here the planted GenScale corpus (orthogonal per-copy
  * transforms → cross-copy cosines ≈ 0) keeps true dup structure
  * per-copy, so dup edges should scale ~linearly while candidates are
  * the knob under test.
  *
  * Usage: runMain graft.tools.SemDedupProbe <sfDir> [planesList] [reps]
  *        [rule: cc|direct|kmeans]
  *
  * `kmeans` mode (r13): the list is CLUSTER COUNTS, not plane counts —
  * the rig behind [[Similarity.deriveKMeansK]]'s scaling law. Here the
  * cost has two opposed terms (assignment O(n·k·d) vs within-cluster
  * pairs O(n²d/2k)), so the dial's job is balancing them, not just
  * bounding pairs; this sweep measures the actual trade on the actual
  * assignment mechanism (k-literal argmax), which is what caps k. */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val planesList = args.lift(1).getOrElse("8,12").split(",").map(_.toInt)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val rule = args.lift(3).getOrElse("cc")
    val spark = Sessions.local("graft-semdedup-probe")
    val metrics = new QueryProbe.TaskMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    for (planes <- planesList) {
      // candidate pairs = the within-bucket self-join size BEFORE the
      // threshold — the quantity the dial exists to bound. In kmeans
      // mode the bucket key is the trained assignment, so candidates
      // are computed from it (and the training cost is INSIDE the
      // timed reps below, as it is in q135).
      val (cands, hotN) = if (rule == "kmeans") {
        // POST-GUARD candidates over the actual bucket key (trained
        // cluster, sub-bucketed where the skew guard trips) — the
        // bounded quantity, plus how many clusters tripped the guard
        val (tbl, hot, _) = Similarity.kmeansSigTable(emb, k = planes)
        val c = tbl.groupBy("sig").agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * (col("c") - 1)).cast("long"))
          .collect()(0).getLong(0) / 2
        (c, hot.size.toLong)
      } else {
        val sig = emb.withColumn("sig",
          Similarity.portableSignatureCol("embedding", planes, 64))
          .select("vec_id", "sig")
        (sig.groupBy("sig").agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * (col("c") - 1)).cast("long"))
          .collect()(0).getLong(0) / 2, -1L)
      }
      for (rep <- 1 to reps) {
        metrics.reset()
        val t0 = System.nanoTime()
        val (dropped, comps) = rule match {
          case "direct" =>
            val dd = Similarity.semDeDupDirect(emb, planes).collect()
            (dd.count(r => !r.getBoolean(1)).toLong, -1L)
          case "kmeans" => // planes == cluster count in this mode
            val dd = Similarity.semDeDupKMeans(emb, k = planes).collect()
            (dd.count(r => !r.getBoolean(2)).toLong,
              dd.map(_.getLong(1)).distinct.length.toLong)
          case _ =>
            val dd = Similarity.semDeDup(emb, planes).collect()
            (dd.count(r => !r.getBoolean(2)).toLong,
              dd.map(_.getLong(1)).distinct.length.toLong)
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"SEMDEDUP rule=$rule sfDir=$sfDir planes=$planes " +
          f"rep=$rep n=$n cand_pairs=$cands hot=$hotN dropped=$dropped " +
          f"components=$comps sec=$sec%.2f ${metrics.line}")
      }
    }
    spark.stop()
  }
}
