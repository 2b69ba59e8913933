package graft.tools

import graft.{Sessions, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-variant A/B of the similarity-join PAIR aggregation — the
  * family's dominant cost (r10 verdict; PairCompositionProbe measured
  * its composition: ≥99.9% of partial rows are chance pairs sharing 1–2
  * grams, so map-side partial aggregation reduces volume by ~1% while
  * building a giant per-task hash map that spills). Variants, all
  * returning the identical pair set (asserted):
  *
  *   partial_nn  — the pre-r11 shape: groupBy(doc_a, doc_b, n_a, n_b),
  *                 partial+final HashAggregate (the 40-byte row).
  *   partial_s   — carry s = n_a + n_b instead of both sizes (the final
  *                 filter and jaccard only ever use the sum): 32-byte row.
  *   shuffle_s   — explicit repartition(doc_a, doc_b) between join and
  *                 aggregation: rows stream RAW into the exchange (24-byte
  *                 payload, no map-side hash map, no map-side spill); the
  *                 aggregation runs reduce-side only.
  *
  * Usage: runMain graft.tools.PairShuffleBench <sfDir> [tauList]
  */
object PairShuffleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("localdata/sf1")
    val taus = args.lift(1).getOrElse("1/20,1/2").split(",")
      .toSeq.map { s => val Array(n, d) = s.split("/"); (n.toLong, d.toLong) }
    val spark = Sessions.local("graft-pair-shuffle-bench")
    val metrics = new QueryProbe.TaskMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val docs = Tables.documents(spark, sfDir)
    val tbl = graft.ops.Scratch.bucketedTable(spark, sfDir, "pair_shuf_bench")
    Dedup.shingleIndexIngestBucketed(docs, tbl)
    val posting = Dedup.shinglePostingsBucketed(spark, tbl)

    def joined(tn: Long, td: Long) =
      posting.as("a").join(posting.as("b"),
        col("a.g") === col("b.g") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.n") * lit(td) >= col("b.n") * lit(tn) &&
        col("b.n") * lit(td) >= col("a.n") * lit(tn))

    def partialNn(tn: Long, td: Long): DataFrame =
      joined(tn, td)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter") * lit(td) >=
          (col("n_a") + col("n_b") - col("inter")) * lit(tn))
        .select("doc_a", "doc_b")

    def partialS(tn: Long, td: Long): DataFrame =
      joined(tn, td)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (col("a.n") + col("b.n")).as("s"))
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter") * lit(td) >=
          (col("s") - col("inter")) * lit(tn))
        .select("doc_a", "doc_b")

    def shuffleS(tn: Long, td: Long): DataFrame =
      joined(tn, td)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (col("a.n") + col("b.n")).as("s"))
        .repartition(col("doc_a"), col("doc_b"))
        .groupBy("doc_a", "doc_b", "s")
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter") * lit(td) >=
          (col("s") - col("inter")) * lit(tn))
        .select("doc_a", "doc_b")

    def measured(tag: String)(df: DataFrame): Long = {
      metrics.reset()
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      metrics.settle()
      println(f"PAIRSHUF $tag%-18s pairs=$n%-9d sec=$sec%.2f ${metrics.line}")
      n
    }

    for ((tn, td) <- taus) {
      val a = measured(s"partial_nn_$tn/$td")(partialNn(tn, td))
      val b = measured(s"partial_s_$tn/$td")(partialS(tn, td))
      val c = measured(s"shuffle_s_$tn/$td")(shuffleS(tn, td))
      assert(a == b && b == c, s"variant divergence at tau=$tn/$td: $a/$b/$c")
    }
    spark.stop()
  }
}
