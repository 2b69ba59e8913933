package graft.tools

import graft.{Sessions, Tables}
import graft.similarity.{IvfPq, Similarity}
import org.apache.spark.sql.functions._

/** Recall-surface probe for the composed IVF-PQ index: per-query recall
  * vs brute force over an (nprobe × refine-multiplier) grid, for the
  * contract-floor calibration the annContract scaladoc demands (floors
  * are set from MEASURED recall, never hoped). Also prints the scanned
  * fraction per nprobe — the compute-prune the knob buys.
  *
  * Usage: runMain graft.tools.IvfPqProbe <sfDir> [queryIds e.g. 0,1,2,3]
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qIds = args.lift(1).map(_.split(",").toSeq.map(_.toLong))
      .getOrElse(Seq(0L, 1L, 2L, 3L))
    val spark = Sessions.local("graft-ivfpq-probe")
    val (cents, books, n, root) = IvfPq.ivfPqIngest(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val k = 10
    for (q <- qIds) {
      val bf = Similarity.bruteForceTopK(emb, q, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      for (nprobe <- Seq(4, 6, 8, 10); mult <- Seq(1, 2, 4)) {
        val refine = graft.similarity.Pq.proportionalShortlist(n, mult)
        val ann = IvfPq.ivfPqTopK(spark, root, emb, cents, books, q, k,
            nprobe = nprobe, corpusSize = n, refine = refine)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val recall = (ann & bf).size.toDouble / k
        println(f"IVFPQ q=$q nprobe=$nprobe refine=${mult}x " +
          f"recall=$recall%.1f scanned~${nprobe.toDouble / cents.length}%.2f")
      }
    }
    spark.stop()
  }
}
