package graft.tools

import graft.{Sessions, Tables}
import graft.similarity.{Pq, Similarity}
import org.apache.spark.sql.functions._

/** Codebook-size (K) sweep for product quantization — the rig behind
  * the r13 claim that the [[graft.functions.PqEncodeCodes]] loop
  * rewrite makes the literature-standard K=256 codebooks practical
  * (the expression-tree encoder was M×K inlined argmin terms: 4096 at
  * K=256, past what codegen tolerates). Per K: codebook train wall,
  * corpus encode wall (persisted count — the ingest shape), and raw
  * quantizer recall@10 vs exact brute force with refine=1, i.e. the
  * ADC RANKING itself, not the re-rank stage that would saturate the
  * comparison (the production default refine recovers the contract
  * floor at any K; this sweep isolates what K buys the quantizer).
  *
  * Usage: runMain graft.tools.PqKSweep <sfDir> [Ks] [nQueries]
  */
object PqKSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).getOrElse("16,256").split(",").map(_.trim.toInt)
    val nQ = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = Sessions.local("graft-pq-ksweep")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val qids = emb.select("vec_id").orderBy("vec_id").limit(nQ)
      .collect().map(_.getLong(0))
    // exact truth once (K-independent): top-10 excluding self, to match
    // the ADC plan's self-exclusion
    val truth: Map[Long, Set[Long]] = qids.map { qid =>
      qid -> Similarity.bruteForceTopK(emb, qid, 11).collect()
        .map(_.getLong(0)).filter(_ != qid).take(10).toSet
    }.toMap
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (k <- ks) {
      val (books, tTrain) = time(Pq.trainCodebooks(emb, m = 16, k = k))
      val codes = Pq.encode(emb, books).select("vec_id", "codes").persist()
      val (_, tEncode) = time(codes.count())
      val recalls = qids.map { qid =>
        val got = Pq.adcTopKOnCodes(codes, emb, qid, 10, books,
          refine = 1, corpusSize = n).collect().map(_.getLong(0)).toSet
        (got & truth(qid)).size.toDouble / truth(qid).size
      }
      val mean = recalls.sum / recalls.length
      println(f"PQKSWEEP sfDir=$sfDir n=$n K=$k train=$tTrain%.2f " +
        f"encode=$tEncode%.2f recall10_refine1=$mean%.4f queries=$nQ")
      codes.unpersist()
    }
    spark.stop()
  }
}
