package graft.tools

import graft.Sessions
import graft.similarity.Pq

/** Split-phase PQ benchmark: times q122's INGEST (codebook train + corpus
  * encode + codes write) apart from its QUERY (ADC scan over the standing
  * codes + shortlist re-rank). The registered q122 bench row prices the
  * honest ingest+query total; this probe exists because the production
  * hot path is the query side alone, and a regression there would
  * otherwise hide inside training noise ~10× its size. Query is timed
  * over `reps` repetitions (it is sub-second at small sf; the mean of a
  * warm loop is the stable number) after one warm pass of each phase.
  *
  * Usage: runMain graft.tools.PqBench <sfDir> [reps]
  * Prints one JSON line: {"pq_ingest_sec":…,"pq_query_sec":…,…}
  */
object PqBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.local()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm: JIT + codegen + parquet footers, same discipline as Bench
    val (warm, _) = time(Pq.pqIngest(spark, sfDir))
    Pq.pqQuery(spark, sfDir, warm._3, warm._1, warm._2).count()
    val ((books, n, root), ingestSec) = time(Pq.pqIngest(spark, sfDir))
    val queryTimes = (1 to reps).map { _ =>
      time(Pq.pqQuery(spark, sfDir, root, books, n).count())._2
    }
    val querySec = queryTimes.sum / reps
    // batched amortization: ONE codes scan answering Q queries vs Q
    // single-query scans — the number that justifies adcTopKBatch (q126).
    // Timed over the same standing codes table, same warm JVM.
    val qIds = Seq(0L, 1L, 2L, 3L)
    val emb = graft.Tables.embeddings(spark, sfDir)
    val codes = spark.read.parquet(root)
    Pq.adcTopKBatch(codes, emb, qIds, 10, books, corpusSize = n).count() // warm
    val batchTimes = (1 to reps).map { _ =>
      time(Pq.adcTopKBatch(codes, emb, qIds, 10, books, corpusSize = n)
        .count())._2
    }
    val singlesTimes = (1 to reps).map { _ =>
      time(qIds.foreach(q =>
        Pq.adcTopKOnCodes(codes, emb, q, 10, books, corpusSize = n)
          .count()))._2
    }
    val batchSec = batchTimes.sum / reps
    val singlesSec = singlesTimes.sum / reps
    def ms(v: Double): Double = math.rint(v * 1000) / 1000
    println(s"""{"metric":"pq_split","sf":"$sfDir","n_vectors":$n,""" +
      s""""pq_ingest_sec":${ms(ingestSec)},"pq_query_sec":${ms(querySec)},""" +
      s""""query_reps":$reps,"query_min_sec":${ms(queryTimes.min)},""" +
      s""""query_max_sec":${ms(queryTimes.max)},""" +
      s""""batch_q":${qIds.size},"batch_sec":${ms(batchSec)},""" +
      s""""singles_sec":${ms(singlesSec)}}""")
    spark.stop()
  }
}
