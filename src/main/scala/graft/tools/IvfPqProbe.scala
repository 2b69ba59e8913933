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
  * Usage: runMain graft.tools.IvfPqProbe <sfDir> [queryIds e.g. 0,1,2,3] [bench]
  * With the literal `bench` as the 3rd arg, times the BATCH path vs Q
  * single-query scans instead of the recall grid (warm reps, the
  * PqBench discipline) — the amortization rows for BENCHMARKS.md.
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
    if (args.lift(2).contains("bench")) {
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def ms(v: Double): Double = math.rint(v * 1000) / 1000
      val reps = 3
      val nprobe = 6
      // warm both paths (codegen + parquet footers)
      IvfPq.ivfPqTopKBatch(spark, root, emb, cents, books, qIds, k,
        nprobe, corpusSize = n).count()
      qIds.foreach(q => IvfPq.ivfPqTopK(spark, root, emb, cents, books,
        q, k, nprobe, corpusSize = n).count())
      val batchSec = (1 to reps).map(_ => time {
        IvfPq.ivfPqTopKBatch(spark, root, emb, cents, books, qIds, k,
          nprobe, corpusSize = n).count(); ()
      }).sum / reps
      val singlesSec = (1 to reps).map(_ => time {
        qIds.foreach(q => IvfPq.ivfPqTopK(spark, root, emb, cents, books,
          q, k, nprobe, corpusSize = n).count())
      }).sum / reps
      println(s"""{"metric":"ivfpq_batch","sf":"$sfDir","n_vectors":$n,""" +
        s""""q":${qIds.size},"nprobe":$nprobe,""" +
        s""""batch_sec":${ms(batchSec)},"singles_sec":${ms(singlesSec)}}""")
      spark.stop()
      return
    }
    if (args.lift(2).contains("qscale")) {
      // Wall of ONE-plan batches at growing Q vs the chunked default —
      // the r12 explode-first rewrite claims the generated ADC
      // projection is M-sized at ANY Q (the old shape posexploded a
      // Q-wide array of per-query expressions, which defeated
      // whole-stage codegen past Q≈64: the AdcBatchMaxQ ceiling's
      // mechanism, BENCHMARKS.md "ADC batch-size sweep"). Warm reps,
      // min of 2 (the PqBench discipline); same-run comparison so box
      // noise cancels.
      val nprobe = 6
      val chunk = graft.Tuning.IvfPqBatchMaxQ
      for (q <- Seq(64, 128, 256)) { // q == chunk would time one plan twice
        val ids = (0L until q.toLong).toSeq
        def run(mc: Int): Double = {
          val t0 = System.nanoTime()
          IvfPq.ivfPqTopKBatch(spark, root, emb, cents, books, ids, k,
            nprobe, corpusSize = n, maxChunk = mc).count()
          (System.nanoTime() - t0) / 1e9
        }
        run(q); run(chunk) // warm both plans
        val onePlan = (1 to 2).map(_ => run(q)).min
        val chunked = (1 to 2).map(_ => run(chunk)).min
        println(f"""{"metric":"ivfpq_qscale","q":$q,"chunk":$chunk,""" +
          f""""one_plan_sec":$onePlan%.2f,"chunked_sec":$chunked%.2f}""")
      }
      spark.stop()
      return
    }
    if (args.lift(2).contains("chunks")) {
      // scanned-rows A/B of batch chunking strategies (r11): id-order
      // chunks vs the shipped greedy probe-overlap packing, at the
      // production chunk size. scanned_rows is deterministic for a fixed
      // index+queries (the QueryProbe doctrine), so one pass decides.
      val Q = args.lift(3).map(_.toInt).getOrElse(64)
      val maxChunk = graft.Tuning.IvfPqBatchMaxQ
      val nprobe = args.lift(4).map(_.toInt).getOrElse(6)
      val ids = (0L until Q.toLong).toSeq
      def scannedOf(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        df.queryExecution.observedMetrics.collect {
          case (name, row) if name.startsWith("ivfpq_batch") =>
            row.getLong(0)
        }.sum
      }
      // id-order: force each chunk through its own single-chunk batch
      val idOrder = ids.grouped(maxChunk).map(chunk =>
        scannedOf(IvfPq.ivfPqTopKBatch(spark, root, emb, cents, books,
          chunk, k, nprobe, corpusSize = n))).sum
      val packed = scannedOf(IvfPq.ivfPqTopKBatch(spark, root, emb, cents,
        books, ids, k, nprobe, corpusSize = n))
      println(s"""{"metric":"ivfpq_chunks","sf":"$sfDir","n_vectors":$n,""" +
        s""""q":$Q,"nprobe":$nprobe,"max_chunk":$maxChunk,""" +
        s""""scanned_id_order":$idOrder,"scanned_overlap_packed":$packed}""")
      spark.stop()
      return
    }
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
