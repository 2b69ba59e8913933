package graft.tools

import graft.{Sessions, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame

/** Shuffle-bytes A/B of the two standing gram-index forms: plain parquet
  * (q125's registered shape) vs bucketBy(g) (the exchange-free cluster
  * form). Runs the same two consumers — per-source dup coverage and the
  * contamination pair join — against each and prints per-phase wall time
  * plus the task-metric totals; the number that matters is shuffle bytes
  * on the CONSUMER side: bucketing pays one extra exchange at ingest and
  * should take the g-keyed join/aggregation shuffles to ~0 thereafter.
  * (Wall time at local sf is scheduling-noise-dominated; bytes are
  * deterministic for a fixed plan — the QueryProbe doctrine.)
  *
  * Usage: runMain graft.tools.GramIndexBench <sfDir>
  */
object GramIndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-gram-bench")
    val metrics = new QueryProbe.TaskMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val docs = Tables.documents(spark, sfDir)

    def measured(tag: String)(f: => Unit): Unit = {
      metrics.reset()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      metrics.settle()
      println(f"GRAM $tag%-20s sec=$sec%.2f ${metrics.line}")
    }

    // the q125 consumer pair, driven to completion
    def consume(idx: DataFrame): Unit = {
      Dedup.dupCoverageFrom(idx).collect()
      Dedup.contaminationPairsFrom(idx).count()
      ()
    }

    val plainRoot = graft.ops.Scratch.root(spark, sfDir, "gram_bench_plain")
    // table name keyed like the parquet roots: a fixed name made two
    // concurrent bench drivers cross-read each other's index (r9 ADVICE)
    val bucketed = graft.ops.Scratch.bucketedTable(spark, sfDir, "gram_bench")
    measured("plain_ingest") { Dedup.gramIndexIngest(docs, plainRoot) }
    measured("plain_consumers") { consume(Dedup.gramIndex(spark, plainRoot)) }
    measured("bucketed_ingest") {
      Dedup.gramIndexIngestBucketed(docs, bucketed)
    }
    measured("bucketed_consumers") {
      consume(Dedup.gramIndexBucketed(spark, bucketed)
        .select("doc_id", "source", "g"))
    }
    spark.stop()
  }
}
