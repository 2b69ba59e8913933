package graft.tools

import graft.{Sessions, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame

/** Shuffle-bytes A/B of the two standing SHINGLE-index forms: plain
  * (doc_id, hs, n) parquet (q127's registered shape) vs the bucketBy(g)
  * posting table + sets sidecar (q128's shape) — the GramIndexBench twin
  * for the similarity-join family. Runs the same two consumers — the
  * τ=1/20 posting-count join and the τ=1/2 dispatched join (probe
  * included) — against each and prints per-phase wall time plus the
  * task-metric totals; the number that matters is shuffle bytes on the
  * CONSUMER side: bucketing pays one extra exchange at ingest and should
  * remove the g-keyed self-join/aggregation shuffles thereafter. (Wall
  * time at local sf is scheduling-noise-dominated; bytes are
  * deterministic for a fixed plan — the QueryProbe doctrine.)
  *
  * Usage: runMain graft.tools.ShingleIndexBench <sfDir>
  */
object ShingleIndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-shingle-bench")
    val metrics = new QueryProbe.TaskMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val docs = Tables.documents(spark, sfDir)

    def measured(tag: String)(f: => Unit): Unit = {
      metrics.reset()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      metrics.settle()
      println(f"SHINGLE $tag%-22s sec=$sec%.2f ${metrics.line}")
    }

    // the q127/q128 consumer pair, driven to completion
    def consume(posting: DataFrame, sets: DataFrame): Unit = {
      Dedup.similarityJoinFromPostings(posting, sets, 1, 20).count()
      Dedup.similarityJoinFromPostings(posting, sets, 1, 2).count()
      ()
    }

    val plainRoot = graft.ops.Scratch.root(spark, sfDir, "shingle_bench_plain")
    val bucketed = graft.ops.Scratch.bucketedTable(spark, sfDir, "shingle_bench")
    measured("plain_ingest") { Dedup.shingleIndexIngest(docs, plainRoot); () }
    measured("plain_consumers") {
      val sets = Dedup.shingleIndex(spark, plainRoot)
      consume(Dedup.shinglePostings(sets), sets)
    }
    measured("bucketed_ingest") {
      Dedup.shingleIndexIngestBucketed(docs, bucketed); ()
    }
    measured("bucketed_consumers") {
      consume(Dedup.shinglePostingsBucketed(spark, bucketed),
        Dedup.shingleSetsSidecar(spark, bucketed))
    }
    spark.stop()
  }
}
