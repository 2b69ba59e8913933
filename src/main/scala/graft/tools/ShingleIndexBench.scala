package graft.tools

import graft.{Sessions, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-bytes A/B of the two standing SHINGLE-index forms: plain
  * (doc_id, hs, n) parquet (q127's registered shape) vs the bucketBy(g)
  * posting table + sets sidecar (q128's shape) — the GramIndexBench twin
  * for the similarity-join family. Runs the two consumers — the τ=1/20
  * posting-count join and the τ=1/2 dispatched join (probe included) —
  * against each, SEPARATELY per τ (round 11: the r10 totals hid which τ
  * owned the pair-aggregation shuffle), and prints per-phase wall time
  * plus the task-metric totals; the number that matters is shuffle bytes
  * on the CONSUMER side. Also A/Bs the PPJoin positional prune inside
  * the posting-count plan (r11): `oldcount_*` phases run the pre-r11
  * join (size-ratio prune only) inline, so the row-prune's shuffle delta
  * is measured against the shipped plan on the same table in the same
  * JVM. (Wall time at local sf is scheduling-noise-dominated; bytes are
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

    // the pre-r11 posting-count join (no positional prune), inlined so
    // the A/B measures exactly the row-prune's delta on the same input
    def oldPostingCount(posting: DataFrame, tauNum: Long,
                        tauDen: Long): DataFrame =
      posting.as("a").join(posting.as("b"),
          col("a.g") === col("b.g") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * lit(tauDen) >= col("b.n") * lit(tauNum) &&
          col("b.n") * lit(tauDen) >= col("a.n") * lit(tauNum))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter") * lit(tauDen) >=
          (col("n_a") + col("n_b") - col("inter")) * lit(tauNum))
        .select("doc_a", "doc_b")

    val plainRoot = graft.ops.Scratch.root(spark, sfDir, "shingle_bench_plain")
    val bucketed = graft.ops.Scratch.bucketedTable(spark, sfDir, "shingle_bench")
    measured("plain_ingest") { Dedup.shingleIndexIngest(docs, plainRoot); () }
    val plainSets = Dedup.shingleIndex(spark, plainRoot)
    val plainPosting = Dedup.shinglePostings(plainSets)
    measured("plain_tau1_20") {
      Dedup.similarityJoinFromPostings(plainPosting, plainSets, 1, 20).count()
      ()
    }
    measured("plain_tau1_2") {
      Dedup.similarityJoinFromPostings(plainPosting, plainSets, 1, 2).count()
      ()
    }
    measured("bucketed_ingest") {
      Dedup.shingleIndexIngestBucketed(docs, bucketed); ()
    }
    val bPosting = Dedup.shinglePostingsBucketed(spark, bucketed)
    val bSets = Dedup.shingleSetsSidecar(spark, bucketed)
    measured("bucketed_tau1_20") {
      Dedup.similarityJoinFromPostings(bPosting, bSets, 1, 20).count(); ()
    }
    measured("bucketed_tau1_2") {
      Dedup.similarityJoinFromPostings(bPosting, bSets, 1, 2).count(); ()
    }
    // positional-prune A/B on the bucketed table (the q128 shape): same
    // join, same table, only the prune differs
    measured("oldcount_tau1_20") {
      oldPostingCount(bPosting, 1, 20).count(); ()
    }
    measured("oldcount_tau1_2") {
      oldPostingCount(bPosting, 1, 2).count(); ()
    }
    spark.stop()
  }
}
