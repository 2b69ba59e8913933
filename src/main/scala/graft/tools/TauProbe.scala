package graft.tools

import graft.{Sessions, Tables}

/** τ-dispatch crossover probe: run BOTH [[graft.dedup.Dedup.similarityJoin]]
  * regimes — posting-count and prefix+verify — FORCED at each probed τ over
  * the same documents table, printing wall seconds plus the deterministic
  * task-metric totals (shuffle bytes, spill) that actually locate the
  * crossover. The dispatch constant in `similarityJoin` (τ ≤ 1/4 →
  * posting-count) is justified by this sweep's BENCHMARKS.md table, not by
  * the endpoint measurements alone.
  *
  * Usage: runMain graft.tools.TauProbe <sfDir> [tauList] [reps] [hotgram]
  *   tauList = comma list of num/den, default 1/5,1/4,1/3,2/5,1/2
  *   hotgram = literal "hotgram": prepend one fixed 3-token phrase to
  *     EVERY doc, minting a shingle with df = corpus size — the
  *     heavy-tailed-df regime GenScale's salting deliberately excludes.
  *     Posting-count pays df² pair rows for the hot gram regardless of τ;
  *     prefix filtering at high τ sorts it to the end of every doc's
  *     rare-first order, so it never enters a prefix. This is the
  *     worst-case measurement behind keeping the high-τ side on the
  *     prefix plan even though the bounded-df synthetic corpus mildly
  *     favors posting-count at every τ.
  */
object TauProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("localdata/sf1")
    val taus = args.lift(1).getOrElse("1/5,1/4,1/3,2/5,1/2").split(",")
      .toSeq.map { s => val Array(n, dn) = s.split("/"); (n.toLong, dn.toLong) }
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val hot = args.lift(3).contains("hotgram")
    val spark = Sessions.local("graft-tau-probe")
    val metrics = new QueryProbe.TaskMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val base = Tables.documents(spark, d)
    val docs = if (!hot) base else base.withColumn("text",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("aqa bqb cqc "),
        org.apache.spark.sql.functions.col("text")))
    val regimes = Seq(
      "posting_count" -> graft.dedup.Dedup.similarityJoinPostingCount _,
      "prefix_verify" -> graft.dedup.Dedup.similarityJoinPrefixVerify _,
      // the declared-contract scale variant (r11): Jaccard over the
      // df ≤ 20 gram sub-universe — DIFFERENT pair set by design (its
      // count is not comparable to the exact regimes'); probed here
      // because its pair-row volume is the one that stays linear when
      // the hotgram flag makes the exact plans quadratic
      "rare_cap20" -> ((d: org.apache.spark.sql.DataFrame, tn: Long,
                        td: Long) =>
        graft.dedup.Dedup.similarityJoinRareGrams(d, tn, td, dfCap = 20)))
    for ((tn, td) <- taus; (rname, fn) <- regimes; r <- 1 to reps) {
      metrics.reset()
      val t0 = System.nanoTime()
      val cnt = fn(docs, tn, td).count()
      val sec = (System.nanoTime() - t0) / 1e9
      metrics.settle()
      println(f"TAU $tn/$td $rname rep=$r pairs=$cnt sec=$sec%.2f ${metrics.line}")
    }
    spark.stop()
  }
}
