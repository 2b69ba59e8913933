package graft.tools

import graft.{Sessions, SparkEntry}

/** Ad-hoc timing probe: run the NAMED registry queries against a testdata
  * dir, once warm + once timed, printing per-query seconds — the rig for
  * isolating one query's regression without paying a full Bench pass.
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> q108_bpe_train[,q112...] [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q108_bpe_train", "q112_bpe_encode"))
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Sessions.local("graft-probe")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val cnt = fn(spark, d).count()
        println(f"PROBE $n rep=$r rows=$cnt sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
