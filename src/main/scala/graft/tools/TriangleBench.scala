package graft.tools

import graft.Sessions
import graft.Tables
import graft.graph.Graph

import org.apache.spark.sql.functions._

/** Solo timer for the triangle-census paths over the q123/q124 co-order
  * graph: exact oriented census vs the DOULION sampled estimate at a
  * chosen keep fraction. Exists to measure the claim that the sampled
  * path contracts the wedge stream ~p² (BENCHMARKS.md "DOULION") —
  * the exact side at sf10 is a ~7-minute batch job, so it only runs
  * when asked.
  *
  * Usage: runMain graft.tools.TriangleBench <sfDir> <keepNum> <keepDen>
  *          [reps] [--exact]
  */
object TriangleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keepNum = args(1).toInt
    val keepDen = args(2).toInt
    val reps = args.drop(3).find(!_.startsWith("--")).map(_.toInt).getOrElse(2)
    val runExact = args.contains("--exact")
    val spark = Sessions.local("graft-tri-bench")
    def edges = {
      val li = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey").distinct()
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    (1 to reps).foreach { rep =>
      val (row, sec) =
        time(Graph.trianglesSampled(edges, keepNum, keepDen).collect().head)
      println(f"TRI sampled rep=$rep keep=$keepNum/$keepDen sec=$sec%.1f " +
        f"n_sampled=${row.getLong(0)} est=${row.getLong(1)}")
    }
    if (runExact) {
      val (n, sec) = time(Graph.trianglesOriented(edges).count())
      println(f"TRI exact sec=$sec%.1f n_exact=$n")
    }
    spark.stop()
  }
}
