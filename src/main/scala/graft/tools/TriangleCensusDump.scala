package graft.tools

import graft.{Sessions, Tables}
import graft.graph.Graph

import org.apache.spark.sql.functions._

/** Big-sf validation dump for q123/q124: computes the exact and sampled
  * triangle censuses of the co-order graph with the DISK-BOUNDED K-pass
  * rig ([[Graph.trianglesCensusBucketed]] — closing-edge hash buckets
  * broadcast per pass, wedge stream never shuffled) and writes rows with
  * the registered queries' exact schemas to `<outDir>/q123_triangles`
  * and `<outDir>/q124_triangles_sampled`, so `validate_oracle.py`
  * compares them engine-vs-engine against DuckDB.
  *
  * Exists because the registered plans' wedge shuffle needs ~90 GB of
  * local spill at sf10 — more than this sandbox's disk (measured to
  * ENOSPC at three configurations, r9); the K-pass rig computes the
  * identical census in O(|E|/passes) spill. GraphSpec pins rig ==
  * trianglesOriented; on a cluster the registered shuffled plan is the
  * right one and this tool is unnecessary.
  *
  * Usage: TriangleCensusDump <sfDir> <outDir> [passes=6]
  */
object TriangleCensusDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val passes = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = Sessions.local("graft-tri-dump")
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct()
    def edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"TRI_DUMP $tag sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      a
    }
    val (n, cs) = t("exact")(Graph.trianglesCensusBucketed(edges, passes))
    Seq((n, cs)).toDF("n_triangles", "corner_sum")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/q123_triangles")
    val (ns, _) = t("sampled")(Graph.trianglesCensusBucketed(
      Graph.sparsifyUndirected(edges, 1, 2), passes))
    val est = ns * 8
    val wb = math.abs(est - n) * 5 <= n
    Seq((n, ns, est, wb)).toDF("n_exact", "n_sampled", "est", "within_bound")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/q124_triangles_sampled")
    println(s"TRI_DUMP n_exact=$n corner_sum=$cs n_sampled=$ns est=$est within_bound=$wb")
    spark.stop()
  }
}
