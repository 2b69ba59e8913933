package graft.ops

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows to [start, end) interval rows.
  *
  * Spark has no native range join, and the naive formulation — a join
  * whose ONLY predicate is the pair of inequalities — plans as
  * BroadcastNestedLoopJoin: every point × every interval, O(n·m)
  * predicate evaluations, a non-starter when the interval side outgrows
  * a broadcast. The scale formulation bins the time axis: each point
  * lands in one fixed-width bin, each interval explodes to the bins it
  * overlaps (ceil(len/width)+1 rows — bounded fan-out), the join becomes
  * an EQUI-join on the bin (hash-partitionable, AQE-skew-splittable),
  * and the exact inequalities run as a post-filter on same-bin pairs
  * only. PlanAuditSpec pins both halves: equality of results with the
  * naive plan, and hash-join vs nested-loop plan shapes.
  */
object RangeJoin {

  /** Bin-bucketed range join. `binDays` should be on the order of the
    * typical interval length: shorter → more interval replication,
    * longer → more false same-bin pairs for the post-filter. */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binDays: Int): DataFrame = {
    val epoch = to_date(lit("1990-01-01"))
    val p = points.withColumn("__bin",
      floor(datediff(col(pointCol), epoch) / binDays))
    val iv = intervals.withColumn("__bin", explode(sequence(
      floor(datediff(col(startCol), epoch) / binDays),
      floor(datediff(col(endCol), epoch) / binDays))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Naive inequality-only join (BroadcastNestedLoopJoin) — kept as the
    * correctness twin the spec compares against; never the scale path. */
  def rangeJoinNaive(points: DataFrame, pointCol: String,
                     intervals: DataFrame, startCol: String, endCol: String): DataFrame =
    points.join(intervals,
      col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))

  /** Lineitems shipped within 7 days of the 20 highest-value orders'
    * dates: top-20 interval build → binned range join → per-order
    * shipment stats. Oracle: DuckDB runs the same inequality join
    * directly. */
  def qRangeJoin(spark: SparkSession, d: String): DataFrame = {
    val top = Tables.orders(spark, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
      .select(col("o_orderkey"), col("o_orderdate"),
        expr("o_orderdate + INTERVAL 7 DAY").as("window_end"))
    val li = Tables.lineitem(spark, d).select("l_shipdate", "l_quantity")
    rangeJoinBinned(li, "l_shipdate", top, "o_orderdate", "window_end", binDays = 7)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_shipped"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** The q72 workload through the NATIVE operator
    * ([[graft.plans.IntervalJoinExec]] via the injected planner strategy):
    * same `lo <= p < hi` semantics, broadcast + binary-search instead of
    * bin replication — the custom-SparkPlan escalation demonstrated on a
    * real query with the same DuckDB oracle shape as q72. */
  def qIntervalNative(spark: SparkSession, d: String): DataFrame = {
    val top = Tables.orders(spark, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
      .select(col("o_orderkey"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("lo"),
        (unix_date(to_date(col("o_orderdate"))) + 7).cast("long").as("hi"))
    val li = Tables.lineitem(spark, d)
      .select(unix_date(to_date(col("l_shipdate"))).cast("long").as("p"), col("l_quantity"))
    graft.plans.IntervalJoin.pointInInterval(li, top, "p", "lo", "hi")
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_shipped"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_range_join" -> (qRangeJoin _),
    "q97_interval_native" -> (qIntervalNative _))

  val oracles: Map[String, String] = Map(
    "q72_range_join" -> s"""
      WITH top AS (
        SELECT o_orderkey, o_orderdate,
               o_orderdate + INTERVAL 7 DAY AS window_end
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20)
      SELECT o_orderkey, COUNT(*) AS n_shipped,
             ${Num.sqlDsum("l_quantity")} AS sum_qty
      FROM top JOIN lineitem
        ON l_shipdate >= o_orderdate AND l_shipdate < window_end
      GROUP BY o_orderkey ORDER BY o_orderkey""",
    // identical inequality-join semantics, epoch-day arithmetic
    "q97_interval_native" -> s"""
      WITH top AS (
        SELECT o_orderkey, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 7 AS hi
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20),
      pts AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS p, l_quantity
        FROM lineitem)
      SELECT o_orderkey, COUNT(*) AS n_shipped,
             ${Num.sqlDsum("l_quantity")} AS sum_qty
      FROM top JOIN pts ON p >= lo AND p < hi
      GROUP BY o_orderkey ORDER BY o_orderkey""")
}
