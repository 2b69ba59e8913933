package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view refresh): keep
  * per-key MERGEABLE state — here (cents_sum, count), the same monoid as
  * q41 — so a new batch updates the view by aggregating ONLY the delta
  * and merging states, never rescanning history. At 100 TB of history
  * and a daily delta, this is the difference between a full-table
  * aggregation per refresh and one over the day's partition.
  *
  * Correctness hinges on the state being a commutative monoid: integer
  * cents make the merge exact and associative, so
  * merge(state(A), state(B)) == state(A ∪ B) bitwise, for ANY split —
  * PipelineOpsSpec property-checks random splits; the oracle checks the
  * final view against a full recompute.
  */
object Incremental {

  /** Aggregate events into mergeable per-type state. */
  def aggState(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(sum(expr("CAST(ROUND(value * 100) AS BIGINT)")).as("cents"),
           count(lit(1)).as("n"))

  /** Merge any number of states (e.g. yesterday's view + today's delta). */
  def mergeStates(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy("event_type")
      .agg(sum(col("cents")).as("cents"), sum(col("n")).as("n"))

  /** Render the state as the user-facing view (same arithmetic as q41:
    * exact cents sum → double → divide). */
  def view(state: DataFrame): DataFrame =
    state.select(col("event_type"), col("n"),
      ((col("cents").cast("double") / 100.0) / col("n")).as("avg_value"))

  /** Incrementally-maintained per-type average: history (before Jan 15)
    * aggregated once, delta (after) aggregated separately, states
    * merged — result must equal the full recompute, which is exactly
    * what the oracle runs. */
  def qIncrementalView(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val cut = "2024-01-15 00:00:00"
    val base  = aggState(ev.filter(col("ts") <  lit(cut).cast("timestamp")))
    val delta = aggState(ev.filter(col("ts") >= lit(cut).cast("timestamp")))
    view(mergeStates(base, delta)).orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_incremental_view" -> (qIncrementalView _))

  val oracles: Map[String, String] = Map(
    "q76_incremental_view" -> """
      SELECT event_type, COUNT(*) AS n,
             (CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0)
               / COUNT(*) AS avg_value
      FROM events GROUP BY event_type ORDER BY event_type""")
}
