package graft

import graft.ops.RangeJoin
import graft.plans.IntervalJoin
import org.apache.spark.sql.functions._

/** The custom-operator tier: logical node → strategy → physical exec.
  * Correctness is pinned against the naive inequality join; the plan
  * audit pins that the strategy actually fires (a silent fallthrough to
  * BroadcastNestedLoopJoin would still return correct rows). */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 15L), (4L, 20L), (5L, 25L), (6L, 100L))
    .toDF("pid", "p")
  // overlapping, nested, and disjoint intervals; [lo, hi) semantics
  private lazy val intervals = Seq(
    (10L, 0L, 10L),   // covers 5; excludes p=10 (half-open)
    (20L, 5L, 16L),   // covers 5, 10, 15 — includes p=lo
    (30L, 14L, 30L),  // covers 15, 20, 25
    (40L, 18L, 22L),  // nested inside 30's range: covers 20
    (50L, 40L, 50L))  // matches nothing
    .toDF("iid", "lo", "hi")

  test("native interval join == naive inequality join (incl. boundaries)") {
    val native = IntervalJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = RangeJoin.rangeJoinNaive(points, "p", intervals, "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(native.sameElements(naive), s"native=${native.toSeq} naive=${naive.toSeq}")
    // and the hand-derived truth, so both twins can't be wrong together
    assert(native.toSeq == Seq((1L, 10L), (1L, 20L), (2L, 20L), (3L, 20L),
      (3L, 30L), (4L, 30L), (4L, 40L), (5L, 30L)))
  }

  test("the planner strategy fires: IntervalJoinExec in the physical plan") {
    val df = IntervalJoin.pointInInterval(points, intervals, "p", "lo", "hi")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // TreeNode.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("IntervalJoin"),
      s"expected the custom exec, got:\n${plan.take(500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "must not fall through to the nested loop")
  }

  test("downstream operators compose over the custom node") {
    val agg = IntervalJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .groupBy("iid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(agg == Map(10L -> 1L, 20L -> 3L, 30L -> 3L, 40L -> 1L))
  }

  test("empty interval side joins to nothing without failing") {
    val out = IntervalJoin.pointInInterval(
      points, intervals.filter(col("iid") < 0), "p", "lo", "hi")
    assert(out.count() == 0)
  }
}
