package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native point-in-interval join — the full custom-operator escalation
  * (SURVEY §7.4(c)): a logical node, a planner [[SparkStrategy]], and a
  * physical [[IntervalJoinExec]], registered per-session through
  * `spark.experimental.extraStrategies` (and injectable cluster-wide via
  * `graft.functions.GraftExtensions`).
  *
  * Why a whole operator instead of composing built-ins: a join whose only
  * predicate is a pair of inequalities plans as BroadcastNestedLoopJoin —
  * O(points × intervals) predicate evaluations. The DataFrame-level
  * rewrite ([[graft.ops.RangeJoin.rangeJoinBinned]]) fixes the asymptotics
  * with bin replication, at the cost of interval fan-out and a post-
  * filter; this operator instead keeps the broadcast shape but replaces
  * the nested loop with binary search over the lo-sorted interval array +
  * a prefix-max-hi early stop — O(log m + matches) per point, no
  * replication, no post-filter. Use when the interval side fits a
  * broadcast but the nested loop doesn't fit a lifetime ([[graft.ops
  * .RangeJoin]] remains the both-sides-huge path).
  *
  * Semantics: `lo <= p < hi` (same as rangeJoinBinned). All three columns
  * must be LongType — callers derive epoch-day/epoch-micro longs first
  * (PlansSpec and q97 show the shape).
  */
case class PointInIntervalJoin(left: LogicalPlan, right: LogicalPlan,
                               pointAttr: Attribute, loAttr: Attribute,
                               hiAttr: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  // Declare the join columns as referenced: without this, ColumnPruning
  // sees an opaque node with no references and prunes p/lo/hi out of the
  // children whenever the parent doesn't project them (found the hard way).
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      pointAttr :: loAttr :: hiAttr :: Nil)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PointInIntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical node; everything else falls through to Spark. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: PointInIntervalJoin =>
      IntervalJoinExec(j.pointAttr, j.loAttr, j.hiAttr,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Broadcast interval join: collect + broadcast the interval side (the
  * same driver-roundtrip a BroadcastHashJoin's exchange performs), sort
  * by `lo` once, precompute the prefix max of `hi`; each point then
  * binary-searches the last interval with lo <= p and walks left only
  * while the prefix max of hi still clears p — the early stop that makes
  * non-matching prefixes free. */
case class IntervalJoinExec(pointAttr: Attribute, loAttr: Attribute,
                            hiAttr: Attribute,
                            left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  private def ordinal(side: SparkPlan, attr: Attribute): Int = {
    val i = side.output.indexWhere(_.exprId == attr.exprId)
    require(i >= 0, s"column $attr not found in ${side.output}")
    i
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val loIdx = ordinal(right, loAttr)
    val hiIdx = ordinal(right, hiAttr)
    val pIdx = ordinal(left, pointAttr)
    // interval side: collected exactly like a broadcast join's build side
    val sorted = right.executeCollect().map(_.copy())
      .sortBy(_.getLong(loIdx))
    val los = sorted.map(_.getLong(loIdx))
    val prefMaxHi = new Array[Long](sorted.length)
    var m = Long.MinValue
    var i = 0
    while (i < sorted.length) {
      m = math.max(m, sorted(i).getLong(hiIdx)); prefMaxHi(i) = m; i += 1
    }
    val bc = sparkContext.broadcast((sorted, los, prefMaxHi))
    val outAttrs = output
    left.execute().mapPartitions { iter =>
      val (rs, lo, pm) = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { lrow =>
        val p = lrow.getLong(pIdx)
        // binary search: first index with lo > p (candidates are [0, ub))
        var a = 0; var b = rs.length
        while (a < b) {
          val mid = (a + b) >>> 1
          if (lo(mid) <= p) a = mid + 1 else b = mid
        }
        val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        var j = a - 1
        while (j >= 0 && pm(j) > p) { // prefix max hi <= p ⇒ nothing earlier matches
          if (rs(j).getLong(hiIdx) > p) // lo <= p < hi
            buf += proj(joined(lrow, rs(j))).copy()
          j -= 1
        }
        buf
      }
    }
  }
}

object IntervalJoin {
  /** Register the strategy on this session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy

  /** points ⋈ intervals on `lo <= point < hi`; all three LongType. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String): DataFrame = {
    val spark = points.sparkSession
    install(spark)
    val lp = GraftBridge.analyzed(points)
    val rp = GraftBridge.analyzed(intervals)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$name not in ${plan.output.map(_.name)}"))
    GraftBridge.ofRows(spark, PointInIntervalJoin(lp, rp,
      attr(lp, pointCol), attr(rp, loCol), attr(rp, hiCol)))
  }
}
