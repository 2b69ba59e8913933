package graft

import graft.ops.Percentiles
import graft.queries.Patterns
import org.apache.spark.sql.functions._

class PatternsSpec extends SparkSpec {

  // Differential oracle: Spark's built-in `percentile` uses the same linear
  // interpolation but buffers every group value in one aggregation buffer
  // (the formulation q52 replaced for 100 TB safety).
  private def viaBufferingAgg(): Seq[String] =
    Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr(
        "transform(percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D)), x -> round(x, 4))")
        .as("price_quartiles"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n"),
        posexplode(col("price_quartiles")).as(Seq("qi", "quartile")))
      .select(col("l_returnflag"), (col("qi") + 1).cast("int").as("qi"),
        col("quartile"), col("n"))
      .orderBy("l_returnflag", "qi")
      .select("l_returnflag", "qi", "quartile", "n")
      .collect().map(_.toString).toSeq

  test("q52 window-rank percentiles equal Spark's buffering percentile aggregate") {
    val viaWindow = Patterns.q52Percentiles(spark, sf)
      .select("l_returnflag", "qi", "quartile", "n")
      .collect().map(_.toString).toSeq
    assert(viaWindow.nonEmpty)
    assert(viaWindow == viaBufferingAgg())
  }

  test("bucket-selection percentiles equal the buffering aggregate too") {
    val viaBuckets = Percentiles.viaBucketSelection(
        Tables.lineitem(spark, sf), "l_returnflag", "l_extendedprice",
        Seq(0.25, 0.5, 0.75), bucketWidth = 100)
      .select(col("l_returnflag"), col("qi"),
        round(col("quantile"), 4).as("quartile"), col("n"))
      .orderBy("l_returnflag", "qi")
      .select("l_returnflag", "qi", "quartile", "n")
      .collect().map(_.toString).toSeq
    assert(viaBuckets.nonEmpty)
    assert(viaBuckets == viaBufferingAgg())
  }

  test("q52 plan has no buffering percentile aggregate") {
    // at test sf the hottest group is far below SortPathMaxGroupRows, so
    // the dispatch must pick the window-rank regime
    val plan = Patterns.q52Percentiles(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), "buffering percentile agg crept back in")
    assert(plan.contains("row_number"), "expected the sort-based rank formulation")
  }

  test("grouped dispatch routes on the hottest-group statistic") {
    val li = Tables.lineitem(spark, sf)
    def plan(hint: Long): String = Percentiles.grouped(
        li, "l_returnflag", "l_extendedprice", Seq(0.5), bucketWidth = 100,
        maxGroupRowsHint = Some(hint))
      .queryExecution.executedPlan.toString
    // below threshold → window-rank (ranks raw rows)
    assert(plan(Percentiles.SortPathMaxGroupRows).contains("row_number"))
    // above threshold → bucket selection (never ranks raw rows)
    assert(!plan(Percentiles.SortPathMaxGroupRows + 1).contains("row_number"))
    // the probe measures the hottest group exactly; empty input → 0
    import spark.implicits._
    val skewed = (Seq.fill(7)("hot") ++ Seq("cold", "cold")).zipWithIndex
      .toDF("g", "v")
    assert(Percentiles.probeMaxGroupRows(skewed, "g") == 7L)
    assert(Percentiles.probeMaxGroupRows(skewed.filter(col("v") < 0), "g") == 0L)
    // and the forced-bucket route is still value-correct (hint, no probe)
    val forced = Percentiles.grouped(
        li, "l_returnflag", "l_extendedprice", Seq(0.25, 0.5, 0.75),
        bucketWidth = 100, maxGroupRowsHint = Some(Long.MaxValue))
      .select(col("l_returnflag"), col("qi"),
        round(col("quantile"), 4).as("quartile"), col("n"))
      .orderBy("l_returnflag", "qi")
      .collect().map(_.toString).toSeq
    assert(forced == viaBufferingAgg())
  }

  test("bucket-selection plan sorts no raw rows: windows sit above aggregates") {
    val plan = Percentiles.viaBucketSelection(
        Tables.lineitem(spark, sf), "l_returnflag", "l_extendedprice",
        Seq(0.5), bucketWidth = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("))
    assert(!plan.contains("row_number"), "bucket selection must not rank raw rows")
    val firstWindow = plan.linesIterator.indexWhere(_.contains("Window"))
    assert(firstWindow >= 0)
    val aggBelow = plan.linesIterator.drop(firstWindow).exists(_.contains("HashAggregate"))
    assert(aggBelow, "windows must consume aggregated (histogram) rows, not raw rows")
  }
}
