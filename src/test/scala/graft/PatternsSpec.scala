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
    val plan = Patterns.q52Percentiles(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), "buffering percentile agg crept back in")
    assert(plan.contains("row_number"), "expected the sort-based rank formulation")
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
