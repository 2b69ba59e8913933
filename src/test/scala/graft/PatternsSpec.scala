package graft

import graft.queries.Patterns
import org.apache.spark.sql.functions._

class PatternsSpec extends SparkSpec {

  test("q52 window-rank percentiles equal Spark's buffering percentile aggregate") {
    // Differential oracle: Spark's built-in `percentile` uses the same
    // linear interpolation but buffers every group value in one aggregation
    // buffer (the formulation q52 replaced for 100 TB safety). Results must
    // be identical row for row.
    val viaBuffer = Tables.lineitem(spark, sf)
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
      .collect().map(_.toString)

    val viaWindow = Patterns.q52Percentiles(spark, sf)
      .select("l_returnflag", "qi", "quartile", "n")
      .collect().map(_.toString)

    assert(viaWindow.nonEmpty)
    assert(viaWindow.toSeq == viaBuffer.toSeq)
  }

  test("q52 plan has no buffering percentile aggregate and no raw-row sort") {
    val df = Patterns.q52Percentiles(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), "buffering percentile agg crept back in")
    assert(plan.contains("Window"), "expected histogram running-sum windows")
    // Every window in the plan runs over histogram rows (post-aggregation),
    // never raw lineitem rows: the aggregates sit below the windows.
    val firstWindow = plan.linesIterator.indexWhere(_.contains("Window"))
    val aggBelow = plan.linesIterator.drop(firstWindow).exists(_.contains("HashAggregate"))
    assert(aggBelow, "window must consume aggregated (histogram) rows, not raw rows")
  }
}
