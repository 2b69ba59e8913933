package graft

import graft.functions.TopKByScore
import graft.queries.Patterns
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("TopKByScore == window row_number formulation, any partitioning") {
    val viaAgg = Patterns.q53TopKAgg(spark, sf).collect().map(_.toString)
    val viaWindow = Patterns.q48TopNPerGroup(spark, sf).collect().map(_.toString)
    assert(viaAgg.sameElements(viaWindow))
  }

  test("buffer invariants: bounded at k, sorted, merge associative") {
    val agg = new TopKByScore(3)
    val items = Seq((5.0, 1L), (9.0, 2L), (1.0, 3L), (9.0, 1L), (7.0, 4L), (3.0, 5L))
    val all = items.foldLeft(agg.zero)(agg.reduce)
    assert(all._1.length == 3)
    assert(agg.finish(all) == Seq((9.0, 1L), (9.0, 2L), (7.0, 4L))) // ties → lower id first
    // merge of any split == sequential fold
    for (cut <- 1 until items.length) {
      val (l, r) = items.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
                             r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == agg.finish(all), s"split at $cut diverged")
    }
  }

  test("map-side combine: shuffle rows bounded by groups × k") {
    val top3 = udaf(new TopKByScore(3))
    val df = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(top3(col("o_totalprice"), col("o_orderkey")).as("top"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("partial_topkbyscore") ||
           "HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial aggregation before the shuffle:\n$p")
  }
}
