package graft

import graft.ops.{Sampling, Sketches}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("heavy hitters: sketch two-pass == exact groupBy+threshold") {
    val viaSketch = Sketches.qHeavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.text.Text.tokens).as("term"))
    val total = toks.count()
    val exact = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") * 100 > total)
      .orderBy(col("n").desc, col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(viaSketch.nonEmpty && viaSketch.sameElements(exact),
      "MG candidates + exact recount must equal the full groupBy")
  }

  test("MG guarantee on adversarial skew: all true heavy hitters survive trimming") {
    // 200 distinct tails + 3 planted hitters, k=10 counters → the summary
    // is trimmed constantly; the (freq > N/k) items must still survive.
    val rows = (Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2") ++
      Seq.fill(200)("hot3") ++ (1 to 200).flatMap(i => Seq.fill(2)(s"tail$i")))
    val n = rows.length
    val df = spark.sparkContext.parallelize(rows, 13).toDF("term")
    val hh = Sketches.heavyHitters(df, "term", phiDen = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // true frequencies above N/10 = 130: hot1 (400), hot2 (300), hot3 (200)
    assert(hh == Map("hot1" -> 400L, "hot2" -> 300L, "hot3" -> 200L),
      s"got $hh for N=$n")
  }

  test("MG summary is bounded and partition-invariant in coverage") {
    val mg = new Sketches.MisraGries(5)
    val stream = (1 to 100).map(i => s"t${i % 20}")  // 20 items, k=5
    val whole = stream.foldLeft(mg.zero)(mg.reduce)
    assert(whole.size <= 5, "buffer must never exceed k")
    // any split point merges to a summary that is still <= k
    Seq(10, 37, 50, 93).foreach { cut =>
      val (l, r) = stream.splitAt(cut)
      val merged = mg.merge(l.foldLeft(mg.zero)(mg.reduce),
                            r.foldLeft(mg.zero)(mg.reduce))
      assert(merged.size <= 5, s"merge at $cut overflowed: ${merged.size}")
    }
  }

  test("approx quantiles sit within tight rank error of exact") {
    val rows = Sketches.approxVsExact(spark, sf).collect()
    assert(rows.length == 9) // 3 flags x 3 quantiles... adjusted below if fewer flags
    val prices = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val sortedVals = prices(r.getString(0))
      val q = r.getDouble(1); val approx = r.getDouble(2)
      // rank of the approx value must be within 1% of the target rank
      // (accuracy=10000 promises 1/10000; 1% is generous against ties)
      val rank = sortedVals.count(_ <= approx).toDouble / sortedVals.length
      assert(math.abs(rank - q) < 0.01,
        s"${r.getString(0)} q=$q: approx $approx at rank $rank")
    }
  }

  test("HLL sketches: parquet round-trip, merge == direct, error bounded") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).select(col("user_id"))
    val exact = ev.agg(count_distinct(col("user_id"))).head().getLong(0)
    // direct one-shot sketch estimate
    val direct = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))"))
      .head().getLong(0)
    // arbitrary 3-way slice → per-slice sketches → STORE as parquet
    // binary → re-read → union. The mergeable-summary contract: identical
    // estimate to the one-shot sketch, under any slicing.
    val dir = "target/tmp/hll_sketches"
    ev.withColumn("slice", pmod(col("user_id"), lit(3)))
      .groupBy("slice").agg(expr("hll_sketch_agg(user_id, 12)").as("sketch"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch, true))"))
      .head().getLong(0)
    assert(merged == direct,
      s"union of stored sketches ($merged) must equal the direct sketch ($direct)")
    assert(math.abs(direct - exact).toDouble / exact < 0.05,
      s"estimate $direct vs exact $exact exceeds 5%")
  }

  test("weighted sample: deterministic, sized, zero-weight excluded, planted weight wins") {
    val a = Sampling.weightedDocSample(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedDocSample(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a == b, "same data + same seed must reproduce the same sample")
    assert(a.length == 25 && a.distinct.length == 25)
    // planted dominance: one row with overwhelming weight is always drawn
    val df = (1L to 500L).map(i => (i, if (i == 77L) 1.0e9 else 1.0))
      .toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", col("w"), k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(picked.contains(77L), s"heavy row must be sampled, got $picked")
    assert(picked.size == 5)
    // zero/negative weights can never appear
    val z = (1L to 50L).map(i => (i, if (i <= 40) 0.0 else 1.0)).toDF("id", "w")
    val zs = Sampling.weightedSample(z, "id", col("w"), k = 20)
      .collect().map(_.getLong(0))
    assert(zs.forall(_ > 40), "zero-weight rows must be excluded")
    assert(zs.length == 10)
  }
}
