package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property tests (SURVEY §5 upgrade): the monoid laws the reference
  * states in prose (chapter_04/README.md:45-61) and partition-invariance —
  * the exact failure its wrong-mean demo exposes — plus kernel invariants.
  *
  * Uses scalacheck generators with fixed seeds (deterministic CI) sampled
  * manually — the scalatest↔scalacheck bridge artifact isn't available in
  * this offline environment. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val kv: Gen[List[(String, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("a", "b", "c", "d"),
      Gen.chooseNum(-1000, 1000)))

  test("monoid (sum,count) average is invariant under partitioning") {
    for (data <- samples(kv, 10)) {
      def run(p: Int) = spark.sparkContext
        .parallelize(data.map { case (k, v) => (k, v.toDouble) }, p)
        .mapValues(v => (v, 1L))
        .reduceByKey((x, y) => (x._1 + y._1, x._2 + y._2))
        .mapValues { case (s, n) => s / n }
        .collect().toMap
      assert(run(1) == run(7))
    }
  }

  test("decimal sums are partition-invariant at full precision") {
    val vals = Gen.listOfN(200, Gen.chooseNum(1, 9999999).map(_ / 100.0))
    for (data <- samples(vals, 5)) {
      def total(p: Int): Double =
        spark.createDataset(data).repartition(p).toDF("value")
          .agg(Num.dsum(col("value"))).head.getDouble(0)
      assert(total(1) == total(7)) // bitwise ==, not approx
    }
  }

  test("sumByKey4Ways: all four strategies agree for any input") {
    for (data <- samples(kv, 10)) {
      val results = graft.rdd.RddOps.sumByKey4Ways(
        spark.sparkContext.parallelize(data, 4))
      assert(results.distinct.size == 1)
    }
  }

  test("sortedIntersectCount == exact set intersection for any string sets") {
    val strs = Gen.listOf(Gen.identifier.map(_.take(8)))
    for ((a, b) <- samples(Gen.zip(strs, strs), 20)) {
      val df = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.exprs.hashSetSorted(col("a")).as("ha"),
                graft.functions.exprs.hashSetSorted(col("b")).as("hb"))
        .select(graft.functions.exprs.sortedIntersectCount(col("ha"), col("hb")))
      assert(df.head.getInt(0) == (a.toSet & b.toSet).size)
    }
  }

  test("kernels are deterministic for any token list") {
    val toks = Gen.listOfN(15, Gen.identifier.map(_.take(6)))
      .suchThat(_.length >= 3)
    for (a <- samples(toks, 10)) {
      def sig = Seq(Tuple1(a)).toDF("a").select(
        graft.functions.exprs.minhash3gram(col("a"), 16).as("m"),
        graft.functions.exprs.simhash64(col("a")).as("s"),
        graft.functions.exprs.gram3SetSorted(col("a")).as("g")).head
      val (r1, r2) = (sig, sig)
      assert(r1.getSeq[Long](0) == r2.getSeq[Long](0))
      assert(r1.getLong(1) == r2.getLong(1))
      assert(r1.getSeq[Long](2) == r2.getSeq[Long](2))
      assert(r1.getSeq[Long](2).length == a.sliding(3).map(_.mkString(" ")).toSet.size)
    }
  }

  test("Misra–Gries guarantee holds for any stream and any split (random)") {
    val mg = new graft.ops.Sketches.MisraGries(8)
    // skewed random streams: heavy items drawn often, long uniform tail
    val stream: Gen[List[String]] = Gen.listOfN(400,
      Gen.frequency(5 -> Gen.oneOf("h1", "h2"), 3 -> Gen.oneOf("m1", "m2", "m3"),
        2 -> Gen.chooseNum(1, 60).map(i => s"t$i")))
    for ((data, i) <- samples(stream, 12).zipWithIndex) {
      val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = data.size
      val heavy = exact.filter { case (_, c) => c > n / 8 }.keySet
      // merge at a seed-dependent split point (simulates two partitions)
      val cut = (i * 37) % data.size
      val (l, r) = data.splitAt(cut)
      val summary = mg.merge(l.foldLeft(mg.zero)(mg.reduce),
                             r.foldLeft(mg.zero)(mg.reduce))
      assert(summary.size <= 8, "summary must stay bounded")
      assert(heavy.subsetOf(summary.keySet),
        s"heavy hitters $heavy escaped the summary ${summary.keySet} (split $cut)")
      // count under-estimation bound: true - estimate <= n/k
      summary.foreach { case (t, est) =>
        val truth = exact.getOrElse(t, 0L)
        assert(est <= truth && truth - est <= n / 8 + 1,
          s"estimate $est for $t (true $truth) outside MG bounds")
      }
    }
  }

  test("BPE mergeOnce: concatenation preserved, only (l,r) adjacencies fused") {
    val syms: Gen[List[String]] =
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "ab", "bc"))
    samples(syms, 60).foreach { s =>
      val merged = graft.text.BpeTrain.mergeOnce(s, "a", "b")
      // the token stream's character content is invariant under merging
      assert(merged.mkString == s.mkString, s"content changed for $s")
      // no (a, b) adjacency survives
      assert(!merged.zip(merged.drop(1)).contains(("a", "b")),
        s"unmerged adjacency left in $merged")
    }
  }

  test("winsorized stats: mean within thresholds, clip counts bounded (random)") {
    val data: Gen[List[Double]] =
      Gen.listOfN(40, Gen.chooseNum(1, 99999).map(_ / 100.0))
    samples(data, 8).filter(_.nonEmpty).foreach { vs =>
      val df = vs.map(v => ("g", v)).toDF("g", "v")
      val r = graft.queries.Analytics.winsorizedStats(df, "g", "v").collect().head
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      val mean = r.getAs[Double]("win_mean")
      assert(lo <= hi && mean >= lo - 1e-9 && mean <= hi + 1e-9,
        s"win_mean $mean outside [$lo, $hi]")
      assert(r.getAs[Long]("n_below") + r.getAs[Long]("n_above") <= vs.length)
      // thresholds are actual order statistics — members of the data
      assert(vs.contains(lo) && vs.contains(hi))
    }
  }

  test("tolerant CSV ingest: clean + quarantined == input lines, rejects verbatim") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("val", DoubleType)))
    val valid = Gen.zip(Gen.chooseNum(0, 999), Gen.alphaStr.map(_.take(8)),
      Gen.chooseNum(-999, 999)).map { case (i, s, v) => s"$i,$s,${v / 10.0}" }
    val mangled = Gen.oneOf(
      valid.map(_ + ",extra,cols"),                  // arity overflow
      Gen.alphaStr.map(s => s"notanint,${s.take(6)},1.5"), // type mismatch
      Gen.alphaStr.map(s => "7,\"" + s.take(4) + "\"x\",2.0"), // nested quote
      Gen.const("3,\"unterminated quote,9.9"),       // truncated quoted field
      Gen.alphaStr.map(s => s"4,﻿${s.take(4)},0.5"), // mid-field BOM
      Gen.const("5,short"))                          // arity underflow
    val lineGen = Gen.listOfN(40, Gen.frequency(3 -> valid, 2 -> mangled))
    val dir = new java.io.File("target/tmp/prop_quarantine")
    for ((data, i) <- samples(lineGen, 8).zipWithIndex) {
      val lines = "id,name,val" :: data
      val f = new java.io.File(dir, s"csv_$i"); f.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f.getPath, "part.csv"),
        lines.mkString("\n").getBytes("UTF-8"))
      val df = graft.sources.IO.csvTolerant(spark, f.getPath, schema).cache()
      try {
        val clean = df.filter(col("_corrupt").isNull).count()
        val quarantined = df.filter(col("_corrupt").isNotNull)
          .select("_corrupt").collect().map(_.getString(0))
        // conservation: the reader never drops or invents a record
        assert(clean + quarantined.length == data.length,
          s"sample $i: $clean clean + ${quarantined.length} quarantined != ${data.length}")
        // fidelity: every quarantined record is an input line VERBATIM —
        // replayable bytes, not a parser's lossy rendition
        val inputCounts = data.groupBy(identity).view.mapValues(_.size).toMap
        quarantined.groupBy(identity).foreach { case (line, hits) =>
          assert(inputCounts.getOrElse(line, 0) >= hits.size,
            s"sample $i: quarantined line not verbatim in input: <$line>")
        }
      } finally { df.unpersist(); () }
    }
  }

  test("tolerant JSON ingest: same conservation + verbatim contract") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val valid = Gen.zip(Gen.chooseNum(0L, 999L), Gen.alphaStr.map(_.take(8)))
      .map { case (i, s) => s"""{"id": $i, "name": "$s"}""" }
    val mangled = Gen.oneOf(
      Gen.alphaStr.map(s => s"""{"id": "${s.take(4)}x", "name": "y"}"""), // type clash
      valid.map(_.dropRight(1)),                     // truncated object
      valid.map(_ + "}}"),                           // trailing garbage
      Gen.const("""{"id": 1 "name": missingcomma}"""),
      Gen.const("not json at all"))
    val lineGen = Gen.listOfN(40, Gen.frequency(3 -> valid, 2 -> mangled))
    val dir = new java.io.File("target/tmp/prop_quarantine")
    for ((data, i) <- samples(lineGen, 8).zipWithIndex) {
      val f = new java.io.File(dir, s"json_$i"); f.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f.getPath, "part.json"),
        data.mkString("\n").getBytes("UTF-8"))
      val df = graft.sources.IO.jsonTolerant(spark, f.getPath, schema).cache()
      try {
        val clean = df.filter(col("_corrupt").isNull).count()
        val quarantined = df.filter(col("_corrupt").isNotNull)
          .select("_corrupt").collect().map(_.getString(0))
        assert(clean + quarantined.length == data.length,
          s"sample $i: $clean + ${quarantined.length} != ${data.length}")
        val inputCounts = data.groupBy(identity).view.mapValues(_.size).toMap
        quarantined.groupBy(identity).foreach { case (line, hits) =>
          assert(inputCounts.getOrElse(line, 0) >= hits.size,
            s"sample $i: quarantined line not verbatim in input: <$line>")
        }
      } finally { df.unpersist(); () }
    }
  }

  test("round-trip: parquet write/read preserves any (string,double) rows") {
    val rows = Gen.nonEmptyListOf(
      Gen.zip(Gen.alphaNumStr.map(_.take(12)), Gen.chooseNum(-1000000, 1000000).map(_ / 7.0)))
    for (data <- samples(rows, 5)) {
      val df = data.toDF("k", "v")
      df.write.mode("overwrite").parquet("target/tmp/prop_roundtrip")
      val back = spark.read.parquet("target/tmp/prop_roundtrip")
      assert(back.collect().map(r => (r.getString(0), r.getDouble(1))).sorted
        .sameElements(data.sorted))
    }
  }
}
