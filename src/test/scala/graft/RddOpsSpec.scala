package graft

import graft.rdd.RddOps

/** Top-level so implicit product Encoders resolve (local case classes
  * inside a test body don't get encoders). */
case class Emp(name: String, dept: String)
case class Dept(dept: String, floor: Int)

class RddOpsSpec extends SparkSpec {
  import spark.implicits._
  private def res(name: String) = getClass.getResource(s"/fixtures/$name").getPath

  test("4-way reduction: all four strategies agree (monoid law)") {
    val data = Seq("alex" -> 5, "jane" -> 3, "alex" -> 9, "rafa" -> 7,
                   "jane" -> 7, "rafa" -> 8, "clint" -> 9)
    val rdd = spark.sparkContext.parallelize(data, 3)
    val results = RddOps.sumByKey4Ways(rdd)
    val expected = Map("alex" -> 14, "jane" -> 10, "rafa" -> 15, "clint" -> 9)
    results.foreach(r => assert(r == expected))
  }

  test("monoid average is partition-invariant; wrong mean is not") {
    val ratings = Seq("u1" -> 4.0, "u1" -> 3.0, "u1" -> 5.0, "u2" -> 2.0, "u2" -> 4.0)
    def monoid(parts: Int): Map[String, Double] =
      spark.sparkContext.parallelize(ratings, parts)
        .mapValues(v => (v, 1L))
        .reduceByKey((a, b) => (a._1 + b._1, a._2 + b._2))
        .mapValues { case (s, n) => s / n }.collect().toMap
    assert(monoid(1) == monoid(8))
    assert(monoid(1)("u1") == 4.0 && monoid(1)("u2") == 3.0)
    // the wrong pairwise mean gives a different (incorrect) u1 answer
    val wrong = RddOps.wrongMeanByKey(spark.sparkContext.parallelize(ratings, 1))
    assert(wrong("u1") != 4.0)
  }

  test("fasta base counts: exact totals incl. record sentinel") {
    val lines = spark.sparkContext.textFile(res("sample.fasta"))
    val counts = RddOps.fastaBaseCounts(lines)
    // 3 records; bases counted by hand from the fixture
    assert(counts("z") == 3L)
    assert(counts("A") == 10L)
    assert(counts("T") == 10L)
    assert(counts("C") == 10L)
    assert(counts("G") == 10L)
    assert(counts("N") == 3L)
  }

  test("partition-level combiner emits at most |keys| pairs per partition") {
    val rdd = spark.sparkContext.parallelize(Seq.fill(1000)("x") ++ Seq.fill(500)("y"), 8)
    val combined = RddOps.partitionCombineCounts(rdd)(identity)
    assert(combined.collect().toMap == Map("x" -> 1000L, "y" -> 500L))
  }

  test("tolerant int parsing skips bad records (reference skip semantics)") {
    val nums = RddOps.parseIntsTolerant(spark.read.textFile(res("numbers.txt")))
    assert(nums.count() == 11) // 12 lines, one non-numeric
    assert(nums.collect().sum == 44)
  }

  test("per-partition stats are partition-visible; global reduce is invariant") {
    val rdd = spark.sparkContext.parallelize(1 to 100, 4)
    val stats = RddOps.perPartitionStats(rdd)
    assert(stats.length == 4)
    assert(stats.map(_._3).sum == 5050L)
    assert(stats.map(_._4).sum == 100L)
    assert(stats.map(_._1).min == 1 && stats.map(_._2).max == 100)
  }

  test("glom + repartition/coalesce partition semantics") {
    val rdd = spark.sparkContext.parallelize(1 to 12, 3)
    assert(RddOps.glom(rdd).length == 3)
    assert(RddOps.glom(rdd).flatten.sorted.sameElements(1 to 12))
    val ds = spark.range(100).toDF("id")
    assert(RddOps.numPartitions(ds.repartition(7)) == 7)
    assert(RddOps.numPartitions(ds.repartition(8).coalesce(2)) == 2)
  }

  test("mapValues preserves partitioner (R2 contract)") {
    val rdd = spark.sparkContext.parallelize(Seq("a" -> 1, "b" -> 2), 2)
      .partitionBy(new org.apache.spark.HashPartitioner(2))
    val mapped = RddOps.mapValuesPreserving(rdd)(_ * 10)
    assert(mapped.partitioner == rdd.partitioner)
    assert(mapped.collect().toMap == Map("a" -> 10, "b" -> 20))
  }

  test("CentsAvg aggregator matches plain average on 2-decimal data") {
    val df = Seq(("a", 1.25), ("a", 2.75), ("b", 10.10)).toDF("k", "v")
    val avgCents = org.apache.spark.sql.functions.udaf(new graft.rdd.CentsAvg)
    val got = df.groupBy("k").agg(avgCents($"v").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == 2.0 && got("b") == 10.10)
  }

  test("typed joinWith keeps both sides as case classes; == untyped join") {
    val emps = Seq(Emp("ann", "eng"), Emp("bo", "ops"), Emp("cy", "eng")).toDS()
    val depts = Seq(Dept("eng", 3), Dept("ops", 1)).toDS()
    val typed = emps.joinWith(depts, emps("dept") === depts("dept"))
      .collect().map { case (e, d) => (e.name, d.floor) }.sorted
    val untyped = emps.toDF().join(depts.toDF(), "dept")
      .select("name", "floor").collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted
    assert(typed.sameElements(untyped))
    assert(typed.toSeq == Seq(("ann", 3), ("bo", 1), ("cy", 3)))
  }
}
