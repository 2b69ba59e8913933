package graft

import graft.ops.Splits
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("train/test: disjoint, complete, deterministic, partition-invariant") {
    val (train, test) = Splits.trainTest(docs, "doc_id", 20)
    val n = docs.count()
    assert(train.count() + test.count() == n)
    assert(train.join(test, "doc_id").count() == 0, "splits must be disjoint")
    val testIds = test.select("doc_id").collect().map(_.getLong(0)).toSet
    val (_, test2) = Splits.trainTest(docs.repartition(13), "doc_id", 20)
    assert(test2.select("doc_id").collect().map(_.getLong(0)).toSet == testIds,
      "same rows must land in the same split under any partitioning")
    val ratio = testIds.size.toDouble / n
    assert(ratio > 0.12 && ratio < 0.28, s"test ratio $ratio far from 20%")
  }

  test("appending data never moves existing rows between splits") {
    val first = docs.filter(col("doc_id") < 250)
    val (_, testA) = Splits.trainTest(first, "doc_id", 20)
    val (_, testB) = Splits.trainTest(docs, "doc_id", 20)
    val a = testA.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = testB.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(b), "old rows must keep their split when data grows")
  }

  test("cluster-safe split: duplicates never straddle train/test; bucket is portable") {
    // plant exact duplicates: every doc_id < 50 gets a twin with a new id
    val twins = docs.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val planted = docs.unionByName(twins)
    val split = Splits.clusterSafeSplit(planted, md5(col("text")), 20)
    // leakage guard: no cluster appears in more than one split
    val straddlers = split.groupBy("cluster_key")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddlers.count() == 0, "a duplicate cluster straddles splits")
    // twins really share a cluster (the guard above isn't vacuous)
    val multi = split.groupBy("cluster_key").count().filter(col("count") > 1)
    assert(multi.count() == 50, "planted twins must share their cluster key")
    // portability: the md5 bucket matches an independent JVM computation
    val row = docs.select(col("text")).head.getString(0)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(row.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(hex.take(8), 16) % 100
    val got = spark.range(1)
      .select(Splits.portableBucket(lit(row), 100).as("b"))
      .head.getLong(0)
    assert(got == expected, s"portable bucket $got != MessageDigest $expected")
    // completeness: split adds columns, never drops or duplicates rows
    assert(split.count() == planted.count())
  }

  test("stratified sample respects per-stratum fractions") {
    val sampled = Splits.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 50, "de" -> 100, "fr" -> 0))
    val counts = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("fr", 0L) == 0L)
    assert(counts("de") == full("de"))
    val enRatio = counts("en").toDouble / full("en")
    assert(enRatio > 0.35 && enRatio < 0.65, s"en ratio $enRatio far from 50%")
    assert(!counts.contains("es") && !counts.contains("zh"))
  }
}
