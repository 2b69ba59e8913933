package graft

import graft.pipeline.Curation
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation funnel: stages compose, report is sane") {
    val docs = Tables.documents(spark, sf)
    val report = Curation.curate(docs).collect()
    assert(report.nonEmpty)
    val kept = report.map(_.getAs[Long]("n_kept")).sum
    assert(kept > 0 && kept <= docs.count())
    report.foreach { r =>
      val ratio = r.getAs[Double]("corpus_stop_ratio")
      assert(ratio >= 0.01 && ratio <= 1.0)
    }
  }

  test("curation is one plan: no intermediate actions, filters pushed") {
    val df = Curation.curate(Tables.documents(spark, sf))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("FileScan") || p.contains("Scan parquet"))
  }

  test("withSplit is deterministic and covers every row") {
    val docs = Tables.documents(spark, sf)
    val s1 = Curation.withSplit(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.values.sum == docs.count())
    assert(s1.keySet == Set("train", "test"))
  }

  test("capPerGroup: bound holds, subset of input, deterministic, WindowGroupLimit plan") {
    val docs = Tables.documents(spark, sf)
    val cap = 7
    val capped = Curation.capPerGroup(docs, "source", cap)
    capped.collect()
    // per-group bound and exactness: min(cap, group size) rows survive
    val got = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == full.keySet)
    full.foreach { case (s, n) => assert(got(s) == math.min(cap.toLong, n)) }
    // kept rows are input rows (subset, not a rewrite)
    assert(capped.select("doc_id").exceptAll(docs.select("doc_id")).isEmpty)
    // deterministic under repartition: same keeper set
    val again = Curation.capPerGroup(docs.repartition(13), "source", cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == capped.select("doc_id").collect().map(_.getLong(0)).toSet)
    // rank<=cap plans as WindowGroupLimit: map-side per-group top-k before
    // the window shuffle — the property that keeps the shuffle O(groups*cap)
    val plan = capped.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("incremental dedup drops only known fingerprints") {
    val hist = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val known = hist.select(md5(col("text")).as("fp"))
    val fresh = Seq((10L, "alpha beta gamma"), (11L, "brand new content here"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(fresh, known).collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(11L))
    assert(kept.head.schema.fieldNames.sameElements(Array("doc_id", "text")))
  }
}
