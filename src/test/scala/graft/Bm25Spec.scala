package graft

import graft.text.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("bm25: tf, length normalization, and idf rank as the formula says") {
    val docs = Seq(
      (1L, "hash hash hash alpha beta"),
      (2L, "hash alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta"),
      (4L, "zebra hash"),
    ).toDF("doc_id", "text")
    val hash = Bm25.topK(docs, Seq("hash"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // docs without any query term never appear
    assert(!hash.contains(3L))
    assert(hash.keySet == Set(1L, 2L, 4L))
    // higher tf at comparable length wins; shorter doc at equal tf wins
    assert(hash(1L) > hash(2L))
    assert(hash(4L) > hash(2L))
    assert(hash.values.forall(_ > 0))
    // idf: for the same doc, tf, and dl, the rarer term contributes more
    val zebra = Bm25.topK(docs, Seq("zebra"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(zebra.keySet == Set(4L), "zebra appears only in doc 4")
    assert(zebra(4L) > hash(4L),
      s"rare-term score ${zebra(4L)} should beat common-term ${hash(4L)}")
  }

  test("bm25: multi-term scores add per-term contributions") {
    val docs = Seq(
      (1L, "hash merge alpha"),
      (2L, "hash alpha beta"),
      (3L, "merge alpha beta"),
    ).toDF("doc_id", "text")
    val both = Bm25.topK(docs, Seq("hash", "merge"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(both.keySet == Set(1L, 2L, 3L))
    // doc 1 matches both terms — strictly ahead of single-term matches
    assert(both(1L) > both(2L) && both(1L) > both(3L))
  }

  test("rerank: output ⊆ BM25 shortlist, ordered by the second signal") {
    val top10 = Bm25.qBm25Rerank(spark, sf).collect()
    assert(top10.length == 10)
    val shortlist = Bm25.topK(Tables.documents(spark, sf), Bm25.QueryTerms, 50)
      .collect().map(_.getLong(0)).toSet
    assert(top10.map(_.getLong(0)).forall(shortlist.contains),
      "rerank must only reorder stage-1 candidates, never introduce new docs")
    val fl = top10.map(_.getAs[Double]("fluency"))
    assert(fl.sameElements(fl.sorted(Ordering[Double].reverse)),
      "final order is the rerank signal, not BM25")
  }

  test("bm25 plan: broadcast stats, TakeOrderedAndProject top-k") {
    val df = Bm25.qBm25(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"), "top-k must not be a global sort")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      "corpus stats / df table must broadcast")
  }
}
