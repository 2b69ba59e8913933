package graft

import graft.ops.Packing
import graft.text.Text
import org.apache.spark.sql.functions._

/** Invariant specs for the training-pipeline ops added on top of the
  * oracle checks (q66/q67/q68): conservation, determinism, and
  * partition-invariance — the properties the oracle can't see. */
class PipelineOpsSpec extends SparkSpec {

  test("sequence packing conserves tokens and numbers chunks contiguously") {
    val packed = Packing.qSequencePacking(spark, sf).collect()
    val perLangTotals = Tables.documents(spark, sf)
      .select(col("lang"), size(Text.tokens).as("n"))
      .groupBy("lang").agg(sum(col("n")).as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = packed.groupBy(_.getString(0))
    assert(byLang.keySet == perLangTotals.keySet)
    byLang.foreach { case (lang, rows) =>
      // conservation: every token lands in exactly one chunk
      assert(rows.map(_.getLong(3)).sum == perLangTotals(lang),
        s"$lang: chunk token sum != corpus total")
      // contiguity: chunk ids are 0..max with no gaps (every chunk gets
      // at least one doc START only if docs are shorter than the budget;
      // long docs may straddle several chunks → ids can skip. Assert the
      // weaker, always-true contract: ids start at 0 and are sorted.)
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0L, s"$lang: first chunk id ${ids.head} != 0")
      assert(ids.distinct.length == ids.length, s"$lang: duplicate chunk ids")
    }
  }

  test("packing with a budget beyond the corpus yields one chunk per shard") {
    val one = Packing.packChunks(Tables.documents(spark, sf),
        size(Text.tokens), budget = Int.MaxValue,
        partitionCol = "lang", orderCol = "doc_id")
      .select("lang", "chunk_id").distinct().collect()
    assert(one.forall(_.getLong(1) == 0L))
  }

  test("packing chunk assignment is partition-invariant") {
    def run(parts: Int) = Packing.packChunks(
        Tables.documents(spark, sf).repartition(parts),
        size(Text.tokens), 512, "lang", "doc_id")
      .select("lang", "doc_id", "chunk_id")
      .collect().map(_.toString).sorted.toSeq
    assert(run(3) == run(17), "window cumsum must not depend on layout")
  }

  test("unigram LM: scores negative, token-weighted, partition-invariant") {
    val rows = Text.qUnigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) < 0.0, s"doc ${r.getLong(0)}: logprob must be < 0")
    }
    // exact integer fixed-point state ⇒ bitwise equality under re-layout
    val re = Text.qUnigramLm(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == re.map(_.toString).toSeq)
    // docs' token counts must sum to the corpus total
    val total = Tables.documents(spark, sf)
      .select(size(Text.tokens).as("n")).agg(sum("n")).collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("incremental view: merge of arbitrary splits == full recompute, bitwise") {
    import graft.ops.Incremental
    val ev = Tables.events(spark, sf)
    val full = Incremental.view(Incremental.aggState(ev))
      .collect().map(_.toString).sorted.toSeq
    // any content-based split must merge back to the identical view
    Seq(col("event_id") % 3 === 0, col("user_id") % 2 === 0,
        col("value") > 50.0).foreach { pred =>
      val merged = Incremental.view(Incremental.mergeStates(
          Incremental.aggState(ev.filter(pred)),
          Incremental.aggState(ev.filter(!pred))))
        .collect().map(_.toString).sorted.toSeq
      assert(merged == full, s"split on [$pred] diverged from full recompute")
    }
    // three-way merge associates
    val threeWay = Incremental.view(Incremental.mergeStates(
        Incremental.aggState(ev.filter(col("event_id") % 3 === 0)),
        Incremental.aggState(ev.filter(col("event_id") % 3 === 1)),
        Incremental.aggState(ev.filter(col("event_id") % 3 === 2))))
      .collect().map(_.toString).sorted.toSeq
    assert(threeWay == full)
  }

  test("snapshot diff classifies planted changes exactly") {
    import graft.ops.Diff
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "text")
    val v2 = Seq((1L, "a"), (2L, "B!"), (4L, "d"), (9L, "new")).toDF("id", "text")
    val d = Diff.snapshotDiff(v1, v2, "id", md5(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed", 3L -> "deleted",
      4L -> "unchanged", 9L -> "inserted"))
  }

  test("z-order kernel: exact interleave vs bit-by-bit reference; locality holds") {
    import graft.functions.SpatialKernels
    // reference: naive bit-by-bit interleave
    def naive(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 31)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (19999L, 999L),
      (0x7fffffffL, 0x7fffffffL), (12345L, 54321L))
    cases.foreach { case (a, b) =>
      assert(SpatialKernels.zOrder2(a, b) == naive(a, b), s"($a, $b)")
      assert(SpatialKernels.zOrder2(a, b) >= 0L, "must never reach the sign bit")
    }
    // data-skipping property: per-z-bucket spans are <= 256 in BOTH dims
    // (2^16 bucket width fixes bits >= 8 of each dimension). sf0.01 —
    // sf0.001's key space is under one bucket wide.
    val rows = graft.ops.Clustering.qZOrder(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length > 1, "need multiple buckets to demonstrate locality")
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 255, s"part span leaked: $r")
      assert(r.getLong(5) - r.getLong(4) <= 255, s"supp span leaked: $r")
    }
  }

  test("funnel steps are monotone non-increasing") {
    val steps = graft.queries.Analytics.qFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(steps.keySet == Set("1_view", "2_click_after_view", "3_purchase_after_click"))
    assert(steps("1_view") >= steps("2_click_after_view"))
    assert(steps("2_click_after_view") >= steps("3_purchase_after_click"))
    assert(steps("1_view") > 0)
  }

  test("cohorts: week 0 of each cohort contains every cohort member") {
    val rows = graft.queries.Analytics.qCohorts(spark, sf).collect()
    val byCohort = rows.groupBy(_.getDate(0).toString)
    byCohort.foreach { case (cw, rs) =>
      val week0 = rs.find(_.getLong(1) == 0L)
      assert(week0.isDefined, s"cohort $cw missing week 0")
      val size = week0.get.getLong(2)
      rs.foreach(r => assert(r.getLong(2) <= size,
        s"cohort $cw week ${r.getLong(1)}: retention cannot exceed cohort size"))
    }
  }

  test("boilerplate: exactly top-5 grams per lang, counts non-increasing") {
    val rows = Text.qBoilerplate(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length),
        s"$lang: ranks must be 1..k")
      assert(ranked.length <= 5)
      val counts = ranked.map(_.getLong(3))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"$lang: counts must be non-increasing")
    }
  }

  test("mixture sample: per-source overshoot < one doc; budgets ∝ floor(sqrt)") {
    import graft.ops.Sampling
    val docs = Tables.documents(spark, sf)
    val kept = Sampling.mixtureSample(docs, size(Text.tokens), 20000L)
    // greedy exclusive-prefix rule: dropping the largest kept doc of a
    // source must land strictly under the budget
    val stats = kept.groupBy("source")
      .agg(max("budget").as("b"), sum("n_tokens").as("t"),
           max("n_tokens").as("mx"))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (b, t, mx) = (r.getLong(1), r.getLong(2), r.getInt(3).toLong)
      assert(t - mx < b, s"${r.getString(0)}: tokens=$t budget=$b max_doc=$mx")
    }
    // deterministic: same data, same budget → identical selection
    val again = Sampling.mixtureSample(docs, size(Text.tokens), 20000L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val first = kept.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(first.sameElements(again))
  }

  test("round-robin shards: per-shard token totals within one max-doc") {
    val sharded = Packing.shardRoundRobin(Tables.documents(spark, sf),
      size(Text.tokens), nShards = 4, partitionCol = "lang", orderCol = "doc_id")
    sharded.groupBy("lang", "shard")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .collect().groupBy(_.getString(0)).foreach { case (lang, rows) =>
        val tots = rows.map(_.getLong(2))
        val maxDoc = sharded.filter(col("lang") === lang)
          .agg(max("n_tokens")).collect().head.getInt(0).toLong
        assert(tots.max - tots.min <= maxDoc,
          s"$lang: shard spread ${tots.max - tots.min} exceeds max doc $maxDoc")
        val ns = rows.map(_.getLong(3))
        assert(ns.max - ns.min <= 1, s"$lang: doc counts must differ by ≤1")
      }
  }

  test("sliding chunks: closed-form count, full coverage, fixed overlap") {
    import spark.implicits._
    // doc lengths straddling every boundary case: sub-window, exact
    // window, window+1 (first straddle), long, and empty
    val docs = Seq((1L, 10), (2L, 64), (3L, 65), (4L, 200), (5L, 0))
      .toDF("doc_id", "n")
    val out = Packing.chunkSliding(docs, col("n"), window = 64, stride = 48)
      .select("doc_id", "n", "n_chunks", "chunk_off", "chunk_len").collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.view.mapValues(_.head.getInt(2)).toMap ==
      Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 4, 5L -> 1))
    byDoc.foreach { case (id, rows) =>
      val n = rows.head.getInt(1)
      val sorted = rows.sortBy(_.getInt(3))
      // offsets advance by exactly the stride
      assert(sorted.map(_.getInt(3)).sameElements(
        Array.tabulate(sorted.length)(_ * 48)), s"doc $id offsets")
      // last chunk ends exactly at n; every earlier chunk is full-width
      val last = sorted.last
      assert(last.getInt(3) + last.getInt(4) == n, s"doc $id coverage")
      assert(sorted.init.forall(_.getInt(4) == 64), s"doc $id non-last widths")
    }
  }

  test("ntile curriculum: buckets sized within 1, ranges non-overlapping") {
    graft.queries.Analytics.qNtileCurriculum(spark, sf).collect()
      .groupBy(_.getString(0)).foreach { case (lang, rows) =>
        val sorted = rows.sortBy(_.getInt(1))
        val ns = sorted.map(_.getLong(2))
        assert(ns.max - ns.min <= 1, s"$lang: quartile sizes $ns")
        // contiguous ranges: bucket k's min ≥ bucket k-1's max
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(b.getInt(3) >= a.getInt(4),
              s"$lang: bucket ${b.getInt(1)} overlaps ${a.getInt(1)}")
          case _ =>
        }
      }
  }

  test("typed flatMapGroups z-score twin == window formulation, bitwise") {
    val q = graft.queries.Analytics.qGroupZscore(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
                 r.getDouble(3), r.getLong(4))).sortBy(_._1)
    val t = graft.queries.Analytics.groupZscoreTyped(spark, sf).collect()
      .map(s => (s.lang, s.n_docs, s.mean_tokens, s.std_tokens, s.n_outliers))
      .sortBy(_._1)
    assert(q.sameElements(t),
      s"typed and window stats must match bitwise:\n${q.toSeq}\n${t.toSeq}")
  }

  test("observe counters: metrics match a separate aggregation, zero extra pass") {
    import graft.ops.Observed
    val docs = Tables.documents(spark, sf)
    val observed = Observed.withIngestAudit(docs, "ingest")
    // the main job is something else entirely — a filter; the counters
    // ride along in the same pass. NB the action must execute THIS
    // frame's own QueryExecution (collect/write — `count()` plans a
    // separate QE and the metrics land there instead; see Observed docs)
    val job = observed.filter(length(col("text")) > 50)
    assert(job.collect().nonEmpty)
    val m = Observed.metrics(job, "ingest").get
    val expect = docs.agg(
      count(lit(1)), sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)), sum(length(col("text")).cast("long"))).head()
    assert(m.getLong(0) == expect.getLong(0), "rows")
    assert(m.getLong(1) == expect.getLong(1), "empty_texts")
    assert(m.getLong(2) == expect.getLong(2), "text_bytes")
    // and the observation did not perturb the data
    assert(observed.collect().length == docs.count())
  }

  test("winsorized stats: nearest-rank thresholds and clipped mean, by hand") {
    import graft.queries.Analytics
    // group "a": values 1..100 → rank ceil(5*100/100)=5 → lo=5; rank 95 → hi=95
    // below: 1..4 (4 rows), above: 96..100 (5 rows)
    // win_mean = (sum(5..95) + 4*5 + 5*95) / 100 = (4550 + 20 + 475) / 100
    val a = (1 to 100).map(v => ("a", v.toDouble))
    // group "b": 3 values → rLo = ceil(15/100)=1, rHi = ceil(285/100)=3 →
    // nothing clipped, win_mean = plain mean
    val b = Seq(("b", 10.0), ("b", 20.0), ("b", 30.0))
    val df = spark.createDataFrame(a ++ b).toDF("g", "v")
    val out = Analytics.winsorizedStats(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val ra = out("a")
    assert(ra.getAs[Double]("lo") == 5.0 && ra.getAs[Double]("hi") == 95.0)
    assert(ra.getAs[Long]("n_below") == 4L && ra.getAs[Long]("n_above") == 5L)
    assert(ra.getAs[Double]("win_mean") == (4550.0 + 20.0 + 475.0) / 100)
    val rb = out("b")
    assert(rb.getAs[Double]("lo") == 10.0 && rb.getAs[Double]("hi") == 30.0)
    assert(rb.getAs[Long]("n_below") == 0L && rb.getAs[Long]("n_above") == 0L)
    assert(rb.getAs[Double]("win_mean") == 20.0)
    // partition-invariant (exact decimal pieces → bitwise equal)
    val again = Analytics.winsorizedStats(df.repartition(7), "g", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("win_mean")).toMap
    assert(again("a") == ra.getAs[Double]("win_mean"))
    // the bucket-selection twin (q121) is row-for-row identical — same
    // order-statistic thresholds, same exact assembly
    val viaBuckets = Analytics
      .winsorizedStatsViaBuckets(df, "g", "v", bucketWidth = 7.0)
      .collect().map(r => r.getString(0) -> r.toString).toMap
    assert(viaBuckets == out.map { case (k, r) => k -> r.toString })
    // the dispatched entry point (registered q107) routes on the
    // hottest-group statistic and is value-identical on both routes
    def dispatched(hint: Long) = Analytics.winsorizedStatsDispatched(
        df, "g", "v", maxGroupRowsHint = Some(hint))
    assert(dispatched(1L).queryExecution.executedPlan.toString
      .contains("row_number"), "small groups must take the sort regime")
    val bucketPlan = dispatched(Long.MaxValue).queryExecution.executedPlan.toString
    assert(!bucketPlan.contains("row_number"),
      "hot groups must take the domain-bounded bucket regime")
    assert(dispatched(Long.MaxValue).collect().map(r => r.getString(0) -> r.toString).toMap
      == out.map { case (k, r) => k -> r.toString })
  }

  test("PII redaction replaces every pattern, leaves clean text intact") {
    import spark.implicits._
    val rows = Seq(
      "mail a.user+tag@example.co.uk and b@c.io now",
      "ssn 123-45-6789 ip 10.0.42.7 phone +1 (555) 123-4567",
      "clean text with no identifiers at all")
      .toDF("text")
      .select(Text.redact(col("text")).as("r")).as[String].collect()
    assert(rows(0) == "mail [EMAIL] and [EMAIL] now", rows(0))
    assert(rows(1) == "ssn [SSN] ip [IP] phone [PHONE]", rows(1))
    assert(rows(2) == "clean text with no identifiers at all")
  }
}
