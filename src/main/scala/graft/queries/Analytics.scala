package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row types for the typed grouped-map twin ([[Analytics.groupZscoreTyped]]);
  * top-level so implicit product Encoders resolve. */
case class LangTokens(lang: String, n_tokens: Int)
case class LangStats(lang: String, n_docs: Long, mean_tokens: Double,
                     std_tokens: Double, n_outliers: Long)

/** Product-analytics shapes over the events table: strict sequential
  * funnels and cohort retention — the aggregation patterns every event
  * warehouse runs daily, expressed as the minimal number of shuffles.
  */
object Analytics {

  /** Strict view → click → purchase funnel: a user advances a step only
    * with an event at-or-after their previous step's timestamp. Each
    * step is one filtered aggregation keyed on user (the previous step's
    * result joins in as a per-user bound) — 3 aggregations, no window
    * over the full event stream. */
  def qFunnel(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d).select("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("v_ts"))
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("c_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    def step(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("step"), col("n_users"))
    step("1_view", v).unionByName(step("2_click_after_view", c))
      .unionByName(step("3_purchase_after_click", p))
      .orderBy("step")
  }

  /** Weekly cohort retention: users grouped by first-seen week; for each
    * (cohort, weeks-since-first) cell, distinct active users. Two
    * aggregations + one join — the cohort table is user-cardinality, the
    * activity table (user, week)-distinct. */
  def qCohorts(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
    val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.distinct().join(cohort, "user_id")
      .withColumn("week_idx",
        expr("CAST(datediff(week, cohort_week) div 7 AS BIGINT)"))
      .groupBy("cohort_week", "week_idx")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_idx")
  }

  /** Length-curriculum buckets: quartile (ntile) of token count within
    * each language, then per-bucket stats — the "sort by length, feed
    * short sequences first" curriculum prep, and the NTILE member of the
    * rank-function family (q58 covers rank/dense_rank/percent_rank/
    * cume_dist). The window partitions by lang — no global sort; at
    * 100 TB per-lang ntile is one keyed shuffle (for a GLOBAL curriculum,
    * use exact-percentile thresholds (ops.Percentiles) instead of a
    * single-partition window). */
  def qNtileCurriculum(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_tokens"), col("doc_id"))
    Tables.documents(spark, d)
      .withColumn("n_tokens", size(graft.text.Text.tokens))
      .withColumn("bucket", ntile(4).over(w))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("bucket_tokens"))
      .orderBy("lang", "bucket")
  }

  /** Per-language token-length standardization report: mean, population
    * std, and |z| > 2 outlier counts. Every double derives from EXACT
    * integer window sums (Σx, Σx², n) through expressions written
    * identically in the oracle — bitwise cross-engine, no rounding, so
    * even the outlier threshold comparisons agree exactly. One shuffle
    * (the lang window), reused by the final aggregation. */
  def qGroupZscore(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
    Tables.documents(spark, d)
      .withColumn("x", size(graft.text.Text.tokens))
      .withColumn("n",  count(lit(1)).over(w))
      .withColumn("s",  sum(col("x")).over(w))
      .withColumn("ss", sum(col("x") * col("x")).over(w))
      .withColumn("mean", col("s").cast("double") / col("n"))
      .withColumn("std",
        sqrt(col("ss").cast("double") / col("n") - col("mean") * col("mean")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        max(col("mean")).as("mean_tokens"),
        max(col("std")).as("std_tokens"),
        sum(when(abs(col("x") - col("mean")) > lit(2) * col("std"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("lang")
  }

  /** Typed-API twin of [[qGroupZscore]]: `Dataset[LangTokens].groupByKey.
    * flatMapGroups` — the KeyValueGroupedDataset grouped-map shape (what
    * `applyInPandas` is in PySpark). Same integer-sum arithmetic, so
    * AnalyticsSpec pins bitwise equality with the window formulation.
    * Scale note: flatMapGroups materializes one group per call — fine for
    * bounded groups (per-lang stats at |langs| cardinality would NOT be;
    * the registered query is the window form for exactly that reason —
    * this twin exists to cover the typed grouped-map API). */
  def groupZscoreTyped(spark: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[LangStats] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("lang"), size(graft.text.Text.tokens).as("n_tokens"))
      .as[LangTokens]
      .groupByKey(_.lang)
      .flatMapGroups { (lang: String, it: Iterator[LangTokens]) =>
        val xs = it.map(_.n_tokens.toLong).toArray
        val n = xs.length
        val s = xs.sum
        val ss = xs.map(x => x * x).sum
        val mean = s.toDouble / n
        val std = math.sqrt(ss.toDouble / n - mean * mean)
        val outliers = xs.count(x => math.abs(x - mean) > 2 * std).toLong
        Iterator(LangStats(lang, n.toLong, mean, std, outliers))
      }
  }

  /** GLOBAL length curriculum — the 100 TB path q93's per-lang window
    * can't take (a global ntile is a single-partition sort): exact global
    * quartile thresholds from the fully-parallel bucket-selection
    * percentile ([[graft.ops.Percentiles.viaBucketSelection]] — histogram
    * rows only, no raw-row sort), broadcast back, then one map-side
    * bucket classification + one aggregation. Threshold interpolation is
    * bit-identical to DuckDB's quantile_cont (the q52 contract), so the
    * int-vs-double boundary comparisons agree exactly. */
  def qGlobalCurriculum(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .withColumn("n_tokens", size(graft.text.Text.tokens))
    val th = graft.ops.Percentiles.viaBucketSelection(
        docs.withColumn("g", lit(1)), "g", "n_tokens",
        Seq(0.25, 0.5, 0.75), bucketWidth = 16.0)
      .groupBy("g")
      .agg(min(when(col("qi") === 1, col("quantile"))).as("q1"),
        min(when(col("qi") === 2, col("quantile"))).as("q2"),
        min(when(col("qi") === 3, col("quantile"))).as("q3"))
      .drop("g")
    docs.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("n_tokens") <= col("q1"), 1)
          .when(col("n_tokens") <= col("q2"), 2)
          .when(col("n_tokens") <= col("q3"), 3)
          .otherwise(4))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("bucket_tokens"))
      .orderBy("bucket")
  }

  /** Winsorized robust statistics per group — the outlier-clipping step of
    * feature normalization, with EVERY output value exact (no rounding
    * anywhere):
    *
    *   - thresholds are NEAREST-RANK percentiles (the value at rank
    *     ceil(p·n), an actual order statistic) — a 2-decimal data value,
    *     not an interpolated real, so it is bit-identical on any engine;
    *     the rank itself is pure integer math ((p·n + 99) div 100 — never
    *     ceil(0.05 * n), whose binary-inexact 0.05 rounds up at exact
    *     multiples);
    *   - the winsorized mean is assembled from exact pieces in fixed
    *     order: decimal-exact sum of in-range values + n_below·lo +
    *     n_above·hi, divided by n.
    *
    * Plan: one window exchange for the ranks (row_number ties are
    * harmless — the VALUE at rank r is invariant under tie order), a
    * broadcast of the per-group thresholds, one aggregation. The window's
    * per-group single-task sort is the q52 parallelism note; the
    * bucket-selection formulation swaps in unchanged when one group is
    * huge. */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
                      pLo: Int = 5, pHi: Int = 95): DataFrame = {
    val li = df.select(col(groupCol).as("g"), col(valueCol).as("v"))
    val rLo = s"($pLo * n + 99) div 100"
    val rHi = s"($pHi * n + 99) div 100"
    val ranked = li.withColumn("rn", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("v"))))
    val th = ranked
      .join(broadcast(li.groupBy("g").agg(count(lit(1)).as("n"))), "g")
      .filter(col("rn") === expr(rLo) || col("rn") === expr(rHi))
      .groupBy("g", "n")
      .agg(min(when(col("rn") === expr(rLo), col("v"))).as("lo"),
           max(when(col("rn") === expr(rHi), col("v"))).as("hi"))
    winsorizedAssemble(li, th, groupCol)
  }

  /** The clip-and-average tail shared by both threshold formulations:
    * `th` is (g, n, lo, hi) — broadcast, one aggregation, exact pieces. */
  private def winsorizedAssemble(li: DataFrame, th: DataFrame,
                                 groupCol: String): DataFrame =
    li.join(broadcast(th), "g")
      .groupBy(col("g").as(groupCol), col("n"), col("lo"), col("hi"))
      .agg(
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_above"),
        graft.Num.dsum(when(col("v") >= col("lo") && col("v") <= col("hi"),
          col("v"))).as("s_inside"))
      .withColumn("win_mean",
        (col("s_inside") + (col("n_below") * col("lo") + col("n_above") * col("hi")))
          / col("n"))
      .select(groupCol, "n", "lo", "hi", "n_below", "n_above", "win_mean")

  /** q107's SCALE-PATH twin (the q120-for-q52 move): identical winsorized
    * stats with the nearest-rank thresholds from
    * [[graft.ops.Percentiles.nearestRankViaBuckets]] — the two-level
    * histogram whose per-task work is bounded by the value domain — in
    * place of the window's per-group single-task sort. Thresholds are the
    * same order statistics at the same integer ranks, so the output (and
    * the oracle) is bit-identical; at sf10 the sort form runs 46 s solo
    * against 3 group-bound tasks while this one keeps all cores busy. */
  def winsorizedStatsViaBuckets(df: DataFrame, groupCol: String,
                                valueCol: String, pLo: Int = 5, pHi: Int = 95,
                                bucketWidth: Double = 100.0): DataFrame = {
    val li = df.select(col(groupCol).as("g"), col(valueCol).as("v"))
    val th = graft.ops.Percentiles
      .nearestRankViaBuckets(df, groupCol, valueCol, Seq(pLo, pHi), bucketWidth)
      .groupBy(col(groupCol).as("g"), col("n"))
      .agg(min(when(col("pct") === pLo, col("value"))).as("lo"),
           max(when(col("pct") === pHi, col("value"))).as("hi"))
    winsorizedAssemble(li, th, groupCol)
  }

  /** STATS-DISPATCHED winsorized stats — the registered q107 path (the
    * q52 `Percentiles.grouped` move): one probe of the hottest group's
    * row count picks the threshold regime. Both regimes produce the same
    * order statistics at the same integer ranks, so the output is
    * bit-identical (AnalyticsSpec pins it); the choice is purely physical
    * — at/below [[graft.ops.Percentiles.SortPathMaxGroupRows]] rows the
    * window sort's tasks are small and its fewer stages win, above it a
    * hot group would serialize into one task and the domain-bounded
    * bucket form takes over. */
  def winsorizedStatsDispatched(df: DataFrame, groupCol: String,
                                valueCol: String, pLo: Int = 5, pHi: Int = 95,
                                bucketWidth: Double = 100.0,
                                maxGroupRowsHint: Option[Long] = None): DataFrame = {
    val hottest = maxGroupRowsHint.getOrElse(
      graft.ops.Percentiles.probeMaxGroupRows(df, groupCol))
    if (hottest > graft.ops.Percentiles.SortPathMaxGroupRows)
      winsorizedStatsViaBuckets(df, groupCol, valueCol, pLo, pHi, bucketWidth)
    else winsorizedStats(df, groupCol, valueCol, pLo, pHi)
  }

  def qWinsorized(spark: SparkSession, d: String): DataFrame =
    winsorizedStatsDispatched(Tables.lineitem(spark, d),
        "l_returnflag", "l_extendedprice")
      .orderBy("l_returnflag")

  def qWinsorizedBuckets(spark: SparkSession, d: String): DataFrame =
    winsorizedStatsViaBuckets(Tables.lineitem(spark, d),
        "l_returnflag", "l_extendedprice")
      .orderBy("l_returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_funnel"  -> (qFunnel _),
    "q79_cohorts" -> (qCohorts _),
    "q93_ntile_curriculum" -> (qNtileCurriculum _),
    "q95_group_zscore" -> (qGroupZscore _),
    "q98_global_curriculum" -> (qGlobalCurriculum _),
    "q107_winsorized" -> (qWinsorized _),
    "q121_winsorized_buckets" -> (qWinsorizedBuckets _))

  /** q107 and q121 compute the identical result by different physical
    * plans; both pin against the same ground-truth SQL. */
  private val winsorizedOracle = """
      WITH li AS (SELECT l_returnflag AS g, l_extendedprice AS v FROM lineitem),
      r AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn FROM li),
      n AS (SELECT g, COUNT(*) AS n FROM li GROUP BY g),
      th AS (
        SELECT r.g, n.n,
               MIN(CASE WHEN rn = (5 * n + 99) // 100 THEN v END) AS lo,
               MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN v END) AS hi
        FROM r JOIN n USING (g)
        WHERE rn = (5 * n + 99) // 100 OR rn = (95 * n + 99) // 100
        GROUP BY r.g, n.n),
      a AS (
        SELECT li.g, th.n, th.lo, th.hi,
               CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
               CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
               CAST(CAST(SUM(CASE WHEN v >= lo AND v <= hi
                    THEN CAST(v AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) AS s_inside
        FROM li JOIN th USING (g) GROUP BY 1, 2, 3, 4)
      SELECT g AS l_returnflag, n, lo, hi, n_below, n_above,
             (s_inside + (n_below * lo + n_above * hi)) / n AS win_mean
      FROM a ORDER BY l_returnflag"""

  val oracles: Map[String, String] = Map(
    "q107_winsorized" -> winsorizedOracle,
    "q121_winsorized_buckets" -> winsorizedOracle,
    "q98_global_curriculum" -> s"""
      WITH t AS (
        SELECT len(${graft.text.Text.duckTokens}) AS n_tokens FROM documents),
      q AS (
        SELECT quantile_cont(n_tokens, 0.25) AS q1,
               quantile_cont(n_tokens, 0.5)  AS q2,
               quantile_cont(n_tokens, 0.75) AS q3
        FROM t)
      SELECT CASE WHEN n_tokens <= q1 THEN 1
                  WHEN n_tokens <= q2 THEN 2
                  WHEN n_tokens <= q3 THEN 3 ELSE 4 END AS bucket,
             COUNT(*) AS n_docs,
             CAST(MIN(n_tokens) AS INT) AS min_tokens,
             CAST(MAX(n_tokens) AS INT) AS max_tokens,
             CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
      FROM t CROSS JOIN q
      GROUP BY 1 ORDER BY bucket""",
    "q93_ntile_curriculum" -> s"""
      WITH t AS (
        SELECT lang, doc_id, len(${graft.text.Text.duckTokens}) AS n_tokens
        FROM documents),
      b AS (
        SELECT lang, n_tokens,
               NTILE(4) OVER (PARTITION BY lang
                              ORDER BY n_tokens, doc_id) AS bucket
        FROM t)
      SELECT lang, CAST(bucket AS INT) AS bucket, COUNT(*) AS n_docs,
             CAST(MIN(n_tokens) AS INT) AS min_tokens,
             CAST(MAX(n_tokens) AS INT) AS max_tokens,
             CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
      FROM b GROUP BY 1, 2 ORDER BY lang, bucket""",
    "q95_group_zscore" -> s"""
      WITH t AS (
        SELECT lang, len(${graft.text.Text.duckTokens}) AS x FROM documents),
      w AS (
        SELECT lang, x,
               COUNT(*)  OVER (PARTITION BY lang) AS n,
               CAST(SUM(x) OVER (PARTITION BY lang) AS BIGINT) AS s,
               CAST(SUM(x * x) OVER (PARTITION BY lang) AS BIGINT) AS ss
        FROM t),
      z AS (
        SELECT lang, x, n,
               CAST(s AS DOUBLE) / n AS mean,
               SQRT(CAST(ss AS DOUBLE) / n
                    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS std
        FROM w)
      SELECT lang, COUNT(*) AS n_docs,
             MAX(mean) AS mean_tokens, MAX(std) AS std_tokens,
             CAST(SUM(CASE WHEN ABS(x - mean) > 2 * std THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers
      FROM z GROUP BY lang ORDER BY lang""",
    "q78_funnel" -> """
      WITH v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.v_ts
        GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        GROUP BY e.user_id)
      SELECT * FROM (
        SELECT '1_view' AS step, COUNT(*) AS n_users FROM v
        UNION ALL
        SELECT '2_click_after_view', COUNT(*) FROM c
        UNION ALL
        SELECT '3_purchase_after_click', COUNT(*) FROM p)
      ORDER BY step""",
    "q79_cohorts" -> """
      WITH w AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events),
      cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id)
      SELECT cohort_week,
             CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_idx,
             COUNT(DISTINCT w.user_id) AS n_users
      FROM w JOIN cohort ON w.user_id = cohort.user_id
      GROUP BY 1, 2 ORDER BY cohort_week, week_idx""")
}
