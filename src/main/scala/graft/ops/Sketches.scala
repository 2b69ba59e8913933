package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Streaming-sketch operators: bounded-memory summaries whose guarantees
  * let an exact (oracle-checkable) answer be recovered with a cheap second
  * pass — the 100 TB discipline of "sketch to shrink, then verify exact".
  */
object Sketches {

  /** Misra–Gries heavy-hitters summary with k counters. The classic
    * guarantee: any item with true frequency > N/k is present in the final
    * summary (counts are under-estimates by at most N/k). `merge` is the
    * Agarwal et al. (2013, "Mergeable Summaries") combiner — sum counts,
    * then subtract the (k+1)-th largest and drop non-positives — which
    * preserves the guarantee under ANY merge tree, so the aggregate is
    * partition-invariant in the property that matters (candidate coverage),
    * even though the exact surviving counts may vary with merge order.
    * Buffer is O(k) per group regardless of data size — the reason this
    * exists instead of a full groupBy at the discovery stage. */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
    def zero: Map[String, Long] = Map.empty

    def reduce(m: Map[String, Long], t: String): Map[String, Long] =
      if (m.contains(t)) m.updated(t, m(t) + 1L)
      else if (m.size < k) m.updated(t, 1L)
      else m.flatMap { case (s, c) => if (c > 1L) Some(s -> (c - 1L)) else None }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val s = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
      if (s.size <= k) s
      else {
        val cut = s.values.toArray.sortWith(_ > _).apply(k) // (k+1)-th largest
        s.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
      }
    }

    def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  }

  /** Exact heavy hitters via the two-pass sketch pattern: a Misra–Gries
    * pass (k = 1/phi counters, O(k) state, map-side partials) narrows the
    * candidate set; a second exact count over ONLY the candidates recovers
    * exact frequencies; the final filter applies the threshold in integer
    * arithmetic. The MG guarantee (every item above the threshold survives
    * pass 1) makes the result EXACTLY equal to a full groupBy+HAVING — so
    * the sketch path is oracle-checked, not rows-only — while the full
    * vocabulary is never shuffled. */
  def heavyHitters(terms: DataFrame, termCol: String, phiDen: Int): DataFrame = {
    val mg = udaf(new MisraGries(phiDen))
    val cand = terms.agg(mg(col(termCol)).as("cands"),
                         count(lit(1)).as("total"))
    terms.crossJoin(broadcast(cand))
      .filter(array_contains(col("cands"), col(termCol)))
      .groupBy(col(termCol), col("total"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * phiDen > col("total"))
      .select(col(termCol), col("n"))
      .orderBy(col("n").desc, col(termCol))
  }

  /** Tokens occurring in more than 1% of the corpus token stream. */
  def qHeavyHitters(spark: SparkSession, d: String): DataFrame =
    heavyHitters(
      Tables.documents(spark, d).select(explode(graft.text.Text.tokens).as("term")),
      "term", phiDen = 100)

  /** Approximate vs exact per-group quantiles: `approx_percentile`
    * (KLL-style sketch, bounded memory, mergeable) next to the exact
    * value — the operator you run at 100 TB when q52's exact formulations
    * are still too heavy, with the error budget made visible. Raw shape
    * (flag, q, approx_value, exact_value); approx values are
    * engine-specific — SketchesSpec bounds their rank error. */
  def approxVsExact(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), 10000)")
          .as("approx"),
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("exact"))
      .select(col("l_returnflag"),
        posexplode(arrays_zip(typedlit(Seq(0.25, 0.5, 0.75)).as("q"),
          col("approx"), col("exact"))))
      .select(col("l_returnflag"), col("col.q").as("q"),
        col("col.approx").as("approx_value"),
        col("col.exact").as("exact_value"))

  /** q69, oracle-checkable form (the q65-for-q55 exactness-contract
    * pattern): the sketch value itself is engine-specific, but its RANK
    * GUARANTEE is not — KLL promises |R(v)/n − q| ≤ ε (ε = 1/accuracy).
    * The query computes the approx value's occupied rank interval
    * [rank_lt+1, rank_le] against the group and emits whether it
    * intersects the allowed band as `approx_rank_ok`, alongside the exact
    * interpolated percentile. The DuckDB oracle pins the exact values and
    * `TRUE` — a degraded sketch flips the boolean and fails the hash
    * compare, so the sketch path is genuinely oracle-audited. The rank
    * audit is one broadcast join + one aggregation (9 rows vs lineitem),
    * the "sketch to shrink, verify exact" second pass this module is
    * about. */
  def qApproxQuantiles(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val eps = 1.0 / 10000
    approxVsExact(spark, d)
      .join(li, "l_returnflag")
      .groupBy(col("l_returnflag"), col("q"), col("approx_value"),
        col("exact_value"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("approx_value"), 1L)
          .otherwise(0L)).as("rank_lt"),
        sum(when(col("l_extendedprice") <= col("approx_value"), 1L)
          .otherwise(0L)).as("rank_le"))
      .select(col("l_returnflag"), col("q"),
        round(col("exact_value"), 6).as("exact_value"),
        (col("rank_le") >= (col("q") - lit(eps)) * col("n") - 1 &&
         col("rank_lt") + 1 <= (col("q") + lit(eps)) * col("n") + 1)
          .as("approx_rank_ok"))
      .orderBy("l_returnflag", "q")
  }

  /** Exported mergeable HLL sketches (Spark 4's Apache DataSketches
    * surface): per-day distinct-user sketches materialized as BINARY
    * columns, then unioned into a running total — the incremental
    * warehouse pattern where yesterday's sketches are STORED (parquet
    * binary) and today's job merges without rescanning history. Distinct
    * counting is the one aggregate that can't be incrementally maintained
    * exactly from partial counts (q76's sums/counts can); sketches trade
    * ≤ ~2% error for mergeability.
    *
    * Determinism: an HLL sketch of a value set is deterministic and its
    * union is associative/commutative, so merged-estimate ==
    * direct-estimate EXACTLY (SketchesSpec pins the bitwise equality and
    * bounds the error vs exact countDistinct).
    *
    * Oracle-checkable since r5 (the q69 exactness-contract pattern): the
    * estimate value is engine-specific, but lgK=12 promises rsd ≈ 1.6% —
    * the query emits the EXACT totals plus a boolean pinning the merged
    * estimate within 10% of exact; the oracle pins the exacts and `TRUE`,
    * so a degraded merge path fails the hash compare. */
  def qHllDaily(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy("day")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sketch"),
        count_distinct(col("user_id")).as("exact_daily"))
    daily
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sketch, true))")
          .as("est_total_users"),
        sum(col("exact_daily")).as("sum_daily_exact"))
      .crossJoin(broadcast(
        ev.agg(count_distinct(col("user_id")).as("exact_total_users"))))
      .select(col("exact_total_users"), col("sum_daily_exact"),
        (abs(col("est_total_users") - col("exact_total_users")).cast("double")
          <= lit(0.10) * col("exact_total_users")).as("hll_est_within_bound"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_heavy_hitters"   -> (qHeavyHitters _),
    "q69_approx_quantiles" -> (qApproxQuantiles _),
    "q113_hll_daily"      -> (qHllDaily _))

  val oracles: Map[String, String] = Map(
    "q71_heavy_hitters" -> s"""
      WITH tok AS (
        SELECT unnest(${graft.text.Text.duckTokens}) AS term FROM documents),
      tot AS (SELECT COUNT(*) AS total FROM tok)
      SELECT term, COUNT(*) AS n
      FROM tok CROSS JOIN tot
      GROUP BY term, total
      HAVING COUNT(*) * 100 > total
      ORDER BY n DESC, term""",
    // q69: the approx VALUE is engine-specific, but the exact percentile
    // and the rank-guarantee boolean are not — the oracle pins both (a
    // degraded sketch flips approx_rank_ok → hash mismatch).
    "q69_approx_quantiles" -> """
      WITH e AS (
        SELECT l_returnflag, CAST(0.25 AS DOUBLE) AS q,
               ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS exact_value
        FROM lineitem GROUP BY 1
        UNION ALL
        SELECT l_returnflag, CAST(0.5 AS DOUBLE),
               ROUND(quantile_cont(l_extendedprice, 0.5), 6)
        FROM lineitem GROUP BY 1
        UNION ALL
        SELECT l_returnflag, CAST(0.75 AS DOUBLE),
               ROUND(quantile_cont(l_extendedprice, 0.75), 6)
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, q, exact_value, TRUE AS approx_rank_ok
      FROM e ORDER BY l_returnflag, q""",
    "q113_hll_daily" -> """
      WITH daily AS (
        SELECT DATE_TRUNC('day', ts) AS day,
               COUNT(DISTINCT user_id) AS exact_daily
        FROM events GROUP BY 1)
      SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_total_users,
             CAST(SUM(exact_daily) AS BIGINT) AS sum_daily_exact,
             TRUE AS hll_est_within_bound
      FROM daily""")
}
