package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed weighted sampling without replacement (Efraimidis–Spirakis
  * 2006): give each row the key u^(1/w) for u uniform in (0,1), take the
  * k largest keys. The top-k plans as TakeOrderedAndProject — per-partition
  * k-row heaps, no shuffle of the corpus — so the operator is one pass at
  * any scale, and u derives from xxhash64(id, seed), so the sample is
  * deterministic and reproducible (the same contract as ops.Splits:
  * re-running the pipeline or appending unrelated rows never changes
  * whether a surviving row was picked... though with sampling the top-k
  * cutoff can shift — reproducibility here means same data + same seed =
  * same sample).
  */
object Sampling {

  /** Uniform (0,1) from a deterministic hash: low 52 bits of
    * xxhash64(id, seed), offset by 0.5 so u is never 0 or 1. */
  private def u01(idCol: Column, seed: Long): Column =
    (pmod(xxhash64(idCol, lit(seed)), lit(1L << 52)).cast("double") + 0.5) /
      lit((1L << 52).toDouble)

  /** Sample k rows with probability proportional to `weight` (rows with
    * weight <= 0 are never selected), deterministically from `seed`.
    * Adds the sampling key as `__es_key` ordering; output keeps the input
    * columns. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
                     seed: Long = 42L): DataFrame = {
    val keyed = df.withColumn("__w", weight.cast("double"))
      .filter(col("__w") > 0.0)
      .withColumn("__es_key", pow(u01(col(idCol), seed), lit(1.0) / col("__w")))
    keyed.orderBy(col("__es_key").desc, col(idCol))
      .limit(k)
      .drop("__w", "__es_key")
  }

  /** Length-weighted document sample: 25 docs drawn proportional to token
    * count — the "sample by token budget, not by document count" shape of
    * training-mixture construction. Hash-derived membership is
    * engine-specific; SketchesSpec pins determinism, size, weight-zero
    * exclusion, and planted-weight dominance over this raw shape. */
  def weightedDocSample(spark: SparkSession, d: String): DataFrame =
    weightedSample(
      Tables.documents(spark, d)
        .select(col("doc_id"), col("lang"), col("source"),
          size(graft.text.Text.tokens).as("n_tokens")),
      "doc_id", col("n_tokens"), k = 25)
      .orderBy("doc_id")

  /** q70, oracle-checkable form (the q65-for-q55 exactness-contract
    * pattern): WHICH docs are drawn is hash-dependent, but the sample's
    * accounting is fully deterministic — exactly min(k, pool) distinct
    * rows, every one from the positive-weight pool. `n_outside_pool` is
    * computed from the ACTUAL sample via an anti-join-style probe, so a
    * sampling bug (duplicates, zero-weight leak, wrong k) flips a value
    * and fails the hash compare. */
  def qWeightedSample(spark: SparkSession, d: String): DataFrame = {
    val pool = Tables.documents(spark, d)
      .select(col("doc_id"), size(graft.text.Text.tokens).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    // Full-outer + one aggregate: the sample-side counts AND the pool
    // total come from a single pass of each subtree. The previous shape
    // (left join + a separate pool.agg crossJoin) referenced `pool`
    // twice, so the corpus tokenize behind n_tokens ran twice per query.
    //
    // Precondition note (shared with qMinhashVerify/annContract): the
    // full-outer accounting needs both sides distinct on doc_id. The
    // pool side is documents' primary key; the sample side is NOT
    // assumed distinct — that's the point — which is why the counts use
    // countDistinct, immune to join fan-out from a duplicated sample row
    // (pool-side uniqueness keeps the fan-out one-to-one).
    weightedDocSample(spark, d).withColumn("__s", lit(1))
      .join(pool.select(col("doc_id"), lit(1).as("__in_pool")),
        Seq("doc_id"), "full_outer")
      .agg(count(col("__s")).as("n_sampled"),
        countDistinct(when(col("__s").isNotNull, col("doc_id")))
          .as("n_distinct"),
        sum(when(col("__s").isNotNull && col("__in_pool").isNull, 1L)
          .otherwise(0L)).as("n_outside_pool"),
        countDistinct(when(col("__in_pool").isNotNull, col("doc_id")))
          .as("n_pool"))
      .select("n_sampled", "n_distinct", "n_outside_pool", "n_pool")
  }

  /** Training-mixture construction under a global token budget with
    * temperature-weighted per-source shares (the UniMax / "sample source s
    * proportional to tokens_s^alpha" discipline, alpha = 0.5):
    *
    *   1. per-source token totals (one aggregation);
    *   2. integer weights w_s = floor(sqrt(tokens_s)) — sqrt is correctly
    *      rounded IEEE, so floor(sqrt(exact int)) is bit-identical on any
    *      engine (the q66 fixed-point rule: never round, always floor);
    *   3. per-source budget = totalBudget * w_s div sum(w) — integer
    *      division, exact everywhere;
    *   4. greedy selection inside each source in deterministic
    *      content-hash order (md5(text), doc_id tiebreak): a doc is kept
    *      while its EXCLUSIVE prefix of tokens is under the budget, so
    *      selection is reproducible and append-stable within a source.
    *
    * Scale: the weight table has |sources| rows (a global window over it is
    * O(sources), not O(corpus)); the budget join broadcasts; the per-source
    * window is the only corpus-wide shuffle. One pass, one shuffle.
    */
  def mixtureSample(docs: DataFrame, tokenCount: Column,
                    totalBudget: Long): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = docs.withColumn("n_tokens", tokenCount)
      .groupBy("source").agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("w", floor(sqrt(col("src_tokens"))).cast("long"))
    val budgets = totals
      .withColumn("w_sum", sum(col("w")).over(Window.partitionBy()))
      .withColumn("budget", expr(s"($totalBudget * w) div w_sum"))
      .select("source", "budget")
    docs.withColumn("n_tokens", tokenCount)
      .withColumn("__h", md5(col("text")))
      .join(broadcast(budgets), "source")
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") - col("n_tokens") < col("budget"))
  }

  /** Mixture-sample accounting: per-source budget, docs kept, tokens kept.
    * Fully integer → exact DuckDB oracle. */
  def qMixtureSample(spark: SparkSession, d: String): DataFrame =
    mixtureSample(Tables.documents(spark, d),
        size(graft.text.Text.tokens), totalBudget = 20000L)
      .groupBy("source")
      .agg(max(col("budget")).as("budget"),
        count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).as("tokens_kept"))
      .orderBy("source")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_weighted_sample" -> (qWeightedSample _),
    "q85_mixture_sample"  -> (qMixtureSample _))

  // q70's Efraimidis–Spirakis keys are xxhash64-derived (engine-specific),
  // so the oracle pins the sample's deterministic accounting instead of
  // its membership. q85 is integer-exact end-to-end (floor(sqrt), integer
  // div, md5 order) so it gets a full oracle.
  val oracles: Map[String, String] = Map(
    "q70_weighted_sample" -> s"""
      WITH pool AS (
        SELECT doc_id FROM (
          SELECT doc_id, len(${graft.text.Text.duckTokens}) AS n_tokens
          FROM documents)
        WHERE n_tokens > 0)
      SELECT LEAST(25, COUNT(*)) AS n_sampled,
             LEAST(25, COUNT(*)) AS n_distinct,
             CAST(0 AS BIGINT) AS n_outside_pool,
             COUNT(*) AS n_pool
      FROM pool""",
    "q85_mixture_sample" -> s"""
      WITH t AS (
        SELECT source, doc_id, md5(text) AS h,
               len(${graft.text.Text.duckTokens}) AS n_tokens
        FROM documents),
      tot AS (
        SELECT source, CAST(FLOOR(SQRT(CAST(SUM(n_tokens) AS DOUBLE))) AS BIGINT) AS w
        FROM t GROUP BY source),
      b AS (
        SELECT source, CAST((20000 * w) // (SELECT SUM(w) FROM tot) AS BIGINT) AS budget
        FROM tot),
      c AS (
        SELECT t.source, budget, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY t.source ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t JOIN b ON t.source = b.source)
      SELECT source, CAST(MAX(budget) AS BIGINT) AS budget,
             COUNT(*) AS n_docs_kept,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
      FROM c WHERE cum - n_tokens < budget
      GROUP BY source ORDER BY source""")
}
