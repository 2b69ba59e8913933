package graft.pipeline

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation — the engine's purpose in one
  * composable pipeline of pure `DataFrame → DataFrame` stages (the
  * architecture the reference's ETL example models, etl_census_dataframe
  * .py:21-39, applied to the real workload):
  *
  *   score → filter → dedup(canonical) → [split] → stats
  *
  * Each stage is independently reusable and independently tested; the
  * composition is one Catalyst plan (scan → project → filter → two
  * aggregations), so the whole funnel is a single pass over the corpus
  * plus one fingerprint shuffle — no materialization between stages.
  */
object Curation {

  /** Stage 1: per-doc quality features (expression-only). */
  def scored(docs: DataFrame): DataFrame =
    docs.withColumn("toks", Text.tokens)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", expr(Text.scoreSql("toks", Text.stopwords.head._2)))
      .withColumn("stopword_ratio", col("n_stop").cast("double") / col("n_tokens"))

  /** Stage 2: keep documents passing the quality gates. */
  def qualityFiltered(scoredDocs: DataFrame,
                      minTokens: Int = 30,
                      minStopRatio: Double = 0.01): DataFrame =
    scoredDocs.filter(col("n_tokens") >= minTokens &&
                      col("stopword_ratio") >= minStopRatio)

  /** Stage 3: canonical exact dedup — one keeper (min doc_id) per content
    * fingerprint; the shuffle carries the 128-bit fingerprint, not text. */
  def dedupCanonical(docs: DataFrame): DataFrame = {
    val keepers = docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(keepers, "doc_id")
  }

  /** Stage 4 (optional, engine-side only): content-keyed split. */
  def withSplit(docs: DataFrame, testPercent: Int = 20): DataFrame =
    docs.withColumn("split",
      when(pmod(xxhash64(lit(42L), col("doc_id")), lit(100)) < testPercent,
        "test").otherwise("train"))

  /** Full funnel → per-lang curation report. */
  def curate(docs: DataFrame): DataFrame =
    dedupCanonical(qualityFiltered(scored(docs)))
      .groupBy("lang")
      // corpus stopword rate as a ratio of integer sums — exact on both
      // engines (a decimal-cast of the per-doc ratio would round-mode-
      // diverge at structural boundaries)
      .agg(count(lit(1)).as("n_kept"),
           sum(col("n_tokens")).as("total_tokens"),
           (sum(col("n_stop")).cast("double") / sum(col("n_tokens")))
             .as("corpus_stop_ratio"))
      .orderBy("lang")

  def qCuration(spark: SparkSession, d: String): DataFrame =
    curate(Tables.documents(spark, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_curation" -> (qCuration _))

  val oracles: Map[String, String] = Map(
    "q56_curation" -> s"""
      WITH scored AS (
        SELECT doc_id, text, lang, len(toks) AS n_tokens,
               ${Text.duckScoreSql("toks", Text.stopwords.head._2)} AS n_stop,
               CAST(${Text.duckScoreSql("toks", Text.stopwords.head._2)} AS DOUBLE)
                 / len(toks) AS stopword_ratio
        FROM (SELECT doc_id, text, lang, ${Text.duckTokens} AS toks FROM documents)),
      kept AS (
        SELECT * FROM scored
        WHERE n_tokens >= 30 AND stopword_ratio >= 0.01),
      keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text))
      SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tokens) AS corpus_stop_ratio
      FROM kept JOIN keepers USING (doc_id)
      GROUP BY lang ORDER BY lang""")
}
