package graft.pipeline

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** The whole dataset-build discipline in ONE Catalyst plan:
    *
    *   quality filter → canonical dedup → balanced shards → sliding
    *   chunks → per-(lang, shard) loader manifest
    *
    * composed entirely from the independently-tested stages ([[scored]]/
    * [[qualityFiltered]]/[[dedupCanonical]], `Packing.shardRoundRobin`,
    * `Packing.chunkSliding`). Plan shape: one corpus scan, the
    * fingerprint shuffle (dedup), one per-lang window shuffle (shards),
    * a shuffle-free chunk explode, and the final keyed aggregation —
    * four stages total at any corpus size, nothing materialized between
    * them. The manifest (docs/chunks/tokens per shard) is exactly what a
    * data-loader fleet reads to pull balanced work. */
  def qDatasetBuild(spark: SparkSession, d: String): DataFrame = {
    val kept = dedupCanonical(qualityFiltered(scored(
        Tables.documents(spark, d))))
      .select("doc_id", "lang", "n_tokens")
    val sharded = graft.ops.Packing.shardRoundRobin(
      kept, col("n_tokens"), nShards = 4,
      partitionCol = "lang", orderCol = "doc_id")
    graft.ops.Packing.chunkSliding(
        sharded.select("doc_id", "lang", "shard", "n_tokens"),
        col("n_tokens"), window = 64, stride = 48)
      .groupBy("lang", "shard")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("chunk_tokens"))
      .orderBy("lang", "shard")
  }

  /** Per-group document cap — the "no host dominates the corpus" rule of
    * web-scale curation: a handful of boilerplate-heavy hosts would
    * otherwise contribute unbounded near-identical text to the training
    * mix. Keeps a deterministic content-keyed draw of at most `cap` docs
    * per group: rank = row_number over (group ORDER BY md5(text), doc_id),
    * so the kept subset is a stable pseudo-random sample — re-running,
    * repartitioning, or reordering the input never changes it.
    *
    * Scale: a row_number <= cap filter plans as WindowGroupLimit (Spark
    * ≥3.5) — each map task keeps at most `cap` rows per group BEFORE the
    * window shuffle (the windowed analog of TakeOrderedAndProject), so
    * the shuffle carries O(groups × cap) per task, not the corpus.
    * CurationSpec pins the operator in the physical plan. */
  def capPerGroup(docs: DataFrame, groupCol: String, cap: Int): DataFrame =
    docs.withColumn("rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(md5(col("text")), col("doc_id"))))
      .filter(col("rk") <= cap)

  def qHostCap(spark: SparkSession, d: String): DataFrame =
    capPerGroup(Tables.documents(spark, d), "source", cap = 10)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy(col("source"), col("rk"))

  /** Explainable quality gate — per-language counts of WHY documents were
    * dropped, not just how many survived. Every production curation run
    * ships this audit (reviewers ask "what did the filter actually
    * remove?"); flags deliberately overlap (a doc can be both short and
    * stopword-poor), and `kept` = no flag fired.
    *
    *   - too_short:    < 30 tokens (the q56 gate);
    *   - low_stopword: stopword ratio < 1% (non-linguistic content);
    *   - dominated:    one token > 15% of the doc (repetition/spam proxy —
    *     the single-token-dominance check; n-gram diversity is q61's).
    *
    * Plan: one corpus scan + one (doc, token) aggregation for the
    * dominance numerator; every flag is integer-ratio arithmetic
    * (exact-int divisions vs literals — bit-deterministic, oracle-exact). */
  def qQualityGate(spark: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(spark, d)
      .withColumn("toks", Text.tokens)
      .withColumn("n", size(col("toks")))
      .withColumn("n_stop", expr(Text.scoreSql("toks", Text.stopwords.head._2)))
    val mx = t.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("mx"))
    t.join(mx, Seq("doc_id"), "left")
      .withColumn("too_short", col("n") < 30)
      .withColumn("low_stopword",
        col("n_stop").cast("double") / col("n") < 0.01)
      .withColumn("dominated",
        coalesce(col("mx"), lit(0L)).cast("double") / col("n") > 0.15)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("too_short"), 1L).otherwise(0L)).as("n_too_short"),
        sum(when(col("low_stopword"), 1L).otherwise(0L)).as("n_low_stopword"),
        sum(when(col("dominated"), 1L).otherwise(0L)).as("n_dominated"),
        sum(when(!col("too_short") && !col("low_stopword") && !col("dominated"),
          1L).otherwise(0L)).as("n_kept"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_curation" -> (qCuration _),
    "q96_dataset_build" -> (qDatasetBuild _),
    "q105_host_cap" -> (qHostCap _),
    "q111_quality_gate" -> (qQualityGate _))

  val oracles: Map[String, String] = Map(
    "q111_quality_gate" -> s"""
      WITH t AS (
        SELECT doc_id, lang, toks, len(toks) AS n,
               ${Text.duckScoreSql("toks", Text.stopwords.head._2)} AS n_stop
        FROM (SELECT doc_id, lang, ${Text.duckTokens} AS toks FROM documents)),
      mx AS (
        SELECT doc_id, MAX(c) AS mx FROM (
          SELECT doc_id, w, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2)
        GROUP BY doc_id),
      f AS (
        SELECT lang,
               n < 30 AS too_short,
               CAST(n_stop AS DOUBLE) / n < 0.01 AS low_stopword,
               CAST(COALESCE(mx, 0) AS DOUBLE) / n > 0.15 AS dominated
        FROM t LEFT JOIN mx USING (doc_id))
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN too_short THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
             CAST(SUM(CASE WHEN low_stopword THEN 1 ELSE 0 END) AS BIGINT) AS n_low_stopword,
             CAST(SUM(CASE WHEN dominated THEN 1 ELSE 0 END) AS BIGINT) AS n_dominated,
             CAST(SUM(CASE WHEN NOT too_short AND NOT low_stopword AND NOT dominated
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM f GROUP BY lang ORDER BY lang""",
    "q105_host_cap" -> """
      SELECT doc_id, source, rk FROM (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY md5(text), doc_id) AS INT) AS rk
        FROM documents)
      WHERE rk <= 10 ORDER BY source, rk""",
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
      GROUP BY lang ORDER BY lang""",
    "q96_dataset_build" -> s"""
      WITH scored AS (
        SELECT doc_id, text, lang, len(toks) AS n_tokens,
               CAST(${Text.duckScoreSql("toks", Text.stopwords.head._2)} AS DOUBLE)
                 / len(toks) AS stopword_ratio
        FROM (SELECT doc_id, text, lang, ${Text.duckTokens} AS toks FROM documents)),
      kept AS (
        SELECT * FROM scored
        WHERE n_tokens >= 30 AND stopword_ratio >= 0.01),
      keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
      dedup AS (
        SELECT kept.lang, kept.doc_id, kept.n_tokens
        FROM kept JOIN keepers USING (doc_id)),
      sharded AS (
        SELECT lang, doc_id, n_tokens,
               CAST((ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY n_tokens DESC, doc_id) - 1) % 4 AS INT) AS shard
        FROM dedup),
      c AS (
        SELECT lang, shard, doc_id, n_tokens,
               CASE WHEN n_tokens <= 64 THEN 1
                    ELSE (n_tokens - 64 + 47) // 48 + 1 END AS n_chunks
        FROM sharded),
      e AS (
        SELECT lang, shard, doc_id, n_tokens,
               unnest(range(0, n_chunks)) * 48 AS chunk_off
        FROM c)
      SELECT lang, shard, COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(*) AS n_chunks,
             CAST(SUM(LEAST(64, n_tokens - chunk_off)) AS BIGINT) AS chunk_tokens
      FROM e GROUP BY 1, 2 ORDER BY lang, shard""")
}
