package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: the concat-and-chunk
  * discipline — documents are laid end-to-end in a deterministic order and
  * the token stream is cut into fixed-budget chunks. A document belongs to
  * the chunk holding its FIRST token (documents may straddle a boundary;
  * the tokenizer-side loader handles the split — this operator assigns the
  * chunk ids and accounts the budget).
  *
  * Scale design: the running total is a window sum partitioned by a shard
  * column (`lang` here; source/date-bucket in production) — each shard
  * packs independently and in parallel, so no global single-partition
  * window ever forms. All arithmetic is integer (exact on any engine at
  * any parallelism).
  */
object Packing {

  /** Assign each row a `chunk_id` = which fixed-`budget` token chunk its
    * first token falls in, packing in `orderCol` order within each
    * `partitionCol` shard. Adds `n_tokens` (from `tokenCount`), `cum`
    * (inclusive running tokens), `chunk_id`. */
  def packChunks(docs: DataFrame, tokenCount: Column, budget: Int,
                 partitionCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("n_tokens", tokenCount)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // exclusive-prefix div: non-negative ints, so `div` == floor
      .withColumn("chunk_id", expr(s"(cum - n_tokens) div $budget"))
  }

  /** Chunk-level accounting for the documents table at a 512-token budget:
    * how many docs start in each chunk and how many tokens they carry. */
  def qSequencePacking(spark: SparkSession, d: String): DataFrame =
    packChunks(Tables.documents(spark, d), size(graft.text.Text.tokens),
        budget = 512, partitionCol = "lang", orderCol = "doc_id")
      .groupBy("lang", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("chunk_tokens"))
      .orderBy("lang", "chunk_id")

  /** Balanced shard assignment: within each `partitionCol` group, rows are
    * ranked by size descending and dealt round-robin across `nShards` —
    * the size-sorted round-robin heuristic that keeps per-shard token
    * totals within one max-document of each other (how tokenized training
    * shards are laid out so every data-loader worker gets equal work).
    * Deterministic (size desc, orderCol tiebreak), one window pass per
    * shard group, integer-only → exact oracle. */
  def shardRoundRobin(docs: DataFrame, tokenCount: Column, nShards: Int,
                      partitionCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(col("n_tokens").desc, col(orderCol))
    docs.withColumn("n_tokens", tokenCount)
      .withColumn("shard",
        ((row_number().over(w) - 1) % nShards).cast("int"))
  }

  /** Per-(lang, shard) balance accounting at 8 shards: doc and token
    * totals — the numbers a loader reads to verify shard balance. */
  def qShardRoundRobin(spark: SparkSession, d: String): DataFrame =
    shardRoundRobin(Tables.documents(spark, d),
        size(graft.text.Text.tokens), nShards = 8,
        partitionCol = "lang", orderCol = "doc_id")
      .groupBy("lang", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"))
      .orderBy("lang", "shard")

  /** Sliding-window chunking with overlap (the RAG / long-context training
    * discipline: windows of `window` tokens advancing by `stride`, the last
    * window truncated). Emits one row per chunk with its token offset and
    * length. Chunk count per doc is the closed form
    * `1 + ceil((n - window) / stride)` (1 when n ≤ window) — integer
    * arithmetic, so chunk rows are identical on any engine.
    * Scale: pure per-row explode — no shuffle at all until the caller
    * aggregates; fan-out is n/stride per doc, linear in corpus tokens. */
  def chunkSliding(docs: DataFrame, tokenCount: Column, window: Int,
                   stride: Int): DataFrame =
    docs.withColumn("n_tokens", tokenCount)
      .withColumn("n_chunks",
        when(col("n_tokens") <= window, lit(1)).otherwise(
          expr(s"cast((n_tokens - $window + $stride - 1) div $stride as int) + 1")))
      .withColumn("chunk_off",
        explode(expr(s"transform(sequence(0, n_chunks - 1), i -> i * $stride)")))
      .withColumn("chunk_len",
        least(lit(window), col("n_tokens") - col("chunk_off")))

  /** Chunking accounting at window=64 / stride=48: per-source chunk counts
    * and total chunk tokens (> source tokens — the overlap overhead). */
  def qChunkOverlap(spark: SparkSession, d: String): DataFrame =
    chunkSliding(Tables.documents(spark, d), size(graft.text.Text.tokens),
        window = 64, stride = 48)
      .groupBy("source")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("chunk_tokens"))
      .orderBy("source")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_seq_packing" -> (qSequencePacking _),
    "q88_shard_roundrobin" -> (qShardRoundRobin _),
    "q91_chunk_overlap" -> (qChunkOverlap _))

  // NB: DuckDB's window SUM(BIGINT) yields HUGEINT, which pandas coerces to
  // float64 on the driver — chunk_id must be CAST back to BIGINT or the
  // driver hashes "5.0" against Spark's "5" (the round-3 q67 failure).
  val oracles: Map[String, String] = Map(
    "q67_seq_packing" -> s"""
      WITH t AS (
        SELECT lang, doc_id, len(${graft.text.Text.duckTokens}) AS n_tokens
        FROM documents),
      c AS (
        SELECT lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT lang, CAST((cum - n_tokens) // 512 AS BIGINT) AS chunk_id,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
      FROM c GROUP BY 1, 2 ORDER BY lang, chunk_id""",
    "q88_shard_roundrobin" -> s"""
      WITH t AS (
        SELECT lang, doc_id, len(${graft.text.Text.duckTokens}) AS n_tokens
        FROM documents),
      r AS (
        SELECT lang, n_tokens,
               CAST((ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY n_tokens DESC, doc_id) - 1) % 8 AS INT) AS shard
        FROM t)
      SELECT lang, shard, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
      FROM r GROUP BY 1, 2 ORDER BY lang, shard""",
    "q91_chunk_overlap" -> s"""
      WITH t AS (
        SELECT doc_id, source, len(${graft.text.Text.duckTokens}) AS n
        FROM documents),
      c AS (
        SELECT doc_id, source, n,
               CASE WHEN n <= 64 THEN 1
                    ELSE (n - 64 + 47) // 48 + 1 END AS n_chunks
        FROM t),
      e AS (
        SELECT doc_id, source, n,
               unnest(range(0, n_chunks)) * 48 AS chunk_off
        FROM c)
      SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
             CAST(SUM(LEAST(64, n - chunk_off)) AS BIGINT) AS chunk_tokens
      FROM e GROUP BY source ORDER BY source""")
}
