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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_seq_packing" -> (qSequencePacking _))

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
      FROM c GROUP BY 1, 2 ORDER BY lang, chunk_id""")
}
