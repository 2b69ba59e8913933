package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * training-mixture construction. Hash-derived keys are engine-specific
    * → rows-only; SamplingSpec pins determinism, size, weight-zero
    * exclusion, and planted-weight dominance. */
  def qWeightedSample(spark: SparkSession, d: String): DataFrame =
    weightedSample(
      Tables.documents(spark, d)
        .select(col("doc_id"), col("lang"), col("source"),
          size(graft.text.Text.tokens).as("n_tokens")),
      "doc_id", col("n_tokens"), k = 25)
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_weighted_sample" -> (qWeightedSample _))

  val oracles: Map[String, String] = Map.empty // hash-derived keys — rows-only
}
