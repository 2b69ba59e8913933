package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset splitting for training pipelines: deterministic, content-keyed
  * train/test splits and stratified sampling.
  *
  * Unlike `randomSplit` (seed + partition-layout dependent), these key the
  * assignment on a HASH OF ROW CONTENT: the same row lands in the same
  * split on any cluster, any partitioning, any Spark version — which is
  * what makes a 100 TB train/eval split reproducible and makes
  * leakage-free re-splits possible when data is appended. */
object Splits {

  /** Content-keyed split: bucket = xxhash64(key) mod 100 vs percent
    * thresholds. Returns (train, test). */
  def trainTest(df: DataFrame, keyCol: String, testPercent: Int,
                salt: Long = 42L): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(lit(salt), col(keyCol)), lit(100))
    (df.filter(bucket >= testPercent), df.filter(bucket < testPercent))
  }

  /** Stratified sample: per-stratum percentage, content-keyed (same
    * deterministic contract as [[trainTest]]). `fractions` maps stratum
    * value → keep-percent [0,100]. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Int], salt: Long = 42L): DataFrame = {
    val bucket = pmod(xxhash64(lit(salt), col(keyCol)), lit(100))
    val keep = fractions.foldLeft(lit(0)) { case (acc, (k, pct)) =>
      when(col(strataCol) === k, lit(pct)).otherwise(acc)
    }
    df.filter(bucket < keep)
  }
}
