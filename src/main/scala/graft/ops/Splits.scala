package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Portable content bucket: the first 8 hex digits of md5(key) parsed
    * as an integer, mod `buckets`. Unlike [[trainTest]]'s xxhash64 this
    * is reproducible by ANY engine or language (MD5 is standardized and
    * universal), so split MEMBERSHIP itself — not just its balance
    * contract — is auditable by whatever tool is at hand years later,
    * and is oracle-checkable today (q116). 32 bits of a cryptographic
    * hash is uniform; mod-100 bias is < 2⁻²⁵. */
  def portableBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long") % buckets

  /** Leakage-safe split: assignment is keyed on a CLUSTER identifier
    * rather than the row, so every member of a duplicate cluster lands
    * in the same split — exact or near duplicates can never straddle
    * train/test (the classic eval-contamination bug: the model "memorizes"
    * a training doc and is scored on its twin).
    *
    * Pass `clusterKey = md5(text)` for exact-duplicate safety (zero extra
    * shuffle — the split is a pure projection, which is the 100 TB pitch:
    * leakage-safe splitting at scan speed), or join in a near-dup cluster
    * id first (Dedup.duplicateClusters / MinHash-LSH components) and key
    * on that. Returns the input plus `cluster_key` and `split` columns. */
  def clusterSafeSplit(df: DataFrame, clusterKey: Column,
                       testPercent: Int): DataFrame =
    df.withColumn("cluster_key", clusterKey)
      .withColumn("split",
        when(portableBucket(col("cluster_key"), 100) < testPercent,
          lit("test")).otherwise(lit("train")))

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
