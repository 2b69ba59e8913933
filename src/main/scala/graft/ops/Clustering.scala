package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimension data skipping:
  * sort/bucket the table by the bit-interleaved key of two columns and
  * BOTH columns become range-localized per bucket/file — so a parquet
  * min/max footer (or Iceberg/Delta file stats) can skip files for
  * predicates on EITHER column. Sorting by one column alone localizes
  * only that column; the other's per-file range stays ~the global range.
  *
  * The z-value itself is the codegen'd [[graft.functions.ZOrder2]]
  * kernel; the oracle rebuilds the identical bit-dilation with five CTE
  * steps of 64-bit mask/shift arithmetic — integer ops, bitwise-equal on
  * any engine.
  */
object Clustering {

  /** Per-z-bucket locality report over lineitem (l_partkey, l_suppkey):
    * row count + min/max of both dimensions. The spec asserts the
    * skipping property (bucket ranges ≪ global range in both dims). */
  def qZOrder(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"),
        graft.functions.exprs.zorder2(col("l_partkey"), col("l_suppkey")).as("z"))
      // 2^16-wide buckets fix z-bits >= 16, i.e. bits >= 8 of BOTH dims:
      // per-bucket span <= 256 in each dimension regardless of data size
      .withColumn("z_bucket", expr("z div 65536"))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .orderBy("z_bucket")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_zorder" -> (qZOrder _))

  val oracles: Map[String, String] = Map(
    // the five magic-bits dilation steps, one CTE per step, both dims
    "q77_zorder" -> """
      WITH s0 AS (
        SELECT l_partkey, l_suppkey,
               l_partkey & 2147483647 AS a, l_suppkey & 2147483647 AS b
        FROM lineitem),
      s1 AS (SELECT l_partkey, l_suppkey,
               (a | (a << 16)) & 281470681808895 AS a,
               (b | (b << 16)) & 281470681808895 AS b FROM s0),
      s2 AS (SELECT l_partkey, l_suppkey,
               (a | (a << 8)) & 71777214294589695 AS a,
               (b | (b << 8)) & 71777214294589695 AS b FROM s1),
      s3 AS (SELECT l_partkey, l_suppkey,
               (a | (a << 4)) & 1085102592571150095 AS a,
               (b | (b << 4)) & 1085102592571150095 AS b FROM s2),
      s4 AS (SELECT l_partkey, l_suppkey,
               (a | (a << 2)) & 3689348814741910323 AS a,
               (b | (b << 2)) & 3689348814741910323 AS b FROM s3),
      s5 AS (SELECT l_partkey, l_suppkey,
               (a | (a << 1)) & 6148914691236517205 AS a,
               (b | (b << 1)) & 6148914691236517205 AS b FROM s4),
      z AS (SELECT l_partkey, l_suppkey, (a | (b << 1)) // 65536 AS z_bucket
            FROM s5)
      SELECT z_bucket, COUNT(*) AS n,
             MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
             MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
      FROM z GROUP BY z_bucket ORDER BY z_bucket""")
}
