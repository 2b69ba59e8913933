package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All engine entry points take an `sfDir` (e.g. `/root/testdata/sf0.01`)
  * and read the self-describing parquet directly — schema inference cost is
  * zero (parquet embeds its schema; reference: chapter_07/examples/
  * parquet_operations.py:61-63 demonstrates the same property).
  *
  * At 100 TB each of these would be a partitioned parquet dataset (or an
  * Iceberg/Delta table) behind the same `DataFrame` surface; nothing in the
  * engine assumes single-file inputs.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  /** `events.ts` on disk has varied across testdata generations: parquet
    * TIMESTAMP(NANOS) (read as a raw nanosecond LongType under
    * spark.sql.legacy.parquet.nanosAsLong=true, set by
    * [[Sessions]]/Verify/Bench) or a naive micros TIMESTAMP (read as
    * TimestampType with inferTimestampNTZ disabled). Normalize the long
    * flavor to TimestampType (µs) with integer division: a double division
    * would lose precision above 2^53 ns (~1970+104 days), silently
    * corrupting every timestamp. */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
