package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stable numeric helpers.
  *
  * Summing doubles is order-dependent: at sf0.1 a 600k-row SUM accumulates
  * enough ulp error across 32 shuffle partitions that `ROUND(sum, 2)` can
  * disagree with a sequential (DuckDB) sum at a rounding boundary. All the
  * harness doubles carry exactly 2 decimal digits, so summing in
  * DECIMAL(18,2) is exact AND associative — the same value on any engine,
  * any partitioning, any degree of parallelism. We cast back to DOUBLE so
  * result schemas stay engine-neutral.
  *
  * This is also the right call at 100 TB: decimal partial aggregation is
  * still a single pass with map-side combine (HashAggregate partial/final),
  * just with a wider buffer — no extra shuffle.
  */
object Num {
  private val Dec = DecimalType(18, 2)

  /** Exact, associative sum of a 2-decimal double column → double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Deterministic average: exact decimal sum, cast to double, divided by
    * the count. Both engines then perform the identical double division on
    * identical operands — bitwise-equal results, no rounding needed. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL fragment twins (DuckDB + Spark both accept these ANSI forms). */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"${sqlDsum(expr)} / COUNT(*)"
}
