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

  /** SQL fragment twins (DuckDB + Spark both accept these ANSI forms).
    *
    * The decimal→double hop goes THROUGH a string: DuckDB's direct
    * `CAST(DECIMAL AS DOUBLE)` divides the scaled int128 by 10^scale in
    * double arithmetic, which is NOT correctly rounded — measured 1 ulp
    * off at sf1 (q01 sum_charge: exact decimal …010.941590, DuckDB
    * direct cast …010.941593, correct double …010.94159). decimal→string
    * is exact and string→double is correctly rounded on BOTH engines
    * (Spark's Decimal.toDouble is also correctly rounded, so the Spark
    * side needs no detour — [[dsum]] is unchanged and q15, which runs
    * this fragment through spark.sql, just takes the same exact route). */
  def sqlDsum(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS STRING) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"${sqlDsum(expr)} / COUNT(*)"
}
