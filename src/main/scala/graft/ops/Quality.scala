package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality expectation checks as a first-class operator: each check
  * is one aggregation emitting (check, n_violations, n_checked), unioned
  * into a single report — the "expectations" pattern of production data
  * pipelines (constraint validation before data is allowed downstream).
  *
  * Scale: every check is a single scan + aggregate (or an anti-join-free
  * left join for referential integrity, whose build side is the distinct
  * key set). Nothing collects; the report is rows, so it lands in the
  * same warehouse as the data it audits.
  */
object Quality {

  private def check1(name: String, df: DataFrame): DataFrame =
    df.select(lit(name).as("check"), col("v").cast("long").as("n_violations"),
      col("n").cast("long").as("n_checked"))

  /** Five representative expectations over the harness tables:
    * primary-key uniqueness, referential integrity, value ranges,
    * null rates, and non-empty payloads. */
  def qQualityReport(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val li = Tables.lineitem(spark, d)
    val ev = Tables.events(spark, d)
    val docs = Tables.documents(spark, d)

    val pkUnique = check1("orders_pk_unique",
      o.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("v"),
            count(lit(1)).as("n")))
    val orphans = check1("lineitem_fk_orphans",
      li.select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")).distinct(),
          col("l_orderkey") === col("o_orderkey"), "left_outer")
        .agg(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v"),
             count(lit(1)).as("n")))
    val qtyRange = check1("lineitem_qty_in_1_to_50",
      li.agg(sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
          .otherwise(0L)).as("v"),
        count(lit(1)).as("n")))
    val nullUser = check1("events_user_not_null",
      ev.agg(sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("v"),
             count(lit(1)).as("n")))
    val emptyText = check1("documents_text_nonempty",
      docs.agg(sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("v"),
        count(lit(1)).as("n")))

    pkUnique.unionByName(orphans).unionByName(qtyRange)
      .unionByName(nullUser).unionByName(emptyText)
      .orderBy("check")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_quality_report" -> (qQualityReport _))

  val oracles: Map[String, String] = Map(
    "q74_quality_report" -> """
      SELECT * FROM (
        SELECT 'orders_pk_unique' AS check,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations,
               COUNT(*) AS n_checked
        FROM orders
        UNION ALL
        SELECT 'lineitem_fk_orphans',
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
          ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'lineitem_qty_in_1_to_50',
               CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
                             THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM lineitem
        UNION ALL
        SELECT 'events_user_not_null',
               CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM events
        UNION ALL
        SELECT 'documents_text_nonempty',
               CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0
                             THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM documents)
      ORDER BY "check" """)
}
