package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data-capture between two versions of a keyed
  * table: full outer join on the key, rows classified as inserted /
  * deleted / changed / unchanged by null-side and content-hash compare.
  * This is the CDC primitive you run between daily snapshots when the
  * source can't emit a changelog — and the verification step after any
  * migration ("the rewrite changed exactly the rows it claimed to").
  *
  * Scale: one shuffle of each side on the key (or zero with bucketed
  * snapshots); content compare is on md5 hashes computed map-side, so
  * wide payloads never travel — the classic "hash diff" discipline.
  */
object Diff {

  /** Classify every key across two snapshots; `contentHash` is the
    * row-content fingerprint expression (resolved against each side).
    * Returns (key, change ∈ inserted|deleted|changed|unchanged). */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, key: String,
                   contentHash: org.apache.spark.sql.Column): DataFrame = {
    val a = v1.select(col(key).as("k1"), contentHash.as("h1"))
    val b = v2.select(col(key).as("k2"), contentHash.as("h2"))
    a.join(b, col("k1") === col("k2"), "full_outer")
      .select(
        coalesce(col("k1"), col("k2")).as(key),
        when(col("k1").isNull, "inserted")
          .when(col("k2").isNull, "deleted")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("unchanged").as("change"))
  }

  /** Deterministic "v2" of documents, derived so both engines can build
    * it: every 97th doc deleted, every 50th doc's text amended, every
    * 200th doc re-inserted under a new id. */
  private def v2(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 97 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 50 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(
        docs.filter(col("doc_id") % 200 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))

  /** CDC summary between documents and its synthetic v2: per-category
    * row counts (the shape a snapshot-diff job reports before the
    * per-row changelog is written). */
  def qSnapshotDiff(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    snapshotDiff(docs, v2(docs), "doc_id", md5(col("text")))
      .groupBy("change").agg(count(lit(1)).as("n_rows"))
      .orderBy("change")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_snapshot_diff" -> (qSnapshotDiff _))

  val oracles: Map[String, String] = Map(
    "q75_snapshot_diff" -> """
      WITH v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 50 = 0 THEN text || ' v2' ELSE text END AS text
        FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 200 = 0),
      d AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN a.doc_id IS NULL THEN 'inserted'
                    WHEN b.doc_id IS NULL THEN 'deleted'
                    WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                    ELSE 'unchanged' END AS change
        FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      SELECT change, COUNT(*) AS n_rows FROM d
      GROUP BY change ORDER BY change""")
}
