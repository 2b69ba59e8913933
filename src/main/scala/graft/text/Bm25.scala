package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over the documents corpus — the lexical ranking
  * backbone of dataset search / targeted curation ("pull the top-k docs
  * about X from 100 TB"). Okapi BM25 (Robertson–Spärck Jones):
  *
  *   score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
  *   idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *
  * Plan shape (the part that must survive 100 TB):
  *   - the corpus is scanned ONCE; docs not containing a query term are
  *     dropped at the explode-filter, so the (doc, term) shuffle carries
  *     only matching postings, not the corpus;
  *   - corpus stats (N, Σ|d|) are a 1-row in-plan broadcast — no separate
  *     driver action, no second scan;
  *   - df(t) is |terms| rows, broadcast into the postings join;
  *   - the final top-k plans as TakeOrderedAndProject (per-partition
  *     k-row heaps), never a global sort.
  *
  * Numerics: tf/df/dl/N are exact integers; avgdl is an exact-integer
  * division; the only transcendental is ln — per-(doc,term) contributions
  * are single values (no float accumulation), summed across the fixed
  * query-term list in sorted-term order, so the result is deterministic
  * and cross-engine stable at round-6 (the q29 tf-idf discipline).
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Top-k docs for a bag-of-words query. `terms` must be non-empty;
    * duplicates are ignored (BM25 term contributions are per unique term). */
  def topK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val qterms = terms.distinct.sorted
    require(qterms.nonEmpty, "bm25: empty query")
    val d = docs.select(col("doc_id"), Text.tokens.as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = broadcast(d.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(qterms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(df_), "term").crossJoin(stats)
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("c",
        (col("idf") * (col("tf") * lit(K1 + 1))) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * (col("dl") / col("avgdl")))))
    // one sum() per term selects the single (doc, term) contribution row;
    // the cross-term addition is a fixed-order expression, not an agg
    val perTerm = qterms.map(t => sum(when(col("term") === t, col("c"))).as(s"c_$t"))
    val score = qterms.map(t => coalesce(col(s"c_$t"), lit(0.0))).reduce(_ + _)
    contrib.groupBy("doc_id").agg(perTerm.head, perTerm.tail: _*)
      .withColumn("score", round(score, 6))
      .select("doc_id", "score")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Fixed query over the synthetic corpus (terms chosen mid-frequency:
    * df ≈ 0.8N, so idf is small but positive and length normalization is
    * the discriminating factor — the regime where BM25's dl/avgdl term
    * actually matters). */
  val QueryTerms: Seq[String] = Seq("hash", "merge", "window")

  def qBm25(spark: SparkSession, d: String): DataFrame =
    topK(Tables.documents(spark, d), QueryTerms, k = 20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_bm25" -> (qBm25 _))

  val oracles: Map[String, String] = {
    val terms = QueryTerms.distinct.sorted
    val inList = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    val scoreSum = terms.map(t =>
      s"COALESCE(SUM(CASE WHEN term = '$t' THEN c END), 0.0)").mkString(" + ")
    Map("q102_bm25" -> s"""
      WITH d AS (
        SELECT doc_id, toks, len(toks) AS dl
        FROM (SELECT doc_id, ${Text.duckTokens} AS toks FROM documents)),
      stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
      tf AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
        WHERE term IN $inList
        GROUP BY doc_id, dl, term),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      c AS (
        SELECT doc_id, term,
               (ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
                 * (tf * ${K1 + 1})) /
               (tf + $K1 * (${1 - B} + $B * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))) AS c
        FROM tf JOIN df USING (term) CROSS JOIN stats)
      SELECT doc_id, ROUND($scoreSum, 6) AS score
      FROM c GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 20""")
  }
}
