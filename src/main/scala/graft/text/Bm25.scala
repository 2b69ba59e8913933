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

  /** Per-doc unigram-LM fluency (the q66 signal) restricted to `docIds`:
    * the (doc, term) tf table is semi-joined against the BROADCAST id set
    * BEFORE the per-doc aggregation, so the expensive stage aggregates
    * O(|docIds| × terms-per-doc) rows, never the corpus. The global term
    * statistics (`termCounts`, `total`) stay corpus-wide — that is the
    * language model itself and is |vocab| rows, not |corpus × terms|.
    * Catalyst cannot derive this pruning on its own (a semi-join does not
    * push through a groupBy), which is why the join sits explicitly below
    * the aggregate. PlanAuditSpec pins both properties (broadcast join
    * under the fluency aggregate; output rows == |docIds|). */
  def fluencyFor(docs: DataFrame, docIds: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(Text.tokens).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val termCounts = tf.groupBy("term").agg(sum(col("tf")).as("c"))
    val total = broadcast(termCounts.agg(
      sum(col("c")).cast("double").as("n_total")))
    tf.join(broadcast(docIds.select("doc_id").distinct()), "doc_id")
      .join(termCounts, "term").crossJoin(total)
      .withColumn("lps",
        floor(log(col("c").cast("double") / col("n_total")) * lit(1e9)).cast("long"))
      .groupBy("doc_id")
      .agg(round(sum(col("tf") * col("lps")).cast("double")
        / (sum(col("tf")).cast("double") * lit(1e9)), 6).as("fluency"))
  }

  /** Two-stage retrieve → rerank (the RAG-retrieval shape): a cheap BM25
    * stage shortlists k·refine candidates, an expensive quality signal —
    * here the q66 unigram-LM fluency score — reorders only the shortlist.
    * At 100 TB the first stage touches the postings index and the second
    * ([[fluencyFor]]) aggregates only the broadcast-pruned shortlist's
    * (doc, term) rows — never the corpus; the join of the two signals is
    * broadcast-sized by construction.
    *
    * Determinism: both stages end in total orders with doc_id tiebreaks,
    * so the shortlist CUT and the final ranking are reproducible and
    * oracle-exact (LM per-term log-probs use the q66 fixed-point
    * discipline). */
  def qBm25Rerank(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val shortlist = topK(docs, QueryTerms, k = 50)
    val lm = fluencyFor(docs, shortlist)
    shortlist.join(lm, "doc_id")
      .select("doc_id", "score", "fluency")
      .orderBy(col("fluency").desc, col("doc_id"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_bm25" -> (qBm25 _),
    "q114_bm25_rerank" -> (qBm25Rerank _))

  val oracles: Map[String, String] = {
    val terms = QueryTerms.distinct.sorted
    val inList = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    val scoreSum = terms.map(t =>
      s"COALESCE(SUM(CASE WHEN term = '$t' THEN c END), 0.0)").mkString(" + ")
    val bm25Core = s"""
      d AS (
        SELECT doc_id, toks, len(toks) AS dl
        FROM (SELECT doc_id, ${Text.duckTokens} AS toks FROM documents)),
      stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
      qtf AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
        WHERE term IN $inList
        GROUP BY doc_id, dl, term),
      qdf AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY term),
      c AS (
        SELECT doc_id, term,
               (ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
                 * (tf * ${K1 + 1})) /
               (tf + $K1 * (${1 - B} + $B * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))) AS c
        FROM qtf JOIN qdf USING (term) CROSS JOIN stats),
      bm25 AS (
        SELECT doc_id, ROUND($scoreSum, 6) AS score
        FROM c GROUP BY doc_id)"""
    Map(
      "q102_bm25" -> s"""
        WITH $bm25Core
        SELECT doc_id, score FROM bm25
        ORDER BY score DESC, doc_id LIMIT 20""",
      "q114_bm25_rerank" -> s"""
        WITH $bm25Core,
        shortlist AS (
          SELECT doc_id, score FROM bm25
          ORDER BY score DESC, doc_id LIMIT 50),
        tok AS (
          SELECT doc_id, unnest(${Text.duckTokens}) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        cnt AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS tc FROM tf GROUP BY term),
        tot AS (SELECT CAST(SUM(tc) AS DOUBLE) AS n_total FROM cnt),
        lm AS (
          SELECT doc_id,
                 ROUND(CAST(SUM(tf * CAST(FLOOR(ln(CAST(tc AS DOUBLE) / n_total) * 1e9)
                                          AS BIGINT)) AS DOUBLE)
                       / (CAST(SUM(tf) AS DOUBLE) * 1e9), 6) AS fluency
          FROM tf JOIN cnt USING (term) CROSS JOIN tot
          GROUP BY doc_id)
        SELECT doc_id, score, fluency
        FROM shortlist JOIN lm USING (doc_id)
        ORDER BY fluency DESC, doc_id LIMIT 10""")
  }
}
