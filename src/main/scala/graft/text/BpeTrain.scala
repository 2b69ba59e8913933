package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * tokenizer-building step of an LLM data pipeline, not just tokenizer
  * *application* (q47 counts with a fixed pre-tokenizer; this LEARNS the
  * merge table).
  *
  * The scale insight: BPE statistics live on the WORD VOCABULARY, not the
  * corpus. One corpus-wide aggregation builds (word, freq); every merge
  * iteration then runs on the vocabulary table — millions of rows at
  * 100 TB corpus scale, not trillions — so the training loop is
  * driver-coordinated like k-means ([[graft.similarity.Pq]]) with one
  * small aggregation per round:
  *
  *   1. words = tokens → groupBy(word) → freq       (the ONLY corpus pass)
  *   2. per round: explode adjacent symbol pairs, weight by word freq,
  *      pick argmax (ties broken (count desc, left, right) — total order,
  *      deterministic on any engine/partitioning);
  *   3. merge the winning pair inside every word's symbol array (a
  *      per-row linear scan, map-only, no shuffle);
  *   4. `localCheckpoint` every few rounds truncates the growing map
  *      lineage (the PageRank lesson — NOTES.md).
  *
  * Training is hash-free and float-free: pure integer counts + a total
  * order, so the learned merge table is bit-deterministic. DuckDB can't
  * express the iterative merge (recursive CTEs can't thread the evolving
  * symbol arrays through an argmax per level) → rows-only check; BpeSpec
  * pins the hand-computable merge sequence of the classic (hug, pug, pun,
  * bun, hugs) corpus and an encode round trip.
  */
object BpeTrain {

  case class WordSyms(word: String, freq: Long, syms: Seq[String])
  case class Merge(rank: Int, left: String, right: String, merged: String,
                   weighted_count: Long)

  /** Word vocabulary with frequencies, symbols initialized to characters.
    * This is the single corpus-wide aggregation. */
  def initWords(docs: DataFrame): Dataset[WordSyms] = {
    import docs.sparkSession.implicits._
    docs.select(explode(Text.tokens).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => WordSyms(w, f, w.map(_.toString)) }
  }

  /** Most frequent adjacent symbol pair, weighted by word frequency.
    * Returns None when no word has two symbols left. The pair explode is
    * a HOF over the vocabulary table — deliberately NOT the corpus-path
    * kernel rule (NOTES §perf 1): the input is |vocab| rows. */
  private def bestPair(ws: Dataset[WordSyms]): Option[(String, String, Long)] = {
    val rows = ws.toDF()
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i + 1] AS r))"))
        .as("p"))
      .groupBy(col("p.l"), col("p.r"))
      .agg(sum(col("freq")).as("c"))
      .orderBy(col("c").desc, col("l"), col("r"))
      .limit(1)
      .collect()
    rows.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** Replace every non-overlapping (left, right) adjacency with the merged
    * symbol — greedy left-to-right, the standard BPE apply step. */
  private[graft] def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges. Each round: one vocabulary aggregation + one
    * map-only merge application. */
  def train(docs: DataFrame, nMerges: Int): (Seq[Merge], Dataset[WordSyms]) = {
    import docs.sparkSession.implicits._
    var ws = initWords(docs).persist()
    ws.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var continue = true
    while (continue && rank <= nMerges) {
      bestPair(ws) match {
        case Some((l, r, c)) =>
          merges += Merge(rank, l, r, l + r, c)
          val prev = ws
          val mapped = prev.map(w => w.copy(syms = mergeOnce(w.syms, l, r))).persist()
          // localCheckpoint (eager) materializes its own blocks; release
          // the pre-checkpoint cache afterwards or it leaks for the rest
          // of the job (rank % 4 bounds lineage depth — the PageRank
          // lesson, NOTES.md)
          ws = if (rank % 4 == 0) {
            val cp = mapped.localCheckpoint()
            mapped.unpersist()
            cp
          } else mapped
          ws.count()
          prev.unpersist()
          rank += 1
        case None => continue = false
      }
    }
    (merges.toSeq, ws)
  }

  /** Encode a single word with a learned merge table (apply in rank
    * order) — the tokenizer a data loader ships with the vocab. */
  def encode(word: String, merges: Seq[Merge]): Seq[String] =
    merges.sortBy(_.rank).foldLeft(word.map(_.toString): Seq[String]) {
      (syms, m) => mergeOnce(syms, m.left, m.right)
    }

  /** q108: the first 12 learned merges over the corpus, plus the resulting
    * mean subword count per word — deterministic integer statistics
    * (rows-only: the iterative argmax/merge loop is not SQL-expressible). */
  def qBpeTrain(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val (merges, ws) = train(Tables.documents(spark, d), nMerges = 12)
    val vocabStats = ws.toDF().agg(
      count(lit(1)).as("n_words"),
      sum(size(col("syms")).cast("long")).as("total_symbols")).head()
    ws.unpersist()
    merges.toDF()
      .withColumn("n_words", lit(vocabStats.getLong(0)))
      .withColumn("total_symbols", lit(vocabStats.getLong(1)))
      .orderBy("rank")
  }

  /** Corpus-scale ENCODE with a learned merge table — the apply half of
    * the train→apply loop. The merge table is tiny (it's the model);
    * it rides into every task as a closure (at a real vocab size,
    * `sparkContext.broadcast` — same shape), and encoding is a map-only
    * pass: no shuffle until the output aggregation. */
  def encodeCorpus(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = merges.sortBy(_.rank).map(m => (m.left, m.right)).toIndexedSeq
    docs.select(col("doc_id"), col("source"), explode(Text.tokens).as("word"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, src, w) =>
          val subs = table.foldLeft(w.map(_.toString): Seq[String]) {
            (syms, m) => mergeOnce(syms, m._1, m._2)
          }
          (id, src, subs.length)
        }
      }
      .toDF("doc_id", "source", "n_subwords")
  }

  /** q112: train 12 merges, re-encode the corpus with them, report
    * per-source compression (subwords per character — trained merges
    * must beat the char-level baseline of 1.0). Deterministic integer
    * statistics; rows-only like q108 (the merge table is the output of
    * the non-SQL-expressible trainer). */
  def qBpeEncode(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val (merges, ws) = train(docs, nMerges = 12)
    ws.unpersist()
    encodeCorpus(docs, merges)
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_subwords").cast("long")).as("n_subwords"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_bpe_train" -> (qBpeTrain _),
    "q112_bpe_encode" -> (qBpeEncode _))

  val oracles: Map[String, String] = Map.empty
}
