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

  /** Learn `nMerges` merges. Each round runs ONE Spark job: the
    * vocabulary pair aggregation, whose action also materializes the
    * previous round's map-only merge into the cache. The previous cache
    * is released only AFTER that action (deferred one round), so the
    * merge never recomputes from truncated lineage — this replaces the
    * old per-round eager `count()`, halving driver-coordinated jobs in
    * the stage-latency-bound regime (BENCHMARKS.md q108/q112). */
  def train(docs: DataFrame, nMerges: Int): (Seq[Merge], Dataset[WordSyms]) = {
    import docs.sparkSession.implicits._
    var ws = initWords(docs).persist()
    // previous round's cache: still backing `ws`'s lineage until the next
    // action materializes `ws`; unpersisting earlier would force a
    // recompute, unpersisting never would leak (the r4 ADVICE item)
    var pending: Option[Dataset[WordSyms]] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var continue = true
    while (continue && rank <= nMerges) {
      val best = bestPair(ws) // materializes ws's cache
      pending.foreach(_.unpersist())
      pending = None
      best match {
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
            prev.unpersist() // cp is materialized; prev no longer needed
            cp
          } else {
            pending = Some(prev)
            mapped
          }
          rank += 1
        case None => continue = false
      }
    }
    // the last round's merge was never materialized by a following
    // bestPair: force it ONCE before releasing its backing cache, or
    // every downstream action on the returned Dataset re-runs the tail
    // merges from the last checkpoint
    pending.foreach { p => ws.count(); p.unpersist() }
    (merges.toSeq, ws)
  }

  /** Top-`m` pairs in sequential tie order — one job, same aggregation as
    * [[bestPair]] but returning a lookahead window for batched selection. */
  private def topPairs(ws: Dataset[WordSyms], m: Int): Array[(String, String, Long)] =
    ws.toDF()
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i + 1] AS r))"))
        .as("p"))
      .groupBy(col("p.l"), col("p.r"))
      .agg(sum(col("freq")).as("c"))
      .orderBy(col("c").desc, col("l"), col("r"))
      .limit(m)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  /** From a sorted lookahead window, the longest prefix batch that is
    * PROVABLY equivalent to applying the merges one sequential round at a
    * time. Three facts make the argument:
    *
    *   1. merging (l, r) leaves the count of every symbol-disjoint pair
    *      unchanged (occurrences cannot overlap without a shared symbol);
    *   2. pairs sharing a symbol with the merge only LOSE occurrences;
    *   3. every newly created pair (x, lr) / (lr, x) inherits count ≤ some
    *      pre-merge pair involving l or r.
    *
    * So after merging a disjoint prefix q1..qk, the sequential argmax is
    * q(k+1) provided c(q(k+1)) is STRICTLY above every candidate that
    * shares a symbol with the batch (2 and 3 bound those, but a tie could
    * flip on lexicographic order — hence strict) and strictly above the
    * uncollected tail (bounded by the window's minimum). q1 alone is
    * always exact (it IS the argmax), so the batch never degenerates below
    * the one-per-round trainer. */
  private[graft] def selectBatch(
      cands: Seq[(String, String, Long)],
      complete: Boolean = false): Seq[(String, String, Long)] = {
    if (cands.isEmpty) return Nil
    // counts strictly above this are provably safe: the first candidate
    // sharing a symbol with the batch, or — when the window was truncated
    // (`complete=false`) — the window's minimum standing in for everything
    // uncollected. A complete, sharer-free window is all-safe: every new
    // pair inherits its count from a pre-merge sharer, and none exist.
    val used = scala.collection.mutable.Set.empty[String]
    val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var bound = if (complete) Long.MinValue else cands.last._3
    var i = 0
    var stopped = false
    while (i < cands.length && !stopped) {
      val (l, r, c) = cands(i)
      if (used.contains(l) || used.contains(r)) { bound = c; stopped = true }
      else { batch += cands(i); used += l; used += r; i += 1 }
    }
    val safe = batch.takeWhile(_._3 > bound)
    if (safe.isEmpty) batch.take(1).toSeq else safe.toSeq
  }

  /** One-pass application of a symbol-disjoint merge batch: equivalent to
    * applying each pair's [[mergeOnce]] in rank order, because disjoint
    * patterns cannot overlap in the symbol stream — so a single greedy
    * left-to-right scan with a (left → (right, merged)) lookup table
    * commutes with any application order. */
  private[graft] def mergeBatch(syms: Seq[String],
                                table: Map[String, (String, String)]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      val hit = if (i + 1 < syms.length) table.get(syms(i)) else None
      hit match {
        case Some((r, merged)) if syms(i + 1) == r => out += merged; i += 2
        case _                                     => out += syms(i); i += 1
      }
    }
    out.toSeq
  }

  /** [[train]] with per-round BATCHED merges: each driver round collects a
    * `lookahead`-row pair window (same single aggregation job) and applies
    * every provably-safe merge from it in ONE map pass — cutting the
    * driver-coordinated round count (the stage-latency bound at toy SF,
    * and the scheduling-overhead bound on a 1000-executor cluster) by the
    * average batch size while producing the IDENTICAL merge table
    * (BpeSpec pins equality with [[train]] merge-for-merge). */
  def trainBatched(docs: DataFrame, nMerges: Int,
                   lookahead: Int = 256): (Seq[Merge], Dataset[WordSyms]) = {
    import docs.sparkSession.implicits._
    var ws = initWords(docs).persist()
    var pending: Option[Dataset[WordSyms]] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var continue = true
    while (continue && merges.size < nMerges) {
      val window = topPairs(ws, lookahead) // materializes ws's cache
      pending.foreach(_.unpersist())
      pending = None
      val batch = selectBatch(window.toSeq, complete = window.length < lookahead)
        .take(nMerges - merges.size)
      if (batch.isEmpty) continue = false
      else {
        batch.foreach { case (l, r, c) =>
          merges += Merge(merges.size + 1, l, r, l + r, c)
        }
        val table = batch.map { case (l, r, _) => l -> (r, l + r) }.toMap
        val prev = ws
        val mapped = prev.map(w => w.copy(syms = mergeBatch(w.syms, table))).persist()
        round += 1
        ws = if (round % 4 == 0) {
          val cp = mapped.localCheckpoint()
          mapped.unpersist()
          prev.unpersist()
          cp
        } else {
          pending = Some(prev)
          mapped
        }
      }
    }
    pending.foreach { p => ws.count(); p.unpersist() }
    // operational visibility (stderr — Bench's stdout stays one JSON line):
    // rounds ≪ merges is the point of batching; rounds == merges means the
    // window degenerated to one safe merge per round on this corpus
    System.err.println(s"BPE_TRAIN_BATCHED rounds=$round merges=${merges.size}")
    (merges.toSeq, ws)
  }

  /** Encode a single word with a learned merge table (apply in rank
    * order) — the tokenizer a data loader ships with the vocab. */
  def encode(word: String, merges: Seq[Merge]): Seq[String] =
    merges.sortBy(_.rank).foldLeft(word.map(_.toString): Seq[String]) {
      (syms, m) => mergeOnce(syms, m.left, m.right)
    }

  /** The first `nMerges` learned merges plus vocab totals — raw shape;
    * the full merge sequence is pinned by BpeSpec's hand-computed corpus. */
  def trainedMerges(spark: SparkSession, d: String, nMerges: Int = 12): DataFrame = {
    import spark.implicits._
    val (merges, ws) = train(Tables.documents(spark, d), nMerges)
    val vocabStats = ws.toDF().agg(
      count(lit(1)).as("n_words"),
      sum(size(col("syms")).cast("long")).as("total_symbols")).head()
    ws.unpersist()
    merges.toDF()
      .withColumn("n_words", lit(vocabStats.getLong(0)))
      .withColumn("total_symbols", lit(vocabStats.getLong(1)))
      .orderBy("rank")
  }

  /** q108, oracle-checkable form (the q69 exactness-contract pattern).
    * DuckDB cannot thread the iterative merge loop, but it CAN recompute
    * round 1 exactly — the argmax adjacent character pair over the word
    * vocabulary (with the (count desc, left, right) tie order) needs no
    * iteration — and rounds 2..n obey an engine-independent law: the
    * winning count never increases (a new pair containing merged XY
    * occurs only where X·Y occurred, so its count ≤ the count just
    * merged; all other counts only shrink or stand). Vocab totals bound
    * the symbol table: n_words ≤ total_symbols < total_chars (12 merges
    * must have contracted SOMETHING). The full merge table still
    * computes — this summarizes [[trainedMerges]]'s 12 driver-coordinated
    * rounds; BpeSpec pins the hand-computed sequence. */
  def qBpeTrain(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val (merges, ws) = trainBatched(Tables.documents(spark, d), nMerges = 12)
    val vocabStats = ws.toDF().agg(
      count(lit(1)).as("n_words"),
      sum(size(col("syms")).cast("long")).as("total_symbols"),
      sum(length(col("word")).cast("long")).as("total_chars")).head()
    ws.unpersist()
    val (nWords, totalSyms, totalChars) =
      (vocabStats.getLong(0), vocabStats.getLong(1), vocabStats.getLong(2))
    val monotone = merges.sliding(2).forall {
      case Seq(a, b) => b.weighted_count <= a.weighted_count
      case _         => true
    }
    val first = merges.head
    Seq((merges.size, nWords, first.left, first.right, first.weighted_count,
        monotone, nWords <= totalSyms && totalSyms < totalChars))
      .toDF("n_merges", "n_words", "first_left", "first_right",
        "first_count", "counts_monotone_ok", "symbols_within_bounds")
  }

  /** Corpus-scale ENCODE with a learned merge table — the apply half of
    * the train→apply loop. The merge table is tiny (it's the model);
    * it rides into every task as a closure (at a real vocab size,
    * `sparkContext.broadcast` — same shape), and encoding is a map-only
    * pass: no shuffle until the output aggregation.
    *
    * Each task MEMOIZES word → encoding: token occurrences repeat words
    * with corpus/vocab ≫ 1 (Zipf — "the" alone is ~5% of English tokens),
    * so the 12-pass merge fold runs once per distinct word per partition,
    * not once per occurrence, while the output stays per-occurrence and
    * the pass stays shuffle-free (the alternative — joining occurrences
    * against a pre-encoded vocab table — costs a corpus-wide shuffle). */
  def encodeCorpus(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = merges.sortBy(_.rank).map(m => (m.left, m.right)).toIndexedSeq
    docs.select(col("doc_id"), col("source"), explode(Text.tokens).as("word"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        val memo = scala.collection.mutable.HashMap.empty[String, (Int, Boolean)]
        rows.map { case (id, src, w) =>
          val (nSubs, ok) = memo.getOrElseUpdate(w, {
            val subs = table.foldLeft(w.map(_.toString): Seq[String]) {
              (syms, m) => mergeOnce(syms, m._1, m._2)
            }
            // roundtrip: merge application only ever concatenates adjacent
            // symbols, so the subwords must spell the word back exactly — a
            // dropped/duplicated symbol in the apply loop breaks this
            (subs.length, subs.mkString == w)
          })
          (id, src, nSubs, w.length, ok)
        }
      }
      .toDF("doc_id", "source", "n_subwords", "n_chars", "roundtrip_ok")
  }

  /** q112: train 12 merges, re-encode the corpus with them, report
    * per-source conservation. Oracle-checkable (the q69 exactness-contract
    * pattern): the subword counts depend on the learned merges (not
    * SQL-recomputable), but per source the word and character totals are
    * exact, every word's subwords must concatenate back to the word
    * (roundtrip — pins the distributed apply loop), and the encoding must
    * actually compress (n_words ≤ n_subwords < n_chars; strict, because
    * at least one learned merge fires in every source — deterministic for
    * fixed data, verified at sf0.001/0.01/0.1). */
  /** q112's aggregate report needs no per-occurrence rows, so it encodes
    * at VOCABULARY scale: aggregate occurrences to (source, word, cnt)
    * first — the map-side partial agg shrinks the corpus to ≤ |sources| ×
    * |vocab| rows BEFORE any expensive work — then run the merge fold once
    * per distinct (source, word) and weight the totals by cnt. Same
    * numbers as encoding every occurrence (counts distribute over
    * duplicates), measured ~2× faster at sf0.1 and widening with corpus /
    * vocab; [[encodeCorpus]] remains the per-occurrence path a data
    * loader materializes. */
  def qBpeEncode(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val (merges, ws) = trainBatched(docs, nMerges = 12)
    ws.unpersist()
    import spark.implicits._
    val table = merges.sortBy(_.rank).map(m => (m.left, m.right)).toIndexedSeq
    docs.select(col("source"), explode(Text.tokens).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
      .as[(String, String, Long)]
      .mapPartitions { rows =>
        val memo = scala.collection.mutable.HashMap.empty[String, (Int, Boolean)]
        rows.map { case (src, w, cnt) =>
          val (nSubs, ok) = memo.getOrElseUpdate(w, {
            val subs = table.foldLeft(w.map(_.toString): Seq[String]) {
              (syms, m) => mergeOnce(syms, m._1, m._2)
            }
            (subs.length, subs.mkString == w)
          })
          (src, cnt, cnt * w.length, cnt * nSubs, ok)
        }
      }
      .toDF("source", "cnt", "chars", "subwords", "ok")
      .groupBy("source")
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("chars")).as("n_chars"),
        sum(col("subwords")).as("n_subwords"),
        min(col("ok")).as("all_roundtrip_ok"))
      .select(col("source"), col("n_words"), col("n_chars"),
        (col("n_words") <= col("n_subwords") &&
          col("n_subwords") < col("n_chars")).as("compressed"),
        col("all_roundtrip_ok"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_bpe_train" -> (qBpeTrain _),
    "q112_bpe_encode" -> (qBpeEncode _))

  val oracles: Map[String, String] = Map(
    // q108: DuckDB recomputes round 1's argmax pair exactly (same
    // (count desc, left, right) tie order) and the vocab size; the
    // iterative rounds are pinned by the monotone/bounds booleans.
    "q108_bpe_train" -> s"""
      WITH words AS (
        SELECT word, COUNT(*) AS freq
        FROM (SELECT unnest(${Text.duckTokens}) AS word FROM documents)
        GROUP BY word),
      prs AS (
        SELECT substring(word, CAST(i AS INT), 1) AS l,
               substring(word, CAST(i AS INT) + 1, 1) AS r,
               SUM(freq) AS c
        FROM words, LATERAL (SELECT unnest(range(1, length(word))) AS i) t
        GROUP BY 1, 2)
      SELECT 12 AS n_merges, (SELECT COUNT(*) FROM words) AS n_words,
             l AS first_left, r AS first_right, CAST(c AS BIGINT) AS first_count,
             TRUE AS counts_monotone_ok, TRUE AS symbols_within_bounds
      FROM prs ORDER BY c DESC, l, r LIMIT 1""",
    "q112_bpe_encode" -> s"""
      SELECT source, COUNT(*) AS n_words,
             CAST(SUM(length(word)) AS BIGINT) AS n_chars,
             TRUE AS compressed, TRUE AS all_roundtrip_ok
      FROM (SELECT source, unnest(${Text.duckTokens}) AS word FROM documents)
      GROUP BY source ORDER BY source""")
}
