package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (language ID, quality scoring, token counting, document
  * fingerprinting) plus the reference's wordcount/text shapes
  * (bonus_chapters/wordcount, tf_idf naming; chapter_02 char-count shape).
  *
  * Everything is built from codegen'd `functions._`/SQL expressions — no
  * UDFs — so the whole module stays inside WholeStageCodegen and scales as
  * a single scan + one aggregation per query.
  */
object Text {

  /** Tokenization used by every query: lowercase, split on non-letters,
    * drop empties. Expression-identical to the DuckDB oracle fragment. */
  val tokensSql = "filter(split(lower(text), '[^a-z]+'), x -> x != '')"
  /** Kernel tokenizer ([[graft.functions.TokenizeLower]]) — semantics
    * identical to [[tokensSql]] (same java regex), but codegen-capable:
    * the HOF form is interpreted and evicts its projection from
    * whole-stage codegen (PlanAuditSpec pins this). */
  val tokens: Column = graft.functions.exprs.tokenizeLower(col("text"))
  /** DuckDB twin of [[tokensSql]]. */
  val duckTokens = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')"

  /** Small public stopword lists for the language-ID heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "se", "del", "las"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "des"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "zh" -> Seq("de", "le", "he", "shi", "zai", "you", "wo", "ta", "men", "zhe"))

  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Count of tokens from `words` — same fragment for Spark and DuckDB. */
  def scoreSql(toks: String, words: Seq[String]): String =
    s"size(filter($toks, x -> x IN ${inList(words)}))"
  def duckScoreSql(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, x -> x IN ${inList(words)}))"

  /** Deterministic argmax over the language scores (ties resolve in list
    * order) — the identical CASE chain runs on both engines. */
  val argmaxCase: String = {
    val langs = stopwords.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      s"WHEN ${rest.map(r => s"score_$l >= score_$r").mkString(" AND ")} THEN '$l'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${langs.last}' END"
  }

  // ---------------------------------------------------------------- queries

  /** Wordcount (bonus_chapters/wordcount; rdd_transformations_overview.py:
    * 24-41 flatMap→reduceByKey→sortBy shape): explode → count → top-k.
    * Partial aggregation collapses each partition to its local vocabulary
    * before the shuffle — the in-mapper-combiner the reference teaches
    * (chapter_02/README.md:88-126), for free from HashAggregate. */
  def qWordcount(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(explode(tokens).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(50)

  /** Token counting + type/token stats per document (training-data token
    * accounting). All ratios are int/int → double divisions: exact parity. */
  def qTokenStats(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("toks", tokens)
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        length(col("text")).as("n_chars"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
          .as("type_token_ratio"),
        (length(col("text")).cast("double") / size(col("toks"))).as("chars_per_token"))
      .orderBy("doc_id")

  /** Quality scoring: stopword ratio, mean token length, short-doc flag —
    * the length/punct/stopword heuristics of pretraining-data filters. */
  def qQuality(spark: SparkSession, d: String): DataFrame = {
    val en = stopwords.head._2
    Tables.documents(spark, d)
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", expr(scoreSql("toks", en)))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"),
        (expr("aggregate(toks, 0, (acc, x) -> acc + length(x))").cast("double")
          / col("n_tokens")).as("mean_token_len"),
        (col("n_tokens") < 20).as("is_short"))
      .orderBy("doc_id")
  }

  /** Language ID: n-gram/stopword-count heuristic, deterministic argmax,
    * reported as a (labeled lang × predicted lang) confusion matrix —
    * the evaluation shape a data-quality pipeline actually emits. */
  def qLangId(spark: SparkSession, d: String): DataFrame = {
    var df = Tables.documents(spark, d).withColumn("toks", tokens)
    stopwords.foreach { case (l, ws) =>
      df = df.withColumn(s"score_$l", expr(scoreSql("toks", ws)))
    }
    df.withColumn("pred_lang", expr(argmaxCase))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("score_en")).as("sum_en_score"))
      .orderBy("lang", "pred_lang")
  }

  /** Document fingerprinting: md5 of the normalized token stream (stable
    * under whitespace/punctuation noise — a canonical-form fingerprint).
    * Aggregated per source so the result is non-degenerate at every SF. */
  def qFingerprint(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("fp", md5(concat_ws(" ", tokens)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("fp")).as("n_distinct_fp"))
      .orderBy("source")

  /** Char-frequency (chapter_02 DNA base-count shape, on documents):
    * per-letter counts via explode of the character stream. The in-JVM twin
    * of flatMap(char → (char,1)) → reduceByKey. */
  def qCharFreq(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(explode(expr("filter(split(lower(text), ''), c -> c >= 'a' AND c <= 'z')")).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n"))
      .orderBy("c")

  /** TF-IDF (bonus_chapters/tf_idf): top terms by tf-idf over the corpus.
    * Two aggregations (term-per-doc counts, then document frequency), one
    * join — no driver-side loops; log() is generic-real so the output is
    * rounded to 6dp for oracle stability. */
  def qTfIdf(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    // Corpus size as a 1-row broadcast inside the SAME plan — no separate
    // driver-side count() action (which would scan the corpus twice and
    // block query construction).
    val nDocs = broadcast(docs.agg(count(lit(1)).cast("double").as("n_docs")))
    val termFreq = docs
      .select(col("doc_id"), explode(tokens).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = termFreq.groupBy("term").agg(count(lit(1)).as("df"))
    termFreq.join(docFreq, "term").crossJoin(nDocs)
      .withColumn("tf_idf",
        round(col("tf") * log(col("n_docs") / col("df")), 6))
      .filter(col("tf_idf") > 0)
      .select("doc_id", "term", "tf", "df", "tf_idf")
      .orderBy(col("tf_idf").desc, col("doc_id"), col("term"))
      .limit(100)
  }

  /** BPE-ish token accounting: `\w+|[^\w\s]` — words plus standalone
    * punctuation, the pre-tokenizer shape of byte-pair encoders. Counted
    * per source (regexp_count-style, single scan). */
  def qBpeTokens(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("n_bpe", size(regexp_extract_all(col("text"),
        lit("""\w+|[^\w\s]"""), lit(0))))
      .groupBy("source")
      .agg(sum(col("n_bpe")).as("total_tokens"),
           max(col("n_bpe")).as("max_tokens"),
           count(lit(1)).as("n_docs"))
      .orderBy("source")

  /** Repetition ratio: distinct 3-grams / total 3-grams per document —
    * the n-gram repetition signal pretraining filters use (low ratio =
    * repetitive boilerplate). Hashed-set cardinality == string-set
    * cardinality modulo 2^-64 collisions, so the oracle compares exactly. */
  def qRepetition(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("toks", tokens)
      .filter(size(col("toks")) >= 10)
      .select(col("doc_id"),
        (size(col("toks")) - 2).as("n_grams"),
        size(graft.functions.exprs.gram3SetSorted(col("toks"))).as("n_distinct_grams"))
      .withColumn("repetition_ratio",
        col("n_distinct_grams").cast("double") / col("n_grams"))
      .orderBy("doc_id")

  /** Unigram language-model scoring: per-document mean token log-prob
    * under the corpus's own unigram distribution — the cheap "perplexity"
    * proxy pretraining filters use (very low score = gibberish / OOV-heavy,
    * very high = repetitive boilerplate). Shaped like q29: the join runs on
    * (doc, term) TF pairs, not raw tokens, so join input is the distinct-
    * term count; the vocabulary side is tiny relative to the corpus and
    * broadcast-eligible (at extreme vocab, bucket both sides on term).
    * The tf subplan feeds three branches (tf, vocab counts, total). The
    * STATIC plan prints three tokenize→explode→partial-count scans, but
    * all three end at a canonically-identical Exchange on (doc_id, term),
    * so AQE's runtime stage reuse executes the tokenization ONCE and the
    * other two branches read the reused shuffle stage (2 ReusedExchange
    * markers in the final adaptive plan — PlanAuditSpec pins this; it is
    * invisible in `explain()` because reuse happens at stage
    * materialization, not planning). At 100 TB the reused exchange is
    * exactly the "persist tf once" discipline without the memory pin.
    * Numeric discipline: per-term log-probs are fixed-pointed with
    * `floor(lp * 1e9)` — multiply and floor are exact IEEE ops, so both
    * engines produce the SAME integer from the same double (a `round(_, 9)`
    * here is NOT portable: Spark rounds the canonical string repr, DuckDB
    * the raw binary expansion, and they disagree at the 9th digit). The
    * integer sum is exact and associative → partition-invariant means. */
  def qUnigramLm(spark: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(spark, d)
      .select(col("doc_id"), explode(tokens).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val termCounts = tf.groupBy("term").agg(sum(col("tf")).as("c"))
    val total = broadcast(termCounts.agg(
      sum(col("c")).cast("double").as("n_total")))
    tf.join(termCounts, "term").crossJoin(total)
      .withColumn("lps",
        floor(log(col("c").cast("double") / col("n_total")) * lit(1e9)).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
           round(sum(col("tf") * col("lps")).cast("double")
                   / (sum(col("tf")).cast("double") * lit(1e9)), 6)
             .as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** Interpolated bigram language-model scoring (Jelinek–Mercer smoothing,
    * λ = 0.75): per-doc mean of ln(λ·c(ab)/c(a) + (1−λ)·c(b)/N) over the
    * doc's adjacent token pairs — the next-quality-signal step up from
    * [[qUnigramLm]] (word order now matters: scrambled text scores worse
    * than fluent text with the same unigram profile).
    *
    * Plan: ONE corpus tokenization feeds the per-doc bigram table; corpus
    * bigram counts are a reaggregation of it (no second scan); unigram
    * counts join twice (left context, right word). All counts are exact
    * integers; the only real-valued step is ln, fixed-pointed with
    * `floor(lp·1e9)` (the q66 portability rule — round(_, 9) is NOT
    * cross-engine stable, multiply+floor is), so per-doc sums are exact
    * integer sums: associative, partition-invariant, oracle-exact. */
  def qBigramLm(spark: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(spark, d)
      .withColumn("toks", tokens)
    val bi = t.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 2),
             i -> struct(toks[i] AS a, toks[i + 1] AS b))""")).as("p"))
      .groupBy(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("tf"))
    val big = bi.groupBy("a", "b").agg(sum(col("tf")).as("cab"))
    val uni = t.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val total = broadcast(uni.agg(sum(col("c")).cast("double").as("n_total")))
    bi.join(big, Seq("a", "b"))
      .join(uni.select(col("term").as("a"), col("c").as("ca")), "a")
      .join(uni.select(col("term").as("b"), col("c").as("cb")), "b")
      .crossJoin(total)
      .withColumn("lps", floor(log(
        (lit(0.75) * (col("cab").cast("double") / col("ca"))) +
        (lit(0.25) * (col("cb").cast("double") / col("n_total")))) * lit(1e9))
        .cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
           round(sum(col("tf") * col("lps")).cast("double")
                   / (sum(col("tf")).cast("double") * lit(1e9)), 6)
             .as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** Boilerplate detection: the top-5 most frequent token 3-grams per
    * language — recurring templates/navigation chrome surface at the top.
    * Gram expansion is linear in tokens; the per-lang top-k is a
    * rank-partitioned window (k rows kept per lang). */
  def qBoilerplate(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Tables.documents(spark, d)
      .withColumn("toks", tokens)
      .filter(size(col("toks")) >= 3)
      .select(col("lang"), explode(expr(
        """transform(sequence(0, size(toks) - 3),
             i -> concat(element_at(toks, i + 1), ' ',
                         element_at(toks, i + 2), ' ',
                         element_at(toks, i + 3)))""")).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("gram"))
    grams.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("lang", "rk", "gram", "n")
      .orderBy("lang", "rk")
  }

  /** PII / denylist redaction patterns — public redaction recipes, written
    * in the regex subset Java and RE2 (DuckDB) interpret identically: no
    * lookarounds, no backrefs. Order matters: SSN and IP before PHONE so
    * the looser phone pattern never eats their digits. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "SSN"   -> """\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b""",
    "IP"    -> """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b""",
    "PHONE" -> """\+[0-9][0-9() -]{6,}[0-9]""")

  /** Replace every match of every pattern with its `[TAG]` — a chained
    * regexp_replace, fully codegen'd (native Catalyst RegExpReplace with a
    * cached compiled pattern per expression; no UDF). */
  def redact(c: Column, patterns: Seq[(String, String)] = piiPatterns): Column =
    patterns.foldLeft(c) { case (acc, (tag, p)) =>
      regexp_replace(acc, p, s"[$tag]")
    }

  /** PII scan report: per-source match counts for the PII patterns plus a
    * denylist term ("customer" here — the corpus carries no real PII, so
    * the term path is what proves the count/redact machinery end-to-end
    * with nonzero values; the PII columns prove the patterns agree across
    * engines). chars_delta audits replace-ALL semantics (DuckDB needs the
    * 'g' flag to match Spark). Single scan, one aggregation. */
  def qPiiScan(spark: SparkSession, d: String): DataFrame = {
    val termP = """\bcustomer\b"""
    def hits(p: String) = size(regexp_extract_all(col("text"), lit(p), lit(0)))
    Tables.documents(spark, d)
      .select(col("source"),
        hits(piiPatterns.head._2).as("n_email"),
        hits(piiPatterns(2)._2).as("n_ip"),
        hits(termP).as("n_term"),
        (length(col("text")) -
          length(regexp_replace(col("text"), termP, "[TERM]"))).as("delta"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_email")).as("pii_email"),
        sum(col("n_ip")).as("pii_ip"),
        sum(col("n_term")).as("term_hits"),
        sum(col("delta")).as("chars_delta"))
      .orderBy("source")
  }

  /** Quality-threshold retention curve: the sweep you run BEFORE picking
    * a filter cutoff — for every stopword-ratio decile floor, how many
    * documents and tokens survive the filter. One corpus scan collapses
    * to a ≤ 11-row bin table; the suffix-cumulative window runs over the
    * BINS (bounded domain — the q64 discipline), never the corpus, so
    * the single-partition window is O(bins) regardless of corpus size.
    * Bin = (10·n_stop) div n_tokens in integer math — bit-identical on
    * both engines, no double-rounding hazard. */
  def qRetentionCurve(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val en = stopwords.head._2
    val bins = Tables.documents(spark, d)
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") > 0)
      .withColumn("n_stop", expr(scoreSql("toks", en)))
      .withColumn("min_bin", expr("(10 * n_stop) div n_tokens"))
      .groupBy("min_bin")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens").cast("long")).as("n_toks"))
    val w = Window.orderBy(col("min_bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins.select(col("min_bin"),
        sum(col("n_docs")).over(w).as("docs_retained"),
        sum(col("n_toks")).over(w).as("tokens_retained"))
      .orderBy("min_bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_pii_scan"    -> (qPiiScan _),
    "q118_retention_curve" -> (qRetentionCurve _),
    "q66_unigram_lm"  -> (qUnigramLm _),
    "q68_boilerplate" -> (qBoilerplate _),
    "q109_bigram_lm" -> (qBigramLm _),
    "q61_repetition"  -> (qRepetition _),
    "q47_bpe_tokens"  -> (qBpeTokens _),
    "q23_wordcount"   -> (qWordcount _),
    "q24_token_stats" -> (qTokenStats _),
    "q25_quality"     -> (qQuality _),
    "q26_lang_id"     -> (qLangId _),
    "q27_fingerprint" -> (qFingerprint _),
    "q28_char_freq"   -> (qCharFreq _),
    "q29_tf_idf"      -> (qTfIdf _),
  )

  val oracles: Map[String, String] = {
    val en = stopwords.head._2
    val scoreCols = stopwords.map { case (l, ws) =>
      s"${duckScoreSql("toks", ws)} AS score_$l"
    }.mkString(", ")
    // NB: the s-interpolator processes escapes even in triple-quoted
    // strings — a literal \b here becomes a backspace byte. Regexes must
    // arrive via interpolated raw-string vals (termRe below, piiPatterns).
    val termRe = """\bcustomer\b"""
    Map(
      "q90_pii_scan" -> s"""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_extract_all(text,
                 '${piiPatterns.head._2}'))) AS BIGINT) AS pii_email,
               CAST(SUM(len(regexp_extract_all(text,
                 '${piiPatterns(2)._2}'))) AS BIGINT) AS pii_ip,
               CAST(SUM(len(regexp_extract_all(text,
                 '$termRe'))) AS BIGINT) AS term_hits,
               CAST(SUM(length(text) - length(regexp_replace(text,
                 '$termRe', '[TERM]', 'g'))) AS BIGINT) AS chars_delta
        FROM documents GROUP BY source ORDER BY source""",
      "q61_repetition" -> s"""
        SELECT doc_id, CAST(len(toks) - 2 AS INT) AS n_grams,
               CAST(len(${graft.dedup.Dedup.duckShinglesSql}) AS INT) AS n_distinct_grams,
               CAST(len(${graft.dedup.Dedup.duckShinglesSql}) AS DOUBLE)
                 / (len(toks) - 2) AS repetition_ratio
        FROM (SELECT doc_id, $duckTokens AS toks FROM documents)
        WHERE len(toks) >= 10
        ORDER BY doc_id""",
      "q47_bpe_tokens" -> """
        SELECT source,
               CAST(SUM(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) AS total_tokens,
               CAST(MAX(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS INT) AS max_tokens,
               COUNT(*) AS n_docs
        FROM documents GROUP BY source ORDER BY source""",
      "q23_wordcount" -> s"""
        SELECT word, COUNT(*) AS n
        FROM (SELECT unnest($duckTokens) AS word FROM documents)
        GROUP BY word ORDER BY n DESC, word LIMIT 50""",
      "q24_token_stats" -> s"""
        SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
               CAST(length(text) AS INT) AS n_chars,
               CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio,
               CAST(length(text) AS DOUBLE) / len(toks) AS chars_per_token
        FROM (SELECT doc_id, text, $duckTokens AS toks FROM documents)
        ORDER BY doc_id""",
      "q118_retention_curve" -> s"""
        WITH s AS (
          SELECT len(toks) AS n_tokens, ${duckScoreSql("toks", en)} AS n_stop
          FROM (SELECT $duckTokens AS toks FROM documents)
          WHERE len(toks) > 0),
        b AS (
          SELECT (10 * n_stop) // n_tokens AS min_bin,
                 COUNT(*) AS n_docs, SUM(n_tokens) AS n_toks
          FROM s GROUP BY min_bin)
        SELECT CAST(min_bin AS BIGINT) AS min_bin,
               CAST(SUM(n_docs) OVER w AS BIGINT) AS docs_retained,
               CAST(SUM(n_toks) OVER w AS BIGINT) AS tokens_retained
        FROM b
        WINDOW w AS (ORDER BY min_bin DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY min_bin""",
      "q25_quality" -> s"""
        SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
               CAST(${duckScoreSql("toks", en)} AS DOUBLE) / len(toks) AS stopword_ratio,
               CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                 / len(toks) AS mean_token_len,
               len(toks) < 20 AS is_short
        FROM (SELECT doc_id, $duckTokens AS toks FROM documents)
        ORDER BY doc_id""",
      "q26_lang_id" -> s"""
        SELECT lang, $argmaxCase AS pred_lang, COUNT(*) AS n_docs,
               CAST(SUM(score_en) AS BIGINT) AS sum_en_score
        FROM (SELECT lang, $scoreCols
              FROM (SELECT lang, $duckTokens AS toks FROM documents))
        GROUP BY 1, 2 ORDER BY lang, pred_lang""",
      "q27_fingerprint" -> s"""
        SELECT source, COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(array_to_string($duckTokens, ' '))) AS n_distinct_fp
        FROM documents GROUP BY source ORDER BY source""",
      "q28_char_freq" -> """
        SELECT c, COUNT(*) AS n
        FROM (SELECT unnest(list_filter(string_split_regex(lower(text), ''),
                     c -> c >= 'a' AND c <= 'z')) AS c
              FROM documents)
        GROUP BY c ORDER BY c""",
      "q109_bigram_lm" -> s"""
        WITH t AS (SELECT doc_id, $duckTokens AS toks FROM documents),
        pairs AS (
          -- range(a, b) is exclusive of b: i spans 1..len-1, pairing
          -- toks[i] with toks[i+1] over all len-1 adjacencies
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS a,
                 unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS b
          FROM t WHERE len(toks) >= 2),
        bi AS (SELECT doc_id, a, b, COUNT(*) AS tf FROM pairs GROUP BY 1, 2, 3),
        big AS (SELECT a, b, CAST(SUM(tf) AS BIGINT) AS cab FROM bi GROUP BY 1, 2),
        uni AS (SELECT term, COUNT(*) AS c
                FROM (SELECT unnest(toks) AS term FROM t) GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM uni)
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               ROUND(CAST(SUM(tf * CAST(FLOOR(ln(
                       (0.75 * (CAST(cab AS DOUBLE) / ca.c)) +
                       (0.25 * (CAST(cb.c AS DOUBLE) / n_total))) * 1e9)
                     AS BIGINT)) AS DOUBLE)
                     / (CAST(SUM(tf) AS DOUBLE) * 1e9), 6) AS avg_logprob
        FROM bi JOIN big USING (a, b)
        JOIN uni ca ON bi.a = ca.term
        JOIN uni cb ON bi.b = cb.term
        CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id""",
      "q66_unigram_lm" -> s"""
        WITH tok AS (
          SELECT doc_id, unnest($duckTokens) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        cnt AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY term),
        tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM cnt)
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
               ROUND(CAST(SUM(tf * CAST(FLOOR(ln(CAST(c AS DOUBLE) / n_total) * 1e9)
                                        AS BIGINT)) AS DOUBLE)
                     / (CAST(SUM(tf) AS DOUBLE) * 1e9), 6) AS avg_logprob
        FROM tf JOIN cnt USING (term) CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id""",
      "q68_boilerplate" -> s"""
        WITH g AS (
          SELECT lang, unnest(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
          FROM (SELECT lang, $duckTokens AS toks FROM documents)
          WHERE len(toks) >= 3),
        c AS (SELECT lang, gram, COUNT(*) AS n FROM g GROUP BY 1, 2),
        r AS (SELECT lang, gram, n,
                     ROW_NUMBER() OVER (PARTITION BY lang
                                        ORDER BY n DESC, gram) AS rk
              FROM c)
        SELECT lang, CAST(rk AS INT) AS rk, gram, n
        FROM r WHERE rk <= 5 ORDER BY lang, rk""",
      "q29_tf_idf" -> s"""
        WITH tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest($duckTokens) AS term FROM documents)
          GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, tf.term, tf, df,
               ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tf_idf
        FROM tf JOIN df USING (term) CROSS JOIN n
        WHERE ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) > 0
        ORDER BY tf_idf DESC, doc_id, tf.term LIMIT 100""",
    )
  }
}
