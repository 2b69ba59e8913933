package graft.dedup

import graft.Tables
import graft.text.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash
  * groupBy), MinHash+LSH (shingle → minhash → band → bucket join), SimHash
  * (+ banded Hamming search), and exact n-gram Jaccard as the verification
  * baseline.
  *
  * Scale design: every approximate method is shuffle-bounded by LSH
  * bucketing — candidate generation is groupBy(bucket) + within-bucket
  * pairing, never an all-pairs join. The exact Jaccard query is the
  * *baseline oracle* and is deliberately restricted to within-source
  * pairs; at 100 TB you run the LSH variants and verify only candidates.
  */
object Dedup {

  /** Distinct 3-token shingles, expression-identical across engines.
    * `sequence` must be guarded: Spark's sequence(0, n) with n < 0 counts
    * backwards instead of producing an empty array. */
  val shinglesSql: String =
    """CASE WHEN size(toks) >= 3 THEN
         array_distinct(transform(sequence(0, size(toks) - 3),
           i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))
       ELSE array() END"""

  /** DuckDB twin (1-based list indexing). */
  val duckShinglesSql: String =
    """CASE WHEN len(toks) >= 3 THEN
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
       ELSE [] END"""

  private val NumHashes = 16
  private val BandRows  = 4
  private val NumBands  = NumHashes / BandRows

  /** doc_id + minhash signature array (16 hashes = 4 bands × 4 rows).
    * One projection, no shuffle: sig[i] = min over shingles of
    * xxhash64(i, shingle). */
  def minhashSignatures(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", Text.tokens)
      .withColumn("shingles", expr(shinglesSql))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", expr(
        s"transform(sequence(0, ${NumHashes - 1}), i -> array_min(transform(shingles, s -> xxhash64(i, s))))"))
      .select("doc_id", "sig")

  /** LSH candidate pairs: explode signature into bands, hash each band,
    * group by (band, bucket); docs sharing any band-bucket are candidates.
    * Shuffle volume: NumBands rows per doc, fixed fan-out. */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val bands = sigs.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${NumBands - 1}), b -> xxhash64(${
          (0 until BandRows).map(r => s"sig[b * $BandRows + $r]").mkString(", ")}))"))
        .as(Seq("band", "bucket")))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** 64-bit SimHash per doc from term-frequency-weighted token hashes.
    * Entirely expression-level: collect per-doc (term, tf), fold a 64-wide
    * counter array, take the sign bit per dimension. */
  def simhash(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(Text.tokens).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id").agg(collect_list(struct(col("term"), col("tf"))).as("terms"))
      .withColumn("dims", expr(
        """aggregate(terms, array_repeat(0L, 64),
             (acc, t) -> zip_with(acc,
               transform(sequence(0, 63),
                 j -> t.tf * (CASE WHEN (shiftright(xxhash64(t.term), j) & 1) = 1
                              THEN 1L ELSE -1L END)),
               (a, b) -> a + b))"""))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L,
             (acc, j) -> CASE WHEN dims[j] > 0
                         THEN acc | shiftleft(1L, j) ELSE acc END)"""))
      .select("doc_id", "simhash")

  /** Near-dup pairs by SimHash: band the 64 bits into 4×16-bit chunks;
    * pairs equal in ≥1 chunk are candidates (guarantees recall of all
    * pairs with Hamming distance ≤ 3); rank by exact Hamming distance. */
  def simhashPairs(sh: DataFrame, topK: Int): DataFrame = {
    val chunks = sh.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)"))
        .as(Seq("chunk_id", "chunk")))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk_id") === col("y.chunk_id") &&
        col("x.chunk") === col("y.chunk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(topK)
  }

  // ---------------------------------------------------------------- queries

  /** Exact dedup (hash-groupBy): distinct-text counts per lang.
    * At scale this is dropDuplicates(md5(text)) — one shuffle on the hash,
    * never on the full text bytes. */
  def qDedupExact(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(md5(col("text"))).as("n_distinct"))
      .orderBy("lang")

  /** Exact n-gram Jaccard near-dup baseline: top-20 within-source pairs.
    * int/int → double division keeps the score bitwise cross-engine. */
  def qNgramJaccard(spark: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(spark, d)
      .withColumn("toks", Text.tokens)
      .withColumn("shingles", expr(shinglesSql))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("source"), col("shingles"))
    sh.as("a").join(sh.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("""CAST(size(array_intersect(a.shingles, b.shingles)) AS DOUBLE)
                / (size(a.shingles) + size(b.shingles)
                   - size(array_intersect(a.shingles, b.shingles)))""").as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** MinHash+LSH structural summary (hash-dependent → no SQL oracle;
    * rows-only check + planted-duplicate recall spec in DedupSpec). */
  def qMinhashLsh(spark: SparkSession, d: String): DataFrame = {
    val sigs = minhashSignatures(Tables.documents(spark, d))
    val bands = sigs.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${NumBands - 1}), b -> xxhash64(${
          (0 until BandRows).map(r => s"sig[b * $BandRows + $r]").mkString(", ")}))"))
        .as(Seq("band", "bucket")))
    bands.groupBy("band", "bucket").agg(count(lit(1)).as("sz"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
           max(col("sz")).as("max_bucket"),
           sum(expr("sz * (sz - 1) div 2")).as("n_candidate_pairs"))
      .orderBy("band")
  }

  /** SimHash near-dup pairs (hash-dependent → rows-only check). */
  def qSimhash(spark: SparkSession, d: String): DataFrame =
    simhashPairs(simhash(Tables.documents(spark, d)), topK = 20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_dedup_exact"   -> (qDedupExact _),
    "q31_ngram_jaccard" -> (qNgramJaccard _),
    "q32_minhash_lsh"   -> (qMinhashLsh _),
    "q33_simhash"       -> (qSimhash _),
  )

  val oracles: Map[String, String] = Map(
    "q30_dedup_exact" -> """
      SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_distinct
      FROM documents GROUP BY lang ORDER BY lang""",
    "q31_ngram_jaccard" -> s"""
      WITH sh AS (
        SELECT doc_id, source, $duckShinglesSql AS shingles
        FROM (SELECT doc_id, source, ${Text.duckTokens} AS toks FROM documents)
        WHERE len($duckShinglesSql) > 0),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))) AS jaccard
        FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id)
      SELECT * FROM pairs ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""",
    // q32/q33: xxhash64-based — not expressible in DuckDB; rows-only.
  )
}
