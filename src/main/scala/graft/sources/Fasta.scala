package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA writer + the oracle-checked round-trip query for the V2 source
  * ([[graft.sources.v2.FastaSource]]). The reference consumes FASTA with a
  * driver-side line parser (chapter_10/examples/DNA-FASTA-V1/dna_fasta_v1
  * .py, sample.fasta); here the format is a first-class splittable source.
  */
object Fasta {

  /** Render (id, desc, seq) columns as FASTA records — one row per record
    * with embedded newlines, sequence wrapped at 60 chars (the
    * conventional FASTA line width), written via the text sink. Writers
    * parallelize per partition; `files` controls output fan-out.
    *
    * `files ≤ 0` (the default) sizes the fan-out FROM THE DATA:
    * max(defaultParallelism, estimated bytes / 64 MB). The fan-out
    * matters twice — it is the file count AND the render parallelism:
    * Catalyst collapses the projection past the repartition, so the
    * 60-char `regexp_replace` rewrap (CPU-heavy on MB-scale sequences)
    * executes in the post-repartition tasks. The round-7 sf10 partitions
    * sweep caught the old constant 4: the whole corpus rendered+wrote
    * through 4 tasks on a 32-core box, making q101 the suite's slowest
    * query (137 s); the sweep's p128 arm halved it purely by accident of
    * fan-out. Sizing from plan stats gives full-box parallelism locally
    * and, at cluster scale, file counts that track volume (100 TB /
    * 64 MB ≈ 1.6M files — shard the path by a partition column before
    * that point). */
  def write(df: DataFrame, idCol: String, descCol: String, seqCol: String,
            path: String, files: Int = 0): Unit = {
    val fanout =
      if (files > 0) files
      else {
        val par = df.sparkSession.sparkContext.defaultParallelism.toLong
        val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        // Catalyst reports UNKNOWN size as the defaultSizeInBytes sentinel
        // (Long.MaxValue; products of it can exceed Long). Any estimate
        // ≥ 1 PiB from a single un-sharded write call is the sentinel in
        // practice — fall back to core-count fan-out instead of planning
        // millions of output files off a fiction.
        val byVolume =
          if (bytes >= BigInt(1L << 50)) par
          else (bytes / BigInt(graft.Tuning.FastaWriteTargetBytes)).toLong
        math.max(par, math.min(byVolume, 1L << 20)).toInt
      }
    df.select(concat(
        lit(">"), col(idCol), lit(" "), col(descCol), lit("\n"),
        regexp_replace(col(seqCol), "(.{60})", "$1\n")).as("value"))
      .repartition(fanout)
      .write.mode("overwrite").text(path)
  }

  /** Read through the V2 source. `splitSizeBytes` is deliberately small in
    * tests/queries so multiple byte-range readers cover each file — the
    * shape a 1000-executor scan takes on real genome-scale files. */
  def read(spark: SparkSession, path: String, splitSizeBytes: Long): DataFrame =
    spark.read.format("fasta")
      .option("splitSizeBytes", splitSizeBytes.toString)
      .load(path)

  /** S-tier round trip: documents → FASTA text (letters-only sequences,
    * lang carried in the description) → byte-range-split V2 read → per-
    * lang aggregate. The oracle computes the same aggregate from the
    * source table directly, so every parsing path (header split, 60-char
    * re-wrapping, split-boundary handoff) must reassemble exactly.
    * Distinct-sequence counting goes through md5 fingerprints so the
    * distinct shuffle carries 16-byte keys, not document bodies. */
  def qFastaRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val root = graft.ops.Scratch.root(spark, d, "fasta_demo")
    val docs = Tables.documents(spark, d)
      .withColumn("seq", regexp_replace(lower(col("text")), "[^a-z]", ""))
    write(docs, "doc_id", "lang", "seq", root)
    // Split size derives from the bytes actually written: ~8 byte-range
    // splits per core, floored at 4 KB. The floor keeps the small-sf
    // correctness shape (many splits per file → the split-boundary
    // handoff is always exercised); the scaling fixes what a constant
    // 4 KB did at sf10 — ~1 GB of FASTA / 4 KB ≈ 250k input partitions,
    // pure task-launch overhead that made this the slowest query in the
    // suite (137 s at the default partitions).
    val written = new java.io.File(root).listFiles match {
      case null => 0L
      case fs => fs.filter(f => f.isFile && !f.getName.startsWith("_"))
        .map(_.length).sum
    }
    val split = math.max(4096L,
      written / (spark.sparkContext.defaultParallelism.toLong * 8))
    read(spark, root, splitSizeBytes = split)
      .groupBy(col("desc").as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("seq_id")).as("n_distinct_ids"),
        countDistinct(md5(col("sequence"))).as("n_distinct_seqs"),
        sum(col("length")).as("total_len"),
        max(col("length")).as("max_len"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_fasta_roundtrip" -> (qFastaRoundtrip _))

  val oracles: Map[String, String] = Map(
    "q101_fasta_roundtrip" -> """
      WITH s AS (
        SELECT lang, doc_id,
               regexp_replace(lower(text), '[^a-z]', '', 'g') AS seq
        FROM documents)
      SELECT lang, COUNT(*) AS n_docs,
             COUNT(DISTINCT doc_id) AS n_distinct_ids,
             COUNT(DISTINCT md5(seq)) AS n_distinct_seqs,
             CAST(SUM(length(seq)) AS BIGINT) AS total_len,
             CAST(MAX(length(seq)) AS INT) AS max_len
      FROM s GROUP BY lang ORDER BY lang""")
}
