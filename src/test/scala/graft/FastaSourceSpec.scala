package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The FASTA DataSource V2: byte-range split correctness (every split
  * size yields the identical record set), column pruning, and filter
  * pushdown — plus the writer round trip on real documents. */
class FastaSourceSpec extends SparkSpec {

  /** Records with every boundary hazard: multi-line sequences, a CRLF
    * line, an empty description, a sequence ending exactly at a line
    * wrap, an empty sequence, and a '>' mid-line (not a header). */
  private val fixture =
    ">alpha first record\nACGT\nACGTA\n" +
    ">beta\r\nTTTT\r\nGG\r\n" +
    ">gamma third x>y marker\nAAAACCCC\n" +
    ">delta empty sequence\n" +
    ">epsilon last\nCGCGCG\n"

  private val expected = Set(
    ("alpha", "first record", "ACGTACGTA", 9),
    ("beta", "", "TTTTGG", 6),
    ("gamma", "third x>y marker", "AAAACCCC", 8),
    ("delta", "empty sequence", "", 0),
    ("epsilon", "last", "CGCGCG", 6))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_fasta_spec")
    Files.write(Paths.get(d.toString, "part1.fasta"),
      fixture.getBytes(StandardCharsets.UTF_8))
    d.toString
  }

  private def readAll(splitSize: Long) =
    graft.sources.Fasta.read(spark, dir, splitSize)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet

  test("parses all records at one split per file") {
    assert(readAll(1L << 20) === expected)
  }

  test("every split size yields the identical record set (boundary protocol)") {
    // fixture is ~120 bytes: sizes below force headers onto and across
    // split boundaries in every alignment, including 1-byte splits
    for (s <- Seq(1L, 2L, 3L, 5L, 7L, 11L, 17L, 31L, 59L, 64L, 127L)) {
      assert(readAll(s) === expected, s"split size $s")
    }
  }

  test("column pruning reaches the scan (no sequence materialization)") {
    val df = graft.sources.Fasta.read(spark, dir, 1L << 20)
      .select("seq_id", "length")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("ReadSchema=[seq_id,length]"), scanDesc)
    assert(df.collect().map(r => (r.getString(0), r.getInt(1))).toSet ===
      expected.map(t => (t._1, t._4)))
  }

  test("filter pushdown: length range and id prefix evaluated in-source") {
    val df = graft.sources.Fasta.read(spark, dir, 1L << 20)
      .filter(col("length") >= 6 && col("seq_id").startsWith("a"))
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("GreaterThanOrEqual(length,6)"), desc)
    assert(desc.contains("StringStartsWith(seq_id,a)"), desc)
    assert(df.select("seq_id").collect().map(_.getString(0)).toSet === Set("alpha"))
  }

  test("unsupported filters still evaluate correctly post-scan") {
    val df = graft.sources.Fasta.read(spark, dir, 1L << 20)
      .filter(col("desc").contains("record")) // not a pushable shape
    assert(df.select("seq_id").collect().map(_.getString(0)).toSet === Set("alpha"))
  }

  test("documents round trip: write 60-char-wrapped FASTA, re-read equals source") {
    val root = sys.props("java.io.tmpdir") + "/graft_fasta_spec_rt"
    val docs = Tables.documents(spark, sf)
      .withColumn("seq", regexp_replace(lower(col("text")), "[^a-z]", ""))
    graft.sources.Fasta.write(docs, "doc_id", "lang", "seq", root, files = 3)
    val back = graft.sources.Fasta.read(spark, root, splitSizeBytes = 2048)
      .select(col("seq_id"), col("sequence"))
    val src = docs.select(col("doc_id").as("seq_id"), col("seq").as("sequence"))
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  private def partFileCount(root: String): Int =
    new java.io.File(root).listFiles.count(f =>
      f.isFile && f.getName.startsWith("part-"))

  test("auto fan-out: small file-backed input writes core-count files") {
    val root = sys.props("java.io.tmpdir") + "/graft_fasta_spec_auto"
    val docs = Tables.documents(spark, sf)
      .withColumn("seq", regexp_replace(lower(col("text")), "[^a-z]", ""))
    graft.sources.Fasta.write(docs, "doc_id", "lang", "seq", root)
    // tiny input → byVolume 0 → fan-out = defaultParallelism, never fewer
    assert(partFileCount(root) === spark.sparkContext.defaultParallelism)
  }

  test("auto fan-out: unknown-size (RDD-backed) input falls back to cores") {
    // An RDD-backed plan reports the defaultSizeInBytes sentinel (~Long.Max)
    // as its size estimate; the writer must fall back to core-count fan-out
    // instead of planning bytes/64MB ≈ millions of output files.
    import spark.implicits._
    val mem = spark.sparkContext
      .parallelize(Seq(("a", "x", "acgtacgt"), ("b", "y", "ttttgggg")))
      .toDF("id", "d", "s")
    val sentinel = mem.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sentinel >= BigInt(1L << 50), s"precondition: $sentinel is a real estimate")
    val root = sys.props("java.io.tmpdir") + "/graft_fasta_spec_sentinel"
    graft.sources.Fasta.write(mem, "id", "d", "s", root)
    // fan-out = cores; with 2 rows some of the round-robin partitions are
    // empty and the sink may skip them — bound, don't pin
    val n = partFileCount(root)
    assert(n >= 1 && n <= spark.sparkContext.defaultParallelism, s"files=$n")
  }
}
