package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink layer (SURVEY §2.1, S1–S9 / K1–K8).
  *
  * Readers mirror the reference's three schema modes (inferred / explicit /
  * embedded — chapter_07/examples/csv_json_operations.py:46-84,
  * parquet_operations.py:61-63) and the sinks mirror its write patterns
  * (coalesce-to-one demo sink, hive-partitioned layout with exactly one
  * file per partition dir — chapter_05/examples/physical_partitioning.py:
  * 60-84, chapter_07/examples/parquet_operations.py:41-53).
  *
  * Scale notes: `singleFile*` writers exist for small demo outputs only —
  * the partitioned writers are the 100 TB path (`repartition(cols)` before
  * `partitionBy` so each hive dir gets one well-sized file, and dynamic
  * partition overwrite instead of whole-table truncation).
  */
object IO {

  // ------------------------------------------------------------- readers
  /** S3: CSV with header + schema inference (two passes over the data —
    * the cost the reference calls out; prefer explicit schemas at scale). */
  def csvInfer(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S4: headerless CSV — columns arrive as _c0, _c1, … */
  def csvNoHeader(spark: SparkSession, path: String): DataFrame =
    spark.read.csv(path)

  /** S5: explicit schema — no inference pass, nullability enforced. */
  def csvWithSchema(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).csv(path)

  /** S6: line-delimited JSON (schema inference incl. nested arrays/structs). */
  def json(spark: SparkSession, path: String): DataFrame = spark.read.json(path)

  /** Tolerant CSV ingest — the DataFrame-native channel for the
    * reference's tolerant line parser (R6, chapter 3's try/except rows):
    * PERMISSIVE mode parses what it can and lands each malformed line
    * VERBATIM in a `_corrupt` column instead of killing the 100 TB job
    * (FAILFAST) or silently losing rows (DROPMALFORMED). Callers split on
    * `_corrupt IS NULL` — clean rows continue, rejects go to a quarantine
    * sink with full fidelity for replay. The quarantine column must be
    * REQUESTED in the schema to be populated, hence the appended field. */
  def csvTolerant(spark: SparkSession, path: String,
                  schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Tolerant line-delimited JSON ingest: same quarantine contract as
    * [[csvTolerant]]. */
  def jsonTolerant(spark: SparkSession, path: String,
                   schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** S7: parquet (embedded schema). */
  def parquet(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** S2: text-line scan → Dataset[String]. */
  def textLines(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[String] =
    spark.read.textFile(path)

  /** S8: hive-layout partition-discovery read (filters on partition
    * columns prune directories before any file is opened). */
  def partitionedRead(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)

  /** SequenceFile source: Hadoop's (key, value) Text container — the one
    * chapter-7 format the reference documents with no code
    * (src/chapter_07/README.md:132-174) that needs no external connector:
    * Hadoop core is already on Spark's classpath. Returns (key, value)
    * string columns. SequenceFiles are splittable (sync markers), so the
    * scan parallelizes like any other Hadoop input at scale. */
  def sequenceFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[String, String](path).toDF("key", "value")
  }

  /** SequenceFile sink: the first two columns rendered as the (key, value)
    * Text pair. Hadoop output-committer semantics: the target directory
    * must not exist (no overwrite mode — callers own the lifecycle, the
    * [[swapDirs]] pattern covers in-place refresh). */
  def sequenceFileSink(df: DataFrame, path: String): Unit =
    df.rdd.map(r => (String.valueOf(r.get(0)), String.valueOf(r.get(1))))
      .saveAsSequenceFile(path)

  /** Multimodal ingestion: whole files as rows of (path, modificationTime,
    * length, content binary) — how raw image/audio/video lands in a
    * DataFrame before decode. Supports pathGlobFilter pushdown. */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

  /** Image source (Spark built-in): decodes to a struct<origin, height,
    * width, nChannels, mode, data binary> — typed metadata + opaque pixels,
    * the multimodal column contract (chapter_07/README.md:132-174 documents
    * the source without code; here it is real). */
  def images(spark: SparkSession, path: String): DataFrame =
    spark.read.format("image").load(path)

  /** JDBC sink+source (embedded Derby — same API as any RDBMS at scale;
    * partitionColumn/numPartitions options parallelize real servers). */
  def jdbcWrite(df: DataFrame, url: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("jdbc").option("url", url).option("dbtable", table)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").save()

  def jdbcRead(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load()

  /** Crash-safe directory swap via the Hadoop [[org.apache.hadoop.fs.FileSystem]]
    * API, so the same operator works on local FS, HDFS, or any Hadoop-
    * supported store (on object stores rename is a copy — there a real
    * table format's atomic commit is the answer; this is the no-catalog
    * fallback). Ordering: live → `.old` backup, tmp → live, delete backup.
    * A crash between any two steps leaves the full table at either `path`
    * or `path.old` — never nothing; a failed install restores the backup. */
  private def swapDirs(spark: SparkSession, path: String, tmp: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(path.stripSuffix("/"))
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val tmpP = new Path(tmp)
    val old = new Path(path.stripSuffix("/") + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"swap: backup rename failed for $path")
    if (!fs.rename(tmpP, live)) {
      fs.rename(old, live)
      throw new java.io.IOException(
        s"swap: install rename failed for $path (backup restored)")
    }
    fs.delete(old, true)
    ()
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(rows / rowsPerFile) files. Streaming `foreachBatch` appends and
    * over-parallel writers leave file sprawl that degrades scan planning
    * (one task per tiny file); periodic compaction is the standard
    * maintenance job. Writes to a temp dir then swaps ([[swapDirs]]), so a
    * crash never leaves the table truncated. */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long): Int = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    val tmp = path.stripSuffix("/") + ".compact-tmp"
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(tmp)
    swapDirs(spark, path, tmp)
    files
  }

  /** Keyed upsert into a parquet table (poor-man's MERGE: without a table
    * format there is no transactional row update, so this is read →
    * anti-join out replaced keys → union updates → swap-write). At 100 TB
    * you use a real table format (Iceberg/Delta) for this; the operator
    * exists so the engine's API covers the semantics, and the swap keeps
    * it crash-safe like [[compact]]. */
  def upsert(spark: SparkSession, path: String, updates: org.apache.spark.sql.DataFrame,
             key: String): Unit = {
    val current = spark.read.parquet(path)
    val merged = current.join(updates.select(key), Seq(key), "left_anti")
      .unionByName(updates)
    val tmp = path.stripSuffix("/") + ".upsert-tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    swapDirs(spark, path, tmp)
  }

  // -------------------------------------------------------------- sinks
  /** K1/K2: single-file CSV (demo outputs only — never for large data). */
  def singleFileCsv(df: DataFrame, path: String, sep: String = ","): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").option("sep", sep).csv(path)

  /** K3: single-file JSON. */
  def singleFileJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(path)

  /** K4: parquet sink (snappy default). */
  def parquetSink(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** ORC twin (the other columnar format Spark supports natively —
    * same pushdown/pruning machinery as parquet). */
  def orcSink(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
  def orc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  /** K6: hive-partitioned parquet, exactly one file per partition dir —
    * `repartition(cols)` first so every partition's rows land in one task.
    *
    * SCALE WARNING: one-file-per-dir means write parallelism == the
    * DISTINCT VALUE COUNT of `cols` — correct for this operator's
    * contract (tidy demo layouts, dimension-sized data), wrong for fact
    * tables. For volume writes use the salted form in
    * [[graft.queries.Extra.q44PartitionPruning]]: hash(cols…, key %
    * (cores/4)) keeps ≤ cores/4 files per dir at full fan-out (measured
    * at sf10: the unsalted shape pushed a 60M-row encode through 7
    * tasks — 88 s CPU serialized into 22 s wall). */
  def hivePartitionedParquet(df: DataFrame, path: String, cols: String*): Unit =
    df.repartition(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** K5: hive-partitioned CSV twin. */
  def hivePartitionedCsv(df: DataFrame, path: String, cols: String*): Unit =
    df.repartition(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .partitionBy(cols: _*).csv(path)

  /** The fact-table variant of [[hivePartitionedParquet]]: salted
    * pre-write repartition so write parallelism comes from the CLUSTER,
    * not from the partition column's distinct-value count. Hashing on
    * (cols…, saltKey % filesPerDir) bounds output at `filesPerDir` files
    * per directory while letting every core encode; `filesPerDir`
    * defaults to cores/4 (files-per-dir tracks cluster parallelism —
    * bounded both ways: no serialized directories, no small-file
    * explosion). `saltKey` must be a roughly-uniform column (a key or
    * hash); skew in it degrades balance, never correctness. Measured at
    * sf10 (queries/Extra.q44PartitionPruning, which uses this): the
    * unsalted shape pushed a 60M-row encode through 7 tasks — 88 s CPU
    * serialized into 22 s wall; salted runs the same encode at full
    * fan-out, 10.5 s steady end-to-end. */
  def hivePartitionedParquetSalted(df: DataFrame, path: String,
                                   saltKey: String, cols: String*): Unit = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val filesPerDir = math.max(1, par / 4)
    val parts = (cols.map(col) :+ pmod(col(saltKey), lit(filesPerDir))).toSeq
    df.repartition(par * 2, parts: _*)
      .write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)
  }

  /** Globally-sorted parquet layout: `repartitionByRange` (sampled range
    * boundaries → files cover DISJOINT key ranges) + `sortWithinPartitions`
    * (rows ordered inside each file) — the clustered-table layout that
    * makes parquet min/max row-group stats selective for range predicates
    * and feeds merge joins pre-sorted runs. A plain `orderBy.write` would
    * produce the same layout but via a single global sort whose partition
    * count AQE may coalesce; the explicit two-step keeps `nFiles` under
    * the writer's control (one sorted file per range bucket).
    * IOSpec asserts the contract: per-file key ranges are disjoint and
    * every file is internally sorted. */
  def writeSortedBy(df: DataFrame, path: String, sortCol: String,
                    nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
