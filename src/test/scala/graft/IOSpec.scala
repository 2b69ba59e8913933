package graft

import graft.sources.IO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IOSpec extends SparkSpec {
  private def res(name: String) = getClass.getResource(s"/fixtures/$name").getPath
  private val tmp = "target/tmp/iospec"

  test("CSV inferSchema types ints/doubles; no-header yields _c columns") {
    val inferred = IO.csvInfer(spark, res("employees.csv"))
    assert(inferred.schema("age").dataType == IntegerType)
    assert(inferred.schema("salary").dataType == IntegerType)
    assert(inferred.count() == 8)
    val raw = IO.csvNoHeader(spark, res("sensors_no_header.csv"))
    assert(raw.columns.sameElements(Array("_c0", "_c1", "_c2", "_c3")))
    assert(raw.schema.fields.forall(_.dataType == StringType))
  }

  test("explicit schema: typed, no inference pass, nullability carried") {
    val schema = StructType(Seq(
      StructField("sensor_id", StringType, nullable = false),
      StructField("temperature", DoubleType),
      StructField("humidity", DoubleType),
      StructField("reading_date", StringType)))
    val df = IO.csvWithSchema(spark, res("sensors_no_header.csv"), schema)
    assert(df.schema("temperature").dataType == DoubleType)
    assert(df.count() == 6)
    assert(math.abs(df.agg(sum("temperature")).head.getDouble(0) - 125.1) < 1e-9)
  }

  test("JSON: nested array inferred and explodable (D9)") {
    val df = IO.json(spark, res("employees.json"))
    assert(df.schema("skills").dataType == ArrayType(StringType))
    val skills = df.select(col("name"), explode(col("skills")).as("skill"))
    assert(skills.count() == 8)
    assert(skills.filter(col("skill") === "spark").count() == 2)
  }

  test("csv/json/parquet round trips preserve data (K1-K4, K7)") {
    val src = IO.csvInfer(spark, res("employees.csv"))
    IO.singleFileCsv(src, s"$tmp/csv", sep = "|")
    IO.singleFileJson(src, s"$tmp/json")
    IO.parquetSink(src, s"$tmp/parquet")
    val backCsv = spark.read.option("header", "true").option("sep", "|")
      .option("inferSchema", "true").csv(s"$tmp/csv")
    val backJson = spark.read.json(s"$tmp/json")
    val backPq = spark.read.parquet(s"$tmp/parquet")
    Seq(backCsv, backJson, backPq).foreach { b =>
      assert(b.count() == 8)
      assert(b.agg(sum("salary")).head.get(0).toString.toLong == 624000L)
    }
    // single-file sinks: exactly one data file
    val files = new java.io.File(s"$tmp/csv").listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
  }

  test("SequenceFile round trip: (key, value) Text pairs survive; splittable container") {
    val src = IO.csvInfer(spark, res("employees.csv"))
      .select(col("name"), col("salary").cast("string"))
    val dir = s"$tmp/seqfile"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IO.sequenceFileSink(src, dir)
    val back = IO.sequenceFile(spark, dir)
    assert(back.columns.sameElements(Array("key", "value")))
    assert(back.count() == 8)
    val pairs = back.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = src.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pairs == expected)
    // really a Hadoop SequenceFile: the container's magic header
    val part = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("part-")).head
    val head = java.nio.file.Files.readAllBytes(part.toPath).take(3)
    assert(head.sameElements("SEQ".getBytes), "missing SequenceFile magic")
  }

  test("hive-partitioned write: one file per partition dir; pruning skips dirs (K6, S8, §4)") {
    val tx = IO.csvInfer(spark, res("transactions.csv"))
      .withColumn("year", split(col("date"), "/").getItem(2).cast("int"))
      .withColumn("month", split(col("date"), "/").getItem(1).cast("int"))
    IO.hivePartitionedParquet(tx, s"$tmp/part", "year", "month")
    val dirs = new java.io.File(s"$tmp/part").listFiles.filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("year=2024", "year=2025"))
    new java.io.File(s"$tmp/part/year=2024").listFiles.filter(_.isDirectory).foreach { m =>
      val parts = m.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${m.getName} must have exactly 1 file")
    }
    val pruned = IO.partitionedRead(spark, s"$tmp/part")
      .filter(col("year") === 2024 && col("month") === 1)
    assert(pruned.count() == 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), "partition filters must reach the scan")
  }

  test("salted hive-partitioned write: bounded files per dir, full fan-out, data identical") {
    val src = Tables.lineitem(spark, sf)
      .withColumn("ship_year", year(col("l_shipdate")))
    IO.hivePartitionedParquetSalted(src, s"$tmp/salted", "l_orderkey", "ship_year")
    val cap = math.max(1, spark.sparkContext.defaultParallelism / 4)
    val yearDirs = new java.io.File(s"$tmp/salted").listFiles
      .filter(d => d.isDirectory && d.getName.startsWith("ship_year="))
    assert(yearDirs.nonEmpty)
    yearDirs.foreach { d =>
      val n = d.listFiles.count(_.getName.endsWith(".parquet"))
      assert(n >= 1 && n <= cap, s"${d.getName}: $n files, cap $cap")
    }
    val back = IO.partitionedRead(spark, s"$tmp/salted")
    assert(back.count() === src.count())
    // per-partition-value row counts survive the salting exactly
    val a = src.groupBy("ship_year").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = back.groupBy("ship_year").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("salted hive-partitioned write: multi-column dirs nest, counts exact") {
    val src = Tables.lineitem(spark, sf)
      .withColumn("ship_year", year(col("l_shipdate")))
      .withColumn("ship_q", quarter(col("l_shipdate")))
    IO.hivePartitionedParquetSalted(src, s"$tmp/salted2", "l_orderkey",
      "ship_year", "ship_q")
    val cap = math.max(1, spark.sparkContext.defaultParallelism / 4)
    val leafDirs = new java.io.File(s"$tmp/salted2").listFiles
      .filter(d => d.isDirectory && d.getName.startsWith("ship_year="))
      .flatMap(_.listFiles.filter(d => d.isDirectory && d.getName.startsWith("ship_q=")))
    assert(leafDirs.nonEmpty)
    leafDirs.foreach { d =>
      val n = d.listFiles.count(_.getName.endsWith(".parquet"))
      assert(n >= 1 && n <= cap, s"${d.getParentFile.getName}/${d.getName}: $n files")
    }
    val back = IO.partitionedRead(spark, s"$tmp/salted2")
    val a = src.groupBy("ship_year", "ship_q").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = back.groupBy("ship_year", "ship_q").count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("write modes: ignore keeps, error throws (K8)") {
    val df = IO.csvInfer(spark, res("employees.csv"))
    IO.parquetSink(df, s"$tmp/modes")
    IO.parquetSink(df.limit(1), s"$tmp/modes", org.apache.spark.sql.SaveMode.Ignore)
    assert(spark.read.parquet(s"$tmp/modes").count() == 8) // ignored
    intercept[Exception] {
      IO.parquetSink(df, s"$tmp/modes", org.apache.spark.sql.SaveMode.ErrorIfExists)
    }
    IO.parquetSink(df.limit(3), s"$tmp/modes", org.apache.spark.sql.SaveMode.Append)
    assert(spark.read.parquet(s"$tmp/modes").count() == 11)
  }

  test("ORC round trip with predicate pushdown") {
    val src = IO.csvInfer(spark, res("employees.csv"))
    IO.orcSink(src, s"$tmp/orc")
    val back = IO.orc(spark, s"$tmp/orc").filter(col("salary") > 80000)
    assert(back.count() == 4)
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("salary"),
      "ORC scan must receive the pushed filter")
  }

  test("binaryFile source: whole files become binary rows (multimodal ingestion)") {
    val dir = getClass.getResource("/fixtures").getPath
    val df = IO.binaryFiles(spark, dir, glob = "*.csv")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val people = rows.find(_.getAs[String]("path").endsWith("people.csv")).get
    val content = new String(people.getAs[Array[Byte]]("content"), "UTF-8")
    assert(content.startsWith("name,city,value"))
    assert(people.getAs[Long]("length") == content.getBytes("UTF-8").length)
  }

  test("image source: decodes PNG to typed metadata + pixel binary") {
    // generate a real 8x5 PNG so the built-in image source has real input
    val img = new java.awt.image.BufferedImage(8, 5,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 8; y <- 0 until 5) img.setRGB(x, y, (x * 30) << 16 | (y * 50))
    val dir = new java.io.File(s"$tmp/images"); dir.mkdirs()
    javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, "t.png"))
    val df = IO.images(spark, dir.getAbsolutePath)
    val row = df.select("image.width", "image.height", "image.nChannels", "image.data").head
    assert(row.getInt(0) == 8 && row.getInt(1) == 5)
    assert(row.getInt(2) == 3)
    assert(row.getAs[Array[Byte]](3).length == 8 * 5 * 3)
  }

  test("JDBC round trip via embedded Derby") {
    val url = s"jdbc:derby:$tmp/derbydb;create=true"
    val src = IO.csvInfer(spark, res("employees.csv"))
    IO.jdbcWrite(src, url, "emps")
    val back = IO.jdbcRead(spark, url, "emps")
    assert(back.count() == 8)
    assert(back.agg(sum("salary")).head.get(0).toString.toLong == 624000L)
  }

  test("compaction: many small appended files → few, data identical") {
    val path = s"$tmp/compactme"
    val df = IO.csvInfer(spark, res("employees.csv"))
    // simulate streaming appends: 8 single-row writes. Delete recursively —
    // File.delete() on a non-empty dir is a silent no-op, and stale rows
    // from prior runs accumulate until ceil(n/rowsPerFile) crosses 2.
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmRf)
      f.delete(); ()
    }
    rmRf(new java.io.File(path))
    (0 until 8).foreach { i =>
      df.filter(col("salary") % 8 === i).coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(path)
    }
    val before = spark.read.parquet(path).collect().map(_.toString).sorted
    val smallFiles = new java.io.File(path).listFiles
      .count(_.getName.endsWith(".parquet"))
    val nFiles = IO.compact(spark, path, rowsPerFile = 100)
    val afterFiles = new java.io.File(path).listFiles
      .count(_.getName.endsWith(".parquet"))
    val after = spark.read.parquet(path).collect().map(_.toString).sorted
    assert(after.sameElements(before), "compaction must not change data")
    assert(nFiles == 1 && afterFiles == 1 && smallFiles > 1,
      s"expected $smallFiles small files → 1, got $afterFiles")
  }

  test("upsert: updates replace matching keys, inserts append, others intact") {
    import spark.implicits._
    val path = s"$tmp/upsertme"
    IO.csvInfer(spark, res("employees.csv"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    val updates = Seq(("ana", 35, "eng", 99000), ("zoe", 29, "eng", 85000))
      .toDF("name", "age", "department", "salary")
    IO.upsert(spark, path, updates, "name")
    val after = spark.read.parquet(path)
    assert(after.count() == 9) // 8 originals − 1 replaced + 2 upserts
    assert(after.filter(col("name") === "ana").head.getAs[Int]("salary") == 99000)
    assert(after.filter(col("name") === "zoe").count() == 1)
    assert(after.filter(col("name") === "bruno").head.getAs[Int]("salary") == 82000)
  }

  test("malformed JSON: PERMISSIVE captures corrupt rows, DROPMALFORMED skips") {
    // Real feeds carry broken lines; a scan must not abort the batch.
    val dir = new java.io.File(s"$tmp/badjson"); dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/badjson/data.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2 "v": "missing comma"}
        |{"id": 3, "v": "fine"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("_corrupt_record", StringType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$tmp/badjson")
    assert(permissive.count() == 3)
    val bad = permissive.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getString(2).contains("missing comma"))
    val dropped = spark.read
      .schema(StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
      .option("mode", "DROPMALFORMED").json(s"$tmp/badjson")
    assert(dropped.collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 3L)))
    // the packaged quarantine channel: same contract via IO.jsonTolerant.
    // (Spark refuses plans that read ONLY the corrupt column from raw
    // files — always project data columns alongside it.)
    val viaIo = IO.jsonTolerant(spark, s"$tmp/badjson",
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
      .select("id", "v", "_corrupt").collect()
    assert(viaIo.count(_.isNullAt(2)) == 2)
    assert(viaIo.filter(!_.isNullAt(2)).map(_.getString(2))
      .exists(_.contains("missing comma")),
      "quarantined line must survive verbatim for replay")
  }

  test("tolerant CSV: clean rows parse, malformed lines quarantined verbatim") {
    val dir = new java.io.File(s"$tmp/badcsv"); dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/badcsv/data.csv"),
      """id,qty
        |1,10
        |2,notanumber
        |3,30
        |""".stripMargin)
    val out = IO.csvTolerant(spark, s"$tmp/badcsv",
      StructType(Seq(StructField("id", LongType), StructField("qty", LongType))))
    val clean = out.filter(col("_corrupt").isNull)
    assert(clean.collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 3L)))
    val quarantined = out.filter(col("_corrupt").isNotNull).collect()
    assert(quarantined.length == 1 &&
      quarantined.head.getAs[String]("_corrupt") == "2,notanumber",
      s"reject must carry the raw line: ${quarantined.mkString}")
  }

  test("sorted layout: per-file key ranges disjoint, files internally sorted") {
    val out = s"$tmp/sorted_layout"
    IO.writeSortedBy(Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice"), out, "l_orderkey", nFiles = 4)
    // per-file (min, max, sorted?) straight from the written files
    val stats = spark.read.parquet(out)
      .select(col("l_orderkey"),
        input_file_name().as("f"))
      .groupBy("f").agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(stats.length > 1, "range partitioning must produce multiple files")
    assert(stats.map(_._3).sum == Tables.lineitem(spark, sf).count())
    // disjoint, ordered ranges across files — the property row-group
    // min/max skipping needs
    stats.sliding(2).foreach { case Array((_, hiA, _), (loB, _, _)) =>
      assert(hiA <= loB, s"file ranges overlap: hi=$hiA vs next lo=$loB")
    }
    // internally sorted: every file's rows are non-decreasing
    val perFile = spark.read.parquet(out)
      .select(col("l_orderkey"), input_file_name().as("f")).collect()
      .groupBy(_.getString(1))
    perFile.values.foreach { rows =>
      val ks = rows.map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), "file not internally sorted")
    }
  }

  test("ETL pipeline shape: extract → transform → load → verify (§3.2)") {
    val extracted = IO.json(spark, res("census.json"))
    val transformed = extracted.filter(col("age") > 54)
      .withColumn("total", col("males") + col("females"))
    IO.singleFileCsv(transformed, s"$tmp/etl")
    val verified = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/etl")
    assert(verified.count() == 4)
    assert(verified.filter(col("age") === 70).head.getAs[Int]("total") == 920)
  }
}
