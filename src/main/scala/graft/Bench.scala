package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // see Sessions.local: partition count should track shuffle volume;
    // the env knob is the local stand-in for that cluster-sizing rule
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Spill, don't die: by default SMJ/cartesian buffer all rows of one
      // join key on-heap (ExternalAppendOnlyUnsafeRowArray stays an
      // ArrayBuffer until this row threshold), so one hot key at a big sf
      // is an executor OOM — seen at sf10, stage-1030 smj_findNextJoinRows.
      // Past the threshold the buffer becomes an UnsafeExternalSorter,
      // which spills under memory pressure. Same setting in Sessions.local.
      .config("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "65536")
      .config("spark.sql.cartesianProductExec.buffer.in.memory.threshold", "65536")
      // 238 query executions share this JVM; ContextCleaner reclaims old
      // broadcasts/shuffles only after their weak refs are GC'd, and a
      // large heap may not GC for many queries — stale executor state
      // then inflates later queries (measured at sf10: q71 35 s in-suite
      // vs 4.3 s solo). Default periodicGC is 30min; tighten it.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup pass: JIT + codegen compilation + parquet footer caches. The
    // timed pass then measures steady-state query compute, which is what a
    // long-lived cluster session sees. Progress goes to stderr so a JVM
    // death (OOM → SparkUncaughtExceptionHandler exits) names its query.
    SparkEntry.queries.foreach { case (name, fn) =>
      System.err.println(s"BENCH_WARM $name")
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // One explicit GC between passes: the timed pass starts from a clean
    // old gen instead of inheriting the warmup's garbage.
    System.gc()
    val results = SparkEntry.queries.map { case (name, fn) =>
      System.err.println(s"BENCH_RUN $name")
      val t0 = System.nanoTime()
      // stdout stays a single JSON line; failures go to stderr so a broken
      // query is visible instead of silently benching as wall-clock-to-throw
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable => System.err.println(s"BENCH_FAIL $name: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Output layout matters: the driver's BENCH_r{N}.json retains only ~2 KB
    // of this line (r4's capture kept the tail, cutting a front-placed
    // total; r5's end-placed total survived). Per-query times are rounded
    // to ms (halves the line), and the total/metadata fields appear at BOTH
    // ends of the object — whichever end a truncated capture keeps, the
    // total is in it. Duplicate JSON keys are identical, so any
    // last-wins/first-wins parser reads the same numbers.
    def ms(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val meta = s""""n_queries":${results.size},"unit":"sec",""" +
      s""""metric":"total","value":${ms(total)}"""
    println(s"""{$meta,"queries":$qs,"sf":"$sfDir",$meta}""")
    spark.stop()
  }
}
