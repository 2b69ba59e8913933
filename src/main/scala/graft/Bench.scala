package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup pass: JIT + codegen compilation + parquet footer caches. The
    // timed pass then measures steady-state query compute, which is what a
    // long-lived cluster session sees.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
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
