package graft

import org.apache.spark.sql.SparkSession

/** Session factory (reference shape: src/common/spark_session.py:94-152).
  *
  * local[N] with shuffle.partitions=N (not the 200 default — reference
  * makes the same adjustment at src/common/spark_session.py:141), UTC,
  * AQE on. On a real cluster the same builder takes master from
  * spark-submit; nothing here is local-mode-specific except the default.
  */
object Sessions {
  def local(appName: String = "graft",
            cores: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata parquet carries naive (isAdjustedToUTC=false) timestamps;
      // read them as UTC instants (TIMESTAMP), not TIMESTAMP_NTZ, so
      // unix_micros/window arithmetic and the DuckDB oracle line up
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
