package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The decode kernels are STUBS (no image/audio codecs in this
  * environment) — each is a deterministic fake clearly marked below. The
  * Spark-side plumbing is real and tested: schema, partition-preserving
  * mapPartitions batches (the JVM twin of `mapInPandas` — one iterator per
  * partition, record batches in/out), and binary-safe expressions.
  *
  * At 100 TB: binary payloads ride in parquet with
  * `spark.sql.parquet.enableVectorizedReader` intact (binary columns are
  * vectorized), decode runs once per partition batch with bounded memory,
  * and metadata-only queries never touch the payload bytes thanks to
  * parquet column pruning.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, media_type: String,
                      payload: Array[Byte], width: Int, height: Int,
                      sample_rate: Int)
  case class MediaFeature(media_id: Long, media_type: String,
                          n_bytes: Int, feature_norm: Double)

  /** Build a deterministic media table from `documents` (payload = utf-8
    * bytes of text; type/width/height derived from doc_id — a stand-in for
    * real image/audio blobs with the same schema shape). */
  def mediaTable(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d).select(
      col("doc_id").as("media_id"),
      expr("element_at(array('image', 'audio', 'video'), CAST(doc_id % 3 + 1 AS INT))")
        .as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** STUB decode: a real implementation would decode the codec here.
    * Deterministic fake: "pixels" are the payload bytes. Runs per
    * partition over an iterator — the mapInPandas batch shape: no
    * per-row JVM↔kernel round trip, bounded memory per batch. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // STUB: fake "decoded" feature = L2 norm of byte values. A real
        // kernel (JNI codec / ONNX encoder) would slot in here unchanged.
        var ss = 0.0
        var i = 0
        while (i < r.payload.length) { val v = (r.payload(i) & 0xff).toDouble; ss += v * v; i += 1 }
        MediaFeature(r.media_id, r.media_type, r.payload.length, math.sqrt(ss))
      }
    }
  }

  /** STUB resize: a real implementation decodes, scales to (w, h), and
    * re-encodes. Deterministic fake: metadata updated exactly as a real
    * resize would, payload truncated proportionally — the schema flow
    * (payload + width/height rewritten together) is the real contract. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.media_type != "image") r
        else {
          val scale = math.min(1.0,
            (w.toLong * h).toDouble / (r.width.toLong * r.height))
          val nBytes = math.max(1, (r.payload.length * scale).toInt)
          r.copy(payload = java.util.Arrays.copyOf(r.payload, nBytes),
                 width = w, height = h)
        }
      }
    }
  }

  /** STUB frame sampling: every k-th "frame" (here: 16-byte stripe) of a
    * video payload — the partition/batch plumbing of real frame extraction. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video")
      .flatMap { r =>
        r.payload.grouped(16).zipWithIndex
          .filter(_._2 % everyK == 0)
          .map { case (frame, idx) => (r.media_id, idx, frame.length) }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }

  // ---------------------------------------------------------------- queries

  /** Metadata + content hash over binary payloads — expression-only
    * (octet length, sha256), never leaves codegen; oracle-checked. */
  def qBinaryMeta(spark: SparkSession, d: String): DataFrame =
    mediaTable(spark, d)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_media"),
           sum(length(col("payload"))).as("total_bytes"),
           countDistinct(sha2(col("payload"), 256)).as("n_distinct_payloads"))
      .orderBy("media_type")

  /** Stubbed decode→featurize through the typed Dataset path (rows-only
    * check; determinism + schema asserted in MultimodalSpec). */
  def qMediaFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, d).as[MediaRow]
    decodeAndFeaturize(media).toDF()
      .withColumn("feature_norm", round(col("feature_norm"), 6))
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_binary_meta"    -> (qBinaryMeta _),
    "q39_media_features" -> (qMediaFeatures _),
  )

  val oracles: Map[String, String] = Map(
    "q38_binary_meta" -> """
      SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
             WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             COUNT(*) AS n_media,
             CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
             COUNT(DISTINCT sha256(text)) AS n_distinct_payloads
      FROM documents GROUP BY 1 ORDER BY media_type""",
    // q39: stubbed kernel output — rows-only.
  )
}
