package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The IMAGE path is real: payloads are PNG bytes, decoded per partition
  * batch with JDK `javax.imageio` (no external codec jar needed) into
  * width/height/mean-channel features, and resize decodes → rescales →
  * re-encodes actual pixels. Audio/video kernels remain STUBS (no PCM/
  * video codecs in this environment) — deterministic fakes clearly marked
  * below. The Spark-side plumbing is identical for both: schema,
  * partition-preserving mapPartitions batches (the JVM twin of
  * `mapInPandas` — one iterator per partition, record batches in/out),
  * and binary-safe expressions.
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

  /** Decode output. For decoded images the dims/means come from real
    * pixels; for the stubbed audio/video path `decoded=false` and the
    * pixel fields hold the -1 sentinel. */
  case class MediaFeature(media_id: Long, media_type: String,
                          n_bytes: Int, decoded: Boolean,
                          decoded_w: Int, decoded_h: Int,
                          mean_r: Double, mean_g: Double, mean_b: Double,
                          feature_norm: Double)

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

  /** Deterministic RGB test image: channel values are fixed affine
    * functions of (media_id, x, y). PNG is lossless, so encode → decode
    * round-trips the exact pixels — fixtures and features are reproducible
    * across JVMs and partitionings. */
  private[graft] def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256).toInt
        val g = java.lang.Math.floorMod(id * 17 + x * 11 + y * 3, 256).toInt
        val b = java.lang.Math.floorMod(id * 5 + x * 23 + y * 29, 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Null-safe in-memory PNG/JPEG decode (JDK ImageIO; no disk cache —
    * executors must not touch local tmp for per-row decodes). */
  private def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }
  }

  /** Swap image rows' payloads for real (synthetic, deterministic) PNG
    * bytes with true metadata dims — the fixture generator for the real
    * decode path. Small dims keep per-row cost bounded; the decode/resize
    * kernels themselves accept any PNG/JPEG size. */
  def withRealImages(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.media_type != "image") r
      else {
        val w = (r.media_id % 24 + 8).toInt
        val h = (r.media_id % 16 + 8).toInt
        r.copy(payload = syntheticPng(r.media_id, w, h), width = w, height = h)
      }
    })
  }

  /** Decode → featurize. IMAGE rows with a decodable payload go through
    * the real kernel: JDK ImageIO decode, then per-channel pixel means and
    * the L2 norm of the (r̄, ḡ, b̄) vector. Everything else (audio/video,
    * or an image payload ImageIO rejects) takes the documented STUB path:
    * feature = L2 norm of raw byte values, pixel fields = -1 sentinel.
    * Runs per partition over an iterator — the mapInPandas batch shape: no
    * per-row JVM↔kernel round trip, bounded memory per batch. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = if (r.media_type == "image") decodeImage(r.payload) else None
        img match {
          case Some(im) =>
            val w = im.getWidth; val h = im.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = im.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            val mr = sr.toDouble / n; val mg = sg.toDouble / n; val mb = sb.toDouble / n
            MediaFeature(r.media_id, r.media_type, r.payload.length,
              decoded = true, w, h, mr, mg, mb,
              math.sqrt(mr * mr + mg * mg + mb * mb))
          case None =>
            // STUB: audio/video (no codecs in this environment) — feature
            // = L2 norm of byte values. A real kernel (JNI codec / ONNX
            // encoder) would slot in here unchanged.
            var ss = 0.0
            var i = 0
            while (i < r.payload.length) { val v = (r.payload(i) & 0xff).toDouble; ss += v * v; i += 1 }
            MediaFeature(r.media_id, r.media_type, r.payload.length,
              decoded = false, -1, -1, -1.0, -1.0, -1.0, math.sqrt(ss))
        }
      }
    }
  }

  /** Resize. Decodable image payloads take the REAL path: ImageIO decode,
    * Graphics2D bilinear rescale to (w, h), PNG re-encode — payload and
    * metadata rewritten together. Non-decodable image payloads keep the
    * documented stub (proportional truncation) so the schema contract is
    * exercised even where no codec applies; non-images pass through. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.media_type != "image") r
        else decodeImage(r.payload) match {
          case Some(im) =>
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = out.createGraphics()
            try {
              g2.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(im, 0, 0, w, h, null)
            } finally g2.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            r.copy(payload = bos.toByteArray, width = w, height = h)
          case None =>
            // STUB fallback for non-decodable payloads.
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

  /** Decode→featurize through the typed Dataset path: image rows carry
    * real PNG payloads and are decoded with ImageIO (pixel-derived dims +
    * channel means); audio/video take the stub path. Rows-only check —
    * decode correctness against known fixtures asserted in MultimodalSpec. */
  def qMediaFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val media = withRealImages(mediaTable(spark, d).as[MediaRow])
    decodeAndFeaturize(media).toDF()
      .withColumn("feature_norm", round(col("feature_norm"), 6))
      .withColumn("mean_r", round(col("mean_r"), 6))
      .withColumn("mean_g", round(col("mean_g"), 6))
      .withColumn("mean_b", round(col("mean_b"), 6))
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
