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
  * re-encodes actual pixels. The AUDIO path is real too: payloads are
  * WAV/PCM bytes decoded with JDK `javax.sound.sampled` into frame count,
  * sample rate, and RMS amplitude. Only the VIDEO kernel remains a STUB
  * (no video codec ships with the JDK) — a deterministic fake clearly
  * marked below. The Spark-side plumbing is identical for all three:
  * schema, partition-preserving mapPartitions batches (the JVM twin of
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

  /** Decode output. Images fill decoded_w/h + channel means from real
    * pixels; audio fills n_frames/sample_rate_hz/rms from real PCM frames;
    * the stubbed video path sets `decoded=false`. Fields that don't apply
    * to a modality hold the -1 sentinel. */
  case class MediaFeature(media_id: Long, media_type: String,
                          n_bytes: Int, decoded: Boolean,
                          decoded_w: Int, decoded_h: Int,
                          mean_r: Double, mean_g: Double, mean_b: Double,
                          n_frames: Long, sample_rate_hz: Int, rms: Double,
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

  /** Deterministic mono 16-bit PCM WAV: a sine whose frequency/amplitude
    * are fixed functions of media_id. WAV is lossless PCM, so encode →
    * decode round-trips the exact samples. */
  private[graft] def syntheticWav(id: Long, nFrames: Int, rate: Int): Array[Byte] = {
    val freq = 200.0 + (id % 17) * 40.0
    val amp = 0.25 + (id % 5) * 0.1
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767.0).toInt.toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** In-memory WAV/PCM decode (JDK javax.sound — no codec jar): frame
    * count, sample rate, RMS amplitude normalized to [0,1]. Restricted to
    * the 16-bit mono little-endian shape this pipeline writes; anything
    * else (or a non-WAV payload) returns None → stub path. */
  private def decodeAudio(payload: Array[Byte]): Option[(Long, Int, Double)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var ss = 0.0
          var i = 0
          while (i < n) {
            val s = (((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)).toShort
              .toDouble) / 32768.0
            ss += s * s; i += 1
          }
          Some((n.toLong, fmt.getSampleRate.toInt,
            if (n == 0) 0.0 else math.sqrt(ss / n)))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

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

  /** Swap audio rows' payloads for real (synthetic, deterministic) WAV
    * bytes with true sample-rate metadata. */
  def withRealAudio(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.media_type != "audio") r
      else {
        val rate = 8000
        r.copy(payload = syntheticWav(r.media_id, (r.media_id % 1600 + 400).toInt, rate),
               sample_rate = rate)
      }
    })
  }

  /** Real payloads for every decodable modality (image PNGs + audio WAVs;
    * video keeps the text-byte stand-in for its stub path). */
  def withRealMedia(media: Dataset[MediaRow]): Dataset[MediaRow] =
    withRealAudio(withRealImages(media))

  /** Decode → featurize. IMAGE rows decode with JDK ImageIO into pixel
    * dims + per-channel means (+ the L2 norm of (r̄, ḡ, b̄) as
    * feature_norm). AUDIO rows decode with JDK javax.sound into frame
    * count, sample rate, and RMS amplitude (feature_norm = rms). VIDEO
    * rows — and any payload the decoders reject — take the documented
    * STUB path: feature = L2 norm of raw byte values, typed fields = -1
    * sentinel. Runs per partition over an iterator — the mapInPandas
    * batch shape: no per-row JVM↔kernel round trip, bounded memory. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._

    def stub(r: MediaRow): MediaFeature = {
      // STUB: video (no codec in the JDK) or undecodable payloads —
      // feature = L2 norm of byte values. A real kernel (JNI codec /
      // ONNX encoder) would slot in here unchanged.
      var ss = 0.0
      var i = 0
      while (i < r.payload.length) { val v = (r.payload(i) & 0xff).toDouble; ss += v * v; i += 1 }
      MediaFeature(r.media_id, r.media_type, r.payload.length,
        decoded = false, -1, -1, -1.0, -1.0, -1.0, -1L, -1, -1.0, math.sqrt(ss))
    }

    media.mapPartitions { rows =>
      rows.map { r =>
        r.media_type match {
          case "image" => decodeImage(r.payload) match {
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
                decoded = true, w, h, mr, mg, mb, -1L, -1, -1.0,
                math.sqrt(mr * mr + mg * mg + mb * mb))
            case None => stub(r)
          }
          case "audio" => decodeAudio(r.payload) match {
            case Some((frames, rate, rms)) =>
              MediaFeature(r.media_id, r.media_type, r.payload.length,
                decoded = true, -1, -1, -1.0, -1.0, -1.0, frames, rate, rms, rms)
            case None => stub(r)
          }
          case _ => stub(r)
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
    * real PNG payloads decoded with ImageIO (pixel-derived dims + channel
    * means), audio rows real WAV payloads decoded with javax.sound
    * (frames / rate / RMS); video takes the stub path. Rows-only check —
    * decode correctness against known fixtures asserted in MultimodalSpec. */
  def qMediaFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val media = withRealMedia(mediaTable(spark, d).as[MediaRow])
    decodeAndFeaturize(media).toDF()
      .withColumn("feature_norm", round(col("feature_norm"), 6))
      .withColumn("mean_r", round(col("mean_r"), 6))
      .withColumn("mean_g", round(col("mean_g"), 6))
      .withColumn("mean_b", round(col("mean_b"), 6))
      .withColumn("rms", round(col("rms"), 6))
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
