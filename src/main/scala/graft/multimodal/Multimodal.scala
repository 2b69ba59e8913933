package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * All three modality kernels are REAL, using only JDK codecs (no
  * external jar): IMAGE payloads are PNG bytes decoded per partition
  * batch with `javax.imageio` into width/height/mean-channel features,
  * and resize decodes → rescales → re-encodes actual pixels; AUDIO
  * payloads are WAV/PCM bytes decoded with `javax.sound.sampled` into
  * frame count, sample rate, and RMS amplitude; VIDEO payloads are
  * animated GIFs — the one motion format the JDK ships a codec for —
  * decoded frame-by-frame with the multi-image `ImageReader` into frame
  * count, frame dims, and cross-frame channel means, with real every-k-th
  * frame extraction to standalone PNGs ([[sampleFrames]]). Payloads in
  * codec-blocked formats (MP4/H.264 etc. — nothing in this sandbox can
  * decode them) fall back to a clearly-marked byte-level stub so the
  * schema contract still holds. The Spark-side plumbing is identical for
  * all three: schema, partition-preserving mapPartitions batches (the JVM
  * twin of `mapInPandas` — one iterator per partition, record batches
  * in/out), and binary-safe expressions.
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
    * video fills decoded_w/h + n_frames + cross-frame channel means from
    * real GIF frames; undecodable payloads set `decoded=false`. Fields
    * that don't apply to a modality hold the -1 sentinel. */
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
    // Without this, ImageIO.write(…, OutputStream) wraps the sink in a
    // FileCacheImageOutputStream — a temp FILE per encoded row on executor
    // local disk (the decode paths already disable it; static, idempotent).
    javax.imageio.ImageIO.setUseCache(false)
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

  /** The javax.sound SPI providers, resolved ONCE per JVM. Every
    * `AudioSystem.write` / `getAudioInputStream` call re-scans the
    * provider ServiceLoader under the GLOBAL `JSSecurityManager` class
    * lock (jstack on the q39 stage: 30 of 32 executor threads BLOCKED on
    * that monitor, stage run 225 s vs 21.5 s cpu — the audio third of the
    * corpus serialized the whole stage). Holding the provider instances
    * (stateless, thread-safe) and dispatching directly is what
    * AudioSystem does after its scan, minus the per-row scan and lock. */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    // SoftMidiAudioFileReader precedes the WAV reader in provider order
    // and its accept probe runs a MidiSystem provider scan under the same
    // global JSSecurityManager lock (second jstack round: 30/32 executor
    // threads re-blocked there). Audio-format magics are disjoint, so
    // first-accept dispatch is order-independent on results — sink the
    // Midi readers to the tail and WAV payloads never reach them.
    val (midi, rest) = b.result().partition(_.getClass.getName.contains("Midi"))
    rest ++ midi
  }
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        found = w
    }
    require(found != null, "no WAVE AudioFileWriter on this JVM")
    found
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
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** In-memory WAV/PCM decode (JDK javax.sound — no codec jar): frame
    * count, sample rate, RMS amplitude normalized to [0,1]. Restricted to
    * the 16-bit mono little-endian shape this pipeline writes; anything
    * else (or a non-WAV payload) returns None → stub path. */
  private def decodeAudio(payload: Array[Byte]): Option[(Long, Int, Double)] =
    try {
      // First provider that accepts wins — AudioSystem.getAudioInputStream's
      // own dispatch rule, run over the cached provider list (see
      // [[audioReaders]]); each gets a fresh stream so a rejecting
      // provider cannot disturb the next one's read position.
      val ais = audioReaders.iterator
        .flatMap { rd =>
          try Iterator.single(rd.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload)))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException =>
              Iterator.empty
          }
        }
        .nextOption()
        .getOrElse(throw new javax.sound.sampled.UnsupportedAudioFileException(
          "no provider accepted the payload"))
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

  /** Deterministic animated GIF: nFrames solid-color frames whose RGB is a
    * fixed affine function of (media_id, frame). Solid frames use one
    * palette entry each, so GIF's 256-color quantization is LOSSLESS here —
    * encode → decode round-trips the exact channel values, which is what
    * lets the spec assert decoded features exactly. */
  private[graft] def syntheticGif(id: Long, w: Int, h: Int,
                                  nFrames: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (frameChannel(id, f, 31).toInt << 16) |
                  (frameChannel(id, f, 17).toInt << 8) |
                  frameChannel(id, f, 5).toInt
        val g2 = img.createGraphics()
        try {
          g2.setColor(new java.awt.Color(rgb))
          g2.fillRect(0, 0, w, h)
        } finally g2.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Channel value of frame f: the spec recomputes this to assert exact
    * decoded means. */
  private[graft] def frameChannel(id: Long, f: Int, mult: Long): Long =
    java.lang.Math.floorMod(id * mult + f * 59L, 256L)

  /** In-memory multi-frame decode (JDK ImageIO GIF reader — the one motion
    * format the JDK ships a codec for; MP4/H.264 et al. stay environment-
    * blocked). Returns all frames; None for payloads no reader accepts. */
  private def decodeVideoFrames(
      payload: Array[Byte]): Option[IndexedSeq[java.awt.image.BufferedImage]] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n).map(reader.read(_)))
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case _: Exception => None }

  /** Mean RGB of one frame. */
  private def frameMeans(im: java.awt.image.BufferedImage): (Double, Double, Double) = {
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
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
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

  /** Swap video rows' payloads for real (synthetic, deterministic)
    * animated-GIF bytes with true frame dims. */
  def withRealVideo(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.media_type != "video") r
      else {
        val w = (r.media_id % 16 + 8).toInt
        val h = (r.media_id % 12 + 8).toInt
        val nFrames = (r.media_id % 6 + 4).toInt
        r.copy(payload = syntheticGif(r.media_id, w, h, nFrames),
               width = w, height = h)
      }
    })
  }

  /** Real payloads for every modality the JDK can decode: image PNGs,
    * audio WAVs, video animated GIFs. */
  def withRealMedia(media: Dataset[MediaRow]): Dataset[MediaRow] =
    withRealVideo(withRealAudio(withRealImages(media)))

  /** Decode → featurize. IMAGE rows decode with JDK ImageIO into pixel
    * dims + per-channel means (+ the L2 norm of (r̄, ḡ, b̄) as
    * feature_norm). AUDIO rows decode with JDK javax.sound into frame
    * count, sample rate, and RMS amplitude (feature_norm = rms). VIDEO
    * rows decode with the JDK's multi-frame GIF reader into frame count,
    * frame dims, and channel means averaged across frames. Any payload
    * the decoders reject takes the documented STUB path: feature = L2
    * norm of raw byte values, typed fields = -1 sentinel (a JNI codec /
    * ONNX encoder for the non-JDK formats would slot in there unchanged).
    * Runs per partition over an iterator — the mapInPandas batch shape:
    * no per-row JVM↔kernel round trip, bounded memory. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._

    def stub(r: MediaRow): MediaFeature = {
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
              val (mr, mg, mb) = frameMeans(im)
              MediaFeature(r.media_id, r.media_type, r.payload.length,
                decoded = true, im.getWidth, im.getHeight, mr, mg, mb, -1L, -1, -1.0,
                math.sqrt(mr * mr + mg * mg + mb * mb))
            case None => stub(r)
          }
          case "audio" => decodeAudio(r.payload) match {
            case Some((frames, rate, rms)) =>
              MediaFeature(r.media_id, r.media_type, r.payload.length,
                decoded = true, -1, -1, -1.0, -1.0, -1.0, frames, rate, rms, rms)
            case None => stub(r)
          }
          case "video" => decodeVideoFrames(r.payload) match {
            case Some(frames) =>
              val per = frames.map(frameMeans)
              val n = frames.length
              val mr = per.map(_._1).sum / n
              val mg = per.map(_._2).sum / n
              val mb = per.map(_._3).sum / n
              MediaFeature(r.media_id, r.media_type, r.payload.length,
                decoded = true, frames.head.getWidth, frames.head.getHeight,
                mr, mg, mb, n.toLong, -1, -1.0,
                math.sqrt(mr * mr + mg * mg + mb * mb))
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

  /** REAL frame sampling: decode the multi-frame payload (JDK GIF reader),
    * keep every k-th frame, re-encode each kept frame as a standalone PNG —
    * the "video → training images" extraction step. Payloads no reader
    * accepts fall back to the byte-stripe stub so the schema contract
    * holds for codec-blocked formats. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video")
      .flatMap { r =>
        decodeVideoFrames(r.payload) match {
          case Some(frames) =>
            frames.zipWithIndex
              .filter(_._2 % everyK == 0)
              .map { case (im, idx) =>
                val rgb = new java.awt.image.BufferedImage(
                  im.getWidth, im.getHeight,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g2 = rgb.createGraphics()
                try g2.drawImage(im, 0, 0, null) finally g2.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(rgb, "png", bos)
                (r.media_id, idx, bos.toByteArray)
              }
          case None =>
            r.payload.grouped(16).zipWithIndex
              .filter(_._2 % everyK == 0)
              .map { case (stripe, idx) => (r.media_id, idx, stripe) }
              .toSeq
        }
      }
      .toDF("media_id", "frame_idx", "frame_png")
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
    * (frames / rate / RMS), video rows real animated-GIF payloads decoded
    * frame-by-frame (frame count / dims / cross-frame means). Raw per-row
    * shape; decode correctness against known fixtures is asserted in
    * MultimodalSpec. */
  def mediaFeatures(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val base = mediaTable(spark, d).as[MediaRow]
    // Synthesis + decode are codec-bound (ms/row, not µs/row), so unlike
    // the columnar queries this stage cannot live with the source's file
    // parallelism: a small-sf documents parquet yields 4 tasks and leaves
    // the rest of the machine idle through the most CPU-dense stage in the
    // suite. Fan the PRE-synthesis frame (payload still the small text
    // bytes) out to core count when the source gives fewer partitions —
    // the moved bytes are trivial next to the per-row codec work, and at
    // scale (input splits ≥ cores) the branch is a no-op. The groupBy
    // above this re-shuffles anyway, so results are unchanged.
    val par = spark.sparkContext.defaultParallelism
    val fanned = if (base.rdd.getNumPartitions < par) base.repartition(par) else base
    val media = withRealMedia(fanned)
    decodeAndFeaturize(media).toDF()
      .withColumn("feature_norm", round(col("feature_norm"), 6))
      .withColumn("mean_r", round(col("mean_r"), 6))
      .withColumn("mean_g", round(col("mean_g"), 6))
      .withColumn("mean_b", round(col("mean_b"), 6))
      .withColumn("rms", round(col("rms"), 6))
      .orderBy("media_id")
  }

  /** q39, oracle-checkable form (the q69 exactness-contract pattern): the
    * decoded feature VALUES are codec outputs DuckDB cannot recompute,
    * but the decode-health accounting is deterministic — every synthetic
    * payload is a real PNG/WAV/GIF, so per modality the row count must
    * match the corpus partition AND every payload must decode through the
    * REAL codec path (`decoded = true`; a silent fall-through to the byte
    * stub flips `all_decoded` and fails the hash compare). The decode
    * work still runs in full — this aggregates [[mediaFeatures]]. */
  def qMediaFeatures(spark: SparkSession, d: String): DataFrame =
    mediaFeatures(spark, d)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_media"),
        min(col("decoded")).as("all_decoded"))
      .orderBy("media_type")

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
    // q39: decode-health contract — codec outputs aren't SQL-recomputable,
    // but the per-modality counts and the all-decoded boolean are.
    "q39_media_features" -> """
      SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
             WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             COUNT(*) AS n_media, TRUE AS all_decoded
      FROM documents GROUP BY 1 ORDER BY media_type""")
}
