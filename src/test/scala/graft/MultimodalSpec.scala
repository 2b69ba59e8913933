package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table has the binary schema and deterministic types") {
    val df = Multimodal.mediaTable(spark, sf)
    val schema = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("media_type") == "string")
    assert(df.select("media_type").distinct().count() == 3)
  }

  test("decode→featurize runs per-partition and is deterministic") {
    val media = Multimodal.withRealMedia(
      Multimodal.mediaTable(spark, sf).as[Multimodal.MediaRow])
    val a = Multimodal.decodeAndFeaturize(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeAndFeaturize(media.repartition(7)).collect().sortBy(_.media_id)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && math.abs(x.feature_norm - y.feature_norm) < 1e-9
    }, "featurize must be partition-invariant")
    assert(a.forall(_.n_bytes > 0))
    // every modality decodes for real (PNG / WAV / animated GIF)
    a.foreach { f =>
      f.media_type match {
        case "image" => assert(f.decoded && f.decoded_w > 0 && f.decoded_h > 0)
        case "audio" => assert(f.decoded && f.n_frames > 0 &&
          f.sample_rate_hz == 8000 && f.rms > 0.0 && f.rms < 1.0)
        case "video" => assert(f.decoded && f.decoded_w > 0 &&
          f.n_frames == f.media_id % 6 + 4)
      }
    }
  }

  test("audio decode recovers the exact PCM frames of a known fixture") {
    // fixture: media_id=4 → 804-frame 8 kHz sine. Recompute the expected
    // RMS straight from the generator formula (WAV is lossless PCM ⇒ the
    // decoded samples must match sample-for-sample).
    val id = 4L; val rate = 8000; val nFrames = (id % 1600 + 400).toInt
    val freq = 200.0 + (id % 17) * 40.0
    val amp = 0.25 + (id % 5) * 0.1
    var ss = 0.0
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767.0).toInt.toShort
      val v = s.toDouble / 32768.0
      ss += v * v
    }
    val expectedRms = math.sqrt(ss / nFrames)
    val row = Multimodal.MediaRow(id, "audio",
      Multimodal.syntheticWav(id, nFrames, rate), 0, 0, rate)
    val f = Multimodal.decodeAndFeaturize(Seq(row).toDS()).collect().head
    assert(f.decoded && f.n_frames == nFrames && f.sample_rate_hz == rate)
    assert(math.abs(f.rms - expectedRms) < 1e-12,
      s"rms ${f.rms} != expected $expectedRms from the generator formula")
  }

  test("cached javax.sound providers match AudioSystem byte-for-byte and share its accept set") {
    // syntheticWav/decodeAudio dispatch to SPI providers cached once per
    // JVM instead of AudioSystem's per-call provider scan (which holds a
    // global lock — BENCHMARKS.md r13 q39). Pin that the cached path is
    // the same computation: identical encoded bytes, and the same
    // accept/reject decisions on WAV vs non-audio payloads.
    val id = 11L; val rate = 8000; val nFrames = 500
    val cached = Multimodal.syntheticWav(id, nFrames, rate)
    // reference encode through the AudioSystem front door, same PCM
    val freq = 200.0 + (id % 17) * 40.0
    val amp = 0.25 + (id % 5) * 0.1
    val data = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767.0).toInt.toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(java.util.Arrays.equals(cached, bos.toByteArray),
      "provider-cached WAV encode must be byte-identical to AudioSystem.write")
    // accept set: the WAV decodes through the real path; a payload
    // AudioSystem rejects (plain text) takes the stub, same as before
    val rows = Seq(
      Multimodal.MediaRow(id, "audio", cached, 0, 0, rate),
      Multimodal.MediaRow(id + 1, "audio", "not audio".getBytes("UTF-8"), 0, 0, rate))
    val out = Multimodal.decodeAndFeaturize(rows.toDS()).collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).n_frames == nFrames && out(0).sample_rate_hz == rate)
    assert(!out(1).decoded && out(1).feature_norm > 0.0)
  }

  test("image decode extracts the exact pixels of a known fixture") {
    // fixture: media_id=3 → 11x11 synthetic PNG. Recompute the expected
    // channel means straight from the generator formula (lossless PNG
    // round-trip ⇒ the decoded means must match exactly).
    val id = 3L; val w = (id % 24 + 8).toInt; val h = (id % 16 + 8).toInt
    def mean(ka: Long, kx: Int, ky: Int): Double = {
      var s = 0L
      for (y <- 0 until h; x <- 0 until w)
        s += java.lang.Math.floorMod(id * ka + x * kx + y * ky, 256)
      s.toDouble / (w.toLong * h)
    }
    val row = Multimodal.MediaRow(id, "image",
      Multimodal.syntheticPng(id, w, h), w, h, 16000)
    val f = Multimodal.decodeAndFeaturize(
      Seq(row).toDS()).collect().head
    assert(f.decoded && f.decoded_w == w && f.decoded_h == h)
    assert(math.abs(f.mean_r - mean(31, 7, 13)) < 1e-12, "mean_r from real pixels")
    assert(math.abs(f.mean_g - mean(17, 11, 3)) < 1e-12, "mean_g from real pixels")
    assert(math.abs(f.mean_b - mean(5, 23, 29)) < 1e-12, "mean_b from real pixels")
  }

  test("real resize: decoded output has the target dims and real pixels") {
    val media = Multimodal.withRealImages(
      Multimodal.mediaTable(spark, sf).as[Multimodal.MediaRow]).limit(30)
    val resized = Multimodal.resizeImages(media, 6, 5).collect()
      .filter(_.media_type == "image")
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.width == 6 && r.height == 5)
      val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(im != null && im.getWidth == 6 && im.getHeight == 5,
        "resized payload must be a decodable 6x5 image")
    }
  }

  test("resize stub fallback rewrites payload and metadata together") {
    // raw mediaTable image payloads are text bytes — not decodable — so
    // the documented stub path (truncate + metadata rewrite) applies.
    val media = Multimodal.mediaTable(spark, sf).as[Multimodal.MediaRow]
    val resized = Multimodal.resizeImages(media, 64, 64).collect()
    val orig = media.collect().map(r => r.media_id -> r).toMap
    resized.foreach { r =>
      if (r.media_type == "image") {
        assert(r.width == 64 && r.height == 64)
        assert(r.payload.length <= orig(r.media_id).payload.length)
      } else assert(r.width == orig(r.media_id).width, "non-images untouched")
    }
  }

  test("frame sampling yields every k-th frame of video payloads only") {
    val media = Multimodal.mediaTable(spark, sf).as[Multimodal.MediaRow]
    val frames = Multimodal.sampleFrames(media, everyK = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(1) % 2 == 0))
  }

  test("video decode recovers the exact frames of a known GIF fixture") {
    // fixture: media_id=5 → 13x9, 9 solid-color frames. Solid frames use
    // one palette slot each ⇒ GIF quantization is lossless ⇒ decoded
    // channel means must equal the generator formula exactly.
    val id = 5L
    val w = (id % 16 + 8).toInt; val h = (id % 12 + 8).toInt
    val nFrames = (id % 6 + 4).toInt
    def mean(mult: Long): Double =
      (0 until nFrames).map(f => Multimodal.frameChannel(id, f, mult).toDouble)
        .sum / nFrames
    val row = Multimodal.MediaRow(id, "video",
      Multimodal.syntheticGif(id, w, h, nFrames), w, h, 16000)
    val f = Multimodal.decodeAndFeaturize(Seq(row).toDS()).collect().head
    assert(f.decoded && f.decoded_w == w && f.decoded_h == h)
    assert(f.n_frames == nFrames)
    assert(math.abs(f.mean_r - mean(31)) < 1e-12, "mean_r from real frames")
    assert(math.abs(f.mean_g - mean(17)) < 1e-12, "mean_g from real frames")
    assert(math.abs(f.mean_b - mean(5)) < 1e-12, "mean_b from real frames")
  }

  test("real frame extraction: sampled frames are standalone decodable PNGs") {
    val media = Multimodal.withRealMedia(
      Multimodal.mediaTable(spark, sf).as[Multimodal.MediaRow])
    val vids = media.filter(_.media_type == "video").collect()
      .map(r => r.media_id -> r).toMap
    assert(vids.nonEmpty)
    val frames = Multimodal.sampleFrames(media, everyK = 2).collect()
    // every-k-th: per video, count == ceil(nFrames / 2)
    val perVid = frames.groupBy(_.getLong(0))
    perVid.foreach { case (id, fs) =>
      val nFrames = (id % 6 + 4).toInt
      assert(fs.length == (nFrames + 1) / 2, s"video $id frame count")
      fs.foreach { f =>
        assert(f.getInt(1) % 2 == 0)
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.getAs[Array[Byte]](2)))
        assert(im != null && im.getWidth == vids(id).width &&
          im.getHeight == vids(id).height,
          "extracted frame must be a standalone PNG with the video's dims")
        // solid frame: top-left pixel IS the frame color from the generator
        val p = im.getRGB(0, 0)
        val fIdx = f.getInt(1)
        assert(((p >> 16) & 0xff) == Multimodal.frameChannel(id, fIdx, 31).toInt)
        assert(((p >> 8) & 0xff) == Multimodal.frameChannel(id, fIdx, 17).toInt)
        assert((p & 0xff) == Multimodal.frameChannel(id, fIdx, 5).toInt)
      }
    }
  }
}
