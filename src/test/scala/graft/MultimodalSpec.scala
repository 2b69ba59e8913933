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
    val media = Multimodal.withRealImages(
      Multimodal.mediaTable(spark, sf).as[Multimodal.MediaRow])
    val a = Multimodal.decodeAndFeaturize(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeAndFeaturize(media.repartition(7)).collect().sortBy(_.media_id)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && math.abs(x.feature_norm - y.feature_norm) < 1e-9
    }, "featurize must be partition-invariant")
    assert(a.forall(_.n_bytes > 0))
    // every image row decodes for real; audio/video stay on the stub path
    a.foreach { f =>
      if (f.media_type == "image")
        assert(f.decoded && f.decoded_w > 0 && f.decoded_h > 0)
      else assert(!f.decoded && f.decoded_w == -1)
    }
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
}
