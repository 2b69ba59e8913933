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
    val media = Multimodal.mediaTable(spark, sf).as[Multimodal.MediaRow]
    val a = Multimodal.decodeAndFeaturize(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeAndFeaturize(media.repartition(7)).collect().sortBy(_.media_id)
    assert(a.length == b.length && a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && math.abs(x.feature_norm - y.feature_norm) < 1e-9
    }, "featurize must be partition-invariant")
    assert(a.forall(_.n_bytes > 0))
  }

  test("resize stub rewrites payload and metadata together, images only") {
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
