package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mediaDf = {
    val rows = Seq(
      Row("img1", "image", Array[Byte](1, 2, 3, 4), Row(640, 480, "png", null, null)),
      Row("img2", "image", Array[Byte](9, 9, 9), Row(100, 2000, "jpg", null, null)),
      Row("vid1", "video", Array[Byte](5, 6, 7), Row(1920, 1080, "mp4", 10000L, 30.0)),
      Row("aud1", "audio", Array[Byte](8), Row(null, null, "wav", 5000L, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("feature extraction is deterministic per content, batched per partition") {
    val f1 = Multimodal.extractFeatures(spark, mediaDf, dim = 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, mediaDf, dim = 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.keySet == Set("img1", "img2", "vid1", "aud1"))
    assert(f1("img1") != f1("img2"))
    assert(f1.values.forall(_.length == 16))
  }

  test("frame sampling: evenly spaced frames for videos only") {
    val frames = Multimodal.sampleFrames(mediaDf, nFrames = 5).collect()
    assert(frames.length == 5)
    assert(frames.map(_.getAs[String]("media_id")).toSet == Set("vid1"))
    val ts = frames.map(_.getAs[Long]("frame_ts_ms")).sorted
    assert(ts.sameElements(Array(0L, 2000L, 4000L, 6000L, 8000L)))
  }

  test("resize metadata: aspect-preserving downscale, no upscale") {
    val r = Multimodal.resizeMeta(mediaDf, maxDim = 320).collect()
      .map(x => x.getAs[String]("media_id") ->
        (x.getAs[Integer]("target_width"), x.getAs[Integer]("target_height"))).toMap
    assert(r("img1") == ((320, 240)))
    assert(r("img2") == ((16, 320)))
    assert(r("vid1") == ((320, 180)))
  }
}
