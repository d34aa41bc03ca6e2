package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  test("featurize: binary payloads → typed features via mapPartitions") {
    val recs = Seq(
      MediaRecord(1L, "image", Array.fill[Byte](650)(1)),
      MediaRecord(2L, "audio", Array[Byte](1, 2, 3))
    ).toDS()
    val f = featurize(recs).collect().sortBy(_.id)
    assert(f(0).byte_len == 650L && f(0).width == 10 && f(0).height == 170)
    assert(f(0).n_frames == 650 % 30 + 1)
    assert(f(1).content_md5 == MediaFeaturizer.md5Hex(Array[Byte](1, 2, 3)))
  }

  test("sampleFrameIndexes: stride-2 fan-out of video frames") {
    val recs = Seq(MediaRecord(7L, "video", Array.fill[Byte](35)(0))).toDS()
    val idx = sampleFrameIndexes(featurize(recs).toDF(), stride = 2)
      .collect().map(_.getInt(1)).toSeq
    assert(idx == (0 until 35 % 30 + 1 by 2).toSeq) // n_frames=6 → 0,2,4
  }

  test("resizeTo: aspect-preserving fit, never upscales") {
    val recs = Seq(
      MediaRecord(1L, "image", Array.fill[Byte](1290)(1)), // decodes 10×330
      MediaRecord(2L, "image", Array.fill[Byte](645)(1))   // decodes 5×165
    ).toDS()
    val r = resizeTo(recs, maxW = 64, maxH = 64).collect().sortBy(_.id)
    // 10×330 → scale 64/330; width floors but stays ≥1
    assert(r(0).height == 64 && r(0).width == (10 * 64.0 / 330).toInt.max(1))
    assert(r(0).scale == 64.0 / 330)
    // 5×165 → scale 64/165 < 1 (fit), not upscaled beyond original
    assert(r(1).height == 64 && r(1).scale < 1.0)
    assert(r.forall(_.scale <= 1.0))
  }
}
