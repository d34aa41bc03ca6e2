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
}
