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

  test("perceptualHash: 64-bit signature; one changed cell moves one bit; empty hashes to zeros") {
    // 64-byte payloads: cell i IS byte i (i·64/64 = i), so cells are
    // controlled directly. Five bright cells over a dim floor — strict
    // integer mean test puts exactly the bright cells above threshold.
    def payload(bright: Seq[Int]): Array[Byte] =
      Array.tabulate[Byte](64)(i => if (bright.contains(i)) 200.toByte else 10)
    val recs = Seq(
      MediaRecord(1L, "image", payload(Seq(0, 1, 2, 3, 4))),
      MediaRecord(2L, "image", payload(Seq(0, 1, 2, 3, 4))),      // exact dup
      MediaRecord(3L, "image", payload(Seq(0, 1, 2, 3, 4, 60))),  // one more bright cell
      MediaRecord(4L, "image", Array.emptyByteArray)
    ).toDS()
    val sigs = perceptualHash(recs).collect().map(s => s.id -> s.sig).toMap
    assert(sigs.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(sigs(1L) == sigs(2L), "identical payloads must hash identically")
    assert(sigs(1L).zip(sigs(3L)).count { case (a, b) => a != b } == 1,
      "one changed cell must move exactly one bit here")
    assert(sigs(4L) == "0" * 64, "empty payload hashes to all-zero bits")
  }

  test("phashPairs: exact dups at ham 0, near dup found via pigeonhole, guard refuses degenerate buckets") {
    def payload(bright: Seq[Int]): Array[Byte] =
      Array.tabulate[Byte](64)(i => if (bright.contains(i)) 200.toByte else 10)
    val recs = Seq(
      MediaRecord(1L, "image", payload(Seq(0, 1, 2, 3, 4))),
      MediaRecord(2L, "image", payload(Seq(0, 1, 2, 3, 4))),
      MediaRecord(3L, "image", payload(Seq(0, 1, 2, 3, 4, 60))),
      MediaRecord(4L, "image", payload(Seq(30, 31, 32, 33, 34)))  // far from the others
    ).toDS()
    val sigs = perceptualHash(recs).toDF()
    val pairs = phashPairs(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0, "exact duplicate must confirm at Hamming 0")
    assert(pairs((1L, 3L)) == 1 && pairs((2L, 3L)) == 1,
      "a 1-bit neighbor is pigeonhole-guaranteed at threshold 3")
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "the far signature must not pair")
    intercept[IllegalArgumentException] {
      phashPairs(sigs, maxHamming = 3, maxBucketRows = 2)
    }
  }

  test("phashPairs blocked: pairs are the unblocked set restricted to same-block, and buckets shrink") {
    def payload(bright: Seq[Int]): Array[Byte] =
      Array.tabulate[Byte](64)(i => if (bright.contains(i)) 200.toByte else 10)
    import org.apache.spark.sql.functions._
    val recs = Seq(
      (1L, payload(Seq(0, 1, 2)), 0L), (2L, payload(Seq(0, 1, 2)), 0L),
      (3L, payload(Seq(0, 1, 2)), 1L)    // same signature, OTHER block
    ).map { case (id, p, blk) => (MediaRecord(id, "image", p), blk) }
    val sigs = perceptualHash(recs.map(_._1).toDS()).toDF()
      .join(recs.map(t => (t._1.id, t._2)).toDF("id", "blk"), "id")
    val unblocked = phashPairs(sigs, maxHamming = 3)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = phashPairs(sigs, maxHamming = 3, blockCol = Some("blk"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unblocked == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(blocked == Set((1L, 2L)),
      s"cross-block pairs must vanish under the block key: $blocked")
    // the hot-bucket guard now sees per-(slice, block) occupancy: the
    // 3-row degenerate bucket splits 2/1 and a cap of 2 passes
    phashPairs(sigs, maxHamming = 3, maxBucketRows = 2,
      blockCol = Some("blk")).collect()
  }

  test("phashPairs maxSliceDf: generic slices drop; pairs survive via their distinctive slice") {
    def payload(bright: Seq[Int]): Array[Byte] =
      Array.tabulate[Byte](64)(i => if (bright.contains(i)) 200.toByte else 10)
    val recs = Seq(
      MediaRecord(1L, "image", payload(Seq(0, 1, 2, 3, 4))),
      MediaRecord(2L, "image", payload(Seq(0, 1, 2, 3, 4))),
      MediaRecord(3L, "image", payload(Seq(0, 1, 2, 3, 4, 60)))
    ).toDS()
    val sigs = perceptualHash(recs).toDF()
    // slices 0..2 are shared by ALL THREE (occupancy 3 > cap) and drop;
    // slice 3 still holds {1,2} (occupancy 2) — the exact-dup pair
    // survives through its distinctive slice, the (1,3)/(2,3) pairs
    // whose ONLY shared slices were generic are the documented loss
    val capped = phashPairs(sigs, maxHamming = 3, maxSliceDf = Some(2L))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"got $capped")
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
