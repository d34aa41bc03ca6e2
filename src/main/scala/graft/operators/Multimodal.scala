package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-record decode /
  * feature-extraction runs as a typed `mapPartitions` stage (the Scala
  * analog of a batched Pandas UDF: amortized per-partition setup, one
  * deserialization boundary, no driver involvement).
  *
  * The actual codec call is STUBBED — this container ships no image/audio
  * libraries — behind [[MediaFeaturizer.decodeStub]], a clearly-marked
  * deterministic fake. Everything around it (schema, encoders, partition
  * batching, the query surface) is real and tested; swapping the stub for
  * a JNI/javacv decoder changes one function.
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaRecord(id: Long, kind: String, content: Array[Byte])

  /** Extracted features (decode stub output). */
  case class MediaFeatures(id: Long, kind: String, byte_len: Long,
                           content_md5: String, width: Int, height: Int,
                           n_frames: Int)

  object MediaFeaturizer {
    /** STUB — stands in for the real image/audio decoder (not available in
      * this container). Deterministic pure function of the payload so the
      * pipeline is testable end-to-end and oracle-checkable: pretends the
      * payload decodes to a (byte_len mod 640) × (byte_len mod 480) frame
      * grid with (byte_len mod 30 + 1) frames. */
    def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
      val n = content.length
      (n % 640, n % 480, n % 30 + 1)
    }

    def md5Hex(bytes: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(bytes).map("%02x".format(_)).mkString
    }

    /** Per-partition hasher: one MessageDigest allocated, reused per row
      * (shared by [[Multimodal.featurize]] and [[Multimodal.resizeTo]]). */
    def hasher(): Array[Byte] => String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      bytes => { d.reset(); d.digest(bytes).map("%02x".format(_)).mkString }
    }
  }

  /** Decode + featurize: one partition at a time, codec state (here: the
    * digest; in production: the decoder context) allocated once per
    * partition, not once per row. */
  def featurize(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val md5 = MediaFeaturizer.hasher()
      it.map { r =>
        val (w, h, f) = MediaFeaturizer.decodeStub(r.content)
        MediaFeatures(r.id, r.kind, r.content.length.toLong, md5(r.content), w, h, f)
      }
    }
  }

  /** Frame sampling plumbing: every `stride`-th frame index of a video
    * record, as (id, frame_idx) rows — the fan-out shape a real frame
    * extractor produces. Pure Spark (explode over a sequence), so the
    * expensive decode can be partition-parallel downstream. */
  def sampleFrameIndexes(features: DataFrame, stride: Int): DataFrame =
    features.select(col("id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** A perceptual signature: 64 bits as a '0'/'1' string (the
    * cross-engine-exact carrier — bit-packing into a BIGINT would wrap
    * the 64th bit, the [[graft.operators.Similarity.binarySign]]
    * lesson, and slicing/banding are string ops everywhere). */
  case class MediaSignature(id: Long, sig: String)

  /** Perceptual hash (the aHash shape): downsample the decoded frame to
    * a 64-cell grid, bit i = cell i brighter than the frame mean —
    * the image near-dup signature every multimodal training pipeline
    * computes (re-encoded/resized copies of an image keep their
    * brightness STRUCTURE, so their aHashes stay within a few bits
    * while cryptographic hashes diverge completely). The decode is the
    * STUB ([[MediaFeaturizer.decodeStub]]'s container constraint):
    * cell i's "brightness" is payload byte ⌊i·len/64⌋ — a coarse
    * byte-stream downsample, deterministic and oracle-replayable; a
    * real decoder swaps in pixel-block means, same dataflow. The
    * strict `cell·64 > Σcells` comparison keeps the mean test in
    * INTEGER arithmetic (no division, no float). Empty payloads hash
    * to all-zero bits. One mapPartitions pass, no shuffle. */
  def perceptualHash(records: Dataset[MediaRecord]): Dataset[MediaSignature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val n = r.content.length
        val cells = Array.tabulate(64) { i =>
          if (n == 0) 0 else r.content((i.toLong * n / 64).toInt) & 0xff
        }
        val sum = cells.sum
        val bits = new StringBuilder(64)
        var i = 0
        while (i < 64) {
          bits.append(if (cells(i) * 64 > sum) '1' else '0'); i += 1
        }
        MediaSignature(r.id, bits.toString)
      }
    }
  }

  /** Near-dup media pairs over perceptual signatures: 4×16-bit slice
    * banding (two signatures within Hamming distance 3 MUST share an
    * untouched slice — pigeonhole-complete recall at ≤ 3; above that
    * the bands are the standard heuristic candidate generator and
    * recall is < 1, the [[Dedup]] banded-operator contract), then an
    * exact integer Hamming confirm on candidates only. The corpus
    * never self-joins — the join key is (slice index, slice value),
    * and the hot-bucket guard REFUSES a degenerate slice distribution
    * (e.g. a corpus of near-black frames all hashing to one bucket)
    * instead of running a quadratic bucket, [[Similarity.nearDupPairs]]'s
    * posture. Returns (a_id, b_id, ham), a_id < b_id. */
  /** `blockCol`: optional extra band-key column already present on
    * `sigs` (e.g. a payload-length bucket) — candidates must also
    * match it, which multiplies the effective slice alphabet without
    * widening signatures. This is the measured prescription for the
    * hot-slice Σn² saturation (SCALE.md round-12: banded pairs grew
    * ~60× for 10× docs on near-uniform slices — the
    * `dedup_simhash_blocked` story, enforced here the same way). */
  /** `maxSliceDf`: optional occupancy cap — slice buckets holding more
    * rows are DROPPED from candidate generation entirely (the
    * [[Dedup]] n-gram `maxGramDf` pattern). This is the EXPONENT fix
    * where [[phashPairs]]'s block key only divides the constant: on a
    * homogeneous corpus every hot bucket's occupancy grows ∝ corpus
    * and its pair count ∝ corpus² regardless of how the key space is
    * multiplied (measured: blocking cut banded pairs 5.5× at 10× docs
    * but growth stayed ~48× — SCALE.md round-12). The recall contract:
    * a pair is lost only if EVERY slice it shares is generic
    * (above-cap) — near-dup copies share their distinctive slices. */
  def phashPairs(sigs: DataFrame, maxHamming: Int = 3,
                 maxBucketRows: Long = 1L << 20,
                 blockCol: Option[String] = None,
                 maxSliceDf: Option[Long] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val keep = col("id") +: col("sig") +: blockCol.map(col).toSeq
    val sliced0 = sigs.select(keep :+
        explode(sequence(lit(0), lit(3))).as("k"): _*)
      .withColumn("v", expr("substring(sig, k * 16 + 1, 16)"))
    val bandKey = Seq("k", "v") ++ blockCol
    // materialized once: `sliced` feeds THREE consumers — the cap
    // aggregate (when set), the hot-bucket guard action, and both
    // self-join sides — which Spark plans as separate subtrees
    // (simhashPairs'/knnGraph's checkpoint rationale)
    val sliced = graft.operators.Lineage.truncate(
      maxSliceDf.fold(sliced0) { cap =>
        sliced0.join(
          sliced0.groupBy(bandKey.map(col): _*).agg(count(lit(1)).as("_df"))
            .filter(col("_df") <= cap).select(bandKey.map(col): _*),
          bandKey)
      })
    val top = sliced.groupBy(bandKey.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("m")).head()
    val maxBucket = if (top.isNullAt(0)) 0L else top.getLong(0)
    require(maxBucket <= maxBucketRows,
      s"phashPairs: largest slice bucket holds $maxBucket rows > " +
        s"maxBucketRows=$maxBucketRows; the within-bucket join is " +
        "quadratic — a degenerate signature distribution (uniform " +
        "frames) needs a block key or a pre-filter, or raise the cap " +
        "deliberately")
    val ham = expr(
      """aggregate(zip_with(split(a_sig, ''), split(b_sig, ''),
        |  (x, y) -> CASE WHEN x <> y THEN 1 ELSE 0 END),
        |  0, (acc, v) -> acc + v)""".stripMargin)
    val joinCond = bandKey.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    // Hamming BEFORE distinct (simhashPairs' rule): a pair can match
    // in up to 4 slices, and filtering first means only close pairs'
    // narrow (a_id, b_id, ham) rows ride the dedup exchange — never
    // 4× duplicate rows dragging two 64-char signatures each
    sliced.alias("a").join(sliced.alias("b"), joinCond)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.sig").as("a_sig"), col("b.sig").as("b_sig"))
      .withColumn("ham", ham)
      .filter(col("ham") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("ham"))
      .distinct()
  }

  /** A resized frame: original record id + target-box dimensions. */
  case class ResizedFrame(id: Long, width: Int, height: Int,
                          scale: Double, content_md5: String)

  /** Resize stage: fit each record's decoded frame into `maxW`×`maxH`
    * preserving aspect ratio (the standard thumbnail contract). The
    * PIXEL work is the decode stub's job ([[MediaFeaturizer.decodeStub]]
    * — no codec libs in this container); the geometry, batching and
    * typed output are the real production shape: a `mapPartitions`
    * stage downstream of [[featurize]], partition-parallel, no driver
    * involvement, no shuffle. */
  def resizeTo(records: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[ResizedFrame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val md5 = MediaFeaturizer.hasher()
      it.map { r =>
        val (w0, h0, _) = MediaFeaturizer.decodeStub(r.content)
        // a resize box needs nonzero extents; featurize reports the RAW
        // decode geometry (0 allowed), resize clamps — deliberate
        val w = math.max(w0, 1)
        val h = math.max(h0, 1)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        ResizedFrame(r.id, math.max(1, (w * scale).toInt),
          math.max(1, (h * scale).toInt), scale, md5(r.content))
      }
    }
  }
}
