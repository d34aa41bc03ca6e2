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
