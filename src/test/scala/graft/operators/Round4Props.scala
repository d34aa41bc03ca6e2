package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ScalaCheck properties for the round-4 sequence-construction operators
  * and the explicit-codebook IVF refactor: each checks the distributed
  * implementation against a direct single-threaded Scala model (or the
  * pre-refactor path) on random inputs. */
object Round4Props extends Properties("Round4") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(5)

  // chunkFixed: first chunk + each later chunk minus its overlap prefix
  // reassembles the document exactly (no char lost or duplicated)
  property("chunkFixed reassembles the text") =
    forAll(
      Gen.listOfN(20, Gen.zip(Gen.choose(1L, 1000000L),
        Gen.alphaNumStr.map(_.take(40)))),
      Gen.choose(2, 8), Gen.choose(0, 1)
    ) { (raw, size, overlap) =>
      val rows = raw.distinctBy(_._1)
      val df = rows.toDF("id", "t")
      val chunks = Pack.chunkFixed(df, "id", "t", size, overlap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toList).toMap
      rows.forall { case (id, t) =>
        val cs = chunks.getOrElse(id, Nil)
        val rebuilt = cs match {
          case Nil => ""
          case h :: tail => h + tail.map(_.drop(overlap)).mkString
        }
        rebuilt == t && cs.forall(_.length <= size)
      }
    }

  // packSequences == the sequential end-to-end layout model per group
  property("packSequences == sequential layout model") =
    forAll(
      Gen.listOfN(40, Gen.zip(Gen.choose(1L, 100000L),
        Gen.oneOf("a", "b"), Gen.choose(0L, 30L))),
      Gen.choose(4L, 16L)
    ) { (raw, budget) =>
      val rows = raw.distinctBy(_._1)
      val df = rows.toDF("id", "src", "tk")
      val got = Pack.packSequences(df, "id", $"tk", budget, $"src")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = rows.groupBy(_._2).flatMap { case (src, docs) =>
        var cum = 0L
        docs.filter(_._3 > 0).sortBy(_._1).flatMap { case (id, _, tk) =>
          val start = cum; cum += tk
          (start / budget to (cum - 1) / budget).map { seq =>
            (src, id, seq,
              math.min(cum, (seq + 1) * budget) - math.max(start, seq * budget))
          }
        }
      }.toSet
      got == want
    }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  // weightedSample == the per-row draw < floor(w·2^32) model; w ≥ 1
  // always kept, w ≤ 0 never
  property("weightedSample == per-row hash-threshold model") =
    forAll(Gen.listOfN(150, Gen.zip(Gen.choose(0L, 100000L),
      Gen.choose(-0.2, 1.3)))) { raw =>
      val rows = raw.distinctBy(_._1)
      val df = rows.toDF("id", "w")
      val got = Sampling.weightedSample(df, $"w", $"id")
        .collect().map(_.getLong(0)).toSet
      val want = rows.filter { case (id, w) =>
        w >= 1.0 || (w > 0.0 &&
          md5Hex(s"graft:$id").substring(0, 8) <
            f"${math.floor(w * 4294967296.0).toLong}%08x")
      }.map(_._1).toSet
      got == want
    }

  // ivfTopKWith on the lowest-id seed codebook IS ivfTopK (the refactor
  // changed the plumbing, not the semantics)
  property("ivfTopKWith(seed codebook) == ivfTopK") =
    forAll(Gen.listOfN(24, Gen.zip(Gen.choose(0L, 500L),
      Gen.listOfN(3, Gen.choose(-5, 5).map(_.toFloat))))) { raw =>
      val rows = raw.distinctBy(_._1).map { case (id, v) => (id, v.toArray) }
      val df = rows.toDF("vec_id", "embedding")
      val q = df.filter($"vec_id" % 3 === 0)
      val seed = df.filter($"vec_id" < 4)
        .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
      val a = Similarity.ivfTopK(q, df, "vec_id", "embedding",
        k = 2, nCells = 4, nProbe = 2, dim = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val b = Similarity.ivfTopKWith(q, df, seed, "vec_id", "embedding",
        k = 2, nProbe = 2, dim = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      a == b
    }
}
