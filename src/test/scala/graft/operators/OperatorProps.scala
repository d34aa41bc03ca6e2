package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ScalaCheck properties for the round-2 operators: each compares the
  * distributed Spark implementation row-wise against a direct Scala model
  * on randomized inputs (same style as [[NullSemanticsProps]]). */
object OperatorProps extends Properties("Operators") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(5)

  // as-of join == per-row "latest right at or before ts" model
  property("asofJoinBackward == argmax{rt <= lt} model") =
    forAll(
      Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 1000L))),
      Gen.listOfN(25, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 1000L)))
    ) { (leftRaw, rightRaw) =>
      // dedupe right per (key, ts) — the operator's documented contract
      // (rv == rt here, so distinct pairs are already 1:1 per (k, ts))
      val right = rightRaw.distinct
      val left = leftRaw.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val lDf = left.toDF("id", "k", "t")
        .select($"id", $"k", timestamp_seconds($"t").as("t"))
      val rDf = right.toDF("k", "rt")
        .select($"k", timestamp_seconds($"rt").as("rt"), $"rt".as("rv"))
      val got = Temporal.asofJoinBackward(lDf, rDf, "k", "t", "rt", Seq("rv"))
        .select("id", "rv").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      val want = left.map { case (id, k, t) =>
        val cands = right.filter(r => r._1 == k && r._2 <= t).map(_._2)
        id -> (if (cands.isEmpty) None else Some(cands.max))
      }.toMap
      got == want
    }

  // binned range join == theta join, any bin width
  property("rangeJoinBinned == theta join") =
    forAll(
      Gen.listOfN(40, Gen.choose(0.0, 100.0)),
      Gen.listOfN(10, Gen.zip(Gen.choose(0.0, 100.0), Gen.choose(0.0, 40.0))),
      Gen.oneOf(5.0, 13.0, 50.0)
    ) { (points, spans, binW) =>
      val p = points.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      val iv = spans.zipWithIndex.map { case ((lo, span), i) => (i.toLong, lo, lo + span) }
        .toDF("iid", "lo", "hi")
      val got = Temporal.rangeJoinBinned(p, "x", iv, "lo", "hi", binW)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (x, i) <- points.zipWithIndex
        ((lo, span), j) <- spans.zipWithIndex
        if x >= lo && x <= lo + span
      } yield (i.toLong, j.toLong)).toSet
      got == want
    }

  // Misra-Gries guarantee: items with freq > n/(k+1) always reported,
  // with counts that are lower bounds off by at most n/(k+1)
  property("HeavyHitters keeps every item with freq > n/(k+1)") =
    forAll(
      Gen.listOfN(300, Gen.frequency(5 -> Gen.const("hot"), 3 -> Gen.alphaLowerStr.map(_.take(3)))),
      Gen.choose(2, 6)
    ) { (items, k) =>
      val hh = udaf(new graft.functions.HeavyHitters(k))
      val out = items.toDF("x").repartition(4)
        .agg(hh($"x").as("hh"))
        .select(explode($"hh").as("h")).select($"h.item", $"h.cnt")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = items.size.toDouble / (k + 1)
      exact.forall { case (item, freq) =>
        val reported = out.get(item)
        (freq <= bound || reported.nonEmpty) &&
          reported.forall(c => c <= freq && c >= freq - bound)
      }
    }

  // blocked n-gram Jaccard == the set-theoretic model on the shared-gram
  // candidate pairs (0-overlap pairs are never emitted by construction)
  property("ngramJaccardPairs == distinct-shingle-set model") =
    forAll(Gen.listOfN(12, Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e")))) { wordLists =>
      val docs = wordLists.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        org.apache.spark.sql.functions.lit("blk"), threshold = 0.001, k = 3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
        .toMap
      def shingleSet(ws: Seq[String]) =
        ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      val want = (for {
        (a, ia) <- wordLists.zipWithIndex; (b, ib) <- wordLists.zipWithIndex
        if ia < ib
        sa = shingleSet(a); sb = shingleSet(b)
        inter = (sa & sb).size if inter > 0
        j = inter.toDouble / (sa | sb).size
      } yield ((ia.toLong, ib.toLong),
        BigDecimal(j).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toMap
      got == want
    }

  // applied dedup == keep-min-id-per-distinct-text model, exactly one
  // survivor per text even under duplicate ids
  property("dedupKeepFirst == min-id-per-text model") =
    forAll(Gen.listOfN(40, Gen.zip(Gen.choose(0L, 10L), Gen.oneOf("t1", "t2", "t3")))) { rows =>
      val df = rows.toDF("doc_id", "text")
      val got = Dedup.dedupKeepFirst(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val wantKeys = rows.groupBy(_._2).toSeq
        .map { case (t, rs) => (rs.map(_._1).min, t) }.toSet
      got.toSet == wantKeys && got.length == wantKeys.size // exactly one each
    }

  // salted aggregation recombines exactly for any bucket count
  property("saltedSumCount == plain groupBy for any buckets") =
    forAll(
      Gen.listOfN(120, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(-50.0, 50.0))),
      Gen.choose(1, 16)
    ) { (rows, buckets) =>
      val df = rows.toDF("k", "v")
      val got = Skew.saltedSumCount(df, Seq("k"), "v", buckets)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val want = df.groupBy("k")
        .agg(count(lit(1)).as("cnt"),
          round(sum($"v".cast(org.apache.spark.sql.types.DecimalType(30, 10))), 4)
            .cast("double").as("sum_v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      got == want
    }

  // CharNgrams kernel == the code-point sliding-window model on arbitrary
  // text, including multi-byte and supplementary (surrogate-pair) chars
  property("CharNgrams.compute == code-point sliding window") = {
    val genText = Gen.listOf(
      Gen.oneOf("a", "b", "z", " ", "é", "ç", "中", "😀"))
      .map(_.mkString)
    forAll(Gen.choose(1, 4), genText) { (n, s) =>
      val got = graft.expressions.CharNgrams.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), n)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.map(_.toString).toSeq
      val cp = s.codePoints().toArray
      val want = (0 to cp.length - n).map(i => new String(cp, i, n))
      got == want
    }
  }
}
