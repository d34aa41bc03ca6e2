package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Model-based properties: [[Vocab.bpeTrain]]/[[Vocab.bpeApply]]
  * against an INDEPENDENT naive BPE written directly from the Sennrich
  * et al. algorithm (symbol lists, mutable counts, explicit greedy
  * scan) — a different algebra from the operator's guarded-string
  * replace encoding, so agreement on random corpora is evidence for
  * the encoding argument itself, not two copies of one
  * implementation. */
object VocabProps extends Properties("Vocab") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  /** Greedy left-to-right merge of one pair over a symbol list. */
  private def mergeOnce(s: List[String], l: String, r: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        buf += (l + r); i += 2
      } else { buf += s(i); i += 1 }
    }
    buf.toList
  }

  /** Reference BPE trainer on symbol lists. */
  private def naiveBpe(words: Seq[String],
                       merges: Int): Seq[(Int, String, String, Long)] = {
    val freq = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    var syms: Seq[(List[String], Long)] =
      freq.toSeq.map { case (w, f) => w.map(_.toString).toList -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((step, l, r, c))
        syms = syms.map { case (s, f) => mergeOnce(s, l, r) -> f }
        step += 1
      }
    }
    out.toSeq
  }

  private val genCorpus: Gen[List[String]] = Gen.listOfN(12,
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))

  property("bpeTrain == naive symbol-list BPE") =
    forAll(genCorpus) { words =>
      val expect = naiveBpe(words, merges = 5)
      val got = Vocab.bpeTrain(Seq(words.mkString(" ")).toDF("text"),
          "text", merges = 5)
        .orderBy("step").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      got == expect
    }

  property("bpeApply histogram == naive replay of the learned merges") =
    forAll(genCorpus) { words =>
      val df = Seq(words.mkString(" ")).toDF("text")
      val merges = Vocab.bpeTrain(df, "text", merges = 4)
      val got = Vocab.bpeApply(df, "text", merges)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val learned = merges.orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2)))
      val naive = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { w =>
        var s = w.map(_.toString).toList
        learned.foreach { case (l, r) => s = mergeOnce(s, l, r) }
        s.foreach(t => naive(t) = naive.getOrElse(t, 0L) + 1L)
      }
      got == naive.toMap
    }
}
