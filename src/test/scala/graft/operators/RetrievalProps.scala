package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Model-based properties for the positional match operators:
  * [[Retrieval.proximityMatch]] and [[Retrieval.orderedNearMatch]]
  * against INDEPENDENT brute-force models written directly from the
  * definitions — an exhaustive assignment search over raw positions, a
  * different algebra from the operators' range-frame / ceiling-
  * successor plane sweeps, so agreement on random corpora is evidence
  * for the sweep reductions themselves (the anchor-cover and
  * greedy-exchange arguments), not two copies of one implementation. */
object RetrievalProps extends Properties("Retrieval") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  /** Raw word positions per doc (the positional-ledger semantics:
    * 0-based whitespace offsets, empty tokens dropped as terms). */
  private def positions(doc: String): Map[String, Seq[Int]] =
    doc.split(" ", -1).zipWithIndex
      .filter(_._1.nonEmpty)
      .groupBy(_._1).map { case (t, ps) => t -> ps.map(_._2).toSeq }

  /** Model NEAR/w: anchors = matched-term positions p such that every
    * query term has an occurrence in [p, p + w] — checked directly
    * against the raw position lists. */
  private def modelNear(doc: String, terms: Set[String],
                        w: Int): Option[Long] = {
    val pos = positions(doc)
    if (!terms.forall(pos.contains)) None
    else {
      val anchorPos = terms.toSeq.flatMap(pos).distinct
      val n = anchorPos.count(p =>
        terms.forall(t => pos(t).exists(q => q >= p && q <= p + w)))
      if (n > 0) Some(n.toLong) else None
    }
  }

  /** Model ordered NEAR/w: anchors = slot-0 positions p0 from which
    * SOME strictly-increasing assignment of the remaining slots stays
    * within [p0, p0 + w] — exhaustive DFS over position choices (no
    * greedy shortcut: the operator's exchange argument is exactly
    * what this model must independently confirm). */
  private def modelOrdered(doc: String, phrase: Seq[String],
                           w: Int): Option[Long] = {
    val pos = positions(doc)
    if (!phrase.forall(pos.contains)) None
    else {
      def chain(slot: Int, last: Int, p0: Int): Boolean =
        if (slot == phrase.length) true
        else pos(phrase(slot)).exists(q =>
          q > last && q <= p0 + w && chain(slot + 1, q, p0))
      val n = pos(phrase.head)
        .count(p0 => chain(1, p0, p0))
      if (n > 0) Some(n.toLong) else None
    }
  }

  private val genWord: Gen[String] = Gen.oneOf("a", "b", "c", "d")
  private val genDoc: Gen[String] = Gen.choose(0, 10)
    .flatMap(n => Gen.listOfN(n, genWord).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] = Gen.choose(2, 5)
    .flatMap(n => Gen.listOfN(n, genDoc))

  /** The shared fixture build: corpus frame + its positional ledger. */
  private def ledgerOf(docs: List[String]) =
    Retrieval.positionalIndexBuild(
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "doc_id", "text")

  private def phraseDf(phrase: Seq[String]) =
    phrase.zipWithIndex.map { case (t, i) => (0L, i, t) }
      .toDF("q_id", "idx", "term")

  private def termsDf(terms: Set[String]) =
    terms.toSeq.map(t => (0L, t)).toDF("q_id", "term")

  property("proximityMatch == exhaustive anchor model") =
    forAll(genCorpus, Gen.choose(1, 3), Gen.choose(0, 4)) { (docs, nq, w) =>
      val terms = Set("a", "b", "c", "d").take(nq)
      val got = Retrieval.proximityMatch(termsDf(terms), ledgerOf(docs), w)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val want = docs.zipWithIndex.flatMap { case (t, i) =>
        modelNear(t, terms, w).map(i.toLong -> _)
      }.toMap
      got == want
    }

  /** Model phrase match: base offsets b ≥ 0 where slot i's term sits
    * at position b + i for every i. */
  private def modelPhrase(doc: String,
                          phrase: Seq[String]): Option[Long] = {
    val pos = positions(doc)
    if (!phrase.forall(pos.contains)) None
    else {
      val n = pos(phrase.head).count(b =>
        phrase.zipWithIndex.forall { case (t, i) =>
          pos(t).contains(b + i) })
      if (n > 0) Some(n.toLong) else None
    }
  }

  /** Model best window: over matched-term positions p, the cover
    * |{t : t occurs in [p, p + w]}|; winner = max cover, earliest p. */
  private def modelBestWindow(doc: String, terms: Set[String],
                              w: Int): Option[(Int, Long)] = {
    val pos = positions(doc)
    val present = terms.filter(pos.contains)
    val anchorPos = present.toSeq.flatMap(pos).distinct
    if (anchorPos.isEmpty) None
    else Some(anchorPos.map { p =>
      (p, present.count(t => pos(t).exists(q => q >= p && q <= p + w)).toLong)
    }.minBy { case (p, k) => (-k, p) })
  }

  property("phraseMatch == exhaustive base-offset model") =
    forAll(genCorpus, Gen.choose(1, 3), Gen.listOfN(3, genWord)) {
      (docs, np, pwords) =>
        val phrase = pwords.take(np)
        val got = Retrieval.phraseMatch(phraseDf(phrase), ledgerOf(docs))
          .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
        val want = docs.zipWithIndex.flatMap { case (t, i) =>
          modelPhrase(t, phrase).map(i.toLong -> _)
        }.toMap
        got == want
    }

  property("bestWindow == exhaustive cover-argmax model") =
    forAll(genCorpus, Gen.choose(1, 3), Gen.choose(0, 4)) { (docs, nq, w) =>
      val terms = Set("a", "b", "c", "d").take(nq)
      val got = Retrieval.bestWindow(termsDf(terms), ledgerOf(docs), w)
        .collect().map(r => r.getLong(1) -> (r.getInt(2), r.getLong(3))).toMap
      val want = docs.zipWithIndex.flatMap { case (t, i) =>
        modelBestWindow(t, terms, w).map(i.toLong -> _)
      }.toMap
      got == want
    }

  property("orderedNearMatch == exhaustive increasing-assignment model") =
    forAll(genCorpus, Gen.choose(1, 3), Gen.choose(0, 4),
      Gen.listOfN(3, genWord)) { (docs, np, w, pwords) =>
      val phrase = pwords.take(np)
      val got = Retrieval.orderedNearMatch(phraseDf(phrase), ledgerOf(docs), w)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val want = docs.zipWithIndex.flatMap { case (t, i) =>
        modelOrdered(t, phrase, w).map(i.toLong -> _)
      }.toMap
      got == want
    }
}
