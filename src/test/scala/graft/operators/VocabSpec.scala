package graft.operators

import graft.SparkSpec

/** BPE-merge vocabulary training: greedy pair election, frequency
  * weighting, left-to-right non-overlapping application, lexicographic
  * tie-breaks, and early exhaustion. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  private def train(text: String, merges: Int) =
    Vocab.bpeTrain(Seq(text).toDF("text"), "text", merges)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("bpeTrain: the hand-computed merge sequence on a tiny corpus") {
    // words: aaab x3, ab x2
    // round 1: (a,a) = 2*3 = 6 beats (a,b) = 3+2 = 5 -> aaab = [aa,a,b]
    // round 2: (a,b) = 3+2 = 5 beats (aa,a) = 3     -> [aa,ab], [ab]
    // round 3: (aa,ab) = 3, the only pair left      -> [aaab]
    // round 4: no pairs -> exhausted at 3 of 5 requested merges
    val got = train("aaab aaab aaab ab ab", merges = 5)
    assert(got == Seq((1, "a", "a", 6L), (2, "a", "b", 5L),
      (3, "aa", "ab", 3L)), s"merge sequence drifted: $got")
  }

  test("bpeTrain: count ties elect the lexicographically smaller pair") {
    val got = train("dc ba dc ba", merges = 1)
    assert(got == Seq((1, "b", "a", 2L)), s"tie-break drifted: $got")
  }

  test("bpeTrain: overlapping chains merge left-to-right non-overlapping") {
    // "aaaa": pairs (a,a) = 3 (overlaps counted, the get_stats way);
    // applying merges positions 0-1 and 2-3, NOT the middle
    val got = train("aaaa", merges = 2)
    assert(got.head == ((1, "a", "a", 3L)))
    // round 2 sees [aa, aa] -> (aa, aa) = 1
    assert(got(1) == ((2, "aa", "aa", 1L)), s"round-2 pair drifted: ${got(1)}")
  }

  test("bpeTrain: merged symbols never re-merge within the same round") {
    // "abab": (a,b) = 2 wins round 1 -> [ab, ab]; (b,a) = 1 never applies
    val got = train("abab", merges = 2)
    assert(got == Seq((1, "a", "b", 2L), (2, "ab", "ab", 1L)),
      s"got $got")
  }

  test("bpeTrain: local and distributed merge loops elect identical tables") {
    // the documents fixture (multi-word, tie-rich) plus a crafted
    // tie-heavy corpus: any drift in pair counting, UTF-8 tie order,
    // or replace semantics between the collected loop and the
    // aggregate+argmax loop flips a row
    val fixtures = Seq(
      graft.Tables.documents(spark, sf).select("text"),
      Seq("aaab aaab ab cd cd dc ba aaaa x yz yz").toDF("text"))
    fixtures.foreach { df =>
      val local = Vocab.bpeTrain(df, "text", merges = 12)
      val dist = Vocab.bpeTrain(df, "text", merges = 12,
        maxDistinctWords = 0L)
      assert(local.exceptAll(dist).isEmpty && dist.exceptAll(local).isEmpty,
        "local/distributed merge tables diverged")
    }
  }

  test("bpeApply: the learned merges tokenize the corpus; no merges = char histogram") {
    val docsDf = Seq("aaab aaab aaab ab ab").toDF("text")
    val merges = Vocab.bpeTrain(docsDf, "text", merges = 8)
    val toks = Vocab.bpeApply(docsDf, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 3 learned merges fully fuse both word forms
    assert(toks == Map("aaab" -> 3L, "ab" -> 2L), s"tokens drifted: $toks")
    val none = Vocab.bpeApply(docsDf, "text",
      merges.filter($"step" < 0))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 x (a,a,a,b) + 2 x (a,b): a = 11, b = 5
    assert(none == Map("a" -> 11L, "b" -> 5L), s"char histogram drifted: $none")
  }

  test("bpeTrainHead: cap covering the whole vocab = bpeTrain; tight cap trains on the head only") {
    val docsDf = Seq("aaab aaab aaab ab ab cd cd zq").toDF("text")
    // cap big enough for every symbol string → identical to full train
    val full = Vocab.bpeTrain(docsDf, "text", merges = 8)
    val headAll = Vocab.bpeTrainHead(docsDf, "text", merges = 8,
      headChars = 1L << 20)
    assert(headAll.exceptAll(full).isEmpty && full.exceptAll(headAll).isEmpty,
      "an all-covering head cut must reproduce the full merge table")
    // tight cap: only "aaab" (freq 3, symbol string len 12) fits 15
    // chars — merges learn from it alone, so (a,b) counts 3 not 5
    // (the tail's two "ab" votes are exactly what the head cut omits)
    val headTight = Vocab.bpeTrainHead(docsDf, "text", merges = 2,
      headChars = 15)
    val t = headTight.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(t == Seq(("a", "a", 6L), ("a", "b", 3L)),
      s"head-only elections drifted: $t")
    // closure: tail words/mass counted, tail-only chars flagged OOV
    val cl = Vocab.bpeHeadClosure(docsDf, "text", headChars = 15).head()
    assert(cl.getLong(0) == 1 && cl.getLong(1) == 3, "head/tail words")
    assert(cl.getLong(2) == 3 && cl.getLong(3) == 5, "head/tail mass")
    assert(cl.getLong(4) == 4, s"c, d, z, q are tail-only: ${cl.getLong(4)}")
    // a cap no word fits refuses loudly
    val ex = intercept[IllegalArgumentException] {
      Vocab.bpeTrainHead(docsDf, "text", merges = 2, headChars = 3)
    }
    assert(ex.getMessage.contains("admits no word"))
  }
}
