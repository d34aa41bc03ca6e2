package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("chunkFixed: overlapping windows cover the text, last chunk short") {
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("id", "t")
    val out = Pack.chunkFixed(docs, "id", "t", size = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // step 3: starts 0,3,6,9 → abcd, defg, ghij, j
    assert(out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ==
      Seq("abcd", "defg", "ghij", "j"))
    // short doc → one chunk; empty doc → one empty chunk (start 0)
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq("xy"))
    assert(out.filter(_._1 == 3L).map(_._3).toSeq == Seq(""))
    // consecutive chunks share exactly `overlap` chars
    val c1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    c1.sliding(2).filter(_.size == 2).foreach { w =>
      assert(w(0).takeRight(1) == w(1).take(1))
    }
    // null text yields no rows
    val withNull = Seq((4L, null: String)).toDF("id", "t")
    assert(Pack.chunkFixed(withNull, "id", "t", 4, 1).count() == 0)
    assertThrows[IllegalArgumentException] {
      Pack.chunkFixed(docs, "id", "t", size = 4, overlap = 4)
    }
  }

  test("packSequences: budget-exact layout, straddling docs split, totals preserved") {
    // one source; tokens 5,5,3,9 with budget 8:
    //   layout 0..5, 5..10, 10..13, 13..22
    //   doc 1 → seq0(5); doc 2 → seq0(3)+seq1(2); doc 3 → seq1(3);
    //   doc 4 → seq1(3)+seq2(6)
    val docs = Seq((1L, "s", 5L), (2L, "s", 5L), (3L, "s", 3L),
      (4L, "s", 9L), (5L, "s", 0L)).toDF("id", "src", "tk")
    val out = Pack.packSequences(docs, "id", col("tk"), budget = 8L,
      partCol = col("src"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((1L, 0L, 5L), (2L, 0L, 3L), (2L, 1L, 2L),
      (3L, 1L, 3L), (4L, 1L, 3L), (4L, 2L, 6L)))
    // zero-token doc occupies no sequence space
    assert(!out.exists(_._1 == 5L))
    // per-doc token mass is preserved across its sequence shares
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perDoc == Map(1L -> 5L, 2L -> 5L, 3L -> 3L, 4L -> 9L))
    // every sequence except the last is filled to exactly the budget
    val perSeq = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(perSeq == Map(0L -> 8L, 1L -> 8L, 2L -> 6L))
    // independent sources pack independently (parallel groups)
    val two = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("id", "src", "tk")
    val seqs = Pack.packSequences(two, "id", col("tk"), 8L, col("src"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(seqs == Set(("a", 0L), ("b", 0L)))
  }
}
