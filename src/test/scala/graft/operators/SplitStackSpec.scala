package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TxSplitStack]] — the sticky split-assignment ledger. Load-bearing
  * claims: (1) WRITE-ONCE: re-assigning a grown corpus never moves a
  * stored row, even when the cluster's min-label representative
  * changed (the exact hazard `assignSplitLeakFree` documents);
  * (2) arrivals inherit the minimum-id stored member's split;
  * (3) quarantine lists exactly the members of clusters carrying ≥ 2
  * stored splits; (4) the manifest discipline holds (crash face,
  * replay skip). */
class SplitStackSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def newRoot(): String = {
    val r = java.nio.file.Files.createTempDirectory("graft_spspec")
      .resolve("ledger").toString
    TxSplitStack.init(spark, r)
    r
  }

  test("write-once under a representative flip; arrivals inherit the min stored member") {
    val root = newRoot()
    // cluster {100, 101} assigned at batch 0 under rep 100
    val stored = Seq(100L, 101L, 500L).toDF("doc_id")
    val l1 = Seq((100L, 100L), (101L, 100L)).toDF("id", "cluster")
    assert(TxSplitStack.commitAssign(spark, root, stored, l1, 0L,
      "doc_id", splits, buckets = 4))
    val before = TxSplitStack.resolve(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before.keySet == Set(100L, 101L, 500L))
    assert(before(100L) == before(101L), "cluster must share one draw")
    // doc 5 arrives and joins the cluster, flipping its min-label to 5
    // — the leak-free re-draw would move {100, 101}; the ledger must not
    val arrivals = Seq(5L).toDF("doc_id")
    val lF = Seq((5L, 5L), (100L, 5L), (101L, 5L)).toDF("id", "cluster")
    assert(TxSplitStack.commitAssign(spark, root, arrivals, lF, 1L,
      "doc_id", splits, buckets = 4))
    val after = TxSplitStack.resolve(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(100L) == before(100L) && after(101L) == before(101L) &&
      after(500L) == before(500L), s"stored rows moved: $before -> $after")
    // the arrival inherits the min stored member's (100's) split — NOT
    // a fresh ladder over the new rep 5
    assert(after(5L) == before(100L),
      s"arrival must inherit the stored cluster split: $after")
    // unclustered arrival draws its own ladder = plain assignSplit
    assert(TxSplitStack.commitAssign(spark, root, Seq(77L).toDF("doc_id"),
      lF, 2L, "doc_id", splits, buckets = 4))
    val own = Sampling.assignSplit(Seq(77L).toDF("doc_id"),
      $"doc_id", splits).collect().head.getString(1)
    assert(TxSplitStack.resolve(spark, root).filter($"doc_id" === 77L)
      .collect().head.getString(1) == own)
  }

  test("crash face invisible; replay commits once; re-delivered docs absorbed") {
    val root = newRoot()
    val l = Seq.empty[(Long, Long)].toDF("id", "cluster")
    assert(TxSplitStack.commitAssign(spark, root, Seq(1L, 2L).toDF("doc_id"),
      l, 0L, "doc_id", splits, buckets = 4))
    TxSplitStack.commitAssign(spark, root, Seq(3L).toDF("doc_id"),
      l, 1L, "doc_id", splits, buckets = 4, publish = false)
    assert(TxSplitStack.resolve(spark, root).count() == 2L,
      "torn assign visible")
    assert(TxSplitStack.commitAssign(spark, root, Seq(3L).toDF("doc_id"),
      l, 1L, "doc_id", splits, buckets = 4))
    assert(!TxSplitStack.commitAssign(spark, root, Seq(3L).toDF("doc_id"),
      l, 1L, "doc_id", splits, buckets = 4), "replay must skip")
    // doc 1 re-delivered in a later batch: absorbed, not re-drawn
    assert(TxSplitStack.commitAssign(spark, root, Seq(1L).toDF("doc_id"),
      l, 2L, "doc_id", splits, buckets = 4))
    assert(TxSplitStack.resolve(spark, root).count() == 3L)
  }

  test("quarantine: exactly the members of clusters with >= 2 stored splits") {
    val root = newRoot()
    // force different splits by assigning singletons first (their own
    // draws), then merging pairs whose draws differ
    val ids = (1L to 200L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("id", "cluster")
    assert(TxSplitStack.commitAssign(spark, root, ids, none, 0L,
      "doc_id", splits, buckets = 4))
    val assigned = TxSplitStack.resolve(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // merge (1,2), (3,4), ... — conflict iff the pair's draws differ
    val lF = (1L to 200L).map(i => (i, i - ((i - 1) % 2)))
      .toDF("id", "cluster")
    val expected = (1L to 200L).groupBy(i => i - ((i - 1) % 2)).toSeq
      .filter { case (_, m) => m.map(assigned).distinct.size > 1 }
      .flatMap(_._2).toSet
    assert(expected.nonEmpty, "fixture must produce at least one conflict")
    val got = TxSplitStack.quarantine(spark, root, lF)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"quarantine mismatch: got ${got.size}, " +
      s"expected ${expected.size}")
  }
}
