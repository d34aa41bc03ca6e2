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

  test("incremental quarantine: equals the full scan after a bridging ingest; a cluster re-audited clean drops its members' rows") {
    val root = newRoot()
    val none = Seq.empty[(Long, Long)].toDF("id", "cluster")
    // 200 singletons draw independently at batch 0
    assert(TxSplitStack.commitAssign(spark, root, (1L to 200L).toDF("doc_id"),
      none, 0L, "doc_id", splits, buckets = 4))
    assert(TxSplitStack.quarantineIncremental(spark, root).isEmpty,
      "singleton draws must audit clean")
    val assigned = TxSplitStack.resolve(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // arrivals 1001..1100 bridge the pairs (2i-1, 2i): the commit that
    // CREATES each merge audits exactly that cluster
    val lF = ((1L to 200L).map(i => (i, i - ((i - 1) % 2))) ++
      (1L to 100L).map(i => (1000L + i, 2 * i - 1))).toDF("id", "cluster")
    assert(TxSplitStack.commitAssign(spark, root,
      (1001L to 1100L).toDF("doc_id"), lF, 1L, "doc_id", splits,
      buckets = 4))
    val inc = TxSplitStack.quarantineIncremental(spark, root)
      .localCheckpoint()
    val full = TxSplitStack.quarantine(spark, root, lF).localCheckpoint()
    assert(inc.count() > 0, "the fixture must produce conflicts")
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental quarantine must equal the full scan when every " +
        "merge arrived through a commit")
    // a conflicted pair, by construction: arrivals inherit the min
    // stored member (2i-1), so cluster 2i-1 conflicts iff the pair's
    // own draws differ
    val confBase = (1L to 100L).map(i => 2 * i - 1)
      .find(b => assigned(b) != assigned(b + 1)).get
    // batch 2: labels REFINE — the conflicted cluster's odd member and
    // a fresh arrival form a clean 2-cluster; the re-audit must DROP
    // the odd member's conflict row while the pair's other members
    // keep theirs (stale by the stated as-of-last-touch contract)
    val l2 = Seq((confBase, confBase), (2000L, confBase))
      .toDF("id", "cluster")
    assert(TxSplitStack.commitAssign(spark, root, Seq(2000L).toDF("doc_id"),
      l2, 2L, "doc_id", splits, buckets = 4))
    val after = TxSplitStack.quarantineIncremental(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!after.contains(confBase),
      "a cluster re-audited clean must drop its members' conflict rows")
    assert(after.contains(confBase + 1),
      "an untouched member keeps its as-of-last-touch conflict row")
    // the conflict family snapshots like every other asset: the batch-1
    // cut still lists the dropped member
    val atV = TxSplitStack.quarantineIncremental(spark, root,
      version = Some(2L)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(atV.contains(confBase),
      "the pre-refinement snapshot must keep the old conflict set")
  }

  test("rebucket: assignment and conflict families identical under B'; post-migration commits compose") {
    val root = newRoot()
    val none = Seq.empty[(Long, Long)].toDF("id", "cluster")
    assert(TxSplitStack.commitAssign(spark, root, (1L to 100L).toDF("doc_id"),
      none, 0L, "doc_id", splits, buckets = 4))
    // bridge the pairs so the conflict family is non-empty
    val lF = ((1L to 100L).map(i => (i, i - ((i - 1) % 2))) ++
      (1L to 50L).map(i => (1000L + i, 2 * i - 1))).toDF("id", "cluster")
    assert(TxSplitStack.commitAssign(spark, root,
      (1001L to 1050L).toDF("doc_id"), lF, 1L, "doc_id", splits,
      buckets = 4))
    val assignBefore = TxSplitStack.resolve(spark, root).localCheckpoint()
    val confBefore = TxSplitStack.quarantineIncremental(spark, root)
      .localCheckpoint()
    assert(confBefore.count() > 0, "fixture must carry conflicts")
    assert(TxSplitStack.rebucket(spark, root, newBuckets = 16))
    val assignAfter = TxSplitStack.resolve(spark, root)
    val confAfter = TxSplitStack.quarantineIncremental(spark, root)
    assert(assignAfter.exceptAll(assignBefore).isEmpty &&
      assignBefore.exceptAll(assignAfter).isEmpty,
      "re-bucket changed the served assignment")
    assert(confAfter.exceptAll(confBefore).isEmpty &&
      confBefore.exceptAll(confAfter).isEmpty,
      "re-bucket changed the conflict family")
    // a post-migration arrival composes under B' — inheritance reads
    // the NEW keyspace's member buckets
    assert(TxSplitStack.commitAssign(spark, root, Seq(3000L).toDF("doc_id"),
      Seq((3000L, 1L), (1L, 1L)).toDF("id", "cluster"), 2L, "doc_id",
      splits, buckets = 16))
    val got = TxSplitStack.resolve(spark, root)
      .filter($"doc_id" === 3000L).collect().head.getString(1)
    val want = assignBefore.filter($"doc_id" === 1L)
      .collect().head.getString(1)
    assert(got == want, "post-migration inheritance must read B' buckets")
  }
}
