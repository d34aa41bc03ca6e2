package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[TxJoinViewStack]] — the delta-join materialized view across the
  * lexical serve stack and the split ledger. Load-bearing claims:
  * (1) feed-maintained state equals a fresh full build at the same
  *     cut pair — inserts, upserts, and deletes on the lexical side,
  *     arrivals on the split side, windows interleaved freely;
  * (2) each cursor is exactly-once: replayed and stale windows absorb
  *     without touching pins;
  * (3) liveness is the OR of the sides: a lexical takedown of an
  *     assigned doc leaves an `assigned_only` row, a takedown of an
  *     unassigned doc drops the member entirely;
  * (4) an empty feed window (an absorbed upstream re-ingest) still
  *     advances the cursor and rewrites nothing;
  * (5) a refresh rewrites only the feed's buckets — every other pin
  *     rides through untouched;
  * (6) snapshots survive refreshes; vacuum retires history below the
  *     floor while the head keeps serving;
  * (7) lifecycle misuse refuses loudly. */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private val B = 4
  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def newRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** doc_id → text with doc_id + 1 tokens (distinct per doc, so term
    * stats stay simple). */
  private def corpus(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, (0L to i).map(t => s"w${i}_$t").mkString(" ")))
      .toDF("doc_id", "text")

  private def selfLabels(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, i)).toDF("id", "cluster")

  /** Lexical stack with docs 0..5 over two batches (versions 0, 1). */
  private def mkLex(): String = {
    val root = newRoot("graft_jv_lex")
    assert(TxServeStack.commitBatch(spark, root, corpus(0L to 2L), 0L,
      "doc_id", "text", docBuckets = 4, termBuckets = 4))
    assert(TxServeStack.commitBatch(spark, root, corpus(3L to 5L), 1L,
      "doc_id", "text", docBuckets = 4, termBuckets = 4))
    root
  }

  /** Split ledger assigning docs 0..3 (version 1) then 4..5
    * (version 2); every doc its own cluster. */
  private def mkSplit(): String = {
    val root = newRoot("graft_jv_spl")
    TxSplitStack.init(spark, root)
    assert(TxSplitStack.commitAssign(spark, root,
      (0L to 3L).toDF("doc_id"), selfLabels(0L to 3L), 1L, "doc_id",
      splits, buckets = B))
    assert(TxSplitStack.commitAssign(spark, root,
      (4L to 5L).toDF("doc_id"), selfLabels(4L to 5L), 2L, "doc_id",
      splits, buckets = B))
    root
  }

  private def membersSorted(root: String,
                            version: Option[Long] = None): Seq[(Long, String, Any)] =
    TxJoinViewStack.members(spark, root, version)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"),
        if (r.isNullAt(2)) "-" else r.getLong(2))).toSeq

  test("feed-maintained state equals a fresh build at the same cut pair") {
    val lex = mkLex(); val spl = mkSplit()
    val view = newRoot("graft_jv_view")
    // build at the EARLY pair (lex 0: docs 0..2; split 1: docs 0..3)
    assert(TxJoinViewStack.build(spark, view, lex, spl, B,
      Some(0L), Some(1L)) == (0L, 1L))
    // upstream moves on: an upsert replaces doc 1's text (version 2),
    // a takedown retires doc 0 (version 3)
    assert(TxServeStack.commitUpsert(spark, lex,
      Seq((1L, "only two")).toDF("doc_id", "text"),
      2L, "doc_id", "text", docBuckets = 4, termBuckets = 4))
    assert(TxServeStack.commitDelete(spark, lex, Seq(0L).toDF("doc_id"),
      3L, "doc_id", docBuckets = 4, termBuckets = 4))
    // interleave the two consumer loops
    assert(TxJoinViewStack.refreshLex(spark, view, lex, 2L, 4, B))
    assert(TxJoinViewStack.refreshSplit(spark, view, spl, 2L, B))
    assert(TxJoinViewStack.refreshLex(spark, view, lex, 3L, 4, B))
    val twin = newRoot("graft_jv_twin")
    TxJoinViewStack.build(spark, twin, lex, spl, B)
    assert(membersSorted(view) == membersSorted(twin))
    // doc 0: taken down but still assigned — assigned_only, not gone
    assert(membersSorted(view).exists { case (id, s, dl) =>
      id == 0L && s != "-" && dl == "-" })
    // doc 1: the upsert's new norm ("only two" → 2 tokens)
    assert(membersSorted(view).exists { case (id, _, dl) =>
      id == 1L && dl == 2L })
  }

  test("replayed and stale windows absorb; empty window advances cursor") {
    val lex = mkLex(); val spl = mkSplit()
    val view = newRoot("graft_jv_view2")
    TxJoinViewStack.build(spark, view, lex, spl, B, Some(1L), Some(2L))
    // replay at the cursor
    assert(!TxJoinViewStack.refreshLex(spark, view, lex, 1L, 4, B))
    assert(!TxJoinViewStack.refreshSplit(spark, view, spl, 2L, B))
    // stale (below the cursor)
    assert(!TxJoinViewStack.refreshLex(spark, view, lex, 0L, 4, B))
    val before = Manifest.read(spark, view).get
    // an absorbed re-ingest upstream: no feed rows, version 2 exists
    assert(TxServeStack.commitBatch(spark, lex, corpus(0L to 2L), 2L,
      "doc_id", "text", docBuckets = 4, termBuckets = 4))
    assert(TxJoinViewStack.refreshLex(spark, view, lex, 2L, 4, B))
    val after = Manifest.read(spark, view).get
    assert(after.baseV == 2L && after.statsV == before.statsV,
      "an empty window must advance the cursor and rewrite nothing")
  }

  test("takedown of an unassigned doc drops the member; assigned survives") {
    val lex = mkLex(); val spl = mkSplit()
    val view = newRoot("graft_jv_view3")
    // split side only at version 1: docs 4..5 indexed but unassigned
    TxJoinViewStack.build(spark, view, lex, spl, B, Some(1L), Some(1L))
    assert(TxServeStack.commitDelete(spark, lex,
      Seq(4L, 3L).toDF("doc_id"), 2L, "doc_id", docBuckets = 4,
      termBuckets = 4))
    assert(TxJoinViewStack.refreshLex(spark, view, lex, 2L, 4, B))
    val m = membersSorted(view)
    assert(!m.exists(_._1 == 4L), "unassigned + taken down ⇒ dropped")
    assert(m.exists { case (id, s, dl) => id == 3L && s != "-" && dl == "-" },
      "assigned + taken down ⇒ assigned_only")
    val lag = TxJoinViewStack.serveLag(spark, view)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lag("assigned_only") == 1L) // doc 3
    assert(lag("indexed_only") == 1L)  // doc 5
    assert(lag("joined") == 3L)        // docs 0..2
  }

  test("a refresh rewrites only the feed's buckets") {
    val lex = mkLex(); val spl = mkSplit()
    val view = newRoot("graft_jv_view4")
    TxJoinViewStack.build(spark, view, lex, spl, B, Some(1L), Some(1L))
    val before = Manifest.read(spark, view).get.statsV
    assert(TxJoinViewStack.refreshSplit(spark, view, spl, 2L, B))
    val after = Manifest.read(spark, view).get.statsV
    val feedBkts = Seq(4L, 5L)
      .map(i => Math.floorMod(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          i, org.apache.spark.sql.types.LongType, 42L), B.toLong).toInt)
      .toSet
    (0 until B).filterNot(feedBkts).foreach { b =>
      assert(before.get(b) == after.get(b),
        s"untouched bucket $b must keep its pin")
    }
    assert(feedBkts.forall(b => before.get(b) != after.get(b)),
      "every feed bucket must re-pin")
  }

  test("snapshots survive refreshes; vacuum retires below the floor") {
    val lex = mkLex(); val spl = mkSplit()
    val view = newRoot("graft_jv_view5")
    TxJoinViewStack.build(spark, view, lex, spl, B, Some(0L), Some(1L))
    val atBuild = membersSorted(view, Some(0L))
    assert(TxJoinViewStack.refreshLex(spark, view, lex, 1L, 4, B))
    assert(TxJoinViewStack.refreshSplit(spark, view, spl, 2L, B))
    assert(membersSorted(view, Some(0L)) == atBuild,
      "the build cut must stay reconstructible")
    val head = membersSorted(view)
    val stats = TxJoinViewStack.vacuum(spark, view, retainVersions = 0)
    assert(stats.deletedDirs > 0)
    assert(Manifest.readAt(spark, view, 0L).isEmpty,
      "vacuum must retire history below the floor")
    assert(membersSorted(view) == head,
      "the head must keep serving after vacuum")
    assert(TxJoinViewStack.serveTokens(spark, view).count() > 0)
  }

  test("lifecycle misuse refuses loudly") {
    val lex = mkLex(); val spl = mkSplit()
    val view = newRoot("graft_jv_view6")
    intercept[IllegalStateException] {
      TxJoinViewStack.refreshLex(spark, view, lex, 1L, 4, B)
    }
    TxJoinViewStack.build(spark, view, lex, spl, B)
    intercept[IllegalArgumentException] {
      TxJoinViewStack.build(spark, view, lex, spl, B)
    }
  }

  test("crash face: an unpublished refresh is invisible, the replay converges") {
    val lex = mkLex(); val spl = mkSplit()
    val view = newRoot("graft_jv_view7")
    TxJoinViewStack.build(spark, view, lex, spl, B, Some(0L), Some(1L))
    val before = membersSorted(view)
    assert(TxJoinViewStack.refreshLex(spark, view, lex, 1L, 4, B,
      publish = false))
    assert(membersSorted(view) == before,
      "an unpublished refresh must stay invisible")
    assert(Manifest.read(spark, view).get.baseV == 0L)
    // the restarted consumer replays the same window and publishes
    assert(TxJoinViewStack.refreshLex(spark, view, lex, 1L, 4, B))
    val twin = newRoot("graft_jv_twin7")
    TxJoinViewStack.build(spark, twin, lex, spl, B, Some(1L), Some(1L))
    assert(membersSorted(view) == membersSorted(twin))
  }
}
