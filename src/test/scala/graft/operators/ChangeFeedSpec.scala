package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Change data feeds between committed manifest cuts. Load-bearing
  * claims beyond the gates' oracle rows:
  * (1) the sketch feed's PIN DIFF reads only re-pinned buckets — a
  *     bucket untouched between the cuts is never listed;
  * (2) a key carried byte-verbatim through a touched bucket emits no
  *     change row (the false-positive face of whole-bucket MVCC);
  * (3) the doc feed's net-zero law — born AND retired inside the
  *     window was visible at neither cut, emits nothing;
  * (4) empty and inverted windows behave (empty frame; loud refusal);
  * (5) the replica law: from-cut + feed ≡ to-cut, row for row. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def batchDf(rows: (String, Long)*) = rows.toDF("key", "user")

  test("sketch feed: classification, verbatim-carry suppression, pin-diff pruning") {
    val root = newRoot("graft_cdc_sk")
    TxSketchStack.init(spark, root)
    // b0: three keys; 'quiet' never touched again
    assert(TxSketchStack.commitBatch(spark, root,
      batchDf("a" -> 1L, "a" -> 2L, "quiet" -> 10L, "gone" -> 20L),
      0L, "key", "user", buckets = 4))
    val v1 = Manifest.read(spark, root).get.version
    // b1: 'a' grows; 'fresh' appears; replace drops 'gone'
    assert(TxSketchStack.commitBatch(spark, root,
      batchDf("a" -> 3L, "fresh" -> 30L), 1L, "key", "user", buckets = 4))
    assert(TxSketchStack.commitReplace(spark, root,
      spark.emptyDataFrame.select(lit("x").as("key"), lit(0L).as("user"))
        .limit(0),
      Seq("gone").toDF("key"), 2L, "key", "user", buckets = 4))
    val head = Manifest.read(spark, root).get.version
    val feed = TxSketchStack.changes(spark, root, v1, head)
    val m = feed.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("a" -> "update", "fresh" -> "insert",
      "gone" -> "delete"), s"misclassified feed: $m")
    // 'quiet' rode through verbatim (absent batch side coalesces to the
    // stored row) — no change row even though its bucket may have moved
    assert(!m.contains("quiet"))
    // before/after tallies are exact
    val a = feed.filter($"key" === "a").collect().head
    assert(a.getLong(2) == 2L && a.getLong(3) == 3L)
    // pin-diff pruning: between two IDENTICAL cuts nothing is read
    assert(TxSketchStack.changes(spark, root, head, head).isEmpty)
    // inverted window refuses loudly
    intercept[IllegalArgumentException] {
      TxSketchStack.changes(spark, root, head, v1).collect()
    }
  }

  test("sketch feed: pin diff skips buckets untouched between the cuts") {
    val root = newRoot("graft_cdc_prune")
    TxSketchStack.init(spark, root)
    // many keys spread over all 8 buckets
    val wide = (0 until 64).map(i => (s"k$i", i.toLong)).toDF("key", "user")
    assert(TxSketchStack.commitBatch(spark, root, wide, 0L, "key",
      "user", buckets = 8))
    val v1 = Manifest.read(spark, root).get.version
    // one key touched — one bucket re-pins
    assert(TxSketchStack.commitBatch(spark, root, batchDf("k0" -> 999L),
      1L, "key", "user", buckets = 8))
    val head = Manifest.read(spark, root).get.version
    val stF = Manifest.readAt(spark, root, v1).get
    val stT = Manifest.readAt(spark, root, head).get
    val repinned = (stF.statsV.keySet ++ stT.statsV.keySet)
      .count(b => stF.statsV.get(b) != stT.statsV.get(b))
    assert(repinned == 1, s"one-key batch re-pinned $repinned buckets")
    val feed = TxSketchStack.changes(spark, root, v1, head)
    // the scan lists ONLY the re-pinned bucket's two pinned paths
    val files = feed.inputFiles.toSeq
    assert(files.nonEmpty)
    val buckets = files.flatMap(f =>
      "bkt=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt)).distinct
    assert(buckets.length == 1,
      s"pin-diff read listed buckets $buckets for a 1-bucket change")
    assert(feed.collect().map(_.getString(0)).toSeq == Seq("k0"))
  }

  test("doc feed: classification, net-zero suppression, empty window") {
    val root = newRoot("graft_cdc_doc")
    val mk = (ids: Seq[Long]) =>
      ids.map(i => (i, s"alpha beta doc$i gamma")).toDF("doc_id", "text")
    assert(TxServeStack.commitBatch(spark, root, mk(Seq(1L, 2L, 3L, 4L)),
      0L, "doc_id", "text", docBuckets = 4, termBuckets = 4))
    val v1 = Manifest.read(spark, root).get.version
    // window: delete 2; upsert 3 (replace) and 9 (insert);
    // 50 is born then retired — net zero, visible at neither cut
    assert(TxServeStack.commitBatch(spark, root, mk(Seq(50L)),
      1L, "doc_id", "text", docBuckets = 4, termBuckets = 4))
    assert(TxServeStack.commitDelete(spark, root,
      Seq(2L, 50L).toDF("doc_id"), 2L, "doc_id",
      docBuckets = 4, termBuckets = 4))
    assert(TxServeStack.commitUpsert(spark, root,
      Seq((3L, "replaced text entirely"), (9L, "new doc nine"))
        .toDF("doc_id", "text"),
      3L, "doc_id", "text", docBuckets = 4, termBuckets = 4))
    val head = Manifest.read(spark, root).get.version
    val m = TxServeStack.docChanges(spark, root, v1, head, docBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(2L -> "delete", 3L -> "update", 9L -> "insert"),
      s"misclassified doc feed: $m")
    assert(!m.contains(50L), "net-zero doc leaked into the feed")
    // absorbed re-ingest emits nothing: doc 1 re-sent unchanged
    assert(TxServeStack.commitBatch(spark, root, mk(Seq(1L)),
      4L, "doc_id", "text", docBuckets = 4, termBuckets = 4))
    val v1b = Manifest.read(spark, root).get.version
    assert(TxServeStack.docChanges(spark, root, head, v1b, docBuckets = 4)
      .isEmpty, "an absorbed re-ingest must emit no change")
    // empty window between identical cuts
    assert(TxServeStack.docChanges(spark, root, head, head, docBuckets = 4)
      .isEmpty)
  }

  test("doc feed after-images: dl_before/dl_after from the pruned probes") {
    val root = newRoot("graft_cdc_dl")
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    assert(TxServeStack.commitBatch(spark, root,
      mk(Seq(1L -> "one two three", 2L -> "solo", 3L -> "a b c d")),
      0L, "doc_id", "text", docBuckets = 4, termBuckets = 4))
    val v1 = Manifest.read(spark, root).get.version
    assert(TxServeStack.commitDelete(spark, root, Seq(2L).toDF("doc_id"),
      1L, "doc_id", docBuckets = 4, termBuckets = 4))
    assert(TxServeStack.commitUpsert(spark, root,
      mk(Seq(3L -> "now five tokens long here", 9L -> "fresh pair")),
      2L, "doc_id", "text", docBuckets = 4, termBuckets = 4))
    val head = Manifest.read(spark, root).get.version
    val rows = TxServeStack.docChanges(spark, root, v1, head,
        docBuckets = 4, stats = true)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    // the norm is the count of non-empty whitespace tokens at each cut
    assert(rows(2L) == (("delete", Some(1L), None)))
    assert(rows(3L) == (("update", Some(4L), Some(5L))))
    assert(rows(9L) == (("insert", None, Some(2L))))
    // the default face keeps the 2-column schema a consumer already binds
    assert(TxServeStack.docChanges(spark, root, v1, head, docBuckets = 4)
      .columns.toSeq == Seq("doc_id", "change"))
    // empty stats window keeps the 4-column schema
    assert(TxServeStack.docChanges(spark, root, head, head,
      docBuckets = 4, stats = true).columns.toSeq ==
      Seq("doc_id", "change", "dl_before", "dl_after"))
  }

  test("split feed: insert-only under write-once; rebucket emits nothing") {
    val root = newRoot("graft_cdc_split")
    TxSplitStack.init(spark, root)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labels = (0L until 40L).map(i => (i, i - i % 4)).toDF("id", "cluster")
    assert(TxSplitStack.commitAssign(spark, root,
      (0L until 20L).toDF("doc_id"), labels, 0L, "doc_id", splits, 8))
    val v1 = Manifest.read(spark, root).get.version
    assert(TxSplitStack.commitAssign(spark, root,
      (20L until 40L).toDF("doc_id"), labels, 1L, "doc_id", splits, 8))
    val v2 = Manifest.read(spark, root).get.version
    val feed = TxSplitStack.changes(spark, root, v1, v2).collect()
    assert(feed.length == 20 && feed.forall(_.getString(1) == "insert"),
      "a write-once ledger's feed must be insert-only")
    assert(feed.map(_.getLong(0)).toSet == (20L until 40L).toSet)
    // every insert carries its after-image split
    assert(feed.forall(r => Set("train", "val", "test")(r.getString(2))))
    // a rebucket migration re-pins every bucket with identical content:
    // the feed across it must emit NOTHING (row equality decides)
    assert(TxSplitStack.rebucket(spark, root, newBuckets = 16))
    val v3 = Manifest.read(spark, root).get.version
    assert(TxSplitStack.changes(spark, root, v2, v3).isEmpty,
      "a content-preserving migration leaked phantom changes")
  }

  test("replica law: from-cut + feed ≡ to-cut on the sketch stack") {
    val root = newRoot("graft_cdc_rep")
    TxSketchStack.init(spark, root)
    assert(TxSketchStack.commitBatch(spark, root,
      batchDf("a" -> 1L, "b" -> 2L, "c" -> 3L), 0L, "key", "user", 4))
    val v1 = Manifest.read(spark, root).get.version
    assert(TxSketchStack.commitBatch(spark, root,
      batchDf("a" -> 4L, "d" -> 5L), 1L, "key", "user", 4))
    assert(TxSketchStack.commitReplace(spark, root,
      spark.emptyDataFrame.select(lit("x").as("key"), lit(0L).as("user"))
        .limit(0),
      Seq("b").toDF("key"), 2L, "key", "user", 4))
    val head = Manifest.read(spark, root).get.version
    val feed = TxSketchStack.changes(spark, root, v1, head)
    val replica = TxSketchStack.resolve(spark, root, version = Some(v1))
      .join(feed.select("key"), Seq("key"), "left_anti")
      .unionByName(feed.filter($"change" =!= "delete")
        .select($"key", $"n_rows_after".as("n_rows"), $"sk", $"th"))
    val got = TxSketchStack.estimates(replica).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = TxSketchStack.estimates(
        TxSketchStack.resolve(spark, root, version = Some(head)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want, s"replica drifted: $got vs $want")
  }
}
