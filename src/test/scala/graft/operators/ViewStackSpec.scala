package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [[TxViewStack]] — the change-feed-maintained group rollup.
  * Load-bearing claims:
  * (1) feed-maintained state equals a fresh full build at the same
  *     upstream cut — growth, shrink (key-replace), and delete alike;
  * (2) a replayed refresh window skips whole (exactly-once by the
  *     upstream-version high-water);
  * (3) a refresh touching one group leaves every other group's bucket
  *     pin untouched (ride-through is byte-verbatim, not rewrite);
  * (4) an empty feed window (upstream re-bucket — a maintenance
  *     rewrite with no logical change) still advances the cursor;
  * (5) pruned serves equal the full serve restricted;
  * (6) snapshots survive refreshes; vacuum retires history below the
  *     floor and keeps the head serving;
  * (7) lifecycle misuse refuses loudly. */
class ViewStackSpec extends SparkSpec {
  import spark.implicits._

  private val grpOf: Column => Column = c => length(c).cast("string")
  private val B = 4

  private def newRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Upstream profile with two batches: groups "2" = {aa, ab},
    * "3" = {bbb}. */
  private def mkUpstream(): String = {
    val root = newRoot("graft_view_up")
    TxSketchStack.init(spark, root)
    val b0 = ((1L to 5L).map(("aa", _)) ++ (4L to 8L).map(("ab", _)) ++
      (1L to 3L).map(("bbb", _))).toDF("key", "user")
    assert(TxSketchStack.commitBatch(spark, root, b0, 0L, "key", "user", 8))
    root
  }

  private def freshTwin(root: String): DataFrame = {
    val twin = newRoot("graft_view_twin")
    TxViewStack.build(spark, twin, root, grpOf, B)
    TxViewStack.serveRollup(spark, twin)
  }

  private def rollupRows(df: DataFrame): Set[(String, Long, Long, Long)] =
    df.select("grp", "n_keys", "n_rows", "est").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("feed-maintained ≡ fresh build through growth, shrink, delete") {
    val root = mkUpstream()
    val view = newRoot("graft_view_v")
    TxViewStack.build(spark, view, root, grpOf, B)
    assert(rollupRows(TxViewStack.serveRollup(spark, view)) ==
      Set(("2", 2L, 10L, 8L), ("3", 1L, 3L, 3L)))

    // growth: new users on aa, a brand-new group-4 key
    val b1 = ((9L to 10L).map(("aa", _)) ++ (1L to 4L).map(("cccc", _)))
      .toDF("key", "user")
    assert(TxSketchStack.commitBatch(spark, root, b1, 1L, "key", "user", 8))
    assert(TxViewStack.refresh(spark, view, root,
      Manifest.read(spark, root).get.version, grpOf, B))
    val afterGrowth = rollupRows(TxViewStack.serveRollup(spark, view))
    assert(afterGrowth == Set(("2", 2L, 12L, 10L), ("3", 1L, 3L, 3L),
      ("4", 1L, 4L, 4L)))
    assert(afterGrowth == rollupRows(freshTwin(root)))

    // shrink: key-replace rebuilds aa down to two users, drops ab whole
    // — union-only maintenance would keep serving est=10 for group "2"
    assert(TxSketchStack.commitReplace(spark, root,
      (1L to 2L).map(("aa", _)).toDF("key", "user"),
      Seq("ab").toDF("key"), 2L, "key", "user", 8))
    assert(TxViewStack.refresh(spark, view, root,
      Manifest.read(spark, root).get.version, grpOf, B))
    val afterShrink = rollupRows(TxViewStack.serveRollup(spark, view))
    assert(afterShrink == Set(("2", 1L, 2L, 2L), ("3", 1L, 3L, 3L),
      ("4", 1L, 4L, 4L)))
    assert(afterShrink == rollupRows(freshTwin(root)))
  }

  test("replayed refresh window skips; untouched groups keep their pins") {
    val root = mkUpstream()
    val view = newRoot("graft_view_replay")
    TxViewStack.build(spark, view, root, grpOf, B)
    val b1 = Seq(("bbb", 9L)).toDF("key", "user") // touches group "3" only
    assert(TxSketchStack.commitBatch(spark, root, b1, 1L, "key", "user", 8))
    val upHead = Manifest.read(spark, root).get.version
    val pinsBefore = Manifest.read(spark, view).get.statsV
    assert(TxViewStack.refresh(spark, view, root, upHead, grpOf, B))
    val pinsAfter = Manifest.read(spark, view).get.statsV
    val touchedBkt = Seq("3").toDF("g")
      .select(pmod(xxhash64(col("g")), lit(B.toLong)).cast("int"))
      .head().getInt(0)
    assert(pinsAfter.keySet == pinsBefore.keySet)
    pinsBefore.foreach { case (b, v) =>
      if (b == touchedBkt) assert(pinsAfter(b) != v,
        s"touched bucket $b must re-pin")
      else assert(pinsAfter(b) == v, s"untouched bucket $b must ride through")
    }
    // replay: same window again — skips whole, nothing moves
    assert(!TxViewStack.refresh(spark, view, root, upHead, grpOf, B))
    assert(Manifest.read(spark, view).get.statsV == pinsAfter)
  }

  test("empty feed window (upstream rebucket) advances the cursor") {
    val root = mkUpstream()
    val view = newRoot("graft_view_empty")
    TxViewStack.build(spark, view, root, grpOf, B)
    val pins = Manifest.read(spark, view).get.statsV
    assert(TxSketchStack.rebucket(spark, root, newBuckets = 16))
    val upHead = Manifest.read(spark, root).get.version
    assert(TxViewStack.refresh(spark, view, root, upHead, grpOf, B))
    val st = Manifest.read(spark, view).get
    assert(st.baseV == upHead, "cursor must advance past the empty window")
    assert(st.statsV == pins, "an empty window rewrites nothing")
    assert(rollupRows(TxViewStack.serveRollup(spark, view)) ==
      Set(("2", 2L, 10L, 8L), ("3", 1L, 3L, 3L)))
  }

  test("pruned serve ≡ full serve restricted") {
    val root = mkUpstream()
    val view = newRoot("graft_view_pruned")
    TxViewStack.build(spark, view, root, grpOf, B)
    val full = rollupRows(TxViewStack.serveRollup(spark, view))
      .filter(_._1 == "2")
    val pruned = rollupRows(TxViewStack.serveRollup(spark, view,
      groups = Some((Seq("2").toDF("grp"), B))))
    assert(pruned == full)
  }

  test("snapshot survives refreshes; vacuum retires below the floor") {
    val root = mkUpstream()
    val view = newRoot("graft_view_vac")
    TxViewStack.build(spark, view, root, grpOf, B)
    assert(TxSketchStack.commitBatch(spark, root,
      Seq(("aa", 99L)).toDF("key", "user"), 1L, "key", "user", 8))
    assert(TxViewStack.refresh(spark, view, root,
      Manifest.read(spark, root).get.version, grpOf, B))
    // the build cut still serves pre-refresh numbers
    assert(rollupRows(TxViewStack.serveRollup(spark, view,
      version = Some(0L))) == Set(("2", 2L, 10L, 8L), ("3", 1L, 3L, 3L)))
    val stats = TxViewStack.vacuum(spark, view, retainVersions = 0)
    assert(stats.deletedDirs > 0, "superseded member buckets must sweep")
    assert(Manifest.readAt(spark, view, 0L).isEmpty,
      "history below the floor must retire")
    assert(rollupRows(TxViewStack.serveRollup(spark, view)) ==
      Set(("2", 2L, 11L, 9L), ("3", 1L, 3L, 3L)))
  }

  test("lifecycle misuse refuses loudly") {
    val root = mkUpstream()
    val view = newRoot("graft_view_misuse")
    intercept[IllegalStateException] {
      TxViewStack.refresh(spark, view, root, 1L, grpOf, B)
    }
    TxViewStack.build(spark, view, root, grpOf, B)
    intercept[IllegalArgumentException] {
      TxViewStack.build(spark, view, root, grpOf, B)
    }
  }
}
