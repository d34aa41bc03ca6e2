package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TxSketchStack]] — the mergeable-sketch ledger under the manifest
  * protocol. Load-bearing claims beyond the gates' oracle rows:
  * (1) exactly-once by batch id — a replayed batch must not
  * double-count the EXACT row tally (HLL would absorb it silently);
  * (2) a crashed commit's versioned writes are invisible orphans;
  * (3) the pruned serve never lists an unelected bucket's directory;
  * (4) the HLL estimate holds its published error envelope at a
  * cardinality far past the gates' 150-user corpus, and cross-key
  * rollup handles overlap (union, not sum); (5) vacuum reclaims
  * superseded versions without touching a live pin. */
class SketchStackSpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(keys: Seq[String], usersPerKey: Int, offset: Int = 0) =
    keys.flatMap(k => (0 until usersPerKey).map(u =>
      (k, (k.hashCode.abs % 97) * 1000000L + offset + u)))
      .toDF("key", "user")

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_skspec").toString

  test("exactly-once: a replayed batch id skips whole; tallies never double") {
    val root = newRoot()
    TxSketchStack.init(spark, root)
    val b0 = batchDf(Seq("a", "b"), 50)
    assert(TxSketchStack.commitBatch(spark, root, b0, 0L, "key", "user", 4))
    // replay of batch 0 (same id) must be a no-op, not a re-merge
    assert(!TxSketchStack.commitBatch(spark, root, b0, 0L, "key", "user", 4))
    val est = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est("a")._1 == 50L && est("b")._1 == 50L,
      s"replay double-counted the exact tally: $est")
    // distinct merge across batches: batch 1 re-sends half of a's users
    // and adds 25 new — n_rows adds all 75, distinct grows by 25
    val b1 = batchDf(Seq("a"), 50, offset = 25)
    assert(TxSketchStack.commitBatch(spark, root, b1, 1L, "key", "user", 4))
    val est2 = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .filter($"key" === "a").collect().head
    assert(est2.getLong(1) == 100L)
    assert(math.abs(est2.getLong(2) - 75L) <= 4L,
      s"merged estimate far from 75 true distinct: ${est2.getLong(2)}")
  }

  test("crash face: unpublished writes are invisible; replay commits once") {
    val root = newRoot()
    TxSketchStack.init(spark, root)
    assert(TxSketchStack.commitBatch(spark, root, batchDf(Seq("a"), 30),
      0L, "key", "user", 4))
    val before = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch 1 crashes after its versioned writes, before the swap
    TxSketchStack.commitBatch(spark, root, batchDf(Seq("a", "c"), 40),
      1L, "key", "user", 4, publish = false)
    val mid = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mid == before, s"torn commit visible: $mid vs $before")
    // the replay re-runs the same writes and commits exactly once
    assert(TxSketchStack.commitBatch(spark, root, batchDf(Seq("a", "c"), 40),
      1L, "key", "user", 4))
    val after = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("a") == 70L && after("c") == 40L, s"replay wrong: $after")
  }

  test("pruned serve: an unelected bucket's directory is never listed") {
    val root = newRoot()
    TxSketchStack.init(spark, root)
    // 16 keys over 8 buckets so several buckets are populated
    val keys = (0 until 16).map(i => s"k$i")
    assert(TxSketchStack.commitBatch(spark, root, batchDf(keys, 20),
      0L, "key", "user", 8))
    val q = Seq("k3").toDF("key")
    val resolved = TxSketchStack.resolve(spark, root, Some((q, 8)))
    val kbkt = spark.range(1)
      .select(pmod(xxhash64(lit("k3")), lit(8L)).cast("int"))
      .collect().head.getInt(0)
    val files = resolved.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(s"/bkt=$kbkt/")),
      s"pruned resolve read outside bkt=$kbkt: " +
        files.filterNot(_.contains(s"/bkt=$kbkt/")).take(3).mkString(","))
    assert(resolved.count() == 1L)
  }

  test("error envelope at 50k distinct; rollup unions overlap instead of summing") {
    val root = newRoot()
    TxSketchStack.init(spark, root)
    // two keys sharing 25k of 50k users each: true union = 75k
    val big = spark.range(0, 50000)
      .select(lit("x").as("key"), $"id".as("user"))
      .unionAll(spark.range(25000, 75000)
        .select(lit("y").as("key"), $"id".as("user")))
    assert(TxSketchStack.commitBatch(spark, root, big, 0L, "key", "user", 4))
    val resolved = TxSketchStack.resolve(spark, root)
    val perKey = TxSketchStack.estimates(resolved)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(math.abs(perKey("x") - 50000L) <= 2500L, s"x: ${perKey("x")}")
    assert(math.abs(perKey("y") - 50000L) <= 2500L, s"y: ${perKey("y")}")
    val roll = TxSketchStack.rollup(resolved).collect().head
    assert(roll.getLong(0) == 100000L) // tallies SUM
    assert(math.abs(roll.getLong(1) - 75000L) <= 3750L, // distinct UNIONS
      s"rollup should estimate ~75k (union), not 100k (sum): ${roll.getLong(1)}")
  }

  test("theta overlap: intersection/difference exact below the sample threshold, across batches") {
    val root = newRoot()
    TxSketchStack.init(spark, root)
    // x = {0..999}, y = {600..1599}: |x∩y| = 400, |x∖y| = 600,
    // |x∪y| = 1600 — y arrives over TWO batches, so the served
    // intersection also proves theta_union maintenance composes
    val x = spark.range(0, 1000).select(lit("x").as("key"), $"id".as("user"))
    val y1 = spark.range(600, 1100).select(lit("y").as("key"), $"id".as("user"))
    val y2 = spark.range(1100, 1600).select(lit("y").as("key"), $"id".as("user"))
    assert(TxSketchStack.commitBatch(spark, root, x.unionAll(y1), 0L,
      "key", "user", 4))
    assert(TxSketchStack.commitBatch(spark, root, y2, 1L, "key", "user", 4))
    val got = TxSketchStack.overlap(
      TxSketchStack.resolve(spark, root), "x", "y").collect().head
    assert(got.getLong(0) == 400L, s"inter: $got")
    assert(got.getLong(1) == 600L, s"diff: $got")
    assert(got.getLong(2) == 1600L, s"union: $got")
  }

  test("commitReplace: rebuilt keys swap in whole, dropped keys vanish, neighbors ride through") {
    val root = newRoot()
    TxSketchStack.init(spark, root)
    // three keys over FEW buckets so replaced and untouched keys share one
    val keys = Seq("a", "b", "c")
    assert(TxSketchStack.commitBatch(spark, root, batchDf(keys, 40),
      0L, "key", "user", 2))
    // rebuild a from a re-scan keeping 10 users; take b down entirely
    val rebuilt = batchDf(Seq("a"), 10)
    val crash = TxSketchStack.commitReplace(spark, root, rebuilt,
      Seq("b").toDF("key"), 1L, "key", "user", 2, publish = false)
    assert(crash)
    val mid = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mid == Map("a" -> 40L, "b" -> 40L, "c" -> 40L),
      s"torn replace visible: $mid")
    assert(TxSketchStack.commitReplace(spark, root, rebuilt,
      Seq("b").toDF("key"), 1L, "key", "user", 2))
    val after = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after.keySet == Set("a", "c"), s"b must vanish: $after")
    assert(after("a")._1 == 10L && math.abs(after("a")._2 - 10L) <= 1L,
      s"a must serve the rebuilt set only: $after")
    assert(after("c")._1 == 40L, s"untouched neighbor moved: $after")
    // replay skips whole
    assert(!TxSketchStack.commitReplace(spark, root, rebuilt,
      Seq("b").toDF("key"), 1L, "key", "user", 2))
  }

  test("rebucket: rows identical under the new keyspace; pruned serve elects under B'") {
    val root = newRoot()
    TxSketchStack.init(spark, root)
    val keys = (0 until 12).map(i => s"k$i")
    assert(TxSketchStack.commitBatch(spark, root, batchDf(keys, 15),
      0L, "key", "user", 2))
    val before = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .collect().map(_.toString).toSet
    assert(TxSketchStack.rebucket(spark, root, newBuckets = 8))
    val after = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .collect().map(_.toString).toSet
    assert(after == before, "rebucket changed the served profile")
    // pruned serve under B'=8 opens only the elected bucket
    val q = Seq("k5").toDF("key")
    val resolved = TxSketchStack.resolve(spark, root, Some((q, 8)))
    val kbkt = spark.range(1)
      .select(pmod(xxhash64(lit("k5")), lit(8L)).cast("int"))
      .collect().head.getInt(0)
    val files = resolved.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(s"/bkt=$kbkt/")),
      s"post-migration pruned resolve read outside bkt=$kbkt")
    // a later batch commits under B' and merges correctly
    assert(TxSketchStack.commitBatch(spark, root,
      batchDf(Seq("k5"), 15, offset = 15), 1L, "key", "user", 8))
    val k5 = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .filter($"key" === "k5").collect().head
    assert(k5.getLong(1) == 30L && math.abs(k5.getLong(2) - 30L) <= 2L)
  }

  test("commitResize: rebuilds under lgK'; old cut reconstructible; post-resize batches merge; stale-lgK batches fail loudly") {
    val root = newRoot()
    TxSketchStack.init(spark, root)
    val b0 = batchDf(Seq("a", "b"), 500)
    assert(TxSketchStack.commitBatch(spark, root, b0, 0L, "key", "user",
      buckets = 4)) // lgK = 12
    val pre = Manifest.read(spark, root).get
    // resize re-aggregates from the raw slice (== everything ingested)
    assert(TxSketchStack.commitResize(spark, root, b0, 1L, "key", "user",
      buckets = 4, lgK = 14, thetaLgNom = 13))
    def estMap(v: Option[Long] = None) = TxSketchStack.estimates(
        TxSketchStack.resolve(spark, root, version = v))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val est = estMap()
    assert(est("a")._1 == 500L && est("b")._1 == 500L,
      s"exact tallies must rebuild from the slice: $est")
    assert(math.abs(est("a")._2 - 500L) <= 25L,
      s"lgK=14 estimate out of envelope: $est")
    // the pre-resize cut still serves its lgK=12 rows (cuts never mix)
    assert(estMap(Some(pre.version)).keySet == Set("a", "b"))
    // a later batch at the NEW lgK merges cleanly
    assert(TxSketchStack.commitBatch(spark, root,
      batchDf(Seq("a"), 100, offset = 500000), 2L, "key", "user",
      buckets = 4, lgK = 14))
    assert(estMap()("a")._1 == 600L)
    // a batch still at the OLD lgK fails LOUDLY at its merge (the
    // stack's drift contract), and the failed commit leaves no trace
    val vBefore = Manifest.read(spark, root).get.version
    intercept[Exception] {
      TxSketchStack.commitBatch(spark, root,
        batchDf(Seq("a"), 10, offset = 900000), 3L, "key", "user",
        buckets = 4, lgK = 12)
    }
    assert(Manifest.read(spark, root).get.version == vBefore,
      "a failed merge must not advance the manifest")
    assert(estMap()("a")._1 == 600L,
      "a failed merge must not change the served profile")
  }

  test("snapshot + vacuum: time travel pins old cuts; vacuum keeps live pins") {
    val root = newRoot()
    TxSketchStack.init(spark, root)
    assert(TxSketchStack.commitBatch(spark, root, batchDf(Seq("a"), 10),
      0L, "key", "user", 4))
    assert(TxSketchStack.commitBatch(spark, root, batchDf(Seq("a"), 10,
      offset = 10), 1L, "key", "user", 4))
    val atV1 = TxSketchStack.estimates(
      TxSketchStack.resolve(spark, root, version = Some(1L)))
      .collect().head
    assert(atV1.getLong(1) == 10L, s"snapshot leaked batch 1: $atV1")
    val vs = TxSketchStack.vacuum(spark, root, retainVersions = 0)
    assert(vs.deletedDirs > 0, s"nothing reclaimed: $vs")
    val head = TxSketchStack.estimates(TxSketchStack.resolve(spark, root))
      .collect().head
    assert(head.getLong(1) == 20L && math.abs(head.getLong(2) - 20L) <= 2L)
    // the vacuumed snapshot version is gone
    assertThrows[IllegalStateException] {
      TxSketchStack.resolve(spark, root, version = Some(1L)).collect()
    }
  }
}
