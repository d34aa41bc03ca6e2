package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Ledger]] — the shared bucket-pruned read discipline for
  * append-only streaming ledgers. The load-bearing property: pruning a
  * pmod-bucketed store to an arriving batch's elected buckets is a
  * semantic no-op on any key-equi (anti-)join against that batch,
  * because pmod is a function of the key. */
class LedgerSpec extends SparkSpec {

  test("batchBuckets is the exact pmod image of the batch's keys, bounded by B") {
    import spark.implicits._
    val batch = Seq(3L, 7L, 19L, 19L, 35L).toDF("id")
    val bkts = Ledger.batchBuckets(batch, "id", 16)
    assert(bkts == Seq(3, 7), s"got $bkts") // 19 % 16 = 3, 35 % 16 = 3
    assert(Ledger.batchBuckets(batch, "id", 1) == Seq(0))
  }

  test("prunedToBatch keeps every stored row an anti-join could collide with") {
    import spark.implicits._
    val stored = Ledger.withBucket(
      (0L until 100L).toDF("id").withColumn("v", col("id") * 2), "id", 8)
    val batch = Seq(5L, 13L, 64L).toDF("id") // buckets 5, 5, 0
    val pruned = Ledger.prunedToBatch(stored, batch, "id", 8)
    // the pruned world anti-joins identically to the full world
    val full = batch.join(stored.select("id"), Seq("id"), "left_anti")
    val pr = batch.join(pruned.select("id"), Seq("id"), "left_anti")
    assert(pr.exceptAll(full).isEmpty && full.exceptAll(pr).isEmpty)
    // and it is a strict subset: only buckets 0 and 5 survive
    val kept = pruned.select("bkt").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(kept == Set(0, 5), s"got $kept")
  }

  test("withBucket round-trips negative-free long keys into [0, B)") {
    import spark.implicits._
    val df = Ledger.withBucket(Seq(0L, 1L, 4095L, 4096L).toDF("id"),
      "id", 4096)
    val got = df.select("id", "bkt").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 4095L -> 4095, 4096L -> 0))
  }

  test("withHashBucket/prunedToKeys: buckets in [0, B); pruning is a no-op on term-equi joins; strict subset read") {
    import spark.implicits._
    val stored = Ledger.withHashBucket(
      ('a' to 'z').map(c => (c.toString, c.toInt.toLong)).toDF("term", "v"),
      "term", 8)
    val range = stored.select("bkt").collect().map(_.getInt(0))
    assert(range.forall(b => b >= 0 && b < 8))
    val keys = Seq("c", "q", "zz").toDF("term") // zz: never stored
    val pruned = Ledger.prunedToKeys(stored, keys, "term", 8)
    val full = keys.join(stored, Seq("term"), "left")
    val pr = keys.join(pruned, Seq("term"), "left")
    assert(pr.exceptAll(full).isEmpty && full.exceptAll(pr).isEmpty,
      "pruned term join drifted from the full join")
    // the read is a strict subset: only the keys' hash buckets survive
    val elected = Ledger.keyHashBuckets(keys, "term", 8).toSet
    val kept = pruned.select("bkt").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(kept.subsetOf(elected) && kept.size < 8,
      s"kept $kept not a strict subset of elected $elected")
  }

  test("removeBucketDelta + overwriteBuckets == full rewrite; a fully-emptied bucket's directory is deleted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rmspec")
    try {
      // B = 4: bucket b holds ids ≡ b (mod 4). Removing every id ≡ 1
      // (mod 4) EMPTIES bucket 1 — the case plain dynamic overwrite
      // silently misses (no delta row elects the partition, so the
      // stale directory would survive).
      val stored = Ledger.withBucket(
        (0L until 16L).toDF("id").withColumn("v", col("id") * 10), "id", 4)
      stored.write.partitionBy("bkt").mode("overwrite")
        .parquet(dir.toString)
      val removals = (Seq(1L, 5L, 9L, 13L) ++ Seq(2L)).toDF("id")
      val live = spark.read.parquet(dir.toString)
      val delta = Ledger.removeBucketDelta(live, removals, "id", 4)
        .localCheckpoint()
      Ledger.overwriteBuckets(delta,
        Ledger.batchBuckets(removals, "id", 4), dir.toString)
      val got = spark.read.parquet(dir.toString).select("id", "v", "bkt")
      val want = stored.join(removals, Seq("id"), "left_anti")
        .select("id", "v", "bkt")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "bucketed takedown drifted from the full anti-join rewrite")
      assert(!java.nio.file.Files.exists(dir.resolve("bkt=1")),
        "the fully-emptied bucket's directory survived")
      assert(java.nio.file.Files.exists(dir.resolve("bkt=0")),
        "an untouched bucket's directory vanished")
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("compactBuckets: content-identical, one file per compacted bucket, untouched buckets' files untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cpspec")
    try {
      // 3 appends over B = 4, each a single task → each write adds one
      // file to every bucket it touches. Buckets 0..2 get 3 files;
      // bucket 3's ids appear only in the first write (1 file) so it
      // must NOT be elected at maxFiles = 2, and compaction must not
      // rewrite it.
      Seq[Seq[Long]](0L until 16L,               // all four buckets
          Seq(16L, 17L, 18L, 20L, 21L, 22L),     // no id ≡ 3 (mod 4)
          Seq(24L, 25L, 26L, 28L, 29L, 30L)      // no id ≡ 3 (mod 4)
      ).foreach { ids =>
        Ledger.withBucket(ids.toDF("id").withColumn("v", col("id") * 10),
            "id", 4)
          .coalesce(1)
          .write.partitionBy("bkt").mode("append").parquet(dir.toString)
      }
      val before = spark.read.parquet(dir.toString)
        .select("id", "v", "bkt").collect().toSet
      val counts0 = Ledger.bucketFileCounts(spark, dir.toString)
      assert(counts0(0) == 3 && counts0(3) == 1, s"fixture drifted: $counts0")
      val frag = Ledger.fragmentedBuckets(spark, dir.toString, maxFiles = 2)
      assert(frag == Seq(0, 1, 2), s"election drifted: $frag")
      val b3file = Ledger.bucketFileCounts(spark, dir.toString)
      Ledger.compactBuckets(spark, dir.toString, frag)
      val after = spark.read.parquet(dir.toString)
        .select("id", "v", "bkt").collect().toSet
      assert(after == before, "compaction changed ledger content")
      val counts1 = Ledger.bucketFileCounts(spark, dir.toString)
      assert(frag.forall(counts1(_) == 1),
        s"compacted buckets must hold one file: $counts1")
      assert(counts1(3) == b3file(3),
        "an unelected bucket was rewritten")
      // empty election is a no-op
      Ledger.compactBuckets(spark, dir.toString, Seq.empty)
      assert(Ledger.bucketFileCounts(spark, dir.toString) == counts1)
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }
}
