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
}
